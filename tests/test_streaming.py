"""Structured Streaming: memory-sink runs must equal the batch plans."""

import datetime as dt
import shutil
import tempfile

import pytest

from gpi_etl_spark.streaming.windows import (
    dedup_late_events,
    session_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=3 * i), i % 3, "click" if i % 2 else "view",
         float(i))
        for i in range(40)
    ]
    # one duplicated event id for the dedup test
    rows.append(rows[0])
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _read_stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def test_streaming_tumbling_equals_batch(spark, events_dir):
    batch = tumbling_counts(spark.read.parquet(events_dir), window_len="15 minutes")
    stream = tumbling_counts(_read_stream(spark, events_dir), window_len="15 minutes")
    got = _run_stream(spark, stream, "t_tumbling", mode="complete")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in got.collect()}
    assert s == b and len(b) > 0


def test_streaming_session_counts(spark, events_dir):
    stream = session_counts(_read_stream(spark, events_dir), gap="10 minutes")
    got = _run_stream(spark, stream, "t_sessions", mode="complete")
    rows = got.collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)


def test_streaming_dedup(spark, events_dir):
    stream = dedup_late_events(_read_stream(spark, events_dir))
    got = _run_stream(spark, stream, "t_dedup")
    ids = [r.event_id for r in got.collect()]
    assert len(ids) == len(set(ids)) == 41 - 1  # duplicate dropped


def test_multi_microbatch_state_equals_batch(spark, events_dir):
    """Force MANY micro-batches (one file per trigger) so the state
    store must carry window state ACROSS batches — a single
    AvailableNow batch never exercises cross-batch merge."""
    import shutil as _sh
    import tempfile as _tf

    d = _tf.mkdtemp()
    try:
        # split the fixture into 5 single-row-group files
        spark.read.parquet(events_dir).repartition(5).write.mode(
            "overwrite"
        ).parquet(d)
        schema = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        agg = tumbling_counts(stream, window_len="15 minutes")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_multibatch")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
        q.stop()
        got = {tuple(r) for r in spark.sql("SELECT * FROM t_multibatch").collect()}
        batch = {
            tuple(r)
            for r in tumbling_counts(
                spark.read.parquet(d), window_len="15 minutes"
            ).collect()
        }
        assert got == batch and len(batch) > 0
        assert n_batches >= 5  # state really merged across micro-batches
    finally:
        _sh.rmtree(d, ignore_errors=True)
