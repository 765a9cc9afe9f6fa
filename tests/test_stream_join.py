"""Stream-stream interval join must equal the batch theta-join."""

import datetime as dt
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from gpi_etl_spark.streaming.joins import interval_join


@pytest.fixture(scope="module")
def events_dir(spark):
    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = []
    for i in range(60):
        rows.append((i, base + dt.timedelta(minutes=i), i % 3,
                     "purchase" if i % 10 == 0 else "click", float(i)))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _split(df):
    purchases = df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", F.col("ts").alias("c_ts")
    )
    return purchases, clicks


def test_stream_interval_join_equals_batch(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema

    bp, bc = _split(spark.read.parquet(events_dir))
    batch = (
        bp.alias("l")
        .join(
            bc.alias("r"),
            F.expr(
                "l.user_id = r.user_id AND r.c_ts > l.p_ts - INTERVAL 15 MINUTES "
                "AND r.c_ts <= l.p_ts"
            ),
        )
        .select("p_id", "c_id")
    )

    sp, sc = _split(spark.readStream.schema(schema).parquet(events_dir))
    joined = interval_join(
        sp, sc, keys=["user_id"], left_ts="p_ts", right_ts="c_ts",
        lookback="15 minutes",
    ).select("p_id", "c_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_sj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_sj").collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_interval_join_keys_not_ambiguous(spark, events_dir):
    """Selecting/grouping the join key must work on the result (one key
    copy survives the expression join)."""
    df = spark.read.parquet(events_dir)
    bp, bc = _split(df)
    out = interval_join(
        bp, bc, keys=["user_id"], left_ts="p_ts", right_ts="c_ts",
        lookback="15 minutes",
    )
    assert out.columns.count("user_id") == 1
    agg = out.groupBy("user_id").count().collect()  # no AMBIGUOUS_REFERENCE
    assert len(agg) > 0
