"""The stream-stream join's PRODUCTION contract, pinned: under
time-ordered delivery a narrow (production) watermark emits exactly
the batch join while the state store stays bounded by the
watermark+lookback horizon — never the whole stream.

The correctness GATES run span-wide watermarks because a gate must
survive arbitrary micro-batch splits (tests/test_streaming_delivery.py);
this test pins the other side of that trade so the operator's
bounded-state story cannot silently regress. Probe with real numbers:
docs/STREAMSTATE_PROBE.md (sf0.1: exact pairs, peak state 12% of the
stream vs 100% under the span-wide setting).
"""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gpi_etl_spark.streaming.joins import interval_join, interval_join_batch
from gpi_etl_spark.streaming.ordered import land_ordered_slices

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture()
def ordered_landing(spark):
    """400 alternating view/purchase events over ~40 hours, landed as
    8 contiguous time slices with strictly increasing mtimes (the
    FileStreamSource processing order) — production-shaped delivery."""
    base = tempfile.mkdtemp()
    rows = [
        (
            i % 7,
            T0 + dt.timedelta(minutes=6 * i),
            "view" if i % 2 == 0 else "purchase",
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    land_ordered_slices(df, base, ts_col="ts", n_slices=8)
    yield base, df
    shutil.rmtree(base, ignore_errors=True)


def test_ordered_delivery_exact_pairs_bounded_state(
    spark, ordered_landing
):
    base, df = ordered_landing
    batch_pairs = interval_join_batch(
        df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("k"), F.col("ts").alias("p_ts")
        ),
        df.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("k"), F.col("ts").alias("v_ts")
        ),
        keys=["k"], left_ts="p_ts", right_ts="v_ts", lookback="1 hour",
    ).count()
    assert batch_pairs > 100  # the fixture must exercise the join

    src = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    joined = interval_join(
        src.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("k"), F.col("ts").alias("p_ts")
        ),
        src.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("k"), F.col("ts").alias("v_ts")
        ),
        keys=["k"],
        left_ts="p_ts",
        right_ts="v_ts",
        lookback="1 hour",
        watermark="2 hours",  # production-narrow: 1/20 of the span
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_state_bound")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    progress = list(q.recentProgress)
    q.stop()

    assert len(progress) >= 8, "maxFilesPerTrigger must split delivery"
    peak_state = max(
        int(p["stateOperators"][0]["numRowsTotal"])
        for p in progress
        if p.get("stateOperators")
    )
    streamed_pairs = spark.table("t_state_bound").count()
    assert streamed_pairs == batch_pairs  # NOTHING lost when ordered
    # horizon = watermark(2h) + lookback(1h) = 3h of a 40h stream; one
    # 5h slice + horizon must stay well under half the stream
    assert peak_state < 400 // 2, (
        f"state held {peak_state} of 400 rows — eviction not engaging"
    )


def test_land_ordered_slices_empty_input_raises(spark):
    """Advice find: b.lo is None on an empty frame used to surface as
    a bare TypeError deep in the arithmetic."""
    base = tempfile.mkdtemp()
    try:
        empty = spark.createDataFrame(
            [], "user_id long, ts timestamp"
        )
        with pytest.raises(ValueError, match="no rows"):
            land_ordered_slices(empty, base, ts_col="ts", n_slices=4)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_land_ordered_slices_counts_only_nonempty_slices(spark):
    """Advice find: Spark writes a schema-only part file for an empty
    slice, so counting new part- files over-counted. Two tight event
    clusters at the ends of the span + 8 slices => the middle slices
    are empty and must not be counted."""
    base = tempfile.mkdtemp()
    try:
        rows = [(i, T0 + dt.timedelta(minutes=i)) for i in range(10)]
        rows += [
            (100 + i, T0 + dt.timedelta(days=10, minutes=i))
            for i in range(10)
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        written = land_ordered_slices(df, base, ts_col="ts", n_slices=8)
        assert written == 2
    finally:
        shutil.rmtree(base, ignore_errors=True)
