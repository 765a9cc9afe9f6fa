"""Left-outer stream-stream interval join: watermark-paced NULL
emission, pinned.

Outer stream-stream joins cannot ride the DuckDB hash gate (a
NULL-padded row may only emit once the watermark PROVES no match can
still arrive, so an availableNow run's output depends on how far the
final watermark got — rows younger than it are pending, not lost).
This test pins exactly that contract on an ordered two-region
landing:

* matched purchases emit with their view (same as inner);
* unmatched purchases OLD ENOUGH (final watermark passed their
  match horizon) emit exactly once with NULL view columns;
* unmatched purchases inside the final watermark horizon do NOT emit
  — they are pending state an incremental next run would flush.
"""

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gpi_etl_spark.streaming.joins import (
    interval_join,
    interval_join_batch,
)
from gpi_etl_spark.streaming.ordered import land_ordered_slices

T0 = dt.datetime(2024, 3, 1)


def _mins(m: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture()
def outer_landing(spark):
    """Early region (minutes 0-60): purchases u1 (view 5 min before —
    matched) and u2 (no view — unmatched, old). Late region (minutes
    900-960, i.e. 15h later): a view/purchase pair u3 (matched) and an
    unmatched purchase u4 near the stream's end (must stay pending —
    the final watermark cannot have passed it). Two time slices so the
    watermark genuinely advances between micro-batches."""
    base = tempfile.mkdtemp()
    rows = [
        (1, _mins(10), "view"),
        (1, _mins(15), "purchase"),      # matched, early
        (2, _mins(20), "purchase"),      # unmatched, early → NULL row
        (3, _mins(900), "view"),
        (3, _mins(905), "purchase"),     # matched, late
        (4, _mins(955), "purchase"),     # unmatched, near end → pending
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    land_ordered_slices(df, base, ts_col="ts", n_slices=2)
    yield base, df
    shutil.rmtree(base, ignore_errors=True)


def test_left_outer_interval_join_watermark_paced(spark, outer_landing):
    base, df = outer_landing
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
        lookback="30 minutes",
        watermark="1 hour",
        how="leftOuter",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_outer_join")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    got = {
        r.k: (r.p_ts, r.v_ts)
        for r in spark.table("t_outer_join").collect()
    }
    assert n_batches >= 2, "two slices must arrive as separate batches"
    # matched rows emit with their views (inner behavior)
    assert got[1] == (_mins(15), _mins(10))
    assert got[3] == (_mins(905), _mins(900))
    # the early unmatched purchase is provably matchless once the late
    # region advanced the watermark past minute 20 + horizon → NULL row
    assert got[2] == (_mins(20), None)
    # the near-end unmatched purchase sits INSIDE the final watermark
    # horizon: pending state, not output — and not silently matched
    assert 4 not in got
    assert len(spark.table("t_outer_join").collect()) == 3  # no dups


def test_left_outer_converges_to_batch_left_join_across_runs(
    spark, tmp_path
):
    """The incremental contract, end to end: run 1 (availableNow over
    the real data) emits every row it can PROVE and leaves the tail
    pending; run 2 (same checkpoint, one later file landed) flushes
    the rest. The UNION of the two runs equals the batch left join —
    nothing lost, nothing duplicated. Memory sinks can't resume a
    checkpoint, so this goes through the parquet file sink (the real
    deployment shape)."""
    import os
    import time

    rows = [(u, _mins(5 * u), "view") for u in range(0, 40, 2)] + [
        (u, _mins(5 * u + 4), "purchase") for u in range(40)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    base = str(tmp_path / "landing")
    os.makedirs(base, exist_ok=True)
    land_ordered_slices(df, base, ts_col="ts", n_slices=3)

    batch = interval_join_batch(
        df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("k"), F.col("ts").alias("p_ts")
        ),
        df.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("k"), F.col("ts").alias("v_ts")
        ),
        keys=["k"], left_ts="p_ts", right_ts="v_ts",
        lookback="30 minutes", how="leftOuter",
    ).select("k", "p_ts", "v_ts")
    expected = sorted(tuple(r) for r in batch.collect())

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
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
            lookback="30 minutes",
            watermark="1 hour",
            how="leftOuter",
        ).select("k", "p_ts", "v_ts")
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return sorted(
            tuple(r) for r in spark.read.parquet(sink).collect()
        )

    got1 = run_once()
    assert len(got1) < len(expected), (
        "run 1 should leave the un-provable tail pending"
    )
    assert set(got1) <= set(expected)

    # next ingest cycle: two later files land, each carrying BOTH a
    # view and a purchase. Both sides because the query's watermark is
    # the MIN over the two withWatermark nodes — advancing only one
    # side leaves the global watermark (and therefore NULL emission)
    # frozen. TWO files because the watermark a batch advances only
    # evicts state in the batch AFTER it (and availableNow runs no
    # trailing no-data batch): file 1 moves the watermark past every
    # real row's horizon, file 2 is the batch in which the pending
    # NULL rows actually flush. Files must sort after every slice
    # (the helper stamped them t0..t0+2). The sentinel purchases
    # themselves stay pending (the watermark never passes them) and
    # must not appear in the output.
    for j in (1, 2):
        sentinel = spark.createDataFrame(
            [
                (999, _mins(10_000 + j), "view"),
                (998, _mins(10_000 + j), "purchase"),
            ],
            "user_id long, ts timestamp, event_type string",
        )
        before = set(os.listdir(base))
        sentinel.coalesce(1).write.mode("append").parquet(base)
        late = time.time() + 10_000 + j
        for f in set(os.listdir(base)) - before:
            os.utime(os.path.join(base, f), (late, late))

    got2 = run_once()
    assert got2 == expected
