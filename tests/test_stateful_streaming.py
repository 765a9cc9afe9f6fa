"""applyInPandasWithState: state must accumulate across micro-batches."""

import datetime as dt
import shutil
import tempfile

import pytest

from gpi_etl_spark.streaming.stateful import running_user_totals


@pytest.fixture(scope="module")
def two_file_events(spark):
    """Two parquet files so maxFilesPerTrigger=1 forces two micro-batches."""
    base = dt.datetime(2024, 1, 1)
    d = tempfile.mkdtemp()
    schema = "event_id long, ts timestamp, user_id long, value double"
    batch1 = [(i, base + dt.timedelta(minutes=i), i % 2, float(i)) for i in range(10)]
    batch2 = [
        (100 + i, base + dt.timedelta(hours=1, minutes=i), i % 2, float(10 * i))
        for i in range(6)
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(d)
    yield d, batch1 + batch2
    shutil.rmtree(d, ignore_errors=True)


def test_running_totals_accumulate_across_batches(spark, two_file_events):
    events_dir, rows = two_file_events
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_running")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()

    emitted = spark.sql("SELECT * FROM t_running").collect()
    # update mode appends one row per (user, batch-with-activity) to the
    # memory sink; the LAST row per user is the final running total
    assert n_batches >= 2, "maxFilesPerTrigger=1 should force ≥2 micro-batches"
    assert len(emitted) > len({r.user_id for r in emitted}), (
        "each user should emit more than once across micro-batches"
    )
    final = {}
    for r in emitted:  # memory sink preserves batch order
        final[r.user_id] = (r.n_events, r.total_value)
    want = {}
    for _eid, _ts, uid, val in rows:
        n, tot = want.get(uid, (0, 0.0))
        want[uid] = (n + 1, tot + val)
    assert final == want


def test_running_ewma_matches_batch_fold(spark, tmp_path):
    """The stateful streaming EWMA's final state must equal the batch
    ewma_final fold bit-for-bit when the stream arrives in one
    ts-sortable delivery."""
    import pandas as pd

    from gpi_etl_spark.operators.windows import ewma_final
    from gpi_etl_spark.streaming.stateful import running_user_ewma

    rows = [
        (1, i, 100 + i, float((i * 37) % 50)) for i in range(40)
    ] + [(2, i, 500 + i, float(i)) for i in range(7)]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, value double"
    ).withColumn("ts", F_ts("ts"))
    path = str(tmp_path / "ewma_landing")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = running_user_ewma(stream, alpha=0.25)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_ewma_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.user_id: (r.n_points, r.ewma)
        for r in spark.table("t_ewma_stream").collect()
    }
    want = {
        r.user_id: (r.n_points, r.ewma)
        for r in ewma_final(
            df, ["user_id"], ["ts", "event_id"], "value", alpha=0.25
        ).collect()
    }
    assert got == want  # exact doubles, not approx


def test_running_ewma_cross_batch_ordering_contract(spark, tmp_path):
    """Pins the make_ewma_update docstring's cross-batch contract: the
    fold is ts-exact WITHIN each delivery and delivery-ordered ACROSS
    deliveries. A second micro-batch that arrives entirely LATE (its
    timestamps precede the first batch's) is folded AFTER it — the
    final state equals the per-delivery-sorted Python replay exactly,
    and measurably diverges from the fully-ts-sorted batch fold (the
    thing a watermark-bounded upstream reorder would be needed for)."""
    import time

    from gpi_etl_spark.operators.windows import ewma_final
    from gpi_etl_spark.streaming.stateful import running_user_ewma

    alpha = 0.25
    # delivery 1: ts 100..119; delivery 2 is LATE — ts 0..19
    b1 = [(1, 100 + i, 1000 + i, float((i * 31) % 17)) for i in range(20)]
    b2 = [(1, i, 2000 + i, float((i * 13) % 11)) for i in range(20)]
    schema = "user_id long, ts long, event_id long, value double"
    land = str(tmp_path / "landing")

    # two files written with distinct mtimes: FileStreamSource orders
    # new files by modification time, so with maxFilesPerTrigger=1 the
    # late file is delivered as the SECOND micro-batch
    df1 = spark.createDataFrame(b1, schema).withColumn("ts", F_ts("ts"))
    df1.coalesce(1).write.mode("append").parquet(land)
    time.sleep(1.2)
    df2 = spark.createDataFrame(b2, schema).withColumn("ts", F_ts("ts"))
    df2.coalesce(1).write.mode("append").parquet(land)

    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = (
        running_user_ewma(stream, alpha=alpha)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_ewma_oo")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    assert n_batches >= 2, "expected one micro-batch per file"

    rows = spark.table("t_ewma_oo").collect()
    # update mode emits once per (user, batch); memory sink preserves
    # batch order, so the LAST row is the final state
    got = (rows[-1].n_points, rows[-1].ewma)
    assert rows[-1].n_points == 40

    def fold(acc_n, acc, vals):
        n, a = acc_n, acc
        for x in vals:
            a = float(x) if n == 0 else alpha * float(x) + (1 - alpha) * a
            n += 1
        return n, a

    # delivery order: batch1 (sorted) then the late batch2 (sorted)
    n, a = fold(0, 0.0, [v for *_k, v in sorted(b1, key=lambda r: r[1])])
    n, a = fold(n, a, [v for *_k, v in sorted(b2, key=lambda r: r[1])])
    assert got == (n, a)  # exact doubles — the stated contract

    # and it is NOT the globally ts-sorted fold (the documented
    # divergence late data causes without an upstream reorder)
    full = spark.createDataFrame(b1 + b2, schema).withColumn(
        "ts", F_ts("ts")
    )
    sorted_fold = ewma_final(
        full, ["user_id"], ["ts", "event_id"], "value", alpha=alpha
    ).collect()[0].ewma
    assert abs(sorted_fold - got[1]) > 1e-9


def F_ts(col):
    from pyspark.sql import functions as F

    return F.timestamp_seconds(F.col(col))
