"""Incremental high-watermark loading (J1/K4)."""

import datetime as dt

from pyspark.sql import functions as F

from gpi_etl_spark.operators.watermark import (
    compute_watermarks,
    merge_incremental,
    newer_than_watermark,
    replace_partition,
)


def _day(d):
    return dt.date(2024, 1, d)


def test_newer_than_watermark_per_key(spark):
    loaded = spark.createDataFrame(
        [("A", _day(1)), ("A", _day(5)), ("B", _day(3))], "k string, d date"
    )
    incoming = spark.createDataFrame(
        [("A", _day(4)), ("A", _day(6)), ("B", _day(3)), ("C", _day(1))],
        "k string, d date",
    )
    out = {(r.k, r.d) for r in newer_than_watermark(incoming, loaded, ["k"], "d").collect()}
    # A@4 ≤ wm(5) dropped, B@3 = wm dropped, A@6 and new key C kept
    assert out == {("A", _day(6)), ("C", _day(1))}


def test_global_watermark_no_keys(spark):
    loaded = spark.createDataFrame([( _day(5),)], "d date")
    incoming = spark.createDataFrame([(_day(4),), (_day(7),)], "d date")
    out = [r.d for r in newer_than_watermark(incoming, loaded, [], "d").collect()]
    assert out == [_day(7)]


def test_merge_is_idempotent(spark):
    """Second run with the same incoming batch must be a no-op —
    the reference's re-fetch safety (HTGPISNP500/__init__.py:96-99)."""
    loaded = spark.createDataFrame([("A", _day(1))], "k string, d date")
    incoming = spark.createDataFrame([("A", _day(2)), ("A", _day(3))], "k string, d date")
    once = merge_incremental(incoming, loaded, ["k"], "d")
    twice = merge_incremental(incoming, once, ["k"], "d")
    assert once.count() == 3
    assert twice.count() == 3


def test_replace_partition(spark):
    sink = spark.createDataFrame(
        [("2024-01", 1.0), ("2024-01", 2.0), ("2024-02", 3.0)], "month string, v double"
    )
    fresh = spark.createDataFrame([("2024-01", 9.0)], "month string, v double")
    out = replace_partition(sink, fresh, F.col("month") == "2024-01")
    assert {(r.month, r.v) for r in out.collect()} == {("2024-01", 9.0), ("2024-02", 3.0)}


def test_compute_watermarks_shape(spark):
    loaded = spark.createDataFrame([("A", _day(1)), ("A", _day(2))], "k string, d date")
    wm = compute_watermarks(loaded, ["k"], "d")
    assert wm.columns == ["k", "wm_d"]
    assert wm.first().wm_d == _day(2)


def test_numeric_epoch_ts_first_load_kept(spark):
    """New keys (NULL watermark) must pass even for bigint epoch ts."""
    from gpi_etl_spark.operators.watermark import newer_than_watermark

    loaded = spark.createDataFrame([("A", 100)], "sym string, ts long")
    incoming = spark.createDataFrame(
        [("A", 100), ("A", 101), ("B", 50)], "sym string, ts long"
    )
    got = {(r.sym, r.ts) for r in
           newer_than_watermark(incoming, loaded, ["sym"], "ts").collect()}
    assert got == {("A", 101), ("B", 50)}  # B is a new key → kept


def test_replace_partition_keeps_null_key_rows(spark):
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.watermark import replace_partition

    sink = spark.createDataFrame(
        [("2024-01", 1.0), (None, 2.0), ("2024-02", 3.0)], "month string, v double"
    )
    fresh = spark.createDataFrame([("2024-01", 9.0)], "month string, v double")
    got = {(r.month, r.v) for r in
           replace_partition(sink, fresh, F.col("month") == "2024-01").collect()}
    assert got == {("2024-01", 9.0), (None, 2.0), ("2024-02", 3.0)}


def test_scd2_history_compress_and_intervals(spark):
    from datetime import date

    from gpi_etl_spark.operators.watermark import scd2_history

    rows = [
        # key 1: A, A (dup -> compressed), B, A again (new version)
        (1, date(2024, 1, 1), "A"),
        (1, date(2024, 1, 5), "A"),
        (1, date(2024, 2, 1), "B"),
        (1, date(2024, 3, 1), "A"),
        # key 2: NULL -> NULL compresses, NULL -> X versions
        (2, date(2024, 1, 1), None),
        (2, date(2024, 1, 2), None),
        (2, date(2024, 1, 9), "X"),
    ]
    df = spark.createDataFrame(rows, "k long, ts date, attr string")
    out = sorted(
        (
            (r.k, r.valid_from, r.valid_to, r.attr, r.is_current)
            for r in scd2_history(df, ["k"], "ts", ["attr"]).collect()
        )
    )
    assert out == [
        (1, date(2024, 1, 1), date(2024, 2, 1), "A", False),
        (1, date(2024, 2, 1), date(2024, 3, 1), "B", False),
        (1, date(2024, 3, 1), None, "A", True),
        (2, date(2024, 1, 1), date(2024, 1, 9), None, False),
        (2, date(2024, 1, 9), None, "X", True),
    ]


def test_scd2_history_no_compress_keeps_every_change_row(spark):
    from datetime import date

    from gpi_etl_spark.operators.watermark import scd2_history

    rows = [(1, date(2024, 1, d), "A") for d in (1, 2, 3)]
    df = spark.createDataFrame(rows, "k long, ts date, attr string")
    out = scd2_history(df, ["k"], "ts", ["attr"], compress=False).collect()
    assert len(out) == 3
    assert sum(r.is_current for r in out) == 1


def test_point_in_time_join_matches_correct_version(spark):
    from datetime import date

    from gpi_etl_spark.operators.watermark import point_in_time_join

    dim = spark.createDataFrame(
        [
            (1, "bronze", date(2024, 1, 1), date(2024, 2, 1)),
            (1, "gold", date(2024, 2, 1), None),
            (2, "silver", date(2024, 1, 15), None),
        ],
        "k long, tier string, valid_from date, valid_to date",
    )
    facts = spark.createDataFrame(
        [
            (1, date(2024, 1, 10)),   # inside bronze
            (1, date(2024, 2, 1)),    # boundary: new version from-inclusive
            (1, date(2024, 6, 1)),    # open-ended current
            (2, date(2024, 1, 1)),    # before any version -> no match
        ],
        "k long, ts date",
    )
    got = {
        (r.k, r.ts): r.tier
        for r in point_in_time_join(facts, dim, ["k"], "ts").collect()
    }
    assert got == {
        (1, date(2024, 1, 10)): "bronze",
        (1, date(2024, 2, 1)): "gold",
        (1, date(2024, 6, 1)): "gold",
    }


def test_merge_partial_aggs_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.watermark import merge_partial_aggs

    rows = [(i % 4, float(i), i * 1.5) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, q double, p double")

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("q").cast("decimal(18,2)")).alias("sq"),
            F.min("p").alias("mn"),
            F.max("p").alias("mx"),
        )

    # three arbitrary batches, including one that misses some keys
    parts = [
        agg(df.filter("k < 2 and q < 20")),
        agg(df.filter("k >= 2 or q >= 20")),
    ]
    merged = merge_partial_aggs(
        parts, ["k"], cnt_cols=["cnt"], sum_cols=["sq"],
        min_cols=["mn"], max_cols=["mx"],
    )
    full = agg(df)
    m = {r.k: (r.cnt, r.sq, r.mn, r.mx) for r in merged.collect()}
    f = {r.k: (r.cnt, r.sq, r.mn, r.mx) for r in full.collect()}
    assert m == f


def test_merge_partial_aggs_empty_parts_raises(spark):
    import pytest

    from gpi_etl_spark.operators.watermark import merge_partial_aggs

    with pytest.raises(ValueError, match="at least one"):
        merge_partial_aggs([], ["k"])
