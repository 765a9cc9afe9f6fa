"""band_range_join must equal a naive theta-join on tiny frames."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from gpi_etl_spark.operators.rangejoin import band_range_join


@pytest.fixture(scope="module")
def frames(spark):
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    intervals = spark.createDataFrame(
        [
            (1, "u1", base, base + dt.timedelta(minutes=30)),
            (2, "u1", base + dt.timedelta(minutes=45), base + dt.timedelta(minutes=75)),
            (3, "u2", base, base + dt.timedelta(hours=3)),
            (4, "u3", base, base + dt.timedelta(minutes=1)),  # never matches
        ],
        "iv_id int, user_id string, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [
            ("u1", base, 100),                                 # == start → in
            ("u1", base + dt.timedelta(minutes=30), 101),      # == end → out (half-open)
            ("u1", base + dt.timedelta(minutes=50), 102),      # iv 2
            ("u2", base + dt.timedelta(hours=2, minutes=59), 103),  # iv 3, 2 bands away
            ("u9", base, 104),                                 # wrong key
        ],
        "user_id string, ts timestamp, point_id int",
    )
    return intervals, points


def naive(intervals, points):
    return (
        intervals.alias("i")
        .join(points.alias("p"), F.expr(
            "i.user_id = p.user_id AND p.ts >= i.start_ts AND p.ts < i.end_ts"
        ))
        .select("iv_id", "point_id")
    )


@pytest.mark.parametrize("band", [60, 600, 3600, 86400])
def test_matches_naive_all_band_widths(spark, frames, band):
    intervals, points = frames
    got = band_range_join(
        intervals, points, "start_ts", "end_ts", "ts", band, keys=["user_id"]
    ).select("iv_id", "point_id")
    want = naive(intervals, points)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert sorted(map(tuple, got.collect())) == [(1, 100), (2, 102), (3, 103)]


def test_left_join_keeps_unmatched_intervals(spark, frames):
    intervals, points = frames
    got = band_range_join(
        intervals, points, "start_ts", "end_ts", "ts", 1800,
        keys=["user_id"], how="left",
    )
    rows = {r.iv_id: r.point_id for r in got.collect()}
    assert rows == {1: 100, 2: 102, 3: 103, 4: None}


def test_left_join_null_attribute_not_duplicated(spark, frames):
    """A matched interval carrying a NULL attribute must NOT reappear as
    a null-padded 'unmatched' row (the anti-join is null-safe)."""
    intervals, points = frames
    iv = intervals.withColumn(
        "note",
        F.when(F.col("iv_id") == 1, F.lit(None).cast("string")).otherwise(F.lit("x")),
    )
    got = band_range_join(
        iv, points, "start_ts", "end_ts", "ts", 1800,
        keys=["user_id"], how="left",
    )
    by_iv = {}
    for r in got.collect():
        by_iv.setdefault(r.iv_id, []).append(r.point_id)
    # iv 1 matched (point 100) despite its NULL note — exactly once
    assert by_iv[1] == [100]
    assert by_iv[4] == [None]
    assert sum(len(v) for v in by_iv.values()) == 4


def test_no_keys_pure_time_band(spark, frames):
    intervals, points = frames
    got = band_range_join(
        intervals.drop("user_id"), points.drop("user_id"),
        "start_ts", "end_ts", "ts", 900,
    ).select("iv_id", "point_id")
    want = (
        intervals.alias("i")
        .join(points.alias("p"),
              F.expr("p.ts >= i.start_ts AND p.ts < i.end_ts"))
        .select("iv_id", "point_id")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_plan_is_equi_join_not_nested_loop(spark, frames):
    intervals, points = frames
    got = band_range_join(
        intervals, points, "start_ts", "end_ts", "ts", 1800, keys=["user_id"]
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_interval_overlap_join_matches_brute_force(spark):
    import random

    from gpi_etl_spark.operators.rangejoin import interval_overlap_join

    rng = random.Random(13)
    B = 1000
    lrows = [
        (i, s := rng.randrange(0, 50 * B), s + rng.randrange(1, 5 * B))
        for i in range(80)
    ]
    rrows = [
        (j, s := rng.randrange(0, 50 * B), s + rng.randrange(1, 3 * B))
        for j in range(40)
    ]
    left = spark.createDataFrame(lrows, "lid long, ls long, le long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long")
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, ("ls", "le"), ("rs", "re"), ["lid"], ["rid"],
            band_us=B,
        ).collect()
    }
    want = {
        (li, rj)
        for li, ls, le in lrows
        for rj, rs, re in rrows
        if ls < re and rs < le
    }
    assert got == want and len(want) > 50


def test_interval_overlap_join_half_open_touching(spark):
    from gpi_etl_spark.operators.rangejoin import interval_overlap_join

    left = spark.createDataFrame([(1, 100, 200)], "lid long, ls long, le long")
    right = spark.createDataFrame(
        [(1, 200, 300), (2, 199, 300), (3, 0, 100), (4, 0, 101)],
        "rid long, rs long, re long",
    )
    got = sorted(
        r.rid
        for r in interval_overlap_join(
            left, right, ("ls", "le"), ("rs", "re"), ["lid"], ["rid"],
            band_us=50,
        ).collect()
    )
    assert got == [2, 4]  # touching endpoints (1, 3) do not overlap


def test_interval_overlap_join_dedups_multi_cell_pairs(spark):
    from gpi_etl_spark.operators.rangejoin import interval_overlap_join

    # both intervals span many shared cells -> exactly one output pair
    left = spark.createDataFrame([(1, 0, 1000)], "lid long, ls long, le long")
    right = spark.createDataFrame([(7, 0, 1000)], "rid long, rs long, re long")
    out = interval_overlap_join(
        left, right, ("ls", "le"), ("rs", "re"), ["lid"], ["rid"],
        band_us=10,
    ).collect()
    assert len(out) == 1


def test_interval_overlap_join_drops_empty_intervals(spark):
    from gpi_etl_spark.operators.rangejoin import interval_overlap_join

    # [500,500) is mathematically empty: must never match anything
    left = spark.createDataFrame(
        [(1, 500, 500), (2, 400, 600)], "lid long, ls long, le long"
    )
    right = spark.createDataFrame(
        [(7, 0, 1000)], "rid long, rs long, re long"
    )
    out = interval_overlap_join(
        left, right, ("ls", "le"), ("rs", "re"), ["lid"], ["rid"],
        band_us=100,
    ).collect()
    assert [r.lid for r in out] == [2]
