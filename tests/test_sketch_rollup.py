"""Sketch cubes and the deterministic range planner.

The rollup law under test: a coarser level computed FROM the
finest-grain sketch (register-wise min for kmv, bucket-count addition
for rq) must equal the sketch built directly at that grain — bit
exactly, because both are the same projection of the same input set.
range_plan's cuts must be reproducible and its counts must partition
the input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpi_etl_spark.operators.sketches import (
    kmv_build,
    kmv_estimate,
    kmv_rollup,
    rq_build,
    rq_quantiles,
    rq_rollup,
)
from gpi_etl_spark.operators.skew import range_cuts, range_plan


@pytest.fixture(scope="module")
def items(spark):
    rows = [
        ("a", "x", f"u{i % 37}") for i in range(200)
    ] + [
        ("a", "y", f"v{i % 23}") for i in range(150)
    ] + [
        ("b", "x", f"u{i % 11}") for i in range(90)
    ]
    return spark.createDataFrame(rows, "g1 string, g2 string, item string")


@pytest.mark.parametrize("hash_mode", ["xxhash64", "poly"])
def test_kmv_rollup_equals_direct_build(spark, items, hash_mode):
    fine = kmv_build(
        items, "item", group_cols=("g1", "g2"), k=32, hash_mode=hash_mode
    )
    cube = kmv_rollup(
        fine, ("g1", "g2"), (("g1", "g2"), ("g1",), ("g2",), ())
    )
    got = {
        (r.g1, r.g2, r.gid): (r.reg_sum, r.est)
        for r in cube.collect()
    }
    # 3 fine groups + 2 g1 + 2 g2 + 1 total
    assert len(got) == 8
    for keep, gid in ((("g1",), 1), (("g2",), 2), ((), 3)):
        direct = kmv_estimate(
            kmv_build(
                items, "item", group_cols=tuple(keep), k=32,
                hash_mode=hash_mode,
            ),
            group_cols=tuple(keep),
        )
        for r in direct.collect():
            key = (
                r.g1 if "g1" in keep else None,
                r.g2 if "g2" in keep else None,
                gid,
            )
            assert got[key] == (r.reg_sum, r.est), (keep, key)


def test_kmv_rollup_gid_convention_and_nulls(spark, items):
    fine = kmv_build(items, "item", group_cols=("g1", "g2"), k=16)
    cube = kmv_rollup(fine, ("g1", "g2"))  # default ROLLUP chain
    rows = cube.collect()
    gids = sorted({r.gid for r in rows})
    # ROLLUP chain: full (0), drop g2 (1), drop both (3)
    assert gids == [0, 1, 3]
    for r in rows:
        assert (r.g2 is None) == (r.gid & 1 == 1)
        assert (r.g1 is None) == (r.gid & 2 == 2)


def test_kmv_rollup_rejects_unknown_set_column(spark, items):
    fine = kmv_build(items, "item", group_cols=("g1", "g2"), k=8)
    with pytest.raises(ValueError, match="non-group"):
        kmv_rollup(fine, ("g1", "g2"), (("g1", "nope"),))


def test_kmv_rollup_mixed_family_raises(spark, items):
    a = kmv_build(items, "item", group_cols=("g1",), k=8,
                  hash_mode="xxhash64")
    b = kmv_build(items, "item", group_cols=("g1",), k=8,
                  hash_mode="poly")
    mixed = a.unionByName(b)
    with pytest.raises(Exception, match="DIFFERENT derivation"):
        kmv_rollup(mixed, ("g1",), ((),)).collect()


def test_rq_rollup_equals_direct_build(spark):
    rows = [("a", (i * 7) % 1000) for i in range(400)] + [
        ("b", (i * 13) % 5000 - 2500) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, cents long")
    fine = rq_build(df, "cents", ("g",), digits=3)
    cube = rq_rollup(fine, ("g",))
    got = {(r.g, r.gid): (r.n, r.q_1_2, r.q_9_10, r.q_99_100)
           for r in cube.collect()}
    assert set(got) == {("a", 0), ("b", 0), (None, 1)}
    # grand total from a direct ungrouped build
    direct = rq_quantiles(rq_build(df, "cents", (), digits=3), ())
    r = direct.collect()[0]
    assert got[(None, 1)] == (r.n, r.q_1_2, r.q_9_10, r.q_99_100)
    # per-group levels match the grouped quantiles verbatim
    per = rq_quantiles(fine, ("g",))
    for r in per.collect():
        assert got[(r.g, 0)] == (r.n, r.q_1_2, r.q_9_10, r.q_99_100)


def test_range_plan_partitions_input(spark):
    df = spark.createDataFrame(
        [((i * 97) % 10000,) for i in range(2000)], "cents long"
    )
    plan = range_plan(df, "cents", parts=8).collect()
    assert len(plan) == 8
    assert sum(r.cnt for r in plan) == 2000
    assert all(r.n == 2000 for r in plan)
    # near-uniform data → every bucket within 2x of ideal
    assert all(0.5 <= r.bal_r <= 2.0 for r in plan)
    # cut points are deterministic: a second plan is identical
    again = range_plan(df, "cents", parts=8).collect()
    assert plan == again


def test_range_plan_skew_leaves_holes(spark):
    # one value holds 90% of the mass — duplicate cuts leave empty
    # buckets, and the hot bucket reports the straggler load
    rows = [(5000,)] * 900 + [(i,) for i in range(100)]
    df = spark.createDataFrame(rows, "cents long")
    plan = {r.bucket: r for r in range_plan(df, "cents", parts=4).collect()}
    assert sum(r.cnt for r in plan.values()) == 1000
    assert any(r.cnt == 0 for r in plan.values())
    hot = max(plan.values(), key=lambda r: r.cnt)
    assert hot.cnt >= 900
    assert hot.bal_r >= 3.0


def test_range_cuts_empty_and_all_null_raise(spark):
    empty = spark.createDataFrame([], "cents long")
    with pytest.raises(ValueError, match="no non-NULL"):
        range_cuts(empty, "cents", 4)
    nulls = spark.createDataFrame([(None,), (None,)], "cents long")
    with pytest.raises(ValueError, match="no non-NULL"):
        range_cuts(nulls, "cents", 4)
    with pytest.raises(ValueError, match="parts"):
        range_cuts(empty, "cents", 1)


def test_rollup_empty_sets_raise(spark, items):
    fine = kmv_build(items, "item", group_cols=("g1",), k=8)
    with pytest.raises(ValueError, match="at least one"):
        kmv_rollup(fine, ("g1",), ())
    rq = rq_build(
        spark.createDataFrame([(1,)], "cents long"), "cents", ()
    )
    with pytest.raises(ValueError, match="at least one"):
        rq_rollup(rq, (), ())


def test_band_join_bounds_sandwich_and_exact_collapse(spark):
    from gpi_etl_spark.operators.sketches import (
        rq_band_join_size,
        rq_build,
    )

    # values below 10^3 magnitude are singleton buckets at digits=3 —
    # both bounds must COLLAPSE to the exact band-join size
    a_small = [(v,) for v in (-900, -5, 0, 10, 250, 999)]
    b_small = [(v,) for v in (-910, -4, 240, 260, 998, 500)]
    da = spark.createDataFrame(a_small, "cents long")
    db = spark.createDataFrame(b_small, "cents long")
    got = rq_band_join_size(
        rq_build(da, "cents", ()), rq_build(db, "cents", ()), 20
    ).first()
    exact = sum(
        1
        for (x,) in a_small
        for (y,) in b_small
        if abs(x - y) <= 20
    )
    assert got.n_a == len(a_small) and got.n_b == len(b_small)
    assert got.lower == exact == got.upper

    # wide-bucket values (>= 10^4): bounds must SANDWICH the truth
    a_big = [(v,) for v in (10_000, 12_345, 99_999, 123_456, -45_000)]
    b_big = [(v,) for v in (10_400, 12_999, 100_001, 123_900, -44_700)]
    da = spark.createDataFrame(a_big, "cents long")
    db = spark.createDataFrame(b_big, "cents long")
    got = rq_band_join_size(
        rq_build(da, "cents", ()), rq_build(db, "cents", ()), 500
    ).first()
    exact = sum(
        1
        for (x,) in a_big
        for (y,) in b_big
        if abs(x - y) <= 500
    )
    assert got.lower <= exact <= got.upper
    assert got.upper <= len(a_big) * len(b_big)


def test_band_join_bounds_rejects_negative_band(spark):
    from gpi_etl_spark.operators.sketches import (
        rq_band_join_size,
        rq_build,
    )

    sk = rq_build(
        spark.createDataFrame([(1,)], "cents long"), "cents", ()
    )
    with pytest.raises(ValueError, match="band"):
        rq_band_join_size(sk, sk, -1)


def test_rollup_duplicate_sets_raise(spark, items):
    """A duplicated (or order-equivalent) grouping set would make
    groupingSets emit the level twice under one gid, silently
    doubling that level's n / reg_sum downstream — both rollups must
    reject it loudly (review find)."""
    fine = kmv_build(items, "item", group_cols=("g1", "g2"), k=8)
    # duplicated grand total
    with pytest.raises(ValueError, match="duplicate grouping set"):
        kmv_rollup(fine, ("g1", "g2"), (("g1",), (), ()))
    # explicit duplicate
    with pytest.raises(ValueError, match="duplicate grouping set"):
        kmv_rollup(fine, ("g1", "g2"), (("g1",), ("g1",)))
    # order-equivalent duplicate
    with pytest.raises(ValueError, match="duplicate grouping set"):
        kmv_rollup(fine, ("g1", "g2"), (("g1", "g2"), ("g2", "g1")))
    rq = rq_build(
        spark.createDataFrame([("a", 1)], "g string, cents long"),
        "cents", ("g",),
    )
    with pytest.raises(ValueError, match="duplicate grouping set"):
        rq_rollup(rq, ("g",), ((), ()))


def test_weighted_quantiles_match_expanded_rows(spark):
    """A weight-w row must be indistinguishable from w repeated
    rows — the weighted walk's defining law."""
    from gpi_etl_spark.operators.sketches import (
        rq_build,
        rq_build_weighted,
        rq_quantiles,
    )

    weighted = spark.createDataFrame(
        [(100, 3), (250, 1), (999, 5), (40, 2)], "cents long, w long"
    )
    expanded = spark.createDataFrame(
        [(100,)] * 3 + [(250,)] + [(999,)] * 5 + [(40,)] * 2,
        "cents long",
    )
    a = rq_quantiles(
        rq_build_weighted(weighted, "cents", "w", ()), ()
    ).collect()[0]
    b = rq_quantiles(rq_build(expanded, "cents", ()), ()).collect()[0]
    assert tuple(a) == tuple(b)
    assert a.n == 11
