"""Sketch operators: approximate aggregates stay within their
advertised error; the Count-Min sketch never undercounts, merges
linearly, and is exact in the collision-free regime (both hash
modes)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F


def test_approx_count_distinct_error_bound(spark):
    n = 5000
    df = spark.range(n).select((F.col("id") % 997).alias("k"))
    exact = df.select(F.countDistinct("k")).first()[0]
    approx = df.select(F.approx_count_distinct("k", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact <= 0.06  # 3× rsd headroom


def test_percentile_approx_brackets_exact_median(spark):
    df = spark.range(10001).select(F.col("id").cast("double").alias("v"))
    got = df.select(F.percentile_approx("v", 0.5, 10000)).first()[0]
    assert abs(got - 5000.0) <= 10


def _build_and_estimate(spark, data, probes, hash_mode, width=1024, depth=4):
    from gpi_etl_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([(v,) for v in data], "item string")
    pf = spark.createDataFrame([(p,) for p in probes], "item string")
    sk = cms_build(df, "item", width=width, depth=depth, hash_mode=hash_mode)
    est = cms_estimate(
        sk, pf, "item", width=width, depth=depth, hash_mode=hash_mode
    )
    return {r.item: r.est for r in est.collect()}


@pytest.mark.parametrize("hash_mode", ["xxhash64", "poly"])
def test_never_undercounts_and_absent_is_bounded(spark, hash_mode):
    data = ["a"] * 50 + ["b"] * 30 + [f"t{i}" for i in range(40)]
    truth = Counter(data)
    probes = ["a", "b", "t0", "t39", "missing"]
    got = _build_and_estimate(spark, data, probes, hash_mode)
    assert set(got) == set(probes)
    for p in probes:
        assert got[p] >= truth.get(p, 0)
    # depth=4 rows of width 1024 over 42 distinct items: a collision
    # surviving all 4 rows is astronomically unlikely — estimates are
    # exact here, which pins the bucket arithmetic (not just the bound)
    assert got == {p: truth.get(p, 0) for p in probes}


def test_merge_equals_single_build(spark):
    """Linearity: sketch(A) + sketch(B) == sketch(A ∪ B), counter for
    counter — the property that makes per-day sketches mergeable."""
    from gpi_etl_spark.operators.sketches import cms_build, cms_merge

    a = ["x"] * 7 + ["y"] * 3 + ["z"]
    b = ["x"] * 2 + ["w"] * 5
    fa = spark.createDataFrame([(v,) for v in a], "item string")
    fb = spark.createDataFrame([(v,) for v in b], "item string")
    fall = spark.createDataFrame([(v,) for v in a + b], "item string")
    merged = cms_merge(
        cms_build(fa, "item", width=64, depth=3),
        cms_build(fb, "item", width=64, depth=3),
    )
    whole = cms_build(fall, "item", width=64, depth=3)
    as_map = lambda df: {  # noqa: E731
        (r.row, r.col): r.c for r in df.collect()
    }
    assert as_map(merged) == as_map(whole)


def test_forced_collisions_still_upper_bound(spark):
    """width=2: heavy collisions guaranteed; every estimate must still
    be ≥ truth and ≤ stream size (the trivial upper bound)."""
    data = [f"v{i}" for i in range(60)] + ["hot"] * 40
    truth = Counter(data)
    probes = ["hot", "v0", "nope"]
    got = _build_and_estimate(
        spark, data, probes, "poly", width=2, depth=3
    )
    for p in probes:
        assert truth.get(p, 0) <= got[p] <= len(data)


def test_unknown_hash_mode_raises(spark):
    from gpi_etl_spark.operators.sketches import cms_build

    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError, match="unknown hash_mode"):
        cms_build(df, "item", hash_mode="Poly")
