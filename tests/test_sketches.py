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


# ---------------------------------------------------------------------------
# k-min-registers distinct sketch (kmv_*)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hash_mode", ["xxhash64", "poly"])
def test_kmv_estimate_within_bound(spark, hash_mode):
    """|est − n| / n stays inside ~3× the 1/sqrt(k) theory sd for a
    digit-string key population (the adversarial short-key case the
    cubic premix exists for)."""
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_estimate

    n, k = 700, 128
    df = spark.createDataFrame([(str(i),) for i in range(n)], "item string")
    est = kmv_estimate(
        kmv_build(df, "item", k=k, hash_mode=hash_mode)
    ).first()["est"]
    assert abs(est - n) / n <= 0.30


def test_kmv_duplicates_are_free(spark):
    """min is idempotent: the register table over a multiset equals
    the one over its distinct set, so no dedup pre-pass is REQUIRED
    (q221 adds one purely to shrink the ×k expansion)."""
    from gpi_etl_spark.operators.sketches import kmv_build

    base = [str(i) for i in range(50)]
    dup = spark.createDataFrame([(v,) for v in base * 7], "item string")
    uniq = spark.createDataFrame([(v,) for v in base], "item string")
    as_map = lambda df: {r.i: r.m for r in df.collect()}  # noqa: E731
    assert as_map(kmv_build(dup, "item", k=32, hash_mode="poly")) == as_map(
        kmv_build(uniq, "item", k=32, hash_mode="poly")
    )


def test_kmv_merge_equals_single_build(spark):
    """Register-wise min of shard sketches == sketch of the union —
    the per-day mergeability contract (exercises overlapping shards:
    shared items must not double-count, min is idempotent)."""
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_merge

    a = [str(i) for i in range(40)]
    b = [str(i) for i in range(25, 70)]  # overlaps a
    fa = spark.createDataFrame([(v,) for v in a], "item string")
    fb = spark.createDataFrame([(v,) for v in b], "item string")
    fall = spark.createDataFrame([(v,) for v in a + b], "item string")
    as_map = lambda df: {r.i: r.m for r in df.collect()}  # noqa: E731
    merged = kmv_merge(
        kmv_build(fa, "item", k=32, hash_mode="poly"),
        kmv_build(fb, "item", k=32, hash_mode="poly"),
    )
    whole = kmv_build(fall, "item", k=32, hash_mode="poly")
    assert as_map(merged) == as_map(whole)


def test_kmv_grouped_registers_are_per_group(spark):
    """Groups sketch independently: a group's registers must equal the
    registers of that group's items sketched alone."""
    from gpi_etl_spark.operators.sketches import kmv_build

    rows = [("g1", str(i)) for i in range(30)] + [
        ("g2", str(i)) for i in range(500, 520)
    ]
    df = spark.createDataFrame(rows, "grp string, item string")
    grouped = kmv_build(df, "item", group_cols=("grp",), k=16,
                        hash_mode="poly")
    got_g2 = {r.i: r.m for r in grouped.filter(F.col("grp") == "g2").collect()}
    solo = spark.createDataFrame(
        [(str(i),) for i in range(500, 520)], "item string"
    )
    want = {r.i: r.m for r in kmv_build(solo, "item", k=16,
                                        hash_mode="poly").collect()}
    assert got_g2 == want


def test_kmv_vs_native_hll_same_ballpark(spark):
    """The replayable sketch and Spark's native HLL++ agree on the
    same data within their combined error envelopes (the old q51's
    approx_count_distinct seat, kept as a cross-check)."""
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_estimate

    n, k = 1200, 128
    df = spark.createDataFrame([(str(i),) for i in range(n)], "item string")
    kmv = kmv_estimate(
        kmv_build(df, "item", k=k, hash_mode="poly")
    ).first()["est"]
    hll = df.select(
        F.approx_count_distinct("item", rsd=0.02).alias("c")
    ).first()["c"]
    assert abs(kmv - hll) / hll <= 0.35


def test_kmv_unknown_hash_mode_raises(spark):
    from gpi_etl_spark.operators.sketches import kmv_build

    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError, match="unknown hash_mode"):
        kmv_build(df, "item", hash_mode="md5")


def test_kmv_registers_carry_family_tag(spark):
    """Every register table is stamped with its derivation family —
    the mechanical version tag the cross-family guards key on."""
    from gpi_etl_spark.operators.sketches import KMV_FAMILIES, kmv_build

    df = spark.createDataFrame([(str(i),) for i in range(20)],
                               "item string")
    for mode in ("poly", "xxhash64"):
        fams = {
            r.fam
            for r in kmv_build(df, "item", k=8, hash_mode=mode)
            .select("fam").distinct().collect()
        }
        assert fams == {KMV_FAMILIES[mode]}


def test_kmv_mixed_family_merge_fails_loudly(spark):
    """Register-wise min across hash families is meaningless; the fam
    guard must raise at execution, never return silent garbage
    (advice find on the round-8 derivation change)."""
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import kmv_build, kmv_merge

    df = spark.createDataFrame([(str(i),) for i in range(20)],
                               "item string")
    a = kmv_build(df, "item", k=8, hash_mode="poly")
    b = kmv_build(df, "item", k=8, hash_mode="xxhash64")
    merged = kmv_merge(a, b)
    with pytest.raises(PySparkException, match="DIFFERENT derivation"):
        merged.collect()
    # same-family merge still works and keeps the tag
    ok = kmv_merge(a, a).collect()
    assert len(ok) == 8 and all(r.fam == "affine1-poly" for r in ok)


def test_kmv_mixed_family_overlap_and_estimate_fail_loudly(spark):
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import (
        kmv_build,
        kmv_estimate,
        kmv_overlap,
    )

    df = spark.createDataFrame(
        [(str(i), "s1") for i in range(20)]
        + [(str(i), "s2") for i in range(10, 30)],
        "item string, grp string",
    )
    poly = kmv_build(df, "item", group_cols=("grp",), k=8,
                     hash_mode="poly")
    xx = kmv_build(df, "item", group_cols=("grp",), k=8,
                   hash_mode="xxhash64")
    mixed = poly.filter(F.col("grp") == "s1").unionByName(
        xx.filter(F.col("grp") == "s2")
    )
    with pytest.raises(PySparkException, match="DIFFERENT derivation"):
        kmv_overlap(mixed, "grp").collect()
    with pytest.raises(PySparkException, match="DIFFERENT derivation"):
        kmv_estimate(
            poly.drop("grp").unionByName(xx.drop("grp"))
        ).collect()
    # clean inputs still work
    assert len(kmv_overlap(poly, "grp").collect()) == 1
    assert len(kmv_estimate(poly, group_cols=("grp",)).collect()) == 2


def test_kmv_legacy_untagged_tables_still_merge(spark):
    """Pre-tag register tables (no fam column) keep working unguarded
    — the documented legacy path."""
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_merge

    df = spark.createDataFrame([(str(i),) for i in range(20)],
                               "item string")
    legacy = kmv_build(df, "item", k=8, hash_mode="poly").drop("fam")
    out = kmv_merge(legacy, legacy).collect()
    assert len(out) == 8 and "fam" not in kmv_merge(legacy).columns


def test_fixed_histogram_quantiles_exact_lower_quantile(spark):
    """Matches the hand definition: smallest value whose cumulative
    count reaches ceil(q·n) — including the duplicate-heavy and
    exact-boundary cases interpolation definitions get wrong."""
    from gpi_etl_spark.operators.sketches import fixed_histogram_quantiles

    vals = [100] * 5 + [200] * 4 + [500]  # n=10
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, cents long"
    )
    row = fixed_histogram_quantiles(
        df, ("g",), "cents",
        quantiles=((1, 2), (9, 10), (99, 100)),
    ).collect()[0]
    # ceil(.5*10)=5 → cum(100)=5 → p50=100 (interpolation would say 150)
    # ceil(.9*10)=9 → cum(200)=9 → p90=200; ceil(.99*10)=10 → 500
    assert (row.n, row.q_1_2, row.q_9_10, row.q_99_100) == (
        10, 100, 200, 500,
    )


def test_fixed_histogram_quantiles_match_python_oracle(spark):
    """Property-style sweep vs the pure-Python lower quantile."""
    import math

    from gpi_etl_spark.operators.sketches import fixed_histogram_quantiles

    vals = [((i * 37) % 50) * 10 for i in range(101)]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, cents long"
    )
    row = fixed_histogram_quantiles(df, ("g",), "cents").collect()[0]
    s = sorted(vals)

    def lower_q(num, den):
        return s[math.ceil(num * len(s) / den) - 1]

    assert (row.q_1_2, row.q_9_10, row.q_99_100) == (
        lower_q(1, 2), lower_q(9, 10), lower_q(99, 100),
    )


def test_kmv_estimate_k_is_derived_from_the_sketch(spark):
    """The estimator reads k off the register table (a mismatched
    caller parameter used to silently mis-scale — review find)."""
    from gpi_etl_spark.functions.xhash import P
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_estimate

    df = spark.createDataFrame(
        [(str(i),) for i in range(300)], "item string"
    )
    for k in (32, 128):
        sk = kmv_build(df, "item", k=k, hash_mode="poly")
        row = kmv_estimate(sk).first()
        want = k * float(P) / (row.reg_sum + k) - 1.0
        assert abs(row.est - want) < 1e-6


def test_kmv_overlap_identical_disjoint_and_partial(spark):
    """kmv_overlap's three estimators against ground truth: identical
    sets agree on every register (J=1, inter≈union≈n); disjoint sets
    agree on ~0 (J≈0); a planted 50% overlap lands within the
    MinHash binomial bound."""
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_overlap

    k, n = 128, 600
    rows = (
        [("a", str(i)) for i in range(n)]
        + [("b", str(i)) for i in range(n)]              # b == a
        + [("c", str(i + 10 * n)) for i in range(n)]     # c ∩ a = ∅
        + [("d", str(i)) for i in range(n // 2)]         # d ⊂ a, |d|=n/2
        + [("d", str(i + 20 * n)) for i in range(n // 2)]
    )
    df = spark.createDataFrame(rows, "key string, item string")
    sk = kmv_build(df, "item", group_cols=("key",), k=k, hash_mode="poly")
    got = {
        (r.key_a, r.key_b): r for r in kmv_overlap(sk, "key").collect()
    }
    assert len(got) == 6  # all pairs once, a < b ordering
    ab = got[("a", "b")]
    assert ab.n_match == k and ab.jaccard_e == 1.0
    assert abs(ab.union_e - n) / n < 0.30
    assert abs(ab.inter_e - ab.union_e) < 1e-9  # J=1 → inter == union
    ac = got[("a", "c")]
    assert ac.jaccard_e < 0.05  # disjoint: expected 0, binomial noise
    ad = got[("a", "d")]
    # true J(a, d) = (n/2) / (3n/2) = 1/3; sd ≈ sqrt(J(1-J)/k) ≈ 0.042
    assert abs(ad.jaccard_e - 1 / 3) < 4 * 0.042
    assert abs(ad.inter_e - n / 2) / (n / 2) < 0.5


def test_kmv_overlap_null_key_is_a_set_not_a_drop(spark):
    """kmv_build's groupBy keeps a NULL group as a real sketched set;
    kmv_overlap must pair it (NULL ordered last), not silently drop it
    through a null-rejecting '<' (the q224-class null-unsafe drop —
    review find)."""
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_overlap

    rows = [("a", str(i)) for i in range(200)] + [
        (None, str(i)) for i in range(200)  # NULL key == set a
    ]
    df = spark.createDataFrame(rows, "key string, item string")
    sk = kmv_build(df, "item", group_cols=("key",), k=64, hash_mode="poly")
    got = kmv_overlap(sk, "key").collect()
    assert len(got) == 1
    r = got[0]
    assert r.key_a == "a" and r.key_b is None
    assert r.n_match == 64 and r.jaccard_e == 1.0


# relative-error quantile sketch (rq_*)


def test_rq_exact_below_bucket_threshold(spark):
    """|v| < 10^digits => singleton buckets => quantiles are EXACT
    (must equal the sorted-list lower quantile)."""
    from gpi_etl_spark.operators.sketches import rq_build, rq_quantiles

    vals = [7, 3, 3, 991, 15, 200, 1, 88, 500, 42]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    row = rq_quantiles(rq_build(df, "c", digits=3)).first()
    import math

    sv = sorted(vals)
    for num, den, col in ((1, 2, "q_1_2"), (9, 10, "q_9_10"),
                          (99, 100, "q_99_100")):
        want = sv[math.ceil(num / den * len(sv)) - 1]
        assert row[col] == want, col
    assert row.n == len(vals)


def test_rq_relative_error_bound_long_tail(spark):
    """Pareto-ish magnitudes spanning 8 decades: every reported
    quantile must satisfy rep <= true < rep*(1 + 10^(1-digits))."""
    import math

    from gpi_etl_spark.operators.sketches import rq_build, rq_quantiles

    vals = [int(1.7 ** i) + 1 for i in range(40)]  # 2 .. ~1.6e9
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    row = rq_quantiles(rq_build(df, "c", digits=3)).first()
    sv = sorted(vals)
    for num, den, col in ((1, 2, "q_1_2"), (9, 10, "q_9_10"),
                          (99, 100, "q_99_100")):
        true = sv[math.ceil(num / den * len(sv)) - 1]
        rep = row[col]
        assert rep <= true, col
        assert true < rep * (1 + 10 ** (1 - 3)) + 1, col


def test_rq_merge_equals_whole_and_handles_signs(spark):
    from gpi_etl_spark.operators.sketches import (
        rq_build,
        rq_merge,
        rq_quantiles,
    )

    vals = [-50_000, -7, 0, 0, 3, 12_345, 9_999_999, 42, -1_234_567]
    df = spark.createDataFrame(
        [(v, i % 2) for i, v in enumerate(vals)], "c long, shard int"
    )
    whole = rq_quantiles(rq_build(df, "c", digits=3)).first()
    merged = rq_quantiles(
        rq_merge(
            rq_build(df.filter("shard = 0"), "c", digits=3),
            rq_build(df.filter("shard = 1"), "c", digits=3),
        )
    ).first()
    assert whole == merged
    # median of 9 values is the 5th ascending = 0 (exact bucket)
    assert whole.q_1_2 == 0


def test_rq_mixed_digits_generations_fail_loudly(spark):
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import (
        rq_build,
        rq_merge,
        rq_quantiles,
    )

    df = spark.createDataFrame([(v,) for v in range(1, 50)], "c long")
    mixed = rq_merge(
        rq_build(df, "c", digits=3), rq_build(df, "c", digits=2)
    )
    with pytest.raises(PySparkException, match="digits generations"):
        rq_quantiles(mixed).collect()


def test_rq_build_rejects_bad_digits(spark):
    import pytest

    from gpi_etl_spark.operators.sketches import rq_build

    df = spark.createDataFrame([(1,)], "c long")
    with pytest.raises(ValueError, match="digits"):
        rq_build(df, "c", digits=0)


# replayable Bloom filter (bloom_*)


def test_bloom_no_false_negatives_and_fpr_sane(spark):
    from gpi_etl_spark.operators.sketches import bloom_build, bloom_contains

    members = [f"user{i}" for i in range(400)]
    outsiders = [f"ghost{i}" for i in range(800)]
    mf = spark.createDataFrame([(v,) for v in members], "item string")
    pf = spark.createDataFrame(
        [(v,) for v in members + outsiders], "item string"
    )
    bloom = bloom_build(mf, "item", m_bits=8192, k=4)
    got = {
        r.item: r.maybe_present
        for r in bloom_contains(bloom, pf, "item", m_bits=8192, k=4)
        .collect()
    }
    # NEVER a false negative
    assert all(got[m] for m in members)
    # FPR: theory (1-e^(-k n/m))^k ~ 1.1% at n=400,m=8192,k=4;
    # allow generous headroom
    fps = sum(got[o] for o in outsiders)
    assert fps / len(outsiders) < 0.06, fps


def test_bloom_merge_is_set_union(spark):
    from gpi_etl_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
        bloom_merge,
    )

    a = [f"a{i}" for i in range(50)]
    b = [f"b{i}" for i in range(50)]
    fa = spark.createDataFrame([(v,) for v in a], "item string")
    fb = spark.createDataFrame([(v,) for v in b], "item string")
    fall = spark.createDataFrame([(v,) for v in a + b], "item string")
    merged = bloom_merge(
        bloom_build(fa, "item", m_bits=4096, k=3),
        bloom_build(fb, "item", m_bits=4096, k=3),
    )
    whole = bloom_build(fall, "item", m_bits=4096, k=3)
    as_map = lambda df: {  # noqa: E731
        r.word: r.bits for r in df.collect()
    }
    assert as_map(merged) == as_map(whole)
    # and the merged filter accepts both sides' members
    got = {
        r.item: r.maybe_present
        for r in bloom_contains(
            merged, fall, "item", m_bits=4096, k=3
        ).collect()
    }
    assert all(got.values())


def test_bloom_mixed_geometry_merge_and_probe_fail_loudly(spark):
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
        bloom_merge,
    )

    df = spark.createDataFrame([(f"x{i}",) for i in range(30)],
                               "item string")
    b1 = bloom_build(df, "item", m_bits=4096, k=3)
    b2 = bloom_build(df, "item", m_bits=8192, k=4)
    with pytest.raises(PySparkException, match="DIFFERENT geometries"):
        bloom_merge(b1, b2).collect()
    with pytest.raises(PySparkException, match="does not match"):
        bloom_contains(b1, df, "item", m_bits=8192, k=4).collect()


def test_bloom_duplicates_are_free(spark):
    from gpi_etl_spark.operators.sketches import bloom_build

    base = [f"v{i}" for i in range(40)]
    dup = spark.createDataFrame([(v,) for v in base * 5], "item string")
    uniq = spark.createDataFrame([(v,) for v in base], "item string")
    as_map = lambda df: {  # noqa: E731
        r.word: r.bits for r in df.collect()
    }
    assert as_map(bloom_build(dup, "item", m_bits=2048, k=4)) == as_map(
        bloom_build(uniq, "item", m_bits=2048, k=4)
    )


# CMS inner-product join-size estimator


def test_cms_join_size_never_undercounts_and_exact_when_collision_free(
    spark,
):
    from collections import Counter

    from gpi_etl_spark.operators.sketches import cms_build, cms_join_size

    a = ["u1"] * 5 + ["u2"] * 3 + ["u3"] + [f"x{i}" for i in range(20)]
    b = ["u1"] * 2 + ["u2"] * 7 + ["u4"] * 4 + [f"y{i}" for i in range(10)]
    fa, fb = Counter(a), Counter(b)
    truth = sum(fa[k] * fb[k] for k in fa.keys() & fb.keys())
    da = spark.createDataFrame([(v,) for v in a], "item string")
    db = spark.createDataFrame([(v,) for v in b], "item string")
    ka = cms_build(da, "item", width=1024, depth=4, hash_mode="poly")
    kb = cms_build(db, "item", width=1024, depth=4, hash_mode="poly")
    est = cms_join_size(ka, kb).first().est_join_size
    assert est >= truth
    # 50-ish distinct items in 1024 buckets x4 rows: collision-free
    assert est == truth


def test_cms_join_size_disjoint_keys_is_zero_or_tiny(spark):
    from gpi_etl_spark.operators.sketches import cms_build, cms_join_size

    da = spark.createDataFrame([(f"a{i}",) for i in range(30)],
                               "item string")
    db = spark.createDataFrame([(f"b{i}",) for i in range(30)],
                               "item string")
    ka = cms_build(da, "item", width=1024, depth=4, hash_mode="poly")
    kb = cms_build(db, "item", width=1024, depth=4, hash_mode="poly")
    est = cms_join_size(ka, kb).first().est_join_size
    # truth is 0; collisions may add a little, min-over-rows usually 0
    assert 0 <= est <= 5


def test_cms_join_size_heavy_collision_still_upper_bound(spark):
    from collections import Counter

    from gpi_etl_spark.operators.sketches import cms_build, cms_join_size

    a = [f"k{i}" for i in range(40)] * 2
    b = [f"k{i}" for i in range(20, 60)]
    fa, fb = Counter(a), Counter(b)
    truth = sum(fa[k] * fb[k] for k in fa.keys() & fb.keys())
    da = spark.createDataFrame([(v,) for v in a], "item string")
    db = spark.createDataFrame([(v,) for v in b], "item string")
    ka = cms_build(da, "item", width=4, depth=3, hash_mode="poly")
    kb = cms_build(db, "item", width=4, depth=3, hash_mode="poly")
    est = cms_join_size(ka, kb).first().est_join_size
    assert est >= truth  # never undercounts, however crowded


def test_cms_join_size_depth_mismatch_fails_loudly(spark):
    """A caller mixing sketches of different depths used to get a
    silent 0 — an undercount from the never-undercount estimator
    (review find). Depth is now derived from each table and asserted
    equal; since round 10 the geometry STAMP comparison catches the
    mismatch first (it sees width and hash family too — the
    row-derived depth check remains as the legacy-table fallback)."""
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import cms_build, cms_join_size

    da = spark.createDataFrame([(f"k{i}",) for i in range(30)],
                               "item string")
    ka = cms_build(da, "item", width=64, depth=4, hash_mode="poly")
    kb = cms_build(da, "item", width=64, depth=3, hash_mode="poly")
    with pytest.raises(PySparkException, match="geometry stamps"):
        cms_join_size(ka, kb).collect()
    # legacy (unstamped) tables still die on the derived-depth check
    with pytest.raises(PySparkException, match="DIFFERENT depths"):
        cms_join_size(ka.drop("geo"), kb.drop("geo")).collect()


def test_cms_join_size_empty_side_is_zero(spark):
    from gpi_etl_spark.operators.sketches import cms_build, cms_join_size

    da = spark.createDataFrame([(f"k{i}",) for i in range(10)],
                               "item string")
    empty = spark.createDataFrame([], "item string")
    ka = cms_build(da, "item", width=64, depth=4, hash_mode="poly")
    ke = cms_build(empty, "item", width=64, depth=4, hash_mode="poly")
    assert cms_join_size(ka, ke).first().est_join_size == 0


@pytest.mark.parametrize("hash_mode", ["xxhash64", "poly"])
def test_cms_apply_equals_rebuild(spark, hash_mode):
    """The linearity law: folding a retraction delta into the base
    sketch is BIT-IDENTICAL (as a set of counter rows, zeros dropped)
    to building fresh over the corrected corpus — including buckets
    that cancel to exactly 0, which must DISAPPEAR, not persist as
    0-rows."""
    from gpi_etl_spark.operators.sketches import (
        cms_apply,
        cms_build,
        cms_build_weighted,
    )

    rows = [("a",)] * 3 + [("b",)] * 2 + [("c",)] * 4
    df = spark.createDataFrame(rows, "item string")
    base = cms_build(df, "item", width=64, depth=4, hash_mode=hash_mode)
    # retract ALL of a (a's solo buckets must vanish entirely)
    delta = cms_build_weighted(
        spark.createDataFrame([("a", -3)], "item string, w long"),
        "item", "w", width=64, depth=4, hash_mode=hash_mode,
    )
    maint = sorted(map(tuple, cms_apply(base, delta).collect()))
    rebuilt = sorted(map(tuple, cms_build(
        spark.createDataFrame(rows[3:], "item string"),
        "item", width=64, depth=4, hash_mode=hash_mode,
    ).collect()))
    assert maint == rebuilt


def test_cms_weighted_positive_equals_repeated_rows(spark):
    from gpi_etl_spark.operators.sketches import cms_build, cms_build_weighted

    rep = spark.createDataFrame(
        [("x",)] * 5 + [("y",)] * 2, "item string"
    )
    wtd = spark.createDataFrame(
        [("x", 5), ("y", 2)], "item string, w long"
    )
    a = sorted(map(tuple, cms_build(
        rep, "item", width=32, depth=3, hash_mode="poly").collect()))
    b = sorted(map(tuple, cms_build_weighted(
        wtd, "item", "w", width=32, depth=3, hash_mode="poly").collect()))
    assert a == b


def test_cms_apply_keeps_never_undercount_for_subset_retraction(spark):
    """Retracting only previously-inserted rows keeps every net ≥ 0,
    so the min estimator over the maintained sketch never undercounts
    the corrected truth — including forgotten keys (truth 0)."""
    from gpi_etl_spark.operators.sketches import (
        cms_apply,
        cms_build,
        cms_build_weighted,
        cms_estimate,
    )

    data = [(f"k{i % 20}",) for i in range(200)]
    df = spark.createDataFrame(data, "item string")
    base = cms_build(df, "item", width=16, depth=4, hash_mode="poly")
    # forget k0..k4 entirely (10 rows each)
    delta = cms_build_weighted(
        spark.createDataFrame(
            [(f"k{i}", -10) for i in range(5)], "item string, w long"
        ),
        "item", "w", width=16, depth=4, hash_mode="poly",
    )
    maint = cms_apply(base, delta)
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(20)], "item string"
    )
    est = {
        r.item: r.est
        for r in cms_estimate(
            maint, probes, "item", width=16, depth=4, hash_mode="poly"
        ).collect()
    }
    for i in range(20):
        truth = 0 if i < 5 else 10
        assert est[f"k{i}"] >= truth, (i, est[f"k{i}"])


def test_cms_weighted_null_weight_raises(spark):
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import cms_build_weighted

    bad = spark.createDataFrame(
        [("x", 3), ("y", None)], "item string, w long"
    )
    with pytest.raises(PySparkException, match="NULL weight"):
        cms_build_weighted(
            bad, "item", "w", width=32, depth=3, hash_mode="poly"
        ).collect()


def test_rq_apply_equals_rebuild(spark):
    """rq linearity law: folding a retraction delta into the base
    bucket table is bit-identical to building fresh over the kept
    rows — including buckets canceling to exactly 0 (dropped)."""
    from gpi_etl_spark.operators.sketches import (
        rq_apply,
        rq_build,
        rq_build_weighted,
    )

    rows = [("a", 120), ("a", 120), ("a", 4500), ("b", 77), ("b", 99)]
    df = spark.createDataFrame(rows, "g string, cents long")
    base = rq_build(df, "cents", ("g",), digits=3)
    # retract both 120s (their bucket cancels to 0) and one 77
    delta = rq_build_weighted(
        spark.createDataFrame(
            [("a", 120, -2), ("b", 77, -1)], "g string, cents long, w long"
        ),
        "cents", "w", ("g",), digits=3,
    )
    maint = sorted(map(tuple, rq_apply(base, delta).collect()))
    rebuilt = sorted(map(tuple, rq_build(
        spark.createDataFrame(
            [("a", 4500), ("b", 99)], "g string, cents long"
        ),
        "cents", ("g",), digits=3,
    ).collect()))
    assert maint == rebuilt


def test_apply_over_retraction_raises(spark):
    """A fold that drives any bucket negative proves the CDC contract
    was violated — both apply paths must fail loudly, not walk on."""
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import (
        cms_apply,
        cms_build,
        cms_build_weighted,
        rq_apply,
        rq_build,
        rq_build_weighted,
    )

    df = spark.createDataFrame([("x",)], "item string")
    base = cms_build(df, "item", width=32, depth=3, hash_mode="poly")
    over = cms_build_weighted(
        spark.createDataFrame([("x", -2)], "item string, w long"),
        "item", "w", width=32, depth=3, hash_mode="poly",
    )
    with pytest.raises(PySparkException, match="NEGATIVE"):
        cms_apply(base, over).collect()

    dfq = spark.createDataFrame([(500,)], "cents long")
    rbase = rq_build(dfq, "cents", (), digits=3)
    rover = rq_build_weighted(
        spark.createDataFrame([(500, -2)], "cents long, w long"),
        "cents", "w", (), digits=3,
    )
    with pytest.raises(PySparkException, match="NEGATIVE"):
        rq_apply(rbase, rover).collect()


def test_rq_weighted_null_weight_raises(spark):
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import rq_build_weighted

    bad = spark.createDataFrame(
        [(100, 1), (200, None)], "cents long, w long"
    )
    with pytest.raises(PySparkException, match="NULL weight"):
        rq_build_weighted(bad, "cents", "w", (), digits=3).collect()


def test_cms_merge_mixed_geometry_raises(spark):
    """Counters from different (width, depth, hash family) builds are
    incompatible bucket spaces; before the geo stamp cms_merge added
    them without error (advice find). Same-geometry merges keep the
    stamp; legacy unstamped tables still merge (unguarded)."""
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import cms_build, cms_merge

    da = spark.createDataFrame([(f"k{i}",) for i in range(50)],
                               "item string")
    a = cms_build(da, "item", width=64, depth=3, hash_mode="poly")
    b = cms_build(da, "item", width=32, depth=3, hash_mode="poly")
    with pytest.raises(PySparkException, match="geometry stamps"):
        cms_merge(a, b).collect()
    # hash-family drift at identical width/depth is ALSO a mismatch
    c = cms_build(da, "item", width=64, depth=3, hash_mode="xxhash64")
    with pytest.raises(PySparkException, match="geometry stamps"):
        cms_merge(a, c).collect()
    merged = cms_merge(a, a).collect()
    assert all(r.geo == "cms1-poly-w64-d3" for r in merged)
    # legacy path: no geo column, no guard, same counters as before
    legacy = cms_merge(a.drop("geo"), a.drop("geo"))
    assert sorted((r.row, r.col, r.c) for r in legacy.collect()) == sorted(
        (r.row, r.col, r.c) for r in merged
    )


def test_cms_estimate_param_mismatch_raises(spark):
    """cms_estimate's docstring used to say a width/depth/hash_mode
    mismatch was 'structurally undetectable' — the stamp makes it
    detectable, and silent never-undercount breakage becomes a loud
    error."""
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import cms_build, cms_estimate

    da = spark.createDataFrame([(f"k{i}",) for i in range(50)],
                               "item string")
    sk = cms_build(da, "item", width=64, depth=3, hash_mode="poly")
    probes = spark.createDataFrame([("k1",)], "item string")
    with pytest.raises(PySparkException, match="geometry stamp"):
        cms_estimate(sk, probes, "item", width=32, depth=3,
                     hash_mode="poly").collect()
    ok = cms_estimate(sk, probes, "item", width=64, depth=3,
                      hash_mode="poly").collect()
    assert ok[0].est >= 1


def test_cms_apply_carries_geo_stamp(spark):
    """The maintained sketch must stay guarded through the NEXT apply:
    cms_apply output carries the stamp, and folding a delta of a
    different geometry raises."""
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import (
        cms_apply,
        cms_build,
        cms_build_weighted,
    )

    # 200 distinct items over a 3×64 grid: every cell of the narrower
    # 3×32 bad-delta grid is occupied in the maintained sketch, so the
    # per-cell geo guard deterministically sees the mix (fixed hashes)
    da = spark.createDataFrame(
        [(f"k{i % 200}",) for i in range(400)], "item string"
    )
    base = cms_build(da, "item", width=64, depth=3, hash_mode="poly")
    delta = cms_build_weighted(
        spark.createDataFrame([("k1", -2)], "item string, w bigint"),
        "item", "w", width=64, depth=3, hash_mode="poly",
    )
    maint = cms_apply(base, delta)
    assert "geo" in maint.columns
    # POSITIVE weight: the retraction guard cannot fire, so the error
    # below is attributable to the geometry guard alone
    bad = cms_build_weighted(
        spark.createDataFrame([("k1", 1)], "item string, w bigint"),
        "item", "w", width=32, depth=3, hash_mode="poly",
    )
    with pytest.raises(PySparkException, match="geometry stamps"):
        cms_apply(maint, bad).collect()


# ---------------------------------------------------------------------------
# AMS tug-of-war F2 sketch (ams_*)
# ---------------------------------------------------------------------------


def _f2(counter):
    return sum(v * v for v in counter.values())


@pytest.mark.parametrize("hash_mode", ["xxhash64", "poly"])
def test_ams_f2_within_bound(spark, hash_mode):
    """mean(X_i²) estimates F₂ with relative sd ≈ sqrt(2/k); assert a
    ~3-sd envelope at k=128 (≈ 12.5% sd → 38% bound) on a skewed
    multiset where F₂ is 6× the distinct count."""
    from gpi_etl_spark.operators.sketches import ams_build, ams_f2

    data = [f"u{i}" for i in range(200)] + ["hot"] * 30 + ["warm"] * 10
    truth = _f2(Counter(data))
    df = spark.createDataFrame([(v,) for v in data], "item string")
    sk = ams_build(df, "item", k=128, hash_mode=hash_mode)
    row = ams_f2(sk).first()
    assert row.k == 128
    est = float(row.f2_num) / row.k
    assert abs(est - truth) / truth <= 0.38
    assert abs(row.f2_r - est) < 1e-5


def test_ams_merge_equals_single_build(spark):
    """Linearity: component-wise sum of shard sketches == sketch of
    the concatenation (multiplicities ADD — unlike kmv's min, overlap
    double-counts by design, that is what F₂ means)."""
    from gpi_etl_spark.operators.sketches import ams_build, ams_merge

    a = [f"u{i}" for i in range(40)] + ["hot"] * 5
    b = [f"u{i}" for i in range(20, 60)] + ["hot"] * 7
    fa = spark.createDataFrame([(v,) for v in a], "item string")
    fb = spark.createDataFrame([(v,) for v in b], "item string")
    fall = spark.createDataFrame([(v,) for v in a + b], "item string")
    as_map = lambda df: {r.i: r.x for r in df.collect()}  # noqa: E731
    merged = ams_merge(
        ams_build(fa, "item", k=32, hash_mode="poly"),
        ams_build(fb, "item", k=32, hash_mode="poly"),
    )
    whole = ams_build(fall, "item", k=32, hash_mode="poly")
    assert as_map(merged) == as_map(whole)


def test_ams_mixed_family_raises(spark):
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import (
        ams_build,
        ams_f2,
        ams_merge,
    )

    df = spark.createDataFrame([(f"u{i}",) for i in range(30)],
                               "item string")
    a = ams_build(df, "item", k=16, hash_mode="poly")
    b = ams_build(df, "item", k=16, hash_mode="xxhash64")
    with pytest.raises(PySparkException, match="DIFFERENT"):
        ams_merge(a, b).collect()
    with pytest.raises(PySparkException, match="DIFFERENT"):
        ams_f2(a.unionByName(b)).collect()


def test_ams_retraction_fold_matches_rebuild(spark):
    """The sketch is linear: folding a sign-flipped delta (CDC
    retractions as an x-negated component table) equals rebuilding
    over the corrected corpus — component for component."""
    from gpi_etl_spark.operators.sketches import ams_build, ams_merge

    base = [f"u{i % 9}" for i in range(60)]
    gone = [v for v in base if v in ("u1", "u4")]
    kept = [v for v in base if v not in ("u1", "u4")]
    fb = spark.createDataFrame([(v,) for v in base], "item string")
    fg = spark.createDataFrame([(v,) for v in gone], "item string")
    fk = spark.createDataFrame([(v,) for v in kept], "item string")
    delta = ams_build(fg, "item", k=32, hash_mode="poly").withColumn(
        "x", -F.col("x")
    )
    maint = ams_merge(ams_build(fb, "item", k=32, hash_mode="poly"),
                      delta)
    rebuilt = ams_build(fk, "item", k=32, hash_mode="poly")
    as_map = lambda df: {r.i: r.x for r in df.collect()}  # noqa: E731
    assert as_map(maint) == as_map(rebuilt)


def test_ams_weighted_equals_repeated_rows(spark):
    """Linearity law behind the q252 distinct-pre-pass optimization:
    components built from a (value, frequency) table are bit-identical
    to components built from the repeated rows — both hash modes,
    with and without group columns."""
    from gpi_etl_spark.operators.sketches import (
        ams_build,
        ams_build_weighted,
    )

    rows = [("a", "x")] * 5 + [("a", "y")] * 2 + [("b", "x")] * 3
    rep = spark.createDataFrame(rows, "g string, item string")
    wtd = spark.createDataFrame(
        [("a", "x", 5), ("a", "y", 2), ("b", "x", 3)],
        "g string, item string, w long",
    )
    for hm in ("poly", "xxhash64"):
        a = sorted(map(tuple, ams_build(
            rep, "item", group_cols=("g",), k=16, hash_mode=hm,
        ).collect()))
        b = sorted(map(tuple, ams_build_weighted(
            wtd, "item", "w", group_cols=("g",), k=16, hash_mode=hm,
        ).collect()))
        assert a == b


def test_ams_weighted_null_weight_raises(spark):
    """NULL weights are malformed feed rows — the cms_build_weighted
    contract, enforced by the shared guard."""
    import pytest
    from gpi_etl_spark.operators.sketches import ams_build_weighted

    bad = spark.createDataFrame(
        [("x", 2), ("y", None)], "item string, w long"
    )
    with pytest.raises(Exception, match="NULL weight"):
        ams_build_weighted(bad, "item", "w", k=8,
                           hash_mode="poly").collect()


def test_ams_k_drift_raises_and_empty_sketch_is_null(spark):
    """Review finds, round 10: (a) same-family different-k sketches
    share low component indexes and used to ADD silently into a
    biased F2 — the fam stamp now carries k and the merge raises;
    (b) an EMPTY global sketch used to die claiming a family mix —
    it now returns k=0 with NULL estimates."""
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import (
        ams_build,
        ams_f2,
        ams_merge,
    )

    df = spark.createDataFrame([(f"u{i}",) for i in range(30)],
                               "item string")
    a8 = ams_build(df, "item", k=8, hash_mode="poly")
    a16 = ams_build(df, "item", k=16, hash_mode="poly")
    with pytest.raises(PySparkException, match="DIFFERENT"):
        ams_merge(a8, a16).collect()
    empty = ams_build(
        spark.createDataFrame([], "item string"), "item", k=8,
        hash_mode="poly",
    )
    row = ams_f2(empty).first()
    assert row.k == 0 and row.f2_num is None and row.f2_r is None


def test_cms_merge_guards_geo_output_too(spark):
    """The both-columns rule: a consumer projecting ONLY the stamp
    from a mixed-geometry merge must hit the guard, not read a
    clean-looking max(geo)."""
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import cms_build, cms_merge

    da = spark.createDataFrame([(f"k{i}",) for i in range(50)],
                               "item string")
    a = cms_build(da, "item", width=64, depth=3, hash_mode="poly")
    b = cms_build(da, "item", width=32, depth=3, hash_mode="poly")
    with pytest.raises(PySparkException, match="geometry stamps"):
        cms_merge(a, b).select("row", "col", "geo").collect()


def test_cms_merge_disjoint_cells_mixed_geometry_raises(spark):
    """Round-11 advice find: the per-cell stamp check only fired when
    two geometries COLLIDED on a shared (row, col) cell, so two sparse
    sketches of different geometries with disjoint populated cells
    merged silently — probabilistic where the kmv fam check is
    deterministic. The whole-table min/max-geo window makes the check
    deterministic; hand-built single-cell counter tables are the
    adversarial case (no shared cell at all)."""
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import cms_merge

    schema = "row int, col int, c bigint, geo string"
    a = spark.createDataFrame([(0, 0, 5, "cms1-poly-w64-d3")], schema)
    b = spark.createDataFrame([(1, 1, 7, "cms1-poly-w32-d3")], schema)
    with pytest.raises(PySparkException, match="geometry stamps"):
        cms_merge(a, b).collect()
    # same stamp on disjoint cells is of course fine
    b_same = spark.createDataFrame(
        [(1, 1, 7, "cms1-poly-w64-d3")], schema
    )
    rows = {(r.row, r.col): r.c for r in cms_merge(a, b_same).collect()}
    assert rows == {(0, 0): 5, (1, 1): 7}


def test_cms_join_size_one_side_stamped_checks_depth(spark):
    """Round-11 advice find: a stamped x legacy-untagged pair used to
    skip the geometry assertion entirely (both_geo was False), so a
    stamped sketch whose geometry disagreed with the untagged side's
    implied depth estimated silently. Now the stamped side's
    d-segment is asserted against the other side's derived depth;
    width/hash family on the untagged side remain by-contract
    (documented asymmetry)."""
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import cms_build, cms_join_size

    da = spark.createDataFrame(
        [(f"k{i}",) for i in range(30)], "item string"
    )
    ka = cms_build(da, "item", width=64, depth=4, hash_mode="poly")
    kb = cms_build(da, "item", width=64, depth=3, hash_mode="poly")
    # depth disagreement now raises in BOTH one-sided orientations
    with pytest.raises(PySparkException, match="geometry stamps"):
        cms_join_size(ka, kb.drop("geo")).collect()
    with pytest.raises(PySparkException, match="geometry stamps"):
        cms_join_size(ka.drop("geo"), kb).collect()
    # depth agreement: the one-sided estimate equals the both-stamped
    # estimate (the stamp adds checking, never changes the number)
    both = cms_join_size(ka, ka).first().est_join_size
    one = cms_join_size(ka, ka.drop("geo")).first().est_join_size
    assert one == both == cms_join_size(
        ka.drop("geo"), ka
    ).first().est_join_size


def test_iblt_reconciles_inserts_and_deletes_exactly(spark):
    """The subtracted IBLT must peel back the EXACT symmetric
    difference — A-only keys with side +1, B-only with -1 — and
    drain every cell to zeros (ok=True)."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.sketches import iblt_cells, iblt_decode

    a = spark.createDataFrame(
        [(k, 1) for k in range(2000)], "k long, s int"
    )
    b_keys = [k for k in range(2000) if k % 131 != 5] + [
        900000 + k for k in range(9)
    ]
    b = spark.createDataFrame([(k, -1) for k in b_keys], "k long, s int")
    cells = iblt_cells(a.unionByName(b), "k", "s", 256, hash_mode="poly")
    decoded, ok = iblt_decode(cells.collect(), 256)
    assert ok
    a_only = sorted(k for k, s in decoded if s == 1)
    b_only = sorted(k for k, s in decoded if s == -1)
    assert a_only == [k for k in range(2000) if k % 131 == 5]
    assert b_only == [900000 + k for k in range(9)]


def test_iblt_identical_replicas_decode_empty(spark):
    from gpi_etl_spark.operators.sketches import iblt_cells, iblt_decode

    a = spark.createDataFrame([(k, 1) for k in range(500)], "k long, s int")
    b = spark.createDataFrame([(k, -1) for k in range(500)], "k long, s int")
    cells = iblt_cells(a.unionByName(b), "k", "s", 128, hash_mode="poly")
    decoded, ok = iblt_decode(cells.collect(), 128)
    assert ok and decoded == []
    # every cell row exists and is all-zeros (the m-row spine)
    rows = cells.collect()
    assert len(rows) == 128
    assert all(r.cnt == 0 and r.key_sum == 0 and r.chk_sum == 0 for r in rows)


def test_iblt_undersized_m_reports_not_ok(spark):
    """A difference far beyond m/1.3 cannot fully peel: ok must be
    False (the caller's rebuild signal), never a silent partial
    answer presented as complete."""
    from gpi_etl_spark.operators.sketches import iblt_cells, iblt_decode

    a = spark.createDataFrame([(k, 1) for k in range(400)], "k long, s int")
    b = spark.createDataFrame([(90000, -1)], "k long, s int")
    cells = iblt_cells(a.unionByName(b), "k", "s", 16, hash_mode="poly")
    decoded, ok = iblt_decode(cells.collect(), 16)
    assert not ok


def test_iblt_rejects_bad_keys(spark):
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sketches import iblt_cells

    bad = spark.createDataFrame([(-5, 1)], "k long, s int")
    with pytest.raises(PySparkException, match="non-negative"):
        iblt_cells(bad, "k", "s", 64).collect()
    wide = spark.createDataFrame([(10**15, 1)], "k long, s int")
    with pytest.raises(PySparkException, match="below"):
        iblt_cells(wide, "k", "s", 64).collect()


def test_cms_join_size_unparseable_stamp_fails_loudly(spark):
    """Round-12 (ADVICE r11): if the stamp fails the '-d(\\d+)$'
    parse, the derived depth is NULL and a bare F.when(NULL, raise)
    would silently SKIP the one-side-stamped assertion — the exact
    failure mode the round-11 change closed would reopen on any
    stamp-format drift. The predicate is coalesced to True, so an
    unparseable stamp raises instead of estimating."""
    import pytest
    from pyspark.errors import PySparkException
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.sketches import cms_build, cms_join_size

    da = spark.createDataFrame(
        [(f"k{i}",) for i in range(30)], "item string"
    )
    ka = cms_build(da, "item", width=64, depth=4, hash_mode="poly")
    drifted = ka.withColumn("geo", F.lit("w64-poly-vNEXT"))  # no -d<N>
    with pytest.raises(PySparkException, match="geometry stamps"):
        cms_join_size(drifted, ka.drop("geo")).collect()
    with pytest.raises(PySparkException, match="geometry stamps"):
        cms_join_size(ka.drop("geo"), drifted).collect()


def test_iblt_cells_rejects_non_poly_hash_mode(spark):
    """Round-12 (ADVICE r11): decode's driver-side hash twins are
    poly-only, so xxhash64-built cells could never peel (every decode
    ok=False). The dead parameter now fails at build time."""
    import pytest

    from gpi_etl_spark.operators.sketches import iblt_cells

    a = spark.createDataFrame([(1, 1)], "k long, s int")
    with pytest.raises(ValueError, match="poly-only"):
        iblt_cells(a, "k", "s", 64, hash_mode="xxhash64")


def test_rq_range_estimate_bucket_aligned_is_exact(spark):
    """A predicate whose bounds lie ON bucket edges sums whole-bucket
    counts — the estimate must equal the exact count (no
    interpolation), and the replayed arithmetic is pure int64."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.sketches import rq_build, rq_range_estimate

    # values 1000..9999: digits=3 buckets are width-10 [d000, d009]...
    vals = [(1000 + (i * 7919) % 9000,) for i in range(5000)]
    df = spark.createDataFrame(vals, "v long")
    sk = rq_build(df, "v", digits=3)
    # [2000, 4999] aligns on digits=3 bucket edges at this magnitude
    out = {
        r.pred_id: r
        for r in rq_range_estimate(sk, [(2000, 4999)]).collect()
    }
    exact = df.filter((F.col("v") >= 2000) & (F.col("v") <= 4999)).count()
    assert out[0].est_rows == exact
    assert out[0].n_buckets > 0


def test_rq_range_estimate_negative_and_disjoint(spark):
    """Negative-value bucket bounds (sign=-1 mirror) and a predicate
    disjoint from the data must both behave: the disjoint predicate
    estimates 0 over 0 buckets; a full-domain predicate returns n."""
    from gpi_etl_spark.operators.sketches import rq_build, rq_range_estimate

    df = spark.createDataFrame(
        [(-(1000 + i),) for i in range(500)] + [(1000 + i,) for i in range(500)],
        "v long",
    )
    sk = rq_build(df, "v", digits=3)
    out = {
        r.pred_id: r
        for r in rq_range_estimate(
            sk, [(-2000, 2000), (50_000, 60_000), (-1499, -1000)]
        ).collect()
    }
    assert out[0].est_rows == 1000
    assert out[1] .est_rows == 0 and out[1].n_buckets == 0
    assert out[2].est_rows == 500


def test_rq_range_estimate_interpolation_envelope(spark):
    """A sub-bucket predicate interpolates uniformly: on uniform data
    the estimate lands within the boundary buckets' mass of exact
    (relative bucket width <= 1% at digits=3)."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.sketches import rq_build, rq_range_estimate

    df = spark.createDataFrame(
        [(100_000 + i,) for i in range(100_000)], "v long"
    )
    sk = rq_build(df, "v", digits=3)
    lo, hi = 123_456, 154_321
    est = rq_range_estimate(sk, [(lo, hi)]).first().est_rows
    exact = df.filter((F.col("v") >= lo) & (F.col("v") <= hi)).count()
    # digits=3 buckets at this magnitude hold 1000 uniform values
    assert abs(est - exact) <= 2000


def test_kmv_min_columns_build_equals_posexplode_reference(spark):
    """Round-13 shape law: kmv_build's k-min-columns + unpivot form
    must be register-for-register identical to the original
    posexplode-per-row reference build — grouped and ungrouped, both
    hash modes, with NULL items in the stream (a group of only-NULL
    items keeps its k NULL registers) and an empty input (empty
    table, not one row of NULLs)."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.functions import xhash
    from gpi_etl_spark.functions.hof import let_
    from gpi_etl_spark.operators.sketches import (
        KMV_FAMILIES,
        KMV_P,
        kmv_build,
    )

    def reference_build(items, item_col, group_cols, k, hash_mode):
        if hash_mode == "poly":
            base = xhash.poly_hash(F.col(item_col))
        else:
            base = F.pmod(F.xxhash64(F.col(item_col)), F.lit(KMV_P))
        regs_arr = let_(
            base,
            lambda h: let_(
                xhash.cubic_mix(h),
                lambda g: F.array(
                    *[xhash.affine_hash(g, i, k) for i in range(k)]
                ),
            ),
        )
        long = items.select(
            *group_cols, F.posexplode(regs_arr).alias("i", "_h")
        )
        return (
            long.groupBy(*group_cols, F.col("i").cast("int").alias("i"))
            .agg(F.min("_h").alias("m"))
            .withColumn("fam", F.lit(KMV_FAMILIES[hash_mode]))
        )

    def as_rows(df):
        return sorted(
            tuple(r) for r in df.collect()
        )

    rows = (
        [("g1", str(i)) for i in range(40)]
        + [("g2", str(i)) for i in range(500, 520)]
        + [("g3", None), ("g3", None)]  # only-NULL group
        + [("g1", None)]  # NULL inside a real group
    )
    df = spark.createDataFrame(rows, "grp string, item string")
    for hash_mode in ("poly", "xxhash64"):
        got = kmv_build(
            df, "item", group_cols=("grp",), k=16, hash_mode=hash_mode
        )
        want = reference_build(df, "item", ("grp",), 16, hash_mode)
        assert as_rows(got) == as_rows(want), hash_mode
        # ungrouped
        gu = kmv_build(df, "item", k=16, hash_mode=hash_mode)
        wu = reference_build(df, "item", (), 16, hash_mode)
        assert as_rows(gu) == as_rows(wu), hash_mode
    # empty input: empty register table in both shapes
    empty = spark.createDataFrame([], "grp string, item string")
    assert kmv_build(empty, "item", k=8, hash_mode="poly").count() == 0
    assert (
        kmv_build(empty, "item", group_cols=("grp",), k=8,
                  hash_mode="poly").count() == 0
    )


def test_ams_wide_agg_equals_posexplode_reference(spark):
    """Round-13 shape law (kmv's twin): _ams_components' k-sum-columns
    + unpivot form must be component-for-component identical to the
    original posexplode-per-row reference — grouped and ungrouped,
    both hash modes, weighted and unweighted, with NULL items (k NULL
    contributions → NULL-skipping sums) and an empty input (empty
    table, not one row of global-aggregate NULLs)."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.functions import xhash
    from gpi_etl_spark.functions.hof import let_
    from gpi_etl_spark.operators.sketches import (
        KMV_P,
        ams_build,
        ams_build_weighted,
        ams_fam,
    )

    def reference(items, item_col, group_cols, k, hash_mode, weight):
        if hash_mode == "poly":
            base = xhash.poly_hash(F.col(item_col))
        else:
            base = F.pmod(F.xxhash64(F.col(item_col)), F.lit(KMV_P))
        signs_arr = let_(
            base,
            lambda h: let_(
                xhash.cubic_mix(h),
                lambda g: F.array(
                    *[
                        F.lit(1)
                        - F.lit(2)
                        * (xhash.affine_hash(g, i, k) % F.lit(2))
                        for i in range(k)
                    ]
                ),
            ),
        )
        cols = [*group_cols, F.posexplode(signs_arr).alias("i", "_s")]
        if weight is None:
            long = items.select(*cols)
            contrib = F.col("_s").cast("bigint")
        else:
            long = items.select(F.col(weight).alias("_w"), *cols)
            contrib = F.col("_s").cast("bigint") * F.col("_w")
        return (
            long.groupBy(*group_cols, F.col("i").cast("int").alias("i"))
            .agg(F.sum(contrib).alias("x"))
            .withColumn("fam", F.lit(ams_fam(hash_mode, k)))
        )

    def as_rows(df):
        # NULL x sorts below any int (None-safe key)
        key = lambda t: tuple(
            (v is not None, v) for v in t
        )  # noqa: E731
        return sorted((tuple(r) for r in df.collect()), key=key)

    rows = (
        [("g1", str(i), i % 7 + 1) for i in range(60)]
        + [("g2", str(i), 2) for i in range(500, 530)]
        + [("g3", None, 1), ("g3", None, 3)]  # only-NULL group
        + [("g1", None, 5)]  # NULL item inside a real group
    )
    df = spark.createDataFrame(rows, "grp string, item string, f long")
    for hash_mode in ("poly", "xxhash64"):
        got = ams_build(
            df, "item", group_cols=("grp",), k=8, hash_mode=hash_mode
        )
        want = reference(df, "item", ("grp",), 8, hash_mode, None)
        assert as_rows(got) == as_rows(want), hash_mode
        gw = ams_build_weighted(
            df, "item", "f", group_cols=("grp",), k=8,
            hash_mode=hash_mode,
        )
        ww = reference(df, "item", ("grp",), 8, hash_mode, "f")
        assert as_rows(gw) == as_rows(ww), hash_mode
        # ungrouped
        gu = ams_build(df, "item", k=8, hash_mode=hash_mode)
        wu = reference(df, "item", (), 8, hash_mode, None)
        assert as_rows(gu) == as_rows(wu), hash_mode
    empty = spark.createDataFrame([], "grp string, item string, f long")
    assert ams_build(empty, "item", k=4, hash_mode="poly").count() == 0
    assert (
        ams_build(
            empty, "item", group_cols=("grp",), k=4, hash_mode="poly"
        ).count()
        == 0
    )
