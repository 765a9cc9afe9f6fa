"""Coordinated key sampling: deterministic, mergeable, nested, and
join-preserving (the algebra q253 gates cross-engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gpi_etl_spark.operators.sampling import (
    key_priority,
    sample_keys_bottomk,
    sample_keys_threshold,
    threshold_literal,
)


def _keys(df, col="k"):
    return sorted(r[col] for r in df.select(col).distinct().collect())


def test_bottomk_is_deterministic_and_sized(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(200)],
                               "k string")
    a = _keys(sample_keys_bottomk(df, "k", 25))
    b = _keys(sample_keys_bottomk(df, "k", 25))
    assert a == b and len(a) == 25


def test_bottomk_merges_like_min_heap(spark):
    """bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) — per-shard
    samples compose without rescanning (overlapping shards included:
    a shared key carries one priority, min-heap algebra dedups it)."""
    a = spark.createDataFrame([(f"k{i}",) for i in range(120)],
                              "k string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(80, 250)],
                              "k string")
    union = a.unionByName(b)
    direct = _keys(sample_keys_bottomk(union, "k", 20))
    sa = sample_keys_bottomk(a, "k", 20).select("k")
    sb = sample_keys_bottomk(b, "k", 20).select("k")
    remerged = _keys(
        sample_keys_bottomk(sa.unionByName(sb), "k", 20)
    )
    assert remerged == direct


def test_threshold_samples_nest_across_rates(spark):
    """sample(rate=0.05) ⊆ sample(rate=0.2): grow a debug slice
    without re-drawing."""
    df = spark.createDataFrame([(f"k{i}",) for i in range(2000)],
                               "k string")
    small = set(_keys(sample_keys_threshold(df, "k", 0.05)))
    big = set(_keys(sample_keys_threshold(df, "k", 0.20)))
    assert small <= big
    # rate is roughly honored (Bernoulli on ~uniform priorities)
    assert 0.01 <= len(small) / 2000 <= 0.12
    assert 0.10 <= len(big) / 2000 <= 0.33


def test_threshold_join_of_samples_is_sample_of_join(spark):
    """The coordination property, exactly: sampling two tables
    independently and joining == joining first and sampling the
    join's key."""
    left = spark.createDataFrame(
        [(f"k{i % 50}", i) for i in range(300)], "k string, a int"
    )
    right = spark.createDataFrame(
        [(f"k{i % 70}", i * 2) for i in range(400)], "k string, b int"
    )
    rate = 0.3
    sl = sample_keys_threshold(left, "k", rate)
    sr = sample_keys_threshold(right, "k", rate)
    join_of_samples = sorted(
        map(tuple, sl.join(sr, "k").select("k", "a", "b").collect())
    )
    sample_of_join = sorted(
        map(
            tuple,
            sample_keys_threshold(left.join(right, "k"), "k", rate)
            .select("k", "a", "b")
            .collect(),
        )
    )
    assert join_of_samples == sample_of_join and join_of_samples


def test_priority_is_width_canonical(spark):
    """An int key and its string form draw the same priority (the
    cast-to-string canonicalization) — coordination must hold across
    tables storing the key at different types."""
    df = spark.createDataFrame([(7,), (42,)], "k bigint")
    ds = spark.createDataFrame([("7",), ("42",)], "k string")
    pi = {r.k: r.p for r in df.select(
        F.col("k").cast("string").alias("k"),
        key_priority("k").alias("p")).collect()}
    ps = {r.k: r.p for r in ds.select(
        "k", key_priority("k").alias("p")).collect()}
    assert pi == ps
    assert threshold_literal(0.5) == 500_000_003


def test_rendezvous_resize_moves_only_into_new_shard(spark):
    """HRW's reason to exist: N → N+1 relocates ~1/(N+1) of keys, all
    INTO the new shard, none between survivors."""
    from gpi_etl_spark.operators.sampling import rendezvous_shard

    n = 3000
    df = spark.createDataFrame([(f"key{i}",) for i in range(n)],
                               "k string")
    d = df.select(
        rendezvous_shard("k", 10).alias("s10"),
        rendezvous_shard("k", 11).alias("s11"),
    )
    moved = d.filter(F.col("s10") != F.col("s11"))
    n_moved = moved.count()
    # every move lands in the new shard (index 10)
    assert moved.filter(F.col("s11") != 10).count() == 0
    # expected n/11 ≈ 273; allow ±40%
    assert 0.6 * n / 11 <= n_moved <= 1.4 * n / 11


def test_rendezvous_balance_and_determinism(spark):
    from gpi_etl_spark.operators.sampling import rendezvous_shard

    n, shards = 4000, 8
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)],
                               "k string")
    counts = {
        r.s: r.c
        for r in df.select(rendezvous_shard("k", shards).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert set(counts) == set(range(shards))
    # uniform within ±35% of n/shards
    for c in counts.values():
        assert 0.65 * n / shards <= c <= 1.35 * n / shards
    again = {
        r.s: r.c
        for r in df.select(rendezvous_shard("k", shards).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert again == counts


def test_rendezvous_rejects_out_of_range_n(spark):
    import pytest

    from gpi_etl_spark.operators.sampling import (
        RENDEZVOUS_MAX_SHARDS,
        rendezvous_shard,
        rendezvous_shard_sql,
    )

    with pytest.raises(ValueError, match="n_shards"):
        rendezvous_shard("k", 0)
    with pytest.raises(ValueError, match="n_shards"):
        rendezvous_shard("k", RENDEZVOUS_MAX_SHARDS + 1)
    with pytest.raises(ValueError, match="out of range"):
        rendezvous_shard_sql("k", 100)


def test_priority_sample_small_group_is_exact_and_tau_zero(spark):
    """k >= |items|: the sample IS the group, tau = 0 and est_w = w —
    the estimator degenerates to the exact total."""
    from gpi_etl_spark.operators.sampling import priority_sample

    rows = [("g", f"k{i}", i + 1) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, k string, w int")
    out = priority_sample(df, "k", "w", 8, ("g",)).collect()
    assert len(out) == 5
    assert all(r.tau_r == 0.0 and r.est_w_r == float(r.w) for r in out)
    assert all(r.n_items == 5 for r in out)


def test_priority_sample_heavy_keys_enter_with_certainty(spark):
    """A weight far above the threshold is ALWAYS sampled (w > tau
    implies q = w/u > tau for any u <= P... specifically w >= tau
    guarantees q >= w/P * P/w... checked empirically here) and its
    estimator is its own weight."""
    from gpi_etl_spark.operators.sampling import priority_sample

    rows = [("g", f"k{i}", 1) for i in range(200)] + [
        ("g", "whale", 10**9)
    ]
    df = spark.createDataFrame(rows, "g string, k string, w long")
    out = {r.k: r for r in priority_sample(df, "k", "w", 16, ("g",)).collect()}
    assert "whale" in out
    assert out["whale"].est_w_r == float(10**9)  # w > tau: est = w


def test_priority_sample_estimator_is_calibrated(spark):
    """Sanity bound on the DLT estimator: the sampled est_w sum lands
    within 35% of the true group total on a 500-item uniform-ish
    weight spread at k=64 (loose envelope; the determinism is the
    contract, the calibration is the sanity check)."""
    from gpi_etl_spark.operators.sampling import priority_sample

    rows = [("g", f"key{i:04d}", (i * 37) % 100 + 1) for i in range(500)]
    true_total = sum(w for _, _, w in rows)
    df = spark.createDataFrame(rows, "g string, k string, w int")
    out = priority_sample(df, "k", "w", 64, ("g",)).collect()
    est = sum(r.est_w_r for r in out)
    assert abs(est - true_total) / true_total < 0.35
    assert len(out) == 64


def test_priority_sample_merges_from_shard_states(spark):
    """Distributed merge law: running the operator over the UNION of
    per-shard top-(k+1) item sets reproduces the global sample and
    threshold exactly (q recomputes from (key, w))."""
    from gpi_etl_spark.operators.sampling import priority_sample

    rows = [("g", f"key{i:04d}", (i * 17) % 50 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, k string, w int")
    k = 16
    whole = sorted(
        (r.k, r.w, r.tau_r, r.est_w_r)
        for r in priority_sample(df, "k", "w", k, ("g",)).collect()
    )
    shard_a = df.filter("substring(k, 7, 1) in ('0','1','2','3','4')")
    shard_b = df.subtract(shard_a)
    state = priority_sample(shard_a, "k", "w", k + 1, ("g",)).unionByName(
        priority_sample(shard_b, "k", "w", k + 1, ("g",))
    ).select("g", "k", "w")
    merged = sorted(
        (r.k, r.w, r.tau_r, r.est_w_r)
        for r in priority_sample(state, "k", "w", k, ("g",)).collect()
    )
    assert merged == whole


def test_priority_sample_rejects_nonpositive_weights(spark):
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(
        [("g", "a", 5), ("g", "b", 0)], "g string, k string, w int"
    )
    with pytest.raises(PySparkException, match="positive"):
        priority_sample(df, "k", "w", 4, ("g",)).collect()


def test_neyman_allocation_properties(spark):
    """The apportionment must hand out exactly k_total, give the
    high-variance stratum more than an equal-size uniform one, and
    raise on the all-constant degenerate design."""
    import pytest

    from gpi_etl_spark.operators.sampling import neyman_stratified_sample

    rows = (
        [("var", i, (i * 37) % 100) for i in range(2000)]
        + [("flat", 10_000 + i, 50) for i in range(2000)]
    )
    df = spark.createDataFrame(rows, "s string, key bigint, v bigint")
    out = {
        r.stratum: r
        for r in neyman_stratified_sample(
            df, "s", "key", "v", 100, hash_mode="poly"
        ).collect()
    }
    assert out["var"].alloc + out["flat"].alloc == 100
    # the flat stratum has zero variance -> w = 0 -> all budget to var
    assert out["flat"].alloc == 0 and out["var"].alloc == 100
    assert out["var"].n_sampled == 100
    assert out["flat"].n_sampled == 0

    # three strata, mixed variance: still sums to k and orders by w
    rows3 = rows + [("mid", 20_000 + i, 45 + i % 10) for i in range(2000)]
    df3 = spark.createDataFrame(rows3, "s string, key bigint, v bigint")
    out3 = {
        r.stratum: r
        for r in neyman_stratified_sample(
            df3, "s", "key", "v", 100, hash_mode="poly"
        ).collect()
    }
    assert sum(r.alloc for r in out3.values()) == 100
    assert out3["var"].alloc > out3["mid"].alloc > out3["flat"].alloc

    flat_only = spark.createDataFrame(
        [("a", 1, 5), ("b", 2, 7)], "s string, key bigint, v bigint"
    )
    # the raise surfaces as PySparkException or the raw Py4J error
    # depending on which task aborts first — match the message only
    with pytest.raises(Exception, match="constant"):
        neyman_stratified_sample(
            flat_only, "s", "key", "v", 10, hash_mode="poly"
        ).collect()
