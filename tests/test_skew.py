"""Salted joins must equal plain joins, with the salt spreading hot keys."""

import pytest

from pyspark.sql import functions as F

from gpi_etl_spark.operators.skew import salted_join, top_keys


@pytest.fixture(scope="module")
def skewed(spark):
    # key 1 holds 80% of the fact rows; dims are small
    facts = spark.createDataFrame(
        [(1 if i % 5 else (i % 3) + 2, float(i)) for i in range(500)],
        "k int, v double",
    )
    dims = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "c"), (9, "orphan")], "k int, name string"
    )
    return facts, dims


def _counts(df):
    return sorted(map(tuple, df.groupBy("k", "name").count().collect()))


def test_salted_inner_equals_plain(spark, skewed):
    facts, dims = skewed
    plain = facts.join(dims, "k")
    salted = salted_join(facts, dims, "k", n_salts=8)
    assert _counts(salted) == _counts(plain)


def test_salted_left_keeps_unmatched(spark, skewed):
    facts, dims = skewed
    plain = facts.join(dims, "k", "left")
    salted = salted_join(facts, dims, "k", n_salts=8, how="left")
    assert salted.count() == plain.count()
    assert salted.filter(F.col("name").isNull()).count() == plain.filter(
        F.col("name").isNull()
    ).count()


def test_hot_keys_only_salting(spark, skewed):
    facts, dims = skewed
    hot = top_keys(facts, "k", n=1)
    assert hot == [1]
    plain = facts.join(dims, "k")
    salted = salted_join(facts, dims, "k", n_salts=8, hot_keys=hot)
    assert _counts(salted) == _counts(plain)


def test_salt_actually_scatters(spark, skewed):
    facts, _ = skewed
    from gpi_etl_spark.operators.skew import SALT

    salted = facts.withColumn(SALT, F.floor(F.rand(42) * 8).cast("int"))
    n_buckets = salted.filter("k = 1").select(SALT).distinct().count()
    assert n_buckets >= 6  # 400 rows over 8 salts: all buckets hit w.h.p.


def test_join_order_first_picks_min_and_is_deterministic(spark):
    """The greedy first-join choice must follow the estimates (which
    never undercount and are exact collision-free here), mark exactly
    one candidate, and break ties by pair name."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.sketches import cms_build
    from gpi_etl_spark.operators.skew import join_order_first

    def rel(n_keys, reps):
        rows = [(f"k{i}",) for i in range(n_keys) for _ in range(reps)]
        return spark.createDataFrame(rows, "k string")

    # |A⋈B| = 40, |A⋈C| = 400, |B⋈C| = 1000 (shared key spaces)
    a, b, c = rel(40, 1), rel(40, 1), rel(40, 25)
    sk = {
        n: cms_build(d, "k", width=512, depth=4, hash_mode="poly")
        for n, d in (("a", a), ("b", b), ("c", c))
    }
    out = {
        r.pair: r
        for r in join_order_first(
            [("a_x_b", sk["a"], sk["b"]),
             ("a_x_c", sk["a"], sk["c"]),
             ("b_x_c", sk["b"], sk["c"])]
        ).collect()
    }
    assert out["a_x_b"].est_join_size == 40      # exact, no collisions
    assert out["a_x_c"].est_join_size == 1000
    assert sum(r.chosen for r in out.values()) == 1
    assert out["a_x_b"].chosen == 1
    # tie: identical relations -> smallest pair name wins
    tied = {
        r.pair: r.chosen
        for r in join_order_first(
            [("z_pair", sk["a"], sk["b"]),
             ("a_pair", sk["a"], sk["b"])]
        ).collect()
    }
    assert tied == {"a_pair": 1, "z_pair": 0}


def test_bloom_semi_filter_keeps_every_joinable_row(spark):
    """No false negatives: the filtered fact stream must contain ALL
    joinable rows (result identity after the real join), and the
    false-positive passthrough stays under a loose FPR envelope."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.skew import bloom_semi_filter

    facts = spark.createDataFrame(
        [(i % 500, i) for i in range(4000)], "k bigint, v bigint"
    )
    dim = spark.createDataFrame(
        [(i,) for i in range(0, 500, 25)], "d bigint"  # 20 keys (4%)
    )
    filtered = bloom_semi_filter(
        facts, "k", dim, "d", m_bits=4096, k=4, hash_mode="poly"
    )
    joinable = facts.join(
        dim.select(F.col("d").alias("k")), "k", "left_semi"
    )
    got = set(map(tuple, filtered.collect()))
    want = set(map(tuple, joinable.collect()))
    assert want <= got                      # every joinable row kept
    # FPR envelope: 20 keys in 4096 bits, k=4 -> well under 1% of the
    # 480 non-joinable keys; allow 5% slack
    extra_keys = {r[0] for r in got - want}
    assert len(extra_keys) <= 24
    # NULL fact keys never pass
    with_null = facts.unionByName(
        spark.createDataFrame([(None, -1)], "k bigint, v bigint")
    )
    f2 = bloom_semi_filter(with_null, "k", dim, "d", 4096, 4,
                           hash_mode="poly")
    assert f2.filter(F.col("k").isNull()).count() == 0


def test_join_order_greedy_collision_free_matches_exact_walk(spark):
    """With key domains far under the sketch width every estimate is
    EXACT, so the greedy walk must reproduce the hand-computed
    left-deep order, price each step exactly, and emit one chosen
    row per step (the last step forced)."""
    from gpi_etl_spark.operators.skew import join_order_greedy

    # fact: 60 rows — keys ka 0..5 (x10), kb 0..29 (x2), kc 0..59 (x1)
    rows = [(i % 6, i % 30, i) for i in range(60)]
    fact = spark.createDataFrame(rows, "ka int, kb int, kc int")
    # dims: da keeps half the ka domain, db all kb, dc a third of kc
    da = spark.createDataFrame([(k,) for k in range(3)], "a int")
    db = spark.createDataFrame([(k,) for k in range(30)], "b int")
    dc = spark.createDataFrame([(k,) for k in range(0, 60, 3)], "c int")
    out = join_order_greedy(
        fact,
        [("dim_a", "ka", da, "a"),
         ("dim_b", "kb", db, "b"),
         ("dim_c", "kc", dc, "c")],
        width=512, depth=4, hash_mode="poly",
    )
    got = {
        (r.step, r.pair): (r.est_join_size, r.chosen)
        for r in out.collect()
    }
    # step 1 exact sizes: a=30 (half the rows), b=60, c=20 -> pick c
    assert got[(1, "dim_a")] == (30, 0)
    assert got[(1, "dim_b")] == (60, 0)
    assert got[(1, "dim_c")] == (20, 1)
    # intermediate = rows with kc % 3 == 0 (20 rows; ka hits 0,3 ten
    # rows each -> only ka=3 in da? no: da={0,1,2} so ka=0 -> 10 rows)
    # exact: |int x da| = rows kc%3==0 and ka in {0,1,2}
    inter = [r for r in rows if r[2] % 3 == 0]
    exp_a = sum(1 for r in inter if r[0] < 3)
    exp_b = sum(1 for r in inter if r[1] < 30)
    assert got[(2, "dim_a")] == (exp_a, 1 if exp_a < exp_b else 0)
    assert got[(2, "dim_b")][0] == exp_b
    assert sum(c for (_, c) in got.values()) == 3  # one per step
    # step 3 forced: the remaining dim, priced over the 2-join prefix
    step3 = [(s, p) for (s, p) in got if s == 3]
    assert len(step3) == 1 and got[step3[0]][1] == 1
    inter2 = [r for r in inter if (r[0] < 3 if exp_a < exp_b else True)]
    final_dim = "dim_b" if exp_a < exp_b else "dim_a"
    assert step3[0][1] == final_dim


def test_join_order_greedy_drops_null_keys_and_breaks_ties_by_name(
    spark,
):
    from gpi_etl_spark.operators.skew import join_order_greedy

    fact = spark.createDataFrame(
        [(1, 1), (2, 2), (None, 3), (3, None)],
        "kx int, ky int",
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "d int")
    out = join_order_greedy(
        fact,
        [("z_dim", "kx", dim, "d"), ("a_dim", "ky", dim, "d")],
        width=256, depth=4, hash_mode="poly",
    )
    got = {
        (r.step, r.pair): (r.est_join_size, r.chosen)
        for r in out.collect()
    }
    # both candidates join 3 non-null keys -> tie, a_dim wins by name
    assert got[(1, "a_dim")] == (3, 1)
    assert got[(1, "z_dim")] == (3, 0)
    # intermediate keeps rows with ky in dim (ky non-null): kx 1,2,None
    # -> z_dim joins 2 rows at step 2 (forced)
    assert got[(2, "z_dim")] == (2, 1)


def test_join_order_greedy_estimates_equal_cms_join_size(spark):
    """The docstring's parity pins: the planner's one-pass weighted
    counter build and batched estimate plan must produce, per
    candidate, the EXACT integer cms_join_size would give over
    cms_build sketches of the same key streams — including in the
    collision regime (width 32 << |keys|), where the estimates are
    inflated but must still agree bit-for-bit."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.sketches import cms_build, cms_join_size
    from gpi_etl_spark.operators.skew import join_order_greedy

    rows = [(i % 97, (i * 7) % 203, i % 11) for i in range(3000)]
    fact = spark.createDataFrame(rows, "ka int, kb int, kc int")
    da = spark.createDataFrame([(k,) for k in range(0, 97, 2)], "a int")
    db = spark.createDataFrame([(k,) for k in range(140)], "b int")
    dc = spark.createDataFrame([(k,) for k in range(11)], "c int")
    out = {
        (r.step, r.pair): r.est_join_size
        for r in join_order_greedy(
            fact,
            [("dim_a", "ka", da, "a"),
             ("dim_b", "kb", db, "b"),
             ("dim_c", "kc", dc, "c")],
            width=32, depth=4, hash_mode="poly",
        ).collect()
    }

    def sk(df, key):
        return cms_build(
            df.filter(F.col(key).isNotNull()).select(
                F.col(key).cast("string").alias("_k")
            ),
            "_k", width=32, depth=4, hash_mode="poly",
        )

    for name, fk, dim, dk in (
        ("dim_a", "ka", da, "a"),
        ("dim_b", "kb", db, "b"),
        ("dim_c", "kc", dc, "c"),
    ):
        ref = cms_join_size(sk(fact, fk), sk(dim, dk)).first()
        assert out[(1, name)] == ref.est_join_size, name


# ---------------------------------------------------------------------------
# Join-strategy advisor (round 12)
# ---------------------------------------------------------------------------


def test_flat_row_bytes_model_exact(spark):
    """16/row + 8 per fixed-width col + octet length per string
    (NULL string -> 0) — the exact contract the DuckDB oracle
    re-derives, so the model itself is pinned here."""
    from gpi_etl_spark.operators.skew import flat_row_bytes

    df = spark.createDataFrame(
        [(1, 2.0, "abc"), (2, 3.0, None)],
        "a bigint, b double, s string",
    )
    got = sorted(
        r.n for r in df.select(flat_row_bytes(df).alias("n")).collect()
    )
    # 16 + 8 + 8 + len("abc")=3 -> 35 ; NULL string -> 32
    assert got == [32, 35]


def test_flat_row_bytes_rejects_nested_types(spark):
    """A column outside the model (array/map/struct/decimal) must
    raise, not contribute a silently-wrong width."""
    from gpi_etl_spark.operators.skew import flat_row_bytes

    df = spark.createDataFrame([(1, [1, 2])], "a bigint, xs array<bigint>")
    with pytest.raises(ValueError, match="outside the flat width model"):
        flat_row_bytes(df)


def test_table_bytes_additive_and_empty(spark):
    """The byte total is an additive sketch: the sum over two halves
    equals the whole (the mergeability that lets the statistics layer
    maintain it incrementally), and an empty table reads 0, not NULL."""
    from gpi_etl_spark.operators.skew import table_bytes

    df = spark.createDataFrame(
        [(i, "x" * (i % 7)) for i in range(50)], "k bigint, s string"
    )
    whole = table_bytes(df).first().tbl_bytes
    lo = table_bytes(df.filter(F.col("k") < 25)).first().tbl_bytes
    hi = table_bytes(df.filter(F.col("k") >= 25)).first().tbl_bytes
    assert whole == lo + hi
    assert table_bytes(df.filter(F.lit(False))).first().tbl_bytes == 0


def test_join_strategy_advisor_three_way_split(spark):
    """Engineered sizes hit all three branches of the literal rule:
    a dim under the broadcast budget, a dim that only clears the
    per-partition budget while 3x smaller than the fact, and a dim
    over both. est_build_entries must match the standalone
    kmv_build/kmv_estimate readout bit-for-bit (same sketch family),
    and a heavily-duplicated build key must be priced by DISTINCT
    keys, not rows."""
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_estimate
    from gpi_etl_spark.operators.skew import join_strategy_advisor

    fact = spark.createDataFrame(
        [(i % 13, i % 50, i % 200, float(i)) for i in range(400)],
        "ka bigint, kb bigint, kc bigint, v double",
    )  # 400 rows * (16 + 8*4) = 19200 bytes
    # 10 rows * 24 = 240 <= 400 -> broadcast; key duplicated: 5 distinct
    d_small = spark.createDataFrame(
        [(i % 5,) for i in range(10)], "d bigint"
    )
    # 40 rows * 24 = 960: > 400, <= 400*4 = 1600, 960*3 = 2880 <= 19200
    # -> shuffled_hash
    d_mid = spark.createDataFrame([(i,) for i in range(40)], "d bigint")
    # 100 rows * 24 = 2400 > 1600 -> sort_merge
    d_big = spark.createDataFrame([(i,) for i in range(100)], "d bigint")

    out = {
        r.pair: r
        for r in join_strategy_advisor(
            fact,
            [
                ("small", "ka", d_small, "d"),
                ("mid", "kb", d_mid, "d"),
                ("big", "kc", d_big, "d"),
            ],
            broadcast_bytes=400,
            shuffle_partitions=4,
            smaller_factor=3,
            k=64,
        ).collect()
    }
    assert out["small"].strategy == "broadcast"
    assert out["mid"].strategy == "shuffled_hash"
    assert out["big"].strategy == "sort_merge"
    assert out["small"].dim_bytes == 240
    assert out["mid"].dim_bytes == 960
    assert out["big"].dim_bytes == 2400
    assert all(r.fact_bytes == 19200 for r in out.values())

    # distinct-key pricing + bit parity with the standalone KMV chain
    for name, dim in (("small", d_small), ("mid", d_mid), ("big", d_big)):
        sk = kmv_build(
            dim.filter(F.col("d").isNotNull()).select(
                F.col("d").cast("string").alias("_k")
            ),
            "_k", k=64, hash_mode="poly",
        )
        ref = kmv_estimate(sk).first()
        assert out[name].reg_sum == ref.reg_sum, name
        import math
        assert out[name].est_build_entries == math.floor(ref.est), name
    # the duplicated key prices at ~5 entries, nowhere near 10 rows
    assert out["small"].est_build_entries <= 7


def test_correlation_advisor_flags_dependent_pair_only(spark):
    """A functionally-dependent pair (b = a // 10: d(ab) == d(a), the
    product over-predicts ~|b|x) must flag; an independent full-cross
    pair (d(ab) == d(a)*d(b)) must not. The flag is integer
    arithmetic on floored KMV estimates — deterministic."""
    from gpi_etl_spark.operators.skew import correlation_advisor

    rows = [(i % 200, (i % 200) // 10, i % 8, (i * 7) % 5)
            for i in range(4000)]
    df = spark.createDataFrame(rows, "a bigint, fb bigint, c bigint, d bigint")
    out = {
        r.pair: r
        for r in correlation_advisor(
            df, [("dep", "a", "fb"), ("ind", "c", "d")], k=64, factor=4
        ).collect()
    }
    assert out["dep"].flagged
    assert not out["ind"].flagged
    assert out["dep"].exact_dab == 200
    assert out["ind"].exact_dab == 40
