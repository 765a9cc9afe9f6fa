"""Entity resolution: blocking, edit-distance gating, clustering and
fan-back semantics on hand-built catalogs."""

from __future__ import annotations


def test_clusters_exact_and_near_names(spark):
    from gpi_etl_spark.operators.entities import resolve_entities

    rows = [
        (1, "cold widget"),
        (2, "cold widget"),     # exact dup of 1
        (3, "bold widget"),     # 1 edit from "cold widget"
        (4, "large bolt"),      # different block entirely
        (5, "small widget"),    # same block, > 2 edits from the rest
    ]
    df = spark.createDataFrame(rows, "pid long, name string")
    got = {
        r.pid: (r.entity_id, r.n_members)
        for r in resolve_entities(df, "pid", "name").collect()
    }
    # 1, 2, 3 cluster (entity = min id = 1); 4 and 5 are singletons
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[4] == (4, 1)
    assert got[5] == (5, 1)


def test_blocking_prevents_cross_block_match(spark):
    """Names within the edit threshold but in different blocks must NOT
    pair — blocking is a hard partition of the comparison space."""
    from gpi_etl_spark.operators.entities import resolve_entities

    rows = [(1, "red rod"), (2, "red rot")]  # 1 edit, blocks rod/rot
    df = spark.createDataFrame(rows, "pid long, name string")
    got = {r.pid: r.entity_id for r in resolve_entities(df, "pid", "name").collect()}
    assert got[1] == 1 and got[2] == 2


def test_transitive_chain_single_entity(spark):
    """a~b and b~c (each within threshold) must merge a, b, c even if
    a and c are farther apart than the threshold — connected
    components, not pairwise cliques."""
    from gpi_etl_spark.operators.entities import resolve_entities

    rows = [(10, "aaaa x"), (11, "aaab x"), (12, "aabb x"), (13, "bbbb x")]
    df = spark.createDataFrame(rows, "pid long, name string")
    got = {r.pid: r.entity_id for r in resolve_entities(df, "pid", "name", max_dist=1).collect()}
    # chain aaaa-aaab-aabb merges; bbbb is 2 edits from aabb -> separate
    assert got[10] == got[11] == got[12] == 10
    assert got[13] == 13


def test_pairs_run_over_distinct_names(spark):
    """The pair stage sees each distinct name once regardless of row
    duplication — the lever that bounds the quadratic term at scale."""
    from gpi_etl_spark.operators.entities import blocked_name_pairs

    names = spark.createDataFrame(
        [("hot ring",), ("hot rings",)], "name string"
    )
    pairs = blocked_name_pairs(names, "name", max_dist=2).collect()
    # different blocks (ring vs rings) -> no pair despite 1 edit
    assert pairs == []


def test_length_banding_is_lossless(spark):
    """band_lengths=True must return EXACTLY the pairs of the plain
    block join — the edit bound implies a length bound, so the
    neighbor-band join can't lose a qualifying pair (including pairs
    that straddle a band boundary)."""
    from gpi_etl_spark.operators.entities import blocked_name_pairs

    # lengths straddle every band boundary for width 3 (max_dist=2):
    # 5,6,7,8,9-char heads sharing one block token
    rows = [
        ("aaaaa hub",), ("aaaaab hub",), ("aaaaabb hub",),
        ("aaaaabbb hub",), ("aaaaabbbc hub",), ("zzzzz hub",),
        ("az zz hub",), ("b hub",), ("bb hub",), ("bbb hub",),
    ]
    names = spark.createDataFrame(rows, "name string")
    banded = {
        (r.name_a, r.name_b)
        for r in blocked_name_pairs(
            names, "name", max_dist=2, band_lengths=True
        ).collect()
    }
    plain = {
        (r.name_a, r.name_b)
        for r in blocked_name_pairs(
            names, "name", max_dist=2, band_lengths=False
        ).collect()
    }
    assert banded == plain
    assert plain  # the fixture actually produces pairs


def test_hot_block_cap_bounds_pairs(spark):
    """Adversarial hot block: half the corpus shares one blocking key
    AND one length (banding can't split it). The cap must bound
    candidate pairs at C(cap, 2) per group; uncapped, the same block
    produces tens of thousands."""
    from gpi_etl_spark.operators.entities import blocked_name_pairs

    hot = [(f"x{i:03d} hub",) for i in range(400)]  # one block, same len
    cold = [(f"item nr {i:04d}",) for i in range(400)]
    names = spark.createDataFrame(hot + cold, "name string")
    capped = blocked_name_pairs(
        names, "name", max_dist=2, hot_block_cap=20
    ).count()
    assert capped <= 20 * 19 // 2
    uncapped = blocked_name_pairs(names, "name", max_dist=2).count()
    assert uncapped > 10000  # the blow-up the cap exists to stop


def test_hot_block_cap_deterministic_and_resolves(spark):
    """Capped resolution still assigns every row an entity (capped-out
    names become singletons), and reruns produce identical output."""
    from gpi_etl_spark.operators.entities import resolve_entities

    rows = [(i, f"y{i % 50:02d} hub") for i in range(200)]
    df = spark.createDataFrame(rows, "pid long, name string")
    a = sorted(
        (r.pid, r.entity_id, r.n_members)
        for r in resolve_entities(
            df, "pid", "name", hot_block_cap=10
        ).collect()
    )
    b = sorted(
        (r.pid, r.entity_id, r.n_members)
        for r in resolve_entities(
            df, "pid", "name", hot_block_cap=10
        ).collect()
    )
    assert a == b
    assert len(a) == 200


def test_fs_weights_integer_and_signs(spark):
    import math

    from gpi_etl_spark.operators.entities import fs_weights

    wa, wd = fs_weights(0.9, 0.3)
    assert (wa, wd) == (round(math.log(3.0) * 1000),
                        round(math.log(0.1 / 0.7) * 1000))
    assert wa > 0 > wd  # informative field: agree adds, disagree costs
    import pytest as _pytest
    with _pytest.raises(ValueError):
        fs_weights(0.3, 0.9)  # m must exceed u
    with _pytest.raises(ValueError):
        fs_weights(1.0, 0.5)  # degenerate probabilities


def test_fs_score_decisions_and_integer_scores(spark):
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.entities import fs_score, fs_weights

    pairs = spark.createDataFrame(
        [
            ("alpha widget", "alpha widgez"),   # near-identical
            ("alpha widget", "omega widget"),   # shares block token only
            ("a b", "completely different x"),  # disagrees everywhere
        ],
        "name_a string, name_b string",
    )
    comparisons = [
        (F.levenshtein("name_a", "name_b") <= 1, *fs_weights(0.9, 0.3)),
        (
            F.size(F.split(F.col("name_a"), " "))
            == F.size(F.split(F.col("name_b"), " ")),
            *fs_weights(0.95, 0.6),
        ),
        (
            F.element_at(F.split(F.col("name_a"), " "), 1)
            == F.element_at(F.split(F.col("name_b"), " "), 1),
            *fs_weights(0.7, 0.2),
        ),
    ]
    out = {
        (r.name_a, r.name_b): (r.fs_score, r.decision)
        for r in fs_score(
            pairs, comparisons, match_threshold=1500,
            possible_threshold=-500,
        ).collect()
    }
    # all three fields agree: 1099 + 460 + 1253 = 2812 → match
    assert out[("alpha widget", "alpha widgez")] == (2812, "match")
    # lev fails, tokens agree, first token fails: -1946+460-981=-2467
    assert out[("alpha widget", "omega widget")][1] == "non_match"
    mid = out[("a b", "completely different x")]
    assert mid[0] == -1946 - 2079 - 981 and mid[1] == "non_match"


def test_fs_score_empty_comparisons_raises(spark):
    from gpi_etl_spark.operators.entities import fs_score

    pairs = spark.createDataFrame([("a", "b")], "name_a string, name_b string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least one comparison"):
        fs_score(pairs, [], match_threshold=0, possible_threshold=0)
