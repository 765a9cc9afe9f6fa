"""Property-based checks (hypothesis) for the round-7 privacy/sketch
operators: k_anonymize must conserve rows and never release an
under-k non-final group for ARBITRARY small datasets (nulls
included), and the KMV register table must be invariant under
duplication and merge order — not just the fixture values the unit
tests chose. Small example counts on purpose: each case drives a real
Spark session.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_nation = st.one_of(st.none(), st.integers(0, 3))
_segment = st.one_of(st.none(), st.sampled_from(["A", "B", "C"]))


@given(
    rows=st.lists(
        st.tuples(_nation, _segment, st.integers(0, 99)),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(2, 6),
)
@settings(max_examples=15, deadline=None)
def test_k_anonymize_invariants(spark, rows, k):
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.curation import k_anonymize

    df = spark.createDataFrame(
        [(n, s, float(b)) for n, s, b in rows],
        "nation int, segment string, bal double",
    )
    out = k_anonymize(
        df, levels=[["nation", "segment"], ["nation"], []], k=k
    )
    collected = out.collect()
    # 1. row conservation — NULL keys included
    assert len(collected) == len(rows)
    # 2. every released non-final (level, tuple) group holds ≥ k rows
    rel = (
        out.groupBy("anon_level", "nation_anon", "segment_anon")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in rel:
        if r.anon_level < 2:
            assert r.n >= k, (k, rel)
    # 3. masking matches the ladder: level 0 keeps both, level 1 keeps
    # nation only, level 2 keeps nothing (NULL-valued QIs stay NULL)
    for r in collected:
        if r.anon_level == 0:
            assert r.nation_anon == r.nation
            assert r.segment_anon == r.segment
        elif r.anon_level == 1:
            assert r.nation_anon == r.nation and r.segment_anon is None
        else:
            assert r.nation_anon is None and r.segment_anon is None


@given(
    items=st.lists(st.text(alphabet="ab0123", max_size=4), min_size=1,
                   max_size=25),
    cut=st.integers(0, 25),
)
@settings(max_examples=10, deadline=None)
def test_kmv_registers_duplication_and_merge_invariant(spark, items, cut):
    """Registers over any multiset equal registers over its distinct
    set, and splitting the stream at an arbitrary point then merging
    reproduces the whole-stream sketch (min is idempotent,
    commutative, associative)."""
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_merge

    cut = min(cut, len(items))
    mk = lambda vals: spark.createDataFrame(  # noqa: E731
        [(v,) for v in vals], "item string"
    )
    as_map = lambda df: {r.i: r.m for r in df.collect()}  # noqa: E731
    whole = as_map(kmv_build(mk(items), "item", k=16, hash_mode="poly"))
    dedup = as_map(
        kmv_build(mk(sorted(set(items))), "item", k=16, hash_mode="poly")
    )
    assert whole == dedup
    a, b = items[:cut], items[cut:]
    parts = [mk(p) for p in (a, b) if p]
    if len(parts) == 2:
        merged = as_map(
            kmv_merge(
                kmv_build(parts[0], "item", k=16, hash_mode="poly"),
                kmv_build(parts[1], "item", k=16, hash_mode="poly"),
            )
        )
        assert merged == whole


def test_t_closeness_hand_computed_emd(spark):
    """Three classes over a 2-value ordinal domain: global 10/10.
    A=(4,1): EMD 0.3 (fails t=1/5); B=(1,4): symmetric 0.3;
    C=(5,5): exactly the global mix, EMD 0 (passes)."""
    from gpi_etl_spark.operators.curation import t_closeness_audit

    rows = (
        [("A", 1)] * 4 + [("A", 2)] * 1
        + [("B", 1)] * 1 + [("B", 2)] * 4
        + [("C", 1)] * 5 + [("C", 2)] * 5
    )
    df = spark.createDataFrame(rows, "cls string, v int")
    got = {
        r.cls: r
        for r in t_closeness_audit(df, ["cls"], "v", 1, 5).collect()
    }
    assert got["A"].sum_abs_cum_dev == 30  # |4*20 - 10*5|
    assert abs(got["A"].emd_r - 0.3) < 1e-9
    assert got["A"].is_t_close == 0
    assert got["B"].is_t_close == 0
    assert got["C"].sum_abs_cum_dev == 0 and got["C"].is_t_close == 1
    assert all(r.m == 2 and r.n_c in (5, 10) for r in got.values())


def test_t_closeness_null_sensitive_excluded_and_m1_trivial(spark):
    from gpi_etl_spark.operators.curation import t_closeness_audit

    # NULL sensitive rows must not move boundaries OR counts
    rows = [("A", 1), ("A", 1), ("B", 1), ("B", None), ("A", None)]
    out = {
        r.cls: r
        for r in t_closeness_audit(
            spark.createDataFrame(rows, "cls string, v int"),
            ["cls"], "v",
        ).collect()
    }
    # single-value domain: everyone t-close by definition, emd 0
    assert out["A"].n_c == 2 and out["B"].n_c == 1
    assert all(
        r.m == 1 and r.emd_r == 0.0 and r.is_t_close == 1
        for r in out.values()
    )


def test_t_closeness_null_class_is_a_real_class(spark):
    """Anonymized releases carry NULL quasi-identifier columns (the
    generalization); the lattice join must be NULL-safe so those
    classes audit like any other."""
    from gpi_etl_spark.operators.curation import t_closeness_audit

    rows = [(None, 1), (None, 2), ("x", 1), ("x", 2)]
    out = t_closeness_audit(
        spark.createDataFrame(rows, "cls string, v int"), ["cls"], "v"
    ).collect()
    assert len(out) == 2
    assert all(r.sum_abs_cum_dev == 0 and r.is_t_close == 1 for r in out)
