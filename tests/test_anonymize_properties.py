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
