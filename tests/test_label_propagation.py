"""Deterministic synchronous LPA: exact equality with a pure-Python
reference of the same semantics, community structure on planted
graphs, and partitioning invariance."""

from __future__ import annotations

from collections import Counter


def _ref_lpa(edges, iters=4):
    """Pure-Python replay of label_propagation's exact semantics:
    symmetrize, drop self-loops, synchronous rounds, most-frequent
    neighbor label with min-label tie-break."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    nodes = sorted({a for a, _ in und})
    lbl = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            votes = Counter(lbl[d] for s, d in und if s == n)
            mx = max(votes.values())
            new[n] = min(l for l, c in votes.items() if c == mx)
        lbl = new
    return lbl


def _lpa(spark, edges, iters=4, parts=None):
    from gpi_etl_spark.operators.linkgraph import label_propagation

    df = spark.createDataFrame(edges, "src long, dst long")
    if parts:
        df = df.repartition(parts)
    return {
        r.node: r.lbl for r in label_propagation(df, iters=iters).collect()
    }


def test_matches_reference_on_planted_graphs(spark):
    graphs = [
        # two triangles + bridge: the bridge's min-label tie-break
        # leaks label 2 into the right clique, but the PARTITION stays
        # two communities — exactly what the reference computes
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)],
        # two K4s, no bridge: converge to each component's min id
        [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3), (2, 3),
         (10, 11), (11, 12), (10, 12), (10, 13), (11, 13), (12, 13)],
        # sparse even-node ring
        [(i, i + 1) for i in range(0, 30, 2)] + [(0, 28)],
    ]
    for edges in graphs:
        assert _lpa(spark, edges) == _ref_lpa(edges)


def test_two_k4s_converge_to_min_ids(spark):
    edges = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3), (2, 3),
             (10, 11), (11, 12), (10, 12), (10, 13), (11, 13), (12, 13)]
    got = _lpa(spark, edges)
    assert {got[0], got[1], got[2], got[3]} == {0}
    assert {got[10], got[11], got[12], got[13]} == {10}


def test_direction_and_self_loops_normalized(spark):
    """Edges arrive directed and with self-loops; symmetrization and
    self-loop drop mean (a,b) behaves exactly like (b,a)."""
    fwd = _lpa(spark, [(1, 2), (2, 3), (3, 3)])
    rev = _lpa(spark, [(2, 1), (3, 2), (3, 3)])
    assert fwd == rev
    assert set(fwd) == {1, 2, 3}


def test_partitioning_invariance(spark):
    edges = [(i, i + 1) for i in range(0, 30, 2)] + [(0, 28)]
    assert _lpa(spark, edges) == _lpa(spark, edges, parts=7)
