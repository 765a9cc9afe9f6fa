"""PageRank (operators/linkgraph.py) vs a pure-Python replay."""

from collections import Counter, defaultdict

import pytest

from gpi_etl_spark.operators.linkgraph import pagerank


def py_pagerank(edges, iters, d=0.85, redistribute=True):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = Counter(s for s, _ in edges)
    r = dict.fromkeys(nodes, 1.0 / n)
    for _ in range(iters):
        dm = (
            sum(r[v] for v in nodes if out[v] == 0) if redistribute else 0.0
        )
        c = defaultdict(float)
        for s, t in edges:
            c[t] += r[s] / out[s]
        r = {v: (1.0 - d) / n + d * (c[v] + dm / n) for v in nodes}
    return r


def run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        row["node"]: row["rank"] for row in pagerank(df, **kw).collect()
    }


def test_simple_cycle_uniform(spark):
    # a pure cycle is rank-invariant: every node keeps 1/N
    edges = [(0, 1), (1, 2), (2, 0)]
    got = run(spark, edges, iters=4)
    for v in got.values():
        assert v == pytest.approx(1.0 / 3, abs=1e-12)


def test_hub_graph_matches_replay(spark):
    # 0 and 1 both link to 3; 3 links back to 0; 2 links to 1 and 3
    edges = [(0, 3), (1, 3), (3, 0), (2, 1), (2, 3)]
    got = run(spark, edges, iters=5)
    want = py_pagerank(edges, iters=5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    # mass is conserved under dangling redistribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_redistribution(spark):
    # node 2 has no out-edges: its rank redistributes uniformly
    edges = [(0, 1), (1, 2), (0, 2)]
    got = run(spark, edges, iters=3)
    want = py_pagerank(edges, iters=3)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_drop_mode(spark):
    edges = [(0, 1), (1, 2), (0, 2)]
    got = run(spark, edges, iters=3, redistribute_dangling=False)
    want = py_pagerank(edges, iters=3, redistribute=False)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    # without redistribution the dangling mass leaks: total < 1
    assert sum(got.values()) < 1.0


def test_parallel_edges_double_weight(spark):
    # 0 links to 1 twice and 2 once: 1 receives 2/3 of 0's rank
    edges = [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)]
    got = run(spark, edges, iters=1)
    want = py_pagerank(edges, iters=1)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert got[1] > got[2]


def test_triangle_counts_hand_computed(spark):
    from gpi_etl_spark.operators.linkgraph import triangle_counts

    # K4 on {0,1,2,3} (every node in C(3,2)=3 triangles) plus a
    # pendant edge, a self-loop, a duplicate and a reversed duplicate
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (3, 9),          # pendant: no triangle
        (5, 5),          # self-loop: dropped
        (1, 0), (2, 0),  # reversed duplicates: canonicalized away
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_no_triangles(spark):
    from gpi_etl_spark.operators.linkgraph import triangle_counts

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"  # a path
    )
    assert triangle_counts(df).count() == 0


def test_hits_hand_computed(spark):
    from gpi_etl_spark.operators.linkgraph import hits

    # star: 0 links to 1,2,3 (0 is the hub; 1,2,3 the authorities);
    # 4 links to 1 as a second, weaker hub
    edges = [(0, 1), (0, 2), (0, 3), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in hits(df, iters=2).collect()}
    # hubs: only 0 and 4 have out-links; 0 dominates
    assert got[0][0] > got[4][0] > 0
    assert got[1][0] == got[2][0] == got[3][0] == 0.0
    # authorities: 1 (two in-links) beats 2/3 (one each); 0,4 are 0
    assert got[1][1] > got[2][1] == got[3][1] > 0
    assert got[0][1] == got[4][1] == 0.0
    # L1 normalized
    assert abs(sum(h for h, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(a for _, a in got.values()) - 1.0) < 1e-9


def test_hits_persist_path_matches_lazy(spark):
    """The generation-persist execution path (the realistic-iteration-
    count fallback) must produce the SAME scores as the lazy composed
    plan — only the physical execution differs."""
    from gpi_etl_spark.operators.linkgraph import hits

    edges = [(0, 1), (0, 2), (0, 3), (4, 1), (1, 2), (3, 0), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    lazy = {
        r.node: (r.hub, r.auth)
        for r in hits(df, iters=3, persist_iterations=False).collect()
    }
    per = {
        r.node: (r.hub, r.auth)
        for r in hits(df, iters=3, persist_iterations=True).collect()
    }
    assert lazy.keys() == per.keys()
    for n in lazy:
        assert abs(lazy[n][0] - per[n][0]) < 1e-12
        assert abs(lazy[n][1] - per[n][1]) < 1e-12


def test_hits_auto_persist_deep_iterations(spark):
    """iters=20 auto-selects the persist path (> _HITS_LAZY_MAX_ITERS)
    and completes without planner blowup; scores converge to the
    principal eigenvector ordering and stay L1-normalized."""
    from gpi_etl_spark.operators.linkgraph import hits

    edges = [(0, 1), (0, 2), (0, 3), (4, 1), (1, 2), (3, 0), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in hits(df, iters=20).collect()}
    assert abs(sum(h for h, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(a for _, a in got.values()) - 1.0) < 1e-9
    assert got[0][0] == max(h for h, _ in got.values())  # 0 is top hub


def test_shortest_paths_line_graph(spark):
    from gpi_etl_spark.operators.linkgraph import shortest_paths

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    d = {r.node: r.dist for r in shortest_paths(edges, seeds).collect()}
    # max_depth=10 reaches the whole 11-node line
    assert d == {i: i for i in range(11)}


def test_shortest_paths_multi_source_min(spark):
    from gpi_etl_spark.operators.linkgraph import shortest_paths

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (20,)], "node long")
    d = {r.node: r.dist for r in shortest_paths(edges, seeds).collect()}
    assert d[10] == 10 and d[3] == 3 and d[18] == 2
    assert all(d[i] == min(i, 20 - i) for i in range(21))


def test_shortest_paths_depth_cap_and_disconnected(spark):
    from gpi_etl_spark.operators.linkgraph import shortest_paths

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(100, 101)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    d = {r.node: r.dist
         for r in shortest_paths(edges, seeds, max_depth=4).collect()}
    assert max(d.values()) == 4 and 5 not in d
    assert 100 not in d and 101 not in d  # disconnected component


def test_shortest_paths_undirected_and_deterministic(spark):
    from gpi_etl_spark.operators.linkgraph import shortest_paths

    # edges given in one direction only; BFS must traverse both ways
    edges = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    one = sorted(shortest_paths(edges, seeds).collect())
    two = sorted(
        shortest_paths(edges.repartition(5), seeds).collect()
    )
    assert one == two
    assert dict((r.node, r.dist) for r in one)[5] == 4
