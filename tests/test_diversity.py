"""Greedy MMR selection: pure-Python replay equality, the diversity
property (duplicate vectors can't both be picked early), and EWMA's
fold correctness."""

from __future__ import annotations

import math


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def _mmr_reference(vectors, query, k, lam):
    """Pure-Python greedy MMR with the same tie-break (score desc,
    id asc). vectors: dict id -> list[float]."""
    rel = {i: _cos(v, query) for i, v in vectors.items()}
    picks, sel = [], []
    for rank in range(1, k + 1):
        best = None
        for i, v in sorted(vectors.items()):
            if i in (p[1] for p in picks):
                continue
            if sel:
                pen = max(_cos(v, s) for s in sel)
                score = lam * rel[i] - (1.0 - lam) * pen
            else:
                score = lam * rel[i]
            if best is None or score > best[0]:
                best = (score, i)
        if best is None:
            break
        picks.append((rank, best[1], rel[best[1]], best[0]))
        sel.append(vectors[best[1]])
    return picks


def test_mmr_matches_python_replay(spark):
    from gpi_etl_spark.operators.diversity import mmr_select

    vectors = {
        1: [1.0, 0.0, 0.0],
        2: [0.9, 0.1, 0.0],   # near-dup of 1
        3: [0.0, 1.0, 0.0],
        4: [0.0, 0.9, 0.1],   # near-dup of 3
        5: [0.5, 0.5, 0.5],
        6: [0.0, 0.0, 1.0],
    }
    query = [1.0, 0.2, 0.1]
    df = spark.createDataFrame(
        [(i, v) for i, v in vectors.items()],
        "vec_id long, embedding array<double>",
    )
    got = mmr_select(df, query, k=4, lam=0.7)
    want = _mmr_reference(vectors, query, 4, 0.7)
    assert [(r, i) for r, i, *_ in got] == [(r, i) for r, i, *_ in want]
    for (_, _, rel_g, mmr_g), (_, _, rel_w, mmr_w) in zip(got, want):
        assert abs(rel_g - rel_w) < 1e-12
        assert abs(mmr_g - mmr_w) < 1e-12


def test_mmr_skips_redundant_duplicates(spark):
    """Two IDENTICAL top-relevance vectors: pure top-k takes both; MMR
    must take one and move on (the whole point of the operator)."""
    from gpi_etl_spark.operators.diversity import mmr_select

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),      # exact duplicate of 1
        (3, [0.0, 1.0]),      # equally relevant to the query, orthogonal
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    # query equidistant from both directions: rel(1)=rel(2)=rel(3),
    # so after the min-id tie-break picks 1, the duplicate's penalty
    # (cos=1.0) must push it behind the orthogonal vector (penalty 0)
    got = mmr_select(df, [1.0, 1.0], k=3, lam=0.7)
    ids = [i for _, i, *_ in got]
    assert ids == [1, 3, 2]


def test_mmr_fewer_vectors_than_k(spark):
    from gpi_etl_spark.operators.diversity import mmr_select

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = mmr_select(df, [1.0, 1.0], k=5, lam=0.5)
    assert len(got) == 2


def test_ewma_hand_computed(spark):
    from gpi_etl_spark.operators.windows import ewma_final

    rows = [
        (1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0),
        (2, 1, 5.0),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, x double")
    got = {
        r.k: (r.n_points, r.ewma)
        for r in ewma_final(df, ["k"], ["seq"], "x", alpha=0.25).collect()
    }
    # k=1: acc=10 -> 0.25*20+0.75*10=12.5 -> 0.25*30+0.75*12.5=16.875
    assert got[1] == (3, 16.875)
    assert got[2] == (1, 5.0)


def test_ewma_order_ties_deterministic(spark):
    """Same order key, different tiebreak column: the fold order must
    follow the full (order_cols) tuple, not arrival order."""
    from gpi_etl_spark.operators.windows import ewma_final

    rows = [(1, 5, 2, 100.0), (1, 5, 1, 0.0)]  # same ts=5, ids 2,1
    df = spark.createDataFrame(rows, "k long, ts long, eid long, x double")
    out = ewma_final(
        df, ["k"], ["ts", "eid"], "x", alpha=0.5
    ).collect()[0]
    # order by (ts, eid): 0.0 first, then 100.0 -> 0.5*100 + 0.5*0 = 50
    assert out.ewma == 50.0
