"""Distributed 2-D Pareto frontier vs the brute-force dominance
definition, including tie and duplicate-point semantics."""

from __future__ import annotations


def _brute_frontier(pts):
    out = []
    for a in pts:
        dominated = any(
            b[1] <= a[1]
            and b[2] >= a[2]
            and (b[1] < a[1] or b[2] > a[2])
            for b in pts
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def _run(spark, pts, parts=None):
    from gpi_etl_spark.operators.skyline import pareto_frontier_2d

    df = spark.createDataFrame(pts, "id long, cost long, val long")
    got = pareto_frontier_2d(df, "cost", "val", num_partitions=parts)
    return sorted((r.id, r.cost, r.val) for r in got.collect())


def test_matches_brute_force_with_ties_and_duplicates(spark):
    pts = [
        (1, 10, 100),
        (2, 10, 100),   # duplicate of 1: both must survive
        (3, 10, 90),    # same cost, lower value: dominated by 1
        (4, 5, 100),    # dominates 1/2 on cost?? no — equal value,
                        # smaller cost → DOMINATES 1 and 2
        (5, 5, 50),
        (6, 20, 200),
        (7, 1, 10),
        (8, 30, 200),   # same value as 6, higher cost: dominated
        (9, 2, 10),     # same value as 7, higher cost: dominated
    ]
    assert _run(spark, pts) == _brute_frontier(pts)
    # spot-check the semantics encoded above
    ids = {i for i, _, _ in _run(spark, pts)}
    assert 4 in ids and 6 in ids and 7 in ids
    assert 1 not in ids and 2 not in ids and 8 not in ids


def test_all_duplicate_points_survive(spark):
    pts = [(i, 7, 42) for i in range(6)]
    assert _run(spark, pts) == _brute_frontier(pts)
    assert len(_run(spark, pts)) == 6


def test_monotone_chain_keeps_everything(spark):
    # strictly increasing cost AND value: nothing dominates anything
    pts = [(i, i, i) for i in range(1, 40)]
    assert _run(spark, pts) == _brute_frontier(pts)


def test_partitioning_invariance_random(spark):
    pts = [
        (i, (i * 37) % 50, (i * 91) % 70) for i in range(300)
    ]
    want = _brute_frontier(pts)
    for parts in (1, 3, 16):
        assert _run(spark, pts, parts=parts) == want
