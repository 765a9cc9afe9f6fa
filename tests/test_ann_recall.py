"""ANN recall evaluation: probing every cell makes IVF exhaustive, so
recall@k vs brute force must be exactly 1; fewer probes can only lose
candidates, never gain false ones."""

from __future__ import annotations


def _setup(spark, n=80, dim=8, k_cells=4):
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.similarity import distributed_kmeans

    rows = [
        (i, [float(((i * 7 + d * 13) % 19) - 9) for d in range(dim)])
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, _ = distributed_kmeans(emb, k=k_cells, iters=3)
    queries = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return emb, cents, queries


def _recall(spark, nprobe, k_cells=4, topk=5):
    from gpi_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb, cents, queries = _setup(spark, k_cells=k_cells)
    ann = ivf_topk(emb, queries, cents, k=topk, nprobe=nprobe).select(
        "query_id", "vec_id"
    )
    exact = brute_force_topk(emb, queries, k=topk).select(
        "query_id", "vec_id"
    )
    a = {(r.query_id, r.vec_id) for r in ann.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    per_q = {}
    for q, v in e:
        per_q.setdefault(q, [0, 0])[1] += 1
        if (q, v) in a:
            per_q[q][0] += 1
    return {q: h / t for q, (h, t) in per_q.items()}, a, e


def test_full_probe_is_exhaustive(spark):
    rec, a, e = _recall(spark, nprobe=4)
    assert a == e
    assert all(v == 1.0 for v in rec.values())


def test_partial_probe_bounded_by_full(spark):
    rec1, a1, e = _recall(spark, nprobe=1)
    assert all(0.0 <= v <= 1.0 for v in rec1.values())
    # every returned id must be a real corpus id, and per-query result
    # lists must be duplicate-free (the candidate dedup's job)
    corpus_ids = set(range(80))
    assert {v for _, v in a1} <= corpus_ids
    assert len(a1) == len({(q, v) for q, v in a1})
    # the query vector itself lives in the corpus and its own cell is
    # always the top probe, so self-retrieval at rank 1 never misses
    for q in rec1:
        assert (q, q) in a1
