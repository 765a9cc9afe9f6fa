"""Similarity search: exact top-k sanity + LSH recall."""

import random

from pyspark.sql import functions as F

from gpi_etl_spark.operators.similarity import brute_force_topk, lsh_topk

DIM = 16


def _vectors(spark, n=100, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(DIM)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_self_is_nearest(spark):
    vecs = _vectors(spark)
    queries = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_topk(vecs, queries, k=1)
    for r in out.collect():
        assert r.vec_id == r.query_id and abs(r.score - 1.0) < 1e-9


def test_brute_force_rank_ordering(spark):
    vecs = _vectors(spark)
    queries = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = brute_force_topk(vecs, queries, k=10).orderBy("rank").collect()
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_lsh_topk_recall(spark):
    """SRP-LSH with few planes must recover most of the exact top-5."""
    vecs = _vectors(spark, n=200)
    queries = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(vecs, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in lsh_topk(vecs, queries, k=5, n_planes=4, dim=DIM).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4  # 4 planes / 16 buckets on gaussian data
