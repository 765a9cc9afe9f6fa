"""Hashing-trick featurizer: pure-Python hash replay, conservation
laws, and partitioning invariance."""

from __future__ import annotations

P, B, SEED = 1_000_000_007, 131, 7


def _poly(s: str) -> int:
    acc = SEED
    for ch in s:
        acc = (acc * B + ord(ch)) % P
    return acc


def _reference(rows, dim=64):
    out = {}
    for doc_id, text in rows:
        for term in text.lower().split():
            h = _poly(term)
            b = h % dim
            sgn = 1 if (h % (2 * dim)) >= dim else -1
            key = (doc_id, b)
            v, n = out.get(key, (0, 0))
            out[key] = (v + sgn, n + 1)
    return {k: v for k, v in out.items()}


def test_matches_pure_python_replay(spark):
    from gpi_etl_spark.operators.textstats import hashed_token_features

    rows = [
        (1, "the quick brown fox"),
        (2, "the the the lazy dog"),
        (3, "pack my box with five dozen liquor jugs"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.bucket): (r.val, r.n_terms)
        for r in hashed_token_features(df, dim=64).collect()
    }
    assert got == _reference(rows)


def test_term_mass_is_conserved(spark):
    """Σ n_terms per doc must equal the doc's token count — hashing
    redistributes terms, never drops or duplicates them."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.textstats import (
        hashed_token_features,
        token_count,
    )

    rows = [(i, " ".join(f"w{j % 37}" for j in range(i + 1)))
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    per_doc = (
        hashed_token_features(df, dim=16)
        .groupBy("doc_id")
        .agg(F.sum("n_terms").alias("total"))
    )
    want = {r.doc_id: r.total
            for r in df.select("doc_id", token_count("text").alias("total"))
            .collect()}
    got = {r.doc_id: r.total for r in per_doc.collect()}
    assert got == want
    # |signed sum| can never exceed the bucket's term count
    bad = (
        hashed_token_features(df, dim=16)
        .filter(F.abs(F.col("val")) > F.col("n_terms"))
        .count()
    )
    assert bad == 0


def test_partitioning_invariance(spark):
    from gpi_etl_spark.operators.textstats import hashed_token_features

    rows = [(i, f"alpha beta w{i % 11} w{i % 7} gamma") for i in range(200)]
    base = None
    for parts in (1, 17):
        df = spark.createDataFrame(
            rows, "doc_id long, text string"
        ).repartition(parts)
        got = sorted(
            (r.doc_id, r.bucket, r.val, r.n_terms)
            for r in hashed_token_features(df, dim=32).collect()
        )
        if base is None:
            base = got
        else:
            assert got == base
