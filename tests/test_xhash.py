"""Cross-engine polynomial hash family (functions/xhash.py): the
Spark fold, the DuckDB replay, and a pure-Python reference must agree
value-for-value — this is what makes the q33/q34/q39 hash gates
possible."""

from __future__ import annotations

import duckdb
import pytest

from gpi_etl_spark.functions import xhash

#: includes multi-byte (é), CJK, and an astral-plane emoji (surrogate
#: pair in UTF-16) — pins that the split('')-based fold walks CODE
#: POINTS exactly like the Python reference's ord() loop, round-12's
#: O(n) rewrite of the substr(i, 1) form
SAMPLES = [
    "", "a", "ab", "hello world", "</w>", "x" * 50, "éclair", "a b",
    "日本語テキスト", "rocket 🚀 pad", "🚀", "naïve—dash", "x" * 400,
]


def py_poly(s: str, seed: int = xhash.SEED) -> int:
    h = seed
    for ch in s:
        h = (h * xhash.B + ord(ch)) % xhash.P
    return h


def test_python_reference_properties():
    assert py_poly("") == xhash.SEED
    # distinct short strings map to distinct values here (sanity, not
    # a collision-freeness claim)
    vals = {py_poly(s) for s in SAMPLES}
    assert len(vals) == len(SAMPLES)


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = [
        r.h
        for r in df.select(xhash.poly_hash("s").alias("h"))
        .orderBy("s")
        .collect()
    ]
    want = [py_poly(s) for s in sorted(SAMPLES)]
    assert got == want


def test_duckdb_matches_python():
    con = duckdb.connect()
    for s in SAMPLES:
        lit = "'" + s.replace("'", "''") + "'"
        got, = con.sql("SELECT " + xhash.poly_hash_sql(lit)).fetchone()
        assert got == py_poly(s), s


def test_affine_family_matches_both_engines(spark):
    n = 64
    a, b = xhash._affine_coeffs(n)
    base = py_poly("hello world")
    want = [(a[i] * base + b[i]) % xhash.P for i in range(n)]
    df = spark.createDataFrame([("hello world",)], "s string").select(
        xhash.poly_hash("s").alias("h")
    )
    got_spark = df.select(
        *[xhash.affine_hash(df.h, i, n).alias(f"h{i}") for i in range(n)]
    ).collect()[0]
    assert list(got_spark) == want
    con = duckdb.connect()
    got_duck = [
        con.sql(
            "SELECT "
            + xhash.affine_hash_sql(str(base), str(i), n)
        ).fetchone()[0]
        for i in (0, 1, 31, 63)
    ]
    assert got_duck == [want[i] for i in (0, 1, 31, 63)]


def test_fold_longs_matches_both_engines(spark):
    vals = [5, 999999999, 0, 123456]
    want = xhash.SEED
    for v in vals:
        want = (want * xhash.B + v) % xhash.P
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        xhash.poly_fold_longs(
            F.array(*[F.lit(v).cast("long") for v in vals])
        ).alias("h")
    )
    assert df.collect()[0].h == want
    con = duckdb.connect()
    got, = con.sql(
        "SELECT "
        + xhash.poly_fold_longs_sql("[5,999999999,0,123456]::BIGINT[]")
    ).fetchone()
    assert got == want


def test_poly_mode_minhash_lsh_recall_vs_exact(spark):
    """Poly-mode LSH must behave like an LSH: every exact near-dup pair
    (unigram Jaccard >= 0.5, via ngram_jaccard_pairs) that agrees on
    >= one full band appears among its candidates — on a corpus with
    engineered duplicates."""
    from gpi_etl_spark.operators import dedup

    rows = []
    for i in range(30):
        rows.append((i, f"common base text block number {i % 5} with tail {i}"))
        rows.append((100 + i, f"common base text block number {i % 5} with tail {i}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(df, n=1, threshold=0.99).collect()
    }
    cands = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(
            df, n=1, num_hashes=64, bands=16, hash_mode="poly"
        ).collect()
    }
    # identical docs have identical signatures -> always candidates
    assert exact <= cands
