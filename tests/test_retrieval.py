"""Reciprocal-rank fusion: hand-computed fusion, absence handling,
and determinism of the fused ordering."""

from __future__ import annotations


def test_rrf_hand_computed(spark):
    from gpi_etl_spark.operators.retrieval import rrf_fuse

    sparse = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rank int"
    )
    got = {
        r.doc_id: (r.fused_rank, r.sparse_rank, r.dense_rank, r.rrf_r)
        for r in rrf_fuse(
            [("sparse", sparse), ("dense", dense)], top=10
        ).collect()
    }
    import math

    def fs6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    # doc 20 is in both lists -> highest fused score
    assert got[20] == (1, 2, 1, fs6(1.0 / 62 + 1.0 / 61))
    assert got[10] == (2, 1, 0, fs6(1.0 / 61))
    # 30 and 40 tie on absent-vs-rank? 30: 1/63, 40: 1/62 -> 40 wins
    assert got[40][0] == 3 and got[30][0] == 4


def test_rrf_tie_breaks_on_id(spark):
    from gpi_etl_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(5, 1), (3, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (5, 2)], "doc_id long, rank int")
    got = [
        r.doc_id
        for r in rrf_fuse([("a", a), ("b", b)], top=2).collect()
    ]
    # symmetric scores -> ascending id breaks the tie
    assert got == [3, 5]


def test_rrf_top_truncation(spark):
    from gpi_etl_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(i, i) for i in range(1, 9)], "doc_id long, rank int"
    )
    out = rrf_fuse([("a", a)], top=3).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]
    assert [r.fused_rank for r in out] == [1, 2, 3]


def test_phrase_search_overlapping_and_counts(spark):
    from gpi_etl_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [
            (1, ["a", "a", "a", "b"]),
            (2, ["a", "b", "c", "a", "b"]),
            (3, ["b", "a"]),
        ],
        "doc_id bigint, tk array<string>",
    )
    out = {
        (r.phrase, r.doc_id): r.n_hits
        for r in phrase_search(
            docs, [["a", "a"], ["a", "b", "c"]], "tk"
        ).collect()
    }
    # overlapping: 'a a a' holds 'a a' twice
    assert out[("a a", 1)] == 2
    assert out[("a b c", 2)] == 1
    assert ("a a", 2) not in out and ("a a", 3) not in out


def test_phrase_search_rejects_single_word(spark):
    import pytest

    from gpi_etl_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [(1, ["a"])], "doc_id bigint, tk array<string>"
    )
    with pytest.raises(ValueError):
        phrase_search(docs, [["a"]], "tk")


def test_phrase_search_deterministic(spark):
    from gpi_etl_spark.operators.retrieval import phrase_search

    import random

    rng = random.Random(6)
    docs = spark.createDataFrame(
        [
            (i, [rng.choice("abcd") for _ in range(30)])
            for i in range(50)
        ],
        "doc_id bigint, tk array<string>",
    )
    one = sorted(phrase_search(docs, [["a", "b"]], "tk").collect())
    two = sorted(
        phrase_search(docs.repartition(9), [["a", "b"]], "tk").collect()
    )
    assert one == two and len(one) > 10


def test_phrase_search_rejects_empty_list(spark):
    import pytest

    from gpi_etl_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [(1, ["a"])], "doc_id bigint, tk array<string>"
    )
    with pytest.raises(ValueError):
        phrase_search(docs, [], "tk")
