"""Operators must return empty (not crash) on empty inputs — the
reference guards this manually with data.empty checks (P12); here it
must fall out of the lazy plans."""

import pytest

from pyspark.sql import functions as F

from gpi_etl_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from gpi_etl_spark.operators.rangejoin import band_range_join
from gpi_etl_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def empty(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    edges = spark.createDataFrame([], "id_a long, id_b long")
    iv = spark.createDataFrame(
        [], "iv_id int, user_id string, start_ts timestamp, end_ts timestamp"
    )
    pts = spark.createDataFrame([], "user_id string, ts timestamp, point_id int")
    return docs, edges, iv, pts


def test_dedup_ops_on_empty_corpus(spark, empty):
    docs, *_ = empty
    assert ngram_jaccard_pairs(docs).count() == 0
    assert minhash_lsh_pairs(docs).count() == 0


def test_connected_components_no_edges(spark, empty):
    _, edges, *_ = empty
    assert connected_components(edges).count() == 0


def test_band_range_join_empty_sides(spark, empty):
    *_, iv, pts = empty
    assert band_range_join(
        iv, pts, "start_ts", "end_ts", "ts", 60, keys=["user_id"]
    ).count() == 0


def test_salted_join_empty_facts(spark, empty):
    facts = spark.createDataFrame([], "k int, v double")
    dims = spark.createDataFrame([(1, "a")], "k int, name string")
    assert salted_join(facts, dims, "k", n_salts=4).count() == 0
    assert salted_join(facts, dims, "k", n_salts=4, hot_keys=[1]).count() == 0


def test_curation_ops_on_empty_corpus(spark):
    from gpi_etl_spark.operators.curation import (
        contaminated_ids,
        group_sample,
        pack_budget_bins,
        quantile_filter,
        shuffle_deterministic,
        split_assign,
    )
    from gpi_etl_spark.operators.dedup import incremental_dedup
    from gpi_etl_spark.operators.groupedmap import greedy_pack

    e = spark.createDataFrame([], "doc_id long, lang string, text string, n_tok int")
    assert split_assign(e).count() == 0
    assert group_sample(e, "lang").count() == 0
    assert pack_budget_bins(e, "n_tok", "lang").count() == 0
    assert quantile_filter(e, "n_tok", "lang").count() == 0
    assert shuffle_deterministic(e).count() == 0
    assert greedy_pack(e, "n_tok", "lang").count() == 0
    assert contaminated_ids(e, e).count() == 0
    assert incremental_dedup(e, e).count() == 0
    # non-empty batch against empty history passes everything through
    b = spark.createDataFrame([(1, "en", "x", 1)],
                              "doc_id long, lang string, text string, n_tok int")
    assert incremental_dedup(b, e).count() == 1
