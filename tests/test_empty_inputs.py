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


def test_round4_operators_on_empty_inputs(spark):
    """The q123-q148 operator families must return empty frames (or a
    sane base case) on empty inputs, never crash — the guard that
    keeps a zero-row partition or an empty incremental batch from
    killing a production run."""
    from gpi_etl_spark.operators.cooccur import cooccurrence_pairs, pmi_pairs
    from gpi_etl_spark.operators.curation import (
        contamination_overlap,
        importance_weights,
        temperature_mix,
    )
    from gpi_etl_spark.operators.funnel import (
        event_transitions,
        funnel_steps,
        retention_cohorts,
    )
    from gpi_etl_spark.operators.hierarchy import transitive_root
    from gpi_etl_spark.operators.linkgraph import pagerank, triangle_counts
    from gpi_etl_spark.operators.quality import mad_outliers, psi_drift
    from gpi_etl_spark.operators.similarity import quantize_embeddings
    from gpi_etl_spark.operators.textstats import (
        char_entropy,
        shared_sentence_stats,
    )
    from gpi_etl_spark.operators.watermark import (
        point_in_time_join,
        scd2_history,
    )

    docs = spark.createDataFrame([], "doc_id long, lang string, text string")
    edges = spark.createDataFrame([], "src long, dst long")
    events = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string"
    )
    vecs = spark.createDataFrame([], "vec_id long, embedding array<double>")
    nodes = spark.createDataFrame([], "node long, parent long")
    toks = spark.createDataFrame([], "doc_id long, lang string, n_tokens int")

    assert pagerank(edges).count() == 0
    assert triangle_counts(edges).count() == 0
    assert transitive_root(nodes).count() == 0
    assert cooccurrence_pairs(docs, "doc_id", "lang").count() == 0
    assert pmi_pairs(docs, "doc_id", "lang").count() == 0
    assert contamination_overlap(docs, docs).count() == 0
    assert importance_weights(docs, docs).count() == 0
    assert temperature_mix(toks).count() == 0
    assert funnel_steps(events, ["view", "click"]).count() == 0
    assert retention_cohorts(events).count() == 0
    assert event_transitions(events).count() == 0
    assert mad_outliers(docs, "lang", "doc_id").count() == 0
    assert psi_drift(toks, toks, "n_tokens").count() == 10  # spine survives
    assert quantize_embeddings(vecs).count() == 0
    assert char_entropy(docs).count() == 0
    assert shared_sentence_stats(docs).count() == 0
    assert scd2_history(docs, ["doc_id"], "lang", ["text"]).count() == 0
    assert point_in_time_join(
        events,
        spark.createDataFrame(
            [], "user_id long, tier int, valid_from timestamp, valid_to timestamp"
        ),
        ["user_id"],
        "ts",
    ).count() == 0


def test_round5_operator_families_empty(spark):
    """Round-5 families on empty frames: never raise, never invent
    rows. (dhash/HITS excluded: dhash needs decodable payloads by
    contract — strict-raise is its empty-payload behavior; hits on an
    empty edge list is covered by the pagerank assertion's shape.)"""
    from gpi_etl_spark.operators.cdc import cdc_merge
    from gpi_etl_spark.operators.curation import pps_systematic_sample
    from gpi_etl_spark.operators.dedup import (
        jaccard_pairs_prefix_filtered,
    )
    from gpi_etl_spark.operators.entities import resolve_entities
    from gpi_etl_spark.operators.funnel import attribute_conversions
    from gpi_etl_spark.operators.heavyhitters import heavy_hitters
    from gpi_etl_spark.operators.linkgraph import hits
    from gpi_etl_spark.operators.textstats import bm25_scores
    from gpi_etl_spark.operators.windows import linear_interpolate

    docs = spark.createDataFrame([], "doc_id long, text string")
    parts = spark.createDataFrame([], "pid long, name string")
    events = spark.createDataFrame(
        [],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    series = spark.createDataFrame([], "k string, i long, v double")
    snap = spark.createDataFrame([], "k long, v long")
    log = spark.createDataFrame([], "k long, v long, op string, seq long")
    items = spark.createDataFrame([], "item string")
    wdocs = spark.createDataFrame(
        [], "doc_id long, source string, n_chars long"
    )
    edges = spark.createDataFrame([], "src long, dst long")

    assert resolve_entities(parts, "pid", "name").count() == 0
    assert attribute_conversions(events).count() == 0
    assert cdc_merge(snap, log, ["k"]).count() == 0
    assert heavy_hitters(items, "item", k=5).count() == 0
    assert bm25_scores(docs, ("x",)).count() == 0
    assert linear_interpolate(series, "i", "v", ("k",)).count() == 0
    assert pps_systematic_sample(wdocs, "source", "n_chars", 5).count() == 0
    assert jaccard_pairs_prefix_filtered(docs, n=1).count() == 0
    assert hits(edges, iters=2).count() == 0
    assert hits(edges, iters=8).count() == 0  # persist path
