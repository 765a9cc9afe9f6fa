"""End-to-end sanity of the q200 ML-curation capstone (value-level
correctness is the DuckDB hash gate's job; these pin the pipeline's
structural invariants)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def test_capstone_invariants(spark):
    from gpi_etl_spark.queries import REGISTRY

    rows = REGISTRY["q200_ml_curation_capstone"][0](spark, SF_DIR).collect()
    by_lang = {r.lang: r for r in rows}
    assert set(by_lang) == {"en", "es", "de", "fr", "zh"}
    for r in rows:
        assert 0 <= r.n_selected <= r.n_docs
        assert 0 <= r.n_selected_pass <= r.n_selected
        assert r.tokens_selected >= r.n_selected  # every doc ≥ 1 token
    # the corpus total must be conserved
    from gpi_etl_spark.queries import t

    assert sum(r.n_docs for r in rows) == t(spark, SF_DIR, "documents").count()


def test_calibrated_selection_is_threshold_consistent(spark):
    """Selection must be a pure function of the bin: two docs in the
    same probability decile are either both selected or neither."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators import logreg
    from gpi_etl_spark.operators.evaluation import isotonic_calibration
    from gpi_etl_spark.operators.textstats import (
        cheap_quality_features,
        gopher_quality_flags,
        token_count,
    )
    from gpi_etl_spark.queries import _LOGREG_FEATURES, t

    docs = t(spark, SF_DIR, "documents")
    flags = gopher_quality_flags(docs).select("doc_id", "pass_gopher")
    frame = (
        docs.select(
            "doc_id", cheap_quality_features("text").alias("q"),
            token_count("text").alias("n_words"),
        )
        .select("doc_id", "n_words", "q.*")
        .join(flags, "doc_id")
        .withColumn("y", F.col("pass_gopher").cast("double"))
    )
    model = logreg.logreg_train(frame, _LOGREG_FEATURES, "y", iters=8, lr=2.0)
    scored = logreg.logreg_score(frame, _LOGREG_FEATURES, model)
    iso = isotonic_calibration(scored, "prob", "pass_gopher", n_bins=10)
    fitted = {r.bin: r.fitted for r in iso.collect()}
    # fitted curve is monotone in the bin index
    bins = sorted(fitted)
    assert all(fitted[a] <= fitted[b] for a, b in zip(bins, bins[1:]))
