"""Schema evolution across corpus generations (sources/evolution.py)."""

import pytest

from gpi_etl_spark.sources.evolution import read_merged, widen_and_union


def test_widen_and_union_reconciles_types_and_columns(spark):
    gen1 = spark.createDataFrame([(1, 10)], "doc_id int, clicks int")
    gen2 = spark.createDataFrame(
        [(2**40, 20, "en")], "doc_id long, clicks int, lang string"
    )
    gen3 = spark.createDataFrame([(3, 1.5, "de")],
                                 "doc_id int, clicks double, lang string")
    out = widen_and_union([gen1, gen2, gen3])
    assert dict(out.dtypes) == {
        "doc_id": "bigint", "clicks": "double", "lang": "string"
    }
    rows = {r["doc_id"]: (r["clicks"], r["lang"]) for r in out.collect()}
    assert rows == {1: (10.0, None), 2**40: (20.0, "en"), 3: (1.5, "de")}


def test_widen_and_union_string_fallback_and_empty(spark):
    a = spark.createDataFrame([(1, 5)], "k int, v int")
    b = spark.createDataFrame([(2, "five")], "k int, v string")
    out = widen_and_union([a, b])
    assert dict(out.dtypes)["v"] == "string"
    assert {r["v"] for r in out.collect()} == {"5", "five"}
    with pytest.raises(ValueError):
        widen_and_union([])


def test_read_merged_unions_file_schemas(spark, tmp_path):
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, old string").write.parquet(
        p + "/gen=1"
    )
    spark.createDataFrame([(2, 3.5)], "id long, new double").write.parquet(
        p + "/gen=2"
    )
    out = read_merged(spark, p)
    assert {"id", "old", "new"} <= set(out.columns)
    rows = {r["id"]: (r["old"], r["new"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: (None, 3.5)}
