"""Sentinel-zoo cleaning rules (SURVEY.md §1.2) + guarded arithmetic."""

import pytest
from pyspark.sql import functions as F

from gpi_etl_spark.functions.cleaning import (
    clean_numeric_sentinels,
    horizontal_sum,
    safe_div,
    strip_footnote_markers,
)


def test_zero_and_null_sentinels(spark):
    df = spark.createDataFrame(
        [("",), ("NA",), ("---",), ("–",), ("12.5",), ("  7 ",), ("junk",)],
        "s string",
    )
    out = [r.v for r in df.select(clean_numeric_sentinels("s").alias("v")).collect()]
    assert out == [0.0, 0.0, 0.0, None, 12.5, 7.0, None]


def test_fill_replaces_nulls(spark):
    df = spark.createDataFrame([("–",), ("junk",), ("3",)], "s string")
    out = [
        r.v for r in df.select(clean_numeric_sentinels("s", fill=0).alias("v")).collect()
    ]
    assert out == [0.0, 0.0, 3.0]


def test_strip_footnote_markers(spark):
    df = spark.createDataFrame([("World 3/",), ("Brazil 10/",), ("India",)], "g string")
    out = [r.g for r in df.select(strip_footnote_markers("g").alias("g")).collect()]
    assert out == ["World", "Brazil", "India"]


@pytest.mark.parametrize(
    "num,den,expected", [(10.0, 4.0, 2.5), (10.0, 0.0, 0.0), (10.0, None, 0.0)]
)
def test_safe_div(spark, num, den, expected):
    df = spark.createDataFrame([(num, den)], "n double, d double")
    assert df.select(safe_div(F.col("n"), F.col("d")).alias("v")).first().v == expected


def test_property_sentinels_match_pandas_reference(spark):
    """clean_numeric_sentinels must equal the reference's pandas recipe
    (sentinel replace → to_numeric(coerce) → fillna) on arbitrary mixes
    of sentinels, numerics, and garbage (SURVEY §5.4)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cell = st.one_of(
        st.sampled_from(["", "NA", "---", "–", "junk", "1e3", "-2.5", " 7 ", "nan"]),
        st.integers(-10**6, 10**6).map(str),
        st.floats(-1e6, 1e6, allow_nan=False).map(lambda f: f"{f:.4f}"),
    )

    @settings(max_examples=20, deadline=None)
    @given(st.lists(cell, min_size=1, max_size=30))
    def prop(values):
        import pandas as pd

        s = pd.Series(values).str.strip()
        s = s.replace({"": 0, "NA": 0, "---": 0, "–": None})
        want = pd.to_numeric(s, errors="coerce").fillna(0.0).astype(float).tolist()
        df = spark.createDataFrame([(v,) for v in values], "raw string")
        got = [
            r.x
            for r in df.select(
                clean_numeric_sentinels("raw", fill=0.0).alias("x")
            ).collect()
        ]
        assert got == pytest.approx(want, rel=1e-9, abs=1e-9)

    prop()


def test_horizontal_sum_skipna(spark):
    df = spark.createDataFrame([(1.0, None, 3.0), (None, None, None)],
                               "a double, b double, c double")
    out = [r.v for r in df.select(horizontal_sum(["a", "b", "c"]).alias("v")).collect()]
    assert out == [4.0, 0.0]


def test_nan_string_fills_to_zero(spark):
    """try_cast('nan') yields double NaN (not NULL); fill must replace
    it, matching pandas to_numeric + fillna(0)."""
    df = spark.createDataFrame([("nan",), ("2",)], "raw string")
    got = [r.x for r in df.select(
        clean_numeric_sentinels("raw", fill=0.0).alias("x")).collect()]
    assert got == [0.0, 2.0]


def test_ticker_key_matches_reference_case(spark):
    """Reference CASE: len∈(5,7) → 2nd char; @… → 2 chars after @;
    else first 3 (HTGPIPROPHEDEX/__init__.py:78)."""
    from gpi_etl_spark.functions.strings import ticker_commodity_key

    df = spark.createDataFrame(
        [("@CU25",), ("@CUZ25",), ("QCLF26X",), ("CORN",)], "s string"
    )
    got = [r.k for r in df.select(ticker_commodity_key("s").alias("k")).collect()]
    #        len5→'C'   @+6→'CU'   len7→'C'    else→'COR'
    assert got == ["C", "CU", "C", "COR"]
