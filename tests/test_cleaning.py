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


def test_horizontal_sum_skipna(spark):
    df = spark.createDataFrame([(1.0, None, 3.0), (None, None, None)],
                               "a double, b double, c double")
    out = [r.v for r in df.select(horizontal_sum(["a", "b", "c"]).alias("v")).collect()]
    assert out == [4.0, 0.0]
