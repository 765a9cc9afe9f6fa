"""Date kit: %U week parity with Python strftime, month-name maps."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gpi_etl_spark.functions.dates import (
    MONTH_NAMES,
    from_epoch_seconds,
    month_name_expr,
    week_of_year_sunday,
)


@settings(max_examples=30, deadline=None)
@given(st.dates(min_value=dt.date(1995, 1, 1), max_value=dt.date(2030, 12, 31)))
def test_week_of_year_matches_python_strftime_U(spark, d):
    """F-DT8 hard part: strftime('%U') is Sunday-start — Spark's ISO
    weekofyear is NOT equivalent (HTGPICFT/__init__.py:50-60)."""
    df = spark.createDataFrame([(d,)], "d date")
    got = df.select(week_of_year_sunday("d").alias("w")).first().w
    assert got == int(d.strftime("%U"))


def test_month_names_reference_spelling(spark):
    """June/July spelled out (HTGPIINFLATUS/__init__.py:43-44)."""
    assert MONTH_NAMES[6] == "June" and MONTH_NAMES[7] == "July"
    df = spark.createDataFrame([(m,) for m in range(1, 13)], "m int")
    got = [r.n for r in df.select(month_name_expr("m").alias("n")).orderBy("m").collect()]
    assert got == ["Jan", "Feb", "Mar", "Apr", "May", "June", "July", "Aug",
                   "Sep", "Oct", "Nov", "Dec"]


def test_epoch_roundtrip(spark):
    df = spark.createDataFrame([(1704067200,)], "sec long")
    got = df.select(from_epoch_seconds("sec").alias("ts")).first().ts
    assert got == dt.datetime(2024, 1, 1, 0, 0)
