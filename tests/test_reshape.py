"""Reshape kit: pivot, melt, transpose round-trips."""

import pytest

from gpi_etl_spark.operators.reshape import melt, pivot_wide, transpose


def test_pivot_wide(spark):
    df = spark.createDataFrame(
        [("d1", "A", 1.0), ("d1", "B", 2.0), ("d2", "A", 3.0)],
        "date string, sym string, close double",
    )
    out = pivot_wide(df, ["date"], "sym", "close", values=["A", "B"])
    rows = {r.date: (r.A, r.B) for r in out.collect()}
    assert rows == {"d1": (1.0, 2.0), "d2": (3.0, None)}


def test_melt_roundtrip(spark):
    wide = spark.createDataFrame([(2024, 1.1, 2.2)], "Year int, Jan double, Feb double")
    long = melt(wide, ["Year"], ["Jan", "Feb"], "Month", "Inflation")
    assert {(r.Month, r.Inflation) for r in long.collect()} == {("Jan", 1.1), ("Feb", 2.2)}
    back = pivot_wide(long, ["Year"], "Month", "Inflation", values=["Jan", "Feb"])
    assert back.first().asDict() == {"Year": 2024, "Jan": 1.1, "Feb": 2.2}


def test_transpose(spark):
    """The WASDE wheat-class sheet `.T` (HTGPIWASDE/__init__.py:358,369)."""
    df = spark.createDataFrame(
        [("A", 1.0, 10.0), ("B", 2.0, 20.0)], "cls string, m1 double, m2 double"
    )
    out = transpose(df, "cls", ["m1", "m2"])
    rows = {r.metric: (r.A, r.B) for r in out.collect()}
    assert rows == {"m1": (1.0, 2.0), "m2": (10.0, 20.0)}


def test_transpose_width_guard(spark):
    df = spark.createDataFrame([(str(i), float(i)) for i in range(20)], "k string, v double")
    with pytest.raises(ValueError, match="max 10"):
        transpose(df, "k", ["v"], max_width=10)
