"""Indicators + math kit: banker's rounding parity, ladders, ratios."""

from pyspark.sql import functions as F

from gpi_etl_spark.functions.mathx import atm_strike, strike_ladder
from gpi_etl_spark.operators.indicators import (
    implied_imports,
    iv_skew,
    net_position,
    stocks_to_use,
    total_use,
)


def test_atm_strike_bankers_rounding_parity(spark):
    """F-M2 hard part: Python round() is HALF_EVEN; Spark bround must
    match it on exact ties (plain round() would give HALF_UP)."""
    closes = [1049.25, 1049.35, 1050.0, 987.6]
    df = spark.createDataFrame([(c,) for c in closes], "close double")
    got = [r.atm for r in df.select(atm_strike("close").alias("atm")).collect()]
    expected = [round(c / 100, 1) * 1000 for c in closes]
    assert got == expected  # 1049.25 → 10492.0 (even), not 10493.0


def test_strike_ladder(spark):
    df = spark.createDataFrame([("CU", 10500.0)], "sym string, atm double")
    out = strike_ladder(df, "atm", step=100, n_steps=5)
    strikes = sorted(r.strike for r in out.collect())
    assert len(strikes) == 11
    assert strikes[0] == 10000.0 and strikes[-1] == 11000.0


def test_stocks_to_use_reference_formula(spark):
    """F-M6 (HTGPIWASDE/__init__.py:500-506): ending/total*100, 0 on 0."""
    df = spark.createDataFrame(
        [(10.0, 40.0), (10.0, 0.0)], "ending double, total double"
    )
    out = [r.v for r in df.select(stocks_to_use("ending", "total").alias("v")).collect()]
    assert out == [25.0, 0.0]


def test_total_use_and_net_position(spark):
    df = spark.createDataFrame([(30.0, 12.0)], "a double, b double")
    assert df.select(total_use("a", "b").alias("v")).first().v == 42.0
    assert df.select(net_position("a", "b").alias("v")).first().v == 18.0


def test_iv_skew_skipna(spark):
    df = spark.createDataFrame(
        [(1.0, None, 2.0, 0.5, None, None)],
        "c1 double, c2 double, c3 double, p1 double, p2 double, p3 double",
    )
    v = df.select(iv_skew(["c1", "c2", "c3"], ["p1", "p2", "p3"]).alias("v")).first().v
    assert v == 2.5  # (1+0+2) − (0.5+0+0)


def test_implied_imports(spark):
    df = spark.createDataFrame([(100.0, 60.0, 30.0)], "s double, p double, b double")
    assert df.select(implied_imports("s", "p", "b").alias("v")).first().v == 10.0
