"""Reference-pipeline jobs on FIXTURES.md-shaped fixtures."""

import datetime as dt

from pyspark.sql import functions as F

from gpi_etl_spark.plans import pipelines as P
from gpi_etl_spark.schemas import (
    CFTC_DISAGG,
    INFLATION_GRID,
    PROPHETX_DAILY,
    SNP500_ARRAYS,
    YAHOO_HISTORICAL,
)

CLOCK = dt.datetime(2026, 1, 15, 12, 0, 0)


def test_yahoo_history_drops_empty_close_and_watermarks(spark):
    bars = spark.createDataFrame(
        [
            ("2024-01-02", 1.0, 2.0, 0.5, 1.5, 1.4, 100, "ADM"),
            ("2024-01-03", 1.0, 2.0, 0.5, None, None, 100, "ADM"),  # dropped
            ("2024-01-01", 1.0, 2.0, 0.5, 1.2, 1.1, 100, "ADM"),    # ≤ wm
            ("2024-01-01", 9.0, 9.5, 8.5, 9.2, 9.1, 10, "GC=F"),    # new symbol
        ],
        YAHOO_HISTORICAL,
    )
    loaded = spark.createDataFrame(
        [("2024-01-01", 1.0, 2.0, 0.5, 1.2, 1.1, 100, "ADM")], YAHOO_HISTORICAL
    )
    out = P.yahoo_history(bars, loaded, clock=CLOCK)
    rows = {(r.Symbol, r.Date) for r in out.collect()}
    assert rows == {("ADM", "2024-01-02"), ("GC=F", "2024-01-01")}
    assert out.first().actualizacion == CLOCK


def test_cftc_net_positions(spark):
    cot = spark.createDataFrame(
        [
            (dt.date(2024, 1, 9), "WHEAT-SRW", 100.0, 30.0, None, 5.0),
            (dt.date(2024, 1, 2), "WHEAT-SRW", 90.0, 50.0, 1.0, None),  # ≤ wm
        ],
        CFTC_DISAGG,
    )
    out = P.cftc_net_positions(cot, watermark_date=dt.date(2024, 1, 2), year=2024,
                               clock=CLOCK)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].calculo == 70.0
    assert rows[0].año == 2024
    assert rows[0].Open_Interest_All == 0.0  # fillna(0)


def _enso_line(week, *vals):
    """Assemble one line at the exact reference widths
    [10,5,4,4, 5,4,4, 5,4,4, 5,4,4] (HTGPIENSO/__init__.py:77)."""
    widths = [5, 4, 4, 5, 4, 4, 5, 4, 4, 5, 4, 4]
    return week.ljust(10) + "".join(str(v).rjust(w) for v, w in zip(vals, widths))


def test_enso_weekly_decode(spark):
    lines = spark.createDataFrame(
        [
            ("hdr1",), ("hdr2",), ("hdr3",), ("hdr4",),
            (_enso_line("04JAN2026", 25.1, 0.5, "x", 25.2, 0.6, "y",
                        26.0, 0.1, "z", 27.1, -0.2, "w"),),
            (_enso_line("28DEC2025", 24.0, 0.1, "x", 24.2, 0.2, "y",
                        25.0, 0.0, "z", 26.1, 0.3, "w"),),
        ],
        "value string",
    )
    out = P.enso_weekly(lines, year=2026, clock=CLOCK)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.WEEK == "04JAN2026"
    assert r.SST_NINO12 == 25.1 and r.SSTA_NINO4 == -0.2
    assert r.week_date == dt.date(2026, 1, 4)


def test_inflation_long(spark):
    grid = spark.createDataFrame(
        [(2024, "3.1", "3.2", "", "–", None, "2.9", "2.8", "", "", "", "", "")],
        INFLATION_GRID,
    )
    out = P.inflation_long(grid, watermark_date=dt.date(2024, 2, 29), clock=CLOCK)
    rows = {(r.Month, r.date, r.Inflation) for r in out.collect()}
    # Jan/Feb ≤ watermark; sentinels dropped; June/July survive
    assert rows == {
        ("June", dt.date(2024, 6, 30), 2.9),
        ("July", dt.date(2024, 7, 31), 2.8),
    }


def test_snp500_from_arrays(spark):
    arrays = spark.createDataFrame(
        [([1704067200, 1704153600, 1704240000], [4700.0, None, 4750.0])],
        SNP500_ARRAYS,
    )
    out = P.snp500_from_arrays(arrays, start=dt.date(2024, 1, 1), clock=CLOCK)
    rows = {(r.Date, r.Close) for r in out.collect()}
    assert rows == {(dt.date(2024, 1, 3), 4750.0)}  # null dropped, Jan 1 ≤ start


def test_prophetx_price_history(spark):
    bars = spark.createDataFrame(
        [
            ("@CU25", "2024-01-03", 1.0, 2.0, 0.5, 1.5, "---", "120"),
            ("@CU25", "2024-01-01", 1.0, 2.0, 0.5, 1.4, "80", "100"),  # ≤ wm
            ("QCLF26", "2024-01-02", 70.0, 71.0, 69.0, 70.5, "10", "---"),
        ],
        PROPHETX_DAILY,
    )
    loaded = spark.createDataFrame(
        [("@CU25", "2024-01-02", 1.0, 2.0, 0.5, 1.4, "80", "100")], PROPHETX_DAILY
    )
    out = P.prophetx_price_history(bars, loaded, clock=CLOCK)
    rows = {(r.TickerSymbol, r.Date, r.OI) for r in out.collect()}
    # '@CU25' → commodity 'CU' (len 5 → first-2 rule applies to '@C'… no:
    # len('@CU25')=5 → substring(1,2)='@C'; QCLF26 len 6 → '@' no → 'QCL'
    assert rows == {("@CU25", "2024-01-03", 0.0), ("QCLF26", "2024-01-02", 10.0)}


def test_prophetx_iv_wide_skew(spark):
    quotes = spark.createDataFrame(
        [
            ("2024-01-02", "WK25C500.IV", 10.0),
            ("2024-01-02", "WK25C600.IV", 11.0),
            ("2024-01-02", "WK25P500.IV", 9.0),
            ("2024-01-03", "WK25C500.IV", 12.0),
        ],
        "Date string, TickerSymbol string, Close double",
    )
    out = P.prophetx_iv_wide(quotes, clock=CLOCK)
    rows = {r.Date: r for r in out.collect()}
    assert rows["2024-01-02"].Skew == 12.0  # (10+11) − 9
    assert rows["2024-01-03"].Skew == 12.0  # 12 − 0
    assert rows["2024-01-02"]["WK25C600.IV"] == 11.0


def test_prophetx_oi_vol_rollup(spark):
    raw = spark.createDataFrame(
        [
            ("S1", "2024-01-02", "10", "---"),
            ("S2", "2024-01-02", "5", "7"),
        ],
        "Symbol string, Date string, OI string, Volume string",
    )
    out = P.prophetx_oi_vol_rollup(raw, clock=CLOCK).collect()
    assert len(out) == 1
    assert out[0].OI == 15.0 and out[0].Volume == 7.0


def test_price_series_increment_drop_and_filter(spark):
    s = spark.createDataFrame(
        [("2024-01-02", "x", "WHEAT", 220.0, "USD/mt"),
         ("2024-01-01", "y", "WHEAT", 218.0, "USD/mt")],
        "date string, name string, commodity string, price double, unit string",
    )
    out = P.price_series_increment(
        s, date_col="date", watermark_date="2024-01-01", drop_cols=("name",),
        clock=CLOCK,
    )
    assert "name" not in out.columns
    assert out.count() == 1
