"""Engine facade: every reference entry point runs as a named job."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from gpi_etl_spark import engine

CLOCK = dt.datetime(2026, 1, 15, 12, 0, 0)


def test_all_13_endpoints_registered():
    names = engine.endpoints()
    assert len(names) == 13
    assert names == sorted(
        [
            "HTGPIAGRICENSUS", "HTGPICFT", "HTGPIENSO", "HTGPIINFLATUS",
            "HTGPIOILWTI", "HTGPIPROPHEDEX", "HTGPISNP500", "HTGPIWASDE",
            "HTGPIYAHOO", "HTIPNEXSITE", "HTIPPLSITE", "HTIPPLSITECR",
            "PGSITE",
        ]
    )


def test_unknown_endpoint_and_command_raise():
    with pytest.raises(KeyError, match="unknown endpoint"):
        engine.run("HTGPINOPE")
    with pytest.raises(KeyError, match="Opcion no definida"):
        engine.prophetx("COMMODITIES_NOPE")


def _bars(spark):
    return spark.createDataFrame(
        [
            ("@CU25", "2024-01-02", "100", "5", 4.1),
            ("@CU25", "2024-01-03", "110", "---", 4.2),
            ("@WU25", "2024-01-02", "90", "7", 5.0),
            ("@SM", "2024-01-02", "80", "2", 6.0),
        ],
        "TickerSymbol string, Date string, OI string, Volume string, Close double",
    )


def _quotes(spark):
    return spark.createDataFrame(
        [
            ("@CU25C2500.IV", "@CU25", "2024-01-02", 0.21),
            ("@CU25P2500.IV", "@CU25", "2024-01-02", 0.19),
            ("@WU25C600.IV", "@WU25", "2024-01-02", 0.31),
        ],
        "TickerSymbol string, SymbolATM string, Date string, Close double",
    )


def test_yahoo_endpoint(spark):
    bars = spark.createDataFrame(
        [("2024-01-02", 1.5, "ADM"), ("2024-01-03", None, "ADM")],
        "Date string, Close double, Symbol string",
    )
    out = engine.run("HTGPIYAHOO", bars=bars, clock=CLOCK)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].Date == "2024-01-02"
    assert rows[0].actualizacion == CLOCK


def test_cftc_endpoint(spark):
    cot = spark.createDataFrame(
        [(dt.date(2024, 1, 2), 10, 4)],
        "Report_Date_as_MM_DD_YYYY date, M_Money_Positions_Long_ALL int, "
        "M_Money_Positions_Short_ALL int",
    )
    out = engine.run("HTGPICFT", cot=cot, year=2024, clock=CLOCK)
    assert out.first().calculo == 6


def test_enso_endpoint(spark):
    from gpi_etl_spark.queries import _ENSO_LINES

    lines = spark.createDataFrame([(ln,) for ln in _ENSO_LINES], "value string")
    out = engine.run("HTGPIENSO", lines=lines, year=2026, clock=CLOCK)
    assert out.count() > 0
    assert "SST_NINO34" in out.columns and "DEL1" not in out.columns


def test_inflatus_endpoint(spark):
    grid = spark.createDataFrame(
        [(2024, "1.1", "–"), (2025, "2.0", "2.2")],
        "Year int, Jan string, Feb string",
    )
    out = engine.run("HTGPIINFLATUS", grid=grid, clock=CLOCK)
    got = {(r.Year, r.Month): r.Inflation for r in out.collect()}
    assert got == {(2024, "Jan"): 1.1, (2025, "Jan"): 2.0, (2025, "Feb"): 2.2}


def test_oilwti_and_agricensus_endpoints(spark):
    series = spark.createDataFrame(
        [(dt.date(2024, 1, 2), 70.5), (dt.date(2023, 12, 1), 69.0)],
        "Date date, Close double",
    )
    out = engine.run(
        "HTGPIOILWTI", series=series, watermark_date=dt.date(2023, 12, 31),
        clock=CLOCK,
    )
    assert out.count() == 1

    feed = spark.createDataFrame(
        [("x", dt.date(2024, 1, 2), 3.5)], "name string, date date, price double"
    )
    out2 = engine.run("HTGPIAGRICENSUS", series=feed, clock=CLOCK)
    assert "name" not in out2.columns and out2.count() == 1


def test_snp500_endpoint(spark):
    arrays = spark.createDataFrame(
        [([1704153600, 1704240000], [4700.0, None])],
        "timestamp array<bigint>, close array<double>",
    )
    out = engine.run("HTGPISNP500", arrays=arrays, clock=CLOCK)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].Close == 4700.0


def test_wasde_endpoint_with_month_reload(spark):
    grid = [
        (0, 0, "WASDE-668"), (1, 0, "World Corn Supply and Use 1/"),
        (2, 0, "Million Metric Tons"),
        (3, 0, "Beginning Stocks"), (3, 1, "2024/25 Est."),
        (4, 0, "World 3/"), (4, 1, "310.1"), (4, 2, "1200"), (4, 3, "5"),
        (4, 4, "750"), (4, 5, "1150"), (4, 6, "180"), (4, 7, "300"),
    ]
    cells = spark.createDataFrame(
        [("p22", r, c, v) for r, c, v in grid],
        "sheet string, row_idx int, col_idx int, value string",
    )
    out = engine.run(
        "HTGPIWASDE", cells=cells, sheet="p22", daterelease="2026-01-12",
        commodity="Corn", clock=CLOCK,
    )
    assert out.count() == 1

    # month reload: a prior release of the same month is replaced
    sink = out.withColumn("DATERELEASE", F.lit("2026-01-05"))
    merged = engine.run(
        "HTGPIWASDE", cells=cells, sheet="p22", daterelease="2026-01-12",
        commodity="Corn", sink=sink, clock=CLOCK,
    )
    assert [r.DATERELEASE for r in merged.collect()] == ["2026-01-12"]


def test_prophetx_all_commands_run(spark):
    bars, quotes = _bars(spark), _quotes(spark)
    series = spark.createDataFrame(
        [(dt.date(2024, 1, 2), 103.0)], "Date date, Close double"
    )
    kwargs = {
        "COMMODITIES_PRICE_HISTORY_CF": dict(bars=bars, clock=CLOCK),
        "COMMODITIES_PRICE_HISTORY_CC": dict(bars=bars, clock=CLOCK),
        "COMMODITIES_PRICE_HISTORY_CA": dict(bars=bars, clock=CLOCK),
        "COMMODITIES_PRICE_CORN": dict(bars=bars, clock=CLOCK),
        "COMMODITIES_PRICE_WHEAT": dict(bars=bars, clock=CLOCK),
        "COMMODITIES_PRICE_SOYBEAN": dict(bars=bars, clock=CLOCK),
        "COMMODITIES_DOLLAR": dict(bars=series, clock=CLOCK),
        "COMMODITIES_ETHANOL": dict(bars=series, clock=CLOCK),
        "COMMODITIES_INDEX": dict(bars=series, clock=CLOCK),
        "COMMODITIES_VI": dict(quotes=quotes, clock=CLOCK),
        "COMMODITIES_OI_VOLUME": dict(raw=bars, clock=CLOCK),
        "COMMODITIES_VI_5N_CORN": dict(quotes=quotes, clock=CLOCK),
        "COMMODITIES_VI_5N_WHEAT": dict(quotes=quotes, clock=CLOCK),
        "COMMODITIES_VI_5N_SOYBEAN": dict(quotes=quotes, clock=CLOCK),
    }
    assert set(kwargs) == set(engine.PROPHETX_COMMANDS)
    counts = {
        name: engine.run("HTGPIPROPHEDEX", command=name, **kw).count()
        for name, kw in kwargs.items()
    }
    # commodity restriction actually filters
    assert counts["COMMODITIES_PRICE_CORN"] == 2       # the two @CU25 bars
    assert counts["COMMODITIES_PRICE_WHEAT"] == 1      # @WU25
    assert counts["COMMODITIES_PRICE_SOYBEAN"] == 1    # @SM
    assert counts["COMMODITIES_VI_5N_CORN"] == 1       # one Date row
    assert counts["COMMODITIES_VI_5N_SOYBEAN"] == 0
    assert counts["COMMODITIES_OI_VOLUME"] == 2        # one row per distinct Date
    assert all(c >= 0 for c in counts.values())


def test_site_family_endpoints(spark):
    from gpi_etl_spark.operators.score import ThresholdModel
    from gpi_etl_spark.schemas import GEO_POINTS, POIS

    pois = spark.createDataFrame(
        [
            ("N1", 9.93, -84.08, "p1", "BANCO NACIONAL", "BANK", 9.9305, -84.08),
            ("N1", 9.93, -84.08, "p3", "PIZZA HUT", "RESTAURANT", 9.9302, -84.0801),
        ],
        POIS,
    )
    cats = ["BANCO", "CADENA QSR"]
    model = ThresholdModel(0)  # GEO_BANCO_300M_CNT is the first feature
    stores = spark.createDataFrame(
        [
            ("S1", 9.9301, -84.0801, "POLLOLANDIA", "GUATEMALA"),
            ("S2", 9.94, -84.09, "POLLOLANDIA", "HONDURAS"),
        ],
        GEO_POINTS,
    )
    for name in ("HTIPNEXSITE", "HTIPPLSITE", "HTIPPLSITECR", "PGSITE"):
        result = engine.run(name, pois=pois, model=model, categories=cats)
        assert result.near is None  # consistent SiteScoring shape
        assert result.scored.first().forecast == 1.0
    scored, near = engine.run(
        "HTIPNEXSITE", pois=pois, model=model, categories=cats, stores=stores
    )
    rows = near.collect()
    assert [r.POS_NM for r in rows] == ["S1"]  # country filter: GUATEMALA only
    scored_hn, near_hn = engine.run(
        "HTIPPLSITE", pois=pois, model=model, categories=cats, stores=stores
    )
    assert [r.POS_NM for r in near_hn.collect()] == ["S2"]


def test_site_endpoint_compat_flag_selects_reference_rules(spark):
    """``compat=True`` reaches the bug-for-bug classifier through
    engine.run (ADVICE r2): the :238 CAJERO rule is WRITTEN against
    poi_type but the reference loop matches poi_name — so a POI *named*
    CAJERO with a non-ATM type counts toward GEO_CAJERO only in compat
    mode."""
    from gpi_etl_spark import engine
    from gpi_etl_spark.operators.score import ThresholdModel
    from gpi_etl_spark.schemas import POIS

    pois = spark.createDataFrame(
        [("N1", 9.93, -84.08, "p1", "CAJERO EXPRESO", "OTHER", 9.9302, -84.0801)],
        POIS,
    )
    model = ThresholdModel(0)
    fixed = engine.run(
        "HTIPNEXSITE", pois=pois, model=model, categories=["CAJERO"]
    )
    compat = engine.run(
        "HTIPNEXSITE", pois=pois, model=model, categories=["CAJERO"],
        compat=True,
    )
    assert fixed.scored.first().forecast == 0.0
    assert compat.scored.first().forecast == 1.0
