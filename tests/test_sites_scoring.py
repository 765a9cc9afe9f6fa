"""Site-selection scoring chain + WASDE extraction."""

import datetime as dt

from pyspark.sql import functions as F

from gpi_etl_spark.plans import sites
from gpi_etl_spark.plans.wasde import extract_supply_use
from gpi_etl_spark.schemas import GEO_POINTS, POIS

CLOCK = dt.datetime(2026, 1, 15, 12, 0, 0)


def _pois(spark):
    rows = [
        ("NEW_POINT_1", 9.93, -84.08, "p1", "BANCO NACIONAL", "BANK", 9.9305, -84.08),
        ("NEW_POINT_1", 9.93, -84.08, "p2", "PANADERÍA SAN JOSÉ", "BAKERY", 9.931, -84.081),
        ("NEW_POINT_1", 9.93, -84.08, "p3", "PIZZA HUT", "RESTAURANT", 9.9302, -84.0801),
        ("NEW_POINT_1", 9.93, -84.08, "p3", "PIZZA HUT", "RESTAURANT", 9.9302, -84.0801),  # dup
        ("NEW_POINT_1", 9.93, -84.08, "p4", "POLLOLANDIA", "RESTAURANT", 9.9295, -84.0805),
    ]
    return spark.createDataFrame(rows, POIS)


from gpi_etl_spark.operators.score import ThresholdModel


def test_classify_last_match_and_accents(spark):
    """Categories come from the reference's FULL chain now: BANK type →
    BANCO (:235), accents folded so PANADERÍA matches PANADERIA (:288),
    PIZZA HUT → CADENA QSR (:255) overriding the RESTAURANT type rule,
    POLLOLANDIA → CADENA QSR POPULAR (:258)."""
    out = {r.poi_id: r.poi_category for r in sites.classify_pois(_pois(spark)).collect()}
    assert out["p1"] == "BANCO"
    assert out["p2"] == "PANADERIA"
    assert out["p3"] == "CADENA QSR"
    assert out["p4"] == "CADENA QSR POPULAR"


def test_poi_features_dedupes_and_widens(spark):
    feats = sites.poi_features(
        sites.classify_pois(_pois(spark)),
        categories=["BANCO", "CADENA QSR", "CADENA QSR POPULAR"],
    )
    r = feats.first()
    assert r.rst_cd == "NEW_POINT_1"
    assert r.GEO_CADENA_QSR_300M_CNT == 1.0  # exact duplicate dropped
    assert r.GEO_BANCO_300M_CNT == 1.0
    assert r.GEO_BANCO_MIN_DIST > 0


def test_score_sites_with_broadcast_model(spark):
    cats = ["BANCO", "CADENA QSR", "CADENA QSR POPULAR"]
    feats = sites.poi_features(sites.classify_pois(_pois(spark)), categories=cats)
    geo_cols = [c for c in feats.columns if c.startswith("GEO_")]
    # predict 1 when the site has any nearby bank
    model = ThresholdModel(geo_cols.index("GEO_BANCO_300M_CNT"))
    scored = sites.score_sites(_pois(spark), model, categories=cats)
    assert scored.first().forecast == 1.0


def test_close_points_top3(spark):
    stores = spark.createDataFrame(
        [
            ("S1", 9.9301, -84.0801, "POLLOLANDIA", "CR"),
            ("S2", 9.94, -84.09, "POLLOLANDIA", "CR"),
            ("S3", 9.80, -84.00, "POLLOLANDIA", "CR"),
            ("S4", 9.93, -84.08, "CASA DEL POLLO", "CR"),
        ],
        GEO_POINTS,
    )
    q = _pois(spark).select("rst_cd", "place_ltt", "place_lgt").distinct()
    out = sites.close_points(q, stores, category="POLLOLANDIA")
    rows = out.orderBy("row_index").collect()
    assert [r.POS_NM for r in rows] == ["S1", "S2", "S3"]
    assert rows[0].mdist < rows[1].mdist < rows[2].mdist


def _wasde_cells(spark):
    grid = [
        (0, 0, "WASDE-668"), (0, 1, ""),
        (1, 0, "World Corn Supply and Use 1/"), (1, 1, ""),
        (2, 0, "Million Metric Tons"), (2, 1, ""),
        # EST. block header
        (3, 0, "Beginning Stocks"), (3, 1, "2024/25 Est."),
        (4, 0, "World 3/"), (4, 1, "310.1"), (4, 2, "1200"), (4, 3, "5"),
        (4, 4, "750"), (4, 5, "1150"), (4, 6, "180"), (4, 7, "300"),
        (5, 0, "Major Exporters"), (5, 1, ""),
        (6, 0, "United States"), (6, 1, "35"), (6, 2, "380"), (6, 3, "NA"),
        (6, 4, "140"), (6, 5, "310"), (6, 6, "55"), (6, 7, "45"),
        (7, 0, ""), (7, 1, "2"), (7, 2, "10"), (7, 3, ""),  # continuation row
        (7, 4, "4"), (7, 5, "8"), (7, 6, "1"), (7, 7, "2"),
        (8, 0, "1/ Aggregate of local marketing years."), (8, 1, ""),
        # PROJ. block header
        (9, 0, "Beginning Stocks"), (9, 1, "2025/26 Proj."),
        (10, 0, "World 3/"), (10, 1, "300"), (10, 2, "1250"), (10, 3, "6"),
        (10, 4, "760"), (10, 5, "1170"), (10, 6, "185"), (10, 7, "0"),
    ]
    rows = [("p22", r, c, v) for r, c, v in grid]
    return spark.createDataFrame(rows, "sheet string, row_idx int, col_idx int, value string")


def test_wasde_extract_supply_use(spark):
    out = extract_supply_use(
        _wasde_cells(spark), "p22", "2026-01-12", "Corn", clock=CLOCK
    ).collect()
    by_key = {(r.Geography, r.Tipo): r for r in out}
    # landmark broadcast
    assert all(r.Wasde == "WASDE-668" for r in out)
    assert all(r.Medida == "Million Metric Tons" for r in out)
    # footnote stripped, sentinels cleaned, derives correct
    w = by_key[("World", "EST.")]
    assert w.Mes == "2024/25 Est."
    assert w["Total Use"] == 1150 + 180
    assert abs(w["Stocks to Use"] - 300 / 1330 * 100) < 1e-9
    us = by_key[("United States", "EST.")]
    assert us.Imports == 0.0  # 'NA' → 0
    assert us.Grupo == "Major Exporters"
    # continuation row forward-fills geography → Orden = 2
    cont = [r for r in out if r.Geography == "United States" and r.Orden == 2]
    assert len(cont) == 1 and cont[0].Production == 10.0
    # PROJ block: zero Total Use → Stocks to Use 0 guard... (185 exports)
    pw = by_key[("World", "PROJ.")]
    assert pw.Tipo == "PROJ."
    # note row and group-header rows filtered
    assert not any("Aggregate" in (r.Geography or "") for r in out)


def test_wasde_extract_two_sheets_one_call(spark):
    """Multi-sheet extract in ONE plan: windows partition by sheet, so
    landmarks/blocks/forward-fills never bleed across sheets and the
    per-sheet commodity map applies."""
    corn = _wasde_cells(spark)
    wheat = corn.withColumn(
        "sheet", F.lit("p12")
    ).withColumn(
        "value",
        F.when(F.col("value") == "WASDE-668", "WASDE-669").otherwise(
            F.col("value")
        ),
    )
    out = extract_supply_use(
        corn.unionByName(wheat),
        ["p22", "p12"],
        "2026-01-12",
        {"p22": "Corn", "p12": "Wheat"},
        clock=CLOCK,
    ).collect()
    corn_rows = [r for r in out if r.Commoditie == "Corn"]
    wheat_rows = [r for r in out if r.Commoditie == "Wheat"]
    assert len(corn_rows) == len(wheat_rows) > 0
    assert all(r.Wasde == "WASDE-668" for r in corn_rows)
    assert all(r.Wasde == "WASDE-669" for r in wheat_rows)
    # per-sheet block/window state: identical shape on both sheets
    key = lambda rows: sorted((r.Geography, r.Tipo, r.Orden) for r in rows)
    assert key(corn_rows) == key(wheat_rows)


def test_linear_model_vector_scoring(spark):
    from gpi_etl_spark.operators.score import LinearModel, score_vector_column

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = score_vector_column(df, LinearModel([0.5, 1.0, -1.0], bias=2.0))
    got = {r.vec_id: r.forecast for r in out.collect()}
    assert got == {1: 0.5 + 2.0 - 3.0 + 2.0, 2: 2.0}


def test_wasde_extract_wheat_classes(spark):
    from gpi_etl_spark.plans.wasde import extract_wheat_classes

    grid = [
        # EST. block: header row (blank corner + class names)
        (0, 0, ""), (0, 1, "Hard Red Winter"), (0, 2, "Durum"), (0, 3, "White"),
        (1, 0, "Production"), (1, 1, "20"), (1, 2, "5"), (1, 3, "NA"),
        (2, 0, "Exports"), (2, 1, "8"), (2, 2, "1"), (2, 3, "2"),
        # PROJ. block
        (3, 0, ""), (3, 1, "Hard Red Winter"), (3, 2, "Durum"), (3, 3, "White"),
        (4, 0, "Production"), (4, 1, "22"), (4, 2, "6"), (4, 3, "7"),
        (5, 0, "Exports"), (5, 1, "9"), (5, 2, "2"), (5, 3, "3"),
    ]
    rows = [("p11", r, c, v) for r, c, v in grid]
    cells = spark.createDataFrame(
        rows, "sheet string, row_idx int, col_idx int, value string"
    )
    out = extract_wheat_classes(cells, "p11", "2026-01-12", clock=CLOCK).collect()
    by_key = {(r.Class, r.Tipo): r for r in out}
    assert len(out) == 6  # 3 classes × 2 blocks
    assert by_key[("Hard Red Winter", "EST.")].Production == 20.0
    assert by_key[("White", "EST.")].Production == 0.0  # 'NA' → 0
    assert by_key[("Durum", "PROJ.")].Exports == 2.0
    assert all(r.DATERELEASE == "2026-01-12" for r in out)


def test_vector_scoring_null_embedding_gives_null(spark):
    from gpi_etl_spark.operators.score import LinearModel, score_vector_column

    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    out = score_vector_column(df, LinearModel([2.0, 3.0], bias=1.0))
    got = {r.vec_id: r.forecast for r in out.collect()}
    assert got[1] == 6.0
    assert got[2] is None or got[2] != got[2]  # NULL or NaN, no crash
