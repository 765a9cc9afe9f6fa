"""Distributed Excel-lake scan (sources/excel_lake.py): many mixed
.xls/.xlsx workbooks parse on executors via mapInPandas — the 100×
path for the reference's one-workbook-per-release ingestion
(HTGPIWASDE/__init__.py:203-245, HTGPICFT/__init__.py:92-100).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpi_etl_spark.sources.excel_lake import (
    excel_lake_cells,
    excel_lake_from_files,
)
from tests import xls_fixture as fx
from tests.test_xlsx import NS_MAIN, _make_xlsx, _sheet_xml


def _xls_payload(i: int) -> bytes:
    sheet = [
        fx.label(0, 0, f"wb-{i}"),
        fx.number(1, 0, float(100 + i)),
        fx.rk_int(1, 1, i),
    ]
    return fx.build_xls({"data": sheet}, ["pad"])


def _xlsx_payload(i: int) -> bytes:
    sheet = _sheet_xml(
        "<sheetData>"
        f'<row r="1"><c r="A1" t="inlineStr"><is><t>wb-{i}</t></is></c></row>'
        f'<row r="2"><c r="A2"><v>{100 + i}</v></c>'
        f'<c r="B2"><v>{i}</v></c></row>'
        "</sheetData>"
    )
    return _make_xlsx({"data": sheet})


def _lake(spark, n=12):
    """n mixed payload rows: even ids BIFF8 .xls, odd ids .xlsx."""
    rows = [
        (i, _xls_payload(i) if i % 2 == 0 else _xlsx_payload(i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "workbook_id long, payload binary")


def test_mixed_lake_parses_distributed(spark):
    lake = _lake(spark, 12).repartition(4)
    cells = excel_lake_cells(lake)
    # executor-side parse: the plan is scan → MapInPandas, nothing driver-side
    plan = cells._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan

    out = cells.collect()
    by_wb = {}
    for r in out:
        by_wb.setdefault(r.workbook_id, {})[(r.row_idx, r.col_idx)] = r.value
    assert len(by_wb) == 12
    for i in range(12):
        assert by_wb[i][(0, 0)] == f"wb-{i}"
        assert by_wb[i][(1, 0)] == str(100 + i)
        assert by_wb[i][(1, 1)] == str(i)
    # id column keeps the caller's type
    assert dict(cells.dtypes)["workbook_id"] == "bigint"


def test_lake_skip_mode_drops_bad_payloads(spark):
    rows = [(1, _xls_payload(1)), (2, b"not a workbook"), (3, None)]
    lake = spark.createDataFrame(rows, "workbook_id long, payload binary")
    out = excel_lake_cells(lake, on_error="skip").collect()
    assert {r.workbook_id for r in out} == {1}
    with pytest.raises(Exception, match="failed to parse"):
        excel_lake_cells(lake).collect()


def test_lake_all_sheets_fans_out(spark):
    payload = fx.build_xls(
        {"one": [fx.label(0, 0, "first")], "two": [fx.label(0, 0, "second")]},
        ["pad"],
    )
    lake = spark.createDataFrame([(7, payload)], "workbook_id long, payload binary")
    out = excel_lake_cells(lake, all_sheets=True).collect()
    assert {(r.sheet, r.value) for r in out} == {("one", "first"), ("two", "second")}
    # default: first sheet only
    first = excel_lake_cells(lake).collect()
    assert {r.sheet for r in first} == {"one"}


def test_lake_merged_fill_matches_single_workbook_scan(spark):
    from gpi_etl_spark.sources.xls import parse_xls_cells

    sheet = [fx.label(0, 1, "Header"), fx.merged_cells([(0, 1, 1, 2)])]
    payload = fx.build_xls({"m": sheet}, ["pad"])
    lake = spark.createDataFrame([(1, payload)], "workbook_id long, payload binary")
    out = excel_lake_cells(lake).collect()
    got = {(r.row_idx, r.col_idx): r.value for r in out}
    grid = parse_xls_cells(payload)
    want = {
        (r, c): v
        for r, row in enumerate(grid)
        for c, v in enumerate(row)
        if v is not None
    }
    assert got == want


def test_lake_from_files_binary_source(spark, tmp_path):
    for i in range(4):
        ext = "xls" if i % 2 == 0 else "xlsx"
        payload = _xls_payload(i) if i % 2 == 0 else _xlsx_payload(i)
        (tmp_path / f"wb_{i}.{ext}").write_bytes(payload)
    (tmp_path / "notes.txt").write_bytes(b"not a workbook")

    cells = excel_lake_from_files(spark, str(tmp_path), glob="*.xls*")
    out = cells.collect()
    anchors = {r.value for r in out if (r.row_idx, r.col_idx) == (0, 0)}
    assert anchors == {f"wb-{i}" for i in range(4)}


def test_lake_feeds_wasde_extract(spark):
    """The 100× WASDE path: a lake of monthly workbooks → one cells
    frame → per-workbook supply/use extraction, all executor-side."""
    import datetime as dt

    from gpi_etl_spark.plans.wasde import extract_supply_use

    def wasde_payload(month: int) -> bytes:
        strings = [f"WASDE-{600 + month}", "World Corn Supply and Use 1/",
                   "Million Metric Tons", "Beginning Stocks", "2024/25 Est.",
                   "World 3/"]
        recs = [fx.label_sst(0, 0, 0), fx.label_sst(1, 0, 1),
                fx.label_sst(2, 0, 2), fx.label_sst(3, 0, 3),
                fx.label_sst(3, 1, 4), fx.label_sst(4, 0, 5)]
        for c, v in enumerate([310.1, 1200 + month, 5, 750, 1150, 180, 300],
                              start=1):
            recs.append(fx.number(4, c, float(v)))
        return fx.build_xls({"p22": recs}, strings)

    lake = spark.createDataFrame(
        [(m, wasde_payload(m)) for m in (1, 2)],
        "workbook_id long, payload binary",
    )
    cells = excel_lake_cells(lake, sheet_name="p22")
    for m in (1, 2):
        one = cells.filter(F.col("workbook_id") == m).drop("workbook_id")
        out = extract_supply_use(
            one, "p22", f"2026-0{m}-12", "Corn",
            clock=dt.datetime(2026, m, 12),
        ).collect()
        world = next(r for r in out if r.Geography == "World")
        assert world.Production == 1200.0 + m
        assert world.Wasde == f"WASDE-{600 + m}"


def test_lake_skip_mode_drops_mid_parse_failures_whole(spark):
    """Regression: a workbook failing MID-parse (second sheet of an
    all_sheets scan corrupt) must contribute zero rows in skip mode —
    never a half-emitted workbook."""
    good = fx.build_xls(
        {"one": [fx.label(0, 0, "g1")], "two": [fx.label(0, 0, "g2")]}, ["pad"]
    )
    # corrupt the SECOND sheet's substream: truncate the payload so the
    # first sheet parses but the second raises
    wb_stream = fx.build_workbook_stream(
        {"one": [fx.label(0, 0, "b1")],
         "two": [fx.label(0, 0, "b2"), fx.label_sst(1, 0, 99)]},  # bad isst
        ["pad"],
    )
    bad = fx.build_cfb(wb_stream)
    lake = spark.createDataFrame(
        [(1, good), (2, bad)], "workbook_id long, payload binary"
    )
    out = excel_lake_cells(lake, all_sheets=True, on_error="skip").collect()
    by_wb = {}
    for r in out:
        by_wb.setdefault(r.workbook_id, []).append(r.value)
    assert sorted(by_wb[1]) == ["g1", "g2"]
    assert 2 not in by_wb  # nothing, not just sheet one
