"""Legacy BIFF8 .xls reader (sources/xls.py) against hand-built
fixtures (tests/xls_fixture.py) — closes SURVEY §2 S2 (the reference's
WASDE workbooks are .xls read via xlrd, HTGPIWASDE/__init__.py:203-245).
"""

from __future__ import annotations

import pytest

from gpi_etl_spark.sources import xls
from gpi_etl_spark.sources.connectors import excel_cells
from tests import xls_fixture as fx


def _basic_sheet() -> list[bytes]:
    return [
        fx.label_sst(0, 0, 0),                 # "WASDE-668"
        fx.label(0, 1, "inline label"),
        fx.number(1, 0, 310.1),
        fx.rk_int(1, 1, 300),
        fx.rk_float(1, 2, 0.5),
        fx.mulrk(2, 0, [5, 750, 1150]),
        fx.formula_num(3, 0, 1330.0),
        fx.boolerr(3, 1, True),
        fx.number(4, 0, 45658.0, xf=16),       # builtin date fmt (2025-01-01)
    ]


def test_xls_mini_stream_roundtrip():
    payload = fx.build_xls({"p22": _basic_sheet()}, ["WASDE-668"])
    assert len(payload) < 8192  # small → exercised the mini-FAT path
    assert xls.sheet_names(payload) == ["p22"]
    grid = xls.parse_xls_cells(payload, "p22")
    assert grid[0][0] == "WASDE-668"
    assert grid[0][1] == "inline label"
    assert grid[1][0] == "310.1"     # NUMBER float renders like the xlsx scan
    assert grid[1][1] == "300"       # RK 30-bit int
    assert grid[1][2] == "0.5"       # RK truncated float
    assert grid[2][:3] == ["5", "750", "1150"]  # MULRK run
    assert grid[3][0] == "1330"      # FORMULA cached numeric result
    assert grid[3][1] == "TRUE"
    assert grid[4][0] == "2025-01-01"  # serial 45657, 1900 system


def test_xls_regular_fat_stream():
    """Pad the workbook stream past the 4096 mini cutoff → regular FAT
    chain across multiple sectors."""
    sheet = _basic_sheet() + [
        fx.label(10 + i, 0, f"row {i}") for i in range(200)
    ]
    payload = fx.build_xls({"big": sheet}, ["WASDE-668"])
    grid = xls.parse_xls_cells(payload)
    assert grid[0][0] == "WASDE-668"
    assert grid[209][0] == "row 199"


def test_xls_sst_continue_split():
    """A shared string split across SST→CONTINUE with the restated
    grbit byte must reassemble exactly."""
    long = "x" * 5000
    sheet = [fx.label_sst(0, 0, 0), fx.label_sst(0, 1, 1)]
    payload = fx.build_xls(
        {"s": sheet}, ["short", long], sst_split_at=1200
    )
    grid = xls.parse_xls_cells(payload)
    assert grid[0][0] == "short"
    assert grid[0][1] == long


def test_xls_sst_split_between_header_and_first_char():
    """A CONTINUE boundary falling exactly between a string's header and
    its first character restates grbit too — the option byte must not be
    consumed as character data (ADVICE r3)."""
    long = "y" * 800
    sheet = [fx.label_sst(0, 0, 0), fx.label_sst(0, 1, 1)]
    payload = fx.build_xls({"s": sheet}, ["short", long], sst_split_at=0)
    grid = xls.parse_xls_cells(payload)
    assert grid[0][0] == "short"
    assert grid[0][1] == long


def test_xls_formula_string_bool_and_empty_results():
    """FORMULA cells with cached string/boolean/empty results: the text
    lives in the trailing STRING record (reference xlrd path returns it;
    ADVICE r3)."""
    sheet = [
        fx.formula_str(0, 0, "World 3/"),
        fx.formula_bool(0, 1, True),
        fx.formula_empty_str(0, 2),
        fx.number(1, 0, 7.0),
    ]
    payload = fx.build_xls({"f": sheet}, ["pad"])
    grid = xls.parse_xls_cells(payload)
    assert grid[0][0] == "World 3/"
    assert grid[0][1] == "TRUE"
    assert grid[0][2] == ""
    assert grid[1][0] == "7"


def test_xls_v4_4096_byte_sectors():
    """Version-4 compound files put sector n at byte (n+1)*4096; the
    reader must not assume a 512-byte header offset (ADVICE r3)."""
    sheet = _basic_sheet() + [
        fx.label(10 + i, 0, f"row {i}") for i in range(300)
    ]
    payload = fx.build_xls({"big": sheet}, ["WASDE-668"], ssz=4096)
    grid = xls.parse_xls_cells(payload)
    assert grid[0][0] == "WASDE-668"
    assert grid[1][1] == "300"
    assert grid[309][0] == "row 299"


def test_xls_merged_cells_fill_matches_xlsx_twin():
    """MERGEDCELLS anchor expansion mirrors the .xlsx scan: same
    workbook content through both readers yields identical grids.
    (The reference's own merged-range replay is dead code — it writes
    merges into an openpyxl workbook it never reads back — so the
    expansion is opt-out via fill_merged in both scans.)"""
    from gpi_etl_spark.sources.xlsx import parse_xlsx_cells
    from tests.test_xlsx import _make_xlsx, _sheet_xml

    sheet = [
        fx.label(0, 1, "Header"),      # B1 anchor of B1:C2
        fx.number(0, 3, 42.0),         # D1
        fx.label(1, 0, "row2"),
        fx.merged_cells([(0, 1, 1, 2)]),
    ]
    payload = fx.build_xls({"m": sheet}, ["pad"])
    grid = xls.parse_xls_cells(payload)
    assert grid[0][1] == "Header" and grid[0][2] == "Header"
    assert grid[1][1] == "Header" and grid[1][2] == "Header"
    raw = xls.parse_xls_cells(payload, fill_merged=False)
    assert raw[0][2] is None and raw[1][1] is None

    xlsx_payload = _make_xlsx({"m": _sheet_xml(
        "<sheetData>"
        '<row r="1"><c r="B1" t="inlineStr"><is><t>Header</t></is></c>'
        '<c r="D1"><v>42</v></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>row2</t></is></c></row>'
        "</sheetData>"
        '<mergeCells count="1"><mergeCell ref="B1:C2"/></mergeCells>'
    )})
    assert parse_xlsx_cells(xlsx_payload) == grid


def test_xls_custom_date_format_and_1904():
    sheet = [fx.number(0, 0, 100.25, xf=18)]  # custom fmt "yyyy-mm-dd hh:mm"
    payload = fx.build_xls(
        {"d": sheet}, ["pad"],
        custom_formats={164: "yyyy\\-mm\\-dd hh:mm"}, datemode=1,
    )
    grid = xls.parse_xls_cells(payload)
    # 1904 system: serial 100.25 = 1904-04-10 06:00:00
    assert grid[0][0] == "1904-04-10 06:00:00"


def test_xls_multiple_sheets_and_selection():
    payload = fx.build_xls(
        {"one": [fx.label(0, 0, "first")], "two": [fx.label(0, 0, "second")]},
        ["pad"],
    )
    assert xls.sheet_names(payload) == ["one", "two"]
    assert xls.parse_xls_cells(payload, "two")[0][0] == "second"
    assert xls.parse_xls_cells(payload)[0][0] == "first"  # default: first
    with pytest.raises(ValueError, match="not in"):
        xls.parse_xls_cells(payload, "nope")


def test_excel_cells_dispatches_on_ole2_magic():
    payload = fx.build_xls({"p22": [fx.label(0, 0, "hello")]}, ["pad"])
    assert excel_cells(payload, "p22")[0][0] == "hello"


def test_wasde_endpoint_accepts_xls_bytes(spark):
    """engine.run('HTGPIWASDE', cells=<raw .xls bytes>) dispatches on
    the OLE2 magic to the BIFF8 parser — the reference's actual payload
    format flows through the facade unchanged."""
    import datetime as dt

    from gpi_etl_spark import engine

    strings = ["WASDE-668", "World Corn Supply and Use 1/",
               "Million Metric Tons", "Beginning Stocks", "2024/25 Est.",
               "World 3/"]
    recs = [fx.label_sst(0, 0, 0), fx.label_sst(1, 0, 1), fx.label_sst(2, 0, 2),
            fx.label_sst(3, 0, 3), fx.label_sst(3, 1, 4), fx.label_sst(4, 0, 5)]
    for c, v in enumerate([310.1, 1200, 5, 750, 1150, 180, 300], start=1):
        recs.append(fx.number(4, c, float(v)))
    payload = fx.build_xls({"p22": recs}, strings)
    out = engine.run(
        "HTGPIWASDE", cells=payload, sheet="p22", daterelease="2026-01-12",
        commodity="Corn", clock=dt.datetime(2026, 1, 12, 8, 0, 0), spark=spark,
    )
    r = out.first()
    assert r.Geography == "World" and r.Production == 1200.0
    assert r.Wasde == "WASDE-668"


def test_xls_feeds_wasde_extract(spark):
    """End-to-end S2 closure: a BIFF8 workbook flows through
    xls_cells_df into the WASDE supply/use extract."""
    import datetime as dt

    from gpi_etl_spark.plans.wasde import extract_supply_use

    rows = {
        0: ["WASDE-668"],
        1: ["World Corn Supply and Use 1/"],
        2: ["Million Metric Tons"],
        3: ["Beginning Stocks", "2024/25 Est."],
        4: ["World 3/", 310.1, 1200, 5, 750, 1150, 180, 300],
        5: ["Major Exporters"],
        6: ["United States", 35, 380, 0, 140, 310, 55, 45],
    }
    strings: list[str] = []
    recs: list[bytes] = []
    for r, vals in rows.items():
        for c, v in enumerate(vals):
            if isinstance(v, str):
                strings.append(v)
                recs.append(fx.label_sst(r, c, len(strings) - 1))
            else:
                recs.append(fx.number(r, c, float(v)))
    payload = fx.build_xls({"p22": recs}, strings)
    cells = xls.xls_cells_df(spark, payload, "p22")
    out = extract_supply_use(
        cells, "p22", "2026-01-12", "Corn", clock=dt.datetime(2026, 1, 12)
    ).collect()
    by_geo = {r.Geography: r for r in out}
    assert by_geo["World"].Wasde == "WASDE-668"
    assert by_geo["World"]["Total Use"] == 1150 + 180
    assert by_geo["United States"].Grupo == "Major Exporters"


def test_xls_formula_string_spanning_continue():
    """A cached formula string longer than one record spills into
    CONTINUE records; the reader must reassemble, not truncate."""
    import struct as _struct

    long = "z" * 9000
    # FORMULA with string result, then STRING split into two chunks
    res = bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
    formula = fx._rec(
        0x0006,
        _struct.pack("<HHH", 0, 0, 17) + res + _struct.pack("<HIH", 0, 0, 0),
    )
    head = _struct.pack("<HB", len(long), 0) + long[:4000].encode("latin-1")
    cont = b"\x00" + long[4000:].encode("latin-1")  # grbit restated
    string_rec = fx._rec(0x0207, head) + fx._rec(0x003C, cont)
    payload = fx.build_cfb(
        fx.build_workbook_stream({"s": [formula + string_rec]}, ["pad"])
    )
    grid = xls.parse_xls_cells(payload)
    assert grid[0][0] == long
