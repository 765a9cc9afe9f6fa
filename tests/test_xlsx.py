"""Native .xlsx byte-parse (S2): stdlib zip+XML, no openpyxl."""

import io
import zipfile

import pytest

from gpi_etl_spark.sources.connectors import excel_cells
from gpi_etl_spark.sources.xlsx import parse_xlsx_cells, sheet_names, xlsx_cells_df

NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
NS_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
NS_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"


def _make_xlsx(
    sheets: dict[str, str],
    shared: list[str] = (),
    styles_xml: str | None = None,
    date1904: bool = False,
) -> bytes:
    """Assemble a minimal SpreadsheetML package from worksheet XML."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        names = list(sheets)
        pr = '<workbookPr date1904="1"/>' if date1904 else ""
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{NS_MAIN}" xmlns:r="{NS_R}">{pr}<sheets>'
            + "".join(
                f'<sheet name="{n}" sheetId="{i+1}" r:id="rId{i+1}"/>'
                for i, n in enumerate(names)
            )
            + "</sheets></workbook>",
        )
        if styles_xml is not None:
            zf.writestr("xl/styles.xml", styles_xml)
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{NS_PKG}">'
            + "".join(
                f'<Relationship Id="rId{i+1}" Type="x" '
                f'Target="worksheets/sheet{i+1}.xml"/>'
                for i in range(len(names))
            )
            + "</Relationships>",
        )
        if shared:
            zf.writestr(
                "xl/sharedStrings.xml",
                f'<sst xmlns="{NS_MAIN}">'
                + "".join(f"<si><t>{s}</t></si>" for s in shared)
                + "</sst>",
            )
        for i, n in enumerate(names):
            zf.writestr(f"xl/worksheets/sheet{i+1}.xml", sheets[n])
    return buf.getvalue()


def _sheet_xml(body: str) -> str:
    return f'<worksheet xmlns="{NS_MAIN}">{body}</worksheet>'


def test_parse_cell_types_and_merges():
    sheet = _sheet_xml(
        "<sheetData>"
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'          # shared string
        '<c r="B1"><v>310.1</v></c>'            # number
        '<c r="C1" t="b"><v>1</v></c>'          # boolean
        "</row>"
        '<row r="2">'
        '<c r="A2" t="inlineStr"><is><t>inline text</t></is></c>'
        '<c r="D2" t="s"><v>1</v></c>'          # sparse: B2/C2 absent
        "</row>"
        "</sheetData>"
        '<mergeCells count="1"><mergeCell ref="B1:C2"/></mergeCells>'
    )
    payload = _make_xlsx({"s": sheet}, shared=["Header &amp; Title", "x"])
    grid = parse_xlsx_cells(payload)
    assert grid[0] == ["Header & Title", "310.1", "310.1", None]
    assert grid[1] == ["inline text", "310.1", "310.1", "x"]
    # without merge fill the covered cells stay empty
    raw = parse_xlsx_cells(payload, fill_merged=False)
    assert raw[0][2] == "TRUE" and raw[1][1] is None


def test_sheet_names_and_selection():
    s1 = _sheet_xml('<sheetData><row r="1"><c r="A1"><v>1</v></c></row></sheetData>')
    s2 = _sheet_xml('<sheetData><row r="1"><c r="A1"><v>2</v></c></row></sheetData>')
    payload = _make_xlsx({"p22": s1, "p11": s2})
    assert sheet_names(payload) == ["p22", "p11"]
    assert parse_xlsx_cells(payload, "p11") == [["2"]]
    assert parse_xlsx_cells(payload) == [["1"]]  # default = first sheet
    with pytest.raises(ValueError, match="not in"):
        parse_xlsx_cells(payload, "nope")


def test_date_serial_coercion_via_styles():
    """Numeric cells whose cellXfs style is a date format come back as
    ISO strings (xlrd XL_CELL_DATE parity); plain numerics don't."""
    styles = (
        f'<styleSheet xmlns="{NS_MAIN}">'
        '<numFmts count="1">'
        '<numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd hh:mm"/>'
        "</numFmts>"
        '<cellXfs count="3">'
        '<xf numFmtId="0"/>'     # style 0: general
        '<xf numFmtId="14"/>'    # style 1: builtin date m/d/yy
        '<xf numFmtId="164"/>'   # style 2: custom datetime
        "</cellXfs></styleSheet>"
    )
    sheet = _sheet_xml(
        "<sheetData>"
        '<row r="1">'
        '<c r="A1"><v>45658</v></c>'            # no style → raw number
        '<c r="B1" s="1"><v>45658</v></c>'      # builtin date
        '<c r="C1" s="2"><v>45658.5</v></c>'    # custom datetime
        '<c r="D1" s="1" t="s"><v>0</v></c>'    # string in date style: kept
        "</row></sheetData>"
    )
    grid = parse_xlsx_cells(
        _make_xlsx({"d": sheet}, shared=["note"], styles_xml=styles)
    )
    assert grid[0] == ["45658", "2025-01-01", "2025-01-01 12:00:00", "note"]


def test_date_serial_respects_date1904():
    styles = (
        f'<styleSheet xmlns="{NS_MAIN}">'
        '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs>'
        "</styleSheet>"
    )
    sheet = _sheet_xml(
        '<sheetData><row r="1"><c r="A1" s="1"><v>100</v></c></row></sheetData>'
    )
    grid = parse_xlsx_cells(
        _make_xlsx({"d": sheet}, styles_xml=styles, date1904=True)
    )
    assert grid[0][0] == "1904-04-10"


def test_excel_cells_falls_back_to_native_parser():
    s1 = _sheet_xml('<sheetData><row r="1"><c r="A1"><v>42</v></c></row></sheetData>')
    payload = _make_xlsx({"only": s1})
    assert excel_cells(payload, "only") == [["42"]]
    # neither OLE2 nor zip magic → loud error, not a silent empty grid
    # (real .xls dispatch is covered in test_xls.py)
    with pytest.raises(ValueError, match="unrecognized"):
        excel_cells(b"not-a-spreadsheet", "x")


def test_wide_column_letters():
    # AA = col 26, AB = 27 — multi-letter refs must decode positionally
    sheet = _sheet_xml(
        '<sheetData><row r="3"><c r="AA3"><v>7</v></c>'
        '<c r="AB3"><v>8</v></c></row></sheetData>'
    )
    grid = parse_xlsx_cells(_make_xlsx({"s": sheet}))
    assert grid[2][26] == "7" and grid[2][27] == "8"


def test_xlsx_to_wasde_extraction_end_to_end(spark):
    """Real ingestion path: xlsx bytes → cells frame → supply/use rows,
    identical to the fixture-grid result (the q85 pipeline)."""
    import datetime as dt

    from gpi_etl_spark.plans.wasde import extract_supply_use
    from gpi_etl_spark.queries import _WASDE_GRID

    def esc(s):
        return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))

    by_row: dict[int, list] = {}
    for r, c, v in _WASDE_GRID:
        by_row.setdefault(r, []).append((c, v))
    body = "<sheetData>"
    for r in sorted(by_row):
        body += f'<row r="{r+1}">'
        for c, v in sorted(by_row[r]):
            ref = chr(ord("A") + c) + str(r + 1)
            body += (
                f'<c r="{ref}" t="inlineStr"><is><t>{esc(v)}</t></is></c>'
            )
        body += "</row>"
    body += "</sheetData>"
    payload = _make_xlsx({"p22": _sheet_xml(body)})

    clock = dt.datetime(2026, 1, 12, 8, 0, 0)
    from_xlsx = extract_supply_use(
        xlsx_cells_df(spark, payload, "p22"), "p22", "2026-01-12", "Corn",
        clock=clock,
    )
    fixture = spark.createDataFrame(
        [("p22", r, c, v) for r, c, v in _WASDE_GRID],
        "sheet string, row_idx int, col_idx int, value string",
    )
    want = extract_supply_use(fixture, "p22", "2026-01-12", "Corn", clock=clock)
    assert sorted(map(tuple, from_xlsx.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert from_xlsx.count() == 4


def test_wasde_endpoint_accepts_workbook_bytes(spark):
    import datetime as dt

    from gpi_etl_spark import engine

    body = (
        "<sheetData>"
        '<row r="1"><c r="A1" t="inlineStr"><is><t>WASDE-668</t></is></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>World Corn Supply and Use 1/</t></is></c></row>'
        '<row r="3"><c r="A3" t="inlineStr"><is><t>Million Metric Tons</t></is></c></row>'
        '<row r="4"><c r="A4" t="inlineStr"><is><t>Beginning Stocks</t></is></c>'
        '<c r="B4" t="inlineStr"><is><t>2024/25 Est.</t></is></c></row>'
        '<row r="5"><c r="A5" t="inlineStr"><is><t>World 3/</t></is></c>'
        '<c r="B5"><v>310.1</v></c><c r="C5"><v>1200</v></c><c r="D5"><v>5</v></c>'
        '<c r="E5"><v>750</v></c><c r="F5"><v>1150</v></c><c r="G5"><v>180</v></c>'
        '<c r="H5"><v>300</v></c></row>'
        "</sheetData>"
    )
    payload = _make_xlsx({"p22": _sheet_xml(body)})
    out = engine.run(
        "HTGPIWASDE", cells=payload, sheet="p22", daterelease="2026-01-12",
        commodity="Corn", clock=dt.datetime(2026, 1, 12, 8, 0, 0), spark=spark,
    )
    r = out.first()
    assert r.Geography == "World" and r.Production == 1200.0
    assert r.Wasde == "WASDE-668"
