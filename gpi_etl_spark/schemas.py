"""Central schema registry — every table the engine touches, as explicit
StructTypes (FIXTURES.md; the reference enforces schemas nowhere, they
exist only as Python header lists — SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _schema(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, d, True) for n, d in fields])


S = T.StringType()
D = T.DoubleType()
I = T.IntegerType()
L = T.LongType()
TS = T.TimestampType()
DT = T.DateType()

#: ProphetX daily futures bars (HTGPIPROPHEDEX/__init__.py:72)
PROPHETX_DAILY = _schema(
    ("TickerSymbol", S), ("Date", S), ("Open", D), ("High", D), ("Low", D),
    ("Close", D), ("OI", S), ("Volume", S),
)

#: option IV quotes, long form pre-pivot (HTGPIPROPHEDEX/__init__.py:392)
PROPHETX_IV_QUOTES = _schema(("Date", S), ("TickerSymbol", S), ("Close", D))

#: Yahoo daily bars + engine-added cols (HTGPIYAHOO/__init__.py:50-57)
YAHOO_HISTORICAL = _schema(
    ("Date", S), ("Open", D), ("High", D), ("Low", D), ("Close", D),
    ("Adj Close", D), ("Volume", L), ("Symbol", S),
)

#: WASDE cell grid, long form (read_xls_with_sheetname output shape,
#: HTGPIWASDE/__init__.py:203-245)
WASDE_CELLS = _schema(("sheet", S), ("row_idx", I), ("col_idx", I), ("value", S))

#: WASDE stocks-to-use target, 22 cols + 2 appended
#: (HTGPIWASDE/__init__.py:137,197-198)
WASDE_HEADERS = [
    "Origen", "Archivo", "Wasde", "Datos", "Commoditie", "Medida", "DateN",
    "HarvestDate", "Tipo", "Grupo", "Geography", "Orden", "Mes",
    "Beginning stocks", "Production", "Imports", "Domestic Feed",
    "Domestic total", "Exports", "Ending stocks", "Total Use", "Stocks to Use",
]
WASDE_STOCKS_TO_USE = T.StructType(
    [
        *[
            T.StructField(
                n,
                D if n in WASDE_HEADERS[13:] else (I if n == "Orden" else S),
                True,
            )
            for n in WASDE_HEADERS
        ],
        T.StructField("actualizacion", TS, True),
        T.StructField("DATERELEASE", S, True),
    ]
)

#: CFTC disaggregated COT (HTGPICFT/__init__.py:100-106)
CFTC_DISAGG = _schema(
    ("Report_Date_as_MM_DD_YYYY", DT), ("Market_and_Exchange_Names", S),
    ("M_Money_Positions_Long_ALL", D), ("M_Money_Positions_Short_ALL", D),
    ("Open_Interest_All", D), ("Tot_Rept_Positions_Long_All", D),
)

#: NOAA ENSO weekly SST decoded (HTGPIENSO/__init__.py:74-80)
ENSO_WEEKLY = _schema(
    ("WEEK", S), ("SST_NINO12", D), ("SSTA_NINO12", D), ("SST_NINO3", D),
    ("SSTA_NINO3", D), ("SST_NINO34", D), ("SSTA_NINO34", D),
    ("SST_NINO4", D), ("SSTA_NINO4", D),
)

#: CPI wide grid (HTGPIINFLATUS/__init__.py:82-97); month cols use the
#: reference's June/July spellings
INFLATION_GRID = _schema(
    ("Year", I), ("Jan", S), ("Feb", S), ("Mar", S), ("Apr", S), ("May", S),
    ("June", S), ("July", S), ("Aug", S), ("Sep", S), ("Oct", S), ("Nov", S),
    ("Dec", S),
)

#: Agricensus FOB feed (HTGPIAGRICENSUS/__init__.py:73-82)
AGRICENSUS_FOB = _schema(
    ("date", S), ("name", S), ("commodity", S), ("price", D), ("unit", S)
)

#: simple (Date, Close) series — WTI / SNP500 flattened
PRICE_SERIES = _schema(("Date", S), ("Close", D))

#: SNP500 raw arrays pre-zip (HTGPISNP500/__init__.py:84-89)
SNP500_ARRAYS = _schema(
    ("timestamp", T.ArrayType(L)), ("close", T.ArrayType(D))
)

#: Google Places POI rows (HTIPPLSITE/__init__.py:60-69)
POIS = _schema(
    ("rst_cd", S), ("place_ltt", D), ("place_lgt", D), ("poi_id", S),
    ("poi_name", S), ("poi_type", S), ("poi_ltt", D), ("poi_lgt", D),
)

#: existing-store dimension (DIM.CMIA_IP_NEX_GEO_POINTS,
#: HTIPPLSITE/__init__.py:114-118)
GEO_POINTS = _schema(
    ("POS_NM", S), ("LTT", D), ("LGT", D), ("CTGRY_NM", S), ("CNTRY_NM", S)
)

#: generic watermark state (all MAX(date) [GROUP BY key] variants)
WATERMARKS = _schema(("table_name", S), ("key", S), ("max_date", DT))

REGISTRY: dict[str, T.StructType] = {
    "prophetx_daily": PROPHETX_DAILY,
    "prophetx_iv_quotes": PROPHETX_IV_QUOTES,
    "yahoo_historical": YAHOO_HISTORICAL,
    "wasde_cells": WASDE_CELLS,
    "wasde_stocks_to_use": WASDE_STOCKS_TO_USE,
    "cftc_disagg": CFTC_DISAGG,
    "enso_weekly": ENSO_WEEKLY,
    "inflation_grid": INFLATION_GRID,
    "agricensus_fob": AGRICENSUS_FOB,
    "price_series": PRICE_SERIES,
    "snp500_arrays": SNP500_ARRAYS,
    "pois": POIS,
    "geo_points": GEO_POINTS,
    "watermarks": WATERMARKS,
}
