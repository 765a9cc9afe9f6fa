"""Date/time kit: nonstandard month-name maps, %U weeks, epoch bridges.

Reference sites: lowercase / nonstandard month-name lookup tables with
``June``/``July`` spelled out (HTGPIINFLATUS/__init__.py:37-50,
HTGPIWASDE/__init__.py:1218-1221, HTGPIENSO/__init__.py:75); Python
``strftime('%U')`` Sunday-start week numbers (HTGPICFT/__init__.py:
50-60); Yahoo epoch-second params (HTGPIYAHOO/__init__.py:86-90,
HTGPISNP500/__init__.py:88).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the reference's CPI-table month-name map — note nonstandard ``June``
#: and ``July`` (HTGPIINFLATUS/__init__.py:37-50). Kept as a literal map
#: (not ``date_format``) for oracle-exactness.
MONTH_NAMES = {
    1: "Jan", 2: "Feb", 3: "Mar", 4: "Apr", 5: "May", 6: "June",
    7: "July", 8: "Aug", 9: "Sep", 10: "Oct", 11: "Nov", 12: "Dec",
}
MONTH_NUMBERS = {v: k for k, v in MONTH_NAMES.items()}


def month_name_expr(month_num: Column | str) -> Column:
    """month number (1-12) → the reference's month-name spelling."""
    m = F.col(month_num) if isinstance(month_num, str) else month_num
    out = None
    for num, name in MONTH_NAMES.items():
        out = (
            F.when(m == num, F.lit(name))
            if out is None
            else out.when(m == num, F.lit(name))
        )
    return out.otherwise(F.lit(None).cast("string"))


def month_name_sql(month_num_sql: str) -> str:
    """ANSI-SQL CASE equivalent of :func:`month_name_expr`."""
    whens = " ".join(
        f"WHEN {num} THEN '{name}'" for num, name in MONTH_NAMES.items()
    )
    return f"CASE {month_num_sql} {whens} END"


def week_of_year_sunday(d: Column | str) -> Column:
    """Python ``strftime('%U')``: Sunday-start week-of-year, week 00
    before the first Sunday.

    Spark's ``weekofyear`` is ISO (Monday-start, year-spanning weeks) —
    wrong here. %U is ``(dayofyear - sunday0_weekday + 7) // 7`` with
    ``sunday0_weekday = dayofweek - 1`` (Spark ``dayofweek``: 1=Sunday).
    The reference only uses this for year-rollover detection
    (HTGPICFT/__init__.py:50-60); exact parity is still kept.
    """
    c = F.col(d) if isinstance(d, str) else d
    yday = F.dayofyear(c)
    wday = F.dayofweek(c) - 1  # 0 = Sunday
    return F.floor((yday - wday + F.lit(6)) / 7).cast("int")


def week_of_year_sunday_sql(d_sql: str) -> str:
    """DuckDB-compatible SQL for :func:`week_of_year_sunday`.

    DuckDB ``dayofweek`` is already 0=Sunday.
    """
    return (
        f"cast(floor((dayofyear({d_sql}) - dayofweek({d_sql}) + 6) / 7) as int)"
    )


def epoch_seconds(ts: Column | str) -> Column:
    """timestamp → unix epoch seconds (Yahoo/SNP500 period params)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_timestamp(c)


def from_epoch_seconds(sec: Column | str) -> Column:
    """epoch seconds → timestamp (``pd.to_datetime(unit='s')``).

    Direct ``timestamp_seconds`` — one conversion, no round-trip
    through a session-timezone string format/parse."""
    c = F.col(sec) if isinstance(sec, str) else sec
    return F.timestamp_seconds(c)
