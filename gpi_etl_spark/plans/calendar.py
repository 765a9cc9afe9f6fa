"""Futures expiration calendar (F-DT10/11) — pure driver-side logic.

Re-expresses the reference's contract-calendar arithmetic
(HTGPIPROPHEDEX/__init__.py:90-194): month codes F..Z, per-commodity
expiration-month sets, the "+6 months with 20th-of-month rollover"
symbol selection, and run-length compression of the day→symbol walk
into fetch ranges. The output is a handful of rows per commodity —
deliberately NOT a distributed computation; the resulting calendar is
broadcast into distributed joins when a per-day symbol column is
needed at scale.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from dateutil.relativedelta import relativedelta

#: CME month codes, Jan..Dec
MONTH_CODES = "FGHJKMNQUVXZ"

#: contract months per commodity prefix (public CME/KCBT listings; the
#: reference's table at HTGPIPROPHEDEX/__init__.py:90-104)
EXPIRATION_MONTHS: dict[str, list[str]] = {
    "C": list("HKNUZ"),
    "SM": list("FHKNQUVZ"),
    "S": list("FHKNQUX"),
    "W": list("HKNUZ"),
    "KW": list("HKNUZ"),
    "MW": list("HKNUZ"),
    "BO": list("FHKNQUVZ"),
    "QCL": list(MONTH_CODES),
    "DX": list(MONTH_CODES),
    "AC": list(MONTH_CODES),
    "AE": list(MONTH_CODES),
}


@dataclass(frozen=True)
class SymbolRange:
    start: dt.date
    end: dt.date
    symbol: str


def next_expirations(month: int, year: int, allowed: list[str], k: int = 2) -> list[str]:
    """The next ``k`` contract symbols (code+year) at or after
    (month, year), restricted to the commodity's listed months."""
    out: list[str] = []
    while len(out) < k:
        code = MONTH_CODES[month - 1]
        if code in allowed:
            out.append(f"{code}{year}")
        month += 1
        if month > 12:
            month, year = 1, year + 1
    return out


def expiration_symbol(
    day: dt.date, prefix: str, allowed: list[str], four_digit_year: bool = False
) -> str:
    """Contract symbol assigned to a trading day.

    Semantics (HTGPIPROPHEDEX/__init__.py:122-155): look 6 months
    ahead; take the next two listed expirations from there; stay on
    the first unless the 6-month point *is* that expiration month (or
    is the month before it and past the 20th — contracts roll on the
    20th), in which case skip to the second.
    """
    ahead = day + relativedelta(months=+6)
    year = ahead.year if four_digit_year else ahead.year % 100
    nxt2 = next_expirations(ahead.month, year, allowed)
    current = f"{MONTH_CODES[ahead.month - 1]}{year}"
    if ahead.month == 12:
        following = f"{MONTH_CODES[0]}{year + 1}"
    else:
        following = f"{MONTH_CODES[ahead.month]}{year}"
    if current == nxt2[0] or (following == nxt2[0] and ahead.day > 20):
        return f"{prefix}{nxt2[1]}"
    return f"{prefix}{nxt2[0]}"


def daily_symbols(
    start: dt.date,
    end: dt.date,
    prefix: str,
    allowed: list[str],
    four_digit_year: bool = False,
) -> list[tuple[dt.date, dt.date, str]]:
    """(day, day+6mo, symbol) for every day in [start, end)."""
    out = []
    day = start
    while day < end:
        out.append(
            (day, day + relativedelta(months=+6),
             expiration_symbol(day, prefix, allowed, four_digit_year))
        )
        day += dt.timedelta(days=1)
    return out


def symbol_ranges(
    days: list[tuple[dt.date, dt.date, str]]
) -> list[SymbolRange]:
    """Run-length compress the day→symbol walk into contiguous query
    ranges (HTGPIPROPHEDEX/__init__.py:174-194). The distributed twin
    for big inputs is operators.windows.compress_runs."""
    if not days:
        return []
    out: list[SymbolRange] = []
    run_start, _, run_sym = days[0]
    prev_day = days[0][0]
    for day, _, sym in days[1:]:
        if sym != run_sym:
            out.append(SymbolRange(run_start, prev_day, run_sym))
            run_start, run_sym = day, sym
        prev_day = day
    out.append(SymbolRange(run_start, prev_day, run_sym))
    return out


def front_months(day: dt.date, prefix: str, allowed: list[str], k: int = 5,
                 four_digit_year: bool = False) -> list[str]:
    """The next-k front-month contracts from ``day`` (the reference's
    next-5 continuous-contract set, HTGPIPROPHEDEX/__init__.py:431-477)."""
    year = day.year if four_digit_year else day.year % 100
    return [f"{prefix}{s}" for s in next_expirations(day.month, year, allowed, k)]


def expiration_symbol_expr(day_col, prefix: str, allowed: list[str]):
    """DISTRIBUTED twin of :func:`expiration_symbol`: the same
    6-months-ahead / next-two-listed / roll-on-the-20th rule as a pure
    Spark column expression over a date column, for building the
    per-day symbol column on a billion-row spine without the
    driver-side walk.

    The selection rule collapses algebraically: with ``off1`` = months
    from the look-ahead month to the nearest listed expiration and
    ``off2`` the next one after it (wrapping a year when none remain),
    "current month is the first expiration" ⟺ ``off1 = 0`` and "the
    month before it past the 20th" ⟺ ``off1 = 1 AND day > 20`` — so
    the symbol picks ``off2`` in exactly those cases. Verified
    day-for-day against the driver-side walk in tests/test_calendar.py
    and against a DuckDB replay (q149).
    """
    from pyspark.sql import functions as F

    months = [MONTH_CODES.index(c) + 1 for c in allowed]
    ahead = F.add_months(day_col, 6)
    am, ay, ad = F.month(ahead), F.year(ahead), F.dayofmonth(ahead)
    offs = F.transform(
        F.array(*[F.lit(m) for m in months]),
        lambda m: (m - am + 12) % 12,
    )
    off1 = F.array_min(offs)
    later = F.filter(offs, lambda o: o > off1)
    off2 = F.coalesce(F.array_min(later), F.array_min(offs) + 12)
    use2 = (off1 == 0) | ((off1 == 1) & (ad > 20))
    offsel = F.when(use2, off2).otherwise(off1)
    midx0 = (am - 1 + offsel) % 12
    ysel = ay + F.floor((am - 1 + offsel) / 12).cast("int")
    return F.concat(
        F.lit(prefix),
        F.lit(MONTH_CODES).substr(midx0 + 1, F.lit(1)),
        (ysel % 100).cast("string"),
    )
