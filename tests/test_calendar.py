"""Futures expiration calendar (F-DT10/11) — exhaustive unit tests
(SURVEY.md §7 M3: 'driver-side, unit-tested exhaustively')."""

import datetime as dt

from gpi_etl_spark.plans.calendar import (
    EXPIRATION_MONTHS,
    SymbolRange,
    daily_symbols,
    expiration_symbol,
    front_months,
    next_expirations,
    symbol_ranges,
)


def test_next_expirations_walks_listed_months():
    # corn (C): H K N U Z — from Feb 2025 the next two are H25, K25
    assert next_expirations(2, 25, EXPIRATION_MONTHS["C"]) == ["H25", "K25"]
    # from Dec: Z25 then H26 (year rollover)
    assert next_expirations(12, 25, EXPIRATION_MONTHS["C"]) == ["Z25", "H26"]


def test_expiration_symbol_rollover_rules():
    corn = EXPIRATION_MONTHS["C"]
    # +6mo lands IN a listed month (Jul=N) → too close to expiry →
    # skip to the next listed contract (U25)
    assert expiration_symbol(dt.date(2025, 1, 10), "@C", corn) == "@CU25"
    # +6mo → Aug (Q, unlisted); next listed is Sep (U) = the following
    # month, day 10 ≤ 20 → stay on U25
    assert expiration_symbol(dt.date(2025, 2, 10), "@C", corn) == "@CU25"
    # same but past the 20th → roll to Z25
    assert expiration_symbol(dt.date(2025, 2, 25), "@C", corn) == "@CZ25"


def test_expiration_symbol_four_digit_year():
    corn = EXPIRATION_MONTHS["C"]
    assert expiration_symbol(dt.date(2025, 2, 10), "C", corn, four_digit_year=True) == "CU2025"


def test_daily_symbols_and_ranges_roundtrip():
    corn = EXPIRATION_MONTHS["C"]
    days = daily_symbols(dt.date(2025, 1, 1), dt.date(2025, 3, 1), "@C", corn)
    assert len(days) == 59
    ranges = symbol_ranges(days)
    # contiguous, ordered, covering the walk
    assert ranges[0].start == dt.date(2025, 1, 1)
    assert ranges[-1].end == dt.date(2025, 2, 28)
    for a, b in zip(ranges, ranges[1:]):
        assert a.end < b.start
        assert a.symbol != b.symbol
    # symbols per day must agree with the compressed ranges
    by_day = {d: s for d, _, s in days}
    for r in ranges:
        assert by_day[r.start] == r.symbol and by_day[r.end] == r.symbol


def test_symbol_ranges_empty():
    assert symbol_ranges([]) == []


def test_front_months():
    got = front_months(dt.date(2025, 1, 15), "@S", EXPIRATION_MONTHS["S"], k=5)
    assert got == ["@SF25", "@SH25", "@SK25", "@SN25", "@SQ25"]


def test_expression_twin_matches_driver_walk_day_for_day(spark):
    """The distributed expiration_symbol_expr must agree with the
    driver-side python walk on every day of a multi-year range
    spanning year rollovers and the 20th-of-month boundary, for both a
    5-month and a 7-month commodity."""
    import datetime as dt

    from pyspark.sql import functions as F

    from gpi_etl_spark.plans.calendar import (
        EXPIRATION_MONTHS,
        daily_symbols,
        expiration_symbol_expr,
    )

    start, end = dt.date(2023, 11, 1), dt.date(2026, 2, 1)
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(str(start)).cast("date"),
                F.lit(str(end - dt.timedelta(days=1))).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    for prefix in ("C", "S"):
        allowed = EXPIRATION_MONTHS[prefix]
        got = {
            r.day: r.sym
            for r in days.select(
                "day",
                expiration_symbol_expr(
                    F.col("day"), prefix, allowed
                ).alias("sym"),
            ).collect()
        }
        want = {
            d: sym for d, _, sym in daily_symbols(start, end, prefix, allowed)
        }
        assert got == want
