"""Derived financial/agro indicators (SURVEY.md §2.8 F-M5..F-M8).

Reference sites: implied imports (HTGPIWASDE/__init__.py:388), Total Use
and Stocks-to-Use with divide-by-zero→0 (HTGPIWASDE/__init__.py:500-506
and 7 clones), managed-money net position (HTGPICFT/__init__.py:102),
option-IV Skew = Σcall − Σput (HTGPIPROPHEDEX/__init__.py:426-428).
All are pure column arithmetic — codegen'd, shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpi_etl_spark.functions.cleaning import horizontal_sum, safe_div


def total_use(domestic_total: Column | str, exports: Column | str) -> Column:
    """F-M6a: ``Total Use = Domestic total + Exports``."""
    d = F.col(domestic_total) if isinstance(domestic_total, str) else domestic_total
    e = F.col(exports) if isinstance(exports, str) else exports
    return d + e


def stocks_to_use(ending: Column | str, total: Column | str) -> Column:
    """F-M6b: ``Ending / Total * 100``, 0 when Total is 0 or NULL."""
    e = F.col(ending) if isinstance(ending, str) else ending
    t = F.col(total) if isinstance(total, str) else total
    return safe_div(e * 100, t, default=0.0)


def net_position(longs: Column | str, shorts: Column | str) -> Column:
    """F-M7: managed-money net = Long − Short."""
    lo = F.col(longs) if isinstance(longs, str) else longs
    sh = F.col(shorts) if isinstance(shorts, str) else shorts
    return lo - sh


def iv_skew(call_cols: Sequence[Column | str], put_cols: Sequence[Column | str]) -> Column:
    """F-M8: Skew = Σ call IVs − Σ put IVs, NULLs as 0 (skipna sums)."""
    return horizontal_sum(call_cols) - horizontal_sum(put_cols)


def implied_imports(supply_total: Column | str, production: Column | str,
                    beginning: Column | str) -> Column:
    """F-M5: Imports backed out of the supply identity."""
    s = F.col(supply_total) if isinstance(supply_total, str) else supply_total
    p = F.col(production) if isinstance(production, str) else production
    b = F.col(beginning) if isinstance(beginning, str) else beginning
    return s - p - b
