"""Sentinel cleaning + guarded arithmetic.

The reference has a per-source "sentinel zoo" (SURVEY.md §1.2): ``''``
and ``'NA'`` mean 0 (HTGPIWASDE/__init__.py:1204-1207), ``'---'`` means
0 (HTGPIPROPHEDEX/__init__.py:500,556), ``'–'`` (en-dash) means missing
(HTGPIINFLATUS/__init__.py:84), NaN means 0 (HTGPICFT/__init__.py:103),
and footnote markers ``1/``..``10/`` must be stripped from geography
names (HTGPIWASDE/__init__.py:1198-1202). Here each rule is an explicit,
composable column expression so the cleaning spec lives in one place
instead of inline in every parser.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: sentinels that the reference maps to numeric zero
ZERO_SENTINELS = ("", "NA", "---")
#: sentinels that the reference maps to NULL (then usually dropped)
NULL_SENTINELS = ("–",)  # en-dash


def clean_numeric_sentinels(
    col: Column | str,
    zero_sentinels: Sequence[str] = ZERO_SENTINELS,
    null_sentinels: Sequence[str] = NULL_SENTINELS,
    fill: float | None = None,
) -> Column:
    """String→double cast with the reference's sentinel conventions.

    ``zero_sentinels`` → 0.0, ``null_sentinels`` → NULL, anything else
    is cast to double (uncastable garbage also becomes NULL, matching
    ``pd.to_numeric(errors='coerce')``). ``fill`` optionally replaces
    the resulting NULLs (the reference's ``fillna(0)``).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.trim(c)
    out = (
        F.when(c.isin(*zero_sentinels), F.lit(0.0))
        .when(c.isin(*null_sentinels), F.lit(None).cast("double"))
        .otherwise(c.try_cast("double"))  # try_cast: garbage → NULL under ANSI
    )
    if fill is not None:
        # nanvl first: try_cast('nan') yields double NaN, which is NOT
        # NULL — the reference's fillna(0) replaces it, so must we
        out = F.coalesce(F.nanvl(out, F.lit(None).cast("double")), F.lit(float(fill)))
    return out


def strip_footnote_markers(col: Column | str) -> Column:
    """Remove WASDE footnote markers like ``3/`` from geography names.

    Reference: ``replace_string`` (HTGPIWASDE/__init__.py:1198-1202).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\d+/", ""))


def safe_div(num: Column, den: Column, default: float = 0.0) -> Column:
    """``num/den`` with the reference's divide-by-zero→default guard.

    Reference: ``Stocks to Use = Ending/Total*100`` with 0 when Total
    is 0 (HTGPIWASDE/__init__.py:500-506). NULL den also → default.
    """
    return F.when(
        den.isNull() | (den == 0), F.lit(float(default))
    ).otherwise(num / den)


def horizontal_sum(cols: Sequence[Column | str]) -> Column:
    """Row-wise sum treating NULL as 0 (pandas ``sum(axis=1, skipna)``).

    Reference: IV ladder call/put sums (HTGPIPROPHEDEX/__init__.py:
    426-427,896-897). A fold over ``coalesce(c, 0)`` keeps it one
    codegen'd expression regardless of column count.
    """
    out: Column | None = None
    for c in cols:
        c = F.col(c) if isinstance(c, str) else c
        c = F.coalesce(c.cast("double"), F.lit(0.0))
        out = c if out is None else out + c
    if out is None:
        return F.lit(0.0)
    return out
