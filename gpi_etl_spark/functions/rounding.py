"""Cross-engine-safe 6-dp rounding for exact-rational outputs.

``round(x, 6)`` diverges between engines on exact half-way points:
Spark rounds the shortest decimal repr via BigDecimal HALF_UP, DuckDB
scales in floating point — the SAME bit-identical double can round
differently (85/128 = 0.6640625 is the canonical example). Any output
that is an EXACT RATIONAL of decimal inputs (integer ratios, integer
means, interpolations of decimals) must therefore round via the
explicit ``floor(x*1e6 + 0.5)/1e6`` form, which is the same IEEE
arithmetic everywhere. Transcendental outputs (ln/sqrt/cosine chains)
and dyadic closed forms keep plain round: they cannot land on exact
half-way points, and the two forms agree everywhere else.

This module is the ONE home for the rule (review find: the expression
had been re-implemented at ~6 Python sites); it lives under
``functions/`` so operators can import it without the
operators→queries import cycle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fs6(col: Column) -> Column:
    """Half-up 6-dp rounding via floor scaling (Spark side)."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def fs6_sql(expr: str) -> str:
    """DuckDB twin of :func:`fs6` (1000000.0 forces DOUBLE math —
    DuckDB bare decimal literals are DECIMAL)."""
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"
