"""Math kit: banker's rounding parity, ATM strikes, strike ladders.

Reference sites: ATM strike rounding ``round(close/100, 1) * 1000``
(HTGPIPROPHEDEX/__init__.py:354,794-798 — Python ``round`` is banker's /
HALF_EVEN, so Spark must use ``bround`` not ``round``), and the ±5-step
strike ladder generation (HTGPIPROPHEDEX/__init__.py:362-371,807-830).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def atm_strike(close: Column | str, divisor: float = 100.0, scale: float = 1000.0) -> Column:
    """ATM strike = ``bround(close/divisor, 1) * scale``.

    ``bround`` is HALF_EVEN, matching Python's ``round`` at the
    reference site; plain Spark ``round`` (HALF_UP) would drift on
    ties. Per-symbol variants in the reference use divisor/scale
    (100, 10000) and (10, 10000).
    """
    c = F.col(close) if isinstance(close, str) else close
    return F.bround(c / divisor, 1) * scale


def strike_ladder(df: DataFrame, atm_col: str, step: float, n_steps: int = 5,
                  out_col: str = "strike") -> DataFrame:
    """Explode each row into 2*n_steps+1 rows: ATM ± k*step.

    ``explode(sequence(-n, n))`` keeps generation distributed and
    codegen'd — no driver loop, unlike the reference's iterrows at
    HTGPIPROPHEDEX/__init__.py:362-371.
    """
    k = F.explode(F.sequence(F.lit(-n_steps), F.lit(n_steps))).alias("_k")
    return (
        df.select("*", k)
        .withColumn(out_col, F.col(atm_col) + F.col("_k") * F.lit(float(step)))
        .drop("_k")
    )
