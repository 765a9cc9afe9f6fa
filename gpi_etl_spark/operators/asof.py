"""As-of join: match each left row to the latest right row at-or-before
its timestamp, per key.

Spark has no native as-of join. Two strategies:

* :func:`asof_join_union` — union both sides tagged, one window pass
  with ``last(..., ignorenulls)`` carries the most recent right-side
  values forward onto left rows. One shuffle on the key, no range
  explosion — the preferred plan whenever both sides share key
  cardinality (this is the classic "events decorated with latest
  reference row" shape).
* :func:`asof_join_pandas` — per-key ``pd.merge_asof`` via
  ``applyInPandas`` for semantics the union trick can't express
  (tolerance windows, nearest rather than backward). Arrow-batched;
  one shuffle on the key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join via tagged union + forward fill.

    Right rows sort before left rows at equal timestamps (so an exact
    tie matches, like ``pd.merge_asof`` backward default).
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
    )
    r = right.select(
        *[
            F.col(c) if c in (on, *by) else F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *lcols,
        F.col("_side"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Per-key ``pd.merge_asof`` via cogrouped applyInPandas."""
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in left.dtypes]
        + [f"asof_{c} {dict(right.dtypes)[c]}" for c in value_cols]
    )
    r_keep = [*by, on, *value_cols]

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.sort_values(on)
        r_pdf = r_pdf[r_keep].sort_values(on)
        r_pdf = r_pdf.rename(columns={c: f"asof_{c}" for c in value_cols})
        kwargs = {}
        if tolerance_ms is not None:
            kwargs["tolerance"] = pd.Timedelta(milliseconds=tolerance_ms)
        out = pd.merge_asof(l_pdf, r_pdf, on=on, by=list(by), **kwargs)
        # merge_asof emits float NaN for unmatched rows even in int
        # columns; hand Arrow None-backed objects so the declared
        # integer schema stays valid (NULL, not a garbage cast)
        for c in value_cols:
            ac = f"asof_{c}"
            if out[ac].isna().any():
                out[ac] = out[ac].astype(object).where(out[ac].notna(), None)
        return out

    return left.groupBy(*by).cogroup(right.groupBy(*by)).applyInPandas(
        lambda l, r: merge(l, r), schema=out_schema
    )
