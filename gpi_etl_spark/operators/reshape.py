"""Reshape kit: pivot, unpivot/melt, transpose (SURVEY.md §2.7).

Reference sites: option-IV long→wide pivot (HTGPIPROPHEDEX/__init__.py:
392,854 → R1), CPI year×month melt (HTGPIINFLATUS/__init__.py:91 → R3),
numpy ``.T`` transpose of the wheat-class sheet (HTGPIWASDE/__init__.py:
358,369 → R4), constant-column insertion / rename (R5/R6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    index: Sequence[str],
    pivot_col: str,
    value_col: str,
    values: Sequence[str] | None = None,
    agg: str = "first",
) -> DataFrame:
    """R1: long→wide pivot. Passing ``values`` explicitly skips the
    extra distinct-values job and keeps the output schema stable —
    always do so in production plans at scale.
    """
    agg_fn = getattr(F, agg)
    grouped = df.groupBy(*index).pivot(pivot_col, list(values) if values else None)
    return grouped.agg(agg_fn(value_col))


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    value_vars: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """R3: wide→long unpivot (pandas ``melt``).

    Uses the native ``unpivot`` (Spark ≥3.4) — one pass, no shuffle,
    output rows stay in their source partitions.
    """
    return df.unpivot(
        list(id_vars), list(value_vars), var_name, value_name
    )


def transpose(
    df: DataFrame,
    index_col: str,
    columns: Sequence[str],
    max_width: int = 1000,
) -> DataFrame:
    """R4: matrix transpose via unpivot→pivot composite.

    Rows of ``index_col`` become columns; ``columns`` become rows named
    in ``metric``. Spark has no native transpose because a transpose of
    distributed data inverts the partitioning axis — this composite is
    only sane when the result width (= input row count) is bounded, so
    it asserts ``max_width`` like the reference's ~10×7 sheet use.
    """
    n = df.count()
    if n > max_width:
        raise ValueError(
            f"transpose of {n} rows would create {n} columns (max {max_width})"
        )
    long = df.unpivot([index_col], list(columns), "metric", "value")
    return (
        long.groupBy("metric")
        .pivot(index_col)
        .agg(F.first("value"))
    )
