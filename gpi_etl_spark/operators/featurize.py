"""Per-category distance-feature widening (A3 + R2).

The reference loops category-by-category computing count / count≤100 m /
min / max / mean of distance, then writes them dict-wise into a one-row
wide feature vector ``GEO_<CAT>_{300M_CNT,100M_CNT,MIN_DIST,MAX_DIST,
MEAN_DIST}`` (HTIPPLSITE/__init__.py:329-396; HTIPNEXSITE variant with
missing-min→10000 at :317-348). Declaratively that is one groupBy +
pivot + agg — a single shuffle regardless of category count, and it
widens per *site* (group key) so the same plan scores one site or a
billion.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the five stats of HTIPPLSITE (:335-382); order fixes output columns
STATS = ("300M_CNT", "100M_CNT", "MIN_DIST", "MAX_DIST", "MEAN_DIST")


def geo_feature_vector(
    df: DataFrame,
    site_cols: Sequence[str],
    category_col: str = "poi_category",
    distance_col: str = "distance_mtrs",
    categories: Sequence[str] | None = None,
    near_threshold: float = 100.0,
    missing_min: float = 0.0,
    prefix: str = "GEO_",
    exact_mean_scale: int | None = None,
) -> DataFrame:
    """Widen per-(site, category) distance stats into one row per site.

    ``missing_min`` reproduces the reference divergence deliberately:
    HTIPPLSITE uses 0 for an absent category's MIN_DIST (:373) while
    HTIPNEXSITE uses 10000 (:348) — callers pick per pipeline.
    Passing ``categories`` pins the output schema (and skips the
    distinct-values pre-job the pivot would otherwise run).

    ``exact_mean_scale``: when the distance column holds FIXED-POINT
    values (e.g. 2-dp monetary amounts rather than computed haversine
    meters), ``avg(double)`` is an order-dependent float sum; passing
    the decimal scale switches MEAN_DIST to exact decimal accumulation
    (sum(decimal)::double / count) — one deterministic double per
    group regardless of partitioning. Leave None for transcendental
    distances, where plain avg is the cheaper production form.
    """
    d = F.col(distance_col)
    if exact_mean_scale is None:
        mean_expr = F.avg(d)
    else:
        mean_expr = (
            F.sum(d.cast(f"decimal(18,{exact_mean_scale})")).cast("double")
            / F.count(d)
        )
    aggs = [
        F.count(F.lit(1)).cast("double").alias("300M_CNT"),
        F.count(F.when(d <= near_threshold, 1)).cast("double").alias("100M_CNT"),
        F.min(d).alias("MIN_DIST"),
        F.max(d).alias("MAX_DIST"),
        mean_expr.alias("MEAN_DIST"),
    ]
    pivoted = (
        df.groupBy(*site_cols)
        .pivot(category_col, list(categories) if categories else None)
        .agg(*aggs)
    )
    # pivot names columns "<cat>_<alias>"; rename to GEO_<CAT>_<STAT>
    # and apply the missing-category defaults (count→0, min→missing_min,
    # max/mean→0) exactly as the reference's `else` arms do.
    selected = [F.col(c) for c in site_cols]
    for c in pivoted.columns:
        if c in site_cols:
            continue
        cat, stat = c.rsplit("_", 2)[0], "_".join(c.rsplit("_", 2)[1:])
        default = missing_min if stat == "MIN_DIST" else 0.0
        new_name = f"{prefix}{cat.replace(' ', '_')}_{stat}"
        selected.append(F.coalesce(F.col(f"`{c}`"), F.lit(default)).alias(new_name))
    return pivoted.select(*selected)


def select_feature_columns(df: DataFrame, prefix: str = "GEO_") -> DataFrame:
    """The reference's regex feature selection (`GEO_.` prefix match,
    HTIPPLSITE/__init__.py:392-394)."""
    return df.select([c for c in df.columns if c.startswith(prefix)])
