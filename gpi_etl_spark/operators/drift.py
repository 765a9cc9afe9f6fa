"""Distribution-drift detection: exact two-sample Kolmogorov–Smirnov
and binned Population Stability Index, per group key.

The monitoring ops a 100 TB pipeline runs between snapshots: "did the
value distribution of this feed change?" asked either non-parametrically
(KS — the sup-norm CDF distance, sensitive anywhere on the axis) or in
the binned scorecard form ops teams alert on (PSI). The reference app
has no drift stage (its QA is per-cell null checks — SURVEY.md §2 P8),
so this module is greenfield alongside quality.py's z-test (q147).

Cross-engine exactness:

* The KS statistic is kept as an INTEGER numerator for as long as it
  exists: with segment counts accumulated per distinct value,
  ``D = max |cumA·nB − cumB·nA| / (nA·nB)`` — every quantity inside the
  max is int64 (safe to ~3·10^9 rows per group per segment), so the max
  is over integers and only the final ratio becomes a float, emitted
  through the 6-dp floor scale (functions/rounding.fs6). Evaluating the
  CDF difference once per DISTINCT value (after both segments' ties at
  that value are absorbed) is exactly the correct treatment of ties.
* PSI terms are Laplace-smoothed ``(p_i − q_i)·ln(p_i/q_i)`` — every
  term is ≥ 0 by construction (both factors share a sign), and the
  per-group total is an ORDERED left fold over bins ascending (the q182
  list_reduce pattern), so no unordered float sum crosses rows and
  DuckDB replays the exact IEEE addition sequence. ln is transcendental
  → plain round(·, 6) on the fold result (the rounding-convention split
  documented in functions/rounding.py).

100 TB shape: both ops are one groupBy shuffle on (group, value|bin) —
map-side combine collapses raw rows to distinct-value/bin counts, so
the window/fold that follows runs over CARDINALITY-bounded frames
(distinct values per group for KS, bins per group for PSI), never raw
rows. Segment assignment is the pure-function mixing hash
(curation.mix_hash), so re-runs and engines agree with no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gpi_etl_spark.functions.rounding import fs6
from gpi_etl_spark.operators.curation import mix_hash, mix_hash_sql


def hash_segment(id_col: Column | str) -> Column:
    """Deterministic two-way segment label ('a'/'b') from the
    cross-engine mixing hash of a row id — the q147 cohort idea at row
    grain, replayable in DuckDB via :func:`hash_segment_sql`."""
    return F.when(mix_hash(id_col) % 2 == 0, "a").otherwise("b")


def hash_segment_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash_segment` (same bits, same label)."""
    return (
        f"CASE WHEN {mix_hash_sql(expr, 'duckdb')} % 2 = 0 "
        "THEN 'a' ELSE 'b' END"
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    seg_col: str = "seg",
) -> DataFrame:
    """Exact two-sample KS statistic per group between segments
    'a' and 'b' of ``seg_col``.

    Returns one row per group with both sample sizes, the integer
    numerator ``d_num = max |cumA·nB − cumB·nA|`` and the 6-dp
    floor-scaled statistic ``d_r = d_num / (nA·nB)``. Groups where
    either segment is empty are dropped (the statistic is undefined).
    """
    cnt = df.groupBy(group_col, value_col).agg(
        F.sum(F.when(F.col(seg_col) == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col(seg_col) == "b", 1).otherwise(0)).alias("cb"),
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    stepped = cnt.select(
        group_col,
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cb").over(wcum).alias("cum_b"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
    )
    return (
        stepped.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .groupBy(group_col)
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            ).alias("d_num"),
        )
        .select(
            group_col,
            "n_a",
            "n_b",
            "d_num",
            fs6(
                F.col("d_num").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("d_r"),
        )
    )


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    seg_col: str = "seg",
    bin_width: float = 50.0,
) -> DataFrame:
    """Laplace-smoothed PSI per group between segments 'a' and 'b',
    over fixed-width value bins ``floor(value / bin_width)``.

    Smoothing adds one pseudo-count per OBSERVED bin to each segment
    (``p_i = (c_i + 1) / (n + n_bins)``), so empty-on-one-side bins
    contribute finite terms and the fold never sees ln(0). The total
    is the ordered left fold of the per-bin terms, bins ascending.
    """
    binned = df.withColumn(
        "_bin",
        F.floor(F.col(value_col) / F.lit(float(bin_width))).cast("int"),
    )
    cnt = binned.groupBy(group_col, "_bin").agg(
        F.sum(F.when(F.col(seg_col) == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col(seg_col) == "b", 1).otherwise(0)).alias("cb"),
    )
    wall = Window.partitionBy(group_col)
    with_tot = cnt.select(
        group_col,
        "_bin",
        "ca",
        "cb",
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
        F.count(F.lit(1)).over(wall).alias("n_bins"),
    )
    pa = (F.col("ca") + 1).cast("double") / (
        F.col("n_a") + F.col("n_bins")
    ).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (
        F.col("n_b") + F.col("n_bins")
    ).cast("double")
    termed = with_tot.withColumn("_term", (pa - pb) * F.log(pa / pb))
    return (
        termed.groupBy(group_col)
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.first("n_bins").alias("n_bins"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("_bin", "_term"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["_term"],
            ).alias("_psi"),
        )
        .select(
            group_col,
            "n_a",
            "n_b",
            "n_bins",
            F.round(F.col("_psi"), 6).alias("psi_r"),
        )
    )
