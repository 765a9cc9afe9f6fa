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


def cusum_counts(
    counts: DataFrame,
    group_col: str = "event_type",
    day_col: str = "day",
    x_col: str = "x",
    train_days: int = 14,
    slack_num: int = 1,
    slack_den: int = 20,
    h_mult: int = 5,
) -> DataFrame:
    """One-sided (upward) CUSUM changepoint screen over integer daily
    counters — the SEQUENTIAL sibling of the snapshot drift pair
    (KS/PSI): instead of comparing two frozen segments, it watches a
    per-group counter series and flags the first day the cumulative
    excess over a trained baseline crosses a threshold. The drift ops'
    use case ("did this feed change?") asked continuously.

    EXACT INTEGER FORM. The textbook recursion
    ``C_t = max(0, C_{t-1} + x_t − (1 + slack)·μ0)`` has the closed
    form ``C_t = S_t − min(0, min_{j≤t} S_j)`` over the prefix sums
    ``S_t = Σ_{i≤t} (x_i − (1+slack)·μ0)`` — a cumulative sum and a
    running min, both plain windows. With ``μ0 = p/q`` (p = the
    group's count over the first ``train_days`` days, q = train_days)
    and ``slack = slack_num/slack_den``, scaling every term by
    ``slack_den·q`` makes the whole statistic int64:

        step'_t = slack_den·q·x_t − (slack_den + slack_num)·p
        C'_t    = S'_t − min(0, running_min(S'_t))
        alarm_t = C'_t > h_mult·slack_den·p        (h = h_mult·μ0)

    (|step'| ≤ slack_den·q·x_max + 21·p — far inside int64 for any
    counter a day can hold.) No float exists anywhere, so the oracle
    replays the identical integers and the gate is hash-exact with no
    rounding convention at all.

    ``counts`` is the (group, day, x) daily series INCLUDING zero days
    (build it on a day spine — a missing day is a real observation of
    0, and silently skipping it would shift every later prefix sum).
    The spine requirement is ENFORCED for the training window: a group
    whose first ``train_days`` days contain fewer than ``train_days``
    rows raises at execution time (advice find: the fixed ``q =
    train_days`` scale would otherwise silently deflate that group's
    μ0 — p summed over fewer days but divided by train_days — and
    inflate cusum_s into false alarms). The guard rides INSIDE the
    ``cusum_s``/``h_s`` output expressions (lazy, unprunable from the
    columns it protects — both scale with p, so both are wrong when
    the window is short).
    Returns per (group, day): x, the scaled statistic ``cusum_s``, the
    scaled threshold ``h_s``, and ``alarm``.

    100 TB shape: one groupBy to train (p), one broadcastable join of
    the per-group scalars, and two windows partitioned by group over
    DAYS (series length, never raw rows — the raw-row reduction to
    daily counts happens upstream with map-side combine).
    """
    g, d, x = F.col(group_col), F.col(day_col), F.col(x_col)
    first_day = counts.groupBy(group_col).agg(
        F.min(day_col).alias("_d0")
    )
    with_d0 = counts.join(F.broadcast(first_day), group_col)
    trained = (
        with_d0.filter(d < F.col("_d0") + train_days)
        .groupBy(group_col)
        .agg(
            F.sum(x_col).cast("bigint").alias("_p"),
            F.count(F.lit(1)).alias("_q_seen"),
        )
    )
    base = with_d0.join(F.broadcast(trained), group_col)

    def spine_guard(value):
        # the message carries the OBSERVED row count: fewer rows than
        # train_days means missing spine days / a short series; MORE
        # means duplicate (group, day) rows upstream (an un-collapsed
        # union) — naming only the "fewer" case sent the operator the
        # wrong way on duplicates (review find)
        return F.when(F.col("_q_seen") == train_days, value).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "cusum_counts: a group's training window has "
                    ),
                    F.col("_q_seen").cast("string"),
                    F.lit(
                        f" rows, expected train_days={train_days} — "
                        "fewer means the series is missing days "
                        "(build it on a day spine; a missing day is "
                        "a real 0) or is shorter than the training "
                        "window; more means duplicate (group, day) "
                        "rows upstream. Either silently corrupts the "
                        "fixed q=train_days baseline scale."
                    ),
                )
            )
        )
    step = (
        F.lit(slack_den * train_days) * x.cast("bigint")
        - F.lit(slack_den + slack_num) * F.col("_p")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # two window passes over ONE window spec (same partitioning/order
    # → a single sort, no extra shuffle): windows can't nest, so the
    # prefix sum materializes as a column before its running min
    with_s = base.withColumn("_s", F.sum(step).over(w))
    cusum_s = F.col("_s") - F.least(
        F.lit(0).cast("bigint"), F.min("_s").over(w)
    )
    h_s = F.lit(h_mult * slack_den) * F.col("_p")
    return with_s.select(
        g.alias(group_col),
        d.alias(day_col),
        x.alias(x_col),
        spine_guard(cusum_s.cast("bigint")).alias("cusum_s"),
        spine_guard(h_s.cast("bigint")).alias("h_s"),
        (spine_guard(cusum_s) > h_s).alias("alarm"),
    )
