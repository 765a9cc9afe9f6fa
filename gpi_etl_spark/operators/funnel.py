"""Event-sequence analytics: ordered funnels and retention cohorts.

The events-table counterpart of the sessionization family (q11/q74):
product-analytics primitives every clickstream warehouse runs, built as
pure joins/aggregations so they ride Catalyst/AQE like any other query.

Scale shape: each funnel step is one equi-join on ``user_id`` against
the (already per-user, so |users|-sized) previous-step frame plus one
min-aggregate — shuffle ∝ events once for the first step, then ∝ users;
no windows over the raw event stream, no per-user state on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    within_hours: int | None = None,
) -> DataFrame:
    """Strictly-ordered funnel: for each user, ``t1`` is the first
    occurrence of ``steps[0]``, and ``t_i`` the first occurrence of
    ``steps[i-1]`` AFTER ``t_{i-1}`` (and, when ``within_hours`` is
    set, no later than ``t1 + within_hours`` — the whole-funnel
    conversion window, the product-analytics convention).

    Returns one row per user who completed step 1: ``(user, t1..tn,
    reached)`` with NULL times for uncompleted steps.
    """
    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_tp"),
    )
    out = (
        e.filter(F.col("_tp") == steps[0])
        .groupBy("user_id")
        .agg(F.min("_ts").alias("t1"))
    )
    deadline = (
        F.col("t1") + F.expr(f"INTERVAL {int(within_hours)} HOURS")
        if within_hours is not None
        else None
    )
    for i, step in enumerate(steps[1:], start=2):
        cond = F.col("_ts") > F.col(f"t{i - 1}")
        if deadline is not None:
            cond = cond & (F.col("_ts") <= deadline)
        nxt = (
            e.filter(F.col("_tp") == step)
            .join(out, "user_id")
            .filter(cond)
            .groupBy("user_id")
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        out = out.join(nxt, "user_id", "left")
    reached = F.lit(1)
    for i in range(2, len(steps) + 1):
        reached = F.when(F.col(f"t{i}").isNotNull(), F.lit(i)).otherwise(
            reached
        )
    return out.withColumn("reached", reached)


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly retention triangle: users are cohorted by the Monday week
    of their FIRST event; every (user, active-week) pair then counts
    into ``(cohort, week_offset)``. Two aggregations and one |users| ⋈
    |user-weeks| join — the standard warehouse shape.

    Returns ``(cohort, week_offset, n_users)``.
    """
    e = events.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("_ts")
    )
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("_ts")).alias("cohort")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("_ts")).alias("wk")
    ).distinct()
    return (
        active.join(first, "user_id")
        .select(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    every consecutive pair within a user's timeline, count
    ``from_type → to_type`` and normalize per source state — the
    behavioral fingerprint (and anomaly baseline) of a clickstream.

    Ordering is ``(ts, tiebreak)`` so simultaneous events sequence
    deterministically in every engine. One window per user (shuffle ∝
    events on the user hash) + one pair groupBy; the row-probability
    normalization is a window over the |states|² matrix, not the
    stream.

    Returns ``(from_type, to_type, n, p_r)``.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(F.col(type_col)).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("from_type")
    return pairs.withColumn(
        # explicit floor-scaling, not round(): n/Σn is an exact integer
        # ratio that can land on 6-dp half-way points where the
        # engines' round() primitives disagree (q165's sf0.1 find)
        "p_r",
        F.floor(
            (F.col("n") / F.sum("n").over(wrow)) * F.lit(1000000.0)
            + F.lit(0.5)
        )
        / F.lit(1000000.0),
    )


def attribute_conversions(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Multi-touch marketing attribution: credit each conversion to the
    touchpoints (by channel = event type) that preceded it within the
    lookback window, under the three standard models at once —
    first-touch, last-touch, and linear.

    Shape: conversions ⋈ touches is an EQUI-join on the user (hash
    join — never a band/BNL join), with the lookback as a join-time
    range filter; fan-out is bounded by per-user activity × the
    window, the same envelope as q162's DAU/WAU band. Per conversion,
    first/last flags come from one window over its matched touches and
    the linear weight is 1/n — then one groupBy(channel) folds
    everything. Revenue sums run in exact decimal.

    Conversions with NO touch in the window are excluded (unattributed
    — report them from the anti-join if needed). Ties on touch
    timestamp break by event id, so credit assignment is deterministic.

    Returns one row per channel: ``n_first``/``n_last`` (conversions
    credited under first/last-touch), ``credit_linear`` (fractional
    conversions, rounded 6), ``rev_last`` (last-touch-attributed
    revenue, exact decimal rounded 2).
    """
    conv = events.filter(F.col("event_type") == conversion_type).select(
        F.col(id_col).alias("conv_id"),
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("conv_ts"),
        F.col(value_col).cast("decimal(18,2)").alias("rev"),
    )
    touch = events.filter(
        F.col("event_type").isin(*touch_types)
    ).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("touch_ts"),
        F.col(id_col).alias("touch_id"),
        F.col("event_type").alias("channel"),
    )
    matched = conv.join(touch, "_u").filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
        )
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").asc(), F.col("touch_id").asc()
    )
    wn = Window.partitionBy("conv_id")
    flagged = (
        matched.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .withColumn("_is_first", (F.col("_rk") == 1).cast("int"))
        .withColumn("_is_last", (F.col("_rk") == F.col("_n")).cast("int"))
    )
    # collapse to one row per (conversion, channel) FIRST: the linear
    # share k/n is then a single IEEE division per row, rounded to 9 dp
    # and summed in EXACT decimal — a raw double sum over thousands of
    # 1/n terms would be addition-order-dependent and the hash gate's
    # 6-dp round could flip at a partial-aggregation boundary
    per_cc = flagged.groupBy("conv_id", "channel").agg(
        F.count(F.lit(1)).alias("_k"),
        F.max("_n").alias("_nn"),
        F.max("_is_first").alias("_f"),
        F.max("_is_last").alias("_l"),
        F.max("rev").alias("_rev"),
    )
    share = F.round(
        F.col("_k").cast("double") / F.col("_nn"), 9
    ).cast("decimal(28,9)")
    # round the DECIMAL sum (exact half-up in both engines), THEN cast
    # to double — rounding the casted double instead would hit the
    # engines' round() divergence on exact 6-dp half-way points (see
    # q165's sf0.1 find: Spark rounds via BigDecimal, DuckDB scales in
    # floating point)
    return per_cc.groupBy("channel").agg(
        F.sum("_f").cast("bigint").alias("n_first"),
        F.sum("_l").cast("bigint").alias("n_last"),
        F.round(F.sum(share), 6).cast("double").alias("credit_linear"),
        F.round(
            F.sum(F.when(F.col("_l") == 1, F.col("_rev"))).cast("double"),
            2,
        ).alias("rev_last"),
    )
