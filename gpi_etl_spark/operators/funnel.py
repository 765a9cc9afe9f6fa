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
        "p_r", F.round(F.col("n") / F.sum("n").over(wrow), 6)
    )
