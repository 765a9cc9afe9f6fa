"""Time-series statistics over integer-valued series, engine-exact.

Greenfield next to the reference's financial indicators
(operators/indicators.py): where those are per-row arithmetic, these
are SERIES-level diagnostics (autocorrelation first) computed so that
no float ever crosses rows — the whole statistic reduces to integer
moments, and only the final ratio leaves integer arithmetic, through
the repo's 6-dp floor scaling. That makes the classically
"approximate" ACF bit-replayable in any engine and safe from
order-dependent float summation at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gpi_etl_spark.functions.rounding import fs6


def acf_exact(
    df: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation r_k for lags 1..``max_lag`` per key, over
    an INTEGER-valued series indexed by consecutive integers ``t_col``
    (e.g. daily counts by day index; gaps are the caller's problem —
    fill the spine first).

    Exactness: with S = Σx, Q = Σx², and per-lag pair moments
    C_k = Σ x_t·x_{t+k}, A_k = Σ x_t and B_k = Σ x_{t+k} over the m_k
    MATCHED pairs, the textbook estimator

        r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²

    multiplies through by n² into pure int64:

        r_k = (n²·C_k − n·S·(A_k+B_k) + m_k·S²) / (n²·Q − n·S²)

    (m_k = n−k on a gap-free spine; with gaps, the matched-pair count
    keeps the expansion exact for the pairs that exist), so both
    engines compute identical integers and only the final
    division is floored to 6 dp. Overflow bound: n²·C_k needs
    n²·n·max_x² < 2⁶³ — e.g. 10⁴ points of values ≤ 50k; beyond that,
    cast the moment columns to decimal(38,0).

    Scale shape: lag pairs come from ONE self-equi-join on
    (key, t + k) with the small lag list exploded on the probe side —
    shuffle keys are (key, t), no window, no cross join; constant
    series (zero variance) are dropped (r_k undefined).

    Returns (key, lag, n, r_k).
    """
    s = df.select(
        F.col(key_col).alias("k"),
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    )
    tot = s.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s_sum"),
        F.sum(F.col("x") * F.col("x")).alias("q_sum"),
    )
    probe = s.select(
        "k",
        F.col("x").alias("x_r"),
        F.explode(
            F.array(*[F.lit(i) for i in range(1, max_lag + 1)])
        ).alias("lag"),
        F.col("t").alias("t_r"),
    ).withColumn("t", F.col("t_r") - F.col("lag"))
    pairs = s.join(probe, ["k", "t"]).groupBy("k", "lag").agg(
        F.sum(F.col("x") * F.col("x_r")).alias("c_k"),
        F.sum("x").alias("a_k"),
        F.sum("x_r").alias("b_k"),
        F.count(F.lit(1)).alias("m_k"),
    )
    num = (
        F.col("n") * F.col("n") * F.col("c_k")
        - F.col("n") * F.col("s_sum") * (F.col("a_k") + F.col("b_k"))
        + F.col("m_k") * F.col("s_sum") * F.col("s_sum")
    )
    den = (
        F.col("n") * F.col("n") * F.col("q_sum")
        - F.col("n") * F.col("s_sum") * F.col("s_sum")
    )
    return (
        pairs.join(tot, "k")
        .filter(den != 0)
        .select(
            F.col("k").alias(key_col),
            F.col("lag").cast("int").alias("lag"),
            F.col("n").cast("long").alias("n"),
            fs6(num / den.cast("double")).alias("r_k"),
        )
    )


def theil_sen_slope(
    df: DataFrame,
    key_col: str,
    t_col: str,
    v_cents_col: str,
) -> DataFrame:
    """Theil–Sen robust trend per key: the MEDIAN of all pairwise
    slopes ``(v_j − v_i)/(t_j − t_i)`` — up to ~29% corrupted points
    leave the estimate standing, where one outlier day drags an OLS
    slope (q154) arbitrarily far.

    Exactness: values arrive as integer cents, times as integer
    indices, so each pairwise slope is an exact rational floored to
    6 dp (`fs6`) — both engines order the same multiset. The median is
    the LOWER median (element ⌈m/2⌉ in (slope, t_i, t_j) order):
    averaging the two middle slopes on even m would put an exact
    .0000005 halfway point back in play, the boundary class this repo
    eliminates everywhere.

    Scale shape: the pair join is a self-equi-join on the key with a
    ``t_i < t_j`` filter — quadratic IN THE SERIES LENGTH per key
    (n=30 daily points → 435 pairs), never in the row count; the
    median selection is one per-key window over those bounded pairs.
    For multi-year series, fence the window (e.g. trailing 90 days)
    before calling.
    """
    s = df.select(
        F.col(key_col).alias("k"),
        F.col(t_col).cast("long").alias("t"),
        F.col(v_cents_col).cast("long").alias("v"),
    )
    b = s.select(
        F.col("k"),
        F.col("t").alias("t2"),
        F.col("v").alias("v2"),
    )
    pairs = s.join(b, "k").filter(F.col("t") < F.col("t2")).select(
        "k",
        "t",
        "t2",
        fs6(
            (F.col("v2") - F.col("v"))
            / (F.col("t2") - F.col("t")).cast("double")
        ).alias("slope6"),
    )
    w = Window.partitionBy("k").orderBy("slope6", "t", "t2")
    cnt = Window.partitionBy("k")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .withColumn("_m", F.count(F.lit(1)).over(cnt))
        .filter(F.col("_rn") * 2 == F.col("_m") + F.pmod(F.col("_m"), F.lit(2)))
        .select(
            F.col("k").alias(key_col),
            F.col("_m").cast("long").alias("m_pairs"),
            F.col("slope6").alias("slope_cents_per_day"),
        )
    )


def seasonal_naive_backtest(
    df: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
    season: int = 7,
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict day t with
    the actual from day t−season) — the baseline every fancier
    forecaster must beat, and the cheapest drift alarm for counter
    series. Scored days are those where both the actual and its
    season-lagged twin exist (one self-equi-join on (key, t−season) —
    gap-safe, no window).

    Metrics are exact integer ratios floored to 6 dp: MAE = Σ|e|/m and
    WAPE = Σ|e|/Σactual (the scale-free one practitioners report;
    sMAPE is deliberately NOT offered — its per-day rational terms
    force an order-dependent float sum, the class this repo bans).
    Keys whose scored actuals sum to zero keep their MAE row with a
    NULL ``wape`` (the ratio is undefined, the absolute error is not).
    """
    s = df.select(
        F.col(key_col).alias("k"),
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    )
    f = s.select(
        F.col("k"),
        (F.col("t") + season).alias("t"),
        F.col("x").alias("fcst"),
    )
    scored = s.join(f, ["k", "t"]).select(
        "k", "x", "fcst", F.abs(F.col("x") - F.col("fcst")).alias("ae")
    )
    agg = scored.groupBy("k").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("ae").alias("sae"),
        F.sum("x").alias("sx"),
    )
    return agg.select(
        F.col("k").alias(key_col),
        F.col("m").cast("long").alias("m_days"),
        fs6(F.col("sae") / F.col("m").cast("double")).alias("mae"),
        F.when(
            F.col("sx") > 0,
            fs6(F.col("sae") / F.col("sx").cast("double")),
        ).alias("wape"),
    )


def seasonal_dow_profile(
    df: DataFrame,
    key_cols: list[str],
    date_col: str,
    cents_col: str,
) -> DataFrame:
    """Additive day-of-week seasonal profile over an integer (cents)
    daily series — the decomposition step before the q219-class
    seasonal-naive baseline: per (key, weekday) the day count, the
    exact integer total, and the int64 moment pair from which mean and
    variance derive with NO float sum anywhere (the acf_exact
    convention — n·Σx² − (Σx)² multiplies the variance through by n²,
    so only the caller's final ratio leaves integer arithmetic).

    Weekday is computed as ``(days_since_epoch + 4) mod 7`` (0=Sunday
    … 6=Saturday) — explicit epoch arithmetic because engine weekday
    FUNCTIONS disagree on numbering (Spark ``dayofweek`` is 1=Sunday,
    DuckDB's is 0=Sunday), and an off-by-one here silently rotates the
    whole profile.

    Returns ``(*key_cols, dow int, n_days bigint, sum_cents bigint,
    sum_sq_cents bigint)``. One aggregation, map-side combined; output
    is |keys|×7 rows however long the series.
    """
    dow = F.pmod(
        F.datediff(F.col(date_col), F.lit("1970-01-01").cast("date"))
        + F.lit(4),
        F.lit(7),
    ).cast("int")
    x = F.col(cents_col).cast("long")
    return (
        df.withColumn("dow", dow)
        .groupBy(*key_cols, "dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(x).alias("sum_cents"),
            F.sum(x * x).alias("sum_sq_cents"),
        )
    )
