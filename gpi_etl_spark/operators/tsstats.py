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

from pyspark.sql import DataFrame
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
