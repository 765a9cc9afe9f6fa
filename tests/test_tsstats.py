from pyspark.sql import functions as F

from gpi_etl_spark.operators.tsstats import acf_exact


def _series(spark, vals, key="a"):
    return spark.createDataFrame(
        [(key, t, x) for t, x in enumerate(vals)],
        "k string, t long, x long",
    )


def _ref_acf(vals, k):
    n = len(vals)
    mean = sum(vals) / n
    den = sum((v - mean) ** 2 for v in vals)
    num = sum(
        (vals[t] - mean) * (vals[t + k] - mean) for t in range(n - k)
    )
    return num / den


def test_acf_matches_reference_formula(spark):
    import math
    import random

    rng = random.Random(4)
    vals = [rng.randrange(0, 100) for _ in range(40)]
    out = {
        r.lag: r.r_k
        for r in acf_exact(_series(spark, vals), "k", "t", "x").collect()
    }
    for lag in range(1, 8):
        want = math.floor(_ref_acf(vals, lag) * 1_000_000 + 0.5) / 1_000_000
        assert out[lag] == want, (lag, out[lag], want)


def test_acf_detects_period(spark):
    # strict period-4 signal: r_4 = 1 exactly on matched pairs
    vals = [10, 0, 5, 3] * 10
    out = {
        r.lag: r.r_k
        for r in acf_exact(_series(spark, vals), "k", "t", "x").collect()
    }
    assert out[4] >= 0.9  # exactly (n-4)/n on a strict period
    assert out[2] < out[4] and out[1] < out[4]


def test_acf_constant_series_dropped_and_gap_safe(spark):
    const = _series(spark, [7] * 20, key="c")
    assert acf_exact(const, "k", "t", "x").collect() == []
    # gaps: drop t=5..9; matched-pair counts keep the expansion exact
    import math

    vals = [(t, (t * 13) % 9) for t in range(30) if not 5 <= t < 10]
    df = spark.createDataFrame(
        [("g", t, x) for t, x in vals], "k string, t long, x long"
    )
    out = {r.lag: r.r_k for r in acf_exact(df, "k", "t", "x").collect()}
    xs = dict(vals)
    n = len(vals)
    mean = sum(xs.values()) / n
    den = sum((v - mean) ** 2 for v in xs.values())
    for lag in (1, 3):
        num = sum(
            (xs[t] - mean) * (xs[t + lag] - mean)
            for t in xs
            if t + lag in xs
        )
        want = math.floor(num / den * 1_000_000 + 0.5) / 1_000_000
        assert out[lag] == want


def test_theil_sen_hand_checked_and_robust(spark):
    from gpi_etl_spark.operators.tsstats import theil_sen_slope

    # perfect slope 3 with one wild outlier at t=2
    rows = [("a", t, 100 + 3 * t) for t in range(10)]
    rows[2] = ("a", 2, 10_000)
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = theil_sen_slope(df, "k", "t", "v").collect()[0]
    assert out.slope_cents_per_day == 3.0  # median ignores the outlier
    assert out.m_pairs == 45
    # OLS for contrast would be dragged far above 3
    import statistics

    xs = [t for _, t, _ in rows]
    ys = [v for _, _, v in rows]
    mx, my = statistics.mean(xs), statistics.mean(ys)
    ols = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert abs(ols - 3) > 50


def test_theil_sen_lower_median_even_pairs(spark):
    from gpi_etl_spark.operators.tsstats import theil_sen_slope

    # 4 points -> 6 pairs (even): lower median = 3rd slope in order
    df = spark.createDataFrame(
        [("a", 0, 0), ("a", 1, 10), ("a", 2, 10), ("a", 3, 60)],
        "k string, t long, v long",
    )
    out = theil_sen_slope(df, "k", "t", "v").collect()[0]
    # slopes: 10,5,20,0,25,50 -> sorted 0,5,10,20,25,50 -> lower med 10
    assert out.m_pairs == 6 and out.slope_cents_per_day == 10.0


def test_seasonal_backtest_hand_checked(spark):
    from gpi_etl_spark.operators.tsstats import seasonal_naive_backtest

    # season=2: day t scored against t-2
    rows = [("a", 0, 10), ("a", 1, 20), ("a", 2, 12), ("a", 3, 26),
            ("a", 4, 12)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = seasonal_naive_backtest(df, "k", "t", "x", season=2).collect()[0]
    # scored: t=2 (|12-10|=2), t=3 (|26-20|=6), t=4 (|12-12|=0)
    assert out.m_days == 3
    assert out.mae == 2.666667  # floor(8/3*1e6+0.5)/1e6
    assert out.wape == 0.16     # 8/50


def test_seasonal_backtest_gap_and_zero_actuals(spark):
    from gpi_etl_spark.operators.tsstats import seasonal_naive_backtest

    # gap at t=1: only t=2 pairs with t=0; zero-actual key keeps its
    # MAE row with a NULL wape (the ratio is undefined, the error not)
    df = spark.createDataFrame(
        [("g", 0, 5), ("g", 2, 7), ("z", 0, 0), ("z", 2, 0)],
        "k string, t long, x long",
    )
    out = {r.k: r for r in
           seasonal_naive_backtest(df, "k", "t", "x", season=2).collect()}
    assert out["g"].m_days == 1 and out["g"].mae == 2.0
    assert out["g"].wape == 0.285714  # 2/7 (scored actual)
    assert out["z"].mae == 0.0 and out["z"].wape is None


def test_seasonal_dow_profile_moments_and_weekday(spark):
    """Moments are exact integers, and the explicit (days+4) mod 7
    weekday puts 1970-01-01 (a Thursday) at code 4 / a known Sunday at
    code 0 — the cross-engine numbering the operator exists to pin."""
    import datetime as dt

    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.tsstats import seasonal_dow_profile

    rows = [
        ("k", dt.date(1970, 1, 1), 100),   # Thursday → dow 4
        ("k", dt.date(1970, 1, 4), 300),   # Sunday → dow 0
        ("k", dt.date(1970, 1, 11), 500),  # Sunday → dow 0
        ("k", dt.date(1970, 1, 8), 700),   # Thursday → dow 4
    ]
    df = spark.createDataFrame(rows, "k string, d date, cents long")
    got = {
        r.dow: (r.n_days, r.sum_cents, r.sum_sq_cents)
        for r in seasonal_dow_profile(df, ["k"], "d", "cents").collect()
    }
    assert got == {
        4: (2, 800, 100 * 100 + 700 * 700),
        0: (2, 800, 300 * 300 + 500 * 500),
    }
    # variance via the n·Σx² − (Σx)² identity matches the direct form:
    # population variance of {300, 500} is 10000
    n, s, ss = got[0]
    assert (n * ss - s * s) / (n * n) == 10000.0
