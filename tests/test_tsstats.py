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
