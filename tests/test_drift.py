"""Drift operators: exact KS vs a pure-Python replay (including tie
handling), PSI vs a Python fold, segment-hash determinism, and the
degenerate-segment guard."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _ks_reference(rows):
    """Pure-Python exact two-sample KS over (value, seg) rows —
    evaluates the CDF difference after absorbing all ties at each
    distinct value, the statistic's correct treatment."""
    a = sorted(v for v, s in rows if s == "a")
    b = sorted(v for v, s in rows if s == "b")
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    cum_a = cum_b = 0
    best = 0
    for v in values:
        cum_a += sum(1 for x in a if x == v)
        cum_b += sum(1 for x in b if x == v)
        best = max(best, abs(cum_a * nb - cum_b * na))
    return na, nb, best


def _mk(spark, rows):
    return spark.createDataFrame(
        [("g", float(v), s) for v, s in rows], "grp string, v double, seg string"
    )


def test_ks_matches_python_replay_with_ties(spark):
    from gpi_etl_spark.operators.drift import ks_two_sample

    rows = [
        (1.0, "a"), (1.0, "a"), (1.0, "b"),
        (2.0, "b"), (2.0, "b"), (2.0, "a"),
        (3.0, "a"), (5.0, "b"), (5.0, "b"), (7.0, "a"),
    ]
    na, nb, d_num = _ks_reference(rows)
    out = ks_two_sample(_mk(spark, rows), "grp", "v").collect()[0]
    assert (out["n_a"], out["n_b"], out["d_num"]) == (na, nb, d_num)
    assert out["d_r"] == math.floor(d_num / (na * nb) * 1e6 + 0.5) / 1e6


def test_ks_identical_samples_zero(spark):
    from gpi_etl_spark.operators.drift import ks_two_sample

    rows = [(v, "a") for v in (1.0, 2.0, 3.0)] + [
        (v, "b") for v in (1.0, 2.0, 3.0)
    ]
    out = ks_two_sample(_mk(spark, rows), "grp", "v").collect()[0]
    assert out["d_num"] == 0 and out["d_r"] == 0.0


def test_ks_disjoint_samples_is_one(spark):
    from gpi_etl_spark.operators.drift import ks_two_sample

    rows = [(1.0, "a"), (2.0, "a"), (9.0, "b"), (10.0, "b")]
    out = ks_two_sample(_mk(spark, rows), "grp", "v").collect()[0]
    assert out["d_r"] == 1.0


def test_ks_drops_single_segment_groups(spark):
    from gpi_etl_spark.operators.drift import ks_two_sample

    df = spark.createDataFrame(
        [("only_a", 1.0, "a"), ("only_a", 2.0, "a"), ("both", 1.0, "a"),
         ("both", 2.0, "b")],
        "grp string, v double, seg string",
    )
    got = {r["grp"] for r in ks_two_sample(df, "grp", "v").collect()}
    assert got == {"both"}


def _psi_reference(rows, width=50.0):
    """Python replay of the smoothed, ordered-fold PSI."""
    bins = {}
    for v, s in rows:
        b = math.floor(v / width)
        bins.setdefault(b, [0, 0])[0 if s == "a" else 1] += 1
    na = sum(c[0] for c in bins.values())
    nb = sum(c[1] for c in bins.values())
    k = len(bins)
    psi = 0.0
    for b in sorted(bins):
        ca, cb = bins[b]
        pa = (ca + 1) / (na + k)
        pb = (cb + 1) / (nb + k)
        psi += (pa - pb) * math.log(pa / pb)
    return round(psi, 6)


def test_psi_matches_python_replay(spark):
    from gpi_etl_spark.operators.drift import psi_drift

    rows = [
        (10.0, "a"), (20.0, "a"), (60.0, "a"), (60.0, "a"),
        (110.0, "a"), (10.0, "b"), (70.0, "b"), (70.0, "b"),
        (120.0, "b"), (120.0, "b"), (180.0, "b"),
    ]
    out = psi_drift(_mk(spark, rows), "grp", "v").collect()[0]
    assert out["psi_r"] == _psi_reference(rows)
    # every PSI term shares sign factors, so the total is >= 0
    assert out["psi_r"] >= 0.0


def test_psi_identical_distributions_zero(spark):
    from gpi_etl_spark.operators.drift import psi_drift

    rows = [(v, s) for s in ("a", "b") for v in (10.0, 60.0, 110.0)]
    out = psi_drift(_mk(spark, rows), "grp", "v").collect()[0]
    assert out["psi_r"] == 0.0


def test_hash_segment_deterministic_and_balanced(spark):
    from gpi_etl_spark.operators.drift import hash_segment

    df = spark.range(2000).select(
        hash_segment(F.col("id")).alias("seg")
    )
    counts = {r["seg"]: r["n"] for r in
              df.groupBy("seg").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"a", "b"}
    # mixing hash should land near 50/50 on sequential ids
    assert abs(counts["a"] - counts["b"]) < 400
    again = {r["seg"]: r["n"] for r in
             spark.range(2000).select(hash_segment(F.col("id")).alias("seg"))
             .groupBy("seg").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == again


def test_cusum_matches_textbook_recursion_and_fires_on_shift(spark):
    """The closed form (prefix sum minus running min) must equal the
    textbook recursion C_t = max(0, C_{t-1} + x_t - (1+slack)*mu0)
    computed in plain Python (scaled to the same integers), and a
    planted level shift after the training window must raise alarm
    while the pre-shift days stay quiet."""
    from gpi_etl_spark.operators.drift import cusum_counts

    xs = [10, 11, 9, 10, 10, 12, 8, 10, 11, 9, 10, 10, 11, 9] + [30] * 6
    rows = [("a", d, x) for d, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, day long, x long")
    out = {
        r.day: (r.cusum_s, r.h_s, r.alarm)
        for r in cusum_counts(
            df, group_col="g", day_col="day", x_col="x",
            train_days=14, slack_num=1, slack_den=20, h_mult=5,
        ).collect()
    }
    p, q, sd, sn, hm = sum(xs[:14]), 14, 20, 1, 5
    c = 0
    for d, x in enumerate(xs):
        c = max(0, c + sd * q * x - (sd + sn) * p)
        assert out[d][0] == c, f"day {d}"
        assert out[d][1] == hm * sd * p
        assert out[d][2] == (c > hm * sd * p)
    assert not any(out[d][2] for d in range(14))   # quiet baseline
    assert any(out[d][2] for d in range(14, 20))   # shift detected


def test_cusum_zero_days_shift_the_statistic(spark):
    """A zero-count day is a real observation: dropping it must change
    the trajectory (guards the day-spine requirement in q231)."""
    from gpi_etl_spark.operators.drift import cusum_counts

    # baseline 10/day, then an elevated tail (13/day → positive CUSUM
    # drift) with ONE zero day inside it
    full = [
        ("a", d, (10 if d < 14 else 13) if d != 16 else 0)
        for d in range(20)
    ]
    skipped = [r for r in full if r[2] != 0]
    kw = dict(group_col="g", day_col="day", x_col="x", train_days=14)
    c_full = {
        r.day: r.cusum_s
        for r in cusum_counts(
            spark.createDataFrame(full, "g string, day long, x long"), **kw
        ).collect()
    }
    c_skip = {
        r.day: r.cusum_s
        for r in cusum_counts(
            spark.createDataFrame(
                skipped, "g string, day long, x long"
            ), **kw
        ).collect()
    }
    assert c_full[19] != c_skip[19]


def test_cusum_short_training_window_fails_loudly(spark):
    """Advice find: a series with fewer than train_days days in the
    training window silently deflated mu0 (p summed over fewer days
    but scaled by train_days). The spine guard must raise instead."""
    import pytest
    from pyspark.errors import PySparkException

    from gpi_etl_spark.operators.drift import cusum_counts

    # 5-day series, train_days=14 (series shorter than the window)
    short = spark.createDataFrame(
        [("a", d, 10) for d in range(5)], "g string, day long, x long"
    )
    with pytest.raises(PySparkException, match="expected train_days"):
        cusum_counts(
            short, group_col="g", day_col="day", x_col="x",
            train_days=14,
        ).collect()

    # gap INSIDE the training window (day 3 missing, not a spine)
    gappy = spark.createDataFrame(
        [("a", d, 10) for d in range(20) if d != 3],
        "g string, day long, x long",
    )
    with pytest.raises(PySparkException, match="expected train_days"):
        cusum_counts(
            gappy, group_col="g", day_col="day", x_col="x",
            train_days=14,
        ).collect()

    # a gap AFTER the training window is the caller's spine problem
    # elsewhere, but must not trip THIS guard (training window intact)
    late_gap = spark.createDataFrame(
        [("a", d, 10) for d in range(20) if d != 16],
        "g string, day long, x long",
    )
    assert len(
        cusum_counts(
            late_gap, group_col="g", day_col="day", x_col="x",
            train_days=14,
        ).collect()
    ) == 19
