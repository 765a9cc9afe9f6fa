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
