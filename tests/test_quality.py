"""Data-quality constraint reports (operators/quality.py)."""

from pyspark.sql import functions as F

from gpi_etl_spark.operators.quality import Check, quality_report, referential_check


def test_quality_report_counts_and_fail_closed_nulls(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None), (4, 5.0)],
        "id long, v double",
    )
    rep = quality_report(df, [
        Check("v_positive", "v > 0"),
        Check("v_positive_or_null", "v IS NULL OR v > 0"),
    ])
    rows = {r["check_name"]: r for r in rep.collect()}
    # NULL predicate result counts as failing (fail-closed)
    assert rows["v_positive"]["n_fail"] == 2
    assert rows["v_positive"]["n_rows"] == 4
    assert rows["v_positive"]["fail_rate"] == 0.5
    # explicit null-allowance in the predicate passes the null row
    assert rows["v_positive_or_null"]["n_fail"] == 1


def test_quality_report_single_scan(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    rep = quality_report(df, [Check(f"c{i}", "v > 0") for i in range(20)])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # twenty rules, one aggregate over one source
    assert plan.count("HashAggregate") <= 4  # partial+final, no per-rule scans


def test_referential_check_counts_orphans_lazily(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    r = referential_check(child, parent, "k", "pk").first()
    assert (r["n_rows"], r["n_fail"]) == (3, 1)
    assert abs(r["fail_rate"] - round(1 / 3, 6)) < 1e-9


def test_quality_report_empty_rules_and_hostile_names(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    assert quality_report(df, []).count() == 0
    rep = quality_report(df, [
        Check("has space", "v > 0"),
        Check("it's quoted", "v > 100"),
        Check("n_rows", "v IS NOT NULL"),   # collides with report column
    ])
    rows = {r["check_name"]: r["n_fail"] for r in rep.collect()}
    assert rows == {"has space": 0, "it's quoted": 1, "n_rows": 0}


def test_histogram_hand_computed(spark):
    from gpi_etl_spark.operators.quality import histogram

    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]],
        "x double",
    )
    got = {r.bin: r for r in histogram(df, "x", bins=5).collect()}
    # width 2: bins [0,2) [2,4) [4,6) [6,8) [8,10] — max closes last bin
    assert {b: got[b].n for b in sorted(got)} == {0: 2, 1: 2, 2: 2, 3: 2, 4: 3}
    assert (got[0].lo_edge, got[0].hi_edge) == (0.0, 2.0)
    assert (got[4].lo_edge, got[4].hi_edge) == (8.0, 10.0)


def test_histogram_nulls_nans_and_pinned_range(spark):
    from gpi_etl_spark.operators.quality import histogram

    df = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),), (5.0,), (99.0,)], "x double"
    )
    got = {r.bin: r.n for r in
           histogram(df, "x", bins=2, lo=0.0, hi=10.0).collect()}
    # 99.0 is outside the pinned range and dropped; null/nan excluded
    assert got == {0: 1, 1: 1}


def test_histogram_empty_and_constant_inputs(spark):
    from gpi_etl_spark.operators.quality import histogram

    empty = spark.createDataFrame([], "x double")
    assert histogram(empty, "x").count() == 0
    const = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    rows = histogram(const, "x", bins=4).collect()
    # degenerate range: everything in bin 0, unit width
    assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n == 2


def test_mad_outliers_flags_only_the_spike(spark):
    from gpi_etl_spark.operators.quality import mad_outliers

    rows = [("a", float(v)) for v in [10, 11, 12, 13, 14, 1000]] + [
        ("b", float(v)) for v in [5, 5, 5, 5]
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = mad_outliers(df, "g", "x", k=3.0).collect()
    flagged = {(r.g, r.x) for r in got if r.is_outlier}
    # group a: median 12.5, MAD 1.5 -> only the 1000 spike exceeds 3*MAD
    assert flagged == {("a", 1000.0)}
    # constant group: MAD 0, no value strictly exceeds 0
    assert all(not r.is_outlier for r in got if r.g == "b")


def test_psi_drift_identical_distributions_zero(spark):
    from gpi_etl_spark.operators.quality import psi_drift

    df = spark.createDataFrame([(float(v),) for v in range(0, 1000, 7)], "v double")
    out = psi_drift(df, df, "v", bins=10, width=100.0).collect()
    assert len(out) == 10
    assert all(r.contrib_r == 0.0 for r in out)
    assert sum(r.n_old for r in out) == df.count()


def test_psi_drift_detects_shift(spark):
    import math

    from gpi_etl_spark.operators.quality import psi_drift

    old = spark.createDataFrame([(50.0,)] * 80 + [(150.0,)] * 20, "v double")
    new = spark.createDataFrame([(50.0,)] * 20 + [(150.0,)] * 80, "v double")
    out = {r.bin: r for r in psi_drift(old, new, "v", bins=10, width=100.0).collect()}
    # hand-replay bin 0 (add-one smoothing over n + bins = 110):
    # p = (80+1)/110, q = (20+1)/110
    p, q = 81 / 110, 21 / 110
    assert out[0].contrib_r == round((q - p) * math.log(q / p), 6)
    psi = sum(r.contrib_r for r in out.values())
    assert psi > 0.25  # "investigate" territory for an 80/20 flip
    # empty bins: smoothed symmetric, zero contribution
    assert out[5].contrib_r == 0.0 and out[5].n_old == 0


def test_ab_ztest_hand_computed(spark):
    import math

    from gpi_etl_spark.operators.quality import ab_conversion_ztest

    rows = []
    # arm a (even ids): users 0,2,4,6 — 0 and 2 purchase
    for u in (0, 2):
        rows.append((u, "purchase"))
        rows.append((u, "view"))
    for u in (4, 6):
        rows.append((u, "view"))
    # arm b (odd ids): users 1,3 — only 1 purchases (twice: still 1 user)
    rows.append((1, "purchase"))
    rows.append((1, "purchase"))
    rows.append((3, "click"))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    r = ab_conversion_ztest(df).collect()[0]
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (4, 2, 2, 1)
    assert r.rate_a == 0.5 and r.rate_b == 0.5
    p = 3 / 6
    se = math.sqrt(p * (1 - p) * (1 / 4 + 1 / 2))
    assert r.z_r == round((0.5 - 0.5) / se, 6) == 0.0


def test_psi_drift_excludes_nulls_and_nans(spark):
    from gpi_etl_spark.operators.quality import psi_drift

    clean = spark.createDataFrame([(50.0,)] * 10, "v double")
    dirty = spark.createDataFrame(
        [(50.0,)] * 10 + [(None,)] * 5 + [(float("nan"),)] * 5, "v double"
    )
    out = {r.bin: r for r in
           psi_drift(clean, dirty, "v", bins=10, width=100.0).collect()}
    # NULL/NaN rows vanish from bins AND totals: distributions identical
    assert out[9].n_new == 0  # regression: NULLs used to land in the top bin
    assert all(r.contrib_r == 0.0 for r in out.values())
    assert sum(r.n_new for r in out.values()) == 10


def test_ab_ztest_rejects_non_integer_ids(spark):
    import pytest

    from gpi_etl_spark.operators.quality import ab_conversion_ztest

    df = spark.createDataFrame(
        [("u1", "purchase"), ("u2", "view")], "user_id string, event_type string"
    )
    with pytest.raises(ValueError, match="integer"):
        ab_conversion_ztest(df)
    # explicit assignment expression works for any id type; here BOTH
    # users land in arm a, so the empty-b readout must be NULL rates +
    # z 0.0 (try_divide), not an ANSI divide-by-zero crash
    r = ab_conversion_ztest(
        df, variant_expr=F.length("user_id") % 2 == 0
    ).collect()[0]
    assert (r.n_a, r.n_b) == (2, 0)
    assert r.rate_b is None and r.z_r == 0.0


def test_impute_median_fills_and_flags(spark):
    from gpi_etl_spark.operators.quality import impute_median

    rows = [
        ("a", 1.0), ("a", 3.0), ("a", None), ("a", 100.0),
        ("b", None), ("b", None),   # all-null group stays null
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = impute_median(df, "g", "v").collect()
    a = [r for r in got if r.g == "a"]
    # median of {1, 3, 100} = 3 (robust: the 100 outlier doesn't drag it)
    filled = [r for r in a if r.was_imputed]
    assert len(filled) == 1 and filled[0].v == 3.0
    assert sorted(r.v for r in a) == [1.0, 3.0, 3.0, 100.0]
    b = [r for r in got if r.g == "b"]
    assert all(r.v is None and not r.was_imputed for r in b)


def test_fd_check_holds_and_fails(spark):
    from gpi_etl_spark.operators.quality import fd_check

    df = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 10), (3, "x", 30), (1, "x", 40)],
        "k long, a string, b long",
    )
    holds = fd_check(df, "k", "a").collect()[0]
    assert holds.holds and holds.lhs_card == 3 and holds.pair_card == 3
    fails = fd_check(df, "a", "b").collect()[0]
    # 'x' maps to {10, 30, 40}: dependency violated
    assert not fails.holds and fails.lhs_card == 2 and fails.pair_card == 4


def test_fd_check_null_dependent_violates(spark):
    """A NULL dependent value is a real violation, not invisible:
    (1,'x') vs (1,NULL) must fail the dependency, and NULL determinant
    rows are excluded entirely."""
    from gpi_etl_spark.operators.quality import fd_check

    df = spark.createDataFrame(
        [(1, "x"), (1, None), (2, "y"), (None, "z")],
        "k long, a string",
    )
    r = fd_check(df, "k", "a").collect()[0]
    assert (r.lhs_card, r.pair_card, r.holds) == (2, 3, False)


def test_weighted_median_hand_computed(spark):
    from gpi_etl_spark.operators.quality import weighted_median

    rows = [
        ("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 8),  # half-total at 3.0
        ("b", 10.0, 5), ("b", 20.0, 5),               # boundary: 2*5 >= 10
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = {r.g: r.wmedian for r in weighted_median(df, "g", "v", "w").collect()}
    assert got["a"] == 3.0
    # exact half boundary: the smaller value already reaches 2*cum == tot
    assert got["b"] == 10.0


def test_weighted_median_ties_are_order_independent(spark):
    """RANGE framing makes tied values carry identical cumulative
    weights — the pick cannot depend on partition order."""
    from gpi_etl_spark.operators.quality import weighted_median

    rows = [("g", 5.0, 3), ("g", 5.0, 3), ("g", 9.0, 2)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    for _ in range(3):
        got = weighted_median(
            df.repartition(4), "g", "v", "w"
        ).collect()
        assert got[0].wmedian == 5.0


def test_weighted_median_matches_unweighted_when_uniform(spark):
    """With unit weights the weighted median is the lower exact
    median."""
    from gpi_etl_spark.operators.quality import weighted_median

    rows = [("g", float(v), 1) for v in (7, 1, 5, 3, 9, 11)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = weighted_median(df, "g", "v", "w").collect()[0].wmedian
    assert got == 5.0  # lower of the middle pair (5, 7)


def test_winsorized_stats_clamps_outliers(spark):
    from gpi_etl_spark.operators.quality import winsorized_stats

    # one group: 99 values 1..99 plus a 1e9 outlier; the interpolated
    # p95 lands inside the regular values (position 94.05), so the cap
    # clamps the outlier to ~95 and the clipped mean stays ~50
    rows = [("a", float(v)) for v in range(1, 100)] + [("a", 1e9)]
    df = spark.createDataFrame(rows, "g string, value double")
    out = winsorized_stats(df, "g", "value", 0.05, 0.95).collect()[0]
    assert out.n == 100
    assert out.hi_r < 100.0          # the outlier cannot set the cap
    assert out.clipped_mean_r < 60.0  # nor dominate the mean (raw ~1e7)
    assert out.lo_r >= 1.0


def test_winsorized_stats_constant_group(spark):
    from gpi_etl_spark.operators.quality import winsorized_stats

    df = spark.createDataFrame(
        [("b", 7.0)] * 5, "g string, value double"
    )
    out = winsorized_stats(df, "g", "value").collect()[0]
    assert (out.lo_r, out.hi_r, out.clipped_mean_r) == (7.0, 7.0, 7.0)


def test_key_skew_profile_hand_checked(spark):
    from gpi_etl_spark.operators.quality import key_skew_profile

    # multiplicities: a->6, b->2, c->1, d->1 (10 rows, 4 keys)
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",), ("d",)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", "t").collect()[0]
    assert (out.n_rows, out.n_keys, out.max_n) == (10, 4, 6)
    # sorted multiplicities [1,1,2,6]: p50 = 2nd (ceil(.5*4)=2) -> 1,
    # p99 = ceil(3.96)=4th -> 6
    assert out.p50_n == 1 and out.p99_n == 6
    assert out.skew_ratio == 2.4  # 6*4/10
    assert out.salt_factor == 3  # ceil(24/10)


def test_key_skew_profile_uniform_is_one(spark):
    from gpi_etl_spark.operators.quality import key_skew_profile

    df = spark.createDataFrame(
        [(i % 5,) for i in range(25)], "k int"
    ).repartition(7)
    out = key_skew_profile(df, "k", "u").collect()[0]
    assert out.skew_ratio == 1.0 and out.salt_factor == 1
    assert out.p50_n == 5 and out.p99_n == 5 and out.max_n == 5


def test_content_checksum_order_and_partition_invariant(spark):
    from gpi_etl_spark.operators.quality import content_checksum

    rows = [(i, f"v{i % 7}", i * 3) for i in range(200)]
    a = spark.createDataFrame(rows, "id long, s string, n long")
    b = spark.createDataFrame(list(reversed(rows)), "id long, s string, n long").repartition(13)
    ca = content_checksum(a, ["id", "s", "n"]).collect()[0]
    cb = content_checksum(b, ["id", "s", "n"]).collect()[0]
    assert (ca.n_rows, ca.xor_checksum, ca.sum_checksum) == (
        cb.n_rows, cb.xor_checksum, cb.sum_checksum,
    )


def test_content_checksum_detects_single_row_change(spark):
    from gpi_etl_spark.operators.quality import content_checksum

    rows = [(i, "x") for i in range(50)]
    a = spark.createDataFrame(rows, "id long, s string")
    mutated = spark.createDataFrame(
        rows[:-1] + [(49, "y")], "id long, s string"
    )
    ca = content_checksum(a, ["id", "s"]).collect()[0]
    cb = content_checksum(mutated, ["id", "s"]).collect()[0]
    assert ca.n_rows == cb.n_rows
    assert (ca.xor_checksum, ca.sum_checksum) != (
        cb.xor_checksum, cb.sum_checksum,
    )


def test_content_checksum_duplicate_pair_caught_by_sum(spark):
    from gpi_etl_spark.operators.quality import content_checksum

    # xor of two identical rows cancels; the mod-P sum must not
    base = [(1, "a"), (2, "b")]
    dup = base + [(1, "a"), (1, "a")]
    a = content_checksum(
        spark.createDataFrame(base, "id long, s string"), ["id", "s"]
    ).collect()[0]
    d = content_checksum(
        spark.createDataFrame(dup, "id long, s string"), ["id", "s"]
    ).collect()[0]
    assert d.xor_checksum == a.xor_checksum  # the documented xor blind spot
    assert d.sum_checksum != a.sum_checksum and d.n_rows != a.n_rows


def test_content_checksum_null_vs_empty_distinct(spark):
    from gpi_etl_spark.operators.quality import content_checksum

    a = content_checksum(
        spark.createDataFrame([("a", None)], "x string, y string"),
        ["x", "y"],
    ).collect()[0]
    b = content_checksum(
        spark.createDataFrame([("a", "")], "x string, y string"),
        ["x", "y"],
    ).collect()[0]
    assert a.sum_checksum != b.sum_checksum


def test_benford_profile_hand_checked(spark):
    from gpi_etl_spark.operators.quality import (
        BENFORD_6DP,
        benford_profile,
    )

    rows = (
        [("a", 1.23)] * 3 + [("a", 19.99)] * 3 + [("a", 0.25)] * 2
        + [("a", 0.00)] + [("a", 900.0)] * 2
    )
    df = spark.createDataFrame(rows, "g string, amt double")
    out = {r.digit: r for r in benford_profile(df, "amt", "g").collect()}
    # 0.00 excluded -> n = 10; digits: 1 x6, 2 x2, 9 x2
    assert out[1].n_d == 6 and out[2].n_d == 2 and out[9].n_d == 2
    assert out[1].share == 0.6 and out[1].benford == BENFORD_6DP[1]
    assert out[1].dev == round(0.6 - BENFORD_6DP[1], 6)
    assert set(out) == {1, 2, 9}


def test_benford_profile_real_benford_data_fits(spark):
    from gpi_etl_spark.operators.quality import benford_profile

    # 2^k for k=0..199 is a classic Benford sequence
    rows = [("p", float(2**k % 10**9) + 0.5) for k in range(200)]
    # keep true leading digit: use the actual power value scaled into
    # decimal(18,2) range instead
    rows = []
    for k in range(200):
        v = float(2**k)
        while v >= 1e15:
            v /= 1e10
        rows.append(("p", v))
    df = spark.createDataFrame(rows, "g string, amt double")
    out = {r.digit: r for r in benford_profile(df, "amt", "g").collect()}
    # leading digit 1 should be close to 30.1%, digit 9 near 4.6%
    assert 0.25 < out[1].share < 0.36
    assert out[9].share < 0.09
    assert abs(out[1].dev) < 0.06


def test_fd_g3_hand_computed_and_agrees_with_fd_check(spark):
    """g3 on a hand-built frame: k=1 rows split 2a/1b (1 violation),
    k=2 rows uniform (0). g3 = 1/5; holds_exact mirrors fd_check."""
    from gpi_etl_spark.operators.quality import fd_check, fd_g3

    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "c"), (2, "c"),
            (None, "z")]
    df = spark.createDataFrame(rows, "k int, v string")
    g3 = fd_g3(df, "k", "v").first()
    assert (g3.n, g3.keep_rows, g3.g3_violations) == (5, 4, 1)
    assert abs(g3.g3_r - 0.2) < 1e-9 and g3.holds_exact == 0
    assert bool(fd_check(df, "k", "v").first().holds) is False
    clean = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b")], "k int, v string"
    )
    g3c = fd_g3(clean, "k", "v").first()
    assert g3c.g3_violations == 0 and g3c.holds_exact == 1
    assert bool(fd_check(clean, "k", "v").first().holds) is True


def test_fd_g3_null_dependent_is_a_value_and_multi_lhs(spark):
    from gpi_etl_spark.operators.quality import fd_g3

    # (1,'x') vs (1,NULL): the dirty-dimension case — one violation
    df = spark.createDataFrame(
        [(1, "x"), (1, None)], "k int, v string"
    )
    r = fd_g3(df, "k", "v").first()
    assert r.g3_violations == 1 and r.holds_exact == 0
    # multi-column determinant: (a, b) -> v holds here
    df2 = spark.createDataFrame(
        [(1, 1, "p"), (1, 2, "q"), (2, 1, "p")],
        "a int, b int, v string",
    )
    r2 = fd_g3(df2, ["a", "b"], "v").first()
    assert r2.holds_exact == 1 and r2.fd == "a,b -> v"


def test_fd_g3_empty_input_is_zero_not_nan(spark):
    from gpi_etl_spark.operators.quality import fd_g3

    empty = spark.createDataFrame([], "k int, v string")
    r = fd_g3(empty, "k", "v").first()
    assert (r.n, r.g3_violations, r.g3_r, r.holds_exact) == (0, 0, 0.0, 1)
