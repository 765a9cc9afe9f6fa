"""equi_depth_woe binning totality + inclusion_profile semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_equi_depth_bins_keep_ties_whole_and_are_order_free(spark):
    from gpi_etl_spark.operators.featselect import equi_depth_woe

    # 30 rows, value 5 repeated 12 times straddling the bin-3 boundary
    rows = [(v, 1 if v % 2 else 0) for v in range(10) for _ in range(1)]
    rows += [(5, 1)] * 11 + [(i, 0) for i in range(10, 19)]
    df = spark.createDataFrame(rows, "v int, lab int")
    out = equi_depth_woe(df, "v", "lab", 4).collect()
    # every distinct value lands in exactly one bin: lo/hi spans of
    # consecutive bins never overlap
    spans = sorted((r.bin, r.lo, r.hi) for r in out)
    for (b1, _l1, h1), (b2, l2, _h2) in zip(spans, spans[1:]):
        assert h1 < l2 and b1 < b2
    # order independence
    out_rev = equi_depth_woe(
        spark.createDataFrame(rows[::-1], "v int, lab int"),
        "v", "lab", 4,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out_rev))


def test_woe_matches_hand_computation(spark):
    from gpi_etl_spark.operators.featselect import equi_depth_woe

    # two clean bins: values 0..9 (1 pos of 10), 10..19 (9 pos of 10)
    rows = [(v, 1 if v == 0 else 0) for v in range(10)]
    rows += [(v, 0 if v == 10 else 1) for v in range(10, 20)]
    df = spark.createDataFrame(rows, "v int, lab int")
    out = {r.bin: r for r in equi_depth_woe(df, "v", "lab", 2).collect()}
    assert out[0].pos == 1 and out[0].neg == 9
    assert out[1].pos == 9 and out[1].neg == 1
    want0 = round(math.log((1 * 10) / (9 * 10)), 6)
    assert abs(out[0].woe_r - want0) < 1e-9
    # iv terms are symmetric here
    assert abs(out[0].iv_term_r - out[1].iv_term_r) < 1e-9


def test_woe_zero_cell_is_null_not_error(spark):
    from gpi_etl_spark.operators.featselect import equi_depth_woe

    rows = [(v, 0) for v in range(10)] + [(v, 1) for v in range(10, 20)]
    df = spark.createDataFrame(rows, "v int, lab int")
    out = {r.bin: r for r in equi_depth_woe(df, "v", "lab", 2).collect()}
    assert out[0].woe_r is None and out[1].iv_term_r is None


def test_inclusion_profile_flags_by_integer_equality(spark):
    from gpi_etl_spark.operators.quality import inclusion_profile

    child = spark.createDataFrame(
        [(1,), (2,), (3,), (None,)], "k bigint"
    )
    parent_full = spark.createDataFrame([(1,), (2,), (3,), (9,)],
                                        "p bigint")
    parent_part = spark.createDataFrame([(1,), (2,)], "p bigint")
    out = {
        r.pair: r
        for r in inclusion_profile(
            [
                ("full", child, "k", parent_full, "p"),
                ("partial", child, "k", parent_part, "p"),
            ]
        ).collect()
    }
    assert out["full"].lhs_card == 3  # NULL excluded
    assert out["full"].contained == 3
    assert out["full"].is_fk_candidate == 1
    assert out["partial"].contained == 2
    assert out["partial"].is_fk_candidate == 0
    assert abs(out["partial"].containment_r - 0.666667) < 1e-6


def test_inclusion_profile_counts_distinct_not_rows(spark):
    from gpi_etl_spark.operators.quality import inclusion_profile

    child = spark.createDataFrame([(1,)] * 50 + [(7,)], "k bigint")
    parent = spark.createDataFrame([(1,)], "p bigint")
    r = inclusion_profile([("x", child, "k", parent, "p")]).first()
    assert r.lhs_card == 2 and r.contained == 1


def test_inclusion_profile_is_type_canonical(spark):
    """int child vs string parent: the cast-to-string canonicalization
    makes cross-typed FK candidates comparable."""
    from gpi_etl_spark.operators.quality import inclusion_profile

    child = spark.createDataFrame([(7,), (8,)], "k bigint")
    parent = spark.createDataFrame([("7",), ("8",)], "p string")
    r = inclusion_profile([("x", child, "k", parent, "p")]).first()
    assert r.is_fk_candidate == 1


def test_inclusion_profile_empty_child_is_not_a_candidate(spark):
    """Review find: an all-NULL child column used to kill the sweep
    with an ANSI divide-by-zero — and 0 == 0 would have flagged a
    vacuous column as an FK candidate. Now: ratio NULL, flag 0."""
    from gpi_etl_spark.operators.quality import inclusion_profile

    child = spark.createDataFrame([(None,), (None,)], "k bigint")
    parent = spark.createDataFrame([(1,)], "p bigint")
    r = inclusion_profile([("empty", child, "k", parent, "p")]).first()
    assert r.lhs_card == 0 and r.contained == 0
    assert r.containment_r is None
    assert r.is_fk_candidate == 0


def test_binned_mi_detects_dependence_and_independence(spark):
    import math

    from gpi_etl_spark.operators.featselect import binned_mi

    # y == x: perfect dependence; 4 exact bins over 0..99 -> MI = ln 4
    rows = [(v, v) for v in range(100)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    dep = binned_mi(df, "x", "y", 4)
    total = sum(r.mi_term_r for r in dep.collect())
    assert abs(total - math.log(4)) < 1e-4
    # diagonal cells only
    assert all(r.bx == r.by for r in dep.collect())
    # y independent of x (cartesian-balanced): every term ~0
    rows = [(x, y) for x in range(20) for y in range(20)]
    ind = binned_mi(
        spark.createDataFrame(rows, "x bigint, y bigint"), "x", "y", 4
    )
    assert all(abs(r.mi_term_r) < 1e-9 for r in ind.collect())


def test_binned_mi_marginals_consistency(spark):
    from gpi_etl_spark.operators.featselect import binned_mi

    rows = [(i % 7, (i * 13) % 11) for i in range(500)]
    out = binned_mi(
        spark.createDataFrame(rows, "x bigint, y bigint"), "x", "y", 3
    ).collect()
    n = out[0].n
    assert sum(r.n_ij for r in out) == n == 500
    # per-bx marginal equals the sum of its cells
    from collections import defaultdict

    by_bx = defaultdict(int)
    for r in out:
        by_bx[r.bx] += r.n_ij
    assert all(by_bx[r.bx] == r.n_i for r in out)


def test_contingency_profile_exact_dev_and_chi2(spark):
    """Hand-checked 2x2: rows (a,p)=30 (a,q)=10 (b,p)=10 (b,q)=30;
    n=80, n_a=n_b=40, n_p=n_q=40 -> dev = 30*80-40*40 = 800 for the
    diagonal, -800 off it; chi2 term = 800^2/(80*40*40) = 5.0 each,
    chi2 = 20."""
    from gpi_etl_spark.operators.featselect import contingency_profile

    rows = (
        [("a", "p")] * 30 + [("a", "q")] * 10
        + [("b", "p")] * 10 + [("b", "q")] * 30
    )
    out = {
        (r.x, r.y): r
        for r in contingency_profile(
            spark.createDataFrame(rows, "x string, y string"), "x", "y"
        ).collect()
    }
    assert out[("a", "p")].dev == 800 and out[("a", "q")].dev == -800
    assert abs(out[("a", "p")].chi2_term_r - 5.0) < 1e-9
    assert abs(sum(r.chi2_term_r for r in out.values()) - 20.0) < 1e-9
    # independence -> dev exactly 0 everywhere
    ind = [("a", "p")] * 6 + [("a", "q")] * 2 + [("b", "p")] * 3 + [
        ("b", "q")
    ] * 1
    z = contingency_profile(
        spark.createDataFrame(ind, "x string, y string"), "x", "y"
    ).collect()
    assert all(r.dev == 0 for r in z)


def test_binned_mi_drops_null_pairs_consistently(spark):
    """Round-11 advice find: NULL x/y used to count in the
    bin-boundary histograms (shifting every cumulative boundary)
    while the equi-join back silently dropped them — so cells/n
    disagreed with the boundaries. Now NULL pairs are dropped up
    front: the result over data-with-NULLs must equal the result
    over the pre-filtered data, boundary-for-boundary."""
    from gpi_etl_spark.operators.featselect import binned_mi

    clean = [(float(v), float(v)) for v in range(100)]
    noisy = clean + [(None, 5.0), (3.0, None), (None, None)] * 30
    key = lambda r: (r.bx, r.by)  # noqa: E731
    got = sorted(
        binned_mi(
            spark.createDataFrame(noisy, "x double, y double"),
            "x", "y", 4,
        ).collect(),
        key=key,
    )
    want = sorted(
        binned_mi(
            spark.createDataFrame(clean, "x double, y double"),
            "x", "y", 4,
        ).collect(),
        key=key,
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got[0].n == 100  # NULL pairs are not in n
