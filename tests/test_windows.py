"""Window kit: ffill, run flags, sessionize, top-k, run compression."""

from pyspark.sql import functions as F

from gpi_etl_spark.operators.windows import (
    compress_runs,
    interval_concurrency,
    forward_fill,
    run_change_flag,
    sessionize,
    top_k_per_group,
)


def test_forward_fill(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b"), (5, None)], "i long, v string"
    )
    out = [r.v for r in forward_fill(df, "v", ["i"]).orderBy("i").collect()]
    assert out == ["a", "a", "a", "b", "b"]


def test_forward_fill_partitioned(spark):
    df = spark.createDataFrame(
        [("x", 1, "a"), ("x", 2, None), ("y", 1, None)], "p string, i long, v string"
    )
    out = {(r.p, r.i): r.v for r in forward_fill(df, "v", ["i"], ["p"]).collect()}
    assert out == {("x", 1): "a", ("x", 2): "a", ("y", 1): None}


def test_run_change_flag_matches_reference_orden(spark):
    """geoant-state semantics: 1 on run start, 2 on repeat
    (HTGPIWASDE/__init__.py:595-599)."""
    df = spark.createDataFrame(
        [(1, "US"), (2, "US"), (3, "BR"), (4, "US"), (5, "US")], "i long, geo string"
    )
    out = [r.orden for r in run_change_flag(df, "geo", ["i"]).orderBy("i").collect()]
    assert out == [1, 2, 1, 1, 2]


def test_sessionize_gap(spark):
    rows = [(1, 0), (1, 100), (1, 2000), (2, 0)]  # user, epoch-sec
    df = spark.createDataFrame(rows, "u long, sec long").withColumn(
        "ts", F.timestamp_seconds("sec")
    )
    out = {(r.u, r.sec): r.session_id for r in sessionize(df, "u", "ts", 1800).collect()}
    assert out == {(1, 0): 1, (1, 100): 1, (1, 2000): 2, (2, 0): 1}


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(10)], "g string, i long, v double"
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], 3).collect()
    assert sorted(r.i for r in out) == [7, 8, 9]
    assert sorted(r.row_index for r in out) == [1, 2, 3]


def test_compress_runs(spark):
    """Gaps-and-islands ranges (get_expiration_symbols_ranges,
    HTGPIPROPHEDEX/__init__.py:174-194)."""
    df = spark.createDataFrame(
        [(1, "H25"), (2, "H25"), (3, "K25"), (4, "H25")], "day long, sym string"
    )
    out = {(r.sym, r.run_start, r.run_end) for r in compress_runs(df, "sym", "day").collect()}
    assert out == {("H25", 1, 2), ("K25", 3, 3), ("H25", 4, 4)}


def test_compress_runs_null_values_stay_one_run(spark):
    from gpi_etl_spark.operators.windows import compress_runs

    df = spark.createDataFrame(
        [(1, "A"), (2, None), (3, None), (4, "A")], "ord int, sym string"
    )
    runs = compress_runs(df, "sym", "ord").orderBy("run_start").collect()
    assert len(runs) == 3  # A | NULL,NULL | A — NULLs compress together


def test_linear_interpolate_hand_computed(spark):
    from gpi_etl_spark.operators.windows import linear_interpolate

    rows = [
        ("a", 0, 10.0), ("a", 1, None), ("a", 2, None), ("a", 3, 40.0),
        ("a", 10, None),            # trailing gap: stays NULL
        ("b", 0, None), ("b", 1, 5.0),  # leading gap: stays NULL
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = {
        (r.k, r.i): r.v
        for r in linear_interpolate(df, "i", "v", ("k",)).collect()
    }
    assert got[("a", 1)] == 20.0 and got[("a", 2)] == 30.0
    assert got[("a", 0)] == 10.0 and got[("a", 3)] == 40.0
    assert got[("a", 10)] is None
    assert got[("b", 0)] is None and got[("b", 1)] == 5.0


def test_linear_interpolate_uneven_spacing(spark):
    """The weight is the ORDER-distance ratio, not the row index: a
    gap at i=1 between anchors i=0 and i=4 fills at 1/4 of the rise."""
    from gpi_etl_spark.operators.windows import linear_interpolate

    df = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 1, None), ("a", 4, 8.0)],
        "k string, i long, v double",
    )
    got = {r.i: r.v for r in linear_interpolate(df, "i", "v", ("k",)).collect()}
    assert got[1] == 2.0


def test_linear_interpolate_matches_numpy_property(spark):
    """Random gap patterns vs numpy.interp on the interior points —
    derandomized hypothesis (conftest profile)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gpi_etl_spark.operators.windows import linear_interpolate

    @given(
        vals=st.lists(
            st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False),
            min_size=2, max_size=15,
        ),
        mask=st.lists(st.booleans(), min_size=2, max_size=15),
    )
    @settings(max_examples=10, deadline=None)
    def check(vals, mask):
        n = min(len(vals), len(mask))
        rows = [
            ("g", i, float(vals[i]) if not mask[i] else None)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "k string, i long, v double")
        got = {
            r.i: r.v
            for r in linear_interpolate(df, "i", "v", ("k",)).collect()
        }
        known = [i for i in range(n) if not mask[i]]
        if not known:
            assert all(v is None for v in got.values())
            return
        lo, hi = known[0], known[-1]
        xp = np.array(known, dtype=float)
        fp = np.array([vals[i] for i in known], dtype=float)
        for i in range(n):
            if i < lo or i > hi:
                if i not in known:
                    assert got[i] is None
                continue
            want = float(np.interp(i, xp, fp))
            assert got[i] is not None
            assert abs(got[i] - want) < 1e-6 + 1e-9 * abs(want)

    check()


_DAY = 86_400_000_000


def _iv(spark, rows):
    return spark.createDataFrame(rows, "s_us long, e_us long")


def test_interval_concurrency_basic_overlap(spark):
    # three intervals on day 0: two overlap, the third is disjoint
    out = {
        r.day_idx: (r.n_intervals, r.max_concurrency)
        for r in interval_concurrency(
            _iv(spark, [(100, 500), (300, 700), (800, 900)])
        ).collect()
    }
    assert out == {0: (3, 2)}


def test_interval_concurrency_half_open_touching(spark):
    # [100,300) and [300,500) touch but never overlap
    out = interval_concurrency(
        _iv(spark, [(100, 300), (300, 500)])
    ).collect()
    assert out[0].max_concurrency == 1


def test_interval_concurrency_midnight_straddle(spark):
    # one interval spans days 0-2: open at both midnights; a second
    # interval on day 1 pushes that day's peak to 2
    rows = [(_DAY - 100, 2 * _DAY + 100), (_DAY + 50, _DAY + 60)]
    out = {
        r.day_idx: (r.n_intervals, r.max_concurrency)
        for r in interval_concurrency(_iv(spark, rows)).collect()
    }
    assert out == {0: (1, 1), 1: (2, 2), 2: (1, 1)}


def test_interval_concurrency_matches_brute_force(spark):
    import itertools
    import random

    rng = random.Random(7)
    rows = []
    for _ in range(60):
        s = rng.randrange(0, 3 * _DAY)
        rows.append((s, s + rng.randrange(1, _DAY)))
    got = {
        r.day_idx: (r.n_intervals, r.max_concurrency)
        for r in interval_concurrency(
            _iv(spark, rows).repartition(7)
        ).collect()
    }
    # brute force: evaluate concurrency at every boundary instant
    boundaries = sorted({t for s, e in rows for t in (s, e)})
    want = {}
    for s, e in rows:
        for d in range((s) // _DAY, (e - 1) // _DAY + 1):
            n, _ = want.get(d, (0, 0))
            want[d] = (n + 1, 0)
    for t in boundaries:
        c = sum(1 for s, e in rows if s <= t < e)
        d = t // _DAY
        if d in want:
            n, m = want[d]
            want[d] = (n, max(m, c))
    # a day's peak can also come from an interval open at midnight
    for d in want:
        c = sum(1 for s, e in rows if s <= d * _DAY < e)
        n, m = want[d]
        want[d] = (n, max(m, c))
    assert got == want
