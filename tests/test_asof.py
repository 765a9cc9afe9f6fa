"""As-of join: union+ffill plan vs pandas merge_asof ground truth."""

import datetime as dt
import random

import pandas as pd

from gpi_etl_spark.operators.asof import asof_join_pandas, asof_join_union


def _frames(seed=11, n_left=60, n_right=40):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    left = pd.DataFrame(
        {
            "k": [rng.choice(["a", "b"]) for _ in range(n_left)],
            "ts": [base + dt.timedelta(seconds=rng.randrange(100000)) for _ in range(n_left)],
            "lv": [float(i) for i in range(n_left)],
        }
    )
    right = pd.DataFrame(
        {
            "k": [rng.choice(["a", "b"]) for _ in range(n_right)],
            "ts": [base + dt.timedelta(seconds=rng.randrange(100000)) for _ in range(n_right)],
            "rv": [float(100 + i) for i in range(n_right)],
        }
    )
    return left, right


def _expected(left, right):
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"rv": "asof_rv"}),
        on="ts",
        by="k",
    )
    return {(r.k, r.ts): (None if pd.isna(r.asof_rv) else r.asof_rv) for r in exp.itertuples()}


def test_union_plan_matches_merge_asof(spark):
    left, right = _frames()
    out = asof_join_union(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="ts", by=["k"], value_cols=["rv"],
    )
    got = {(r.k, r.ts): r.asof_rv for r in out.collect()}
    assert got == _expected(left, right)


def test_pandas_plan_matches_merge_asof(spark):
    left, right = _frames(seed=13)
    out = asof_join_pandas(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="ts", by=["k"], value_cols=["rv"],
    )
    got = {(r.k, r.ts): r.asof_rv for r in out.collect()}
    assert got == _expected(left, right)


def test_asof_pandas_unmatched_integer_value_is_null(spark):
    """merge_asof yields NaN for unmatched rows; an int-typed value col
    must surface as NULL, not crash Arrow or cast garbage."""
    import datetime as dt

    from gpi_etl_spark.operators.asof import asof_join_pandas

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("A", base), ("A", base + dt.timedelta(hours=2))],
        "sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", base + dt.timedelta(hours=1), 42)],
        "sym string, ts timestamp, qty long",
    )
    got = {r.ts: r.asof_qty for r in asof_join_pandas(
        left, right, on="ts", by=["sym"], value_cols=["qty"]).collect()}
    assert got[base] is None                       # before any right row
    assert got[base + dt.timedelta(hours=2)] == 42
