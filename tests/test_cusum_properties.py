"""Property-based checks (hypothesis) for the round-8 sequential
drift operator: cusum_counts' windowed closed form must equal the
textbook recursion for ARBITRARY small integer series and parameter
choices — not just the planted-shift fixtures the unit tests chose —
and the statistic must be invariant to the input DataFrame's row
order/partitioning (the property the closed form exists to provide).
Small example counts on purpose: each case drives a real Spark
session.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    xs=st.lists(st.integers(0, 1000), min_size=2, max_size=24),
    train_days=st.integers(1, 6),
    slack=st.tuples(st.integers(0, 3), st.integers(1, 20)),
    h_mult=st.integers(1, 8),
)
@settings(max_examples=15, deadline=None)
def test_cusum_closed_form_equals_recursion(
    spark, xs, train_days, slack, h_mult
):
    from gpi_etl_spark.operators.drift import cusum_counts

    slack_num, slack_den = slack
    train_days = min(train_days, len(xs))
    rows = [("g", d, x) for d, x in enumerate(xs)]
    # reversed input order + scattered partitions: the windows must
    # re-sort, so the answer cannot depend on arrival order
    df = spark.createDataFrame(
        list(reversed(rows)), "g string, day long, x long"
    ).repartition(3)
    got = {
        r.day: (r.cusum_s, r.h_s, r.alarm)
        for r in cusum_counts(
            df, group_col="g", day_col="day", x_col="x",
            train_days=train_days, slack_num=slack_num,
            slack_den=slack_den, h_mult=h_mult,
        ).collect()
    }
    assert len(got) == len(xs)
    p = sum(xs[:train_days])
    c = 0
    for d, x in enumerate(xs):
        c = max(0, c + slack_den * train_days * x - (slack_den + slack_num) * p)
        assert got[d][0] == c
        assert got[d][1] == h_mult * slack_den * p
        assert got[d][2] == (c > h_mult * slack_den * p)
