"""Golden-record survivorship: per-field merge rules are total
(tie-free), NULL-disciplined, and order-independent."""

from __future__ import annotations

import datetime as dt

import pytest


def _golden(spark, rows):
    from gpi_etl_spark.operators.entities import survivorship

    df = spark.createDataFrame(
        rows, "cid string, ts timestamp, status string, amount bigint"
    )
    out = survivorship(
        df,
        "cid",
        {
            "latest_status": ("latest", "ts", "status"),
            "longest_status": ("longest", "status"),
            "mode_status": ("mode", "status"),
            "max_amount": ("max", "amount"),
        },
    )
    return {r.cid: r for r in out.collect()}


T = lambda d: dt.datetime(2024, 1, d)  # noqa: E731


def test_rules_pick_expected_winners(spark):
    rows = [
        ("a", T(1), "new", 10),
        ("a", T(3), "shipped", 30),
        ("a", T(2), "cancelled", 99),
        ("a", T(2), "cancelled", 5),
    ]
    g = _golden(spark, rows)["a"]
    assert g.latest_status == "shipped"          # greatest ts
    assert g.longest_status == "cancelled"       # 9 chars
    assert g.mode_status == "cancelled"          # 2 of 4
    assert g.max_amount == 99
    assert g.n_records == 4


def test_null_never_wins_and_all_null_is_null(spark):
    rows = [
        ("a", T(5), None, None),    # newest row has NULL status
        ("a", T(1), "old", 7),
        ("b", T(1), None, None),    # cluster with nothing usable
    ]
    g = _golden(spark, rows)
    assert g["a"].latest_status == "old"
    assert g["a"].max_amount == 7
    assert g["b"].latest_status is None
    assert g["b"].mode_status is None
    assert g["b"].n_records == 1


def test_ties_break_deterministically(spark):
    """Same timestamp → greatest value wins 'latest'; equal counts →
    SMALLEST value wins 'mode' (the documented runoff)."""
    rows = [
        ("a", T(2), "alpha", 1),
        ("a", T(2), "beta", 1),
        ("a", T(1), "beta", 1),
        ("a", T(1), "alpha", 1),
    ]
    g = _golden(spark, rows)["a"]
    assert g.latest_status == "beta"   # ts tie → max value
    assert g.mode_status == "alpha"    # 2 == 2 → min value


def test_order_independence(spark):
    rows = [
        ("a", T(1), "x", 1),
        ("a", T(2), "yy", 2),
        ("a", T(3), "z", 3),
    ]
    fwd = _golden(spark, rows)["a"]
    rev = _golden(spark, rows[::-1])["a"]
    assert fwd == rev


def test_unknown_rule_raises(spark):
    from gpi_etl_spark.operators.entities import survivorship

    df = spark.createDataFrame([("a", 1)], "cid string, v int")
    with pytest.raises(ValueError, match="unknown survivorship rule"):
        survivorship(df, "cid", {"v": ("median",)})
