"""Two-phase exact heavy hitters: MG candidate superset guarantee and
exact final counts."""

from __future__ import annotations

from collections import Counter


def test_exact_counts_above_threshold(spark):
    from gpi_etl_spark.operators.heavyhitters import heavy_hitters

    # 1000 items: 'a' x400, 'b' x250, 'c' x100, long tail of singletons
    data = ["a"] * 400 + ["b"] * 250 + ["c"] * 100 + [
        f"t{i}" for i in range(250)
    ]
    df = spark.createDataFrame([(v,) for v in data], "item string")
    got = {r.item: r.n for r in heavy_hitters(df, "item", k=8).collect()}
    want = {
        v: c for v, c in Counter(data).items() if c * 8 >= len(data)
    }
    assert got == want == {"a": 400, "b": 250}


def test_superset_never_misses_under_adversarial_partitioning(spark):
    """Heavy items must survive the per-partition MG pass regardless
    of how rows are distributed — repartition to many small partitions
    and compare against the brute-force answer."""
    from gpi_etl_spark.operators.heavyhitters import heavy_hitters

    data = (["x"] * 120 + ["y"] * 80 + [f"z{i % 97}" for i in range(600)])
    df = spark.createDataFrame(
        [(v,) for v in data], "item string"
    ).repartition(16)
    got = {r.item: r.n for r in heavy_hitters(df, "item", k=10).collect()}
    want = {
        v: c
        for v, c in Counter(data).items()
        if c * 10 >= len(data)
    }
    assert got == want


def test_empty_input(spark):
    from gpi_etl_spark.operators.heavyhitters import heavy_hitters

    df = spark.createDataFrame([], "item string")
    assert heavy_hitters(df, "item", k=5).collect() == []


def test_non_string_items(spark):
    """The MG pass must mirror the INPUT item type — long user ids
    are the module's own advertised use case (round-5 review find:
    the schema was hardcoded to string and crashed on bigint)."""
    from gpi_etl_spark.operators.heavyhitters import heavy_hitters

    data = [7] * 50 + [9] * 30 + list(range(100, 140))
    df = spark.createDataFrame([(v,) for v in data], "user_id long")
    got = {r.user_id: r.n for r in heavy_hitters(df, "user_id", k=6).collect()}
    assert got == {7: 50, 9: 30}
