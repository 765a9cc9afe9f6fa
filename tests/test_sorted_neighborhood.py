"""global_rank: dense 1..n ranks matching a driver-side sort, stable
under skewed/small partition counts. sorted_neighborhood_pairs: exact
window semantics vs a brute-force reference."""

from __future__ import annotations


def test_global_rank_matches_sorted_order(spark):
    from gpi_etl_spark.operators.windows import global_rank

    rows = [(i, f"k{i % 7:02d}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, key string").repartition(11)
    got = {
        r.id: r.rank
        for r in global_rank(df, ["key", "id"]).collect()
    }
    want = {
        rid: i + 1
        for i, (rid, _) in enumerate(
            sorted(rows, key=lambda t: (t[1], t[0]))
        )
    }
    assert got == want


def test_global_rank_single_and_many_partitions_agree(spark):
    from gpi_etl_spark.operators.windows import global_rank

    rows = [(i, (i * 37) % 50) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, v long")
    one = {
        r.id: r.rank
        for r in global_rank(df, ["v", "id"], num_partitions=1).collect()
    }
    many = {
        r.id: r.rank
        for r in global_rank(df, ["v", "id"], num_partitions=13).collect()
    }
    assert one == many
    assert sorted(one.values()) == list(range(1, 121))


def test_sorted_neighborhood_window_semantics(spark):
    from gpi_etl_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [(i, f"n{(i * 13) % 10}{i:03d}") for i in range(40)]
    df = spark.createDataFrame(rows, "rid long, name string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, ["name", "rid"], "rid", window=3, payload_cols=("name",)
        ).collect()
    }
    order = [rid for rid, _ in sorted(rows, key=lambda t: (t[1], t[0]))]
    want = {
        (order[i], order[i + j])
        for i in range(len(order))
        for j in (1, 2)
        if i + j < len(order)
    }
    assert got == want


def test_degenerate_window_raises(spark):
    import pytest

    from gpi_etl_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame([(1, "a")], "rid long, name string")
    for w in (0, 1):
        with pytest.raises(ValueError, match="window must be >= 2"):
            sorted_neighborhood_pairs(df, ["name", "rid"], "rid", window=w)
