"""Basket-local co-occurrence pair counting (operators/cooccur.py)."""

from gpi_etl_spark.operators.cooccur import cooccurrence_pairs


def test_pairs_hand_computed(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"),            # singleton: no pairs
        (4, "b"), (4, "b"),  # duplicate item dedups -> singleton
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r.item_a, r.item_b): r.n_baskets
        for r in cooccurrence_pairs(df, "basket", "item").collect()
    }
    assert got == {
        ("a", "b"): 2,
        ("a", "c"): 1,
        ("b", "c"): 1,
    }


def test_pairs_ordered_and_deduped_within_basket(spark):
    rows = [(1, x) for x in ["z", "y", "z", "x", "y"]]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = sorted(
        (r.item_a, r.item_b)
        for r in cooccurrence_pairs(df, "basket", "item").collect()
    )
    # distinct items {x,y,z}: every pair once, always a < b
    assert got == [("x", "y"), ("x", "z"), ("y", "z")]


def test_pairs_empty_input(spark):
    df = spark.createDataFrame([], "basket long, item string")
    assert cooccurrence_pairs(df, "basket", "item").count() == 0
