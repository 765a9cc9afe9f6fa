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


def test_pmi_hand_computed(spark):
    import math

    from gpi_etl_spark.operators.cooccur import pmi_pairs

    # 4 baskets; x and y always together (attract), x and z never
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "z"), (3, "w"),
        (4, "z"), (4, "y"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r.item_a, r.item_b): r
        for r in pmi_pairs(df, "basket", "item", min_pair_count=1).collect()
    }
    xy = got[("x", "y")]
    assert (xy.n_ab, xy.n_a, xy.n_b) == (2, 2, 3)
    assert xy.pmi_r == round(math.log((2 * 4) / (2 * 3)), 6)
    assert ("x", "z") not in got  # never co-occur
    wz = got[("w", "z")]
    assert wz.pmi_r == round(math.log((1 * 4) / (1 * 2)), 6)


def test_pmi_min_pair_count_filters(spark):
    from gpi_etl_spark.operators.cooccur import pmi_pairs

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r.item_a, r.item_b)
        for r in pmi_pairs(df, "basket", "item", min_pair_count=2).collect()
    }
    assert got == {("a", "b")}
