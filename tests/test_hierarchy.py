"""Pointer-doubling hierarchy closure (operators/hierarchy.py)."""

from gpi_etl_spark.operators.hierarchy import transitive_root


def run(spark, rows):
    df = spark.createDataFrame(rows, "node long, parent long")
    return {
        r.node: (r.root, r.depth)
        for r in transitive_root(df).collect()
    }


def test_single_chain(spark):
    # 0 <- 1 <- 2 <- 3 <- 4: depth equals position
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 5)]
    got = run(spark, rows)
    assert got == {i: (0, i) for i in range(5)}


def test_forest_two_roots(spark):
    rows = [
        (10, None), (11, 10), (12, 10), (13, 11),
        (20, None), (21, 20),
    ]
    got = run(spark, rows)
    assert got[10] == (10, 0)
    assert got[13] == (10, 2)
    assert got[12] == (10, 1)
    assert got[20] == (20, 0)
    assert got[21] == (20, 1)


def test_deep_chain_logarithmic_iterations(spark):
    # depth 33 must converge well under the 50-iteration cycle cap —
    # pointer doubling needs only ceil(log2(33)) = 6 self-joins
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 34)]
    got = run(spark, rows)
    assert got[33] == (0, 33)
    assert got[17] == (0, 17)


def test_single_root_only(spark):
    got = run(spark, [(7, None)])
    assert got == {7: (7, 0)}


def test_dangling_parent_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, 99), (2, 1)], "node long, parent long"  # 99 has no row
    )
    with pytest.raises(ValueError, match="dangling"):
        transitive_root(df)


def test_cycle_raises(spark):
    """A parent-pointer cycle must fail loudly, not return a partial,
    wrong (node, root, depth) table after exhausting max_iters."""
    import pytest

    from gpi_etl_spark.operators.hierarchy import transitive_root

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, None)], "id long, parent long"
    )
    with pytest.raises(ValueError, match="cycle"):
        transitive_root(df, id_col="id", parent_col="parent", max_iters=6)
