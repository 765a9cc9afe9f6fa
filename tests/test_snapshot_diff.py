"""snapshot_diff classification, NULL semantics, and column counts."""

from __future__ import annotations

import pytest


def _diff(spark, old_rows, new_rows):
    from gpi_etl_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(old_rows, "k bigint, a string, b int")
    new = spark.createDataFrame(new_rows, "k bigint, a string, b int")
    out = snapshot_diff(old, new, ["k"])
    return {
        r.status: (r.n_keys, dict(r.col_changes))
        for r in out.collect()
    }


def test_four_classes_and_column_counts(spark):
    old = [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, "w", 40)]
    new = [(1, "x", 10),          # unchanged
           (2, "Y", 20),          # changed: a
           (3, "Z", 31),          # changed: a AND b
           (5, "n", 50)]          # added; 4 removed
    got = _diff(spark, old, new)
    assert got["unchanged"][0] == 1
    assert got["added"][0] == 1
    assert got["removed"][0] == 1
    assert got["changed"] == (2, {"a": 2, "b": 1})
    # added/removed rows contribute nothing to column counts
    assert got["added"][1] == {"a": 0, "b": 0}
    assert got["removed"][1] == {"a": 0, "b": 0}


def test_null_semantics_are_null_safe(spark):
    old = [(1, None, 1), (2, "x", None), (3, None, 7)]
    new = [(1, None, 1),            # NULL == NULL: unchanged
           (2, None, None),         # x -> NULL counts for a; b NULL==NULL
           (3, "v", None)]          # NULL -> v counts for a; 7 -> NULL for b
    got = _diff(spark, old, new)
    assert got["unchanged"][0] == 1
    assert got["changed"] == (2, {"a": 2, "b": 1})


def test_missing_compare_column_raises(spark):
    from gpi_etl_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, "x")], "k bigint, a string")
    new = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="schema drift"):
        snapshot_diff(old, new, ["k"], compare_cols=["a"])
    # default compare set = shared non-key columns -> empty here, so
    # only membership classes can appear
    got = {
        r.status: r.n_keys
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {"unchanged": 1}


def test_column_affinity_identical_and_disjoint(spark):
    from gpi_etl_spark.operators.quality import column_affinity

    a = spark.createDataFrame([(str(i),) for i in range(300)],
                              "v string")
    b = spark.createDataFrame([(str(i),) for i in range(300)],
                              "w string")
    c = spark.createDataFrame([(f"z{i}",) for i in range(300)],
                              "u string")
    out = {
        (r.key_a, r.key_b): r
        for r in column_affinity(
            [("A", a, "v"), ("B", b, "w"), ("C", c, "u")],
            k=64, hash_mode="poly",
        ).collect()
    }
    same = out[("A", "B")]
    assert same.n_match == 64 and abs(same.jaccard_e - 1.0) < 1e-9
    disj = out[("A", "C")]
    assert disj.jaccard_e <= 0.1
