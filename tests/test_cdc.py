"""CDC merge: last-writer-wins upsert/delete application."""

from __future__ import annotations


def test_cdc_merge_basic(spark):
    from gpi_etl_spark.operators.cdc import cdc_merge

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "U", 5),    # update key 2
            (3, None, None, "D", 5),    # delete key 3
            (4, "d", 40.0, "I", 5),     # insert key 4
        ],
        "k long, s string, v double, op string, seq long",
    )
    got = {
        r.k: (r.s, r.v)
        for r in cdc_merge(snap, changes, ["k"]).collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 4: ("d", 40.0)}


def test_cdc_merge_last_writer_wins(spark):
    from gpi_etl_spark.operators.cdc import cdc_merge

    snap = spark.createDataFrame([(1, 10.0)], "k long, v double")
    changes = spark.createDataFrame(
        [
            (1, 11.0, "U", 1),
            (1, 12.0, "U", 3),   # highest seq wins
            (1, 99.0, "U", 2),
        ],
        "k long, v double, op string, seq long",
    )
    got = cdc_merge(snap, changes, ["k"]).collect()
    assert len(got) == 1 and got[0].v == 12.0


def test_cdc_merge_delete_then_reinsert_ordering(spark):
    """A delete at seq 2 followed by an insert at seq 3 leaves the key
    present; the reverse order removes it. Same-seq D vs U resolves to
    the delete (deterministic tie-break)."""
    from gpi_etl_spark.operators.cdc import cdc_merge

    snap = spark.createDataFrame([(9, 1.0)], "k long, v double")
    reinsert = spark.createDataFrame(
        [(1, None, "D", 2), (1, 5.0, "I", 3)],
        "k long, v double, op string, seq long",
    )
    got = {r.k: r.v for r in cdc_merge(snap, reinsert, ["k"]).collect()}
    assert got == {9: 1.0, 1: 5.0}

    tie = spark.createDataFrame(
        [(9, 7.0, "U", 4), (9, None, "D", 4)],
        "k long, v double, op string, seq long",
    )
    assert cdc_merge(snap, tie, ["k"]).collect() == []


def test_cdc_merge_idempotent_replay(spark):
    """Replaying the same log over the merged result is a no-op —
    the property that makes retries safe."""
    from gpi_etl_spark.operators.cdc import cdc_merge

    snap = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k long, v double"
    )
    log = spark.createDataFrame(
        [(1, 9.0, "U", 1), (2, None, "D", 1), (5, 5.0, "I", 2)],
        "k long, v double, op string, seq long",
    )
    once = cdc_merge(snap, log, ["k"])
    twice = cdc_merge(once, log, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_cdc_merge_matches_python_mirror_property(spark):
    """Randomized logs vs a from-first-principles dict replay —
    derandomized hypothesis profile (conftest) keeps draws stable."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from gpi_etl_spark.operators.cdc import cdc_merge

    @given(
        snap=st.dictionaries(
            st.integers(0, 12), st.integers(0, 99), max_size=8
        ),
        log=st.lists(
            st.tuples(
                st.integers(0, 12),                  # key
                st.integers(0, 99),                  # value
                st.sampled_from(["I", "U", "D"]),    # op
                st.integers(1, 5),                   # seq
            ),
            max_size=12,
        ),
    )
    @settings(max_examples=10, deadline=None)
    def check(snap, log):
        sdf = spark.createDataFrame(
            [(k, v) for k, v in snap.items()] or
            spark.sparkContext.emptyRDD(),
            "k long, v long",
        ) if snap else spark.createDataFrame([], "k long, v long")
        ldf = spark.createDataFrame(
            log, "k long, v long, op string, seq long"
        ) if log else spark.createDataFrame(
            [], "k long, v long, op string, seq long"
        )
        got = {r.k: r.v for r in cdc_merge(sdf, ldf, ["k"]).collect()}
        # mirror: per key keep the max-seq change; at equal seq 'D'
        # wins ('D' < 'I' < 'U'), and a same-op tie falls to the
        # smallest value — the operator's full deterministic ordering
        # (seq desc, op asc, remaining-column struct asc)
        best: dict = {}
        for k, v, op, seq in log:
            cur = best.get(k)
            best[k] = min(
                [x for x in [cur, (seq, op, v)] if x is not None],
                key=lambda t: (-t[0], t[1], t[2]),
            )
        want = dict(snap)
        for k, (seq, op, v) in best.items():
            if op == "D":
                want.pop(k, None)
            else:
                want[k] = v
        assert got == want

    check()


def test_cdc_merge_same_seq_same_op_deterministic(spark):
    """Two changes with identical (key, seq, op) must resolve to the
    same winner on every run — the smallest remaining-column struct
    (round-5 review find: the window tie was partition-order
    dependent)."""
    from gpi_etl_spark.operators.cdc import cdc_merge

    snap = spark.createDataFrame([], "k long, v double")
    for _ in range(3):
        tie = spark.createDataFrame(
            [(1, 7.0, "U", 2), (1, 5.0, "U", 2)],
            "k long, v double, op string, seq long",
        ).repartition(4)
        got = cdc_merge(snap, tie, ["k"]).collect()
        assert len(got) == 1 and got[0].v == 5.0


def test_join_view_delta_law_inserts_and_retractions(spark):
    """The bilinear rule: appending the delta to the old view and
    consolidating must reproduce the re-joined new tables exactly —
    inserts, retractions, and the delta-x-delta corner all at once."""
    from gpi_etl_spark.operators.cdc import (
        consolidate_view,
        join_view_delta,
    )

    a_old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "ak int, av string"
    )
    da = spark.createDataFrame(
        [(4, "w", 1), (2, "y", -1)], "ak int, av string, sign int"
    )
    b_old = spark.createDataFrame(
        [(1, "p"), (2, "q"), (4, "r")], "bk int, bv string"
    )
    db = spark.createDataFrame(
        [(1, "p2", 1), (4, "r2", 1)], "bk int, bv string, sign int"
    )
    delta = join_view_delta(a_old, da, b_old, db, "ak", "bk")
    old_view = a_old.join(
        b_old, a_old["ak"] == b_old["bk"], "inner"
    ).withColumn("sign", __import__("pyspark").sql.functions.lit(1))
    lhs = consolidate_view(old_view.unionByName(delta))
    import pyspark.sql.functions as F

    a_new = consolidate_view(
        a_old.withColumn("sign", F.lit(1)).unionByName(da)
    ).drop("mult")
    b_new = consolidate_view(
        b_old.withColumn("sign", F.lit(1)).unionByName(db)
    ).drop("mult")
    rhs = (
        a_new.join(b_new, a_new["ak"] == b_new["bk"], "inner")
        .groupBy("ak", "av", "bk", "bv")
        .agg(F.count(F.lit(1)).cast("int").alias("mult"))
    )
    assert sorted(map(tuple, lhs.collect())) == sorted(
        map(tuple, rhs.collect())
    )
    # the retracted (2,y)x(2,q) pair is gone; the dAxdB corner
    # (4,w)x(4,r2) is present exactly once
    keys = {(r.ak, r.av, r.bv) for r in lhs.collect()}
    assert (2, "y", "q") not in keys
    assert (4, "w", "r2") in keys and (4, "w", "r") in keys


def test_consolidate_view_keeps_negative_mult_visible(spark):
    """A retraction with no matching base row must stay visible as a
    negative multiplicity (inconsistent delta stream), never be
    silently clamped."""
    from gpi_etl_spark.operators.cdc import consolidate_view

    rows = spark.createDataFrame(
        [("a", 1), ("a", -1), ("ghost", -1)], "v string, sign int"
    )
    got = {r.v: r.mult for r in consolidate_view(rows).collect()}
    assert got == {"ghost": -1}
