"""Change-data-capture merge: apply a keyed insert/update/delete log
to a base snapshot with last-writer-wins ordering — the MERGE INTO
shape every warehouse sync runs (the reference's DELETE + re-insert
watermark cycle in ``HTGPIPROPHEDEX/__init__.py`` is the special case
where the whole partition is the "change").

100 TB design: one window over the CHANGE LOG (shuffle ∝ log rows —
the log is orders of magnitude smaller than the snapshot), then one
hash anti-join against the snapshot on the key. The snapshot is never
sorted, never windowed, and touched by exactly one shuffle; with both
sides bucketed by the key the merge is shuffle-free on the snapshot
side entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def cdc_merge(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply ``changes`` (rows = snapshot schema + ``op`` in
    ``{'I','U','D'}`` + ``seq_col``) to ``snapshot``:

    * per key, only the HIGHEST ``seq_col`` change wins (row_number
      over a per-key window — late-arriving older changes are inert,
      which makes the merge idempotent under replay);
    * winning ``D`` removes the key; winning ``I``/``U`` upserts the
      change row's values;
    * snapshot keys without any change pass through untouched.

    ``seq_col`` ties are broken by preferring ``D`` (a delete and an
    upsert carrying the same sequence number resolve to the delete —
    deterministic, and the safe direction for retention pipelines);
    a residual tie (same key, same seq, same op) falls through to the
    smallest remaining-column struct, so the merge result is a pure
    function of the change SET — never of partition or arrival order,
    which the idempotent-replay guarantee depends on. (Caveat: that
    last tie-break requires the value columns to be orderable — no
    map columns; give such logs an explicit change-id ordering.)

    Returns the merged table with the snapshot's columns.
    """
    out_cols = snapshot.columns
    rest = [
        c for c in changes.columns if c not in {*key_cols, seq_col, op_col}
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(),
        F.col(op_col).asc(),  # 'D' < 'I' < 'U'
        *([F.struct(*rest).asc()] if rest else []),
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    untouched = snapshot.join(
        latest.select(*key_cols), key_cols, "left_anti"
    )
    applied = latest.filter(F.col(op_col) != "D").select(*out_cols)
    return untouched.unionByName(applied)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: "list[str]",
    compare_cols: "list[str] | None" = None,
) -> DataFrame:
    """Keyed reconciliation of two table snapshots — the audit that
    closes a migration/backfill: one full-outer join on the key,
    classifying every key as ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` and, for changed keys, counting WHICH columns moved.
    Returns one summary row per status: ``(status, n_keys,
    col_changes map<string,bigint>)`` — the bounded artifact two teams
    can compare instead of eyeballing row dumps. Pair with
    quality.content_checksum (the order-free whole-table audit): the
    checksum says WHETHER the tables differ, this says WHERE.

    Column comparison is NULL-safe (``<=>``): NULL → value and value →
    NULL count as changes, NULL → NULL does not. ``compare_cols``
    defaults to every shared non-key column; columns missing from
    either side are rejected loudly (a schema drift is its own
    finding, not something to silently skip).

    100 TB shape: ONE shuffle per side (the full-outer join on the
    key — with both snapshots bucketed by the key, zero); the
    per-column comparisons are codegen'd projections on the joined
    stream, and the output aggregates map-side to ≤ 4 rows. The
    col_changes map is built from per-column conditional sums, not
    per-row explode — the wire never carries a row per (key, column)
    pair."""
    shared = [c for c in old.columns if c in set(new.columns)]
    cols = (
        compare_cols
        if compare_cols is not None
        else [c for c in shared if c not in keys]
    )
    missing = [
        c
        for c in cols
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(
            f"snapshot_diff: compare columns missing from a side: "
            f"{missing} — schema drift must be handled explicitly"
        )
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    j = o.join(n, keys, "full_outer")
    changed_any = None
    for c in cols:
        d = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        changed_any = d if changed_any is None else (changed_any | d)
    if changed_any is None:
        changed_any = F.lit(False)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(changed_any, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    rows = j.select(status.alias("status"), *[
        (
            (F.col("_in_old").isNotNull())
            & (F.col("_in_new").isNotNull())
            & ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        ).cast("bigint").alias(f"_chg_{c}")
        for c in cols
    ])
    agg = rows.groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        *[F.sum(f"_chg_{c}").cast("bigint").alias(f"_chg_{c}")
          for c in cols],
    )
    pairs = []
    for c in cols:
        pairs.extend([F.lit(c), F.col(f"_chg_{c}")])
    return agg.select(
        "status",
        "n_keys",
        F.create_map(*pairs).alias("col_changes"),
    )


def join_view_delta(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    a_key: str,
    b_key: str,
    sign_col: str = "sign",
) -> DataFrame:
    """Incremental maintenance of an equi-JOIN view from signed deltas
    — the bilinear delta rule (classic incremental view maintenance;
    Blakeley et al. '86 lineage, the z-relation/DBSP formulation):

        Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB

    with row multiplicities carried as a SIGN column on the deltas
    (+1 insert, −1 retraction; base tables are multiplicity 1 per
    row) and the output sign the PRODUCT of input signs for the
    ΔA ⋈ ΔB term. Appending the returned signed rows to the old view
    and consolidating (:func:`consolidate_view`) reproduces
    ``(A ∪ ΔA) ⋈ (B ∪ ΔB)`` exactly — the law the q274 gate carries
    as a zero.

    At 100 TB this is the point of CDC: a maintained join view costs
    |ΔA|·fanout + |ΔB|·fanout + |ΔA ⋈ ΔB| per refresh instead of
    re-joining two full tables — three equi-joins whose small sides
    are the deltas (broadcast when deltas are small, which is the
    use case). Column sets: the output carries a_old's and b_old's
    columns plus ``sign_col``; the deltas must carry their base
    table's full column set plus ``sign_col``."""
    a_cols = a_old.columns
    b_cols = b_old.columns
    a1 = da.alias("l").join(
        b_old.alias("r"),
        F.col(f"l.{a_key}") == F.col(f"r.{b_key}"),
        "inner",
    ).select(
        *[F.col(f"l.{c}") for c in a_cols],
        *[F.col(f"r.{c}") for c in b_cols],
        F.col(f"l.{sign_col}").cast("int").alias(sign_col),
    )
    a2 = a_old.alias("l").join(
        db.alias("r"),
        F.col(f"l.{a_key}") == F.col(f"r.{b_key}"),
        "inner",
    ).select(
        *[F.col(f"l.{c}") for c in a_cols],
        *[F.col(f"r.{c}") for c in b_cols],
        F.col(f"r.{sign_col}").cast("int").alias(sign_col),
    )
    a3 = da.alias("l").join(
        db.alias("r"),
        F.col(f"l.{a_key}") == F.col(f"r.{b_key}"),
        "inner",
    ).select(
        *[F.col(f"l.{c}") for c in a_cols],
        *[F.col(f"r.{c}") for c in b_cols],
        (F.col(f"l.{sign_col}") * F.col(f"r.{sign_col}"))
        .cast("int")
        .alias(sign_col),
    )
    return a1.unionByName(a2).unionByName(a3)


def consolidate_view(
    rows: DataFrame, sign_col: str = "sign"
) -> DataFrame:
    """Collapse a signed multiset to net multiplicities: group by
    every non-sign column, sum signs, drop rows that cancel to zero.
    Returns the value columns plus ``mult int`` (net multiplicity —
    positive for a consistent view; a negative mult means a
    retraction had no matching row, i.e. the delta stream is
    inconsistent with the base, and is deliberately KEPT visible
    rather than clamped). One map-side-combined groupBy over the
    signed rows."""
    value_cols = [c for c in rows.columns if c != sign_col]
    return (
        rows.groupBy(*value_cols)
        .agg(F.sum(sign_col).cast("int").alias("mult"))
        .filter(F.col("mult") != 0)
    )
