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
