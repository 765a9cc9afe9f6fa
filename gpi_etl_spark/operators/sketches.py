"""Count-Min sketch: a constant-size, mergeable frequency summary.

Misra-Gries (operators/heavyhitters.py) answers "which items are
frequent" exactly; the Count-Min sketch (Cormode & Muthukrishnan '05)
answers "roughly how often does THIS item occur" for ANY item with a
fixed ``depth × width`` counter table — the structure a 100 TB
pipeline ships to a serving tier or joins across days, because its
size never depends on the vocabulary.

Distributed build = one aggregation: each item contributes ``depth``
(row, col) bucket increments, and ``groupBy(row, col).count()`` with
map-side combine means the shuffle is bounded by ``depth × width`` per
partition regardless of input size. Merging two sketches (days,
shards) is counter-wise addition — union + re-aggregate — because the
sketch is a linear projection of the input multiset.

Estimation: ``est(x) = min_i counter[i][h_i(x) mod width]``. The
estimate NEVER undercounts; it overcounts by hash collisions, bounded
by ``e·N/width`` with probability ``1 - e^-depth`` (N = stream size).

Hash family: one base hash per item plus ``depth`` affine
permutations, in either of the repo's two standard modes —
``xxhash64`` (JVM intrinsic, the production default) or ``poly``
(functions/xhash.py — exact integer arithmetic DuckDB replays
bit-for-bit, which is what lets q188 run under the full hash gate).

No counterpart in the reference (its only frequency logic is pandas
``value_counts`` — HTIPPLSITE/__init__.py:315); textbook CM sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpi_etl_spark.functions import xhash


def _bucket_cols(base, depth: int, width: int, hash_mode: str) -> list:
    """The ``depth`` bucket indices of one item, as Column exprs.

    ``poly`` mode: ``(a_i·h + b_i) mod P mod width`` — non-negative by
    construction. ``xxhash64`` mode re-hashes the base with the row
    index as seed, then takes ``pmod`` (xxhash64 is signed; ``%`` in
    Spark keeps the dividend's sign, so pmod is required for a valid
    column index)."""
    if hash_mode == "poly":
        return [
            xhash.affine_hash(base, i, depth) % width for i in range(depth)
        ]
    if hash_mode != "xxhash64":
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return [
        F.pmod(F.xxhash64(base, F.lit(i)), F.lit(width))
        for i in range(depth)
    ]


def cms_build(
    items: DataFrame,
    item_col: str,
    width: int = 512,
    depth: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Build a Count-Min sketch over a string item stream.

    Returns the counter table ``(row int, col int, c bigint)`` —
    at most ``depth × width`` rows (zero counters are omitted; an
    absent (row, col) means 0). One shuffle, keyed on (row, col):
    partial counts combine map-side, so the wire carries at most
    ``depth × width`` rows per input partition however large the
    stream is.
    """
    base = (
        xhash.poly_hash(F.col(item_col))
        if hash_mode == "poly"
        else F.xxhash64(F.col(item_col))
    )
    bucketed = items.select(
        F.posexplode(
            F.array(*_bucket_cols(base, depth, width, hash_mode))
        ).alias("row", "col")
    )
    return bucketed.groupBy(
        F.col("row").cast("int").alias("row"),
        F.col("col").cast("int").alias("col"),
    ).agg(F.count(F.lit(1)).alias("c"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Counter-wise sum of same-shape sketches (linearity of the CM
    projection): union + re-aggregate. Merging per-day / per-shard
    sketches this way is the whole point of shipping a sketch instead
    of exact counts."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    width: int = 512,
    depth: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Point-estimate frequencies for a (small) probe set.

    Returns ``(item_col, est bigint)`` with ``est = min`` over the
    ``depth`` hashed counters; a missing counter row reads as 0. The
    sketch is bounded at ``depth × width`` rows by construction, so it
    broadcasts into the probe stream — estimation shuffles nothing but
    the final per-item min, however many probes arrive.

    ``width``/``depth``/``hash_mode`` MUST match the ``cms_build``
    call that produced the sketch: the sketch frame carries only
    (row, col, c), so a mismatch is structurally undetectable here and
    would read never-incremented buckets as 0 — silently breaking the
    never-undercount guarantee. Callers shipping sketches across jobs
    should ship the three parameters alongside (they ARE the sketch's
    schema).
    """
    base = (
        xhash.poly_hash(F.col(item_col))
        if hash_mode == "poly"
        else F.xxhash64(F.col(item_col))
    )
    pb = probes.select(
        item_col,
        F.posexplode(
            F.array(*_bucket_cols(base, depth, width, hash_mode))
        ).alias("row", "col"),
    ).select(
        item_col,
        F.col("row").cast("int").alias("row"),
        F.col("col").cast("int").alias("col"),
    )
    joined = pb.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")
    )
