"""High-watermark incremental loading (the reference's J1/K4 pattern).

The reference keeps per-source watermark state in SQL Server and
re-fetches only rows newer than ``MAX(date) [GROUP BY key]``
(HTGPIPROPHEDEX/__init__.py:78-87,225-264; HTGPIYAHOO/__init__.py:
38,74-96; HTGPICFT/__init__.py:49-81; scalar variants in HTGPIINFLATUS
/HTGPIOILWTI/HTGPISNP500/HTGPIAGRICENSUS), and handles late re-releases
by DELETE-then-INSERT of a month partition (HTGPIWASDE/__init__.py:
124-134).

Here the watermark is computed from the engine's own sink — no external
state database — and the merge is expressed so Catalyst broadcasts the
(tiny) watermark side:

* watermark side = ``groupBy(keys).agg(max(ts))`` → one row per
  distinct key. For the reference's workloads (tens of tickers /
  commodities) that is trivially broadcastable, but at the 100 TB
  design target a per-document key could make it huge — so the
  broadcast hint is opt-in (``hint_broadcast``), and by default the
  planner/AQE picks the strategy from the measured size;
* incoming side = arbitrarily large; the filter after the left join is
  a per-row predicate, so with a broadcast watermark the whole
  incremental selection is one shuffle-free stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def compute_watermarks(loaded: DataFrame, keys: Sequence[str], ts_col: str) -> DataFrame:
    """Per-key high watermark: ``SELECT keys, MAX(ts) FROM loaded``.

    With no ``keys`` returns a single global-max row (the reference's
    scalar ``MAX(date)`` variants).
    """
    agg = F.max(ts_col).alias(f"wm_{ts_col}")
    if keys:
        return loaded.groupBy(*keys).agg(agg)
    return loaded.agg(agg)


def newer_than_watermark(
    incoming: DataFrame,
    loaded: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    hint_broadcast: bool | None = None,
) -> DataFrame:
    """Rows of ``incoming`` strictly newer than their key's watermark.

    Equivalent to the reference's per-key fetch loop with
    ``start = last + 1 day`` — i.e. a left anti join against already-
    loaded (key, ts≤wm) space.

    ``hint_broadcast`` forces the watermark side to broadcast so the
    big side never shuffles — set it when the caller KNOWS key
    cardinality is small (the reference's case: ~dozens of tickers).
    Default (None) adds no hint: a forced broadcast of a high-
    cardinality per-key aggregate would bypass
    ``autoBroadcastJoinThreshold`` and OOM, while AQE already converts
    to broadcast at runtime when the measured size allows. The scalar
    (no-keys) watermark is a single row and always broadcasts.
    """
    wm_col = f"wm_{ts_col}"
    wm = compute_watermarks(loaded, keys, ts_col)
    if keys:
        wm_side = F.broadcast(wm) if hint_broadcast else wm
        joined = incoming.join(wm_side, on=list(keys), how="left")
    else:
        joined = incoming.crossJoin(F.broadcast(wm))
    # NULL watermark (first load / new key) keeps the row — no floor
    # literal, so numeric/epoch ts columns work the same as timestamps
    return joined.filter(
        F.col(wm_col).isNull() | (F.col(ts_col) > F.col(wm_col))
    ).drop(wm_col)


def merge_incremental(
    incoming: DataFrame,
    loaded: DataFrame,
    keys: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Loaded ∪ (incoming newer than watermark) — the full J1 merge.

    Without a Delta/Iceberg table format in this environment the merge
    is emulated as union (SURVEY.md §4 table: "watermark incremental
    MERGE" is a pattern library, not a Catalyst rule). On a real
    lakehouse this is ``MERGE INTO sink USING incoming ...`` or a
    ``replaceWhere`` partition overwrite.
    """
    fresh = newer_than_watermark(incoming, loaded, keys, ts_col)
    return loaded.unionByName(fresh.select(*loaded.columns))


def upsert_by_key(
    loaded: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """MERGE upsert: per key keep the newest row; ``incoming`` wins
    timestamp ties (re-delivered or revised rows replace earlier ones).

    The third member of the incremental family — ``merge_incremental``
    appends strictly-newer rows, ``replace_partition`` reloads a whole
    partition, and this updates-else-inserts per key: union both sides
    with a source flag, window row_number per key ordered by
    (ts desc, source desc), keep rank 1. One shuffle on the key. On a
    lakehouse the same semantics are ``MERGE INTO … WHEN MATCHED
    UPDATE WHEN NOT MATCHED INSERT``; the streaming foreachBatch sink
    (streaming/sinks.py) applies exactly this per micro-batch.
    """
    merged = loaded.withColumn("__src", F.lit(0)).unionByName(
        incoming.select(*loaded.columns).withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*list(keys)).orderBy(
        F.col(ts_col).desc(), F.col("__src").desc()
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def replace_partition(
    sink: DataFrame,
    incoming: DataFrame,
    partition_pred,
) -> DataFrame:
    """Delete-then-insert of one partition (the WASDE month reload).

    Reference: ``delete_wasde(daterelease)`` month-prefix DELETE +
    re-insert (HTGPIWASDE/__init__.py:74-77,124-134). Emulated as
    ``sink.filter(~pred) ∪ incoming``; with Delta this is the
    ``replaceWhere`` write option.
    """
    # NULL predicate rows (e.g. NULL partition key) are OUTSIDE the
    # replaced partition and must be kept — ~NULL is NULL and would
    # silently drop them without the coalesce
    keep = ~F.coalesce(partition_pred, F.lit(False))
    return sink.filter(keep).unionByName(incoming.select(*sink.columns))


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    compress: bool = True,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: turn a change log ``(keys,
    attrs, effective_ts)`` into versioned dimension rows with validity
    intervals — the warehouse pattern for "what did this customer's
    record look like on date X?". K4's keep-history sibling:
    ``upsert_by_key`` overwrites (type 1), this one versions.

    With ``compress`` (default), consecutive rows whose tracked
    ``attr_cols`` did not change are collapsed into one interval
    (null-safe comparison, so NULL→NULL is "unchanged" and NULL→value
    is a new version). ``valid_from`` is the row's effective
    timestamp, ``valid_to`` the NEXT version's (NULL = still current,
    also exposed as ``is_current``).

    Two windows per key, shuffle ∝ change-log rows on the key hash; no
    driver involvement. Ties on ``(keys, ts)`` are the caller's bug —
    deduplicate first (interval semantics are undefined for
    simultaneous changes).
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    out = changes
    if compress:
        changed = F.lit(False)
        for a in attr_cols:
            changed = changed | ~F.col(a).eqNullSafe(
                F.lag(F.col(a)).over(w)
            )
        first = F.lag(F.col(ts_col)).over(w).isNull()
        out = (
            out.withColumn("_keep", first | changed)
            .filter(F.col("_keep"))
            .drop("_keep")
        )
    w2 = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    return (
        out.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Join facts to the dimension VERSION in effect at fact time:
    ``valid_from <= ts < valid_to`` (open-ended current rows match
    everything from their start). The consumer of
    :func:`scd2_history` — "price the order with the customer tier
    that was current on the order date".

    An equi-join on the keys plus an interval predicate: each fact
    matches at most one version row (intervals per key are disjoint by
    construction), so there is no fan-out; the shuffle is the plain
    key hash on both sides. No windows, no broadcast assumptions —
    AQE picks the strategy by size as usual.
    """
    pred = (F.col(ts_col) >= F.col(valid_from)) & (
        F.col(valid_to).isNull() | (F.col(ts_col) < F.col(valid_to))
    )
    return facts.join(dim, list(key_cols)).filter(pred)


def merge_partial_aggs(
    parts: Sequence[DataFrame],
    key_cols: Sequence[str],
    cnt_cols: Sequence[str] = (),
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge pre-computed per-group aggregate tables into one — the
    incremental-maintenance identity: because count/sum/min/max are
    ALGEBRAIC (merge(agg(A), agg(B)) = agg(A ∪ B)), yesterday's stored
    rollup plus today's delta rollup equals the full recompute without
    rescanning history. Averages and ratios are derived at read time
    from the merged sums — never stored (a stored avg is not
    mergeable).

    One unionByName + one groupBy over |groups|-sized inputs: the
    shuffle is proportional to the GROUP count, not the 100 TB of
    history that produced them. Decimal sum columns keep the merge
    bit-exact regardless of merge order.
    """
    if not parts:
        raise ValueError(
            "merge_partial_aggs needs at least one partial-aggregate "
            "table (an empty nightly discovery should skip the merge)"
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    aggs = (
        [F.sum(c).alias(c) for c in cnt_cols]
        + [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return merged.groupBy(*[F.col(k) for k in key_cols]).agg(*aggs)
