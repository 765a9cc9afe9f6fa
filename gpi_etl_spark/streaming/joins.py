"""Stream-stream interval joins with watermark-bounded state.

Spark buffers both sides in the state store; the watermark plus the
time-range condition bound how much it keeps, so state is O(window)
instead of O(stream). This is the streaming twin of the batch banded
range join (operators/rangejoin.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """right rows within ``(left_ts - lookback, left_ts]`` per key.

    Both inputs may be streaming; each gets the same event-time
    watermark so Spark can evict matched/expired state. Column names
    (beyond ``keys``) must be disjoint.

    ``how``: ``inner`` (matches emit as soon as both sides arrive —
    the availableNow run equals the batch join, which is why the
    inner form is the gateable one) or ``leftOuter`` (purchases with
    NO view in the window still emit, right columns NULL). Outer
    semantics are inherently watermark-paced: a NULL-padded row can
    only emit once the watermark proves no match can still arrive, so
    unmatched rows younger than the final watermark at stream end are
    NOT emitted by an availableNow run — they are correct-but-pending,
    not lost (they emit on the next incremental run). That pacing is
    why the outer variant is pinned by
    tests/test_stream_outer_join.py rather than a DuckDB-hash gate:
    its complete answer needs either more input or a final-watermark
    flush, both outside a single gated run's control.

    Two operational facts the outer tests pin (both cost real rows if
    forgotten): the query's global watermark is the MIN over the two
    sides' watermark nodes, so BOTH sides must keep receiving events
    for NULL emission to progress (a dried-up side freezes it); and a
    batch's watermark advance only evicts/emits state in the NEXT
    batch, so an availableNow run never flushes what its own final
    batch proved.
    """
    if how not in ("inner", "leftOuter"):
        # rightOuter/fullOuter would need coalesce(l.k, r.k) instead
        # of the drop below — an unmatched right row carries its only
        # key copy on the side being dropped, so passing them through
        # would silently emit NULL-keyed rows (review find)
        raise ValueError(
            f"interval_join supports inner/leftOuter, got {how!r}"
        )
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = F.expr(
        " AND ".join(
            [f"l.{k} = r.{k}" for k in keys]
            + [
                f"r.{right_ts} > l.{left_ts} - INTERVAL {lookback}",
                f"r.{right_ts} <= l.{left_ts}",
            ]
        )
    )
    joined = lw.alias("l").join(rw.alias("r"), cond, how)
    # keep ONE copy of each key (expression joins retain both sides,
    # which would make the keys ambiguous downstream)
    return joined.drop(*[rw[k] for k in keys])


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """The BATCH twin of :func:`interval_join` — identical pair
    semantics (right rows within ``(left_ts - lookback, left_ts]`` per
    key) with no watermark and no state, for oracles, backfills and
    the delivery/state tests that need the ground-truth pair set
    (previously hand-rolled in three places — review find). For
    ``leftOuter`` the interval predicate rides INSIDE the join (a
    post-filter would delete the NULL-padded rows), mirroring the
    streaming twin's eventual answer."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(
            f"interval_join_batch supports inner/leftOuter, got {how!r}"
        )
    cond = (
        (F.col(right_ts) > F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    if how == "inner":
        return left.join(right, keys).filter(cond)
    l, r = left.alias("l"), right.alias("r")
    full = F.expr(" AND ".join(f"l.{k} = r.{k}" for k in keys)) & (
        (F.col(f"r.{right_ts}")
         > F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, full, "left").drop(*[r[k] for k in keys])
