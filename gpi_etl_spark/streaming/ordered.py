"""Time-ordered multi-file landings for streaming tests and probes.

FileStreamSource processes files in MODIFICATION-TIME order, so a
landing written as contiguous time slices with strictly increasing
mtimes + ``maxFilesPerTrigger=1`` replays production-shaped delivery
(a tailed landing zone / Kafka topic) deterministically. The mtime
stamping is subtle — a now-relative heuristic that re-stamped earlier
slices scrambled the order and silently reproduced the q211 late-drop
bug in the state probe's first run — so the one correct implementation
lives here (review find: it had been hand-rolled in the probe AND the
state-bound test)."""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def land_ordered_slices(
    df: DataFrame,
    base: str,
    ts_col: str = "ts",
    n_slices: int = 8,
) -> int:
    """Write ``df`` under ``base`` as ``n_slices`` contiguous
    event-time slices, one parquet file each, mtimes strictly
    increasing in time order. Returns the number of NON-EMPTY slices —
    counted by each slice's actual row count, not by the presence of a
    new part- file (advice find: Spark writes a schema-only part file
    for an empty slice, so file presence over-counted). An empty
    ``df`` raises ValueError up front (advice find: it used to crash
    with a bare TypeError on ``None`` bounds). The caller owns
    (pre-cleans) ``base``."""
    b = df.agg(
        F.min(F.unix_micros(ts_col)).alias("lo"),
        F.max(F.unix_micros(ts_col)).alias("hi"),
    ).first()
    if b.lo is None:
        raise ValueError(
            "land_ordered_slices: input has no rows (or ts_col is "
            "all-NULL) — nothing to slice"
        )
    lo, hi = b.lo, b.hi + 1
    step = (hi - lo + n_slices - 1) // n_slices
    t0 = time.time()
    seen: set[str] = set()
    written = 0
    for i in range(n_slices):
        s, e = lo + i * step, lo + (i + 1) * step
        part = df.filter(
            (F.unix_micros(ts_col) >= s) & (F.unix_micros(ts_col) < e)
        )
        # the count costs one extra tiny job per slice — this is a
        # test/probe utility; correctness of the return value wins
        written += int(part.limit(1).count() > 0)
        part.coalesce(1).write.mode("append").parquet(base)
        # stamp ONLY this slice's new files, from a fixed increasing
        # base — never relative to the current clock
        for f in os.listdir(base):
            if f not in seen:
                os.utime(os.path.join(base, f), (t0 + i, t0 + i))
                seen.add(f)
    return written
