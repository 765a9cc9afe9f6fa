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
    increasing in time order. Returns the number of non-empty slices.
    The caller owns (pre-cleans) ``base``."""
    b = df.agg(
        F.min(F.unix_micros(ts_col)).alias("lo"),
        F.max(F.unix_micros(ts_col)).alias("hi"),
    ).first()
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
        part.coalesce(1).write.mode("append").parquet(base)
        # stamp ONLY this slice's new files, from a fixed increasing
        # base — never relative to the current clock
        new = False
        for f in os.listdir(base):
            if f not in seen:
                os.utime(os.path.join(base, f), (t0 + i, t0 + i))
                seen.add(f)
                if f.startswith("part-"):
                    new = True
        written += int(new)
    return written
