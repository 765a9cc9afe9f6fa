"""Scale probe: streamed sketch-state folds (stream_kmv / stream_cms)
— what does a MICRO-BATCH cost, and how should triggers be sized?

q247/q248 maintain KMV registers / CMS counters as foreachBatch state
through a staged rename-swap per batch. The state is KBs, so the
interesting cost is NOT the merge arithmetic — it is the per-batch
fixed overhead (micro-batch planning, state read, staging write,
checkpoint commit). This probe lands the same events slice as 1, 8
and 32 parquet files and streams each landing with
``maxFilesPerTrigger=1`` (so batch count == file count), measuring
wall time per configuration for both sinks. The per-batch overhead is
the slope; the 1-batch run is the availableNow bulk-backfill
baseline.

Usage: python tools/scale_probe_streamsink.py [sf_dir] [--doc]
Prints one JSON line; with --doc rewrites docs/STREAMSINK_PROBE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

BATCHES = (1, 8, 32)


def _run(spark, ev, n_files: int, sink: str) -> float:
    from gpi_etl_spark.streaming.sinks import stream_cms, stream_kmv

    root = tempfile.mkdtemp(prefix=f"streamsink_{sink}_{n_files}_")
    landing = root + "/landing"
    table, ckpt = root + "/state", root + "/ckpt"
    ev.repartition(n_files).write.mode("overwrite").parquet(landing)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    t0 = time.time()
    if sink == "kmv":
        q = stream_kmv(
            stream, table, "uid", checkpoint=ckpt,
            group_cols=("event_type",), k=64, hash_mode="xxhash64",
        )
    else:
        q = stream_cms(
            stream, table, "uid", checkpoint=ckpt,
            width=512, depth=4, hash_mode="xxhash64",
        )
    q.processAllAvailable()
    q.stop()
    dt = time.time() - t0
    shutil.rmtree(root, ignore_errors=True)
    return round(dt, 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    write_doc = "--doc" in sys.argv

    from gpi_etl_spark import queries as Q
    from gpi_etl_spark.session import get_spark

    spark = get_spark("streamsink_probe", master="local[32]",
                      shuffle_partitions=32)
    ev = (
        Q.t(spark, sf_dir, "events")
        .select("event_type", F.col("user_id").cast("string").alias("uid"))
        .localCheckpoint(eager=True)
    )
    n_rows = ev.count()

    result: dict = {
        "metric": "streamsink_batch_overhead",
        "sf_dir": sf_dir,
        "rows": n_rows,
    }
    for sink in ("kmv", "cms"):
        for n in BATCHES:
            result[f"{sink}_{n}batch_sec"] = _run(spark, ev, n, sink)
        t1, t32 = result[f"{sink}_1batch_sec"], result[f"{sink}_32batch_sec"]
        result[f"{sink}_per_batch_overhead_sec"] = round(
            (t32 - t1) / 31, 3
        )
    print(json.dumps(result))

    if write_doc:
        k1, k8, k32 = (result[f"kmv_{n}batch_sec"] for n in BATCHES)
        c1, c8, c32 = (result[f"cms_{n}batch_sec"] for n in BATCHES)
        ko = result["kmv_per_batch_overhead_sec"]
        co = result["cms_per_batch_overhead_sec"]
        doc = f"""# Streamed sketch-state probe — what a micro-batch costs

`python tools/scale_probe_streamsink.py {sf_dir} --doc`

Same {n_rows:,}-row events slice landed as 1 / 8 / 32 parquet files,
each streamed with `maxFilesPerTrigger=1` (batch count == file
count) into the two sketch-state sinks. local[32].

| sink | 1 batch | 8 batches | 32 batches | per-batch overhead |
|---|---|---|---|---|
| stream_kmv (registers, min-fold) | {k1}s | {k8}s | {k32}s | ~{ko}s |
| stream_cms (counters, ledgered fold) | {c1}s | {c8}s | {c32}s | ~{co}s |

## Operating rule

The sketch arithmetic is NOT the cost — the per-batch fixed overhead
(micro-batch planning, state table read, staging write + rename
swap, checkpoint commit) is, at roughly {ko}-{co} s/batch on this
box for a KB-sized state. Consequences for production triggers:

1. **Bulk backfill: one batch.** `availableNow` WITHOUT
   `maxFilesPerTrigger` folds the whole backlog in a single batch —
   the 1-batch row is the floor, and splitting the same data into 32
   batches costs ~{round((k32 - k1), 1)} s more for the kmv sink
   while producing the IDENTICAL state (idempotent algebra; the
   delivery harness pins it).
2. **Steady state: size triggers by latency needs, not state
   safety.** The fold is crash-safe and (kmv: by algebra; cms: by
   ledger) replay-safe at ANY batch size, so pick the trigger
   interval for freshness; each trigger costs the fixed overhead
   above regardless of how few rows it carries.
3. **The parquet-state swap is the 100 TB caveat**: per batch it
   rewrites the whole state table (KBs here, still KBs at 100 TB of
   STREAM — the state is geometry-bounded), so the swap stays cheap
   forever for sketches; this is precisely why sketch state is the
   aggregate a pipeline can keep warm when raw-data state cannot be.
"""
        with open("/root/repo/docs/STREAMSINK_PROBE.md", "w") as fh:
            fh.write(doc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
