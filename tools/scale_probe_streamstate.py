"""Scale probe: stream-stream interval join — bounded state WITHOUT
wrong answers, under production (time-ordered) delivery.

Round 8 widened the CORRECTNESS GATES' watermarks past the fixture's
event-time span because a gate must be invariant to arbitrary
micro-batch splits (the q211 lesson: an unordered backfill under a
narrow watermark silently drops late rows). That raises the obvious
question this probe answers with numbers: does the operator still
deliver its production contract — state = O(watermark + lookback),
not O(stream) — when delivery looks like production, i.e. roughly
time-ordered?

Setup: the events table is landed as N time-RANGED slices written in
order (mtimes forced increasing — FileStreamSource processes files in
modification-time order), read with maxFilesPerTrigger=1, so each
micro-batch is one contiguous time slice, exactly how a tailed
landing zone or Kafka topic arrives. interval_join runs with the
PRODUCTION watermark (12h, lookback 6h) over a ~30-day stream.

Measured:
- output pairs vs the batch join (must be EQUAL: ordered delivery has
  no late rows, so the narrow watermark loses nothing);
- per-batch state-store rows (stateOperators.numRowsTotal from
  recentProgress): the peak is the operator's real memory bound, and
  at 30 days / 18h horizon it must sit FAR below total input rows;
- the same pipeline with the span-wide gate watermark ("35 days") for
  the state comparison: correct too, but state grows to O(stream) —
  the measured cost of delivery-schedule insurance, i.e. why
  production sizes the watermark to the lateness horizon instead.

Usage: python tools/scale_probe_streamstate.py [sf_dir] [--doc]
Prints one JSON line; with --doc rewrites docs/STREAMSTATE_PROBE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

N_SLICES = 10


def _land_ordered(spark, ev, base: str) -> None:
    """Ordered landing via the shared helper (its mtime stamping is
    the subtle part — this probe's first run had a now-relative
    variant that re-stamped earlier slices, scrambled the processing
    order, and reproduced the q211 late-drop: 891/2,219 pairs)."""
    from gpi_etl_spark.streaming.ordered import land_ordered_slices

    shutil.rmtree(base, ignore_errors=True)
    land_ordered_slices(ev, base, ts_col="ts", n_slices=N_SLICES)


def _run(spark, ev, base: str, watermark: str):
    from gpi_etl_spark.streaming.joins import interval_join

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base)
    )
    purchases = src.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"), F.col("ts").alias("p_ts")
    )
    views = src.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("k"), F.col("ts").alias("v_ts")
    )
    joined = interval_join(
        purchases, views, keys=["k"], left_ts="p_ts", right_ts="v_ts",
        lookback="6 hours", watermark=watermark,
    )
    name = f"probe_ss_{watermark.replace(' ', '_')}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    progress = list(q.recentProgress)
    q.stop()
    state_rows = [
        int(p["stateOperators"][0]["numRowsTotal"])
        for p in progress
        if p.get("stateOperators")
    ]
    pairs = spark.table(name).count()
    return pairs, len(progress), max(state_rows) if state_rows else 0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    write_doc = "--doc" in sys.argv

    from gpi_etl_spark import queries as Q
    from gpi_etl_spark.session import get_spark

    spark = get_spark("streamstate_probe", master="local[32]",
                      shuffle_partitions=32)
    ev = (
        Q.t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .filter(F.col("event_type").isin("purchase", "view"))
    )
    n_input = ev.count()

    from gpi_etl_spark.streaming.joins import interval_join_batch

    batch_pairs = interval_join_batch(
        ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("k"), F.col("ts").alias("p_ts")
        ),
        ev.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("k"), F.col("ts").alias("v_ts")
        ),
        keys=["k"], left_ts="p_ts", right_ts="v_ts", lookback="6 hours",
    ).count()

    base = os.path.join(tempfile.gettempdir(), "gpi_probe_ss_landing")
    _land_ordered(spark, ev, base)

    p12, b12, s12 = _run(spark, ev, base, "12 hours")
    p35, b35, s35 = _run(spark, ev, base, "35 days")
    shutil.rmtree(base, ignore_errors=True)

    result = {
        "metric": "stream_state_bound",
        "sf_dir": sf_dir,
        "input_rows": n_input,
        "batch_pairs": batch_pairs,
        "slices": N_SLICES,
        "w12h_pairs": p12,
        "w12h_batches": b12,
        "w12h_peak_state_rows": s12,
        "w35d_pairs": p35,
        "w35d_batches": b35,
        "w35d_peak_state_rows": s35,
        "w12h_state_frac": round(s12 / n_input, 4) if n_input else None,
        "w35d_state_frac": round(s35 / n_input, 4) if n_input else None,
    }
    print(json.dumps(result))
    ok = p12 == batch_pairs and p35 == batch_pairs and s12 < s35
    if not ok:
        print("PROBE CONTRACT VIOLATED", file=sys.stderr)
        return 1

    if write_doc:
        doc = f"""# Stream-stream join state probe — bounded state, correct answers

`python tools/scale_probe_streamstate.py {sf_dir} --doc`

Stream: purchase/view events at `{sf_dir}` ({n_input:,} rows over ~30
days), landed as {N_SLICES} contiguous time slices with increasing
mtimes and consumed one slice per micro-batch — production-shaped
delivery (a tailed landing zone / Kafka topic). interval_join
(lookback 6h) under two watermarks:

| watermark | pairs (batch = {batch_pairs:,}) | micro-batches | peak state rows | state / input |
|---|---|---|---|---|
| **12 hours** (production) | {p12:,} | {b12} | {s12:,} | {s12 / n_input:.1%} |
| **35 days** (the gate's span-wide setting) | {p35:,} | {b35} | {s35:,} | {s35 / n_input:.1%} |

Reading:

- **The production contract holds, measured.** Under time-ordered
  delivery the 12h watermark emits EXACTLY the batch join — no late
  rows exist to drop — while the state store holds at most
  {s12:,} rows ({s12 / n_input:.1%} of the stream): the
  watermark+lookback horizon, not the stream. This is the shape a
  100 TB / unbounded deployment runs.
- **The gate's span-wide watermark is insurance, and its cost is
  visible**: correct under ANY delivery schedule (what a correctness
  gate must be — round 8's q211 fix), but state grows to
  {s35 / n_input:.1%} of the input because nothing is ever evicted.
  That is exactly the documented trade: gates and backfills replay
  with watermark ≥ the historical span; live pipelines size it to the
  real lateness horizon and keep state O(window).
- The two rows bound the operator's deployment envelope from both
  sides; tests/test_streaming_delivery.py pins the first property
  (split-invariance of the gates) and
  tests/test_stream_state_bound.py pins this one (ordered delivery →
  exact output + bounded state) so neither can silently regress.
"""
        with open("/root/repo/docs/STREAMSTATE_PROBE.md", "w") as fh:
            fh.write(doc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
