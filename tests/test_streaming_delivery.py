"""Delivery-schedule invariance for every streaming gate.

Round 7's one red driver row (q211_stream_stream_join) was an answer
that depended on HOW the file-stream source split the landing into
micro-batches: the events fixture spans 30 days, the join watermark
was 12 hours, and any multi-file delivery let the first batch advance
the watermark past the older rows of every later batch — the state
store dropped them as late and the join emitted 16 of 196 pairs in
the repro. The gate must be invariant to micro-batch boundaries.

This harness replays each streaming gate twice — once exactly as the
gated run delivers it (one overwrite landing, unthrottled read) and
once under an adversarial schedule (``queries._STREAM_DELIVERY``:
the landing hash-split into 8 files that each span the FULL
event-time range, read with ``maxFilesPerTrigger=1``, so the first
batch advances the watermark past most rows of every later batch) —
and asserts the two answers are identical.

q186 is exempt by contract: its cross-batch stateful fold is
arrival-order-dependent by design, so its gate pins a single-file
landing instead (one parquet file is indivisible to the file-stream
source, hence delivery-invariant by construction); that pin is
asserted here, and its cross-batch ordering contract is separately
pinned by tests/test_stateful_streaming.py.

A canary test proves the adversarial schedule actually exercises the
late-drop path (i.e. that AvailableNow honors maxFilesPerTrigger and
the split really lands as 8 files): the q211 pipeline with the OLD
narrow 12h watermark must LOSE pairs under the split. If Spark ever
started coalescing the files into one batch, the canary — not just
the invariance tests — would go red, flagging the harness as vacuous.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from gpi_etl_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.001 testdata not present"
)

#: every streaming gate in the registry except q186 (exempt by pinned
#: single-file contract — see module docstring)
STREAMING_GATES = [
    "q46_streaming_tumbling",
    "q74_streaming_session",
    "q116_streaming_curation",
    "q129_streaming_dedup",
    "q173_stream_dedup_watermark",
    "q211_stream_stream_join",
    "q223_stream_enrich",
    "q230_stream_upsert",
    "q236_stream_pairs_count",
    "q247_stream_kmv_distinct",
    "q248_stream_cms_freq",
    # round-12 sweep: the r10/r11 streamed-sink gates joined the
    # harness late (they shipped with ledger/idempotence pytest but
    # not this end-to-end schedule knob), q283 joins at birth
    "q258_stream_ams_f2",
    "q263_stream_agg_view",
    "q273_stream_key_sample",
    "q283_stream_rq_quantiles",
]

SPLIT = (8, 1)  # 8 full-span files, one file per micro-batch


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def delivery_knob():
    yield
    Q._STREAM_DELIVERY = None


@pytest.mark.parametrize("name", STREAMING_GATES)
def test_gate_is_delivery_schedule_invariant(spark, name, delivery_knob):
    fn = Q.REGISTRY[name][0]
    Q._STREAM_DELIVERY = None
    baseline = _rows(fn(spark, SF_DIR))
    Q._STREAM_DELIVERY = SPLIT
    adversarial = _rows(fn(spark, SF_DIR))
    # the knob must have been honored: the landing is 8 part files
    # (q230's STREAM landing is tagged q230src — its bare q230 tag is
    # the live-table/checkpoint root, not the file-stream source)
    tag = {
        "q230_stream_upsert": "q230src",
        "q247_stream_kmv_distinct": "q247src",
        "q248_stream_cms_freq": "q248src",
        "q258_stream_ams_f2": "q258src",
        "q263_stream_agg_view": "q263src",
        "q273_stream_key_sample": "q273src",
        "q283_stream_rq_quantiles": "q283src",
    }.get(name, name.split("_")[0])
    landing = Q._landing(spark, tag, SF_DIR)
    parts = glob.glob(os.path.join(landing, "part-*.parquet"))
    assert len(parts) == SPLIT[0], (
        f"{name}: landing has {len(parts)} files, knob asked {SPLIT[0]}"
    )
    assert baseline, f"{name}: empty baseline proves nothing"
    assert adversarial == baseline, (
        f"{name}: answer changed under split delivery "
        f"({len(adversarial)} vs {len(baseline)} rows)"
    )


def test_q186_gate_pins_single_file_landing(spark):
    """q186's delivery invariance comes from an indivisible one-file
    landing, not from order-insensitive semantics — assert the pin."""
    fn = Q.REGISTRY["q186_streaming_ewma"][0]
    fn(spark, SF_DIR)
    landing = Q._landing(spark, "q186", SF_DIR)
    parts = glob.glob(os.path.join(landing, "part-*.parquet"))
    assert len(parts) == 1


def test_canary_narrow_watermark_loses_pairs_under_split(
    spark, delivery_knob
):
    """Prove the harness is adversarial, not vacuous: the round-7 q211
    pipeline (12h watermark over the 30-day fixture) must UNDERCOUNT
    under the 8-file/one-per-trigger schedule. If this ever passes the
    full count, the split is no longer reaching the state store as
    multiple micro-batches and the invariance tests above are void."""
    from gpi_etl_spark.streaming.joins import (
        interval_join,
        interval_join_batch,
    )

    ev = Q.t(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    purchases_b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"), F.col("ts").alias("p_ts")
    )
    views_b = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("k"), F.col("ts").alias("v_ts")
    )
    batch_pairs = interval_join_batch(
        purchases_b, views_b,
        keys=["k"], left_ts="p_ts", right_ts="v_ts", lookback="6 hours",
    ).count()
    assert batch_pairs > 0

    Q._STREAM_DELIVERY = SPLIT
    src = Q.land_and_stream(spark, ev, "q211canary", SF_DIR)
    purchases = src.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"), F.col("ts").alias("p_ts")
    )
    views = src.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("k"), F.col("ts").alias("v_ts")
    )
    joined = interval_join(
        purchases,
        views,
        keys=["k"],
        left_ts="p_ts",
        right_ts="v_ts",
        lookback="6 hours",
        watermark="12 hours",  # the round-7 bug, on purpose
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_q211_canary")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    streamed_pairs = spark.table("t_q211_canary").count()
    assert n_batches >= SPLIT[0], (
        f"only {n_batches} micro-batches — maxFilesPerTrigger ignored?"
    )
    assert streamed_pairs < batch_pairs, (
        "narrow watermark matched the batch join under split delivery "
        "— the adversarial schedule no longer exercises late-drop"
    )
