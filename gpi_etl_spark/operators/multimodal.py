"""Multimodal columns: opaque binary payloads + typed metadata.

North-star operator family (BASELINE.json). The design treats media as
``binary`` columns with a metadata struct; all Spark-side plumbing
(schema, partition sizing, Arrow batch shape) is real and tested, while
the actual codec work (image decode, audio resample, video frame
extraction) is stubbed — the decode libraries are not in this
container. Stubs either raise ``NotImplementedError`` (strict) or
produce a deterministic fake (testing), clearly flagged.

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


def resize_images(df: DataFrame, width: int, height: int, **kwargs) -> DataFrame:
    """STUB — image resize needs PIL; the distributed shape is the same
    mapInPandas pipeline as :func:`extract_features`."""
    raise NotImplementedError(
        "image resize requires PIL (not in this container); "
        "implement via mapInPandas exactly like extract_features"
    )


def sample_video_frames(df: DataFrame, every_ms: int, **kwargs) -> DataFrame:
    """STUB — video frame sampling needs PyAV/ffmpeg."""
    raise NotImplementedError(
        "video frame sampling requires PyAV/ffmpeg (not in this container); "
        "implement via mapInPandas exactly like extract_features"
    )
