"""Streaming windowed aggregation + dedup with watermarks.

Batch high-watermark loading (operators/watermark.py) maps to
Structured Streaming as: file/kafka source → ``withWatermark`` →
windowed agg or ``dropDuplicates`` → sink with checkpoint. The helpers
below build those plans; tests drive them with a memory sink via
``processAllAvailable`` (synchronous, no wall-clock waits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "5 minutes",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window count+sum. Works for both batch and streaming
    DataFrames (same plan; streaming adds state + watermark purge)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_len), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n",
            "total_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_len, slide), *group_cols)
        .agg(F.avg("value").alias("avg_value"))
        .select(
            F.col("window.start").alias("window_start"),
            *group_cols,
            "avg_value",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
) -> DataFrame:
    """Session-window rollup — the streaming twin of
    ``operators.windows.sessionize``."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def dedup_late_events(
    events: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked exactly-once-ish dedup (the streaming version of the
    reference's re-delete-and-load late handling, HTGPIWASDE/__init__
    .py:74-77)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.dropDuplicates([id_col])
