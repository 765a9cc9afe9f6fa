"""Streaming sinks: foreachBatch upsert into a keyed parquet table.

Structured Streaming's built-in file sink is append-only; the
reference's pipelines need *upsert* semantics (re-delivered or revised
rows replace earlier ones — the J1 watermark pattern, SURVEY §2.3).
``foreachBatch`` is the sanctioned bridge: each micro-batch arrives as
a batch DataFrame and any batch writer — here last-write-wins dedup
into parquet, on a lakehouse a real ``MERGE INTO`` — applies it
transactionally per batch id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: Sequence[str],
    ts_col: str,
) -> None:
    """Merge one batch into the parquet table at ``path``: per key keep
    the row with the highest ``ts_col`` (incoming wins ties).

    The merged result is materialized to a staging dir BEFORE the live
    table is overwritten (the merge plan reads the live table, so it
    cannot write over it in one pass). The final overwrite is not
    atomic on plain parquet — a crash between its delete and commit
    can lose the table (recover from ``__staging``); a lakehouse
    format's ``MERGE INTO`` replaces this whole function with a
    transactional commit.
    """
    from gpi_etl_spark.operators.watermark import upsert_by_key

    from pyspark.errors import AnalysisException

    keys = list(keys)
    # existence via the Spark filesystem, not os.path — the path may be
    # an object store (s3a://…) the driver's local FS cannot see.
    # ONLY a missing path may take the first-batch branch: any other
    # failure (schema drift in upsert_by_key, corrupt footer, transient
    # FS error) must raise, because falling through would overwrite the
    # whole table with just this micro-batch — silent history loss.
    current = None
    try:
        current = spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
    if current is not None:
        winner = upsert_by_key(current, batch, keys, ts_col)
    else:
        w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
        winner = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    staged = path.rstrip("/") + "__staging"
    winner.write.mode("overwrite").parquet(staged)
    spark.read.parquet(staged).write.mode("overwrite").parquet(path)
    # best-effort staging cleanup (local FS; object stores age it out)
    import shutil

    shutil.rmtree(staged, ignore_errors=True)


def stream_upsert(
    stream: DataFrame,
    path: str,
    keys: Sequence[str],
    ts_col: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Attach the upsert sink to a streaming DataFrame. Returns the
    StreamingQuery (caller awaits/stops it)."""
    spark = stream.sparkSession

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        upsert_batch(spark, batch_df, path, keys, ts_col)

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
