"""Bucketed tables: co-located joins with no shuffle at read time.

At 100 TB the dominant cost of a fact-to-fact join is the shuffle. If
both sides are written bucketed (hash-partitioned into a fixed number
of files) and sorted on the join key, Spark's scan reports the
bucketing as its output partitioning and the sort-merge join runs with
ZERO Exchange operators — the shuffle was paid once at write time and
amortized over every subsequent join.

This is the parquet/catalog equivalent of the reference's only scale
trick — pre-aggregating watermarks inside SQL Server instead of
pulling raw tables (SURVEY §4 "manual pushdown").

Sizing: n_buckets × target file size ≈ table size; buckets must match
on both sides (or be integer multiples in Spark ≥3.1) for the
shuffle-free plan to kick in.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: str | Sequence[str],
    n_buckets: int,
    sort_keys: str | Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting by the join key lets the sort-merge join skip its
    per-partition sort as well."""
    keys = [bucket_keys] if isinstance(bucket_keys, str) else list(bucket_keys)
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *keys)
    if sort_keys is not None:
        sorts = [sort_keys] if isinstance(sort_keys, str) else list(sort_keys)
        writer = writer.sortBy(*sorts)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read; the scan carries the bucket spec so joins and
    aggregations on the bucket keys skip their Exchange."""
    return spark.table(table)


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange (shuffle) operators in the executed plan — the
    metric bucketing exists to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
