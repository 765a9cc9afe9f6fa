"""Bucketed tables must join and aggregate with zero shuffles."""

import pytest

from pyspark.sql import functions as F

from gpi_etl_spark.sources.bucketed import n_exchanges, read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse.dir is a static conf — tables land in the session's
    # default ./spark-warehouse; dropped (purged) in teardown
    facts = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 2.0).alias("v")
    )
    dims = spark.range(500).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    write_bucketed(facts, "b_facts", "k", 8, sort_keys="k")
    write_bucketed(dims, "b_dims", "k", 8, sort_keys="k")
    yield spark
    import shutil

    for t in ("b_facts", "b_dims"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_exchange(bucketed_tables):
    spark = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "b_facts").join(read_table(spark, "b_dims"), "k")
        assert n_exchanges(joined) == 0
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(bucketed_tables):
    spark = bucketed_tables
    agg = read_table(spark, "b_facts").groupBy("k").agg(F.sum("v").alias("s"))
    assert n_exchanges(agg) == 0
    assert agg.count() == 500


def test_unbucketed_join_pays_the_shuffle(bucketed_tables):
    """Control: the same join without bucketing shuffles both sides."""
    spark = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        facts = spark.range(10_000).select((F.col("id") % 500).alias("k"))
        dims = spark.range(500).select(F.col("id").alias("k"))
        assert n_exchanges(facts.join(dims, "k")) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
