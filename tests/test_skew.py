"""Salted joins must equal plain joins, with the salt spreading hot keys."""

import pytest

from pyspark.sql import functions as F

from gpi_etl_spark.operators.skew import salted_join, top_keys


@pytest.fixture(scope="module")
def skewed(spark):
    # key 1 holds 80% of the fact rows; dims are small
    facts = spark.createDataFrame(
        [(1 if i % 5 else (i % 3) + 2, float(i)) for i in range(500)],
        "k int, v double",
    )
    dims = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "c"), (9, "orphan")], "k int, name string"
    )
    return facts, dims


def _counts(df):
    return sorted(map(tuple, df.groupBy("k", "name").count().collect()))


def test_salted_inner_equals_plain(spark, skewed):
    facts, dims = skewed
    plain = facts.join(dims, "k")
    salted = salted_join(facts, dims, "k", n_salts=8)
    assert _counts(salted) == _counts(plain)


def test_salted_left_keeps_unmatched(spark, skewed):
    facts, dims = skewed
    plain = facts.join(dims, "k", "left")
    salted = salted_join(facts, dims, "k", n_salts=8, how="left")
    assert salted.count() == plain.count()
    assert salted.filter(F.col("name").isNull()).count() == plain.filter(
        F.col("name").isNull()
    ).count()


def test_hot_keys_only_salting(spark, skewed):
    facts, dims = skewed
    hot = top_keys(facts, "k", n=1)
    assert hot == [1]
    plain = facts.join(dims, "k")
    salted = salted_join(facts, dims, "k", n_salts=8, hot_keys=hot)
    assert _counts(salted) == _counts(plain)


def test_salt_actually_scatters(spark, skewed):
    facts, _ = skewed
    from gpi_etl_spark.operators.skew import SALT

    salted = facts.withColumn(SALT, F.floor(F.rand(42) * 8).cast("int"))
    n_buckets = salted.filter("k = 1").select(SALT).distinct().count()
    assert n_buckets >= 6  # 400 rows over 8 salts: all buckets hit w.h.p.
