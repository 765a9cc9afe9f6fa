"""Approximate aggregates must stay within their advertised error."""

from pyspark.sql import functions as F


def test_approx_count_distinct_error_bound(spark):
    n = 5000
    df = spark.range(n).select((F.col("id") % 997).alias("k"))
    exact = df.select(F.countDistinct("k")).first()[0]
    approx = df.select(F.approx_count_distinct("k", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact <= 0.06  # 3× rsd headroom


def test_percentile_approx_brackets_exact_median(spark):
    df = spark.range(10001).select(F.col("id").cast("double").alias("v"))
    got = df.select(F.percentile_approx("v", 0.5, 10000)).first()[0]
    assert abs(got - 5000.0) <= 10
