"""Scale-up control experiment (reproduces README "Performance notes").

The stock testdata parquet files hold ONE row group each, so any scan
is a single task no matter the cluster size — the bench's per-query
floor is input layout, not engine. This probe makes that claim
falsifiable: it re-chunks lineitem into 16 files, scales it 10× by
unioning shifted copies, and times the same plans on (a) stock
single-file input and (b) 10×-bigger multi-file input. If the engine
parallelizes by file, (b) should take roughly the same wall time as
(a) on a 32-core local master despite 10× the rows.

Usage: python tools/scale_probe.py [sf_dir]   (writes under /tmp)
Prints one JSON line: {"stock_1x": {...}, "chunked_10x": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def queries(spark, li):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    agg = li.filter(F.col("l_shipdate") <= "2000-09-02").groupBy(
        "l_returnflag", "l_linestatus"
    ).agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("l_orderkey").orderBy(F.col("l_extendedprice").desc())
    topk = (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return {"scan_agg": agg, "window_topk": topk}


def main() -> None:
    from pyspark.sql import functions as F

    from gpi_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale_probe")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    # 10× volume: union 10 key-shifted copies so group cardinality also
    # scales (a pure duplicate would collapse into the same groups)
    copies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
        for i in range(10)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    chunked = os.path.join(tempfile.gettempdir(), "gpi_scale_probe_li")
    big.repartition(16).write.mode("overwrite").parquet(chunked)

    li_big = spark.read.parquet(chunked)
    out: dict[str, dict] = {}
    for label, frame in (("stock_1x", li), ("chunked_10x", li_big)):
        qs = queries(spark, frame)
        for q in qs.values():  # warm code paths once
            q.write.format("noop").mode("overwrite").save()
        out[label] = {name: timed(q) for name, q in qs.items()}
    out["rows"] = {"stock_1x": li.count(), "chunked_10x": li_big.count()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
