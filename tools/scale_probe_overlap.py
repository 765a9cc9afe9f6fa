"""Measured probe: band sensitivity of the two-sided interval overlap
join, and postings-vs-scan for phrase search (q213/q217 operators).

Usage: python tools/scale_probe_overlap.py [sf_dir]
Prints one line per configuration; numbers land in
docs/OVERLAP_PROBE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from gpi_etl_spark import queries as Q  # noqa: E402
from gpi_etl_spark.operators import textstats  # noqa: E402
from gpi_etl_spark.operators.rangejoin import (  # noqa: E402
    interval_overlap_join,
)
from gpi_etl_spark.operators.retrieval import phrase_search  # noqa: E402
from gpi_etl_spark.operators.windows import sessionize  # noqa: E402
from gpi_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("overlap_probe")

    ev = Q.t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    sess = (
        sessionize(ev, "user_id", "us", gap_seconds=1_800_000_000)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("us").alias("ls"),
            (F.max("us") + F.lit(60_000_000)).alias("le"),
        )
        .persist()
    )
    inc = (
        ev.filter(F.col("event_type") == "error")
        .select(F.expr("us div 600000000").alias("bkt"))
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select(
            "bkt",
            (F.col("bkt") * 600_000_000).alias("rs"),
            ((F.col("bkt") + 1) * 600_000_000).alias("re"),
        )
        .persist()
    )
    n_sess, n_inc = sess.count(), inc.count()
    print(f"inputs: {n_sess} sessions x {n_inc} incidents "
          f"(quadratic candidate space = {n_sess * n_inc:,})")

    for label, band in (("1min", 60), ("10min", 600), ("1h", 3600),
                        ("6h", 21600)):
        band_us = band * 1_000_000
        t0 = time.time()
        out = interval_overlap_join(
            sess, inc, ("ls", "le"), ("rs", "re"),
            ["user_id", "session_id"], ["bkt"], band_us=band_us,
        )
        n = out.count()
        dt = time.time() - t0
        # candidate pairs BEFORE the exact filter = banded join size
        lb = sess.select(
            F.explode(
                F.sequence(
                    F.expr(f"ls div {band_us}"),
                    F.expr(f"(le - 1) div {band_us}"),
                )
            ).alias("b")
        )
        rb = inc.select(
            F.explode(
                F.sequence(
                    F.expr(f"rs div {band_us}"),
                    F.expr(f"(re - 1) div {band_us}"),
                )
            ).alias("b")
        )
        cand = (
            lb.groupBy("b").count().alias("l")
            .join(rb.groupBy("b").count().alias("r"), "b")
            .select(F.sum(F.col("l.count") * F.col("r.count")))
            .collect()[0][0]
        )
        print(f"band={label:>5}: true_pairs={n:,} "
              f"banded_candidates={cand:,} wall={dt:.2f}s")

    docs = Q.t(spark, sf_dir, "documents").select(
        "doc_id", textstats.tokens("text").alias("tk")
    ).persist()
    docs.count()
    phrases = [["order", "fast"], ["window", "join"],
               ["big", "order", "scan"]]
    t0 = time.time()
    n_idx = phrase_search(docs, phrases, "tk").count()
    t_idx = time.time() - t0

    # scan-side equivalent (the oracle's algorithm, in Spark): test
    # every start offset of every doc against every phrase
    t0 = time.time()
    n_scan = 0
    for words in phrases:
        L = len(words)
        cond = None
        for i, w in enumerate(words):
            c = F.element_at(F.col("tk"), F.col("s") + i) == w
            cond = c if cond is None else cond & c
        hits = (
            docs.filter(F.size("tk") >= L)
            .select(
                "doc_id",
                F.explode(
                    F.sequence(F.lit(1), F.size("tk") - L + 1)
                ).alias("s"),
                "tk",
            )
            .filter(cond)
            .groupBy("doc_id")
            .count()
        )
        n_scan += hits.count()
    t_scan = time.time() - t0
    print(f"phrase_search postings: {n_idx} doc-hits in {t_idx:.2f}s; "
          f"array-scan equivalent: {n_scan} in {t_scan:.2f}s")
    sess.unpersist(); inc.unpersist(); docs.unpersist()


if __name__ == "__main__":
    main()
