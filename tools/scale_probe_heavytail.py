"""Scale probe: the heavy "declared-pattern" bench entries at 10×.

The r12 verdict's standing ask (#7): the dispositions that left
q105/q161 (curation DAG comparison pair), q123 (PageRank) and
q179 (IVF ANN) alone rest on the claim that at sf0.1 these entries
measure job-launch and plan overhead, not compute. This probe makes
the claim falsifiable with a scale point: it builds a 10× documents
and embeddings input (ids shifted per copy; document text perturbed
with a per-copy token so the DAGs' dedup stages keep their realistic
pass-through rate instead of dropping 90% synthetic duplicates) split
over 16 files, and times the SAME query functions on stock sf0.1 vs
the 10× dir. An entry whose wall time grows ≪ 10× is overhead-bound
at sf0.1 (disposition confirmed: optimize the loop structure, not the
operators); an entry growing ≈ 10× or worse is compute-bound and its
disposition should be promoted to the work list.

Usage: python tools/scale_probe_heavytail.py [sf_dir]
Prints one JSON line. Writes the scaled input under /tmp (removed on
exit).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
COPIES = 10
FILES = 16
ENTRIES = (
    "q105_curation_dag",
    "q161_curation_dag_v2",
    "q123_pagerank",
    "q179_quantized_ivf_ann",
)


def build_scaled(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()
    parts = []
    for c in range(COPIES):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(c * n_docs)).alias("doc_id"),
                # per-copy token: keeps exact/near-dup stages at their
                # stock pass-through rate (identical text 10× would
                # turn the dedup stages into 90% drops — a different
                # workload, not a bigger one)
                F.concat(
                    F.col("text"), F.lit(f" probecopy{c}")
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    scaled.repartition(FILES).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_emb = emb.count()
    eparts = []
    for c in range(COPIES):
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(c * n_emb)).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    escaled = eparts[0]
    for p in eparts[1:]:
        escaled = escaled.unionByName(p)
    escaled.repartition(FILES).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def time_entry(spark, fn, sf_dir: str, runs: int = 3) -> list[float]:
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(round(time.time() - t0, 3))
    return times


def main() -> None:
    from gpi_etl_spark import queries as Q
    from gpi_etl_spark.session import get_spark

    spark = get_spark("gpi_scale_probe_heavytail")
    out_dir = tempfile.mkdtemp(prefix="gpi_probe10x_")
    result: dict = {"sf_dir": SF_DIR, "copies": COPIES, "files": FILES}
    try:
        t0 = time.time()
        build_scaled(spark, out_dir)
        result["build_sec"] = round(time.time() - t0, 1)
        ents = {n: fn for n, (fn, _sql) in Q.REGISTRY.items()}
        for name in ENTRIES:
            spark.sparkContext.setJobDescription(f"probe {name}")
            stock = time_entry(spark, ents[name], SF_DIR)
            scaled = time_entry(spark, ents[name], out_dir)
            result[name] = {
                "stock": stock,
                "x10": scaled,
                "growth": round(min(scaled) / min(stock), 2),
            }
            print(f"# {name}: {result[name]}", flush=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
