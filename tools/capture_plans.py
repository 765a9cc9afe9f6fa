"""Capture `.explain("formatted")` output for bench/registry queries.

Optimization-round evidence tool: writes
``plans/r12/<name>_<tag>.txt`` for each named entry (tag = before /
after), so plan claims in OPTIMIZATION_r12.md are checkable without
running Spark.

Usage:
    python tools/capture_plans.py --tag before q272_superspreaders ...
    python tools/capture_plans.py --tag after --all-headline

Names accept registry entries plus bench._extra_entries twins.
Queries whose construction runs eager driver work (k-means loops,
MMR argmax steps, zone-layout writes) pay that work here — the
captured plan is the RETURNED frame's, which is the contract the
driver's noop sink executes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", "r13")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    use_headline = "--all-headline" in args
    if use_headline:
        args.remove("--all-headline")

    import bench
    from gpi_etl_spark import queries as Q
    from gpi_etl_spark.session import get_spark

    ents = {n: fn for n, (fn, _sql) in Q.REGISTRY.items()}
    ents.update(bench._extra_entries())
    names = list(bench.HEADLINE) if use_headline else args
    os.makedirs(OUT_DIR, exist_ok=True)

    spark = get_spark("gpi_plan_capture")
    for name in names:
        df = ents[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
