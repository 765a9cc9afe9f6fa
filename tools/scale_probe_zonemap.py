"""Scale probe: the executed zone-map layout (q278) measured as a
SCAN-COST instrument across a 10× growth step.

q278 proves the physical claim (footer zones == advisor prediction,
rewrite row-lossless); what it has NOT had is the measured answer to
the question a 100 TB migration asks: how does the SKIP RATIO and the
ACTUAL filtered-scan wall time move as the table grows, under the
range layout vs the hash strawman? Zone skipping is only worth a
rewrite if the pruned fraction holds as files fill out and the
per-file zone width narrows.

Measured here at the given sf_dir and at a 10× union (key space
extended so the domain grows with the data — zones narrow, the way a
real growing fact behaves):

1. write both 64-file layouts (sinklayout.write_zone_layout);
2. footer zone maps (measure_zone_map) → predicate skip ratios for
   the q271 predicate set, from REAL parquet metadata;
3. warm (median of 3) wall time of the narrow-predicate filtered
   COUNT against each written layout — Spark's own row-group
   skipping doing the work the zone table predicts.

Usage: python tools/scale_probe_zonemap.py [sf_dir] [--doc]
Prints one JSON line; with --doc appends the section to
docs/SCALE.md is left to the operator (the probe prints markdown to
stdout under --doc instead of editing files).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

PREDS = [(0, 2_000_000), (4_000_000, 4_500_000)]


def _timed(fn, runs: int = 3):
    vals, out = [], None
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn()
        vals.append(time.monotonic() - t0)
    return statistics.median(vals), out


def probe(spark, base_df, tag: str, root: str) -> dict:
    from gpi_etl_spark.operators.sinklayout import (
        measure_zone_map,
        write_zone_layout,
    )

    out = {"tag": tag}
    paths = {}
    for layout in ("range", "hash"):
        path = os.path.join(root, f"{tag}_{layout}")
        t0 = time.monotonic()
        write_zone_layout(base_df, "cents", 64, layout, path)
        out[f"write_{layout}_s"] = round(time.monotonic() - t0, 3)
        paths[layout] = path
        zones = measure_zone_map(spark, path, layout).collect()
        total_rows = sum(z.zrows for z in zones)
        for i, (lo, hi) in enumerate(PREDS):
            pruned = sum(
                1 for z in zones if z.zmax < lo or z.zmin > hi
            )
            scanned = sum(
                z.zrows for z in zones
                if not (z.zmax < lo or z.zmin > hi)
            )
            out[f"{layout}_p{i}_files_pruned"] = pruned
            out[f"{layout}_p{i}_scan_frac"] = round(
                scanned / total_rows, 4
            )
    lo, hi = PREDS[1]
    for layout, path in paths.items():
        df = spark.read.parquet(path)

        def run(df=df):
            return df.filter(
                (F.col("k") >= lo) & (F.col("k") <= hi)
            ).count()

        sec, n = _timed(run)
        out[f"{layout}_narrow_count_s"] = round(sec, 4)
        out[f"{layout}_narrow_rows"] = int(n)
    out["n_rows"] = int(base_df.count())
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from gpi_etl_spark.session import get_spark

    spark = get_spark("scale_probe_zonemap")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    cents = li.select(
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("bigint")
        .alias("cents")
    )
    # 10x: five plain copies (duplicate keys) + five domain-shifted
    # copies (the key range grows with the data, zones narrow)
    shifted = [
        cents.select(
            (F.col("cents") + F.lit(i * 11_000_000)).alias("cents")
        )
        for i in range(5)
    ]
    big = cents
    for _ in range(4):
        big = big.unionByName(cents)
    for s in shifted:
        big = big.unionByName(s)
    root = tempfile.mkdtemp(prefix="gpi_zonemap_probe_")
    try:
        r1 = probe(spark, cents, "base", root)
        r10 = probe(spark, big, "x10", root)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "base": r1, "x10": r10}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
