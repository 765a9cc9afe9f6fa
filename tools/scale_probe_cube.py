"""Scale probe: kmv_rollup sketch cube vs exact GROUPING SETS
COUNT(DISTINCT) — wall time and error at a 10× orders table.

q242's sketch cube is correctness-proven (full DuckDB hash gate +
the rollup-law test); what it has NOT had is a measured cost
envelope. The honest question for the 100 TB design: the exact cube
is ONE Spark job whose Expand operator multiplies rows by the level
count before the exchange, while the sketch path explodes k
registers per row at BUILD time — when does answering levels from
registers actually win?

Measured here, same stream, same partitioning, warm (median of 3):

1. exact `cube().agg(countDistinct)` — Spark's one-job Expand plan
   (the thing the cube replaces),
2. exact as 4 SEPARATE per-level countDistinct jobs (the rescan-per-
   level pattern a report suite without grouping sets runs),
3. kmv_build(k=64, xxhash64 production mode) at the finest grain +
   kmv_rollup over all 4 levels — the COLD path (sketch built just
   for this answer),
4. kmv_rollup alone over a PERSISTED register table — the MARGINAL
   path (the register table already exists: yesterday's build plus a
   kmv_merge, or a build shared across report queries), which is the
   cost a production cube actually pays per refresh.

Stream: orders at the given sf_dir, unioned 10× with the custkey
space shifted per copy (copies 0-4 keep base ids — duplicates;
copies 5-9 shift to disjoint ranges — new distincts), so the 10×
table grows distinct customers 6× and the rollup is exercised on
growth, not just volume.

Usage: python tools/scale_probe_cube.py [sf_dir] [--doc]
Prints one JSON line; with --doc rewrites docs/CUBE_PROBE.md.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

GCOLS = ("o_orderstatus", "o_orderpriority")
SETS = (GCOLS, (GCOLS[0],), (GCOLS[1],), ())


def _timed(fn, runs: int = 3) -> tuple[float, object]:
    vals, out = [], None
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        vals.append(time.time() - t0)
    return statistics.median(vals), out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    write_doc = "--doc" in sys.argv

    from gpi_etl_spark import queries as Q
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_rollup
    from gpi_etl_spark.session import get_spark

    spark = get_spark("cube_probe", master="local[32]",
                      shuffle_partitions=32)
    o = Q.t(spark, sf_dir, "orders").select(
        *GCOLS, F.col("o_custkey").alias("cust")
    )
    copies = [
        o.withColumn(
            "cust",
            F.col("cust") + F.lit(0 if c < 5 else (c - 4) * 100_000_000),
        )
        for c in range(10)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big = big.withColumn("cust", F.col("cust").cast("string"))
    big = big.localCheckpoint(eager=True)
    n_rows = big.count()

    t_cube, cube_rows = _timed(
        lambda: big.cube(*GCOLS)
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.countDistinct("cust").alias("d"),
        )
        .collect()
    )
    exact = {(r.o_orderstatus, r.o_orderpriority, r.gid): r.d
             for r in cube_rows}

    def per_level():
        out = []
        for s in SETS:
            keep = [c for c in GCOLS if c in s]
            gid = sum(
                1 << (len(GCOLS) - 1 - p)
                for p, c in enumerate(GCOLS) if c not in s
            )
            rows = (
                big.groupBy(*keep)
                .agg(F.countDistinct("cust").alias("d"))
                .collect()
            )
            out.extend(
                (
                    getattr(r, GCOLS[0], None) if GCOLS[0] in keep else None,
                    getattr(r, GCOLS[1], None) if GCOLS[1] in keep else None,
                    gid,
                    r.d,
                )
                for r in rows
            )
        return out

    t_levels, _ = _timed(per_level)

    def cold():
        sk = kmv_build(
            big, "cust", group_cols=GCOLS, k=64, hash_mode="xxhash64"
        )
        return kmv_rollup(sk, GCOLS, SETS).collect()

    t_cold, cold_rows = _timed(cold)

    sk = kmv_build(
        big, "cust", group_cols=GCOLS, k=64, hash_mode="xxhash64"
    ).localCheckpoint(eager=True)
    reg_rows = sk.count()
    t_marginal, marg_rows = _timed(
        lambda: kmv_rollup(sk, GCOLS, SETS).collect()
    )

    def err(rows):
        es = []
        for r in rows:
            key = (r.o_orderstatus, r.o_orderpriority, r.gid)
            es.append(abs(r.est - exact[key]) / exact[key])
        return max(es)

    result = {
        "metric": "cube_sketch_vs_exact",
        "sf_dir": sf_dir,
        "rows": n_rows,
        "register_rows": reg_rows,
        "distinct_total": int(exact[(None, None, 3)]),
        "exact_cube_sec": round(t_cube, 3),
        "exact_per_level_sec": round(t_levels, 3),
        "kmv_cold_sec": round(t_cold, 3),
        "kmv_marginal_sec": round(t_marginal, 3),
        "kmv_maxerr": round(err(cold_rows), 4),
        "kmv_marginal_maxerr": round(err(marg_rows), 4),
    }
    print(json.dumps(result))

    if write_doc:
        doc = f"""# Sketch-cube probe — kmv_rollup vs exact GROUPING SETS

`python tools/scale_probe_cube.py {sf_dir} --doc`

Stream: orders at `{sf_dir}` unioned 10× ({n_rows:,} rows; copies
5-9 shift the custkey space to disjoint ranges, growing distinct
customers to {result["distinct_total"]:,}). local[32], warm median
of 3, identical localCheckpointed input for every contender. The
register table is {reg_rows:,} rows (15 finest groups × k=64).

| contender | sec | max rel err |
|---|---|---|
| exact cube (one Expand job) | {result["exact_cube_sec"]} | 0 |
| exact, 4 separate level jobs | {result["exact_per_level_sec"]} | 0 |
| kmv build + rollup (cold) | {result["kmv_cold_sec"]} | {result["kmv_maxerr"]} |
| kmv rollup only (registers persisted) | {result["kmv_marginal_sec"]} | {result["kmv_marginal_maxerr"]} |

## Operating rule

The sketch cube does NOT beat Spark's one-job Expand cube when built
from scratch for a single answer — the k-register posexplode at
build time costs more than Expand's level-count row multiplier
(4 levels here vs k=64 registers). Where it wins, and the reason
q242 exists:

1. **Marginal refreshes.** Once the register table is materialized
   (a daily build merged via kmv_merge — the q238 pattern), EVERY
   rollup refresh costs the marginal row above: a re-aggregation of
   a {reg_rows:,}-row table, independent of corpus size. The exact
   cube pays the full corpus shuffle on every refresh, forever.
2. **Level counts that outgrow Expand.** Expand's pre-exchange row
   multiplier is the number of grouping sets: a 4-dim cube is 16
   levels (16× the shuffle), 6 dims is 64×. The register table
   answers ANY level set at the same marginal cost.
3. **Cross-day / cross-engine composition.** The registers merge
   across partitions, days and engines (poly mode replays in
   DuckDB); exact distinct counts compose across nothing.

The same verdict as docs/KMV_PROBE.md, lifted to the lattice: pay
the sketch build once because it is a reusable, mergeable asset —
never as a one-shot shortcut.
"""
        with open("/root/repo/docs/CUBE_PROBE.md", "w") as fh:
            fh.write(doc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
