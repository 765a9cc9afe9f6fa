"""Scale probe: drift detectors' map-side collapse.

The claim in operators/drift.py is that both detectors shuffle COUNTS
at (group, distinct-value|bin) grain, never raw rows — the first
groupBy collapses map-side, so the per-group window (KS) / fold (PSI)
input is value-cardinality-bounded while the scan grows with volume.

The probe replicates the events table 1× / 4× / 10× WITHOUT adding new
values (union of shifted-id copies — the monitoring steady state where
volume grows but the value domain doesn't) and measures, per scale:
the raw row count, the post-collapse row count that actually reaches
the window/fold (the structural metric), and wall time of the shipped
operators. A STRAWMAN KS that windows raw rows (cumulative counts over
every event, the pre-collapse shape) runs alongside and is asserted to
produce the same D numerators — same statistic, linearly worse window
input.

Usage: python tools/scale_probe_drift.py [sf_dir] [--doc]
Prints one JSON line; with --doc rewrites docs/DRIFT_PROBE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _strawman_ks(df, group_col, value_col, seg_col="seg"):
    """KS with the window over RAW rows: per-row cumulative segment
    counts, CDF difference taken at the LAST row of each tie run (the
    correct tie treatment, kept so the statistic matches the shipped
    op exactly — only the window input size differs)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    wcum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    wtie = Window.partitionBy(group_col, value_col)
    stepped = df.select(
        group_col,
        value_col,
        F.sum(F.when(F.col(seg_col) == "a", 1).otherwise(0))
        .over(wcum)
        .alias("cum_a"),
        F.sum(F.when(F.col(seg_col) == "b", 1).otherwise(0))
        .over(wcum)
        .alias("cum_b"),
        F.sum(F.when(F.col(seg_col) == "a", 1).otherwise(0))
        .over(wall)
        .alias("n_a"),
        F.sum(F.when(F.col(seg_col) == "b", 1).otherwise(0))
        .over(wall)
        .alias("n_b"),
    )
    # keep only each tie run's final row (both segments absorbed)
    closed = stepped.withColumn(
        "_max_cum", F.max(F.col("cum_a") + F.col("cum_b")).over(wtie)
    ).filter(F.col("cum_a") + F.col("cum_b") == F.col("_max_cum"))
    return (
        closed.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .groupBy(group_col)
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_b")
                    - F.col("cum_b") * F.col("n_a")
                )
            ).alias("d_num")
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    write_doc = "--doc" in sys.argv

    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.drift import (
        hash_segment,
        ks_two_sample,
        psi_drift,
    )
    from gpi_etl_spark.queries import t
    from gpi_etl_spark.session import get_spark

    spark = get_spark("drift_probe")
    base = t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )

    def replicate(times: int):
        parts = [
            base.select(
                (F.col("event_id") + F.lit(i * 10_000_000)).alias(
                    "event_id"
                ),
                "event_type",
                "value",
            )
            for i in range(times)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.withColumn(
            "seg", hash_segment(F.col("event_id"))
        ).localCheckpoint(eager=True)

    # untimed warm-up (codegen/JIT)
    _w = replicate(1)
    ks_two_sample(_w, "event_type", "value").write.format("noop").mode(
        "overwrite"
    ).save()
    psi_drift(_w, "event_type", "value").write.format("noop").mode(
        "overwrite"
    ).save()
    _strawman_ks(_w, "event_type", "value").write.format("noop").mode(
        "overwrite"
    ).save()

    results = {}
    for times in (1, 4, 10):
        df = replicate(times)
        n_rows = df.count()
        collapsed = df.groupBy("event_type", "value").count().count()
        n_bins = (
            df.withColumn(
                "_bin", F.floor(F.col("value") / 50.0).cast("int")
            )
            .groupBy("event_type", "_bin")
            .count()
            .count()
        )
        t0 = time.time()
        ks = ks_two_sample(df, "event_type", "value")
        ks.write.format("noop").mode("overwrite").save()
        t_ks = round(time.time() - t0, 3)
        t0 = time.time()
        psi_drift(df, "event_type", "value").write.format("noop").mode(
            "overwrite"
        ).save()
        t_psi = round(time.time() - t0, 3)
        t0 = time.time()
        straw = _strawman_ks(df, "event_type", "value")
        straw.write.format("noop").mode("overwrite").save()
        t_straw = round(time.time() - t0, 3)
        shipped_d = {
            r["event_type"]: r["d_num"] for r in ks.collect()
        }
        straw_d = {r["event_type"]: r["d_num"] for r in straw.collect()}
        assert shipped_d == straw_d, (
            f"strawman disagrees at x{times}: {shipped_d} vs {straw_d}"
        )
        results[f"x{times}"] = {
            "rows": n_rows,
            "window_rows_shipped": collapsed,
            "window_rows_strawman": n_rows,
            "psi_fold_rows": n_bins,
            "t_ks": t_ks,
            "t_psi": t_psi,
            "t_ks_strawman": t_straw,
        }

    out = {"probe": "drift", "sf_dir": sf_dir, "results": results}
    print(json.dumps(out))
    if write_doc:
        r1, r10 = results["x1"], results["x10"]
        with open("/root/repo/docs/DRIFT_PROBE.md", "w") as fh:
            fh.write(f"""# Drift probe — map-side collapse of KS / PSI

`python tools/scale_probe_drift.py {sf_dir} --doc`

The events table is replicated 1× / 4× / 10× with shifted ids and an
UNCHANGED value domain (the monitoring steady state: volume grows,
distinct values don't). The structural metric is the row count that
reaches the per-group window (KS) or fold (PSI) AFTER the first
map-side-combined groupBy; a strawman KS that windows raw rows runs
alongside and is asserted to produce identical D numerators.

| volume | raw rows | window input (shipped) | window input (strawman) | PSI fold rows | t KS | t KS strawman | t PSI |
|---|---|---|---|---|---|---|---|
""")
            for times in (1, 4, 10):
                r = results[f"x{times}"]
                fh.write(
                    f"| {times}× | {r['rows']:,} "
                    f"| {r['window_rows_shipped']:,} "
                    f"| {r['window_rows_strawman']:,} "
                    f"| {r['psi_fold_rows']:,} "
                    f"| {r['t_ks']} s | {r['t_ks_strawman']} s "
                    f"| {r['t_psi']} s |\n"
                )
            ratio = round(
                r10["window_rows_strawman"]
                / max(r10["window_rows_shipped"], 1),
                1,
            )
            growth = round(
                r10["window_rows_shipped"]
                / max(r1["window_rows_shipped"], 1),
                2,
            )
            fh.write(f"""
Reading: at 10× volume the shipped KS orders {ratio}× fewer rows than
the raw-row strawman, and the shipped window input grew only
{growth}× while raw rows grew 10× — the collapse tracks distinct
(type, value) pairs, which saturate as volume grows over a fixed
domain. PSI's fold input is the bin frame (~10 per type) at every
volume. At 100 TB the same shape holds with the collapse happening
map-side: the shuffle carries counts, the sort is over the value
domain, and the raw-row strawman — whose window input is the corpus —
is the thing this operator exists to avoid.
""")


if __name__ == "__main__":
    main()
