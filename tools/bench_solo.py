"""Solo re-measure of individual bench entries (the lane-transient
disposition tool the r8/r9 verdicts asked for by name).

The 81-entry bench lane runs on a shared box: CPU steal and cache
pressure produce 1.5-4x single-query transients with zero code change
(documented across rounds 7-9 in docs/ROUND*_NOTES.md). The
established discipline: a lane mover with no code change gets a SOLO
re-measure — each entry in its OWN fresh process, preceded by one
untimed q01 JVM warm-up and a timed q01 anchor, so the verdict can
compare anchored ratios (cold/q01-cold) rather than raw seconds.

Usage:
    python tools/bench_solo.py q210_shortest_paths q209_naive_bayes
    python tools/bench_solo.py --child <name>   # internal per-process

Prints one JSON line per entry:
    {"name", "anchor_min", "cold", "warm_min", "warms", "ratio_warm"}
where ratio_warm = warm_min/anchor_min (BOTH minima over the repeat
set — the steady-state anchored ratio; the single fresh-process cold
number is reported raw and is NOT comparable to lane colds, which run
mid-lane with a warm JIT).

Names accept registry entries plus the bench-only twins from
bench._extra_entries (q161_persist, q33_xxhash64 variants).
"""

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _entries():
    import bench
    from gpi_etl_spark import queries as Q

    ents = {n: fn for n, (fn, _sql) in Q.REGISTRY.items()}
    ents.update(bench._extra_entries())
    return ents


def _child(name: str, repeats: int) -> None:
    from gpi_etl_spark import queries as Q
    from gpi_etl_spark.session import get_spark

    fn = _entries()[name]
    spark = get_spark("gpi_bench_solo")

    def run(f):
        t0 = time.time()
        f(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    q01 = Q.REGISTRY["q01_pricing_summary"][0]
    run(q01)  # untimed JVM warm-up, same as bench.py
    anchors = [run(q01) for _ in range(max(1, repeats))]
    cold = run(fn)
    warms = [run(fn) for _ in range(max(1, repeats))]
    # min over repeats is the noise-floor estimator: load transients
    # only ever ADD time, so the minimum is the steady-state number
    print(json.dumps({
        "name": name, "anchor_min": min(anchors), "cold": cold,
        "warm_min": min(warms), "warms": warms,
        "ratio_warm": round(min(warms) / min(anchors), 3),
    }))


def main() -> None:
    argv = sys.argv[1:]
    repeats = 5
    if "--repeats" in argv:
        i = argv.index("--repeats")
        repeats = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if argv[:1] == ["--child"]:
        _child(argv[1], repeats)
        return
    if not argv:
        sys.exit("usage: bench_solo.py [--repeats N] <entry-name> [...]")
    known = _entries()
    for name in argv:
        if name not in known:
            sys.exit(f"unknown bench entry {name!r}")
    for name in argv:
        out = subprocess.run(
            [sys.executable, __file__, "--child", name,
             "--repeats", str(repeats)],
            capture_output=True, text=True, cwd=REPO,
        )
        line = (out.stdout.strip().splitlines() or ["<no output>"])[-1]
        if out.returncode != 0:
            print(f"{name}: FAILED rc={out.returncode}")
            print(out.stderr[-2000:])
            continue
        print(line)


if __name__ == "__main__":
    main()
