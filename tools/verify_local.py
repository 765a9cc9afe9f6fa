"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry through Spark and its ``oracle_sql()``
through DuckDB on the same parquet (default sf0.01), then compares
row count, column names, and order-insensitive values (floats rounded
to 6 dp). Prints one line per query + a summary; exits nonzero on any
mismatch. Usage:

    python tools/verify_local.py [sf_dir] [only_query_prefixes]

``only_query_prefixes`` is comma-separated; a query runs if its name
starts with ANY of the prefixes (e.g. ``q01_,q26_,q158_``).
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = [p for p in (sys.argv[2] if len(sys.argv) > 2 else "").split(",") if p]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def main() -> int:
    from __spark_entry__ import oracle_sql, queries
    from gpi_etl_spark.session import get_spark

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if ONLY and not any(name.startswith(p) for p in ONLY):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            if len(s_rows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        problems = []
        if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, d_cols)):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sv, dv = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
            if sv != dv:
                diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok   {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
