"""Pin expected-output fixtures for the sketch-family registry queries.

All pinned queries are fully DuckDB-oracled (q49/q51, the last
rows-only entries, were retired in round 7; q221's k-min-registers
sketch carries the approximate-distinct seat with a full oracle);
the pins stay as a second, driver-independent drift detector. This script freezes their full sf0.01 output
once, canonicalized exactly like ``tools/verify_local.py`` (sorted
columns, sorted rows, floats rounded to 6 dp), into
``tests/fixtures/<query>.json``; ``tests/test_pinned_fixtures.py``
asserts exact equality against the live engine every run.

The session config mirrors ``tests/conftest.py`` (local[4], 4 shuffle
partitions) so sketch aggregates whose merge order follows the
partition layout (percentile_approx) reproduce bit-identically.

Usage: python tools/pin_fixtures.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PINNED = [
    "q33_minhash_lsh",
    "q34_simhash",
    "q39_doc_fingerprint",
    "q115_bpe_merges",
    "q221_kmv_distinct",
]

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        return 0.0 if r == 0 else r  # -0.0 → 0.0
    if isinstance(v, (list, tuple)):
        return [canon_value(x) for x in v]
    if isinstance(v, (int, str)):
        return v
    return str(v)


def canon_rows(df):
    """Columns sorted by name, rows canonicalized and sorted."""
    cols = sorted(df.columns)
    rows = [
        [canon_value(r[c]) for c in cols]
        for r in df.select(*cols).collect()
    ]
    rows.sort(key=lambda row: json.dumps(row, sort_keys=True))
    return cols, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from gpi_etl_spark.queries import REGISTRY
    from gpi_etl_spark.session import get_spark

    spark = get_spark("pin_fixtures", master="local[4]", shuffle_partitions=4)
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name in PINNED:
        fn, _oracle = REGISTRY[name]
        cols, rows = canon_rows(fn(spark, sf_dir))
        path = os.path.join(FIXTURE_DIR, f"{name}.json")
        with open(path, "w") as fh:
            json.dump(
                {"query": name, "sf_dir": sf_dir, "columns": cols,
                 "n_rows": len(rows), "rows": rows},
                fh, indent=1, sort_keys=True,
            )
        print(f"pinned {name}: {len(rows)} rows -> {path}")


if __name__ == "__main__":
    main()
