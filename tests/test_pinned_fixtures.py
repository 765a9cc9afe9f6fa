"""Exact-value pins for the sketch-family registry queries.

Every pinned query is fully DuckDB-oracled since round 6 (q49/q51,
the last rows-only entries, were retired in round 7 — q221's
k-min-registers sketch took the approximate-distinct seat WITH a full
oracle); these pins remain as a second, driver-independent drift
detector. tests/fixtures/<query>.json freezes the full canonical
sf0.01 output (generated once by tools/pin_fixtures.py under the same
local[4]/4-shuffle-partition session this suite uses); any drift
fails here with a precise diff.
"""

from __future__ import annotations

import json
import os

import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
SF_DIR = "/root/testdata/sf0.01"

PINNED = [
    "q33_minhash_lsh",
    "q34_simhash",
    "q39_doc_fingerprint",
    "q115_bpe_merges",
    "q221_kmv_distinct",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="sf0.01 testdata not present"
)


@pytest.mark.parametrize("name", PINNED)
def test_pinned_output_exact(spark, name):
    from gpi_etl_spark.queries import REGISTRY
    from tools.pin_fixtures import canon_rows

    path = os.path.join(FIXTURE_DIR, f"{name}.json")
    with open(path) as fh:
        expected = json.load(fh)

    fn, _oracle = REGISTRY[name]
    cols, rows = canon_rows(fn(spark, SF_DIR))

    assert cols == expected["columns"]
    assert len(rows) == expected["n_rows"]
    # first mismatch reported precisely rather than one giant list diff
    for i, (got, want) in enumerate(zip(rows, expected["rows"])):
        assert got == want, f"{name} row {i}: {got} != {want}"
