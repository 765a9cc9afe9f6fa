"""Exact-value pins for the sketch-family registry queries.

The driver's correctness gate can only do a rows-only check for
q49/q51 (sketch outputs with no DuckDB twin), so for those two a
silent behavior change — IVF centroid literals, the sketch accuracy
knobs — would still pass the driver and this pin is the only exact
gate. q33/q34/q39/q115 are fully oracled since round 6; their pins
remain as a second, driver-independent drift detector. tests/fixtures/<query>.json freezes the
full canonical sf0.01 output (generated once by tools/pin_fixtures.py
under the same local[4]/4-shuffle-partition session this suite uses);
any drift fails here with a precise diff.
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
    "q49_ivf_topk",
    "q51_approx_sketches",
    "q115_bpe_merges",
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
