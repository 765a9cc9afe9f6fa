"""Registry-wide DECIMAL gate-column guard (round 10).

The three-round q211/q233 lesson, made a mechanical invariant: q211
was driver-red for exactly as long as its gate row carried a
decimal(18,2) column and cured the round it became int64 cents
(round 9); q233/q237 — the only remaining decimal emitters across the
248-query registry — were the only remaining reds, and round 10
re-gated them as BIGINT + mod-P residue. The per-value
canonicalization of DECIMAL between the driver's Spark and DuckDB
fetch paths is the one surface the gate cannot see into, so NO gated
query may emit a decimal-typed output column, at any nesting depth.
DECIMAL stays welcome INTERNALLY (vectorstats keeps exact
decimal(38,0) moments); only the driver-hashed schema is constrained.

The whitelist is EMPTY since round 11. Its single-ever member,
q251_decimal_probe, emitted constant decimal literals precisely so the
driver's row would prove/falsify the column-class diagnosis; the r10
driver row came back rows/schema-match + hash-mismatch — the predicted
red — converting the diagnosis into a measurement. The probe was then
retired from the gated registry (q49/q51 precedent; tombstone in
gpi_etl_spark/queries.py, history in docs/ROUND11_NOTES.md). Nothing
may re-enter the whitelist without an equally deliberate experiment.
"""

import os

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

#: empty since round 11 — NO gated query may emit a decimal column
WHITELIST: set[str] = set()


def _decimal_paths(dt, path=""):
    """Every dotted path inside ``dt`` holding a DecimalType."""
    hits = []
    if isinstance(dt, T.DecimalType):
        hits.append(path or "<root>")
    elif isinstance(dt, T.StructType):
        for f in dt.fields:
            hits.extend(
                _decimal_paths(f.dataType, f"{path}.{f.name}".lstrip("."))
            )
    elif isinstance(dt, T.ArrayType):
        hits.extend(_decimal_paths(dt.elementType, path + "[]"))
    elif isinstance(dt, T.MapType):
        hits.extend(_decimal_paths(dt.keyType, path + "<key>"))
        hits.extend(_decimal_paths(dt.valueType, path + "<value>"))
    return hits


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_no_gated_query_emits_decimal(spark):
    offenders = {}
    for name, fn in entry.queries().items():
        if name in WHITELIST:
            continue
        df = fn(spark, SF_DIR)
        hits = _decimal_paths(df.schema)
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "gated queries emitting DECIMAL output columns (the q211/q233 "
        f"driver-red class — re-gate as BIGINT/mod-P): {offenders}"
    )


def test_probe_stays_retired():
    """The q251 probe delivered its measurement in the r10 driver lane
    and was retired; a re-registration would re-introduce a
    permanently-red row into every future round's driver file."""
    assert "q251_decimal_probe" not in entry.queries()
    assert "q251_decimal_probe" not in entry.oracle_sql()
    assert not WHITELIST, "whitelist must stay empty (see module doc)"
