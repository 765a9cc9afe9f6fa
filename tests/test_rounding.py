"""Cross-engine property pins for the 6-dp floor-scaling rule
(functions/rounding.py): Spark fs6, DuckDB fs6_sql and pure-Python
floor must agree on every double — especially the exact half-way
points where round(x, 6) is known to diverge between engines."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from gpi_etl_spark.functions.rounding import fs6, fs6_sql


def py_fs6(x: float) -> float:
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


#: the documented divergence class: exact m/2^k rationals whose 7th
#: decimal digit is 5 (85/128 = 0.6640625 is the ADVICE example)
HALFWAY = [85 / 128, 43 / 128, 15625 / 2000000, 0.0000005, 1.0000005]


def test_halfway_cases_duckdb_matches_python():
    con = duckdb.connect()
    for x in HALFWAY:
        got, = con.sql(
            "SELECT " + fs6_sql(f"CAST({x!r} AS DOUBLE)")
        ).fetchone()
        assert got == py_fs6(x), x


def test_halfway_cases_spark_matches_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(x,) for x in HALFWAY], "x double")
    got = [
        r.r for r in df.select(fs6(F.col("x")).alias("r")).orderBy("x").collect()
    ]
    want = [py_fs6(x) for x in sorted(HALFWAY)]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )
)
def test_duckdb_matches_python_everywhere(x):
    con = duckdb.connect()
    got, = con.sql("SELECT " + fs6_sql(f"CAST({x!r} AS DOUBLE)")).fetchone()
    assert got == py_fs6(x), x


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=0x2FFF), max_size=40))
def test_poly_hash_duckdb_matches_python(s):
    from gpi_etl_spark.functions import xhash

    con = duckdb.connect()
    # $1 positional binding (reused inside the fold SQL) sidesteps
    # string-literal escaping for control characters entirely
    got, = con.execute(
        "SELECT " + xhash.poly_hash_sql("$1"), [s]
    ).fetchone()
    want = xhash.SEED
    for ch in s:
        want = (want * xhash.B + ord(ch)) % xhash.P
    assert got == want, repr(s)
