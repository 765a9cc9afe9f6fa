"""Property-based checks (hypothesis) for the numeric layout/profile
operators: Z-order interleave must round-trip bit-exactly against a
pure-Python mirror, histograms must conserve row counts, and int8
quantization must respect its error bound for arbitrary vectors —
not just the fixture values the unit tests chose.

These drive the SPARK expressions through a real session per case
batch (one createDataFrame per example set, kept small on purpose).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=12, deadline=None)
def test_zorder_matches_python_mirror(spark, pts):
    from gpi_etl_spark.operators.sinklayout import zorder_key

    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select(
        "x", "y", zorder_key("x", "y", bits=10).alias("z")
    ).collect()
    for r in got:
        assert r.z == py_morton(r.x, r.y, 10)


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    ),
    bins=st.integers(1, 12),
)
@settings(max_examples=12, deadline=None)
def test_histogram_conserves_rows(spark, vals, bins):
    from gpi_etl_spark.operators.quality import histogram

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = histogram(df, "x", bins=bins).collect()
    # auto-ranged: every row lands in some bin
    assert sum(r.n for r in rows) == len(vals)
    assert all(0 <= r.bin < bins for r in rows)


@given(
    vec=st.lists(
        st.floats(
            min_value=-100,
            max_value=100,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=12, deadline=None)
def test_quantization_error_bound(spark, vec):
    from gpi_etl_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [float(v) for v in vec])], "vec_id long, embedding array<double>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert len(r.q) == len(vec)
    amax = max(abs(v) for v in vec)
    if amax == 0:
        assert r.qscale == 1.0 and all(c == 0 for c in r.q)
        return
    assert math.isclose(r.qscale, amax / 127.0, rel_tol=1e-12)
    for v, c in zip(vec, r.q):
        assert -127 <= c <= 127
        assert abs(v - c * r.qscale) <= r.qscale / 2 + 1e-9
