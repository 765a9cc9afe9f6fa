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
    s_expected = amax / 127.0
    if s_expected == 0.0:
        # zero vector, OR subnormal amax whose scale underflows to 0.0
        # — both fall back to scale 1 (and the codes round to 0)
        assert r.qscale == 1.0 and all(c == 0 for c in r.q)
        return
    assert math.isclose(r.qscale, s_expected, rel_tol=1e-12)
    for v, c in zip(vec, r.q):
        assert -127 <= c <= 127
        assert abs(v - c * r.qscale) <= r.qscale / 2 + 1e-9


def test_quantization_subnormal_regression(spark):
    """Pinned regression for the round-4 DIVIDE_BY_ZERO crash: amax in
    the double-subnormal range (< ~6.4e-322) makes amax/127.0 underflow
    to exactly 0.0, so the old guard (amax > 0) passed a zero scale
    into x/scale and ANSI mode killed the job. The fixed guard tests
    the computed scale itself and falls back to scale 1."""
    from gpi_etl_spark.operators.similarity import quantize_embeddings

    cases = [
        (1, [5e-324]),
        (2, [-1e-310, 1e-310]),
        (3, [0.0, -5e-324, 0.0]),
    ]
    df = spark.createDataFrame(
        cases, "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    # vec 1 and 3: amax/127.0 underflows to exactly 0.0 → scale-1
    # fallback, all-zero codes (the old guard crashed here)
    for vid in (1, 3):
        assert rows[vid].qscale == 1.0
        assert all(c == 0 for c in rows[vid].q)
    # vec 2: amax/127.0 is subnormal but NONZERO (≈7.87e-313) — it
    # must quantize normally, not fall back
    r2 = rows[2]
    assert 0.0 < r2.qscale < 1e-300
    assert list(r2.q) == [-127, 127]


def test_quantized_topk_subnormal_query(spark):
    """The driver-side quantizer in quantized_topk shares the guard:
    a subnormal query vector must not raise ZeroDivisionError."""
    from gpi_etl_spark.operators.similarity import quantized_topk

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    rows = quantized_topk(df, [5e-324, -5e-324], k=2).collect()
    assert len(rows) == 2
    assert all(r.qcos == 0.0 for r in rows)
