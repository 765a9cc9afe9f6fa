"""Sign-random-projection codes in literal-matrix (oracle) mode."""

from __future__ import annotations

import math


def _numpy_codes(vecs, signs):
    codes = {}
    for vid, v in vecs:
        code = 0
        for p, row in enumerate(signs):
            acc = 0.0
            for x, s in zip(v, row):
                acc = acc + x * s
            if math.floor(acc * 1000000.0 + 0.5) / 1000000.0 >= 0:
                code |= 1 << p
        codes[vid] = code
    return codes


def test_sign_matrix_is_stable_and_balanced():
    from gpi_etl_spark.operators.similarity import srp_sign_matrix

    m1 = srp_sign_matrix(8, 16)
    m2 = srp_sign_matrix(8, 16)
    assert m1 == m2  # seeded PRNG: identical across calls/processes
    flat = [s for row in m1 for s in row]
    assert set(flat) == {1.0, -1.0}
    # a degenerate generator (all same sign, or identical rows) would
    # collapse the code space — the measured failure mode of the weak
    # closed-form bit source this matrix replaced.
    assert 0.3 < (sum(1 for s in flat if s > 0) / len(flat)) < 0.7
    assert len({tuple(r) for r in m1}) == len(m1)


def test_codes_match_in_order_fold_reference(spark):
    from gpi_etl_spark.operators.similarity import (
        random_hyperplane_lsh,
        srp_sign_matrix,
    )

    dim, planes = 12, 16
    vecs = [
        (i, [math.sin(i * 31 + j) for j in range(dim)]) for i in range(40)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    signs = srp_sign_matrix(planes, dim)
    got = {
        r.vec_id: r.bucket
        for r in random_hyperplane_lsh(
            df, n_planes=planes, dim=dim, signs=signs
        ).collect()
    }
    assert got == _numpy_codes(vecs, signs)


def test_similar_vectors_get_near_codes(spark):
    """A vector and a tiny perturbation of it must land within a few
    bits; an unrelated vector must sit much farther — the SRP
    locality property the banded join exploits."""
    from gpi_etl_spark.operators.similarity import (
        random_hyperplane_lsh,
        srp_sign_matrix,
    )

    dim, planes = 32, 32
    base = [math.cos(j * 0.7) for j in range(dim)]
    near = [x + 0.001 * ((j % 3) - 1) for j, x in enumerate(base)]
    far = [math.sin(j * 2.3 + 1) for j in range(dim)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)],
        "vec_id long, embedding array<double>",
    )
    signs = srp_sign_matrix(planes, dim)
    codes = {
        r.vec_id: r.bucket
        for r in random_hyperplane_lsh(
            df, n_planes=planes, dim=dim, signs=signs
        ).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(codes[0], codes[1]) <= 2
    assert ham(codes[0], codes[2]) >= 8
