"""vectorstats: exact covariance vs numpy, PCA recovery of planted
structure, fixed-order projection, and partitioning invariance."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gpi_etl_spark.operators.vectorstats import (
    covariance_matrix,
    pca_components,
    pca_project,
)


def _blob(n: int, d: int) -> np.ndarray:
    """Deterministic anisotropic cloud: variance concentrated on a
    planted axis plus small structured noise — no RNG."""
    ts = np.arange(n, dtype=np.float64)
    axis = np.array([math.cos(0.3 * k) for k in range(d)])
    axis /= np.linalg.norm(axis)
    base = np.outer(np.sin(ts * 0.7), axis) * 3.0
    noise = np.array(
        [[math.sin(0.11 * (i * d + k) + 0.5) * 0.2 for k in range(d)]
         for i in range(n)]
    )
    return base + noise


@pytest.fixture(scope="module")
def blob_df(spark):
    d = 8
    x = _blob(300, d)
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(7), x


def test_covariance_matches_numpy(spark, blob_df):
    df, x = blob_df
    d = x.shape[1]
    got = {
        (r.i, r.j): (r.cov_r, r.corr_r)
        for r in covariance_matrix(df, "embedding", d).collect()
    }
    assert len(got) == d * (d + 1) // 2
    # the engine quantizes float32 storage to micro-units, so compare
    # against numpy over the SAME quantized float32 values
    xq = np.floor(x.astype(np.float32).astype(np.float64) * 1e6 + 0.5) / 1e6
    ref_cov = np.cov(xq, rowvar=False, bias=True)
    ref_corr = np.corrcoef(xq, rowvar=False)
    for (i, j), (cov_r, corr_r) in got.items():
        assert abs(cov_r - ref_cov[i][j]) < 1e-5, (i, j)
        assert abs(corr_r - ref_corr[i][j]) < 1e-5, (i, j)


def test_covariance_is_partitioning_invariant(spark, blob_df):
    df, x = blob_df
    a = sorted(
        tuple(r)
        for r in covariance_matrix(df.coalesce(1), "embedding", 4).collect()
    )
    b = sorted(
        tuple(r)
        for r in covariance_matrix(
            df.repartition(13), "embedding", 4
        ).collect()
    )
    assert a == b  # exact integers: bit-identical, not merely close


def test_pca_recovers_planted_axis_and_projects(spark, blob_df):
    df, x = blob_df
    d = x.shape[1]
    comps, ratio = pca_components(df, "embedding", d)
    assert len(comps) == d and len(ratio) == d
    assert ratio == sorted(ratio, reverse=True)
    assert ratio[0] > 0.9  # one planted axis dominates
    # leading axis ≈ the planted direction (up to the fixed sign rule)
    axis = np.array([math.cos(0.3 * k) for k in range(d)])
    axis /= np.linalg.norm(axis)
    lead = np.array(comps[0])
    assert abs(abs(float(np.dot(lead, axis))) - 1.0) < 1e-3

    proj = pca_project(df, "embedding", comps, k=2)
    rows = {r.vec_id: r.pc for r in proj.collect()}
    xf32 = x.astype(np.float32).astype(np.float64)
    ref = xf32 @ np.array(comps[:2]).T
    for i, pc in rows.items():
        assert abs(pc[0] - ref[i][0]) < 1e-4
        assert abs(pc[1] - ref[i][1]) < 1e-4
    # scores along pc1 carry (far) more spread than pc2
    v1 = np.var([pc[0] for pc in rows.values()])
    v2 = np.var([pc[1] for pc in rows.values()])
    assert v1 > 10 * v2
