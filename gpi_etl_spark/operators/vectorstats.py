"""Exact second-moment statistics over embedding columns — the
covariance/correlation substrate for whitening, feature diagnostics
and PCA on vector corpora.

Float covariance is classically an order-dependent float sum (useless
under a cross-engine hash gate and irreproducible across retries at
scale). Here every moment is EXACT integer arithmetic instead: each
component floor-scales to integer micro-units q = floor(x·10⁶ + 0.5)
(the repo's cross-engine-safe rounding — float→double widening is
exact, and both engines floor the identical double), pair products
stay inside int64 (|q| ≤ 10⁶·|x|_max), and the sums accumulate in
decimal(38,0), so Σq, Σq² and Σq_iq_j are bit-identical integers on
any engine, any row order, any partitioning. The centered numerators
use the n·Σxy − Σx·Σy identity (the q194/q216 int-moment pattern):

    cov_ij  = (n·Σq_iq_j − Σq_i·Σq_j) / (n²·10¹²)
    corr_ij = cov_num_ij / sqrt(cov_num_ii · cov_num_jj)   (scale cancels)

Value bounds (documented, asserted nowhere hot): with |x| ≤ 10 and
n ≤ 10⁹ rows every intermediate fits decimal(38,0) through the
decimal(9,0)×decimal(28,0) and decimal(14,0)×decimal(14,0) products
used below — no silent precision-loss rescale, no overflow-to-NULL.

100 TB shape: ONE scan explodes each row into its d(d+1)/2 upper-
triangle pair products and map-side combines, so the wire carries
≤ pairs-per-partition rows, never the corpus; a second tiny aggregate
carries the d per-dim sums. PCA on top (``pca_components`` /
``pca_project``) is bounded model state: the d×d covariance collects
to the driver ONCE (d², independent of rows), numpy solves the
symmetric eigenproblem, and the projection is a codegen'd fixed-order
dot-product expression over literal components — no Python on the
data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpi_etl_spark.functions.hof import let_
from gpi_etl_spark.functions.rounding import fs6

#: micro-unit quantization scale (10⁶ ⇒ cov denominator 10¹²)
Q_SCALE = 1_000_000.0


def _quantized(vec_col: str, dims: int):
    """array<long> of the first ``dims`` components in micro-units."""
    return F.transform(
        F.slice(F.col(vec_col), 1, dims),
        lambda x: F.floor(
            x.cast("double") * F.lit(Q_SCALE) + F.lit(0.5)
        ).cast("long"),
    )


def covariance_matrix(
    df: DataFrame, vec_col: str, dims: int
) -> DataFrame:
    """Exact population covariance + correlation of the first ``dims``
    vector components. Returns one row per upper-triangle pair
    ``(i, j)`` with ``i ≤ j``: n, the exact integer numerator
    ``cov_num`` (decimal(38,0)), ``cov_r`` (6-dp floor-scaled) and
    ``corr_r`` (sqrt is transcendental → round 6)."""
    d = dims
    pairs_per_row = let_(
        _quantized(vec_col, d),
        lambda q: F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: F.transform(
                    F.sequence(i, F.lit(d - 1)),
                    lambda j: F.struct(
                        i.cast("int").alias("i"),
                        j.cast("int").alias("j"),
                        (F.element_at(q, i + 1) * F.element_at(q, j + 1))
                        .alias("p"),
                    ),
                ),
            )
        ),
    )
    spq = (
        df.select(F.explode(pairs_per_row).alias("e"))
        .select("e.i", "e.j", "e.p")
        .groupBy("i", "j")
        .agg(F.sum(F.col("p").cast("decimal(38,0)")).alias("spq"))
    )
    dim_sums = (
        df.select(
            F.posexplode(_quantized(vec_col, d)).alias("i", "q")
        )
        .groupBy(F.col("i").cast("int").alias("i"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("q").cast("bigint").alias("sx"),
            F.sum(
                (F.col("q") * F.col("q")).cast("decimal(38,0)")
            ).alias("sxx"),
        )
    )

    def num(n, spq_c, sx_a, sx_b):
        # decimal(9,0)×decimal(28,0) → (38,0) and (14,0)×(14,0) →
        # (29,0): widths chosen so no product hits Spark's precision
        # cap (which would silently rescale) — see module docstring
        return n.cast("decimal(9,0)") * spq_c.cast("decimal(28,0)") - (
            sx_a.cast("decimal(14,0)") * sx_b.cast("decimal(14,0)")
        )

    di = F.broadcast(dim_sums).alias("di")
    dj = F.broadcast(
        dim_sums.select(
            F.col("i").alias("j"),
            F.col("sx").alias("sx_j"),
            F.col("sxx").alias("sxx_j"),
        )
    ).alias("dj")
    joined = spq.join(di, "i").join(dj, "j")
    cov_num = num(F.col("n"), F.col("spq"), F.col("sx"), F.col("sx_j"))
    var_i = num(F.col("n"), F.col("sxx"), F.col("sx"), F.col("sx"))
    var_j = num(F.col("n"), F.col("sxx_j"), F.col("sx_j"), F.col("sx_j"))
    n_d = F.col("n").cast("double")
    return joined.select(
        "i",
        "j",
        "n",
        cov_num.cast("decimal(38,0)").alias("cov_num"),
        fs6(
            cov_num.cast("double")
            / (n_d * n_d * F.lit(Q_SCALE * Q_SCALE))
        ).alias("cov_r"),
        F.round(
            cov_num.cast("double")
            / F.sqrt(var_i.cast("double") * var_j.cast("double")),
            6,
        ).alias("corr_r"),
    )


def pca_components(
    df: DataFrame, vec_col: str, dims: int
) -> "tuple[list[list[float]], list[float]]":
    """Principal axes of the first ``dims`` components, from the EXACT
    distributed covariance (the only part that touches data — d²
    numbers collect to the driver regardless of corpus size). Returns
    (components [dims×dims, rows = axes, descending variance],
    explained_variance_ratio). Sign convention: each axis's
    largest-|loading| entry is non-negative, so the decomposition is
    deterministic (eigenvectors are sign-ambiguous)."""
    import numpy as np

    rows = covariance_matrix(df, vec_col, dims).select(
        "i", "j", "cov_r"
    ).collect()
    cov = np.zeros((dims, dims))
    for r in rows:
        cov[r.i][r.j] = cov[r.j][r.i] = float(r.cov_r)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    comps = []
    for k in range(dims):
        axis = v[:, k]
        pivot = int(np.argmax(np.abs(axis)))
        if axis[pivot] < 0:
            axis = -axis
        comps.append([float(c) for c in axis])
    total = float(np.sum(np.clip(w, 0.0, None))) or 1.0
    ratio = [max(float(x), 0.0) / total for x in w]
    return comps, ratio


def pca_project(
    df: DataFrame,
    vec_col: str,
    components: "list[list[float]]",
    k: int,
) -> DataFrame:
    """Append ``pc`` — array<double> of the first ``k`` principal
    scores. Each score is a FIXED-ORDER literal dot product (index 0
    upward) over the raw components, fully inside codegen: no Python,
    no shuffle, reproducible to the last ulp across runs and engines
    that replay the same fold order."""
    dims = len(components[0])
    cols = []
    for a in range(k):
        axis = components[a]
        expr = F.lit(0.0)
        for i in range(dims):
            expr = expr + F.lit(axis[i]) * F.element_at(
                F.col(vec_col), i + 1
            ).cast("double")
        cols.append(expr)
    return df.withColumn("pc", F.array(*cols))
