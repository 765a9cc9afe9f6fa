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
decimal(10,0)×decimal(27,0) and decimal(17,0)×decimal(17,0) products
used below — no silent precision-loss rescale, no overflow-to-NULL.
(|q| ≤ 10⁷ ⇒ |Σq| ≤ 10¹⁶ inside (17,0); |Σq_iq_j| ≤ 10²³ inside
(27,0); n inside (10,0); 10+27+1 = 38 exactly.)

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
    ``cov_num`` (decimal(38,0)), ``cov_r`` (6-dp floor-scaled),
    ``corr_r`` (sqrt is transcendental → round 6; NULL when either
    dimension is constant — guarded on BOTH engines, because the
    session runs ANSI mode where a bare divide-by-zero is a job
    failure, not a NULL — review find, live-reproduced), plus the
    round-9 SQRT-FREE correlation pair for gates that must carry zero
    transcendentals and zero round(): ``corr_sign`` (the exact
    integer sign of cov_num — corr's sign, no float at all) and
    ``corr2_r`` (corr² = cov_num²/(var_i·var_j), three correctly-
    rounded IEEE ops over exact-integer doubles in a pinned order,
    then the 6-dp floor scale; same constant-dimension NULL guard).
    corr_r is kept for callers that want the signed value (pinned
    against numpy in tests); corr_sign/corr2_r carry the identical
    information ulp-reproducibly (corr = corr_sign·sqrt(corr2)).

    Rows whose vector is NULL or shorter than ``dims`` are EXCLUDED
    from the moment basis up front (review find: Spark's posexplode
    would skip them per-position while a SQL replay's cross join
    counts them, silently skewing n — and ANSI element_at past the
    array end throws).

    ONE corpus scan: each row explodes into its d(d+1)/2 upper-
    triangle products PLUS d marker structs (j = -1) carrying the
    per-dim value, so Σq, n and every Σq_iq_j come out of the same
    map-side-combined aggregation; Σq_i² is the (i, i) diagonal —
    never recomputed (review find: the first cut scanned twice and
    re-derived the diagonal)."""
    d = dims
    df = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) >= d)
    )
    structs_per_row = let_(
        _quantized(vec_col, d),
        lambda q: F.concat(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(d - 1)),
                    lambda i: F.transform(
                        F.sequence(i, F.lit(d - 1)),
                        lambda j: F.struct(
                            i.cast("int").alias("i"),
                            j.cast("int").alias("j"),
                            (
                                F.element_at(q, i + 1)
                                * F.element_at(q, j + 1)
                            ).alias("p"),
                        ),
                    ),
                )
            ),
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("i"),
                    F.lit(-1).alias("j"),
                    F.element_at(q, i + 1).alias("p"),
                ),
            ),
        ),
    )
    agg = (
        df.select(F.explode(structs_per_row).alias("e"))
        .select("e.i", "e.j", "e.p")
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("p").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
    )
    # the aggregate is ≤ d(d+1)/2 + d rows total — split/join freely
    pairs = agg.filter(F.col("j") >= F.col("i")).select(
        "i", "j", F.col("s").alias("spq")
    )
    dims_t = agg.filter(F.col("j") == -1).select(
        "i", F.col("s").cast("decimal(17,0)").alias("sx"),
        F.col("c").alias("n"),
    )
    diag = agg.filter(F.col("j") == F.col("i")).select(
        F.col("i").alias("di"), F.col("s").alias("sqq")
    )

    def num(n, s2, sx_a, sx_b):
        # widths: n ≤ 10⁹ rows → decimal(10,0); |Σq²| ≤ n·10¹⁴
        # (|x| ≤ 10 ⇒ |q| ≤ 10⁷) ≤ 10²³ → decimal(27,0), product
        # 10+27+1 = 38 exactly; |Σq| ≤ 10¹⁶ → decimal(17,0), product
        # 35 — nothing hits Spark's precision cap (which would
        # silently rescale) and nothing overflows through the
        # documented n ≤ 10⁹, |x| ≤ 10 envelope (review find: the
        # first cut's (9,0)/(14,0) widths covered only n ≤ 10⁷).
        return n.cast("decimal(10,0)") * s2.cast("decimal(27,0)") - (
            sx_a.cast("decimal(17,0)") * sx_b.cast("decimal(17,0)")
        )

    di = F.broadcast(dims_t).alias("di")
    dj = F.broadcast(
        dims_t.select(
            F.col("i").alias("j"), F.col("sx").alias("sx_j")
        )
    )
    gi = F.broadcast(diag)
    gj = F.broadcast(
        diag.select(F.col("di").alias("dj"), F.col("sqq").alias("sqq_j"))
    )
    joined = (
        pairs.join(di, "i")
        .join(dj, "j")
        .join(gi, F.col("i") == F.col("di"))
        .join(gj, F.col("j") == F.col("dj"))
    )
    cov_num = num(F.col("n"), F.col("spq"), F.col("sx"), F.col("sx_j"))
    var_i = num(F.col("n"), F.col("sqq"), F.col("sx"), F.col("sx"))
    var_j = num(F.col("n"), F.col("sqq_j"), F.col("sx_j"), F.col("sx_j"))
    var_prod = var_i.cast("double") * var_j.cast("double")
    n_d = F.col("n").cast("double")
    cov_d = cov_num.cast("double")
    return joined.select(
        "i",
        "j",
        "n",
        cov_num.cast("decimal(38,0)").alias("cov_num"),
        fs6(
            cov_d / (n_d * n_d * F.lit(Q_SCALE * Q_SCALE))
        ).alias("cov_r"),
        F.when(
            var_prod > 0.0,
            F.round(cov_d / F.sqrt(var_prod), 6),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("corr_r"),
        # sign on the EXACT decimal (never the double cast — a value
        # inside the cast's rounding band must still sign correctly)
        F.when(cov_num > 0, F.lit(1))
        .when(cov_num < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("corr_sign"),
        # corr² via three pinned-order IEEE ops (num product, den
        # product, divide) over int→double casts that both engines
        # round identically — no sqrt, no round() anywhere
        F.when(
            var_prod > 0.0,
            fs6((cov_d * cov_d) / var_prod),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("corr2_r"),
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
    scores. Each score is a FIXED-ORDER dot product (index 0 upward)
    of the vector against a LITERAL axis array, evaluated as one
    ``aggregate`` fold per axis: no Python, no shuffle, reproducible
    to the last ulp across runs and engines that replay the same fold
    order. The fold matters for more than determinism — the first cut
    unrolled k·d scalar multiply-add chains into the projection
    (4,096 nodes at 64×64), which blew janino codegen straight into a
    driver OOM; the fold keeps the expression O(k) with the axis
    coefficients living in array literals (data, not code)."""
    dims = len(components[0])
    cols = []
    for a in range(k):
        axis_lit = F.array(*[F.lit(float(c)) for c in components[a][:dims]])
        cols.append(
            F.aggregate(
                F.zip_with(
                    F.slice(F.col(vec_col), 1, dims),
                    axis_lit,
                    lambda x, c: x.cast("double") * c,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return df.withColumn("pc", F.array(*cols))
