"""Similarity search: exact top-k sanity + LSH/IVF recall."""

import random

from pyspark.sql import functions as F

from gpi_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    train_ivf_centroids,
)

DIM = 16


def _vectors(spark, n=100, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(DIM)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_self_is_nearest(spark):
    vecs = _vectors(spark)
    queries = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_topk(vecs, queries, k=1)
    for r in out.collect():
        assert r.vec_id == r.query_id and abs(r.score - 1.0) < 1e-9


def test_brute_force_rank_ordering(spark):
    vecs = _vectors(spark)
    queries = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = brute_force_topk(vecs, queries, k=10).orderBy("rank").collect()
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_lsh_topk_recall(spark):
    """SRP-LSH with few planes must recover most of the exact top-5."""
    vecs = _vectors(spark, n=200)
    queries = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(vecs, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in lsh_topk(vecs, queries, k=5, n_planes=4, dim=DIM).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4  # 4 planes / 16 buckets on gaussian data


def test_ivf_centroids_are_deterministic_and_normalized(spark):
    vecs = _vectors(spark, n=200)
    c1 = train_ivf_centroids(vecs, n_cells=4, sample_rows=128)
    c2 = train_ivf_centroids(vecs, n_cells=4, sample_rows=128)
    assert (c1 == c2).all()
    norms = (c1 * c1).sum(axis=1) ** 0.5
    assert all(abs(n - 1.0) < 1e-9 for n in norms)


def test_ivf_topk_recall(spark):
    """IVF with generous nprobe must recover most of the exact top-5."""
    vecs = _vectors(spark, n=200)
    queries = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(vecs, queries, k=5).collect()
    }
    cents = train_ivf_centroids(vecs, n_cells=4, sample_rows=200)
    approx_df = ivf_topk(vecs, queries, cents, k=5, nprobe=2)
    approx = {(r.query_id, r.vec_id) for r in approx_df.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6  # probing 2/4 cells on gaussian data
    # every returned neighbor's score must be exact cosine (spot check rank 1)
    top1 = {r.query_id: r.vec_id for r in approx_df.collect() if r.rank == 1}
    assert all(qid in top1 for qid in range(5))


def test_distributed_kmeans_recovers_blobs(spark):
    import numpy as np

    from gpi_etl_spark.operators.similarity import distributed_kmeans

    rng = np.random.default_rng(7)
    rows = []
    # three well-separated unit-norm blobs in 8-d
    for b, center_dim in enumerate([0, 3, 6]):
        c = np.zeros(8); c[center_dim] = 1.0
        for i in range(40):
            v = c + rng.normal(0, 0.05, 8)
            rows.append((b * 40 + i, [float(x) for x in v], b))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    cents, assigned = distributed_kmeans(df, k=3, iters=6)
    got = assigned.join(df.select("vec_id", "label"), "vec_id").collect()
    # every cluster maps to exactly one true label (purity 1.0 on
    # well-separated blobs) and all three labels are recovered
    by_cell = {}
    for r in got:
        by_cell.setdefault(r["cell"], set()).add(r["label"])
    assert len(by_cell) == 3
    assert all(len(labels) == 1 for labels in by_cell.values())
    # determinism: same input -> same centroids
    cents2, _ = distributed_kmeans(df, k=3, iters=6)
    assert np.allclose(cents, cents2)


def test_semantic_dedup_drops_near_dups_keeps_min_id(spark):
    """SemDeDup composition: near-identical vectors in the same cluster
    collapse to the min-id representative; distinct directions survive."""
    import numpy as np

    from gpi_etl_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(5)
    rows = []
    # two separated blob centers; ids 0/1/2 are three copies of center A
    # (near-dups), id 3 is center A + big orthogonal offset, ids 10/11
    # duplicate center B
    a = np.zeros(8); a[0] = 1.0
    b = np.zeros(8); b[4] = 1.0
    for i in (0, 1, 2):
        rows.append((i, [float(x) for x in a + rng.normal(0, 0.01, 8)]))
    ortho = a.copy(); ortho[7] = 1.5
    rows.append((3, [float(x) for x in ortho]))
    for i in (10, 11):
        rows.append((i, [float(x) for x in b + rng.normal(0, 0.01, 8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = {r.vec_id: (r.cell, r.is_dup)
           for r in semantic_dedup(df, k=2, iters=4, threshold=0.95).collect()}
    assert len(out) == 6
    assert not out[0][1]            # min-id representative survives
    assert out[1][1] and out[2][1]  # its copies are duplicates
    assert not out[3][1]            # cos(a, ortho) ≈ 0.55 < 0.95: kept
    assert not out[10][1] and out[11][1]  # second blob: keep 10, drop 11


def test_quantize_embeddings_roundtrip_bound(spark):
    """|x - q*scale| <= scale/2 per element; zero vectors get zero codes."""
    import numpy as np

    from gpi_etl_spark.operators.similarity import quantize_embeddings

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.normal(0, 2, 16)]) for i in range(20)]
    rows.append((99, [0.0] * 16))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for i, vec in rows:
        r = got[i]
        assert len(r.q) == 16
        assert all(-127 <= c <= 127 for c in r.q)
        for x, c in zip(vec, r.q):
            assert abs(x - c * r.qscale) <= r.qscale / 2 + 1e-12
    assert got[99].qscale == 1.0 and all(c == 0 for c in got[99].q)


def test_quantized_topk_recall_vs_exact(spark):
    import numpy as np

    from gpi_etl_spark.operators.similarity import (
        brute_force_topk,
        quantized_topk,
    )

    rng = np.random.RandomState(11)
    vecs = rng.normal(0, 1, (200, 12))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    qv = [float(x) for x in vecs[0] + rng.normal(0, 0.05, 12)]
    queries = spark.createDataFrame(
        [(0, qv)], "query_id long, query_vec array<double>"
    )
    exact = {
        r.vec_id for r in brute_force_topk(df, queries, k=10).collect()
    }
    quant = {r.vec_id for r in quantized_topk(df, qv, k=10).collect()}
    # int8 keeps ~2 decimal digits of cosine: near-perfect top-10 recall
    assert len(exact & quant) >= 8
    # and the true nearest neighbor is never lost
    assert 0 in quant


def test_quantized_cosine_scale_invariance(spark):
    """Scaling a vector changes its qscale but not its codes' cosine."""
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.similarity import (
        quantize_embeddings,
        quantized_cosine,
    )

    base = [0.3, -1.2, 0.7, 2.5]
    df = spark.createDataFrame(
        [(1, base), (2, [x * 100.0 for x in base])],
        "vec_id long, embedding array<double>",
    )
    qz = quantize_embeddings(df)
    a = qz.filter("vec_id = 1").select("q").collect()[0].q
    b = qz.filter("vec_id = 2").select("q").collect()[0].q
    assert list(a) == list(b)  # identical codes
    one = spark.range(1).select(
        quantized_cosine(
            F.array(*[F.lit(int(c)) for c in a]),
            F.array(*[F.lit(int(c)) for c in b]),
        ).alias("c")
    ).collect()[0].c
    assert one == 1.0


def test_centroid_outliers_flags_least_prototypical(spark):
    import numpy as np

    from gpi_etl_spark.operators.similarity import centroid_outliers

    rng = np.random.RandomState(3)
    rows = []
    a = np.zeros(6); a[0] = 1.0
    b = np.zeros(6); b[3] = 1.0
    # tight cluster around a (ids 0-8) plus one far-off member (id 9)
    for i in range(9):
        rows.append((i, [float(x) for x in a + rng.normal(0, 0.01, 6)]))
    drift = a + 0.9 * b
    rows.append((9, [float(x) for x in drift]))
    # tight cluster around b (ids 10-14)
    for i in range(10, 15):
        rows.append((i, [float(x) for x in b + rng.normal(0, 0.01, 6)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in
           centroid_outliers(df, k=2, iters=4, frac=0.11).collect()}
    assert len(out) == 15
    # per cluster exactly ceil(0.11 * n) flagged
    import math
    from collections import Counter
    per = Counter(r.cell for r in out.values())
    flagged = Counter(r.cell for r in out.values() if r.is_outlier)
    for cell, n in per.items():
        assert flagged[cell] == math.ceil(0.11 * n)
    # the drifted vector is its cluster's outlier
    cell9 = out[9].cell
    worst = min(
        (r for r in out.values() if r.cell == cell9),
        key=lambda r: (r.sim_r, r.vec_id),
    )
    assert worst.vec_id == 9 and out[9].is_outlier


def _clustered_vectors(spark, n_clusters=4, per=25, dim=8, seed=5):
    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n_clusters * per):
        c = centers[i % n_clusters]
        rows.append(
            (i, [x + rng.uniform(-0.05, 0.05) for x in c])
        )
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_pq_train_codes_shape_and_range(spark):
    from gpi_etl_spark.operators.similarity import pq_train

    df = _clustered_vectors(spark, dim=8)
    books, codes = pq_train(df, m=2, k=4, iters=2)
    assert len(books) == 2 and books[0].shape == (4, 4)
    rows = codes.collect()
    assert len(rows) == 100
    for r in rows:
        assert 0 <= r.code0 < 4 and 0 <= r.code1 < 4
    # indivisible dim raises
    try:
        pq_train(df, m=3, k=4, iters=1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_ivfadc_recall_on_clustered_data(spark):
    from gpi_etl_spark.operators.similarity import (
        brute_force_topk,
        distributed_kmeans,
        ivfadc_topk,
        pq_train,
    )

    df = _clustered_vectors(spark, n_clusters=4, per=25, dim=8)
    coarse, assigned = distributed_kmeans(df, k=4, iters=3)
    books, codes = pq_train(df, m=2, k=8, iters=3)
    qs = df.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    approx = ivfadc_topk(
        assigned.select("vec_id", "cell"), codes, qs, coarse, books,
        k=5, nprobe=2,
    ).collect()
    exact = brute_force_topk(df, qs, k=5).collect()
    by_q_a, by_q_e = {}, {}
    for r in approx:
        by_q_a.setdefault(r.query_id, set()).add(r.vec_id)
    for r in exact:
        by_q_e.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(by_q_a[q] & by_q_e[q]) / 5 for q in by_q_e
    ]
    # PQ is LOSSY: same-cluster vectors share codes, so exact-neighbor
    # recall has a quantization floor — assert it beats random (0.05)
    # decisively, and assert the guarantee PQ actually makes: the
    # retrieved set lands in the query's ground-truth cluster
    assert sum(recalls) / len(recalls) >= 0.2, recalls
    cluster_hits = [
        sum(1 for v in by_q_a[q] if v % 4 == q % 4) / len(by_q_a[q])
        for q in by_q_a
    ]
    assert sum(cluster_hits) / len(cluster_hits) >= 0.8, cluster_hits


def test_ivfadc_deterministic(spark):
    from gpi_etl_spark.operators.similarity import (
        distributed_kmeans,
        ivfadc_topk,
        pq_train,
    )

    df = _clustered_vectors(spark, seed=9)
    qs = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def run(frame):
        coarse, assigned = distributed_kmeans(frame, k=4, iters=2)
        books, codes = pq_train(frame, m=2, k=4, iters=2)
        return sorted(
            ivfadc_topk(
                assigned.select("vec_id", "cell"), codes, qs, coarse,
                books, k=3, nprobe=2,
            ).collect()
        )

    assert run(df) == run(df.repartition(9))


def test_pq_fused_equals_independent(spark):
    import numpy as np

    from gpi_etl_spark.operators.similarity import (
        distributed_kmeans,
        pq_train,
    )

    df = _clustered_vectors(spark, n_clusters=3, per=20, dim=8, seed=2)
    books, codes = pq_train(df, m=2, k=4, iters=3)
    for s in range(2):
        sv = df.select(
            "vec_id",
            F.slice(F.col("embedding"), s * 4 + 1, 4).alias("embedding"),
        )
        ref, _ = distributed_kmeans(sv, k=4, iters=3)
        assert np.allclose(books[s], ref, atol=0), (
            f"subspace {s} codebooks diverge"
        )


def test_ivfadc_refine_recovers_exact_recall(spark):
    """The refine step's contract (docs/IVFADC_PROBE.md): on clustered
    data where plain ADC has a quantization floor, re-ranking a
    shortlist by exact cosine recovers the exact top-k whenever the
    true neighbors are inside the shortlist — here the shortlist is
    the whole probed candidate set, so refined recall must dominate
    plain ADC recall AND hit the exact answer for same-cell queries."""
    from gpi_etl_spark.operators.similarity import (
        brute_force_topk,
        distributed_kmeans,
        ivfadc_refine_topk,
        ivfadc_topk,
        pq_train,
    )

    df = _clustered_vectors(spark, n_clusters=4, per=25, dim=8)
    coarse, assigned = distributed_kmeans(df, k=4, iters=3)
    books, codes = pq_train(df, m=2, k=8, iters=3)
    qs = df.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def recall_of(rows):
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, set()).add(r.vec_id)
        return {
            q: len(by_q.get(q, set()) & truth[q]) / 5 for q in truth
        }

    truth = {}
    for r in brute_force_topk(df, qs, k=5).collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    plain = recall_of(
        ivfadc_topk(
            assigned.select("vec_id", "cell"), codes, qs, coarse, books,
            k=5, nprobe=2,
        ).collect()
    )
    refined_rows = ivfadc_refine_topk(
        assigned.select("vec_id", "cell"), codes, df, qs, coarse, books,
        k=5, shortlist=60, nprobe=2,
    ).collect()
    refined = recall_of(refined_rows)

    assert all(refined[q] >= plain[q] for q in truth), (plain, refined)
    assert sum(refined.values()) / len(refined) > sum(
        plain.values()
    ) / len(plain)
    # with a shortlist this deep the probed cells contain the true
    # cluster, so refined recall is essentially exact
    assert sum(refined.values()) / len(refined) >= 0.95, refined
    # ranks are contiguous 1..5 per query (window re-rank discipline)
    by_q = {}
    for r in refined_rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
