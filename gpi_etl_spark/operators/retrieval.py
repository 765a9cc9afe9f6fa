"""Retrieval-ranking composition: reciprocal-rank fusion (RRF).

RRF (Cormack et al. 2009) merges rankings from heterogeneous
retrievers — sparse lexical (BM25), dense ANN (cosine), anything that
emits (id, rank) — without score calibration: fused(d) =
Σ_r 1/(k + rank_r(d)), absent-from-a-ranking contributes nothing.
It is THE standard hybrid-search combiner because rank is scale-free
where raw scores are not.

No counterpart in the reference (its only ranking is geo kNN top-k);
textbook-public algorithm.

100 TB shape: each input ranking is already a TOP-N shortlist (the
expensive part — q167's postings-bounded BM25, q179's quantized IVF —
happens upstream), so the fusion is a full-outer join chain over
N-row frames plus one small sort: driver-light, shuffle-trivial, and
broadcastable when N is a shortlist. Determinism: callers must rank
on 6-dp-scaled scores with an id tiebreak (the q183 survivor rule —
raw float ordering can flip on last-ulp ties across engines); the
fused score 1/(k+r1)+1/(k+r2) is then an exact rational of integers,
identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpi_etl_spark.functions.rounding import fs6


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Fuse named ``(name, DataFrame(id_col, rank))`` rankings.

    Returns the fused top-``top``:
    ``(fused_rank, id_col, <name>_rank … (0 = absent), rrf_r)`` with
    rrf floor-scaled to 6 dp and ties broken on ascending id.
    """
    assert rankings, "rrf_fuse needs at least one ranking"
    joined: DataFrame | None = None
    for name, r in rankings:
        ri = r.select(
            F.col(id_col),
            F.col("rank").cast("int").alias(f"{name}_rank"),
        )
        joined = ri if joined is None else joined.join(
            ri, id_col, "full_outer"
        )
    contribs = [
        F.when(
            F.col(f"{name}_rank").isNotNull(),
            F.lit(1.0) / (F.lit(k) + F.col(f"{name}_rank")),
        ).otherwise(F.lit(0.0))
        for name, _ in rankings
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    fused = joined.select(
        id_col,
        *[
            F.coalesce(F.col(f"{name}_rank"), F.lit(0)).alias(
                f"{name}_rank"
            )
            for name, _ in rankings
        ],
        fs6(total).alias("rrf_r"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rrf_r").desc(), F.col(id_col).asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= top)
        .select(
            "fused_rank",
            id_col,
            *[f"{name}_rank" for name, _ in rankings],
            "rrf_r",
        )
    )
