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


def phrase_search(
    docs: DataFrame,
    phrases: "list[list[str]]",
    tokens_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search over a POSITIONAL postings index: the corpus
    explodes once to (doc, position, token), and each phrase resolves
    by chained self-equi-joins — word i+1's posting must sit at
    ``pos + 1`` of word i's, so an n-word phrase is n−1 equi-joins on
    (doc, pos), every shuffle keyed on the doc id. This is the
    index-side algorithm a search engine runs (posting-list
    intersection with position arithmetic); the per-doc array-scan
    alternative is what the q217 oracle computes, so the gate pits the
    two algorithms against each other. Cost scales with the POSTING
    LISTS of the phrase's words, not the corpus — the rarest word's
    list bounds the join, exactly like the PPJoin prefix argument.

    Overlapping occurrences count (``a a a`` contains ``a a`` twice).
    Phrases must have ≥ 2 words (single tokens are a plain filter).
    Returns (phrase, id, n_hits) for documents with ≥ 1 occurrence.
    """
    if not phrases:
        raise ValueError("phrases must be non-empty")
    if any(len(p) < 2 for p in phrases):
        raise ValueError("phrases must have at least 2 words")
    postings = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(tokens_col).alias("_pos", "_tok"),
    )
    outs = []
    for words in phrases:
        cur = (
            postings.filter(F.col("_tok") == words[0])
            .select("_d", F.col("_pos").alias("_p0"))
        )
        for i, w in enumerate(words[1:], start=1):
            nxt = postings.filter(F.col("_tok") == w).select(
                F.col("_d").alias("_d2"), F.col("_pos").alias("_pi")
            )
            cur = cur.join(
                nxt,
                (cur["_d"] == nxt["_d2"])
                & (nxt["_pi"] == cur["_p0"] + i),
            ).select("_d", "_p0")
        outs.append(
            cur.groupBy("_d")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(
                F.lit(" ".join(words)).alias("phrase"),
                F.col("_d").alias(id_col),
                F.col("n_hits").cast("long").alias("n_hits"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
