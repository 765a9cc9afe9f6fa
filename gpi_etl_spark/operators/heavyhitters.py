"""EXACT distributed heavy hitters via a Misra-Gries candidate pass —
the two-phase frequent-items algorithm that keeps the shuffle
proportional to the CANDIDATE set, not the vocabulary.

A plain ``groupBy(item).count()`` computes exact frequencies but
shuffles every distinct item; at 100 TB the vocabulary (urls, user
ids, n-grams) is itself huge while the items anyone asks about —
those above a support threshold — are few. The classic fix
(Misra–Gries '82; the "local summary + exact recount" pattern):

1. **Pass 1 — per-partition Misra-Gries summaries.** Each task
   streams its partition once through k counters (decrement-all on
   overflow). MG guarantees any item with partition-local frequency
   > n_p/(k+1) retains a counter; by pigeonhole, an item with GLOBAL
   frequency ≥ N/k exceeds n_p/k in at least one partition — so the
   union of local candidates is a SUPERSET of the true heavy hitters.
   Only candidate item names (≤ k × partitions rows) are emitted.
2. **Pass 2 — exact recount of candidates only.** The distinct
   candidate set broadcasts into a semi-join, and the exact count
   runs over the filtered stream. No approximation survives to the
   output: the MG pass only prunes what gets counted.

Result: exact answer, shuffle ∝ candidates instead of vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: at most one heavy-hitters item cache stays pinned per process (same
#: policy as similarity._LIVE_KMEANS_CACHES)
_LIVE_HH_CACHES: list[DataFrame] = []


def _mg_update(counters: dict, v, w: int, k: int) -> None:
    """Weighted Misra-Gries step: process ``w`` copies of ``v`` in one
    move. Exactly replays w single-copy updates: while the table is
    full and v absent, each copy decrements every counter by 1, so the
    batch decrements by d = min(w, min-counter) — the copy count at
    which the minima hit zero and free a slot — then the remaining
    w - d copies enter as v's counter. Order-independence of the MG
    guarantee (any item with frequency > n/(k+1) retains a counter, on
    ANY arrival order of the same multiset) is what makes pre-counted
    batches legal input."""
    if v in counters:
        counters[v] += w
    elif len(counters) < k:
        counters[v] = w
    else:
        m = min(counters.values())
        d = w if w < m else m
        dead = []
        for key in counters:
            counters[key] -= d
            if counters[key] == 0:
                dead.append(key)
        for key in dead:
            del counters[key]
        if w > d:
            counters[v] = w - d


def _mg_candidates(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries pass → distinct candidate items.

    The per-row work runs at C speed: each Arrow chunk is pre-counted
    with ``value_counts`` (vectorized) and the interpreted-Python MG
    loop runs over the chunk's (item, count) PAIRS — |distinct per
    chunk| iterations instead of |rows| (the round-5 verdict's one
    remaining row-at-a-time hot path). Under Zipfian vocabularies the
    distinct-per-chunk factor is the big win; in the all-distinct
    worst case the pair loop degenerates to the old row loop's cost,
    no worse. Descending-count order (value_counts' default) also
    seats heavy items first, so light items decrement established
    counters instead of churning slots."""
    import pandas as pd

    # output schema mirrors the INPUT item type (urls are strings,
    # user ids are longs, …) — a hardcoded string schema would make
    # the Arrow serializer reject every non-string vocabulary
    item_type = items.schema[item_col].dataType.simpleString()

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[item_col].value_counts(dropna=False)
            for v, w in vc.items():
                _mg_update(counters, v, int(w), k)
        yield pd.DataFrame({item_col: list(counters.keys())})

    return items.select(item_col).mapInPandas(
        summarize, schema=f"{item_col} {item_type}"
    ).distinct()


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    k: int = 200,
) -> DataFrame:
    """Items with exact frequency ≥ N/k (support 1/k), computed with a
    candidate-bounded shuffle. The threshold test is integer
    cross-multiplication (``n*k >= N``) — no float boundary.

    Returns ``(item_col, n)`` — exact counts, only qualifying items.

    The item stream is persisted for the run: it is read three times
    (total count, MG candidate pass, exact recount), and when the
    input is itself a derived frame — q171's explode over the
    tokenizer — re-deriving it per pass would triple the upstream
    scan. The cache materializes on the ``count()`` action; at most
    one stays pinned per process (next call evicts).
    """
    from pyspark.storagelevel import StorageLevel

    items = items.select(item_col)
    while _LIVE_HH_CACHES:
        _LIVE_HH_CACHES.pop().unpersist()
    items = items.persist(StorageLevel.MEMORY_AND_DISK)
    _LIVE_HH_CACHES.append(items)
    total = items.count()
    if total == 0:
        return items.withColumn(
            "n", F.lit(0).cast("bigint")
        ).limit(0)
    cands = _mg_candidates(items, item_col, k)
    counted = (
        items.join(F.broadcast(cands), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counted.filter(F.col("n") * k >= F.lit(total))


def superspreaders(
    df: DataFrame,
    key_col: str,
    partner_col: str,
    top_n: int = 20,
    k: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Distinct-cardinality heavy hitters — the F₀ sibling of
    :func:`heavy_hitters` (which ranks by FREQUENCY): which keys
    touch the most DISTINCT partners? The superspreader question —
    users contacting the most distinct hosts, suppliers reaching the
    most distinct customers, IPs scanning the most distinct ports —
    where frequency is the wrong score (one partner hit a million
    times is not spread).

    The q171 candidates-then-exact-recount pattern applied to
    distinct counts: per key, a k-min-registers sketch over the
    partner set (sketches.kmv_build — constant size per key however
    many partners) scores every key; the ``top_n`` keys by estimate
    (ties by key) become candidates; the EXACT distinct partner count
    is then recounted for the candidates alone — so the ranking is
    sketch-cheap over the full key population and the reported
    numbers are exact where it matters. The distinct (key, partner)
    pre-pass trades one dedup shuffle for a k× smaller register
    expansion (the q221 rationale — right when pairs repeat;
    superspreader streams repeat heavily).

    NULL keys/partners drop (no identity, no spread). Returns
    ``top_n`` rows: ``(key_col, reg_sum bigint, est_r double,
    exact_distinct bigint)``. The candidate cut is top-n-by-estimate:
    a key whose TRUE cardinality belongs in the top n can miss when
    its ±1/√k estimate falls below the n-th estimate — the standard
    sketch-ranking caveat; size k to the gap you need to resolve.

    Scale: register build is one map-side-combined aggregation (≤ k
    rows per key per partition on the wire); the top-n cut is a
    sort-limit (per-partition top-n + tiny merge — never a global
    window); the recount semi-joins the distinct pair stream to
    ``top_n`` keys (broadcast). Output is top_n rows.

    The distinct pair stream and the top-n candidate cut are both
    persisted for the run (round-12 optimization, heavy_hitters'
    policy): the pairs subtree feeds the register build AND the exact
    recount, the candidate frame feeds the recount's semi-join AND the
    final join — unpinned, the upstream join + dedup shuffle executed
    twice and the sort-limit twice (measured 2x at sf0.1). At most one
    heavy-hitters op's caches stay pinned per process."""
    from pyspark.storagelevel import StorageLevel

    from gpi_etl_spark.operators.sketches import kmv_build, kmv_estimate
    from gpi_etl_spark.functions.rounding import fs6

    while _LIVE_HH_CACHES:
        _LIVE_HH_CACHES.pop().unpersist()
    pairs = (
        df.filter(
            F.col(key_col).isNotNull() & F.col(partner_col).isNotNull()
        )
        .select(
            F.col(key_col).alias("_sk"),
            F.col(partner_col).cast("string").alias("_sp"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _LIVE_HH_CACHES.append(pairs)
    regs = kmv_build(pairs, "_sp", ("_sk",), k=k, hash_mode=hash_mode)
    est = kmv_estimate(regs, ("_sk",))
    cands = (
        est.orderBy(F.col("est").desc(), F.col("_sk").asc())
        .limit(top_n)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _LIVE_HH_CACHES.append(cands)
    exact = (
        pairs.join(
            F.broadcast(cands.select("_sk")), "_sk", "left_semi"
        )
        .groupBy("_sk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    )
    return (
        cands.join(exact, "_sk")
        .select(
            F.col("_sk").alias(key_col),
            "reg_sum",
            fs6(F.col("est")).alias("est_r"),
            "exact_distinct",
        )
    )
