"""Training-data curation operators: deterministic splits, per-group
sampling, token-budget packing, quantile filtering, decontamination.

These are the corpus-management steps a 100 TB pretraining pipeline runs
between the raw scan and tokenization. The reference app has no corpus
stage (its largest load is one spreadsheet — SURVEY.md §6), so this
module is north-star greenfield; every operator is a narrow composition
of native column expressions + window functions so Catalyst keeps the
whole plan in WholeStageCodegen with exactly the shuffles the semantics
require (one per window/group key).

Design note — cross-engine determinism: sampling and splitting MUST be
reproducible run-over-run and verifiable against the DuckDB oracle, so
randomness comes from :func:`mix_hash_sql`, a pure-int64 mixing hash
both engines evaluate bit-identically, never from ``rand()`` or from
engine hashes with no cross-engine twin (xxhash64, murmur3). At cluster
scale this also means a re-run after a lost executor reproduces the
same split — no RNG state to lose.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified type
import numpy as np  # hints (PEP 563) against module globals at decoration

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gpi_etl_spark.functions.rounding import fs6

# LCG constants (Numerical Recipes / glibc) over two 31-bit limbs.
_MOD = 2_147_483_648  # 2^31: limb and output modulus
_MIX_A = 1_103_515_245
_MIX_B = 12_345
_MIX_C = 1_013_904_223


def mix_hash_sql(expr: str, dialect: str = "spark") -> str:
    """31-bit deterministic mixing hash of a non-negative bigint, as a
    SQL string valid in both Spark SQL and DuckDB.

    The input is split into two limbs (low 31 bits via ``%``, high bits
    via an arithmetic right shift — exact in both engines for
    non-negative inputs) and LCG-combined. Every intermediate stays
    below 2^62, so the arithmetic never overflows int64 in either
    engine (DuckDB raises on bigint overflow; Spark would silently
    wrap) and the two engines agree bit-for-bit — which is exactly what
    engine-native hashes (xxhash64/murmur) cannot give us for the
    oracle gate.
    """
    lo = f"(({expr}) % {_MOD})"
    if dialect == "spark":
        hi = f"shiftright(({expr}), 31)"
    else:
        hi = f"(({expr}) >> 31)"
    return f"(({lo} * {_MIX_A} + {hi} * {_MIX_B} + {_MIX_C}) % {_MOD})"


def mix_hash(col: Column | str) -> Column:
    """Column form of :func:`mix_hash_sql` (same bits)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("long")
    lo = F.pmod(c, F.lit(_MOD))
    hi = F.shiftright(c, 31)
    return F.pmod(lo * _MIX_A + hi * _MIX_B + _MIX_C, F.lit(_MOD))


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed id.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any
    remainder goes to the last split). Assignment is a pure function of
    the id — stable across runs, executors, and engines — and is a
    narrow projection (no shuffle). Cutoffs are compared as integers
    (``hash < floor(cum_weight * 2^31)``) so there is no float-boundary
    ambiguity between engines.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = mix_hash(df[id_col])
    expr = None
    names = list(weights)
    for name, cut in zip(names[:-1], split_cutoffs(weights)):
        branch = F.when(h < cut, name)
        expr = branch if expr is None else expr.when(h < cut, name)
    expr = (F.lit(names[-1]) if expr is None else expr.otherwise(names[-1]))
    return df.withColumn(split_col, expr)


def split_cutoffs(weights: dict[str, float]) -> list[int]:
    """Integer hash cutoffs for all but the last split (shared by the
    Column path and any SQL oracle so both compare identical ints)."""
    cuts, cum = [], 0.0
    for name in list(weights)[:-1]:
        cum += weights[name]
        cuts.append(int(cum * _MOD))
    return cuts


def group_sample(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows within each group by
    their mixing hash (tie-broken by id) and keep the first ``k``.

    One shuffle on the group key; at 100 TB this is the scalable
    replacement for ``sampleBy`` when reproducibility matters more than
    exact Bernoulli semantics (hash order is uniform, so the sample is
    unbiased within each group).
    """
    w = Window.partitionBy(group_col).orderBy(
        mix_hash(df[id_col]).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def pack_budget_bins(
    df: DataFrame,
    size_col: Column | str,
    partition_col: str,
    order_col: str = "doc_id",
    budget: int = 2048,
) -> DataFrame:
    """Assign consecutive documents to fixed-budget bins (sequence
    packing for training batches).

    Within each ``partition_col`` group, documents are taken in
    ``order_col`` order and a bin boundary is placed each time the
    running size total crosses a multiple of ``budget`` — i.e. bin =
    floor(exclusive-prefix-sum / budget). A document straddling a
    boundary stays in the bin it started in, so bins can overflow by at
    most one document (the usual greedy-fill-with-overflow packing; an
    exact-capacity packer needs stateful iteration — see
    operators/groupedmap.py for the applyInPandas escape hatch).

    One shuffle (window partition); the prefix sum is a single-pass
    running aggregate, so the op scales linearly per partition.
    """
    s = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(s).over(w), F.lit(0))
    return df.withColumn("bin", F.floor(cum_before / budget).cast("int"))


def quantile_filter(
    df: DataFrame,
    metric: Column | str,
    group_col: str,
    keep_top: float = 0.1,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_top`` fraction of each group by ``metric``
    (exact percentile via window ``percent_rank``, ties broken by
    ``order_col`` so the cutoff is deterministic).

    This is quality-threshold filtering ("keep the best decile per
    language"): one shuffle on the group key. For 100 TB, swap the
    exact window for ``approx_percentile`` cutoffs computed in a first
    pass and broadcast back (two scans, no giant sort) — same API.
    """
    m = F.col(metric) if isinstance(metric, str) else metric
    w = Window.partitionBy(group_col).orderBy(m.desc(), F.col(order_col).asc())
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") < keep_top)
        .drop("_pr")
    )


def quantile_filter_approx(
    df: DataFrame,
    metric: Column | str,
    group_col: str,
    keep_top: float = 0.1,
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB variant of :func:`quantile_filter`: instead of a full
    per-group sort (window ``percent_rank``), compute each group's
    cutoff with ``approx_percentile`` in one aggregate pass, broadcast
    the tiny per-group cutoff table back, and filter.

    Two scans, zero sorts, memory O(groups × accuracy-sketch). The kept
    fraction is approximate at the cutoff boundary (±1/accuracy
    quantile error — at accuracy=10k that's ±0.01% of each group);
    rows strictly above the cutoff are always kept, ties at the cutoff
    are all kept (deterministic, unlike sampling the boundary). A NULL
    group key forms its own group, exactly as the exact variant's
    window partition does (the cutoff join is null-safe).
    """
    m = (F.col(metric) if isinstance(metric, str) else metric).alias("_m")
    cuts = (
        df.select(F.col(group_col), m)
        .groupBy(group_col)
        .agg(
            F.expr(
                f"approx_percentile(_m, {1.0 - keep_top}, {accuracy})"
            ).alias("_cut")
        )
        .withColumnRenamed(group_col, "_grp")
    )
    joined = df.join(
        F.broadcast(cuts), df[group_col].eqNullSafe(F.col("_grp"))
    )
    return (
        joined.filter(
            (F.col(metric) if isinstance(metric, str) else metric) >= F.col("_cut")
        )
        .drop("_cut", "_grp")
    )


def shuffle_deterministic(
    df: DataFrame,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Reproducible global shuffle: order the corpus by the mixing hash
    of the id (ties broken by id).

    Pretraining pipelines must randomize document order, but
    ``orderBy(rand())`` is neither reproducible nor resumable. Hashing
    the id gives a permutation that is stable across runs, engines, and
    partial re-runs — and because ``repartitionByRange`` on the hash
    both distributes AND orders, the "shuffle" costs exactly one
    shuffle. Feed the result straight to a writer (file k < file k+1 in
    hash order) so readers stream the corpus in shuffled order with no
    further sort.
    """
    h = mix_hash(df[id_col]).alias("_shuffle_key")
    out = df.withColumn("_shuffle_key", h)
    n = num_partitions or out.rdd.getNumPartitions()
    out = out.repartitionByRange(n, F.col("_shuffle_key"), F.col(id_col))
    return out.sortWithinPartitions("_shuffle_key", id_col).drop("_shuffle_key")


def contaminated_ids(
    corpus: DataFrame,
    heldout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Ids of corpus documents sharing any ``n``-word shingle with the
    held-out set (benchmark decontamination).

    Inverted-index equi-join on the shingle string: both sides explode
    to (id, shingle) pairs, join on shingle, distinct corpus ids. The
    held-out side is typically tiny (an eval benchmark) so Catalyst/AQE
    broadcasts it; the corpus side streams. At extreme scale, hash the
    shingles first (``xxhash64``) to shrink shuffle width — equality of
    hashes is equality of shingles up to collision.
    """
    from gpi_etl_spark.operators.dedup import word_shingles

    c = word_shingles(corpus, text_col, id_col, n=n)
    h = word_shingles(heldout, text_col, id_col, n=n).select("shingle").distinct()
    return c.join(h, "shingle").select(id_col).distinct()


def contamination_overlap(
    corpus: DataFrame,
    heldout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """GRADED decontamination: per-document fraction of distinct
    ``n``-word shingles that appear anywhere in the held-out set.

    :func:`contaminated_ids` answers "touched at all?" — the binary
    gate. This scores HOW contaminated (the GPT-3/PaLM appendix recipe:
    drop above a high threshold, flag the gray zone for review), so the
    pipeline can distinguish a doc quoting one benchmark sentence from
    a verbatim test-set copy.

    Same scale shape as the binary op: explode to distinct (id,
    shingle) pairs, LEFT join against the (tiny, AQE-broadcast)
    held-out shingle set, one groupBy(id) — shuffle ∝ corpus shingles,
    counts pre-aggregate map-side. Documents whose normalized text is
    empty have no shingles and produce no row.

    Returns ``(id, n_shingles, n_hits, overlap_ratio)``.
    """
    from gpi_etl_spark.operators.dedup import word_shingles

    c = word_shingles(corpus, text_col, id_col, n=n)
    h = (
        word_shingles(heldout, text_col, id_col, n=n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    hit = F.coalesce(F.col("_hit"), F.lit(0))
    return (
        c.join(h, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(hit).cast("bigint").alias("n_hits"),
            # exact integer ratio -> floor-scaled 6-dp rounding
            fs6(F.sum(hit) / F.count(F.lit(1))).alias("overlap_ratio"),
        )
    )


def importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): score every corpus
    document by its average log-likelihood RATIO between a
    target-domain unigram LM and the general-corpus unigram LM —
    positive means "looks more like the target than like the average
    crawl", the signal used to up-sample domain-relevant pretraining
    data. Both LMs are add-one smoothed over their JOINT vocabulary, so
    the ratio is defined for every token.

    Scale shape: one exploded-token pass per side feeds the two
    vocabulary aggregates (map-side combinable); scoring is an
    equi-join of corpus tokens against the merged vocabulary
    (broadcastable while vocab is bounded) and the three scalars
    (token totals + vocab size) ride along as a one-row broadcast, not
    a driver collect. Documents with no tokens produce no row.

    Returns ``(id, n_tokens, llr_r)`` with the per-doc mean log-ratio
    rounded to 6 dp (ranking off rounded values keeps downstream
    selection deterministic across engines).
    """
    from gpi_etl_spark.operators.textstats import tokens

    tc = corpus.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tt = target.select(F.explode(tokens(text_col)).alias("term"))
    ct = tt.groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    cc = tc.groupBy("term").agg(F.count(F.lit(1)).alias("cc"))
    vocab = ct.join(cc, "term", "full_outer").select(
        "term",
        F.coalesce("ct", F.lit(0)).alias("ct"),
        F.coalesce("cc", F.lit(0)).alias("cc"),
    )
    totals = vocab.agg(
        F.sum("ct").alias("nt"),
        F.sum("cc").alias("nc"),
        F.count(F.lit(1)).alias("v"),
    )
    llr = F.log(
        (F.col("ct") + 1) / (F.col("nt") + F.col("v"))
    ) - F.log((F.col("cc") + 1) / (F.col("nc") + F.col("v")))
    return (
        tc.join(vocab, "term")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(llr), 6).alias("llr_r"),
        )
    )


def temperature_mix(
    df: DataFrame,
    group_col: str = "lang",
    size_col: str = "n_tokens",
    alpha: float = 0.3,
    budget: int = 1000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based multilingual mixing (the XLM-R / mT5 recipe):
    sample groups proportionally to ``T_g^alpha`` — ``alpha < 1``
    up-samples low-resource languages relative to their raw token
    share, ``alpha = 1`` is proportional, ``alpha = 0`` uniform. The
    per-group document quota is ``max(1, floor(budget · w_g))`` with
    the weight ROUNDED to 6 dp first, so the integer quotas (and hence
    the selected set) are deterministic across engines; within a group,
    documents are taken in cross-engine mixing-hash order (the same
    derandomized-sampling contract as :func:`group_sample`).

    Scale shape: one groupBy for the totals, the (tiny, one row per
    group) weight table broadcast back, one window per group for the
    ranked pick. The ``Σ T^alpha`` normalizer rides along as a one-row
    broadcast (the scalar-subquery pattern, see plan_audit's
    EXPECTED_BNL note) — no driver collect.

    Returns the selected rows plus ``quota`` (int) and ``w_r``.
    """
    totals = df.groupBy(group_col).agg(
        F.sum(size_col).alias("_t")
    )
    z = totals.agg(
        F.sum(F.pow(F.col("_t").cast("double"), F.lit(float(alpha)))).alias(
            "_z"
        )
    )
    w = (
        totals.crossJoin(F.broadcast(z))
        .select(
            group_col,
            F.round(
                F.pow(F.col("_t").cast("double"), F.lit(float(alpha)))
                / F.col("_z"),
                6,
            ).alias("w_r"),
        )
        .withColumn(
            "quota",
            F.greatest(
                F.lit(1).cast("bigint"),
                F.floor(F.lit(float(budget)) * F.col("w_r")),
            ).cast("int"),
        )
    )
    win = Window.partitionBy(group_col).orderBy(
        mix_hash(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.join(F.broadcast(w), group_col)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= F.col("quota"))
        .drop("_rn")
    )


def _shingle_hash_array(text_col: str, n: int) -> Column:
    """xxhash64 of every distinct ``n``-word shingle of a document, as
    an array column — the no-explode twin of ``dedup.word_shingles``
    (identical normalization, slicing and empty filter, so hash
    equality here means shingle equality there)."""
    from gpi_etl_spark.operators.dedup import normalize_text

    toks = F.split(normalize_text(text_col), " ")
    if n == 1:
        shingles = toks
    else:
        # Complete n-grams via zip_with over shifted slices — FLAT
        # lambdas only. This expression feeds a pandas_udf argument
        # (bloom_contaminated_ids), and a nested-lambda let_ binding
        # there can defeat Spark's Python-UDF extraction (see
        # functions/hof.py caveat); zip_with argument arrays still
        # evaluate the split once per row, not once per offset. The
        # produced shingle STRINGS are identical to the transform form:
        # complete grams when size >= n, one clamped partial gram
        # otherwise (matching slice()'s clamping in the old spelling).
        g = toks
        for j in range(1, n):
            g = F.zip_with(
                g,
                F.slice(toks, j + 1, 1 << 30),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        full = F.filter(g, lambda x: x.isNotNull())
        shingles = F.when(F.size(toks) >= n, full).otherwise(
            F.array(F.concat_ws(" ", toks))
        )
    clean = F.filter(F.array_distinct(shingles), lambda s: F.length(s) > 0)
    return F.transform(clean, lambda s: F.xxhash64(s))


def _build_bloom(hashes, num_bits: int, num_hashes: int):
    """Bit array with ``num_hashes`` double-hashed positions set per
    input hash (Kirsch–Mitzenmacher: pos_j = h1 + j·h2 mod m)."""
    import numpy as np

    bits = np.zeros(num_bits // 8, dtype=np.uint8)
    if len(hashes):
        h1 = hashes.astype(np.uint64, copy=False)
        h2 = (h1 >> np.uint64(33)) | np.uint64(1)  # odd → full-period stride
        for j in range(num_hashes):
            pos = (h1 + np.uint64(j) * h2) % np.uint64(num_bits)
            np.bitwise_or.at(
                bits, (pos >> np.uint64(3)).astype(np.int64),
                np.left_shift(1, (pos & np.uint64(7)).astype(np.int64)).astype(np.uint8),
            )
    return bits


def bloom_contaminated_ids(
    corpus: DataFrame,
    heldout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Bloom-filter decontamination — the 100 TB path.

    :func:`contaminated_ids` (the exact oracle) explodes the CORPUS
    side to (id, shingle) pairs and equi-joins: correct, but the big
    side shuffles. Here the held-out set (an eval benchmark — bounded
    by definition) is hashed into a driver-built Bloom bit array,
    broadcast once, and each corpus document tests its shingle-hash
    array against it inside one Arrow-batched pandas_udf: ZERO shuffle
    of the corpus, no explode, linear scan.

    Bloom guarantee: no false negatives — the returned id set is a
    SUPERSET of the exact result (recall 100%). False-positive rate is
    ~(1-e^(-k·s/m))^k for s held-out shingles; size ``num_bits``
    accordingly (the default 8M bits ≈ 1MB broadcast holds ~500k
    shingles at <1% FP). Chain the exact join AFTER the bloom pass on
    the surviving sliver when exactness matters.
    """
    h_rows = (
        heldout.select(
            F.explode(_shingle_hash_array(text_col, n)).alias("h")
        ).distinct().collect()
    )  # bounded model state (the eval set), not a data-path collect
    hashes = (
        np.array([r.h for r in h_rows], dtype=np.int64).view(np.uint64)
        if h_rows else np.zeros(0, dtype=np.uint64)
    )
    bits = _build_bloom(hashes, num_bits, num_hashes)
    bc = corpus.sparkSession.sparkContext.broadcast((bits, num_bits, num_hashes))

    @F.pandas_udf("boolean")
    def any_hit(arrs: pd.Series) -> pd.Series:
        bbits, m, k = bc.value
        arrs = arrs.map(lambda a: a if a is not None else [])
        lens = arrs.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.Series(False, index=arrs.index)
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in arrs]
        ).view(np.uint64)
        h2 = (flat >> np.uint64(33)) | np.uint64(1)
        contained = np.ones(len(flat), dtype=bool)
        for j in range(k):
            pos = (flat + np.uint64(j) * h2) % np.uint64(m)
            contained &= (
                bbits[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.int64)
            ).astype(np.uint8) & 1 > 0
        ends = np.cumsum(lens)
        starts = ends - lens
        out = [bool(contained[s:e].any()) for s, e in zip(starts, ends)]
        return pd.Series(out, index=arrs.index)

    hs = F.coalesce(
        _shingle_hash_array(text_col, n), F.array().cast("array<bigint>")
    )  # NULL text → empty shingle set (matches the exact path: no rows)
    return (
        corpus.select(F.col(id_col), hs.alias("__hs"))
        .filter(any_hit(F.col("__hs")))
        .select(id_col)
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    token_col: str = "n_tokens",
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic token-budget corpus mixing: within each group,
    walk documents in :func:`mix_hash` order (a reproducible shuffle)
    and keep them while the running token total stays within the
    group's budget — the "sample each source down to its target token
    share" stage of assembling a pretraining mixture.

    Groups without a budget entry are dropped (explicit mixture only).
    One window shuffle on the group key; the hash order makes the kept
    set independent of input partitioning, re-runnable after executor
    loss, and replayable in the DuckDB oracle — no RNG state anywhere.
    The greedy prefix rule (keep while cumsum <= budget) can undershoot
    by at most one document's tokens.
    """
    entries = [x for k, v in budgets.items() for x in (F.lit(k), F.lit(int(v)))]
    budget = F.element_at(F.create_map(*entries), F.col(group_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(mix_hash(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    return (
        df.withColumn("_budget", budget)
        .filter(F.col("_budget").isNotNull())
        .withColumn("cum_tokens", cum)
        .filter(F.col("cum_tokens") <= F.col("_budget"))
        .drop("_budget")
    )


def url_domain(col: Column | str) -> Column:
    """Host extraction from a URL: strip scheme, userinfo, port, and
    path, lowercase, drop a leading ``www.`` — the join/cap key of
    every URL-level curation rule (C4 blocklists, RefinedWeb per-domain
    caps). Pure regexp: no parser object, scans at codegen speed."""
    c = F.col(col) if isinstance(col, str) else col
    # userinfo class excludes '?' and '#' too: otherwise a query string
    # containing '@' ("https://bad.com?x@y") would be consumed as
    # userinfo and the fake host 'y' extracted — bypassing blocklists
    host = F.regexp_extract(
        F.lower(c), r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1
    )
    return F.regexp_replace(host, r"^www\.", "")


def blocklist_filter(
    df: DataFrame,
    blocked_domains: "Sequence[str]",
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose URL host is a blocked domain or any subdomain of
    one (``ads.example.com`` matches a blocked ``example.com``). The
    blocklist is a bounded literal array (broadcast-free: it inlines
    into the predicate), so the filter pushes into the scan."""
    dom = url_domain(url_col)
    hit = F.lit(False)
    for b in blocked_domains:
        b = b.lower()
        hit = hit | (dom == b) | dom.endswith("." + b)
    return df.filter(~hit)


def domain_frequency_cap(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per domain — the RefinedWeb-style
    guard against a single site dominating the corpus. Selection is
    deterministic: rows rank by the cross-engine :func:`mix_hash` of
    the id (ties by id), so a re-run — or the DuckDB oracle — keeps
    exactly the same rows. One shuffle, on the domain key; a skewed
    mega-domain is bounded by the cap itself (the window stops ranking
    after the partition, and AQE splits oversized partitions).

    Rows whose URL yields no host (scheme-less, malformed) BYPASS the
    cap with ``domain = ''`` rather than all competing in one giant
    empty-domain partition — capping "unparseable" to ``cap`` rows
    would be silent corpus-wide data loss, and the union keeps the
    empty key out of the window shuffle entirely."""
    with_dom = df.withColumn("_dom", url_domain(url_col))
    ok = with_dom.filter(F.length("_dom") > 0)
    no_host = with_dom.filter(F.length("_dom") == 0)
    w = Window.partitionBy("_dom").orderBy(
        mix_hash(F.col(id_col)), F.col(id_col)
    )
    capped = (
        ok.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
    return capped.unionByName(no_host).withColumnRenamed("_dom", "domain")


def pps_systematic_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling, stratified
    per group: order each group by the deterministic mixing hash,
    accumulate integer weights, and keep the row wherever the running
    total crosses a multiple of ``group_total / n_per_group``.

    This is the weighted sampler a data-mixing pipeline wants when
    quotas (:func:`temperature_mix`) are set in TOKENS, not documents:
    inclusion probability ∝ weight, selection is a pure function of the
    ids (engine-, retry- and partition-stable — no RNG state), and the
    whole thing is ONE partitioned window pass: no global sort, no
    driver state, shuffle ∝ rows on the group key.

    The boundary test is exact INTEGER arithmetic
    (``(cum*n) div total`` increments), never float division — float
    thresholds are where engines disagree, and a flipped boundary here
    silently swaps which documents train. Weights must be non-negative
    integers (token/char counts); rows heavier than the stride are
    selected once (true PPS-systematic semantics: expected picks ∝
    weight, capped at 1 — the classic survey-sampling estimator).

    Returns the selected rows with their ``_w`` weight column dropped.
    """
    w = F.col(weight_col).cast("long")
    cum_w = (
        Window.partitionBy(group_col)
        .orderBy(mix_hash(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot_w = Window.partitionBy(group_col)
    staged = (
        df.withColumn("_w", w)
        .withColumn("_cum", F.sum("_w").over(cum_w))
        .withColumn("_tot", F.sum("_w").over(tot_w))
    )
    n = int(n_per_group)
    keep = F.expr(f"(_cum * {n}) div _tot") > F.expr(
        f"((_cum - _w) * {n}) div _tot"
    )
    return staged.filter(keep).drop("_w", "_cum", "_tot")


#: PII patterns shared by the Spark operator and the DuckDB oracle.
#: Deliberately restricted to the regex subset where Java regex (Spark)
#: and RE2 (DuckDB) agree EXACTLY: character classes, bounded
#: quantifiers and \b word boundaries — no backreferences, no
#: lookaround (RE2 has neither), no engine-specific classes. Each is
#: (name, pattern, replacement-tag).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Scrub PII from a text column — the compliance pass every
    training-data pipeline runs before anything ships: emails, phone
    numbers and SSN-shaped ids are replaced with typed tags, with
    per-document match counts kept for audit.

    Patterns apply IN ORDER, each to the output of the previous one —
    order matters and is part of the contract (the SSN pattern must
    run after the phone pattern here: a phone match is consumed and
    tagged before the looser 3-2-4 shape can see it... actually
    3-3-4 vs 3-2-4 shapes are disjoint, but order-dependence is the
    general rule, so counts are taken BEFORE any replacement, against
    the ORIGINAL text, where they are unambiguous).

    Everything is native ``regexp_count``/``regexp_replace`` — one
    projection, no shuffle, scan-fused at any scale; the pattern set
    sticks to the Java-regex ∩ RE2 subset so the DuckDB oracle
    replays byte-for-byte (see ``PII_PATTERNS``). The default set is a
    CONSERVATIVE starter (mixed-case emails, dashed US phone/SSN
    shapes): precision over recall, because a false redaction corrupts
    clean text forever while a miss is caught by the audit counts.
    Production deployments extend ``patterns`` with their own formats
    (parenthesized/dotted phones, IBANs, national id shapes) — the
    operator applies whatever list it is given.

    Returns ``(id_col, n_<name> per pattern…, clean_sha256)`` — the
    hash of the fully-redacted text stands in for shipping the text
    itself through the audit table.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    counts = [
        F.regexp_count(F.col(text_col), F.lit(p)).alias(f"n_{name}")
        for name, p, _tag in pats
    ]
    cleaned = F.col(text_col)
    for _name, p, tag in pats:
        cleaned = F.regexp_replace(cleaned, p, tag)
    return df.select(
        F.col(id_col),
        *counts,
        F.sha2(cleaned, 256).alias("clean_sha256"),
    )


def leakage_safe_split(
    df: DataFrame,
    cluster_col: str,
    weights: dict[str, float] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """:func:`split_assign` keyed on a near-dup CLUSTER id instead of
    the row id: every member of a cluster hashes to the same split, so
    no pair of near-duplicates can straddle the train/test boundary —
    the contamination mode a per-document hash split provably leaves
    open (q201 measures the two policies side by side).

    The cluster ids come from the dedup stage (exact hash groups, or
    minhash/jaccard pairs collapsed by ``dedup.connected_components``),
    so the split inherits that stage's scale shape and adds only a
    narrow projection.
    """
    return split_assign(
        df, id_col=cluster_col, weights=weights, split_col=split_col
    )


def embargo_split(
    df: DataFrame,
    ts_col: str = "ts",
    train_pct: int = 70,
    embargo_pct: int = 5,
    split_col: str = "split",
) -> DataFrame:
    """Temporal train/test split with an embargo gap — the time-series
    leakage guard (de Prado's purged split, simplified to one fold):
    rows up to the ``train_pct`` point of the observed time range are
    'train', rows from the ``train_pct + embargo_pct`` point on are
    'test', and the gap between them is 'embargo' (excluded from both,
    so boundary-adjacent label/feature windows cannot overlap).

    Thresholds are computed in integer MICROSECONDS —
    ``t0 = min + (max − min)·train_pct // 100`` — all int64, no float
    boundary, so engines and re-runs agree exactly. Boundary rows:
    ``ts == t0`` is train, ``ts == t1`` is test. The min/max scan is
    one job collecting two scalars (bounded model state, SURVEY §3.2);
    the split itself is a narrow projection.
    """
    lo, hi = df.agg(
        F.min(F.unix_micros(F.col(ts_col))),
        F.max(F.unix_micros(F.col(ts_col))),
    ).collect()[0]
    rng = int(hi) - int(lo)
    t0 = int(lo) + rng * train_pct // 100
    t1 = int(lo) + rng * (train_pct + embargo_pct) // 100
    us = F.unix_micros(F.col(ts_col))
    return df.withColumn(
        split_col,
        F.when(us <= F.lit(t0), "train")
        .when(us >= F.lit(t1), "test")
        .otherwise("embargo"),
    )


def temperature_mix_budgets(
    df: DataFrame | None = None,
    group_col: str = "lang",
    token_col: str = "n_tokens",
    alpha: float = 0.5,
    total: int = 10_000,
    sizes: dict[str, int] | None = None,
) -> dict[str, int]:
    """Temperature-weighted token budgets per group: ``w_g ∝ n_g^α``
    (the multilingual-pretraining α-sampling rule — α < 1 upsamples
    rare languages relative to their corpus share; α = 1 is
    proportional), apportioned to INTEGER budgets that sum EXACTLY to
    ``total`` by the largest-remainder method (floor every quota, then
    hand the leftover units to the largest fractional parts,
    ties broken by group name).

    Returns the ``{group: budget}`` dict :func:`token_budget_sample`
    consumes — bounded model state (one float per GROUP crosses the
    driver, never data; the k-means/BPE contract, SURVEY §3.2).

    ``sizes`` short-circuits the aggregation with precomputed
    ``{group: token_sum}`` totals — callers that already collected
    them (q207 derives the budget total from the same sums) avoid a
    second corpus scan. An empty input yields an empty budget dict;
    all-zero token sums raise (no weight basis).

    Cross-engine determinism: the weight fold runs in sorted-group
    order starting from 0.0 (the q182/q204 ordered-fold convention), so
    a DuckDB oracle replays every intermediate double bit-for-bit —
    α = 0.5 uses ``math.sqrt`` to match SQL ``sqrt`` exactly (both
    correctly rounded per IEEE 754; a generic ``pow`` is used for
    other α, matching SQL ``pow``).
    """
    import math

    if sizes is None:
        sizes = {
            r[group_col]: int(r["_n"])
            for r in df.groupBy(group_col)
            .agg(F.sum(F.col(token_col).cast("long")).alias("_n"))
            .collect()
        }
    sizes = sorted(sizes.items())
    if not sizes:
        return {}

    def w(n: int) -> float:
        return math.sqrt(float(n)) if alpha == 0.5 else math.pow(
            float(n), alpha
        )

    s_total = 0.0
    for _, n in sizes:
        s_total = s_total + w(n)
    if s_total == 0.0:
        # every group has zero tokens: no weight basis — an explicit
        # error beats a ZeroDivisionError from the quota line
        raise ValueError("temperature_mix_budgets: all group token "
                         "sums are zero; no weights to apportion")
    total_f = float(total)
    quotas = [(g, total_f * w(n) / s_total) for g, n in sizes]
    base = {g: math.floor(q) for g, q in quotas}
    rem = total - sum(base.values())
    by_frac = sorted(
        quotas, key=lambda gq: (-(gq[1] - math.floor(gq[1])), gq[0])
    )
    budgets = {g: int(b) for g, b in base.items()}
    for g, _q in by_frac[: int(rem)]:
        budgets[g] += 1
    assert sum(budgets.values()) == total
    return budgets


def epoch_repetition_plan(
    df: DataFrame,
    budgets: dict[str, int],
    token_col: str = "n_tokens",
    group_col: str = "lang",
    id_col: str = "doc_id",
    supplies: dict[str, int] | None = None,
) -> DataFrame:
    """Per-document repetition counts that realize a token budget LARGER
    than a group's supply — the epoch-mixing stage
    :func:`temperature_mix_budgets` defers to (upsampled groups repeat
    their corpus; ``token_budget_sample`` only handles budget ≤ supply).

    Every document in group ``g`` gets ``k = budget_g div supply_g``
    full epochs; the remaining ``budget_g - k·supply_g`` tokens are
    filled by one extra copy of the mixing-hash-ordered document prefix
    (the same deterministic order ``token_budget_sample`` uses, so the
    partial epoch is a stable, engine-replayable set — no RNG). Total
    emitted tokens per group are exactly ``k·supply_g`` plus the prefix
    sum, undershooting the budget by less than the first unpicked
    document — the greedy-prefix contract.

    Groups without a budget entry and groups with zero token supply are
    dropped (nothing to repeat). All arithmetic is int64 (``div``, not
    float division), so the oracle replays it exactly. ``supplies``
    short-circuits the per-group token aggregate with totals the
    caller already holds (q207 reuses the sums behind its budgets —
    one fewer corpus scan).

    Scale shape: one groupBy for supplies (bounded: one row per group,
    broadcast back), one window per group for the prefix cumsum — the
    same two-shuffle plan as the budget sampler; ``copies`` is a column,
    so the (potentially huge) physical repetition stays lazy for the
    consumer (``explode(sequence(1, copies))`` or a sink-side writer)
    rather than materializing here.
    """
    entries = [
        x for k, v in budgets.items() for x in (F.lit(k), F.lit(int(v)))
    ]
    budget = F.element_at(F.create_map(*entries), F.col(group_col))
    if supplies is not None:
        spark = df.sparkSession
        sup = spark.createDataFrame(
            [(g, int(n)) for g, n in sorted(supplies.items())],
            f"{group_col} string, _sup long",
        )
    else:
        sup = df.groupBy(group_col).agg(
            F.sum(F.col(token_col).cast("long")).alias("_sup")
        )
    w = (
        Window.partitionBy(group_col)
        .orderBy(mix_hash(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("_budget", budget)
        .filter(F.col("_budget").isNotNull())
        .join(F.broadcast(sup), group_col)
        .filter(F.col("_sup") > 0)
        .withColumn("_k", F.expr("_budget div _sup"))
        .withColumn("_rem", F.col("_budget") - F.col("_k") * F.col("_sup"))
        .withColumn(
            "_cum", F.sum(F.col(token_col).cast("long")).over(w)
        )
        .withColumn(
            "copies",
            (
                F.col("_k")
                + F.when(F.col("_cum") <= F.col("_rem"), 1).otherwise(0)
            ).cast("int"),
        )
        .drop("_budget", "_sup", "_k", "_rem", "_cum")
    )


def k_anonymize(
    df: DataFrame,
    levels: list[list[str]],
    k: int = 8,
) -> DataFrame:
    """k-anonymity via a generalization ladder (Samarati/Sweeney):
    every row is released at the finest generalization level at which
    it sits in a group of ≥ k rows — computed by CASCADING REMAINDER,
    which is what makes the guarantee real: level i's groups are
    counted over only the rows the finer levels could NOT release, so
    every released (level, tuple) combination contains ≥ k rows of the
    RELEASED dataset itself. (The naive variant — pick each row's
    level from group counts over the ORIGINAL table — violates
    k-anonymity: a big level-1 group whose members mostly released at
    level 0 can leave an under-k sliver wearing the level-1 tuple.)

    ``levels`` is the ladder, finest first — e.g.
    ``[["nation", "segment"], ["nation"], []]``: level 0 keeps both
    quasi-identifiers, level 1 generalizes segment away, the final
    ``[]`` level (required) suppresses every quasi-identifier; its
    all-NULL records reveal only existence, so it may hold < k rows.
    Each coarser level must use a SUBSET of the finest level's columns
    (the lattice-path property; asserted).

    Returns the input plus ``anon_level`` (int) and one ``<col>_anon``
    per finest-level column, null-masked wherever that column is
    generalized away at the row's level.

    Scale shape: one groupBy count per ladder level over a SHRINKING
    remainder (each a map-side-combined aggregate whose output is
    group-sized), joined back on its own key — equi-joins AQE
    broadcasts when small. Ladder depth is a small constant, so the
    union of per-level slices stays a flat plan; no window over a
    quasi-identifier partition (a hot group would bottleneck one
    reducer).

    No counterpart in the reference (its only privacy op is column
    DROPS in the site exports — HTIPPLSITE/__init__.py:392); textbook
    k-anonymity.
    """
    if not levels or levels[-1]:
        raise ValueError("levels must end with [] (the suppress-all "
                         "fallback that makes anonymization total)")
    base = list(levels[0])
    for lv in levels[1:]:
        if not set(lv) <= set(base):
            raise ValueError(f"level {lv} is not a subset of the "
                             f"finest level {base}")
    slices = []
    remaining = df
    for i, lv in enumerate(levels[:-1]):
        cnt = f"_kanon_n{i}"
        # NULL-SAFE group join (review find): a NULL quasi-identifier
        # is a legitimate group — groupBy counts it, but a null-unsafe
        # equi-join would never match it back, silently DROPPING the
        # row from every slice (neither released nor suppressed). Join
        # on eqNullSafe per key instead.
        grp = remaining.groupBy(*lv).agg(F.count(F.lit(1)).alias(cnt))
        grp = grp.select(
            *[F.col(c).alias(f"_kanon_g_{c}") for c in lv], cnt
        )
        cond = F.lit(True)
        for c in lv:
            cond = cond & remaining[c].eqNullSafe(grp[f"_kanon_g_{c}"])
        j = remaining.join(grp, cond, "left").drop(
            *[f"_kanon_g_{c}" for c in lv]
        )
        slices.append(
            j.filter(F.col(cnt) >= k)
            .drop(cnt)
            .withColumn("anon_level", F.lit(i).cast("int"))
        )
        remaining = j.filter(F.col(cnt) < k).drop(cnt)
    slices.append(
        remaining.withColumn(
            "anon_level", F.lit(len(levels) - 1).cast("int")
        )
    )
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    for c in base:
        keep = F.lit(False)
        for i, lv in enumerate(levels):
            if c in lv:
                keep = keep | (F.col("anon_level") == i)
        out = out.withColumn(
            f"{c}_anon", F.when(keep, F.col(c))
        )
    return out


def l_diversity_audit(
    released: DataFrame,
    class_cols: "list[str]",
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit of an anonymized release (Machanavajjhala et
    al. '06; public method) — the check k-anonymity alone cannot
    make: a ≥ k equivalence class whose SENSITIVE attribute is
    uniform still discloses that attribute for every member
    (the homogeneity attack). Per equivalence class (the released
    quasi-identifier tuple, generalization level included) this
    reports the class size, the number of DISTINCT sensitive values,
    and the integer flag ``is_l_diverse`` (distinct ≥ l). Run it on
    every :func:`k_anonymize` release before publication; classes
    failing the flag need coarser generalization or suppression.

    Distinct-l is the standard first line (entropy-l and recursive
    (c,l) are strictly stronger refinements — out of scope here,
    stated for honesty). NULL sensitive values count as one distinct
    value (a visible missingness category IS a disclosure).

    Scale: one map-side-combined groupBy over the release; output is
    |classes| rows."""
    return (
        released.groupBy(*class_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct(F.col(sensitive_col))
            .cast("bigint")
            .alias("_nd"),
            F.max(F.col(sensitive_col).isNull().cast("int")).alias(
                "_has_null"
            ),
        )
        .select(
            *class_cols,
            "n",
            (F.col("_nd") + F.col("_has_null"))
            .cast("bigint")
            .alias("n_sensitive"),
            ((F.col("_nd") + F.col("_has_null")) >= l)
            .cast("int")
            .alias("is_l_diverse"),
        )
    )


def t_closeness_audit(
    released: DataFrame,
    class_cols: "list[str]",
    sensitive_col: str,
    t_num: int = 1,
    t_den: int = 5,
) -> DataFrame:
    """t-closeness audit of an anonymized release (Li, Li &
    Venkatasubramanian ICDE '07; public method) — the distributional
    check l-diversity cannot make: a class can hold l distinct
    sensitive values and STILL disclose (the skewness attack — e.g. a
    class that is 90% one rare disease when the population is 1%).
    t-closeness requires each equivalence class's sensitive
    distribution to sit within Earth-Mover's Distance t of the global
    one. For an ORDINAL sensitive attribute with unit ground distance
    the EMD has the classic closed form over the ordered domain
    v_1 < … < v_m:

        EMD(P_c, Q) = (1/(m-1)) · Σ_i | Σ_{j<=i} (p_j − q_j) |

    Everything gates as exact integers: with class counts n_cj, class
    size n_c, global counts N_j, total N, the cumulative deviation at
    position i is cum_i = Σ_{j<=i} (n_cj·N − N_j·n_c) (int64 exact;
    the full-domain sum telescopes to 0 — a built-in sanity check),
    ``sum_abs_cum_dev = Σ_i |cum_i|`` rides the gate as BIGINT, the
    one float is the final divide emd = sum_abs / ((m−1)·n_c·N), and
    the t-flag compares by INTEGER cross-multiplication —
    ``t_num·(m−1)·n_c·N ≥ t_den·sum_abs`` — never a float threshold
    (t = t_num/t_den, default 1/5). Envelope: m·n_c·N < 2⁶³ (ANSI
    BIGINT casts assert it).

    NULL sensitive values are EXCLUDED from both distributions (an
    unordered value has no position in the EMD ground distance);
    audit missingness disclosure with :func:`l_diversity_audit`,
    which counts NULL as a visible category. A single-value domain
    (m = 1) is t-close by definition (emd 0).

    Scale: three map-side-combined groupBys over the release, then a
    |classes| × |domain| lattice (geometry-bounded crossJoin — never
    corpus rows) with per-class windows ordered over the ≤ m-row
    domain; the global (N, m) scalar broadcasts. Output is |classes|
    rows."""
    base = released.filter(F.col(sensitive_col).isNotNull())
    dom = base.groupBy(sensitive_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j")
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tot"),
        F.count_distinct(F.col(sensitive_col))
        .cast("bigint")
        .alias("m"),
    )
    classes = base.groupBy(*class_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c")
    )
    cells = base.groupBy(*class_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cj")
    )
    cells_r = cells.select(
        *[F.col(c).alias(f"_t_{c}") for c in class_cols],
        F.col(sensitive_col).alias("_t_v"),
        "n_cj",
    )
    grid = classes.crossJoin(F.broadcast(dom))
    cond = grid[sensitive_col] == cells_r["_t_v"]
    for c in class_cols:
        cond = cond & grid[c].eqNullSafe(cells_r[f"_t_{c}"])
    filled = grid.join(cells_r, cond, "left").select(
        *[grid[c] for c in class_cols],
        "n_c",
        grid[sensitive_col],
        "n_j",
        F.coalesce(F.col("n_cj"), F.lit(0)).cast("bigint").alias("n_cj"),
    )
    w = (
        Window.partitionBy(*class_cols)
        .orderBy(sensitive_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = F.col("n_cj") * F.col("n_tot") - F.col("n_j") * F.col("n_c")
    per_class = (
        filled.crossJoin(F.broadcast(tot))
        .withColumn("_cum", F.sum(dev).over(w).cast("bigint"))
        .groupBy(*class_cols, "n_c", "m", "n_tot")
        .agg(
            F.sum(F.abs(F.col("_cum")))
            .cast("bigint")
            .alias("sum_abs_cum_dev")
        )
    )
    denom = (
        (F.col("m") - 1) * F.col("n_c") * F.col("n_tot")
    ).cast("bigint")
    emd = F.when(F.col("m") <= 1, F.lit(0.0)).otherwise(
        F.col("sum_abs_cum_dev").cast("double")
        / denom.cast("double")
    )
    t_ok = F.when(
        F.col("m") <= 1, F.lit(1)
    ).otherwise(
        (
            F.lit(int(t_num)) * denom
            >= F.lit(int(t_den)) * F.col("sum_abs_cum_dev")
        ).cast("int")
    )
    return per_class.select(
        *class_cols,
        "n_c",
        "m",
        "sum_abs_cum_dev",
        fs6(emd).alias("emd_r"),
        t_ok.cast("int").alias("is_t_close"),
    )
