"""Constant-size mergeable summaries: Count-Min (frequency),
k-min-registers (distinct count), and fixed-domain histograms (exact
quantiles for fixed-point columns).

Misra-Gries (operators/heavyhitters.py) answers "which items are
frequent" exactly; the Count-Min sketch (Cormode & Muthukrishnan '05)
answers "roughly how often does THIS item occur" for ANY item with a
fixed ``depth × width`` counter table — the structure a 100 TB
pipeline ships to a serving tier or joins across days, because its
size never depends on the vocabulary.

Distributed build = one aggregation: each item contributes ``depth``
(row, col) bucket increments, and ``groupBy(row, col).count()`` with
map-side combine means the shuffle is bounded by ``depth × width`` per
partition regardless of input size. Merging two sketches (days,
shards) is counter-wise addition — union + re-aggregate — because the
sketch is a linear projection of the input multiset.

Estimation: ``est(x) = min_i counter[i][h_i(x) mod width]``. The
estimate NEVER undercounts; it overcounts by hash collisions, bounded
by ``e·N/width`` with probability ``1 - e^-depth`` (N = stream size).

Hash family: one base hash per item plus ``depth`` affine
permutations, in either of the repo's two standard modes —
``xxhash64`` (JVM intrinsic, the production default) or ``poly``
(functions/xhash.py — exact integer arithmetic DuckDB replays
bit-for-bit, which is what lets q188 run under the full hash gate).

No counterpart in the reference (its only frequency logic is pandas
``value_counts`` — HTIPPLSITE/__init__.py:315); textbook CM sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpi_etl_spark.functions import xhash


def _bucket_cols(base, depth: int, width: int, hash_mode: str) -> list:
    """The ``depth`` bucket indices of one item, as Column exprs.

    ``poly`` mode: ``(a_i·h + b_i) mod P mod width`` — non-negative by
    construction. ``xxhash64`` mode re-hashes the base with the row
    index as seed, then takes ``pmod`` (xxhash64 is signed; ``%`` in
    Spark keeps the dividend's sign, so pmod is required for a valid
    column index)."""
    if hash_mode == "poly":
        return [
            xhash.affine_hash(base, i, depth) % width for i in range(depth)
        ]
    if hash_mode != "xxhash64":
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return [
        F.pmod(F.xxhash64(base, F.lit(i)), F.lit(width))
        for i in range(depth)
    ]


def _bucket_arr(base, depth: int, width: int, hash_mode: str):
    """``F.array(*_bucket_cols(...))`` with the poly base hash bound
    ONCE (round-13, guide §1.2 per-task work): the poly fold is a
    higher-order-function tree, which Spark evaluates INTERPRETED
    (CodegenFallback) — inlining it into each of the ``depth`` bucket
    expressions paid the whole per-codepoint fold ``depth`` times per
    item and put ``depth`` copies of the tree in the plan (analysis
    cost rides every consumer). ``let_`` hands the folded value to the
    ``depth`` cheap affine transforms — identical integer arithmetic,
    one fold. The xxhash64 mode keeps the flat form: it is a codegen
    intrinsic, and wrapping it in a higher-order binding would FORCE
    the projection onto the interpreted path."""
    from gpi_etl_spark.functions.hof import let_

    if hash_mode == "poly":
        return let_(
            base,
            lambda h: F.array(
                *[
                    xhash.affine_hash(h, i, depth) % width
                    for i in range(depth)
                ]
            ),
        )
    return F.array(*_bucket_cols(base, depth, width, hash_mode))


def _null_weight_guard(weight_col: str, what: str):
    """Lazy NULL guard INSIDE a summed weight expression (unprunable):
    a NULL CDC weight is a malformed feed row — sum() skipping it
    would silently under-apply the delta. Shared by both weighted
    builders so the contract cannot drift between them."""
    return F.when(
        F.col(weight_col).isNotNull(),
        F.col(weight_col).cast("bigint"),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"{what}: NULL weight in the delta stream — a CDC "
                "feed row with no weight is malformed; fix or filter "
                "it upstream (0 means 'no change', NULL means 'bug')."
            )
        )
    )


def cms_geo(width: int, depth: int, hash_mode: str) -> str:
    """The geometry/derivation stamp every CMS counter table carries
    as a constant ``geo`` column (advice find, mirroring the kmv
    ``fam`` tag): counters from different (width, depth, hash family)
    builds live in incompatible bucket spaces, and before the stamp
    cms_merge / cms_apply / the streamed cms_fold_batch state would
    ADD them without error — every later estimate quietly wrong, with
    the persisted/CDC paths letting the corruption outlive the
    process. Bump the ``cms1`` version segment on any future bucket-
    derivation change (the kmv lesson: a derivation change with no
    tag bump is indistinguishable from compatible state)."""
    return f"cms1-{hash_mode}-w{width}-d{depth}"


def _cms_geo_guard(value, ok_col, op: str, msg: str | None = None):
    """Wrap an output column so evaluating it on a geometry-mixed row
    raises at execution time (lazy — the guard lives IN the protected
    expression, so no eager action and no optimizer pruning)."""
    return F.when(ok_col, value).otherwise(
        F.raise_error(
            F.lit(
                msg
                or f"{op}: CMS counter tables with DIFFERENT geometry "
                "stamps (width/depth/hash family) were mixed — their "
                "bucket spaces are incompatible and counter addition "
                "is meaningless. Rebuild to one geometry and retry."
            )
        )
    )


def _cms_counters(
    items: DataFrame,
    item_col: str,
    width: int,
    depth: int,
    hash_mode: str,
    weight=None,
) -> DataFrame:
    """The ONE copy of the CMS bucket/aggregate pipeline (review
    find: cms_build and cms_build_weighted carried verbatim twins of
    the explode shape, and the apply()==rebuild linearity law depends
    on the two derivations staying bit-identical). ``weight=None``
    counts rows; a Column sums it. Every counter table is stamped
    with its :func:`cms_geo` geometry."""
    base = (
        xhash.poly_hash(F.col(item_col))
        if hash_mode == "poly"
        else F.xxhash64(F.col(item_col))
    )
    pos = F.posexplode(
        _bucket_arr(base, depth, width, hash_mode)
    ).alias("row", "col")
    if weight is None:
        bucketed = items.select(pos)
        agg = F.count(F.lit(1)).alias("c")
    else:
        bucketed = items.select(weight.alias("_w"), pos)
        agg = F.sum("_w").alias("c")
    return bucketed.groupBy(
        F.col("row").cast("int").alias("row"),
        F.col("col").cast("int").alias("col"),
    ).agg(agg).withColumn("geo", F.lit(cms_geo(width, depth, hash_mode)))


def cms_build(
    items: DataFrame,
    item_col: str,
    width: int = 512,
    depth: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Build a Count-Min sketch over a string item stream.

    Returns the counter table ``(row int, col int, c bigint)`` —
    at most ``depth × width`` rows (zero counters are omitted; an
    absent (row, col) means 0). One shuffle, keyed on (row, col):
    partial counts combine map-side, so the wire carries at most
    ``depth × width`` rows per input partition however large the
    stream is.
    """
    return _cms_counters(items, item_col, width, depth, hash_mode)


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Counter-wise sum of same-shape sketches (linearity of the CM
    projection): union + re-aggregate. Merging per-day / per-shard
    sketches this way is the whole point of shipping a sketch instead
    of exact counts.

    Mixed GEOMETRIES fail LOUDLY (advice find, the kmv_merge pattern):
    the ``geo`` stamp cms_build writes is asserted single-valued at
    execution time, BOTH per (row, col) cell and — since round 11 —
    across the WHOLE merged table (advice find: two sparse sketches of
    different geometries with disjoint populated cells never collide
    on a shared cell, so the per-cell check alone was probabilistic
    where the kmv fam check is deterministic). The whole-table check
    rides a ONE-ROW count_distinct(geo) aggregate crossJoined back
    onto the counters (the q241-class 1×1 scalar-broadcast pattern,
    already the audit-whitelisted shape for every cms consumer —
    deliberately NOT a partition-less window, which would put a
    WindowExec funnel in every merging plan). Both guards stay lazy
    in-expression (no eager action, no optimizer pruning). A
    tagged/legacy-untagged mix dies in unionByName's schema check, and
    legacy-only inputs merge unguarded — rebuild stored sketches once
    after upgrading (one pass; that is the point of the operator)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    if "geo" not in out.columns:
        return out.groupBy("row", "col").agg(F.sum("c").alias("c"))
    whole = out.agg(F.count_distinct("geo").alias("_ngall"))
    merged = out.groupBy("row", "col").agg(
        F.sum("c").alias("c"),
        F.count_distinct("geo").alias("_ng"),
        F.max("geo").alias("geo"),
    ).crossJoin(F.broadcast(whole))
    # BOTH outputs guarded (the kmv_overlap both-columns rule): a
    # consumer projecting only the stamp must not see a clean-looking
    # max(geo) from a corrupt mix (review find)
    ok = (F.col("_ng") == 1) & (F.col("_ngall") == 1)
    return merged.select(
        "row",
        "col",
        _cms_geo_guard(F.col("c"), ok, "cms_merge").alias("c"),
        _cms_geo_guard(F.col("geo"), ok, "cms_merge").alias("geo"),
    )


def cms_build_weighted(
    items: DataFrame,
    item_col: str,
    weight_col: str,
    width: int = 512,
    depth: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Count-Min counters over a WEIGHTED item stream — each row
    contributes ``weight`` (any int64, including negative) to its
    ``depth`` buckets instead of 1. This is what makes the CM sketch a
    LINEAR projection in practice: a CDC/correction stream encoded as
    (item, +n) inserts and (item, -n) retractions becomes a delta
    sketch, and :func:`cms_apply` folds it into a maintained sketch by
    counter addition — no rebuild, no rescan of the base corpus.

    ESTIMATOR VALIDITY under retractions, stated honestly: the ``min``
    estimator (cms_estimate, cms_join_size) keeps its never-undercount
    guarantee only while every key's NET weight stays ≥ 0 — true for
    the CDC case (you only retract rows you previously inserted), the
    intended use. A general turnstile stream where keys can go net
    negative makes collision terms negative and ``min`` can undershoot;
    the textbook remedy is the count-MEDIAN estimator over the depth
    rows (Cormode & Muthukrishnan '05 §4.2), which this module does
    not implement — enforce net ≥ 0 upstream instead.

    Zero-weight rows contribute nothing but still cost a shuffle row
    per bucket; filter them out upstream when the delta stream is
    sparse. NULL weights are REJECTED at execution (a NULL in a CDC
    weight column is a malformed feed row, and sum() silently
    skipping it would under-apply the delta). Output rows may carry
    c = 0 or c < 0 (a delta sketch is not a state sketch);
    :func:`cms_apply` restores the canonical zeros-omitted form after
    folding. Shares its bucket pipeline with cms_build through
    ``_cms_counters`` — the linearity law depends on the two
    derivations being the same code.

    RESERVED NAMES (advice find): the pipeline aliases ``_w`` (the
    guarded weight) and the posexplode outputs ``row``/``col``
    internally — an ``item_col``/``weight_col`` named one of these
    would be shadowed; rename such columns before building."""
    return _cms_counters(
        items, item_col, width, depth, hash_mode,
        weight=_null_weight_guard(weight_col, "cms_build_weighted"),
    )


def _retraction_guard(c, what: str):
    """Lazy execution-time guard on a folded counter: a NEGATIVE
    count PROVES over-retraction (if every key's net is ≥ 0, every
    counter — a sum of nets — is ≥ 0), i.e. the CDC contract "only
    retract previously-inserted rows" was violated upstream. Failing
    loudly here beats the silent alternative (min estimates /
    quantile walks quietly undercount forever after)."""
    return F.when(c >= 0, c).otherwise(
        F.raise_error(
            F.lit(
                f"{what}: folded counter went NEGATIVE — the delta "
                "stream retracted more than was ever inserted for "
                "some key(s) (the CDC contract is retract-what-you-"
                "inserted). The maintained sketch is corrupt; fix "
                "the feed and rebuild."
            )
        )
    )


def cms_apply(sketch: DataFrame, *deltas: DataFrame) -> DataFrame:
    """Fold delta sketches (:func:`cms_build_weighted` over a CDC
    stream) into a maintained sketch: counter-wise addition, then drop
    exact-zero counters so the result is bit-identical to a fresh
    ``cms_build`` over the corrected corpus (cms_build omits zero
    counters by construction; a retraction that cancels a bucket
    exactly must therefore REMOVE the row, not keep a 0 — the
    linearity law ``apply(build(base), delta(changes)) ==
    build(corrected)`` is pinned by test and is what lets a 100 TB
    pipeline maintain its frequency/join-size sketches from the
    day's CDC feed alone). A counter that folds NEGATIVE raises at
    execution (over-retraction proof — see _retraction_guard)."""
    folded = cms_merge(sketch, *deltas)
    # cms_merge's geo guard already rejects base/delta geometry
    # mismatches; carry the stamp so the maintained sketch stays
    # guarded through the NEXT apply.
    keep = (["geo"] if "geo" in folded.columns else [])
    return folded.select(
        "row", "col",
        _retraction_guard(F.col("c"), "cms_apply").alias("c"),
        *keep,
    ).filter(F.col("c") != 0)


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    width: int = 512,
    depth: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Point-estimate frequencies for a (small) probe set.

    Returns ``(item_col, est bigint)`` with ``est = min`` over the
    ``depth`` hashed counters; a missing counter row reads as 0. The
    sketch is bounded at ``depth × width`` rows by construction, so it
    broadcasts into the probe stream — estimation shuffles nothing but
    the final per-item min, however many probes arrive.

    ``width``/``depth``/``hash_mode`` MUST match the ``cms_build``
    call that produced the sketch — a mismatch would read
    never-incremented buckets as 0, silently breaking the
    never-undercount guarantee. Since round 10 the counter table
    carries its :func:`cms_geo` stamp, so the mismatch IS detected:
    a stamped sketch whose geometry disagrees with the caller's
    parameters raises at execution time (legacy unstamped tables
    still estimate unguarded — rebuild them once to get the guard).
    """
    base = (
        xhash.poly_hash(F.col(item_col))
        if hash_mode == "poly"
        else F.xxhash64(F.col(item_col))
    )
    if "geo" in sketch.columns:
        expected = cms_geo(width, depth, hash_mode)
        sketch = sketch.select(
            "row",
            "col",
            _cms_geo_guard(
                F.col("c"),
                F.col("geo") == expected,
                "cms_estimate",
                msg=(
                    "cms_estimate: the sketch's geometry stamp "
                    "disagrees with the caller's width/depth/"
                    f"hash_mode (expected {expected}) — estimates "
                    "from the wrong bucket space silently break the "
                    "never-undercount guarantee. Pass the build's "
                    "parameters or rebuild the sketch."
                ),
            ).alias("c"),
        )
    pb = probes.select(
        item_col,
        F.posexplode(
            _bucket_arr(base, depth, width, hash_mode)
        ).alias("row", "col"),
    ).select(
        item_col,
        F.col("row").cast("int").alias("row"),
        F.col("col").cast("int").alias("col"),
    )
    joined = pb.join(F.broadcast(sketch), ["row", "col"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")
    )


def cms_join_size(
    a: DataFrame,
    b: DataFrame,
) -> DataFrame:
    """Equi-join SIZE estimate from two Count-Min sketches — the
    classic CM inner-product estimator (Cormode & Muthukrishnan '05,
    §4.3; AGMS lineage): for key-frequency vectors f_A, f_B the exact
    join cardinality is ``|A ⋈ B| = Σ_v f_A(v)·f_B(v)``, and each
    sketch row's bucket-wise dot product ``Σ_col a·b`` equals that sum
    PLUS non-negative collision cross-terms — so ``min`` over the
    ``depth`` rows never underestimates, and is exact in the
    collision-free regime (the q188 property, lifted from point
    queries to join sizes). This is the PLANNER primitive: estimate a
    join's output size from two KB-sized counter tables before paying
    for the join — per-day/shard sketches merge first (cms_merge), so
    yesterday's sketches price today's query.

    ``depth`` is DERIVED from each sketch (max row index + 1 — every
    row of a non-empty sketch holds ≥1 counter, since every item
    increments one bucket per row) and the two derivations are
    asserted equal at execution: a caller-supplied depth that
    disagreed with the build silently returned 0 — an UNDERCOUNT
    from the one estimator whose contract is never-undercount
    (review find; the kmv_estimate k-derivation lesson applied).
    Geometry stamps: both sides stamped → full (width/depth/hash
    family) equality asserted. Exactly ONE side stamped (a stamped ×
    legacy pair) → since round 11 the stamped side's d-segment is
    asserted against the untagged side's derived depth and the stamped
    side must be single-geometry; the untagged side's width/hash_mode
    remain unverifiable by construction and must match by contract
    (documented asymmetry — rebuild legacy sketches for the full
    check; legacy wire format (row, col, c) kept for q188 oracle
    stability). An EMPTY side estimates 0 (an empty stream joins to
    nothing).

    Envelope: the dot accumulates in int64 — exact while
    ``N_A · N_B < 2^63`` (stream sizes' product under ~9·10^18, i.e.
    ~3·10^9 rows a side); wider streams should sketch per-day and
    estimate per-day anyway (join sizes add over disjoint partitions
    of either side).

    Returns one row: ``est_join_size bigint`` (never an undercount).
    """
    a_geo = "geo" in a.columns
    b_geo = "geo" in b.columns
    a_aggs = [(F.max("row") + 1).alias("_da")]
    b_aggs = [(F.max("row") + 1).alias("_db")]
    if a_geo:
        # round 10: with stamped sketches the full geometry (width/
        # depth/hash family) is asserted equal across the two sides,
        # closing the width/hash_mode "by contract" gap below
        a_aggs += [
            F.count_distinct("geo").alias("_nga"),
            F.max("geo").alias("_ga"),
        ]
    if b_geo:
        b_aggs += [
            F.count_distinct("geo").alias("_ngb"),
            F.max("geo").alias("_gb"),
        ]
    meta = a.agg(*a_aggs).crossJoin(b.agg(*b_aggs))
    aa = a.select("row", "col", F.col("c").alias("_ca"))
    bb = b.select("row", "col", F.col("c").alias("_cb"))
    per_row = (
        aa.join(bb, ["row", "col"])
        .groupBy("row")
        .agg(
            F.sum(F.col("_ca") * F.col("_cb"))
            .cast("bigint")
            .alias("_dot")
        )
    )
    agg = per_row.agg(
        F.count(F.lit(1)).alias("_nr"), F.min("_dot").alias("_mind")
    ).crossJoin(F.broadcast(meta))
    # Stamp parsing for the ONE-side-stamped case (advice find, round
    # 11): previously a stamped × legacy-untagged pair skipped the
    # geometry assertion entirely — unlike cms_merge, where such a mix
    # dies in unionByName. The untagged side exposes only its depth
    # (max(row)+1), so the stamped side's d-segment is asserted
    # against it; width/hash family on the untagged side remain
    # unverifiable BY CONSTRUCTION (documented asymmetry — rebuild
    # legacy sketches to get the full check).
    def _stamp_depth(geo_col):
        # try_cast, not cast: regexp_extract yields '' when the stamp
        # misses the pattern, and under ANSI a bare cast('') dies with
        # an opaque CAST_INVALID_INPUT instead of reaching the
        # coalesce-to-True below that raises the real diagnostic.
        return F.regexp_extract(geo_col, r"-d(\d+)$", 1).try_cast(
            "bigint"
        )

    if a_geo and b_geo:
        geo_mixed = (
            (F.col("_nga") > 1)
            | (F.col("_ngb") > 1)
            | (F.col("_ga") != F.col("_gb"))
        )
    elif a_geo:
        # coalesce-to-True: if the stamp ever fails the '-d(\d+)$'
        # parse, _stamp_depth is NULL, the inequality is NULL, and a
        # bare F.when(NULL, raise) would silently SKIP the assertion —
        # reopening the very gap this check closes. An unparseable
        # stamp is a geometry-format drift and must fail loudly
        # (ADVICE r11).
        geo_mixed = F.coalesce(
            (F.col("_nga") > 1)
            | (_stamp_depth(F.col("_ga")) != F.col("_db")),
            F.lit(True),
        )
    elif b_geo:
        geo_mixed = F.coalesce(
            (F.col("_ngb") > 1)
            | (_stamp_depth(F.col("_gb")) != F.col("_da")),
            F.lit(True),
        )
    else:
        geo_mixed = F.lit(False)
    est = (
        F.when(
            F.col("_da").isNull() | F.col("_db").isNull(), F.lit(0)
        )
        .when(
            geo_mixed,
            F.raise_error(
                F.lit(
                    "cms_join_size: the two sketches carry different "
                    "geometry stamps (width/depth/hash family) — "
                    "their bucket-wise dot products are meaningless "
                    "together. Rebuild to one geometry."
                )
            ).cast("bigint"),
        )
        .when(
            F.col("_da") != F.col("_db"),
            F.raise_error(
                F.lit(
                    "cms_join_size: the two sketches have DIFFERENT "
                    "depths (derived from their row indexes) — they "
                    "were built with different geometries and their "
                    "row dot products are meaningless together. "
                    "Rebuild to one width/depth/hash_mode."
                )
            ).cast("bigint"),
        )
        # _nr < depth: some row pair shares no bucket, so that row's
        # dot is 0 and the min over all depth rows is 0 (a join with
        # no shared keys)
        .when(F.col("_nr") == F.col("_da"), F.col("_mind"))
        .otherwise(F.lit(0))
    )
    return agg.select(est.cast("bigint").alias("est_join_size"))


# ---------------------------------------------------------------------------
# k-min-registers distinct-count sketch (the KMV/HLL seat, replayable)
# ---------------------------------------------------------------------------
#
# HyperLogLog's registers are engine-private (Spark's HLL++ and
# DuckDB's approx_count_distinct cannot replay each other), which kept
# the old approximate-distinct query rows-only. This sketch fills the
# same seat with REPLAYABLE internals: k independent min-hash
# registers ``m_i = min over items of h_i(item)`` where h_i is the
# i-th affine derivation of one base hash (the MinHash trick,
# Flajolet–Martin lineage). For n distinct uniform hashes in [0, P),
# E[m_i] ≈ P/(n+1), so the method-of-moments estimate from the
# register SUM is
#
#     n̂ = k·P / (Σ m_i + k) − 1        (relative sd ≈ 1/sqrt(k))
#
# In poly mode the base hash is CUBED-MIXED first:
# ``g = (h·((h·h) mod P) + 13·h + 7) mod P``. The minima estimator
# needs near-uniform marginals, and the raw poly hash of short keys
# (digit ids) lands in a narrow band that an AFFINE map keeps
# structured (an arithmetic progression mod P — measured 42% estimate
# bias at n=150); the cubic is the cheapest nonlinearity that breaks
# the progression (measured |err| ≤ 6% for n spanning 15..100 000 at
# k=128, consistent with the 1/sqrt(k) theory). Every intermediate
# stays in exact signed-64 range (h < P ≈ 10^9, so h·h < P² ≈ 10^18
# < 2^63, and (h·h mod P)·h < P² again), so both engines compute the
# identical integers.
#
# Scale shape mirrors cms_build: registers build in ONE aggregation
# with map-side combine (≤ k rows per group per partition on the
# wire — never a per-key window, never a collect_set whose size
# depends on the data), and two sketches merge by register-wise min
# (kmv_merge), so per-day/per-shard sketches compose exactly like CM
# counters. In ``poly`` mode every register is exact 64-bit integer
# arithmetic both engines compute identically, so the full sketch —
# internals AND estimate — sits under the DuckDB hash gate (q221).

#: register-domain modulus in poly mode (xhash.P re-exported for
#: estimator callers)
KMV_P = xhash.P

#: register-derivation family tags, stamped into every register table
#: as a constant ``fam`` column so cross-family merges/overlaps FAIL
#: LOUDLY instead of silently mixing incompatible register spaces
#: (advice find: the round-8 derivation change relied on a docstring
#: alone — register-wise min across two hash families is meaningless
#: and nothing would have errored). The tag names the full derivation
#: (single base hash → cubic premix → affine family) AND the base,
#: because registers from different bases never compare either. Bump
#: the version segment on any future derivation change.
KMV_FAMILIES = {
    "poly": "affine1-poly",
    "xxhash64": "affine1-xx64",
}


def _kmv_fam_guard(value, nf_col, op: str):
    """Wrap an output column so evaluating it on a mixed-family row
    raises at execution time (lazy — no eager action on the lazy
    DataFrame API; the guard lives IN the selected expression, so the
    optimizer cannot prune it away from the column it protects)."""
    return F.when(nf_col == 1, value).otherwise(
        F.raise_error(
            F.lit(
                f"kmv_{op}: register tables from DIFFERENT derivation "
                "families were mixed — register-wise comparison across "
                "families is meaningless. Rebuild the older sketch "
                "with the current kmv_build (one pass) and retry."
            )
        )
    )


def kmv_build(
    items: DataFrame,
    item_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Build per-group min registers ``(*group_cols, i int, m bigint)``.

    ``i`` runs 0..k-1; ``m`` is the minimum of the i-th derived hash
    over every item in the group (duplicates are free — min is
    idempotent, so no distinct pre-pass is needed).

    Both modes share ONE register-derivation shape: a single per-item
    base hash folded into [0, P), cubic-premixed, then the k-member
    affine family — only the BASE differs (replayable poly fold vs
    the JVM's xxhash64). The earlier xxhash64 mode computed k FULL
    ``xxhash64(item, i)`` hashes per row; past ~64 array members the
    generated projection code blows the whole-stage-codegen method
    budget and Spark silently falls back to interpreted expression
    eval — measured 2.9 s → 13.9 s for k 64 → 96 on a 1M-row build
    (docs/KMV_PROBE.md), a 100 TB cliff hiding behind a default. One
    base hash + k integer transforms keeps codegen intact and the
    build flat in k.

    COMPATIBILITY — registers are versioned by their derivation
    family MECHANICALLY: every register table carries a constant
    ``fam`` column (KMV_FAMILIES[hash_mode]), and kmv_merge /
    kmv_overlap / kmv_estimate refuse mixed-family inputs at
    execution time (advice find: the round-8 derivation change —
    from k independent ``xxhash64(item, i)`` draws to one base hash
    + affine family — relied on this docstring alone; register-wise
    min across two hash families is meaningless and nothing would
    have errored). Tables persisted by the pre-tag builds have no
    ``fam`` column: a tagged/untagged mix dies in unionByName's
    schema check, and untagged-only inputs merge unguarded — rebuild
    stored registers once after upgrading (a sketch build is one
    pass; that is the point of the operator).

    PARALLELISM — the build's per-row work is one base fold plus k
    integer transforms feeding k min buffers; input partitioning
    carries 1:1 into that work, so a few-partition input (one small
    file, a collapsed coalesce) still concentrates the whole pass on
    those few tasks — repartition slim inputs first (the q242
    lesson); well-partitioned lake inputs need nothing.

    SHAPE (round-13, guide §2.3/§2.4): the build aggregates k MIN
    columns in ONE groupBy over the input rows and unpivots the
    ≤|groups| result to the (i, m) register layout afterwards. The
    previous form posexploded k register rows per input row BEFORE
    the partial min — at 100 TB that materializes |rows|·k rows
    through the Generate node even though map-side combine bounds the
    wire; the min-columns form feeds the same k min buffers straight
    from the projection (no Generate before the partial aggregate),
    and the unpivot's explode runs over |groups| rows only. Register
    tables are bit-identical (min is commutative/associative either
    way; the law test pins build-equivalence), including the
    only-NULL-items group (count guard keeps empty INPUT producing an
    empty table, a group of NULL items still yields m = NULL rows).

    CARDINALITY CEILING — the single-base shape means two items
    colliding in the [0, P) base collide on ALL k registers (the
    k-independent-draws mode decorrelated this at 1/P per register).
    Expected fraction of distincts lost to correlated collisions is
    ~n/(2P): ≤0.5% at n = 10⁷, ~5% at n = 10⁸ — keep per-group
    distincts well under P ≈ 10⁹ (both modes share this family-wide
    ceiling through the shared affine stage; the replayable poly base
    always had it). Past that, this sketch is the wrong tool — use
    approx_count_distinct (in-JVM HLL) or widen the hash family.
    """
    from gpi_etl_spark.functions.hof import let_

    if hash_mode == "poly":
        base = xhash.poly_hash(F.col(item_col))
    elif hash_mode == "xxhash64":
        base = F.pmod(F.xxhash64(F.col(item_col)), F.lit(KMV_P))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    # bind the base ONCE (let_), then derive the k registers from the
    # cubic-mixed value (xhash.cubic_mix — the shared
    # progression-breaking premix) — k cheap integer transforms
    regs_arr = let_(
        base,
        lambda h: let_(
            xhash.cubic_mix(h),
            lambda g: F.array(
                *[xhash.affine_hash(g, i, k) for i in range(k)]
            ),
        ),
    )
    # internal column names are double-underscored to stay out of any
    # caller's group_cols namespace (the ams/cms reserved-name advice)
    wide = items.select(*group_cols, regs_arr.alias("__kmv_r"))
    ga = wide.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__kmv_n"),
        *[
            F.min(F.element_at("__kmv_r", i + 1)).alias(f"__kmv_m{i}")
            for i in range(k)
        ],
    )
    return (
        ga.filter(F.col("__kmv_n") > 0)
        .select(
            *group_cols,
            F.posexplode(
                F.array(*[F.col(f"__kmv_m{i}") for i in range(k)])
            ).alias("i", "m"),
        )
        .select(
            *group_cols,
            F.col("i").cast("int").alias("i"),
            F.col("m"),
            F.lit(KMV_FAMILIES[hash_mode]).alias("fam"),
        )
    )


def kmv_merge(*sketches: DataFrame) -> DataFrame:
    """Register-wise min of same-shape sketches: union + re-min (the
    sketch is a min-projection of the input set, so merge = min).

    Mixed derivation families fail LOUDLY: the ``fam`` tag kmv_build
    stamps is asserted single-valued per register group at execution
    time (and a tagged/legacy-untagged mix already dies in
    unionByName's schema check). Legacy tables with no ``fam`` column
    merge as before — they are unversioned; rebuild them to get the
    guard."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("m", "fam")]
    if "fam" not in out.columns:
        return out.groupBy(*keys).agg(F.min("m").alias("m"))
    merged = out.groupBy(*keys).agg(
        F.min("m").alias("m"),
        F.count_distinct("fam").alias("_nf"),
        F.max("fam").alias("fam"),
    )
    return merged.select(
        *keys,
        _kmv_fam_guard(F.col("m"), F.col("_nf"), "merge").alias("m"),
        "fam",
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct-count estimate per group from a register table.

    ``k`` is DERIVED from the sketch itself (the per-group register
    count — every group always carries all k registers), not taken as
    a parameter: a caller-supplied k that disagreed with the build
    silently mis-scaled the estimate ~k_claimed/k_true× (review find).

    Returns ``(*group_cols, reg_sum bigint, est double)``. The float
    path is deterministic by construction: ``reg_sum`` and ``k`` are
    exact integers (reg_sum ≤ k·P < 2^53, so the double casts are
    exact), the ``k·P`` product of exact doubles is correctly rounded
    once, and the single IEEE division is correctly rounded — both
    engines produce the identical double.
    """
    has_fam = "fam" in sketch.columns
    aggs = [
        F.sum("m").cast("bigint").alias("reg_sum"),
        F.count(F.lit(1)).cast("bigint").alias("_k"),
    ]
    if has_fam:
        aggs.append(F.count_distinct("fam").alias("_nf"))
    agg = sketch.groupBy(*group_cols).agg(*aggs)
    est = (
        F.col("_k").cast("double") * F.lit(float(KMV_P))
        / (F.col("reg_sum") + F.col("_k")).cast("double")
        - F.lit(1.0)
    )
    reg_sum = F.col("reg_sum")
    if has_fam:
        # both outputs guarded — either alone could be pruned by a
        # downstream projection, taking the guard with it
        nf = F.col("_nf")
        reg_sum = _kmv_fam_guard(reg_sum, nf, "estimate")
        est = _kmv_fam_guard(est, nf, "estimate")
    return agg.select(
        *group_cols, reg_sum.alias("reg_sum"), est.alias("est")
    )


def kmv_overlap(sketch: DataFrame, key_col: str) -> DataFrame:
    """Pairwise set-overlap estimates between every two sketched sets,
    FROM THE REGISTERS ALONE — the planner/decontamination primitive:
    how much do two corpora/partitions/days share, without touching
    either again.

    ``sketch`` is a register table ``(key_col, i, m)`` (kmv_build with
    ``group_cols=(key_col,)``). Each register is a min-hash, so per
    register ``P(m_a = m_b) = J(A, B)`` — exact under ideal
    per-register-independent hashing; with the single-base derivation
    the whole sketch family shares (kmv_build), two items colliding in
    the [0, P) base agree on ALL k registers at once, which adds a
    correlated ~n/(2P) upward bias to the Jaccard estimate (nonzero
    even for disjoint sets). The same ``n ≪ P`` envelope documented on
    kmv_build's cardinality ceiling therefore bounds OVERLAP quality
    too: keep per-set distincts well under P ≈ 10⁹ (≤0.5% bias at
    n = 10⁷), or this is the wrong tool. The estimators, all
    replayable integer/fixed-order arithmetic:

    * ``n_match``   — registers where the two sketches agree (int);
    * ``jaccard_e`` — n_match / k, the MinHash Jaccard estimate;
    * ``union_e``   — kmv estimate over the register-wise min (the
      merged sketch IS the union's sketch);
    * ``inter_e``   — jaccard_e · union_e, evaluated as
      ``(n_match · union_e) / k`` so both engines run the identical
      two IEEE operations.

    One self-join on the register index over k-row-per-key tables —
    the work scales with |keys|²·k, never with the data the sketches
    summarized. Pairs are emitted once (key_a < key_b, with a NULL key
    ordered LAST: kmv_build's groupBy keeps a NULL group as a real
    set, and a bare ``<`` would evaluate NULL and silently drop that
    set from every pair — the q224-class null-unsafe-drop, review
    find).

    Mixed derivation families fail LOUDLY: every register comparison
    is guarded on the two sides' ``fam`` tags agreeing, so a register
    table that mixes kmv_build versions (or poly with xxhash64 bases)
    raises at execution instead of returning meaningless agreements.
    Legacy fam-less tables skip the guard — rebuild to get it.
    """
    has_fam = "fam" in sketch.columns
    a_cols = [F.col(key_col).alias("key_a"), "i", F.col("m").alias("m_a")]
    b_cols = [F.col(key_col).alias("key_b"), "i", F.col("m").alias("m_b")]
    if has_fam:
        a_cols.append(F.col("fam").alias("fam_a"))
        b_cols.append(F.col("fam").alias("fam_b"))
    a = sketch.select(*a_cols)
    b = sketch.select(*b_cols)
    once = (F.col("key_a") < F.col("key_b")) | (
        F.col("key_a").isNotNull() & F.col("key_b").isNull()
    )
    pairs = a.join(b, "i").filter(once)
    match = (F.col("m_a") == F.col("m_b")).cast("int")
    umin = F.least("m_a", "m_b")
    if has_fam:
        # guard BOTH aggregated inputs — either output column alone
        # can survive a downstream projection
        same = (F.col("fam_a") == F.col("fam_b")).cast("bigint")
        match = _kmv_fam_guard(match, same, "overlap")
        umin = _kmv_fam_guard(umin, same, "overlap")
    agg = pairs.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_k"),
        F.sum(match).cast("bigint").alias("n_match"),
        F.sum(umin).cast("bigint").alias("_union_reg_sum"),
    )
    union_e = (
        F.col("_k").cast("double") * F.lit(float(KMV_P))
        / (F.col("_union_reg_sum") + F.col("_k")).cast("double")
        - F.lit(1.0)
    )
    return agg.select(
        "key_a",
        "key_b",
        "n_match",
        "_union_reg_sum",
        (F.col("n_match").cast("double") / F.col("_k").cast("double"))
        .alias("jaccard_e"),
        union_e.alias("union_e"),
        (
            F.col("n_match").cast("double")
            * union_e
            / F.col("_k").cast("double")
        ).alias("inter_e"),
    ).withColumnRenamed("_union_reg_sum", "union_reg_sum")


def _rollup_sets(
    what: str,
    group_cols: tuple[str, ...],
    sets: tuple[tuple[str, ...], ...] | None,
) -> tuple[tuple[str, ...], ...]:
    """Shared grouping-set validation for the rollup cubes (review
    find: the two rollups carried twin copies, and neither rejected
    DUPLICATE sets — Spark's groupingSets emits a duplicated level
    twice under the same gid, and the downstream re-aggregation then
    silently doubles that level's n / reg_sum, the exact
    silent-corruption class the fam/dig guards exist to prevent).
    Defaults to the ROLLUP chain; rejects unknown columns and
    duplicate (or order-/repeat-equivalent) sets loudly."""
    if sets is None:
        sets = tuple(
            tuple(group_cols[:i]) for i in range(len(group_cols), -1, -1)
        )
    if not sets:
        raise ValueError(f"{what}: sets must name at least one "
                         "grouping set (use ((),) for the grand total)")
    seen: set[frozenset] = set()
    for s in sets:
        bad = [c for c in s if c not in group_cols]
        if bad:
            raise ValueError(
                f"{what}: grouping set {s!r} names non-group "
                f"columns {bad!r} (group_cols={group_cols!r})"
            )
        key = frozenset(c for c in group_cols if c in s)
        if key in seen:
            raise ValueError(
                f"{what}: duplicate grouping set {s!r} — groupingSets "
                "emits the level twice under one gid and the level's "
                "counts/register sums would silently double"
            )
        seen.add(key)
    return sets


def kmv_rollup(
    sketch: DataFrame,
    group_cols: tuple[str, ...],
    sets: tuple[tuple[str, ...], ...] | None = None,
) -> DataFrame:
    """GROUPING-SETS distinct-count estimates from ONE register table —
    the sketch-cube pattern: build registers once at the FINEST grain
    (``kmv_build(..., group_cols=group_cols)``), then answer every
    coarser rollup level by register-wise min over the dropped
    dimensions, never re-scanning the data the sketch summarized.

    At 100 TB this is the entire point of a mergeable sketch: an exact
    ``COUNT(DISTINCT x) GROUP BY GROUPING SETS (...)`` re-shuffles the
    full corpus once PER LEVEL (Spark physically expands grouping sets
    before the exchange), while the cube here re-aggregates a
    ``|finest groups| · k``-row register table per level — KBs, not
    TBs — and the same register table keeps answering tomorrow after a
    ``kmv_merge`` with tomorrow's build.

    ``sets`` defaults to the ROLLUP chain (finest grain, then drop the
    trailing column one at a time, down to the grand total); pass
    explicit subsets of ``group_cols`` for CUBE or arbitrary grouping
    sets. Returns one row per group per level with the standard SQL
    ``GROUPING_ID`` convention: ``gid`` has bit ``1 << (len-1-pos)``
    set when ``group_cols[pos]`` is rolled away, and rolled-away
    columns are NULL (callers whose real group values can be NULL must
    disambiguate by ``gid``, exactly as in SQL). Output:
    ``(*group_cols, gid bigint, reg_sum bigint, est double)`` — the
    estimate columns are kmv_estimate's, so the mixed-family guard
    stays armed per level (``fam`` rides every grouping set and a
    family mix dies inside kmv_estimate's protected outputs).

    PLAN SHAPE — one pass, deliberately: all levels come from a SINGLE
    ``groupingSets`` aggregation over the register table (every set
    keeps ``i``/``fam``, so Expand multiplies the |groups|·k register
    stream by the level count — KBs), then one kmv_estimate grouped by
    (*group_cols, gid). The obvious per-level-loop alternative plans
    each level as its own branch, and column pruning specializes each
    branch's copy of the UPSTREAM sketch subtree (a level that drops
    g2 never reads g2), so exchange reuse fails and a lazily-built
    sketch re-runs its corpus scan once per level — measured 6.6 s →
    this shape's cost at the q242 bench scale.
    """
    sets = _rollup_sets("kmv_rollup", group_cols, sets)
    has_fam = "fam" in sketch.columns
    extra = ["i"] + (["fam"] if has_fam else [])
    gsets = [
        [*(c for c in group_cols if c in s), *extra] for s in sets
    ]
    # grouping_id covers (*group_cols, *extra); the extra cols are in
    # every set, so their (low) bits are always 0 — shift them off to
    # recover the group_cols-only convention
    levels = sketch.groupingSets(gsets, *group_cols, *extra).agg(
        F.min("m").alias("m"),
        F.shiftright(F.grouping_id(), len(extra))
        .cast("bigint")
        .alias("gid"),
    )
    est = kmv_estimate(
        levels.select(*group_cols, "gid", "m",
                      *(["fam"] if has_fam else [])),
        group_cols=(*group_cols, "gid"),
    )
    return est


def fixed_histogram_quantiles(
    df: DataFrame,
    group_cols: tuple[str, ...],
    cents_col: str,
    quantiles: tuple[tuple[int, int], ...] = ((1, 2), (9, 10), (99, 100)),
) -> DataFrame:
    """EXACT quantiles of a fixed-point (integer cents) column at any
    scale, via the histogram identity: a bounded-domain column's full
    distribution IS a ``groupBy(value).count()`` — one map-side-
    combined aggregation whose output is at most |domain| rows per
    group, after which any quantile is an integer cumulative-count
    lookup. This is the right 100 TB quantile design for money-like
    columns: no sort of the data, no sketch error, trivially mergeable
    (histograms add), and the per-group window runs over HISTOGRAM
    rows (≤ |domain|), never data rows — so a hot group costs the same
    as a cold one.

    ``quantiles`` are exact rationals (num, den); each result is the
    lower quantile — the smallest value whose cumulative count reaches
    ``ceil(q·n)`` — selected by integer cross-multiplication
    (``den·cum ≥ num·n``), the repo's float-free threshold rule.

    Returns ``(*group_cols, n bigint, q_<num>_<den> bigint …)`` with
    quantile columns in cents.

    Contrast: q107's exact ``percentile`` (full sort per group, the
    auditor) and ``percentile_approx`` (bounded error, unbounded
    domains). This operator is exact AND scan-shaped, but only exists
    because the domain is bounded — the docstring is the contract.
    """
    hist = df.groupBy(
        *group_cols, F.col(cents_col).cast("long").alias("_c")
    ).agg(F.count(F.lit(1)).alias("_cnt"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*group_cols)
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w)).withColumn(
        "_n", F.sum("_cnt").over(wn)
    )
    aggs = [F.max("_n").cast("bigint").alias("n")]
    for num, den in quantiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") * den >= F.col("_n") * num, F.col("_c")
                )
            ).cast("bigint").alias(f"q_{num}_{den}")
        )
    return cum.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# Relative-error quantile sketch over UNBOUNDED integer domains
# ---------------------------------------------------------------------------
#
# fixed_histogram_quantiles is exact but only exists because its
# domain is bounded (money-like cents). This family fills the
# unbounded seat the way DDSketch (Masson, Lee, Rim — VLDB 2019)
# does — buckets with CONSTANT RELATIVE width, so any quantile of any
# long-tailed distribution comes back within a guaranteed relative
# error from a bounded, mergeable table — but with the repo's
# replayability twist: where DDSketch buckets via floating-point
# logarithms (engine- and libm-dependent), these buckets come from the
# DECIMAL STRING of the magnitude — length + leading ``digits`` digits
# — pure integer/string ops both engines compute identically, so the
# whole sketch AND the quantile answers sit under the cross-engine
# hash gate with no float anywhere.
#
# Bucket law for a magnitude a > 0 rendered as L decimal digits:
#   p    = max(L - digits, 0)            (trailing digits dropped)
#   lead = first min(L, digits) digits   (= a div 10^p, exactly)
# so the bucket covers [lead·10^p, (lead+1)·10^p). For |v| < 10^digits
# the buckets are singletons (EXACT); above that lead has exactly
# ``digits`` digits, giving relative width 1/lead ≤ 10^(1-digits)
# (digits=3 ⇒ ≤ 1%). Zero and signs get their own buckets; a negative
# bucket's representative is its edge NEARER zero, so a reported
# quantile is one-sidedly biased TOWARD ZERO: for positives
# rep ≤ true < rep·(1 + 1/lead) (bias toward −∞ — what the long-tail
# test asserts), for negatives true ∈ (rep − 10^p, rep] (bias toward
# +∞). The direction was stated backwards here originally — review
# find; "never overestimates a positive quantile" is the guarantee.
#
# Scale shape mirrors the other sketches: build is ONE map-side-
# combined groupBy (≤ ~9·digits·19 + 1 buckets per group per sign —
# a few thousand rows at digits=3 — on the wire, never the data);
# sketches merge by bucket-count addition (rq_merge); quantiles read
# off the merged table with a window over BUCKET rows. The ``dig``
# column is the granularity version tag (the kmv ``fam`` lesson,
# applied from birth): quantile extraction refuses a group whose
# buckets mix ``digits`` generations, loudly.


def _rq_buckets(
    df: DataFrame,
    cents_col: str,
    group_cols: tuple[str, ...],
    digits: int,
    what: str,
    weight=None,
) -> DataFrame:
    """The ONE copy of the rq bucket law — sign / p / lead derivation
    + the grouped count-or-weighted aggregate (review find: rq_build
    and rq_build_weighted carried verbatim twins, and the
    apply()==rebuild linearity law depends on the derivations staying
    bit-identical). ``weight=None`` counts rows; a Column sums it."""
    if digits < 1:
        raise ValueError(f"{what}: digits must be >= 1, got {digits}")
    c = F.col(cents_col).cast("long")
    s = F.abs(c).cast("string")
    sign = (
        F.when(c > 0, F.lit(1)).when(c < 0, F.lit(-1)).otherwise(F.lit(0))
    ).cast("int")
    p = F.greatest(F.length(s) - F.lit(digits), F.lit(0)).cast("int")
    lead = F.substring(s, 1, digits).cast("long")
    agg = (
        F.count(F.lit(1)) if weight is None else F.sum(weight)
    ).cast("bigint").alias("cnt")
    return (
        df.filter(c.isNotNull())
        .groupBy(
            *group_cols,
            sign.alias("sign"),
            p.alias("p"),
            lead.alias("lead"),
        )
        .agg(agg)
        .withColumn("dig", F.lit(digits).cast("int"))
    )


def rq_build(
    df: DataFrame,
    cents_col: str,
    group_cols: tuple[str, ...] = (),
    digits: int = 3,
) -> DataFrame:
    """Bucket-count table ``(*group_cols, sign, p, lead, cnt, dig)``
    of an integer (cents-like) column. NULLs are excluded (as in
    fixed_histogram_quantiles); magnitudes must fit a positive int64
    (LONG_MIN itself, whose abs overflows, is out of envelope).
    ``digits`` ≥ 1 sets the accuracy/size trade: relative bucket
    width ≤ 10^(1-digits), bucket count per group ≤ a few thousand
    at digits=3."""
    return _rq_buckets(df, cents_col, group_cols, digits, "rq_build")


def rq_merge(*sketches: DataFrame) -> DataFrame:
    """Bucket-wise count addition — histograms add, so per-shard/day
    sketches compose exactly (the mergeability that makes the family
    a sketch and not a report). ``dig`` rides in the bucket key; a
    mixed-granularity union is detected at rq_quantiles (two dig
    generations rarely share bucket keys, so a per-bucket check here
    would pass vacuously — the guard belongs where groups are whole)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def rq_build_weighted(
    df: DataFrame,
    cents_col: str,
    weight_col: str,
    group_cols: tuple[str, ...] = (),
    digits: int = 3,
) -> DataFrame:
    """rq bucket counts over a WEIGHTED stream — cms_build_weighted's
    twin for the quantile sketch: each row contributes ``weight`` (any
    int64, negatives = retractions) to its bucket, so a CDC feed
    becomes a delta bucket table that :func:`rq_apply` folds into a
    maintained sketch by count addition. The quantile walk stays valid
    only while every bucket's folded count is ≥ 0 — guaranteed when
    you only retract previously-inserted rows, and enforced loudly at
    apply time. NULL weights are REJECTED at execution (same contract
    as cms_build_weighted: sum() silently skipping a malformed feed
    row would under-apply the delta). Shares the bucket law with
    rq_build through ``_rq_buckets`` — the linearity law depends on
    the two derivations being the same code."""
    return _rq_buckets(
        df, cents_col, group_cols, digits, "rq_build_weighted",
        weight=_null_weight_guard(weight_col, "rq_build_weighted"),
    )


def rq_apply(sketch: DataFrame, *deltas: DataFrame) -> DataFrame:
    """Fold delta bucket tables (:func:`rq_build_weighted` over a CDC
    stream) into a maintained rq sketch: bucket-wise count addition
    (rq_merge's law), exact-zero buckets dropped so the result is
    bit-identical to a fresh ``rq_build`` over the corrected corpus,
    and a NEGATIVE folded bucket raises at execution (over-retraction
    proof — a corrupted quantile walk would otherwise undercount
    silently; see _retraction_guard). Deletion feeds therefore cost a
    bucket-table fold, never a corpus re-scan — the same linearity
    the CM sketch gets from cms_apply, available here because
    histograms are linear too. (The KMV register sketch has NO such
    path: min is not invertible, a deletion can only be absorbed by
    rebuilding the register table — inherent to order-statistic
    sketches, not an implementation gap; kmv_build's one-pass cost is
    the budget for that rebuild.)"""
    folded = rq_merge(sketch, *deltas)
    keys = [c for c in folded.columns if c != "cnt"]
    guarded = folded.select(
        *keys,
        _retraction_guard(F.col("cnt"), "rq_apply").alias("cnt"),
    ).filter(F.col("cnt") != 0)
    # restore rq_build's column order (cnt before dig) so the
    # maintained table is bit-identical to a rebuild, columns included
    return guarded.select(*sketch.columns)


def rq_quantiles(
    sketch: DataFrame,
    group_cols: tuple[str, ...] = (),
    quantiles: tuple[tuple[int, int], ...] = ((1, 2), (9, 10), (99, 100)),
) -> DataFrame:
    """Lower quantiles from a bucket table: the smallest bucket
    representative whose cumulative count reaches ``ceil(q·n)``,
    selected by integer cross-multiplication (``den·cum ≥ num·n`` —
    the repo's float-free threshold rule). The representative is the
    bucket edge nearer zero, reconstructed EXACTLY as an int64 via
    string concatenation (``lead || '0'×p``) — no pow(), whose double
    rounding would corrupt magnitudes past 2^53.

    Returns ``(*group_cols, n bigint, q_<num>_<den> bigint …)``.
    Groups whose buckets mix ``dig`` generations raise at execution
    (mixed granularities silently skew the cumulative walk — the kmv
    mixed-family class)."""
    from pyspark.sql import Window

    mag = F.concat(
        F.col("lead").cast("string"),
        F.repeat(F.lit("0"), F.col("p")),
    ).cast("long")
    rep = (F.col("sign") * mag).cast("long")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("rep")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    cum = (
        sketch.select(*group_cols, rep.alias("rep"), "cnt", "dig")
        .withColumn("_cum", F.sum("cnt").over(w))
        .withColumn("_n", F.sum("cnt").over(wn))
        .withColumn("_ndig", F.size(F.collect_set("dig").over(wn)))
    )

    def guard(value):
        return F.when(F.col("_ndig") == 1, value).otherwise(
            F.raise_error(
                F.lit(
                    "rq_quantiles: a group's buckets mix digits "
                    "generations (dig) — sketches built with "
                    "different rq_build digits were merged; rebuild "
                    "at one granularity"
                )
            )
        )

    aggs = [F.max(guard(F.col("_n"))).cast("bigint").alias("n")]
    for num, den in quantiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") * den >= F.col("_n") * num,
                    guard(F.col("rep")),
                )
            )
            .cast("bigint")
            .alias(f"q_{num}_{den}")
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def rq_rollup(
    sketch: DataFrame,
    group_cols: tuple[str, ...],
    sets: tuple[tuple[str, ...], ...] | None = None,
    quantiles: tuple[tuple[int, int], ...] = ((1, 2), (9, 10), (99, 100)),
) -> DataFrame:
    """GROUPING-SETS quantiles from ONE bucket table — kmv_rollup's
    twin for the rq sketch: build buckets once at the finest grain
    (``rq_build(..., group_cols=group_cols)``), then answer every
    coarser level by bucket-wise count ADDITION over the dropped
    dimensions (rq_merge's law — histograms add), never re-scanning or
    re-sorting the data. An exact grouped-quantile cube needs a full
    sort (or one windowed pass) of the corpus PER LEVEL; this
    re-aggregates a few-thousand-row bucket table per level.

    Same conventions as kmv_rollup: ``sets`` defaults to the ROLLUP
    chain; ``gid`` is the SQL GROUPING_ID bit pattern; rolled-away
    columns are NULL. Output ``(*group_cols, gid bigint, n bigint,
    q_<num>_<den> bigint …)`` — whole rows int64, and every level runs
    through rq_quantiles so the mixed-``dig``-generation guard stays
    armed per level (``dig`` rides every grouping set as a bucket
    key). Same one-pass ``groupingSets`` plan shape as kmv_rollup
    (see its docstring for why the per-level-loop alternative
    re-scans the corpus once per level)."""
    sets = _rollup_sets("rq_rollup", group_cols, sets)
    extra = ["sign", "p", "lead", "dig"]
    gsets = [
        [*(c for c in group_cols if c in s), *extra] for s in sets
    ]
    levels = sketch.groupingSets(gsets, *group_cols, *extra).agg(
        F.sum("cnt").cast("bigint").alias("cnt"),
        F.shiftright(F.grouping_id(), len(extra))
        .cast("bigint")
        .alias("gid"),
    )
    return rq_quantiles(
        levels.select(*group_cols, "gid", *extra, "cnt"),
        (*group_cols, "gid"),
        quantiles,
    )


def rq_range_estimate(
    sketch: DataFrame,
    predicates: "tuple[tuple[int, int], ...]",
) -> DataFrame:
    """Range-predicate SELECTIVITY from the rq bucket table — the
    System R optimizer statistic the planner family reads before
    choosing anything (q243's partition plan, q267's order, q277's
    strategy all start from "how many rows survive this filter"):
    for each ``[lo, hi]`` estimate the surviving row count as

        Σ_buckets  (cnt · overlap(bucket, [lo, hi])) div width(bucket)

    — full interior buckets contribute their exact count, the two
    boundary buckets interpolate uniformly. Every term is int64: the
    bucket bounds come from the decimal bucket law (sign/p/lead —
    ``lead·10^p`` built by string concatenation, exact at any p),
    ``div`` truncates identically in Spark and DuckDB for the
    non-negative operands here, so the ESTIMATE itself is replayable
    bit-for-bit — an estimator under the hash gate, like the KMV/CMS
    planner numbers. Relative bucket width ≤ 10^(1−digits) bounds the
    interpolation error to the boundary buckets' contents; a
    predicate aligned on bucket edges is answered EXACTLY (pinned in
    tests). Envelope: ``cnt · overlap`` must stay < 2^63 (cnt ≤ corpus
    rows, overlap ≤ bucket width ≤ 10^p — states with p ≥ 12 and
    trillion-row buckets are out; the digits knob shrinks p).

    Scale: the sketch is the ≤ few-thousand-row maintained bucket
    table (rq_build / rq_apply — histograms add, CDC folds), so at
    100 TB this decision costs a |preds| × |buckets| KB lattice and
    ZERO corpus reads. Returns ``(pred_id int, lo bigint, hi bigint,
    n_buckets int, est_rows bigint)``."""
    spark = sketch.sparkSession
    preds = spark.createDataFrame(
        [(i, int(lo), int(hi)) for i, (lo, hi) in enumerate(predicates)],
        "pred_id int, lo bigint, hi bigint",
    )
    tenp = F.concat(
        F.lit("1"), F.repeat(F.lit("0"), F.col("p"))
    ).cast("bigint")
    lead0 = F.concat(
        F.col("lead").cast("string"), F.repeat(F.lit("0"), F.col("p"))
    ).cast("bigint")
    blo = (
        F.when(F.col("sign") == 1, lead0)
        .when(F.col("sign") == 0, F.lit(0))
        .otherwise(-(lead0 + tenp - F.lit(1)))
    )
    bhi = (
        F.when(F.col("sign") == 1, lead0 + tenp - F.lit(1))
        .when(F.col("sign") == 0, F.lit(0))
        .otherwise(-lead0)
    )
    buckets = sketch.select(
        blo.alias("blo"), bhi.alias("bhi"), F.col("cnt")
    )
    lattice = preds.crossJoin(F.broadcast(buckets))
    ov = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("hi"), F.col("bhi"))
        - F.greatest(F.col("lo"), F.col("blo"))
        + F.lit(1),
    )
    width = F.col("bhi") - F.col("blo") + F.lit(1)
    contrib = F.expr(
        "CAST((cnt * _ov) DIV _width AS BIGINT)"
    )
    return (
        lattice.withColumn("_ov", ov)
        .withColumn("_width", width)
        .groupBy("pred_id", "lo", "hi")
        .agg(
            F.sum((F.col("_ov") > 0).cast("int"))
            .cast("int")
            .alias("n_buckets"),
            F.sum(contrib).cast("bigint").alias("est_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Replayable Bloom filter (membership sketch)
# ---------------------------------------------------------------------------
#
# The third mergeable-summary seat: CMS answers "how often", KMV
# answers "how many distinct", a Bloom filter (Bloom 1970) answers
# "have I seen THIS one" with no false negatives and a tunable
# false-positive rate — the decontamination / blocklist / semi-join
# pre-filter primitive. At 100 TB the filter table (≤ ceil(m/63)
# int64 words per group) broadcasts into any probe stream, so a
# membership pre-screen costs a broadcast hash join against a
# KB-sized table instead of a shuffle against the blocklist corpus;
# Spark's own runtime bloom pushdown does this transparently for
# joins, but a PERSISTED, mergeable, cross-engine-replayable filter
# is what a pipeline ships between jobs/days/engines.
#
# Replayability: positions come from the poly-hash affine family
# (one base fold → cubic premix → k affine draws mod m — exact int64
# both engines); words pack 63 bits (NOT 64: DuckDB's `1 << 63`
# raises Out of Range, and the sign bit buys nothing but an
# engine-semantics edge); the build is ONE map-side-combined
# ``bit_or`` aggregation, and two filters over the same geometry
# merge by word-wise ``bit_or`` (set union, exactly).
#
# Geometry/version discipline (the kmv fam lesson, applied from
# birth): every filter table carries a constant ``geom`` column
# ``bloom1-<hash_mode>-m<m_bits>-k<k>``; merges refuse mixed
# geometries and probes refuse a filter whose geom differs from the
# probe-side parameters — the cms_estimate class of silent mismatch
# (never-incremented buckets read as 0), made LOUD mechanically.

#: usable bits per filter word (bit 63 excluded — see module note)
BLOOM_WORD_BITS = 63


def _bloom_geom(hash_mode: str, m_bits: int, k: int) -> str:
    return f"bloom1-{hash_mode}-m{m_bits}-k{k}"


def _bloom_words(
    df: DataFrame,
    item_col: str,
    m_bits: int,
    k: int,
    hash_mode: str,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The ONE word/mask derivation build and probe share (a fix
    applied to one site and not the other would manifest as false
    negatives — review find): explode the k positions, then
    ``word = pos div 63`` (integer division, mirroring the oracle's
    ``pos // 63`` — no float detour on the gate path; review find)
    and ``_mask = 1 << (pos mod 63)``."""
    pos = _bloom_positions(item_col, m_bits, k, hash_mode)
    return df.select(
        *extra_cols, item_col, F.explode(pos).alias("_pos")
    ).select(
        *extra_cols,
        item_col,
        F.expr(
            f"CAST(_pos div {BLOOM_WORD_BITS} AS INT)"
        ).alias("word"),
        # pyspark's shiftleft() insists on a literal shift amount —
        # the SQL form takes a column
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(_pos % {BLOOM_WORD_BITS} AS INT))"
        ).alias("_mask"),
    )


def _bloom_positions(item_col: str, m_bits: int, k: int,
                     hash_mode: str):
    """k bit positions in [0, m_bits) as an array Column — the shared
    derivation of build and probe."""
    from gpi_etl_spark.functions.hof import let_

    if hash_mode == "poly":
        base = xhash.poly_hash(F.col(item_col))
    elif hash_mode == "xxhash64":
        base = F.pmod(F.xxhash64(F.col(item_col)), F.lit(KMV_P))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return let_(
        base,
        lambda h: let_(
            xhash.cubic_mix(h),
            lambda g: F.array(
                *[
                    xhash.affine_hash(g, i, k) % F.lit(m_bits)
                    for i in range(k)
                ]
            ),
        ),
    )


def bloom_build(
    items: DataFrame,
    item_col: str,
    m_bits: int = 8192,
    k: int = 4,
    group_cols: tuple[str, ...] = (),
    hash_mode: str = "poly",
) -> DataFrame:
    """Build per-group Bloom filter words
    ``(*group_cols, word int, bits bigint, geom)``. Absent words read
    as 0 at probe time, so the table stays sparse while the filter is
    cold. Duplicates are free (bit_or is idempotent). Expected FPR
    for n distinct items: ``(1 − e^(−k·n/m))^k`` — size m ≈ 10·n bits
    for ~1%% at k=4. One map-side-combined aggregation: the wire
    carries ≤ ceil(m/63) words per group per partition, never the
    items."""
    exploded = _bloom_words(
        items, item_col, m_bits, k, hash_mode, extra_cols=group_cols
    )
    return (
        exploded.groupBy(*group_cols, "word")
        .agg(F.bit_or("_mask").alias("bits"))
        .withColumn(
            "geom", F.lit(_bloom_geom(hash_mode, m_bits, k))
        )
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Word-wise bit_or = set union of the underlying sets (no
    false-negative creep, FPR of the union's cardinality). Mixed
    geometries fail loudly at execution when their word rows collide
    — word indexes from different (m, k, hash) spaces must never OR
    together. Two sparse filters whose word sets happen to be
    DISJOINT pass this per-word check vacuously (the rq_merge
    pitfall); the whole-table geometry assertion in bloom_contains is
    the backstop that catches such a mix the first time the merged
    filter is probed (review find)."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    keys = [c for c in out.columns if c not in ("bits", "geom")]
    merged = out.groupBy(*keys).agg(
        F.bit_or("bits").alias("bits"),
        F.count_distinct("geom").alias("_ng"),
        F.max("geom").alias("geom"),
    )
    guarded = F.when(F.col("_ng") == 1, F.col("bits")).otherwise(
        F.raise_error(
            F.lit(
                "bloom_merge: filters with DIFFERENT geometries "
                "(m_bits/k/hash_mode) were mixed — their bit spaces "
                "are incompatible. Rebuild to one geometry."
            )
        )
    )
    return merged.select(*keys, guarded.alias("bits"), "geom")


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    item_col: str,
    m_bits: int = 8192,
    k: int = 4,
    hash_mode: str = "poly",
) -> DataFrame:
    """Membership probe: returns ONE ROW PER DISTINCT ``item_col``
    value with ``maybe_present`` (boolean) — ``false`` is CERTAIN
    absence, ``true`` is presence up to the FPR. (Not an append to
    the probe rows: other probe columns and row multiplicity are
    dropped — join the result back by item if you need them; review
    find on the original docstring's claim.) The filter must be
    ungrouped (one filter table). Its ``geom`` is asserted as a
    WHOLE-FILTER scalar (one-row aggregate broadcast onto every
    probe row): single distinct value AND equal to the probe
    parameters — a per-word row-wise check would silently pass for
    probe words absent from the sparse filter table (NULL geom) and
    for mixed-geometry filters whose word sets don't collide, both
    exactly the silent-false-negative class the guard exists to kill
    (review find). This probe-time whole-filter check is also the
    backstop bloom_merge's per-word guard defers to. The filter
    broadcasts (≤ ceil(m/63) words); the probe side shuffles nothing
    but its own k-position explode + per-item AND-reduction."""
    expected = _bloom_geom(hash_mode, m_bits, k)
    pp = _bloom_words(probes, item_col, m_bits, k, hash_mode)
    gscalar = bloom.agg(
        F.count_distinct("geom").alias("_ng"),
        F.max("geom").alias("_geom"),
    )
    j = pp.join(
        F.broadcast(bloom.select("word", "bits")), ["word"], "left"
    ).crossJoin(F.broadcast(gscalar))
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_mask"))
        == F.col("_mask")
    ).cast("int")
    hit_guarded = F.when(
        (F.col("_ng") == 1) & (F.col("_geom") == F.lit(expected)), hit
    ).otherwise(
        F.raise_error(
            F.lit(
                "bloom_contains: filter geometry does not match the "
                f"probe parameters ({expected}), or the filter table "
                "mixes geometries — a mismatched m_bits/k/hash_mode "
                "reads never-set bits as absent and returns false "
                "negatives. Probe with the build's parameters; "
                "rebuild mixed tables to one geometry."
            )
        )
    )
    return (
        j.groupBy(item_col)
        .agg(F.min(hit_guarded).alias("_all_hit"))
        .select(
            item_col, (F.col("_all_hit") == 1).alias("maybe_present")
        )
    )


def rq_band_join_size(
    a: DataFrame,
    b: DataFrame,
    band: int,
) -> DataFrame:
    """Band-join SIZE BOUNDS from two rq bucket tables — the planner
    primitive for as-of / interval / tolerance joins: how many
    ``(x, y)`` pairs with ``|x - y| <= band`` would the join produce,
    bounded from BOTH sides without touching either input again.

    Each rq bucket covers an exact integer interval (sign/p/lead →
    ``[lo, hi]`` with width ``10^p - 1``; singletons below 10^digits).
    A bucket pair whose FARTHEST endpoints are within ``band``
    contributes ``cnt_a·cnt_b`` pairs certainly (→ ``lower``); a pair
    whose CLOSEST endpoints are within ``band`` contributes possibly
    (→ ``upper``); the exact join size provably satisfies
    ``lower <= exact <= upper``, with the gap set by the bucket
    widths at the band's boundary (tighten with more ``digits``).
    Whole computation is exact int64 — interval ends reconstruct via
    string concatenation like rq_quantiles' representatives, and
    ``10^p`` is built the same way (no pow(), no doubles anywhere) —
    WITHIN the same envelope cms_join_size documents: the bound sums
    are Σ cnt_a·cnt_b terms capped by ``n_a·n_b``, so keep
    ``n_a·n_b < 2^63`` (~3·10⁹ rows per side). Past that the
    aggregation overflows (ANSI: job error; non-ANSI: silent wrap) —
    pre-aggregate or sample a side first.

    The bucket-pair product is a crossJoin of two GEOMETRY-BOUNDED
    tables (≤ a few thousand rows each at digits=3, regardless of
    corpus size — the q198 lattice class, not a corpus cross join).
    At 100 TB this prices a tolerance join — broadcast vs shuffle vs
    don't-run-it — from two KB-sized bucket tables that the pipeline
    already maintains for quantiles (and that fold under CDC via
    rq_apply). Returns one row: ``(n_a, n_b, lower, upper)``.
    """
    if band < 0:
        raise ValueError(f"rq_band_join_size: band must be >= 0, got {band}")

    def ends(sk: DataFrame, tag: str) -> DataFrame:
        width = (
            F.concat(F.lit("1"), F.repeat(F.lit("0"), F.col("p")))
            .cast("long") - F.lit(1)
        )
        mag = F.concat(
            F.col("lead").cast("string"),
            F.repeat(F.lit("0"), F.col("p")),
        ).cast("long")
        rep = (F.col("sign") * mag).cast("long")
        lo = F.when(F.col("sign") < 0, rep - width).otherwise(rep)
        hi = F.when(F.col("sign") > 0, rep + width).otherwise(rep)
        return sk.select(
            lo.alias(f"lo_{tag}"),
            hi.alias(f"hi_{tag}"),
            F.col("cnt").alias(f"cnt_{tag}"),
        )

    ea, eb = ends(a, "a"), ends(b, "b")
    pairs = ea.crossJoin(eb)
    far = F.greatest(
        F.col("hi_a") - F.col("lo_b"), F.col("hi_b") - F.col("lo_a")
    )
    gap = F.greatest(
        F.col("lo_b") - F.col("hi_a"),
        F.col("lo_a") - F.col("hi_b"),
        F.lit(0).cast("long"),
    )
    prod = F.col("cnt_a") * F.col("cnt_b")
    agg = pairs.agg(
        F.coalesce(
            F.sum(F.when(far <= F.lit(band), prod)), F.lit(0)
        ).cast("bigint").alias("lower"),
        F.coalesce(
            F.sum(F.when(gap <= F.lit(band), prod)), F.lit(0)
        ).cast("bigint").alias("upper"),
    )
    na = a.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_a"))
    nb = b.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_b"))
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(agg))
        .select("n_a", "n_b", "lower", "upper")
    )


# ---------------------------------------------------------------------------
# AMS tug-of-war sketch (second frequency moment / self-join size)
# ---------------------------------------------------------------------------
#
# F₂ = Σ_v f(v)² — the second frequency moment — is the SELF-JOIN size
# of a key column and the planner's skew number: F₂/n is the expected
# rows-per-probe of an equi-join against that key, and F₂ ≫ n_distinct
# means a hot-key shuffle. Computing it exactly needs a full groupBy;
# the AMS "tug-of-war" sketch (Alon, Matias & Szegedy '96) estimates
# it from k signed counters: for k independent ±1 sign hashes s_i,
# keep X_i = Σ_rows s_i(item). Then E[X_i²] = F₂ exactly (cross terms
# cancel in expectation), so mean(X_i²) estimates F₂ with relative sd
# ≈ sqrt(2/k). Each X_i is a plain SUM — the sketch is LINEAR: per-day
# sketches merge by component-wise addition, and a CDC retraction
# stream folds in as negative contributions, same as the CM counters.
#
# Replayability: signs derive from the repo's standard derivation
# chain (poly base → cubic premix → affine family → parity), so in
# ``poly`` mode both engines compute identical integers and the whole
# sketch sits under the DuckDB hash gate.

#: AMS derivation-family prefixes (the cms_geo/kmv-fam lesson applied
#: from day one: state that can outlive a process carries its
#: versioned derivation, and mixing raises). The FULL stamp is
#: :func:`ams_fam` — it includes k, because two same-family sketches
#: built with different k share low component indexes and would
#: otherwise ADD cleanly into an inconsistent component set
#: (review find: measured a silently biased F2 from a k=8 + k=16
#: merge before the stamp carried k — exactly the cms width/depth
#: hole the geo stamp closes).
AMS_FAMILIES = {
    "poly": "ams1-poly",
    "xxhash64": "ams1-xx64",
}


def ams_fam(hash_mode: str, k: int) -> str:
    """The geometry stamp an AMS component table carries: derivation
    family AND k."""
    return f"{AMS_FAMILIES[hash_mode]}-k{k}"


def _ams_fam_guard(value, nf_col, op: str):
    """Lazy mixed-family guard, in-expression (unprunable). An EMPTY
    aggregate (nf = 0 — e.g. a global ams_f2 over a filtered-to-empty
    corpus) is NOT a mix: it passes the guard and the caller's
    NULL/zero semantics apply (review find: the empty case used to
    die claiming a family mix that never happened)."""
    return F.when(nf_col <= 1, value).otherwise(
        F.raise_error(
            F.lit(
                f"ams_{op}: sketch components from DIFFERENT "
                "derivation families were mixed — their sign hashes "
                "are incompatible and component-wise addition is "
                "meaningless. Rebuild to one family and retry."
            )
        )
    )


def ams_build(
    items: DataFrame,
    item_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Build per-group AMS components ``(*group_cols, i int, x bigint,
    fam string)`` — ``x_i`` is the signed row count under the i-th
    ±1 hash. ONE scan: each row explodes into its k (i, ±1)
    contributions and the sum map-side combines, so the wire carries
    ≤ k rows per group per partition however large the stream
    (the kmv_build expansion shape — repartition slim single-file
    inputs first, the ×k explode inherits input parallelism 1:1).

    Sign derivation: parity of the standard chain
    ``affine_hash(cubic_mix(base), i, k)`` — the affine output is
    near-uniform on [0, P), so its low bit is a fair ±1 coin, and the
    cubic premix de-structures short-key (digit id) hash clusters the
    same way it does for the KMV minima. Duplicates are NOT free here
    (unlike kmv's min): every row contributes, which is the point —
    f(v) enters X_i with multiplicity.

    Envelope: |x_i| ≤ n_rows(group) — exact in int64 through any
    realistic group (< 9·10¹⁸ rows). The F₂ ESTIMATE accumulates
    Σx_i² in decimal(38,0) (see :func:`ams_f2`), so nothing overflows
    through n ≤ 10⁹ per group either."""
    return _ams_components(items, item_col, group_cols, k, hash_mode)


def _ams_components(
    items: DataFrame,
    item_col: str,
    group_cols: tuple[str, ...],
    k: int,
    hash_mode: str,
    weight: "str | None" = None,
) -> DataFrame:
    """The ONE copy of the AMS sign/aggregate pipeline (the
    ``_cms_counters`` lesson: ams_build and ams_build_weighted must
    share the derivation bit-for-bit or the linearity law
    Σ_rows sign = Σ_values f·sign silently drifts). ``weight=None``
    counts each row once; a column name sums weight × sign.

    SHAPE (round-13, the kmv_build rework's twin, guide §2.3/§2.4):
    the k signed sums aggregate as k SUM columns in ONE groupBy read
    straight off the materialized signs array, and the ≤|groups|
    result unpivots to the (i, x) layout afterwards — the previous
    form posexploded k sign rows per input row BEFORE the partial
    aggregate, materializing |rows|·k rows through the Generate node
    and hashing each into the (group, i) combine map. Components are
    bit-identical (exact integer addition reassociated; a NULL item
    yields k NULL contributions → NULL-skipping sums in both shapes;
    the count guard keeps an empty ungrouped input producing an empty
    table, matching the explode form's no-rows behaviour) — pinned by
    the shape law test next to kmv's."""
    if hash_mode == "poly":
        base = xhash.poly_hash(F.col(item_col))
    elif hash_mode == "xxhash64":
        base = F.pmod(F.xxhash64(F.col(item_col)), F.lit(KMV_P))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    from gpi_etl_spark.functions.hof import let_

    signs_arr = let_(
        base,
        lambda h: let_(
            xhash.cubic_mix(h),
            lambda g: F.array(
                *[
                    F.lit(1)
                    - F.lit(2) * (xhash.affine_hash(g, i, k) % F.lit(2))
                    for i in range(k)
                ]
            ),
        ),
    )
    # internal names double-underscored to stay out of any caller's
    # group_cols namespace (the kmv_build convention)
    if weight is None:
        wide = items.select(*group_cols, signs_arr.alias("__ams_s"))

        def contrib(i: int):
            return F.element_at("__ams_s", i + 1).cast("bigint")

    else:
        wide = items.select(
            *group_cols,
            _null_weight_guard(weight, "ams_build_weighted").alias(
                "__ams_w"
            ),
            signs_arr.alias("__ams_s"),
        )

        def contrib(i: int):
            return F.element_at("__ams_s", i + 1).cast("bigint") * F.col(
                "__ams_w"
            )

    ga = wide.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__ams_n"),
        *[F.sum(contrib(i)).alias(f"__ams_x{i}") for i in range(k)],
    )
    return (
        ga.filter(F.col("__ams_n") > 0)
        .select(
            *group_cols,
            F.posexplode(
                F.array(*[F.col(f"__ams_x{i}") for i in range(k)])
            ).alias("i", "x"),
        )
        .select(
            *group_cols,
            F.col("i").cast("int").alias("i"),
            F.col("x"),
            F.lit(ams_fam(hash_mode, k)).alias("fam"),
        )
    )


def ams_build_weighted(
    items: DataFrame,
    item_col: str,
    weight_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """AMS components over a WEIGHTED item stream — each row
    contributes ``weight × sign_i(item)`` to x_i instead of one sign.
    Because the sketch is linear in the frequency vector, building
    from a per-value frequency table is BIT-IDENTICAL to building
    from the repeated rows (Σ_rows sign = Σ_values f·sign, exact
    int64 — pinned in tests/test_sketches.py), which is the q221/q282
    distinct-pre-pass optimization: pay the poly fold and the ×k sign
    explode per DISTINCT value, not per row, whenever the stream
    repeats. Negative weights fold CDC retractions exactly as
    ams_merge's addition does; NULL weights are REJECTED at execution
    (the cms_build_weighted contract, same guard).

    Envelope: |x_i| ≤ Σ|w| per group — int64-exact while Σ|w| stays
    below 2⁶³ (any realistic frequency table; the F₂ estimate's
    Σx_i² accumulates in decimal(38,0) as for ams_build).

    RESERVED NAMES (advice find): the shared sign pipeline aliases
    ``_w`` (the guarded weight) and the posexplode outputs
    ``i``/``_s`` internally — ``group_cols`` containing one of these
    would be shadowed or ambiguous; rename such columns before
    building (ams_build shares the same reservation)."""
    return _ams_components(
        items, item_col, group_cols, k, hash_mode, weight=weight_col
    )


def ams_merge(*sketches: DataFrame) -> DataFrame:
    """Component-wise SUM of same-family sketches (the sketch is a
    linear projection of the frequency vector — merge = add; a CDC
    delta built over retraction rows with sign-flipped contributions
    folds in the same way). Mixed families raise via the ``fam``
    stamp; a tagged/untagged mix dies in unionByName's schema
    check."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("x", "fam")]
    merged = out.groupBy(*keys).agg(
        F.sum("x").alias("x"),
        F.count_distinct("fam").alias("_nf"),
        F.max("fam").alias("fam"),
    )
    return merged.select(
        *keys,
        _ams_fam_guard(F.col("x"), F.col("_nf"), "merge").alias("x"),
        "fam",
    )


def ams_f2(
    sketch: DataFrame,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """F₂ estimate per group from an AMS component table. Returns
    ``(*group_cols, k int, f2_num decimal(38,0), f2_r double)`` where
    ``f2_num = Σ_i x_i²`` (exact integer — x_i² ≤ 10¹⁸ at n = 10⁹
    rows and the k-sum accumulates in decimal(38,0), far inside
    precision) and ``f2_r = f2_num / k`` floor-scaled at 6 dp (two
    exact-int double casts + one IEEE divide, both engines identical).
    k derives from the table (component count per group — the
    kmv_estimate lesson: a caller-supplied k that disagreed with the
    build silently mis-scales). GATE NOTE: f2_num is decimal-typed —
    gated queries must re-emit it as BIGINT (+ mod-P residue past the
    int64 envelope), the q233 decimal gate-column convention
    (tests/test_no_decimal_gate.py)."""
    # widths: |x| ≤ n ≤ 10⁹ → decimal(10,0) (the ANSI cast IS the
    # envelope assert); x² → decimal(21,0); Spark's sum adds 10
    # digits → decimal(31,0); final cast to the documented (38,0)
    aggs = [
        F.sum(
            F.col("x").cast("decimal(10,0)")
            * F.col("x").cast("decimal(10,0)")
        ).cast("decimal(38,0)").alias("f2_num"),
        F.count(F.lit(1)).cast("int").alias("k"),
        F.count_distinct("fam").alias("_nf"),
    ]
    agg = sketch.groupBy(*group_cols).agg(*aggs)
    f2_num = _ams_fam_guard(F.col("f2_num"), F.col("_nf"), "f2")
    from gpi_etl_spark.functions.rounding import fs6

    # k = 0 (empty ungrouped sketch) -> NULL estimate, not an ANSI
    # 0/0 failure; f2_num is already NULL (sum over nothing)
    est = F.when(
        F.col("k") > 0,
        fs6(
            F.col("f2_num").cast("double") / F.col("k").cast("double")
        ),
    )
    return agg.select(
        *group_cols,
        "k",
        f2_num.alias("f2_num"),
        _ams_fam_guard(est, F.col("_nf"), "f2").alias("f2_r"),
    )


# ---------------------------------------------------------------------------
# Invertible Bloom lookup table (set reconciliation from KB state)
# ---------------------------------------------------------------------------
#
# q259's snapshot_diff reconciles two replicas EXACTLY with one
# full-outer join — the right tool when both tables sit in one
# cluster. When they don't (two sites, a replica and its DR copy, two
# vendors' extracts), shipping 100 TB to diff it is the wrong plan:
# the IBLT (Goodrich & Mitzenmacher '11; Eppstein et al. '11 "What's
# the Difference?" — public method) reconciles from CONSTANT-size
# state. Each side summarizes its key set into m cells; cells
# subtract cell-wise (linearity); the difference decodes the exact
# symmetric difference by peeling, whp while |diff| ≲ m/1.3 at k = 3.
# Ship KB, recover the keys themselves — not an estimate of how many
# (kmv_overlap's seat), the actual keys.
#
# Replayable arithmetic: cell indexes are the affine family over the
# cubic-premixed poly hash (one derivation, i = 0..2 of a size-4
# family; i = 3 is the check hash), and every cell field is an exact
# signed int64 sum reduced mod P — both engines compute identical
# integers, so the CELL TABLE itself can sit under the hash gate, and
# the decoded difference is gated against the direct anti-join truth.

#: IBLT cell-index/check derivations share one affine family of this
#: size (i = 0..2 index the k = 3 cells, i = 3 is the check hash).
#: A size change is a wire-format change — bump deliberately.
IBLT_FAMILY = 4
IBLT_K = 3


def iblt_cells(
    df: DataFrame,
    key_col: str,
    sign_col,
    m: int,
    hash_mode: str = "poly",
) -> DataFrame:
    """Build the (subtracted) IBLT cell table over a SIGNED key
    stream: rows from replica A carry sign +1, rows from replica B
    sign −1, and because every cell field is a linear sum the result
    IS iblt(A) − iblt(B) built in one pass over the union (ship the
    per-side cell tables and subtract cell-wise for the two-site
    deployment — same algebra). Keys must be non-negative int64
    BELOW P (≈1e9; asserted lazily) so a pure cell's key is recovered
    exactly from its mod-P sum; duplicate keys within one side are
    the caller's contract to avoid (a doubled insert is
    indistinguishable from two distinct inserts — dedupe first, the
    operator does NOT pay a distinct for you).

    Returns ``(cell int, cnt bigint, key_sum bigint, chk_sum
    bigint)`` — exactly ``m`` rows (empty cells included: an
    all-zeros row is load-bearing for the decode-complete check).
    One map-side-combined groupBy; ≤ k·m rows per partition on the
    wire; NULL keys raise (a replica row without a key is corrupt
    input, not an empty set)."""
    sign = (
        F.col(sign_col) if isinstance(sign_col, str) else sign_col
    ).cast("bigint")
    key = F.col(key_col).cast("bigint")
    guarded = F.when(
        key.isNotNull() & (key >= 0) & (key < xhash.P), key
    ).otherwise(
        F.raise_error(
            F.lit(
                "iblt_cells: keys must be non-negative int64 below "
                f"P={xhash.P} (NULL/negative/too-wide key seen) — "
                "hash wider keys down to [0, P) first."
            )
        )
    )
    if hash_mode != "poly":
        # Decode is poly-only: iblt_decode's driver-side twins
        # (_iblt_check/_iblt_cells_of) derive the cell/check hashes
        # from the poly chain, so cells built under any other mode
        # could never peel (every decode would return ok=False). Fail
        # at build time instead of letting a dead parameter produce a
        # sketch that silently cannot reconcile (ADVICE r11).
        raise ValueError(
            "iblt_cells: hash_mode must be 'poly' — the peeling "
            "decode's driver-side hash twins are poly-only, so cells "
            f"built with {hash_mode!r} can never decode."
        )
    base = xhash.poly_hash(guarded.cast("string"))
    gh = xhash.cubic_mix(base)
    chk = xhash.affine_hash(gh, IBLT_K, IBLT_FAMILY)
    entries = F.array(*[
        F.struct(
            (xhash.affine_hash(gh, i, IBLT_FAMILY) % m)
            .cast("int")
            .alias("cell"),
        )
        for i in range(IBLT_K)
    ])
    contrib = (
        df.select(
            sign.alias("_s"),
            guarded.alias("_k"),
            chk.alias("_c"),
            F.explode(entries).alias("_e"),
        )
        .select(
            F.col("_e.cell").alias("cell"), "_s", "_k", "_c"
        )
        .groupBy("cell")
        .agg(
            F.sum("_s").cast("bigint").alias("cnt"),
            F.pmod(F.sum(F.col("_s") * F.col("_k")), F.lit(xhash.P))
            .cast("bigint")
            .alias("key_sum"),
            F.pmod(F.sum(F.col("_s") * F.col("_c")), F.lit(xhash.P))
            .cast("bigint")
            .alias("chk_sum"),
        )
    )
    spark = df.sparkSession
    spine = spark.range(m).select(F.col("id").cast("int").alias("cell"))
    return (
        spine.join(contrib, "cell", "left")
        .select(
            "cell",
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
            F.coalesce("key_sum", F.lit(0))
            .cast("bigint")
            .alias("key_sum"),
            F.coalesce("chk_sum", F.lit(0))
            .cast("bigint")
            .alias("chk_sum"),
        )
    )


def _iblt_check(key: int) -> int:
    """Driver-side twin of the check-hash derivation (exact integer
    arithmetic — matches the Column path bit-for-bit)."""
    P = xhash.P
    h = 7
    for ch in str(key):
        h = (h * 131 + ord(ch)) % P
    g = (h * ((h * h) % P) + 13 * h + 7) % P
    a, b = xhash._affine_coeffs(IBLT_FAMILY)
    return (a[IBLT_K] * g + b[IBLT_K]) % P


def _iblt_cells_of(key: int, m: int) -> "list[int]":
    P = xhash.P
    h = 7
    for ch in str(key):
        h = (h * 131 + ord(ch)) % P
    g = (h * ((h * h) % P) + 13 * h + 7) % P
    a, b = xhash._affine_coeffs(IBLT_FAMILY)
    return [((a[i] * g + b[i]) % P) % m for i in range(IBLT_K)]


def iblt_decode(
    cells_rows: "list",
    m: int,
) -> "tuple[list[tuple[int, int]], bool]":
    """Peel a subtracted IBLT (collected ``iblt_cells`` rows — KB of
    bounded sketch state; the decode is INHERENTLY a small-state
    sequential algorithm, which is the whole point: the 100 TB tables
    never move). Returns ``(decoded, ok)`` where ``decoded`` is
    [(key, side)] with side +1 = A-only, −1 = B-only, and ``ok`` is
    True iff every cell drained to zeros (decode complete — whp while
    |diff| ≲ m/1.3 at k = 3; a False return means m was sized too
    small for the actual difference: rebuild bigger, the linearity
    makes that one more pass)."""
    P = xhash.P
    cnt = [0] * m
    ksum = [0] * m
    csum = [0] * m
    for r in cells_rows:
        cnt[r["cell"]] = int(r["cnt"])
        ksum[r["cell"]] = int(r["key_sum"]) % P
        csum[r["cell"]] = int(r["chk_sum"]) % P
    decoded: "list[tuple[int, int]]" = []
    queue = list(range(m))
    while queue:
        nxt: "list[int]" = []
        progressed = False
        for c in queue:
            s = cnt[c]
            if s not in (1, -1):
                continue
            key = (ksum[c] * s) % P
            if (csum[c] * s) % P != _iblt_check(key):
                continue  # not pure (colliding residues) — keep
            decoded.append((key, s))
            chk = _iblt_check(key)
            for cc in _iblt_cells_of(key, m):
                cnt[cc] -= s
                ksum[cc] = (ksum[cc] - s * key) % P
                csum[cc] = (csum[cc] - s * chk) % P
                nxt.append(cc)
            progressed = True
        if not progressed:
            break
        queue = [c for c in set(nxt) if cnt[c] != 0]
        # re-scan everything still non-zero too: peeling one key can
        # purify any cell it shared
        queue = list({*queue, *[c for c in range(m) if cnt[c] != 0]})
    ok = all(
        cnt[c] == 0 and ksum[c] == 0 and csum[c] == 0 for c in range(m)
    )
    return decoded, ok
