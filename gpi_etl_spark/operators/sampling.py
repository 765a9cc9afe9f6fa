"""Consistent (coordinated) key sampling: deterministic, mergeable,
join-preserving samples for 100 TB pipelines.

``df.sample(fraction)`` draws a DIFFERENT sample every run, cannot be
replayed across engines, and samples ROWS — so joining two sampled
tables keeps ~fraction² of the joinable pairs, which makes naive
sampling useless for join-shaped questions (data debugging, pipeline
dry runs, profile-before-you-shuffle). Hash-priority sampling fixes
all three at once: give every KEY the priority
``cubic_mix(poly_hash(key))`` (the repo's standard near-uniform
derivation, functions/xhash.py) and

* **bottom-k** (:func:`sample_keys_bottomk`): the k smallest
  priorities per group — a fixed-SIZE sample that is deterministic,
  replayable in DuckDB bit-for-bit, and MERGEABLE:
  ``bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B))`` (min-heap
  algebra, same reason kmv registers merge), so per-day samples
  compose without rescanning.
* **threshold** (:func:`sample_keys_threshold`): priorities below
  ``rate·P`` — a fixed-RATE Bernoulli sample with the same
  determinism; the sample for rate r is a SUBSET of the sample for
  r' > r (nested samples: grow a 0.1% debug slice into a 1% QA slice
  without re-drawing).
* **coordination**: the SAME key hashes identically in every table,
  so ``sample(A) ⋈ sample(B)`` on the sampled key IS
  ``sample(A ⋈ B)`` — the property that lets a planner profile a
  100 TB join on a 0.1% slice and trust the fan-out it sees
  (Bernoulli case: exact; bottom-k case: exact when both sides
  sample the same key universe).

Sampling KEYS (all rows of a chosen key survive) rather than rows is
what preserves join structure and per-key statistics (a key's full
fan-out is either fully present or fully absent — per-key aggregates
over the sample are exact for sampled keys).

Scale shape: the priority is one hash per row (no shuffle); bottom-k
reduces per group via the ``top_k_per_group`` window over DISTINCT
keys (the window input is |distinct keys|, not |rows|), and the
chosen-key set semi-joins back — broadcast when k·|groups| is small,
which is the point of a sample. Threshold sampling is a pure filter:
zero shuffles, full codegen.

No counterpart in the reference (its only sampling is pandas
``head``-style slicing); textbook coordinated/bottom-k sampling
(Broder '97 lineage; Cohen & Kaplan's coordinated samples).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gpi_etl_spark.functions import xhash

#: priority domain size (priorities are uniform on [0, P))
P = xhash.P


def key_priority(
    key_col: str | Column, hash_mode: str = "xxhash64"
) -> Column:
    """The sampling priority of a key: ``cubic_mix(base(key))``,
    uniform on [0, P) (the cubic premix matters here for the same
    reason it does for kmv minima: ORDER STATISTICS of the raw poly
    hash of short keys are biased by its arithmetic-progression
    structure). Cast non-string keys to string first — canonically,
    no padding — so coordination holds across tables that store the
    key at different widths. ``hash_mode``: ``xxhash64`` (JVM
    intrinsic, production default) or ``poly`` (the per-character
    replayable fold DuckDB replays bit-exactly — the q253 gate mode).
    Coordination only holds WITHIN one mode: sample every
    participating table with the same mode, like the sketch fam
    tags."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    if hash_mode == "poly":
        h = xhash.poly_hash(c.cast("string"))
    elif hash_mode == "xxhash64":
        h = F.pmod(F.xxhash64(c.cast("string")), F.lit(P))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return xhash.cubic_mix(h)


def key_priority_sql(expr: str) -> str:
    """DuckDB replay of :func:`key_priority` for a VARCHAR expr."""
    return xhash.cubic_mix_sql(xhash.poly_hash_sql(expr))


def sample_keys_bottomk(
    df: DataFrame,
    key_col: str,
    k: int,
    group_cols: tuple[str, ...] = (),
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The sampled KEY SET: ``(*group_cols, key_col, pri bigint)`` —
    the k distinct keys of smallest priority per group (ties on
    priority break by key value, so the choice is total and
    deterministic even under hash collisions). Semi-join the result
    against any table sharing the key to materialize that table's
    sample; results from disjoint shards merge by re-applying
    bottom-k to the union of their key sets (pinned by test)."""
    keys = df.select(*group_cols, key_col).distinct()
    w = F.row_number().over(
        Window.partitionBy(*group_cols).orderBy(
            F.col("pri").asc(), F.col(key_col).asc()
        )
    )
    return (
        keys.withColumn("pri", key_priority(key_col, hash_mode))
        .withColumn("_rn", w)
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sample_keys_threshold(
    df: DataFrame,
    key_col: str,
    rate: float,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Filter ``df`` to rows whose key priority falls below
    ``rate·P`` — a consistent Bernoulli KEY sample. Pure filter (no
    shuffle, stays in codegen); nested across rates; coordinated
    across tables (the join-preservation property — pinned by test).
    The integer threshold ``floor(rate·P)`` is computed once on the
    driver so both engines compare against the identical literal."""
    thr = int(rate * P)
    return df.filter(key_priority(key_col, hash_mode) < F.lit(thr))


def threshold_literal(rate: float) -> int:
    """The integer priority threshold for ``rate`` — exposed so SQL
    replays and documentation state the same literal."""
    return int(rate * P)


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) shard placement
# ---------------------------------------------------------------------------

#: fixed score-family size: per-shard scores must NOT depend on the
#: current shard COUNT (that is the whole point — resizing N → N+1
#: must leave scores of existing shards untouched), so the affine
#: family is sized once at this ceiling and `n_shards` merely bounds
#: the argmax. Raising it later changes every placement — it is a
#: layout version, not a tuning knob.
RENDEZVOUS_MAX_SHARDS = 64


def rendezvous_shard(
    key_col: str | Column,
    n_shards: int,
    hash_mode: str = "xxhash64",
    base: Column | None = None,
) -> Column:
    """The rendezvous / highest-random-weight shard of a key
    (Thaler & Ravishankar '96; the placement rule behind consistent
    cache/partition assignment): shard = argmax over i < n_shards of
    score_i(key), with score_i the repo's standard replayable
    derivation ``affine_hash(cubic_mix(poly_hash(key)), i, 64)``.

    THE property, and why a 100 TB layout wants it: growing N → N+1
    relocates ONLY the keys whose new shard WINS the argmax —
    ~1/(N+1) of them, each moving INTO the new shard, with no key
    ever reshuffled BETWEEN surviving shards (modulo-hash resharding
    moves ~N/(N+1) of everything). Pinned by test and by the q257
    gate. Ties break to the smallest index (total order: scores are
    distinct integers almost surely, index breaks the rest), so
    placement is deterministic and engine-replayable.

    One hash + n_shards integer transforms per row, no shuffle — a
    pure projection that stays inside codegen. ``hash_mode``: the
    repo's standard pair — ``xxhash64`` (JVM intrinsic, the
    production default: the per-character poly fold costs ~6 µs/key,
    measured at sf0.1) or ``poly`` (the replayable audit mode the
    q257 gate runs; the DuckDB twin :func:`rendezvous_shard_sql`
    replays only this mode). The two modes are DIFFERENT layouts —
    pick one per table and stamp it in the layout metadata, exactly
    like the sketch fam tags.

    ``base`` (round-12 optimization): a precomputed
    ``key_priority(key_col, hash_mode)`` COLUMN to score from,
    skipping the per-row hash fold — placing the same key under
    several shard counts (the resize audit, q257) shares ONE fold
    instead of paying the per-character poly fold per placement.
    The caller owns mode coordination: the base must come from
    key_priority under the SAME hash_mode, or the placements land in
    a different (internally consistent, but uncoordinated) score
    space."""
    if not 1 <= n_shards <= RENDEZVOUS_MAX_SHARDS:
        raise ValueError(
            f"n_shards must be in [1, {RENDEZVOUS_MAX_SHARDS}] "
            f"(got {n_shards}) — the score family is sized once at "
            "the ceiling so placements survive resizing"
        )
    from gpi_etl_spark.functions.hof import let_

    # the shared priority derivation IS the per-key base (review
    # find: a verbatim copy here meant a future derivation change
    # could silently de-coordinate the two operators' hash spaces)
    if base is None:
        base = key_priority(key_col, hash_mode)
    scores = let_(
        base,
        lambda g: F.array(
            *[
                xhash.affine_hash(g, i, RENDEZVOUS_MAX_SHARDS)
                for i in range(n_shards)
            ]
        ),
    )
    # array_position returns the FIRST index of the max (1-based) —
    # the smallest-index tie-break, deterministic on both engines
    return (
        F.array_position(scores, F.array_max(scores)) - F.lit(1)
    ).cast("int")


def rendezvous_shard_sql(expr: str, n_shards: int) -> str:
    """DuckDB replay of :func:`rendezvous_shard` for a VARCHAR expr
    (list_position finds the first max, matching the tie-break)."""
    if not 1 <= n_shards <= RENDEZVOUS_MAX_SHARDS:
        raise ValueError(f"n_shards out of range: {n_shards}")
    g = xhash.cubic_mix_sql(xhash.poly_hash_sql(expr))
    scores = (
        "["
        + ", ".join(
            xhash.affine_hash_sql("__rg", str(i), RENDEZVOUS_MAX_SHARDS)
            for i in range(n_shards)
        )
        + "]"
    )
    # bind the premixed base once via a scalar subquery-free lambda:
    # DuckDB evaluates the list literal per row; list_position is
    # 1-based like Spark's array_position
    return (
        f"(SELECT list_position(__sc, list_max(__sc)) - 1 FROM ("
        f"SELECT {scores} AS __sc FROM (SELECT ({g}) AS __rg) ))"
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    k: int,
    group_cols: tuple[str, ...] = (),
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Priority sampling for weighted subset-sum estimation
    (Duffield, Lund & Thorup '05/'07 — public method; the scheme
    proven within a factor of the optimal variance for ANY subset-sum
    workload). Bottom-k/threshold sampling treats every key alike; a
    revenue-weighted question wants heavy keys in the sample with
    certainty and light keys by lottery. Each item gets the priority

        q_i = w_i / u01_i,   u01_i = (key_priority(key_i) + 1) / P
                             ∈ (0, 1]

    (the +1 dodges u01 = 0, where the priority is infinite; u01 is
    the repo's deterministic uniform scaled to the unit interval the
    DLT theorem requires — an UNSCALED integer uniform would leave τ
    ~P× too small and collapse the estimator to the sampled weights).
    The k largest priorities are the sample; the (k+1)-th priority is
    the threshold τ; the unbiased per-item estimator is
    ``est_w = max(w, τ)`` — Σ est_w over the sample estimates the
    group's true Σw for ANY selected subset, E-exactly (the DLT
    theorem). Every arithmetic step is cross-engine exact: w and u
    are int64; u01 and q are TWO pinned-order IEEE divides of
    exact-integer doubles (division is correctly rounded —
    bit-identical in both engines); ties on q break by key so
    selection is total.

    Items are (group, key) with ``weight = sum(weight_col)``
    aggregated internally (rows of a key never split). NULL keys are
    excluded; weights must be POSITIVE integers — a NULL/zero/negative
    aggregate weight raises at execution (the null-weight-guard
    convention), because DLT is undefined there.

    Returns the k selected items per group:
    ``(*group_cols, key_col, w bigint, n_items bigint, tau_r double,
    est_w_r double)`` — τ is 0 when the group has ≤ k items (the
    sample is the whole group and est_w = w exactly). fs6-pinned
    floats; the selection itself is gated by the emitted key set.

    Scale shape: one map-side-combined groupBy to the item table
    (|keys| rows, never the corpus on the wire), one priority
    projection, per-group top-(k+1) via the row_number window over
    ITEMS, and a per-group τ broadcast back. Per-shard samples merge:
    re-run the operator over the union of per-shard top-(k+1) item
    sets (q recomputes from (key, w) — pinned by test)."""
    wcol = (
        F.col(weight_col) if isinstance(weight_col, str) else weight_col
    )
    items = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(*group_cols, key_col)
        .agg(F.sum(wcol).cast("bigint").alias("w"))
    )
    bad = F.col("w").isNull() | (F.col("w") <= 0)
    guarded_w = F.when(
        ~bad, F.col("w")
    ).otherwise(
        F.raise_error(
            F.lit(
                "priority_sample: item weights must be positive "
                "integers (NULL/zero/negative aggregate weight) — "
                "DLT priorities w/u are undefined there."
            )
        )
    )
    u01 = (
        (key_priority(key_col, hash_mode) + F.lit(1)).cast("double")
        / F.lit(float(P))
    )
    q = guarded_w.cast("double") / u01
    wspec = Window.partitionBy(*group_cols).orderBy(
        F.col("_q").desc(), F.col(key_col).asc()
    )
    wgrp = Window.partitionBy(*group_cols)
    ranked = (
        items.withColumn("_q", q)
        .withColumn("_rn", F.row_number().over(wspec))
        .withColumn(
            "_tau",
            F.coalesce(
                F.max(
                    F.when(F.col("_rn") == k + 1, F.col("_q"))
                ).over(wgrp),
                F.lit(0.0),
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(wgrp).cast("bigint"))
    )
    from gpi_etl_spark.functions.rounding import fs6

    return ranked.filter(F.col("_rn") <= k).select(
        *group_cols,
        key_col,
        "w",
        F.col("_n").alias("n_items"),
        fs6(F.col("_tau")).alias("tau_r"),
        fs6(
            F.greatest(F.col("w").cast("double"), F.col("_tau"))
        ).alias("est_w_r"),
    )


def neyman_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    value_col: str,
    k_total: int,
    hash_mode: str = "poly",
) -> DataFrame:
    """Neyman-allocated stratified sampling — the survey-statistics
    ALLOCATION DECISION on top of the coordinated samplers this
    module already has: for a fixed total budget ``k_total``, the
    variance-minimizing design samples stratum h in proportion to
    ``N_h · S_h`` (big AND internally-variable strata earn more
    budget than big-but-uniform ones). Every step is replayable:

    * per-stratum moments ``(N, Σv, Σv²)`` are exact int64 from ONE
      map-side-combined pass; the Neyman weight is
      ``w_h = floor(sqrt(N·Σv² − (Σv)²))`` — the variance numerator
      is exact int64 (envelope: it must stay < 2^53 so the sqrt's
      double conversion is exact; value magnitudes like quantities
      satisfy this at any corpus size, cents of large prices may
      not — rescale first), and sqrt is a single correctly-rounded
      IEEE op, so the floor is bit-identical in both engines;
    * the integerization is the LARGEST-REMAINDER method in pure
      int64: ``base_h = k·w_h div W``, leftovers go to the largest
      ``(k·w_h mod W)`` with ties broken by stratum — a total,
      replayable apportionment (the same math as parliamentary seat
      allocation);
    * within each stratum the ``alloc_h`` keys of smallest
      :func:`key_priority` win (ties by key) — coordinated,
      engine-stable, and mergeable across shards by re-ranking
      unioned per-shard top-alloc sets.

    NULL ``value_col`` rows are counted in ``n_rows`` but skipped by
    the moment sums (both engines agree), which silently deflates the
    stratum's variance — feed a NULL-free value column (filter or
    coalesce upstream, deliberately).

    Raises (lazily, inside the plan) if every stratum is constant
    (ΣW = 0 — Neyman allocation is undefined; fall back to
    proportional-to-N explicitly if that is what you want). Returns
    one row per stratum: ``(stratum, n_rows, v_num, w, alloc,
    n_sampled, key_checksum, value_sum_sampled)`` — the decision AND
    the selected set's fingerprints under one gate. Scale: one
    moment pass + one rank window per stratum; the allocation
    lattice is |strata| rows."""
    s = F.col(stratum_col)
    stats = df.groupBy(s.alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col(value_col)).cast("bigint").alias("_sv"),
        F.sum(F.col(value_col) * F.col(value_col))
        .cast("bigint")
        .alias("_svv"),
    )
    v_num = (
        F.col("n_rows") * F.col("_svv") - F.col("_sv") * F.col("_sv")
    )
    wv = stats.select(
        "stratum",
        "n_rows",
        v_num.alias("v_num"),
        F.floor(F.sqrt(v_num.cast("double"))).cast("bigint").alias("w"),
    )
    tot = wv.agg(F.sum("w").cast("bigint").alias("_W"))
    k = F.lit(int(k_total)).cast("bigint")
    al = wv.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_rows",
        "v_num",
        "w",
        F.when(
            F.col("_W") > 0, (k * F.col("w")).cast("bigint")
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "neyman_stratified_sample: every stratum is "
                    "constant (total Neyman weight 0) — the "
                    "allocation is undefined; use a "
                    "proportional-to-N design explicitly instead."
                )
            ).cast("bigint")
        )
        .alias("_kw"),
        F.col("_W"),
    )
    al = al.select(
        "stratum",
        "n_rows",
        "v_num",
        "w",
        F.expr("_kw DIV _W").cast("bigint").alias("_base"),
        (F.col("_kw") - F.expr("_kw DIV _W") * F.col("_W"))
        .cast("bigint")
        .alias("_rem"),
    )
    lo = al.agg(
        (k - F.sum("_base")).cast("bigint").alias("_L")
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("_rem").desc(), F.col("stratum").asc())
    )
    alloc = (
        al.withColumn("_r", rk)
        .crossJoin(F.broadcast(lo))
        .select(
            "stratum",
            "n_rows",
            "v_num",
            "w",
            (
                F.col("_base")
                + F.when(F.col("_r") <= F.col("_L"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("alloc"),
        )
    )
    pri = df.select(
        s.alias("stratum"),
        F.col(key_col).cast("bigint").alias("_key"),
        F.col(value_col).cast("bigint").alias("_v"),
    ).withColumn(
        "_pri", key_priority(F.col("_key"), hash_mode)
    )
    rn = F.row_number().over(
        Window.partitionBy("stratum").orderBy(
            F.col("_pri").asc(), F.col("_key").asc()
        )
    )
    sel = (
        pri.withColumn("_rn", rn)
        .join(alloc.select("stratum", "alloc"), "stratum")
        .filter(F.col("_rn") <= F.col("alloc"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.sum("_key").cast("bigint").alias("key_checksum"),
            F.sum("_v").cast("bigint").alias("value_sum_sampled"),
        )
    )
    return alloc.join(sel, "stratum", "left").select(
        "stratum",
        "n_rows",
        "v_num",
        "w",
        "alloc",
        F.coalesce(F.col("n_sampled"), F.lit(0))
        .cast("bigint")
        .alias("n_sampled"),
        F.coalesce(F.col("key_checksum"), F.lit(0))
        .cast("bigint")
        .alias("key_checksum"),
        F.coalesce(F.col("value_sum_sampled"), F.lit(0))
        .cast("bigint")
        .alias("value_sum_sampled"),
    )
