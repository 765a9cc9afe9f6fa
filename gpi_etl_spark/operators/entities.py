"""Entity resolution: blocking → pairwise edit-distance match →
connected-components clustering → canonical entity ids.

The classic record-linkage shape for catalog/vendor/customer
dedup — the reference's site-classification rules
(``HTIPPLSITE/__init__.py``) solve the same "many spellings, one
entity" problem with a hand-written rule chain; this operator is the
general distributed form.

100 TB design, in order of the levers that matter:

1. **Collapse exact duplicates FIRST.** Pairwise matching runs over
   the DISTINCT name strings, never the rows: a 10-billion-row catalog
   typically holds millions of distinct names, so the quadratic term
   shrinks by the duplication factor squared before anything else
   happens. Rows fan back in by one equi-join at the end.
2. **Blocking bounds the quadratic term.** Candidate pairs come from
   an equi-join on a cheap blocking key (here: the name's last token;
   in production also phonetic keys or length buckets), so comparisons
   are within-block only — never an all-pairs product. Hot blocks get
   two implemented defenses (see :func:`blocked_name_pairs`): a
   LOSSLESS length-band second key (on by default — an edit bound
   implies a length bound, so banding by width max_dist+1 with
   neighbor-band joins preserves every qualifying pair), and an
   opt-in deterministic degree cap for the same-length adversarial
   residue, trading bounded recall for a hard pair-count ceiling.
3. **Edit distance runs JVM-side** (``F.levenshtein`` — codegen'd, no
   UDF), and clustering reuses :func:`dedup.connected_components`
   (min-label propagation, one shuffle per round, localCheckpointed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token(col: str) -> Column:
    """Default blocking key: the final whitespace token of the name
    (for product names, usually the head noun)."""
    return F.element_at(F.split(F.trim(F.col(col)), " "), -1)


def blocked_name_pairs(
    names: DataFrame,
    name_col: str = "name",
    block: Column | None = None,
    max_dist: int = 2,
    band_lengths: bool = True,
    hot_block_cap: int | None = None,
) -> DataFrame:
    """Candidate match pairs over a DISTINCT-name frame: equi-join on
    the blocking key, keep ordered pairs within ``max_dist`` edits.
    Returns ``(name_a, name_b)`` with ``name_a < name_b``.

    Hot-block protection (round 6 — previously documented only):

    * ``band_lengths`` (default on) conjuncts the blocking key with a
      name-length band of width ``max_dist + 1``, joining each name
      against its own and both neighbor bands. LOSSLESS: an edit
      distance ≤ max_dist forces |len(a) − len(b)| ≤ max_dist, which
      with band width max_dist+1 means adjacent-or-same bands — so
      every qualifying pair still meets exactly once (on b's band),
      while a hot block of mixed-length names splits into per-band
      joins and the quadratic term falls to the largest same-band
      population. Costs a 3× fan-out of the (tiny) distinct-name frame
      on one side, nothing on the data rows.
    * ``hot_block_cap`` (opt-in) is the last-resort degree cap for the
      adversarial residue band_lengths can't split (thousands of
      SAME-length names sharing a block): names ranked > cap inside
      their (block, band) group — deterministic rank by name — leave
      the pair join entirely and resolve as singletons. This BOUNDS
      candidate pairs at cap²/2 per group at a known recall cost;
      production runs alert on capped groups rather than silently
      letting one block go quadratic.
    """
    blk = (block if block is not None else last_token(name_col)).alias(
        "_blk"
    )
    if not band_lengths:
        a = names.select(F.col(name_col).alias("name_a"), blk)
        b = names.select(F.col(name_col).alias("name_b"), blk)
        return (
            a.join(b, "_blk")
            .filter(F.col("name_a") < F.col("name_b"))
            .filter(F.levenshtein("name_a", "name_b") <= max_dist)
            .select("name_a", "name_b")
        )
    width = max_dist + 1
    base = names.select(
        F.col(name_col).alias("_nm"),
        blk,
        F.floor(F.length(name_col) / width).cast("long").alias("_band"),
    )
    if hot_block_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("_blk", "_band").orderBy("_nm")
        base = (
            base.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= hot_block_cap)
            .drop("_rk")
        )
    # side A visits its own and both neighbor bands; the join key is
    # B's TRUE band, so each qualifying pair meets exactly once
    a = base.select(
        F.col("_nm").alias("name_a"),
        "_blk",
        F.explode(
            F.array(
                F.col("_band") - 1, F.col("_band"), F.col("_band") + 1
            )
        ).alias("_band"),
    )
    b = base.select(F.col("_nm").alias("name_b"), "_blk", "_band")
    return (
        a.join(b, ["_blk", "_band"])
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= max_dist)
        .select("name_a", "name_b")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column | None = None,
    max_dist: int = 2,
    band_lengths: bool = True,
    hot_block_cap: int | None = None,
) -> DataFrame:
    """Cluster rows whose names are within ``max_dist`` edits (within
    a block) into entities.

    Returns the input ids with ``entity_id`` (the min ``id_col``
    across the entity — stable and engine-independent) and
    ``n_members`` (rows in the entity). Singleton names that match
    nothing are their own entity.
    """
    from gpi_etl_spark.operators.dedup import connected_components

    rows = df.select(F.col(id_col), F.col(name_col))
    names = rows.select(F.col(name_col).alias("name")).distinct()
    pairs = blocked_name_pairs(
        names, "name", block, max_dist, band_lengths, hot_block_cap
    )
    cc = connected_components(pairs, "name_a", "name_b")
    # names with no qualifying pair never enter the edge list: they
    # label themselves
    labeled = rows.join(
        cc, rows[name_col] == cc["node"], "left"
    ).select(
        id_col,
        F.coalesce(F.col("component"), F.col(name_col)).alias("_cluster"),
    )
    ent = labeled.groupBy("_cluster").agg(
        F.min(id_col).alias("entity_id"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return labeled.join(ent, "_cluster").select(
        id_col, "entity_id", "n_members"
    )


def fs_weights(m: float, u: float, scale: int = 1000) -> tuple[int, int]:
    """Fellegi–Sunter field weights as INTEGER milli-nats: the
    agreement weight ``ln(m/u)`` and disagreement weight
    ``ln((1−m)/(1−u))`` (m = P(agree | match), u = P(agree |
    non-match)), each rounded ONCE in Python to ``scale``-nats — the
    q209 Naive-Bayes convention that keeps the entire scoring pipeline
    exact integer arithmetic, replayable literal-for-literal by any
    engine. m and u must lie strictly inside (0, 1) with m > u (an
    informative field)."""
    import math

    if not (0.0 < u < m < 1.0):
        raise ValueError(f"need 0 < u < m < 1, got m={m}, u={u}")
    wa = round(math.log(m / u) * scale)
    wd = round(math.log((1.0 - m) / (1.0 - u)) * scale)
    return int(wa), int(wd)


def fs_score(
    pairs: DataFrame,
    comparisons: list[tuple[Column, int, int]],
    match_threshold: int,
    possible_threshold: int,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage scoring (Fellegi &
    Sunter 1969): each candidate pair accumulates the agreement or
    disagreement weight of every comparison field, and the integer
    total classifies the pair against two thresholds —
    ``match`` / ``possible`` (the clerical-review band) /
    ``non_match``.

    ``comparisons`` is ``[(agreement_predicate, w_agree, w_disagree),
    …]`` with the weights pre-baked integers (:func:`fs_weights`), so
    the score column is a pure int64 sum — no float ever enters the
    decision, which is what lets a SQL oracle replay every pair
    bit-exactly and makes the thresholds safe (the integer-threshold
    rule: float score boundaries are where engines disagree).

    Scale shape: a narrow projection over the candidate-pair stream —
    blocking (:func:`blocked_name_pairs`) already bounded the pair
    count, and scoring adds no shuffle at all.

    Reference seat: HTIPPLSITE's hand-written rule chain
    (__init__.py:175-312) resolves the same many-spellings problem
    with binary rules; FS is its principled weighted generalization.
    """
    if not comparisons:
        raise ValueError("fs_score needs at least one comparison field "
                         "(an empty model scores nothing)")
    score = None
    for cond, wa, wd in comparisons:
        term = F.when(cond, F.lit(int(wa))).otherwise(F.lit(int(wd)))
        score = term if score is None else score + term
    decision = (
        F.when(F.col("fs_score") >= match_threshold, F.lit("match"))
        .when(F.col("fs_score") >= possible_threshold, F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    return pairs.withColumn(
        "fs_score", score.cast("bigint")
    ).withColumn("decision", decision)


def survivorship(
    df: DataFrame,
    cluster_col: str,
    rules: "dict[str, tuple]",
) -> DataFrame:
    """Golden-record construction: collapse each entity CLUSTER to one
    canonical row, field by field, under explicit per-field merge
    rules — the step after :func:`resolve_entities` that record-
    linkage pipelines need before the deduped entity can feed
    downstream joins (and that LLM metadata curation needs to merge
    duplicate document records into one provenance row).

    ``rules`` maps output field → rule tuple:

    * ``("latest", ts_col)`` — value with the greatest timestamp,
      NULL values excluded; ties break by the value itself (greatest),
      so the pick is total and deterministic.
    * ``("longest",)`` — longest string (ties → greatest value).
    * ``("mode",)`` — most frequent value (ties → SMALLEST value —
      majority vote with a deterministic runoff).
    * ``("max",)`` / ``("min",)`` — plain extremes.

    Determinism is the design constraint: every rule is expressed as
    a min/max over a struct whose LAST component is the value itself,
    so no two inputs ever compare equal and the golden record is
    independent of row order, partitioning, and engine — which is
    what lets q254 sit under the DuckDB hash gate. NULL discipline:
    a NULL value never wins a field (the struct is nulled when the
    value is null and min/max skip nulls); a cluster whose every
    value is NULL yields NULL.

    Scale shape: all latest/longest/max/min fields compute in ONE
    map-side-combined groupBy over the cluster key; each ``mode``
    field adds one (cluster, value) pre-aggregation and an equi-join
    of |clusters|-sized results (AQE broadcasts them). No windows
    over the raw rows, no collect — the output is |clusters| rows
    however many records each entity has."""
    plain_aggs = []
    mode_fields = []
    for out, rule in rules.items():
        kind = rule[0]
        if kind == "latest":
            ts = rule[1]
            val = rule[2] if len(rule) > 2 else out
            s = F.when(
                F.col(val).isNotNull(),
                F.struct(F.col(ts).alias("o"), F.col(val).alias("v")),
            )
            plain_aggs.append(F.max(s).getField("v").alias(out))
        elif kind == "longest":
            val = rule[1] if len(rule) > 1 else out
            s = F.when(
                F.col(val).isNotNull(),
                F.struct(
                    F.length(val).alias("o"), F.col(val).alias("v")
                ),
            )
            plain_aggs.append(F.max(s).getField("v").alias(out))
        elif kind == "max":
            val = rule[1] if len(rule) > 1 else out
            plain_aggs.append(F.max(val).alias(out))
        elif kind == "min":
            val = rule[1] if len(rule) > 1 else out
            plain_aggs.append(F.min(val).alias(out))
        elif kind == "mode":
            mode_fields.append((out, rule[1] if len(rule) > 1 else out))
        else:
            raise ValueError(f"unknown survivorship rule {rule!r}")
    plain_aggs.append(F.count(F.lit(1)).cast("bigint").alias("n_records"))
    golden = df.groupBy(cluster_col).agg(*plain_aggs)
    for out, val in mode_fields:
        counted = (
            df.filter(F.col(val).isNotNull())
            .groupBy(cluster_col, F.col(val).alias("_v"))
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # min over (-count, value): majority first, smallest-value
        # runoff — one struct ordering, no window
        pick = counted.groupBy(cluster_col).agg(
            F.min(
                F.struct(
                    (-F.col("_c")).alias("o"), F.col("_v").alias("v")
                )
            )
            .getField("v")
            .alias(out)
        )
        golden = golden.join(pick, cluster_col, "left")
    return golden
