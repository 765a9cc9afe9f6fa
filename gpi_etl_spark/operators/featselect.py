"""Feature–label association scoring: chi-square over token presence.

The feature-selection step of a trained-filter pipeline (the q193
logreg kit's upstream): given a binary document label, score every
vocabulary token by the chi-square statistic of its 2×2 presence
contingency table and keep the strongest k — the classic
feature-selection recipe (Manning/Schütze IR textbook) for picking the
cheap lexical features a downstream classifier actually needs. No
counterpart in the reference (its classifier is a fixed regex chain —
HTIPPLSITE rules, SURVEY.md §2 F-STR9); textbook-public method.

Exactness: a/b/c/d and the totals are int64 counts; the statistic
``N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`` is evaluated in DOUBLE with an
identical operation order in both engines (the products would overflow
int64 near 50k docs per class if kept integral — measured bound, so the
casts are load-bearing, not cosmetic) and emitted through the 6-dp
floor scale: the inputs are integers, so the value is an exact rational
— precisely the class where round(·, 6) diverges between engines
(functions/rounding.py).

100 TB shape: explode to DISTINCT (doc, token) presence pairs (one
shuffle, map-side combine on the token key), aggregate per token, then
a global top-k via sort-limit (TakeOrderedAndProject — no partition-less
window). The two corpus totals (N docs, P positives) are bounded model
state: two scalars collected once and embedded as literals, the k-means
/ BPE driver-orchestration pattern (SURVEY §3.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpi_etl_spark.functions.rounding import fs6


def token_presence(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (id, token) presence pairs under the corpus-standard
    normalization (lower, collapse whitespace, split on space)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    )
    toks = F.array_distinct(
        F.filter(F.split(norm, " "), lambda x: F.length(x) > 0)
    )
    return df.select(F.col(id_col), F.explode(toks).alias("token"))


def chi2_token_label(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_support: int = 10,
    k: int = 25,
) -> DataFrame:
    """Top-``k`` tokens by chi-square association with the boolean
    ``label`` column expression, among tokens present in at least
    ``min_support`` documents.

    Returns (token, n_pos, n_neg, chi2_r) — the presence counts in the
    positive/negative class and the 6-dp floor-scaled statistic —
    ordered ties-deterministically (rounded statistic desc, token asc).
    """
    labeled = df.select(
        F.col(id_col), label.cast("int").alias("_y")
    )
    totals = labeled.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_y").alias("p")
    ).collect()[0]
    n_docs, n_pos = int(totals["n"]), int(totals["p"])

    # plain equi-join on the id: the label side is one row per doc, so
    # it is NOT broadcast-sized at corpus scale — AQE picks broadcast
    # when a filter makes it small
    pres = token_presence(df, text_col, id_col).join(labeled, id_col)
    per_tok = pres.groupBy("token").agg(
        F.sum("_y").alias("a"),
        F.sum(1 - F.col("_y")).alias("b"),
    )
    a, b = F.col("a"), F.col("b")
    c = F.lit(n_pos) - a
    d = F.lit(n_docs - n_pos) - b
    diff = (a * d - b * c).cast("double")
    num = F.lit(float(n_docs)) * diff * diff
    den = (
        (a + b).cast("double")
        * (c + d).cast("double")
        * (a + c).cast("double")
        * (b + d).cast("double")
    )
    # a token present in EVERY doc (or a single-class corpus) zeroes a
    # marginal and the statistic is undefined — define it as 0 (no
    # association), matching the oracle's CASE guard
    chi2 = F.when(den == 0, F.lit(0.0)).otherwise(num / den)
    scored = (
        per_tok.filter(a + b >= min_support)
        .select(
            "token",
            a.alias("n_pos"),
            b.alias("n_neg"),
            fs6(chi2).alias("chi2_r"),
        )
    )
    return scored.orderBy(
        F.col("chi2_r").desc(), F.col("token").asc()
    ).limit(k)


def mutual_info_token_label(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_support: int = 10,
    k: int = 25,
) -> DataFrame:
    """Top-``k`` tokens by mutual information I(presence; label) —
    chi-square's information-theoretic sibling (same 2×2 presence
    table, Manning/Schütze §13.5): chi2 ranks by statistical
    dependence strength, MI by the bits (nats here) the feature
    actually carries about the label, which is the quantity a
    token-budgeted filter cares about.

    ``I = Σ_cells (n_ij/N)·ln(N·n_ij / (r_i·c_j))``, empty cells
    contributing 0 (their limit). Counts are exact int64; the four
    terms are evaluated in DOUBLE and summed in ONE FIXED literal
    order — (present,pos) + (present,neg) + (absent,pos) +
    (absent,neg) — so both engines run the identical IEEE chain.
    Unlike chi2 (an exact rational → floor-scaled), MI passes through
    ``ln`` — the transcendental class — so the output uses plain
    ``round(·, 6)`` per functions/rounding.py's rule.

    Same 100 TB shape as :func:`chi2_token_label`: one presence
    explode with map-side combine, two collected scalars as bounded
    model state, sort-limit top-k (no partition-less window).
    """
    labeled = df.select(
        F.col(id_col), label.cast("int").alias("_y")
    )
    totals = labeled.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_y").alias("p")
    ).collect()[0]
    n_docs, n_pos = int(totals["n"]), int(totals["p"])

    pres = token_presence(df, text_col, id_col).join(labeled, id_col)
    per_tok = pres.groupBy("token").agg(
        F.sum("_y").alias("a"),
        F.sum(1 - F.col("_y")).alias("b"),
    )
    a, b = F.col("a"), F.col("b")
    c = F.lit(n_pos) - a
    d = F.lit(n_docs - n_pos) - b
    n_d = F.lit(float(n_docs))

    def term(nij: Column, ri: Column, cj: Column) -> Column:
        nij_d = nij.cast("double")
        return F.when(nij == 0, F.lit(0.0)).otherwise(
            (nij_d / n_d)
            * F.log(n_d * nij_d / (ri.cast("double") * cj.cast("double")))
        )

    mi = (
        term(a, a + b, F.lit(n_pos))
        + term(b, a + b, F.lit(n_docs - n_pos))
        + term(c, c + d, F.lit(n_pos))
        + term(d, c + d, F.lit(n_docs - n_pos))
    )
    scored = per_tok.filter(a + b >= min_support).select(
        "token",
        a.alias("n_pos"),
        b.alias("n_neg"),
        F.round(mi, 6).alias("mi_r"),
    )
    return scored.orderBy(
        F.col("mi_r").desc(), F.col("token").asc()
    ).limit(k)


def equi_depth_woe(
    df: DataFrame,
    value_col: str,
    label_col: str,
    nbins: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Equi-depth binning + Weight-of-Evidence / Information-Value per
    bin — the standard credit-scoring/feature-engineering transform
    (Siddiqi's scorecard construction; public method) for turning a
    numeric feature into a monotonic categorical one and scoring its
    predictive power against a binary label.

    Binning is DETERMINISTIC BY CONSTRUCTION, not ntile: per group the
    distinct values aggregate to a histogram, and a value's bin is

        bin = (rows_strictly_below · nbins) DIV rows_total

    — exact integer arithmetic on cumulative counts, so TIED values
    always share a bin (ntile splits ties by arbitrary row order,
    which no cross-engine gate can survive) and every engine assigns
    identical bins. Bins are equi-depth up to tie granularity: a value
    spanning a boundary stays whole.

    Per bin: ``n, pos, neg``, the value span ``lo/hi``, and

        woe = ln( (pos_i · neg_tot) / (neg_i · pos_tot) )
        iv_term = (pos_i/pos_tot − neg_i/neg_tot) · woe

    woe/iv_term are NULL when a bin has a zero cell (the standard
    undefined case — smooth upstream if you need every bin scored).
    Both emit through round(·, 6) after a PINNED float order: one
    exact-int division, one ln, one/two multiplies (the q97 logprob
    convention — ln of a single quotient, never ln(a)−ln(b), which
    differs in ulps). The total IV is the SUM of iv_terms — left to
    the caller because a float sum is order-dependent; per-bin terms
    are what the cross-engine gate can certify.

    100 TB shape: the histogram is one map-side-combined groupBy over
    (group, value) — the window that assigns bins runs over DISTINCT
    values per group (bounded by the value domain, not the row
    count), and everything after is |bins| rows. Keep groups real
    (date, tenant, shard): a global ungrouped call puts all distinct
    values in one window partition."""
    from pyspark.sql import Window

    lab = F.col(label_col).cast("int")
    hist = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(lab).cast("bigint").alias("_pos"),
    )
    w_before = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*group_cols)
    binned = (
        hist.withColumn(
            "_cum", F.coalesce(F.sum("_n").over(w_before), F.lit(0))
        )
        .withColumn("_tot", F.sum("_n").over(w_all))
        .withColumn(
            "bin",
            F.expr(f"(_cum * {int(nbins)}) div _tot").cast("int"),
        )
    )
    per_bin = binned.groupBy(*group_cols, "bin").agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.sum("_pos").cast("bigint").alias("pos"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    )
    tot = per_bin.groupBy(*group_cols).agg(
        F.sum("pos").cast("bigint").alias("_pt"),
        (F.sum("n") - F.sum("pos")).cast("bigint").alias("_nt"),
    )
    if group_cols:
        joined = per_bin.join(F.broadcast(tot), list(group_cols))
    else:
        joined = per_bin.crossJoin(F.broadcast(tot))
    neg = (F.col("n") - F.col("pos")).cast("bigint")
    ok = (F.col("pos") > 0) & (neg > 0) & (F.col("_pt") > 0) & (
        F.col("_nt") > 0
    )
    ratio = (
        F.col("pos").cast("double") * F.col("_nt").cast("double")
    ) / (neg.cast("double") * F.col("_pt").cast("double"))
    woe = F.round(F.log(ratio), 6)
    iv = F.round(
        (
            F.col("pos").cast("double") / F.col("_pt").cast("double")
            - neg.cast("double") / F.col("_nt").cast("double")
        )
        * F.log(ratio),
        6,
    )
    return joined.select(
        *group_cols,
        "bin",
        "n",
        "pos",
        neg.alias("neg"),
        "lo",
        "hi",
        F.when(ok, woe).alias("woe_r"),
        F.when(ok, iv).alias("iv_term_r"),
    )
