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


def equi_depth_bin_map(
    df: DataFrame,
    value_col: str,
    nbins: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The (group, value) → bin assignment table behind
    :func:`equi_depth_woe`, exposed for consumers that need per-ROW
    bins (join it back on (group, value)): same exact integer
    cumulative-count arithmetic, same tie-keeps-bin totality, same
    distinct-values-only window. Returns ``(*group_cols, value_col,
    bin int)`` — |distinct values| rows, broadcastable for bounded
    value domains.

    NULL values: NULL is a distinct histogram value like any other
    (it sorts FIRST in the bin window, so its count shifts every
    cumulative boundary) and receives a bin row — but an equi-join
    back onto the source silently drops it (NULL never equi-matches).
    Callers that join back (binned_mi does) must pre-filter NULLs
    from BOTH the histogram input and the rows, or boundaries and
    cells silently disagree (round-11 advice find)."""
    from pyspark.sql import Window

    hist = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    w_before = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*group_cols)
    return (
        hist.withColumn(
            "_cum", F.coalesce(F.sum("_n").over(w_before), F.lit(0))
        )
        .withColumn("_tot", F.sum("_n").over(w_all))
        .select(
            *group_cols,
            value_col,
            F.expr(f"(_cum * {int(nbins)}) div _tot")
            .cast("int")
            .alias("bin"),
        )
    )


def binned_mi(
    df: DataFrame,
    x_col: str,
    y_col: str,
    nbins: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Numeric-numeric dependence via binned mutual information — the
    third leg of the association-profiling suite (chi²/MI score
    token↔label, equi_depth_woe scores numeric↔binary; this scores
    numeric↔numeric, the feature-redundancy question a model-input
    audit asks). Both columns bin independently through the exact
    equi-depth integer binning (ties share bins — cross-engine
    total), then one contingency aggregation yields per-cell MI
    terms:

        term_ij = (n_ij / n) · ln( (n_ij · n) / (n_i · n_j) )

    Every count is exact int64; the float path is PINNED — one ln of
    a single integer-ratio quotient, one multiply by the exact-int
    probability — and emitted through round(·, 6) per CELL. The
    total MI is the sum of terms and is left to the caller (a float
    sum is order-dependent; per-cell terms are what a cross-engine
    gate certifies — the q255 IV convention). Empty cells (n_ij = 0)
    simply do not appear (their MI contribution is the 0·ln(0)
    limit = 0).

    Scale shape: two distinct-value histograms + bin windows
    (domain-bounded), two map joins back onto the rows (shuffles on
    (group, value) — broadcast when the domains are bounded), one
    map-side-combined contingency groupBy of ≤ nbins² cells per
    group, and the marginals derive FROM the cells (never a second
    corpus pass). Returns ``(*group_cols, bx, by, n_ij, n_i, n_j, n,
    mi_term_r)``.

    NULL x/y rows are DROPPED up front (round-11 advice find: they
    used to count in the bin-boundary histograms — shifting every
    cumulative boundary — while the equi-join back silently excluded
    them from the cells, so cells/n disagreed with the boundaries).
    MI is defined over jointly-observed pairs; a missingness audit is
    a different query (count the NULLs separately)."""
    src = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    xm = equi_depth_bin_map(src, x_col, nbins, group_cols).select(
        *group_cols, x_col, F.col("bin").alias("bx")
    )
    ym = equi_depth_bin_map(src, y_col, nbins, group_cols).select(
        *group_cols, y_col, F.col("bin").alias("by")
    )
    keys_x = [*group_cols, x_col]
    keys_y = [*group_cols, y_col]
    binned = src.join(xm, keys_x).join(ym, keys_y)
    cells = binned.groupBy(*group_cols, "bx", "by").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ij")
    )
    from pyspark.sql import Window

    wg = Window.partitionBy(*group_cols)
    wx = Window.partitionBy(*group_cols, "bx")
    wy = Window.partitionBy(*group_cols, "by")
    # marginals from the ≤ nbins² cell table — window cost is over
    # cells, not rows
    out = (
        cells.withColumn("n_i", F.sum("n_ij").over(wx).cast("bigint"))
        .withColumn("n_j", F.sum("n_ij").over(wy).cast("bigint"))
        .withColumn("n", F.sum("n_ij").over(wg).cast("bigint"))
    )
    ratio = (
        F.col("n_ij").cast("double") * F.col("n").cast("double")
    ) / (F.col("n_i").cast("double") * F.col("n_j").cast("double"))
    term = (
        F.col("n_ij").cast("double") / F.col("n").cast("double")
    ) * F.log(ratio)
    return out.select(
        *group_cols,
        "bx",
        "by",
        "n_ij",
        "n_i",
        "n_j",
        "n",
        F.round(term, 6).alias("mi_term_r"),
    )


def contingency_profile(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Categorical-categorical association profile — the fourth leg
    of the suite (numeric↔numeric is :func:`binned_mi`): one
    contingency aggregation per group over two categorical columns,
    with the exact integer deviation and the pinned per-cell χ² term

        dev_ij  = n_ij·n − n_i·n_j                (exact int64)
        term_ij = (dev/n) · (dev/(n_i·n_j))       (two divides, one
                                                   multiply, round 6)

    Σ term_ij = χ², and χ²/(n·(min(r,c)−1)) = Cramér's V² — both left
    to the caller because float sums are order-dependent; the exact
    ``dev`` column and the per-cell terms are what a cross-engine
    gate certifies (the q255/q264 convention). The dev identity keeps
    everything pre-float exact: (observed − expected)²/expected =
    dev²/(n·n_i·n_j), but dev² overflows int64 near n ≈ 3·10⁹ cell
    products, so the term splits the square across the two divides
    instead of squaring the integer. NULL categories are real
    categories (a missingness pattern IS association signal); filter
    upstream to exclude them.

    Scale: one map-side-combined groupBy to the |x_domain|·|y_domain|
    cell table per group; marginals and totals derive from the cells
    via windows over cells, never a second corpus pass."""
    from pyspark.sql import Window

    cells = df.groupBy(*group_cols, x_col, y_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ij")
    )
    wg = Window.partitionBy(*group_cols)
    wx = Window.partitionBy(*group_cols, x_col)
    wy = Window.partitionBy(*group_cols, y_col)
    out = (
        cells.withColumn("n_i", F.sum("n_ij").over(wx).cast("bigint"))
        .withColumn("n_j", F.sum("n_ij").over(wy).cast("bigint"))
        .withColumn("n", F.sum("n_ij").over(wg).cast("bigint"))
    )
    dev = (
        F.col("n_ij") * F.col("n") - F.col("n_i") * F.col("n_j")
    ).cast("bigint")
    term = (dev.cast("double") / F.col("n").cast("double")) * (
        dev.cast("double")
        / (F.col("n_i").cast("double") * F.col("n_j").cast("double"))
    )
    return out.select(
        *group_cols,
        x_col,
        y_col,
        "n_ij",
        "n_i",
        "n_j",
        "n",
        dev.alias("dev"),
        F.round(term, 6).alias("chi2_term_r"),
    )
