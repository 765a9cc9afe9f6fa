"""Text analysis: token counts, quality scores, language ID, fingerprints.

North-star operators (BASELINE.json) over the ``documents`` table. All
expressions are native (regexp + array functions) so a 100 TB corpus
scans at parquet speed with zero Python in the loop.
"""

from __future__ import annotations

import re

import pandas as pd  # module-level: pandas_udf resolves stringified type
# hints (PEP 563) against module globals at decoration

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpi_etl_spark.functions.rounding import fs6

#: tiny per-language stopword lists for the n-gram/stopword heuristic.
#: Real language ID would load fastText/CLD3 via mapInPandas (stubbed in
#: operators.multimodal style); this heuristic is the native-expression
#: baseline and is deterministic for the oracle.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lowercased text (empty strings removed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda t: F.length(t) > 0
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: splits on whitespace AND digit/letter
    boundaries (a cheap BPE proxy: ``ab12cd`` → 3 pieces)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(
        F.lower(F.trim(c)), r"\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])"
    )
    return F.size(F.filter(pieces, lambda t: F.length(t) > 0))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(total == 0, 0.0).otherwise(punct / total)


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, 0.0).otherwise(hits / F.size(toks))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] doc-quality heuristic: rewards mid-length docs,
    penalizes punctuation soup and stopword deserts. Weights are the
    usual cheap-filter shape (length 0.4, punct 0.3, stopword 0.3)."""
    ntok = token_count(col).cast("double")
    length_term = F.least(ntok / 100.0, F.lit(1.0))
    punct_term = 1.0 - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    sw_term = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    return 0.4 * length_term + 0.3 * punct_term + 0.3 * sw_term


def language_guess(col: Column | str) -> Column:
    """Pick the language whose stopword ratio is highest (ties broken
    by fixed order en→es→de; 'und' = undetermined when all zero)."""
    ratios = {lang: stopword_ratio(col, lang) for lang in STOPWORDS}
    best = F.lit("und")
    best_r = F.lit(0.0)
    # iterate in reverse priority so earlier langs win ties
    for lang in reversed(list(STOPWORDS)):
        r = ratios[lang]
        best = F.when(r >= best_r, F.lit(lang)).otherwise(best)
        best_r = F.greatest(r, best_r)
    return F.when(best_r > 0, best).otherwise(F.lit("und"))


def rolling_fingerprint(
    col: Column | str, window: int = 8, hash_mode: str = "xxhash64"
) -> Column:
    """Deterministic document fingerprint: min over rolling
    ``window``-token pieces (a winnowing-style selector: stable under
    small edits, unlike a whole-document hash). ``hash_mode="poly"``
    swaps the JVM xxhash64 for the exact-integer polynomial code-point
    hash (functions/xhash.py) that DuckDB replays bit-for-bit — the
    q39 hash-gate path; xxhash64 stays the 100 TB default."""
    from gpi_etl_spark.functions.hof import let_

    if hash_mode == "poly":
        from gpi_etl_spark.functions import xhash

        piece_hash = lambda s: xhash.poly_hash(s)  # noqa: E731
    else:
        piece_hash = F.xxhash64

    # let-bound: tokenize once per row, not once per window offset
    return let_(
        tokens(col),
        lambda tk: F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(tk) - window, F.lit(0))),
                lambda i: piece_hash(
                    F.concat_ws(" ", F.slice(tk, i + 1, window))
                ),
            )
        ),
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per doc with the full stats bundle."""
    return df.select(
        id_col,
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_subtokens"),
        F.length(text_col).alias("n_chars"),
        punct_ratio(text_col).alias("punct_ratio"),
        stopword_ratio(text_col).alias("stopword_ratio_en"),
        quality_score(text_col).alias("quality"),
        language_guess(text_col).alias("lang_guess"),
        rolling_fingerprint(text_col).alias("fingerprint"),
    )


def ngram_repetition_ratio(col: Column | str, n: int = 3) -> Column:
    """Fraction of repeated word n-grams within the document — the
    Gopher-style duplicate-text signal used to filter boilerplate and
    looping generations from LLM training corpora. 0 when the doc has
    fewer than ``n`` tokens.

    Pure array expressions (zip_with shifted copies → array_distinct),
    so the whole signal stays in one codegen stage: no explode, no
    shuffle, linear in tokens per row at any scale.

    Why zip_with and not transform-over-indices: a lambda body is
    re-evaluated per element, and any expression it closes over — like
    the tokenization split — re-runs each time, turning the ratio
    O(tokens²) per document (measured 28 s for 5k docs at sf0.1). The
    argument ARRAYS of a higher-order function are evaluated once, so
    zipping the token array with its shifted copies tokenizes n times
    total and builds every gram in one linear pass; the null padding
    zip_with adds past the shorter array propagates through ``concat``
    and marks the (n-1) incomplete tail grams for one filter.
    """
    grams_or_null = tokens(col)
    for j in range(1, n):
        # slice length is a fixed big literal: passing size(toks) here
        # would re-run the tokenization just to bound an already-bounded
        # slice
        grams_or_null = F.zip_with(
            grams_or_null,
            F.slice(tokens(col), j + 1, 1 << 30),
            lambda g, nxt: F.concat(g, F.lit(" "), nxt),
        )
    grams = F.filter(grams_or_null, lambda g: g.isNotNull())
    n_grams = F.size(grams)
    # coalesce restores 0.0 for NULL text (tokens → null propagates all
    # the way through the zip_with chain), matching the q98 oracle's
    # CASE branch and the pre-rewrite behavior
    return F.coalesce(
        F.when(n_grams <= 0, F.lit(0.0)).otherwise(
            # exact rational (1 - m/n) -> floor-scaled 6-dp rounding:
            # round() diverges between engines on exact half-way
            # points (e.g. n=128 grams makes 7-dp ...5 values)
            fs6(
                F.lit(1.0)
                - F.size(F.array_distinct(grams))
                / n_grams.cast("double")
            )
        ),
        F.lit(0.0),
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    empirical unigram model — the cheap perplexity proxy for quality
    filtering (very low = gibberish/rare-token soup, very high =
    repetitive boilerplate).

    Shape at scale: one exploded-token pass feeds BOTH the vocabulary
    aggregate (map-side combinable) and the per-doc score; the token →
    frequency join is an equi-join on the term (broadcastable while
    the vocabulary is bounded), and the corpus total is a one-row
    aggregate broadcast, not a driver collect.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = toks.join(vocab, "term").crossJoin(F.broadcast(total))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cnt") / F.col("total"))), 6).alias(
                "avg_logprob"
            ),
        )
    )


def bigram_expr(col: Column | str) -> Column:
    """Word-bigram strings (``"w1 w2"``) of a text column, as pure
    array expressions: zip_with over the token array and its shifted
    slice (argument arrays evaluate ONCE — see the O(tokens²) note on
    :func:`ngram_repetition_ratio`). Tokens cannot contain whitespace,
    so the space-joined pair is an unambiguous key."""
    pair_or_null = F.zip_with(
        tokens(col),
        F.slice(tokens(col), 2, 1 << 30),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.filter(pair_or_null, lambda g: g.isNotNull())


def bigram_interpolated_logprob(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document mean log-probability under an interpolated bigram
    LM trained on ``train`` — the CCNet-style perplexity filter one
    step up from :func:`unigram_logprob`:

        P(w2|w1) = λ·c(w1 w2)/c(w1) + (1−λ)·(c(w2)+1)/(N+V)

    (MLE bigram backed off to add-one unigram; unseen contexts score
    only the unigram term). λ defaults to 0.75 — exactly representable
    in binary, so 1−λ is bit-identical across engines.

    Shape at scale: model "training" is two map-side-combinable
    groupBys over one exploded pass of the train split; scoring is
    three equi-joins (bigram key, then each side's unigram) — all
    broadcastable while the vocabulary is bounded, all plain shuffles
    when it is not. No driver collect, no Python in the loop; the
    whole thing is one Catalyst plan.
    """
    uni = (
        train.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = uni.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    big = (
        train.select(F.explode(bigram_expr(text_col)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt12"))
    )
    pairs = score.select(
        F.col(id_col), F.explode(bigram_expr(text_col)).alias("bg")
    ).select(
        id_col,
        "bg",
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    u1 = uni.select(F.col("term").alias("w1"), F.col("cnt").alias("cnt1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("cnt").alias("cnt2"))
    j = (
        pairs.join(big, "bg", "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(totals))
    )
    prob = (
        F.lit(lam) * F.coalesce(F.col("cnt12") / F.col("cnt1"), F.lit(0.0))
        + (F.lit(1.0) - F.lit(lam))
        * (F.coalesce(F.col("cnt2"), F.lit(0)) + F.lit(1))
        / (F.col("total") + F.col("vocab")).cast("double")
    )
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg(F.log(prob)), 6).alias("avg_logprob"),
    )


def hashed_token_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Hashing-trick featurizer (Weinberger et al. 2009): tokens map
    to a FIXED number of buckets via the cross-engine poly hash, with
    a second hash bit supplying a ±1 sign that unbiases collisions in
    expectation — the featurizer that needs NO vocabulary pass, no
    broadcast dictionary, and constant memory however large the token
    space grows (the production alternative to q76's explicit
    vocabulary when 100 TB of text won't fit an id map).

    Output is sparse triples ``(id, bucket, val, n_terms)`` — signed
    collision-summed counts; shuffle cost ∝ nonzeros, never ∝ dim.
    All-integer arithmetic on the replayable hash, so the features
    hash-gate bit-exactly (`functions/xhash.py` contract; use a
    64-bit hash in a production fork for lower collision mass —
    same trade-off note as MinHash's poly mode).
    """
    from gpi_etl_spark.functions import xhash

    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    h = xhash.poly_hash(F.col("term"))
    bucket = (h % F.lit(dim)).cast("int")
    sgn = F.when((h % F.lit(2 * dim)) >= F.lit(dim), F.lit(1)).otherwise(
        F.lit(-1)
    )
    return (
        toks.select(F.col(id_col), bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy(id_col, "bucket")
        .agg(
            F.sum("sgn").cast("bigint").alias("val"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )


def html_to_text(col: Column | str) -> Column:
    """Boilerplate-strip an HTML payload to visible text — the first
    stage of a web-crawl → training-corpus pipeline, as a pure regexp
    chain (codegen'd, no parser object per row, linear per document).

    Order matters: script/style blocks (with their content) first,
    then comments, then remaining tags, then the half-dozen common
    entities (``&amp;`` last, so double-escaped markup like
    ``&amp;lt;`` yields the literal text ``&lt;`` rather than
    double-unescaping to ``<``), then whitespace collapse. The patterns
    avoid backreferences so the same chain runs verbatim on RE2 engines
    (DuckDB) for the oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_to_text_sql(expr: str) -> str:
    """DuckDB spelling of :func:`html_to_text` (identical chain)."""
    out = f"regexp_replace({expr}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    out = f"regexp_replace({out}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    out = f"regexp_replace({out}, '(?s)<!--.*?-->', ' ', 'g')"
    out = f"regexp_replace({out}, '<[^>]+>', ' ', 'g')"
    for ent, ch in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "''"), ("&amp;", "&")):
        out = f"replace({out}, '{ent}', '{ch}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


#: characters removed outright by :func:`unicode_clean`: C0 controls
#: (minus \t \n \r), DEL, zero-width space/joiners, BOM. Spelled as
#: escape sequences that parse identically in Java regex (Spark) and
#: RE2 (DuckDB) — raw control bytes never appear in a plan or SQL text.
#: \x{...} brace escapes parse the same in Java regex and RE2
_CTRL_CLASS = (
    r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f"
    r"\x{200b}-\x{200d}\x{feff}]"
)
_CTRL_CLASS_SQL = _CTRL_CLASS


def nfc_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Unicode canonical normalization via an Arrow-batched pandas_udf.

    Spark has no built-in normalizer, and normalization is genuinely
    table-driven (the full Unicode composition tables) — this is the
    documented slow-path exception, kept OFF the hot path: run it once
    at ingest, downstream operators stay native. The batch transfers as
    Arrow; per-batch work is a C-backed ``unicodedata.normalize`` loop.

    ``form`` ∈ NFC/NFD/NFKC/NFKD (the oracle twin exists for NFC only —
    DuckDB ships ``nfc_normalize``)."""
    import unicodedata

    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x)
            if isinstance(x, str)
            else x
        )

    return _norm(c)


def unicode_clean(col: Column | str, nfc: bool = True) -> Column:
    """Corpus text normalization: NFC-compose (optional), drop control
    and zero-width characters, collapse horizontal whitespace runs to a
    single space (newlines survive — paragraph structure is signal),
    trim. The cleanup stages are native regexp chains; only the NFC
    step pays the Python toll (see :func:`nfc_normalize`)."""
    c = F.col(col) if isinstance(col, str) else col
    if nfc:
        c = nfc_normalize(c)
    c = F.regexp_replace(c, _CTRL_CLASS, "")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    return F.trim(c)


def unicode_clean_sql(expr: str) -> str:
    """DuckDB spelling of :func:`unicode_clean` (nfc=True): identical
    chain over ``nfc_normalize`` + RE2 patterns."""
    out = f"nfc_normalize({expr})"
    out = f"regexp_replace({out}, '{_CTRL_CLASS_SQL}', '', 'g')"
    out = f"regexp_replace({out}, '[ \\t]+', ' ', 'g')"
    return f"trim({out})"


#: sentence-shaped chunks: a run of non-terminators plus its trailing
#: terminator run. Deliberately lookbehind-free — RE2 (DuckDB) has no
#: lookbehind, and this pattern behaves identically under Java regex
#: and RE2, so the oracle replays segmentation verbatim. Real
#: abbreviation-aware segmentation (spaCy et al.) would be a
#: mapInPandas slow path; this is the deterministic native baseline.
_SENT_RE = r"[^.!?]+[.!?]*"


def split_sentences(col: Column | str) -> Column:
    """Array of trimmed, non-empty sentence chunks of a text column —
    native regexp_extract_all, no Python in the loop."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_extract_all(c, F.lit(_SENT_RE), F.lit(0))
    # the explicit lambda matters: a bare F.trim would be invoked by
    # transform with (element, index) and silently hit the two-arg
    # trim(col, trimStr) overload, trimming by the index's digits
    return F.filter(
        F.transform(raw, lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )


def shared_sentence_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-document boilerplate detection at SENTENCE granularity —
    the "common sentence removal" pass (C4 does lines, this does
    sentences): a normalized sentence seen in ≥ 2 distinct documents
    marks every document containing it. Returns per-doc
    ``(id, n_sentences, n_shared, shared_ratio)`` over the document's
    DISTINCT normalized sentences.

    Scale shape: explode → distinct (id, sentence-hash... here the
    normalized text itself so the oracle can replay the grouping) →
    one groupBy for the ≥2-docs set → left join back. Shuffle ∝
    distinct sentences; at 100 TB swap the join key for xxhash64 of
    the normalized sentence (8 bytes on the wire), exactly like
    dedup.duplicate_spans' hash_spans mode."""
    from gpi_etl_spark.operators.dedup import normalize_text

    s = (
        df.select(
            F.col(id_col),
            F.explode(split_sentences(text_col)).alias("_sent"),
        )
        .select(id_col, normalize_text("_sent").alias("norm"))
        .distinct()
    )
    shared = (
        s.groupBy("norm")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("norm")
        .withColumn("_hit", F.lit(1))
    )
    hit = F.coalesce(F.col("_hit"), F.lit(0))
    return (
        s.join(shared, "norm", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum(hit).cast("bigint").alias("n_shared"),
            # exact integer ratio -> floor-scaled 6-dp rounding
            fs6(F.sum(hit) / F.count(F.lit(1))).alias("shared_ratio"),
        )
    )


def chunk_texts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 32,
    keep_cols: "Sequence[str]" = (),
) -> DataFrame:
    """Split documents into overlapping token windows — the
    tokenize-and-chunk stage before sequence packing in a pretraining
    pipeline. Chunks start every ``chunk_tokens - overlap`` tokens; the
    final chunk may be short; empty docs yield no chunks.

    Shape at scale: tokens stay an array inside the row until ONE
    posexplode of the (bounded) start-offset list — no per-token
    explode, no shuffle; downstream repartitions by (doc, chunk) only
    if the caller asks.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    base = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    piece = F.slice(F.col("__toks"), F.col("start") + 1, chunk_tokens)
    return base.select(
        id_col,
        *keep_cols,
        "chunk_idx",
        F.col("start").alias("start_token"),
        F.size(piece).alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def dedup_lines(col: Column | str, sep: str = "\n") -> Column:
    """C4-style within-document exact line dedup: drop every repeat of
    an already-seen line, keeping first occurrences in order, and
    rejoin. Catches boilerplate headers/footers and navigation chrome
    repeated inside one page.

    Array-only (split → indexed filter on first-occurrence position →
    rejoin): fully codegen'd, no explode, no shuffle. Quadratic in the
    LINE count per document (array_position scans), which is fine —
    documents have tens of lines; for pathological inputs switch to the
    posexplode + min(pos) shuffle form. The line array is let-bound so
    the split runs once per row, not once per line.
    """
    from gpi_etl_spark.functions.hof import let_

    c = F.col(col) if isinstance(col, str) else col
    return let_(
        F.split(c, re.escape(sep)),
        lambda lines: F.array_join(
            F.filter(
                lines,
                lambda line, i: F.array_position(lines, line) == i + 1,
            ),
            sep,
        ),
    )


#: the stopword list Gopher's "required words" rule checks (Rae et al.
#: 2021, Table A1 — public)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def cheap_quality_features(col: Column | str) -> Column:
    """The cheap per-document feature struct a trained quality
    classifier scores from (``operators/logreg.py``): dyadic-scaled
    token count ``f_len`` (÷256, an exact binary scale), Gopher-stopword
    ratio ``f_sw`` and mean word length ``f_mwl``. Every feature is a
    single integer-over-integer (or integer-over-2^k) IEEE division, so
    both engines compute bit-identical doubles per row — no float
    boundary enters until the classifier's own arithmetic. One token
    pass via ``let_``; fuses into the scan projection."""
    from gpi_etl_spark.functions.hof import let_

    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    return let_(
        tokens(col),
        lambda tk: F.struct(
            (F.size(tk) / F.lit(256.0)).alias("f_len"),
            F.when(F.size(tk) == 0, F.lit(0.0))
            .otherwise(
                F.size(F.filter(tk, lambda t: F.array_contains(sw, t)))
                / F.size(tk)
            )
            .alias("f_sw"),
            F.when(F.size(tk) == 0, F.lit(0.0))
            .otherwise(
                F.aggregate(
                    tk, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
                )
                / F.size(tk)
            )
            .alias("f_mwl"),
        ),
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: "Sequence[str]" = (),
) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A.1.1) as one pass of pure column expressions —
    the standard pre-filter stack of every major pretraining corpus
    since. Per document, boolean per rule + ``pass_gopher``:

    * ``ok_word_count``    — 50 ≤ tokens ≤ 100 000
    * ``ok_mean_word_len`` — mean token length in [3, 10] chars
    * ``ok_symbol_ratio``  — (# + …) occurrences ≤ 0.1 per word
    * ``ok_bullet_lines``  — ≤ 90% of lines start with a bullet
    * ``ok_ellipsis_lines``— ≤ 30% of lines end with an ellipsis
    * ``ok_alpha_words``   — ≥ 80% of words contain a letter
    * ``ok_stopwords``     — ≥ 2 of Gopher's 8 required stopwords

    Every ratio compares via integer cross-multiplication
    (``10·n_sym ≤ n_words`` instead of ``n_sym/n_words ≤ 0.1``), so
    the booleans are bit-stable across engines — no float boundaries
    for the DuckDB oracle to disagree on. Zero shuffles: the whole
    bundle fuses into the scan projection.
    """
    from gpi_etl_spark.functions.hof import let_

    c = F.col(text_col)
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / 3
    n_ell = n_ell.cast("long")

    tok_stats = let_(
        tokens(text_col),
        lambda tk: F.struct(
            F.size(tk).alias("n_words"),
            F.aggregate(
                tk, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).alias("n_word_chars"),
            F.size(
                F.filter(tk, lambda t: t.rlike("[a-z]"))
            ).alias("n_alpha_words"),
            F.size(
                F.filter(
                    tk,
                    lambda t: F.array_contains(
                        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]), t
                    ),
                )
            ).alias("n_required_sw"),
        ),
    )
    line_stats = let_(
        F.filter(
            F.transform(F.split(c, r"\n"), lambda ln: F.trim(ln)),
            lambda ln: F.length(ln) > 0,
        ),
        lambda lines: F.struct(
            F.size(lines).alias("n_lines"),
            F.size(
                F.filter(
                    lines,
                    lambda ln: (
                        ln.startswith("- ")
                        | ln.startswith("* ")
                        | ln.startswith("•")
                    ),
                )
            ).alias("n_bullet"),
            F.size(
                F.filter(lines, lambda ln: ln.endswith("..."))
            ).alias("n_ell_lines"),
        ),
    )
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        tok_stats.alias("_t"),
        line_stats.alias("_l"),
        n_hash.alias("_nh"),
        n_ell.alias("_ne"),
    )
    t = F.col("_t")
    li = F.col("_l")
    nw = t["n_words"]
    nl = li["n_lines"]
    return base.select(
        id_col,
        *keep_cols,
        nw.alias("n_words"),
        ((nw >= 50) & (nw <= 100000)).alias("ok_word_count"),
        # 3 ≤ chars/words ≤ 10  ⇔  3·words ≤ chars AND chars ≤ 10·words
        ((nw > 0) & (3 * nw <= t["n_word_chars"])
         & (t["n_word_chars"] <= 10 * nw)).alias("ok_mean_word_len"),
        ((F.col("_nh") + F.col("_ne")) * 10 <= nw).alias("ok_symbol_ratio"),
        (li["n_bullet"] * 10 <= 9 * nl).alias("ok_bullet_lines"),
        (li["n_ell_lines"] * 10 <= 3 * nl).alias("ok_ellipsis_lines"),
        ((nw > 0) & (t["n_alpha_words"] * 5 >= 4 * nw)).alias(
            "ok_alpha_words"
        ),
        (t["n_required_sw"] >= 2).alias("ok_stopwords"),
    ).withColumn(
        "pass_gopher",
        F.col("ok_word_count") & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio") & F.col("ok_bullet_lines")
        & F.col("ok_ellipsis_lines") & F.col("ok_alpha_words")
        & F.col("ok_stopwords"),
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution —
    the compressibility proxy quality filters use (near-zero =
    repeated-character padding, unusually high = random/encoded blobs;
    natural text sits in a narrow band). Computed as
    ``ln(n) - Σ c·ln(c) / n`` over per-character counts, which avoids
    a per-character division and keeps every intermediate an exact
    integer until the final logs.

    One explode + two groupBys (shuffle ∝ total characters). For a
    100 TB run, the same statistic over raw BYTES comes from a fixed
    256-bucket histogram built in one ``aggregate`` pass per row with
    no explode at all; the character form here keeps the oracle
    replayable (DuckDB splits codepoints, not bytes).

    Returns ``(id, n_chars, entropy_r)``; empty documents produce no
    row.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("_ch"),
    ).filter(F.length("_ch") > 0)
    counts = chars.groupBy(id_col, "_ch").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return counts.groupBy(id_col).agg(
        F.sum("_c").cast("bigint").alias("n_chars"),
        F.round(
            F.log(F.sum("_c"))
            - F.sum(F.col("_c") * F.log("_c")) / F.sum("_c"),
            6,
        ).alias("entropy_r"),
    )


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance of every document against a fixed term set — the
    retrieval scorer that turns the corpus into a searchable index
    feed (quality-filtering against seed queries, RAG candidate
    generation, dedup-by-retrieval all sit on this).

    Three bounded shuffles, all ∝ matching postings, never ∝ corpus ×
    terms: explode-to-postings filtered to the term set (Catalyst
    pushes the isin into the generator's filter), a (doc, term) count,
    and the final per-doc sum. Document frequencies are |terms| rows
    (broadcast); N and avgdl are a ONE-ROW aggregate attached by
    crossJoin(broadcast) — the scalar-subquery pattern, whitelisted in
    the plan audit. The idf uses the +1 "Lucene" form
    ``ln((N - df + 0.5)/(df + 0.5) + 1)`` so it never goes negative on
    common terms.

    Returns ``(id_col, bm25)`` for documents matching ≥ 1 term, scores
    UNROUNDED (callers round for display/oracles).
    """
    toks = tokens(text_col)
    base = docs.select(
        F.col(id_col), F.size(toks).alias("_dl"), toks.alias("_toks")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sumdl"),
    )
    postings = base.select(
        id_col, "_dl", F.explode("_toks").alias("_term")
    ).filter(F.col("_term").isin(*terms))
    tf = postings.groupBy(id_col, "_dl", "_term").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    dfreq = tf.groupBy("_term").agg(
        F.count(F.lit(1)).alias("_df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "_term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                (F.col("_n") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "_score",
            F.col("_idf")
            * (F.col("_tf") * F.lit(k1 + 1.0))
            / (
                F.col("_tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b)
                    * F.col("_dl")
                    / (F.col("_sumdl") / F.col("_n"))
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("_score").alias("bm25"))
