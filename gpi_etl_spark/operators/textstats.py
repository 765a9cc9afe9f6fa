"""Text analysis: token counts, quality scores, language ID, fingerprints.

North-star operators (BASELINE.json) over the ``documents`` table. All
expressions are native (regexp + array functions) so a 100 TB corpus
scans at parquet speed with zero Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def rolling_fingerprint(col: Column | str, window: int = 8) -> Column:
    """Deterministic document fingerprint: min of xxhash64 over rolling
    ``window``-token pieces (a winnowing-style selector: stable under
    small edits, unlike a whole-document hash)."""
    toks = tokens(col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - window, F.lit(0))
    )
    piece_hashes = F.transform(
        starts,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    return F.array_min(piece_hashes)


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

    Pure array expressions (sequence → transform → array_distinct), so
    the whole signal stays in one codegen stage: no explode, no
    shuffle, linear in tokens per row at any scale.
    """
    toks = tokens(col)
    k = F.size(toks)

    def gram(i: Column) -> Column:
        return F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        )

    # guard BEFORE sequence(): Spark's sequence(0, stop) runs DESCENDING
    # for stop < 0 and would fabricate grams for short docs
    grams = F.when(
        k >= n, F.transform(F.sequence(F.lit(0), k - n), gram)
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams)
    return F.when(n_grams <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(grams)) / n_grams.cast("double"),
            6,
        )
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
