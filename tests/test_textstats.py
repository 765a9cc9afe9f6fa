"""Text analysis: token counts, language guess, fingerprint stability."""

from gpi_etl_spark.operators import textstats


def _profile(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return textstats.text_profile(df).first()


def test_token_counts(spark):
    p = _profile(spark, "  the quick  brown fox ")
    assert p.n_tokens == 4
    assert p.n_subtokens == 4


def test_bpe_ish_splits_digit_boundaries(spark):
    p = _profile(spark, "ab12cd x9")
    assert p.n_tokens == 2
    assert p.n_subtokens == 5  # ab|12|cd + x|9


def test_punct_ratio(spark):
    p = _profile(spark, "a,b,c")
    assert abs(p.punct_ratio - 2 / 5) < 1e-9


def test_language_guess(spark):
    assert _profile(spark, "the cat is in the house").lang_guess == "en"
    assert _profile(spark, "el perro y la casa que es un gato").lang_guess == "es"
    assert _profile(spark, "der hund und die katze ist ein tier").lang_guess == "de"
    assert _profile(spark, "xyzzy plugh").lang_guess == "und"


def test_fingerprint_stable_under_small_edit(spark):
    base = "w" + " w".join(str(i) for i in range(50))
    edited = base + " extra"
    different = "z" + " z".join(str(i) for i in range(50))
    fp_base = _profile(spark, base).fingerprint
    fp_edit = _profile(spark, edited).fingerprint
    fp_diff = _profile(spark, different).fingerprint
    # winnowing min-hash: append rarely changes the minimum piece hash
    assert fp_base == fp_edit
    assert fp_base != fp_diff


def test_quality_monotonic_in_length(spark):
    short = _profile(spark, "the a of")
    long = _profile(spark, " ".join(["the quick brown fox"] * 30))
    assert long.quality > short.quality


def test_ngram_repetition_ratio_known_values(spark):
    from gpi_etl_spark.operators.textstats import ngram_repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # 7 trigrams, 3 distinct → 1 - 3/7
            (2, "all unique words here now"),  # 3 trigrams, all distinct → 0
            (3, "too short"),            # < 3 tokens → 0
            (4, ""),                     # empty → 0
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.r for r in df.select(
        "doc_id", ngram_repetition_ratio("text").alias("r")).collect()}
    assert abs(got[1] - round(1 - 3 / 7, 6)) < 1e-9
    assert got[2] == 0.0 and got[3] == 0.0 and got[4] == 0.0


def test_unigram_logprob_known_model(spark):
    import math

    from gpi_etl_spark.operators.textstats import unigram_logprob

    # corpus: 4 tokens total — 'a' freq 3 (p=3/4), 'b' freq 1 (p=1/4)
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id int, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.avg_logprob)
           for r in unigram_logprob(df).collect()}
    assert got[1] == (3, round(math.log(0.75), 6))
    assert got[2] == (1, round(math.log(0.25), 6))


def test_html_to_text_strips_boilerplate(spark):
    from gpi_etl_spark.operators.textstats import html_to_text

    df = spark.createDataFrame(
        [(1, "<html><head><style>p{x:1}</style><script>if (a<b) { go() }"
             "</script></head><body><h1>Hi &amp; bye</h1>"
             "<p class='x'>body&nbsp;text</p><!-- note --></body></html>"),
         (2, "no markup at all"),
         (3, "<p>unclosed")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.t for r in
           df.select("doc_id", html_to_text("text").alias("t")).collect()}
    assert got[1] == "Hi & bye body text"
    assert got[2] == "no markup at all"
    assert got[3] == "unclosed"


def test_chunk_texts_overlapping_windows(spark):
    import pytest

    from gpi_etl_spark.operators.textstats import chunk_texts

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "only two"), (3, ""), (4, None)],
        "doc_id int, text string",
    )
    out = chunk_texts(df, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    # stride 3: starts 0,3,6,9 — last chunk short
    assert [r.start_token for r in c1] == [0, 3, 6, 9]
    assert c1[0].chunk_text == "w0 w1 w2 w3"
    assert c1[1].chunk_text == "w3 w4 w5 w6"   # 1-token overlap
    assert c1[-1].chunk_text == "w9" and c1[-1].n_chunk_tokens == 1
    assert [r.chunk_text for r in by_doc[2]] == ["only two"]
    assert 3 not in by_doc and 4 not in by_doc  # empty/null → no chunks
    with pytest.raises(ValueError, match="overlap"):
        chunk_texts(df, chunk_tokens=4, overlap=4)


def test_dedup_lines_keeps_first_occurrences(spark):
    from gpi_etl_spark.operators.textstats import dedup_lines

    df = spark.createDataFrame(
        [(1, "header\nbody one\nbody two\nheader\nbody one"),
         (2, "a\nb\nc"),
         (3, "same\nsame\nsame")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.t for r in
           df.select("doc_id", dedup_lines("text").alias("t")).collect()}
    assert got[1] == "header\nbody one\nbody two"
    assert got[2] == "a\nb\nc"
    assert got[3] == "same"


def test_gopher_quality_flags_rules(spark):
    from gpi_etl_spark.operators.textstats import gopher_quality_flags

    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks back home with a bag of apples that they have found "
            "near the old mill which was built long ago by people "
            "living in the valley beside the river full of fish and "
            "birds singing from tall trees while the evening light "
            "slowly fades away over the quiet hills")
    bullets = "\n".join(f"- item {i}" for i in range(10))
    ellipsis = "\n".join(f"line {i} trails off..." for i in range(10))
    symbols = "token " * 60 + "#" * 30
    shorty = "too short"
    rows = [(1, good), (2, bullets), (3, ellipsis), (4, symbols), (5, shorty)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}

    assert out[1].pass_gopher            # the well-formed doc passes all
    assert not out[2].ok_bullet_lines    # 100% bulleted lines
    assert not out[3].ok_ellipsis_lines  # 100% ellipsis endings
    assert not out[4].ok_symbol_ratio    # 30 hashes on 61 words
    assert not out[5].ok_word_count      # 2 words < 50
    assert out[5].ok_mean_word_len       # but its words are normal length


def test_repetition_ratio_null_and_empty_text(spark):
    """Regression: NULL text must score 0.0 (the DuckDB oracle's CASE
    branch), not propagate NULL through the zip_with chain."""
    from gpi_etl_spark.operators.textstats import ngram_repetition_ratio

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b"), (4, "x y z x y z x y z")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.rep for r in df.select(
        "doc_id", ngram_repetition_ratio("text").alias("rep")).collect()}
    assert got[1] == 0.0 and got[2] == 0.0 and got[3] == 0.0
    assert got[4] > 0.5  # heavy trigram repetition detected


def test_bigram_logprob_hand_computed(spark):
    """Interpolated bigram LM on a corpus small enough to hand-check:
    P(w2|w1) = 0.75*c12/c1 + 0.25*(c2+1)/(N+V)."""
    import math

    from gpi_etl_spark.operators.textstats import bigram_interpolated_logprob

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b"), (11, "a z"), (12, "q z"), (13, "solo"), (14, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_interpolated_logprob(train, score).collect()}
    # train counts: unigrams a=3 b=2 c=1 (N=6, V=3); bigrams "a b"=2, "b a"=1, "a c"=1
    p_ab = 0.75 * (2 / 3) + 0.25 * (2 + 1) / (6 + 3)
    assert out[10].n_bigrams == 1
    assert out[10].avg_logprob == round(math.log(p_ab), 6)
    # unseen bigram, seen context, unseen second word -> unigram add-one only
    p_az = 0.0 + 0.25 * (0 + 1) / 9
    assert out[11].avg_logprob == round(math.log(p_az), 6)
    # fully unseen context: MLE term coalesces to 0, not NULL
    assert out[12].avg_logprob == round(math.log(0.25 * 1 / 9), 6)
    # docs with <2 tokens produce no bigram rows at all
    assert 13 not in out and 14 not in out


def test_unicode_clean_composes_strips_collapses(spark):
    from gpi_etl_spark.operators.textstats import unicode_clean

    rows = [
        (1, "Café"),               # NFD -> composed single char
        (2, "a​b‌c‍d﻿e"),  # zero-widths dropped
        (3, "x\x00\x07\x1fy\x7fz"),      # C0 controls + DEL dropped
        (4, "  a\t\tb   c  "),           # runs collapse, trim
        (5, "line1\n\nline2"),           # newlines SURVIVE
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r.id: r.c
        for r in df.select(
            "id", unicode_clean("t").alias("c")
        ).collect()
    }
    assert got[1] == "Café" and len(got[1]) == 4
    assert got[2] == "abcde"
    assert got[3] == "xyz"
    assert got[4] == "a b c"
    assert got[5] == "line1\n\nline2"
    assert got[6] is None


def test_unicode_clean_native_path_skips_nfc(spark):
    from gpi_etl_spark.operators.textstats import unicode_clean

    df = spark.createDataFrame([(1, "Café  x")], "id long, t string")
    out = df.select(unicode_clean("t", nfc=False).alias("c")).collect()[0].c
    # without NFC the combining mark stays decomposed; cleanup still runs
    assert out == "Café x" and len(out) == 7


def test_split_sentences_basic(spark):
    from gpi_etl_spark.operators.textstats import split_sentences

    rows = [
        (1, "Hello world. How are you? Fine!"),
        (2, "No terminator at all"),
        (3, "Ellipsis wins... Next one."),
        (4, "  . ?  "),  # stray terminators: kept as chunks (the
        # oracle's len(trim(sent)) > 0 keep-rule is the contract;
        # quality filters downstream drop punctuation-only sentences)
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r.id: r.s for r in
           df.select("id", split_sentences("t").alias("s")).collect()}
    assert got[1] == ["Hello world.", "How are you?", "Fine!"]
    assert got[2] == ["No terminator at all"]
    assert got[3] == ["Ellipsis wins...", "Next one."]
    assert got[4] == [".", "?"]
    assert got[5] == []


def test_shared_sentence_stats_flags_boilerplate(spark):
    from gpi_etl_spark.operators.textstats import shared_sentence_stats

    footer = "All rights reserved."
    rows = [
        (1, f"Unique alpha text. {footer}"),
        (2, f"Different beta words! {footer}"),
        (3, "Totally original gamma."),
        # duplicate sentence WITHIN one doc counts once (distinct)
        (4, "Echo echo. Echo echo."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in shared_sentence_stats(df).collect()}
    assert (got[1].n_sentences, got[1].n_shared) == (2, 1)
    assert got[1].shared_ratio == 0.5
    assert (got[2].n_sentences, got[2].n_shared) == (2, 1)
    assert (got[3].n_sentences, got[3].n_shared) == (1, 0)
    assert (got[4].n_sentences, got[4].n_shared) == (1, 0)


def test_char_entropy_hand_computed(spark):
    import math

    from gpi_etl_spark.operators.textstats import char_entropy

    rows = [
        (1, "aaaa"),      # one symbol: entropy 0
        (2, "abab"),      # two equal symbols: ln 2
        (3, "abcd"),      # four equal symbols: ln 4
        (4, ""),          # empty: no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].entropy_r == 0.0 and got[1].n_chars == 4
    assert got[2].entropy_r == round(math.log(2), 6)
    assert got[3].entropy_r == round(math.log(4), 6)


def test_bm25_hand_computed(spark):
    """Two tiny docs, one query term — score checked against the
    closed-form Lucene-BM25 formula."""
    import math

    from gpi_etl_spark.operators.textstats import bm25_scores

    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "y z")], "doc_id long, text string"
    )
    got = {r.doc_id: r.bm25 for r in bm25_scores(docs, ("x",)).collect()}
    # N=2, df(x)=1, idf = ln((2-1+0.5)/(1+0.5)+1) = ln(2)
    # doc1: tf=2, dl=3, avgdl=2.5
    k1, b = 1.2, 0.75
    expect = math.log(2.0) * (2 * (k1 + 1)) / (
        2 + k1 * (1 - b + b * 3 / 2.5)
    )
    assert got.keys() == {1}
    assert abs(got[1] - expect) < 1e-12


def test_bm25_common_term_nonnegative(spark):
    """The +1 idf form keeps a term present in EVERY doc at a small
    positive weight instead of a negative one."""
    from gpi_etl_spark.operators.textstats import bm25_scores

    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "the dog"), (3, "the owl")],
        "doc_id long, text string",
    )
    got = bm25_scores(docs, ("the",)).collect()
    assert len(got) == 3 and all(r.bm25 > 0 for r in got)
