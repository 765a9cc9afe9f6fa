import math

from pyspark.sql import functions as F

from gpi_etl_spark.operators import nbayes


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, cls, text.split()) for i, (cls, text) in enumerate(rows)],
        "doc_id bigint, lang string, toks array<string>",
    )


def test_nb_hand_checked_counts(spark):
    # train: 2 spam docs (4 tokens), 1 ham doc (2 tokens), vocab = 4
    train = _docs(
        spark,
        [
            ("spam", "buy now"),
            ("spam", "buy pills"),
            ("ham", "hello friend"),
        ],
    )
    m = nbayes.nb_train(train, "lang", "toks")
    assert m["vocab_size"] == 5  # buy now pills hello friend
    assert m["classes"] == ["ham", "spam"]

    def q6(x):
        return math.floor(math.log(x) * 1_000_000 + 0.5)

    assert m["prior"]["spam"] == q6(2 / 3)
    assert m["prior"]["ham"] == q6(1 / 3)
    # spam: T=4, V=5 -> lp0 = ln(1/9); buy has c=2 -> ln(3/9)
    assert m["lp0"]["spam"] == q6(1 / 9)
    cond = {
        (r["_cls"], r["_tok"]): r["_dlp"] for r in m["cond"].collect()
    }
    assert cond[("spam", "buy")] == q6(3 / 9) - q6(1 / 9)
    assert cond[("ham", "hello")] == q6(2 / 7) - q6(1 / 7)

    # score a doc by hand: "buy hello" against spam
    test = _docs(spark, [("?", "buy hello")])
    pred = nbayes.nb_predict(test, m, "toks").collect()[0]
    spam_score = q6(2 / 3) + q6(3 / 9) + q6(1 / 9)  # buy seen, hello not
    ham_score = q6(1 / 3) + q6(1 / 7) + q6(2 / 7)  # hello seen, buy not
    assert pred.predicted == ("spam" if spam_score > ham_score else "ham")
    assert pred.score_micronats == max(spam_score, ham_score)


def test_nb_learns_class_conditional_vocabulary(spark):
    # two classes with mostly-disjoint vocabularies + shared noise
    import random

    rng = random.Random(3)
    a_words = [f"alpha{i}" for i in range(20)]
    b_words = [f"beta{i}" for i in range(20)]
    noise = [f"common{i}" for i in range(10)]
    rows = []
    for k in range(200):
        cls = "a" if k % 2 == 0 else "b"
        pool = (a_words if cls == "a" else b_words) * 3 + noise
        rows.append((cls, " ".join(rng.choice(pool) for _ in range(30))))
    df = _docs(spark, rows).withColumn(
        "fold", F.pmod(F.col("doc_id"), F.lit(5))
    )
    train, test = df.filter("fold <> 0"), df.filter("fold = 0")
    m = nbayes.nb_train(train, "lang", "toks")
    pred = nbayes.nb_predict(test, m, "toks")
    joined = test.select(
        "doc_id", F.col("lang").alias("truth")
    ).join(pred, "doc_id")
    rowsc = joined.collect()
    acc = sum(r.truth == r.predicted for r in rowsc) / len(rowsc)
    assert acc > 0.95, acc


def test_nb_empty_doc_falls_back_to_prior(spark):
    train = _docs(
        spark,
        [("big", "x y"), ("big", "x z"), ("big", "y z"), ("small", "q r")],
    )
    m = nbayes.nb_train(train, "lang", "toks")
    test = spark.createDataFrame(
        [(99, [])], "doc_id bigint, toks array<string>"
    )
    pred = nbayes.nb_predict(test, m, "toks").collect()
    assert len(pred) == 1 and pred[0].predicted == "big"


def test_nb_deterministic_under_repartition(spark):
    import random

    rng = random.Random(11)
    rows = [
        (rng.choice(["a", "b", "c"]),
         " ".join(rng.choice(["t%d" % j for j in range(40)])
                  for _ in range(12)))
        for _ in range(120)
    ]
    df = _docs(spark, rows)
    m1 = nbayes.nb_train(df, "lang", "toks")
    m2 = nbayes.nb_train(df.repartition(13), "lang", "toks")
    assert m1["prior"] == m2["prior"] and m1["lp0"] == m2["lp0"]
    p1 = sorted(nbayes.nb_predict(df, m1, "toks").collect())
    p2 = sorted(
        nbayes.nb_predict(df.repartition(7), m2, "toks").collect()
    )
    assert p1 == p2


def test_nb_null_token_array_falls_back_to_prior(spark):
    train = _docs(
        spark,
        [("big", "x y"), ("big", "x z"), ("big", "y z"), ("small", "q r")],
    )
    m = nbayes.nb_train(train, "lang", "toks")
    test = spark.createDataFrame(
        [(99, None)], "doc_id bigint, toks array<string>"
    )
    pred = nbayes.nb_predict(test, m, "toks").collect()
    assert len(pred) == 1 and pred[0].predicted == "big"
    assert pred[0].score_micronats is not None
