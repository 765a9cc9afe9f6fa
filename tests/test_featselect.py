"""Chi-square token–label selection: statistic vs a pure-Python 2×2
replay, support filtering, tie-deterministic top-k, and presence (not
frequency) semantics."""

from __future__ import annotations

import math


def _chi2(a, b, n, p):
    c, d = p - a, (n - p) - b
    diff = a * d - b * c
    num = float(n) * float(diff) * float(diff)
    den = float(a + b) * float(c + d) * float(a + c) * float(b + d)
    return math.floor(num / den * 1e6 + 0.5) / 1e6


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, y int")


def test_chi2_matches_python_replay(spark):
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.featselect import chi2_token_label

    # 'pos' appears in all 4 positive docs, none of the 4 negatives;
    # 'both' appears everywhere (chi2 = 0); 'neg' only in negatives.
    rows = [
        (i, "pos both filler%d" % i, 1) for i in range(4)
    ] + [
        (i + 4, "neg both filler%d" % i, 0) for i in range(4)
    ]
    out = chi2_token_label(
        _docs(spark, rows), label=F.col("y") == 1, min_support=1, k=10
    ).collect()
    by_tok = {r["token"]: r for r in out}
    assert by_tok["pos"]["n_pos"] == 4 and by_tok["pos"]["n_neg"] == 0
    assert by_tok["pos"]["chi2_r"] == _chi2(4, 0, 8, 4) == 8.0
    assert by_tok["both"]["chi2_r"] == 0.0
    # perfectly-associated tokens outrank the uninformative one
    ranked = [r["token"] for r in out]
    assert ranked.index("pos") < ranked.index("both")
    assert ranked.index("neg") < ranked.index("both")


def test_chi2_presence_not_frequency(spark):
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.featselect import chi2_token_label

    # repeating a token within one doc must not change its counts
    rows = [(0, "x x x x y", 1), (1, "y", 0)]
    out = chi2_token_label(
        _docs(spark, rows), label=F.col("y") == 1, min_support=1, k=10
    ).collect()
    by_tok = {r["token"]: r for r in out}
    assert by_tok["x"]["n_pos"] == 1 and by_tok["x"]["n_neg"] == 0


def test_chi2_min_support_filters(spark):
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.featselect import chi2_token_label

    rows = [(0, "rare common", 1), (1, "common", 0), (2, "common", 1)]
    out = chi2_token_label(
        _docs(spark, rows), label=F.col("y") == 1, min_support=2, k=10
    ).collect()
    assert {r["token"] for r in out} == {"common"}


def test_chi2_topk_tiebreak_token_asc(spark):
    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.featselect import chi2_token_label

    # four tokens with identical tables -> identical chi2; k=2 must
    # keep the lexicographically first two
    rows = [(0, "aa bb cc dd", 1), (1, "ee", 0)]
    out = chi2_token_label(
        _docs(spark, rows), label=F.col("y") == 1, min_support=1, k=2
    ).collect()
    assert [r["token"] for r in out] == ["aa", "bb"]


def test_mutual_info_perfect_and_independent(spark):
    """MI hits ln 2 for a token that exactly determines a balanced
    label, and ~0 for one independent of it; scores are non-negative
    (MI is a KL divergence — float error bounded by the 6-dp round)."""
    import math

    from pyspark.sql import functions as F

    from gpi_etl_spark.operators.featselect import mutual_info_token_label

    rows = []
    for i in range(40):
        pos = i < 20
        text = ("hit " if pos else "miss ") + "common filler"
        rows.append((i, text, "en" if pos else "fr"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.token: r.mi_r
        for r in mutual_info_token_label(
            df, label=F.col("lang") == "en", min_support=5, k=10
        ).collect()
    }
    assert abs(got["hit"] - round(math.log(2.0), 6)) < 1e-9
    assert abs(got["miss"] - round(math.log(2.0), 6)) < 1e-9
    assert got["common"] == 0.0 and got["filler"] == 0.0
    assert all(v >= 0.0 for v in got.values())
