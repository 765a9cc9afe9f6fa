"""Multinomial Naive Bayes, trained and scored inside the engine.

The second trained-in-engine classifier next to the logistic model
(operators/logreg.py, q193): where logreg fits dense cheap features by
gradient descent, NB is the counting classifier for sparse token
features — training IS one groupBy, so a 100 TB corpus trains in a
single shuffle and the "model" is a (class, token) count table that
stays distributed. The reference app has no model training at all (its
ML surface is the blob-loaded scoring model, SURVEY §2 U1); both
trainers are greenfield scale components.

Cross-engine exactness contract: every log-probability is quantized to
integer micro-nats (``floor(ln(p)·1e6 + 0.5)`` as int64) the moment it
is computed, so document scores are INTEGER sums — order-independent,
overflow-safe (a 10⁶-token document stays under 2⁵³ micro-nats), and
bit-identical in the DuckDB oracle. The only float that ever exists is
the single ``ln`` per (class, token) pair, a transcendental whose 6-dp
bucket both engines agree on (the q97/q120 convention). Unseen tokens
cost the Laplace floor ``lp0 = q6(ln(1/(T_c + V)))``, folded in
arithmetically (``n_tokens·lp0`` plus sparse deltas) so scoring needs
only an equi-join on the token — no dense (doc × class × vocab)
materialization anywhere.

Bounded model state: per-class totals, priors and the vocabulary size
cross the driver (one row per class — the k-means/BPE contract); the
(class, token) conditional table never does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _q6ln(x) -> F.Column:
    """ln(x) quantized to int64 micro-nats (6-dp floor-scale)."""
    return F.floor(F.log(x) * 1_000_000 + F.lit(0.5)).cast("long")


def nb_train(
    train: DataFrame,
    class_col: str,
    tokens_col: str,
    id_col: str = "doc_id",
) -> dict:
    """Fit multinomial NB with Laplace (add-one) smoothing.

    ``train`` holds one row per document with a class label and an
    array<string> token column. Returns a model dict:

    * ``cond`` — DataFrame ``(class, token, dlp)`` where ``dlp`` is the
      micro-nat ADVANTAGE of a seen (class, token) pair over that
      class's unseen floor: ``q6ln((c+1)/(T_c+V)) − lp0_c``. Sparse —
      only observed pairs — and distributed.
    * ``classes`` — sorted class labels (list).
    * ``prior`` / ``lp0`` — dicts class → int micro-nats (collected:
      bounded model state, one row per class).
    * ``vocab_size`` — distinct training tokens (int).
    """
    tok = train.select(
        F.col(class_col).alias("_cls"),
        F.explode(tokens_col).alias("_tok"),
    )
    vocab_size = int(tok.select("_tok").distinct().count())
    cond_counts = tok.groupBy("_cls", "_tok").agg(
        F.count(F.lit(1)).alias("_c")
    )
    n_docs = train.count()
    stats = (
        train.groupBy(F.col(class_col).alias("_cls"))
        .agg(F.count(F.lit(1)).alias("_d"))
        .join(
            tok.groupBy("_cls").agg(F.count(F.lit(1)).alias("_t")),
            "_cls",
            "left",
        )
        .fillna(0, subset=["_t"])
        .select(
            "_cls",
            "_t",
            _q6ln(F.col("_d") / F.lit(float(n_docs))).alias("_prior"),
            _q6ln(
                F.lit(1.0) / (F.col("_t") + F.lit(vocab_size)).cast("double")
            ).alias("_lp0"),
        )
        .collect()
    )
    prior = {r["_cls"]: int(r["_prior"]) for r in stats}
    lp0 = {r["_cls"]: int(r["_lp0"]) for r in stats}
    t_by_cls = {r["_cls"]: int(r["_t"]) for r in stats}
    lp0_map = F.create_map(
        *[x for c, v in lp0.items() for x in (F.lit(c), F.lit(v))]
    )
    t_map = F.create_map(
        *[x for c, v in t_by_cls.items() for x in (F.lit(c), F.lit(v))]
    )
    cond = cond_counts.select(
        "_cls",
        "_tok",
        (
            _q6ln(
                (F.col("_c") + 1)
                / (
                    F.element_at(t_map, F.col("_cls")) + F.lit(vocab_size)
                ).cast("double")
            )
            - F.element_at(lp0_map, F.col("_cls"))
        ).alias("_dlp"),
    )
    return {
        "cond": cond,
        "classes": sorted(prior),
        "prior": prior,
        "lp0": lp0,
        "vocab_size": vocab_size,
    }


def nb_predict(
    test: DataFrame,
    model: dict,
    tokens_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against every class and pick the argmax.

    ``score(d, c) = prior_c + n_d·lp0_c + Σ_{seen (c,tok)} dlp`` — all
    int64 micro-nats, so the argmax is exact and the deterministic tie
    break (smaller class label wins) can never flake on a float ulp.
    The sparse sum is ONE equi-join on the token (fan-out = classes
    that actually saw the token); the dense (doc × class) grid comes
    from exploding the literal class list — bounded model state, no
    nested-loop join. Returns ``(id, predicted, score)`` per document;
    documents with empty token arrays fall back to the prior argmax.
    """
    classes = model["classes"]
    prior_map = F.create_map(
        *[x for c in classes for x in (F.lit(c), F.lit(model["prior"][c]))]
    )
    lp0_map = F.create_map(
        *[x for c in classes for x in (F.lit(c), F.lit(model["lp0"][c]))]
    )
    toks = test.select(
        F.col(id_col).alias("_id"), F.explode(tokens_col).alias("_tok")
    )
    sparse = (
        toks.join(model["cond"], toks["_tok"] == model["cond"]["_tok"])
        .groupBy("_id", "_cls")
        .agg(F.sum("_dlp").alias("_s"))
    )
    grid = test.select(
        F.col(id_col).alias("_id"),
        # NULL token arrays behave like empty ones (F.size(NULL) is
        # NULL and would poison the score into NULL for every class)
        F.coalesce(F.size(tokens_col), F.lit(0)).cast("long").alias("_n"),
        F.explode(F.array(*[F.lit(c) for c in classes])).alias("_cls"),
    )
    scored = (
        grid.join(sparse, ["_id", "_cls"], "left")
        .select(
            "_id",
            "_cls",
            (
                F.element_at(prior_map, F.col("_cls"))
                + F.col("_n") * F.element_at(lp0_map, F.col("_cls"))
                + F.coalesce(F.col("_s"), F.lit(0))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("score").desc(), F.col("_cls").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("_cls").alias("predicted"),
            F.col("score").alias("score_micronats"),
        )
    )
