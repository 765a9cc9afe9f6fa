"""Co-occurrence mining: distinct-item pair counts within baskets.

Market-basket affinity for warehouse data, term/entity co-occurrence
for corpus data — same operator. The pair generation is BASKET-LOCAL
(array expressions inside one row, no self-join): a basket of n items
yields its C(n,2) pairs without ever shuffling the basket twice, so
the cluster-wide cost is one groupBy(basket) + one groupBy(pair) —
versus the self-join formulation whose shuffle carries every (basket,
item) row twice and whose join explodes skewed baskets server-side.
Basket size bounds the quadratic term locally (cap upstream if a
pathological basket can hold thousands of items).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """Count, for every unordered item pair, the number of baskets
    containing BOTH (each basket counts once — items are deduplicated
    per basket, pairs ordered ``a < b`` by the items' natural sort).

    Returns ``(item_a, item_b, n_baskets)``.
    """
    from gpi_etl_spark.functions.hof import let_

    baskets = (
        df.groupBy(basket_col)
        .agg(F.array_sort(F.collect_set(item_col)).alias("_it"))
        # singleton baskets contribute no pairs; dropping them first
        # keeps the pair expression total (sequence(0, n-2) would run
        # BACKWARDS for n < 2) and the operator item-type-generic
        .filter(F.size("_it") >= 2)
    )
    pairs = let_(
        F.col("_it"),
        lambda it: F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.size(it) - 2),
                lambda i: F.transform(
                    F.slice(it, i + 2, F.size(it)),
                    lambda b: F.struct(
                        F.element_at(it, i + 1).alias("item_a"),
                        b.alias("item_b"),
                    ),
                ),
            )
        ),
    )
    return (
        baskets.select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.item_a"), F.col("_p.item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )


def pmi_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Pointwise mutual information over basket co-occurrence:
    ``pmi(a,b) = ln( n_ab · N / (n_a · n_b) )`` with document (basket)
    frequencies as the marginals — the collocation / related-term
    signal (terms that co-occur far above chance). Positive = attract,
    negative = repel.

    Built on :func:`cooccurrence_pairs` (basket-local pair
    generation), two broadcastable marginal joins and a one-row
    basket-count broadcast (the scalar-subquery pattern). Every count
    is an exact integer; only the final log is floating point, rounded
    to 6 dp.

    Returns ``(item_a, item_b, n_ab, n_a, n_b, pmi_r)``.
    """
    pairs = cooccurrence_pairs(df, basket_col, item_col).filter(
        F.col("n_baskets") >= min_pair_count
    )
    marg = (
        df.select(basket_col, item_col)
        .distinct()
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    total = (
        df.select(basket_col).distinct().agg(
            F.count(F.lit(1)).alias("_n")
        )
    )
    a = marg.select(
        F.col(item_col).alias("item_a"), F.col("_df").alias("n_a")
    )
    b = marg.select(
        F.col(item_col).alias("item_b"), F.col("_df").alias("n_b")
    )
    return (
        pairs.withColumnRenamed("n_baskets", "n_ab")
        .join(a, "item_a")
        .join(b, "item_b")
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.col("_n")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi_r"),
        )
    )
