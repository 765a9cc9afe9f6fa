"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
(plus the north-star dedup/similarity/text/multimodal ops) for the
driver's DuckDB hash-match gate. Implementations live in
``gpi_etl_spark.queries`` (one (DataFrame fn, oracle SQL) pair per
operator family).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gpi_etl_spark import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return Q.REGISTRY["q01_pricing_summary"][0](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query. Since round 7 EVERY
    registered query carries an oracle: the former hash-based
    omissions (minhash/simhash/fingerprint) run the cross-engine poly
    hash mode, the BPE loop replays via unrolled merge CTEs, and the
    last two rows-only entries were retired (q49, superseded by the
    gated q176/q179/q212 ANN chain) or replaced by a replayable
    sketch (q51 → q221 k-min-registers). Round 11 retired
    q251_decimal_probe: its r10 driver row (rows/schema match, hash
    mismatch on six constant decimal literals) completed the planned
    experiment confirming the driver-side DECIMAL canonicalization as
    the historical q211/q233/q237 divergence layer; the registry-wide
    no-decimal-output invariant lives on in
    tests/test_no_decimal_gate.py with an empty whitelist."""
    return Q.oracles()
