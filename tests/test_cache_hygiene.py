"""Operator cache hygiene (VERDICT r6 #3): a session composing the
formerly-persisting operators back-to-back, WITHOUT any
``clearCache()``, must leave the CacheManager exactly as it found it.
The reuse the persists bought is served leak-free instead: the
consumers re-expand the identical subtree, whose shuffles the engine
dedupes at runtime via ReusedExchange (A/B at sf0.1 put the persists
inside host noise once exchange reuse is accounted)."""

from __future__ import annotations

from data_warehouse_migration_spark.catalog import REGISTRY


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_composed_operators_leave_no_cached_blocks(spark, sf_dir):
    assert _cache_manager_empty(spark), "test precondition: cache dirty"
    for name in (
        "dedup_ngram_jaccard",
        "duplicate_span_pairs",
        "curation_pipeline_v3",
    ):
        REGISTRY[name].spark_fn(spark, sf_dir).collect()
        assert _cache_manager_empty(spark), (
            f"{name} left blocks in the CacheManager — a long-lived "
            "session composing operators would accumulate them"
        )


def test_opt_in_storage_level_is_honored(spark, sf_dir):
    """The explicit opt-in still works — and the caller-owned release
    returns the manager to empty."""
    from pyspark import StorageLevel

    from data_warehouse_migration_spark.catalog import t
    from data_warehouse_migration_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = t(spark, sf_dir, "documents").limit(50)
    out = ngram_jaccard_pairs(
        docs, threshold=0.8, storage_level=StorageLevel.MEMORY_ONLY
    )
    out.collect()
    assert not _cache_manager_empty(spark)
    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)
