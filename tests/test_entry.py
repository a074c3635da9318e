"""Driver-contract smoke tests: entry() returns rows; every query runs
at sf0.001; oracle keys ⊆ query keys."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25


def test_attestation_window_membership():
    """The driver attests the first 50 registry entries (ROTATION.md).

    The window prefix must BE catalog._FIRST in order (the strong
    form, ADVICE r5), the FULL _WINDOW_R14 tuple must sit inside the
    first 50 (the containment form, ADVICE r10 #2 — so a future
    registration can't silently displace a gate), and the r14
    rotation targets — all 19 bench headliners, the new lz4 gate,
    the changed-code voids (codec/harness hardening + the seven
    tokenizer migrations), and the rotation refresh — are pinned by
    name.
    """
    from data_warehouse_migration_spark.catalog import _FIRST, _WINDOW_R14

    names = list(entry_mod.queries())
    assert len(_FIRST) <= 50  # == 50 once the round's registrations land
    assert names[: len(_FIRST)] == list(_FIRST)
    assert set(_WINDOW_R14) <= set(names[:50]), (
        set(_WINDOW_R14) - set(names[:50])
    )
    pinned = [
        # parity core
        "jde_silver_clean",
        "dim_date",
        "scd2_customer_versions",
        "pit_fact_attribution",
        "star_topk_orders",
        # all 19 bench headliners (incl. the two late-r6 promotions)
        "q1_pricing_summary",
        "star_revenue_by_nation",
        "q3_shipping_priority",
        "dedup_ngram_jaccard",
        "text_quality",
        "similarity_topk",
        "sessionize_events",
        "dedup_embedding_cosine",
        "continuous_aggregate_rollup",
        "training_data_pipeline",
        "doc_perplexity_filter",
        "duplicate_span_pairs",
        "curation_pipeline_v2",
        "curation_pipeline_v3",
        "semdedup_embeddings",
        "containment_quote_pairs",
        # r14: the new gate (VERDICT r13 action #1)
        "lz4_text_archive",
        # r14: changed-code voids — zstd dictionary/strictness/
        # seekable work, the ADVICE r13 output budgets and PAX
        # fixes, and the seven tokenizer migrations that empty
        # SCALE.md's deferred list
        "zst_text_archive",
        "warc_ingest_extract",
        "crawl_ingest_quarantine",
        "webdataset_shard_roundtrip",
        "tfidf_top_terms",
        "chunk_documents_overlap",
        "temperature_mix_weights",
        "weighted_doc_sample",
        "spearman_length_vs_novelty",
        "quantile_normalize_lengths",
        "corpus_diversity_profile",
        # r14: rotation refresh — the oldest standing rows (r1)
        "q17_small_quantity_revenue",
        "q18_large_orders",
        "q19_disjunctive_predicates",
        "q22_dormant_high_balance",
        "agg_order_stats_by_status",
        "anti_join_customers_without_orders",
        "argmax_order_per_status",
        "array_agg_nations_per_region",
        "correlated_subqueries",
        "cube_order_counts",
        "grouping_sets_revenue",
    ]
    for name in pinned:
        assert names.index(name) < 50, f"{name} fell out of the driver window"


def test_all_queries_execute_smoke(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name
