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

    Pin the parity core, bench headliners, and this round's rotation
    targets inside that window so a future registration can't silently
    displace them.
    """
    names = list(entry_mod.queries())
    pinned = [
        # parity core
        "jde_silver_clean",
        "dim_date",
        "scd2_customer_versions",
        "pit_fact_attribution",
        "star_topk_orders",
        # bench headliners
        "q1_pricing_summary",
        "star_revenue_by_nation",
        "q3_shipping_priority",
        # round-5 rotation targets (ROTATION.md r5): the 12-query r4
        # attestation backlog, the five new round-5 queries, the
        # changed-code re-attests, and the r2-stale set rotated back.
        "doc_perplexity_filter",
        "dedup_exact",
        "repetition_quality_flags",
        "pii_redaction_stats",
        "bigram_lm_scores",
        "embedding_label_centroids",
        "chunk_documents_overlap",
        "approx_percentiles_by_segment",
        "duplicate_span_pairs",
        "curation_pipeline_v2",
        "streaming_session_windows",
        "streaming_dedup_counts",
        "sliding_event_windows",
        "streaming_user_totals_final",
        "deterministic_shard_manifest",
        "duplicate_span_removal",
        "curation_pipeline_v3",
        "streaming_interval_join",
        "media_feature_extract_real",
        "simhash_fingerprints",
        "doc_fingerprint_winnow",
        "distinct_users_by_type",
        "word_frequency_topk",
        "higher_order_token_stats",
        "gapfill_daily_event_counts",
        "deterministic_split_documents",
        "dataset_mix_by_lang",
        "eval_sample_per_lang",
        "funnel_click_to_purchase",
    ]
    for name in pinned:
        assert names.index(name) < 50, f"{name} fell out of the driver window"


def test_all_queries_execute_smoke(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name
