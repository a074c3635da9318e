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
    form, ADVICE r5), the FULL _WINDOW_R11 tuple must sit inside the
    first 50 (the containment form, ADVICE r10 #2 — so a future
    registration can't silently displace a gate), and the r11
    rotation targets — all 19 bench headliners, the 16-row debt
    drain, and the changed-code re-attests — are pinned by name.
    """
    from data_warehouse_migration_spark.catalog import _FIRST, _WINDOW_R11

    names = list(entry_mod.queries())
    assert len(_FIRST) <= 50  # == 50 once the round's registrations land
    assert names[: len(_FIRST)] == list(_FIRST)
    assert set(_WINDOW_R11) <= set(names[:50]), (
        set(_WINDOW_R11) - set(names[:50])
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
        # r11: the 16-row debt drain (VERDICT r10 action #2).
        "temperature_mix_weights",
        "contamination_overlap_scores",
        "bitmap_distinct_rollup",
        "rolling_weekly_active_users",
        "heavy_hitters_cms",
        "media_resize_real",
        "ohlc_hourly_candlesticks",
        "cohort_weekly_retention",
        "dataset_card_summary",
        "rag_retrieval_pipeline",
        "curation_pipeline_v4",
        "streaming_rolling_wau",
        "bitmap_distinct_roaring",
        "streaming_semdedup_ingest",
        "streaming_ingest_dedup",
        "streaming_rollup_maintenance",
        # r11: changed-code re-attests (Unicode migration, BPE oracle
        # fix, PNG sub-byte depths).
        "bpe_merge_training",
        "bpe_apply_token_counts",
        "word_frequency_topk",
        "doc_token_entropy",
        "media_png_decode",
        # r11: new gates
        "quality_classifier_sgd_training",
        "media_jpeg_progressive_decode",
    ]
    for name in pinned:
        assert names.index(name) < 50, f"{name} fell out of the driver window"


def test_all_queries_execute_smoke(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name
