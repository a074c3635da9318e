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

    The first-50 slice must BE catalog._FIRST in order (the strong
    form, ADVICE r5), and the r10 rotation targets — all 19 bench
    headliners and the nine debt rows (the decontaminate_against_eval
    spill, the media_feature_extract_real changed-code re-attest, and
    the 7 never-attested r9 registrations) — must sit inside it so a
    future registration can't silently displace them.
    """
    from data_warehouse_migration_spark.catalog import _FIRST

    names = list(entry_mod.queries())
    assert names[:50] == list(_FIRST)
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
        # r10: the nine debt rows — the sanctioned r9 spill, the
        # changed-code re-attest (jpeg branch in _decode_real_asset),
        # and the 7 never-attested r9 registrations.
        "decontaminate_against_eval",
        "media_feature_extract_real",
        "quality_classifier_trained",
        "streaming_span_islands",
        "media_jpeg_decode",
        "media_jpeg_color_decode",
        "media_jpeg_420_decode",
        "decontaminate_substring_indexed",
        "span_islands_scrub",
    ]
    for name in pinned:
        assert names.index(name) < 50, f"{name} fell out of the driver window"


def test_all_queries_execute_smoke(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name
