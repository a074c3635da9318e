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
    form, ADVICE r5), the FULL _WINDOW_R12 tuple must sit inside the
    first 50 (the containment form, ADVICE r10 #2 — so a future
    registration can't silently displace a gate), and the r12
    rotation targets — all 19 bench headliners, the 20-row debt
    drain, and the three new gates — are pinned by name.
    """
    from data_warehouse_migration_spark.catalog import _FIRST, _WINDOW_R12

    names = list(entry_mod.queries())
    assert len(_FIRST) <= 50  # == 50 once the round's registrations land
    assert names[: len(_FIRST)] == list(_FIRST)
    assert set(_WINDOW_R12) <= set(names[:50]), (
        set(_WINDOW_R12) - set(names[:50])
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
        # r12: the 20-row debt drain (VERDICT r11 action #2) — the
        # two r11 voids plus the 18 out-of-window r11 registrations.
        "media_feature_extract_real",
        "gopher_quality_rules",
        "curation_pipeline_v6",
        "curation_pipeline_v7",
        "curation_pipeline_v8",
        "html_text_extract",
        "url_canonicalize",
        "warc_ingest_extract",
        "robots_policy_check",
        "pdf_text_extract",
        "mime_message_extract",
        "mbox_thread_extract",
        "zip_bundle_roundtrip",
        "webdataset_shard_roundtrip",
        "media_flac_decode",
        "media_video_frame_sample",
        "media_audio_containers",
        "media_feature_extract_containers",
        "media_jpeg_exif_orientation",
        "streaming_crawl_ingest",
        # r12: new gates (quarantine ×2, warm-start)
        "media_decode_quarantine",
        "crawl_ingest_quarantine",
        "streaming_quality_warmstart",
    ]
    for name in pinned:
        assert names.index(name) < 50, f"{name} fell out of the driver window"


def test_all_queries_execute_smoke(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name
