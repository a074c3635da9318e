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
    form, ADVICE r5), the FULL _WINDOW_R13 tuple must sit inside the
    first 50 (the containment form, ADVICE r10 #2 — so a future
    registration can't silently displace a gate), and the r13
    rotation targets — all 19 bench headliners, the 5-row debt
    drain, the changed-code voids, the two new gates, and the
    rotation refresh — are pinned by name.
    """
    from data_warehouse_migration_spark.catalog import _FIRST, _WINDOW_R13

    names = list(entry_mod.queries())
    assert len(_FIRST) <= 50  # == 50 once the round's registrations land
    assert names[: len(_FIRST)] == list(_FIRST)
    assert set(_WINDOW_R13) <= set(names[:50]), (
        set(_WINDOW_R13) - set(names[:50])
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
        # r13: the 5-row debt drain (VERDICT r12 action #2) — the
        # r12 second-wave registrations, whose modules also carry
        # the ADVICE r12 hardening.
        "bz2_text_archive",
        "media_tiff_decode",
        "wikidump_extract",
        "tfrecord_shard_roundtrip",
        "xz_text_archive",
        # r13: changed-code voids (Content-Encoding legs, the
        # content-coding quarantine legs, PAX/GNU shard legs, and
        # the three Unicode-tokenizer migrations)
        "warc_ingest_extract",
        "crawl_ingest_quarantine",
        "webdataset_shard_roundtrip",
        "token_stats",
        "higher_order_token_stats",
        "bigram_lm_scores",
        # r13: new gates (zstd rung, warm-curation composition)
        "zst_text_archive",
        "streaming_crawl_warm_curation",
        # r13: rotation refresh — the oldest standing rows (r1)
        "q4_priority_with_late_lines",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q7_bi_nation_volume",
        "q8_market_share",
        "q10_returned_items",
        "q11_important_parts",
        "q13_order_distribution",
        "q14_promo_revenue_share",
        "q15_top_supplier",
    ]
    for name in pinned:
        assert names.index(name) < 50, f"{name} fell out of the driver window"


def test_all_queries_execute_smoke(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name
