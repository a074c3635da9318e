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
        # round-6 rotation targets (ROTATION.md r6): the 11-query
        # never-driver-attested r5 tail, the two new round-6 queries,
        # the changed-code re-attests voided by the r6 Jaccard
        # verification refactor, and the oldest displaced r4 greens.
        "doc_perplexity_filter",
        "duplicate_span_pairs",
        "curation_pipeline_v2",
        "curation_pipeline_v3",
        "dynamic_gap_sessions",
        "hll_sketch_rollup",
        "similarity_filtered_topk",
        "weighted_doc_sample",
        "vector_ops_surface",
        "corpus_drift_kl",
        "zorder_locality_manifest",
        "incremental_span_removal",
        "streaming_dynamic_gap_sessions",
        "streaming_sliding_halfhour",
        "streaming_ewma_final",
        "shard_manifest_chunked",
        "streaming_corpus_drift_kl",
        "dedup_minhash_lsh",
        "dedup_incremental_batch",
        "dedup_clusters",
        "q12_late_line_priorities",
        "string_functions",
        "date_functions",
        "json_extract_events",
        "math_functions",
        "map_functions_surface",
        "unpivot_order_measures",
        "histogram_order_values",
        "window_analytics_suite",
    ]
    for name in pinned:
        assert names.index(name) < 50, f"{name} fell out of the driver window"


def test_all_queries_execute_smoke(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name
