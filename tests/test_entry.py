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
        # round-4 rotation targets (ROTATION.md r4): the q12 re-attest,
        # the six re-oracled gates, the rotated-in functions surface,
        # and the new streaming attestation query.
        "q12_late_line_priorities",
        "approx_distinct_users",
        "similarity_lsh_topk",
        "similarity_ivf_topk",
        "similarity_pq_topk",
        "similarity_ivf_pq_topk",
        "embedding_kmeans",
        "string_functions",
        "date_functions",
        "json_extract_events",
        "math_functions",
        "map_functions_surface",
        "unpivot_order_measures",
        "histogram_order_values",
        "window_analytics_suite",
        "streaming_tumbling_hourly",
    ]
    for name in pinned:
        assert names.index(name) < 50, f"{name} fell out of the driver window"


def test_all_queries_execute_smoke(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.limit(1).count() >= 0, name
