"""Bucketed co-located joins: the write pre-shuffles so the join plan
contains NO Exchange on either side — the 100 TB fact⋈fact strategy."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.sources.writers import write_bucketed


def test_bucketed_join_is_shuffle_free(spark, tmp_path, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "b_orders", 8, "o_orderkey", path=str(tmp_path / "b_orders")
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", 8, "o_orderkey", path=str(tmp_path / "b_lineitem"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is still correct
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucket_scan_prunes_with_equality_predicate(spark, tmp_path, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(orders, "b_orders2", 8, "o_orderkey",
                   path=str(tmp_path / "b_orders2"))
    # The planner turns OFF bucketed scans when no join/agg benefits;
    # force it on so the filter-only scan exercises bucket pruning.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        one = spark.table("b_orders2").filter(F.col("o_orderkey") == 7)
        plan = one._jdf.queryExecution().executedPlan().toString()
        # Bucket pruning shows as "SelectedBucketsCount: 1 out of 8".
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
        spark.sql("DROP TABLE IF EXISTS b_orders2")


def test_join_degrades_to_sort_merge_without_broadcast(spark, sf_dir):
    """With broadcast disabled, the equi-join plans as a sort-merge
    join — the strategy a fact-to-fact join takes at 100 TB when
    neither side fits memory (both sides shuffle-partitioned on the
    key, then merged sorted runs; spills instead of OOM)."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
