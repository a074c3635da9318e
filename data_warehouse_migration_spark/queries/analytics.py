"""Analytics surface (SURVEY.md §2.4-2.7): aggregations, windows, sorts,
set operations, join variants. The reference's own aggregation surface
is thin (COUNT(*) verification, UNION ALL stats) — this module exposes
the full Spark surface the driver's oracle suite exercises, each shape
with its scale posture documented.

Exactness: every money aggregate goes through integer cents (see
catalog module docstring); sums are therefore order-independent and
bit-identical to DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_warehouse_migration_spark.catalog import cents, query, t

# ---------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape: the canonical scan→filter→groupBy
# partial/final aggregate. One shuffle on (returnflag, linestatus);
# map-side combine does nearly all the work (6 groups).
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    headline=True,
    tags=("A1", "A2", "P6"),
    oracle="""
SELECT
    l_returnflag,
    l_linestatus,
    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS sum_qty,
    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS sum_base_price,
    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
        AS DOUBLE) / 10000.0 AS sum_disc_price,
    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000)
        AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
    count(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    disc_price = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    charge = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        * 1000000
    ).cast("long")
    return (
        l.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents("l_quantity")).cast("double") / 100.0).alias("sum_qty"),
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0).alias(
                "sum_base_price"
            ),
            (F.sum(disc_price).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(charge).cast("double") / 1000000.0).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# star_revenue_by_nation — full star join (J7): fact ⋈ orders ⋈ customer ⋈
# nation ⋈ region with all dims broadcast; one shuffle for the final agg.
# ---------------------------------------------------------------------------


@query(
    "star_revenue_by_nation",
    headline=True,
    tags=("J2", "J7", "A1"),
    oracle="""
SELECT
    r.r_name AS region,
    n.n_name AS nation,
    count(*) AS n_lines,
    CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
        AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
)
def star_revenue_by_nation(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    line_rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(line_rev).cast("double") / 10000.0).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# rollup_revenue — GROUPING SETS surface (§2.4 "absent but exposed"):
# region → nation rollup with grand total.
# ---------------------------------------------------------------------------


@query(
    "rollup_revenue",
    tags=("A1", "rollup"),
    oracle="""
SELECT
    r.r_name AS region,
    n.n_name AS nation,
    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS total_sales
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def rollup_revenue(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg((F.sum(cents("o_totalprice")).cast("double") / 100.0).alias("total_sales"))
    )


# ---------------------------------------------------------------------------
# Window functions (§2.5): ranking, frames, lag/lead.
# ---------------------------------------------------------------------------


@query(
    "window_top_orders_per_customer",
    tags=("W", "O1"),
    oracle="""
SELECT o_custkey AS customer, o_orderkey AS order_key,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS total_price,
       rn AS rank_in_customer
FROM (
    SELECT *,
        row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
)
WHERE rn <= 3
""",
)
def window_top_orders_per_customer(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("customer"),
            F.col("o_orderkey").alias("order_key"),
            (cents("o_totalprice") / 100.0).alias("total_price"),
            F.col("rn").alias("rank_in_customer"),
        )
    )


@query(
    "window_running_revenue",
    tags=("W",),
    oracle="""
SELECT
    o_custkey AS customer,
    o_orderkey AS order_key,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
        AS running_total
FROM orders
""",
)
def window_running_revenue(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("customer"),
        F.col("o_orderkey").alias("order_key"),
        (F.sum(cents("o_totalprice")).over(w).cast("double") / 100.0).alias(
            "running_total"
        ),
    )


@query(
    "window_order_gaps",
    tags=("W",),
    oracle="""
SELECT
    o_custkey AS customer,
    o_orderkey AS order_key,
    datediff('day',
             lag(CAST(o_orderdate AS DATE))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             CAST(o_orderdate AS DATE))::INT AS days_since_prev
FROM orders
""",
)
def window_order_gaps(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
    d = F.to_date("o_orderdate")
    return o.select(
        F.col("o_custkey").alias("customer"),
        F.col("o_orderkey").alias("order_key"),
        F.datediff(d, F.lag(d).over(w)).alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# Join variants (§2.3 "Spark gives these for free"): semi / anti.
# ---------------------------------------------------------------------------


@query(
    "anti_join_customers_without_orders",
    tags=("J", "anti"),
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def anti_join_customers_without_orders(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "semi_join_suppliers_with_sales",
    tags=("J", "semi"),
    oracle="""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
""",
)
def semi_join_suppliers_with_sales(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem").select("l_suppkey")  # noqa: E741
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name", "s_acctbal"
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7): UNION ALL stats (the reference's verification
# shape, load_gold_data.sql:107-111), INTERSECT, EXCEPT.
# ---------------------------------------------------------------------------


@query(
    "union_table_stats",
    tags=("U2", "A1", "A2"),
    oracle="""
SELECT 'customer' AS table_name, count(*) AS n FROM customer
UNION ALL SELECT 'orders', count(*) FROM orders
UNION ALL SELECT 'lineitem', count(*) FROM lineitem
UNION ALL SELECT 'supplier', count(*) FROM supplier
""",
)
def union_table_stats(spark, sf_dir):
    parts = [
        t(spark, sf_dir, name).agg(
            F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n")
        )
        for name in ["customer", "orders", "lineitem", "supplier"]
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "setops_repeat_buyers",
    tags=("U", "intersect", "except"),
    oracle="""
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1996)
SELECT o_custkey AS customer, 'both_years' AS cohort
FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
UNION ALL
SELECT o_custkey, 'only_1995'
FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
""",
)
def setops_repeat_buyers(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    both = y95.intersect(y96).select(
        F.col("o_custkey").alias("customer"), F.lit("both_years").alias("cohort")
    )
    only95 = y95.exceptAll(y96).select(
        F.col("o_custkey").alias("customer"), F.lit("only_1995").alias("cohort")
    )
    return both.unionByName(only95)


# ---------------------------------------------------------------------------
# Top-k (O1) and distinct-aggregate surface.
# ---------------------------------------------------------------------------


@query(
    "topk_orders",
    tags=("O1",),
    oracle="""
SELECT o_orderkey AS order_key,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS total_price
FROM orders
ORDER BY total_price DESC, order_key
LIMIT 20
""",
)
def topk_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_orderkey").alias("order_key"),
            (cents("o_totalprice") / 100.0).alias("total_price"),
        )
        .orderBy(F.col("total_price").desc(), F.col("order_key"))
        .limit(20)
    )


@query(
    "agg_order_stats_by_status",
    tags=("A1", "distinct"),
    oracle="""
SELECT
    o_orderstatus AS status,
    count(*) AS n_orders,
    count(DISTINCT o_custkey) AS n_customers,
    CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS min_price,
    CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS max_price,
    round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
          / 100.0 / count(*), 6) AS avg_price
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_order_stats_by_status(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        (F.min(c).cast("double") / 100.0).alias("min_price"),
        (F.max(c).cast("double") / 100.0).alias("max_price"),
        F.round(F.sum(c).cast("double") / 100.0 / F.count(F.lit(1)), 6).alias(
            "avg_price"
        ),
    )


# ---------------------------------------------------------------------------
# Batch 2: CUBE / GROUPING SETS, ntile, deterministic arg-max.
# ---------------------------------------------------------------------------


@query(
    "cube_order_counts",
    tags=("A", "cube"),
    oracle="""
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_order_counts(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.cube(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        ).agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "grouping_sets_revenue",
    tags=("A", "grouping_sets"),
    oracle="""
SELECT c_mktsegment AS segment,
       year(o_orderdate)::INT AS order_year,
       grouping(c_mktsegment)::INT AS g_segment,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS total_sales
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (year(o_orderdate)::INT), ())
""",
)
def grouping_sets_revenue(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    j.createOrReplaceTempView("__gs_orders")
    # GROUPING SETS has no DataFrame-API form — SQL is the idiom.
    return spark.sql(
        """
        SELECT c_mktsegment AS segment,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(grouping(c_mktsegment) AS INT) AS g_segment,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS total_sales
        FROM __gs_orders
        GROUP BY GROUPING SETS ((c_mktsegment), (CAST(year(o_orderdate) AS INT)), ())
        """
    )


@query(
    "ntile_acctbal_quartiles",
    tags=("W", "ntile"),
    oracle="""
SELECT c_custkey, c_mktsegment AS segment,
       ntile(4) OVER (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal, c_custkey) AS quartile
FROM customer
""",
)
def ntile_acctbal_quartiles(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "argmax_order_per_status",
    tags=("A", "argmax"),
    oracle="""
SELECT o_orderstatus AS status,
       (max(CAST(round(o_totalprice * 100) AS BIGINT) * 10000000
            + o_orderkey) % 10000000)::BIGINT AS top_order_key,
       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT) * 10000000
            + o_orderkey) // 10000000 AS DOUBLE) / 100.0 AS top_price
FROM orders
GROUP BY o_orderstatus
""",
)
def argmax_order_per_status(spark, sf_dir):
    """Deterministic arg-max via a composite integer (price_cents·10^7 +
    orderkey): ties on price resolve to the highest key identically in
    both engines — unlike bare ``max_by``, whose tie choice is
    engine-dependent."""
    o = t(spark, sf_dir, "orders")
    composite = F.max(cents("o_totalprice") * 10_000_000 + F.col("o_orderkey"))
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        (composite % 10_000_000).alias("top_order_key"),
        (F.floor(composite / 10_000_000).cast("double") / 100.0).alias("top_price"),
    )


# ---------------------------------------------------------------------------
# Batch 3: pivot, exact percentiles, ordered array agg, subquery shapes.
# ---------------------------------------------------------------------------


@query(
    "pivot_status_by_segment",
    tags=("A", "pivot"),
    oracle="""
SELECT c_mktsegment AS segment,
       CAST(sum(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(round(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS DOUBLE) / 100.0 AS open_sales,
       CAST(sum(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(round(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS DOUBLE) / 100.0 AS fulfilled_sales,
       CAST(sum(CASE WHEN o_orderstatus = 'P'
                     THEN CAST(round(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS DOUBLE) / 100.0 AS pending_sales
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def pivot_status_by_segment(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pivoted = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.coalesce(F.sum(cents("o_totalprice")), F.lit(0)))
    )
    return pivoted.select(
        "segment",
        (F.col("O").cast("double") / 100.0).alias("open_sales"),
        (F.col("F").cast("double") / 100.0).alias("fulfilled_sales"),
        (F.col("P").cast("double") / 100.0).alias("pending_sales"),
    )


@query(
    "percentiles_by_segment",
    tags=("A", "percentile"),
    oracle="""
SELECT c_mktsegment AS segment,
       round(quantile_cont(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
                           / 100.0, 0.5), 6) AS median_acctbal,
       round(quantile_cont(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
                           / 100.0, 0.9), 6) AS p90_acctbal
FROM customer
GROUP BY c_mktsegment
""",
)
def percentiles_by_segment(spark, sf_dir):
    """EXACT percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``: linear interpolation over the sorted set, on
    exact-cents doubles). At 100 TB swap for ``percentile_approx``
    (t-digest, no global sort) and drop the oracle to rows-only."""
    c = t(spark, sf_dir, "customer")
    bal = (cents("c_acctbal").cast("double") / 100.0)
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.round(F.percentile(bal, F.lit(0.5)), 6).alias("median_acctbal"),
        F.round(F.percentile(bal, F.lit(0.9)), 6).alias("p90_acctbal"),
    )


@query(
    "array_agg_nations_per_region",
    tags=("A", "array"),
    oracle="""
SELECT r_name AS region,
       array_to_string(list(n_name ORDER BY n_name), ',') AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def array_agg_nations_per_region(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


_SUBQ_SQL = """
SELECT c_custkey, c_name,
       (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
           AS n_orders
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
"""


@query("correlated_subqueries", tags=("J", "subquery"), oracle=_SUBQ_SQL)
def correlated_subqueries(spark, sf_dir):
    """EXISTS + correlated scalar subquery — Catalyst decorrelates both
    into joins (left-semi + aggregated left join); the SQL text is the
    same for Spark and DuckDB."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SUBQ_SQL)


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join analytics (Q3 / Q5 / Q14 adapted to the driver
# tables). These exercise the join-ordering/broadcast surface at depth:
# selective dim filters first, facts shuffled once, all small sides
# broadcast — the plan shape that survives a 100× scale-up.
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    headline=True,
    tags=("J2", "J7", "O1"),
    oracle="""
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS DOUBLE) / 10000.0 AS revenue,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1998-07-01'
  AND CAST(l_shipdate AS DATE) > DATE '1998-07-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, orderdate, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: segment-filtered customers (broadcast) ⋈ orders ⋈
    lineitem, aggregate revenue per order, top-10. The customer filter
    is applied before the join so only the selective slice broadcasts;
    lineitem shuffles once on l_orderkey. Revenue summed in exact
    10^-4 units (cents × discount) for cross-engine hash equality."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-07-01")
    )
    l = t(spark, sf_dir, "lineitem").filter(  # noqa: E741
        F.to_date("l_shipdate") > F.lit("1998-07-01")
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    # No forced broadcasts: orders is fact-sized (broadcasting it would
    # not survive scale-up) and the filtered customer slice is left to
    # AQE, which auto-broadcasts it while small and degrades to a
    # shuffled hash join when it isn't.
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .agg((F.sum(rev).cast("double") / 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    tags=("J5", "J7"),
    oracle="""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS DOUBLE) / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1998-01-01'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: six-way join where customer and supplier must
    share a nation inside the filtered region. supplier/nation/region
    broadcast (tiny); orders date-filtered before joining; the only
    shuffles are lineitem⋈orders on orderkey, the orders⋈customer hash,
    and the final per-nation aggregation."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01"))
    ).select("o_orderkey", "o_custkey")
    l = t(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    nations = F.broadcast(
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg((F.sum(rev).cast("double") / 10000.0).alias("revenue"))
    )


@query(
    "q14_promo_revenue_share",
    tags=("J2", "A1", "F12"),
    oracle="""
SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS ship_month,
       round((100.0 * sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT) ELSE 0 END)::DOUBLE)
             / sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                   AS BIGINT))::DOUBLE, 6) AS promo_share_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
""",
)
def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share per ship month. part
    broadcasts; the conditional aggregate is exact-integer in 10^-4
    units with one double division (then round 6) at the very end, so
    the ratio hashes identically across engines."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("long"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            # F.trunc returns DATE (matches DuckDB's date_trunc-on-DATE);
            # F.date_trunc would emit TIMESTAMP and hash-mismatch.
            F.trunc(F.to_date("l_shipdate"), "month").alias("ship_month")
        )
        .agg(
            F.round(
                (100.0 * F.sum(promo).cast("double")) / F.sum(rev).cast("double"), 6
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "window_trailing_90d_revenue",
    tags=("W", "rangeBetween"),
    oracle="""
WITH o AS (
    SELECT o_orderkey, o_custkey,
           date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))::INT
               AS order_day,
           CAST(round(o_totalprice * 100) AS BIGINT) AS c
    FROM orders
)
SELECT o_orderkey, o_custkey, order_day,
       CAST(sum(c) OVER (PARTITION BY o_custkey ORDER BY order_day
                         RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 100.0 AS trailing_90d_total
FROM o
""",
)
def window_trailing_90d_revenue(spark, sf_dir):
    """RANGE frame (vs the ROWS frames elsewhere): per customer, total
    order value in the trailing 90 *days* — peers at the same day all
    contribute regardless of row order, so the result is deterministic
    without a row tie-break. Order key = epoch-day int (both engines
    frame identically over integers); money in exact cents."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "order_day"
        ),
        cents("o_totalprice").alias("__c"),
    )
    w = (
        Window.partitionBy("o_custkey").orderBy("order_day").rangeBetween(-90, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "order_day",
        (F.sum("__c").over(w).cast("double") / 100.0).alias("trailing_90d_total"),
    )


@query(
    "q13_order_distribution",
    tags=("J", "A1", "outer-join"),
    oracle="""
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
""",
)
def q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: customers-by-order-count histogram, keeping
    zero-order customers via the left outer join (count(o_orderkey)
    skips the NULLs a no-match row carries). Two shuffles: the join on
    custkey and the tiny histogram agg."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q18_large_orders",
    tags=("J", "A1", "having"),
    oracle="""
WITH big AS (
    SELECT l_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 9000
)
SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS total_price
FROM orders
JOIN big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 20
""",
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold (group-HAVING), then enriched with the customer. The
    HAVING aggregate runs first so only qualifying orderkeys join —
    a semi-join-shaped plan where the big lineitem table collapses to
    its group keys before touching orders."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(cents("l_quantity")).alias("__q"))
        .filter(F.col("__q") > 9000)
        .select("l_orderkey")
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            (cents("o_totalprice") / 100.0).alias("total_price"),
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(20)
    )


@query(
    "q10_returned_items",
    tags=("J2", "J7", "O1"),
    oracle="""
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS DOUBLE) / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most revenue last quarter.
    Both selective filters (quarter, returnflag) reach the scans;
    nation broadcasts; the group-by key space is per-customer (larger
    than q1's 6 groups — exercises real partial/final aggregation);
    top-20 plans as TakeOrderedAndProject, never a global sort."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01"))
    ).select("o_orderkey", "o_custkey")
    l = t(spark, sf_dir, "lineitem").filter(  # noqa: E741
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev).cast("double") / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q22_dormant_high_balance",
    tags=("J", "subquery", "anti-join"),
    oracle="""
WITH c AS (
    SELECT c_custkey, c_mktsegment,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal
    FROM customer
), s AS (
    SELECT sum(bal) AS tot, count(*) AS n FROM c WHERE bal > 0
)
SELECT c_mktsegment,
       count(*) AS n_cust,
       CAST(sum(bal) AS DOUBLE) / 100.0 AS total_bal
FROM c, s
WHERE c.bal * s.n > s.tot
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND CAST(o.o_orderdate AS DATE) >= DATE '1998-01-01')
GROUP BY c_mktsegment
""",
)
def q22_dormant_high_balance(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders. The global-average filter uses EXACT integer cross-
    multiplication (bal·n > total) instead of comparing against a
    floating average — a boundary row can't flip between engines. The
    NOT EXISTS is a left-anti join against the date-filtered orders."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", cents("c_acctbal").alias("bal")
    )
    stats = F.broadcast(
        c.filter(F.col("bal") > 0).agg(
            F.sum("bal").alias("tot"), F.count(F.lit(1)).alias("n")
        )
    )
    recent = t(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") >= F.lit("1998-01-01")
    ).select("o_custkey")
    return (
        c.crossJoin(stats)
        .filter(F.col("bal") * F.col("n") > F.col("tot"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (F.sum("bal").cast("double") / 100.0).alias("total_bal"),
        )
    )


@query(
    "q19_disjunctive_predicates",
    tags=("J2", "P6", "pushdown"),
    oracle="""
SELECT count(*) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 5 AND l_quantity <= 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 15 AND l_quantity <= 35)
""",
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    Catalyst distributes the disjunction: the l_quantity bounds common
    to both branches (5..35) push to the lineitem scan, the
    brand/size disjunction pushes to the part scan, and the mixed
    residual evaluates inside the join — no row survives to a filter
    stage that a scan could have dropped."""
    l = t(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 5)
        & (F.col("l_quantity") <= 25)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & (F.col("l_quantity") >= 15)
        & (F.col("l_quantity") <= 35)
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(rev).cast("double") / 10000.0).alias("revenue"),
        )
    )


@query(
    "window_analytics_suite",
    tags=("W", "analytic"),
    oracle="""
SELECT o_custkey AS customer, o_orderkey AS order_key,
       CAST(round(first_value(o_totalprice) OVER w * 100) AS BIGINT) / 100.0
           AS first_price,
       CAST(round(last_value(o_totalprice)
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) * 100)
           AS BIGINT) / 100.0 AS last_price,
       round(percent_rank() OVER
           (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6)
           AS pct_rank,
       round(cume_dist() OVER
           (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6)
           AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_analytics_suite(spark, sf_dir):
    """Analytic-function surface beyond ranking: first/last order value
    per customer (note last_value needs the full-partition frame — the
    default frame stops at CURRENT ROW and silently returns the
    current row's value) plus distribution functions with total
    orderings so both engines agree exactly."""
    o = t(spark, sf_dir, "orders")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_time.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("customer"),
        F.col("o_orderkey").alias("order_key"),
        (F.round(F.first("o_totalprice").over(w_time) * 100).cast("long") / 100.0)
        .alias("first_price"),
        (F.round(F.last("o_totalprice").over(w_full) * 100).cast("long") / 100.0)
        .alias("last_price"),
        F.round(F.percent_rank().over(w_price), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_price), 6).alias("cume"),
    )


@query(
    "q7_bi_nation_volume",
    tags=("J5", "J7", "A1"),
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(CAST(l_shipdate AS DATE)) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
""",
)
def q7_bi_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: trade volume between a nation pair in both
    directions, by ship year. The nation-pair disjunction evaluates
    after two broadcast nation joins (aliased dims joined twice — the
    role-playing-dimension pattern); supplier broadcasts; facts shuffle
    only on the two equi keys."""
    l = t(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).alias("l_year"),
        )
        .agg((F.sum(rev).cast("double") / 10000.0).alias("revenue"))
    )


@query(
    "q4_priority_with_late_lines",
    tags=("J", "semi-join", "A1"),
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) <  DATE '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
GROUP BY o_orderpriority
""",
)
def q4_priority_with_late_lines(spark, sf_dir):
    """TPC-H Q4 shape: orders (in a quarter window) having at least one
    line shipped after the order date — an EXISTS expressed as a
    left-semi join carrying a non-equi residual. The semi join emits
    each order at most once (no dedup stage), and lineitem contributes
    only its join columns to the shuffle."""
    o = t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-07-01"))
    )
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")  # noqa: E741
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.to_date("l_shipdate") > F.to_date("o_orderdate")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    tags=("A1", "P6", "pushdown"),
    oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
           AS DOUBLE) / 10000.0 AS revenue_delta,
       count(*) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: the pure scan-side query — every predicate
    (date range, discount band, quantity cap) pushes to the parquet
    scan, the aggregate is a single partial/final pair, and the whole
    thing is one stage + one 1-row exchange. The canary for pushdown
    regressions."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    rev = F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000).cast("long")
    return (
        l.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(rev).cast("double") / 10000.0).alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q15_top_supplier",
    tags=("J", "subquery", "argmax"),
    oracle="""
WITH rev AS (
    SELECT l_suppkey,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
               AS r
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) / 10000.0 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE r = (SELECT max(r) FROM rev)
""",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) achieving the global maximum
    quarterly revenue — aggregate once, compare each group against the
    scalar max (ties all kept, exact integer revenue so the equality
    cannot wobble). The 1-row max broadcasts; no second scan of
    lineitem."""
    l = t(spark, sf_dir, "lineitem").filter(  # noqa: E741
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
    )
    rev_amt = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    rev = l.groupBy("l_suppkey").agg(F.sum(rev_amt).alias("r"))
    mx = F.broadcast(rev.agg(F.max("r").alias("mx")))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(mx)
        .filter(F.col("r") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", (F.col("r").cast("double") / 10000.0).alias("total_revenue")
        )
    )


@query(
    "q11_important_parts",
    tags=("A1", "subquery", "having"),
    oracle="""
WITH pv AS (
    SELECT l_partkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS v
    FROM lineitem
    GROUP BY l_partkey
), tot AS (SELECT sum(v) AS t FROM pv)
SELECT l_partkey AS partkey, CAST(v AS DOUBLE) / 100.0 AS part_value
FROM pv, tot
WHERE v * 1200 > t
ORDER BY part_value DESC, partkey
""",
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose sales value exceeds 1/1200 of the
    global total — group totals compared to a broadcast grand total
    with exact integer cross-multiplication (v·1200 > t), so threshold
    membership is identical across engines."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    pv = l.groupBy("l_partkey").agg(F.sum(cents("l_extendedprice")).alias("v"))
    tot = F.broadcast(pv.agg(F.sum("v").alias("t")))
    return (
        pv.crossJoin(tot)
        .filter(F.col("v") * 1200 > F.col("t"))
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("v").cast("double") / 100.0).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


@query(
    "q17_small_quantity_revenue",
    tags=("J2", "subquery", "A1"),
    oracle="""
WITH pa AS (
    SELECT l_partkey AS pk,
           sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sq,
           count(*) AS n
    FROM lineitem GROUP BY 1
)
SELECT count(*) AS n_small_lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS total_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON pa.pk = l_partkey
WHERE p_brand = 'Brand#2'
  AND CAST(round(l_quantity * 100) AS BIGINT) * 5 * pa.n < pa.sq
""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from orders below 20% of the part's
    average quantity — the correlated-average subquery, decorrelated
    into a per-part aggregate joined back to the fact. The threshold
    compares exact integers (qty·5·n < sum), never a floating average,
    so boundary rows agree across engines. Per-part stats shuffle once
    on partkey and join back co-partitioned."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    pa = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(cents("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("n")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").select(
        "p_partkey"
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .filter(cents("l_quantity") * 5 * F.col("n") < F.col("sq"))
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0).alias(
                "total_revenue"
            ),
        )
    )


@query(
    "q8_market_share",
    tags=("J7", "A1", "F12"),
    oracle="""
SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
       round((100.0 * sum(CASE WHEN n1.n_name = 'NATION_1'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT) ELSE 0 END)::DOUBLE)
             / sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                   AS BIGINT))::DOUBLE, 6) AS nation1_share_pct,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
""",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of yearly revenue to
    customers in a region — conditional-ratio aggregation over the
    full six-table star with both nation roles. Exact 10^-4 integer
    sums, one double division at the end."""
    l = t(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = F.broadcast(
        n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    cust_nations = F.broadcast(
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
            F.col("n_nationkey").alias("n2_key")
        )
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    n1_rev = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
        F.lit(0).cast("long")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(cust_nations, F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year(F.to_date("o_orderdate")).alias("o_year"))
        .agg(
            F.round(
                (100.0 * F.sum(n1_rev).cast("double")) / F.sum(rev).cast("double"), 6
            ).alias("nation1_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Depth-suite completion: the six remaining TPC-H shapes (Q2, Q9, Q12,
# Q16, Q20, Q21), adapted to the testdata schema. The tables carry no
# partsupp / l_shipmode / l_commitdate / s_comment columns, so the
# supply relation derives from lineitem's (l_partkey, l_suppkey) pairs
# and "late" means shipped >60 days after the order date — the JOIN/
# subquery/aggregation SHAPES (what the optimizer has to handle) are
# the TPC-H ones; only the literal column feeds differ.
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    tags=("J5", "subquery", "argmin"),
    oracle="""
WITH ps AS (
    SELECT l_partkey, l_suppkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost
    FROM lineitem GROUP BY 1, 2
), eu AS (
    SELECT ps.l_partkey, ps.cost, s_acctbal, s_name, n_name
    FROM ps
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
), mn AS (SELECT l_partkey, min(cost) AS mc FROM eu GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey AS partkey, p_brand,
       CAST(eu.cost AS DOUBLE) / 100.0 AS supply_cost
FROM eu
JOIN mn ON eu.l_partkey = mn.l_partkey AND eu.cost = mn.mc
JOIN part ON eu.l_partkey = p_partkey
WHERE p_size = 4 AND p_type = 'ECONOMY'
ORDER BY s_acctbal DESC, n_name, s_name, partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: minimum-cost supplier per part within a region —
    the correlated-min subquery decorrelated into an aggregate + join
    (what Catalyst does to the real Q2). Supply cost per (part,
    supplier) derives from lineitem; exact integer cents make the
    min-equality join engine-stable. Dims broadcast; the only shuffles
    are the two part-keyed aggregations."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(cents("l_extendedprice")).alias("cost")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        ps.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "cost", "s_acctbal", "s_name", "n_name")
    )
    mn = eu.groupBy("l_partkey").agg(F.min("cost").alias("mc"))
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 4) & (F.col("p_type") == "ECONOMY")
    )
    return (
        eu.join(mn, "l_partkey")
        .filter(F.col("cost") == F.col("mc"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey").alias("partkey"),
            "p_brand",
            (F.col("cost").cast("double") / 100.0).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "partkey")
        .limit(100)
    )


@query(
    "q9_product_type_profit",
    tags=("J5", "J7", "A1"),
    oracle="""
SELECT n_name AS nation,
       year(CAST(o_orderdate AS DATE)) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
              - CAST(round(p_retailprice * l_quantity * 10000) AS BIGINT))
            AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation × order year over a
    part-name predicate — the 4-fact/dim join tree where join ORDER is
    the whole game. part (filtered, small) and the dims broadcast, so
    lineitem shuffles once on l_orderkey for the orders join. Cost side
    uses p_retailprice·quantity as the supply-cost stand-in (no
    partsupp table); both legs in exact integer 10^-4 units."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = t(spark, sf_dir, "nation")
    revenue = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    supply_cost = F.round(F.col("p_retailprice") * F.col("l_quantity") * 10000).cast(
        "long"
    )
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).alias("o_year"),
        )
        .agg(
            (F.sum(revenue - supply_cost).cast("double") / 10000.0).alias(
                "sum_profit"
            )
        )
    )


@query(
    "q12_late_line_priorities",
    tags=("J5", "A1", "conditional-agg"),
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60
  AND year(CAST(l_shipdate AS DATE)) = 1997
GROUP BY 1
""",
)
def q12_late_line_priorities(spark, sf_dir):
    """TPC-H Q12 shape: late shipments classified by order priority —
    join + two-way conditional aggregation (sum of CASE). "Late" means
    shipped >60 days after order date (no l_commitdate/l_receiptdate in
    this schema); l_returnflag stands in for l_shipmode. The year
    filter pushes to the lineitem scan; the residual late predicate
    evaluates after the single orderkey-shuffled join."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(F.year(F.to_date("l_shipdate")) == 1997)
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_part_counts",
    tags=("J4", "A1", "distinct", "anti"),
    oracle="""
WITH pairs AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY 1, 2, 3
""",
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    with a NOT IN supplier exclusion — expressed as a left-anti join
    (the scale-correct NOT IN when the subquery side is null-free).
    The supply relation is lineitem's distinct (part, supplier) pairs;
    the excluded set (acctbal < 1000 stands in for the comment LIKE)
    broadcasts. One shuffle for the pair-distinct, one for the
    count-distinct group."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7))
    )
    excluded = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        pairs.join(F.broadcast(excluded), "l_suppkey", "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_concentrated_shippers",
    tags=("J4", "subquery", "semi"),
    oracle="""
WITH bolt_parts AS (
    SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'
), pq AS (
    SELECT l_partkey, l_suppkey,
           sum(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1995
                    THEN CAST(round(l_quantity * 100) AS BIGINT)
                    ELSE 0 END) AS q95,
           sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qtot
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM bolt_parts)
    GROUP BY 1, 2
), qual AS (
    SELECT DISTINCT l_suppkey FROM pq WHERE 2 * q95 > qtot
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT l_suppkey FROM qual)
ORDER BY s_name
""",
)
def q20_concentrated_shippers(spark, sf_dir):
    """TPC-H Q20 shape: the nested IN-subquery chain (parts by name →
    qualifying (part, supplier) volumes → suppliers in one nation) as
    semi-joins. Qualification — more than half of a pair's lifetime
    quantity shipped in 1995 — uses exact integer cross-multiplication
    (2·q95 > qtot), never a float ratio. The part filter broadcasts
    into the lineitem scan; the qualifying-supplier set broadcasts into
    the supplier semi-join."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    bolt = t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%")).select(
        F.col("p_partkey").alias("l_partkey")
    )
    q = cents("l_quantity")
    pq = (
        l.join(F.broadcast(bolt), "l_partkey", "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.when(F.year(F.to_date("l_shipdate")) == 1995, q).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("q95"),
            F.sum(q).alias("qtot"),
        )
    )
    qual = (
        pq.filter(2 * F.col("q95") > F.col("qtot"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(qual), "s_suppkey", "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    tags=("J4", "subquery", "exists", "anti"),
    oracle="""
WITH enriched AS (
    SELECT l_orderkey, l_suppkey,
           CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60 AS late
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
), order_stats AS (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
    FROM enriched GROUP BY 1
), late_pairs AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM enriched WHERE late
)
SELECT s_name, count(*) AS numwait
FROM late_pairs
JOIN order_stats USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    orders. The EXISTS (another supplier in the order) / NOT EXISTS
    (another LATE supplier) pair is decorrelated into one per-order
    aggregate — n_supp > 1 ∧ n_late = 1 — the same rewrite engines
    apply, but explicit, so the plan is two orderkey-shuffled
    aggregates and a broadcast supplier join instead of two correlated
    re-scans of lineitem. "Late" = shipped >60 days after order date
    (no l_receiptdate in this schema); o_orderstatus = 'F' keeps the
    finished-orders filter of the original."""
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    enriched = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)
        ).alias("late"),
    )
    order_stats = enriched.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    late_pairs = enriched.filter("late").select("l_orderkey", "l_suppkey").distinct()
    s = t(spark, sf_dir, "supplier")
    return (
        late_pairs.join(order_stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "ohlc_hourly_candlesticks",
    tags=("timeseries", "resample", "ohlc"),
    oracle="""
WITH e AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           CAST(round(value * 100) AS BIGINT) AS cents,
           ts, event_id
    FROM events
), r AS (
    SELECT event_type, bucket, cents,
           row_number() OVER (PARTITION BY event_type, bucket
                              ORDER BY ts, event_id) AS rn_f,
           row_number() OVER (PARTITION BY event_type, bucket
                              ORDER BY ts DESC, event_id DESC) AS rn_l
    FROM e
)
SELECT event_type, bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       max(CASE WHEN rn_f = 1 THEN cents END) / 100.0 AS open,
       max(cents) / 100.0 AS high,
       min(cents) / 100.0 AS low,
       max(CASE WHEN rn_l = 1 THEN cents END) / 100.0 AS close,
       CAST(sum(cents) AS BIGINT) / 100.0 AS total
FROM r GROUP BY 1, 2
""",
)
def ohlc_hourly_candlesticks(spark, sf_dir):
    """OHLC candlestick downsampling — the time-series resample every
    monitoring/finance stack ships (TimescaleDB candlestick_agg /
    ClickHouse-style first/last buckets): per (event_type, hour),
    open/close by total (ts, event_id) arrival order plus high/low/
    volume. First/last are computed with rank windows rather than
    min_by/max_by so the tie-break is explicit and engine-portable
    (composite-key arg_min semantics differ across engines).

    Scale: ONE shuffle on the (type, bucket) composite via the two
    rank windows sharing a partitioning; high/low/total are algebraic
    (map-side combined). At 100 TB, buckets are bounded (types ×
    hours), per-bucket sort is bounded by in-bucket event count —
    the same posture as sessionize. All money through exact cents."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        cents("value").alias("cents"),
        "ts",
        "event_id",
    )
    wf = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wl = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = ev.withColumn("rn_f", F.row_number().over(wf)).withColumn(
        "rn_l", F.row_number().over(wl)
    )
    return r.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.when(F.col("rn_f") == 1, F.col("cents"))) / 100.0).alias("open"),
        (F.max("cents") / 100.0).alias("high"),
        (F.min("cents") / 100.0).alias("low"),
        (F.max(F.when(F.col("rn_l") == 1, F.col("cents"))) / 100.0).alias("close"),
        (F.sum("cents") / 100.0).alias("total"),
    )


@query(
    "cohort_weekly_retention",
    tags=("timeseries", "cohort", "retention"),
    oracle="""
WITH e AS (
    SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
), first AS (
    SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1
), act AS (
    SELECT DISTINCT f.cohort_wk, e.user_id,
           CAST(date_diff('day', f.cohort_wk, e.wk) // 7 AS INT) AS week_offset
    FROM e JOIN first f USING (user_id)
), size_ AS (
    SELECT cohort_wk, count(*) AS cohort_size FROM first GROUP BY 1
)
SELECT a.cohort_wk, a.week_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(max(s.cohort_size) AS BIGINT) AS cohort_size,
       round(count(*) / CAST(max(s.cohort_size) AS DOUBLE), 6) AS retention
FROM act a JOIN size_ s USING (cohort_wk)
GROUP BY 1, 2
""",
)
def cohort_weekly_retention(spark, sf_dir):
    """Weekly cohort retention matrix — THE product-analytics query:
    users grouped by first-activity week, per (cohort, week-offset)
    distinct active users and retention fraction. Two shuffles (first-
    seen per user, then the cohort-offset distinct count); the matrix
    is (weeks × offsets)-sized — driver-tiny however many events.
    ISO-Monday week truncation and integer day//7 offsets are
    identical across engines; retention is a ratio of exact counts."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    act = (
        ev.join(first, "user_id")
        .select(
            "cohort_wk",
            "user_id",
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    size = first.groupBy("cohort_wk").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        act.join(size, "cohort_wk")
        .groupBy("cohort_wk", "week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.max("cohort_size").alias("cohort_size"),
            F.round(
                F.count(F.lit(1)) / F.max("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )


ANOMALY_Z_ORACLE = """
WITH h AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1, 2
), stats AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(cents) AS BIGINT) AS s1,
           sum(CAST(cents AS HUGEINT) * cents) AS s2
    FROM h GROUP BY 1
), z AS (
    SELECT h.event_type, h.bucket, h.cents, s.n_buckets,
           round((h.cents - CAST(s.s1 AS DOUBLE) / s.n_buckets)
                 / sqrt(CAST(s.s2 AS DOUBLE) / s.n_buckets
                        - (CAST(s.s1 AS DOUBLE) / s.n_buckets)
                          * (CAST(s.s1 AS DOUBLE) / s.n_buckets)), 6) AS zscore
    FROM h JOIN stats s USING (event_type)
)
SELECT event_type, bucket, cents / 100.0 AS hourly_total, zscore
FROM z WHERE abs(zscore) >= 2.5
"""


@query(
    "hourly_anomaly_zscores",
    tags=("timeseries", "anomaly", "monitoring"),
    oracle=ANOMALY_Z_ORACLE,
)
def hourly_anomaly_zscores(spark, sf_dir):
    """Volume-anomaly detection: per event type, hourly revenue totals
    scored against the type's own distribution (population z-score);
    emit the |z| ≥ 2.5 outliers a monitoring pipeline would page on.
    All moments through exact integer cents (s1, s2 are
    order-independent integer sums — the catalog rule applied to
    variance); the only floats are the final identical divisions/sqrt,
    rounded to 6, with the threshold comparing the ROUNDED score.
    Two shuffles: hourly totals (map-side combined), then a per-type
    1-row stats join against the bucket table (types-sized)."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        cents("value").alias("c"),
    )
    h = ev.groupBy("event_type", "bucket").agg(F.sum("c").alias("cents"))
    stats = h.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("cents").alias("s1"),
        # Σcents² squares bucket AGGREGATES, so int64 wraps at
        # H·B² ≈ 2^63 (a $10M-revenue hour over a decade of buckets)
        # — and DuckDB's BIGINT multiply RAISES where Spark silently
        # wraps. decimal(38,0)/HUGEINT accumulation keeps both engines
        # exact to 10^38; the variance division casts to double below
        # exactly as before.
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "s2"
        ),
    )
    mean = F.col("s1").cast("double") / F.col("n_buckets")
    var = F.col("s2").cast("double") / F.col("n_buckets") - mean * mean
    z = F.round((F.col("cents") - mean) / F.sqrt(var), 6)
    return (
        h.join(stats, "event_type")
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= 2.5)
        .select(
            "event_type",
            "bucket",
            (F.col("cents") / 100.0).alias("hourly_total"),
            "zscore",
        )
    )


@query(
    "equidepth_bucketizer",
    tags=("features", "binning", "quantiles"),
    oracle="""
WITH v AS (
    SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), vc AS (
    SELECT cents, count(*) AS c FROM v GROUP BY 1
), r AS (
    SELECT cents,
           sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER () AS n
    FROM vc
), edges AS (
    SELECT min(CASE WHEN cum >= CAST(floor(n * 0.25) AS BIGINT) THEN cents END) AS e1,
           min(CASE WHEN cum >= CAST(floor(n * 0.50) AS BIGINT) THEN cents END) AS e2,
           min(CASE WHEN cum >= CAST(floor(n * 0.75) AS BIGINT) THEN cents END) AS e3
    FROM r
), binned AS (
    SELECT CASE WHEN cents <= e1 THEN 0
                WHEN cents <= e2 THEN 1
                WHEN cents <= e3 THEN 2
                ELSE 3 END AS bucket,
           cents
    FROM v CROSS JOIN edges
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       min(cents) / 100.0 AS lo, max(cents) / 100.0 AS hi
FROM binned GROUP BY 1
""",
)
def equidepth_bucketizer(spark, sf_dir):
    """Equi-depth (quartile) feature binning — train-then-apply like
    MLlib's QuantileDiscretizer but with EXACT edges, deterministic
    and engine-portable: the rank-⌊n·q⌋ element equals the smallest
    value whose cumulative count reaches ⌊n·q⌋, so training runs on
    the AGGREGATED (value, count) table — shuffle and window are
    bounded by the value DOMAIN (≤ distinct cents), never by the row
    count, the key_skew_profile posture (whitelisted bounded global
    window). Apply = a 1-row edge broadcast into a pure Column CASE —
    zero shuffle on the 100 TB side. Output: per-bucket row counts +
    actual value ranges."""
    from pyspark.sql import Window

    v = t(spark, sf_dir, "events").select(
        "event_id", cents("value").alias("cents")
    )
    vc = v.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    r = vc.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("n", F.sum("c").over(Window.partitionBy()))
    edges = r.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.floor(F.col("n") * F.lit(q)).cast("long"),
                    F.col("cents"),
                )
            ).alias(f"e{i}")
            for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    binned = v.crossJoin(F.broadcast(edges)).select(
        F.when(F.col("cents") <= F.col("e1"), 0)
        .when(F.col("cents") <= F.col("e2"), 1)
        .when(F.col("cents") <= F.col("e3"), 2)
        .otherwise(3)
        .alias("bucket"),
        "cents",
    )
    return binned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.min("cents") / 100.0).alias("lo"),
        (F.max("cents") / 100.0).alias("hi"),
    )


@query(
    "welch_t_event_values",
    tags=("stats", "ab-test"),
    oracle="""
WITH m AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
           sum(CAST(round(value * 100) AS HUGEINT)
               * CAST(round(value * 100) AS BIGINT)) AS s2
    FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1
), w AS (
    SELECT max(CASE WHEN event_type = 'click' THEN n END) AS na,
           max(CASE WHEN event_type = 'click' THEN s1 END) AS sa1,
           max(CASE WHEN event_type = 'click' THEN s2 END) AS sa2,
           max(CASE WHEN event_type = 'purchase' THEN n END) AS nb,
           max(CASE WHEN event_type = 'purchase' THEN s1 END) AS sb1,
           max(CASE WHEN event_type = 'purchase' THEN s2 END) AS sb2
    FROM m
)
SELECT na, nb,
       round((CAST(sa1 AS DOUBLE) / na) / 100, 6) AS mean_a,
       round((CAST(sb1 AS DOUBLE) / nb) / 100, 6) AS mean_b,
       round((CAST(sa1 AS DOUBLE) / na - CAST(sb1 AS DOUBLE) / nb)
             / sqrt((CAST(sa2 AS DOUBLE) / na
                     - (CAST(sa1 AS DOUBLE) / na) * (CAST(sa1 AS DOUBLE) / na))
                        / (na - 1)
                    + (CAST(sb2 AS DOUBLE) / nb
                       - (CAST(sb1 AS DOUBLE) / nb) * (CAST(sb1 AS DOUBLE) / nb))
                        / (nb - 1)), 6)
           AS t_stat
FROM w
""",
)
def welch_t_event_values(spark, sf_dir):
    """Two-sample Welch t-statistic for value differences between two
    event populations — the A/B-test primitive, computed entirely from
    exact integer moments (n, Σx, Σx² per group; the anomaly-monitor
    rule applied to inference). Each Welch term s²/n collapses
    to population-variance/(n−1) — one division from the moments; all
    divisions/sqrt identical IEEE on both engines, rounded to 6. One map-side-combined shuffle
    to TWO rows; the statistic is a 1-row fold. (The p-value lookup is
    a client-side table — a t CDF is not portable SQL.)"""
    m = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", cents("value").alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s1"),
            # Σc² in decimal(38,0)/HUGEINT: int64 wraps past ~10⁹
            # high-value events per arm (c² ≈ 10¹⁰ each) — and the
            # engines disagree on wrap (Spark wraps, DuckDB raises)
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
        )
    )
    pick = lambda et, col: F.max(F.when(F.col("event_type") == et, F.col(col)))
    w = m.agg(
        pick("click", "n").alias("na"),
        pick("click", "s1").alias("sa1"),
        pick("click", "s2").alias("sa2"),
        pick("purchase", "n").alias("nb"),
        pick("purchase", "s1").alias("sb1"),
        pick("purchase", "s2").alias("sb2"),
    )
    ma = F.col("sa1").cast("double") / F.col("na")
    mb = F.col("sb1").cast("double") / F.col("nb")
    # Welch term s²/n = (sample var)/n = (population var)·n/(n−1)/n
    # = population var / (n−1): one division, no cancellation games.
    va = (F.col("sa2").cast("double") / F.col("na") - ma * ma) / (
        F.col("na") - 1
    )
    vb = (F.col("sb2").cast("double") / F.col("nb") - mb * mb) / (
        F.col("nb") - 1
    )
    return w.select(
        "na",
        "nb",
        F.round(ma / 100, 6).alias("mean_a"),
        F.round(mb / 100, 6).alias("mean_b"),
        F.round((ma - mb) / F.sqrt(va + vb), 6).alias("t_stat"),
    )


@query(
    "bitmap_distinct_rollup",
    tags=("bitmap", "distinct", "rollup", "exact"),
    oracle="""
WITH e AS (
    SELECT event_type, CAST(ts AS DATE) AS day, user_id FROM events
), daily AS (
    SELECT event_type, day, count(DISTINCT user_id) AS d FROM e GROUP BY 1, 2
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(d.d) AS BIGINT) AS sum_daily_distinct,
       CAST(t.total AS BIGINT) AS distinct_users_total
FROM daily d
JOIN (SELECT event_type, count(DISTINCT user_id) AS total
      FROM e GROUP BY 1) t USING (event_type)
GROUP BY d.event_type, t.total
""",
)
def bitmap_distinct_rollup(spark, sf_dir):
    """Exact distinct-user rollup via bitmaps
    (operators/bitmaps.py, the ClickHouse groupBitmap pattern): per
    (type, day) bitmap words are built ONCE from events, then the
    cross-day total comes from a ``bit_or`` UNION of the stored daily
    words — no second scan of events, no approximation. The gate
    output (per-day distinct sums vs the merged exact total) is
    checked against plain COUNT(DISTINCT) recomputation, attesting
    that popcount-over-words ≡ true distinct and that the word-level
    union deduplicates across days exactly — the continuous-aggregate
    story HLL can only approximate, for dense integer id spaces.

    Scale: one (type, day, word) shuffle over events; merges and
    cardinalities touch only word tables (≤ keyspace/64 rows per
    group). Sparse/64-bit ids → roaring containers, same plan."""
    from data_warehouse_migration_spark.operators.bitmaps import (
        bitmap_cardinality,
        bitmap_merge,
        key_bitmap,
    )

    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily_bm = key_bitmap(ev, ["event_type", "day"], "user_id")
    daily = bitmap_cardinality(daily_bm, ["event_type", "day"])
    total = bitmap_cardinality(
        bitmap_merge(daily_bm.drop("day"), ["event_type"]), ["event_type"]
    ).withColumnRenamed("n_distinct", "distinct_users_total")
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n_distinct").alias("sum_daily_distinct"),
        )
        .join(total, "event_type")
    )


@query(
    "bitmap_distinct_roaring",
    tags=("bitmap", "roaring", "distinct", "sparse", "exact"),
    oracle="""
WITH u AS (
    SELECT DISTINCT event_type, CAST(user_id AS BIGINT) AS user_id FROM events
), keyed AS (
    SELECT event_type, 'dense' AS keyspace, user_id AS k FROM u
    UNION ALL
    SELECT event_type, 'sparse', user_id * 100003 + 17 FROM u
), c AS (
    SELECT event_type, keyspace, k // 65536 AS container,
           count(DISTINCT k) AS card
    FROM keyed GROUP BY 1, 2, 3
)
SELECT event_type, keyspace,
       CAST(sum(card) AS BIGINT) AS n_distinct,
       CAST(count(*) AS BIGINT) AS n_containers,
       CAST(sum(CASE WHEN card <= 8 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_array_containers,
       CAST(sum(CASE WHEN card > 8 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bitmap_containers
FROM c GROUP BY 1, 2
""",
)
def bitmap_distinct_roaring(spark, sf_dir):
    """Roaring-container exact distinct (operators/bitmaps.py; Chambi
    et al. 2016) — the packing that keeps bitmap rollups cheap when
    ids are NOT dense surrogates (VERDICT r6 #6): the same user set is
    counted through TWO key spaces, the dense surrogate ids and a
    sparse injective spread (``user_id·100003 + 17`` — distinct counts
    are invariant under an injective map, which is exactly what the
    gate attests). Dense keys pack into few high-occupancy BITMAP
    containers; the sparse spread (key spacing > the 2^16 container
    width) lands one value per container and packs into 2-byte ARRAY
    slots — the output exposes the per-keyspace container census
    (count, kind split) next to the exact distinct total, all
    value-attested against a SQL re-derivation of the container
    structure.

    The gate runs with ``array_cutoff=8`` so BOTH container kinds
    materialize at test scale (per-type dense cardinality is 15 at
    sf0.001); production uses the format's published 4096 break-even
    (``ROARING_ARRAY_CUTOFF``) — the cutoff only moves the
    array/bitmap boundary, never the counts, which the
    pack↔unpack↔merge equivalence property tests pin separately.

    Scale: one map-side-combined (group, word) shuffle over events +
    one container-keyed aggregation over the WORD table; every
    container payload is bounded (≤ cutoff array slots / 1024 words),
    so no per-group state grows with the corpus."""
    from data_warehouse_migration_spark.operators.bitmaps import (
        roaring_bitmap,
    )

    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("long").alias("user_id")
    )
    keyed = ev.select(
        "event_type", F.lit("dense").alias("keyspace"), F.col("user_id").alias("k")
    ).unionByName(
        ev.select(
            "event_type",
            F.lit("sparse").alias("keyspace"),
            (F.col("user_id") * 100003 + 17).alias("k"),
        )
    )
    bm = roaring_bitmap(keyed, ["event_type", "keyspace"], "k", array_cutoff=8)
    return bm.groupBy("event_type", "keyspace").agg(
        F.sum("card").cast("long").alias("n_distinct"),
        F.count(F.lit(1)).cast("long").alias("n_containers"),
        F.sum(F.when(F.col("kind") == "array", 1).otherwise(0))
        .cast("long")
        .alias("n_array_containers"),
        F.sum(F.when(F.col("kind") == "bitmap", 1).otherwise(0))
        .cast("long")
        .alias("n_bitmap_containers"),
    )


@query(
    "mann_kendall_trend",
    tags=("stats", "trend", "monitoring"),
    oracle="""
WITH d AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1, 2
), pairs AS (
    SELECT a.event_type,
           CASE WHEN b.cents > a.cents THEN 1
                WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
    FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day
), agg AS (
    SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1
)
SELECT event_type, s_stat, n_pairs,
       round(CAST(s_stat AS DOUBLE) / n_pairs, 6) AS kendall_tau
FROM agg
""",
)
def mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall trend statistic per event type over the DAILY
    revenue series — the nonparametric drift detector monitoring
    pipelines run on KPI series (S = Σ sign(x_j − x_i) over ordered
    day pairs; τ = S / n_pairs). The pair join runs on the AGGREGATED
    per-day table — |days|² pairs per type, bounded by the calendar,
    never by event count — after one map-side-combined daily rollup.
    All integers until the final τ division (exact cents; sign is
    integer), so the oracle recomputes bit-for-bit."""
    d = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            cents("value").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("cents"))
    )
    a = d.select("event_type", F.col("day").alias("da"), F.col("cents").alias("ca"))
    b = d.select("event_type", F.col("day").alias("db"), F.col("cents").alias("cb"))
    pairs = a.join(b, "event_type").filter(F.col("da") < F.col("db"))
    sgn = (
        F.when(F.col("cb") > F.col("ca"), 1)
        .when(F.col("cb") < F.col("ca"), -1)
        .otherwise(0)
    )
    return (
        pairs.select("event_type", sgn.alias("sgn"))
        .groupBy("event_type")
        .agg(
            F.sum("sgn").cast("long").alias("s_stat"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .withColumn(
            "kendall_tau",
            F.round(F.col("s_stat").cast("double") / F.col("n_pairs"), 6),
        )
    )


@query(
    "benford_first_digit_audit",
    tags=("quality", "forensics", "distribution"),
    oracle="""
WITH d AS (
    SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                1, 1) AS INT) AS digit
    FROM orders WHERE o_totalprice > 0
), c AS (
    SELECT digit, count(*) AS n FROM d GROUP BY 1
), tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
SELECT c.digit, CAST(c.n AS BIGINT) AS n,
       round(c.n / CAST(tot.total AS DOUBLE), 6) AS observed_freq,
       round(log10(1.0 + 1.0 / c.digit), 6) AS benford_freq,
       round(c.n / CAST(tot.total AS DOUBLE)
             - log10(1.0 + 1.0 / c.digit), 6) AS deviation
FROM c CROSS JOIN tot
""",
)
def benford_first_digit_audit(spark, sf_dir):
    """Benford's-law first-digit audit of order totals — the
    data-forensics screen for fabricated or truncated monetary data
    (naturally occurring multi-magnitude amounts follow
    P(d) = log10(1 + 1/d); synthetic uniform generators — like this
    fixture's — visibly don't, which the deviation column shows).
    First digit extracted from the EXACT cents integer's decimal
    string (no float log shortcuts); one 9-group aggregation + a
    1-row total broadcast; frequencies and the Benford reference are
    identical IEEE on both engines, rounded 6."""
    d = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(cents("o_totalprice").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("total"))
    obs = F.col("n") / F.col("total").cast("double")
    ref = F.log10(1.0 + 1.0 / F.col("digit"))
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed_freq"),
        F.round(ref, 6).alias("benford_freq"),
        F.round(obs - ref, 6).alias("deviation"),
    )


@query(
    "gini_revenue_concentration",
    tags=("stats", "inequality", "distribution"),
    oracle="""
WITH r AS (
    SELECT c_nationkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY o_custkey, c_nationkey
), ranked AS (
    SELECT c_nationkey, cents,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY cents, c_nationkey) AS i,
           count(*) OVER (PARTITION BY c_nationkey) AS n,
           sum(cents) OVER (PARTITION BY c_nationkey) AS s
    FROM r
)
SELECT c_nationkey,
       CAST(max(n) AS BIGINT) AS n_customers,
       CAST(max(s) AS BIGINT) AS total_cents,
       round(2.0 * sum(CAST(i AS HUGEINT) * cents)
             / (CAST(max(n) AS DOUBLE) * max(s))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM ranked GROUP BY 1
""",
)
def gini_revenue_concentration(spark, sf_dir):
    """Gini coefficient of per-customer revenue within each nation —
    the concentration/inequality measure a marketplace-health or
    data-balance report carries (0 = equal spend, →1 = one whale).
    Computed from the exact rank formula G = 2·Σ(i·xᵢ)/(n·Σx) −
    (n+1)/n over ascending-sorted integer cents — Σ(i·xᵢ) is an exact
    integer sum, the only floats are the final identical divisions.
    Per-nation rank windows run on the AGGREGATED per-customer table
    (customers-per-nation rows, not order rows)."""
    from pyspark.sql import Window

    r = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_custkey", "c_nationkey")
        .agg(F.sum(cents("o_totalprice")).alias("cents"))
    )
    w = Window.partitionBy("c_nationkey")
    ranked = (
        r.withColumn(
            "i",
            F.row_number().over(
                Window.partitionBy("c_nationkey").orderBy("cents", "c_nationkey")
            ),
        )
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s", F.sum("cents").over(w))
    )
    return ranked.groupBy("c_nationkey").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.max("s").cast("long").alias("total_cents"),
        F.round(
            2.0
            # Σ(i·xᵢ) in decimal(38,0)/HUGEINT: the rank-weighted sum
            # grows ~n²·x̄/2 per nation and wraps int64 around 10⁷
            # customers — the second-moment overflow rule
            * F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents"))
            / (F.max("n").cast("double") * F.max("s"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


@query(
    "rolling_weekly_active_users",
    tags=("bitmap", "distinct", "rolling", "timeseries"),
    oracle="""
WITH e AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), days AS (SELECT DISTINCT day FROM e),
win AS (
    SELECT d.day, e.user_id
    FROM days d JOIN e
      ON e.day <= d.day AND e.day >= d.day - INTERVAL 6 DAY
)
SELECT day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS wau
FROM win GROUP BY 1
""",
)
def rolling_weekly_active_users(spark, sf_dir):
    """Rolling 7-day distinct users (WAU) — THE query that forces
    either approximate sketches or bitmap sets at scale, because
    COUNT(DISTINCT) does not decompose over sliding windows: here the
    per-day bitmaps (operators/bitmaps.py) are built ONCE from events,
    each day's words are replicated to the ≤7 window-end days they
    serve (explode of a 7-element day sequence — constant fan-out),
    and every window is a bit_or fold + popcount — EXACT, no rescan of
    events per window, no approximation. The oracle recomputes each
    window's COUNT(DISTINCT) naively, attesting the fold-over-window
    algebra end to end.

    Scale: events are scanned once into per-day word tables (≤
    keyspace/64 rows/day); the rolling union shuffles (day, word)
    pairs with a 7× constant fan-out — independent of event count."""
    from data_warehouse_migration_spark.operators.bitmaps import (
        bitmap_cardinality,
        key_bitmap,
    )

    ev = t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily = key_bitmap(ev, ["day"], "user_id")
    days = ev.select("day").distinct()
    contrib = daily.select(
        F.explode(
            F.expr("sequence(day, date_add(day, 6))")
        ).alias("win_day"),
        "word_idx",
        "word",
    ).join(days.withColumnRenamed("day", "win_day"), "win_day")
    rolled = contrib.groupBy("win_day", "word_idx").agg(
        F.expr("cast(bit_or(word) as long)").alias("word")
    )
    return bitmap_cardinality(rolled, ["win_day"]).select(
        F.col("win_day").alias("day"), F.col("n_distinct").alias("wau")
    )
