"""Scalar-function surface queries (SURVEY.md §2.8): string, date, JSON,
and conditional expressions beyond the JDE codecs — the families the
reference leaves unused ("exposed but not parity-critical") plus the
ones a pipeline over the driver's tables needs (props JSON on events).

All are single-pass projections: they compile into the scan stage
(WholeStageCodegen) with zero shuffles — the throughput shape these
must keep at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.catalog import cents, query, t


@query(
    "string_functions",
    tags=("F", "string"),
    oracle="""
SELECT
    c_custkey,
    upper(c_name) AS name_upper,
    length(c_name)::INT AS name_len,
    regexp_extract(c_name, '[0-9]+') AS cust_digits,
    lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
    substring(c_mktsegment, 1, 3) AS seg3,
    concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
    CASE WHEN c_acctbal < 0 THEN 'debtor'
         WHEN c_acctbal < 5000 THEN 'standard'
         ELSE 'premium' END AS tier
FROM customer
""",
)
def string_functions(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("cust_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.concat_ws(
            "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
    )


@query(
    "date_functions",
    tags=("F", "date"),
    oracle="""
SELECT
    o_orderkey AS order_key,
    CAST(o_orderdate AS DATE) AS order_date,
    CAST(o_orderdate AS DATE) + 30 AS due_date,
    last_day(CAST(o_orderdate AS DATE)) AS month_end,
    CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
    year(o_orderdate)::INT AS order_year,
    quarter(o_orderdate)::INT AS order_quarter,
    (dayofweek(CAST(o_orderdate AS DATE)) + 1)::INT AS dow_sunday1,
    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))::INT
        AS days_since_epoch95
FROM orders
""",
)
def date_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("order_key"),
        d.alias("order_date"),
        F.date_add(d, 30).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        F.year(d).alias("order_year"),
        F.quarter(d).alias("order_quarter"),
        F.dayofweek(d).alias("dow_sunday1"),
        F.datediff(d, F.lit("1995-01-01")).alias("days_since_epoch95"),
    )


@query(
    "json_extract_events",
    tags=("F", "json"),
    oracle="""
SELECT
    CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
    count(*) AS n_events,
    count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
""",
)
def json_extract_events(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "math_functions",
    tags=("F", "math"),
    oracle="""
SELECT p_partkey,
       round(ln(p_retailprice), 6) AS ln_price,
       round(log10(p_retailprice), 6) AS log10_price,
       round(sqrt(p_retailprice), 6) AS sqrt_price,
       round(pow(p_size, 1.5), 6) AS size_pow,
       round(exp(p_size / 100.0), 6) AS size_exp,
       round(sin(p_size), 6) AS size_sin,
       abs(p_size - 25) AS size_dist,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       p_size % 7 AS size_mod
FROM part
""",
)
def math_functions(spark, sf_dir):
    """Math scalar family (SURVEY.md §2.8 'absent scalar families' —
    exposed anyway): log/exp/sqrt/pow/trig/abs/floor/ceil/mod, all
    JVM-side inside codegen; results rounded to 6 places because libm
    implementations may differ in the last ulp across engines."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.log("p_retailprice"), 6).alias("ln_price"),
        F.round(F.log10("p_retailprice"), 6).alias("log10_price"),
        F.round(F.sqrt("p_retailprice"), 6).alias("sqrt_price"),
        F.round(F.pow("p_size", F.lit(1.5)), 6).alias("size_pow"),
        F.round(F.exp(F.col("p_size") / 100.0), 6).alias("size_exp"),
        F.round(F.sin("p_size"), 6).alias("size_sin"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@query(
    "map_functions_surface",
    tags=("F", "map"),
    oracle="""
WITH m AS (
    SELECT event_id,
           MAP {'k': CAST(json_extract_string(props, '$.k') AS BIGINT),
                'cents': CAST(round(value * 100) AS BIGINT)} AS mp
    FROM events
), e AS (
    SELECT event_id, unnest(map_entries(mp), recursive := true) FROM m
)
SELECT key, CAST(sum(value) AS BIGINT) AS total, count(*) AS n
FROM e
GROUP BY key
""",
)
def map_functions_surface(spark, sf_dir):
    """Map-typed columns (SURVEY.md §1.3: absent from the reference,
    exposed anyway): build a map per row, explode entries to rows,
    aggregate per key — the generic shape for sparse per-row feature
    bags a training pipeline carries alongside typed columns."""
    e = t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k").cast("long"),
        F.lit("cents"), F.round(F.col("value") * 100).cast("long"),
    )
    return (
        e.select("event_id", F.explode(m).alias("key", "value"))
        .groupBy("key")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "unpivot_order_measures",
    tags=("F", "unpivot"),
    oracle="""
WITH wide AS (
    SELECT o_orderstatus,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_price,
           CAST(count(*) AS DOUBLE) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers
    FROM orders
    GROUP BY o_orderstatus
)
SELECT o_orderstatus, metric, value
FROM wide
UNPIVOT (value FOR metric IN (total_price, n_orders, n_customers))
""",
)
def unpivot_order_measures(spark, sf_dir):
    """Unpivot/melt (the inverse of pivot_status_by_segment): wide
    per-status measures → long (status, metric, value) rows via
    ``stack`` — the reshape every metrics warehouse needs for generic
    metric sinks. Zero extra shuffle: melt is a projection."""
    o = t(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        (F.sum(cents("o_totalprice")).cast("double") / 100.0).alias("total_price"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.countDistinct("o_custkey").cast("double").alias("n_customers"),
    )
    return wide.select(
        "o_orderstatus",
        F.expr(
            "stack(3, 'total_price', total_price, 'n_orders', n_orders,"
            " 'n_customers', n_customers) AS (metric, value)"
        ),
    )


@query(
    "histogram_order_values",
    tags=("A", "histogram"),
    oracle="""
WITH c AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
), b AS (SELECT min(v) AS lo, max(v) AS hi FROM c)
SELECT CAST(least(floor((v - lo) * 10.0 / greatest(hi - lo + 1, 1)), 9) AS INT)
           AS bucket,
       count(*) AS n_orders,
       CAST(min(v) AS DOUBLE) / 100.0 AS bucket_min,
       CAST(max(v) AS DOUBLE) / 100.0 AS bucket_max
FROM c, b
GROUP BY 1
""",
)
def histogram_order_values(spark, sf_dir):
    """Equi-width 10-bucket histogram of order values. Bucketing is
    floor((v−lo)·10 / span) over exact cents against broadcast global
    bounds — explicit floor on BOTH engines (Spark's cast truncates,
    DuckDB's CAST rounds; floor sidesteps the divergence)."""
    o = t(spark, sf_dir, "orders").select(cents("o_totalprice").alias("v"))
    bounds = F.broadcast(o.agg(F.min("v").alias("lo"), F.max("v").alias("hi")))
    span = F.greatest(F.col("hi") - F.col("lo") + 1, F.lit(1))
    bucket = F.least(
        F.floor(((F.col("v") - F.col("lo")) * 10).cast("double") / span),
        F.lit(9).cast("long"),
    ).cast("int")
    return (
        o.crossJoin(bounds)
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.min("v").cast("double") / 100.0).alias("bucket_min"),
            (F.max("v").cast("double") / 100.0).alias("bucket_max"),
        )
    )
