"""Warehouse-parity queries (SURVEY.md §2): the reference's ETL surface
re-expressed over the driver's TPC-H-ish tables, each with a DuckDB
oracle.

Fixture mapping (FIXTURES.md §5): ``lineitem``/``orders`` stand in for
F4211 (dates Julian-encoded on the fly to exercise the decoder; money
scaled to implicit-decimal integers), ``customer`` for F0101, and the
orders history drives SCD2 + point-in-time attribution.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.catalog import cents, query, t
from data_warehouse_migration_spark.functions.calendar import build_dim_date
from data_warehouse_migration_spark.functions.jde import (
    date_key,
    date_to_julian,
    julian_to_date,
)
from data_warehouse_migration_spark.operators.joins import point_in_time_join
from data_warehouse_migration_spark.operators.scd2 import scd2_from_history

# ---------------------------------------------------------------------------
# jde_silver_clean — the reference's Silver cleanse (DF_Clean_JDE.json):
# Julian decode (P1/F6-F11), implicit-decimal decode (F3/F11), safe-divide
# unit price (F12), DateKey (F17), business renames (P5).
# We first ENCODE lineitem into JDE form (exactly what the reference's
# fixture generator does, generate_jde_data.py:28-42) then decode — so the
# oracle independently verifies both directions.
# ---------------------------------------------------------------------------


@query(
    "jde_silver_clean",
    headline=True,
    tags=("P1", "P5", "F1-F17", "S5", "S7"),
    oracle="""
WITH enc AS (
    SELECT
        l_orderkey,
        l_linenumber,
        ((year(l_shipdate) // 100 - 19) * 100000
         + (year(l_shipdate) % 100) * 1000
         + dayofyear(l_shipdate))::INT AS sdtrdj,
        CAST(round(l_quantity * 100) AS BIGINT) AS sduorg,
        CAST(round(l_extendedprice * 100) AS BIGINT) AS sdaexp
    FROM lineitem
), dec AS (
    SELECT *,
        lpad(CAST(sdtrdj AS VARCHAR), 6, '0') AS s
    FROM enc
)
SELECT
    l_orderkey AS OrderNumber,
    l_linenumber AS LineNumber,
    make_date(1900 + substr(s,1,1)::INT * 100 + substr(s,2,2)::INT, 1, 1)
        + (substr(s,4,3)::INT - 1) AS OrderDate,
    CAST(strftime(make_date(1900 + substr(s,1,1)::INT * 100 + substr(s,2,2)::INT, 1, 1)
        + (substr(s,4,3)::INT - 1), '%Y%m%d') AS INT) AS DateKey,
    sduorg / 100.0 AS Quantity,
    sdaexp / 100.0 AS ExtendedAmount,
    CAST(CASE WHEN sduorg <> 0 THEN (sdaexp * 1000000) // sduorg ELSE 0 END
         AS DOUBLE) / 1000000.0 AS UnitPrice
FROM dec
""",
)
def jde_silver_clean(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    enc = l.select(
        "l_orderkey",
        "l_linenumber",
        date_to_julian(F.to_date("l_shipdate")).alias("SDTRDJ"),
        cents("l_quantity").alias("SDUORG"),
        cents("l_extendedprice").alias("SDAEXP"),
    )
    decoded_date = julian_to_date("SDTRDJ")
    return enc.select(
        F.col("l_orderkey").alias("OrderNumber"),
        F.col("l_linenumber").alias("LineNumber"),
        decoded_date.alias("OrderDate"),
        date_key(decoded_date).alias("DateKey"),
        (F.col("SDUORG") / 100.0).alias("Quantity"),
        (F.col("SDAEXP") / 100.0).alias("ExtendedAmount"),
        # Fixed-point micro-precision safe divide (F12): integer floor
        # division is bit-identical across engines, unlike round(double)
        # whose half-rounding mode differs.
        (
            F.when(
                F.col("SDUORG") != 0,
                F.expr("(SDAEXP * 1000000) div SDUORG"),
            )
            .otherwise(F.lit(0))
            .cast("double")
            / 1000000.0
        ).alias("UnitPrice"),
    )


# ---------------------------------------------------------------------------
# dim_date — calendar-dimension generator (G1): sequence+explode vs the
# reference's T-SQL WHILE loop (dim_date.sql:34-63, 7,671 rows).
# ---------------------------------------------------------------------------


@query(
    "dim_date",
    tags=("G1", "F17-F21"),
    oracle="""
WITH days AS (
    SELECT unnest(generate_series(DATE '2020-01-01', DATE '2040-12-31',
                                  INTERVAL 1 DAY))::DATE AS FullDate
)
SELECT
    CAST(strftime(FullDate, '%Y%m%d') AS INT) AS DateKey,
    FullDate,
    day(FullDate)::INT AS DayOfMonth,
    dayname(FullDate) AS DayOfWeekName,
    (dayofweek(FullDate) + 1)::INT AS DayOfWeekNumber,
    weekofyear(FullDate)::INT AS WeekOfYear,
    month(FullDate)::INT AS MonthNumber,
    monthname(FullDate) AS MonthName,
    quarter(FullDate)::INT AS Quarter,
    year(FullDate)::INT AS Year,
    dayofweek(FullDate) IN (0, 6) AS IsWeekend,
    ((year(FullDate) % 4 = 0 AND year(FullDate) % 100 <> 0)
     OR year(FullDate) % 400 = 0) AS IsLeapYear,
    quarter(FullDate)::INT AS FiscalQuarter,
    year(FullDate)::INT AS FiscalYear
FROM days
""",
)
def dim_date(spark, sf_dir):
    return build_dim_date(spark)


# ---------------------------------------------------------------------------
# scd2_customer_versions — SCD2 backfill from a change history (§2.2 P2-P8).
# History: each customer's order stream; tracked attribute: the priority
# class of their latest order (stands in for F0101's CustomerName /
# CategoryCode). Hash change detection mirrors DF_SCD2_Customer.json:135.
# ---------------------------------------------------------------------------

_SCD2_ORACLE_BASE = """
WITH h AS (
    SELECT
        o_custkey AS CustomerID,
        CAST(o_orderdate AS DATE) AS ts,
        o_orderpriority AS Priority,
        o_orderkey,
        sha256(coalesce(o_orderpriority, '')) AS RowHash
    FROM orders
), marked AS (
    SELECT *,
        lag(RowHash) OVER (PARTITION BY CustomerID ORDER BY ts, o_orderkey)
            AS prev_hash
    FROM h
), starts AS (
    SELECT CustomerID, Priority, RowHash, ts AS ValidFrom, o_orderkey
    FROM marked
    WHERE prev_hash IS NULL OR prev_hash <> RowHash
), versions AS (
    SELECT
        CustomerID, Priority, RowHash, ValidFrom,
        lead(ValidFrom) OVER (PARTITION BY CustomerID ORDER BY ValidFrom, o_orderkey)
            AS ValidTo
    FROM starts
)
SELECT CustomerID, Priority, RowHash, ValidFrom, ValidTo,
       (ValidTo IS NULL) AS IsActive
FROM versions
"""


def _customer_priority_history(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_custkey").alias("CustomerID"),
        F.to_date("o_orderdate").alias("ts"),
        F.col("o_orderpriority").alias("Priority"),
        "o_orderkey",
    )


@query("scd2_customer_versions", tags=("P2", "P3", "P7", "F13"), oracle=_SCD2_ORACLE_BASE)
def scd2_customer_versions(spark, sf_dir):
    h = _customer_priority_history(spark, sf_dir)
    v = scd2_from_history(
        h, keys="CustomerID", attrs=["Priority"], ts="ts", tiebreak=["o_orderkey"]
    )
    return v.select(
        "CustomerID", "Priority", "RowHash", "ValidFrom", "ValidTo", "IsActive"
    )


# ---------------------------------------------------------------------------
# pit_fact_attribution — point-in-time join (J3): attribute every lineitem
# (at ship time) to the customer-priority version valid that day, exactly
# the reference's Fact_Sales load rule (fact_sales.sql:11-13).
# ---------------------------------------------------------------------------


@query(
    "pit_fact_attribution",
    headline=True,
    tags=("J2", "J3", "P6", "F22"),
    oracle=_SCD2_ORACLE_BASE.replace(
        "SELECT CustomerID, Priority, RowHash, ValidFrom, ValidTo,\n"
        "       (ValidTo IS NULL) AS IsActive\nFROM versions",
        """
, facts AS (
    SELECT o.o_custkey AS CustomerID, CAST(l.l_shipdate AS DATE) AS ship_date,
           CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT v.Priority AS priority,
       count(*) AS n_lines,
       CAST(sum(f.cents) AS DOUBLE) / 100.0 AS revenue
FROM facts f
LEFT JOIN versions v
  ON f.CustomerID = v.CustomerID
 AND f.ship_date >= v.ValidFrom
 AND f.ship_date < coalesce(v.ValidTo, DATE '9999-12-31')
GROUP BY v.Priority
""",
    ),
)
def pit_fact_attribution(spark, sf_dir):
    h = _customer_priority_history(spark, sf_dir)
    versions = scd2_from_history(
        h, keys="CustomerID", attrs=["Priority"], ts="ts", tiebreak=["o_orderkey"]
    ).select("CustomerID", "Priority", "ValidFrom", "ValidTo")

    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    o = t(spark, sf_dir, "orders")
    facts = l.join(o, l.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("CustomerID"),
        F.to_date("l_shipdate").alias("ship_date"),
        cents("l_extendedprice").alias("cents"),
    )
    attributed = point_in_time_join(
        facts, versions, on="CustomerID", ts="ship_date", broadcast_dim=True
    )
    return attributed.groupBy(F.col("Priority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum("cents").cast("double") / 100.0).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# star_topk_orders — the flagship star query (J7 + O1): the reference's
# verification query shape (load_gold_data.sql:115-128): top-10 by amount
# across fact ⋈ customer with date attribution.
# ---------------------------------------------------------------------------


@query(
    "star_topk_orders",
    headline=True,
    tags=("J2", "J7", "O1", "A1"),
    oracle="""
SELECT
    o.o_orderkey AS order_key,
    c.c_name AS customer_name,
    CAST(o.o_orderdate AS DATE) AS order_date,
    CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
        AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2, 3
ORDER BY revenue DESC, order_key
LIMIT 10
""",
)
def star_topk_orders(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    # Exact per-row fixed-point (4 implied decimals: price(2) × discount(2)).
    line_rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("o_orderkey").alias("order_key"),
            F.col("c_name").alias("customer_name"),
            F.to_date("o_orderdate").alias("order_date"),
        )
        .agg((F.sum(line_rev).cast("double") / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("order_key"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# inline_values_seed — the reference's VALUES-driven Gold seed (G7/S11/J5):
# an inline derived table joined to warehouse data with an active-flag-style
# predicate (here: market segment tiers).
# ---------------------------------------------------------------------------


@query(
    "inline_values_seed",
    tags=("G7", "S11", "J5", "U2"),
    oracle="""
WITH tiers(segment, tier) AS (
    VALUES ('BUILDING', 1), ('AUTOMOBILE', 2), ('MACHINERY', 2),
           ('HOUSEHOLD', 3), ('FURNITURE', 3)
)
SELECT t.tier, count(*) AS n_customers,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS total_acctbal
FROM customer c
JOIN tiers t ON c.c_mktsegment = t.segment
GROUP BY t.tier
""",
)
def inline_values_seed(spark, sf_dir):
    tiers = spark.createDataFrame(
        [("BUILDING", 1), ("AUTOMOBILE", 2), ("MACHINERY", 2),
         ("HOUSEHOLD", 3), ("FURNITURE", 3)],
        "segment string, tier int",
    )
    c = t(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(tiers), c.c_mktsegment == tiers.segment)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(cents("c_acctbal")).cast("double") / 100.0).alias("total_acctbal"),
        )
    )


@query(
    "data_quality_checks",
    tags=("quality", "P6"),
    oracle="""
WITH v AS (
    SELECT
        CASE WHEN NOT coalesce(l_quantity > 0, FALSE)
             THEN 1 ELSE 0 END AS v_qty_positive,
        CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 0.5, FALSE)
             THEN 1 ELSE 0 END AS v_discount_range,
        CASE WHEN NOT (l_shipdate IS NOT NULL)
             THEN 1 ELSE 0 END AS v_shipdate_present,
        CASE WHEN NOT coalesce(l_extendedprice >= l_quantity, FALSE)
             THEN 1 ELSE 0 END AS v_price_floor
    FROM lineitem
)
SELECT count(*) AS n_rows,
       CAST(sum(v_qty_positive) AS BIGINT) AS qty_positive,
       CAST(sum(v_discount_range) AS BIGINT) AS discount_range,
       CAST(sum(v_shipdate_present) AS BIGINT) AS shipdate_present,
       CAST(sum(v_price_floor) AS BIGINT) AS price_floor,
       CAST(sum(CASE WHEN v_qty_positive + v_discount_range
                        + v_shipdate_present + v_price_floor > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined
FROM v
""",
)
def data_quality_checks(spark, sf_dir):
    """Data-quality gate (operators/quality.py) over lineitem: per-rule
    violation counts + total quarantined rows, in ONE pass (no
    per-rule scans). The reference has no dead-letter lane; this is
    the ingest-side guard its silent-corruption gaps need."""
    from data_warehouse_migration_spark.operators.quality import with_violations

    l = t(spark, sf_dir, "lineitem")  # noqa: E741
    rules = {
        "qty_positive": F.col("l_quantity") > 0,
        "discount_range": F.col("l_discount").between(0, 0.5),
        "shipdate_present": F.col("l_shipdate").isNotNull(),
        "price_floor": F.col("l_extendedprice") >= F.col("l_quantity"),
    }
    flagged = with_violations(l, rules)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name in rules:
        aggs.append(
            F.sum(
                F.when(F.array_contains("violations", name), 1).otherwise(0)
            ).cast("long").alias(name)
        )
    aggs.append(
        F.sum(F.when(F.size("violations") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_quarantined")
    )
    return flagged.agg(*aggs)


@query(
    "snapshot_diff_customers",
    tags=("cdc", "P7", "full-outer"),
    oracle="""
WITH old AS (
    SELECT o_custkey AS k, max(CAST(o_orderdate AS DATE)) AS last_order
    FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    GROUP BY 1
), new AS (
    SELECT o_custkey AS k, max(CAST(o_orderdate AS DATE)) AS last_order
    FROM orders
    GROUP BY 1
)
SELECT coalesce(new.k, old.k) AS k,
       coalesce(new.last_order, old.last_order) AS last_order,
       CASE WHEN old.k IS NULL THEN 'INSERT'
            WHEN new.k IS NULL THEN 'DELETE'
            WHEN new.last_order <> old.last_order
                 OR (new.last_order IS NULL) <> (old.last_order IS NULL)
                 THEN 'UPDATE'
            ELSE 'UNCHANGED' END AS change
FROM new FULL OUTER JOIN old ON new.k = old.k
""",
)
def snapshot_diff_customers(spark, sf_dir):
    """CDC diff (operators/scd2.snapshot_diff) between two snapshots of
    a per-customer summary — yesterday's warehouse state vs today's.
    Full-outer join on the business key, single-hash change detection;
    the INSERT/UPDATE lanes are exactly what scd2_merge ingests."""
    from data_warehouse_migration_spark.operators.scd2 import snapshot_diff

    o = t(spark, sf_dir, "orders")
    old = (
        o.filter(F.to_date("o_orderdate") < F.lit("1998-01-01"))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.max(F.to_date("o_orderdate")).alias("last_order"))
    )
    new = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_order")
    )
    return snapshot_diff(old, new, keys="k", attrs=["last_order"])


@query(
    "full_outer_reconciliation",
    tags=("J", "full-outer"),
    oracle="""
WITH y96 AS (
    SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
    FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996 GROUP BY 1
), y97 AS (
    SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
    FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1997 GROUP BY 1
)
SELECT coalesce(y96.o_custkey, y97.o_custkey) AS customer,
       CAST(coalesce(y96.v, 0) AS DOUBLE) / 100.0 AS rev_1996,
       CAST(coalesce(y97.v, 0) AS DOUBLE) / 100.0 AS rev_1997,
       CAST(coalesce(y97.v, 0) - coalesce(y96.v, 0) AS DOUBLE) / 100.0
           AS delta
FROM y96 FULL OUTER JOIN y97 ON y96.o_custkey = y97.o_custkey
""",
)
def full_outer_reconciliation(spark, sf_dir):
    """Year-over-year revenue reconciliation per customer via FULL
    OUTER join — keeps customers active in either year, zero-filling
    the missing side (the join type the reference never uses; closes
    the join-variant matrix). Exact cents arithmetic end-to-end."""
    o = t(spark, sf_dir, "orders")

    def year_rev(y):
        return (
            o.filter(F.year(F.to_date("o_orderdate")) == y)
            .groupBy("o_custkey")
            .agg(F.sum(cents("o_totalprice")).alias("v"))
        )

    a = year_rev(1996).select(F.col("o_custkey").alias("k96"), F.col("v").alias("v96"))
    b = year_rev(1997).select(F.col("o_custkey").alias("k97"), F.col("v").alias("v97"))
    return a.join(b, F.col("k96") == F.col("k97"), "full_outer").select(
        F.coalesce(F.col("k96"), F.col("k97")).alias("customer"),
        (F.coalesce(F.col("v96"), F.lit(0)).cast("double") / 100.0).alias("rev_1996"),
        (F.coalesce(F.col("v97"), F.lit(0)).cast("double") / 100.0).alias("rev_1997"),
        (
            (F.coalesce(F.col("v97"), F.lit(0)) - F.coalesce(F.col("v96"), F.lit(0)))
            .cast("double") / 100.0
        ).alias("delta"),
    )


@query(
    "late_arriving_dim_stubs",
    tags=("scd2", "inferred-members", "J"),
    oracle="""
WITH dim AS (
    SELECT c_custkey FROM customer WHERE c_custkey % 7 <> 0
)
SELECT o_custkey AS c_custkey,
       'UNKNOWN' AS c_name,
       'UNKNOWN' AS c_mktsegment,
       TRUE AS IsInferred
FROM (SELECT DISTINCT o_custkey FROM orders) o
LEFT JOIN dim ON o.o_custkey = dim.c_custkey
WHERE dim.c_custkey IS NULL
""",
)
def late_arriving_dim_stubs(spark, sf_dir):
    """Kimball inferred members (operators/scd2.inferred_members):
    placeholder rows for fact keys the dimension feed hasn't delivered
    yet — simulated here by withholding every 7th customer. Fact loads
    then join cleanly; the stub versions out when the real row arrives."""
    from data_warehouse_migration_spark.operators.scd2 import inferred_members

    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    dim = t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 != 0)
    return inferred_members(
        orders,
        dim,
        key="c_custkey",
        defaults={"c_name": "UNKNOWN", "c_mktsegment": "UNKNOWN"},
    )


def _profile_branch(col, kind):
    null_num = "CAST(NULL AS DOUBLE)"
    null_str = "CAST(NULL AS VARCHAR)"
    min_num = f"CAST(min({col}) AS DOUBLE)" if kind == "num" else null_num
    max_num = f"CAST(max({col}) AS DOUBLE)" if kind == "num" else null_num
    min_str = f"min({col})" if kind == "str" else null_str
    max_str = f"max({col})" if kind == "str" else null_str
    return f"""
SELECT '{col}' AS col_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {col}) AS n_distinct,
       {min_num} AS min_num, {max_num} AS max_num,
       {min_str} AS min_str, {max_str} AS max_str
FROM orders"""


@query(
    "table_profile_orders",
    tags=("quality", "profile"),
    oracle=" UNION ALL ".join(
        _profile_branch(c, k)
        for c, k in [
            ("o_orderkey", "num"),
            ("o_custkey", "num"),
            ("o_orderstatus", "str"),
            ("o_totalprice", "num"),
            ("o_orderdate", "other"),
            ("o_orderpriority", "str"),
        ]
    ),
)
def table_profile_orders(spark, sf_dir):
    """Per-column health profile of a landed table
    (operators/profile.table_profile): null count, exact distinct
    count, and type-appropriate min/max for every column in ONE scan —
    the generalization of the reference's row-count-only load
    verification. The oracle recomputes each column's branch
    independently; at 100 TB swap approx=True for HLL++ distincts."""
    from data_warehouse_migration_spark.operators.profile import table_profile

    return table_profile(t(spark, sf_dir, "orders"))
