"""Point-in-time and as-of join semantics, including attribution to an
*expired* version (the case FIXTURES.md §3 requires) and open-ended
NULL ValidTo handling (fact_sales.sql:11-13)."""

from __future__ import annotations

import datetime as dt

from data_warehouse_migration_spark.operators.joins import (
    as_of_join,
    point_in_time_join,
)


def test_pit_attributes_to_expired_version(spark):
    dim = spark.createDataFrame(
        [(1, "v1", dt.date(2024, 1, 1), dt.date(2024, 2, 1)),
         (1, "v2", dt.date(2024, 2, 1), None),
         (2, "w1", dt.date(2024, 1, 15), None)],
        "CustomerID int, Ver string, ValidFrom date, ValidTo date",
    )
    facts = spark.createDataFrame(
        [(100, 1, dt.date(2024, 1, 20)),   # inside expired v1
         (101, 1, dt.date(2024, 2, 1)),    # boundary: belongs to v2 (half-open)
         (102, 1, dt.date(2024, 6, 1)),    # open-ended current
         (103, 2, dt.date(2024, 1, 1)),    # before first version → no match
         (104, 3, dt.date(2024, 1, 1))],   # unknown key → no match
        "fact_id int, CustomerID int, d date",
    )
    out = point_in_time_join(facts, dim, on="CustomerID", ts="d")
    got = {r.fact_id: r.Ver for r in out.collect()}
    assert got == {100: "v1", 101: "v2", 102: "v2", 103: None, 104: None}
    assert out.count() == 5  # left join: every fact exactly once


def test_pit_inner_join_drops_unmatched(spark):
    dim = spark.createDataFrame(
        [(1, "v1", dt.date(2024, 1, 1), None)],
        "CustomerID int, Ver string, ValidFrom date, ValidTo date",
    )
    facts = spark.createDataFrame(
        [(1, 1, dt.date(2024, 3, 1)), (2, 1, dt.date(2023, 1, 1))],
        "fact_id int, CustomerID int, d date",
    )
    out = point_in_time_join(facts, dim, on="CustomerID", ts="d", how="inner")
    assert [r.fact_id for r in out.collect()] == [1]


def test_as_of_join_latest_at_or_before(spark):
    quotes = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 10), 100.0),
         ("A", dt.datetime(2024, 1, 1, 11), 110.0),
         ("A", dt.datetime(2024, 1, 1, 12), 120.0)],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(1, "A", dt.datetime(2024, 1, 1, 10, 30)),
         (2, "A", dt.datetime(2024, 1, 1, 11, 0)),   # exact tie → that quote
         (3, "A", dt.datetime(2024, 1, 1, 9, 0)),    # before all → NULL
         (4, "B", dt.datetime(2024, 1, 1, 12, 0))],  # unknown key → NULL
        "trade_id int, sym string, tts timestamp",
    )
    out = as_of_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts")
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == {1: 100.0, 2: 110.0, 3: None, 4: None}


def test_as_of_join_tolerance(spark):
    quotes = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 0), 1.0)],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(1, "A", dt.datetime(2024, 1, 1, 2)),
         (2, "A", dt.datetime(2024, 1, 3, 0))],
        "trade_id int, sym string, tts timestamp",
    )
    out = as_of_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                     tolerance="1 DAY")
    got = {r.trade_id: r.px for r in out.collect()}
    assert got == {1: 1.0, 2: None}


def test_as_of_join_tiebreak_deterministic(spark):
    import datetime as dt

    quotes = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 10), 7), ("A", dt.datetime(2024, 1, 1, 10), 3)],
        "sym string, qts timestamp, qid int",
    )
    trades = spark.createDataFrame(
        [(1, "A", dt.datetime(2024, 1, 1, 11))],
        "trade_id int, sym string, tts timestamp",
    )
    out = as_of_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_tiebreak=["qid"],
    )
    assert [r.qid for r in out.collect()] == [3]  # lowest id among tied ts


def test_as_of_join_keeps_duplicate_left_rows(spark):
    import datetime as dt

    quotes = spark.createDataFrame(
        [("A", dt.datetime(2024, 1, 1, 10), 100.0)],
        "sym string, qts timestamp, px double",
    )
    # two fully identical trades: both must survive with their match
    trades = spark.createDataFrame(
        [(1, "A", dt.datetime(2024, 1, 1, 11)),
         (1, "A", dt.datetime(2024, 1, 1, 11))],
        "trade_id int, sym string, tts timestamp",
    )
    out = as_of_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts")
    assert out.count() == 2
    assert [r.px for r in out.collect()] == [100.0, 100.0]


def test_merge_scan_asof_equals_join_window(spark, sf_dir):
    """as_of_join_merge_scan must reproduce as_of_join exactly on real
    event data — inclusive bound, lowest-id tie-break, tolerance — and
    plan exactly ONE shuffle (the union's key partition), no join."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.operators.joins import (
        as_of_join_merge_scan,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    purchases = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = e.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    kwargs = dict(
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_value_cols=["click_id", "click_ts"],
        right_tiebreak=["click_id"],
    )
    for tol in (None, "2 hours"):
        a = as_of_join(purchases, clicks, tolerance=tol, **kwargs)
        b = as_of_join_merge_scan(purchases, clicks, tolerance=tol, **kwargs)
        assert a.count() == purchases.count()
        assert b.count() == purchases.count()
        assert a.exceptAll(b).count() == 0, f"tol={tol}"
        assert b.exceptAll(a).count() == 0, f"tol={tol}"

    plan_buf = io.StringIO()
    with contextlib.redirect_stdout(plan_buf):
        as_of_join_merge_scan(purchases, clicks, **kwargs).explain("formatted")
    plan = plan_buf.getvalue()
    assert "Join" not in plan, plan
    import re

    n_ex = len(re.findall(r"^\s*\(\d+\) Exchange\b", plan, re.M))
    assert n_ex == 1, plan


def test_range_join_by_bucket_equals_naive_and_avoids_bnlj(spark, sf_dir):
    """Bucketed range join == the naive residual join (keyless AND
    keyed), and its physical plan contains a hashable equi join — no
    BroadcastNestedLoopJoin/CartesianProduct (what the naive keyless
    form degenerates to)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.operators.joins import (
        range_join_by_bucket,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    p = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )

    # Keyless: clicks from anyone in the 10 minutes around a purchase
    # (two-sided window exercises both bucket edges).
    bucketed = range_join_by_bucket(
        p, c, left_ts="p_ts", right_ts="c_ts", lower_s=-300, upper_s=300
    ).select("purchase_id", "click_id")
    naive = p.join(
        c,
        (c["c_ts"] >= p["p_ts"] - F.expr("INTERVAL 300 SECONDS"))
        & (c["c_ts"] <= p["p_ts"] + F.expr("INTERVAL 300 SECONDS")),
    ).select("purchase_id", "click_id")
    assert bucketed.exceptAll(naive).count() == 0
    assert naive.exceptAll(bucketed).count() == 0
    assert bucketed.count() > 0

    # Keyed: same-user clicks in the preceding hour.
    pk = p.withColumnRenamed("p_user", "user_id")
    ck = c.withColumnRenamed("c_user", "user_id")
    bucketed_k = range_join_by_bucket(
        pk, ck, left_ts="p_ts", right_ts="c_ts", lower_s=-3600, upper_s=0,
        on="user_id",
    ).select("purchase_id", "click_id")
    naive_k = p.join(
        c,
        (p["p_user"] == c["c_user"])
        & (c["c_ts"] <= p["p_ts"])
        & (c["c_ts"] >= p["p_ts"] - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", "click_id")
    assert bucketed_k.exceptAll(naive_k).count() == 0
    assert naive_k.exceptAll(bucketed_k).count() == 0

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bucketed.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_range_join_salting_is_result_invariant(spark, sf_dir):
    """n_salts refines the partitioning only — salted and unsalted
    bucketed range joins must return identical pairs."""
    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.operators.joins import (
        range_join_by_bucket,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "event_type"
    )
    p = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = e.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    kw = dict(left_ts="p_ts", right_ts="c_ts", lower_s=-300, upper_s=0)
    plain = range_join_by_bucket(p, c, **kw).select("purchase_id", "click_id")
    salted = range_join_by_bucket(p, c, n_salts=4, **kw).select(
        "purchase_id", "click_id"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
