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
