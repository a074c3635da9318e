"""Calendar dimension: cardinality (7,671 rows, load_gold_data.sql:8),
leap-year rule, and spot-checked attributes (dim_date.sql:40-60)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_warehouse_migration_spark.functions.calendar import build_dim_date


def test_reference_cardinality(spark):
    assert build_dim_date(spark).count() == 7671  # 2020-01-01 → 2040-12-31


def test_known_day_attributes(spark):
    d = build_dim_date(spark, "2024-02-29", "2024-02-29").first()
    assert d.DateKey == 20240229
    assert d.FullDate == dt.date(2024, 2, 29)
    assert d.DayOfWeekName == "Thursday"
    assert d.DayOfWeekNumber == 5  # 1=Sunday convention (T-SQL default)
    assert d.MonthName == "February"
    assert d.Quarter == 1 and d.FiscalQuarter == 1
    assert d.IsLeapYear is True
    assert d.IsWeekend is False


def test_leap_year_rule_centuries(spark):
    df = build_dim_date(spark, "2000-02-01", "2000-02-01").unionByName(
        build_dim_date(spark, "2100-02-01", "2100-02-01")
    )
    got = {r.Year: r.IsLeapYear for r in df.collect()}
    assert got == {2000: True, 2100: False}  # %400 exception, %100 rule


def test_weekend_flags(spark):
    df = build_dim_date(spark, "2024-01-06", "2024-01-08")  # Sat, Sun, Mon
    got = [r.IsWeekend for r in df.orderBy("FullDate").collect()]
    assert got == [True, True, False]


def test_no_gaps_or_dups(spark):
    df = build_dim_date(spark, "2023-01-01", "2023-12-31")
    assert df.count() == 365
    assert df.select("DateKey").distinct().count() == 365
    assert df.agg(F.min("FullDate"), F.max("FullDate")).first() == (
        dt.date(2023, 1, 1),
        dt.date(2023, 12, 31),
    )
