"""JDE codec unit tests — the reference's documented known-answer values
(README.md:63-67, docs/technical_report.md:40,49-52) plus the edge cases
the reference never handles (SURVEY.md §7.3)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from data_warehouse_migration_spark.functions.jde import (
    date_key,
    date_to_julian,
    implicit_decimal,
    julian_to_date,
    row_hash,
    safe_divide,
)


def _decode(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "j int")
    return [r.d for r in df.select(julian_to_date("j").alias("d")).collect()]


def test_known_answer_julian(spark):
    # reference golden: 123001 → 2023-01-01
    assert _decode(spark, [123001]) == [dt.date(2023, 1, 1)]


def test_julian_century_zero_five_digits(spark):
    # 99001 = 1999-01-01: the reference's decoder breaks on this
    # (toString drops the leading zero); ours lpads (SURVEY §2.8 ⚠).
    assert _decode(spark, [99001]) == [dt.date(1999, 1, 1)]


def test_julian_leap_day_366(spark):
    assert _decode(spark, [124366]) == [dt.date(2024, 12, 31)]


def test_julian_invalid_ddd_and_null(spark):
    assert _decode(spark, [123000, 123367, None]) == [None, None, None]


def test_julian_roundtrip(spark):
    dates = spark.sql(
        "SELECT explode(sequence(to_date('1998-12-28'), to_date('2025-03-05'),"
        " interval 97 day)) AS d"
    )
    bad = dates.select(
        "d", julian_to_date(date_to_julian("d")).alias("rt")
    ).filter(F.col("d") != F.col("rt"))
    assert bad.count() == 0


def test_implicit_decimal_known_answers(spark):
    # reference goldens: 1050 → $10.50, 1430130 → $14,301.30
    df = spark.createDataFrame([(1050,), (1430130,)], "v int")
    got = [r.m for r in df.select(implicit_decimal("v").alias("m")).collect()]
    assert got == [Decimal("10.50"), Decimal("14301.30")]


def test_safe_divide_zero_denominator(spark):
    df = spark.createDataFrame([(10, 0), (10, 4)], "n int, d int")
    got = [r.q for r in df.select(safe_divide("n", "d").alias("q")).collect()]
    assert got == [0.0, 2.5]


def test_row_hash_null_normalization_and_separator(spark):
    df = spark.createDataFrame(
        [("ab", "c"), ("a", "bc"), (None, "x"), ("", "x")],
        "a string, b string",
    )
    got = [r.h for r in df.select(row_hash("a", "b").alias("h")).collect()]
    assert got[0] != got[1]  # separator prevents concat collision
    assert got[2] == got[3]  # NULL normalizes to ''
    assert all(len(h) == 64 for h in got)


def test_date_key(spark):
    df = spark.sql("SELECT to_date('2023-01-05') AS d")
    assert df.select(date_key("d").alias("k")).first().k == 20230105
