"""Calendar-dimension generator.

The reference builds ``Gold.Dim_Date`` with a T-SQL WHILE loop inserting
one row per day, 2020-01-01 → 2040-12-31, 14 attributes
(``sql_scripts/dim_date.sql:34-63`` — 7,671 rows). Spark-first rewrite:
a single ``sequence() + explode`` projection — fully parallel, no
driver-side loop, and at any date range it stays a one-stage job.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_migration_spark.functions.jde import date_key

DEFAULT_START = "2020-01-01"
DEFAULT_END = "2040-12-31"


def build_dim_date(
    spark: SparkSession,
    start: str | dt.date = DEFAULT_START,
    end: str | dt.date = DEFAULT_END,
) -> DataFrame:
    """One row per calendar day with the reference's 14 attributes.

    Column semantics follow ``dim_date.sql:40-60``:
    - DayOfWeekNumber: 1 = Sunday … 7 = Saturday (T-SQL DATEPART
      default == Spark's ``dayofweek``).
    - WeekOfYear: ISO week (Spark ``weekofyear``; T-SQL DATEPART(WEEK)
      is calendar-week — documented divergence, ISO is the saner
      semantics and what DuckDB's ``weekofyear`` computes).
    - IsLeapYear via the Gregorian rule (``dim_date.sql:57-58``).
    - Fiscal* mirror calendar (``dim_date.sql:59-60``).
    """
    days = spark.sql(
        "SELECT explode(sequence(to_date(:start), to_date(:end), interval 1 day))"
        " AS FullDate",
        args={"start": str(start), "end": str(end)},
    )
    d = F.col("FullDate")
    year = F.year(d)
    quarter = F.quarter(d)
    return days.select(
        date_key(d).alias("DateKey"),
        d.alias("FullDate"),
        F.dayofmonth(d).alias("DayOfMonth"),
        F.date_format(d, "EEEE").alias("DayOfWeekName"),
        F.dayofweek(d).alias("DayOfWeekNumber"),
        F.weekofyear(d).alias("WeekOfYear"),
        F.month(d).alias("MonthNumber"),
        F.date_format(d, "MMMM").alias("MonthName"),
        quarter.alias("Quarter"),
        year.alias("Year"),
        F.dayofweek(d).isin(1, 7).alias("IsWeekend"),
        (((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)).alias("IsLeapYear"),
        quarter.alias("FiscalQuarter"),
        year.alias("FiscalYear"),
    )
