"""Table profiling: per-column completeness / cardinality / range
summary in ONE pass — the dbt-test / Great-Expectations-style health
check a warehouse migration runs against every landed table (the
reference's pipeline verifies row counts only,
docs/technical_report.md's Top-10 check; this generalizes it).

One ``df.agg(...)`` computes every column's null count, distinct
count, and type-appropriate min/max simultaneously (Catalyst plans the
multi-distinct with one expand — a single scan either way); the wide
single row then unpivots to one row per column via an exploded struct
array, so the operator never touches the driver.

100 TB note: exact multi-column COUNT(DISTINCT) is the expensive part
(expand multiplies rows by the distinct-column count before the
shuffle). ``approx=True`` swaps in HLL++ (``approx_count_distinct``,
constant memory, one combined pass) — the production default; the
exact twin carries the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def table_profile(df: DataFrame, approx: bool = False) -> DataFrame:
    """One row per column: ``(col_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str)``. Numeric min/max populate
    ``*_num`` (as double), string min/max populate ``*_str``; other
    types (timestamps, arrays, …) profile nulls/distincts only."""
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, typ in df.dtypes:
        c = F.col(name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{name}__nulls"))
        aggs.append(distinct(c).alias(f"{name}__distinct"))
        if typ.startswith(_NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"{name}__min_num"))
            aggs.append(F.max(c).cast("double").alias(f"{name}__max_num"))
        elif typ == "string":
            aggs.append(F.min(c).alias(f"{name}__min_str"))
            aggs.append(F.max(c).alias(f"{name}__max_str"))
    wide = df.agg(*aggs)

    null_num = F.lit(None).cast("double")
    null_str = F.lit(None).cast("string")
    entries = []
    for name, typ in df.dtypes:
        is_num = typ.startswith(_NUMERIC)
        entries.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("__rows").alias("n_rows"),
                F.col(f"{name}__nulls").alias("n_nulls"),
                F.col(f"{name}__distinct").alias("n_distinct"),
                (F.col(f"{name}__min_num") if is_num else null_num).alias("min_num"),
                (F.col(f"{name}__max_num") if is_num else null_num).alias("max_num"),
                (F.col(f"{name}__min_str") if typ == "string" else null_str).alias(
                    "min_str"
                ),
                (F.col(f"{name}__max_str") if typ == "string" else null_str).alias(
                    "max_str"
                ),
            )
        )
    return wide.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
