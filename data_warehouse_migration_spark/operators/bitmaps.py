"""Bitmap-based EXACT distinct aggregation — the groupBitmap /
roaring-bitmap pattern (ClickHouse, Druid): represent a set of
integer keys as 64-bit words (word_idx = key div 64, bit = key mod
64), so distinct counts become ``sum(bit_count(word))`` and — the
property HLL cannot offer exactly — set UNIONS across days/segments
become ``bit_or`` folds of stored words. A continuous "distinct users
this week/month" rollup never re-scans raw events and never
approximates.

Where it sits next to HLL (`hll_sketch_rollup`): HLL is O(1.5 kB) per
group at ~2% error for UNBOUNDED key spaces; bitmaps are exact with
storage ∝ key-space/64 per group — the right tool when ids are dense
integers (surrogate user keys are, by construction — SURVEY §7.2).
For sparse/64-bit id spaces, production compresses words to roaring
containers; the plan shape (word-keyed groupBy + bit_or) is
unchanged, which is what the operator attests.

Scale: the bitmap build is one map-side-combined shuffle keyed
(group, word_idx); merges and cardinalities run on word tables
(≤ keyspace/64 rows per group), never on events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_bitmap(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """Bitmap words ``(group..., word_idx, word)`` over a non-negative
    integer key column. Duplicate keys collapse in the bit_or — the
    bitmap IS the distinct set."""
    rows = df.select(
        *group_cols,
        F.expr(f"{key_col} div 64").alias("word_idx"),
        F.expr(f"shiftleft(1L, cast({key_col} % 64 as int))").alias("w"),
    )
    return rows.groupBy(*group_cols, "word_idx").agg(
        F.expr("cast(bit_or(w) as long)").alias("word")
    )


def bitmap_merge(bm: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union bitmaps down to ``group_cols`` (drop finer grouping
    columns first): bit_or per word — set union with zero rescan."""
    return bm.groupBy(*group_cols, "word_idx").agg(
        F.expr("cast(bit_or(word) as long)").alias("word")
    )


def bitmap_cardinality(bm: DataFrame, group_cols: list[str]) -> DataFrame:
    """Exact distinct count per group: Σ popcount(word)."""
    return bm.groupBy(*group_cols).agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_distinct")
    )
