"""Bounded-memory sequential recurrences over keyed, ordered event
series — the operator class (EWMA, decayed counters, compound growth)
that windows can't express and that naively drives people to
collect-the-whole-series-per-key folds.

The naive plan (``collect_list`` per key + ``aggregate`` fold) is
correct but holds one key's ENTIRE history in a single task's memory —
one hot user at 100 TB OOMs that task. A first-order linear recurrence
``state_i = A_i·state_{i-1} + B_i`` is associatively composable:
a run of elements collapses to one ``(A, B)`` pair with
``(A2,B2)∘(A1,B1) = (A1·A2, A2·B1 + B2)``, so the series can be
folded in bounded segments and the per-segment summaries stitched in
order — per-task state is ``seg_len`` structs regardless of how hot
the key is. (Same math GPU scan/prefix-sum libraries use; here it
buys a shuffle-native Spark plan with zero Python UDFs.)

For EWMA seeded with the first observation (DuckDB ``list_reduce``
semantics): element 1 contributes ``(A,B) = (0, x_1)``; every later
element ``(1-α, α·x)``. The zero first-element ``A`` makes the final
result independent of the fold's initial state by construction.

Stitch depth: one level bounds per-task state to ``seg_len`` and the
stitch array to ``n/seg_len`` — at ``seg_len`` = 4096 that is one
struct per ~4k events, 6 orders of magnitude off the raw series; for
adversarially hot keys beyond that, apply the same segmentation to the
stitch level (the composition is the same operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def segmented_ewma(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
    seg_len: int = 4096,
    out_col: str = "ewma_value",
) -> DataFrame:
    """Per-key EWMA (``e_1 = x_1``, ``e_i = α·x_i + (1-α)·e_{i-1}``)
    with per-task memory bounded by ``seg_len``.

    Returns one row per key: ``(key_col, n_events, out_col)``.
    Shuffles: the row_number window and the two groupBys all hash on
    ``key_col`` (AQE coalesces the reuse); bytes per key are the series
    once, then ``n/seg_len`` 17-byte summaries.
    """
    a = float(alpha)
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    rows = (
        df.select(
            key_col, *order_cols, F.col(value_col).cast("double").alias("__v")
        )
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__seg", F.floor((F.col("__rn") - 1) / seg_len).cast("int"))
    )
    # Fold each bounded segment to (A, B): applying it to an incoming
    # state s yields A*s + B. First element of the series is (0, x_1).
    per_seg = rows.groupBy(key_col, "__seg").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sort_array(
            F.collect_list(F.struct(F.col("__rn").alias("rn"), F.col("__v").alias("v")))
        ).alias("__a"),
    )
    folded = per_seg.select(
        key_col,
        "__seg",
        "__n",
        F.aggregate(
            "__a",
            F.struct(F.lit(1.0).alias("A"), F.lit(0.0).alias("B")),
            lambda acc, e: F.struct(
                F.when(e["rn"] == 1, F.lit(0.0))
                .otherwise(acc["A"] * F.lit(1.0 - a))
                .alias("A"),
                F.when(e["rn"] == 1, e["v"])
                .otherwise(F.lit(a) * e["v"] + F.lit(1.0 - a) * acc["B"])
                .alias("B"),
            ),
        ).alias("__f"),
    )
    # Stitch segment summaries in order — n/seg_len structs per key.
    return (
        folded.groupBy(key_col)
        .agg(
            F.sum("__n").alias("n_events"),
            F.sort_array(
                F.collect_list(F.struct(F.col("__seg").alias("s"), F.col("__f").alias("f")))
            ).alias("__segs"),
        )
        .select(
            key_col,
            "n_events",
            F.aggregate(
                "__segs",
                F.struct(F.lit(1.0).alias("A"), F.lit(0.0).alias("B")),
                lambda acc, e: F.struct(
                    (acc["A"] * e["f"]["A"]).alias("A"),
                    (e["f"]["A"] * acc["B"] + e["f"]["B"]).alias("B"),
                ),
            )["B"].alias(out_col),
        )
    )
