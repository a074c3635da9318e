"""Skew-mitigation utilities for hot keys (100 TB posture).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin`` — on in our session factory); these
helpers cover the two shapes AQE does not:

- :func:`salted_agg` — a single scorching groupBy key (one user with
  10% of all events) serializes its partition. Two-phase: salt the key
  into N shards, partial-aggregate per (key, salt), final-aggregate
  per key. Works for any algebraic aggregate (sum/count/min/max).
- :func:`salted_broadcast_left` — skewed key on the *stream* side of a
  broadcast join is already fine (no shuffle); for a shuffle join with
  a hot left key, replicate the right side N ways and salt the left.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``aggs``: output name → (function, column) with function ∈
    {sum, count, min, max} (algebraic: partials recombine with the
    same function, except count whose partials re-combine with sum).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    partial_exprs = []
    final_exprs = []
    for name, (fn, col) in aggs.items():
        p = f"__p_{name}"
        partial_exprs.append(getattr(F, fn)(col).alias(p))
        refn = "sum" if fn == "count" else fn
        final_exprs.append(getattr(F, refn)(p).alias(name))
    return (
        salted.groupBy(*keys, "__salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with a salted left side: right rows replicate into
    every salt bucket, left rows land in one — hot left keys spread
    over ``salt_buckets`` tasks instead of one."""
    lsalted = left.withColumn(
        "__salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    rreplicated = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = lsalted.join(rreplicated, [on, "__salt"], how)
    return out.drop("__salt")


def key_skew_profile(df: DataFrame, key: str | Column, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total for the heaviest
    keys — the first thing to run when a stage straggles."""
    key_col = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(key_col.alias("key")).agg(F.count(F.lit(1)).alias("n"))
    # total as a broadcast 1-row aggregate of the per-key counts: no
    # driver action, no second scan of df
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n") / F.col("__total"))
        .drop("__total")
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(top)
    )
