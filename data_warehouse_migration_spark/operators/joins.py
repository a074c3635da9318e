"""Temporal joins: point-in-time (interval) join and as-of join.

The reference implements PIT attribution as a broadcast equi-join
followed by a range filter (``DF_Load_FactSales.json:112-120``;
canonical spec ``sql_scripts/fact_sales.sql:11-13`` —
``OrderDate >= ValidFrom AND OrderDate < ISNULL(ValidTo,'9999-12-31')``).
Spark-first improvement (SURVEY.md §2.3 J3): a single join whose
condition carries both the equi key and the range predicates. Catalyst
extracts the equi part for hashing and applies the range as a residual
filter inside the join — no post-join blow-up materialized.

100 TB posture: dimension sides of PIT joins are version tables (small
relative to facts) → broadcast by default. When the dim itself is huge,
the same call with ``broadcast_dim=False`` yields a sort-merge join on
the equi key with the interval residual; for extreme version counts per
key, pre-bucket both sides on the key (``df.write.bucketBy``) so the
join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_ENDED_SENTINEL = "9999-12-31"


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    ts: str,
    valid_from: str = "ValidFrom",
    valid_to: str = "ValidTo",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Attribute each fact row to the dim *version* valid at its event time.

    Join condition: ``facts[on] == dim[on] AND facts[ts] >= dim[valid_from]
    AND facts[ts] < coalesce(dim[valid_to], '9999-12-31')`` — half-open
    interval, NULL ``valid_to`` = current version (reference semantics,
    ``fact_sales.sql:11-13``). Dim columns keep their names; the join
    keys are emitted once (from the fact side).
    """
    keys = [on] if isinstance(on, str) else list(on)
    f = facts.alias("__f")
    d = (F.broadcast(dim) if broadcast_dim else dim).alias("__d")

    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__f.{k}") == F.col(f"__d.{k}"))
    sentinel = F.lit(OPEN_ENDED_SENTINEL).cast(dict(dim.dtypes)[valid_from])
    cond = (
        cond
        & (F.col(f"__f.{ts}") >= F.col(f"__d.{valid_from}"))
        & (F.col(f"__f.{ts}") < F.coalesce(F.col(f"__d.{valid_to}"), sentinel))
    )

    dim_cols = [c for c in dim.columns if c not in keys]
    return f.join(d, cond, how).select(
        *[F.col(f"__f.{c}") for c in facts.columns],
        *[F.col(f"__d.{c}") for c in dim_cols],
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    tolerance: str | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, the latest right row with ``right_ts <= left_ts``
    (per key) — the classic time-series as-of join the reference lacks
    but a 100 TB pipeline needs (market data, feature stores).

    Implementation: range join + ``row_number() == 1`` over
    ``(left row, right_ts DESC)``. The window partitions by the left
    row's identity, so each left row keeps at most one match. With
    ``tolerance`` (an INTERVAL string, e.g. ``'7 days'``), matches older
    than ``left_ts - tolerance`` are dropped. ``right_tiebreak`` names
    right-side columns that break equal-``right_ts`` ties (ascending) —
    pass a unique key to make the result total/deterministic.

    At scale prefer bucketing both sides by key; the interval condition
    stays a residual on a co-partitioned sort-merge join.
    """
    from pyspark.sql import Window

    keys = [on] if isinstance(on, str) else list(on)
    # Unique per-row id so the keep-latest window partitions by ROW, not
    # by value — two fully identical left rows each keep their own match
    # (a value-partitioned window would silently collapse them).
    l = left.withColumn("__row_id", F.monotonically_increasing_id()).alias("__l")  # noqa: E741
    r = right.alias("__r")

    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    cond = cond & (F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}"))
    if tolerance is not None:
        cond = cond & (
            F.col(f"__r.{right_ts}")
            >= F.col(f"__l.{left_ts}") - F.expr(f"INTERVAL {tolerance}")
        )

    value_cols = right_value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    joined = l.join(r, cond, "left")
    order = [F.col(f"__r.{right_ts}").desc_nulls_last()] + [
        F.col(f"__r.{c}").asc() for c in (right_tiebreak or [])
    ]
    w = Window.partitionBy(F.col("__l.__row_id")).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(f"__l.{c}") for c in left.columns],
            *[F.col(f"__r.{c}") for c in value_cols],
        )
    )
