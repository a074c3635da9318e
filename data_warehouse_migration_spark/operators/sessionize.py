"""Event-stream operators (batch-first; streaming twins in streaming/).

The driver's ``events`` table (event_id, ts, user_id, event_type,
value, props) drives these. Batch formulations are windows/groupBys so
the DuckDB oracle can verify them; the streaming module re-expresses
tumbling windows and sessionization with ``readStream`` + watermarks.

Scale: both operators shuffle once on ``user_id`` (sessionize) or on
(window, event_type) (tumbling). Sessionization's per-user window sort
is the classic formulation; skewed power-users are handled by AQE skew
splitting, or at the extreme by a two-phase salt + re-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the gap
    from the user's previous event exceeds ``gap_minutes``.

    ``session_seq`` is the per-user 1-based session index (cumulative
    sum of session-start flags over the event order) — deterministic
    given the (ts, event_id) tie-broken ordering.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    # Microsecond-exact gap (session tz is UTC, so the NTZ→LTZ cast is
    # lossless) — avoids second-truncation edge disagreements.
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = micros - F.lag(micros).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return events.withColumn("__new", is_new).withColumn(
        "session_seq",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("__new")


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregate: bounds, event count, exact value total.

    ``total_value`` goes through integer cents so the sum is
    order-independent and oracle-exact.
    """
    s = sessionize(events, gap_minutes, user_col, ts_col)
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        s.withColumn("__cents", cents)
        .groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("__cents") / 100.0).alias("total_value"),
        )
    )


def tumbling_window_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window aggregate via ``F.window`` — the same expression
    works unchanged under Structured Streaming (streaming/events.py)."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        events.withColumn("__cents", cents)
        .groupBy(F.window(F.col(ts_col), duration).alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("__cents") / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(group_col),
            "n_events",
            "total_value",
        )
    )
