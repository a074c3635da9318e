"""Streaming event operators: tumbling windows, sessionization, dedup.

All take an unbounded DataFrame (``spark.readStream``) and return a
transformed streaming DataFrame; callers pick the sink/trigger. Tests
drive them with ``trigger(availableNow=True)`` over the driver's
events parquet — the bounded-execution mode that exercises the exact
streaming plan (watermarks, state stores) and then terminates.

Scale posture: watermarks bound state; session state is per
``user_id`` (the shuffle key); at 1000 executors the state store
partitions with the shuffle, and RocksDB state backend replaces the
default in-memory store via config, not code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """``readStream`` over an events parquet directory.

    Schema is pinned from a batch peek (streaming sources require a
    schema). The driver's ``events.ts`` is parquet ``timestamp[us]``
    (no zone), which Spark reads as TIMESTAMP_NTZ — but ``withWatermark``
    requires TIMESTAMP, so the event time is normalized here. The
    session timezone is pinned to UTC (session.py), so the NTZ→TIMESTAMP
    cast is lossless. Two defensive branches cover other arrivals:
    bigint ns-epochs (older testdata stored TIMESTAMP(NANOS), readable
    via ``nanosAsLong``) and already-TIMESTAMP columns (no-op).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        # Streaming file sources require a directory; target a single
        # file via its parent + glob filter.
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    stream = reader.parquet(path)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":  # defensive: ns-epoch testdata shape
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":  # primary: timestamp[us] parquet
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def streaming_tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregate — the streaming twin of
    ``operators.sessionize.tumbling_window_agg`` (same grouping
    expression; the watermark adds late-data cutoff + state eviction).
    Pass ``slide`` shorter than ``duration`` for a sliding (hopping)
    window: each event lands in duration/slide overlapping windows,
    expanded window-side before the aggregate exactly as in batch.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("__cents", cents)
        .groupBy(
            F.window(F.col(ts_col), duration, slide or duration).alias("w"),
            F.col(group_col),
        )
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


def streaming_sessionize(
    events: DataFrame,
    gap="30 minutes",  # str, or a Column for per-event dynamic gaps
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions via ``session_window`` — Spark's native
    stateful session operator (merges windows closer than ``gap``).

    Semantics note vs the batch twin (``operators.sessionize``): the
    batch version numbers sessions per user; ``session_window``
    identifies a session by its (start, end) interval. Both split on
    the same gap rule, so session boundaries agree; only the id shape
    differs.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("__cents", cents)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("__cents") / 100.0).alias("total_value"),
        )
        .select(
            F.col(user_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once event dedup within the watermark horizon
    (``dropDuplicatesWithinWatermark``) — the streaming counterpart of
    the batch exact-dedup operator; state is bounded by the watermark
    instead of growing forever (the 100 TB requirement)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def streaming_user_running_totals(
    events: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    lifetime running totals, carried across micro-batches in the state
    store — the extension point for stateful logic ``groupBy.agg`` and
    ``session_window`` cannot express (per-key accumulators, custom
    eviction, decision state machines).

    State is one (n, cents) pair per user — constant bytes per key;
    keys partition with the shuffle, so 1000 executors hold 1/1000 of
    the users each. Value math is exact integer cents (same rule as the
    batch aggregates). Arrow moves each group's rows to Python in
    batches — this is the sanctioned Pandas path, not a row-at-a-time
    UDF.
    """
    import pandas as pd  # local import: only the stateful path needs it
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_cents += int(pdf[value_col].mul(100).round().sum())
        state.update((n, total_cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
            }
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, cents bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_click_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join — the streaming twin of the batch
    ``interval_click_attribution`` catalog query: each purchase joined
    to the same user's clicks from the preceding ``lookback`` window.

    Both sides carry watermarks so the state store can evict: a click
    older than purchase-watermark − lookback can never match again and
    is dropped. The join key (user_id) partitions state with the
    shuffle; the time range is the join residual — identical plan shape
    to the batch query, plus bounded state.

    Inputs must expose ``(purchase_id, user_id, p_ts)`` and
    ``(click_id, c_user, c_ts)`` as produced by
    :func:`split_event_stream`.
    """
    p = purchases.withWatermark("p_ts", watermark)
    c = clicks.withWatermark("c_ts", watermark)
    cond = (
        (p["user_id"] == c["c_user"])
        & (c["c_ts"] <= p["p_ts"])
        & (c["c_ts"] >= p["p_ts"] - F.expr(f"INTERVAL {lookback}"))
    )
    return p.join(c, cond, "leftOuter").select(
        "purchase_id", "user_id", "p_ts", "click_id", "c_ts"
    )


def split_event_stream(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project an event stream into (purchases, clicks) legs with the
    column names :func:`streaming_click_attribution` expects."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return purchases, clicks


def run_stream_to_memory(
    spark: SparkSession,
    stream: DataFrame,
    name: str,
    output_mode: str = "complete",
    timeout_s: int = 300,
) -> DataFrame:
    """Drive a streaming DataFrame to completion
    (``trigger(availableNow=True)``) into a memory-sink table and
    return it as a batch DataFrame — the harness the oracle-gate
    streaming queries use: a bounded run of the exact unbounded plan
    (watermarks, state store, micro-batch scheduler), hash-comparable
    against a batch SQL oracle afterward.

    Re-entrant per session: a previous gate query with the same name is
    stopped and its memory table replaced; each run gets a fresh
    checkpoint (removed afterward — the run is complete, there is
    nothing to resume).
    """
    import shutil
    import tempfile

    for active in spark.streams.active:
        if active.name == name:
            active.stop()
    ckpt = tempfile.mkdtemp(prefix=f"{name}_ckpt_")
    try:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # awaitTermination(timeout) returns False on timeout with the
        # query still running — reading the memory sink then would hand
        # the caller a partially-filled table (a confusing hash-mismatch
        # instead of a clear error), and rmtree would yank the
        # checkpoint from under a live query. Fail loudly instead.
        if not q.awaitTermination(timeout_s):
            exc = q.exception()
            q.stop()
            raise TimeoutError(
                f"streaming gate {name!r} did not finish within "
                f"{timeout_s}s" + (f"; query exception: {exc}" if exc else "")
            )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def run_stream_to_parquet(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
    available_now: bool = True,
):
    """Drive a streaming DataFrame into partition-friendly Parquet via
    ``foreachBatch`` — the production sink pattern: each micro-batch is
    a *batch* DataFrame, so any batch writer (partitioned parquet,
    upsert, bucketed table) works unchanged, and the checkpoint gives
    exactly-once per epoch. ``available_now`` processes the current
    backlog then stops (scheduled-incremental mode); pass False for a
    continuously running query.
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode(mode).parquet(path)

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_user_ewma(
    events: DataFrame,
    alpha: float = 0.3,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Stateful streaming EWMA — the incremental twin of
    ``operators/recurrence.segmented_ewma`` (same recurrence:
    e_1 = x_1, e_i = α·x_i + (1−α)·e_{i−1}).

    State per user is ONE (n, ewma) pair — constant bytes, the
    streaming answer to the unbounded-history problem the batch
    operator solves with segment-fold-stitch. Rows are event-time
    sorted within each micro-batch (``ts_col`` then ``tiebreak_col``,
    matching the batch twin's ordering); cross-batch correctness
    assumes per-key event-time-ordered arrival between batches (true
    for ordered sources like time-partitioned file drops — for
    disordered producers, front with a watermark-delayed foreachBatch
    sorter). The output key column is named after ``user_col``.
    """
    import pandas as pd  # local import: only the stateful path needs it
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = float(alpha)

    def update(key, pdfs, state: GroupState):
        n, ewma = state.get if state.exists else (0, 0.0)
        chunks = [pdf for pdf in pdfs]
        rows = pd.concat(chunks) if chunks else pd.DataFrame()
        if len(rows):
            rows = rows.sort_values([ts_col, tiebreak_col])
            for v in rows[value_col].astype(float):
                ewma = v if n == 0 else a * v + (1.0 - a) * ewma
                n += 1
        state.update((n, float(ewma)))
        yield pd.DataFrame(
            {user_col: [key[0]], "n_events": [n], "ewma_value": [float(ewma)]}
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=f"{user_col} bigint, n_events bigint, ewma_value double",
            stateStructType="n bigint, ewma double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
