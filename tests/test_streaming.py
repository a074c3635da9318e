"""Streaming operators driven with trigger(availableNow) over the
driver's events parquet — executes the real streaming plan (watermark,
state store) to completion, then cross-checks against the batch twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_migration_spark.catalog import t
from data_warehouse_migration_spark.operators.sessionize import tumbling_window_agg
from data_warehouse_migration_spark.streaming.events import (
    read_event_stream,
    streaming_dedup,
    streaming_sessionize,
    streaming_tumbling_agg,
)


def run_to_table(spark, sdf, name, tmpdir):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if sdf.isStreaming else "append")
        .option("checkpointLocation", f"{tmpdir}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture(scope="module")
def events_path(sf_dir):
    return f"{sf_dir}/events.parquet"


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_path, tmp_path):
    stream = streaming_tumbling_agg(read_event_stream(spark, events_path))
    got = run_to_table(spark, stream, "stream_tumbling", str(tmp_path))

    batch = tumbling_window_agg(t(spark, sf_dir, "events"))
    s = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in got.collect()
    }
    b = {
        (r.window_start.replace(tzinfo=None) if r.window_start.tzinfo else r.window_start,
         r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    s = {(k[0].replace(tzinfo=None) if k[0].tzinfo else k[0], k[1]): v
         for k, v in s.items()}
    assert s == b


def test_streaming_sessionize_boundaries_match_batch(spark, events_path, sf_dir, tmp_path):
    stream = streaming_sessionize(read_event_stream(spark, events_path))
    got = run_to_table(spark, stream, "stream_sessions", str(tmp_path))

    from data_warehouse_migration_spark.operators.sessionize import session_stats

    batch = session_stats(t(spark, sf_dir, "events"), gap_minutes=30)
    # Compare per-user (session_start, n_events, total_value) sets:
    # session ids differ by design, boundaries must agree.
    def key(r, start_attr):
        ts = getattr(r, start_attr)
        ts = ts.replace(tzinfo=None) if getattr(ts, "tzinfo", None) else ts
        return (r.user_id, ts, r.n_events, round(r.total_value, 2))

    s = {key(r, "session_start") for r in got.collect()}
    b = {key(r, "session_start") for r in batch.collect()}
    assert s == b


def test_streaming_dedup_drops_duplicate_ids(spark, events_path, tmp_path):
    stream = read_event_stream(spark, events_path)
    # duplicate the stream rows by unioning it with itself
    deduped = streaming_dedup(stream.union(stream))
    q = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("stream_dedup")
    total = spark.read.parquet(events_path).count()
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total


def test_streaming_stateful_running_totals_match_batch(
    spark, events_path, sf_dir, tmp_path
):
    from data_warehouse_migration_spark.streaming.events import (
        streaming_user_running_totals,
    )

    stream = streaming_user_running_totals(read_event_stream(spark, events_path))
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_totals")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_path}/ckpt_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # availableNow may run several micro-batches; the LAST row per user
    # is the lifetime total.
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("stream_totals").collect()
    }
    batch = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("v"),
        )
    )
    expected = {r.user_id: (r.n, r.v) for r in batch.collect()}
    assert got == expected


def test_streaming_interval_join_matches_batch(spark, events_path, sf_dir, tmp_path):
    from data_warehouse_migration_spark.streaming.events import (
        split_event_stream,
        streaming_click_attribution,
    )

    stream = read_event_stream(spark, events_path)
    p, c = split_event_stream(stream)
    joined = streaming_click_attribution(p, c, lookback="1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("stream_attrib")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt_attrib")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.table("stream_attrib").collect()
        if r.click_id is not None  # outer-null rows need a closed watermark;
        # matched pairs must agree exactly with the batch join
    }
    bp, bc = split_event_stream(t(spark, sf_dir, "events"))
    cond = (
        (bp["user_id"] == bc["c_user"])
        & (bc["c_ts"] <= bp["p_ts"])
        & (bc["c_ts"] >= bp["p_ts"] - F.expr("INTERVAL 1 HOUR"))
    )
    expected = {
        (r.purchase_id, r.click_id)
        for r in bp.join(bc, cond, "inner").collect()
    }
    assert got == expected


def test_foreachbatch_parquet_sink_exactly_once(spark, events_path, tmp_path):
    from data_warehouse_migration_spark.streaming.events import (
        run_stream_to_parquet,
    )

    stream = read_event_stream(spark, events_path)
    q = run_stream_to_parquet(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    src = spark.read.parquet(events_path)
    assert out.count() == src.count()
    # restart with same checkpoint + no new data → no duplicates
    q2 = run_stream_to_parquet(
        read_event_stream(spark, events_path),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == src.count()


def test_streaming_ewma_matches_batch_recurrence(spark, events_path, sf_dir, tmp_path):
    """The constant-state streaming EWMA must reproduce the batch
    segment-fold-stitch operator per user (same recurrence, same
    (ts, event_id) order) to 6 decimals."""
    from data_warehouse_migration_spark.operators.recurrence import segmented_ewma
    from data_warehouse_migration_spark.streaming.events import streaming_user_ewma

    stream = streaming_user_ewma(read_event_stream(spark, events_path))
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_ewma")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_path}/ckpt_ewma")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, round(r.ewma_value, 6))
        for r in spark.table("stream_ewma").collect()
    }
    batch = segmented_ewma(
        t(spark, sf_dir, "events"),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        value_col="value",
        alpha=0.3,
        seg_len=64,
    )
    expected = {
        r.user_id: (r.n_events, round(r.ewma_value, 6)) for r in batch.collect()
    }
    assert got == expected
