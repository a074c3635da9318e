"""Streaming volume-anomaly monitoring: maintain per-type hourly
totals AND the per-type moment sums (n, Σx, Σx²) from an event
stream, and score anomalies on read — the foreachBatch twin of the
batch `hourly_anomaly_zscores`, completing the monitoring family
(drift KL, count-min heavy hitters, continuous rollups).

Same per-epoch DELTA design as streaming/rollup.py: each micro-batch
writes its own partial ``(event_type, bucket, cents)`` rows under an
``epoch=K`` partition (replay rewrites, never double-counts). Moments
are ALGEBRAIC — n, s1, s2 fold across epochs by plain integer sums
(no Welford carry state), so the served scores are bit-identical to
the one-shot batch computation over the union of all batches; the
gate attests exactly that against the batch query's oracle.

Scale posture per epoch: one map-side-combined hourly aggregation
over the batch; the write touches only this epoch's partition. The
read path folds (types × hours × epochs) partial rows — compaction
(`streaming/rollup.compact_rollup` shape) bounds the epoch factor
between runs. Scoring joins a per-type 1-row stats table back to the
bucket table — types-sized, broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)


def hourly_partials(events: DataFrame) -> DataFrame:
    """One batch's partial hourly cents ``(event_type, bucket, cents)``."""
    return (
        events.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.sum("c").alias("cents"))
    )


def streaming_anomaly_maintenance(
    event_stream: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Maintain the per-epoch hourly-partial table from a stream.
    Returns the started streaming query."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        overwrite_partitions_dynamic(
            hourly_partials(batch_df).withColumn(
                "epoch", F.lit(int(epoch_id)).cast("long")
            ),
            table_path,
            partition_by=["epoch"],
        )

    writer = event_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_anomalies(
    spark: SparkSession, table_path: str, z_threshold: float = 2.5
) -> DataFrame:
    """Serve the anomaly report from the folded partials — identical
    math (and output) to the batch `hourly_anomaly_zscores`: exact
    integer moments, one rounded z per (type, hour), flagged on the
    rounded score."""
    h = (
        spark.read.parquet(table_path)
        .groupBy("event_type", "bucket")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    stats = h.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("cents").alias("s1"),
        # decimal(38,0) accumulation — the batch query's overflow-safe
        # Σcents² (squared bucket aggregates wrap int64 at scale)
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "s2"
        ),
    )
    mean = F.col("s1").cast("double") / F.col("n_buckets")
    var = F.col("s2").cast("double") / F.col("n_buckets") - mean * mean
    z = F.round((F.col("cents") - mean) / F.sqrt(var), 6)
    return (
        h.join(stats, "event_type")
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) >= z_threshold)
        .select(
            "event_type",
            "bucket",
            (F.col("cents") / 100.0).alias("hourly_total"),
            "zscore",
        )
    )
