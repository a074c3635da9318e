"""Incremental continuous-aggregate maintenance: keep the hour/day/
month rollup lattice (`continuous_aggregate_rollup`) current from an
event stream — the materialized-view twin of the batch GROUPING SETS
query, completing the foreachBatch maintenance family (CDC→SCD2,
drift monitor, ingest dedup).

Design — per-epoch DELTA partials, not read-modify-write merges:
each micro-batch writes its own partial aggregates (count + exact
integer cents per (granularity, bucket, type)) under an ``epoch=K``
partition via dynamic partition overwrite, so a REPLAYED epoch
rewrites its partition instead of double-counting — the property a
read-merge-rewrite design cannot give without transactional state.
Serving reads aggregate the partials (`read_rollup`) — bounded by
epochs-per-bucket, and counts/cents are algebraic, so partial
aggregation is exact. `compact_rollup` folds all epochs into one
(epoch = -1) through the atomic stage-and-swap writer when the
partial count grows — run it between streaming runs (it replaces the
whole table, same contract as any maintenance rewrite).

Scale posture per epoch: ONE pass over the batch expands the grouping
sets (map-side combine does most of the work — bucket cardinality ≪
row count); the write touches only this epoch's partition. At 100 TB,
partial files per bucket stay small because each epoch's partial is
one row per (granularity, bucket, type) it actually saw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)

_KEYS = ("granularity", "bucket", "event_type")


def rollup_partials(events: DataFrame) -> DataFrame:
    """One batch's partial lattice: ``(granularity, bucket,
    event_type, n_events, cents)`` via GROUPING SETS — one pass.

    The temp view is UNIQUELY NAMED per call and dropped after plan
    construction: a fixed session-global name races when two
    maintenance streams share one SparkSession (foreachBatch callbacks
    run on separate threads — one stream's createOrReplaceTempView
    could swap the base under the other's aggregation, committing the
    wrong batch's partials; review finding)."""
    import uuid

    view = f"__rollup_partials_{uuid.uuid4().hex[:12]}"
    spark = events.sparkSession
    events.select(
        F.date_trunc("hour", F.col("ts")).alias("hour_b"),
        F.date_trunc("day", F.col("ts")).alias("day_b"),
        F.date_trunc("month", F.col("ts")).alias("month_b"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
SELECT CASE WHEN grouping(hour_b) = 0 THEN 'hour'
            WHEN grouping(day_b) = 0 THEN 'day'
            ELSE 'month' END AS granularity,
       coalesce(hour_b, day_b, month_b) AS bucket,
       event_type,
       count(*) AS n_events,
       sum(cents) AS cents
FROM {view}
GROUP BY GROUPING SETS ((hour_b, event_type), (day_b, event_type),
                        (month_b, event_type))
"""
        )
    finally:
        spark.catalog.dropTempView(view)


def streaming_rollup_maintenance(
    event_stream: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Maintain the rollup partial table at ``table_path`` from a
    stream. Returns the started streaming query."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        overwrite_partitions_dynamic(
            rollup_partials(batch_df).withColumn(
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


def read_rollup(spark: SparkSession, table_path: str) -> DataFrame:
    """The served aggregate: fold partials across epochs (algebraic —
    exact regardless of how events were split into batches)."""
    return (
        spark.read.parquet(table_path)
        .groupBy(*_KEYS)
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            (F.sum("cents").cast("double") / 100.0).alias("total_value"),
        )
    )


def compact_rollup(spark: SparkSession, table_path: str) -> None:
    """Fold every epoch's partials into a single ``epoch = -1``
    partition (staged to a fresh versioned directory, then the atomic
    pointer flip — run between streaming runs). Serving results are
    unchanged — the fold is the same algebraic sum ``read_rollup``
    performs — and the partitioned layout stays uniform so a resumed
    stream keeps appending ``epoch=K`` partitions next to it."""
    import os
    import uuid

    from data_warehouse_migration_spark.sources.writers import (
        atomic_publish_dir,
    )

    partials = spark.read.parquet(table_path)
    compacted = (
        partials.groupBy(*_KEYS)
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .withColumn("epoch", F.lit(-1).cast("long"))
    )
    parent, base = os.path.split(os.path.abspath(table_path))
    stage = os.path.join(parent, f".{base}.__v_compact_{uuid.uuid4().hex[:8]}")
    compacted.write.mode("overwrite").partitionBy("epoch").parquet(stage)
    atomic_publish_dir(stage, table_path)
