"""Streaming exact-distinct maintenance: keep per-(type, day) user
bitmaps current from an event stream — the foreachBatch twin of the
batch `bitmap_distinct_rollup`, and the last member of the mergeable-
structure maintenance family (rollup partials, count-min grids,
moment sums, drift histograms). The bitmap's algebra is the strongest
of the set: ``bit_or`` is idempotent AND commutative, so replays,
reorderings, and overlapping batches all fold to the identical set —
exact distinct counts survive every delivery glitch that breaks a
naive counter.

Same per-epoch DELTA design as streaming/rollup.py: each micro-batch
writes its own partial words under ``epoch=K`` (dynamic partition
overwrite ⇒ replay rewrites). Serving folds words with ``bit_or``
across epochs; cross-day distinct totals are a further fold of the
SAME stored words — never a rescan of events, never an approximation.

Scale posture per epoch: one map-side-combined (type, day, word)
aggregation over the batch; serving touches word tables only
(≤ keyspace/64 rows per group × epochs; compaction bounds the epoch
factor between runs, the rollup pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.bitmaps import key_bitmap
from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)


def bitmap_partials(events: DataFrame) -> DataFrame:
    """One batch's partial words ``(event_type, day, word_idx, word)``."""
    ev = events.select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    )
    return key_bitmap(ev, ["event_type", "day"], "user_id")


def streaming_bitmap_maintenance(
    event_stream: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Maintain the per-epoch bitmap partial table from a stream.
    Returns the started streaming query."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        overwrite_partitions_dynamic(
            bitmap_partials(batch_df).withColumn(
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


def compact_bitmap_partials(spark: SparkSession, table_path: str) -> None:
    """Fold every epoch's partial words into a single ``epoch = -1``
    partition (staged to a fresh versioned directory, then the atomic
    pointer flip — run between streaming runs; the
    `streaming/rollup.compact_rollup` pattern). Serving results are
    unchanged — the fold is the same ``bit_or`` the readers perform,
    and bit_or idempotence means even a compaction racing a replayed
    epoch can only re-assert bits, never double-count. The layout
    stays uniform so a resumed stream keeps appending ``epoch=K``
    partitions next to the compacted base."""
    import os
    import uuid

    from data_warehouse_migration_spark.sources.writers import (
        atomic_publish_dir,
    )

    partials = spark.read.parquet(table_path)
    compacted = (
        partials.groupBy("event_type", "day", "word_idx")
        .agg(F.expr("cast(bit_or(word) as long)").alias("word"))
        .withColumn("epoch", F.lit(-1).cast("long"))
    )
    parent, base = os.path.split(os.path.abspath(table_path))
    stage = os.path.join(parent, f".{base}.__v_compact_{uuid.uuid4().hex[:8]}")
    compacted.write.mode("overwrite").partitionBy("epoch").parquet(stage)
    atomic_publish_dir(stage, table_path)


def read_bitmap_rollup(spark: SparkSession, table_path: str) -> DataFrame:
    """Serve the per-type summary — bit-identical to the one-shot
    batch `bitmap_distinct_rollup` output: daily exact distincts from
    the epoch-folded words, cross-day totals from a further bit_or of
    the same words."""
    from data_warehouse_migration_spark.operators.bitmaps import (
        bitmap_cardinality,
        bitmap_merge,
    )

    words = spark.read.parquet(table_path).drop("epoch")
    daily_bm = bitmap_merge(words, ["event_type", "day"])
    daily = bitmap_cardinality(daily_bm, ["event_type", "day"])
    total = bitmap_cardinality(
        bitmap_merge(daily_bm.drop("day"), ["event_type"]), ["event_type"]
    ).withColumnRenamed("n_distinct", "distinct_users_total")
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n_distinct").alias("sum_daily_distinct"),
        )
        .join(total, "event_type")
    )


def read_rolling_wau(spark: SparkSession, table_path: str) -> DataFrame:
    """Serve rolling 7-day distinct users (WAU) from the SAME stored
    day-word state `streaming_bitmap_maintenance` maintains — the
    streaming completion of the batch `rolling_weekly_active_users`
    (VERDICT r6 #7): fold the epoch partials to per-day bitmaps
    (bit_or is idempotent + commutative, so replays/overlaps
    vanish), drop the event_type axis with a further bit_or (union
    over types ≡ the batch query's type-free day bitmaps), then the
    identical constant-7× window replication + popcount. Events are
    never rescanned: WAU updates ride entirely on word tables.

    Scale: serving shuffles (day, word) pairs with a 7× constant
    fan-out — independent of event count AND of epoch count after
    compaction (:func:`compact_bitmap_partials`)."""
    from data_warehouse_migration_spark.operators.bitmaps import (
        bitmap_cardinality,
        bitmap_merge,
    )

    words = spark.read.parquet(table_path).drop("epoch", "event_type")
    day_bm = bitmap_merge(words, ["day"])
    days = day_bm.select("day").distinct()
    contrib = day_bm.select(
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("win_day"),
        "word_idx",
        "word",
    ).join(days.withColumnRenamed("day", "win_day"), "win_day")
    rolled = contrib.groupBy("win_day", "word_idx").agg(
        F.expr("cast(bit_or(word) as long)").alias("word")
    )
    return bitmap_cardinality(rolled, ["win_day"]).select(
        F.col("win_day").alias("day"), F.col("n_distinct").alias("wau")
    )
