"""Streaming count-min maintenance: keep a corpus-wide token-frequency
sketch (operators/sketches.py) current from a document stream — the
foreachBatch twin of the batch `heavy_hitters_cms` gate, exploiting
the sketch's defining algebra: SUM of per-batch sketches = sketch of
the union, exactly.

Same per-epoch DELTA design as streaming/rollup.py (not
read-modify-write): each micro-batch writes ITS OWN partial counter
grid under an ``epoch=K`` partition via dynamic partition overwrite,
so a replayed epoch rewrites its partition instead of double-counting.
Serving (`read_cms`) folds the partials cell-wise — bounded by
depth×width×epochs, independent of corpus size; `compact_cms` folds
all epochs into one between runs.

Scale posture per epoch: one map-side-combined token count over the
batch, one (r, bucket) aggregation to ≤ depth×width cells, a write
touching only this epoch's partition. The served sketch is
depth×width rows FOREVER — the monitoring table for "what are the
hot tokens/domains/URLs in the last N epochs" never grows with the
corpus, which is the whole point of sketching the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.sketches import cms_counters
from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)


def cms_batch_partial(
    docs: DataFrame, depth: int, width: int, text_col: str = "text"
) -> DataFrame:
    """One batch's partial counter grid ``(r, bucket, total)`` over
    its normalized token stream."""
    from data_warehouse_migration_spark.operators.sketches import word_counts

    return cms_counters(
        word_counts(docs, text_col), "tok", "c", depth, width
    )


def streaming_cms_maintenance(
    doc_stream: DataFrame,
    table_path: str,
    checkpoint: str,
    depth: int,
    width: int,
    text_col: str = "text",
    available_now: bool = True,
):
    """Maintain the per-epoch CMS partial table at ``table_path`` from
    a document stream. Returns the started streaming query."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        overwrite_partitions_dynamic(
            cms_batch_partial(batch_df, depth, width, text_col).withColumn(
                "epoch", F.lit(int(epoch_id)).cast("long")
            ),
            table_path,
            partition_by=["epoch"],
        )

    writer = doc_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms(spark: SparkSession, table_path: str) -> DataFrame:
    """The served sketch: fold partials cell-wise across epochs —
    bit-identical to the one-shot batch sketch over the union of all
    batches (integer sums; no batching artifact whatsoever)."""
    return (
        spark.read.parquet(table_path)
        .groupBy("r", "bucket")
        .agg(F.sum("total").cast("long").alias("total"))
    )


def compact_cms(spark: SparkSession, table_path: str) -> None:
    """Fold every epoch's partials into a single ``epoch = -1``
    partition through the atomic stage-and-swap publish — run between
    streaming runs; serving results are unchanged."""
    import os
    import uuid

    from data_warehouse_migration_spark.sources.writers import (
        atomic_publish_dir,
    )

    compacted = read_cms(spark, table_path).withColumn(
        "epoch", F.lit(-1).cast("long")
    )
    parent, base = os.path.split(os.path.abspath(table_path))
    stage = os.path.join(parent, f".{base}.__v_compact_{uuid.uuid4().hex[:8]}")
    compacted.write.mode("overwrite").partitionBy("epoch").parquet(stage)
    atomic_publish_dir(stage, table_path)


def hdr_batch_partial(events: DataFrame) -> DataFrame:
    """One batch's partial HDR histogram ``(event_type, e, sub, cnt)``
    over exact value cents (operators/histogram_sketch.py). Domain
    enforcement rides on hdr_histogram itself: a negative cents value
    in any micro-batch raises inside that epoch (failing the stream
    loudly) rather than folding a mis-bucketed cell into the at-rest
    sketch — zero is in-domain (dedicated zero bucket)."""
    from data_warehouse_migration_spark.operators.histogram_sketch import (
        hdr_histogram,
    )

    ev = events.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return hdr_histogram(ev, ["event_type"], "cents")


def streaming_hdr_maintenance(
    event_stream: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Maintain per-epoch HDR histogram partials from an event stream
    — the quantile member of the mergeable-maintenance family (rollup
    counts, count-min cells, anomaly moments, distinct bitmaps): the
    histogram merge is an exact integer cell sum, so the served
    quantiles are bit-identical to the one-shot batch sketch whatever
    the batch boundaries. Same epoch=K dynamic-overwrite replay
    contract as every sibling. Returns the started query."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        overwrite_partitions_dynamic(
            hdr_batch_partial(batch_df).withColumn(
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


def read_hdr_quantiles(
    spark: SparkSession, table_path: str, qs: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> DataFrame:
    """Served quantiles from the folded partials — identical output
    (and oracle) to the batch `hdr_quantile_sketch`."""
    from data_warehouse_migration_spark.operators.histogram_sketch import (
        hdr_quantiles,
        merge_histograms,
    )

    partials = spark.read.parquet(table_path).drop("epoch")
    return hdr_quantiles(merge_histograms(partials), ["event_type"], qs=qs)
