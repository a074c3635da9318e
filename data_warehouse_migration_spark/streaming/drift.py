"""Streaming corpus-drift monitoring: maintain the incoming
snapshot's token histogram from a document stream and emit an add-1-
smoothed symmetric KL divergence against a fixed reference histogram
after every micro-batch — the continuous form of the batch monitor
(`queries/quality_ops.corpus_drift_kl`), completing the monitoring
story the way `streaming/cdc.py` does for dimension maintenance.

Why ``foreachBatch`` and not a stateful streaming aggregation: the
KL needs the FULL running histogram joined against the reference on
every emission (a vocabulary-sized full-outer merge), which append/
update-mode sinks cannot express; the micro-batch boundary is exactly
the "one monitoring epoch" unit. State is per-epoch DELTA
count partials under ``epoch=K`` partitions (dynamic partition
overwrite — the rollup pattern): a replayed epoch REWRITES its own
partition instead of re-merging into a running table, which is what
makes crash replay exact (the original read-merge-overwrite design
double-counted a replayed batch's tokens — review finding). The
served histogram is the fold of partials (`read_drift_state`),
readable by any job between epochs; per-epoch KL rows land in
epoch partitions of the results table the same replay-safe way.

Scale posture per epoch: batch token-count (map-side combined), one
vocabulary-sized merge into the state table, one vocabulary-sized
full-outer join against the reference, a 1-row result append. The
document text never shuffles. At very high ingest rates, widen the
trigger interval so each epoch amortizes more documents — the cost
per epoch is vocabulary-bound, not batch-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from data_warehouse_migration_spark.operators.drift import (
    kl_between_counts,
    token_counts,
)
from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)


def read_drift_state(spark, state_path: str) -> "DataFrame":
    """The served running histogram: fold the per-epoch count
    partials — vocabulary-sized, exact integer sums, identical to the
    one-shot count of everything streamed (merge_token_counts of the
    epochs, expressed as one groupBy)."""
    return (
        spark.read.parquet(state_path)
        .groupBy("t")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def streaming_corpus_drift(
    doc_stream: DataFrame,
    reference_counts: DataFrame,
    state_path: str,
    results_path: str,
    checkpoint: str,
    text_col: str = "text",
    available_now: bool = True,
):
    """Drive a stream of documents into a running token-count table at
    ``state_path`` and append one KL row per micro-batch to
    ``results_path``: ``(epoch, n_tokens_a, n_tokens_b, vocab_union,
    kl_ab, kl_ba)`` where side *a* is the fixed ``reference_counts``
    ``(t, c)`` table and side *b* is everything streamed so far.

    Replay-safe BY CONSTRUCTION: the batch's token counts land as an
    ``epoch=K`` partition (replay rewrites it), and the KL row for the
    epoch does the same — no read-merge-rewrite anywhere, so a crash
    between the state write and the checkpoint commit cannot
    double-count. Returns the started streaming query.
    """
    ref = reference_counts.select("t", F.col("c").cast("long").alias("c"))

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        overwrite_partitions_dynamic(
            token_counts(batch_df, text_col=text_col).withColumn(
                "epoch", F.lit(int(epoch_id)).cast("long")
            ),
            state_path,
            partition_by=["epoch"],
        )
        kl = kl_between_counts(ref, read_drift_state(spark, state_path)).withColumn(
            "epoch", F.lit(int(epoch_id)).cast("long")
        )
        overwrite_partitions_dynamic(kl, results_path, partition_by=["epoch"])

    writer = doc_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
