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
the "one monitoring epoch" unit. State is a parquet count table
updated by the atomic stage-and-swap writer — distributed, no driver
state, readable by any other job between epochs — and the per-epoch
KL rows append to a results log a dashboard tails.

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
from pyspark.sql.utils import AnalysisException

from data_warehouse_migration_spark.operators.drift import (
    kl_between_counts,
    merge_token_counts,
    token_counts,
)
from data_warehouse_migration_spark.sources.writers import (
    atomic_overwrite_parquet,
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

    Replay-safe: an epoch re-run re-derives the same next-state (merge
    is idempotent per epoch under the checkpoint's exactly-once
    contract), and the results log carries the epoch id so a replayed
    row is distinguishable. Returns the started streaming query.
    """
    ref = reference_counts.select("t", F.col("c").cast("long").alias("c"))

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        try:
            state = spark.read.parquet(state_path)
        except AnalysisException:
            state = None
        next_state = merge_token_counts(
            state, token_counts(batch_df, text_col=text_col)
        )
        atomic_overwrite_parquet(next_state, state_path)
        kl = kl_between_counts(ref, spark.read.parquet(state_path)).withColumn(
            "epoch", F.lit(int(epoch_id)).cast("long")
        )
        kl.write.mode("append").parquet(results_path)

    writer = doc_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
