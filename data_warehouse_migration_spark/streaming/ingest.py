"""Streaming ingest dedup: documents arrive as a stream, each
micro-batch is deduplicated against the content indexes of EVERYTHING
seen before it (initial corpus + all earlier batches), and the
batch's own index slices are appended — the continuous form of
`operators/dedup.incremental_dedup`, and the shape a recurring-crawl
pipeline actually runs: the corpus index grows monotonically; corpus
TEXT is never rescanned.

Index policy: ALL batch docs' signatures are appended, not only the
accepted (`new`) ones. Matching against a dup-of-a-dup is still a
dup, so statuses are unchanged by the extra rows, and the policy
makes every status a pure function of (initial corpus, batch order,
content) — deterministic under replay and independently recomputable
by the oracle. (Appending only survivors would make doc N's status
depend recursively on N−1's status through near-dup chains.)

Exactly-once: index additions and status rows land in
``epoch=K``-partitioned directories via dynamic partition overwrite,
so a replayed epoch REPLACES its own partition instead of appending
twice.

Scale posture per epoch: the batch's digests/bands join the at-rest
index on digest/(band, band_sig) — shuffle ∝ batch, probe ∝ index
buckets touched; verification joins pruned candidates against the
stored gram arrays; appends are partition-scoped writes. Nothing is
corpus×corpus, nothing rescans earlier text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from data_warehouse_migration_spark.operators.dedup import (
    dedup_index,
    incremental_dedup_against_index,
)
from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)

_INDEX_PARTS = ("digests", "bands", "grams")


def write_dedup_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> None:
    """Materialize the initial corpus index under ``index_dir`` as
    ``epoch=-1`` partitions (the stream's epochs are ≥ 0)."""
    idx = dedup_index(corpus, id_col, text_col, n, num_hashes, bands)
    for part in _INDEX_PARTS:
        overwrite_partitions_dynamic(
            idx[part].withColumn("epoch", F.lit(-1)),
            f"{index_dir}/{part}",
            partition_by=["epoch"],
        )


def read_dedup_index(
    spark: SparkSession, index_dir: str, before_epoch: int | None = None
) -> dict[str, DataFrame]:
    """Read the index; ``before_epoch`` keeps only additions from
    strictly earlier epochs (initial corpus = epoch -1). The matching
    pass MUST pass its own epoch here: a crash between the index
    append and the checkpoint commit replays the batch against an
    index that already contains the batch's own signatures — without
    the cutoff every replayed doc flags itself as a corpus dup
    (caught by ``test_maintenance_replay.py``)."""
    out = {}
    for part in _INDEX_PARTS:
        df = spark.read.parquet(f"{index_dir}/{part}")
        if before_epoch is not None:
            df = df.filter(F.col("epoch") < before_epoch)
        out[part] = df.drop("epoch")
    return out


def streaming_ingest_dedup(
    doc_stream: DataFrame,
    index_dir: str,
    results_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    available_now: bool = True,
):
    """Drive a document stream through per-epoch incremental dedup.
    Appends ``(id_col, status, match_id, epoch)`` rows under
    ``results_path`` and grows the index at ``index_dir``. Returns the
    started streaming query."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        try:
            idx = read_dedup_index(spark, index_dir, before_epoch=int(epoch_id))
        except AnalysisException as e:
            raise RuntimeError(
                f"no dedup index at {index_dir} — run write_dedup_index first"
            ) from e
        statuses = incremental_dedup_against_index(
            batch_df, idx, id_col, text_col, n, num_hashes, bands, threshold
        ).withColumn("epoch", F.lit(int(epoch_id)))
        overwrite_partitions_dynamic(
            statuses, results_path, partition_by=["epoch"]
        )
        additions = dedup_index(
            batch_df, id_col, text_col, n, num_hashes, bands
        )
        for part in _INDEX_PARTS:
            overwrite_partitions_dynamic(
                additions[part].withColumn("epoch", F.lit(int(epoch_id))),
                f"{index_dir}/{part}",
                partition_by=["epoch"],
            )

    writer = doc_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
