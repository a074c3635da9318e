"""Streaming corpus-drift monitor (streaming/drift.py): per-epoch KL
rows against a fixed reference histogram must (a) track a growing
incoming snapshot — token totals strictly increasing per epoch — and
(b) converge, at the final epoch, to exactly the one-shot batch
computation over the same documents."""

from __future__ import annotations

import os

from data_warehouse_migration_spark.operators.drift import (
    kl_between_counts,
    token_counts,
)
from data_warehouse_migration_spark.streaming.drift import (
    streaming_corpus_drift,
)

REF_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
]
INCOMING = [
    (10, "the quick brown fox naps all day"),
    (11, "a lazy dog naps beside the box"),
    (12, "five jugs of liquor spill over the fox"),
]


def test_streaming_drift_converges_to_batch(spark, tmp_path):
    ref = token_counts(spark.createDataFrame(REF_DOCS, ["doc_id", "text"]))
    incoming = spark.createDataFrame(INCOMING, ["doc_id", "text"])

    src = str(tmp_path / "src")
    os.makedirs(src)
    # One file per document → three micro-batches.
    for i, row in enumerate(INCOMING):
        spark.createDataFrame([row], ["doc_id", "text"]).coalesce(1).write.parquet(
            f"{src}/d{i}"
        )

    schema = incoming.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = streaming_corpus_drift(
        stream,
        ref,
        state_path=str(tmp_path / "state"),
        results_path=str(tmp_path / "results"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300)

    rows = sorted(
        spark.read.parquet(str(tmp_path / "results")).collect(),
        key=lambda r: r["epoch"],
    )
    assert len(rows) == 3
    totals = [r["n_tokens_b"] for r in rows]
    assert totals == sorted(totals) and len(set(totals)) == 3

    batch = kl_between_counts(ref, token_counts(incoming)).first()
    final = rows[-1]
    for c in ("n_tokens_a", "n_tokens_b", "vocab_union", "kl_ab", "kl_ba"):
        assert final[c] == batch[c], c


def test_drift_state_replay_does_not_double_count(spark, tmp_path):
    """A replayed epoch rewrites its state partition — the folded
    histogram (and therefore every later KL) is unchanged. The
    original read-merge-overwrite design double-counted here."""
    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.operators.drift import token_counts
    from data_warehouse_migration_spark.sources.writers import (
        overwrite_partitions_dynamic,
    )
    from data_warehouse_migration_spark.streaming.drift import read_drift_state

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], ["doc_id", "text"]
    )
    part = token_counts(docs).withColumn("epoch", F.lit(0).cast("long"))
    path = str(tmp_path / "state")
    overwrite_partitions_dynamic(part, path, partition_by=["epoch"])
    before = sorted(read_drift_state(spark, path).collect())
    overwrite_partitions_dynamic(part, path, partition_by=["epoch"])  # replay
    after = sorted(read_drift_state(spark, path).collect())
    assert before == after
    assert dict((r.t, r.c) for r in after) == {"alpha": 2, "beta": 2, "gamma": 1}
