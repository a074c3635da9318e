"""Replay idempotence of the foreachBatch maintenance operators —
the property their epoch-partitioned dynamic-overwrite design exists
for: re-applying the SAME micro-batch under the SAME epoch id (what a
recovering stream does after a crash between sink write and
checkpoint commit) must leave results identical, never doubled."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rollup_rows(spark, path):
    from data_warehouse_migration_spark.streaming.rollup import read_rollup

    return {tuple(r) for r in read_rollup(spark, path).collect()}


def test_rollup_partials_replay_idempotent(spark, sf_dir, tmp_path):
    from data_warehouse_migration_spark.sources.writers import (
        overwrite_partitions_dynamic,
    )
    from data_warehouse_migration_spark.streaming.rollup import (
        rollup_partials,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    path = str(tmp_path / "rollup")

    def apply(batch, epoch):
        overwrite_partitions_dynamic(
            rollup_partials(batch).withColumn(
                "epoch", F.lit(epoch).cast("long")
            ),
            path,
            partition_by=["epoch"],
        )

    apply(b0, 0)
    apply(b1, 1)
    served = _rollup_rows(spark, path)
    # Crash-recovery replay: epoch 1 re-applied.
    apply(b1, 1)
    assert _rollup_rows(spark, path) == served

    # And the served fold equals the one-shot lattice over all events.
    from data_warehouse_migration_spark.streaming.rollup import (
        rollup_partials as rp,
    )

    full = {
        tuple(r)
        for r in rp(events)
        .select(
            "granularity",
            "bucket",
            "event_type",
            F.col("n_events").cast("long"),
            (F.col("cents").cast("double") / 100.0).alias("total_value"),
        )
        .collect()
    }
    assert served == full


def test_ingest_dedup_replay_idempotent(spark, tmp_path):
    from data_warehouse_migration_spark.operators.dedup import dedup_index
    from data_warehouse_migration_spark.operators.sampling import hash_split
    from data_warehouse_migration_spark.sources.writers import (
        overwrite_partitions_dynamic,
    )
    from data_warehouse_migration_spark.streaming.ingest import (
        _INDEX_PARTS,
        incremental_dedup_against_index,
        read_dedup_index,
        write_dedup_index,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zeta"),  # dup of 0
            (2, "one two three four five six seven"),
            (3, "unique text that matches nothing else at all"),
        ],
        ["doc_id", "text"],
    )
    corpus = docs.filter("doc_id = 0")
    batch = docs.filter("doc_id > 0")
    index_dir = str(tmp_path / "index")
    results = str(tmp_path / "results")
    write_dedup_index(corpus, index_dir)

    def apply(batch_df, epoch):
        idx = read_dedup_index(spark, index_dir, before_epoch=epoch)
        statuses = incremental_dedup_against_index(batch_df, idx).withColumn(
            "epoch", F.lit(epoch)
        )
        overwrite_partitions_dynamic(statuses, results, partition_by=["epoch"])
        adds = dedup_index(batch_df)
        for part in _INDEX_PARTS:
            overwrite_partitions_dynamic(
                adds[part].withColumn("epoch", F.lit(epoch)),
                f"{index_dir}/{part}",
                partition_by=["epoch"],
            )

    apply(batch, 0)
    first = {tuple(r) for r in spark.read.parquet(results).collect()}
    idx_counts = {
        p: spark.read.parquet(f"{index_dir}/{p}").count() for p in _INDEX_PARTS
    }
    # Replay the same epoch: statuses AND index additions unchanged.
    apply(batch, 0)
    assert {tuple(r) for r in spark.read.parquet(results).collect()} == first
    assert {
        p: spark.read.parquet(f"{index_dir}/{p}").count() for p in _INDEX_PARTS
    } == idx_counts
    # Statuses themselves: doc 1 dups the corpus, 2 and 3 are new.
    by_id = {row[0]: row[1] for row in first}
    assert by_id[1] == "dup_corpus" and by_id[2] == "new" and by_id[3] == "new"
