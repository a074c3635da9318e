"""Streaming SemDeDup ingest invariants
(streaming/embedding_dedup.py): epoch-cutoff reads, replay
idempotence of verdicts, and cross-epoch dup detection. The gate
attests bit-equality with batch SemDeDup on the real engine.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.clustering import assign_clusters
from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)
from data_warehouse_migration_spark.streaming.embedding_dedup import read_members


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="embdedup_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


CENTROIDS = [[1.0, 0.0], [0.0, 1.0]]


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _write_members(spark, df, path, epoch):
    assigned = assign_clusters(df, CENTROIDS).select(
        "cluster", "vec_id", "embedding"
    )
    overwrite_partitions_dynamic(
        assigned.withColumn("epoch", F.lit(epoch)), path, partition_by=["epoch"]
    )


def test_read_members_epoch_cutoff(spark, base):
    _write_members(spark, _vecs(spark, [(1, [1.0, 0.0])]), base, 0)
    _write_members(spark, _vecs(spark, [(2, [0.0, 1.0])]), base, 1)
    all_members = read_members(spark, base)
    assert all_members.count() == 2
    cut = read_members(spark, base, before_epoch=1)
    assert [r.vec_id for r in cut.collect()] == [1]
    # a replayed epoch 1 must not see its own members
    assert read_members(spark, base, before_epoch=0).count() == 0


def test_read_members_missing_index_is_none(spark, base):
    assert read_members(spark, f"{base}/nope") is None


def test_member_replay_rewrites_not_duplicates(spark, base):
    df = _vecs(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.01])])
    _write_members(spark, df, base, 0)
    before = sorted(r.vec_id for r in read_members(spark, base).collect())
    _write_members(spark, df, base, 0)  # replayed epoch
    after = sorted(r.vec_id for r in read_members(spark, base).collect())
    assert before == after == [1, 2]


def test_streaming_run_detects_cross_epoch_dups(spark, base):
    """End-to-end bounded run: a later-epoch near-copy of an
    epoch-0 vector must be removed with dup_of pointing across the
    epoch boundary."""
    import os
    import time

    from data_warehouse_migration_spark.streaming.embedding_dedup import (
        streaming_semdedup_ingest,
    )

    batches = [
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        [(10, [1.0, 0.001]), (11, [-1.0, 5.0])],
    ]
    src = f"{base}/src"
    for k, rows in enumerate(batches):
        part = f"{src}/b{k}"
        _vecs(spark, rows).coalesce(1).write.parquet(part)
        ts = time.time() + k * 2
        for root, _, files in os.walk(part):
            for fname in files:
                os.utime(os.path.join(root, fname), (ts, ts))
    schema = spark.read.parquet(f"{src}/b0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = streaming_semdedup_ingest(
        stream,
        CENTROIDS,
        index_dir=f"{base}/members",
        results_path=f"{base}/results",
        checkpoint=f"{base}/ckpt",
        tau=0.99,
    )
    assert q.awaitTermination(120), q.exception()
    verdicts = {
        r.vec_id: r for r in spark.read.parquet(f"{base}/results").collect()
    }
    assert verdicts[10].dup_of == 0 and not verdicts[10].kept
    assert all(verdicts[i].kept for i in (0, 1, 11))
