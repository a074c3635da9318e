"""Deterministic global shuffle + fixed-count output sharding — the
last mile of a training-data pipeline: "shuffle the corpus, write N
shards" with an order that is a pure function of (id, salt), so any
engine (or a re-run) reproduces byte-identical shards.

Design:
- the shuffle key is ``md5(salt || id)`` — content-addressed
  pseudo-random order, reshuffled by changing the salt; no RNG state,
  no ``rand()`` nondeterminism across retries/speculative tasks (a
  Spark correctness trap: ``rand()`` re-evaluates per task attempt);
- ``shard_id`` is the first 16 bits of the same key mod ``n_shards``
  (hex arithmetic portable to any SQL engine; production with
  n_shards > 65536 widens the slice);
- the writer is shuffle-once/write-once: ONE repartition on shard_id,
  sort within partitions by the key, ``partitionBy('shard_id')``
  parquet write — each shard directory's row order is the global
  deterministic order restricted to that shard;
- the manifest (per-shard row count + an ORDER-SENSITIVE md5 chain
  checksum + boundary keys) is the attestable artifact a downstream
  consumer checks before training.

Scale: assignment is a zero-shuffle Column expression; the write is
one hash shuffle on shard_id (the honest minimum for co-locating a
shard) + a partition-local sort. The manifest gate aggregates the
per-shard hash chain via collect_list — bounded by shard size, fine
for attestation at test SFs; at 100 TB the same checksum is computed
streaming (foreachBatch per shard file, chaining file checksums), not
by materializing a shard in one buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_assignments(
    docs: DataFrame,
    n_shards: int,
    salt: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Add ``sort_key`` (md5(salt||id), the global pseudo-random order)
    and ``shard_id`` (first 16 key bits mod ``n_shards``) columns."""
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 4), 16, 10).cast("long") % n_shards
    ).cast("int")
    return docs.withColumn("sort_key", key).withColumn("shard_id", shard)


def write_shuffled_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    salt: str = "",
    id_col: str = "doc_id",
) -> None:
    """Shuffle-once/write-once sharded output: one repartition on
    shard_id, partition-local sort by (shard_id, sort_key, id), one
    ``partitionBy`` parquet write → ``path/shard_id=K/`` directories
    whose row order is globally deterministic."""
    assigned = shard_assignments(docs, n_shards, salt, id_col)
    (
        assigned.repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "sort_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def shard_manifest(
    docs: DataFrame,
    n_shards: int,
    salt: str = "",
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Per-shard attestation manifest:
    ``(shard_id, n_docs, shard_checksum, first_key, last_key)`` where
    ``shard_checksum`` is md5 over the concatenation of each row's
    content md5 IN SHARD ORDER — order-sensitive, so two manifests
    agree iff the shards hold the same rows in the same deterministic
    order."""
    assigned = shard_assignments(docs, n_shards, salt, id_col)
    row = F.struct(
        F.col("sort_key").alias("k"),
        F.col(id_col).alias("i"),
        F.md5(F.col(content_col)).alias("h"),
    )
    ordered_hashes = F.transform(
        F.array_sort(F.collect_list(row)), lambda x: x["h"]
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.md5(F.concat_ws("", ordered_hashes)).alias("shard_checksum"),
        F.min("sort_key").alias("first_key"),
        F.max("sort_key").alias("last_key"),
    )
