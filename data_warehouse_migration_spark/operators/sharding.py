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
shard) + a partition-local sort. ``shard_manifest`` aggregates the
per-shard hash chain via one flat collect_list — bounded by shard
size, fine for attestation at test SFs; ``shard_manifest_chunked`` is
the 100 TB form: a two-level chunk-chained checksum whose buffers are
bounded by the chunk size (≈ one shard file), never a whole shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    max_rows_per_file: int | None = None,
) -> None:
    """Shuffle-once/write-once sharded output: one repartition on
    shard_id, partition-local sort by (shard_id, sort_key, id), one
    ``partitionBy`` parquet write → ``path/shard_id=K/`` directories
    whose row order is globally deterministic.

    ``max_rows_per_file`` rolls each shard into files of exactly that
    many rows (last file short) IN SHARD ORDER — the writer-side half
    of :func:`shard_manifest_chunked`'s "chunk = file" contract: with
    ``max_rows_per_file == chunk_rows``, each on-disk file's row-hash
    chain equals the corresponding level-1 chunk checksum
    (test-pinned in ``test_sharding.py``), so a consumer can verify
    shards file-by-file without ever buffering a whole shard."""
    assigned = shard_assignments(docs, n_shards, salt, id_col)
    writer = (
        assigned.repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "sort_key", id_col)
        .write.mode("overwrite")
    )
    if max_rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_rows_per_file)
    writer.partitionBy("shard_id").parquet(path)


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


def shard_manifest_chunked(
    docs: DataFrame,
    n_shards: int,
    salt: str = "",
    id_col: str = "doc_id",
    content_col: str = "text",
    chunk_rows: int = 1000,
) -> DataFrame:
    """Bounded-memory shard manifest — the 100 TB form of
    :func:`shard_manifest`'s order-sensitive checksum, as a two-level
    hash chain (a fixed-depth Merkle chain):

    - level 1: rows in shard order are grouped into fixed-size chunks
      (``chunk_seq = (rank-1) div chunk_rows`` — exactly the rows a
      shard *file* holds when the writer caps rows per file);
      ``chunk_checksum = md5(row content-hashes concatenated in
      order)``, buffering at most ``chunk_rows`` hashes;
    - level 2: ``shard_checksum = md5(chunk checksums concatenated in
      chunk order)``, buffering ``n_rows / chunk_rows`` hashes.

    No aggregation buffer ever holds a whole shard — the flat
    ``collect_list`` in :func:`shard_manifest` is what this replaces;
    at a trillion rows, add a third level. The chunk boundary is a pure
    function of the deterministic order, so a re-run, another engine,
    or a per-file streaming consumer (``foreachBatch`` chaining file
    checksums as shard files land) reproduces the same manifest.

    Output: ``(shard_id, n_docs, n_chunks, shard_checksum, first_key,
    last_key)``. The in-shard rank comes from one window over the
    shard partition — the same shuffle+sort the shard writer performs,
    so at scale the manifest rides the write's own exchange.
    """
    assigned = shard_assignments(docs, n_shards, salt, id_col)
    w = Window.partitionBy("shard_id").orderBy("sort_key", id_col)
    ranked = assigned.select(
        "shard_id",
        "sort_key",
        F.col(id_col),
        F.md5(F.col(content_col)).alias("__h"),
    ).withColumn("__rn", F.row_number().over(w))
    # Exact for int ranks: numerator < 2^31, far inside double ulp.
    chunked = ranked.withColumn(
        "__chunk", F.floor((F.col("__rn") - 1) / chunk_rows).cast("long")
    )
    in_chunk = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("__rn").alias("r"), F.col("__h").alias("h")))
        ),
        lambda x: x["h"],
    )
    level1 = chunked.groupBy("shard_id", "__chunk").agg(
        F.count(F.lit(1)).alias("__n"),
        F.md5(F.concat_ws("", in_chunk)).alias("__ch"),
        F.min("sort_key").alias("__k_min"),
        F.max("sort_key").alias("__k_max"),
    )
    in_shard = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("__chunk").alias("c"), F.col("__ch").alias("h"))
            )
        ),
        lambda x: x["h"],
    )
    return level1.groupBy("shard_id").agg(
        F.sum("__n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.md5(F.concat_ws("", in_shard)).alias("shard_checksum"),
        F.min("__k_min").alias("first_key"),
        F.max("__k_max").alias("last_key"),
    )
