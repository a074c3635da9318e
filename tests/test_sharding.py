"""Deterministic shuffle-sharding writer ⇄ manifest agreement
(operators/sharding.py): the parquet the writer produces must hold
exactly the rows, shard assignment, and within-shard ORDER that the
attested manifest describes."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.sharding import (
    shard_assignments,
    shard_manifest,
    write_shuffled_shards,
)

N_SHARDS = 8
SALT = "t"


def test_writer_matches_manifest(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    write_shuffled_shards(docs, out, N_SHARDS, salt=SALT)
    manifest = {
        r["shard_id"]: r for r in shard_manifest(docs, N_SHARDS, salt=SALT).collect()
    }

    back = spark.read.parquet(out)
    # partitionBy round-trip: every row in the right shard, none lost.
    assert back.count() == docs.count()
    mismatch = (
        shard_assignments(back.drop("shard_id", "sort_key"), N_SHARDS, salt=SALT)
        .withColumnRenamed("shard_id", "expect_shard")
        .join(back.select("doc_id", "shard_id"), "doc_id")
        .filter(F.col("expect_shard") != F.col("shard_id"))
        .count()
    )
    assert mismatch == 0

    for shard_id, row in manifest.items():
        # Read ONE shard directory the way a training loader would and
        # recompute the chain checksum from the on-disk row order.
        part = spark.read.parquet(f"{out}/shard_id={shard_id}")
        rows = part.select("sort_key", "doc_id", "text").collect()
        assert len(rows) == row["n_docs"]
        keys = [r["sort_key"] for r in rows]
        assert keys == sorted(keys), "shard not written in key order"
        chain = "".join(
            hashlib.md5(r["text"].encode()).hexdigest() for r in rows
        )
        assert hashlib.md5(chain.encode()).hexdigest() == row["shard_checksum"]
        assert keys[0] == row["first_key"] and keys[-1] == row["last_key"]


def test_reshuffle_changes_order_not_membership(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    a = shard_assignments(docs, N_SHARDS, salt="a").select("doc_id", "sort_key")
    b = shard_assignments(docs, N_SHARDS, salt="b").select("doc_id", "sort_key")
    assert a.count() == b.count() == 200
    same = a.join(b, ["doc_id", "sort_key"]).count()
    assert same == 0, "different salts must produce different orderings"
    # Determinism: the same salt reproduces the same keys exactly.
    again = shard_assignments(docs, N_SHARDS, salt="a").select("doc_id", "sort_key")
    assert a.exceptAll(again).count() == 0


def test_chunked_manifest_properties(spark, sf_dir):
    """shard_manifest_chunked: same membership stats as the flat
    manifest; checksum is a pure function of (order, chunk size) —
    invariant to input partitioning, sensitive to the chunk boundary;
    chunk count is ceil(n_docs / chunk_rows)."""
    from data_warehouse_migration_spark.operators.sharding import (
        shard_manifest_chunked,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flat = {r["shard_id"]: r for r in shard_manifest(docs, N_SHARDS, salt=SALT).collect()}
    c50 = {
        r["shard_id"]: r
        for r in shard_manifest_chunked(
            docs, N_SHARDS, salt=SALT, chunk_rows=10
        ).collect()
    }
    assert set(c50) == set(flat)
    for sid, r in c50.items():
        assert r["n_docs"] == flat[sid]["n_docs"]
        assert r["first_key"] == flat[sid]["first_key"]
        assert r["last_key"] == flat[sid]["last_key"]
        assert r["n_chunks"] == -(-r["n_docs"] // 10)
        assert r["n_chunks"] > 1  # the multi-chunk path is exercised

    # Partitioning-invariant: the deterministic order, not task layout,
    # defines every chunk.
    again = {
        r["shard_id"]: r["shard_checksum"]
        for r in shard_manifest_chunked(
            docs.repartition(13), N_SHARDS, salt=SALT, chunk_rows=10
        ).collect()
    }
    assert again == {sid: r["shard_checksum"] for sid, r in c50.items()}

    # Chunk-boundary-sensitive: a different file size is a different
    # (still attestable) manifest, not silently the same value.
    c200 = {
        r["shard_id"]: r["shard_checksum"]
        for r in shard_manifest_chunked(
            docs, N_SHARDS, salt=SALT, chunk_rows=25
        ).collect()
    }
    assert any(c200[sid] != c50[sid]["shard_checksum"] for sid in c50)


def test_chunked_manifest_checksums_match_on_disk_files(spark, sf_dir, tmp_path):
    """The "chunk = file" contract, end to end: writing shards with
    max_rows_per_file == chunk_rows must produce on-disk files whose
    per-file row-hash chains equal shard_manifest_chunked's level-1
    chunk checksums, file-for-chunk in order — a consumer can verify a
    100 TB shard file-by-file with no shard-sized buffer anywhere."""
    import glob
    import hashlib

    from data_warehouse_migration_spark.operators.sharding import (
        shard_manifest_chunked,
    )

    CHUNK = 10
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    write_shuffled_shards(docs, out, N_SHARDS, salt=SALT, max_rows_per_file=CHUNK)

    # Recompute level-1 chunk checksums from the manifest operator…
    want = {}
    for r in shard_manifest_chunked(
        docs, N_SHARDS, salt=SALT, chunk_rows=CHUNK
    ).collect():
        want[r["shard_id"]] = r

    # …and per-FILE chains from what the writer actually wrote.
    for sid in want:
        files = sorted(glob.glob(f"{out}/shard_id={sid}/part-*"))
        assert len(files) == want[sid]["n_chunks"], sid
        file_chains = []
        for fpath in files:
            rows = (
                spark.read.parquet(fpath)
                .select("sort_key", "doc_id", "text")
                .collect()
            )
            assert len(rows) <= CHUNK
            # File rows must already be in shard order (writer sorted).
            keys = [(r["sort_key"], r["doc_id"]) for r in rows]
            assert keys == sorted(keys), fpath
            chain = hashlib.md5(
                "".join(
                    hashlib.md5(r["text"].encode()).hexdigest() for r in rows
                ).encode()
            ).hexdigest()
            file_chains.append(chain)
        # Level-2: the shard checksum chains the file chains in order.
        level2 = hashlib.md5("".join(file_chains).encode()).hexdigest()
        assert level2 == want[sid]["shard_checksum"], sid
