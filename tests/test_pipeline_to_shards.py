"""End-to-end last mile: span-cleaned corpus → overlap chunks →
deterministic shuffle-shards. Pins that the curation stages and the
shard writer compose — chunk rows survive intact, shard membership is
reproducible, and the manifest agrees with the written files."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.dedup import remove_duplicate_spans
from data_warehouse_migration_spark.operators.sharding import (
    shard_manifest,
    write_shuffled_shards,
)

N_SHARDS = 4


def _chunks(cleaned):
    w = F.split(F.col("cleaned_text"), " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(w) - 8, F.lit(1)), F.lit(24))
    return (
        cleaned.filter(F.col("cleaned_len") >= 2)
        .select(
            "doc_id",
            "lang",
            w.alias("w"),
            F.explode(starts).alias("start"),
        )
        .select(
            F.concat_ws("#", "doc_id", "start").alias("chunk_uid"),
            "lang",
            F.array_join(F.slice(F.col("w"), F.col("start"), 32), " ").alias(
                "chunk_text"
            ),
        )
    )


def test_cleaned_chunks_shard_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cleaned = remove_duplicate_spans(docs, n=10, passthrough=("lang",))
    chunks = _chunks(cleaned)
    n_chunks = chunks.count()
    assert n_chunks > 0

    out = str(tmp_path / "chunk_shards")
    write_shuffled_shards(chunks, out, N_SHARDS, salt="e2e", id_col="chunk_uid")
    back = spark.read.parquet(out)
    assert back.count() == n_chunks
    # No chunk text altered or lost across the shuffle+write.
    assert chunks.select("chunk_uid", "chunk_text").exceptAll(
        back.select("chunk_uid", "chunk_text")
    ).count() == 0

    manifest = shard_manifest(
        chunks, N_SHARDS, salt="e2e", id_col="chunk_uid", content_col="chunk_text"
    ).collect()
    assert sum(r["n_docs"] for r in manifest) == n_chunks
    per_shard = {
        r["shard_id"]: r["n_docs"]
        for r in back.groupBy("shard_id").count().withColumnRenamed(
            "count", "n_docs"
        ).collect()
    }
    assert {r["shard_id"]: r["n_docs"] for r in manifest} == per_shard
