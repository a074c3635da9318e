"""Parallel sequence packing: per-stream plan + semantics."""

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.packing import (
    pack_sequences,
    pack_sequences_global,
)


def test_pack_sequences_matches_global_per_stream(spark, sf_dir):
    """Within any one stream, the parallel packer must produce exactly
    the assignment the global cumsum produces on that stream's subset —
    hash-splitting changes parallelism, not packing semantics."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    packed = pack_sequences(
        docs, key_col="doc_id", size_col="n_chars", chunk_size=8000, n_streams=4
    )
    got = {
        (r.stream, r.doc_id): r.chunk_id for r in packed.collect()
    }
    streams = sorted({s for s, _ in got})
    assert len(streams) > 1  # the split actually fans out
    for s in streams:
        sub = packed.filter(F.col("stream") == s).select("doc_id", "n_chars")
        ref = {
            r.doc_id: r.chunk_id
            for r in pack_sequences_global(
                sub, key_col="doc_id", size_col="n_chars", chunk_size=8000
            ).collect()
        }
        for doc_id, chunk in ref.items():
            assert got[(s, doc_id)] == chunk


def test_pack_sequences_plan_has_no_single_partition_window(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    packed = pack_sequences(
        docs, key_col="doc_id", size_col="n_chars", chunk_size=8000, n_streams=8
    )
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(stream" in plan


def test_pack_chunks_respect_budget_boundaries(spark):
    """A doc starts the chunk its offset falls in: chunk boundaries are
    exact multiples of chunk_size in cumulative space."""
    rows = [(i, 3000) for i in range(10)]  # 3k docs into 8k chunks
    df = spark.createDataFrame(rows, "doc_id int, n_chars int")
    out = pack_sequences_global(
        df, key_col="doc_id", size_col="n_chars", chunk_size=8000
    ).collect()
    got = {r.doc_id: r.chunk_id for r in out}
    # offsets 0,3000,6000 -> chunk 0; 9000,12000 -> 1; 15000,... -> chunk i*3000//8000
    assert got == {i: (i * 3000) // 8000 for i in range(10)}
