"""Parameter-contract pins for round-6 operators: invalid inputs must
fail loudly at plan-build time, not mid-job with a codegen error."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_range_join_rejects_empty_window(spark):
    from data_warehouse_migration_spark.operators.joins import (
        range_join_by_bucket,
    )

    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="upper_s"):
        range_join_by_bucket(
            df, df, left_ts="x", right_ts="x", lower_s=5, upper_s=5
        )


def test_morton_n_rejects_overflow_and_empty(spark):
    from data_warehouse_migration_spark.operators.layout import morton_code_n

    with pytest.raises(ValueError, match="signed long"):
        morton_code_n([F.col("a")] * 4, bits=16)  # 64 > 62
    with pytest.raises(ValueError, match="dimension"):
        morton_code_n([], bits=8)


def test_pq_rejects_indivisible_dim(spark):
    from data_warehouse_migration_spark.operators.quantization import (
        train_pq_codebooks,
    )

    df = spark.createDataFrame([(1, [0.0] * 10)], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(df, dim=10, m=4)


def test_sq8_degenerate_dimension_roundtrips(spark):
    """A constant dimension (hi == lo) must encode to code 0 and decode
    back to lo — not divide by zero."""
    from data_warehouse_migration_spark.operators.quantization import (
        sq8_encode,
        sq8_topk,
        sq8_train,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [2.0, 5.0]), (2, [3.0, 5.0])],
        ["vec_id", "embedding"],
    )
    lo, hi = sq8_train(df, dim=2)
    assert lo[1] == hi[1] == 5.0
    codes = {r["vec_id"]: r["codes"] for r in sq8_encode(df, lo, hi).collect()}
    assert all(c[1] == 0 for c in codes.values())
    out = sq8_topk(
        sq8_encode(df, lo, hi), df.filter("vec_id = 0"), lo, hi, k=2
    ).collect()
    assert len(out) == 2  # scoring over decoded constants still ranks


def test_shard_manifest_chunked_single_chunk_degenerates_cleanly(spark):
    """chunk_rows ≥ shard size → exactly one chunk per shard, checksum
    = md5(md5(flat chain)) — still well-defined, counted as 1 chunk."""
    from data_warehouse_migration_spark.operators.sharding import (
        shard_manifest_chunked,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], ["doc_id", "text"]
    )
    rows = shard_manifest_chunked(docs, n_shards=2, chunk_rows=1000).collect()
    assert all(r["n_chunks"] == 1 for r in rows)
    assert sum(r["n_docs"] for r in rows) == 6
