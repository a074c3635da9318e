"""Deterministic hash sampling/splitting: stability across
partitionings, key co-location, and complement behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.sampling import (
    BUCKETS,
    hash_sample,
    hash_split,
    md5_bucket,
)


def test_split_is_partitioning_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    s2 = hash_split(
        docs.repartition(17), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    a = {(r.doc_id, r.split) for r in s1.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in s2.select("doc_id", "split").collect()}
    assert a == b


def test_split_fractions_roughly_honored(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    assert 0.7 <= counts["train"] / total <= 0.9  # 500 docs → wide tolerance


def test_duplicate_keys_colocate(spark):
    rows = [(i % 10, f"payload{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "k int, payload string")
    out = hash_split(df, "k", {"a": 0.5, "b": 0.5})
    per_key = out.groupBy("k").agg(F.countDistinct("split").alias("n")).collect()
    assert all(r.n == 1 for r in per_key)


def test_hash_sample_complement(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = hash_sample(docs, "doc_id", 0.3)
    dropped = docs.filter(md5_bucket(F.col("doc_id")) >= int(0.3 * BUCKETS))
    assert kept.count() + dropped.count() == docs.count()
    assert kept.join(dropped, "doc_id", "inner").count() == 0


def test_weighted_mix_respects_strata(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    from data_warehouse_migration_spark.operators.sampling import weighted_mix

    out = weighted_mix(df, "lang", "doc_id", {"fr": 1.0}, default_fraction=0.0)
    got = {r.lang for r in out.select("lang").distinct().collect()}
    assert got == {"fr"}
    assert out.count() == 100  # fraction 1.0 keeps every fr row
