"""verified_duplicate_span_islands — the byte-verified ExactSubstr
tier (VERDICT r7 action #6): island merging, ownership, and agreement
with the digest-keyed removal operator's coverage on collision-free
data."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.catalog import t
from data_warehouse_migration_spark.operators.dedup import (
    remove_duplicate_spans,
    verified_duplicate_span_islands,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_owner_keeps_and_duplicate_gets_one_island(spark):
    shared = " ".join(f"w{i}" for i in range(12))  # 12 words ≥ n=10
    rows = [(1, shared + " tail one"), (2, "head " + shared)]
    out = verified_duplicate_span_islands(_docs(spark, rows), n=10).collect()
    # Doc 1 owns every shared span (lowest id) → no islands for it.
    assert all(r["doc_id"] == 2 for r in out)
    # Doc 2: spans at word starts 2,3,4 (10-grams of the 12 shared
    # words) merge into ONE island covering words 2..13.
    assert len(out) == 1
    r = out[0]
    assert (r["island_start"], r["island_end"], r["island_words"]) == (2, 13, 12)


def test_within_doc_repeats_are_not_removed(spark):
    span = " ".join(f"x{i}" for i in range(10))
    rows = [(1, span + " mid " + span)]
    out = verified_duplicate_span_islands(_docs(spark, rows), n=10).collect()
    assert out == []  # cross-doc only, matching remove_duplicate_spans


def test_disjoint_repeats_yield_separate_islands(spark):
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10))
    rows = [
        (1, a + " one filler " + b),
        (2, a + " unrelated words entirely here " + b),
    ]
    out = sorted(
        verified_duplicate_span_islands(_docs(spark, rows), n=10).collect(),
        key=lambda r: r["island_start"],
    )
    assert [r["doc_id"] for r in out] == [2, 2]
    assert (out[0]["island_start"], out[0]["island_end"]) == (1, 10)
    assert out[1]["island_words"] == 10


def test_islands_equal_digest_operator_coverage_on_fixture(spark, sf_dir):
    """On the fixture corpus (no xxhash64 collisions at this size) the
    verified islands must cover exactly the words the digest-keyed
    remove_duplicate_spans excises — total island words per doc equals
    its n_removed."""
    docs = t(spark, sf_dir, "documents")
    islands = (
        verified_duplicate_span_islands(docs, n=10)
        .groupBy("doc_id")
        .agg(F.sum("island_words").cast("int").alias("covered"))
    )
    removed = remove_duplicate_spans(docs, n=10).select(
        "doc_id", F.col("n_removed").cast("int").alias("covered")
    ).filter(F.col("covered") > 0)
    a = {r["doc_id"]: r["covered"] for r in islands.collect()}
    b = {r["doc_id"]: r["covered"] for r in removed.collect()}
    assert a == b
