"""Winnowing fingerprints and embedding-cosine near-dup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.dedup import winnowed_fingerprints
from data_warehouse_migration_spark.operators.similarity import (
    cosine_near_dup_pairs,
)


def test_winnow_shared_passage_shares_fingerprint(spark):
    # Guarantee: a shared substring of length >= k + w - 1 (16+8-1=23)
    # yields at least one shared fingerprint.
    passage = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [(1, "AAA " + passage + " BBB"), (2, "CCC " + passage + " DDD"),
         (3, "completely unrelated content with no overlap at all here")],
        "doc_id int, text string",
    )
    fps = {r.doc_id: set(r.fingerprints)
           for r in winnowed_fingerprints(docs, k=16, w=8).collect()}
    assert fps[1] & fps[2], "docs sharing a long passage must share a fingerprint"
    assert not (fps[1] & fps[3])


def test_winnow_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "tiny"), (3, "tiny")], "doc_id int, text string"
    )
    out = winnowed_fingerprints(docs, k=16, w=8).collect()
    by_id = {r.doc_id: r.fingerprints for r in out}
    assert len(by_id[1]) == 1  # whole-text fallback, still one fingerprint
    assert by_id[2] == by_id[3]  # identical short docs → identical fingerprint


def test_cosine_near_dup_pairs_exact(spark):
    docs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0]),   # parallel → cosine 1
         (3, [0.0, 5.0]),                     # orthogonal to 1,2
         (4, [1.0, 1.0])],                    # cos 0.7071 with all
        "vec_id int, embedding array<double>",
    )
    out = cosine_near_dup_pairs(docs, threshold=0.9)
    pairs = {(r.id_a, r.id_b): r.cosine for r in out.collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == 1.0
    # lower threshold pulls in the 45° pairs
    out2 = cosine_near_dup_pairs(docs, threshold=0.7)
    assert set((r.id_a, r.id_b) for r in out2.collect()) == {
        (1, 2), (1, 4), (2, 4), (3, 4)
    }


def test_decontaminate_flags_planted_contamination(spark):
    from data_warehouse_migration_spark.operators.dedup import decontaminate

    eval_text = "the quick brown fox jumps over the lazy dog at midnight again"
    train = spark.createDataFrame(
        [
            (1, eval_text),  # verbatim copy of an eval doc → contaminated
            (2, "PREFIX " + eval_text + " SUFFIX"),  # embedded copy → contaminated
            (3, "totally unrelated words about spark shuffles and parquet files"),
            (4, "the quick brown cat naps"),  # shares < min_shared shingles
        ],
        "doc_id int, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, eval_text), (101, "another clean benchmark question entirely")],
        "doc_id int, text string",
    )
    out = decontaminate(train, eval_set, n=3, min_shared=4)
    flagged = {(r.train_id, r.eval_id): r.n_shared for r in out.collect()}
    assert set(flagged) == {(1, 100), (2, 100)}
    # verbatim copy shares every shingle of the eval doc (10 3-grams of 12 words)
    assert flagged[(1, 100)] == 10
    assert flagged[(2, 100)] == 10


def test_decontaminate_winnow_method_matches_passage(spark):
    from data_warehouse_migration_spark.operators.dedup import decontaminate

    passage = "a long verbatim passage that is definitely over twenty-three chars"
    train = spark.createDataFrame(
        [(1, "XX " + passage + " YY"), (2, "clean document with original content")],
        "doc_id int, text string",
    )
    eval_set = spark.createDataFrame([(9, passage)], "doc_id int, text string")
    out = decontaminate(train, eval_set, method="winnow", min_shared=1)
    assert {r.train_id for r in out.collect()} == {1}
