"""Unit pins for the round-5 additions beyond their oracles:
weighted_sample determinism/bias and filtered top-k eligibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.sampling import weighted_sample
from data_warehouse_migration_spark.operators.similarity import brute_force_topk


def test_weighted_sample_deterministic_and_biased(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_words"),
    )
    a = weighted_sample(docs, "doc_id", "n_words", k=50, salt="s")
    b = weighted_sample(docs, "doc_id", "n_words", k=50, salt="s")
    ids_a = [r["doc_id"] for r in a.orderBy("sample_rank").collect()]
    ids_b = [r["doc_id"] for r in b.orderBy("sample_rank").collect()]
    assert ids_a == ids_b, "same salt must reproduce the same selection"

    c = weighted_sample(docs, "doc_id", "n_words", k=50, salt="t")
    ids_c = {r["doc_id"] for r in c.collect()}
    assert ids_c != set(ids_a), "a different salt reshuffles the draw"

    # Weight bias: the selected docs' mean length exceeds the corpus
    # mean (deterministic given the fixed salt and corpus).
    corpus_mean = docs.agg(F.avg("n_words")).first()[0]
    sel_mean = a.agg(F.avg("n_words")).first()[0]
    assert sel_mean > corpus_mean


def test_filtered_topk_stays_in_cohort(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    out = brute_force_topk(emb, queries, k=5, match_cols=("label",))
    labels = {r["vec_id"]: r["label"] for r in queries.collect()}
    nl = {r["vec_id"]: r["label"] for r in emb.collect()}
    rows = out.collect()
    assert rows, "filtered search returned nothing"
    per_q: dict[int, list] = {}
    for r in rows:
        assert nl[r["n_id"]] == labels[r["q_id"]], "neighbor left the cohort"
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    for q_id, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q_id
        assert len(ranks) <= 5

    # Pre-filtering fills k from the eligible set; post-filtering the
    # unfiltered top-5 would keep only same-label survivors — strictly
    # fewer whenever any of the global top-5 crosses labels.
    unfiltered = brute_force_topk(emb, queries, k=5)
    post = [
        r
        for r in unfiltered.collect()
        if nl[r["n_id"]] == labels[r["q_id"]]
    ]
    assert len(rows) >= len(post)
