"""Distributed model TRAINING on the engine — the missing half of the
classifier story (VERDICT r9 action #7a: inference has been
driver-gated since r7; the training loop itself was a reproducible
tool but never value-attested).

The trainable chosen here is the one whose training loop is exactly
attestable cross-engine: a FULL-BATCH PERCEPTRON (Rosenblatt 1958;
the batch variant is the textbook distributed-learning primitive)
over the same hashed unigram+bigram features the inference path
scores. Everything is INTEGER arithmetic —

- features: per-(doc, bucket) counts (not normalized),
- label: the Gopher stopword-density rule in exact integer form
  (``100·sw_hits ≥ 7·n_tokens`` ⟺ fraction ≥ 0.07 — same distillation
  target ``tools/train_quality_classifier.py`` fits with float
  logistic GD),
- update: ``w ← w + Σ_{misclassified} y·x`` with ``y ∈ {+1, −1}`` and
  a doc misclassified iff ``y·(w·x) ≤ 0``

— so epoch K's weight vector is a pure integer function of the corpus
that DuckDB recomputes by unrolling the epochs as CTEs, with no
floating point anywhere to diverge. (The float logistic fit stays the
shipped PRODUCTION model; this operator attests the distributed
training MECHANISM — per-epoch broadcast-join scoring, mistake
filtering, map-side-combined gradient aggregation, driver-side model
update — on a trainable whose math both engines agree on exactly.)

Scale shape (the part that matters at 100 TB): the model is
bucket-sized (4096 ints ≈ 32 KB), so it BROADCASTS; each epoch is
(a) one broadcast-join + groupBy(doc) to score every document —
shuffle keyed on doc_id, partial aggregation map-side, (b) one
groupBy(bucket) over the misclassified docs' features — a 4096-key
aggregation that combines map-side to almost nothing, and (c) a
driver-side vector add of at most 4096 ints (the same driver-sized
collect posture as the k-means centroid loop,
operators/clustering.py). Per-epoch cost is linear in corpus
features; nothing grows with epoch count. Weight magnitudes are
bounded by ``epochs · Σ_docs cnt`` — int64 carries ~10^14 docs·features
per epoch before the decimal(38,0) upgrade documented for squared
aggregates would be needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_migration_spark.functions.text import (
    STOPWORDS,
    hashed_ngram_features,
    tokens,
)
from data_warehouse_migration_spark.operators.sketches import hash_mod


def _doc_features(
    docs: DataFrame, id_col: str, text_col: str, n_features: int
) -> DataFrame:
    """(id, bucket, cnt): integer hashed-feature counts per document —
    the same feature stream and md5 bucketing as the inference path
    (functions/text.hashed_linear_score_mili)."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(hashed_ngram_features(F.col(text_col))).alias("__t"),
        )
        .select(id_col, hash_mod(F.col("__t"), 0, n_features).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _doc_labels(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, y): +1 iff the integer stopword-density rule fires
    (100·hits ≥ 7·tokens with at least one token), else −1 — the exact
    integer form of the 0.07-fraction rule, so no float compare."""
    toks = tokens(F.col(text_col))
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n = F.size(toks)
    y = F.when((n > 0) & (100 * hits >= 7 * n), F.lit(1)).otherwise(F.lit(-1))
    return docs.select(F.col(id_col), y.cast("int").alias("y"))


def perceptron_distill(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 4096,
    epochs: int = 3,
) -> DataFrame:
    """Train the batch perceptron for ``epochs`` full passes and
    return the final nonzero weights as ``(bucket, weight)``.

    Epoch semantics (what the oracle unrolls): with ``w₀ = 0`` every
    document scores 0 and ``y·0 ≤ 0`` makes ALL documents
    misclassified, so epoch 1's update is ``Σ_docs y·x``; each later
    epoch scores with the previous weights, filters to the still-
    misclassified docs, and adds their ``y·x`` sum. Deterministic by
    construction — batch updates have no within-epoch ordering."""
    feats = _doc_features(docs, id_col, text_col, n_features).persist()
    labels = _doc_labels(docs, id_col, text_col)
    labeled = feats.join(labels, id_col).persist()

    weights: dict[int, int] = {}
    for _ in range(epochs):
        w_df = spark.createDataFrame(
            [(b, w) for b, w in weights.items() if w] or [],
            "bucket long, weight long",
        )
        scored = (
            labeled.join(F.broadcast(w_df), "bucket", "left")
            .groupBy(id_col, "y")
            .agg(
                F.sum(F.coalesce(F.col("weight"), F.lit(0)) * F.col("cnt"))
                .cast("long")
                .alias("score")
            )
        )
        updates = (
            labeled.join(
                scored.filter(F.col("y") * F.col("score") <= 0).select(id_col),
                id_col,
            )
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("cnt")).cast("long").alias("upd"))
            .collect()  # ≤ n_features rows — model-sized, like k-means centroids
        )
        for r in updates:
            weights[r["bucket"]] = weights.get(r["bucket"], 0) + int(r["upd"])

    feats.unpersist()
    labeled.unpersist()
    rows = sorted((b, w) for b, w in weights.items() if w)
    return spark.createDataFrame(rows or [], "bucket long, weight long")
