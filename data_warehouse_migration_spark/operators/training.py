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

from pyspark.sql import DataFrame, SparkSession, Window
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


def _doc_labels01(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, y): 1 iff the integer stopword-density rule fires, else 0 —
    the logistic-label form of _doc_labels (the offline trainer's
    exact target, tools/train_quality_classifier.py)."""
    toks = tokens(F.col(text_col))
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n = F.size(toks)
    y = F.when((n > 0) & (100 * hits >= 7 * n), F.lit(1)).otherwise(F.lit(0))
    return docs.select(F.col(id_col), y.cast("int").alias("y"))


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — the semantics BOTH
    engines share (Spark `div`, DuckDB `//`: −7/3 → −2 in each,
    verified empirically r11), mirrored here for the driver-side
    model update so all three computations agree exactly."""
    q = abs(a) // b
    return q if a >= 0 else -q


#: Fixed-point scales for logistic_sgd_distill. Chosen so every
#: intermediate stays far inside int64 at fixture scale and the
#: hard-sigmoid divisor (4·Q_SCALE·W_SCALE / P_SCALE) is exact.
Q_SCALE = 1024  # normalized feature x = cnt/n_feats, quantized to x_q/Q
P_SCALE = 1024  # probabilities/labels, quantized to p_q/P
W_SCALE = 1000  # weights in milli-units (the inference seam's unit)
#: Learning rate × W_SCALE at epoch 1; epoch e steps with LR_W // e
#: (the classic 1/t decay, integer form). Chosen by simulating the
#: exact quantized recurrence over the sf0.01 corpus: flat schedules
#: oscillate (full-batch GD overshoot — acc bounces 0.36↔0.90), the
#: decayed 32M schedule converges to 0.966 training accuracy by
#: epoch 12 (the float production fit: 0.91 held-out).
LR_W = 32_000_000


def logistic_sgd_distill(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 4096,
    epochs: int = 12,
) -> DataFrame:
    """FIXED-POINT full-batch logistic gradient descent on the engine
    (VERDICT r10 action #4) — the float production fit
    (tools/train_quality_classifier.py) re-expressed in scaled-integer
    arithmetic so the epoch-unroll oracle pattern applies to the
    LOGISTIC trainer too, not just the perceptron.

    Value-domain recurrence per epoch (quantized as noted):
      x   = cnt / n_feats_doc          → x_q  = (cnt·Q) div n_tot
      z   = w·x                        → z_q  = Σ x_q·w_q   (scale Q·W)
      p̂   = clamp(z/4 + ½, 0, 1)       → p_q  = clamp(z_q div (4QW/P)
                                                      + P/2, 0, P)
      r   = p̂ − y                      → r_q  = p_q − y·P
      g_b = Σ_docs r·x_b               → g_q  = Σ r_q·x_q   (scale P·Q)
      w_b ← w_b − (λ/e)·g_b/n          → w_q −= ((λW div e)·g_q)
                                                 div (P·Q·n)

    The hard sigmoid (piecewise-linear σ̂, the quantized-training
    standard) replaces exp so both engines compute the SAME integers:
    every division above is truncate-toward-zero — the one integer
    division semantics Spark (`div`), DuckDB (`//`), and the
    driver-side Python update (:func:`_tdiv`) agree on exactly. L2 is
    omitted: at these scales λ·L2·w_q < 1 truncates to zero anyway.

    Scale shape: identical to perceptron_distill — the model
    broadcasts (≤ n_features ints), each epoch is one doc-keyed
    scoring aggregation plus one bucket-keyed gradient aggregation
    (map-side combined to ≤ n_features rows), and the only collect is
    the model-sized gradient vector. The gradient accumulates in
    decimal(38,0) Spark-side / HUGEINT oracle-side (the r7 rule for
    product aggregates: |r_q·x_q| ≤ P·Q ≈ 10⁶ per pair, so int64
    holds only to ~10¹² doc-bucket pairs — a 100 TB corpus crosses
    that)."""
    feats = (
        _doc_features(docs, id_col, text_col, n_features)
        .withColumn(
            "__tot", F.sum("cnt").over(Window.partitionBy(id_col))
        )
        .select(
            id_col,
            "bucket",
            F.expr(f"(cnt * {Q_SCALE}) div __tot").cast("long").alias("xq"),
        )
        .persist()
    )
    labeled = feats.join(_doc_labels01(docs, id_col, text_col), id_col).persist()
    n_docs = docs.count()
    zdiv = 4 * Q_SCALE * W_SCALE // P_SCALE  # exact: 4096000/1024 = 4000

    weights: dict[int, int] = {}
    for epoch in range(1, epochs + 1):
        lr_w = LR_W // epoch
        w_df = spark.createDataFrame(
            [(b, w) for b, w in weights.items() if w] or [],
            "bucket long, wq long",
        )
        scored = (
            labeled.join(F.broadcast(w_df), "bucket", "left")
            .groupBy(id_col, "y")
            .agg(
                F.sum(F.coalesce(F.col("wq"), F.lit(0)) * F.col("xq"))
                .cast("long")
                .alias("zq")
            )
            .select(
                id_col,
                (
                    F.greatest(
                        F.lit(0),
                        F.least(
                            F.lit(P_SCALE),
                            F.expr(f"zq div {zdiv}") + F.lit(P_SCALE // 2),
                        ),
                    )
                    - F.col("y") * P_SCALE
                )
                .cast("long")
                .alias("rq"),
            )
        )
        grads = (
            labeled.join(scored, id_col)
            .groupBy("bucket")
            .agg(
                F.sum(
                    (F.col("rq") * F.col("xq")).cast("decimal(38,0)")
                ).alias("gq")
            )
            .collect()  # ≤ n_features rows — model-sized, like k-means
        )
        for r in grads:
            delta = _tdiv(lr_w * int(r["gq"]), P_SCALE * Q_SCALE * n_docs)
            if delta:
                weights[r["bucket"]] = weights.get(r["bucket"], 0) - delta

    feats.unpersist()
    labeled.unpersist()
    rows = sorted((b, w) for b, w in weights.items() if w)
    return spark.createDataFrame(rows or [], "bucket long, weight_mili long")


def logistic_sgd_warmstart(
    spark: SparkSession,
    docs: DataFrame,
    init_weights: dict[int, int] | None = None,
    start_epoch: int = 1,
    epochs: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 4096,
) -> DataFrame:
    """INCREMENTAL fixed-point logistic GD — the warm-start the
    recurring crawl needs (VERDICT r11 action #6: the streaming twin
    dedups incrementally but retrained the classifier from scratch
    each epoch). Same quantized recurrence as
    :func:`logistic_sgd_distill` — x_q = (cnt·1024) div n_tot, hard
    sigmoid clamp(z_q div 4000 + 512, 0, 1024), decayed integer
    update — with two generalizations that make generation K resume
    generation K−1:

    - ``init_weights`` seeds w instead of zero (the previous
      generation's model, model-sized — the same driver posture as
      the per-epoch collect);
    - ``start_epoch`` continues the 1/t decay where the previous
      generation stopped (LR_W div e for e = start..start+epochs−1),
      so the composed trajectory IS one long schedule, not a restart
      at full learning rate that would wipe the warm start.

    A separate function rather than new parameters on
    logistic_sgd_distill on purpose: that function's r11 attestation
    standing depends on its code path staying untouched (ROTATION.md
    changed-code rule), and the loop is small. The composed
    two-generation trajectory is attested end to end by the
    ``streaming_quality_warmstart`` gate, whose oracle unrolls BOTH
    generations — the cold epochs on the first crawl slice, then the
    warm epochs on the grown corpus — as one CTE chain.

    Scale: per-epoch cost is unchanged (one doc-keyed + one
    bucket-keyed aggregation over the CURRENT corpus); what the warm
    start buys is EPOCH COUNT — the probe
    (tools/scaling_probe_warmstart.py) measures the fresh-epochs-per-
    generation staying constant while from-scratch retraining's
    cumulative cost grows with every generation."""
    feats = (
        _doc_features(docs, id_col, text_col, n_features)
        .withColumn(
            "__tot", F.sum("cnt").over(Window.partitionBy(id_col))
        )
        .select(
            id_col,
            "bucket",
            F.expr(f"(cnt * {Q_SCALE}) div __tot").cast("long").alias("xq"),
        )
        .persist()
    )
    labeled = feats.join(_doc_labels01(docs, id_col, text_col), id_col).persist()
    n_docs = docs.count()
    zdiv = 4 * Q_SCALE * W_SCALE // P_SCALE

    weights: dict[int, int] = dict(init_weights or {})
    for epoch in range(start_epoch, start_epoch + epochs):
        lr_w = LR_W // epoch
        w_df = spark.createDataFrame(
            [(b, w) for b, w in weights.items() if w] or [],
            "bucket long, wq long",
        )
        scored = (
            labeled.join(F.broadcast(w_df), "bucket", "left")
            .groupBy(id_col, "y")
            .agg(
                F.sum(F.coalesce(F.col("wq"), F.lit(0)) * F.col("xq"))
                .cast("long")
                .alias("zq")
            )
            .select(
                id_col,
                (
                    F.greatest(
                        F.lit(0),
                        F.least(
                            F.lit(P_SCALE),
                            F.expr(f"zq div {zdiv}") + F.lit(P_SCALE // 2),
                        ),
                    )
                    - F.col("y") * P_SCALE
                )
                .cast("long")
                .alias("rq"),
            )
        )
        grads = (
            labeled.join(scored, id_col)
            .groupBy("bucket")
            .agg(
                F.sum(
                    (F.col("rq") * F.col("xq")).cast("decimal(38,0)")
                ).alias("gq")
            )
            .collect()  # ≤ n_features rows — model-sized
        )
        for r in grads:
            delta = _tdiv(lr_w * int(r["gq"]), P_SCALE * Q_SCALE * n_docs)
            if delta:
                weights[r["bucket"]] = weights.get(r["bucket"], 0) - delta

    feats.unpersist()
    labeled.unpersist()
    rows = sorted((b, w) for b, w in weights.items() if w)
    return spark.createDataFrame(rows or [], "bucket long, weight_mili long")


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
