"""Warm-start scaling probe for the recurring crawl's TRAINED stages
(VERDICT r11 action #6): the streaming twin dedups incrementally, but
the quality classifier and the BPE vocabulary retrained from scratch
each generation — this probe measures what the r12 warm-start
operators buy as the corpus GROWS generation by generation.

Two families, same question — does per-generation retrain cost stay
bounded when each generation resumes the previous one instead of
restarting?

- ``sgd_warmstart`` — operators/training.logistic_sgd_warmstart:
  generation 1 trains the fixed-point logistic model its full 8-epoch
  cold schedule (identical to the comparator's, so the two start
  even); every later generation warm-starts from the previous weights
  and runs 2 epochs with the 1/t decay CONTINUED. The from-scratch
  comparator retrains the full 8-epoch schedule on every generation's
  corpus. Both models' training accuracy against the integer
  stopword-rule label is recorded so "cheaper" is shown not to mean
  "worse".
- ``bpe_extension`` — operators/tokenizer.bpe_extend_merges:
  generation 1 learns 6 merges; every later generation replays the
  standing merge table onto the grown vocabulary and learns 2 MORE.
  The comparator retrains the full table (6 + 2·(g−1) merges) from
  scratch — the cost a pipeline pays if it cannot extend.

Usage:
    python tools/scaling_probe_warmstart.py [--sf-dir DIR] [--gens G]

Writes ONE JSON line to stdout; the driver-committed artifact is
SCALING_r12_warmstart.json. Noise hygiene: load averages recorded;
generations run back-to-back in one session so cross-generation
comparisons share their environment; the informative numbers are the
per-generation WARM seconds staying flat-to-linear in corpus size
while the scratch comparator's grow with schedule length × corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _accuracy(spark, docs, weights_df, n_features: int) -> float:
    """Training accuracy of a fixed-point model against the integer
    stopword-rule label: predict 1 iff the hard sigmoid ≥ ½ (p_q ≥
    512) — the same quantized scoring the trainer uses."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.operators.training import (
        Q_SCALE,
        _doc_features,
        _doc_labels01,
    )

    feats = (
        _doc_features(docs, "doc_id", "text", n_features)
        .withColumn("__tot", F.sum("cnt").over(Window.partitionBy("doc_id")))
        .select(
            "doc_id",
            "bucket",
            F.expr(f"(cnt * {Q_SCALE}) div __tot").cast("long").alias("xq"),
        )
    )
    scored = (
        feats.join(
            F.broadcast(weights_df.withColumnRenamed("weight_mili", "wq")),
            "bucket",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("wq"), F.lit(0)) * F.col("xq"))
            .cast("long")
            .alias("zq")
        )
        .select(
            "doc_id",
            (F.expr("zq div 4000") + F.lit(512) >= F.lit(512))
            .cast("int")
            .alias("pred"),
        )
    )
    hits = (
        _doc_labels01(docs, "doc_id", "text")
        .join(scored, "doc_id")
        .select(F.avg((F.col("pred") == F.col("y")).cast("double")).alias("a"))
        .collect()[0]["a"]
    )
    return round(float(hits), 4)


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    gens = 4
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sf-dir":
            sf_dir = args.pop(0)
        elif a == "--gens":
            gens = int(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a}")

    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.operators.tokenizer import (
        bpe_extend_merges,
        bpe_train_merges,
    )
    from data_warehouse_migration_spark.operators.training import (
        logistic_sgd_warmstart,
    )
    from data_warehouse_migration_spark.session import get_spark

    spark = get_spark("spark-graft-warmstart-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Deterministic growth: generation g sees doc_id % gens < g —
    # content-addressed prefixes, so re-runs see identical corpora.
    corpora = [docs.filter(F.col("doc_id") % gens < g) for g in range(1, gens + 1)]

    load_before = round(os.getloadavg()[0], 2)
    result: dict = {
        "sf_dir": sf_dir,
        "gens": gens,
        "corpus_docs": [c.count() for c in corpora],
        "families": {},
    }

    # --- family 1: fixed-point SGD warm-start vs from-scratch ---------------
    n_features = 4096
    cold_epochs, warm_epochs, scratch_epochs = 8, 2, 8
    per_gen = []
    weights = {}
    epoch_cursor = 1
    for g, corpus in enumerate(corpora, start=1):
        n_epochs = cold_epochs if g == 1 else warm_epochs
        t0 = time.time()
        w_df = logistic_sgd_warmstart(
            spark, corpus,
            init_weights=weights if g > 1 else None,
            start_epoch=epoch_cursor, epochs=n_epochs,
            n_features=n_features,
        )
        rows = w_df.collect()  # model-sized; also the next gen's seed
        warm_sec = round(time.time() - t0, 3)
        weights = {int(r["bucket"]): int(r["weight_mili"]) for r in rows}
        epoch_cursor += n_epochs
        warm_acc = _accuracy(spark, corpus, w_df, n_features)

        t0 = time.time()
        s_df = logistic_sgd_warmstart(
            spark, corpus, None, start_epoch=1, epochs=scratch_epochs,
            n_features=n_features,
        )
        s_df.collect()
        scratch_sec = round(time.time() - t0, 3)
        scratch_acc = _accuracy(spark, corpus, s_df, n_features)
        per_gen.append(
            {
                "gen": g,
                "corpus_docs": result["corpus_docs"][g - 1],
                "warm_epochs": n_epochs,
                "warm_sec": warm_sec,
                "warm_acc": warm_acc,
                "scratch_epochs": scratch_epochs,
                "scratch_sec": scratch_sec,
                "scratch_acc": scratch_acc,
            }
        )
    result["families"]["sgd_warmstart"] = {
        "per_gen": per_gen,
        "warm_total_sec": round(sum(p["warm_sec"] for p in per_gen), 3),
        "scratch_total_sec": round(sum(p["scratch_sec"] for p in per_gen), 3),
    }

    # --- family 2: BPE vocabulary extension vs full retrain -----------------
    k_base, k_step = 6, 2
    per_gen = []
    merges: list[tuple[str, str]] = []
    for g, corpus in enumerate(corpora, start=1):
        t0 = time.time()
        if g == 1:
            new = bpe_train_merges(spark, corpus, k=k_base).collect()
        else:
            new = bpe_extend_merges(
                spark, corpus, merges, k_more=k_step
            ).collect()
        warm_sec = round(time.time() - t0, 3)
        merges += [(r["left_sym"], r["right_sym"]) for r in new]

        k_full = k_base + k_step * (g - 1)
        t0 = time.time()
        bpe_train_merges(spark, corpus, k=k_full).collect()
        scratch_sec = round(time.time() - t0, 3)
        per_gen.append(
            {
                "gen": g,
                "corpus_docs": result["corpus_docs"][g - 1],
                "new_merges": len(new),
                "vocab_merges_total": len(merges),
                "extend_sec": warm_sec,
                "scratch_merges": k_full,
                "scratch_sec": scratch_sec,
            }
        )
    result["families"]["bpe_extension"] = {
        "per_gen": per_gen,
        "extend_total_sec": round(sum(p["extend_sec"] for p in per_gen), 3),
        "scratch_total_sec": round(sum(p["scratch_sec"] for p in per_gen), 3),
    }

    result["meta"] = {
        "load_1m_before": load_before,
        "load_1m_after": round(os.getloadavg()[0], 2),
        "cpus": os.cpu_count(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
