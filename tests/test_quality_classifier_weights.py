"""Trained-weight swap seam for the quality classifier (VERDICT r7
action #4): the shipped fixture fit loads through
``hashed_linear_score_mili(weights=...)``, scores EXACTLY what the
Python training twin computes, behaves measurably unlike the
structural md5 pseudo-model, and is reproducible from the frozen
training recipe."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest
from pyspark.sql import functions as F

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)


def _trainer():
    import train_quality_classifier as tqc

    return tqc


def test_seam_scores_exactly_hand_computed(spark):
    """A tiny hand-set weight table through the seam: the Spark score
    equals the Python-side sum over the identical feature stream."""
    from data_warehouse_migration_spark.functions.text import (
        hashed_linear_score_mili,
    )

    n = 8
    weights = [3, -7, 11, 0, -1, 19, -23, 5]
    text = "Spark  makes big JOINS fast"

    def bucket(feat: str) -> int:
        return int(hashlib.md5(f"{feat}:0".encode()).hexdigest()[:8], 16) % n

    toks = "spark makes big joins fast".split(" ")
    feats = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    expected = sum(weights[bucket(f)] for f in feats)

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(
        hashed_linear_score_mili(F.col("text"), n, weights=weights).alias("s")
    ).collect()[0]["s"]
    assert got == expected


def test_seam_rejects_mis_sized_table(spark):
    from data_warehouse_migration_spark.functions.text import (
        hashed_linear_score_mili,
    )

    with pytest.raises(ValueError, match="expected 16"):
        hashed_linear_score_mili(F.col("text"), 16, weights=[1, 2, 3])


def test_shipped_table_loads_and_is_well_formed():
    from data_warehouse_migration_spark.functions.text import (
        load_trained_weights,
    )

    w = load_trained_weights()
    assert len(w) == 4096
    assert sum(1 for x in w if x != 0) > 500  # a real fit, not a stub
    assert all(isinstance(x, int) for x in w)


def test_trained_fit_reproduces_from_frozen_recipe():
    """Retraining with the committed recipe reproduces the committed
    table — the fit is FROZEN, not a moving target. Tolerance: after
    8000 float64 GD iterations a different BLAS/CPU may flip
    milli-weights sitting on .5 rounding boundaries, so allow ±1 on a
    handful of buckets rather than bit-for-bit equality (on the build
    host the match IS exact)."""
    train_corpus = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(train_corpus, "documents.parquet")):
        pytest.skip("canonical training corpus not present on this host")
    tqc = _trainer()
    from data_warehouse_migration_spark.functions.text import (
        load_trained_weights,
    )

    committed = load_trained_weights()
    X, y = tqc.corpus_matrix(train_corpus)
    retrained = list(tqc.train(X, y))
    assert len(committed) == len(retrained)
    diffs = [abs(a - b) for a, b in zip(committed, retrained)]
    assert max(diffs) <= 1, max(diffs)
    assert sum(1 for d in diffs if d) <= 20, sum(1 for d in diffs if d)


def test_trained_keep_rate_differs_from_structural_half(spark, sf_dir):
    """The pseudo-model's keep verdict is hash noise w.r.t. quality
    (on this tiny-vocab fixture the shared common-token buckets happen
    to sum positive, reading ~0.81 at sf0.001 — structural either
    way); the trained model's keep-rate instead tracks its label rate
    (~36% on the training corpus), so the two must separate by a wide
    margin on the same corpus. Also pins held-out behavior: on
    sf0.001 (disjoint from the sf0.01 training corpus) the trained
    keep agrees with the distilled Gopher stopword rule ≥ 85% of the
    time — the pseudo-model can't do that for ANY rule it wasn't
    trained on except by accident."""
    # Import the catalog first: quality_ops participates in the query
    # registry's import cycle and must be initialized through it.
    from data_warehouse_migration_spark.catalog import t  # noqa: F401
    from data_warehouse_migration_spark.functions.text import (
        load_trained_weights,
    )
    from data_warehouse_migration_spark.queries.quality_ops import (
        classifier_frame,
    )

    tqc = _trainer()
    w = load_trained_weights()

    pseudo_keep = (
        classifier_frame(spark, sf_dir)
        .agg(F.avg("keep").alias("r"))
        .collect()[0]["r"]
    )
    trained = classifier_frame(spark, sf_dir, weights=w)
    trained_keep = trained.agg(F.avg("keep").alias("r")).collect()[0]["r"]
    assert abs(trained_keep - pseudo_keep) > 0.15, (trained_keep, pseudo_keep)
    # Trained keep-rate sits near its distillation label rate (0.358
    # on the training corpus), far from both coin-flip and the
    # pseudo-model's accident.
    assert 0.2 <= trained_keep <= 0.55, trained_keep

    sw_set = list(tqc.STOPWORDS)
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    sw_frac = F.size(F.filter(toks, lambda x: x.isin(*sw_set))) / F.size(toks)
    from data_warehouse_migration_spark.catalog import t

    labels = t(spark, sf_dir, "documents").select(
        "doc_id", (sw_frac >= tqc.SW_THRESHOLD).cast("int").alias("label")
    )
    agree = (
        trained.select("doc_id", "keep")
        .join(labels, "doc_id")
        .agg(F.avg((F.col("keep") == F.col("label")).cast("int")).alias("a"))
        .collect()[0]["a"]
    )
    assert agree >= 0.85, agree
