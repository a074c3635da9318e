"""Batch-perceptron training loop (operators/training) — independent
pure-Python recomputation of the integer recurrence, plus the
epoch-1 closed form."""

from __future__ import annotations

import hashlib
import re

from data_warehouse_migration_spark.operators.training import perceptron_distill

_WS = re.compile(r"\s+")
_SW = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")
N_FEATURES = 64  # tiny space → bucket collisions exercised on purpose


def _toks(text):
    return [t for t in _WS.sub(" ", text.lower()).strip().split(" ") if t]


def _feats(text):
    u = _toks(text)
    return u + [f"{a}_{b}" for a, b in zip(u, u[1:])]


def _bucket(f):
    return int(hashlib.md5(f"{f}:0".encode()).hexdigest()[:8], 16) % N_FEATURES


def _label(text):
    u = _toks(text)
    return 1 if u and 100 * sum(1 for t in u if t in _SW) >= 7 * len(u) else -1


def _reference_train(docs, epochs):
    """Scalar twin of the distributed loop: same labels, counts,
    misclassification predicate, and batch update."""
    fx = []
    for _, text in docs:
        counts: dict[int, int] = {}
        for f in _feats(text):
            b = _bucket(f)
            counts[b] = counts.get(b, 0) + 1
        fx.append((counts, _label(text)))
    w: dict[int, int] = {}
    for _ in range(epochs):
        upd: dict[int, int] = {}
        for counts, y in fx:
            score = sum(w.get(b, 0) * c for b, c in counts.items())
            if y * score <= 0:
                for b, c in counts.items():
                    upd[b] = upd.get(b, 0) + y * c
        for b, v in upd.items():
            w[b] = w.get(b, 0) + v
    return {b: v for b, v in w.items() if v}


DOCS = [
    (1, "the cat sat on the mat and the dog is in it for now"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3, "a quick brown fox is in the barn and it is warm"),
    (4, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    (5, "to be or not to be that is the question of it all"),
    (6, ""),  # zero tokens → label −1, no features, no update ever
    (7, "the the the the the"),  # pure stopwords → label +1
]


def test_matches_independent_recomputation(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    for epochs in (1, 3):
        got = {
            r["bucket"]: r["weight"]
            for r in perceptron_distill(
                spark, df, n_features=N_FEATURES, epochs=epochs
            ).collect()
        }
        assert got == _reference_train(DOCS, epochs), epochs


def test_epoch1_is_sum_of_all_label_weighted_counts(spark):
    """w₀ = 0 misclassifies everything, so epoch 1 must equal
    Σ_docs y·x exactly — the closed form the oracle's u1 CTE states."""
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        r["bucket"]: r["weight"]
        for r in perceptron_distill(
            spark, df, n_features=N_FEATURES, epochs=1
        ).collect()
    }
    expect: dict[int, int] = {}
    for _, text in DOCS:
        y = _label(text)
        for f in _feats(text):
            b = _bucket(f)
            expect[b] = expect.get(b, 0) + y
    assert got == {b: v for b, v in expect.items() if v}


def test_deterministic_rerun(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    a = perceptron_distill(spark, df, n_features=N_FEATURES, epochs=2).collect()
    b = perceptron_distill(spark, df, n_features=N_FEATURES, epochs=2).collect()
    assert sorted(a) == sorted(b)


# --- fixed-point logistic GD (logistic_sgd_distill) ------------------------


def _sgd_reference(docs, epochs, n_features=N_FEATURES):
    """Scalar twin of the quantized logistic recurrence: xq = cnt·1024
    div tot, pq = clamp(zq tdiv 4000 + 512, 0, 1024), rq = pq − 1024·y,
    wq −= tdiv((LR_W tdiv e)·Σ rq·xq, 1024²·n) — every division
    truncating toward zero like both engines."""
    from data_warehouse_migration_spark.operators.training import LR_W, _tdiv

    fx = []
    for _, text in docs:
        counts: dict[int, int] = {}
        for f in _feats(text):
            b = _bucket(f) % n_features
            counts[b] = counts.get(b, 0) + 1
        tot = sum(counts.values())
        xq = {b: (c * 1024) // tot for b, c in counts.items()} if tot else {}
        u = _toks(text)
        y = 1 if u and 100 * sum(1 for t in u if t in _SW) >= 7 * len(u) else 0
        fx.append((xq, y))
    n = len(docs)
    w: dict[int, int] = {}
    for e in range(1, epochs + 1):
        lr = LR_W // e
        g: dict[int, int] = {}
        for xq, y in fx:
            zq = sum(w.get(b, 0) * x for b, x in xq.items())
            pq = max(0, min(1024, _tdiv(zq, 4000) + 512))
            rq = pq - 1024 * y
            for b, x in xq.items():
                g[b] = g.get(b, 0) + rq * x
        for b, gq in g.items():
            d = _tdiv(lr * gq, 1024 * 1024 * n)
            if d:
                w[b] = w.get(b, 0) - d
    return {b: v for b, v in w.items() if v}


def test_sgd_matches_independent_recomputation(spark):
    from data_warehouse_migration_spark.operators.training import (
        logistic_sgd_distill,
    )

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    for epochs in (1, 4):
        got = {
            r["bucket"]: r["weight_mili"]
            for r in logistic_sgd_distill(
                spark, df, n_features=N_FEATURES, epochs=epochs
            ).collect()
        }
        assert got == _sgd_reference(DOCS, epochs), epochs


def test_sgd_epoch1_closed_form(spark):
    """w₀ = 0 puts every featured doc at pq = 512 exactly, so epoch 1
    is wq(b) = −tdiv(LR_W·Σ_docs (512 − 1024·y)·xq(b), 1024²·n) — the
    closed form the oracle's r1/g1/w1 CTEs state."""
    from data_warehouse_migration_spark.operators.training import (
        LR_W,
        _tdiv,
        logistic_sgd_distill,
    )

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        r["bucket"]: r["weight_mili"]
        for r in logistic_sgd_distill(
            spark, df, n_features=N_FEATURES, epochs=1
        ).collect()
    }
    g: dict[int, int] = {}
    for _, text in DOCS:
        counts: dict[int, int] = {}
        for f in _feats(text):
            b = _bucket(f) % N_FEATURES
            counts[b] = counts.get(b, 0) + 1
        tot = sum(counts.values())
        if not tot:
            continue
        u = _toks(text)
        y = 1 if u and 100 * sum(1 for t in u if t in _SW) >= 7 * len(u) else 0
        for b, c in counts.items():
            g[b] = g.get(b, 0) + (512 - 1024 * y) * ((c * 1024) // tot)
    expect = {
        b: -_tdiv(LR_W * gq, 1024 * 1024 * len(DOCS))
        for b, gq in g.items()
        if _tdiv(LR_W * gq, 1024 * 1024 * len(DOCS))
    }
    assert got == expect


def test_tdiv_truncates_toward_zero():
    from data_warehouse_migration_spark.operators.training import _tdiv

    # the exact semantics verified in both engines (−7//3 = −2)
    assert _tdiv(-7, 3) == -2
    assert _tdiv(7, 3) == 2
    assert _tdiv(-6, 3) == -2
    assert _tdiv(0, 5) == 0
