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
