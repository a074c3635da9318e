"""Freeze a tiny trained weight table for the quality classifier
(VERDICT r7 action #4).

The registered ``quality_classifier_scores`` query runs fastText-shaped
inference (`functions/text.hashed_linear_score_mili`) on a
deterministic md5 PSEUDO-model, because no trained checkpoint ships in
this container. This tool produces the real thing at fixture scale: a
seeded logistic fit over the sf0.01 fixture corpus, frozen as a
``(bucket, weight_mili)`` parquet table that loads through the
documented swap seam (``weights=`` on ``hashed_linear_score_mili``).

Training target: DISTILLATION of the repo's rule-based quality
signal — label = (stopword fraction ≥ 0.07), the Gopher stopword-
density rule (Rae et al. 2021) that ``functions/text.quality_score``
and ``gopher_quality_rules`` also apply. This is the production
pattern fastText quality filters actually use (heuristic/source
labels → linear model over hashed n-grams; Brown et al. 2020 §2.2,
Joulin et al. 2016); it is also the strongest signal this fixture
corpus HAS — the seeded word-salad text carries no real language
structure (``lang`` is metadata-random w.r.t. tokens, verified
unlearnable: 0.51 held-out acc), while stopword density is a true
function of the text and transfers (0.91 held-out accuracy on the
disjoint sf0.001 corpus). The hashed unigram+bigram feature stream is
IDENTICAL
to the Spark expression — same normalization, same ``'_'``-joined
bigrams, same ``md5(token ':0') → first 8 hex nibbles mod n_features``
bucketing (``operators/sketches.hash_mod``) — so a weight vector
learned here scores identically through the Column-expression
inference path.

Determinism: fixed corpus order (doc_id ascending), zero-initialized
full-batch gradient descent with a fixed step and iteration count,
float64 — re-running this tool reproduces the committed table
bit-for-bit (pinned by ``tests/test_quality_classifier_weights.py``).

Usage:  python tools/train_quality_classifier.py [sf_dir] [out.parquet]
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

import numpy as np

N_FEATURES = 4096  # matches queries/quality_ops._QC_N_FEATURES
L2 = 1e-6
LR = 1000.0
ITERS = 8000
#: Gopher-style stopword-density label rule (Rae et al. 2021 use a
#: ≥2-stopword presence check on web text; this fixture's word salad
#: needs a fractional form — 0.07 splits the corpus ~36/64).
SW_THRESHOLD = 0.07
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

_WS = re.compile(r"\s+")


def normalized_tokens(text: str) -> list[str]:
    """Python twin of functions/text.tokens: lowercase, collapse
    whitespace, trim, split on single spaces, drop empties."""
    return [t for t in _WS.sub(" ", text.lower()).strip().split(" ") if t]


def hashed_features(text: str) -> list[str]:
    """Python twin of functions/text.hashed_ngram_features: unigrams +
    '_'-joined word bigrams, in stream order."""
    toks = normalized_tokens(text)
    return toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]


def bucket(feature: str, n_features: int = N_FEATURES) -> int:
    """Python twin of operators/sketches.hash_mod(col, seed=0, m):
    first 8 hex nibbles of md5(value ':0'), read base-16, mod m."""
    h = hashlib.md5(f"{feature}:0".encode()).hexdigest()[:8]
    return int(h, 16) % n_features


def corpus_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(X, y): per-doc normalized bucket-count rows (sum = 1 over the
    doc's feature occurrences — matching the inference-side division
    by n_feats) and the stopword-rule label, doc_id ascending."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    rows = sorted(
        zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    X = np.zeros((len(rows), N_FEATURES))
    y = np.zeros(len(rows))
    for i, (_, text) in enumerate(rows):
        toks = normalized_tokens(text)
        feats = hashed_features(text)
        for f in feats:
            X[i, bucket(f)] += 1.0
        if feats:
            X[i] /= len(feats)
        sw = sum(1 for t in toks if t in STOPWORDS) / len(toks) if toks else 0.0
        y[i] = 1.0 if sw >= SW_THRESHOLD else 0.0
    return X, y


def train(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Zero-init full-batch logistic GD; returns integer milli-weights
    (the exact representation the Spark expression consumes)."""
    w = np.zeros(X.shape[1])
    for _ in range(ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        grad = X.T @ (p - y) / len(y) + L2 * w
        w -= LR * grad
    return np.rint(w * 1000.0).astype(np.int64)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data_warehouse_migration_spark",
            "resources",
            "quality_weights_v1.parquet",
        )
    )
    X, y = corpus_matrix(sf_dir)
    w_mili = train(X, y)
    p = 1.0 / (1.0 + np.exp(-(X @ (w_mili / 1000.0))))
    acc = float(((p >= 0.5) == (y == 1.0)).mean())
    keep = float((p >= 0.5).mean())

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "bucket": pa.array(range(N_FEATURES), type=pa.int32()),
                "weight_mili": pa.array(w_mili, type=pa.int64()),
            }
        ),
        out,
        compression="snappy",
    )
    print(
        f"wrote {out}: {N_FEATURES} buckets, "
        f"{int((w_mili != 0).sum())} nonzero, train-acc {acc:.3f}, "
        f"keep-rate {keep:.3f} (label rate {y.mean():.3f})"
    )


if __name__ == "__main__":
    main()
