"""Property-based test of incremental batch-vs-corpus dedup
(operators/dedup.incremental_dedup) — VERDICT.md r3 follow-up: the
4-way status priority (dup_corpus > dup_batch > near_corpus > new) and
min-id match selection must hold for arbitrary batch/corpus mixes, not
just the one fixture in tests/test_llm_ops.py.

Deterministic laws asserted on every random example:
- exactly one output row per batch doc, status in the 4-value domain;
- ``dup_corpus``  ⟺ the batch doc's normalized text equals some corpus
  doc's (match_id = the smallest such corpus id) — both directions;
- ``dup_batch``   ⟺ not a corpus dup AND a smaller-id batch doc has the
  same normalized text (match_id = that smallest batch id);
- ``near_corpus`` ⟹ match_id is a corpus doc with shingle-Jaccard ≥
  threshold (precision side; the banding recall side is probabilistic
  by design — the banding curve — so absence of ``near_corpus`` is
  never asserted);
- ``new``         ⟹ no identical corpus text and no earlier identical
  batch text.

Texts are drawn from a small pool (so exact/near collisions are
frequent) that includes a J≈0.95 near-duplicate pair.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_migration_spark.operators.dedup import incremental_dedup

_W = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

_BASE = " ".join(_W[i % 8] for i in range(20))
_POOL = [
    _BASE,  # near-dup anchor (20 words)
    _BASE + " omega",  # J = 18/19 ≈ 0.947 vs anchor
    "alpha beta gamma",
    "beta gamma delta",
    "gamma delta epsilon zeta",
    "delta",
    "epsilon zeta eta theta alpha beta",
    "zeta eta",
    "alpha beta gamma delta epsilon zeta eta theta",
    "theta eta zeta epsilon delta gamma beta alpha",
]

THRESHOLD = 0.8


def _shingles(text: str, n: int = 3) -> frozenset[str]:
    words = text.split(" ")
    if len(words) >= n:
        return frozenset(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
    return frozenset([text])


def _jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from data_warehouse_migration_spark.session import get_spark

        _spark = get_spark("incdedup-prop")
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


pool_idx = st.integers(min_value=0, max_value=len(_POOL) - 1)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    batch_idx=st.lists(pool_idx, min_size=1, max_size=6),
    corpus_idx=st.lists(pool_idx, min_size=1, max_size=6),
)
def test_incremental_dedup_priority_laws(batch_idx, corpus_idx):
    spark = _get_spark()
    batch_rows = [(i, _POOL[p]) for i, p in enumerate(batch_idx)]
    corpus_rows = [(100 + i, _POOL[p]) for i, p in enumerate(corpus_idx)]
    batch = spark.createDataFrame(batch_rows, "doc_id bigint, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")

    got = {
        r.doc_id: (r.status, r.match_id)
        for r in incremental_dedup(
            batch, corpus, threshold=THRESHOLD
        ).collect()
    }

    assert sorted(got) == [i for i, _ in batch_rows], "one row per batch doc"

    corpus_text = {cid: txt for cid, txt in corpus_rows}
    batch_text = dict(batch_rows)
    for doc_id, txt in batch_rows:
        status, match_id = got[doc_id]
        assert status in ("dup_corpus", "dup_batch", "near_corpus", "new")

        exact_corpus = [cid for cid, ct in corpus_rows if ct == txt]
        earlier_batch = [bid for bid, bt in batch_rows if bt == txt and bid < doc_id]

        if exact_corpus:
            assert status == "dup_corpus", (doc_id, status)
            assert match_id == min(exact_corpus)
        elif earlier_batch:
            assert status == "dup_batch", (doc_id, status)
            assert match_id == min(earlier_batch)
        elif status == "near_corpus":
            assert match_id in corpus_text, (doc_id, match_id)
            assert _jaccard(txt, corpus_text[match_id]) >= THRESHOLD
        else:
            assert status == "new" and match_id is None, (doc_id, status, match_id)
            # 'new' precision: genuinely no exact twin anywhere earlier
            assert not exact_corpus and not earlier_batch


def test_near_dup_pair_is_detected(spark):
    """The J≈0.947 pool pair must come back near_corpus: at 16 hashes /
    8 bands the banding miss probability is (1 − J²)⁸ ≈ 1e-8, and the
    MinHash family is seeded/deterministic, so this is a stable
    expectation, not a flake."""
    batch = spark.createDataFrame([(1, _POOL[1])], "doc_id bigint, text string")
    corpus = spark.createDataFrame([(100, _POOL[0])], "doc_id bigint, text string")
    [r] = incremental_dedup(batch, corpus, threshold=THRESHOLD).collect()
    assert (r.status, r.match_id) == ("near_corpus", 100)


def test_span_index_at_rest_matches_direct(tmp_path_factory):
    """remove_spans_against_digests fed from a PARQUET-stored
    span_digest_index must equal remove_spans_in_corpus computed
    directly from corpus text — the stored-index production path."""
    from data_warehouse_migration_spark.operators.dedup import (
        read_span_index,
        remove_spans_against_digests,
        remove_spans_in_corpus,
        span_digest_index,
        write_span_index,
    )

    spark = _get_spark()
    corpus = spark.createDataFrame(
        [(0, " ".join(_W[i % 8] for i in range(30)))], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [
            (10, " ".join(_W[i % 8] for i in range(25))),  # overlaps corpus
            (11, "zeta zeta zeta eta eta eta theta theta theta alpha beta"),
        ],
        ["doc_id", "text"],
    )
    idx_path = str(tmp_path_factory.mktemp("spanidx") / "digests")
    write_span_index(span_digest_index(corpus, n=10), idx_path)
    stored = read_span_index(spark, idx_path)

    direct = remove_spans_in_corpus(batch, corpus, n=10)
    from_idx = remove_spans_against_digests(batch, stored, n=10)
    assert direct.exceptAll(from_idx).count() == 0
    assert from_idx.exceptAll(direct).count() == 0
    # the overlapping doc actually lost words; the clean one did not
    got = {r["doc_id"]: r["n_removed"] for r in from_idx.collect()}
    assert got[10] > 0 and got[11] == 0


def test_span_index_scheme_stamp_enforced(tmp_path_factory):
    """ADVICE r8 #1: an index persisted under a different digest
    scheme (or never stamped) must fail the READ loudly — a
    cross-scheme join silently removes zero spans."""
    import pytest

    from data_warehouse_migration_spark.operators import dedup as D

    spark = _get_spark()
    corpus = spark.createDataFrame(
        [(0, " ".join(_W[i % 8] for i in range(30)))], ["doc_id", "text"]
    )
    root = tmp_path_factory.mktemp("spanidx_stamp")

    # stale scheme: written as sv1, code computes sv{current}
    idx = D.span_digest_index(corpus, n=10)
    idx.write.parquet(str(root / "old" / "sv1"))
    with pytest.raises(ValueError, match="sv1"):
        D.read_span_index(spark, str(root / "old"))

    # unstamped legacy layout: bare parquet dir, no sv* subdir
    idx.write.parquet(str(root / "legacy"))
    with pytest.raises(ValueError, match="not a stamped span index"):
        D.read_span_index(spark, str(root / "legacy"))

    # missing entirely
    with pytest.raises(FileNotFoundError):
        D.read_span_index(spark, str(root / "nowhere"))

    # current scheme round-trips
    D.write_span_index(idx, str(root / "ok"))
    assert D.read_span_index(spark, str(root / "ok")).columns == ["__g"]
