"""Containment (asymmetric near-dup) invariants
(operators/dedup.containment_pairs), including the exact-prefix
boundary case that the float prefix-length formula dropped.
"""

from __future__ import annotations

from data_warehouse_migration_spark.operators.dedup import containment_pairs


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs(df, **kw).collect()
    }


def test_quote_inside_longer_doc_detected(spark):
    quote = "the quick brown fox jumps over the lazy dog"
    container = (
        "unrelated preamble words here and more filler "
        + quote
        + " trailing content that keeps going with extra words"
    )
    out = _pairs(
        spark, [(1, quote), (2, container), (3, "something else entirely ok")],
        threshold=0.9,
    )
    assert (1, 2) in out and out[(1, 2)] == 1.0
    assert (2, 1) not in out  # asymmetric: the long doc is not contained
    assert all(3 not in p for p in out)


def test_identical_docs_emit_both_directions(spark):
    out = _pairs(
        spark,
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon")],
        threshold=0.9,
    )
    assert out[(1, 2)] == 1.0 and out[(2, 1)] == 1.0


def test_exact_boundary_overlap_not_dropped(spark):
    """A doc with exactly 10 shingles, 9 of them shared (C = 0.9
    exactly): (1-0.9)*10 floats to 0.999…, so the old floor-based
    prefix length was 1 slot short and could drop the pair. The
    integer prefix must keep it regardless of which shingle the
    global-frequency order puts first."""
    # 12 words → 10 3-gram shingles; change the last word → the last
    # shingle pair differs, sharing 9/10... build contained doc A and
    # container B = A's words with extra tail so A's shingles minus one
    # appear in B.
    a_words = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    # B contains w1..w11 then diverges: shares shingles starting at
    # positions 1..9 (9 of A's 10); A's last shingle (w10 w11 w12) is
    # not in B.
    b_words = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 zz plus more tail words"
    out = _pairs(spark, [(1, a_words), (2, b_words)], threshold=0.9)
    assert (1, 2) in out
    assert abs(out[(1, 2)] - 0.9) < 1e-9
