"""span_hashes_from_words — the digest-only twin of
word_ngrams_from_words (r8): positional contract, cross-doc equality,
short-doc whole-text-gram semantics, structural word boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.dedup import (
    normalized_text,
    span_hashes_from_words,
)


def _hashes(spark, texts: list[str], n: int) -> list[list[int]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    w = F.split(normalized_text(F.col("text")), " ")
    rows = (
        df.select("i", span_hashes_from_words(w, n).alias("h"))
        .orderBy("i")
        .collect()
    )
    return [list(r["h"]) for r in rows]


def test_positional_count_and_duplicate_spans_kept(spark):
    span = "p0 p1 p2"
    (h,) = _hashes(spark, [f"{span} mid1 mid2 {span} tail"], 3)
    # 9 words -> 7 positional trigram digests, duplicates kept.
    assert len(h) == 7
    # The repeated span hashes identically at word positions 1 and 6.
    assert h[0] == h[5]
    # And a digest appears exactly where the span repeats, nowhere else.
    assert h.count(h[0]) == 2


def test_cross_doc_equality_is_position_independent(spark):
    shared = "s0 s1 s2 s3"
    a, b = _hashes(spark, [shared + " xa ya", "xb yb zb " + shared], 4)
    assert a[0] == b[3]  # word position 1 in a, 4 in b
    assert len(set(a) & set(b)) == 1  # only the shared 4-gram


def test_short_docs_hash_whole_text(spark):
    a, b, c, d = _hashes(spark, ["one two", "one two", "one", "one two three"], 3)
    assert len(a) == len(b) == len(c) == 1
    assert a == b  # equal short texts collide onto the same digest
    assert a != c
    # A short text never hashes like any true n-gram.
    assert a[0] != d[0] and c[0] != d[0]


def test_null_text_hashes_like_empty_text(spark):
    """NULL text must behave exactly like the string-gram path: the
    whole-text '' gram, so a NULL-text doc stays visible to every
    digest consumer and dedups against empty-text docs (review
    finding: split(NULL) is NULL, and an uncoalesced NULL array would
    silently drop the document)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "a b c")],
        "doc_id int, text string",
    )
    w = F.split(normalized_text(F.col("text")), " ")
    rows = (
        df.select("doc_id", span_hashes_from_words(w, 3).alias("h"))
        .orderBy("doc_id")
        .collect()
    )
    hs = [list(r["h"]) for r in rows]
    assert len(hs[0]) == 1  # NULL text -> one whole-text digest
    assert hs[0] == hs[1] == hs[2]  # == empty and whitespace-only text
    assert hs[0][0] not in hs[3]  # and never a real n-gram's digest

    # The array-form index keeps the doc too (the consumer-facing
    # contract the old string path had).
    from data_warehouse_migration_spark.operators.dedup import (
        shingle_hash_arrays,
    )

    idx = shingle_hash_arrays(df, "doc_id", "text", 3).collect()
    assert sorted(r["doc"] for r in idx) == [1, 2, 3, 4]
    assert all(r["shs"] is not None and len(r["shs"]) >= 1 for r in idx)


def test_word_boundaries_are_structural(spark):
    a, b = _hashes(spark, ["ab c d e", "a bc d e"], 3)
    # Same character stream, different tokenization: no shared digest.
    assert not set(a) & set(b)


def test_matches_string_ngram_equality_structure(spark):
    """On a colliding corpus, digest equality must induce exactly the
    same positional equivalence classes as the n-gram STRINGS — the
    isomorphism every digest-keyed operator relies on."""
    texts = [
        "a b a b a",
        "b a b a b",
        "a b a b a extra",
    ]
    hashed = _hashes(spark, texts, 2)
    grams = [
        [tuple(t.split()[i : i + 2]) for i in range(len(t.split()) - 1)]
        for t in texts
    ]
    flat_h = [h for doc in hashed for h in doc]
    flat_g = [g for doc in grams for g in doc]
    assert len(flat_h) == len(flat_g)
    for i in range(len(flat_h)):
        for j in range(len(flat_h)):
            assert (flat_h[i] == flat_h[j]) == (flat_g[i] == flat_g[j])
