"""BPE merge training (operators/tokenizer) — scalar-reference
equivalence, the greedy-fold ≡ fixpoint-replace argument, and edge
shapes."""

from __future__ import annotations

import collections

from data_warehouse_migration_spark.operators.tokenizer import bpe_train_merges


def _ref_train(corpus: list[str], k: int):
    """Scalar Sennrich-style reference: weighted pair census
    (overlaps count), (count DESC, left ASC, right ASC) argmax,
    greedy left-to-right apply."""
    words = collections.Counter()
    for doc in corpus:
        for w in " ".join(doc.lower().split()).split(" "):
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for rank in range(1, k + 1):
        pairs: collections.Counter = collections.Counter()
        for w, cnt in words.items():
            arr = vocab[w]
            for i in range(len(arr) - 1):
                pairs[(arr[i], arr[i + 1])] += cnt
        if not pairs:
            break
        top = max(pairs.values())
        left, right = sorted(p for p, c in pairs.items() if c == top)[0]
        merges.append((rank, left, right, top))
        for w in words:
            out: list[str] = []
            for x in vocab[w]:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def _fixpoint_apply(arr: list[str], left: str, right: str) -> list[str]:
    """The ORACLE's semantics: leftmost replace on the DOUBLE-space-
    joined string with a pattern that takes one space from each
    flanking separator (consecutive matches disjoint → one pass pairs
    leftmost-first), iterated to fixpoint."""
    s = "  " + "  ".join(arr) + "  "
    pat, rep = f" {left}  {right} ", f" {left}{right} "
    while True:
        ns = s.replace(pat, rep)
        if ns == s:
            return [x for x in s.split(" ") if x]
        s = ns


def _greedy_apply(arr: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    for x in arr:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def test_greedy_fold_equals_fixpoint_replace():
    """The equivalence the oracle's recursive CTE relies on, brute-
    forced over every symbol sequence of length ≤ 8 from a 2-symbol
    alphabet for every merge direction. Same-symbol runs are the
    crux: the original single-space scheme FAILED here ('aaaaa' →
    [aa, a, aa]) because adjacent matches shared the boundary space —
    the double-space discipline makes them disjoint."""
    import itertools

    for n in range(9):
        for arr in itertools.product("ab", repeat=n):
            for left, right in (("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")):
                assert _greedy_apply(list(arr), left, right) == _fixpoint_apply(
                    list(arr), left, right
                ), (arr, left, right)
    # long odd/even same-symbol runs specifically
    for n in (9, 10, 11, 16, 17):
        arr = ["a"] * n
        assert _greedy_apply(arr, "a", "a") == _fixpoint_apply(arr, "a", "a")


def test_second_round_pattern_contains_merged_symbol():
    """Round-2 patterns like ('aa', 'a') must behave under both
    semantics too (multi-round coupling)."""
    import itertools

    for n in range(11):
        for arr0 in ([list(x) for x in itertools.product("ab", repeat=min(n, 7))]
                     if n <= 7 else [["a"] * n]):
            arr = _greedy_apply(list(arr0), "a", "a")
            for left, right in (("aa", "a"), ("a", "aa"), ("aa", "aa"), ("aa", "b")):
                assert _greedy_apply(list(arr), left, right) == _fixpoint_apply(
                    list(arr), left, right
                ), (arr0, left, right)


def test_matches_scalar_reference(spark):
    corpus = [
        "the cat sat on the mat",
        "the cats sat",
        "a mat on a cat",
        "tttt aaa the the",
        "",
        "x",
    ]
    df = spark.createDataFrame([(c,) for c in corpus], "text string")
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train_merges(spark, df, k=4).orderBy("merge_rank").collect()
    ]
    assert got == _ref_train(corpus, 4)


def test_merged_symbols_feed_later_rounds(spark):
    """A corpus engineered so round 2's winner CONTAINS round 1's
    merged symbol — the trajectory coupling the gate relies on."""
    corpus = ["abab abab abab", "ab ab"]
    df = spark.createDataFrame([(c,) for c in corpus], "text string")
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"])
        for r in bpe_train_merges(spark, df, k=2).orderBy("merge_rank").collect()
    ]
    ref = [(r, l, rr) for r, l, rr, _ in _ref_train(corpus, 2)]
    assert got == ref
    assert got[0] == (1, "a", "b")
    assert got[1][1:] == ("ab", "ab")


def test_degenerate_corpus(spark):
    # single-char words have no pairs: zero merges, empty result
    df = spark.createDataFrame([("a b c d",)], "text string")
    assert bpe_train_merges(spark, df, k=3).count() == 0


def test_exhausted_corpus_oracle_carries_vocabulary(spark):
    """ADVICE r10 #1: when the corpus runs out of mergeable pairs
    before round k, the engine breaks and keeps the last vocabulary;
    the oracle's w{k} must carry forward through the empty rounds
    instead of collapsing to zero rows. Cross-engine on the exact
    corpus from the advice (only one learnable merge, k=4)."""
    import duckdb

    import data_warehouse_migration_spark.catalog  # noqa: F401 — registry import order
    from data_warehouse_migration_spark.operators.tokenizer import (
        bpe_token_counts,
    )
    from data_warehouse_migration_spark.queries.llm_ops import (
        _bpe_apply_oracle,
        _bpe_oracle,
    )

    corpus = [(1, "ab ab ab"), (2, "c d")]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1,'ab ab ab'),(2,'c d')) t(doc_id, text)"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_token_counts(spark, df, k=4).collect()
    }
    want = {d: (n, t) for d, n, t in con.execute(_bpe_apply_oracle(4)).fetchall()}
    assert got == want == {1: (3, 3), 2: (2, 2)}
    merges = con.execute(_bpe_oracle(4)).fetchall()
    engine_merges = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train_merges(spark, df, k=4).orderBy("merge_rank").collect()
    ]
    assert engine_merges == merges == [(1, "a", "b", 3)]


def test_unicode_pretokenization_vocabulary(spark):
    """r11 migration: NBSP/ideographic-space-separated words must
    enter the vocabulary as separate words (the legacy ASCII \\s
    split treated NBSP as part of the word)."""
    from data_warehouse_migration_spark.operators.tokenizer import (
        word_vocabulary,
    )

    df = spark.createDataFrame(
        [("ab\u00a0ab",), ("cd\u3000cd",)], "text string"
    )
    vocab = {
        r["word"]: r["cnt"] for r in word_vocabulary(df).collect()
    }
    assert vocab == {"ab": 2, "cd": 2}


def test_apply_token_counts_matches_scalar(spark):
    from data_warehouse_migration_spark.operators.tokenizer import (
        bpe_token_counts,
    )

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the cats sat"),
        (3, "a mat on a cat"),
        (4, "tttt aaa the the"),
        (5, ""),  # zero words → (0, 0) via the left join
    ]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    k = 3
    # scalar: train, then symbolize each doc's words with the final vocab
    words = {}
    for _, text in corpus:
        for w in " ".join(text.lower().split()).split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    vocab = {w: list(w) for w in words}
    for _, left, right, _ in _ref_train([t for _, t in corpus], k):
        for w in vocab:
            vocab[w] = _greedy_apply(vocab[w], left, right)
    expect = {}
    for did, text in corpus:
        ws = [w for w in " ".join(text.lower().split()).split(" ") if w]
        expect[did] = (len(ws), sum(len(vocab[w]) for w in ws))
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_token_counts(spark, df, k=k).collect()
    }
    assert got == expect


def test_extend_equals_longer_training_on_same_corpus(spark):
    """Prefix-stability: extending k=3 by 2 on an UNCHANGED corpus
    reproduces merges 4-5 of a direct k=5 run — the property that
    makes vocabulary extension a safe increment (VERDICT r11 #6)."""
    from data_warehouse_migration_spark.operators.tokenizer import (
        bpe_extend_merges,
    )

    corpus = [
        "the cat sat on the mat",
        "the cats sat",
        "a mat on a cat",
        "tttt aaa the the",
    ]
    df = spark.createDataFrame([(c,) for c in corpus], "text string")
    full = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train_merges(spark, df, k=5).orderBy("merge_rank").collect()
    ]
    prior = [(l, rr) for _, l, rr, _ in full[:3]]
    ext = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_extend_merges(spark, df, prior, k_more=2)
        .orderBy("merge_rank")
        .collect()
    ]
    assert ext == full[3:]


def test_extend_on_grown_corpus_keeps_old_merges_fixed(spark):
    """The grown-corpus case: new rounds census the NEW words, but
    the prior merge table is replayed verbatim — ranks continue and
    the old merges never re-enter the census."""
    from data_warehouse_migration_spark.operators.tokenizer import (
        bpe_extend_merges,
    )

    old = ["abab abab abab", "ab ab"]
    df_old = spark.createDataFrame([(c,) for c in old], "text string")
    prior = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train_merges(spark, df_old, k=2)
        .orderBy("merge_rank")
        .collect()
    ]
    assert prior[0] == ("a", "b")
    grown = old + ["zzzz zz zz zz", "zz zz"]
    df = spark.createDataFrame([(c,) for c in grown], "text string")
    ext = [
        (r["merge_rank"], r["left_sym"], r["right_sym"])
        for r in bpe_extend_merges(spark, df, prior, k_more=1)
        .orderBy("merge_rank")
        .collect()
    ]
    # the only remaining high-count pair in the grown corpus is (z, z)
    assert ext == [(3, "z", "z")]
