"""Property-based test of duplicate-span removal
(operators/dedup.remove_duplicate_spans) — the Lee et al. rewrite:
spans shared with a lower-id document are excised, owners keep all
their occurrences.

Laws asserted on every random corpus (against an independent Python
reference implementation):
- cleaned_text / n_words / n_removed / cleaned_len all match the
  reference exactly, for every document;
- the globally-lowest doc_id is never modified;
- no document's cleaned text still contains a span that was removed
  from it (sound here by construction: filler words are globally
  unique per (doc, position), injected spans are separated by ≥1
  filler, so a removable span consists only of pool words and any
  seam-crossing 10-gram contains a filler word).

A deterministic companion case pins the exact-duplicate edge: the
higher-id copy cleans to the empty string.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_migration_spark.operators.dedup import remove_duplicate_spans

N = 10

#: Shared-span pool: each span is 10 words unique to that span.
_SPANS = [[f"s{j}x{k}" for k in range(N)] for j in range(4)]


def _build_doc(doc_id: int, span_ids: list[int], fill_lens: list[int]) -> str:
    """filler run, then (span + filler run) per drawn span id; filler
    words are globally unique so only pool words can ever be shared."""
    words: list[str] = []
    pos = 0

    def filler(k: int):
        nonlocal pos
        for _ in range(k):
            words.append(f"f{doc_id}q{pos}")
            pos += 1

    filler(fill_lens[0])
    for j, span in enumerate(span_ids):
        words.extend(_SPANS[span])
        filler(fill_lens[(j + 1) % len(fill_lens)])
    return " ".join(words)


def _ref_remove(docs: list[tuple[int, str]]) -> dict[int, tuple[int, int, str]]:
    words = {d: t.split(" ") for d, t in docs}
    occ: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for d, w in words.items():
        if len(w) >= N:
            for i in range(len(w) - N + 1):
                occ[" ".join(w[i : i + N])].append((d, i))
    owner = {g: min(d for d, _ in o) for g, o in occ.items()}
    removed: dict[int, set[int]] = {d: set() for d in words}
    for g, o in occ.items():
        for d, i in o:
            if d > owner[g]:
                removed[d].update(range(i, i + N))
    return {
        d: (
            len(w),
            len(removed[d]),
            " ".join(w[i] for i in range(len(w)) if i not in removed[d]),
        )
        for d, w in words.items()
    }


corpus_strategy = st.lists(
    st.tuples(
        st.lists(st.integers(0, len(_SPANS) - 1), min_size=0, max_size=3),
        st.lists(st.integers(1, 3), min_size=1, max_size=4),
    ),
    min_size=2,
    max_size=5,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy)
def test_span_removal_matches_reference(spark, corpus):
    docs = [
        (d + 1, _build_doc(d + 1, span_ids, fill_lens))
        for d, (span_ids, fill_lens) in enumerate(corpus)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["cleaned_len"], r["cleaned_text"])
        for r in remove_duplicate_spans(df, n=N).collect()
    }
    ref = _ref_remove(docs)

    assert set(out) == set(ref)
    for d, (n_words, n_removed, cleaned) in ref.items():
        got = out[d]
        assert got[0] == n_words, f"doc {d} n_words"
        assert got[1] == n_removed, f"doc {d} n_removed"
        assert got[2] == n_words - n_removed, f"doc {d} cleaned_len"
        assert got[3] == cleaned, f"doc {d} cleaned_text"

    # The globally-lowest id owns every span it contains → unchanged.
    d0 = min(ref)
    assert out[d0][3] == dict(docs)[d0]

    # No kept document still contains a span removed from it.
    words = {d: t.split(" ") for d, t in docs}
    occ: dict[str, list[int]] = defaultdict(list)
    for d, w in words.items():
        for i in range(max(len(w) - N + 1, 0)):
            occ[" ".join(w[i : i + N])].append(d)
    for g, ds in occ.items():
        owner = min(ds)
        for d in ds:
            if d > owner:
                cw = out[d][3].split(" ")
                grams = {
                    " ".join(cw[i : i + N])
                    for i in range(max(len(cw) - N + 1, 0))
                }
                assert g not in grams, f"removed span survived in doc {d}"


def test_exact_duplicate_cleans_to_empty(spark):
    text = " ".join(f"w{i}" for i in range(15))
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=N).collect()}
    assert out[1]["cleaned_text"] == text
    assert out[1]["n_removed"] == 0
    assert out[2]["cleaned_text"] == ""
    assert out[2]["n_removed"] == 15
    assert out[2]["cleaned_len"] == 0


def test_owner_keeps_internal_repeats(spark):
    # One doc repeats a span twice; a LOWER-id doc owns that span →
    # both occurrences are removed. The owner itself keeps both copies
    # of anything it owns.
    span = " ".join(f"p{i}" for i in range(N))
    df = spark.createDataFrame(
        [(1, span), (2, f"{span} mid2 {span}"), (3, f"{span} tail3")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, n=N).collect()}
    assert out[1]["cleaned_text"] == span
    assert out[2]["cleaned_text"] == "mid2"
    assert out[3]["cleaned_text"] == "tail3"


def test_incremental_corpus_ownership(spark):
    span_a = " ".join(f"a{i}" for i in range(N))
    span_b = " ".join(f"b{i}" for i in range(N))
    corpus = spark.createDataFrame([(0, span_a)], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [
            (1, span_a),                     # fully corpus-owned → empty
            (3, f"{span_b} x3 {span_a}"),    # only the corpus span removed
            (5, f"{span_b} y5 {span_b}"),    # batch-internal dup NOT removed
        ],
        ["doc_id", "text"],
    )
    from data_warehouse_migration_spark.operators.dedup import (
        remove_spans_in_corpus,
    )

    out = {r["doc_id"]: r for r in remove_spans_in_corpus(batch, corpus).collect()}
    assert out[1]["cleaned_text"] == ""
    assert out[3]["cleaned_text"] == f"{span_b} x3"
    assert out[5]["cleaned_text"] == f"{span_b} y5 {span_b}"
    assert out[5]["n_removed"] == 0


def test_removal_lists_plan_has_no_redundant_exchange(spark):
    """r15: the (id, start) .distinct() before groupBy+collect_set was
    one full extra shuffle for an identical result (collect_set
    de-duplicates, and (id, start) rows are unique by construction —
    posexplode emits each start once). Pin the lists subtree at two
    exchanges: the digest-window one and the per-doc groupBy one."""
    from data_warehouse_migration_spark.operators.dedup import (
        duplicate_span_removal_lists,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30))),
         (2, " ".join(f"w{i}" for i in range(30)))],
        ["doc_id", "text"],
    )
    lists = duplicate_span_removal_lists(docs, n=10)
    plan = lists._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 2, plan
    # And the result still de-duplicates starts.
    rows = {r["doc_id"]: sorted(r["__rm"]) for r in lists.collect()}
    assert rows == {2: list(range(1, 22))}
