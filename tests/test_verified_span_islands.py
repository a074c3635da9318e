"""verified_duplicate_span_islands — the byte-verified ExactSubstr
tier (VERDICT r7 action #6): island merging, ownership, and agreement
with the digest-keyed removal operator's coverage on collision-free
data, plus a Hypothesis property against a brute-force reference."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_warehouse_migration_spark.catalog import t
from data_warehouse_migration_spark.operators.dedup import (
    remove_duplicate_spans,
    verified_duplicate_span_islands,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_owner_keeps_and_duplicate_gets_one_island(spark):
    shared = " ".join(f"w{i}" for i in range(12))  # 12 words ≥ n=10
    rows = [(1, shared + " tail one"), (2, "head " + shared)]
    out = verified_duplicate_span_islands(_docs(spark, rows), n=10).collect()
    # Doc 1 owns every shared span (lowest id) → no islands for it.
    assert all(r["doc_id"] == 2 for r in out)
    # Doc 2: spans at word starts 2,3,4 (10-grams of the 12 shared
    # words) merge into ONE island covering words 2..13.
    assert len(out) == 1
    r = out[0]
    assert (r["island_start"], r["island_end"], r["island_words"]) == (2, 13, 12)


def test_within_doc_repeats_are_not_removed(spark):
    span = " ".join(f"x{i}" for i in range(10))
    rows = [(1, span + " mid " + span)]
    out = verified_duplicate_span_islands(_docs(spark, rows), n=10).collect()
    assert out == []  # cross-doc only, matching remove_duplicate_spans


def test_disjoint_repeats_yield_separate_islands(spark):
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10))
    rows = [
        (1, a + " one filler " + b),
        (2, a + " unrelated words entirely here " + b),
    ]
    out = sorted(
        verified_duplicate_span_islands(_docs(spark, rows), n=10).collect(),
        key=lambda r: r["island_start"],
    )
    assert [r["doc_id"] for r in out] == [2, 2]
    assert (out[0]["island_start"], out[0]["island_end"]) == (1, 10)
    assert out[1]["island_words"] == 10


def test_islands_equal_digest_operator_coverage_on_fixture(spark, sf_dir):
    """On the fixture corpus (no xxhash64 collisions at this size) the
    verified islands must cover exactly the words the digest-keyed
    remove_duplicate_spans excises — total island words per doc equals
    its n_removed."""
    docs = t(spark, sf_dir, "documents")
    islands = (
        verified_duplicate_span_islands(docs, n=10)
        .groupBy("doc_id")
        .agg(F.sum("island_words").cast("int").alias("covered"))
    )
    removed = remove_duplicate_spans(docs, n=10).select(
        "doc_id", F.col("n_removed").cast("int").alias("covered")
    ).filter(F.col("covered") > 0)
    a = {r["doc_id"]: r["covered"] for r in islands.collect()}
    b = {r["doc_id"]: r["covered"] for r in removed.collect()}
    assert a == b


def _brute_force_islands(corpus: list[list[str]], n: int):
    """Reference semantics, computed with no hashing and no Spark:
    a length-``n`` word span is removable in doc d iff the SAME
    verbatim span occurs in some doc with a lower id (lowest-id doc
    owns every occurrence of its spans); removable window starts
    merge into maximal [start, end] islands, 1-based inclusive."""
    occurrences: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    for doc_id, words in enumerate(corpus, start=1):
        for i in range(len(words) - n + 1):
            occurrences.setdefault(tuple(words[i : i + n]), []).append(
                (doc_id, i + 1)
            )
    removable: dict[int, set[int]] = {}
    for span_occ in occurrences.values():
        owner = min(d for d, _ in span_occ)
        if max(d for d, _ in span_occ) != owner:
            for d, start in span_occ:
                if d > owner:
                    removable.setdefault(d, set()).add(start)
    out = []
    for d, starts in removable.items():
        run_start = run_end = None
        for s in sorted(starts):
            if run_start is None:
                run_start, run_end = s, s + n - 1
            elif s <= run_end + 1:
                run_end = max(run_end, s + n - 1)
            else:
                out.append((d, run_start, run_end, run_end - run_start + 1))
                run_start, run_end = s, s + n - 1
        if run_start is not None:
            out.append((d, run_start, run_end, run_end - run_start + 1))
    return sorted(out)


# 3-token vocabulary so random corpora collide CONSTANTLY: shared
# trigrams across docs, within-doc repeats, overlapping and adjacent
# islands, docs shorter than n — the full case space, not happy paths.
_doc = st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=st.lists(_doc, min_size=1, max_size=4))
def test_islands_match_brute_force_reference(spark, corpus):
    """For ANY corpus, the operator's islands equal the brute-force
    definition exactly — every (doc, start, end, words) tuple. Tokens
    are lowercase single-spaced so normalized_text is the identity
    and the comparison is purely about span/ownership/merge logic.

    (``spark`` is the session-scoped conftest fixture — safe under
    @given because nothing about it is per-example; the health-check
    suppression mirrors the repo's other Hypothesis-on-Spark tests.)"""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpus, start=1)]
    got = sorted(
        (r["doc_id"], r["island_start"], r["island_end"], r["island_words"])
        for r in verified_duplicate_span_islands(_docs(spark, rows), n=3).collect()
    )
    assert got == _brute_force_islands(corpus, n=3)


def test_scrub_matches_digest_removal_on_collision_free_data(spark):
    """On data with no digest collisions (any real fixture), the
    byte-verified islands scrub must remove EXACTLY the positions the
    digest-keyed remove_duplicate_spans removes — the two ownership
    definitions coincide whenever no two distinct spans share a
    digest, so the cleaned texts must be identical."""
    from data_warehouse_migration_spark.operators.dedup import (
        remove_duplicate_spans,
        scrub_span_islands,
        verified_duplicate_span_islands,
    )

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(30))),
            (1, " ".join(f"t{i}" for i in range(5, 25)) + " u1 u2 u3"),
            (2, "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 v11"),
            (3, " ".join(f"t{i}" for i in range(30))),  # full dup of 0
            (4, "short text"),
        ],
        ["doc_id", "text"],
    )
    a = {
        r.doc_id: (r.n_words, r.n_removed, r.cleaned_text)
        for r in scrub_span_islands(
            docs, verified_duplicate_span_islands(docs, n=10)
        ).collect()
    }
    b = {
        r.doc_id: (r.n_words, r.n_removed, r.cleaned_text)
        for r in remove_duplicate_spans(docs, n=10).collect()
    }
    assert a == b
