"""Physical-plan guards: queries whose docstrings/SCALE.md claim
zero-shuffle execution must actually plan without an Exchange, and the
driver attestation window must stay exactly 50 unique entries.
Complements tools/plan_audit.py (which fails on scale-killers but not
on a quietly-introduced shuffle in a zero-shuffle operator)."""

from __future__ import annotations

import contextlib
import io

from data_warehouse_migration_spark.catalog import REGISTRY

#: Queries documented as zero-shuffle: scan → expressions → result.
ZERO_SHUFFLE = [
    "doc_fingerprint_winnow",
    "vector_ops_surface",
    "media_feature_extract_real",
]


#: Shuffle budgets for the composed pipelines: the r5 diamond-DAG fix
#: cut curation_pipeline_v3 from 38 to 13 exchanges (stage sharing via
#: window-min ownership + passthrough columns); a regression
#: re-expanding shared subtrees would show up here before it shows up
#: in the bench (VERDICT r5 action #5). Since r7 the pin counts
#: UNIQUE MATERIALIZED shuffle stages in the EXECUTED (AQE) plan, not
#: static Exchange nodes: the cache-hygiene change (VERDICT r6 #3)
#: dropped the silver-stage persists, so the shared subtree appears
#: multiple times in the static plan but its shuffles run ONCE via
#: runtime ReusedExchange.
#:
#: Why the STATIC count is deliberately NOT pinned (VERDICT r8 wrong
#: #2 asked for one number or an explanation — this is the
#: explanation): the static Exchange tally is a property of the plan
#: TEXT, not of execution cost — it counts each textual repeat of a
#: shared subtree (v3 reads 14 static at sf0.1 in PLANS.md, 15 at
#: sf0.001, while materializing 9 and 7 stages respectively) and
#: shifts whenever AQE's sf-dependent broadcast/coalesce decisions
#: re-shape the tree, so a pinned static number would be a
#: scale-factor-specific constant with no scaling meaning. The
#: executed count below is the quantity that actually moves bytes;
#: budgets are set to the CURRENT materialized counts at sf0.1 (the
#: larger of the two observed), so any re-expansion that runtime
#: exchange reuse fails to collapse trips the assert immediately.
EXCHANGE_BUDGET = {
    # Re-pinned r16 after the keep_min_id_rows rewrite (digest-window
    # dedup instead of groupBy+join-back): static exchanges and scans
    # DROPPED (v4 76→66 exchanges, 42→24 scans — plans/r16), but the
    # digest window materializes as its own runtime stage where the
    # join form's doubled subtrees had deduped via ReusedExchange, so
    # the unique-stage counts shift (v3 9→8, v4 13→14). v5 adds its
    # r16 widen round-robin exchange on the classifier leg (a
    # deliberate narrow-input spread, not a keyed shuffle — a KEYED
    # shuffle appearing in the classifier stage would still blow this
    # budget before the bench notices).
    "curation_pipeline_v3": 8,
    "curation_pipeline_v2": 5,
    "curation_pipeline_v4": 14,
    "curation_pipeline_v5": 17,
}


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_shuffle_exchanges(plan: str) -> int:
    import re

    return len(re.findall(r"^\s*\(\d+\) Exchange\b", plan, re.M))


def test_pipeline_exchange_budgets(spark, sf_dir):
    import re

    for name, budget in EXCHANGE_BUDGET.items():
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        df.collect()  # materialize so AQE finalizes stage reuse
        executed = df._jdf.queryExecution().executedPlan().toString()
        stages = set(re.findall(r"ShuffleQueryStage (\d+)", executed))
        assert len(stages) <= budget, (
            f"{name} materialized {len(stages)} unique shuffle stages "
            f"(budget {budget}) — a shared stage is being re-expanded "
            "without runtime exchange reuse picking it up"
        )


#: Row-local queries that deliberately buy ONE round-robin exchange to
#: spread a narrow single-split scan across the cores (r15,
#: operators/layout.widen_narrow_input — a no-op at production input
#: widths). Still forbidden: any hash/range exchange, i.e. any shuffle
#: an operator actually KEYS on — that would mean the row-local
#: contract broke, not the input layout.
WIDEN_ONLY = [
    "text_quality",
    # r16 sweep (VERDICT r15 #6), calm interleaved A/Bs at sf0.1:
    "pii_redaction_stats",  # 0.289 widened vs 0.506 narrow
    "simhash_fingerprints",  # 0.576 widened vs 3.340 narrow
    "chunk_documents_overlap",  # 0.230 widened vs 0.262 narrow
    "quality_classifier_scores",  # 3.041 widened vs 23.186 narrow
    "quality_classifier_trained",  # 2.942 widened vs 16.752 narrow
    # media decode gates (family A/B: media_png 1.142 vs 13.169; the
    # Arrow decode stage was single-task on the narrow fixture scan):
    "media_jpeg_decode",
    "media_jpeg_color_decode",
    "media_jpeg_420_decode",
    "media_png_decode",
    "media_gif_decode",
]


def test_zero_shuffle_queries_have_no_exchange(spark, sf_dir):
    for name in ZERO_SHUFFLE:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        plan = _formatted_plan(df)
        assert "Exchange" not in plan, f"{name} grew a shuffle:\n{plan}"


def test_widen_only_queries_have_no_keyed_exchange(spark, sf_dir):
    import re

    for name in WIDEN_ONLY:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        plan = _formatted_plan(df)
        args = re.findall(r"^Arguments: (\w+Partitioning)", plan, re.M)
        # On a 1-core session the widen is a guarded no-op (the input
        # is never narrower than defaultParallelism=1), so no exchange
        # appears at all — that is correct behavior, not a failure
        # (ADVICE r15 #3). A KEYED exchange still fails either way.
        if spark.sparkContext.defaultParallelism == 1:
            assert not args, (
                f"{name} must have no exchange on a 1-core session, "
                f"found {args}:\n{plan}"
            )
            continue
        assert args and set(args) == {"RoundRobinPartitioning"}, (
            f"{name} must shuffle only via the widen round-robin "
            f"exchange, found {args}:\n{plan}"
        )


def test_rotation_ledger_registry_count_matches(spark):
    """ROTATION.md's current-round registry count must equal
    len(REGISTRY) — the r6 ledger drifted by one when a query landed
    after the note was written (VERDICT r6 wrong #4)."""
    import pathlib
    import re

    text = pathlib.Path(__file__).resolve().parents[1].joinpath(
        "ROTATION.md"
    ).read_text()
    m = re.search(r"ledger entry stands: \*\*(\d+) entries\*\*", text)
    assert m, "ROTATION.md lost its registry-count line"
    assert int(m.group(1)) == len(REGISTRY), (
        f"ROTATION.md says {m.group(1)} entries, registry has "
        f"{len(REGISTRY)} — update the ledger note"
    )


def test_bench_headliners_are_in_the_attestation_window(spark):
    """Every bench headliner must sit inside the first-50 driver
    window (VERDICT r7 action #7): headliners are re-timed every
    round, so their correctness rows must stay driver-fresh — the r6
    gap (semdedup_embeddings / containment_quote_pairs promoted after
    the window was sealed) was convention-only and slipped."""
    names = list(REGISTRY)[:50]
    out = [n for n, q in REGISTRY.items() if q.headline and n not in names]
    assert not out, f"headliners outside the driver window: {out}"


def test_window_is_exactly_fifty_unique(spark):
    """The intended rotation set — catalog._FIRST, the parity core plus
    this round's window — must BE the first 50 registry entries, in
    order. (The prior form only checked dict-key uniqueness, which is
    vacuous — ADVICE r5.)"""
    from data_warehouse_migration_spark.catalog import _FIRST

    names = list(REGISTRY)
    assert len(_FIRST) == 50, len(_FIRST)
    assert len(set(_FIRST)) == 50
    assert names[:50] == list(_FIRST)
