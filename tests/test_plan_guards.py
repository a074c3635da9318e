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
    "text_quality",
    "pii_redaction_stats",
    "chunk_documents_overlap",
    "simhash_fingerprints",
    "doc_fingerprint_winnow",
    "vector_ops_surface",
    "media_feature_extract_real",
]


#: Shuffle-exchange budgets for the composed pipelines: the r5
#: diamond-DAG fix cut curation_pipeline_v3 from 38 to 13 exchanges
#: (stage sharing via window-min ownership + passthrough columns); a
#: regression re-expanding shared subtrees would show up here before
#: it shows up in the bench (VERDICT r5 action #5).
EXCHANGE_BUDGET = {
    "curation_pipeline_v3": 13,
    "curation_pipeline_v2": 5,
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
    for name, budget in EXCHANGE_BUDGET.items():
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        n = _n_shuffle_exchanges(_formatted_plan(df))
        assert n <= budget, (
            f"{name} plans {n} shuffle exchanges (budget {budget}) — "
            "a shared stage is being re-expanded"
        )


def test_zero_shuffle_queries_have_no_exchange(spark, sf_dir):
    for name in ZERO_SHUFFLE:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        plan = _formatted_plan(df)
        assert "Exchange" not in plan, f"{name} grew a shuffle:\n{plan}"


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
