"""Query catalog: every operator's showcase query + its DuckDB oracle.

Single source of truth consumed by ``__spark_entry__.py`` (driver
contract) and ``bench.py`` (sf0.1 timing). Each entry pairs

- a Spark implementation ``(spark, sf_dir) -> DataFrame``, and
- an equivalent ANSI-SQL string DuckDB runs on the same parquet
  (views ``region nation customer supplier part orders lineitem
  events documents embeddings`` are pre-registered by the driver).

Cross-engine exactness rules (the driver hash-compares values):
- Aggregates over money/quantity doubles go through EXACT integer
  arithmetic: scale to cents (``round(x*100)::bigint``), sum as
  integers, divide once at the end. Summing doubles directly is
  order-dependent (Spark and DuckDB combine partitions differently)
  and can flip a rounded 2-decimal digit.
- Every computed column is aliased identically on both sides (the
  driver sorts columns by name before hashing).
- Timestamps are cast to DATE where the semantics are daily;
  tie-breaks in top-k are made total by adding key columns to the sort.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # None → driver does a weaker rows-only check
    headline: bool = False  # included in bench.py timing loop
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, headline: bool = False, tags: tuple[str, ...] = ()):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = Query(name, fn, oracle, headline, tags)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table. Parquet → column pruning + predicate
    pushdown happen at the scan via Catalyst once the query narrows it.

    ``events.ts`` is parquet ``timestamp[us]`` with no zone — Spark
    reads it as TIMESTAMP_NTZ, which matches DuckDB's naive TIMESTAMP
    exactly, so batch oracles align with no conversion. One defensive
    branch remains for the older testdata shape (TIMESTAMP(NANOS) read
    as raw-nanos bigint via ``nanosAsLong``): integer-divide to µs —
    ns epochs (~1.7e18) exceed double mantissa precision, and DuckDB's
    CAST truncates rather than rounds.
    """
    if name == "events":
        # Harmless for timestamp[us] data; makes the bigint branch
        # reachable if nanos-shaped testdata ever returns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def cents(c, scale: int = 2):
    """Exact integer representation of a money/quantity double."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * (10**scale)).cast("long")


# ---------------------------------------------------------------------------
# Warehouse-parity queries (SURVEY.md §2) land here via register_* calls at
# the bottom of this module; extension operators register from their own
# modules to keep this file navigable.
# ---------------------------------------------------------------------------

from data_warehouse_migration_spark.queries import (  # noqa: E402,F401
    analytics,
    functions_surface,
    llm_ops,
    quality_ops,
    sketch_ops,
    source_ops,
    streaming_gates,
    warehouse,
)

# ---------------------------------------------------------------------------
# Registry ordering. The driver's correctness gate attests the FIRST 50
# registry entries in iteration order, so ordering is part of the contract:
# the warehouse parity core (SURVEY §2.1-§2.9 — the queries a reference user
# actually migrates), the bench headliners, and the LLM-ops suite must sit
# inside that window. The TPC-H-shape depth suite and the scalar-function
# surface (both redundantly covered by pytest + tools/check_oracle.py) take
# the tail.
#
# Attestation rotation (see ROTATION.md): the registry outgrew the 50-entry
# window in round 2, so each round rotates never/least-recently-attested
# queries in, displacing entries whose code is unchanged and whose green
# attestation from a prior round therefore still stands. The parity core
# (warehouse module) is pinned in-window every round.
# ---------------------------------------------------------------------------

# Round 8 window (ROTATION.md has the full ledger) — the VERDICT r7
# consolidation round: freeze registration growth, drain the
# attestation debt.
# (a) parity core (warehouse module) + ALL 19 bench headliners stay
#     pinned. dedup_ngram_jaccard and curation_pipeline_v3 are ALSO
#     changed-code attests this round (benched deployment shape:
#     durable parquet stage boundary — VERDICT r7 action #2).
# (b) the FULL 18-query r6 attestation backlog remainder (VERDICT r7
#     action #1) — includes the five late-r7 changed-code re-attests
#     (streaming_bitmap_distinct negative-key guard;
#     hourly_anomaly_zscores / welch_t_event_values /
#     streaming_anomaly_zscores / gini_revenue_concentration
#     decimal(38,0) overflow hardening — VERDICT r7 action #3).
# (c) dedup_clusters — late-r7 label-propagation convergence-check
#     rewrite voided its r6 row (the sixth action-#3 re-attest).
# (d) the three r4-stale ANN recall gates (their rows are the oldest
#     hard signal in the ledger), with floors re-derived from current
#     sf0.01 measurements this round (VERDICT r7 action #5) — a
#     changed-code attest. similarity_ivf_topk is NOT rotated: its r7
#     row is fresh and its floor (70 vs 85-97 measured) is already the
#     tightest of the family, so rotation would buy nothing.
# (e) quality_classifier_scores — late-r7 registration whose code
#     changes this round (trained-weight swap seam, VERDICT r7 action
#     #4), so it takes the newest-code slot of the late-r7 set.
_WINDOW_R8 = (
    # (a) pinned headliners — the warehouse module is prepended in
    # _FIRST below.
    "q1_pricing_summary",
    "star_revenue_by_nation",
    "q3_shipping_priority",
    "dedup_ngram_jaccard",
    "text_quality",
    "similarity_topk",
    "sessionize_events",
    "dedup_embedding_cosine",
    "continuous_aggregate_rollup",
    "training_data_pipeline",
    "doc_perplexity_filter",
    "duplicate_span_pairs",
    "curation_pipeline_v2",
    "curation_pipeline_v3",
    "semdedup_embeddings",
    "containment_quote_pairs",
    # (b) r6 backlog remainder — never driver-attested until now.
    "asof_merge_scan_attribution",
    "similarity_sq8_topk",
    "range_join_bucketed_activity",
    "doc_token_entropy",
    "simhash_near_pairs",
    "key_skew_profile",
    "streaming_heavy_hitters_cms",
    "streaming_bitmap_distinct",
    "streaming_anomaly_zscores",
    "hourly_anomaly_zscores",
    "feature_hash_vectors",
    "equidepth_bucketizer",
    "welch_t_event_values",
    "mann_kendall_trend",
    "dedup_exact_best_copy",
    "doc_novelty_scores",
    "benford_first_digit_audit",
    "gini_revenue_concentration",
    # (c) changed-code re-attest (late-r7 convergence-check rewrite).
    "dedup_clusters",
    # (d) r4-stale ANN recall gates, floors re-derived this round.
    "similarity_lsh_topk",
    "similarity_pq_topk",
    "similarity_ivf_pq_topk",
    # (e) late-r7 registration with round-8 code changes (weight seam).
    "quality_classifier_scores",
)
# Displaced to make room — the r7 ADVICE-fix set, the r6-review
# re-attests, the two r7 newcomers, and the r6-backlog first tranche:
# all attested fresh in CORRECTNESS_r07.json with code unchanged
# since. The 13 remaining late-r7 registrations and the 10 remaining
# r4-green "still waiting" entries drain over r9 (plan in
# ROTATION.md); all stay gated every round by tools/check_oracle.py +
# pytest.

_FIRST = (
    # Parity core: the reference's own dataflows, end to end.
    *(n for n, q in REGISTRY.items() if q.spark_fn.__module__.endswith(".warehouse")),
    *_WINDOW_R8,
)


def _reorder(first: tuple[str, ...]) -> None:
    ordered = {n: REGISTRY[n] for n in first}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder(_FIRST)
