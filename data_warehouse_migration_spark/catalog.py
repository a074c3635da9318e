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

# Round 5 window (ROTATION.md has the full ledger):
# (a) parity core (warehouse module) + bench headliners stay pinned;
#     doc_perplexity_filter's code changed this round (vocab-join
#     de-broadcast), voiding its r4 row, and dedup_exact rides along as
#     insurance for the operators/dedup.py refactor (word_ngrams split).
# (b) the 12 round-4 queries that registered outside the r4 window and
#     have never had a driver row rotate in (VERDICT r4 action #1) —
#     four of them additionally had oracle/code edits this round
#     (range-bound fix, bigram de-broadcast).
# (c) the five NEW round-5 queries register straight into the window
#     (span removal, curation v3, shard manifest, stream-stream join
#     gate, real-decode multimodal).
# (d) the ten r2-stale queries rotated out in r3 rotate back (VERDICT
#     r4 action #8) — after this round no registry entry's latest
#     driver row is older than two rounds.
_WINDOW_R5 = (
    # (a) pinned core + headliners + changed-code insurance — the
    # warehouse module is prepended in _FIRST below.
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
    "dedup_exact",
    # (b) the r4 attestation backlog.
    "repetition_quality_flags",
    "pii_redaction_stats",
    "bigram_lm_scores",
    "embedding_label_centroids",
    "chunk_documents_overlap",
    "approx_percentiles_by_segment",
    "duplicate_span_pairs",
    "curation_pipeline_v2",
    "streaming_session_windows",
    "streaming_dedup_counts",
    "sliding_event_windows",
    "streaming_user_totals_final",
    # (c) new in round 5.
    "deterministic_shard_manifest",
    "duplicate_span_removal",
    "curation_pipeline_v3",
    "streaming_interval_join",
    "media_feature_extract_real",
    # (d) r2-stale set rotated back.
    "simhash_fingerprints",
    "doc_fingerprint_winnow",
    "distinct_users_by_type",
    "word_frequency_topk",
    "higher_order_token_stats",
    "gapfill_daily_event_counts",
    "deterministic_split_documents",
    "dataset_mix_by_lang",
    "eval_sample_per_lang",
    "funnel_click_to_purchase",
)
# Displaced to make room — every one hash-green in CORRECTNESS_r04.json
# with code unchanged since (q12 + the r4-re-oracled ANN/HLL/kmeans
# gates, the scalar-function surface, window_analytics_suite,
# streaming_tumbling_hourly, and the unchanged LLM-suite members) —
# plus the r3-displaced set last green in r3. All remain gated every
# round by tools/check_oracle.py + pytest.

_FIRST = (
    # Parity core: the reference's own dataflows, end to end.
    *(n for n, q in REGISTRY.items() if q.spark_fn.__module__.endswith(".warehouse")),
    *_WINDOW_R5,
)


def _reorder(first: tuple[str, ...]) -> None:
    ordered = {n: REGISTRY[n] for n in first}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder(_FIRST)
