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

# Round 11 window (ROTATION.md has the full ledger) — drain the 16-row
# r11 head-of-line (VERDICT r10 action #2), then spend the free slots
# on this round's changed-code re-attests and new gates:
# (a) parity core (warehouse module) + ALL 19 bench headliners stay
#     pinned, as every round. text_quality's r11 row doubles as the
#     Unicode-migration re-attest (its tokenization swapped to the
#     unicode_* family this round).
# (b) the 16 debt rows, head-of-line: the 9 r7-stale entries never
#     rotated since CORRECTNESS_r07 plus the 7 fillers the r10
#     registrations displaced (all have standing green rows, code
#     unchanged — this is freshness debt, not correctness risk).
# (c) the round-11 changed-code re-attests (Unicode tokenization
#     migration: word_frequency_topk, doc_token_entropy; BPE family:
#     oracle empty-merge fix (ADVICE r10 #1) + Unicode pre-tokenizer;
#     media_png_decode: sub-byte depths) and the new r11 gates,
#     appended as they land. Out-of-window voided rows this round
#     (media_feature_extract_real — umbrella over the codec changes;
#     gopher_quality_rules if its migration slips to r12) are tracked
#     as r12 head-of-line in ROTATION.md.
_WINDOW_R11 = (
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
    # (b) the 16-row debt drain: 9 r7-stale entries...
    "temperature_mix_weights",
    "contamination_overlap_scores",
    "bitmap_distinct_rollup",
    "rolling_weekly_active_users",
    "heavy_hitters_cms",
    "media_resize_real",
    "ohlc_hourly_candlesticks",
    "cohort_weekly_retention",
    "dataset_card_summary",
    # ...plus the 7 r10-displaced fillers (r7 rows standing).
    "rag_retrieval_pipeline",
    "curation_pipeline_v4",
    "streaming_rolling_wau",
    "bitmap_distinct_roaring",
    "streaming_semdedup_ingest",
    "streaming_ingest_dedup",
    "streaming_rollup_maintenance",
    # (c) r11 changed-code re-attests + new gates (appended as they
    # land; final count must bring _FIRST to exactly 50).
    "bpe_merge_training",
    "bpe_apply_token_counts",
    "word_frequency_topk",
    "doc_token_entropy",
    "media_png_decode",
    "quality_classifier_sgd_training",
    "media_jpeg_progressive_decode",
)
# Displaced to make room: the r10 window's debt-drain rows and r10
# registrations all landed fresh CORRECTNESS_r10 rows; with code
# unchanged those stand (media_png_decode, the BPE pair, and the text
# queries above are back BECAUSE their code changes this round).

_FIRST = (
    # Parity core: the reference's own dataflows, end to end.
    *(n for n, q in REGISTRY.items() if q.spark_fn.__module__.endswith(".warehouse")),
    *_WINDOW_R11,
)


def _reorder(first: tuple[str, ...]) -> None:
    ordered = {n: REGISTRY[n] for n in first}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder(_FIRST)
