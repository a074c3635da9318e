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

# Round 12 window (ROTATION.md has the full ledger) — drain the
# 20-row r12 head-of-line exactly as VERDICT r11 action #2 listed it,
# plus this round's three new gates; the budget closes at exactly 50:
# (a) parity core (warehouse module) + ALL 19 bench headliners stay
#     pinned, as every round.
# (b) the 20 debt rows: the two r11 voids (media_feature_extract_real
#     — umbrella over the r11 codec changes; gopher_quality_rules —
#     Unicode-migrated in r11, judge-green, driver re-attest here)
#     and the 18 r11 registrations that landed out-of-window
#     (curation v6/v7/v8, the crawl/format stack, the codec tiers,
#     the streaming crawl twin). Several of these additionally had
#     code change THIS round (the ADVICE r11 hardening touched
#     warc/url/html_text/tar_stream/web_extract; the PDF font work
#     touched pdf.py), so their in-window slot doubles as the
#     changed-code re-attest.
# (c) the three r12 gates: both fault-quarantine gates (VERDICT r11
#     action #1) and the warm-start trainer (action #6) — registered
#     straight into the window, keeping this round's registration
#     count exactly at the free-slot budget (action #2's structural
#     note).
_WINDOW_R12 = (
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
    # (b) the 20-row debt drain: the two r11 voids...
    "media_feature_extract_real",
    "gopher_quality_rules",
    # ...and the 18 r11 out-of-window registrations (several also
    # carry r12 code changes — see the block comment).
    "curation_pipeline_v6",
    "curation_pipeline_v7",
    "curation_pipeline_v8",
    "html_text_extract",
    "url_canonicalize",
    "warc_ingest_extract",
    "robots_policy_check",
    "pdf_text_extract",
    "mime_message_extract",
    "mbox_thread_extract",
    "zip_bundle_roundtrip",
    "webdataset_shard_roundtrip",
    "media_flac_decode",
    "media_video_frame_sample",
    "media_audio_containers",
    "media_feature_extract_containers",
    "media_jpeg_exif_orientation",
    "streaming_crawl_ingest",
    # (c) the r12 gates, registered straight into the window.
    "media_decode_quarantine",
    "crawl_ingest_quarantine",
    "streaming_quality_warmstart",
)
# Displaced to make room: the r11 window's debt-drain rows and r11
# re-attests all landed fresh CORRECTNESS_r11 rows; with code
# unchanged those stand. media_resize_real stays displaced on its
# r11 row (resize_media and synthesize_assets are untouched this
# round — the quarantine work added NEW functions beside them).

_FIRST = (
    # Parity core: the reference's own dataflows, end to end.
    *(n for n, q in REGISTRY.items() if q.spark_fn.__module__.endswith(".warehouse")),
    *_WINDOW_R12,
)


def _reorder(first: tuple[str, ...]) -> None:
    ordered = {n: REGISTRY[n] for n in first}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder(_FIRST)
