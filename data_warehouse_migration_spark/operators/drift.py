"""Corpus drift monitoring: add-1-smoothed symmetric KL divergence
between two corpus snapshots' unigram distributions — THE
recurring-ingestion health check (a KL jump flags topic/source
composition shifts before they reach training).

Shared by the batch monitor (`queries/quality_ops.corpus_drift_kl`)
and its streaming twin (`streaming/drift.streaming_corpus_drift`),
so both compute bit-identical values from the same count tables.

Scale shape: token counts shuffle map-side-combined on the token; the
KL itself is one full-outer merge of two count tables (shuffle ∝
vocabulary, not corpus), a 1-row totals broadcast (sanctioned O(n·1)
scalar), and a vocabulary-sized sum — document text never shuffles.
Cross-engine exactness: counts are integers, and each float KL term
is rounded to a scaled 1e-12 integer BEFORE summing, so the sum is
order-independent (the catalog's exactness rule; summing raw doubles
is partition-order-dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram counts ``(t, c)`` of the normalized token stream."""
    from data_warehouse_migration_spark.operators.dedup import normalized_text

    tok = docs.select(
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("t")
    )
    return tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))


def merge_token_counts(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Fold a new batch's ``(t, c)`` counts into the running state —
    one union + re-aggregate, shuffle ∝ vocabulary."""
    if state is None:
        return batch
    return (
        state.unionByName(batch)
        .groupBy("t")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def _term_scaled(p: Column, q: Column) -> Column:
    """One KL term p·ln(p/q), as an exact scaled-1e-12 integer."""
    return F.round(p * F.log(p / q) * 1e12).cast("long")


def kl_between_counts(cnt_a: DataFrame, cnt_b: DataFrame) -> DataFrame:
    """Symmetric pair of add-1-smoothed KL divergences between two
    unigram count tables ``(t, c)``. Smoothing is over the UNION
    vocabulary, so novel tokens contribute mass instead of infinities.

    Returns one row: ``(n_tokens_a, n_tokens_b, vocab_union, kl_ab,
    kl_ba)`` with KL rounded to 6 decimals.
    """
    v = (
        cnt_a.select("t", F.col("c").alias("ca"))
        .join(cnt_b.select("t", F.col("c").alias("cb")), "t", "full_outer")
        .select(
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    s = v.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("vu"),
    )
    terms = v.crossJoin(F.broadcast(s)).select(
        ((F.col("ca") + 1.0) / (F.col("na") + F.col("vu"))).alias("p"),
        ((F.col("cb") + 1.0) / (F.col("nb") + F.col("vu"))).alias("q"),
        "na",
        "nb",
        "vu",
    )
    return terms.agg(
        F.max("na").alias("n_tokens_a"),
        F.max("nb").alias("n_tokens_b"),
        F.max("vu").alias("vocab_union"),
        F.round(F.sum(_term_scaled(F.col("p"), F.col("q"))) / 1e12, 6).alias("kl_ab"),
        F.round(F.sum(_term_scaled(F.col("q"), F.col("p"))) / 1e12, 6).alias("kl_ba"),
    )
