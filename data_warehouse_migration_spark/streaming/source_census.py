"""Streaming source-census maintenance: keep the per-source corpus
census (`queries/source_ops.source_mix_census`) current as document
batches land — the domain-curation member of the foreachBatch
maintenance family (rollup lattice, CMS grids, bitmap words, drift
histograms, moment sums).

Per-epoch DELTA partials, the family's standard contract: each
micro-batch writes its own (source, lang) partial sums under an
``epoch=K`` dynamic-overwrite partition (replay ⇒ rewrite, never
double-count). Every census component is ALGEBRAIC over those
partials — doc/char/token/short-doc counts are sums; the language
count folds from the (source, lang) key itself; the two ratios and
the keep/review verdict are pure functions of the folded sums — so
the served census is bit-identical to the one-shot batch query
whatever the batch boundaries (attested against the SAME oracle).

Scale per epoch: one map-side-combined (source, lang) aggregation
over the batch — output rows bounded by the domain×language
cardinality the batch actually saw, never its document count; serving
folds partial tables only. `compact_census_partials`-style folding is
`streaming/rollup.compact_rollup` verbatim (same schema discipline);
at this table's tiny cardinality compaction is rarely needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.dedup import normalized_text
from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)

#: Mirrors queries/source_ops: short-doc token floor + review fraction.
_SHORT_TOKENS = 20
_REVIEW_FRAC = 0.15


def census_partials(docs: DataFrame) -> DataFrame:
    """One batch's partial census ``(source, lang, n_docs, total_chars,
    total_tokens, n_short)`` — all algebraic sums."""
    tok = F.size(F.split(normalized_text(F.col("text")), " "))
    rows = docs.select(
        "source",
        "lang",
        "n_chars",
        tok.alias("tok"),
        F.when(tok < _SHORT_TOKENS, 1).otherwise(0).alias("s"),
    )
    return rows.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.sum("s").cast("long").alias("n_short"),
    )


def streaming_census_maintenance(
    doc_stream: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Maintain the per-epoch census partial table from a document
    stream. Returns the started streaming query."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        overwrite_partitions_dynamic(
            census_partials(batch_df).withColumn(
                "epoch", F.lit(int(epoch_id)).cast("long")
            ),
            table_path,
            partition_by=["epoch"],
        )

    writer = doc_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_source_census(spark: SparkSession, table_path: str) -> DataFrame:
    """Serve the census — bit-identical to the one-shot batch
    `source_mix_census`: fold the (source, lang) partials, then derive
    the per-source totals, distinct-language count, ratios, and the
    keep/review verdict from the exact folded sums."""
    partials = spark.read.parquet(table_path).drop("epoch")
    by_lang = partials.groupBy("source", "lang").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_chars").cast("long").alias("total_chars"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        F.sum("n_short").cast("long").alias("n_short"),
    )
    n = F.sum("n_docs").cast("long")
    n_short = F.sum("n_short").cast("long")
    return by_lang.groupBy("source").agg(
        n.alias("n_docs"),
        F.sum("total_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        F.round(F.sum("total_tokens").cast("long") / n, 6).alias("mean_tokens"),
        n_short.alias("n_short_docs"),
        F.round(n_short / n, 6).alias("short_frac"),
        F.when(n_short / n > _REVIEW_FRAC, "review")
        .otherwise("keep")
        .alias("verdict"),
    )
