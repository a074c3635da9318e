"""Streaming embedding-space drift maintenance: keep the per-label
current-half centroids of `queries/llm_ops.embedding_drift_labels`
up to date as embedding batches land — the vector-side member of the
foreachBatch maintenance family (rollup lattice, CMS grids, bitmap
words, token-KL histograms, census sums).

Exactness design (why the served monitor is BIT-equal to batch):
centroid components are maintained as scaled-1e9 INTEGER sums of the
(double-cast) vector components — `round(x·1e9)` per element, summed
as BIGINT. Integer sums are order-independent and fold across any
epoch split without float drift, so the served centroid
``round(s / (1e9·n), 7)`` is identical whatever the batch
boundaries; the batch query and its DuckDB oracle compute the SAME
integer-sum centroid, so stream, batch, and oracle agree bit-for-bit
(the KL-monitor convention applied to means). The 1e-9 quantization
is a monitoring-precision choice: mean error ≤ 0.5e-9 per component,
two orders below the 1e-7 reporting precision. Bound: the BIGINT sum
holds to ~9.2e9 rows per (label, pos) at 1e9 scaling — beyond that,
drop to 1e6 scaling (same two-orders margin at the monitor's 1e-4
cosine sensitivities) or shard the sum.

The REFERENCE side is pinned (an offline centroid table computed by
the same `centroid_partials` → `centroids_from_partials` path — the
pinned-quantizer convention from streaming SemDeDup); ingest never
re-derives it.

Scale per epoch: one map-side-combined (label, pos) aggregation over
the batch — output rows bounded by labels × dim, never batch size;
serving folds partial tables and compares label×dim centroid rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)

#: Component scaling for the integer centroid sums (see module doc).
CENTROID_SCALE = 1_000_000_000


def centroid_partials(emb: DataFrame, label_col: str = "label") -> DataFrame:
    """One batch's algebraic centroid partials ``(label, pos, s_int,
    n)``: s_int = Σ round(x·1e9) as BIGINT over the batch's vectors,
    n = vector count. THE single definition both the batch query's
    halves and the stream epochs share — the word_counts rule: twins
    stay bit-identical only while both sides quantize identically."""
    vl = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col("embedding")).alias("pos", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    return vl.groupBy("label", "pos").agg(
        F.sum(F.round(F.col("x") * CENTROID_SCALE).cast("long")).alias("s_int"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def centroids_from_partials(partials: DataFrame) -> DataFrame:
    """Fold partials to ``(label, pos, m, n)``: m = round(s/(1e9·n), 7)
    — identical on any engine and any epoch split (integer fold)."""
    folded = partials.groupBy("label", "pos").agg(
        F.sum("s_int").alias("s"), F.sum("n").cast("long").alias("n")
    )
    return folded.select(
        "label",
        "pos",
        F.round(
            F.col("s").cast("double") / (F.lit(float(CENTROID_SCALE)) * F.col("n")),
            7,
        ).alias("m"),
        "n",
    )


def compare_centroids(ref: DataFrame, cur: DataFrame) -> DataFrame:
    """The drift monitor's output contract: per label, reference vs
    current counts, their ratio, and the cosine between the two
    centroids — scaled-1e-12 integer product sums over the rounded
    components (the KL convention), so the cosine is bit-stable.
    Inputs are ``(label, pos, m, n)`` centroid tables."""
    r = ref.select(
        "label", "pos", F.col("m").alias("mr"), F.col("n").alias("n_ref")
    )
    c = cur.select(
        "label", "pos", F.col("m").alias("mc"), F.col("n").alias("n_cur")
    )
    j = r.join(c, ["label", "pos"])
    sums = j.groupBy("label").agg(
        F.sum(F.round(F.col("mr") * F.col("mc") * 1e12).cast("long")).alias("s_ab"),
        F.sum(F.round(F.col("mr") * F.col("mr") * 1e12).cast("long")).alias("s_aa"),
        F.sum(F.round(F.col("mc") * F.col("mc") * 1e12).cast("long")).alias("s_bb"),
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
    )
    return sums.select(
        "label",
        "n_ref",
        "n_cur",
        F.round(F.col("n_cur") / F.col("n_ref").cast("double"), 6).alias(
            "count_ratio"
        ),
        F.round(
            F.col("s_ab") / F.sqrt(F.col("s_aa").cast("double") * F.col("s_bb")),
            6,
        ).alias("centroid_cosine"),
    )


def streaming_drift_maintenance(
    emb_stream: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Maintain the current-side centroid partial table from an
    embedding stream. Returns the started streaming query."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        overwrite_partitions_dynamic(
            centroid_partials(batch_df).withColumn(
                "epoch", F.lit(int(epoch_id)).cast("long")
            ),
            table_path,
            partition_by=["epoch"],
        )

    writer = emb_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_embedding_drift(
    spark: SparkSession, table_path: str, reference_centroids: DataFrame
) -> DataFrame:
    """Serve the drift monitor against the PINNED reference centroid
    table — bit-identical to the one-shot batch query because every
    maintained quantity is an integer fold."""
    partials = spark.read.parquet(table_path).drop("epoch")
    return compare_centroids(
        reference_centroids, centroids_from_partials(partials)
    )
