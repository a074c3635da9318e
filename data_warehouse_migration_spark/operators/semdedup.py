"""SemDeDup — semantic deduplication in embedding space (Abbas et al.
2023, arXiv:2303.09540): k-means cluster the corpus embeddings, then
within each cluster remove every vector whose cosine similarity to a
lower-id cluster member meets the threshold, keeping one
representative per semantic near-dup group.

Why it is its own operator and not `cosine_near_dup_pairs`: all-pairs
cosine is O(N²) and dead at corpus scale. The paper's observation is
that semantic duplicates land in the SAME k-means cluster, so the
pair search only needs to run within clusters — O(Σ cᵢ²), which the
operator controls by choosing k so that E[cᵢ] = N/k stays bounded
(the paper uses k ≈ 11k clusters for 100M+ docs). The cluster
assignment itself is the zero-shuffle broadcast-centroid projection
from operators/clustering.py, and the pair join shuffles on the
cluster id only.

Skew posture: a pathological hot cluster re-creates the N² corner; at
deployment scale you re-cluster oversized clusters (recursive k-means)
or cap them — the operator surfaces per-cluster sizes in its output so
the caller can see the distribution. Determinism: kmeans is the
deterministic lowest-id-init Lloyd's with rounded centroids; the keep
rule (lowest id in the pair wins) is total, so every engine/rerun
produces the identical kept set — which is what lets a DuckDB oracle
re-derive it bit-for-bit (queries/llm_ops.semdedup_embeddings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.clustering import kmeans
from data_warehouse_migration_spark.operators.similarity import dot, l2_norm


def semdedup(
    vectors: DataFrame,
    k: int = 8,
    max_iter: int = 3,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-vector verdict ``(id, cluster, dup_of, kept)``.

    ``dup_of`` = the lowest-id same-cluster member with
    round(cosine, round_to) ≥ tau, NULL for kept representatives.
    A vector is removed even if its ``dup_of`` was itself removed —
    the paper's "keep one per group" via the transitive-free lowest-id
    rule (every removed vector names a keeper or an earlier member of
    the same chain; the minimum of each chain is always kept).
    """
    _, assigned = kmeans(
        vectors,
        k=k,
        max_iter=max_iter,
        id_col=id_col,
        vec_col=vec_col,
        round_centroids=7,
    )
    # Norms are a per-VECTOR quantity: compute each once before the
    # pair join — byte-identical to cosine() (same dot/(norm·norm)
    # expression, just not recomputed) at a third of the per-pair fold
    # work (the LSH-verification precedent, operators/similarity.py).
    sized = assigned.withColumn("_nrm", l2_norm(F.col(vec_col)))
    a = sized.select(
        "cluster",
        F.col(id_col).alias("_a_id"),
        F.col(vec_col).alias("_a_vec"),
        F.col("_nrm").alias("_a_nrm"),
    )
    b = sized.select(
        "cluster",
        F.col(id_col).alias("_b_id"),
        F.col(vec_col).alias("_b_vec"),
        F.col("_nrm").alias("_b_nrm"),
    )
    den = F.col("_a_nrm") * F.col("_b_nrm")
    cos = F.when(den == 0, F.lit(0.0)).otherwise(
        dot(F.col("_a_vec"), F.col("_b_vec")) / den
    )
    dup = (
        a.join(b, "cluster")
        .filter(F.col("_a_id") < F.col("_b_id"))
        .withColumn("cos", F.round(cos, round_to))
        .filter(F.col("cos") >= tau)
        .groupBy(F.col("_b_id").alias(id_col))
        .agg(F.min("_a_id").alias("dup_of"))
    )
    return (
        assigned.select(id_col, "cluster")
        .join(dup, id_col, "left")
        .withColumn("kept", F.col("dup_of").isNull())
    )
