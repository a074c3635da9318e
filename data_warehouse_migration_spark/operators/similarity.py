"""Vector similarity search over an embedding column (north-star).

Brute-force top-k cosine is the exact baseline; the LSH-bucketed
variant (random hyperplane signs) is the 100 TB path: candidates are
generated inside buckets so the pairwise work drops from |Q|×N to
|Q|×(N / 2^bits) in expectation, then exact-rescored.

All math is native Column expressions — ``zip_with`` for the product,
``aggregate`` for the (sequential, deterministic) fold — no UDFs; at
scale these vectorize inside codegen and never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    n = l2_norm(a) * l2_norm(b)
    return F.when(n == 0, F.lit(0.0)).otherwise(dot(a, b) / n)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Queries are broadcast (a query set is small by construction); the
    corpus streams through one stage computing cosine inside codegen,
    then a per-query ``row_number`` keeps k. Ranking uses the *rounded*
    score with the neighbor id as tie-break, so the result is total and
    reproducible across engines/precisions.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = vectors.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        q.join(c, F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", F.round(cosine(F.col("q_vec"), F.col("n_vec")), round_to))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """All pairs ``(a < b)`` with cosine ≥ threshold — embedding-space
    near-duplicate detection (the vector twin of the text dedup family
    in ``operators/dedup.py``).

    Exact all-pairs: the self-join on ``id_a < id_b`` plans as a
    broadcast nested-loop with the cosine evaluated inside codegen.
    That is the correct *verification* kernel, but O(N²) candidate
    generation does not survive 100 TB — at scale, generate candidates
    first (hyperplane-LSH buckets as in :func:`hyperplane_lsh_topk`, or
    an IVF coarse quantizer), then run THIS exact kernel only on
    same-bucket pairs. The threshold is applied to the *rounded* score
    so results are reproducible across engines/precisions.
    """
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("vec_a"), F.col("vec_b")), round_to))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets + exact rescoring.

    Signature bit i = sign(v · h_i) with h_i a deterministic pseudo-random
    hyperplane derived from (seed, i, dim index) — generated as Column
    expressions so executors never ship numpy state. Same-bucket
    candidates are exact-rescored; recall is tunable via ``n_planes``
    (fewer planes → bigger buckets → higher recall & cost). The bucket
    join shuffles only (bucket, id) pairs — the 100 TB-safe shape.
    """
    dim = len(vectors.select(vec_col).first()[0])

    def signature(vec: Column) -> Column:
        bits = []
        for p in range(n_planes):
            # Deterministic "hyperplane": component j = sin(seed + p*dim + j),
            # a cheap fixed pseudo-random direction computed JVM-side.
            comps = F.array(
                *[F.sin(F.lit(float(seed + p * dim + j))) for j in range(dim)]
            )
            proj = F.aggregate(
                F.zip_with(vec, comps, lambda x, h: x.cast("double") * h),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            signature(F.col(vec_col)).alias("bucket"),
        )
    )
    c = vectors.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        signature(F.col(vec_col)).alias("bucket"),
    )
    scored = (
        q.join(c, (F.col("q_id") != F.col("n_id")) & (q["bucket"] == c["bucket"]))
        .withColumn("cosine", F.round(cosine(F.col("q_vec"), F.col("n_vec")), round_to))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )
