"""K-means invariants: determinism, coverage, inertia improvement."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.clustering import (
    assign_clusters,
    kmeans,
)


def test_kmeans_deterministic_and_covering(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c1, a1 = kmeans(emb, k=4, max_iter=3)
    c2, a2 = kmeans(emb.repartition(13), k=4, max_iter=3)
    assert c1 == c2  # partitioning-invariant centroids
    s1 = {(r.vec_id, r.cluster) for r in a1.select("vec_id", "cluster").collect()}
    s2 = {(r.vec_id, r.cluster) for r in a2.select("vec_id", "cluster").collect()}
    assert s1 == s2
    assert len(s1) == emb.count()  # every vector assigned exactly once


def test_kmeans_improves_inertia_over_init(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    init = [list(r.embedding) for r in emb.orderBy("vec_id").limit(4).collect()]
    inertia0 = (
        assign_clusters(emb, init).agg(F.sum("sq_dist").alias("s")).collect()[0].s
    )
    _, assigned = kmeans(emb, k=4, max_iter=3)
    inertia3 = assigned.agg(F.sum("sq_dist").alias("s")).collect()[0].s
    assert inertia3 <= inertia0


def test_separated_clusters_recovered(spark):
    # Two tight, well-separated groups → k=2 recovers the split.
    rows = [(i, [10.0 + 0.01 * i, 0.0]) for i in range(5)] + [
        (10 + i, [0.0, 10.0 + 0.01 * i]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    _, assigned = kmeans(df, k=2, max_iter=5)
    groups = {
        r.cluster: r.ids
        for r in assigned.groupBy("cluster")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
        .collect()
    }
    assert sorted(map(tuple, groups.values())) == [
        (0, 1, 2, 3, 4),
        (10, 11, 12, 13, 14),
    ]
