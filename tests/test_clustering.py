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


def test_double_array_literal_bit_identical_to_per_component_lits(spark):
    """The one-expression literal (r15: kills k·dim py4j round trips
    per Lloyd's rebuild) must produce the exact doubles the
    per-component F.lit form did — repr round-trips through the SQL
    parser's Double.parseDouble."""
    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.operators.clustering import (
        double_array_literal,
    )

    tricky = [
        [0.1, -0.0, 1e-300, -1.5e308, 3.1234567],  # round(…, 7)-shaped + extremes
        [float(2**53 - 1), 5.0, -7.25, 6.02214076e23, 1.4e-45],
    ]
    per_component = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in tricky]
    )
    got, want = (
        spark.range(1).select(double_array_literal(tricky).alias("a")).first()["a"],
        spark.range(1).select(per_component.alias("a")).first()["a"],
    )
    import math
    import struct

    for g_row, w_row in zip(got, want):
        for g, w in zip(g_row, w_row):
            assert struct.pack("<d", g) == struct.pack("<d", w), (g, w)
    assert not any(math.isnan(x) for row in got for x in row)


def test_double_array_literal_non_finite_values(spark):
    """repr of non-finite floats ('nan'/'inf') is not a SQL literal —
    the parser used to resolve it as a column name and raise a
    confusing AnalysisException (ADVICE r15 #1; NaN centroids are
    reachable when an input embedding component is NaN). The builder
    must render them as CASTs that parse to the same IEEE values the
    per-component F.lit path produced."""
    import math

    from data_warehouse_migration_spark.operators.clustering import (
        double_array_literal,
    )

    vals = [float("nan"), float("inf"), float("-inf"), 1.5]
    got = spark.range(1).select(double_array_literal(vals).alias("a")).first()["a"]
    assert math.isnan(got[0])
    assert got[1] == float("inf")
    assert got[2] == float("-inf")
    assert got[3] == 1.5
