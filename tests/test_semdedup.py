"""SemDeDup invariants (operators/semdedup.py). The gate query
attests exact values vs DuckDB; these pin the structural guarantees
on synthetic data where ground truth is known by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.semdedup import semdedup


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semdedup_removes_planted_duplicates(spark):
    """Two tight groups of near-identical vectors + singletons: each
    group keeps exactly its lowest id; singletons survive. The k
    lowest ids are one per intended cluster — the deterministic
    lowest-id init means a DEGENERATE id layout (all of one group
    first) can split a group across clusters and miss its pairs, the
    paper's known recall caveat; real corpora don't sort by cluster."""
    def jitter(base, i, eps=1e-4):
        return [x + eps * i for x in base]

    g1 = [1.0, 0.0, 0.0, 0.0]
    g2 = [0.0, 1.0, 0.0, 0.0]
    rows = (
        [(0, g1), (1, g2)]
        + [(2, [0.0, 0.0, 1.0, 0.0]), (3, [0.0, 0.0, 0.0, 1.0])]
        + [(10 + i, jitter(g1, i + 1)) for i in range(2)]  # dup_of → 0
        + [(20 + i, jitter(g2, i + 1)) for i in range(2)]  # dup_of → 1
    )
    out = semdedup(_vecs(spark, rows), k=4, max_iter=3, tau=0.99).collect()
    verdict = {r.vec_id: r for r in out}
    assert sorted(i for i in verdict if verdict[i].kept) == [0, 1, 2, 3]
    assert all(verdict[i].dup_of == 0 for i in (10, 11))
    assert all(verdict[i].dup_of == 1 for i in (20, 21))


def test_semdedup_chain_minimum_always_kept(spark):
    """The lowest id of every cluster is kept (dup_of only ever points
    DOWN, so the chain minimum has no candidate keeper), and every
    removed vector names a strictly lower same-cluster id."""
    rows = [
        (i, [math.cos(i / 7.0), math.sin(i / 7.0), 0.1 * (i % 3), 1.0])
        for i in range(40)
    ]
    out = semdedup(_vecs(spark, rows), k=3, max_iter=2, tau=0.95)
    bad_direction = out.filter(
        F.col("dup_of").isNotNull() & (F.col("dup_of") >= F.col("vec_id"))
    ).count()
    assert bad_direction == 0
    cluster_min_removed = (
        out.withColumn(
            "cmin", F.min("vec_id").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("cluster")
            )
        )
        .filter((F.col("vec_id") == F.col("cmin")) & ~F.col("kept"))
        .count()
    )
    assert cluster_min_removed == 0


def test_semdedup_orthogonal_corpus_keeps_everything(spark):
    rows = [(i, [1.0 if j == i else 0.0 for j in range(8)]) for i in range(8)]
    out = semdedup(_vecs(spark, rows), k=2, max_iter=2, tau=0.5)
    assert out.filter(~F.col("kept")).count() == 0
