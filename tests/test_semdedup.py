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


def test_hot_cluster_is_split_not_quadratic(spark):
    """Scale contract (r7, VERDICT r6 #2): a pathological input where
    one k-means cluster swallows (almost) everything must be
    recursively re-clustered under ``max_cluster_size`` — and on a
    SEPARABLE corpus the split succeeds: every final cluster fits the
    cap, and the keep rule still removes the planted duplicates."""
    import random

    rng = random.Random(11)
    # Two tight separable blobs, both initially captured by whichever
    # centroid the 2 lowest ids seed near (k=2 is forced too small).
    def blob(base, n, start):
        return [
            (start + i, [x + 1e-3 * rng.random() for x in base])
            for i in range(n)
        ]

    rows = blob([1.0, 0.0, 0.0, 0.0], 30, 0) + blob([0.0, 1.0, 0.0, 0.0], 30, 100)
    out = semdedup(
        _vecs(spark, rows),
        k=1,  # deliberately degenerate: everything in one cluster
        max_iter=2,
        tau=0.999999,
        target_cluster_size=30,
        max_cluster_size=35,
        max_split_depth=2,
    )
    sizes = [r["count"] for r in out.groupBy("cluster").count().collect()]
    assert max(sizes) <= 35, sizes  # the cap is enforced post-split
    # Each blob keeps its lowest id (dup search still runs per cluster).
    kept = sorted(r.vec_id for r in out.filter(F.col("kept")).collect())
    assert kept[0] == 0 and 100 in kept


def test_inseparable_hot_cluster_raises(spark):
    """Identical vectors cannot be centroid-split: after the depth
    budget the operator must raise loudly instead of silently running
    the N² within-cluster pair join."""
    import pytest

    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(20)]
    with pytest.raises(ValueError, match="max_cluster_size"):
        semdedup(
            _vecs(spark, rows),
            k=1,
            max_iter=1,
            tau=0.9,
            max_cluster_size=5,
            max_split_depth=1,
        )


def test_derived_defaults_match_fixed_k_on_small_corpus(spark):
    """k=None derives max(8, ceil(N/1024)) — for every attested test
    corpus that IS 8, so derived-k verdicts must equal the historical
    fixed k=8 run (the oracle-equivalence guarantee the r7 contract
    change relies on)."""
    import math

    rows = [
        (i, [math.cos(i / 5.0), math.sin(i / 3.0), 0.1 * (i % 7), 1.0])
        for i in range(60)
    ]
    derived = semdedup(_vecs(spark, rows), max_iter=2, tau=0.95)
    fixed = semdedup(_vecs(spark, rows), k=8, max_iter=2, tau=0.95)
    assert derived.exceptAll(fixed).count() == 0
    assert fixed.exceptAll(derived).count() == 0
