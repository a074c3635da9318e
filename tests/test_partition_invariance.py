"""Partition-count invariance: the repo's exactness conventions
(integer cents, order-independent scaled-integer float sums, rounded
centroids, md5 draws) exist precisely so results cannot depend on HOW
the data is partitioned — the property that makes a sf0.1/local[32]
attestation transfer to a 1000-executor cluster. This test runs a
cross-section of the catalog under deliberately different
parallelism (shuffle.partitions 3 vs 32, input pre-repartitioned) and
asserts canonically-identical rows, catching any accidental
order-dependent float fold or partition-local nondeterminism the
DuckDB oracle (single-engine, single-run) cannot see."""

from __future__ import annotations

import pytest

from data_warehouse_migration_spark.catalog import REGISTRY

#: Cross-section: float-fold-sensitive stats, rank/window tie-breaks,
#: kmeans centroids, sketch buckets, pipeline composition.
SAMPLE = [
    "q1_pricing_summary",
    "corpus_drift_kl",
    "quantile_normalize_lengths",
    "spearman_length_vs_novelty",
    "semdedup_embeddings",
    "hdr_quantile_sketch",
    "gopher_quality_rules",
    "source_mix_census",
    "curation_pipeline_v2",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(row[c]) for c in cols) for row in df.select(*cols).collect()
    )


@pytest.mark.parametrize("name", SAMPLE)
def test_result_is_partition_invariant(spark, sf_dir, name):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _canon(REGISTRY[name].spark_fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _canon(REGISTRY[name].spark_fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert wide == narrow, (
        f"{name} changed values under a different partition count — an "
        "order-dependent fold is hiding in the plan"
    )
