"""Measured LSH pruning power — backs the docstring claim that at
production near-dup thresholds (cosine ≥ 0.8) the b=8/L=16 banding
prunes the candidate space ~10× while losing no true pair.

The fixture plants unambiguous near-duplicates (noise-perturbed copies,
cosine ≈ 0.99) in a background of independent Gaussian vectors (random
cosine ≈ 0 ± 1/√dim — nowhere near the threshold), so "recall" has an
exact, deterministic ground truth from the all-pairs twin.
"""

from __future__ import annotations

import numpy as np
import pytest

N_BACKGROUND = 280
N_PLANTED = 10
DIM = 32


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((N_BACKGROUND, DIM))
    rows = [
        (i, [float(x) for x in base[i]]) for i in range(N_BACKGROUND)
    ]
    # each planted pair: a background vector + a tiny-noise copy
    for j in range(N_PLANTED):
        noisy = base[j] + 0.02 * rng.standard_normal(DIM)
        rows.append((N_BACKGROUND + j, [float(x) for x in noisy]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_lsh_pruning_ratio_and_full_recall_at_production_threshold(spark, planted):
    from data_warehouse_migration_spark.operators.similarity import (
        cosine_near_dup_pairs,
        lsh_candidate_near_dup_pairs,
        lsh_candidate_pairs,
    )

    n = planted.count()
    all_pairs = n * (n - 1) // 2

    n_candidates = lsh_candidate_pairs(
        planted, dim=DIM, band_bits=8, n_bands=16
    ).count()
    ratio = n_candidates / all_pairs
    # P(band match) for random pairs ≈ 0.5^8 → expected ratio ≈ 6%;
    # 0.15 is the bound the operator's docstring commits to
    assert ratio <= 0.15, f"candidate ratio {ratio:.3f} exceeds 0.15"

    exact = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(planted, threshold=0.8).collect()
    }
    assert len(exact) >= N_PLANTED  # every planted pair is above threshold
    approx = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_near_dup_pairs(
            planted, threshold=0.8, dim=DIM, band_bits=8, n_bands=16
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall == 1.0, f"banding lost true pairs: recall {recall:.3f}"
    assert approx <= exact  # verification makes false positives impossible


def test_hot_bucket_cap_bounds_candidates_on_flooded_corpus(spark):
    """A corpus that is one giant near-dup flood (everyone in the same
    buckets) must not regrow the quadratic join: with the cap the
    candidate count is bounded by n_buckets·cap², without it the flood
    produces the full N²/2."""
    from data_warehouse_migration_spark.operators.similarity import (
        lsh_candidate_pairs,
    )

    rng = np.random.default_rng(11)
    center = rng.standard_normal(DIM)
    flood = [
        (i, [float(x) for x in center + 0.01 * rng.standard_normal(DIM)])
        for i in range(100)
    ]
    df = spark.createDataFrame(flood, "vec_id bigint, embedding array<double>")
    uncapped = lsh_candidate_pairs(df, dim=DIM, band_bits=8, n_bands=16).count()
    assert uncapped == 100 * 99 // 2  # the flood really is degenerate
    capped = lsh_candidate_pairs(
        df, dim=DIM, band_bits=8, n_bands=16, max_bucket_size=10
    ).count()
    assert capped < uncapped / 10
