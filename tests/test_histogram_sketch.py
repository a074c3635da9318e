"""HDR log2-histogram sketch invariants
(operators/histogram_sketch.py): exact mergeability, the 1/subbuckets
relative-error contract against true quantiles, and bucket math edges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.histogram_sketch import (
    hdr_histogram,
    hdr_quantiles,
    merge_histograms,
)


def _cents(spark, vals, grp="g"):
    return spark.createDataFrame([(grp, v) for v in vals], ["g", "cents"])


def test_merge_is_exact(spark):
    a = _cents(spark, [1, 5, 17, 100, 3000])
    b = _cents(spark, [2, 5, 90, 4096, 70000])
    merged = merge_histograms(
        hdr_histogram(a, ["g"], "cents"), hdr_histogram(b, ["g"], "cents")
    )
    direct = hdr_histogram(
        _cents(spark, [1, 5, 17, 100, 3000, 2, 5, 90, 4096, 70000]), ["g"], "cents"
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_relative_error_bound(spark):
    """Estimate is a lower bound within 1/16 relative of the true
    discrete quantile, across a skewed log-spread sample."""
    vals = [int(1.17**i) + 1 for i in range(120)]
    df = _cents(spark, vals)
    out = hdr_quantiles(
        hdr_histogram(df, ["g"], "cents"), ["g"], qs=(0.5, 0.95, 0.99), scale=1
    ).collect()[0]
    svals = sorted(vals)
    import math

    for q, est in ((0.5, out.p50_est), (0.95, out.p95_est), (0.99, out.p99_est)):
        true = svals[math.ceil(q * len(svals)) - 1]
        assert est <= true, (q, est, true)
        assert est >= true * (1 - 1 / 16) - 1, (q, est, true)


def test_bucket_math_powers_of_two_and_small_values(spark):
    """v=1 → (e=0, sub=0); exact powers of two start their octave
    (sub=0); the value just below a power tops the octave below."""
    df = _cents(spark, [1, 2, 15, 16, 17, 255, 256])
    rows = {
        r.cents: (r.e, r.sub)
        for r in df.withColumn("e", (F.length(F.conv(F.col("cents"), 10, 2)) - 1).cast("int"))
        .withColumn("sub", F.expr("((cents * 16) div shiftleft(1L, e)) - 16").cast("int"))
        .collect()
    }
    assert rows[1] == (0, 0)
    assert rows[2] == (1, 0)
    assert rows[16] == (4, 0)
    assert rows[255] == (7, 15)
    assert rows[256] == (8, 0)
    assert all(0 <= s < 16 for (_, s) in rows.values())


def test_zero_gets_dedicated_bucket_and_negative_raises(spark):
    """Domain contract (ADVICE r6): v=0 is in-domain — dedicated
    (e=0, sub=-16) bucket whose readout representative is exactly 0
    on both engines — while negatives raise loudly instead of
    mis-bucketing (Spark div truncates, DuckDB // floors: they would
    silently diverge)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    hist = hdr_histogram(_cents(spark, [0, 0, 1, 4]), ["g"], "cents")
    cells = {(r.e, r.sub): r.cnt for r in hist.collect()}
    assert cells[(0, -16)] == 2  # the zero bucket
    # readout: with 2 of 4 values equal to 0, p50 cut hits the zero
    # bucket, whose lower-bound representative is (16 + -16)·2^0 = 0.
    out = hdr_quantiles(hist, ["g"], qs=(0.5,), scale=1).collect()[0]
    assert out.p50_est == 0.0
    with pytest.raises((Py4JJavaError, Exception), match="negative value"):
        hdr_histogram(_cents(spark, [5, -3]), ["g"], "cents").collect()


def test_sketch_size_is_bounded(spark):
    import random

    rng = random.Random(7)
    vals = [rng.randrange(1, 1_000_000) for _ in range(5000)]
    hist = hdr_histogram(_cents(spark, vals), ["g"], "cents")
    # ≤ 20 octaves × 16 sub-buckets for values < 2^20
    assert hist.count() <= 20 * 16
