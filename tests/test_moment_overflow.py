"""Squared-aggregate moment sums must survive magnitudes where int64
wraps: Σcents² over bucket aggregates reaches 2^63 at real revenue
scale, Spark silently wraps a long product while DuckDB raises — the
decimal(38,0) accumulators keep the z-scores exact instead."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def test_anomaly_zscores_survive_int64_wrapping_magnitudes(spark):
    from data_warehouse_migration_spark.streaming.anomaly import read_anomalies

    # two hourly buckets of 4e9 / 5e9 cents: each square is ~2e19,
    # past the 9.2e18 long ceiling — a long accumulator wraps negative
    rows = [
        ("click", "2024-01-01 00:00:00", 4_000_000_000, 0),
        ("click", "2024-01-01 01:00:00", 5_000_000_000, 0),
    ]
    base = tempfile.mkdtemp(prefix="moment_overflow_")
    try:
        spark.createDataFrame(
            rows, "event_type string, bucket string, cents long, epoch long"
        ).withColumn("bucket", F.col("bucket").cast("timestamp")).write.parquet(
            base, mode="overwrite"
        )
        out = {
            (r.event_type, str(r.bucket)): r.zscore
            for r in read_anomalies(spark, base, z_threshold=0.5).collect()
        }
        # mean 4.5e9, sigma 0.5e9 -> z = -1 / +1 exactly; a wrapped
        # long s2 yields negative variance -> NaN/empty instead
        assert out == {
            ("click", "2024-01-01 00:00:00"): -1.0,
            ("click", "2024-01-01 01:00:00"): 1.0,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
