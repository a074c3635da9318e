"""SparkSession factory.

The reference stamps all SCD2 metadata in UTC (``currentUTC()`` at
DF_SCD2_Customer.json:156-157, ``SYSUTCDATETIME()`` at dim_customer.sql:35),
so the session timezone is pinned to UTC. AQE is enabled so joins are
re-planned at runtime (auto-broadcast, skew splitting, partition
coalescing) — the reference hand-pins ``broadcast: 'right'`` on every
join; we hint the small side explicitly *and* let AQE cover the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "spark-graft",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Scale posture (local[n] here; 1000-executor cluster in production):
    - AQE on: runtime partition coalescing, skew-join splitting, and
      dynamic broadcast conversion survive a 100× scale-up where a
      static plan would not.
    - ``shuffle_partitions`` is a *starting* number; AQE coalesces down.
      At 100 TB you raise it (≈ 2-3× total cores, or rely on
      ``spark.sql.adaptive.coalescePartitions``).
    - Arrow enabled for the (rare) Pandas-UDF paths — the parity
      operators are 100% native Column expressions (SURVEY.md §2.11).
    - Session timezone UTC (reference semantics, SURVEY.md §7.7).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescer merges post-shuffle partitions smaller than
        # minPartitionSize (default 1m) regardless of parallelismFirst
        # — on sub-MB shuffles (small corpora; the test fixtures) that
        # folds CPU-bound stages (within-cluster pair joins, rewrite
        # lambdas) onto ONE core: measured 0.5-1.0 s off semdedup /
        # dedup_embedding_cosine at sf0.1 from this alone. 64k keeps
        # tiny-data stages parallel; at production shuffle sizes
        # partitions are orders of magnitude above either bound, so
        # the conf is inert there.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Parquet scans: keep pushdown + vectorized reader on (defaults,
        # pinned here so a misconfigured environment can't silently
        # disable them).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # local[n] runs every executor thread inside the driver JVM, so
        # this heap IS the cluster's memory: 8g across 32 threads put
        # the shuffle-heaviest pipeline (curation v3: 13 exchanges + a
        # persisted stage) into GC pressure — 16g is ~20% faster on it
        # (A/B at sf0.1) and a rounding error on a 128 GiB host. On a
        # real cluster this conf is inert (executor memory governs).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Defensive only: current events.parquet is timestamp[us] (read
        # natively as TIMESTAMP_NTZ); this conf keeps the loader's bigint
        # fallback reachable if TIMESTAMP(NANOS) testdata ever returns.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
