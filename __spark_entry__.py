"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``data_warehouse_migration_spark.catalog`` — one
registry entry per implemented operator from SURVEY.md §2, each
pairing the Spark implementation with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_migration_spark.catalog import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "star_topk_orders"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Note: the driver may pass a session without our session factory's
    configs; ``nanosAsLong`` only matters for the events table, which
    the flagship star query does not touch.
    """
    return REGISTRY[FLAGSHIP].spark_fn(spark, SMOKE_SF_DIR)


def _with_cache_reset(fn: Callable[[SparkSession, str], DataFrame]):
    """Bound cached blocks to one query at a time: a few queries
    ``persist()`` a shared intermediate (duplicate_span_pairs, the
    curation pipelines), and a driver that runs many queries in one
    session would otherwise accumulate their cached blocks for the
    session lifetime (ADVICE r5). Queries are independent, so clearing
    BEFORE each run releases the previous query's cache without
    un-persisting anything the upcoming result still needs."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _with_cache_reset(q.spark_fn) for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
