"""Metadata-driven medallion ingestion (SURVEY.md §2.1, §2.12).

The reference's Bronze layer is a Lookup→ForEach→Copy pipeline reading
``config/source_config.json`` and converting landing CSV to
Snappy-Parquet partitioned ``Table/Y/M/D`` (PL_Ingest_Bronze.json).
Here: a source registry consumed by driver code issuing
``spark.read``/``write`` — Catalyst parallelizes within each copy; a
thread pool covers the reference's ``batchCount: 4`` concurrency.
"""

from data_warehouse_migration_spark.sources.medallion import MedallionLayout
from data_warehouse_migration_spark.sources.readers import read_csv, read_parquet
from data_warehouse_migration_spark.sources.registry import (
    SourceEntry,
    ingest_bronze,
    load_source_config,
)
from data_warehouse_migration_spark.sources.writers import (
    atomic_overwrite_parquet,
    write_parquet,
)

__all__ = [
    "MedallionLayout",
    "SourceEntry",
    "load_source_config",
    "ingest_bronze",
    "read_csv",
    "read_parquet",
    "write_parquet",
    "atomic_overwrite_parquet",
]
