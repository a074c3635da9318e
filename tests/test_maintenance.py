"""Small-file compaction + partition retention semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_warehouse_migration_spark.sources.maintenance import (
    compact_parquet,
    drop_partitions_older_than,
    table_file_stats,
)
from data_warehouse_migration_spark.sources.writers import write_parquet


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    # 64 tiny files
    spark.range(10_000).repartition(64).write.parquet(path)
    before = table_file_stats(spark, path).first()
    assert before.n_files == 64

    expected = {r.id for r in spark.read.parquet(path).collect()}
    n_after = compact_parquet(spark, path, target_file_mb=256)
    after = table_file_stats(spark, path).first()
    assert n_after == after.n_files < 64
    got = {r.id for r in spark.read.parquet(path).collect()}
    assert got == expected  # byte-for-byte content survives re-binning
    assert os.path.islink(path)  # swap went through the atomic pointer


def test_compact_parquet_refuses_partitioned_root(spark, tmp_path):
    """Compacting a Hive-partitioned root would flatten col=value dirs
    and lose pruning — it must refuse (ADVICE r2); per-partition
    compaction still works."""
    import pytest

    path = str(tmp_path / "by_day")
    df = spark.createDataFrame(
        [(i, f"2024-01-{d:02d}") for d in (1, 2) for i in range(50)],
        "v int, day string",
    )
    write_parquet(df, path, partition_by=["day"])
    with pytest.raises(ValueError, match="partition"):
        compact_parquet(spark, path)
    # the sanctioned shape: compact one partition directory
    n = compact_parquet(spark, f"{path}/day=2024-01-01", target_file_mb=256)
    assert n >= 1
    assert spark.read.parquet(path).count() == 100


def test_drop_partitions_older_than_is_metadata_only(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    df = spark.createDataFrame(
        [(i, f"2024-01-{d:02d}") for d in (1, 2, 3, 4) for i in range(5)],
        "v int, day string",
    )
    write_parquet(df, path, partition_by=["day"])
    dropped = drop_partitions_older_than(path, "day", "2024-01-03")
    assert dropped == ["2024-01-01", "2024-01-02"]

    remaining = spark.read.parquet(path)
    assert remaining.count() == 10
    # partition values type-infer to DATE on read; compare as strings
    assert sorted(str(r.day) for r in remaining.select("day").distinct().collect()) == [
        "2024-01-03",
        "2024-01-04",
    ]
    # idempotent re-run: nothing left to drop
    assert drop_partitions_older_than(path, "day", "2024-01-03") == []


def test_vacuum_versions_removes_orphans_keeps_live(spark, tmp_path):
    from data_warehouse_migration_spark.sources.maintenance import vacuum_versions
    from data_warehouse_migration_spark.sources.writers import (
        atomic_overwrite_parquet,
    )

    path = str(tmp_path / "tbl")
    atomic_overwrite_parquet(spark.range(5), path)
    # keep_old=True strands the superseded version; fake a crash orphan too
    atomic_overwrite_parquet(spark.range(7), path, keep_old=True)
    os.makedirs(f"{path}.__v_deadbeef")

    removed = vacuum_versions(path)
    assert len(removed) == 2  # the kept old version + the crash orphan
    assert spark.read.parquet(path).count() == 7  # live state untouched
    live = os.path.basename(os.path.realpath(path))
    leftovers = [d for d in os.listdir(tmp_path) if "__" in d]
    assert leftovers == [live]
    assert vacuum_versions(path) == []  # idempotent


def test_time_travel_reads_previous_versions(spark, tmp_path):
    """list_table_versions orders oldest→newest with the live target
    last; read_table_version(-2) returns the pre-swap state; vacuum
    collapses history to the live version only."""
    import time as _time

    from data_warehouse_migration_spark.sources.maintenance import (
        list_table_versions,
        read_table_version,
        vacuum_versions,
    )
    from data_warehouse_migration_spark.sources.writers import (
        atomic_overwrite_parquet,
    )

    path = str(tmp_path / "tbl")
    for n in (1, 2, 3):
        atomic_overwrite_parquet(spark.range(n * 10), path)
        _time.sleep(0.05)  # distinct mtimes for deterministic ordering

    vers = list_table_versions(path)
    assert len(vers) == 3
    import os

    assert os.path.realpath(vers[-1]) == os.path.realpath(path)
    assert read_table_version(spark, path, -1).count() == 30
    assert read_table_version(spark, path, -2).count() == 20
    assert read_table_version(spark, path, 0).count() == 10

    vacuum_versions(path)
    assert len(list_table_versions(path)) == 1
    assert read_table_version(spark, path, -1).count() == 30
