"""overwrite_partitions_dynamic: an incremental re-load must replace
only the partitions it carries; static overwrite would truncate the
whole table."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
    write_parquet,
)


def test_reload_replaces_only_touched_partition(spark, tmp_path):
    path = str(tmp_path / "facts")
    full = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0), (3, "2024-01-03", 30.0)],
        ["id", "d", "v"],
    )
    write_parquet(full, path, partition_by=["d"])

    # Re-run day 2 with corrected values (and an extra row).
    reload_day2 = spark.createDataFrame(
        [(2, "2024-01-02", 21.5), (4, "2024-01-02", 1.0)], ["id", "d", "v"]
    )
    overwrite_partitions_dynamic(reload_day2, path, partition_by=["d"])

    back = spark.read.parquet(path)
    assert back.count() == 4
    assert back.filter("d = '2024-01-01'").count() == 1, "untouched day lost"
    assert back.filter("d = '2024-01-03'").count() == 1, "untouched day lost"
    day2 = {(r["id"], r["v"]) for r in back.filter("d = '2024-01-02'").collect()}
    assert day2 == {(2, 21.5), (4, 1.0)}

    # The session conf is restored after the scoped write.
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )

    # Idempotence: re-running the same reload changes nothing. (The
    # earlier `back` rows are materialized first — the re-write
    # replaces the files that lazy plan points at.)
    before = {(r["id"], r["d"], r["v"]) for r in back.collect()}
    overwrite_partitions_dynamic(reload_day2, path, partition_by=["d"])
    after = {
        (r["id"], r["d"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    assert after == before
