"""ORC source/sink round-trip (sources/readers.read_orc,
sources/writers.write_orc), including declared-projection drift —
same contract as the parquet pair."""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_warehouse_migration_spark.sources.readers import read_orc
from data_warehouse_migration_spark.sources.writers import write_orc


def test_orc_roundtrip_and_drift(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)

    back = read_orc(spark, path)
    assert back.count() == nation.count()
    assert back.exceptAll(nation).count() == 0

    # Declared projection: extra file columns tolerated, missing
    # declared column arrives as NULL of the declared type, present
    # ones cast (n_nationkey widened to long).
    declared = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("missing_col", IntegerType()),
        ]
    )
    drifted = read_orc(spark, path, declared=declared)
    assert drifted.columns == ["n_nationkey", "n_name", "missing_col"]
    assert dict(drifted.dtypes)["n_nationkey"] == "bigint"
    assert drifted.filter("missing_col IS NOT NULL").count() == 0
    assert drifted.count() == nation.count()


def test_orc_partitioned_write(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation_orc_part")
    write_orc(nation, path, partition_by=["n_regionkey"])
    back = read_orc(spark, path)
    assert back.count() == nation.count()
    # Partition pruning: a filtered read lists only that directory.
    one = back.filter("n_regionkey = 0")
    assert "n_regionkey" in one.columns
    assert one.count() == nation.filter("n_regionkey = 0").count()
