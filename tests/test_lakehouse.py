"""Lakehouse format adapter (sources/lakehouse.py): the Parquet twin
runs everywhere; the Delta branch runs when delta-spark is installed
(skipped here otherwise) and must produce identical query results
through the same call sites."""

from __future__ import annotations

from datetime import datetime

import pytest

from data_warehouse_migration_spark.sources import lakehouse as lh

EPOCH0 = datetime(1900, 1, 1)
KEYS = "cust_id"
ATTRS = ["name", "segment"]

SNAPSHOTS = [
    (datetime(2024, 1, 1, 12), [(1, "alice", "retail"), (2, "bob", "corp")]),
    (datetime(2024, 1, 2, 12), [(1, "alice", "retail"), (2, "bob", "smb")]),
]


def _snap(spark, rows):
    return spark.createDataFrame(rows, [KEYS, *ATTRS])


def _run_scd2_rounds(spark, dim_path, fmt):
    for ts, rows in SNAPSHOTS:
        lh.scd2_apply(
            spark,
            _snap(spark, rows),
            dim_path,
            keys=KEYS,
            attrs=ATTRS,
            now=ts,
            first_version_from=EPOCH0,
            fmt=fmt,
        )
    return lh.read_table(spark, dim_path, fmt)


def _expected(spark):
    from data_warehouse_migration_spark.operators.scd2 import scd2_merge

    dim = None
    for ts, rows in SNAPSHOTS:
        dim = scd2_merge(
            dim, _snap(spark, rows), keys=KEYS, attrs=ATTRS, now=ts,
            first_version_from=EPOCH0,
        )
    return dim


def test_resolve_format_contract():
    assert lh.resolve_format("parquet") == "parquet"
    with pytest.raises(ValueError):
        lh.resolve_format("iceberg")
    # Auto-detect never errors; in this container it lands on parquet.
    assert lh.resolve_format(None) in ("delta", "parquet")


def test_scd2_apply_parquet_path(spark, tmp_path):
    got = _run_scd2_rounds(spark, str(tmp_path / "dim"), fmt="parquet")
    exp = _expected(spark)
    cols = got.columns
    assert got.exceptAll(exp.select(cols)).count() == 0
    assert exp.select(cols).exceptAll(got).count() == 0


def test_overwrite_table_parquet_is_atomic_pointerflip(spark, tmp_path):
    import os

    path = str(tmp_path / "tbl")
    lh.overwrite_table(_snap(spark, SNAPSHOTS[0][1]), path, fmt="parquet")
    assert os.path.islink(path)
    first_target = os.path.realpath(path)
    lh.overwrite_table(_snap(spark, SNAPSHOTS[1][1]), path, fmt="parquet")
    # old version still on disk for in-flight readers; pointer moved
    assert os.path.realpath(path) != first_target
    assert os.path.exists(first_target)
    assert lh.read_table(spark, path, "parquet").count() == 2


def test_optimize_zorder_parquet_rewrites_in_place(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "orders")
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.col("o_orderkey"),
            F.col("o_custkey").cast("long").alias("x"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
            .cast("long")
            .alias("y"),
        )
    )
    lh.overwrite_table(o, path, fmt="parquet")
    n = lh.read_table(spark, path, "parquet").count()
    lh.optimize_zorder(spark, path, ("x", "y"), fmt="parquet", n_files=4)
    back = lh.read_table(spark, path, "parquet")
    assert back.count() == n
    assert "z_code" in back.columns  # clustered layout landed as written


@pytest.mark.skipif(not lh.delta_available(), reason="delta-spark not installed")
def test_scd2_apply_delta_path_matches_parquet(spark, tmp_path):
    got_d = _run_scd2_rounds(spark, str(tmp_path / "dim_delta"), fmt="delta")
    got_p = _run_scd2_rounds(spark, str(tmp_path / "dim_parquet"), fmt="parquet")
    cols = got_p.columns
    assert got_d.select(cols).exceptAll(got_p).count() == 0
    assert got_p.exceptAll(got_d.select(cols)).count() == 0


@pytest.mark.skipif(not lh.delta_available(), reason="delta-spark not installed")
def test_optimize_zorder_delta(spark, tmp_path):
    path = str(tmp_path / "tbl_delta")
    lh.overwrite_table(_snap(spark, SNAPSHOTS[0][1]), path, fmt="delta")
    lh.optimize_zorder(spark, path, (KEYS, "segment"), fmt="delta")
    assert lh.read_table(spark, path, "delta").count() == 2


def test_optimize_zorder_three_columns(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "orders3")
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            F.col("o_custkey").cast("long").alias("x"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
            .cast("long")
            .alias("y"),
            F.round(F.col("o_totalprice")).cast("long").alias("w"),
        )
    )
    lh.overwrite_table(o, path, fmt="parquet")
    n = lh.read_table(spark, path, "parquet").count()
    lh.optimize_zorder(spark, path, ("x", "y", "w"), fmt="parquet", n_files=4)
    back = lh.read_table(spark, path, "parquet")
    assert back.count() == n
    assert "z_code" in back.columns
