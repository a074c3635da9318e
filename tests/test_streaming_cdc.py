"""Streaming CDC → SCD2 (streaming/cdc.scd2_stream_apply): three
snapshot extracts arriving as a file stream, applied one micro-batch
each, must produce the exact dimension that sequential BATCH
scd2_merge rounds produce — expiry chains, backdated first versions,
and all."""

from __future__ import annotations

import os
import time
from datetime import datetime

from data_warehouse_migration_spark.operators.scd2 import scd2_merge
from data_warehouse_migration_spark.streaming.cdc import scd2_stream_apply

KEYS = "cust_id"
ATTRS = ["name", "segment"]
EPOCH0 = datetime(1900, 1, 1)

SNAPSHOTS = [
    # (snap_ts, rows)
    (
        datetime(2024, 1, 1, 12),
        [(1, "alice", "retail"), (2, "bob", "corp")],
    ),
    (
        datetime(2024, 1, 2, 12),
        [(1, "alice", "retail"), (2, "bob", "smb"), (3, "carol", "corp")],
    ),
    (
        datetime(2024, 1, 3, 12),
        [(1, "alice2", "retail"), (2, "bob", "smb"), (3, "carol", "corp")],
    ),
]


def _snap_df(spark, ts, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(rows, [KEYS, *ATTRS]).withColumn(
        "snap_ts", F.lit(ts)
    )


def test_stream_cdc_equals_sequential_batch(spark, tmp_path):
    src = str(tmp_path / "cdc_src")
    dim_path = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # Stage extract files with strictly increasing mtimes so the file
    # source processes them in arrival order, one per micro-batch.
    for i, (ts, rows) in enumerate(SNAPSHOTS):
        part = f"{src}/extract_{i}"
        _snap_df(spark, ts, rows).coalesce(1).write.parquet(part)
        t = time.time() + i * 2
        for root, _, files in os.walk(part):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    schema = spark.read.parquet(f"{src}/extract_0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = scd2_stream_apply(
        stream,
        dim_path,
        keys=KEYS,
        attrs=ATTRS,
        now_col="snap_ts",
        checkpoint=ckpt,
        first_version_from=EPOCH0,
    )
    assert q.awaitTermination(300)

    expected = None
    for ts, rows in SNAPSHOTS:
        expected = scd2_merge(
            expected,
            _snap_df(spark, ts, rows),
            keys=KEYS,
            attrs=ATTRS,
            now=ts,
            first_version_from=EPOCH0,
        )

    got = spark.read.parquet(dim_path)
    cols = got.columns
    assert got.exceptAll(expected.select(cols)).count() == 0
    assert expected.select(cols).exceptAll(got).count() == 0

    # Spot-check semantics: bob has an expired corp version closed at
    # extract-2 time and an open smb version; alice's first version is
    # backdated to the epoch sentinel and her rename opens a new one.
    bob = {(r["segment"], r["IsActive"]) for r in got.filter("cust_id = 2").collect()}
    assert bob == {("corp", False), ("smb", True)}
    alice = got.filter("cust_id = 1").orderBy("ValidFrom").collect()
    assert [r["IsActive"] for r in alice] == [False, True]
    assert alice[0]["ValidFrom"] == EPOCH0


def test_catchup_batch_with_multiple_extracts(spark, tmp_path):
    """A catch-up run (no maxFilesPerTrigger) delivers ALL extracts in
    one availableNow micro-batch; scd2_stream_apply must split the
    batch by extract timestamp and merge per extract in order — a
    single-merge shortcut would open several IsActive versions per key
    under one `now` and silently corrupt the dimension."""
    src = str(tmp_path / "cdc_src")
    dim_path = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    for i, (ts, rows) in enumerate(SNAPSHOTS):
        _snap_df(spark, ts, rows).coalesce(1).write.parquet(f"{src}/extract_{i}")

    schema = spark.read.parquet(f"{src}/extract_0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = scd2_stream_apply(
        stream,
        dim_path,
        keys=KEYS,
        attrs=ATTRS,
        now_col="snap_ts",
        checkpoint=ckpt,
        first_version_from=EPOCH0,
    )
    assert q.awaitTermination(300)

    expected = None
    for ts, rows in SNAPSHOTS:
        expected = scd2_merge(
            expected,
            _snap_df(spark, ts, rows),
            keys=KEYS,
            attrs=ATTRS,
            now=ts,
            first_version_from=EPOCH0,
        )

    got = spark.read.parquet(dim_path)
    cols = got.columns
    assert got.exceptAll(expected.select(cols)).count() == 0
    assert expected.select(cols).exceptAll(got).count() == 0
    # One open version per key — the exact corruption the split guards.
    active = got.filter("IsActive").groupBy(KEYS).count().collect()
    assert all(r["count"] == 1 for r in active)
