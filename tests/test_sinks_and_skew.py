"""External upsert sink semantics (SQLite as the DB-API target) and
skew-mitigation helpers (salted results == plain results)."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.skew import (
    key_skew_profile,
    salted_agg,
    salted_broadcast_left,
)
from data_warehouse_migration_spark.sources.external import (
    append_rows,
    read_external,
    upsert_rows,
)


def test_append_and_upsert_via_partitions(spark, tmp_path):
    db = str(tmp_path / "gold.db")
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE dim (CustomerKey INTEGER PRIMARY KEY,"
        " Name TEXT, IsActive INTEGER)"
    )
    conn.commit()
    conn.close()

    factory = lambda: sqlite3.connect(db)  # noqa: E731

    initial = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)],
        "CustomerKey int, Name string, IsActive int",
    ).repartition(3)
    append_rows(initial, "dim", factory)

    got = dict(
        sqlite3.connect(db).execute("SELECT CustomerKey, Name FROM dim").fetchall()
    )
    assert got == {1: "a", 2: "b", 3: "c"}

    # upsert: update 2 (expire), insert 4 — the reference's dual-sink
    # round as ONE statement shape
    changes = spark.createDataFrame(
        [(2, "b", 0), (4, "d", 1)], "CustomerKey int, Name string, IsActive int"
    ).repartition(2)
    upsert_rows(changes, "dim", keys=["CustomerKey"], connection_factory=factory)

    rows = dict(
        sqlite3.connect(db)
        .execute("SELECT CustomerKey, IsActive FROM dim ORDER BY 1")
        .fetchall()
    )
    assert rows == {1: 1, 2: 0, 3: 1, 4: 1}


def test_read_external_roundtrip_and_subquery(spark, tmp_path):
    """S6: external table SOURCE (the reference's Gold read-back,
    ds_gold_sql.json:11-30) — DB-API path, bare table + subquery."""
    db = str(tmp_path / "gold_src.db")
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE dim (CustomerKey INTEGER PRIMARY KEY,"
        " Name TEXT, IsActive INTEGER)"
    )
    conn.executemany(
        "INSERT INTO dim VALUES (?, ?, ?)",
        [(1, "a", 1), (2, "b", 0), (3, "c", 1)],
    )
    conn.commit()
    conn.close()
    factory = lambda: sqlite3.connect(db)  # noqa: E731

    df = read_external(
        spark, "dim", connection_factory=factory,
        schema="CustomerKey int, Name string, IsActive int",
    )
    assert {(r.CustomerKey, r.Name, r.IsActive) for r in df.collect()} == {
        (1, "a", 1), (2, "b", 0), (3, "c", 1),
    }

    # subquery form (JDBC dbtable contract) + write-back round trip:
    # read Gold, flip actives, upsert — the reference's SCD2 loop shape
    active = read_external(
        spark,
        "(SELECT CustomerKey, Name, IsActive FROM dim WHERE IsActive = 1) s",
        connection_factory=factory,
        schema="CustomerKey int, Name string, IsActive int",
    )
    assert active.count() == 2
    upsert_rows(
        active.withColumn("IsActive", F.lit(0)),
        "dim", keys=["CustomerKey"], connection_factory=factory,
    )
    left = sqlite3.connect(db).execute(
        "SELECT count(*) FROM dim WHERE IsActive = 1"
    ).fetchone()[0]
    assert left == 0


def test_read_external_requires_exactly_one_connection(spark):
    import pytest

    with pytest.raises(ValueError):
        read_external(spark, "t")
    with pytest.raises(ValueError):
        read_external(
            spark, "t", url="jdbc:x", connection_factory=lambda: None
        )


def test_read_external_empty_result_needs_schema(spark, tmp_path):
    """An empty SELECT carries no types — without schema= the DB-API
    path must fail with guidance, and with schema= it must return a
    typed empty frame (ADVICE r2)."""
    import pytest

    db = str(tmp_path / "empty.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (k INTEGER, v TEXT)")
    conn.commit()
    conn.close()
    factory = lambda: sqlite3.connect(db)  # noqa: E731

    with pytest.raises(ValueError, match="schema"):
        read_external(spark, "t", connection_factory=factory)
    df = read_external(
        spark, "t", connection_factory=factory, schema="k int, v string"
    )
    assert df.count() == 0 and df.columns == ["k", "v"]


def test_salted_agg_matches_plain(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    plain = {
        (r.user_id): (r.n, r.mx)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r.user_id): (r.n, r.mx)
        for r in salted_agg(
            events,
            keys=["user_id"],
            aggs={"n": ("count", "value"), "mx": ("max", "value")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(customer, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_broadcast_left(orders, customer, on="o_custkey", salt_buckets=4)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r.c_mktsegment, r["count"]) for r in plain} == {
        (r.c_mktsegment, r["count"]) for r in salted
    }


def test_key_skew_profile(spark):
    df = spark.createDataFrame(
        [(1,)] * 90 + [(2,)] * 9 + [(3,)], "k int"
    )
    prof = key_skew_profile(df, "k", top=2).collect()
    assert prof[0].key == 1 and abs(prof[0].share - 0.9) < 1e-9
    assert prof[1].key == 2


def test_gold_tier_external_scd2_roundtrip(spark, tmp_path):
    """The reference's Gold maintenance loop end-to-end (VERDICT r2 #6):
    read the current dim from the external store (S6,
    ds_gold_sql.json:11-30 → DF_SCD2_Customer.json:120-132), scd2_merge
    a new snapshot, write the next state back through the keyed upsert
    (S9/S10, :182-216) — and the resulting version history must equal
    the parquet-path pipeline's, run for run."""
    import datetime as dt

    from data_warehouse_migration_spark.operators.scd2 import scd2_merge
    from data_warehouse_migration_spark.sources.writers import (
        atomic_overwrite_parquet,
    )

    T1, T2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    snap1 = spark.createDataFrame(
        [(1, "alice", "NY"), (2, "bob", "LA"), (3, "carol", "SF")],
        "CustomerKey int, Name string, City string",
    )
    snap2 = spark.createDataFrame(
        [(1, "alice", "BOS"), (2, "bob", "LA"), (4, "dave", "CHI")],
        "CustomerKey int, Name string, City string",
    )
    keys, attrs = "CustomerKey", ["Name", "City"]

    def canon(df):
        return sorted(
            (r.CustomerKey, r.Name, r.City, r.RowHash,
             str(r.ValidFrom), str(r.ValidTo), bool(r.IsActive))
            for r in df.collect()
        )

    def stringly(df):  # sqlite-friendly: timestamps as ISO strings
        return df.withColumn(
            "ValidFrom", F.date_format("ValidFrom", "yyyy-MM-dd HH:mm:ss")
        ).withColumn("ValidTo", F.date_format("ValidTo", "yyyy-MM-dd HH:mm:ss"))

    def typed(df):  # back from the store: restore engine types
        return (
            df.withColumn("ValidFrom", F.col("ValidFrom").cast("timestamp"))
            .withColumn("ValidTo", F.col("ValidTo").cast("timestamp"))
            .withColumn("IsActive", F.col("IsActive").cast("boolean"))
        )

    # parquet-path truth: two maintenance rounds through the atomic swap
    p = str(tmp_path / "dim_parquet")
    atomic_overwrite_parquet(scd2_merge(None, snap1, keys, attrs, now=T1), p)
    dim2_parquet = scd2_merge(spark.read.parquet(p), snap2, keys, attrs, now=T2)

    # external path: same two rounds against a sqlite Gold table; the
    # composite PK makes expire-old + insert-new one idempotent upsert
    db = str(tmp_path / "gold.db")
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE gold_dim (CustomerKey INTEGER, Name TEXT, City TEXT,"
        " RowHash TEXT, ValidFrom TEXT, ValidTo TEXT, IsActive INTEGER,"
        " PRIMARY KEY (CustomerKey, ValidFrom))"
    )
    conn.commit()
    conn.close()
    factory = lambda: sqlite3.connect(db)  # noqa: E731
    gold_schema = (
        "CustomerKey int, Name string, City string, RowHash string,"
        " ValidFrom string, ValidTo string, IsActive int"
    )

    dim1 = scd2_merge(None, snap1, keys, attrs, now=T1)
    upsert_rows(stringly(dim1), "gold_dim",
                keys=["CustomerKey", "ValidFrom"], connection_factory=factory)
    gold = typed(read_external(
        spark, "gold_dim", connection_factory=factory, schema=gold_schema
    ))
    dim2_ext = scd2_merge(gold, snap2, keys, attrs, now=T2)
    upsert_rows(stringly(dim2_ext), "gold_dim",
                keys=["CustomerKey", "ValidFrom"], connection_factory=factory)

    final = typed(read_external(
        spark, "gold_dim", connection_factory=factory, schema=gold_schema
    ))
    assert canon(final) == canon(dim2_parquet)
    # the expired v1 of customer 1 is really in the store, closed at T2
    assert (1, "alice", "NY") in {
        (r.CustomerKey, r.Name, r.City)
        for r in final.filter(~F.col("IsActive")).collect()
    }
