"""External (JDBC-style) sinks: append and keyed upsert.

The reference's Gold tier is Azure SQL fed by two ordered JDBC sinks —
insert (`insertable: true`, DF_SCD2_Customer.json:200-216) and keyed
update (`updateable: true, keys:['CustomerKey']`, :182-198). Spark's
built-in JDBC writer is insert-only; the standard pattern for the
update/upsert half is ``foreachPartition``: every executor partition
opens its own connection and applies batched statements — writes scale
with partitions, the driver never sees the rows.

The connection is injected as a zero-arg factory so the same operator
drives any DB-API target (tests use sqlite3; production passes a
real driver's ``connect``). For true JDBC targets, ``df.write.jdbc``
covers the insert path natively (SURVEY.md §2.1 S8) — this module
exists for the semantics JDBC writers lack.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def read_external(
    spark: SparkSession,
    table: str,
    url: str | None = None,
    properties: dict[str, str] | None = None,
    connection_factory: Callable[[], object] | None = None,
    schema: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """External (JDBC-style) table SOURCE — SURVEY §2.1 S6, the
    reference's Gold-tier read-back (`ds_gold_sql.json:11-30`, read as
    the SCD2 lookup side at `DF_SCD2_Customer.json:120-132`).

    Two paths, chosen by which connection argument is given:

    - ``url`` → native ``spark.read.jdbc``: executor-side, and with
      (``partition_column``, ``lower_bound``, ``upper_bound``,
      ``num_partitions``) the scan fans out into range-partitioned
      parallel queries — the 100 TB path. Catalyst pushes filters and
      column pruning into the generated SQL.
    - ``connection_factory`` (any DB-API ``connect``) → driver-side
      SELECT materialized through ``createDataFrame``. This path is for
      driver-sized tables ONLY (dimensions, config/watermark lookups —
      exactly what the reference reads back from Gold); it exists so
      the operator is testable without a JDBC driver jar and usable
      against DB-API-only targets.

    ``table`` may be a bare table name or a parenthesized subquery
    alias (JDBC's dbtable contract), e.g. ``"(SELECT k, v FROM t) s"``.
    It is interpolated into the generated SQL verbatim (the dbtable
    contract makes it un-parameterizable) — it MUST come from trusted
    pipeline config, never from user input.

    On the DB-API path pass ``schema=`` whenever the result may be
    empty: zero rows carry no type information, so ``createDataFrame``
    cannot infer a schema from them (raises with guidance here rather
    than failing obscurely downstream).
    """
    if (url is None) == (connection_factory is None):
        raise ValueError("pass exactly one of url= or connection_factory=")
    if url is not None:
        opts = dict(properties or {})
        if partition_column is not None:
            return spark.read.jdbc(
                url,
                table,
                column=partition_column,
                lowerBound=lower_bound,
                upperBound=upper_bound,
                numPartitions=num_partitions or 8,
                properties=opts,
            )
        return spark.read.jdbc(url, table, properties=opts)

    conn = connection_factory()
    try:
        cur = conn.cursor()
        cur.execute(f"SELECT * FROM {table}")
        cols = [d[0] for d in cur.description]
        rows = [tuple(r) for r in cur.fetchall()]
    finally:
        conn.close()
    if schema is not None:
        return spark.createDataFrame(rows, schema)
    if not rows:
        raise ValueError(
            f"read_external: {table!r} returned no rows and no schema= was "
            "given — an empty result carries no types to infer; pass an "
            "explicit schema (e.g. 'id bigint, name string')"
        )
    return spark.createDataFrame(rows, cols)


def append_rows(
    df: DataFrame,
    table: str,
    connection_factory: Callable[[], object],
    batch_size: int = 1000,
) -> None:
    """INSERT every row, partition-parallel, batched (S8)."""
    cols = df.columns
    placeholders = ", ".join(["?"] * len(cols))
    sql = f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders})"

    def write_partition(rows) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch = []
            for row in rows:
                batch.append(tuple(row))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    batch = []
            if batch:
                cur.executemany(sql, batch)
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(write_partition)


def upsert_rows(
    df: DataFrame,
    table: str,
    keys: list[str],
    connection_factory: Callable[[], object],
    batch_size: int = 1000,
) -> None:
    """Keyed UPDATE-else-INSERT (S9 + S10 in one statement).

    Uses ``INSERT ... ON CONFLICT(keys) DO UPDATE`` — supported by
    SQLite/Postgres/DuckDB; for SQL Server swap the statement for
    ``MERGE``. Single-statement upsert also removes the reference's
    update-before-insert ordering requirement (sinkOrder 1/2) and its
    partial-failure window.

    Rows must be unique per key within ``df`` (pre-aggregate if not) —
    cross-partition conflicts on the same key are otherwise racy.
    """
    cols = df.columns
    non_keys = [c for c in cols if c not in keys]
    placeholders = ", ".join(["?"] * len(cols))
    set_clause = ", ".join(f"{c} = excluded.{c}" for c in non_keys)
    sql = (
        f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders}) "
        f"ON CONFLICT({', '.join(keys)}) DO UPDATE SET {set_clause}"
    )

    def write_partition(rows) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch = []
            for row in rows:
                batch.append(tuple(row))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    batch = []
            if batch:
                cur.executemany(sql, batch)
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(write_partition)
