"""Lakehouse table-format adapter: Delta when available, the repo's
dependency-free Parquet equivalents otherwise — SAME call sites.

The reference's migration target repeatedly names Delta as the
idiomatic table layer (SURVEY.md §1.1/§7: ``MERGE`` for SCD2,
``OPTIMIZE ZORDER`` for layout, transactional overwrite for
maintenance). This container has no ``delta-spark``, so the repo
reproduces those semantics dependency-free:

- transactional full-state overwrite → ``atomic_overwrite_parquet``
  (symlink stage-and-swap: readers see old or new state, never a
  partial table);
- SCD2 maintenance → ``operators/scd2.scd2_merge`` (functional
  next-state, oracle- and property-attested) + the atomic commit;
- ``OPTIMIZE ZORDER BY`` → ``operators/layout.write_zordered``
  (Morton-code range-clustered rewrite).

This module is the seam: every function takes ``fmt`` (default:
auto-detect) and routes to Delta's transactional commit / OPTIMIZE
when ``delta-spark`` is importable, the Parquet twin otherwise.
Callers never branch. The SCD2 Delta path deliberately commits the
SAME attested next-state computation through Delta's ACID overwrite
rather than re-deriving the dimension inside a row-scoped
``MERGE INTO``: the functional merge is what the oracle gate and the
property suite attest, and the table format's job at this call site
is the commit (plus time travel / concurrent-reader safety). A
row-scoped ``MERGE`` becomes worthwhile when the changed-key fraction
per round is small enough that rewriting only touched files beats
rewriting the table — that switch changes only this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_migration_spark.sources.writers import (
    atomic_overwrite_parquet,
)


def delta_available() -> bool:
    """True when the ``delta-spark`` package is importable. The Spark
    session must additionally carry the Delta SQL extension + catalog
    configs (``configure_spark_with_delta_pip`` or equivalent) — that
    is the deployment's concern; this gate only routes code paths."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def resolve_format(fmt: str | None = None) -> str:
    """Explicit ``fmt`` wins; otherwise ``delta`` when available."""
    if fmt is not None:
        if fmt not in ("delta", "parquet"):
            raise ValueError(f"unsupported table format: {fmt!r}")
        return fmt
    return "delta" if delta_available() else "parquet"


def read_table(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    fmt = resolve_format(fmt)
    if fmt == "delta":
        return spark.read.format("delta").load(path)
    return spark.read.parquet(path)


def overwrite_table(df: DataFrame, path: str, fmt: str | None = None) -> None:
    """Transactional full-state overwrite. Delta: the log commit IS the
    atomic flip (old snapshot stays readable to in-flight scans — same
    contract as ``keep_old=True``). Parquet: symlink stage-and-swap."""
    fmt = resolve_format(fmt)
    if fmt == "delta":
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("overwriteSchema", "true")
            .save(path)
        )
    else:
        atomic_overwrite_parquet(df, path)


def table_exists(spark: SparkSession, path: str, fmt: str | None = None) -> bool:
    from pyspark.sql.utils import AnalysisException

    try:
        read_table(spark, path, fmt).schema
    except AnalysisException:
        return False
    return True


def scd2_apply(
    spark: SparkSession,
    snapshot: DataFrame,
    dim_path: str,
    keys: str | list[str],
    attrs: list[str],
    now,
    first_version_from=None,
    fmt: str | None = None,
) -> None:
    """One SCD2 maintenance round against the dimension at
    ``dim_path``, in either table format: read current state → the
    attested functional merge → transactional commit."""
    from data_warehouse_migration_spark.operators.scd2 import scd2_merge

    fmt = resolve_format(fmt)
    dim = read_table(spark, dim_path, fmt) if table_exists(spark, dim_path, fmt) else None
    next_dim = scd2_merge(
        dim,
        snapshot,
        keys=keys,
        attrs=attrs,
        now=now,
        first_version_from=first_version_from,
    )
    # next_dim still references dim's files; both commits tolerate
    # that (Delta snapshots the read version through its MVCC log; the
    # Parquet swap stages to a NEW version directory before flipping).
    overwrite_table(next_dim, dim_path, fmt)


def optimize_zorder(
    spark: SparkSession,
    path: str,
    cols: tuple[str, ...],
    fmt: str | None = None,
    bits: int = 12,
    n_files: int = 8,
) -> None:
    """``OPTIMIZE <table> ZORDER BY (c1, …, cn)``: native on Delta,
    the N-dimensional Morton-code range-clustered rewrite
    (`operators/layout.write_zordered_n`) on Parquet — both leave
    every file covering a tight range in EVERY listed dimension so
    min/max statistics prune scans on any of them."""
    fmt = resolve_format(fmt)
    if fmt == "delta":
        quoted = ", ".join(f"`{c}`" for c in cols)
        spark.sql(f"OPTIMIZE delta.`{path}` ZORDER BY ({quoted})")
        return
    import os
    import uuid

    from data_warehouse_migration_spark.operators.layout import (
        write_zordered_n,
    )
    from data_warehouse_migration_spark.sources.writers import (
        atomic_publish_dir,
    )

    df = spark.read.parquet(path)
    parent, base = os.path.split(os.path.abspath(path))
    staged = os.path.join(parent, f".{base}.__v_zorder_{uuid.uuid4().hex[:8]}")
    write_zordered_n(df, staged, list(cols), bits=bits, n_files=n_files)
    # Publish the clustered layout exactly as written (no second write
    # that would re-plan file boundaries) via the same pointer flip the
    # maintenance writer uses.
    atomic_publish_dir(staged, path)
