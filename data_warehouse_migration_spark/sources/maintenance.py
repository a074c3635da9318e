"""Table maintenance: small-file compaction and partition retention —
the two operational chores every long-lived parquet warehouse needs
(the reference's nightly-rebuild design sidesteps them by rewriting
everything; an incremental 100 TB lake cannot).

Small files are the classic Spark lake failure mode: streaming sinks
and fine-grained partitioning produce thousands of KB-sized files, and
every later scan pays per-file open/footer cost (plus driver-side
listing). Compaction bin-packs them back to scan-efficient sizes.

Retention drops whole Hive partitions past a cutoff — a metadata-level
delete (directory removal after an atomic listing), never a rewrite of
surviving data.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_migration_spark.sources.writers import (
    atomic_overwrite_parquet,
)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    keep_old: bool = True,
) -> int:
    """Rewrite a parquet table into ≈``target_file_mb`` files and swap
    atomically (symlink pointer flip — readers never see a partial
    table). Returns the output file count.

    File count = ceil(on-disk bytes / target): parquet's encoded size
    is the best cheap predictor of rewritten size (row-count heuristics
    mispredict by the compression ratio). The rewrite is one
    ``repartition`` — a full shuffle of the table, the honest cost of
    re-binning; run it per-partition-directory on partitioned tables
    (compact the partitions a freshness query actually touches, not the
    table at once). Calling it on a Hive-partitioned ROOT would fold
    the partition columns into the data files and drop the
    ``col=value`` directory layout — destroying partition pruning — so
    that is detected and refused, not merely advised against.

    At 256 MB targets a 100 TB table compacts to ~400k files — the
    point is not the absolute count but restoring the
    bytes-per-file ratio scans are tuned for.
    """
    real = os.path.realpath(path)
    part_dirs = sorted(
        d
        for d in os.listdir(real)
        if "=" in d and os.path.isdir(os.path.join(real, d))
    )
    if part_dirs:
        raise ValueError(
            f"compact_parquet: {path!r} is a Hive-partitioned table root "
            f"(found {part_dirs[0]!r}, …); compacting it would flatten the "
            "partition layout and lose pruning — compact per partition "
            "directory instead"
        )
    total_bytes = sum(
        os.path.getsize(os.path.join(dirpath, f))
        for dirpath, _, files in os.walk(real)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    atomic_overwrite_parquet(df.repartition(n_files), path, keep_old=keep_old)
    out = os.path.realpath(path)
    return sum(
        1
        for dirpath, _, files in os.walk(out)
        for f in files
        if f.endswith(".parquet")
    )


def drop_partitions_older_than(
    path: str,
    partition_col: str,
    cutoff: object,
) -> list[str]:
    """Retention for a Hive-partitioned table (``col=value``
    directories): remove every partition whose value sorts strictly
    below ``cutoff`` (values compare as strings — zero-padded dates and
    Hive's own ``year=2024`` layout both order correctly). Returns the
    dropped partition values.

    This is a METADATA delete: surviving data is untouched (no rewrite,
    no shuffle), and each directory removal is independent — a crash
    mid-way leaves a table that is simply partially aged, re-run to
    finish. The scan side needs no coordination because queries with a
    retention-aware filter already prune these directories.
    """
    cutoff_s = str(cutoff)
    prefix = f"{partition_col}="
    dropped = []
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(prefix):
            continue
        value = entry[len(prefix):]
        if value < cutoff_s:
            shutil.rmtree(os.path.join(path, entry))
            dropped.append(value)
    return dropped


def table_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """(n_files, total_mb, avg_file_mb, min_file_mb, max_file_mb) for a
    parquet table — the compaction trigger metric (alert when
    avg_file_mb collapses)."""
    real = os.path.realpath(path)
    sizes = [
        os.path.getsize(os.path.join(dirpath, f)) / (1024 * 1024)
        for dirpath, _, files in os.walk(real)
        for f in files
        if f.endswith(".parquet")
    ]
    rows = [
        (
            len(sizes),
            round(sum(sizes), 3),
            round(sum(sizes) / len(sizes), 3) if sizes else 0.0,
            round(min(sizes), 3) if sizes else 0.0,
            round(max(sizes), 3) if sizes else 0.0,
        )
    ]
    return spark.createDataFrame(
        rows,
        "n_files int, total_mb double, avg_file_mb double,"
        " min_file_mb double, max_file_mb double",
    )


def vacuum_versions(path: str) -> list[str]:
    """Garbage-collect stranded version directories around an
    atomically-swapped table (``sources/writers.atomic_overwrite_parquet``):
    a crash between the staging write and the pointer flip — or a swap
    run with ``keep_old=True`` (the default) — leaves hidden
    ``.<base>.__v_*`` / ``.<base>.__ptr_*`` siblings that nothing
    references. Removes every such sibling EXCEPT the one the live
    symlink points to; returns the removed names. Also recognizes the
    pre-hidden visible naming (``<base>.__v_*``) for tables swapped by
    older builds.

    Run it on the maintenance schedule, never concurrently with a scan
    that may still be reading a superseded version (same grace-period
    contract as ``keep_old`` itself)."""
    parent = os.path.dirname(os.path.abspath(path)) or "."
    base = os.path.basename(path)
    live = os.path.realpath(path) if os.path.islink(path) else None
    removed = []
    suffixes = ("__v_", "__ptr_", "__old_", "__staging_")
    prefixes = tuple(
        f"{vis}{base}.{sfx}" for vis in (".", "") for sfx in suffixes
    )
    for entry in sorted(os.listdir(parent)):
        full = os.path.join(parent, entry)
        if not entry.startswith(prefixes):
            continue
        if live is not None and os.path.realpath(full) == live:
            continue
        if os.path.isdir(full) and not os.path.islink(full):
            shutil.rmtree(full)
        else:
            os.remove(full)
        removed.append(entry)
    return removed


def list_table_versions(path: str) -> list[str]:
    """Version history of an atomically-swapped table, OLDEST →
    NEWEST, last element = the live version (the symlink target).
    Versions are the hidden ``.<base>.__v_*`` siblings
    ``atomic_overwrite_parquet`` retains under ``keep_old=True``;
    ordering is directory mtime (each version is written once and
    never touched again — immutability is the swap contract). On a
    transactional format (Delta/Iceberg) this maps to the commit log;
    the call site is the seam.

    Partially-written dirs (crash mid-staging-write) are excluded by
    the ``_SUCCESS`` job-commit marker. A dir that finished staging
    but crashed BEFORE its pointer flip is indistinguishable from a
    superseded version without a commit log — it shows up in history
    until ``vacuum_versions`` clears it; a transactional format's log
    is the real fix, and this seam is where it plugs in.
    """
    parent = os.path.dirname(os.path.abspath(path)) or "."
    base = os.path.basename(path)
    live = os.path.realpath(path) if os.path.islink(path) else None
    vers = []
    for entry in os.listdir(parent):
        if not (entry.startswith(f".{base}.__v_") or entry.startswith(f"{base}.__v_")):
            continue
        full = os.path.join(parent, entry)
        if not os.path.isdir(full) or os.path.islink(full):
            continue
        committed = os.path.exists(os.path.join(full, "_SUCCESS"))
        if not committed and os.path.realpath(full) != live:
            continue  # crashed pre-flip staging dir
        vers.append(full)
    vers.sort(key=os.path.getmtime)
    # live-last even on mtime ties; compare via realpath — the entries
    # are abspath-built and an ancestor symlink (e.g. a linked data
    # root) would otherwise defeat the membership test silently.
    if live is not None:
        for v in vers:
            if os.path.realpath(v) == live:
                vers.remove(v)
                vers.append(v)
                break
    return vers


def read_table_version(spark, path: str, version: int = -1):
    """Time-travel read: ``version=-1`` is the live table, ``-2`` the
    state before the last swap, and so on (positive indexes count from
    the oldest retained version). The read is an ordinary parquet scan
    of an immutable directory — a long-running job can hold a
    superseded version open across later swaps, which is exactly the
    reader guarantee ``keep_old=True`` exists to provide. Combine with
    ``vacuum_versions`` retention policy; ``VERSION AS OF`` on Delta
    at the same call site."""
    vers = list_table_versions(path)
    if not vers:
        raise FileNotFoundError(f"no retained versions for {path}")
    return spark.read.parquet(vers[version])
