"""Sequence packing: assign variable-length documents to fixed-budget
training chunks (LLM pretraining batches) by running-length cumsum —
each row starts in the chunk its cumulative offset falls in.

The naive formulation is ONE global ordered cumsum — a
``Window.orderBy(...)`` with no partition key, which Spark executes on
a single task: the whole corpus funnels through one executor thread.
Fine at sf0.01; a driver-sized bottleneck at 100 TB.

The scale shape (:func:`pack_sequences`) hash-splits the corpus into
``n_streams`` independent streams first (content-addressed md5 bucket
of the key — engine-portable, layout-stable, see
``operators/sampling.md5_bucket``) and packs each stream with its own
ordered cumsum. Chunks never span streams, so packing quality (chunk
fill, doc adjacency within a stream) is unchanged; the plan becomes a
hash exchange on ``stream`` + per-partition window — every stream packs
in parallel and per-task state is one running sum. ``n_streams``
should be ≥ the cluster's task parallelism; streams are balanced by
construction (md5 is uniform).

:func:`pack_sequences_global` keeps the single-window formulation as
the small-slice twin (exact global order, useful as an oracle or for
corpus slices that fit one task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.sampling import md5_bucket


def _assign(df: DataFrame, w, size_col: str, chunk_size: int) -> DataFrame:
    cum = F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(
        "chunk_id", F.floor((cum - F.col(size_col)) / chunk_size).cast("int")
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    size_col: str,
    chunk_size: int,
    n_streams: int = 8,
    order_by: list[str] | None = None,
    stream_of: Column | None = None,
) -> DataFrame:
    """Parallel packing: adds ``stream`` (int) and ``chunk_id`` (int,
    local to its stream) columns. Chunk identity is the pair
    ``(stream, chunk_id)``.

    ``stream_of`` overrides the default content-addressed assignment
    (md5-bucket of ``key_col`` mod ``n_streams``) — e.g. an existing
    shard column, or a length-tier so long docs pack together.
    """
    stream = (
        stream_of
        if stream_of is not None
        else md5_bucket(F.col(key_col)) % n_streams
    )
    order = order_by or [key_col]
    w = Window.partitionBy("stream").orderBy(*order)
    return _assign(
        df.withColumn("stream", stream.cast("int")), w, size_col, chunk_size
    )


def pack_sequences_global(
    df: DataFrame,
    key_col: str,
    size_col: str,
    chunk_size: int,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Single-stream twin: one global ordered cumsum (exact corpus-order
    packing). Runs the window on ONE task — small slices only."""
    order = order_by or [key_col]
    w = Window.orderBy(*order)
    return _assign(df, w, size_col, chunk_size).withColumn(
        "stream", F.lit(0)
    )
