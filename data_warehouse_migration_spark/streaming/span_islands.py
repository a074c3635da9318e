"""Streaming/incremental byte-verified exact-substring islands — the
continuous-ingestion twin of
``operators/dedup.verified_duplicate_span_islands`` (VERDICT r8 action
#6a): documents arrive as a stream, and each micro-batch's maximal
duplicated-span ranges are computed against EVERYTHING at rest before
it (initial corpus + all earlier batches), with the same zero-hash-
trust output contract as the batch operator — every reported island is
covered by spans verified VERBATIM against an at-rest occurrence, so a
digest collision can never produce a wrong island.

At-rest state, grown per epoch (epoch ``-1`` = the initial corpus):

- ``postings``: ``(__g, owner_id, owner_start)`` — one row per span
  position, the inverted span index. 8-byte digest + id + int ≈ 20
  bytes per corpus word position; this is the standard price of a
  span-level inverted index (the df-capped ``span_digest_index``
  family), and it is what lets verification run WITHOUT ever
  rescanning corpus text.
- ``docs``: ``(owner_id, __w)`` — the normalized token arrays,
  columnar at rest. Only rows matching a candidate owner are ever
  read back (id-keyed join), so per-epoch text cost is bounded by the
  batch's match volume, not the corpus.

Per epoch: the batch's span digests equi-join the postings (shuffle ∝
batch + matched postings — an 8-byte-digest prefilter, exactly pass 1
of the batch operator), candidate owners' token arrays are fetched by
id, BOTH sides' spans are sliced from their token arrays and compared
as strings, and only byte-equal matches become removable starts; the
gaps-and-islands merge is the shared ``span_start_islands``. Batch-
internal duplication is deliberately out of scope (the at-rest corpus
owns its spans; a batch-vs-batch pass belongs to the next corpus
refresh) — the same contract as ``remove_spans_against_digests``.

Digest-collision semantics: postings keep EVERY occurrence, and a
batch span is removable iff ANY same-digest at-rest occurrence is
byte-equal — so two different strings sharing a digest simply verify
against their own occurrences and a collision cannot cause a false
island OR a missed one. The digest is a pure prefilter, as in the
batch operator.

Index policy mirrors ``streaming/ingest``: ALL batch docs' postings
and token arrays are appended (not only non-duplicated ones — a span
that matched is still at rest and still owns future repeats), so the
at-rest state after epoch K is a pure function of (initial corpus,
batch order, content): deterministic under replay, independently
recomputable by the oracle. Exactly-once: results and index additions
land in ``epoch=K``-partitioned directories via dynamic partition
overwrite, and the matching pass reads only ``epoch < K`` postings —
a replayed epoch replaces its own output and cannot match its own
additions (the ``streaming/ingest`` replay guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from data_warehouse_migration_spark.operators.dedup import (
    normalized_text,
    span_hashes_from_words,
    span_start_islands,
)
from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)

_PARTS = ("postings", "docs")


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized token arrays ``(id_col, __w)``, docs of ≥ n words
    are filtered by the caller (short docs have no length-n span)."""
    return docs.select(
        F.col(id_col), F.split(normalized_text(F.col(text_col)), " ").alias("__w")
    )


def _span_postings(
    tokens: DataFrame, id_col: str, n: int
) -> DataFrame:
    """``(__g, owner_id, owner_start)`` for every length-``n`` span
    position of every doc with ≥ ``n`` words."""
    return (
        tokens.filter(F.size("__w") >= n)
        .select(
            F.col(id_col).alias("owner_id"),
            F.posexplode(span_hashes_from_words(F.col("__w"), n)).alias(
                "__i0", "__g"
            ),
        )
        .select("__g", "owner_id", (F.col("__i0") + 1).alias("owner_start"))
    )


def _index_parts(tokens: DataFrame, id_col: str, n: int) -> dict[str, DataFrame]:
    """The at-rest state derived from one docs slice — the SAME
    construction for the initial corpus and every epoch's additions
    (one definition so the two halves of the index can never diverge
    in filter or shape)."""
    return {
        "postings": _span_postings(tokens, id_col, n),
        "docs": tokens.filter(F.size("__w") >= n).select(
            F.col(id_col).alias("owner_id"), "__w"
        ),
    }


def write_span_island_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
) -> None:
    """Materialize the initial at-rest state under ``index_dir`` as
    ``epoch=-1`` partitions (stream epochs are ≥ 0)."""
    parts = _index_parts(_doc_tokens(corpus, id_col, text_col), id_col, n)
    for name in _PARTS:
        overwrite_partitions_dynamic(
            parts[name].withColumn("epoch", F.lit(-1)),
            f"{index_dir}/{name}",
            partition_by=["epoch"],
        )


def read_span_island_index(
    spark: SparkSession, index_dir: str, before_epoch: int | None = None
) -> dict[str, DataFrame]:
    """Read the at-rest state; ``before_epoch`` keeps only strictly
    earlier epochs — the matching pass MUST pass its own epoch so a
    crash-replayed batch cannot match its own appended postings."""
    out = {}
    for part in _PARTS:
        df = spark.read.parquet(f"{index_dir}/{part}")
        if before_epoch is not None:
            df = df.filter(F.col("epoch") < before_epoch)
        out[part] = df.drop("epoch")
    return out


def batch_span_islands_against_index(
    batch: DataFrame,
    index: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
) -> DataFrame:
    """One epoch's matching pass: byte-verified maximal duplicated-
    span islands of ``batch`` docs against the at-rest ``index``.
    Returns ``(id_col, island_start, island_end, island_words)``."""
    tokens = _doc_tokens(batch, id_col, text_col)
    occ = (
        tokens.filter(F.size("__w") >= n)
        .select(
            F.col(id_col),
            F.posexplode(span_hashes_from_words(F.col("__w"), n)).alias(
                "__i0", "__g"
            ),
        )
        .select(id_col, (F.col("__i0") + 1).alias("__start"), "__g")
    )
    # Digest prefilter: batch occurrences equi-join the at-rest
    # postings on the 8-byte digest — no text on either side yet.
    cand = occ.join(index["postings"], "__g").select(
        id_col, "__start", "owner_id", "owner_start"
    )
    # Owner side: token arrays fetched by id for candidate owners
    # only; the verbatim owner span is sliced out map-side.
    owner_spans = cand.join(index["docs"], "owner_id").select(
        id_col,
        "__start",
        F.array_join(
            F.slice("__w", F.col("owner_start"), F.lit(n)), " "
        ).alias("__owner_span"),
    )
    # Batch side: slice the batch's own span and keep byte-equal
    # matches only — the digest never decides anything.
    verified = (
        owner_spans.join(tokens, id_col)
        .filter(
            F.array_join(F.slice("__w", F.col("__start"), F.lit(n)), " ")
            == F.col("__owner_span")
        )
        .select(id_col, "__start")
        .distinct()
    )
    return span_start_islands(verified, id_col=id_col, n=n)


def streaming_span_islands(
    doc_stream: DataFrame,
    index_dir: str,
    results_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    available_now: bool = True,
    manifest_path: str | None = None,
):
    """Drive a document stream through per-epoch byte-verified island
    detection. Appends ``(id_col, island_start, island_end,
    island_words, epoch)`` rows under ``results_path`` and grows the
    at-rest index at ``index_dir``; if ``manifest_path`` is given,
    also records one ``(n_docs, n_islands, epoch)`` accounting row
    per epoch — an epoch whose batch contains NO duplicated spans
    writes zero island rows (its partition simply never appears), so
    the manifest is the processed-epoch ledger a consumer checks
    completeness against. Returns the started query."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # An EMPTY epoch still gets its manifest row — the manifest is
        # the processed-epoch ledger, and a processed-empty epoch must
        # be distinguishable from an unprocessed one. Without a
        # manifest there is nothing to record, so skip cheaply.
        if manifest_path is None and batch_df.isEmpty():
            return
        n_docs = batch_df.count()
        if n_docs:
            try:
                idx = read_span_island_index(
                    spark, index_dir, before_epoch=int(epoch_id)
                )
            except AnalysisException as e:
                raise RuntimeError(
                    f"no span-island index at {index_dir} — run "
                    "write_span_island_index first"
                ) from e
            islands = batch_span_islands_against_index(
                batch_df, idx, id_col, text_col, n
            ).withColumn("epoch", F.lit(int(epoch_id)))
            overwrite_partitions_dynamic(
                islands, results_path, partition_by=["epoch"]
            )
            additions = _index_parts(
                _doc_tokens(batch_df, id_col, text_col), id_col, n
            )
            for name in _PARTS:
                overwrite_partitions_dynamic(
                    additions[name].withColumn("epoch", F.lit(int(epoch_id))),
                    f"{index_dir}/{name}",
                    partition_by=["epoch"],
                )
        if manifest_path is not None:
            try:
                # Read-back of the just-written partition (cheap,
                # partition-pruned) rather than a second execution of
                # the matching plan just to count it.
                n_islands = (
                    spark.read.parquet(results_path)
                    .filter(F.col("epoch") == int(epoch_id))
                    .count()
                )
            except AnalysisException:
                # No epoch has produced any island yet — the results
                # directory does not exist at all.
                n_islands = 0
            overwrite_partitions_dynamic(
                spark.createDataFrame(
                    [(n_docs, n_islands, int(epoch_id))],
                    "n_docs bigint, n_islands bigint, epoch int",
                ),
                manifest_path,
                partition_by=["epoch"],
            )

    writer = doc_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
