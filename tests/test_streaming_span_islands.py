"""Semantics + replay idempotence of the incremental byte-verified
span-islands twin (streaming/span_islands.py): corpus owns its spans,
earlier epochs own theirs, within-epoch duplication is out of scope,
islands merge, and a crash-replayed epoch (same batch, same epoch id)
must leave results AND index additions identical — the property the
``before_epoch`` cutoff exists for (without it every span of a
replayed batch byte-matches its own appended postings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)
from data_warehouse_migration_spark.streaming.span_islands import (
    _PARTS,
    _doc_tokens,
    _index_parts,
    batch_span_islands_against_index,
    read_span_island_index,
    write_span_island_index,
)

_T = " ".join(f"t{i}" for i in range(1, 31))  # corpus: t1..t30
_X = " ".join(f"x{i}" for i in range(1, 13))  # 12-word shared unique run
_COPIED = " ".join(f"t{i}" for i in range(5, 21))  # t5..t20, 16 words


def _apply(spark, index_dir, results, batch_df, epoch):
    idx = read_span_island_index(spark, index_dir, before_epoch=epoch)
    islands = batch_span_islands_against_index(batch_df, idx, n=10).withColumn(
        "epoch", F.lit(epoch)
    )
    overwrite_partitions_dynamic(islands, results, partition_by=["epoch"])
    adds = _index_parts(_doc_tokens(batch_df, "doc_id", "text"), "doc_id", 10)
    for part in _PARTS:
        overwrite_partitions_dynamic(
            adds[part].withColumn("epoch", F.lit(epoch)),
            f"{index_dir}/{part}",
            partition_by=["epoch"],
        )


def test_incremental_islands_semantics_and_replay(spark, tmp_path):
    corpus = spark.createDataFrame([(0, _T)], ["doc_id", "text"])
    batch0 = spark.createDataFrame(
        [
            (10, f"{_X} {_COPIED}"),  # corpus content at positions 13..28
            (11, f"{_X} y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"),  # same-epoch only
        ],
        ["doc_id", "text"],
    )
    batch1 = spark.createDataFrame(
        # x-run matches epoch-0 docs (earlier epoch) at positions 1..12
        [(12, f"{_X} z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")],
        ["doc_id", "text"],
    )
    index_dir = str(tmp_path / "index")
    results = str(tmp_path / "results")
    write_span_island_index(corpus, index_dir, n=10)

    _apply(spark, index_dir, results, batch0, 0)
    _apply(spark, index_dir, results, batch1, 1)

    got = {
        (r.doc_id, r.epoch): (r.island_start, r.island_end, r.island_words)
        for r in spark.read.parquet(results).collect()
    }
    # doc 10: the copied corpus run t5..t20 sits at words 13..28; its
    # removable 10-span starts are 13..19, merging to one island.
    # doc 11: shares only the within-epoch x-run — out of scope, no
    # island. doc 12: the x-run now repeats an EARLIER epoch → island.
    assert got == {(10, 0): (13, 28, 16), (12, 1): (1, 12, 12)}

    state = {
        "results": {tuple(r) for r in spark.read.parquet(results).collect()},
        **{
            p: spark.read.parquet(f"{index_dir}/{p}").count() for p in _PARTS
        },
    }
    # Crash-recovery replay of epoch 1: identical output, identical
    # index — and crucially NOT an island over doc 12's z-run, which
    # its own replayed postings would byte-match without the cutoff.
    _apply(spark, index_dir, results, batch1, 1)
    assert {
        "results": {tuple(r) for r in spark.read.parquet(results).collect()},
        **{
            p: spark.read.parquet(f"{index_dir}/{p}").count() for p in _PARTS
        },
    } == state


def test_islands_require_verbatim_match(spark, tmp_path):
    """A 10-span sharing 9 of 10 words with a corpus span must NOT be
    removed — the digest is a prefilter, equality is on the bytes."""
    corpus = spark.createDataFrame(
        [(0, " ".join(f"a{i}" for i in range(1, 11)))], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(5, " ".join(f"a{i}" for i in range(1, 10)) + " DIFFERENT")],
        ["doc_id", "text"],
    )
    index_dir = str(tmp_path / "idx2")
    write_span_island_index(corpus, index_dir, n=10)
    idx = read_span_island_index(spark, index_dir)
    assert batch_span_islands_against_index(batch, idx, n=10).count() == 0
