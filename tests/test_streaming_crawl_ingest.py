"""Streaming crawl ingest pins (streaming/crawl_ingest — r11): the
replay/exactly-once contract and the 5-way status priority on a
corpus small enough to verify by hand. The full-value cross-engine
attestation lives in the `streaming_crawl_ingest` registry gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.streaming.crawl_ingest import (
    apply_crawl_epoch,
    write_crawl_index,
)

# Eligibility closed forms (the v8 front-end): fetched ⟺ id%4 ∈ {1,3};
# quality ⟺ unicode tokens of the extracted main text ≥ 5, where the
# main text is the LARGEST surviving block — the body paragraph
# "{text} <raw> AB", the doc text plus 2 fixed tokens. Same text ⟹
# same main text ⟹ same digest, regardless of doc_id.
LONG = "alpha beta gamma delta epsilon"   # 5 + 2 fixed = 7 tokens
SHORT = "x"                               # 1 + 2 fixed = 3 < 5 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_status_priority_and_replay(spark, tmp_path):
    index_dir = str(tmp_path / "index")
    results = str(tmp_path / "results")
    # corpus: id 1 (fetched, quality) seeds the index with LONG
    write_crawl_index(_docs(spark, [(1, "en", LONG)]), index_dir)
    assert spark.read.parquet(index_dir).count() == 1

    batch = _docs(
        spark,
        [
            (4, "en", LONG),    # id%4=0 → skipped_robots (never parsed)
            (5, "en", LONG),    # fetched, dups the corpus page → dup_corpus
            (7, "en", SHORT),   # fetched but 3 tokens → low_quality
            (9, "en", "totally new content here okay"),   # new
            (13, "en", "totally new content here okay"),  # dup of 9 in-batch
        ],
    )
    apply_crawl_epoch(batch, 0, index_dir, results)
    got = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in spark.read.parquet(results).collect()
    }
    assert got == {
        4: ("skipped_robots", None),
        5: ("dup_corpus", 1),
        7: ("low_quality", None),
        9: ("new", None),
        13: ("dup_batch", 9),
    }
    # index policy: eligible docs only (5, 9, 13) — never 4 or 7
    idx = spark.read.parquet(index_dir)
    assert sorted(
        r["doc_id"] for r in idx.filter(F.col("epoch") == 0).collect()
    ) == [5, 9, 13]

    # REPLAY the same epoch: statuses and index rows must be
    # unchanged (dynamic partition overwrite + the strictly-earlier
    # cutoff — without it, doc 9 would now match its own epoch-0
    # digest and flip to dup_corpus)
    apply_crawl_epoch(batch, 0, index_dir, results)
    again = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in spark.read.parquet(results).collect()
    }
    assert again == got
    assert spark.read.parquet(index_dir).count() == 4

    # a LATER epoch matches epoch-0 additions as at-rest
    batch2 = _docs(spark, [(17, "en", "totally new content here okay")])
    apply_crawl_epoch(batch2, 1, index_dir, results)
    row = (
        spark.read.parquet(results)
        .filter(F.col("doc_id") == 17)
        .collect()[0]
    )
    assert (row["status"], row["match_id"]) == ("dup_corpus", 9)
