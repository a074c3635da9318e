"""Quarantine-RATE guards (VERDICT r12 "what's wrong" #2): the
quarantine lanes catch Exception by design, so a systematic engine
defect could degrade silently into quarantine volume — a good
decoder that starts failing moves rows from 'ok' to 'quarantined'
without any gate turning red on its own row counts. These tests pin
the quarantined fraction to the fixtures' DESIGNED fraction exactly,
so a drift in quarantine share fails loud."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_media_quarantine_rate_is_designed_half(spark):
    """synthesize_faulty_assets corrupts legs {2,3,6,7} of id mod 8 —
    exactly half the corpus. The quarantine stage must land exactly
    that half, with the designed per-leg reason classes and zero
    unexpected classes."""
    from data_warehouse_migration_spark.operators.multimodal import (
        extract_media_features_quarantine,
        synthesize_faulty_assets,
    )

    n = 400
    ids = spark.range(n).withColumnRenamed("id", "asset_id")
    out = extract_media_features_quarantine(
        synthesize_faulty_assets(ids)
    ).select(
        "asset_id",
        "status",
        F.split_part(F.col("reason"), F.lit(":"), F.lit(1)).alias("cls"),
    )
    counts = {
        (r["status"], r["cls"]): r["n"]
        for r in out.groupBy("status", "cls").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert counts[("ok", None)] == n // 2
    # legs 2,6 → NotImplementedError (arithmetic JPEG), leg 7 →
    # NotImplementedError (unsupported mime), leg 3 → ValueError
    assert counts[("quarantined", "NotImplementedError")] == 3 * n // 8
    assert counts[("quarantined", "ValueError")] == n // 8
    assert sum(counts.values()) == n  # nothing dropped, no other class


def test_crawl_quarantine_rate_is_designed_five_eighths(spark):
    """crawl_archive_ingest_quarantine corrupts legs {1,2,3,5,6} of
    id mod 8 (transport faults + content-coding faults; legs 0/4/7
    are the intact identity/gzip/brotli rows) — exactly five
    eighths, every fault a ValueError from a wire-format guard."""
    from data_warehouse_migration_spark.operators.web_extract import (
        crawl_archive_ingest_quarantine,
    )

    n = 80
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.concat(
            F.lit("quarantine rate guard body text for document "),
            F.col("id"),
        ).alias("text"),
    )
    out = crawl_archive_ingest_quarantine(docs).select(
        "status",
        F.split_part(F.col("reason"), F.lit(":"), F.lit(1)).alias("cls"),
    )
    counts = {
        (r["status"], r["cls"]): r["n"]
        for r in out.groupBy("status", "cls").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert counts[("ok", None)] == 3 * n // 8
    assert counts[("quarantined", "ValueError")] == 5 * n // 8
    assert ("quarantined", "NotImplementedError") not in counts
    assert sum(counts.values()) == n
