"""Per-epoch scaling probe for the incremental/streaming index loops
(VERDICT r9 action #6): how does the cost of ONE epoch move as the
at-rest index GROWS, at fixed batch size?

The r9 probe (tools/scaling_probe.py --pairs) measured batch operators
across data scales; this one measures the other axis the incremental
story depends on: epoch 1 matches a batch against the initial corpus,
epoch K matches the same-sized batch against initial + (K-1) appended
batches. If per-epoch cost grows with TOTAL index size rather than
batch size, continuous ingestion eventually stalls no matter how small
the batches are — that is the curve this probe publishes.

Families probed (both on the REAL Structured Streaming engine —
foreachBatch with maxFilesPerTrigger=1, one staged file per epoch;
per-epoch wall time is the engine's own ``triggerExecution`` from
query progress, so checkpoint/commit overhead is included):

- ``span_islands``  — streaming/span_islands.py: batch span digests
  equi-join the at-rest postings, candidates byte-verified, additions
  appended. The postings side is re-read (and re-shuffled into the
  join) every epoch, so the expected shape is a LINEAR per-epoch term
  in at-rest postings rows — measured here, with the mitigation
  ladder documented in SCALE.md (digest-bucketed at-rest layout
  removes the index-side shuffle; a point-lookup store removes the
  scan).
- ``ingest_dedup``  — streaming/ingest.py: exact digests + MinHash
  band buckets + gram arrays against the growing dedup index; same
  question, three smaller indexes.

Usage:
    python tools/scaling_probe_epochs.py [--sf-dir DIR] [--epochs K]

Writes ONE JSON line to stdout; the driver-committed artifact is
SCALING_r10_epochs.json. Per epoch: engine wall seconds, input docs,
and at-rest index rows BEFORE the epoch (recomputed from the epoch-
partitioned index directories afterwards — the same partitions the
matching pass read). Noise hygiene: load averages recorded; epochs
run back-to-back in one session, so cross-epoch comparisons share
their environment; the informative number is the TREND, and the
first epoch additionally pays codegen (read it accordingly).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_epoch_files(spark, parts, src):
    """One parquet dir per epoch with strictly increasing mtimes
    (FileStreamSource orders by modification time — same trick as
    queries/streaming_gates._stage_ordered_stream)."""
    for k, df in enumerate(parts):
        part = f"{src}/b{k}"
        df.coalesce(1).write.parquet(part)
        ts = time.time() + k * 2
        for root, _, files in os.walk(part):
            for fname in files:
                os.utime(os.path.join(root, fname), (ts, ts))
    schema = spark.read.parquet(f"{src}/b0").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )


def _progress_rows(query) -> list[dict]:
    out = []
    for p in query.recentProgress:
        if not isinstance(p, dict):
            p = json.loads(p.json)
        out.append(p)
    return out


def _epoch_secs(progress: list[dict]) -> dict[int, float]:
    """batchId → triggerExecution seconds, skipping the empty
    no-more-files trigger availableNow can append."""
    out = {}
    for p in progress:
        if p.get("numInputRows", 0) > 0:
            out[int(p["batchId"])] = p["durationMs"]["triggerExecution"] / 1000.0
    return out


def _index_rows_by_epoch(spark, path: str) -> dict[int, int]:
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(path)
        .groupBy("epoch")
        .count()
        .collect()
    )
    return {int(r["epoch"]): int(r["count"]) for r in rows}


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    epochs = 12
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sf-dir":
            sf_dir = args.pop(0)
        elif a == "--epochs":
            epochs = int(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a}")

    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.session import get_spark

    spark = get_spark("spark-graft-epoch-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Deterministic split: half the table is the initial corpus, the
    # rest arrives as `epochs` equal-sized batches (doc_id buckets —
    # content-addressed, so replays and re-runs see identical epochs).
    m = 2 * epochs
    corpus = docs.filter(F.col("doc_id") % m < epochs)
    batches = [
        docs.filter(F.col("doc_id") % m == epochs + k) for k in range(epochs)
    ]

    load_before = round(os.getloadavg()[0], 2)
    result: dict = {
        "sf_dir": sf_dir,
        "epochs": epochs,
        "corpus_docs": corpus.count(),
        "batch_docs": [b.count() for b in batches],
        "families": {},
    }

    # --- family 1: byte-verified span islands ------------------------------
    from data_warehouse_migration_spark.streaming.span_islands import (
        streaming_span_islands,
        write_span_island_index,
    )

    base = tempfile.mkdtemp(prefix="epoch_probe_spans_")
    try:
        write_span_island_index(corpus, f"{base}/index", n=10)
        stream = _stage_epoch_files(spark, batches, f"{base}/src")
        t0 = time.time()
        q = streaming_span_islands(
            stream,
            index_dir=f"{base}/index",
            results_path=f"{base}/results",
            checkpoint=f"{base}/ckpt",
            n=10,
            manifest_path=f"{base}/epochs",
        )
        if not q.awaitTermination(1800):
            q.stop()
            raise TimeoutError("span_islands probe did not finish in 1800s")
        total = round(time.time() - t0, 3)
        secs = _epoch_secs(_progress_rows(q))
        postings = _index_rows_by_epoch(spark, f"{base}/index/postings")
        per_epoch = []
        for k in sorted(secs):
            before = sum(v for e, v in postings.items() if e < k)
            per_epoch.append(
                {
                    "epoch": k,
                    "sec": round(secs[k], 3),
                    "postings_rows_before": before,
                    "postings_rows_added": postings.get(k, 0),
                }
            )
        result["families"]["span_islands"] = {
            "per_epoch": per_epoch,
            "total_sec": total,
            "last_over_first_sec": round(
                per_epoch[-1]["sec"] / per_epoch[1]["sec"], 2
            )
            if len(per_epoch) > 2
            else None,  # epoch 0 pays codegen; compare 1 vs last
            "index_growth": round(
                per_epoch[-1]["postings_rows_before"]
                / max(per_epoch[0]["postings_rows_before"], 1),
                2,
            ),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # --- family 2: incremental ingest dedup --------------------------------
    from data_warehouse_migration_spark.streaming.ingest import (
        streaming_ingest_dedup,
        write_dedup_index,
    )

    base = tempfile.mkdtemp(prefix="epoch_probe_ingest_")
    try:
        write_dedup_index(corpus, f"{base}/index")
        stream = _stage_epoch_files(spark, batches, f"{base}/src")
        t0 = time.time()
        q = streaming_ingest_dedup(
            stream,
            index_dir=f"{base}/index",
            results_path=f"{base}/results",
            checkpoint=f"{base}/ckpt",
        )
        if not q.awaitTermination(1800):
            q.stop()
            raise TimeoutError("ingest_dedup probe did not finish in 1800s")
        total = round(time.time() - t0, 3)
        secs = _epoch_secs(_progress_rows(q))
        digests = _index_rows_by_epoch(spark, f"{base}/index/digests")
        per_epoch = []
        for k in sorted(secs):
            before = sum(v for e, v in digests.items() if e < k)
            per_epoch.append(
                {
                    "epoch": k,
                    "sec": round(secs[k], 3),
                    "digest_rows_before": before,
                }
            )
        result["families"]["ingest_dedup"] = {
            "per_epoch": per_epoch,
            "total_sec": total,
            "last_over_first_sec": round(
                per_epoch[-1]["sec"] / per_epoch[1]["sec"], 2
            )
            if len(per_epoch) > 2
            else None,
            "index_growth": round(
                per_epoch[-1]["digest_rows_before"]
                / max(per_epoch[0]["digest_rows_before"], 1),
                2,
            ),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)

    result["meta"] = {
        "load_1m_before": load_before,
        "load_1m_after": round(os.getloadavg()[0], 2),
        "cpus": os.cpu_count(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
