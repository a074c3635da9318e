"""Crawl-ingest scaling probe (r11): the WARC/tar/robots gates claim
"per-archive parallel, zero shuffle — archives are the parallelism
unit". This probe MEASURES that claim on the real operators: run the
WARC round-trip, the WebDataset shard round-trip, and the full v8
archive-ingest front-end (gzip → WARC → HTTP → URL → robots →
extraction) over growing synthetic corpora and record wall time per
step.

Same contract as the media probe: ~linear past overhead (each
archive is independent inside one Arrow-batched mapInPandas stage);
super-linear would mean hidden cross-archive state, sub-linear means
overhead still amortizing. Per-archive μs is read from the largest
step.

Usage:
    python tools/scaling_probe_crawl.py [--steps 500,2000,8000]

Writes ONE JSON line to stdout (artifact: SCALING_r11_crawl.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default="500,2000,8000")
    args = ap.parse_args()
    steps = [int(s) for s in args.steps.split(",")]

    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.operators.web_extract import (
        crawl_archive_ingest,
        warc_ingest_features,
        webdataset_shard_features,
    )
    from data_warehouse_migration_spark.session import get_spark

    spark = get_spark("crawl-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def docs(n: int):
        # deterministic synthetic corpus: ~240-byte unique texts
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.element_at(
                F.array(F.lit("en"), F.lit("es"), F.lit("fr"),
                        F.lit("de"), F.lit("zh")),
                (F.col("id") % 5 + 1).cast("int"),
            ).alias("lang"),
            F.concat(
                F.repeat(F.lit("the quick brown fox jumps over it "), 7),
                F.col("id").cast("string"),
            ).alias("text"),
        )

    families = {
        "warc_roundtrip": lambda d: warc_ingest_features(d).agg(
            F.sum("body_len")
        ),
        "webdataset_shard": lambda d: webdataset_shard_features(d).agg(
            F.sum("tar_len")
        ),
        "archive_ingest_v8_front": lambda d: crawl_archive_ingest(d).agg(
            F.sum(F.col("allowed").cast("long")),
            F.sum("n_boilerplate"),
        ),
    }

    load_before = round(os.getloadavg()[0], 2)
    out: dict = {"probe": "crawl_ingest", "steps": steps, "families": {}}
    for name, build in families.items():
        build(docs(64)).collect()  # warm plans + Python workers
        times = []
        for n in steps:
            t0 = time.monotonic()
            build(docs(n)).collect()
            times.append(round(time.monotonic() - t0, 3))
        per_archive_us = round(times[-1] / steps[-1] * 1e6, 1)
        ratio = round(
            (times[-1] / times[-2]) / (steps[-1] / steps[-2]), 3
        )
        out["families"][name] = {
            "sec": times,
            "per_archive_us_at_largest": per_archive_us,
            "tail_step_linearity": ratio,
        }
    out["meta"] = {
        "cpus": 32,
        "load_1m_before": load_before,
        "load_1m_after": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
