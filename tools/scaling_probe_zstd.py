"""r13 scaling probe: the zstd rung across a 16× asset sweep, and
the warm-curation composition's per-generation cost as the crawl
corpus grows.

Two questions, two sections in one JSON line:

- ``zstd``: assets are the parallelism unit (zero shuffle), so wall
  should grow ≤ linearly across 1×/4×/16× through the SAME
  Arrow-batched mapInPandas shape production uses (the
  ``zst_archive_features`` harness: stored-subset write + FULL
  decode, multi-frame/skippable legs rotating). Per-asset µs is the
  secondary readout — pure-Python decode, documented posture.
- ``warm_curation``: at each corpus size, time ONE warm generation
  (3 warm SGD epochs seeded from a prior model with the decay
  continued + a 2-merge BPE EXTENSION over the crawl-extracted
  text) against the from-scratch alternative a non-incremental
  pipeline pays (6 cold epochs + a full 4-merge retrain). The
  incremental claim is the RATIO: warm stays a constant fraction of
  from-scratch at every size — per-generation cost tracks the
  current corpus, never the cumulative schedule.

Usage:
    python tools/scaling_probe_zstd.py [--base N]   # default 2000

Writes ONE JSON line; the committed artifact is
SCALING_r13_zstd_warm.json. Noise hygiene: load averages recorded;
sizes run smallest-first so the first size pays codegen.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    base = 2000
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--base":
            base = int(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a}")

    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.session import get_spark

    spark = get_spark("spark-graft-zstd-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def docs_df(n: int):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("l"), (F.col("id") % 5).cast("string")).alias(
                "lang"
            ),
            F.concat(
                F.lit("synthetic corpus text block "),
                F.col("id").cast("string"),
                F.lit(" "),
                F.repeat(
                    F.concat(F.lit("tok"), (F.col("id") % 97).cast("string"),
                             F.lit(" ")),
                    20,
                ),
            ).alias("text"),
        )

    from data_warehouse_migration_spark.operators.tokenizer import (
        bpe_extend_merges,
        bpe_train_merges,
    )
    from data_warehouse_migration_spark.operators.training import (
        logistic_sgd_warmstart,
    )
    from data_warehouse_migration_spark.operators.web_extract import (
        zst_archive_features,
    )
    from data_warehouse_migration_spark.streaming.crawl_ingest import (
        crawl_eligible_text,
    )

    load_before = round(os.getloadavg()[0], 2)
    result: dict = {"base": base, "zstd": {}, "warm_curation": []}

    per_size = []
    for mult in (1, 4, 16):
        n = base * mult
        t0 = time.time()
        got = zst_archive_features(docs_df(n)).count()
        sec = round(time.time() - t0, 3)
        assert got == n, (n, got)
        per_size.append(
            {"assets": n, "sec": sec,
             "us_per_asset": round(sec / n * 1e6, 1)}
        )
    result["zstd"] = {
        "per_size": per_size,
        # 16x assets over the warm 4x point: ≤ 4.0 is linear
        "wall_ratio_16x_over_4x": round(
            per_size[2]["sec"] / per_size[1]["sec"], 2
        ),
    }

    for mult in (1, 2, 4):
        n = base * mult
        corpus = crawl_eligible_text(docs_df(n)).localCheckpoint(eager=True)
        # the prior generation's artifacts (model-sized, as in prod)
        wa = logistic_sgd_warmstart(
            spark, corpus, None, start_epoch=1, epochs=3, n_features=4096
        )
        init = {int(r["bucket"]): int(r["weight_mili"]) for r in wa.collect()}
        prior = [
            (str(r["left_sym"]), str(r["right_sym"]))
            for r in sorted(
                bpe_train_merges(spark, corpus, text_col="text", k=2).collect(),
                key=lambda r: r["merge_rank"],
            )
        ]
        t0 = time.time()
        logistic_sgd_warmstart(
            spark, corpus, init, start_epoch=4, epochs=3, n_features=4096
        ).count()
        bpe_extend_merges(
            spark, corpus, prior, k_more=2, text_col="text"
        ).count()
        warm_sec = round(time.time() - t0, 3)
        t0 = time.time()
        logistic_sgd_warmstart(
            spark, corpus, None, start_epoch=1, epochs=6, n_features=4096
        ).count()
        bpe_train_merges(spark, corpus, text_col="text", k=4).count()
        cold_sec = round(time.time() - t0, 3)
        result["warm_curation"].append(
            {
                "docs": n,
                "warm_generation_sec": warm_sec,
                "from_scratch_sec": cold_sec,
                "warm_over_cold": round(warm_sec / cold_sec, 2),
            }
        )

    result["meta"] = {
        "load_1m_before": load_before,
        "load_1m_after": round(os.getloadavg()[0], 2),
        "cpus": os.cpu_count(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
