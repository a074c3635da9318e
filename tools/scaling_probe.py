"""Scaling-curve probe: headline queries across sf0.001 / sf0.01 / sf0.1.

The small-SF gates prove correctness; THIS measures how runtime grows
with data volume — the locally-measurable half of the 100 TB story.
The three fixture scales span 100x in row count, so the informative
number per query is the wall-time ratio for each 10x data step:

  ratio << 10  -> fixed overhead (plan/codegen/task launch) dominates;
                  the engine cost is not yet data-bound at this sf.
  ratio ~= 10  -> linear in input — the shape that survives 100 TB for
                  scan/agg/join pipelines.
  ratio >> 10  -> super-linear; either a candidate-pair operator whose
                  output genuinely grows faster than its input (report
                  output rows alongside), or a scale bug.

Usage:
    python tools/scaling_probe.py [--pairs] [query ...]

Defaults to every bench headliner; ``--pairs`` selects the
NON-headliner candidate-pair operators instead (VERDICT r8 action #6b
— every operator whose output grows with pair volume should have a
measured curve, not just the benched ones). Prints ONE JSON line:
  {"sfs": {...row counts...},
   "queries": {q: {sf: min_sec, ..., "out_rows": {sf: n},
                   "step_ratios": [r01, r1]}},
   "meta": {...}}

Same hygiene as bench.py: one warmed session, N runs per (query, sf),
cache cleared between runs, min reported (first run pays codegen).
Runs ascend sf per query so codegen for the plan shape is warm before
the biggest input is timed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Candidate-pair operators OUTSIDE the bench headliner set: their
#: output (and so their marginal cost) is designed to track
#: duplicated/overlapping-pair volume, which is exactly the claim a
#: measured curve falsifies. The headliner probe already covers
#: duplicate_span_pairs / containment_quote_pairs / dedup_ngram_
#: jaccard / dedup_embedding_cosine; this set completes the family.
PAIR_HEAVY_NON_HEADLINERS = (
    "simhash_near_pairs",          # Manku block-pigeonhole equi-joins
    "cross_source_span_overlap",   # mirror detection on the span index
    "duplicate_span_islands_exact",  # byte-verified ExactSubstr (r9 pass-2 shape)
    "decontaminate_exact_substring",  # verification tier on survivors
    "decontaminate_substring_indexed",  # the r9 digest-equi-join scale path
)


def main() -> None:
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from data_warehouse_migration_spark.catalog import REGISTRY
    from data_warehouse_migration_spark.session import get_spark

    args = sys.argv[1:]
    wanted = [a for a in args if a != "--pairs"]
    if "--pairs" in args and not wanted:
        wanted = list(PAIR_HEAVY_NON_HEADLINERS)
    if wanted:
        missing = [q for q in wanted if q not in REGISTRY]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        names = wanted
    else:
        names = [n for n, q in REGISTRY.items() if q.headline]

    spark = get_spark("spark-graft-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    sf_rows: dict[str, dict[str, int]] = {}
    for sf_dir in SF_DIRS:
        sf = sf_dir.rsplit("sf", 1)[-1]
        sf_rows[sf] = {
            t: spark.read.parquet(f"{sf_dir}/{t}.parquet").count() for t in TABLES
        }

    load_before = os.getloadavg()
    out: dict[str, dict] = {}
    for name in names:
        q = REGISTRY[name]
        per_sf: dict[str, float] = {}
        out_rows: dict[str, int] = {}
        raw: dict[str, list[float]] = {}
        for sf_dir in SF_DIRS:
            sf = sf_dir.rsplit("sf", 1)[-1]
            runs = []
            for _ in range(n_runs):
                spark.catalog.clearCache()
                t0 = time.time()
                df = q.spark_fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            per_sf[sf] = min(runs)
            raw[sf] = runs
            out_rows[sf] = q.spark_fn(spark, sf_dir).count()
        sfs = [d.rsplit("sf", 1)[-1] for d in SF_DIRS]
        out[name] = {
            "sec": per_sf,
            "out_rows": out_rows,
            # Positional: step_ratios[0] is always sf0.001->sf0.01 and
            # [1] is sf0.01->sf0.1; a zero denominator yields null in
            # place rather than silently shifting the list.
            "step_ratios": [
                round(per_sf[sfs[i + 1]] / per_sf[sfs[i]], 2)
                if per_sf[sfs[i]] > 0
                else None
                for i in range(len(sfs) - 1)
            ],
            "raw": raw,
        }

    print(
        json.dumps(
            {
                "sfs": sf_rows,
                "queries": out,
                "meta": {
                    "runs_per_query_per_sf": n_runs,
                    "load_1m_before": round(load_before[0], 2),
                    "load_1m_after": round(os.getloadavg()[0], 2),
                    "cpus": os.cpu_count(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
