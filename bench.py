"""Benchmark: headline catalog queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect overhead) — the number measures the engine, not
py4j transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_warehouse_migration_spark.catalog import REGISTRY
    from data_warehouse_migration_spark.session import get_spark

    spark = get_spark("spark-graft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {name: q for name, q in REGISTRY.items() if q.headline}

    # Warm the JVM/session once so q1 doesn't pay engine startup:
    # codegen pipeline via a trivial query, plus the parquet reader
    # stack (footer parsing, vectorized reader init) via a 1-row scan.
    # Data stays cold — only engine code paths are primed.
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()

    # Two runs per query, report the min: the first run pays one-time
    # whole-stage-codegen compilation (~1-3s/query of JVM compiler work
    # that a long-lived cluster amortizes to zero) and is exposed to
    # transient host noise; the min reflects steady-state engine cost.
    timings: dict[str, float] = {}
    for name, q in headline.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
