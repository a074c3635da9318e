"""Media-codec scaling probe (r11): the codec gates claim "per-asset
parallel, zero shuffle — assets are the parallelism unit". This
probe MEASURES that claim on the real operators: run the FLAC,
AVI-frame-sample, and PNG round-trip harnesses over growing
asset counts (id ranges, decoupled from the documents table) and
record wall time per step.

The claim passes if wall time scales ~linearly in asset count once
past session/codegen overhead (each asset is independent work inside
one Arrow-batched mapInPandas stage; 32 local cores, so steps well
above 32 assets amortize scheduling). A super-linear curve would
mean hidden cross-asset state (shared dictionaries, driver
collects); sub-linear at the tail would mean the small steps were
still overhead-dominated — per-asset μs cost is read from the
LARGEST step.

Usage:
    python tools/scaling_probe_media.py [--steps 500,2000,8000]

Writes ONE JSON line to stdout (artifact: SCALING_r11_media.json).
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

    from data_warehouse_migration_spark.operators.multimodal import (
        flac_roundtrip_features,
        png_roundtrip_features,
        video_frame_sample_features,
    )
    from data_warehouse_migration_spark.session import get_spark

    spark = get_spark("media-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")

    families = {
        "flac": lambda ids: flac_roundtrip_features(ids).agg(
            F.sum("sample_sum")
        ),
        "avi_frame_sample": lambda ids: video_frame_sample_features(ids).agg(
            F.sum("pixel_sum")
        ),
        "png": lambda ids: png_roundtrip_features(ids).agg(
            F.sum("pixel_sum")
        ),
    }

    load_before = round(os.getloadavg()[0], 2)
    out: dict = {"probe": "media_codecs", "steps": steps, "families": {}}
    for name, build in families.items():
        # warm plan analysis/codegen + Python workers outside the clock
        build(
            spark.range(64).select(F.col("id").alias("asset_id"))
        ).collect()
        times = []
        for n in steps:
            ids = spark.range(n).select(F.col("id").alias("asset_id"))
            t0 = time.monotonic()
            build(ids).collect()
            times.append(round(time.monotonic() - t0, 3))
        per_asset_us = round(times[-1] / steps[-1] * 1e6, 1)
        # linearity: time ratio between the largest two steps vs the
        # asset-count ratio (1.0 = perfectly linear)
        ratio = round(
            (times[-1] / times[-2]) / (steps[-1] / steps[-2]), 3
        )
        out["families"][name] = {
            "sec": times,
            "per_asset_us_at_largest": per_asset_us,
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
