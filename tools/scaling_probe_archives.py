"""Archive-codec scaling probe (r12): wall-clock across a 16× asset
sweep for the round's new ingest rungs — bzip2 round-trip, xz decode
(liblzma-encoded input), TIFF round-trip, TFRecord round-trip — each
through the SAME Arrow-batched mapInPandas shape production uses.

The question the curve answers: assets are the parallelism unit
(zero shuffle), so wall should grow ≤ linearly in asset count once
plans are warm; super-linear growth would mean a per-batch or
per-plan cost leaking into the per-asset path. Per-asset µs is the
secondary readout (these are pure-Python codecs — the documented
posture: the plumbing is the attested part, native codecs slot into
the same seam).

Usage:
    python tools/scaling_probe_archives.py [--base N]   # default 2000

Writes ONE JSON line; the committed artifact is
SCALING_r12_archives.json. Noise hygiene: load averages recorded,
each family runs its sizes back-to-back smallest-first, and the
first size additionally pays codegen (read trends accordingly).
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

    spark = get_spark("spark-graft-archive-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def docs_df(n: int):
        # synthetic doc-shaped rows: id-derived text (~200 chars) and
        # a rotating lang label, so N scales freely past the fixture
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

    def ids_df(n: int):
        return spark.range(n).select(F.col("id").alias("asset_id"))

    from data_warehouse_migration_spark.operators.multimodal import (
        tiff_roundtrip_features,
    )
    from data_warehouse_migration_spark.operators.web_extract import (
        bz2_archive_features,
        tfrecord_shard_features,
        xz_archive_features,
    )

    families = {
        "bz2_roundtrip": lambda n: bz2_archive_features(docs_df(n)),
        "xz_decode": lambda n: xz_archive_features(docs_df(n)),
        "tiff_roundtrip": lambda n: tiff_roundtrip_features(ids_df(n)),
        "tfrecord_roundtrip": lambda n: tfrecord_shard_features(docs_df(n)),
    }

    load_before = round(os.getloadavg()[0], 2)
    result: dict = {"base": base, "families": {}}
    for name, fn in families.items():
        per_size = []
        for mult in (1, 4, 16):
            n = base * mult
            t0 = time.time()
            got = fn(n).count()
            sec = round(time.time() - t0, 3)
            assert got == n, (name, n, got)
            per_size.append(
                {
                    "assets": n,
                    "sec": sec,
                    "us_per_asset": round(sec / n * 1e6, 1),
                }
            )
        result["families"][name] = {
            "per_size": per_size,
            # 16x assets over the warm 4x point: ≤ 4.0 is linear
            "wall_ratio_16x_over_4x": round(
                per_size[2]["sec"] / per_size[1]["sec"], 2
            ),
        }
    result["meta"] = {
        "load_1m_before": load_before,
        "load_1m_after": round(os.getloadavg()[0], 2),
        "cpus": os.cpu_count(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
