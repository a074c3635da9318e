"""r15 post-seal scaling probe: Avro block-parallel ingest measured
(sibling of the zstd seekable-split and warc.gz CDX member-split
probes — the third splittable rung gets the same posture→evidence
conversion; writes SCALING_r15_avrosplit.json).

ONE deflate-coded Object Container File per size step. The split
claim: sync markers make blocks independently decodable, so an
ingest can list (offset, packed size, count) spans in one cheap
header pass — `avro_block_spans` — and fan the blocks across tasks
with ranged reads, never shipping or sequentially re-walking the
whole file. Each leg asserts the parallel path reproduces the
sequential decode exactly (row count + md5 over a canonical row
digest), so the speedup is measured on verified-identical output.

Expected shape (the zstdsplit lesson): the fixed Spark stage floor
(~1 s) dominates small files and amortizes as the file grows — the
speedup should GROW with size; the interesting number is the trend,
not any single ratio.

Usage:
    python tools/scaling_probe_avrosplit.py   # ONE JSON line on stdout
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_VOCAB = (
    "the quick brown fox data warehouse spark shuffle partition codec "
    "stream ingest token model train corpus crawl archive record header"
).split()

_SCHEMA = {
    "type": "record", "name": "Doc", "fields": [
        {"name": "id", "type": "long"},
        {"name": "text", "type": "string"},
    ],
}


def _rows(total_bytes: int, seed: int) -> list[dict]:
    rng = random.Random(seed)
    out = []
    size = 0
    i = 0
    while size < total_bytes:
        text = " ".join(rng.choice(_VOCAB) for _ in range(200))
        out.append({"id": i, "text": text})
        size += len(text) + 8
        i += 1
    return out


def _row_digest(rows) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(str(r["id"]).encode())
        h.update(r["text"].encode())
    return h.hexdigest()


def main() -> None:
    import pandas as pd

    from data_warehouse_migration_spark.functions.avro_ocf import (
        avro_block_spans,
        avro_rows,
        avro_schema,
        avro_write,
    )
    from data_warehouse_migration_spark.session import get_spark

    load_before = round(os.getloadavg()[0], 2)
    spark = get_spark("avro-split-probe")
    spark.sparkContext.setLogLevel("ERROR")

    per_size = []
    warm = True
    for raw_mb in (8, 16, 32):
        rows = _rows(raw_mb << 20, seed=raw_mb)
        blob = avro_write(_SCHEMA, rows, codec="deflate",
                          rows_per_block=120)  # ~150 KB raw per block
        path = tempfile.mktemp(suffix=".avro")
        with open(path, "wb") as f:
            f.write(blob)
        try:
            # sequential leg: one pass through the whole container
            t0 = time.time()
            seq_rows = avro_rows(blob)
            seq_sec = time.time() - t0
            seq = (len(seq_rows), _row_digest(seq_rows))

            # span listing: the one cheap header pass
            t0 = time.time()
            spans = avro_block_spans(blob)
            span_sec = time.time() - t0
            schema_text = json.dumps(avro_schema(blob))

            def run_parallel() -> tuple[int, str, float]:
                sdf = spark.createDataFrame(
                    [(i, s["data_at"], s["packed_size"], s["count"])
                     for i, s in enumerate(spans)],
                    "block_id int, data_at long, packed long, count int",
                )

                def stage(batches):
                    from data_warehouse_migration_spark.functions.avro_ocf import (  # noqa: E501
                        _codec_decode,
                        _Cursor,
                        _decode,
                        _parse_schema,
                    )

                    node = _parse_schema(json.loads(schema_text), {})
                    with open(path, "rb") as fh:
                        for pdf in batches:
                            out = []
                            for bid, at, packed, count in zip(
                                pdf["block_id"], pdf["data_at"],
                                pdf["packed"], pdf["count"],
                            ):
                                fh.seek(int(at))  # the ranged read
                                block = _codec_decode(
                                    "deflate", fh.read(int(packed)), None)
                                cur = _Cursor(block)
                                h = hashlib.md5()
                                n = 0
                                for _ in range(int(count)):
                                    r = _decode(cur, node)
                                    h.update(str(r["id"]).encode())
                                    h.update(r["text"].encode())
                                    n += 1
                                out.append(
                                    (int(bid), n, h.hexdigest()))
                            yield pd.DataFrame(
                                out,
                                columns=["block_id", "n", "digest"])

                out = sdf.repartition(32, "block_id").mapInPandas(
                    stage, schema="block_id int, n int, digest string")
                t0 = time.time()
                got = sorted(out.collect())
                sec = time.time() - t0
                joint = hashlib.md5(
                    "".join(r["digest"] for r in got).encode()
                ).hexdigest()
                return sum(r["n"] for r in got), joint, sec

            if warm:  # JVM codegen + Python workers, once
                run_parallel()
                warm = False
            par_n, par_joint, par_sec = run_parallel()

            # identity: block-parallel == sequential, by count and by
            # the same per-block digest chain recomputed sequentially
            assert par_n == seq[0]
            seq_joint = hashlib.md5()
            at = 0
            for s in spans:
                chunk = seq_rows[at : at + s["count"]]
                at += s["count"]
                seq_joint.update(_row_digest(chunk).encode())
            assert seq_joint.hexdigest() == par_joint

            per_size.append({
                "raw_mb": raw_mb,
                "packed_mb": round(len(blob) / 1e6, 2),
                "blocks": len(spans),
                "span_list_sec": round(span_sec, 4),
                "sequential_sec": round(seq_sec, 3),
                "block_parallel_sec": round(par_sec, 3),
                "speedup": round(seq_sec / par_sec, 2),
                "identity": True,
            })
            print(f"  {raw_mb} MB: seq {seq_sec:.2f}s, parallel "
                  f"{par_sec:.2f}s ({seq_sec / par_sec:.2f}x), "
                  f"{len(spans)} blocks", file=sys.stderr)
        finally:
            os.unlink(path)

    growth = per_size[-1]["speedup"] / per_size[0]["speedup"]
    print(json.dumps({
        "metric": "avro_block_parallel",
        "per_size": per_size,
        "speedup_growth": round(growth, 2),
        "meta": {
            "codec": "deflate",
            "load_1m_before": load_before,
            "load_1m_after": round(os.getloadavg()[0], 2),
            "cpus": os.cpu_count(),
        },
    }))


if __name__ == "__main__":
    main()
