"""r14 scaling probe: frame-parallel ingest of ONE large seekable
.zst (VERDICT r13 what's-missing #6 — convert the "frames are the
in-file split unit" claim from prose into a measurement).

Per size, one multi-frame seekable archive is authored by the engine
(`zstd_seekable_pack` — real LZ77-compressed frames + the public
seek-table skippable frame), written to disk once, then ingested two
ways through Spark:

- ``sequential``: ONE task decodes the whole file front to back —
  what a reader that can't split must do;
- ``frame_parallel``: the driver reads the FOOTER + SEEK TABLE only
  (two ranged reads, no frame bodies — `seek_index_sec` shows the
  index is microseconds), builds a DataFrame of byte ranges, and
  each task does a RANGED READ of its own frame slice + decode —
  the exact shape a 100 TB lake uses (tasks touch only their
  split's bytes; nothing is broadcast).

The sweep runs smallest-first across a 4× size range: the parallel
leg carries a fixed ~1s stage floor (Arrow batching + scheduling),
so the speedup must GROW with file size — that growth, not any one
ratio, is the split-unit claim. Correctness is asserted inside the
probe: both paths must produce the same total decoded bytes and the
same md5 over the in-order concatenation. The per-frame
split-correctness pin also lives in tests/test_zstd.py (ranged
reads == whole-file decode, per-frame checksums bind).

Usage:
    python tools/scaling_probe_zstdsplit.py [--frames N] [--chunk-kb K]

``--frames`` is the LARGEST size; the sweep runs N/4, N/2, N.
Writes ONE JSON line; the committed artifact is
SCALING_r14_zstdsplit.json. Noise hygiene: load averages recorded;
both stage shapes are warmed before any clock starts (JVM codegen,
the 1-task Python worker, and the 32-worker fleet — worker startup
is a per-session cost, not part of the split-vs-sequential
question).
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_frames = 512
    chunk_kb = 96
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--frames":
            n_frames = int(args.pop(0))
        elif a == "--chunk-kb":
            chunk_kb = int(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a}")

    from data_warehouse_migration_spark.functions.zstd import (
        zstd_seek_table,
        zstd_seekable_pack,
    )
    from data_warehouse_migration_spark.session import get_spark

    spark = get_spark("spark-graft-zstdsplit-probe")
    spark.sparkContext.setLogLevel("ERROR")
    load_before = round(os.getloadavg()[0], 2)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # deterministic text-ish chunks: every line unique, words from a
    # small vocabulary (corpus-like SHORT-match compression) — one
    # repeated line would decode as a few giant match copies and
    # understate per-frame decode cost; pure noise wouldn't compress
    vocab = [b"w%02dword" % v for v in range(50)]

    def chunk(i: int) -> bytes:
        out = bytearray()
        j = 0
        while len(out) < chunk_kb * 1024:
            words = b" ".join(
                vocab[(i * 31 + j * 17 + k * 7) % 50] for k in range(10)
            )
            out += b"frame %d line %d %s\n" % (i, j, words)
            j += 1
        return bytes(out)

    def seq_run(batches):
        import pandas as pd

        from data_warehouse_migration_spark.functions.zstd import (
            zstd_decompress,
        )

        for pdf in batches:
            for p in pdf["path"]:
                with open(p, "rb") as f:
                    raw = zstd_decompress(f.read())
                yield pd.DataFrame(
                    {"n_bytes": [len(raw)],
                     "md5": [hashlib.md5(raw).hexdigest()]}
                )

    # --- warm BOTH stage shapes before any clock starts ------------------
    warm = tempfile.NamedTemporaryFile(suffix=".zst", delete=False)
    warm.write(zstd_seekable_pack([b"warm " * 100] * 2))
    warm.close()
    try:
        spark.createDataFrame([(warm.name,)], "path string").mapInPandas(
            seq_run, schema="n_bytes long, md5 string"
        ).collect()
    finally:
        os.unlink(warm.name)

    def _touch(batches):
        import pandas as pd

        from data_warehouse_migration_spark.functions.zstd import (  # noqa: F401
            zstd_seekable_read_frame as _w,
        )

        for pdf in batches:
            yield pd.DataFrame({"n": [len(pdf)]})

    spark.range(1024).repartition(cpus).mapInPandas(
        _touch, schema="n long"
    ).collect()

    def measure(n: int) -> dict:
        chunks = [chunk(i) for i in range(n)]
        total_raw = sum(len(c) for c in chunks)
        t0 = time.time()
        blob = zstd_seekable_pack(chunks)
        pack_sec = round(time.time() - t0, 3)
        expect_md5 = hashlib.md5(b"".join(chunks)).hexdigest()
        tmp = tempfile.NamedTemporaryFile(suffix=".zst", delete=False)
        tmp.write(blob)
        tmp.close()
        path = tmp.name
        try:
            one = spark.createDataFrame([(path,)], "path string")
            t0 = time.time()
            row = one.mapInPandas(
                seq_run, schema="n_bytes long, md5 string"
            ).collect()[0]
            seq_sec = round(time.time() - t0, 3)
            assert row["n_bytes"] == total_raw and row["md5"] == expect_md5

            # index: footer read + table read, never a frame body
            t0 = time.time()
            with open(path, "rb") as f:
                file_len = f.seek(0, os.SEEK_END)
                f.seek(-9, os.SEEK_END)
                cnt, desc, _magic = struct.unpack("<IBI", f.read(9))
                entry = 12 if desc & 0x80 else 8
                tail_len = cnt * entry + 9 + 8
                f.seek(file_len - tail_len)
                tail = f.read(tail_len)
            table = zstd_seek_table(tail, file_len=file_len)
            index_sec = round(time.time() - t0, 4)

            rows = [
                (i, e["c_offset"], e["c_size"], e["d_size"], e["checksum"])
                for i, e in enumerate(table)
            ]
            ranges = spark.createDataFrame(
                rows,
                "frame_id int, c_offset long, c_size long, d_size long,"
                " checksum long",
            ).repartition(cpus)

            def par_run(batches):
                import pandas as pd

                from data_warehouse_migration_spark.functions.zstd import (
                    zstd_seekable_read_frame,
                )

                for pdf in batches:
                    out = []
                    with open(path, "rb") as f:
                        for fid, off, csz, dsz, ck in zip(
                            pdf["frame_id"], pdf["c_offset"],
                            pdf["c_size"], pdf["d_size"], pdf["checksum"],
                        ):
                            f.seek(int(off))
                            sl = f.read(int(csz))
                            raw = zstd_seekable_read_frame(
                                sl,
                                {"c_offset": int(off), "c_size": int(csz),
                                 "d_size": int(dsz), "checksum": int(ck)},
                            )
                            out.append(
                                (int(fid), len(raw),
                                 hashlib.md5(raw).hexdigest())
                            )
                    yield pd.DataFrame(
                        out, columns=["frame_id", "n_bytes", "md5"]
                    )

            t0 = time.time()
            got = (
                ranges.mapInPandas(
                    par_run, schema="frame_id int, n_bytes long, md5 string"
                )
                .orderBy("frame_id")
                .collect()
            )
            par_sec = round(time.time() - t0, 3)
            # order-sensitive correctness: per-frame md5s in frame
            # order must reproduce the sequential bytes exactly
            assert sum(r["n_bytes"] for r in got) == total_raw
            chain = hashlib.md5()
            for r, c in zip(got, chunks):
                assert r["md5"] == hashlib.md5(c).hexdigest(), r["frame_id"]
                chain.update(c)
            assert chain.hexdigest() == expect_md5
            return {
                "frames": n,
                "raw_mb": round(total_raw / 1048576, 2),
                "zst_mb": round(len(blob) / 1048576, 2),
                "pack_sec": pack_sec,
                "seek_index_sec": index_sec,
                "sequential_sec": seq_sec,
                "frame_parallel_sec": par_sec,
                "speedup": round(seq_sec / par_sec, 2),
            }
        finally:
            os.unlink(path)

    per_size = [measure(n_frames // 4), measure(n_frames // 2),
                measure(n_frames)]
    result = {
        "metric": "zstd_seekable_frame_parallel",
        "per_size": per_size,
        "speedup_growth": round(
            per_size[2]["speedup"] / per_size[0]["speedup"], 2
        ),
        "meta": {
            "load_1m_before": load_before,
            "load_1m_after": round(os.getloadavg()[0], 2),
            "cpus": os.cpu_count(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
