"""r15 scaling probe: member-parallel ingest of ONE large
``.warc.gz`` via the CDX offset index — the Common Crawl access
pattern (SCALE.md's "splittable at gzip member boundaries" prose as
a measurement, the gzip twin of SCALING_r14_zstdsplit.json).

Per size, one archive of per-record gzip members is authored with
the NATIVE gzip codec (the upstream-ships-it direction; the engine
writer's byte-identity and slice-decode contract are pinned in
tests/test_gzip_warc.py) together with its (offset, length) member
index — the CDX convention: the index is written ONCE next to the
archive and amortized over every later read. Ingest then runs two
ways through Spark:

- ``sequential``: ONE task decodes the whole file front to back
  (what a reader without the index must do — also exactly the cost
  of ``gzip_member_index``, the bare-archive fallback that rebuilds
  a lost index in one pass);
- ``member_parallel``: the driver reads NO archive bytes — it ships
  the index as a DataFrame of byte ranges and each task does a
  RANGED READ of its own member slices + ``read_warc_any`` decode
  (member slices start with the gzip magic, so the standard entry
  point opens them standalone).

Correctness is asserted inside the probe: both paths must produce
the same record count and the same md5 over the in-order
concatenation of per-record block digests. The sweep runs
smallest-first across a 4x size range: the parallel leg carries a
fixed ~1 s stage floor, so the speedup must GROW with file size.

Usage:
    python tools/scaling_probe_gzsplit.py [--members N]

``--members`` is the LARGEST size; the sweep runs N/4, N/2, N.
Writes ONE JSON line; the committed artifact is
SCALING_r15_gzsplit.json.
"""

from __future__ import annotations

import gzip as native_gzip
import hashlib
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORDS = (
    "the quick brown fox data warehouse spark shuffle partition codec "
    "stream ingest token model train corpus crawl archive record header"
).split()


def _record_text(i: int, n_bytes: int) -> bytes:
    import random

    rng = random.Random(i)
    out, size = [], 0
    while size < n_bytes:
        w = rng.choice(_WORDS)
        out.append(w)
        size += len(w) + 1
    return (" ".join(out)).encode()[:n_bytes]


def build_archive(n_members: int, rec_bytes: int) -> tuple[bytes, list]:
    from data_warehouse_migration_spark.functions.warc import (
        build_warc_record,
    )

    parts, index, pos = [], [], 0
    for i in range(n_members):
        rec = build_warc_record(
            "response",
            {"WARC-Target-URI": f"https://example.org/{i}"},
            _record_text(i, rec_bytes),
        )
        blob = native_gzip.compress(rec, mtime=0)
        parts.append(blob)
        index.append((i, pos, len(blob)))
        pos += len(blob)
    return b"".join(parts), index


def main() -> None:
    n_members = 512
    rec_kb = 64
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--members":
            n_members = int(args.pop(0))
        elif a == "--rec-kb":
            rec_kb = int(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a}")

    import pandas as pd

    from data_warehouse_migration_spark.session import get_spark

    load_before = round(os.getloadavg()[0], 2)
    spark = get_spark("gz-split-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def sequential(path: str) -> tuple[float, int, str]:
        df = spark.createDataFrame([(path,)], "path string")

        def stage(batches):
            from data_warehouse_migration_spark.functions.warc import (
                read_warc_gz,
            )

            for pdf in batches:
                rows = []
                for p in pdf["path"]:
                    with open(p, "rb") as f:
                        recs = read_warc_gz(f.read())
                    digest = hashlib.md5(
                        "".join(
                            hashlib.md5(r["block"]).hexdigest() for r in recs
                        ).encode()
                    ).hexdigest()
                    rows.append((len(recs), digest))
                yield pd.DataFrame(rows, columns=["n", "digest"])

        t0 = time.time()
        row = df.mapInPandas(stage, schema="n int, digest string").collect()[0]
        return time.time() - t0, row["n"], row["digest"]

    def member_parallel(path: str, index: list) -> tuple[float, int, str]:
        idx_df = spark.createDataFrame(
            index, "seq int, offset bigint, length int"
        ).repartition(32)

        def stage(batches):
            from data_warehouse_migration_spark.functions.warc import (
                read_warc_any,
            )

            for pdf in batches:
                rows = []
                with open(path, "rb") as f:
                    for seq, off, ln in zip(
                        pdf["seq"], pdf["offset"], pdf["length"]
                    ):
                        f.seek(int(off))
                        recs = read_warc_any(f.read(int(ln)))
                        rows.append(
                            (
                                int(seq),
                                len(recs),
                                "".join(
                                    hashlib.md5(r["block"]).hexdigest()
                                    for r in recs
                                ),
                            )
                        )
                yield pd.DataFrame(rows, columns=["seq", "n", "digest"])

        out = idx_df.mapInPandas(
            stage, schema="seq int, n int, digest string"
        )
        t0 = time.time()
        rows = sorted(out.collect(), key=lambda r: r["seq"])
        sec = time.time() - t0
        total = sum(r["n"] for r in rows)
        joint = hashlib.md5(
            "".join(r["digest"] for r in rows).encode()
        ).hexdigest()
        return sec, total, joint

    # warm both stage shapes on a tiny archive (JVM codegen + the
    # 1-task and 32-task Python workers) before any clock starts
    with tempfile.TemporaryDirectory() as tmp:
        wblob, widx = build_archive(32, 4 << 10)
        wpath = os.path.join(tmp, "warm.warc.gz")
        with open(wpath, "wb") as f:
            f.write(wblob)
        sequential(wpath)
        member_parallel(wpath, widx)

        per_size = []
        index_sec_smallest = None
        for frac in (4, 2, 1):
            n = n_members // frac
            blob, index = build_archive(n, rec_kb << 10)
            path = os.path.join(tmp, f"probe_{n}.warc.gz")
            with open(path, "wb") as f:
                f.write(blob)
            if index_sec_smallest is None:
                # the bare-archive fallback: rebuild a lost index in
                # one engine pass (costs ~= sequential, by design —
                # measured once at the smallest size)
                from data_warehouse_migration_spark.functions.warc import (
                    gzip_member_index,
                )

                t0 = time.time()
                rebuilt = gzip_member_index(blob)
                index_sec_smallest = round(time.time() - t0, 3)
                assert rebuilt == [(o, l) for _, o, l in index]
            seq_sec, seq_n, seq_md5 = sequential(path)
            par_sec, par_n, par_md5 = member_parallel(path, index)
            assert (seq_n, seq_md5) == (par_n, par_md5)
            per_size.append(
                {
                    "members": n,
                    "raw_mb": round(n * rec_kb / 1024, 2),
                    "gz_mb": round(len(blob) / 1e6, 2),
                    "sequential_sec": round(seq_sec, 3),
                    "member_parallel_sec": round(par_sec, 3),
                    "speedup": round(seq_sec / par_sec, 2),
                }
            )
            print(f"  {n} members: seq {seq_sec:.2f}s, "
                  f"par {par_sec:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "warc_gz_member_parallel",
                "per_size": per_size,
                "index_rebuild_sec_smallest": index_sec_smallest,
                "speedup_growth": round(
                    per_size[-1]["speedup"] / per_size[0]["speedup"], 2
                ),
                "meta": {
                    "rec_kb": rec_kb,
                    "load_1m_before": load_before,
                    "load_1m_after": round(os.getloadavg()[0], 2),
                    "cpus": os.cpu_count(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
