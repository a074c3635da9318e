"""r15 scaling probe: the native-codec slot-in, measured (VERDICT
r14 what's-missing #2 — convert SCALE.md's "a native codec slots
into the same Arrow seam" from posture into numbers).

Two legs, both running the SAME entry points the gates use:

- ``direct``: per format (gzip / snappy / bz2 / xz), one text blob
  sized to the engine decoder's speed is authored once, then decoded
  by the ENGINE codec and by the NATIVE twin (functions/codecs) —
  identical output asserted byte-for-byte (md5), per-side MB/s and
  the native/engine speedup reported. This is the per-task number: a
  1000-executor cluster's ingest throughput is (tasks × per-task
  MB/s), so the ratio here IS the 100 TB gap the pure-Python posture
  concedes and the seam recovers.
- ``spark_stage``: 32 one-MiB member-gzip WARC archives ingested
  through ``read_warc_any`` inside one Arrow-batched ``mapInPandas``
  stage — once with the engine decoder, once with the native suite
  passed through the ``codecs`` seam parameter. Same record counts
  and block digests asserted; wall-clock both ways. This pins that
  the swap happens at the REAL call site (the harness the
  warc/crawl gates use), not in a bespoke benchmark path.

Identity at the gate level (row-for-row equal Spark output with the
native codec swapped into snappy_archive_features, and
record-for-record through read_warc_any on every transport) is
pinned separately in tests/test_codecs.py — this probe is the
throughput half of the evidence.

Usage:
    python tools/scaling_probe_native.py

Writes ONE JSON line; the committed artifact is
SCALING_r15_native.json. Noise hygiene: load averages recorded;
engine timings take the min of 2 passes, native timings loop until
>=0.2 s of work; the Spark stage is warmed (JVM codegen + Python
workers) before any clock starts.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_VOCAB = (
    "the quick brown fox data warehouse spark shuffle partition codec "
    "stream ingest token model train corpus crawl archive record header"
).split()


def _text(n_bytes: int, seed: int) -> bytes:
    rng = random.Random(seed)
    out = []
    size = 0
    while size < n_bytes:
        w = rng.choice(_VOCAB)
        out.append(w)
        size += len(w) + 1
    return (" ".join(out)).encode()[:n_bytes]


def _mbps(n_bytes: int, sec: float) -> float:
    return round(n_bytes / 1e6 / sec, 2)


def direct_leg() -> list[dict]:
    from data_warehouse_migration_spark.functions.codecs import get_codec

    # blob sizes tuned to engine decode speed (~0.6-14 MB/s measured)
    # so each engine pass lands in the 2-10 s stable-timing band
    sizes = {"gzip": 4 << 20, "snappy": 32 << 20, "bz2": 2 << 20, "xz": 4 << 20}
    rows = []
    for fmt, n in sizes.items():
        raw = _text(n, seed=hash(fmt) & 0xFFFF)
        eng, nat = get_codec(fmt, "engine"), get_codec(fmt, "native")
        # native-authored archives: the upstream-ships-it direction
        # (and the engine's bz2 encoder is single-block by design)
        blob = nat.compress(raw)

        eng_sec = min(
            (lambda t0: (eng.decompress(blob), time.time() - t0))(time.time())[1]
            for _ in range(2)
        )
        out = eng.decompress(blob)
        assert hashlib.md5(out).hexdigest() == hashlib.md5(raw).hexdigest()

        reps, spent = 0, 0.0
        t0 = time.time()
        while spent < 0.2 or reps < 3:
            nout = nat.decompress(blob)
            reps += 1
            spent = time.time() - t0
        nat_sec = spent / reps
        assert nout == raw
        rows.append(
            {
                "fmt": fmt,
                "raw_mb": round(n / 1e6, 2),
                "packed_mb": round(len(blob) / 1e6, 2),
                "engine_mb_s": _mbps(n, eng_sec),
                "native_mb_s": _mbps(n, nat_sec),
                "native_speedup": round(eng_sec / nat_sec, 1),
                "identity_md5": True,
            }
        )
        print(f"  {fmt}: engine {rows[-1]['engine_mb_s']} MB/s, "
              f"native {rows[-1]['native_mb_s']} MB/s "
              f"({rows[-1]['native_speedup']}x)", file=sys.stderr)
    return rows


def spark_stage_leg() -> dict:
    import pandas as pd

    from data_warehouse_migration_spark.functions.codecs import get_codec
    from data_warehouse_migration_spark.functions.warc import (
        build_warc_record,
        write_warc_gz,
    )
    from data_warehouse_migration_spark.session import get_spark

    spark = get_spark("native-codec-probe")
    spark.sparkContext.setLogLevel("ERROR")

    n_archives, rec_bytes, recs_per = 32, 64 << 10, 16  # ~1 MiB raw each
    archives = []
    for a in range(n_archives):
        records = [
            build_warc_record(
                "response",
                {"WARC-Target-URI": f"https://example.org/{a}/{i}"},
                _text(rec_bytes, seed=a * 1000 + i),
            )
            for i in range(recs_per)
        ]
        archives.append((a, write_warc_gz(records)))
    df = spark.createDataFrame(archives, "archive_id int, blob binary")
    raw_mb = n_archives * rec_bytes * recs_per / 1e6

    def run(native: bool) -> tuple[float, int, str]:
        def stage(batches):
            from data_warehouse_migration_spark.functions.codecs import (
                get_codec as gc,
            )
            from data_warehouse_migration_spark.functions.warc import (
                read_warc_any,
            )

            suite = {"gzip": gc("gzip", "native")} if native else None
            for pdf in batches:
                rows = []
                for aid, blob in zip(pdf["archive_id"], pdf["blob"]):
                    recs = read_warc_any(bytes(blob), codecs=suite)
                    digest = hashlib.md5(
                        b"".join(r["block"] for r in recs)
                    ).hexdigest()
                    rows.append((int(aid), len(recs), digest))
                yield pd.DataFrame(
                    rows, columns=["archive_id", "n_records", "digest"]
                )

        out = df.repartition(32, "archive_id").mapInPandas(
            stage, schema="archive_id int, n_records int, digest string"
        )
        t0 = time.time()
        rows = sorted(out.collect())
        sec = time.time() - t0
        total = sum(r["n_records"] for r in rows)
        joint = hashlib.md5(
            "".join(r["digest"] for r in rows).encode()
        ).hexdigest()
        return sec, total, joint

    run(native=True)  # warm: JVM codegen + the 32 Python workers
    eng_sec, eng_n, eng_md5 = run(native=False)
    nat_sec, nat_n, nat_md5 = run(native=True)
    assert (eng_n, eng_md5) == (nat_n, nat_md5)
    print(f"  spark stage: engine {eng_sec:.2f}s, native {nat_sec:.2f}s",
          file=sys.stderr)
    return {
        "archives": n_archives,
        "raw_mb": round(raw_mb, 1),
        "records": eng_n,
        "engine_sec": round(eng_sec, 3),
        "native_sec": round(nat_sec, 3),
        "engine_mb_s": _mbps(int(raw_mb * 1e6), eng_sec),
        "native_mb_s": _mbps(int(raw_mb * 1e6), nat_sec),
        "native_speedup": round(eng_sec / nat_sec, 1),
        "identity_md5": True,
    }


def main() -> None:
    load_before = round(os.getloadavg()[0], 2)
    direct = direct_leg()
    stage = spark_stage_leg()
    print(
        json.dumps(
            {
                "metric": "native_codec_slot_in",
                "direct": direct,
                "spark_stage": stage,
                "meta": {
                    "load_1m_before": load_before,
                    "load_1m_after": round(os.getloadavg()[0], 2),
                    "cpus": os.cpu_count(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
