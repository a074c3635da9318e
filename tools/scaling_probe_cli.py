"""r15 post-seal scaling probe: the OUT-OF-PROCESS codec tier
measured (sibling of tools/scaling_probe_native.py and
scaling_probe_brotli.py; writes SCALING_r15_cli.json — the sealed
artifacts stay untouched).

zstd and lz4 have no in-container Python binding, so their seam rows
are the reference CLIs piped per call (functions/codecs ``cli``
implementation — the honest third tier between pure-Python and a
real in-process binding). Two things need numbers:

- the decode gap: CLI vs engine on CLI-authored archives (the
  upstream-ships-it direction), md5-identity asserted — this is the
  per-task throughput a transport-decode stage would see with the
  seam swapped at ``read_warc_any``'s zstd/lz4 branches;
- the fork floor: wall-clock of a near-empty round-trip, which is
  the per-CALL overhead that makes this tier correct at
  whole-archive granularity and WRONG per-record (the module
  docstring's amortization claim, quantified);
- the Spark stage: 32 one-MiB zstd-transport WARCs through
  ``read_warc_any`` inside one Arrow-batched ``mapInPandas`` stage,
  engine vs CLI suite — fork-per-archive proven INSIDE executors at
  the real call site, same record counts and digests both ways.

Noise hygiene: load averages recorded, engine timings min-of-2, CLI
timings loop to >=0.2 s.

Usage:
    python tools/scaling_probe_cli.py   # ONE JSON line on stdout
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


def spark_stage_leg() -> dict:
    """32 one-MiB zstd-transport WARC archives through read_warc_any
    inside ONE Arrow-batched mapInPandas stage — engine decoder vs
    the CLI twin passed through the seam parameter. Pins that
    fork-per-archive works INSIDE executors (each Python worker
    spawning its own zstd -d), with identical record counts and
    digests, at the real call site the transport path uses."""
    import pandas as pd

    from data_warehouse_migration_spark.functions.codecs import get_codec
    from data_warehouse_migration_spark.functions.warc import (
        build_warc_record,
    )
    from data_warehouse_migration_spark.session import get_spark

    spark = get_spark("cli-codec-probe")
    spark.sparkContext.setLogLevel("ERROR")

    n_archives, rec_bytes, recs_per = 32, 64 << 10, 16  # ~1 MiB raw each
    cli = get_codec("zstd", "cli")
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
        archives.append((a, cli.compress(b"".join(records))))
    df = spark.createDataFrame(archives, "archive_id int, blob binary")
    raw_mb = n_archives * rec_bytes * recs_per / 1e6

    def run(use_cli: bool) -> tuple[float, int, str]:
        def stage(batches):
            from data_warehouse_migration_spark.functions.codecs import (
                get_codec as gc,
            )
            from data_warehouse_migration_spark.functions.warc import (
                read_warc_any,
            )

            suite = {"zstd": gc("zstd", "cli")} if use_cli else None
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

    run(use_cli=True)  # warm: JVM codegen + the 32 Python workers
    eng_sec, eng_n, eng_md5 = run(use_cli=False)
    cli_sec, cli_n, cli_md5 = run(use_cli=True)
    assert (eng_n, eng_md5) == (cli_n, cli_md5)
    print(f"  spark stage (zstd transport): engine {eng_sec:.2f}s, "
          f"cli {cli_sec:.2f}s", file=sys.stderr)
    return {
        "transport": "zstd",
        "archives": n_archives,
        "raw_mb": round(raw_mb, 1),
        "records": eng_n,
        "engine_sec": round(eng_sec, 3),
        "cli_sec": round(cli_sec, 3),
        "engine_mb_s": _mbps(int(raw_mb * 1e6), eng_sec),
        "cli_mb_s": _mbps(int(raw_mb * 1e6), cli_sec),
        "cli_speedup": round(eng_sec / cli_sec, 1),
        "identity_md5": True,
    }


def main() -> None:
    from data_warehouse_migration_spark.functions.codecs import get_codec

    load_before = round(os.getloadavg()[0], 2)
    # sizes tuned to engine decode speed (~0.9 / 2.8 MB/s measured)
    # so each engine pass lands in the 2-10 s stable-timing band
    sizes = {"zstd": 3 << 20, "lz4": 8 << 20}
    rows = []
    for fmt, n in sizes.items():
        raw = _text(n, seed=hash(fmt) & 0xFFFF)
        eng, cli = get_codec(fmt, "engine"), get_codec(fmt, "cli")
        blob = cli.compress(raw)  # upstream-ships-it direction

        eng_times = []
        for _ in range(2):
            t0 = time.time()
            out = eng.decompress(blob)
            eng_times.append(time.time() - t0)
        eng_sec = min(eng_times)
        assert hashlib.md5(out).hexdigest() == hashlib.md5(raw).hexdigest()

        reps, spent = 0, 0.0
        t0 = time.time()
        while spent < 0.2 or reps < 3:
            cout = cli.decompress(blob)
            reps += 1
            spent = time.time() - t0
        cli_sec = spent / reps
        assert cout == raw

        # the per-call floor: near-empty round-trip through the CLI
        tiny = cli.compress(b"x")
        reps2, spent2 = 0, 0.0
        t0 = time.time()
        while spent2 < 0.2 or reps2 < 5:
            cli.decompress(tiny)
            reps2 += 1
            spent2 = time.time() - t0
        fork_ms = round(spent2 / reps2 * 1000, 2)

        rows.append({
            "fmt": fmt,
            "raw_mb": round(n / 1e6, 2),
            "packed_mb": round(len(blob) / 1e6, 2),
            "engine_mb_s": _mbps(n, eng_sec),
            "cli_mb_s": _mbps(n, cli_sec),
            "cli_speedup": round(eng_sec / cli_sec, 1),
            "fork_floor_ms": fork_ms,
            "identity_md5": True,
        })
        print(f"  {fmt}: engine {rows[-1]['engine_mb_s']} MB/s, "
              f"cli {rows[-1]['cli_mb_s']} MB/s "
              f"({rows[-1]['cli_speedup']}x), fork floor {fork_ms} ms",
              file=sys.stderr)

    stage = spark_stage_leg()
    print(json.dumps({
        "metric": "cli_codec_slot_in",
        "rows": rows,
        "spark_stage": stage,
        "meta": {
            "load_1m_before": load_before,
            "load_1m_after": round(os.getloadavg()[0], 2),
            "cpus": os.cpu_count(),
        },
    }))


if __name__ == "__main__":
    main()
