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
  docstring's amortization claim, quantified).

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

    print(json.dumps({
        "metric": "cli_codec_slot_in",
        "rows": rows,
        "meta": {
            "load_1m_before": load_before,
            "load_1m_after": round(os.getloadavg()[0], 2),
            "cpus": os.cpu_count(),
        },
    }))


if __name__ == "__main__":
    main()
