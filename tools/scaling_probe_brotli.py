"""r15 post-seal scaling probe: the brotli rung joins the measured
native-codec slot-in (sibling of tools/scaling_probe_native.py,
which pinned gzip/snappy/bz2/xz in SCALING_r15_native.json — the
sealed artifact stays untouched; this writes SCALING_r15_brotli.json).

Why a separate probe: `Content-Encoding: br` is the most-frequent
modern web coding, and r15 post-seal gave the seam a native brotli
twin (ctypes over the in-container libbrotli — functions/codecs) plus
the engine's large-window sibling decoder. Two rows, both decoding
native-authored archives (the upstream-ships-it direction) through
BOTH seam implementations with byte-identity (md5) asserted:

- ``classic``: an RFC 7932 stream (one-shot encoder, lgwin 22);
- ``large_window``: a WBITS-26 stream authored through the streaming
  encoder with LARGE_WINDOW set, over a corpus built around a 4 KiB
  anchor repeated ~17 MB later so the stream carries a REAL >2^24
  back-reference (asserted via the engine decoder's stats surface,
  not just the header form).

Noise hygiene matches the sibling probe: load averages recorded,
engine timings min-of-2, native timings loop to >=0.2 s.

Usage:
    python tools/scaling_probe_brotli.py   # ONE JSON line on stdout
"""

from __future__ import annotations

import ctypes
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


def _lw_compress(data: bytes, quality: int, lgwin: int) -> bytes:
    """Streaming-API author with LARGE_WINDOW set (the one-shot API
    can't) — same prototypes the test harness uses."""
    from data_warehouse_migration_spark.functions.codecs import (
        _load_brotli_libs,
    )

    enc, _dec, ct = _load_brotli_libs()
    enc.BrotliEncoderCreateInstance.restype = ctypes.c_void_p
    enc.BrotliEncoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
    enc.BrotliEncoderSetParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32]
    enc.BrotliEncoderCompressStream.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t)]
    enc.BrotliEncoderIsFinished.argtypes = [ctypes.c_void_p]
    enc.BrotliEncoderDestroyInstance.argtypes = [ctypes.c_void_p]
    st = enc.BrotliEncoderCreateInstance(None, None, None)
    assert st
    try:
        for p, v in ((1, quality), (6, 1), (2, lgwin)):  # QUALITY/LW/LGWIN
            assert enc.BrotliEncoderSetParameter(st, p, v)
        buf = ctypes.create_string_buffer(len(data) + len(data) // 2 + 4096)
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.c_char_p(data)
        avail_out = ctypes.c_size_t(len(buf))
        next_out = ctypes.cast(buf, ctypes.c_char_p)
        while True:
            assert enc.BrotliEncoderCompressStream(
                st, 2, ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None)
            if enc.BrotliEncoderIsFinished(st):
                break
        return buf.raw[: len(buf) - avail_out.value]
    finally:
        enc.BrotliEncoderDestroyInstance(st)


def main() -> None:
    from data_warehouse_migration_spark.functions.brotli_stream import (
        brotli_decompress_lw,
    )
    from data_warehouse_migration_spark.functions.codecs import get_codec

    load_before = round(os.getloadavg()[0], 2)
    eng, nat = get_codec("br", "engine"), get_codec("br", "native")

    rng = random.Random(0xB407)
    anchor = rng.randbytes(4096)
    filler = _text(17 << 20, seed=7)
    lw_raw = anchor + filler + anchor

    cases = [
        ("classic", _text(8 << 20, seed=3), None),
        ("large_window", lw_raw, 26),
    ]
    rows = []
    for label, raw, lgwin in cases:
        if lgwin is None:
            blob = nat.compress(raw)  # one-shot q9: classic header
        else:
            blob = _lw_compress(raw, 9, lgwin)

        stats: dict = {}
        eng_times = []
        for _ in range(2):
            t0 = time.time()
            out = brotli_decompress_lw(blob, stats=stats)
            eng_times.append(time.time() - t0)
        eng_sec = min(eng_times)
        assert hashlib.md5(out).hexdigest() == hashlib.md5(raw).hexdigest()
        if lgwin is not None:
            assert stats["lw_header"] is True
            assert stats["max_distance"] > (1 << 24), stats

        reps, spent = 0, 0.0
        t0 = time.time()
        while spent < 0.2 or reps < 3:
            nout = nat.decompress(blob)
            reps += 1
            spent = time.time() - t0
        nat_sec = spent / reps
        assert nout == raw
        rows.append({
            "case": label,
            "raw_mb": round(len(raw) / 1e6, 2),
            "packed_mb": round(len(blob) / 1e6, 2),
            "wbits": stats["wbits"],
            "max_back_reference": stats["max_distance"],
            "engine_mb_s": _mbps(len(raw), eng_sec),
            "native_mb_s": _mbps(len(raw), nat_sec),
            "native_speedup": round(eng_sec / nat_sec, 1),
            "identity_md5": True,
        })
        print(f"  {label}: engine {rows[-1]['engine_mb_s']} MB/s, "
              f"native {rows[-1]['native_mb_s']} MB/s "
              f"({rows[-1]['native_speedup']}x)", file=sys.stderr)

    print(json.dumps({
        "metric": "brotli_native_slot_in",
        "rows": rows,
        "meta": {
            "load_1m_before": load_before,
            "load_1m_after": round(os.getloadavg()[0], 2),
            "cpus": os.cpu_count(),
        },
    }))


if __name__ == "__main__":
    main()
