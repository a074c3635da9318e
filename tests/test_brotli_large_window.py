"""Brotli LARGE-WINDOW decode (functions/brotli_stream r15 post-seal
sibling — VERDICT r14 what's-missing #4): `brotli_decompress_lw` /
`_brotli_decode` cross-pinned against the reference libbrotli
encoder+decoder in large-window mode (WBITS 10-30 via the streaming
API's LARGE_WINDOW parameter — the one-shot API can't set it), a
measured >2^24-bit back-reference, the differential pin that the new
core in standard mode is bit-for-bit the attested `brotli_decompress`
(the r16 collapse precondition), and the header/truncation/mutation
raise surface. The attested decoder's detect-and-refuse contract on
large-window headers is re-pinned here from the OTHER side."""

from __future__ import annotations

import ctypes
import ctypes.util
import os

import pytest

from data_warehouse_migration_spark.functions.brotli_stream import (
    _brotli_decode,
    brotli_decompress,
    brotli_decompress_lw,
)


def _find(lib: str):
    for cand in (
        f"/root/miniconda/lib/lib{lib}.so",
        ctypes.util.find_library(lib),
    ):
        if cand and (cand.startswith("lib") or os.path.exists(cand)):
            try:
                return ctypes.CDLL(cand)
            except OSError:
                continue
    return None


_ENC = _find("brotlienc")
_DEC = _find("brotlidec")

# public encoder/decoder parameter ids (brotli encode.h / decode.h)
_P_QUALITY, _P_LGWIN, _P_LARGE_WINDOW = 1, 2, 6
_DEC_P_LARGE_WINDOW = 1
_OP_FINISH = 2

if _ENC is not None:
    _ENC.BrotliEncoderCreateInstance.restype = ctypes.c_void_p
    _ENC.BrotliEncoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
    _ENC.BrotliEncoderSetParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32]
    _ENC.BrotliEncoderCompressStream.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t)]
    _ENC.BrotliEncoderIsFinished.argtypes = [ctypes.c_void_p]
    _ENC.BrotliEncoderDestroyInstance.argtypes = [ctypes.c_void_p]

if _DEC is not None:
    _DEC.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
    _DEC.BrotliDecoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
    _DEC.BrotliDecoderSetParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32]
    _DEC.BrotliDecoderDecompressStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t)]
    _DEC.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]


def ref_compress_lw(data: bytes, quality: int = 9, lgwin: int = 25,
                    large: bool = True) -> bytes:
    """Reference encoder through the STREAMING API so LARGE_WINDOW can
    be set (BrotliEncoderCompress one-shot has no parameter surface)."""
    st = _ENC.BrotliEncoderCreateInstance(None, None, None)
    assert st
    try:
        assert _ENC.BrotliEncoderSetParameter(st, _P_QUALITY, quality)
        if large:
            assert _ENC.BrotliEncoderSetParameter(st, _P_LARGE_WINDOW, 1)
        assert _ENC.BrotliEncoderSetParameter(st, _P_LGWIN, lgwin)
        buf = ctypes.create_string_buffer(len(data) + len(data) // 2 + 4096)
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.c_char_p(data)
        avail_out = ctypes.c_size_t(len(buf))
        next_out = ctypes.cast(buf, ctypes.c_char_p)
        while True:
            assert _ENC.BrotliEncoderCompressStream(
                st, _OP_FINISH,
                ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None)
            if _ENC.BrotliEncoderIsFinished(st):
                break
        return buf.raw[: len(buf) - avail_out.value]
    finally:
        _ENC.BrotliEncoderDestroyInstance(st)


def ref_decompress_lw(blob: bytes, hint: int) -> bytes:
    """Reference decoder with LARGE_WINDOW enabled (streaming API —
    the one-shot BrotliDecoderDecompress rejects large-window input)."""
    st = _DEC.BrotliDecoderCreateInstance(None, None, None)
    assert st
    try:
        assert _DEC.BrotliDecoderSetParameter(st, _DEC_P_LARGE_WINDOW, 1)
        buf = ctypes.create_string_buffer(hint + 4096)
        avail_in = ctypes.c_size_t(len(blob))
        next_in = ctypes.c_char_p(blob)
        avail_out = ctypes.c_size_t(len(buf))
        next_out = ctypes.cast(buf, ctypes.c_char_p)
        res = _DEC.BrotliDecoderDecompressStream(
            st, ctypes.byref(avail_in), ctypes.byref(next_in),
            ctypes.byref(avail_out), ctypes.byref(next_out), None)
        assert res == 1, f"reference decoder result {res}"
        return buf.raw[: len(buf) - avail_out.value]
    finally:
        _DEC.BrotliDecoderDestroyInstance(st)


CASES = [
    b"",
    b"a",
    b"hello large window brotli " * 200,
    bytes(range(256)) * 40,
    ("Überraschung naïve café 中文测试 русский — " * 100).encode(),
]

# Authored ONCE by libbrotlienc 1.2.0 (quality 11, lgwin 30,
# LARGE_WINDOW=1) over b"large window pinned fixture " * 6 and embedded
# so the no-library path still covers header parse + decode; wbits=30
# and two static-dictionary references verified via the stats surface.
_PINNED_HEX = (
    "115e9c02e017b7b175fd43038f4414948314a260ae4007f15027ce682722cabf3702"
)
_PINNED_TEXT = b"large window pinned fixture " * 6


def test_pinned_lw_fixture_decodes_without_library():
    blob = bytes.fromhex(_PINNED_HEX)
    stats: dict = {}
    assert brotli_decompress_lw(blob, stats=stats) == _PINNED_TEXT
    assert stats["wbits"] == 30
    assert stats["n_dict_refs"] >= 1  # dictionary path live under LW too
    # the attested decoder keeps its detect-and-refuse contract
    with pytest.raises(NotImplementedError, match="large-window"):
        brotli_decompress(blob)


def test_lw_header_guards():
    # bits LSB-first 1,000,001 + reserved bit SET
    with pytest.raises(ValueError, match="reserved"):
        brotli_decompress_lw(b"\x91\x00\x00\x00")
    # WBITS literals outside [10, 30]
    for wbits in (0, 9, 31, 63):
        with pytest.raises(ValueError, match="WBITS"):
            brotli_decompress_lw(bytes([0x11, wbits, 0, 0]))
    # the same bytes stay NotImplementedError through the attested fn
    with pytest.raises(NotImplementedError, match="large-window"):
        brotli_decompress(b"\x91\x00\x00\x00")


@pytest.mark.skipif(_ENC is None, reason="reference brotli encoder absent")
def test_lw_decodes_across_all_window_sizes():
    """Every legal large-window WBITS (the encoder emits the LW header
    for ALL of 10-30 once the parameter is set, including sizes the
    classic header could express)."""
    for lgwin in (10, 14, 18, 22, 24, 25, 26, 28, 30):
        for quality in (1, 5, 9, 11):
            for data in CASES:
                blob = ref_compress_lw(data, quality, lgwin)
                stats: dict = {}
                assert brotli_decompress_lw(blob, stats=stats) == data, (
                    lgwin, quality, len(data))
                # the encoder may SHRINK wbits to fit a small payload
                # (so don't pin wbits == lgwin), and its q0/q1 fast
                # path ignores LARGE_WINDOW entirely, emitting classic
                # headers — pin the LW header form for quality >= 2
                if quality >= 2:
                    assert stats["lw_header"] is True
        with pytest.raises(NotImplementedError, match="large-window"):
            brotli_decompress(ref_compress_lw(b"x" * 500, 5, lgwin))


@pytest.mark.skipif(_ENC is None, reason="reference brotli encoder absent")
def test_lw_function_accepts_standard_streams():
    """Mirror of the reference decoder's contract: LARGE_WINDOW mode
    accepts classic RFC 7932 streams unchanged."""
    for data in CASES:
        blob = ref_compress_lw(data, 9, 22, large=False)
        assert brotli_decompress_lw(blob) == brotli_decompress(blob) == data


@pytest.mark.skipif(_ENC is None, reason="reference brotli encoder absent")
def test_core_in_standard_mode_matches_attested_decoder():
    """The r16 collapse precondition: `_brotli_decode(large_window=
    False)` is behaviorally identical to the attested
    `brotli_decompress` — same bytes out on valid streams, same
    NotImplementedError on large-window headers."""
    for quality in (0, 1, 5, 9, 11):
        for data in CASES:
            blob = ref_compress_lw(data, quality, 22, large=False)
            assert _brotli_decode(blob) == brotli_decompress(blob) == data
    lw_blob = ref_compress_lw(b"y" * 300, 5, 26)
    with pytest.raises(NotImplementedError, match="large-window"):
        _brotli_decode(lw_blob)


@pytest.mark.skipif(_ENC is None, reason="reference brotli encoder absent")
def test_distance_beyond_24_bits_round_trips():
    """The reason the extension exists: a 4 KiB anchor repeated
    ~16.9 MB later (past the classic 2^24 distance ceiling) must come
    back through a real >2^24 back-reference, proven via the stats
    surface, not just a large-window header on short data."""
    import random

    rng = random.Random(99)
    anchor = rng.randbytes(4096)
    words = [b"alpha", b"bravo", b"charlie", b"delta", b"echo", b"foxtrot"]
    filler = b" ".join(rng.choice(words) for _ in range(2_600_000))
    data = anchor + filler + anchor
    assert len(filler) > (1 << 24)
    blob = ref_compress_lw(data, 9, 25)
    stats: dict = {}
    assert brotli_decompress_lw(blob, stats=stats) == data
    assert stats["wbits"] == 25
    assert stats["max_distance"] > (1 << 24), stats


@pytest.mark.skipif(_DEC is None or _ENC is None,
                    reason="reference brotli decoder absent")
def test_reference_decoder_agrees_on_lw_streams():
    blob = bytes.fromhex(_PINNED_HEX)
    assert ref_decompress_lw(blob, len(_PINNED_TEXT)) == _PINNED_TEXT
    for data in CASES:
        blob = ref_compress_lw(data, 9, 28)
        assert (brotli_decompress_lw(blob)
                == ref_decompress_lw(blob, len(data)) == data)


@pytest.mark.skipif(_ENC is None, reason="reference brotli encoder absent")
def test_lw_truncation_raises_valueerror_everywhere():
    blob = ref_compress_lw(
        b"truncate me anywhere, the information about the world. " * 20, 11, 26)
    assert brotli_decompress_lw(blob)
    for cut in range(len(blob)):
        with pytest.raises(ValueError):
            brotli_decompress_lw(blob[:cut])


@pytest.mark.skipif(_ENC is None, reason="reference brotli encoder absent")
def test_lw_mutation_fuzz_never_escapes_the_exception_contract():
    """200 seeded single-byte corruptions of a large-window stream:
    silently different output is legal (no checksum), but the only
    raise class is ValueError — `large_window=True` never surfaces
    NotImplementedError — the cap binds, and no raw IndexError."""
    import random

    rng = random.Random(4321)
    data = b"fuzz the large window gently, said the meta-block " * 40
    blob = bytearray(ref_compress_lw(data, 5, 27))
    for _ in range(200):
        i = rng.randrange(len(blob))
        old = blob[i]
        blob[i] ^= 1 << rng.randrange(8)
        try:
            brotli_decompress_lw(bytes(blob), max_output=len(data) * 4)
        except ValueError:
            pass
        blob[i] = old


def test_lw_output_cap_binds():
    blob = bytes.fromhex(_PINNED_HEX)
    with pytest.raises(ValueError, match="cap"):
        brotli_decompress_lw(blob, max_output=len(_PINNED_TEXT) - 1)
    assert brotli_decompress_lw(blob, max_output=len(_PINNED_TEXT)) \
        == _PINNED_TEXT
