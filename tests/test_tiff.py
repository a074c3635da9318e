"""TIFF codec (functions/tiff): LZW width-schedule sync against the
shared PDF decoder, PackBits boundaries, full container round-trips
across byte orders / compressions / strip layouts, the real
CPython-shipped file pinned against a test-local independent strip
walk, and the raise surface for honestly-absent constructs."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from data_warehouse_migration_spark.functions.pdf import lzw_decode
from data_warehouse_migration_spark.functions.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_lzw_encode,
)

_REAL = (
    "/root/.pyenv/versions/3.7.16/lib/python3.7/test/imghdrdata/python.tiff"
)


def test_lzw_width_schedule_sync():
    """Random data forces dictionary growth through the 9→10→11→12-bit
    bumps and (at 60k) the 12-bit Clear reset; any off-by-one between
    the encoder's EarlyChange phase and the decoder's desyncs the
    stream within a few codes of the boundary."""
    for n in (10, 300, 1000, 5000, 60000):
        data = os.urandom(n)
        assert lzw_decode(tiff_lzw_encode(data)) == data, n
    for pat in (b"ab" * 3000, b"a" * 5000, bytes(range(256)) * 40):
        assert lzw_decode(tiff_lzw_encode(pat)) == pat


def test_lzw_eod_on_width_boundary():
    """Deterministic sweep across every width-bump boundary: when the
    table boundary lands exactly on the LAST data code, the decoder
    adds its lagged entry and bumps before reading EOD — the encoder
    must write EOD at the bumped width (the bug the random sweep
    caught once: 'stream ended without EOD')."""
    base = bytes((i * 37 + 11) % 256 for i in range(2100))
    for n in (
        list(range(250, 260)) + list(range(760, 772)) + list(range(1786, 1796))
    ):
        d = base[:n]
        assert lzw_decode(tiff_lzw_encode(d)) == d, f"boundary n={n}"


def test_packbits_boundaries():
    for pat in (b"", b"a", b"aaaaab" * 100, os.urandom(500), b"x" * 200):
        assert packbits_decode(packbits_encode(pat), expected=len(pat)) == pat
    assert packbits_decode(b"\x80\x00a", expected=1) == b"a"  # 128 = noop
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\x05ab")
    with pytest.raises(ValueError, match="missing"):
        packbits_decode(b"\xfe")


def test_container_roundtrips():
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (20, 17), dtype=np.uint8)
    rgb = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    for big_endian in (False, True):
        for comp in ("none", "packbits", "lzw"):
            for rps in (None, 5):
                blob = encode_tiff(gray, comp, big_endian, rps)
                assert np.array_equal(decode_tiff(blob), gray)
                blob = encode_tiff(rgb, comp, big_endian, rps)
                assert np.array_equal(decode_tiff(blob), rgb)


def test_palette_and_whitezero():
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff(idx, "lzw", palette=pal)), pal[idx]
    )
    gray = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    blob = encode_tiff(gray, "none", white_is_zero=True)
    # stored samples are inverted; decode re-inverts to the raster
    assert np.array_equal(decode_tiff(blob), gray)


def test_lzw_predictor2_horizontal_differencing():
    """The decoder's Predictor-2 path against a hand-built file: strip
    bytes are row-wise deltas, decode must cumsum them mod 256."""
    gray = np.array(
        [[10, 250, 3], [200, 200, 200]], dtype=np.uint8
    )
    deltas = gray.astype(np.int16).copy()
    deltas[:, 1:] -= gray[:, :-1].astype(np.int16)
    strip = tiff_lzw_encode((deltas % 256).astype(np.uint8).tobytes())
    e = "<"
    entries = [
        (256, 4, 1, 3), (257, 4, 1, 2), (258, 3, 1, 8), (259, 3, 1, 5),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 4, 1, 2),
        (279, 4, 1, len(strip)), (317, 3, 1, 2),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II\x2a\x00" + struct.pack(e + "I", ifd_off))
    out += struct.pack(e + "H", len(entries))
    for tag, typ, count, val in entries:
        if tag == 273:
            val = data_off
        packed = struct.pack(e + ("H" if typ == 3 else "I"), val)
        packed += b"\x00" * (4 - len(packed))
        out += struct.pack(e + "HHI", tag, typ, count) + packed
    out += struct.pack(e + "I", 0) + strip
    assert np.array_equal(decode_tiff(bytes(out)), gray)


@pytest.mark.skipif(not os.path.exists(_REAL), reason="container file absent")
def test_real_cpython_tiff_pinned():
    """The CPython test-suite TIFF (a real-world II uncompressed RGB
    file): structure cross-checked by a TEST-LOCAL strip walk that
    reads the IFD with nothing but struct — for Compression=1 the
    decoded pixel sum must equal the raw strip-byte sum, so the pin
    is independent of the codec under test."""
    raw = open(_REAL, "rb").read()
    px = decode_tiff(raw)
    assert px.shape == (16, 16, 3)

    # independent walk
    assert raw[:4] == b"II\x2a\x00"
    (ifd,) = struct.unpack_from("<I", raw, 4)
    (count,) = struct.unpack_from("<H", raw, ifd)
    tags = {}
    for i in range(count):
        tag, typ, n, val = struct.unpack_from("<HHII", raw, ifd + 2 + 12 * i)
        tags[tag] = (typ, n, val)
    assert tags[259][2] == 1, "pin assumes uncompressed"
    spp = tags[277][2]
    assert spp == 4, "this file is RGBA (ExtraSamples alpha)"
    offs_t, offs_n, offs_v = tags[273]
    cnts_t, cnts_n, cnts_v = tags[279]

    def vec(typ, n, v):
        if n == 1:
            return [v]
        fmt = {3: "H", 4: "I"}[typ]
        return list(struct.unpack_from("<" + fmt * n, raw, v))

    # sum only the RGB channels: the decoder deliberately drops the
    # alpha plane, so the independent walk must skip every 4th byte
    total = 0
    for off, cnt in zip(vec(offs_t, offs_n, offs_v), vec(cnts_t, cnts_n, cnts_v)):
        strip = raw[off : off + cnt]
        total += sum(b for i, b in enumerate(strip) if i % spp < 3)
    assert int(px.astype("int64").sum()) == total == 68718


def test_honest_raises():
    gray = np.zeros((4, 4), dtype=np.uint8)
    blob = bytearray(encode_tiff(gray))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + bytes(blob[2:]))
    # unknown compression: patch tag 259's value to 7 (JPEG-in-TIFF)
    (ifd,) = struct.unpack_from("<I", blob, 4)
    (count,) = struct.unpack_from("<H", blob, ifd)
    for i in range(count):
        tag = struct.unpack_from("<H", blob, ifd + 2 + 12 * i)[0]
        if tag == 259:
            struct.pack_into("<H", blob, ifd + 2 + 12 * i + 8, 7)
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bytes(blob))
    with pytest.raises(ValueError, match="truncated|beyond"):
        decode_tiff(encode_tiff(gray)[:20])


def test_predictor2_applies_to_any_compression():
    """TIFF 6.0 defines Predictor 2 over the post-decompression bytes
    for ANY compression: an uncompressed or PackBits strip carrying
    row-wise deltas must be cumsum-inverted too, and an unknown
    predictor value must raise rather than decode silently wrong
    (ADVICE r12)."""
    gray = np.array([[10, 250, 3], [200, 200, 200]], dtype=np.uint8)
    deltas = gray.astype(np.int16).copy()
    deltas[:, 1:] -= gray[:, :-1].astype(np.int16)
    delta_bytes = (deltas % 256).astype(np.uint8).tobytes()

    def build(comp: int, strip: bytes, predictor: int) -> bytes:
        e = "<"
        entries = [
            (256, 4, 1, 3), (257, 4, 1, 2), (258, 3, 1, 8),
            (259, 3, 1, comp), (262, 3, 1, 1), (273, 4, 1, 0),
            (277, 3, 1, 1), (278, 4, 1, 2), (279, 4, 1, len(strip)),
            (317, 3, 1, predictor),
        ]
        ifd_off = 8
        data_off = ifd_off + 2 + 12 * len(entries) + 4
        out = bytearray(b"II\x2a\x00" + struct.pack(e + "I", ifd_off))
        out += struct.pack(e + "H", len(entries))
        for tag, typ, count, val in entries:
            if tag == 273:
                val = data_off
            packed = struct.pack(e + ("H" if typ == 3 else "I"), val)
            packed += b"\x00" * (4 - len(packed))
            out += struct.pack(e + "HHI", tag, typ, count) + packed
        out += struct.pack(e + "I", 0) + strip
        return bytes(out)

    uncompressed = build(1, delta_bytes, 2)
    assert np.array_equal(decode_tiff(uncompressed), gray)
    packbits = build(32773, packbits_encode(delta_bytes), 2)
    assert np.array_equal(decode_tiff(packbits), gray)
    with pytest.raises(NotImplementedError, match="predictor 3"):
        decode_tiff(build(1, delta_bytes, 3))
