"""FLAC codec pins (functions/flac.py — r11, the Rice/LPC rung).

Independence strategy, same as the JPEG/PNG/GIF rungs: the
round-trip tests exercise encoder+decoder together, so the
*independent* pins are (a) a HAND-DERIVED bitstream assembled from
raw bit strings in this file (covering RICE2, the escape partition,
wasted bits, and a fixed predictor — decode only, so a shared
encoder/decoder bug cannot fake it), (b) table-driven CRC-8/CRC-16
implementations written independently of the codec's bitwise ones,
(c) the STREAMINFO MD5 recomputed here via ``struct`` packing, and
(d) byte-level assertions on the encoder's container output
(markers, STREAMINFO fields, frame sync) checked against the RFC
9639 layout directly.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from data_warehouse_migration_spark.functions.flac import (
    _decode_utf8_number,
    _encode_utf8_number,
    _MsbBitReader,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


# --- independent CRC references (table-driven, vs the codec's bitwise) -------


def _crc8_table(data: bytes) -> int:
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        table.append(c)
    crc = 0
    for b in data:
        crc = table[crc ^ b]
    return crc


def _crc16_table(data: bytes) -> int:
    table = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        table.append(c)
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ table[(crc >> 8) ^ b]
    return crc


def test_crc_conventions_match_independent_tables():
    for payload in (b"", b"\x00", b"123456789", bytes(range(256)), b"\xff" * 40):
        assert crc8(payload) == _crc8_table(payload)
        assert crc16(payload) == _crc16_table(payload)


# --- round-trips across every encoder strategy -------------------------------


@pytest.mark.parametrize("strategy", ["auto", "verbatim", "fixed", "lpc"])
@pytest.mark.parametrize(
    "stereo", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_roundtrip_exact(strategy, stereo):
    rng = np.random.default_rng(11)
    sig = np.clip(
        np.cumsum(rng.integers(-60, 61, size=(700, 2)), axis=0), -30000, 30000
    )
    payload = encode_flac(
        sig, 48000, 16, block_size=256, strategy=strategy, stereo=stereo
    )
    dec, sr, bps = decode_flac(payload)
    assert (sr, bps) == (48000, 16)
    assert (dec == sig).all()


def test_mono_roundtrip_odd_tail_and_partitions():
    rng = np.random.default_rng(3)
    sig = np.clip(np.cumsum(rng.integers(-40, 41, size=1000)), -20000, 20000)
    payload = encode_flac(
        sig, 44100, 16, block_size=192, strategy="fixed", partition_order=3
    )
    dec, _, _ = decode_flac(payload)
    assert (dec[:, 0] == sig).all()


def test_constant_and_extreme_values_roundtrip():
    sig = np.full((64, 2), -32768, dtype=np.int64)
    dec, _, _ = decode_flac(encode_flac(sig, strategy="auto"))
    assert (dec == sig).all()
    sig2 = np.array([[32767, -32768]] * 33 + [[-32768, 32767]] * 31)
    dec2, _, _ = decode_flac(encode_flac(sig2, strategy="verbatim"))
    assert (dec2 == sig2).all()


def test_eight_bit_and_24_bit_depths():
    rng = np.random.default_rng(5)
    s8 = rng.integers(-128, 128, size=(150, 1))
    dec, _, bps = decode_flac(encode_flac(s8, 8000, 8, strategy="fixed"))
    assert bps == 8 and (dec == s8).all()
    s24 = rng.integers(-(1 << 23), 1 << 23, size=(150, 2))
    dec24, _, bps24 = decode_flac(
        encode_flac(s24, 96000, 24, strategy="fixed", stereo="mid_side")
    )
    assert bps24 == 24 and (dec24 == s24).all()


def test_many_frames_exercise_multibyte_frame_numbers():
    # 200 frames of 16 samples → frame numbers through 199 (2-byte
    # extended UTF-8 beyond 127)
    rng = np.random.default_rng(9)
    sig = np.clip(np.cumsum(rng.integers(-9, 10, size=3200)), -8000, 8000)
    payload = encode_flac(sig, 32000, 16, block_size=16, strategy="fixed")
    dec, _, _ = decode_flac(payload)
    assert (dec[:, 0] == sig).all()


def test_fixed_and_lpc_actually_compress():
    t = np.arange(8192)
    sig = (12000 * np.sin(t / 17)).astype(np.int64)
    raw = sig.size * 2
    assert len(encode_flac(sig, strategy="fixed", partition_order=2)) < raw / 4
    # quantized-coefficient LPC is quantization-noise-limited (~3 LSB
    # residual) where the exact integer order-4 difference predictor
    # hits ~0 on a slow sine — ~4.5 bits/sample is the honest figure
    assert len(encode_flac(sig, strategy="lpc", partition_order=2)) < raw / 3


# --- container layout pinned against the RFC directly ------------------------


def test_container_layout_and_streaminfo_fields():
    sig = np.arange(-100, 100, dtype=np.int64).reshape(-1, 2)  # 100×2
    payload = encode_flac(sig, 44100, 16, block_size=64, stereo="mid_side")
    assert payload[:4] == b"fLaC"
    assert payload[4] == 0x80  # last-block flag + STREAMINFO type 0
    assert int.from_bytes(payload[5:8], "big") == 34
    si = payload[8:42]
    min_bs = int.from_bytes(si[0:2], "big")
    max_bs = int.from_bytes(si[2:4], "big")
    assert (min_bs, max_bs) == (36, 64)  # 100 = 64 + 36 tail
    rate_ch_bps = int.from_bytes(si[10:14], "big")
    assert rate_ch_bps >> 12 == 44100
    assert (rate_ch_bps >> 9) & 0x7 == 1  # channels - 1
    assert (rate_ch_bps >> 4) & 0x1F == 15  # bps - 1
    total = ((rate_ch_bps & 0xF) << 32) | int.from_bytes(si[14:18], "big")
    assert total == 100
    # STREAMINFO MD5 == md5 of interleaved little-endian int16 PCM
    ref = hashlib.md5(
        struct.pack(f"<{sig.size}h", *sig.reshape(-1).tolist())
    ).digest()
    assert si[18:34] == ref
    # first frame starts right after metadata, with the 14-bit sync
    assert payload[42] == 0xFF and payload[43] & 0xFC == 0xF8


def test_md5_detects_decoder_divergence():
    sig = np.arange(64, dtype=np.int64) * 7 % 256 - 128
    payload = bytearray(encode_flac(sig, 8000, 16, strategy="verbatim"))
    # flip one PCM-affecting bit late in the stream: frame CRC catches it
    payload[-3] ^= 0x10
    with pytest.raises(ValueError, match="CRC-16|CRC-8|truncated"):
        decode_flac(bytes(payload))


def test_header_crc8_detects_corruption():
    sig = np.zeros(32, dtype=np.int64)
    payload = bytearray(encode_flac(sig, 44100, 16))
    payload[44] ^= 0x01  # inside the frame header
    with pytest.raises(ValueError):
        decode_flac(bytes(payload))


# --- extended UTF-8 numbers ---------------------------------------------------


def test_utf8_number_roundtrip_edges():
    for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              (1 << 21) - 1, 1 << 21, (1 << 26) - 1, 1 << 26,
              (1 << 31) - 1, 1 << 31, (1 << 36) - 1):
        enc = _encode_utf8_number(n)
        assert _decode_utf8_number(_MsbBitReader(enc)) == n
    # standard UTF-8 compatibility in the shared range
    for n in (0x41, 0x7FF, 0xFFFF):
        assert _encode_utf8_number(n) == chr(n).encode("utf-8")
    with pytest.raises(ValueError):
        _encode_utf8_number(1 << 36)


# --- hand-derived bitstream: decode-only independence pin ---------------------


def _bits(s: str) -> str:
    return s.replace(" ", "")


def test_hand_derived_stream_rice2_escape_wasted_bits():
    """A FLAC stream assembled from raw bit strings (never touching
    the codec's writer): mono, 8-bit, one 4-sample frame whose
    subframe is FIXED order 1 with ONE wasted bit, and whose residual
    uses RICE2 (method 01) with the 5-bit ESCAPE parameter (11111) —
    the three decode paths our encoder never emits. Expected samples
    are derived by hand below."""
    # STREAMINFO: min/max block 4, min/max frame 0, rate 8000, 1 ch,
    # 8 bps, 4 total samples, md5 = zeros (decoder skips the check)
    si = _bits(
        "0000000000000100" "0000000000000100"      # min/max block size
        + "0" * 48                                  # min/max frame size
        + format(8000, "020b") + "000" + "00111"    # rate / ch-1 / bps-1
        + format(4, "036b")
    )
    streaminfo = int(si, 2).to_bytes(len(si) // 8, "big") + bytes(16)
    header = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    # Frame header: sync(14) res(1) blocking(1)=0, bs code 0110
    # (8-bit at end), rate code 0100 (8000), ch 0000, bps 001 (8),
    # res(1), frame#0 (1 byte), block size byte = 3 (n-1)
    fh = _bits(
        "11111111111110 0 0" " 0110 0100" " 0000 001 0"
    )
    fh_bytes = int(fh, 2).to_bytes(4, "big") + bytes([0x00, 0x03])
    fh_bytes += bytes([_crc8_table(fh_bytes)])

    # Subframe: pad 0, type 001001 (FIXED order 1), wasted flag 1 +
    # unary "1" → 1 wasted bit → effective bps 7.
    # Warmup sample (7-bit signed): 3.
    # Residual: method 01 (RICE2), partition order 0000, parameter
    # 11111 (ESCAPE), raw size 00101 (5 bits), residuals -2, 1, 0 as
    # 5-bit two's complement: 11110 00001 00000.
    # Reconstruction (order-1: s[t] = s[t-1] + r): 3, 1, 2, 2 → after
    # the wasted-bit shift-back (<<1): 6, 2, 4, 4.
    body = _bits(
        "0 001001 1 1"
        " 0000011"
        " 01 0000 11111 00101"
        " 11110 00001 00000"
    )
    pad = (8 - len(body) % 8) % 8
    body_bytes = int(body + "0" * pad, 2).to_bytes((len(body) + pad) // 8, "big")
    frame_wo_crc = fh_bytes + body_bytes
    frame = frame_wo_crc + _crc16_table(frame_wo_crc).to_bytes(2, "big")

    dec, sr, bps = decode_flac(header + frame)
    assert (sr, bps) == (8000, 8)
    assert dec[:, 0].tolist() == [6, 2, 4, 4]


def test_hand_derived_stream_plain_rice_lpc():
    """Second hand pin: an LPC order-1 subframe with a plain RICE
    (method 00) k=1 partition — checks the quantized-coefficient
    prediction arithmetic (coef 3, shift 1 → pred = (3·prev)>>1)
    against hand-computed samples."""
    si = _bits(
        "0000000000000011" "0000000000000011"
        + "0" * 48
        + format(8000, "020b") + "000" + "00111"
        + format(3, "036b")
    )
    streaminfo = int(si, 2).to_bytes(len(si) // 8, "big") + bytes(16)
    header = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    fh = _bits("11111111111110 0 0" " 0110 0100" " 0000 001 0")
    fh_bytes = int(fh, 2).to_bytes(4, "big") + bytes([0x00, 0x02])
    fh_bytes += bytes([_crc8_table(fh_bytes)])

    # Subframe: pad 0, type 100000 (LPC order 1), no wasted bits (0).
    # Warmup (8-bit signed): 10. Precision code 0011 → 4 bits.
    # Shift (5-bit signed-as-written, spec: positive): 1.
    # Coefficient (4-bit signed): 3.
    # Residual: method 00, partition order 0, k=0001,
    # residuals r1=+1 (zigzag 2: q=1 unary "01", low bit 0),
    #           r2=-1 (zigzag 1: q=0 unary "1", low bit 1).
    # s1 = ((3·10)>>1) + 1 = 15 + 1 = 16
    # s2 = ((3·16)>>1) - 1 = 24 - 1 = 23
    body = _bits(
        "0 100000 0"
        " 00001010"
        " 0011 00001 0011"
        " 00 0000 0001"
        " 01 0"
        " 1 1"
    )
    pad = (8 - len(body) % 8) % 8
    body_bytes = int(body + "0" * pad, 2).to_bytes((len(body) + pad) // 8, "big")
    frame_wo_crc = fh_bytes + body_bytes
    frame = frame_wo_crc + _crc16_table(frame_wo_crc).to_bytes(2, "big")

    dec, _, _ = decode_flac(header + frame)
    assert dec[:, 0].tolist() == [10, 16, 23]


def test_rejects_non_flac_and_truncation():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFF....")
    sig = np.arange(32, dtype=np.int64)
    payload = encode_flac(sig, 8000, 16)
    with pytest.raises(ValueError):
        decode_flac(payload[: len(payload) - 4])
