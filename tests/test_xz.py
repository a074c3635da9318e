"""xz/LZMA2/LZMA decoder (functions/xz): cross-pins against liblzma
(CPython's ``lzma``) across presets and check types, multi-chunk and
uncompressed-chunk LZMA2, multi-stream layout, CRC64 vectors, and the
corruption/unsupported raise surface."""

from __future__ import annotations

import lzma
import os

import pytest

from data_warehouse_migration_spark.functions.xz import (
    crc64_xz,
    lzma2_decompress,
    xz_decompress,
)

CASES = [
    b"",
    b"a",
    b"hello world " * 50,
    bytes(range(256)) * 5,
    b"a" * 10_000,
    ("the quick brown fox jumps over the lazy dog " * 200).encode(),
]


def test_decodes_liblzma_across_presets_and_checks():
    for c in CASES:
        for preset in (0, 1, 6, 9):
            for check in (
                lzma.CHECK_NONE,
                lzma.CHECK_CRC32,
                lzma.CHECK_CRC64,
                lzma.CHECK_SHA256,
            ):
                blob = lzma.compress(
                    c, format=lzma.FORMAT_XZ, check=check, preset=preset
                )
                assert xz_decompress(blob) == c, (len(c), preset, check)


def test_multi_chunk_and_uncompressed_chunks():
    """>64 KiB packed forces multiple LZMA2 compressed chunks;
    incompressible input makes liblzma emit UNCOMPRESSED chunks —
    both chunk grammars must walk."""
    big_text = b"spark graft engine " * 60_000  # ~1.1 MB compressible
    big_rand = os.urandom(300_000)
    mixed = b"".join(os.urandom(1000) + b"A" * 3000 for _ in range(100))
    for c in (big_text, big_rand, mixed):
        for preset in (0, 6):
            blob = lzma.compress(c, format=lzma.FORMAT_XZ, preset=preset)
            assert xz_decompress(blob) == c, (len(c), preset)


def test_multistream_with_padding():
    s1 = lzma.compress(b"first|", format=lzma.FORMAT_XZ)
    s2 = lzma.compress(b"second", format=lzma.FORMAT_XZ)
    pad = b"\x00" * ((4 - len(s1) % 4) % 4)
    assert xz_decompress(s1 + pad + s2) == b"first|second"
    # trailing padding after the last stream is legal if 4-aligned
    assert xz_decompress(s2 + b"\x00" * 4) == b"second"


def test_crc64_vector():
    # ECMA-182 reflected (CRC-64/XZ): published check value
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA
    assert crc64_xz(b"") == 0


def test_corruption_raises():
    good = lzma.compress(b"payload " * 100, format=lzma.FORMAT_XZ)
    muts = {
        "truncated": good[:-3],
        "body flip": good[:20] + bytes([good[20] ^ 0xFF]) + good[21:],
        "bad magic": b"XX" + good[2:],
        "flags flip": good[:7] + bytes([good[7] ^ 0x01]) + good[8:],
    }
    for why, blob in muts.items():
        with pytest.raises((ValueError, NotImplementedError)):
            xz_decompress(blob)


def test_bcj_chain_honest_raise():
    filt = [{"id": lzma.FILTER_X86}, {"id": lzma.FILTER_LZMA2, "preset": 6}]
    blob = lzma.compress(
        b"\xe8\x00\x00\x00\x00 call " * 50, format=lzma.FORMAT_XZ,
        filters=filt,
    )
    with pytest.raises(NotImplementedError, match="BCJ"):
        xz_decompress(blob)


def test_lzma2_raw_reserved_control():
    with pytest.raises(ValueError, match="reserved control"):
        lzma2_decompress(b"\x7f")
    with pytest.raises(ValueError, match="end marker"):
        lzma2_decompress(b"")


def test_dict_reset_restarts_position_contexts():
    """pos_state and the lp literal context count from the LAST
    DICTIONARY RESET (LzmaDec's processedPos), not the absolute
    output start. liblzma never emits a mid-sequence reset, so build
    one: an uncompressed dict-reset chunk of length k (k mod 2^pb ≠ 0)
    followed by a liblzma raw chunk sequence whose first chunk resets
    the dictionary again — liblzma itself adjudicates the composite
    (ADVICE r12)."""
    filters = [{"id": lzma.FILTER_LZMA2, "preset": 6}]
    body = b"hello world, hello lzma, hello range coder " * 20
    raw = lzma.compress(body, format=lzma.FORMAT_RAW, filters=filters)
    assert raw[0] & 0xE0 == 0xE0  # first chunk: props + dict reset
    for k in (1, 2, 3, 5, 7, 13):
        pre = bytes([1, 0, k - 1]) + b"X" * k  # control 1 = dict reset
        composite = pre + raw
        ref = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW, filters=filters
        ).decompress(composite)
        assert ref == b"X" * k + body  # conformant per liblzma
        assert lzma2_decompress(composite) == ref, k


def test_truncation_raises_valueerror_everywhere():
    """Cutting a valid .xz at EVERY byte offset must raise ValueError
    (or NotImplementedError), never IndexError/struct.error — the
    quarantine lane attests reason classes and strict callers rely on
    the documented exception surface (ADVICE r12)."""
    blob = lzma.compress(b"truncate me anywhere " * 30, preset=1)
    assert xz_decompress(blob)  # sanity: full blob decodes
    for cut in range(len(blob)):
        with pytest.raises((ValueError, NotImplementedError)):
            xz_decompress(blob[:cut])


def test_output_cap_binds_during_decode():
    """ADVICE r14: max_output threads into the LZMA2 chunk walk and
    is checked against each chunk's declared unpacked size before
    the chunk expands."""
    raw = b"\x00" * (4 << 20)
    blob = lzma.compress(raw, format=lzma.FORMAT_XZ)
    assert xz_decompress(blob, max_output=len(raw)) == raw
    with pytest.raises(ValueError, match="caller's cap"):
        xz_decompress(blob, max_output=len(raw) - 1)
    with pytest.raises(ValueError, match="caller's cap"):
        xz_decompress(blob, max_output=1000)
    # blocks without a declared compressed size walk the counting
    # path — the cap threads there too (single small chunk keeps the
    # fixture cheap)
    small = lzma.compress(b"q" * 5000, format=lzma.FORMAT_XZ)
    with pytest.raises(ValueError, match="caller's cap"):
        xz_decompress(small, max_output=4999)
    # multi-stream: cumulative budget
    two = lzma.compress(b"x" * 1000, format=lzma.FORMAT_XZ) + lzma.compress(
        b"y" * 1000, format=lzma.FORMAT_XZ
    )
    assert xz_decompress(two, max_output=2000) == b"x" * 1000 + b"y" * 1000
    with pytest.raises(ValueError, match="caller's cap"):
        xz_decompress(two, max_output=1999)
