"""bzip2 codec (functions/bz2_stream): own round-trip, cross-pins
against CPython's stdlib ``bz2`` (the reference libbz2) in BOTH
directions, multi-block and multi-stream layouts, and the
corruption/unsupported raise surface the quarantine lane routes."""

from __future__ import annotations

import bz2 as stdlib_bz2
import os
import random

import pytest

from data_warehouse_migration_spark.functions.bz2_stream import (
    _bwt_decode,
    _bwt_encode,
    _mtf_rle2_decode,
    _mtf_rle2_encode,
    _rle1_decode,
    _rle1_encode,
    bz2_compress,
    bz2_crc32,
    bz2_decompress,
)

CASES = [
    b"",
    b"a",
    b"banana",
    b"hello world " * 50,
    bytes(range(256)) * 3,
    b"a" * 300,          # deep RLE1 runs (4-byte escape + count)
    b"ababab" * 200,     # high-repetition BWT ties
    ("the quick brown fox jumps over the lazy dog " * 40).encode(),
]


def test_own_roundtrip():
    for c in CASES:
        assert bz2_decompress(bz2_compress(c)) == c, len(c)
    assert bz2_decompress(bz2_compress(os.urandom(2000))) is not None


def test_stdlib_decodes_our_streams():
    """libbz2 (via stdlib bz2) is the reference decoder — it must
    accept every stream our encoder emits, including the empty one."""
    for c in CASES:
        assert stdlib_bz2.decompress(bz2_compress(c)) == c, len(c)


def test_we_decode_stdlib_streams():
    """The decode side must handle REAL libbz2 output: multiple
    Huffman tables, selector MTF, and (for the 300k case) multiple
    blocks per stream."""
    random.seed(7)
    big = bytes(random.randrange(4) for _ in range(300_000))
    for c in CASES + [big]:
        for level in (1, 9):
            assert bz2_decompress(stdlib_bz2.compress(c, level)) == c, (
                len(c),
                level,
            )


def test_multistream_concatenation():
    """pbzip2/wiki-dump shape: concatenated independent streams decode
    to the concatenated payloads (this is what makes .bz2 splittable —
    a reader resynchronizes at any stream header)."""
    blob = (
        stdlib_bz2.compress(b"first|")
        + bz2_compress(b"second")
        + stdlib_bz2.compress(b"|third")
    )
    assert bz2_decompress(blob) == b"first|second|third"


def test_bwt_known_answer():
    last, ptr = _bwt_encode(b"banana")
    assert (last, ptr) == (b"nnbaaa", 3)
    assert _bwt_decode(last, ptr) == b"banana"


def test_rle1_escape_boundary():
    # exactly 4 equal bytes → escape with count 0; 259 = max run
    assert _rle1_encode(b"aaaa") == b"aaaa\x00"
    assert _rle1_decode(b"aaaa\x00") == b"aaaa"
    run = b"b" * 259
    assert _rle1_decode(_rle1_encode(run)) == run
    with pytest.raises(ValueError, match="count byte"):
        _rle1_decode(b"cccc")  # escape truncated before its count


def test_mtf_rle2_zero_runs():
    # bijective base-2 RUNA/RUNB: lengths 1..6 all survive
    used = [97, 98]
    for k in range(1, 7):
        data = b"a" * k + b"b"
        syms = _mtf_rle2_encode(data, used)
        eob = len(used) + 1
        assert _mtf_rle2_decode(syms + [eob], used, eob) == data


def test_crc_is_the_unreflected_variant():
    # bzip2's CRC differs from zlib's: poly 0x04C11DB7 MSB-first
    import zlib

    assert bz2_crc32(b"123456789") == 0xFC891918
    assert bz2_crc32(b"123456789") != zlib.crc32(b"123456789")


def test_corruption_raises_valueerror():
    good = bz2_compress(b"payload " * 40)
    muts = {
        "truncated": good[:-1],
        "flipped block byte": good[:14] + bytes([good[14] ^ 0xFF]) + good[15:],
        "bad magic": b"XX" + good[2:],
        "bad level": good[:3] + b"0" + good[4:],
    }
    for why, blob in muts.items():
        with pytest.raises((ValueError, NotImplementedError)), \
             _noop_ctx(why):
            bz2_decompress(blob)


def _noop_ctx(_why):
    import contextlib

    return contextlib.nullcontext()


def test_randomized_bit_rejected_honestly():
    """Set the deprecated randomized bit in a valid stream: the
    decoder must refuse with the reason, not emit garbage. The bit
    sits right after the 32-bit block CRC, i.e. bit 32 of the block
    body at byte 4+6+4 = offset 14·8+... locate it via the encoder's
    fixed layout: 4-byte header, 6-byte magic, 4-byte CRC → bit 112."""
    good = bz2_compress(b"some text to compress")
    bit = (4 + 6 + 4) * 8  # randomized flag position
    byte_i, bit_i = divmod(bit, 8)
    flipped = (
        good[:byte_i]
        + bytes([good[byte_i] | (0x80 >> bit_i)])
        + good[byte_i + 1 :]
    )
    with pytest.raises(NotImplementedError, match="randomized"):
        bz2_decompress(flipped)


def test_hostile_zero_run_bounded_before_allocation():
    """~40 RUNA symbols encode a bijective-base-2 zero run near 2^40
    (a terabyte request from a few dozen input bytes). The decoder
    must raise at the format's 100k·level block cap WHILE the run
    accumulates — before any allocation — instead of OOM-killing the
    executor (ADVICE r12)."""
    from data_warehouse_migration_spark.functions.bz2_stream import (
        _BLOCK_MAGIC,
        _EOS_MAGIC,
        _BitWriter,
        _canonical_codes,
    )

    syms = [0] * 40 + [2]  # 40 RUNA then EOB
    lengths = [1, 2, 2]
    codes = _canonical_codes(lengths)
    bw = _BitWriter()
    bw.write(0x425A68, 24)
    bw.write(0x31, 8)  # level 1 → cap 100_000
    bw.write(_BLOCK_MAGIC, 48)
    bw.write(0, 32)  # block CRC (never reached)
    bw.write(0, 1)  # not randomized
    bw.write(0, 24)  # origPtr
    bw.write(1 << 15, 16)  # MSB-first: group 0 used
    bw.write(1 << 10, 16)  # byte 0x05 used (one-symbol alphabet)
    bw.write(2, 3)  # nGroups
    bw.write(1, 15)  # one selector
    bw.write(0, 1)  # selector 0
    for _ in range(2):
        cur = lengths[0]
        bw.write(cur, 5)
        for ln in lengths:
            while cur < ln:
                bw.write(0b10, 2)
                cur += 1
            while cur > ln:
                bw.write(0b11, 2)
                cur -= 1
            bw.write(0, 1)
    for s in syms:
        bw.write(codes[s], lengths[s])
    bw.write(_EOS_MAGIC, 48)
    bw.write(0, 32)
    with pytest.raises(ValueError, match="cap"):
        bz2_decompress(bw.getvalue())


def test_legit_rle1_expansion_exceeds_cap_fine():
    """The cap guards the BWT block, not the RLE1-expanded output: a
    long zero run decodes to far more than 100k·level bytes and must
    still round-trip (the post-BWT expansion is intrinsically
    bounded)."""
    data = b"\x00" * 500_000
    blob = bz2_compress(data, level=1)
    assert bz2_decompress(blob) == data
    assert stdlib_bz2.decompress(blob) == data


def test_output_cap_binds_during_decode():
    """ADVICE r14: max_output threads into the RLE1 expansion, so a
    high-amplification stream raises before allocating past the cap
    (not after a full decode)."""
    raw = b"\x00" * (4 << 20)  # ~51x-amplifying all-runs input
    blob = stdlib_bz2.compress(raw)
    assert bz2_decompress(blob, max_output=len(raw)) == raw
    with pytest.raises(ValueError, match="caller's cap"):
        bz2_decompress(blob, max_output=len(raw) - 1)
    with pytest.raises(ValueError, match="caller's cap"):
        bz2_decompress(blob, max_output=1000)
    # multi-stream: the budget is cumulative across streams
    two = stdlib_bz2.compress(b"x" * 1000) + stdlib_bz2.compress(b"y" * 1000)
    assert bz2_decompress(two, max_output=2000) == b"x" * 1000 + b"y" * 1000
    with pytest.raises(ValueError, match="caller's cap"):
        bz2_decompress(two, max_output=1999)
