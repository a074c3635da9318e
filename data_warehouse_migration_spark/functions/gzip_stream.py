"""gzip (RFC 1952) member framing, from scratch — the wrapper every
web crawl archive actually ships: Common Crawl WARC files are
CONCATENATED gzip members, one per record, so readers can seek to a
record and decompress it alone. The deflate body reuses the engine's
attested RFC 1951 inflate/deflate (functions/png — pinned against
``zlib`` both directions), and this module adds the RFC 1952 layer:
magic, header flags (FEXTRA/FNAME/FCOMMENT/FHCRC — all parsed, the
reserved bits rejected per §2.3.1), CRC-32 + ISIZE trailer
verification, and the multi-member walk §2.2 requires.

The reference warehouse has no compression surface at all — this is
north-star (training-data crawl ingest) territory, sitting under
functions/warc the way RFC 1951 sits under the PNG rung.

Scale posture: pure per-asset byte code run inside Arrow-batched
``mapInPandas`` harnesses; zero shuffle, zero driver involvement.
"""

from __future__ import annotations

import struct

from data_warehouse_migration_spark.functions.png import (
    crc32,
    inflate_member,
    zlib_compress,
)

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def gzip_compress(
    raw: bytes,
    method: str = "dynamic",
    fname: str | None = None,
    mtime: int = 0,
) -> bytes:
    """One gzip member around the engine's own deflate (``method`` ∈
    stored/fixed/dynamic — the three RFC 1951 block strategies). The
    header is deterministic (MTIME defaults to 0, XFL 0, OS 255 =
    unknown) so equal input bytes give equal member bytes."""
    flg = _FNAME if fname is not None else 0
    head = b"\x1f\x8b\x08" + bytes([flg]) + struct.pack("<I", mtime) + b"\x00\xff"
    if fname is not None:
        head += fname.encode("latin-1") + b"\x00"
    # zlib_compress = 2-byte CMF/FLG + deflate body + 4-byte Adler;
    # gzip wants the bare deflate body with its own trailer.
    body = zlib_compress(raw, method=method)[2:-4]
    trailer = struct.pack("<II", crc32(raw), len(raw) & 0xFFFFFFFF)
    return head + body + trailer


def gzip_decompress_member(data: bytes, offset: int = 0) -> tuple[bytes, int]:
    """Decode ONE member starting at ``offset``; return (raw bytes,
    offset just past the member's trailer). Header fields are walked
    per §2.3; CRC-32 and ISIZE are verified; reserved FLG bits and
    non-deflate CM raise rather than guess."""
    n = len(data)
    if offset + 10 > n:
        raise ValueError("gzip header truncated")
    if data[offset : offset + 2] != b"\x1f\x8b":
        raise ValueError("bad gzip magic")
    if data[offset + 2] != 8:
        raise ValueError(f"gzip CM {data[offset + 2]} is not deflate")
    flg = data[offset + 3]
    if flg & 0xE0:
        raise ValueError("reserved gzip FLG bits set")
    pos = offset + 10
    if flg & _FEXTRA:
        if pos + 2 > n:
            raise ValueError("FEXTRA length truncated")
        xlen = struct.unpack_from("<H", data, pos)[0]
        pos += 2 + xlen
    if flg & _FNAME:
        end = data.index(b"\x00", pos)
        pos = end + 1
    if flg & _FCOMMENT:
        end = data.index(b"\x00", pos)
        pos = end + 1
    if flg & _FHCRC:
        if pos + 2 > n:
            raise ValueError("FHCRC truncated")
        expect = struct.unpack_from("<H", data, pos)[0]
        if crc32(data[offset:pos]) & 0xFFFF != expect:
            raise ValueError("gzip header CRC16 mismatch")
        pos += 2
    raw, pos = inflate_member(data, pos)
    if pos + 8 > n:
        raise ValueError("gzip trailer truncated")
    crc_expect, isize = struct.unpack_from("<II", data, pos)
    if crc32(raw) != crc_expect:
        raise ValueError("gzip CRC-32 mismatch")
    if len(raw) & 0xFFFFFFFF != isize:
        raise ValueError("gzip ISIZE mismatch")
    return raw, pos + 8


def gzip_members(data: bytes) -> list[bytes]:
    """Walk a CONCATENATED-member stream (§2.2 — the WARC layout):
    one decoded payload per member, trailing garbage rejected."""
    out: list[bytes] = []
    pos = 0
    while pos < len(data):
        raw, pos = gzip_decompress_member(data, pos)
        out.append(raw)
    return out


def gzip_decompress(data: bytes) -> bytes:
    """All members' payloads concatenated — ``gzip -d`` semantics on
    a multi-member file."""
    return b"".join(gzip_members(data))
