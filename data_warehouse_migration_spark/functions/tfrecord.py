"""TFRecord shards — the TensorFlow-world twin of the WebDataset tar
rung (functions/tar_stream): large training corpora ship as
``.tfrecord`` files of length-framed records, each guarded by two
masked CRC-32C checksums. A training-data engine that emits and
verifies them interoperates with the TF input pipeline ecosystem
without touching TensorFlow itself — the format is just framing:

    uint64le length | uint32le masked_crc32c(length bytes)
    | data | uint32le masked_crc32c(data)

with ``mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2³²)``
— the fingerprint-masking convention shared by all TFRecord readers.
CRC-32C is the Castagnoli polynomial (0x1EDC6F41, reflected), NOT the
zlib CRC — pinned against the published check value in tests.

Untrusted-input hygiene per the crawl-stack rule: lengths are
bounds-checked before any read, both CRCs are verified, malformed
framing raises ValueError (quarantine-routable). A configurable
per-record size cap stops a corrupt 8-byte length from provoking a
giant allocation.

Scale: shards are independent rows through Arrow-batched
``mapInPandas``, zero shuffle — the tar/gzip-member posture; records
within a shard are sequential by format design (TFRecord is not
internally splittable, which is WHY corpora ship as many shards —
exactly the layout operators/sharding.py produces).
"""

from __future__ import annotations

_CRC32C_TABLE: list[int] = []


def _table() -> list[int]:
    if not _CRC32C_TABLE:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            _CRC32C_TABLE.append(c)
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli, reflected) — check value
    crc32c(b'123456789') == 0xE3069283."""
    table = _table()
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ table[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def _unmask(masked: int) -> int:
    rot = (masked - _MASK_DELTA) & 0xFFFFFFFF
    return ((rot >> 17) | (rot << 15)) & 0xFFFFFFFF


def tfrecord_pack(records: list[bytes]) -> bytes:
    out = bytearray()
    for rec in records:
        header = len(rec).to_bytes(8, "little")
        out += header
        out += masked_crc(header).to_bytes(4, "little")
        out += rec
        out += masked_crc(rec).to_bytes(4, "little")
    return bytes(out)


def tfrecord_records(
    data: bytes, max_record_bytes: int = 1 << 30
) -> list[bytes]:
    """Walk a shard, verifying both masked CRCs per record."""
    out: list[bytes] = []
    pos, n = 0, len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("TFRecord header truncated")
        header = data[pos : pos + 8]
        length = int.from_bytes(header, "little")
        if length > max_record_bytes:
            raise ValueError(
                f"TFRecord length {length} exceeds the {max_record_bytes}"
                " cap — corrupt header or hostile input"
            )
        got = int.from_bytes(data[pos + 8 : pos + 12], "little")
        if got != masked_crc(header):
            raise ValueError(
                f"TFRecord length-CRC mismatch at offset {pos}"
                f" (crc32c {_unmask(got):08x})"
            )
        pos += 12
        if pos + length + 4 > n:
            raise ValueError("TFRecord data truncated")
        rec = bytes(data[pos : pos + length])
        got = int.from_bytes(data[pos + length : pos + length + 4], "little")
        if got != masked_crc(rec):
            raise ValueError(
                f"TFRecord data-CRC mismatch at offset {pos}"
            )
        out.append(rec)
        pos += length + 4
    return out
