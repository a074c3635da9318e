"""TFRecord framing (functions/tfrecord): CRC-32C against published
check values, the masking convention, round-trips, and the corruption
raise surface."""

from __future__ import annotations

import pytest

from data_warehouse_migration_spark.functions.tfrecord import (
    crc32c,
    masked_crc,
    tfrecord_pack,
    tfrecord_records,
)


def test_crc32c_published_vectors():
    # the Castagnoli check value + the all-zeros/all-ones classics
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    import zlib

    assert crc32c(b"123456789") != zlib.crc32(b"123456789")


def test_mask_convention():
    # mask is the documented rotate+delta; unmasking recovers the crc
    from data_warehouse_migration_spark.functions.tfrecord import _unmask

    for payload in (b"", b"x", b"record bytes"):
        assert _unmask(masked_crc(payload)) == crc32c(payload)


def test_roundtrip():
    recs = [b"", b"a", b"hello world" * 10, bytes(range(256))]
    blob = tfrecord_pack(recs)
    assert tfrecord_records(blob) == recs
    # framing arithmetic: 16 bytes overhead per record
    assert len(blob) == sum(16 + len(r) for r in recs)


def test_corruption_raises():
    blob = bytearray(tfrecord_pack([b"some record", b"another"]))
    flip_data = bytes(blob[:14]) + bytes([blob[14] ^ 0xFF]) + bytes(blob[15:])
    with pytest.raises(ValueError, match="data-CRC"):
        tfrecord_records(flip_data)
    flip_len = bytes([blob[0] ^ 0x01]) + bytes(blob[1:])
    with pytest.raises(ValueError, match="length-CRC"):
        tfrecord_records(flip_len)
    with pytest.raises(ValueError, match="truncated"):
        tfrecord_records(bytes(blob[:-2]))
    # hostile length: huge uint64 with a VALID length-CRC must hit the
    # cap, not attempt the allocation
    from data_warehouse_migration_spark.functions.tfrecord import masked_crc

    header = (1 << 62).to_bytes(8, "little")
    hostile = header + masked_crc(header).to_bytes(4, "little")
    with pytest.raises(ValueError, match="cap"):
        tfrecord_records(hostile)
