"""EXIF orientation pins (functions/exif — r11, TIFF 6.0 tag 274
inside a JPEG APP1 segment). The eight dispositions are pinned
against HAND-ROTATED matrices — the gate's pixel-sum oracle is
permutation-invariant, so sums alone cannot see a wrong flip; these
per-pixel pins are what isolate each disposition. The parser is
pinned against hand-built TIFF blobs in both byte orders, including
the left-justified-SHORT rule that trips naive readers on MM files.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_warehouse_migration_spark.functions.exif import (
    apply_orientation,
    build_exif_app1,
    insert_app1,
    parse_exif_orientation,
)

# A 2×3 asymmetric probe: every disposition produces a distinct
# matrix, so a wrong branch cannot alias to a right one.
M = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)


def test_dispositions_hand_rotated():
    # TIFF 6.0 orientation semantics → the upright (display) raster,
    # each expected matrix written out by hand.
    expect = {
        1: [[1, 2, 3], [4, 5, 6]],          # as stored
        2: [[3, 2, 1], [6, 5, 4]],          # mirror horizontal
        3: [[6, 5, 4], [3, 2, 1]],          # rotate 180
        4: [[4, 5, 6], [1, 2, 3]],          # mirror vertical
        5: [[1, 4], [2, 5], [3, 6]],        # transpose
        6: [[4, 1], [5, 2], [6, 3]],        # rotate 90 CW to display
        7: [[6, 3], [5, 2], [4, 1]],        # transverse
        8: [[3, 6], [2, 5], [1, 4]],        # rotate 90 CCW to display
    }
    for o, want in expect.items():
        got = apply_orientation(M, o)
        assert got.tolist() == want, f"orientation {o}"
    # pixel multiset is invariant (the gate's sum oracle rests on this)
    for o in range(1, 9):
        assert sorted(apply_orientation(M, o).ravel().tolist()) == [
            1, 2, 3, 4, 5, 6,
        ]
    # 5-8 swap the displayed dimensions; 1-4 keep them
    for o in range(1, 9):
        h, w = apply_orientation(M, o).shape
        assert (h, w) == ((3, 2) if o >= 5 else (2, 3))


def test_disposition_identity_and_range():
    assert apply_orientation(M, None) is M
    assert apply_orientation(M, 1) is M
    with pytest.raises(ValueError):
        apply_orientation(M, 9)
    with pytest.raises(ValueError):
        apply_orientation(M, 0)


def test_rotations_compose_to_identity():
    # 6 then 8 = CW then CCW = identity; 3 twice = identity
    assert apply_orientation(apply_orientation(M, 6), 8).tolist() == M.tolist()
    assert apply_orientation(apply_orientation(M, 3), 3).tolist() == M.tolist()


@pytest.mark.parametrize("little_endian", [True, False])
@pytest.mark.parametrize("orientation", range(1, 9))
def test_build_parse_roundtrip(orientation, little_endian):
    jpeg = b"\xff\xd8" + b"\xff\xd9"
    tagged = insert_app1(jpeg, build_exif_app1(orientation, little_endian))
    assert parse_exif_orientation(tagged) == orientation


def test_builder_rejects_out_of_range():
    with pytest.raises(ValueError):
        build_exif_app1(0)
    with pytest.raises(ValueError):
        build_exif_app1(9)


def test_insert_requires_soi():
    with pytest.raises(ValueError):
        insert_app1(b"\x00\x01", build_exif_app1(1))


def test_parse_no_app1_returns_none():
    assert parse_exif_orientation(b"\xff\xd8\xff\xd9") is None


def test_parse_walks_past_other_segments():
    # APP0/JFIF before APP1 — the layout every camera emits
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    jpeg = b"\xff\xd8" + app0 + build_exif_app1(6) + b"\xff\xd9"
    assert parse_exif_orientation(jpeg) == 6


def test_parse_stops_at_sos():
    # SOS before any APP1: metadata is over, entropy data may contain
    # 0xFFE1-looking byte pairs that must not be parsed as markers.
    sos = b"\xff\xda" + struct.pack(">H", 3) + b"\x00"
    jpeg = b"\xff\xd8" + sos + build_exif_app1(3) + b"\xff\xd9"
    assert parse_exif_orientation(jpeg) is None


def test_parse_non_exif_app1_ignored():
    # XMP also lives in APP1 — a non-Exif preamble must be skipped
    xmp = b"\xff\xe1" + struct.pack(">H", 12) + b"http://ns..."[:10]
    jpeg = b"\xff\xd8" + xmp + build_exif_app1(7) + b"\xff\xd9"
    assert parse_exif_orientation(jpeg) == 7


def test_parse_multi_entry_ifd_big_endian():
    # Hand-built MM TIFF: two entries, orientation SECOND, its SHORT
    # value left-justified in the 4-byte field (the MM-specific trap:
    # the value lives in bytes [8:10] of the entry, not [10:12]).
    e = ">"
    entries = (
        struct.pack(e + "HHI", 0x0100, 3, 1) + struct.pack(e + "H", 640) + b"\x00\x00"
        + struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(e + "H", 5) + b"\x00\x00"
    )
    tiff = b"MM" + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
    tiff += struct.pack(e + "H", 2) + entries + struct.pack(e + "I", 0)
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert parse_exif_orientation(b"\xff\xd8" + app1 + b"\xff\xd9") == 5


def test_parse_orientation_absent_from_ifd():
    # Valid EXIF whose IFD0 has no tag 0x0112
    e = "<"
    tiff = (
        b"II" + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
        + struct.pack(e + "H", 1)
        + struct.pack(e + "HHI", 0x0100, 3, 1) + struct.pack(e + "H", 640)
        + b"\x00\x00" + struct.pack(e + "I", 0)
    )
    body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert parse_exif_orientation(b"\xff\xd8" + app1 + b"\xff\xd9") is None


def test_parse_malformed_raises():
    def app1_of(tiff: bytes) -> bytes:
        body = b"Exif\x00\x00" + tiff
        return (
            b"\xff\xd8" + b"\xff\xe1" + struct.pack(">H", len(body) + 2)
            + body + b"\xff\xd9"
        )

    with pytest.raises(ValueError):  # bad byte-order mark
        parse_exif_orientation(app1_of(b"XX" + b"\x00" * 10))
    with pytest.raises(ValueError):  # magic is not 42
        parse_exif_orientation(app1_of(b"II" + struct.pack("<H", 43) + b"\x00" * 8))
    bad_val = (
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<H", 9) + b"\x00\x00"
        + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):  # orientation out of range
        parse_exif_orientation(app1_of(bad_val))
    bad_type = (
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 0x0112, 4, 1) + struct.pack("<I", 6)
        + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):  # LONG where SHORT is required
        parse_exif_orientation(app1_of(bad_type))
    with pytest.raises(ValueError):  # not a JPEG at all
        parse_exif_orientation(b"\x89PNG")


def test_end_to_end_decode_survives_app1():
    # The codec's marker walk must skip APP1; decode is bit-exact on
    # even DC-only tiles, and the upright raster matches the by-hand
    # rotation of the decoded one.
    from data_warehouse_migration_spark.functions.jpeg import (
        decode_jpeg_auto,
        encode_jpeg_gray,
    )

    img = np.zeros((24, 16), dtype=np.uint8)
    img[:8, :8] = 100
    img[8:16, 8:] = 200
    for orientation in (1, 3, 6):
        tagged = insert_app1(
            encode_jpeg_gray(img), build_exif_app1(orientation)
        )
        decoded = decode_jpeg_auto(tagged)
        assert decoded.tolist() == img.tolist()
        upright = apply_orientation(decoded, parse_exif_orientation(tagged))
        want = apply_orientation(img, orientation)
        assert upright.tolist() == want.tolist()
