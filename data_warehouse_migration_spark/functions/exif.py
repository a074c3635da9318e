"""EXIF orientation (TIFF tag 274 inside a JPEG APP1 segment), from
scratch — the metadata step a real image pipeline runs before any
pixel work: phone cameras store the sensor raster unrotated and
record how to display it, so a crawl corpus decoded without EXIF
handling feeds models sideways images. The reference warehouse has
no media surface — north-star territory, next to the JPEG rung.

Implemented from the public TIFF 6.0 / EXIF layouts alone:

- JPEG marker walk to APP1 (skipping other segments by length, same
  grammar as the codec), ``Exif\\0\\0`` preamble;
- TIFF header: ``II`` (little-endian) / ``MM`` (big-endian) byte
  order — both supported and both exercised by the gate — magic 42,
  IFD0 offset;
- IFD walk: 12-byte entries (tag, type, count, value-or-offset),
  tag 0x0112 SHORT orientation; inline values honor the byte order
  and the left-justified-in-4-bytes rule for short payloads;
- the writer emits a minimal-but-valid APP1 (one-entry IFD0, no
  next IFD) so the parser is pinned against both directions plus
  hand-built segments;
- ``apply_orientation``: the eight TIFF dispositions as numpy views
  (flips, rotations, transposes) — orientations 5-8 swap the
  displayed dimensions.

Scale posture: a pure per-asset byte walk inside the same
Arrow-batched seam as the codecs; zero shuffle.
"""

from __future__ import annotations

import struct

import numpy as np


def build_exif_app1(orientation: int, little_endian: bool = True) -> bytes:
    """A minimal valid EXIF APP1 payload: TIFF header + a one-entry
    IFD0 carrying orientation (SHORT, count 1)."""
    if not 1 <= orientation <= 8:
        raise ValueError("orientation must be 1-8")
    e = "<" if little_endian else ">"
    tiff = (
        (b"II" if little_endian else b"MM")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", 8)          # IFD0 right after the header
        + struct.pack(e + "H", 1)          # one entry
        + struct.pack(e + "HHI", 0x0112, 3, 1)  # tag, SHORT, count
        + struct.pack(e + "H", orientation) + b"\x00\x00"  # left-justified
        + struct.pack(e + "I", 0)          # no next IFD
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def parse_exif_orientation(jpeg: bytes) -> int | None:
    """Walk the JPEG markers to APP1/Exif and return the orientation
    tag (1-8), or None when absent. Both TIFF byte orders; malformed
    EXIF raises rather than guessing."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            return None  # into entropy data — no APP1 seen
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: metadata segments are over
            return None
        seg_len = struct.unpack(">H", jpeg[pos + 2 : pos + 4])[0]
        body = jpeg[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            if tiff[:2] == b"II":
                e = "<"
            elif tiff[:2] == b"MM":
                e = ">"
            else:
                raise ValueError("EXIF TIFF header has no byte order")
            if struct.unpack(e + "H", tiff[2:4])[0] != 42:
                raise ValueError("EXIF TIFF magic is not 42")
            ifd = struct.unpack(e + "I", tiff[4:8])[0]
            count = struct.unpack(e + "H", tiff[ifd : ifd + 2])[0]
            for k in range(count):
                at = ifd + 2 + 12 * k
                tag, typ, cnt = struct.unpack(e + "HHI", tiff[at : at + 8])
                if tag == 0x0112:
                    if typ != 3 or cnt != 1:
                        raise ValueError("orientation tag is not SHORT[1]")
                    val = struct.unpack(e + "H", tiff[at + 8 : at + 10])[0]
                    if not 1 <= val <= 8:
                        raise ValueError(f"orientation {val} out of range")
                    return val
            return None
        pos += 2 + seg_len
    return None


def apply_orientation(px: np.ndarray, orientation: int | None) -> np.ndarray:
    """The eight TIFF dispositions → the upright raster (the
    ImageOps.exif_transpose mapping). 5-8 swap height/width."""
    if orientation in (None, 1):
        return px
    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1, :]
    if orientation == 5:  # transpose
        return np.swapaxes(px, 0, 1)
    if orientation == 6:  # stored rotated 90° CCW → display = rotate CW
        return np.swapaxes(px, 0, 1)[:, ::-1]
    if orientation == 7:  # transverse
        return np.swapaxes(px, 0, 1)[::-1, ::-1]
    if orientation == 8:  # stored rotated 90° CW → display = rotate CCW
        return np.swapaxes(px, 0, 1)[::-1, :]
    raise ValueError(f"orientation {orientation} out of range")
