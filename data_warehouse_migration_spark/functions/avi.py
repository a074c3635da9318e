"""AVI/MJPEG (RIFF), from scratch — the VIDEO rung of the multimodal
surface: a real container format whose frames are real JPEGs, so the
briefed frame-sample operation (decode → sample every Nth frame →
feature-extract) runs end to end on actual video bytes instead of a
synthetic plan.

Implemented from the public RIFF/AVI layout (the OpenDML/VfW
structures, all little-endian) alone:

- RIFF grammar: fourcc + 32-bit size + data + even-byte padding,
  ``LIST`` chunks with a subtype and nested children — one recursive
  walk covers the whole container;
- ``avih`` (AVIMAINHEADER): µs-per-frame, total frames, stream
  count, width/height;
- ``strl``/``strh``/``strf``: the video stream header (``vids`` /
  ``MJPG``), rate/scale (fps as a rational), and the
  BITMAPINFOHEADER with ``biCompression = 'MJPG'``;
- ``movi``: the frame payloads as ``00dc`` (compressed video)
  chunks, each a complete baseline-or-progressive JFIF stream our
  own JPEG codec decodes;
- ``idx1``: the legacy index (offset/size per frame), written by the
  encoder and VERIFIED against the actual chunk layout by the
  parser when present.

MJPEG is exactly "a JPEG per frame" — no inter-frame prediction —
which makes it the honest first video codec for a from-scratch
ladder: container parsing is real, frame extraction is real, and the
pixel work reuses the attested ``functions/jpeg`` rung (including
the progressive SOF2 path). Inter-frame codecs (H.264 etc.) are out
of scope and raise loudly in the feature extractor.

Scale posture: a video asset is ONE row (binary payload + typed
metadata); frame extraction is a pure byte walk and decoding is
per-frame independent, so the natural 100 TB shape keeps assets as
the parallelism unit and fans frames out WITHIN the Arrow batch —
no shuffle anywhere. The sampling plan itself (which timestamps to
keep) stays JVM-side as Column expressions (``frame_sample_plan`` in
operators/multimodal.py); only pixel work pays the Python tax.

Reference parity note: the reference warehouse
(justinarndt/data-warehouse-migration) has no media surface at all —
north-star territory, like the image/audio rungs.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    assert len(fourcc) == 4
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(subtype: bytes, children: bytes) -> bytes:
    return _chunk(b"LIST", subtype + children)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Write a complete AVI container around already-encoded JPEG
    frames: hdrl (avih + one vids/MJPG strl), movi (one ``00dc``
    chunk per frame), and a correct idx1 index."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    n = len(frames)
    max_size = max(len(f) for f in frames)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,       # dwMicroSecPerFrame
        max_size * fps,         # dwMaxBytesPerSec (advisory)
        0,                      # dwPaddingGranularity
        0x10,                   # dwFlags: AVIF_HASINDEX
        n,                      # dwTotalFrames
        0,                      # dwInitialFrames
        1,                      # dwStreams
        max_size,               # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,             # dwReserved[4]
    )

    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG",
        0,                      # dwFlags
        0, 0,                   # wPriority, wLanguage
        0,                      # dwInitialFrames
        1, fps,                 # dwScale / dwRate → fps
        0, n, max_size,         # dwStart, dwLength (frames), buffer size
        0xFFFFFFFF, 0,          # dwQuality, dwSampleSize (0 = varying)
        0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
    )
    # BITMAPINFOHEADER: MJPG compression
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_children = b""
    idx_entries = []
    for f in frames:
        # idx1 offsets are from the start of the 'movi' fourcc
        idx_entries.append((4 + len(movi_children), len(f)))
        movi_children += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_children)

    idx1 = b"".join(
        struct.pack("<4sIII", b"00dc", 0x10, off, size)  # AVIIF_KEYFRAME
        for off, size in idx_entries
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in
    [pos, end), honoring the even-byte padding rule."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError(f"truncated chunk {fourcc!r}")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def parse_avi(payload: bytes) -> dict:
    """Parse an AVI container → ``{width, height, fps, n_frames,
    frames: [jpeg_bytes, ...]}``. Verifies the RIFF form, requires a
    ``vids`` stream (MJPG or raw DIB fourccs both surface; the
    CALLER decides what it can decode), extracts every ``##dc``/
    ``##db`` chunk in ``movi`` order, and — when an ``idx1`` is
    present — cross-checks each index entry against the real chunk
    offsets and sizes."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    total = struct.unpack_from("<I", payload, 4)[0]
    end = min(len(payload), 8 + total)

    width = height = None
    fps = None
    n_declared = None
    handler = None
    frames: list[bytes] = []
    frame_locs: list[tuple[int, int]] = []
    movi_start = None
    idx1: bytes | None = None

    def walk(pos: int, stop: int) -> None:
        nonlocal width, height, fps, n_declared, handler, movi_start, idx1
        for fourcc, body, size in _walk_chunks(payload, pos, stop):
            if fourcc == b"LIST":
                subtype = payload[body : body + 4]
                if subtype == b"movi":
                    movi_start = body
                    for fc, b2, s2 in _walk_chunks(payload, body + 4, body + size):
                        if len(fc) == 4 and fc[2:4] in (b"dc", b"db"):
                            frames.append(payload[b2 : b2 + s2])
                            frame_locs.append((b2 - 8 - movi_start, s2))
                else:
                    walk(body + 4, body + size)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<14I", payload, body)
                if vals[0]:
                    fps = round(1_000_000 / vals[0])
                n_declared = vals[4]
                width, height = vals[8], vals[9]
            elif fourcc == b"strh":
                stype, shandler = struct.unpack_from("<4s4s", payload, body)
                if stype == b"vids":
                    handler = shandler
                    scale, rate = struct.unpack_from("<II", payload, body + 20)
                    if scale:
                        fps = round(rate / scale)
            elif fourcc == b"idx1":
                idx1 = payload[body : body + size]

    walk(12, end)
    if width is None or height is None:
        raise ValueError("AVI has no avih main header")
    if handler is None:
        raise ValueError("AVI has no vids stream")
    if n_declared is not None and n_declared != len(frames):
        raise ValueError(
            f"avih declares {n_declared} frames, movi carries {len(frames)}"
        )
    if idx1 is not None:
        if len(idx1) != 16 * len(frames):
            raise ValueError("idx1 entry count does not match movi")
        for i, (off, size) in enumerate(frame_locs):
            fcc, _flags, ioff, isize = struct.unpack_from("<4sIII", idx1, 16 * i)
            if fcc[2:4] not in (b"dc", b"db") or (ioff, isize) != (off, size):
                raise ValueError(f"idx1 entry {i} disagrees with movi layout")
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "n_frames": len(frames),
        "frames": frames,
        "handler": handler,
    }


def sample_frames(payload: bytes, every_n: int = 2) -> tuple[dict, list[bytes]]:
    """Frame-sample an MJPEG AVI: parse once, keep frames 0, n, 2n…
    Returns (container metadata, sampled JPEG payloads). Raises for
    non-MJPEG handlers — inter-frame codecs can't be frame-sampled by
    byte slicing, and pretending otherwise would be a silent wrong
    answer."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    meta = parse_avi(payload)
    if meta["handler"] not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"frame sampling implemented for MJPEG only, got "
            f"{meta['handler']!r}"
        )
    return meta, meta["frames"][::every_n]
