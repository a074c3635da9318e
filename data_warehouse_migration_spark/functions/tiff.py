"""Baseline TIFF 6.0 — the scanned-document/archival-image rung of
the media ladder (crawl corpora carry TIFF from digitized books,
faxes, and GIS drops; the format also underlies the EXIF IFD grammar
functions/exif already parses inside JPEG).

Decode: both byte orders (II little-endian, MM big-endian), the IFD
entry grammar (12-byte entries, inline values ≤ 4 bytes vs offsets),
strip-organized raster data (StripOffsets/StripByteCounts/
RowsPerStrip), Compression 1 (none), 5 (LZW — the SAME table-driven
MSB-first EarlyChange variant as PDF's LZWDecode, reused from
functions/pdf), and 32773 (PackBits), horizontal-differencing
Predictor 2 for LZW, PhotometricInterpretation 0/1 (gray, WhiteIsZero
inverted per spec), 2 (RGB), 3 (palette via the 16-bit ColorMap),
8-bit samples, chunky planar layout.

Honestly absent (raises with the reason): tiled images, 1/4/16-bit
samples, PlanarConfiguration 2, JPEG-in-TIFF and the other exotic
compressions, BigTIFF. Untrusted-input hygiene matches the crawl
stack: counts/offsets are bounds-checked, malformed files raise
ValueError (which the quarantine lane routes) rather than over-read.

Encode (the gate's other half): gray/RGB/palette 8-bit writers with
Compression none/PackBits/LZW and either byte order — enough to
round-trip deterministic rasters so the DuckDB oracle can attest the
decoder by pixel-sum closed forms (media_tiff_decode), with real
multi-strip layouts (RowsPerStrip < height).

Scale shape: per-asset parallel mapInPandas like every codec rung —
strips decode sequentially within an image by format design, assets
are the parallelism unit.
"""

from __future__ import annotations

import struct

import numpy as np

from data_warehouse_migration_spark.functions.pdf import lzw_decode

# --- PackBits (TIFF §9) ------------------------------------------------------


def packbits_decode(data: bytes, expected: int | None = None) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h == 128:  # noop
            continue
        if h < 128:  # literal run of h+1 bytes
            if i + h + 1 > n:
                raise ValueError("PackBits literal run truncated")
            out += data[i : i + h + 1]
            i += h + 1
        else:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("PackBits repeat missing its byte")
            out += bytes([data[i]]) * (257 - h)
            i += 1
    if expected is not None and len(out) != expected:
        raise ValueError(
            f"PackBits decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (j + 1 < n and data[j] == data[j + 1])
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


# --- TIFF LZW encoder (decoder shared with PDF's LZWDecode) ------------------


def tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF/PDF-variant LZW: MSB-first 9→12-bit codes, Clear=256 first
    and on table overflow, EOD=257 last, EarlyChange width bumps (the
    width grows when the NEXT code could overflow — one entry early)."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(256, width)
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = nxt
        nxt += 1
        # EarlyChange width schedule, phased to the DECODER's table:
        # the decoder learns each new entry one code later than the
        # encoder assigns it, so its early-bump (len+1 >= 2^w) fires
        # when the encoder's next free code reaches 2^w exactly.
        if nxt >= (1 << width):
            if width < 12:
                width += 1
            else:
                emit(256, width)
                table = {bytes([i]): i for i in range(256)}
                nxt, width = 258, 9
        prev = bytes([byte])
    if prev:
        emit(table[prev], width)
        # the DECODER adds its lagged entry for this final code and
        # runs the width check before reading EOD — mirror it, else
        # EOD is written one bit narrower than it is read whenever
        # the table boundary lands exactly on the last data code
        nxt += 1
        if nxt >= (1 << width) and width < 12:
            width += 1
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- IFD grammar -------------------------------------------------------------

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(data: bytes, off: int, e: str) -> tuple[dict[int, list[int]], int]:
    if off + 2 > len(data):
        raise ValueError("TIFF IFD offset beyond file")
    (count,) = struct.unpack_from(e + "H", data, off)
    entries: dict[int, list[int]] = {}
    pos = off + 2
    if pos + 12 * count + 4 > len(data):
        raise ValueError("TIFF IFD truncated")
    for _ in range(count):
        tag, typ, n = struct.unpack_from(e + "HHI", data, pos)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            pos += 12
            continue  # unknown types are skippable by spec
        total = size * n
        if total <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(e + "I", data, pos + 8)
            if voff + total > len(data):
                raise ValueError(f"TIFF tag {tag} value beyond file")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I", 5: "I"}[typ]
        cnt = n * (2 if typ == 5 else 1)
        vals = list(struct.unpack_from(e + fmt * cnt, data, voff))
        entries[tag] = vals
        pos += 12
    (nxt,) = struct.unpack_from(e + "I", data, pos)
    return entries, nxt


def decode_tiff(data: bytes) -> np.ndarray:
    """First IFD → HxW (gray) or HxWx3 (RGB/palette) uint8 raster."""
    if data[:4] in (b"II\x2a\x00",):
        e = "<"
    elif data[:4] in (b"MM\x00\x2a",):
        e = ">"
    elif data[:2] in (b"II", b"MM") and len(data) >= 4:
        magic = struct.unpack_from(
            ("<" if data[:2] == b"II" else ">") + "H", data, 2
        )[0]
        if magic == 43:
            raise NotImplementedError("BigTIFF (magic 43) is not decoded")
        raise ValueError(f"not a TIFF: magic {magic}")
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)
    tags, _ = _read_ifd(data, ifd_off, e)

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF is not decoded (strips only)")
    width, height = one(256), one(257)
    if width <= 0 or height <= 0 or width * height > 100_000_000:
        raise ValueError(f"unreasonable TIFF dimensions {width}x{height}")
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"only 8-bit samples decode, got {bits}")
    if one(284, 1) != 1:
        raise NotImplementedError("PlanarConfiguration 2 is not decoded")
    comp = one(259, 1)
    photo = one(262)
    rows_per_strip = one(278, height)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip tables missing or inconsistent")
    expected_strips = (height + rows_per_strip - 1) // rows_per_strip
    if len(offsets) != expected_strips:
        raise ValueError(
            f"TIFF has {len(offsets)} strips, geometry implies "
            f"{expected_strips}"
        )

    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} is not decoded (1/2 only)"
        )

    row_bytes = width * spp
    raster = bytearray()
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError(f"TIFF strip {s} beyond file")
        strip = bytes(data[off : off + cnt])
        nrows = min(rows_per_strip, height - s * rows_per_strip)
        want = nrows * row_bytes
        if comp == 1:
            if len(strip) < want:
                raise ValueError(f"TIFF strip {s} short: {len(strip)}/{want}")
            raw = strip[:want]
        elif comp == 5:
            raw = lzw_decode(strip)
            if len(raw) < want:
                raise ValueError(f"TIFF LZW strip {s} short")
            raw = raw[:want]
        elif comp == 32773:
            raw = packbits_decode(strip, expected=want)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} is not decoded (1/5/32773 only)"
            )
        # TIFF 6.0 defines the predictor over the post-decompression
        # bytes for ANY compression, not just LZW — a PackBits or
        # uncompressed file with Predictor=2 is valid and must be
        # un-differenced too (ADVICE r12).
        if predictor == 2:
            arr = np.frombuffer(raw, dtype=np.uint8).reshape(
                nrows, width, spp
            )
            raw = np.cumsum(arr.astype(np.uint32), axis=1).astype(
                np.uint8
            ).tobytes()
        raster += raw

    arr = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(
        height, width, spp
    )
    if photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("palette TIFF without a 256-entry ColorMap")
        pal = (
            np.array(cmap, dtype=np.uint16).reshape(3, 256).T >> 8
        ).astype(np.uint8)
        return pal[arr[:, :, 0]]
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with fewer than 3 samples")
        return arr[:, :, :3]
    if photo in (0, 1):
        gray = arr[:, :, 0]
        return (255 - gray) if photo == 0 else gray.copy()
    raise NotImplementedError(f"TIFF photometric {photo} is not decoded")


# --- writer (gate + interop side) --------------------------------------------


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    palette: np.ndarray | None = None,
    white_is_zero: bool = False,
) -> bytes:
    """Write a baseline strip-organized TIFF: gray HxW, RGB HxWx3, or
    palette HxW indices + ``palette`` (256x3 uint8). Compression
    ``none`` / ``packbits`` / ``lzw`` (with Predictor 2 deliberately
    NOT emitted — the decoder's predictor path is pinned against a
    hand-built file in tests)."""
    if img.dtype != np.uint8:
        raise ValueError("encode_tiff takes uint8 samples")
    if palette is not None:
        if img.ndim != 2:
            raise ValueError("palette image must be HxW indices")
        if palette.shape != (256, 3):
            raise ValueError("palette must be 256x3")
        photo, spp = 3, 1
    elif img.ndim == 2:
        photo, spp = (0 if white_is_zero else 1), 1
    elif img.ndim == 3 and img.shape[2] == 3:
        photo, spp = 2, 3
    else:
        raise ValueError(f"bad image shape {img.shape}")
    h, w = img.shape[0], img.shape[1]
    rps = rows_per_strip or h
    e = ">" if big_endian else "<"

    data = (255 - img) if photo == 0 else img
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        raw = data[y0 : y0 + rps].tobytes()
        if compression == "none":
            strips.append(raw)
        elif compression == "packbits":
            strips.append(packbits_encode(raw))
        elif compression == "lzw":
            strips.append(tiff_lzw_encode(raw))
        else:
            raise ValueError(f"unknown compression {compression!r}")
    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5}[compression]

    # layout: header(8) | IFD | [long values] | strips
    entries: list[tuple[int, int, int, list[int]]] = []  # tag,typ,count,vals
    entries.append((256, 4, 1, [w]))
    entries.append((257, 4, 1, [h]))
    entries.append((258, 3, spp, [8] * spp))
    entries.append((259, 3, 1, [comp_tag]))
    entries.append((262, 3, 1, [photo]))
    n_strips = len(strips)
    entries.append((273, 4, n_strips, [0] * n_strips))  # patched below
    entries.append((277, 3, 1, [spp]))
    entries.append((278, 4, 1, [rps]))
    entries.append((279, 4, n_strips, [len(s) for s in strips]))
    if palette is not None:
        cmap = np.zeros((3, 256), dtype=np.uint16)
        cmap[:, :] = palette.T.astype(np.uint16) << 8 | palette.T
        entries.append((320, 3, 3 * 256, [int(v) for v in cmap.reshape(-1)]))
    entries.sort(key=lambda t: t[0])

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    tail_off = ifd_off + ifd_size  # long values land here

    tail = bytearray()
    fixed: list[bytes] = []
    strip_off_patch: int | None = None
    for tag, typ, count, vals in entries:
        size = _TYPE_SIZES[typ] * count
        fmt = {3: "H", 4: "I"}[typ]
        if size <= 4:
            packed = struct.pack(e + fmt * count, *vals)
            packed += b"\x00" * (4 - len(packed))
            fixed.append(struct.pack(e + "HHI", tag, typ, count) + packed)
        else:
            voff = tail_off + len(tail)
            if tag == 273:
                strip_off_patch = len(tail)
            tail += struct.pack(e + fmt * count, *vals)
            fixed.append(
                struct.pack(e + "HHI", tag, typ, count)
                + struct.pack(e + "I", voff)
            )

    data_off = tail_off + len(tail)
    offs = []
    cur = data_off
    for s in strips:
        offs.append(cur)
        cur += len(s)
    if n_strips == 1:
        # inline StripOffsets value — rewrite the fixed entry
        for i, (tag, typ, count, vals) in enumerate(entries):
            if tag == 273:
                fixed[i] = (
                    struct.pack(e + "HHI", 273, 4, 1)
                    + struct.pack(e + "I", offs[0])
                )
    else:
        assert strip_off_patch is not None
        tail[strip_off_patch : strip_off_patch + 4 * n_strips] = struct.pack(
            e + "I" * n_strips, *offs
        )

    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", len(entries))
    for f in fixed:
        out += f
    out += struct.pack(e + "I", 0)  # no next IFD
    out += tail
    for s in strips:
        out += s
    return bytes(out)
