"""Baseline GIF (87a/89a), from scratch — the third rung of the
in-container codec ladder after JPEG (r9) and PNG (r10): a REAL
variable-width LZW codec, the one compression family the other two
rungs don't cover (JPEG = Huffman over DCT, PNG = deflate).

Implemented from the public GIF89a specification alone:

- container: header, logical screen descriptor, global/local color
  tables, image descriptor, sub-block framing (255-byte chunks + 0
  terminator), extension blocks (skipped by sub-block structure, as
  the spec sanctions), trailer;
- LZW, both directions: variable code width starting at
  ``min_code_size + 1``, LSB-first bit packing (the PNG module's bit
  I/O is reused — deflate and GIF share the packing convention),
  CLEAR/END control codes, dictionary growth with the GIF width-bump
  convention (width increases when the next free code reaches
  ``2^width``), the deferred-clear 12-bit cap, and the
  ``code == next_free`` KwKwK special case on decode;
- interlaced images: the 4-pass row ordering, both directions.

Honest absences (raise with the reason): multi-frame/animation
streams (only a single image block), and GCE transparency is ignored
rather than composited (the palette color is returned — documented,
not guessed).

Scale posture: identical to the JPEG/PNG rungs — LZW is serial per
image by format design, so assets are the parallelism unit inside the
same Arrow-batched ``mapInPandas`` seam; a giflib swap-in changes
nothing about schema, batching, or plan shape.
"""

from __future__ import annotations

import numpy as np

from data_warehouse_migration_spark.functions.png import _BitReader, _BitWriter

GIF_MAX_CODE_WIDTH = 12


# --- LZW ---------------------------------------------------------------------


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW over palette indices → packed code bytes
    (without sub-block framing). Real dictionary-building encoder —
    emits CLEAR up front, resets at the 4096-entry cap, ends with END.

    Width discipline — the interop-critical part (a round-9-style
    review caught the self-consistent-but-wrong first cut): the
    DECODER adds one table entry per data code read EXCEPT the first
    after a clear, so its table size lags the encoder's dictionary —
    and flushes (the final pending-prefix emit) trigger a decoder add
    with NO encoder add, so width cannot be derived from the
    encoder's own ``next_code``. The encoder therefore models the
    decoder's table size (``dec_len``) explicitly: +1 per emitted
    data code after the first, widen when it reaches ``2^width``.
    Verified against the real-encoder GIFs shipped with CPython
    (tests/test_gif_codec.py::test_decodes_real_world_gifs) and a
    hand-derived bitstream."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    dec_len = clear + 2  # decoder table size right after a clear
    first_data = True

    def emit_data(code: int) -> None:
        nonlocal dec_len, first_data, width
        bw.write_bits_lsb(code, width)
        if first_data:
            first_data = False
        elif dec_len < (1 << GIF_MAX_CODE_WIDTH):
            dec_len += 1
        if dec_len == (1 << width) and width < GIF_MAX_CODE_WIDTH:
            width += 1

    def emit_clear() -> None:
        nonlocal table, next_code, dec_len, first_data, width
        bw.write_bits_lsb(clear, width)
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        dec_len = clear + 2
        first_data = True
        width = min_code_size + 1

    emit_clear()
    w = b""
    for px in indices:
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit_data(table[w])
        table[wk] = next_code
        next_code += 1
        w = bytes([px])
        if next_code == (1 << GIF_MAX_CODE_WIDTH):
            emit_clear()
    if w:
        emit_data(table[w])
    bw.write_bits_lsb(end, width)
    return bw.getvalue()


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`lzw_encode`, general within the GIF spec:
    handles streams from ANY conforming encoder (deferred clears,
    the KwKwK ``code == next_free`` case), not just our own."""
    clear = 1 << min_code_size
    end = clear + 1
    br = _BitReader(data)
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = br.read_bits(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < (1 << GIF_MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
        # Real-world convention (verified against the CPython-shipped
        # GIFs from real encoders): widen when the table size reaches
        # 2^width — the NEXT read would otherwise be unable to
        # reference the just-added entry.
        if len(table) == (1 << width) and width < GIF_MAX_CODE_WIDTH:
            width += 1
        prev = entry
    return bytes(out)


# --- sub-block framing -------------------------------------------------------


def _frame_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("sub-block stream truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


# --- interlacing -------------------------------------------------------------


def _interlace_order(height: int) -> list[int]:
    """Row indices in GIF 4-pass interlace transmission order."""
    return (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )


# --- container ---------------------------------------------------------------


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    local_table: bool = False,
) -> bytes:
    """Encode one image: ``indices`` (h, w) uint8 palette indices,
    ``palette`` (n, 3) uint8 RGB with n a power of two ≥ 2. The color
    table goes global by default or local with ``local_table``."""
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    n = palette.shape[0]
    if n < 2 or (n & (n - 1)) != 0:
        raise ValueError("palette size must be a power of two >= 2")
    if int(indices.max(initial=0)) >= n:
        raise ValueError("palette index out of range")
    size_field = n.bit_length() - 2  # 2^(size+1) = n
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    if local_table:
        out += bytes([0x00, 0, 0])  # no GCT
    else:
        out += bytes([0x80 | size_field, 0, 0])
        out += palette.tobytes()
    out += b"\x2c"  # image descriptor
    out += (0).to_bytes(2, "little") * 2
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    packed = (0x40 if interlace else 0x00) | (
        (0x80 | size_field) if local_table else 0x00
    )
    out += bytes([packed])
    if local_table:
        out += palette.tobytes()
    rows = indices[_interlace_order(h)] if interlace else indices
    mcs = max(2, n.bit_length() - 1)  # spec: min code size >= 2
    out += bytes([mcs])
    out += _frame_subblocks(lzw_encode(rows.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """Decode a single-image GIF → (h, w, 3) uint8 RGB. Extension
    blocks are skipped; interlaced images are reordered; a local
    color table overrides the global one. Multi-frame streams raise
    (honest absence — animation compositing is a different feature)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    pos = 6
    sw = int.from_bytes(data[pos : pos + 2], "little")
    sh = int.from_bytes(data[pos + 2 : pos + 4], "little")
    packed = data[pos + 4]
    pos += 7
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    image: np.ndarray | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            _, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        if image is not None:
            raise NotImplementedError(
                "multi-frame GIF (animation) — single-image streams only"
            )
        left = int.from_bytes(data[pos : pos + 2], "little")
        top = int.from_bytes(data[pos + 2 : pos + 4], "little")
        w = int.from_bytes(data[pos + 4 : pos + 6], "little")
        h = int.from_bytes(data[pos + 6 : pos + 8], "little")
        ipacked = data[pos + 8]
        pos += 9
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            raise NotImplementedError(
                "sub-rectangle image placement — full-frame streams only"
            )
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("no color table (neither global nor local)")
        mcs = data[pos]
        pos += 1
        packed_codes, pos = _read_subblocks(data, pos)
        idx = np.frombuffer(
            lzw_decode(packed_codes, mcs), dtype=np.uint8
        )
        if idx.size != w * h:
            raise ValueError(
                f"decoded {idx.size} indices for a {w}x{h} image"
            )
        rows = idx.reshape(h, w)
        if ipacked & 0x40:
            out_rows = np.zeros_like(rows)
            out_rows[_interlace_order(h)] = rows
            rows = out_rows
        if int(rows.max(initial=0)) >= table.shape[0]:
            raise ValueError("palette index out of range")
        image = table[rows]
    if image is None:
        raise ValueError("no image block before trailer")
    return image
