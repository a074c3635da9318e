"""Brotli (RFC 7932) decoding from scratch — the LAST of the three
web content codings (gzip/deflate landed with the crawl stack, zstd
this round): ``Content-Encoding: br`` is what modern servers send
first, so until this rung existed the WARC ingest path could only
detect-and-quarantine it (operators/web_extract's leg 7). Brotli
composes the engine's existing ideas — canonical prefix codes like
deflate (functions/png) with a two-level code-length code, LZ77 with
a FOUR-slot distance cache (zstd carries three) — plus two of its
own: context-modeled literal/distance code selection (the two
previous output bytes pick one of 64 literal contexts), and a
120 KiB STATIC DICTIONARY whose words are referenced by
out-of-window distances and mangled through 121 fixed transforms.

DECODE-ONLY by design (the xz/zstd posture): real ingest receives
reference-encoder output; tests cross-pin against the system
libbrotli encoder when present.

The ALGORITHM here is implemented from the RFC alone. The three
fixed DATA tables the RFC ships as appendices — the static
dictionary (Appendix A; sha256 pinned below, the hash printed in the
RFC itself), the transform table (Appendix B), and the context
lookup table — are loaded from ``resources/brotli_tables.json`` +
``resources/brotli_dictionary.bin``, checked against the pinned
digest at import. Data, not logic: the tables are normative spec
constants, exactly like the predefined FSE distributions embedded in
functions/zstd.py, just too large to inline as literals.

Implemented per RFC 7932:

- stream header (WBITS incl. the 10-24 range), meta-block grammar
  (ISLAST/ISLASTEMPTY, MNIBBLES, metadata skip blocks, uncompressed
  blocks with byte realignment);
- prefix codes: simple (1/2/3/4-symbol, tree-select) and complex
  (the 18-symbol code-length code in its skip order, 16/17 repeat
  codes with the accumulating repeat rule, 32768-space completeness
  accounting, the single-symbol degenerate case);
- block types and counts for all three categories with the
  previous/next/explicit type switch semantics;
- context modeling: LSB6/MSB6/UTF8/Signed literal contexts, the
  4-bucket copy-length distance contexts, RLE-coded context maps
  with inverse move-to-front;
- insert&copy commands (the 704-symbol joint alphabet, implicit
  last-distance for symbols < 128), the NPOSTFIX/NDIRECT distance
  split, the 16-code distance ring buffer arithmetic;
- static-dictionary references: word addressing by copy length,
  transform application (omit-first/omit-last, the UTF-8-aware
  ferment rules, prefix/suffix) implemented here from the RFC's
  algorithm.

Untrusted-input hygiene: every count/length is bounds-checked,
truncation raises ValueError, incomplete or over-subscribed codes
raise — quarantine-routable like the rest of the ingest stack.

Scale posture: pure per-asset byte code inside Arrow-batched
``mapInPandas``; zero shuffle; a native codec slots into the same
seam.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

_RES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "resources")
_DICT_SHA256 = "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70"

_TABLES = None


def _load_tables():
    """The RFC's fixed data tables, loaded once and digest-checked."""
    global _TABLES
    if _TABLES is None:
        with open(os.path.join(_RES, "brotli_dictionary.bin"), "rb") as f:
            dict_data = f.read()
        if hashlib.sha256(dict_data).hexdigest() != _DICT_SHA256:
            raise ValueError("brotli static dictionary digest mismatch")
        with open(os.path.join(_RES, "brotli_tables.json")) as f:
            meta = json.load(f)
        _TABLES = {
            "dict": dict_data,
            "sbbl": meta["size_bits_by_length"],
            "offs": meta["offsets_by_length"],
            "transforms": meta["transforms"],
            "ps": [s.encode("latin-1") for s in meta["prefix_suffix_strings"]],
            "ctx": base64.b64decode(meta["context_lookup_b64"]),
        }
    return _TABLES


class _Bits:
    """LSB-first forward reader (the deflate convention)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("brotli stream truncated")
        out = 0
        got = 0
        p = self.pos
        while got < n:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, n - got)
            out |= ((byte >> (p & 7)) & ((1 << take) - 1)) << got
            got += take
            p += take
        self.pos = end
        return out

    def peek(self, n: int) -> int:
        save = self.pos
        total = len(self.data) * 8
        out = 0
        got = 0
        p = save
        while got < n and p < total:
            byte = self.data[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, n - got)
            out |= ((byte >> (p & 7)) & ((1 << take) - 1)) << got
            got += take
            p += take
        return out

    def align_byte(self) -> None:
        pad = -self.pos % 8
        if pad and self.read(pad) != 0:
            raise ValueError("brotli byte-alignment padding not zero")


# --- prefix codes -------------------------------------------------------------

_CL_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)
# the static code for code-length code lengths, indexed by a 4-bit peek
_CL_PREFIX_LEN = (2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
_CL_PREFIX_VAL = (0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)


class _Code:
    """Canonical prefix code: per-length code→symbol maps (bit-at-a-
    time decode, the bz2 rung's approach; max length 15)."""

    __slots__ = ("by_len", "single")

    def __init__(self, lengths: dict[int, int]):
        nonzero = {s: l for s, l in lengths.items() if l}
        if len(nonzero) == 1:
            self.single = next(iter(nonzero))
            self.by_len = None
            return
        self.single = None
        code = 0
        self.by_len: list[dict[int, int]] = [dict() for _ in range(16)]
        for ln in range(1, 16):
            for sym in sorted(s for s, l in nonzero.items() if l == ln):
                self.by_len[ln][code] = sym
                code += 1
            code <<= 1

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read(1)
            hit = self.by_len[ln].get(code)
            if hit is not None:
                return hit
        raise ValueError("invalid brotli prefix code")


def _read_prefix_code(br: _Bits, alphabet: int) -> _Code:
    kind = br.read(2)
    if kind == 1:  # simple code
        nsym = br.read(2) + 1
        abits = max((alphabet - 1).bit_length(), 1)
        syms = []
        for _ in range(nsym):
            s = br.read(abits)
            if s >= alphabet:
                raise ValueError(f"brotli simple-code symbol {s} out of range")
            if s in syms:
                raise ValueError("brotli simple-code symbols not distinct")
            syms.append(s)
        if nsym == 1:
            return _Code({syms[0]: 1})  # degenerate: 0-bit in effect
        if nsym == 2:
            lens = [1, 1]
        elif nsym == 3:
            lens = [1, 2, 2]
        else:
            lens = [1, 2, 3, 3] if br.read(1) else [2, 2, 2, 2]
        return _Code({s: l for s, l in zip(syms, lens)})
    # complex code: kind is HSKIP (0, 2 or 3)
    hskip = kind
    cl_lengths = [0] * 18
    space = 32
    num_codes = 0
    for i in range(hskip, 18):
        v = br.peek(4)
        ln = _CL_PREFIX_LEN[v]
        br.read(ln)
        cl = _CL_PREFIX_VAL[v]
        cl_lengths[_CL_ORDER[i]] = cl
        if cl:
            num_codes += 1
            space -= 32 >> cl
            if space <= 0:
                break
    if num_codes == 0:
        raise ValueError("brotli code-length code is empty")
    if num_codes > 1 and space != 0:
        raise ValueError("brotli code-length code incomplete")
    cl_code = _Code({s: l for s, l in enumerate(cl_lengths)})

    lengths: dict[int, int] = {}
    space = 32768
    prev_nonzero = 8
    repeat = 0
    repeat_sym = -1
    i = 0
    while i < alphabet and space > 0:
        sym = cl_code.read(br)
        if sym < 16:
            repeat = 0
            repeat_sym = -1
            lengths[i] = sym
            i += 1
            if sym:
                prev_nonzero = sym
                space -= 32768 >> sym
        else:
            extra_bits = 2 if sym == 16 else 3
            new_len = prev_nonzero if sym == 16 else 0
            if repeat_sym != sym:
                repeat = 0
                repeat_sym = sym
            old = repeat
            if repeat:
                repeat = (repeat - 2) << extra_bits
            repeat += br.read(extra_bits) + 3
            count = repeat - old
            if i + count > alphabet:
                raise ValueError("brotli repeat run exceeds alphabet")
            for _ in range(count):
                lengths[i] = new_len
                i += 1
            if new_len:
                space -= count * (32768 >> new_len)
    if space < 0:
        raise ValueError("brotli prefix code over-subscribed")
    nonzero = sum(1 for l in lengths.values() if l)
    if nonzero == 0:
        raise ValueError("brotli prefix code has no symbols")
    if nonzero == 1:
        sym = next(s for s, l in lengths.items() if l)
        return _Code({sym: 1})
    if space != 0:
        raise ValueError("brotli prefix code incomplete")
    return _Code(lengths)


def _var_len_uint8(br: _Bits) -> int:
    if not br.read(1):
        return 0
    n = br.read(3)
    if n == 0:
        return 1
    return (1 << n) + br.read(n)


# --- fixed length tables ------------------------------------------------------

_INS_BASE = (0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130,
             194, 322, 578, 1090, 2114, 6210, 22594)
_INS_BITS = (0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9,
             10, 12, 14, 24)
_CPY_BASE = (2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70,
             102, 134, 198, 326, 582, 1094, 2118)
_CPY_BITS = (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7,
             8, 9, 10, 24)
# cell → (insert offset, copy offset); cells 0-1 imply the last distance
_CMD_CELLS = ((0, 0), (0, 8), (0, 0), (0, 8), (8, 0), (8, 8), (0, 16),
              (16, 0), (8, 16), (16, 8), (16, 16))
_BLOCK_BASE = (1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177,
               209, 241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625)
_BLOCK_BITS = (2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8,
               9, 10, 11, 12, 13, 24)


def _read_block_len(br: _Bits, code: _Code) -> int:
    s = code.read(br)
    return _BLOCK_BASE[s] + br.read(_BLOCK_BITS[s])


def _read_context_map(br: _Bits, size: int, ntrees: int) -> list[int]:
    if ntrees == 1:
        return [0] * size
    rlemax = (br.read(4) + 1) if br.read(1) else 0
    code = _read_prefix_code(br, ntrees + rlemax)
    cmap = []
    while len(cmap) < size:
        sym = code.read(br)
        if sym == 0:
            cmap.append(0)
        elif sym <= rlemax:
            reps = (1 << sym) + br.read(sym)
            if len(cmap) + reps > size:
                raise ValueError("brotli context-map zero run overruns")
            cmap.extend([0] * reps)
        else:
            cmap.append(sym - rlemax)
    if br.read(1):  # inverse move-to-front
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            cmap[i] = mtf[v]
            mtf.insert(0, mtf.pop(v))
    if any(v >= ntrees for v in cmap):
        raise ValueError("brotli context-map value out of range")
    return cmap


# --- dictionary transforms ----------------------------------------------------


def _ferment(buf: bytearray, start: int, end: int, only_first: bool) -> None:
    """The RFC's UTF-8-aware uppercasing: ASCII a-z flip bit 5;
    2-byte sequences flip bit 5 of the continuation; 3-byte flip bit
    2 of the third byte."""
    i = start
    while i < end:
        b = buf[i]
        if b < 192:
            if 97 <= b <= 122:
                buf[i] ^= 32
            i += 1
        elif b < 224:
            if i + 1 < end:
                buf[i + 1] ^= 32
            i += 2
        else:
            if i + 2 < end:
                buf[i + 2] ^= 5
            i += 3
        if only_first:
            break


def _transform_word(word: bytes, tid: int, tables) -> bytes:
    prefix_id, ttype, suffix_id = tables["transforms"][tid]
    prefix = tables["ps"][prefix_id]
    suffix = tables["ps"][suffix_id]
    if 12 <= ttype <= 20:  # omit first 1-9
        word = word[ttype - 11 :]
    elif 1 <= ttype <= 9:  # omit last 1-9
        word = word[: max(len(word) - ttype, 0)]
    out = bytearray(word)
    if ttype == 10:
        _ferment(out, 0, len(out), only_first=True)
    elif ttype == 11:
        _ferment(out, 0, len(out), only_first=False)
    return bytes(prefix) + bytes(out) + bytes(suffix)


# --- decoder ------------------------------------------------------------------


def brotli_decompress(data: bytes, max_output: int | None = None) -> bytes:
    tables = _load_tables()
    ctx_lut = tables["ctx"]
    br = _Bits(data)

    # window bits
    if br.read(1) == 0:
        wbits = 16
    else:
        n = br.read(3)
        if n != 0:
            wbits = 17 + n
        else:
            n = br.read(3)
            if n == 1:
                raise NotImplementedError(
                    "brotli large-window extension is not decoded"
                )
            wbits = (8 + n) if n else 17
    window = (1 << wbits) - 16

    out = bytearray()
    dist_rb = [4, 11, 15, 16]  # most-recent first
    islast = False
    while not islast:
        islast = bool(br.read(1))
        if islast and br.read(1):  # ISLASTEMPTY
            break
        nibbles = br.read(2)
        if nibbles == 3:  # metadata block
            if br.read(1):
                raise ValueError("brotli metadata reserved bit set")
            skip_bytes = br.read(2)
            skip = 0
            for k in range(skip_bytes):
                b = br.read(8)
                if k == skip_bytes - 1 and skip_bytes > 1 and b == 0:
                    raise ValueError("brotli metadata length not minimal")
                skip |= b << (8 * k)
            if skip_bytes:
                skip += 1
            if islast:
                raise ValueError("brotli metadata block marked last")
            br.align_byte()
            if br.pos + 8 * skip > len(data) * 8:
                raise ValueError("brotli metadata truncated")
            br.pos += 8 * skip
            continue
        mlen = 0
        for k in range(4 + nibbles):
            nib = br.read(4)
            if k == 3 + nibbles and nibbles > 0 and nib == 0:
                raise ValueError("brotli MLEN not minimally encoded")
            mlen |= nib << (4 * k)
        mlen += 1
        if max_output is not None and len(out) + mlen > max_output:
            raise ValueError("brotli output exceeds caller's cap")
        if not islast and br.read(1):  # ISUNCOMPRESSED
            br.align_byte()
            start = br.pos // 8
            if start + mlen > len(data):
                raise ValueError("brotli uncompressed block truncated")
            out += data[start : start + mlen]
            br.pos += 8 * mlen
            continue

        # --- compressed meta-block header ---
        nbl = []
        btype = []
        btype_prev = []
        blen = []
        btype_codes = []
        bcount_codes = []
        for _ in range(3):
            n = _var_len_uint8(br) + 1
            nbl.append(n)
            btype.append(0)
            btype_prev.append(1)
            if n >= 2:
                tcode = _read_prefix_code(br, n + 2)
                ccode = _read_prefix_code(br, 26)
                btype_codes.append(tcode)
                bcount_codes.append(ccode)
                blen.append(_read_block_len(br, ccode))
            else:
                btype_codes.append(None)
                bcount_codes.append(None)
                blen.append(1 << 60)
        npostfix = br.read(2)
        ndirect = br.read(4) << npostfix
        ctx_modes = [br.read(2) for _ in range(nbl[0])]
        ntrees_l = _var_len_uint8(br) + 1
        cmap_l = _read_context_map(br, 64 * nbl[0], ntrees_l)
        ntrees_d = _var_len_uint8(br) + 1
        cmap_d = _read_context_map(br, 4 * nbl[2], ntrees_d)
        lit_codes = [_read_prefix_code(br, 256) for _ in range(ntrees_l)]
        cmd_codes = [_read_prefix_code(br, 704) for _ in range(nbl[1])]
        dist_alpha = 16 + ndirect + (48 << npostfix)
        dist_codes = [_read_prefix_code(br, dist_alpha)
                      for _ in range(ntrees_d)]

        def switch(cat: int) -> None:
            sym = btype_codes[cat].read(br)
            if sym == 0:
                t = btype_prev[cat]
            elif sym == 1:
                t = (btype[cat] + 1) % nbl[cat]
            else:
                t = sym - 2
            btype_prev[cat] = btype[cat]
            btype[cat] = t
            blen[cat] = _read_block_len(br, bcount_codes[cat])

        # --- command loop ---
        produced = 0
        while produced < mlen:
            if blen[1] == 0:
                switch(1)
            blen[1] -= 1
            cmd = cmd_codes[btype[1]].read(br)
            cell = cmd >> 6
            ins_code = _CMD_CELLS[cell][0] + ((cmd >> 3) & 7)
            cpy_code = _CMD_CELLS[cell][1] + (cmd & 7)
            implicit = cell < 2
            ins_len = _INS_BASE[ins_code] + br.read(_INS_BITS[ins_code])
            cpy_len = _CPY_BASE[cpy_code] + br.read(_CPY_BITS[cpy_code])

            for _ in range(ins_len):
                if produced >= mlen:
                    raise ValueError("brotli insert overruns MLEN")
                if blen[0] == 0:
                    switch(0)
                blen[0] -= 1
                mode = ctx_modes[btype[0]]
                p1 = out[-1] if out else 0
                p2 = out[-2] if len(out) >= 2 else 0
                ctx = ctx_lut[(mode << 9) + p1] | ctx_lut[
                    (mode << 9) + 256 + p2
                ]
                tree = cmap_l[(btype[0] << 6) + ctx]
                out.append(lit_codes[tree].read(br))
                produced += 1
            if produced >= mlen:
                if produced > mlen:
                    raise ValueError("brotli literals overrun MLEN")
                break

            max_dist = min(len(out), window)
            if implicit:
                distance = dist_rb[0]
                dcode = 0
            else:
                if blen[2] == 0:
                    switch(2)
                blen[2] -= 1
                dctx = min(cpy_len, 5) - 2
                tree = cmap_d[(btype[2] << 2) + dctx]
                dcode = dist_codes[tree].read(br)
                if dcode < 16:
                    if dcode < 4:
                        distance = dist_rb[dcode]
                    else:
                        base = dist_rb[(dcode - 4) // 6]  # 4-9→rb[0],10-15→rb[1]
                        delta = ((dcode - 4) % 6 >> 1) + 1
                        sign = -1 if (dcode % 2 == 0) else 1
                        distance = base + sign * delta
                        if distance <= 0:
                            raise ValueError("brotli short distance <= 0")
                elif dcode < 16 + ndirect:
                    distance = dcode - 16 + 1
                else:
                    h = dcode - ndirect - 16
                    hcode = h >> npostfix
                    lcode = h & ((1 << npostfix) - 1)
                    nbits = 1 + (hcode >> 1)
                    offset = ((2 + (hcode & 1)) << nbits) - 4
                    distance = (
                        ((offset + br.read(nbits)) << npostfix)
                        + lcode + ndirect + 1
                    )

            if distance <= max_dist:
                if dcode != 0:
                    dist_rb.insert(0, distance)
                    dist_rb.pop()
                if produced + cpy_len > mlen:
                    raise ValueError("brotli copy overruns MLEN")
                start = len(out) - distance
                for k in range(cpy_len):
                    out.append(out[start + k])
                produced += cpy_len
            else:
                # static-dictionary reference
                if not 4 <= cpy_len <= 24:
                    raise ValueError(
                        f"brotli dictionary copy length {cpy_len} invalid"
                    )
                ndbits = tables["sbbl"][cpy_len]
                if ndbits == 0:
                    raise ValueError(
                        f"brotli dictionary has no {cpy_len}-byte words"
                    )
                address = distance - max_dist - 1
                word_idx = address & ((1 << ndbits) - 1)
                tid = address >> ndbits
                if tid >= len(tables["transforms"]):
                    raise ValueError(
                        f"brotli transform index {tid} out of range"
                    )
                off = tables["offs"][cpy_len] + word_idx * cpy_len
                word = tables["dict"][off : off + cpy_len]
                piece = _transform_word(word, tid, tables)
                if produced + len(piece) > mlen:
                    raise ValueError("brotli dictionary word overruns MLEN")
                out += piece
                produced += len(piece)
        if produced != mlen:
            raise ValueError("brotli meta-block produced short output")
    return bytes(out)


# --- large-window decoder (sibling core) --------------------------------------

# Bounds from the public reference decoder's large-window mode (decode.c
# DecodeWindowBits with BROTLI_DECODER_PARAM_LARGE_WINDOW, and
# BROTLI_LARGE_MIN/MAX_WBITS / BROTLI_MAX_ALLOWED_DISTANCE in constants.h);
# the stream-format delta itself is the shared-brotli draft's large-window
# extension: WBITS pattern 1,000,001 + 1 reserved zero bit + 6 literal WBITS
# in [10, 30], and the distance code space widened from 24 to 62 max extra
# bits, with every decoded distance capped at 0x7FFFFFC.
_LW_MIN_WBITS = 10
_LW_MAX_WBITS = 30
_LW_MAX_DISTANCE = 0x7FFFFFC


def _brotli_decode(
    data: bytes,
    max_output: int | None = None,
    *,
    large_window: bool = False,
    stats: dict | None = None,
) -> bytes:
    """Generalized decode core: RFC 7932 plus (``large_window=True``)
    the large-window extension — WBITS up to 30 (1 GiB window) and the
    widened distance code space, the format ``brotli --large_window``
    emits and the reference decoder accepts only behind its
    LARGE_WINDOW parameter. With ``large_window=False`` the behavior
    is bit-for-bit ``brotli_decompress`` (a differential test pins
    that equivalence across the reference-encoder sweep).

    DUPLICATION IS DELIBERATE: this core repeats the attested
    ``brotli_decompress`` loop instead of refactoring it, because
    editing that function would void the crawl gates
    (``decode_content_encoding`` → ``warc_ingest_extract`` /
    ``crawl_ingest_quarantine``) OUT of the sealed r15 window
    (ROTATION.md). R16 rotates those gates in-window and collapses
    ``brotli_decompress`` onto this core in the same round.

    Laxity note (the zstd offset-laxity precedent): the distance
    prefix code is read over the full 62-bit-max alphabet rather than
    the reference's exact per-(NPOSTFIX, NDIRECT) clamped limit;
    any decoded distance beyond 0x7FFFFFC raises, so valid streams
    decode identically and hostile ones still fail closed.

    ``stats``, when a dict is passed, receives ``wbits`` /
    ``max_distance`` / ``n_commands`` / ``n_dict_refs`` — how tests
    prove a fixture really exercised a >2^24 distance instead of
    merely carrying a large-window header.
    """
    tables = _load_tables()
    ctx_lut = tables["ctx"]
    br = _Bits(data)

    # window bits; lw_stream records whether the STREAM carries the
    # large-window header form — the reference decoder widens the
    # distance code space only then, never for a classic stream that
    # merely happens to be decoded with LARGE_WINDOW allowed (decode.c
    # resets s->large_window unless the 1,000,001 pattern is present)
    lw_stream = False
    if br.read(1) == 0:
        wbits = 16
    else:
        n = br.read(3)
        if n != 0:
            wbits = 17 + n
        else:
            n = br.read(3)
            if n == 1:
                if not large_window:
                    raise NotImplementedError(
                        "brotli large-window extension is not decoded"
                    )
                if br.read(1):
                    raise ValueError(
                        "brotli large-window reserved bit set"
                    )
                wbits = br.read(6)
                if not _LW_MIN_WBITS <= wbits <= _LW_MAX_WBITS:
                    raise ValueError(
                        f"brotli large-window WBITS {wbits} outside "
                        f"[{_LW_MIN_WBITS}, {_LW_MAX_WBITS}]"
                    )
                lw_stream = True
            else:
                wbits = (8 + n) if n else 17
    window = (1 << wbits) - 16
    max_dist_bits = 62 if lw_stream else 24
    if stats is not None:
        stats["wbits"] = wbits
        stats["lw_header"] = lw_stream
        stats["max_distance"] = 0
        stats["n_commands"] = 0
        stats["n_dict_refs"] = 0

    out = bytearray()
    dist_rb = [4, 11, 15, 16]  # most-recent first
    islast = False
    while not islast:
        islast = bool(br.read(1))
        if islast and br.read(1):  # ISLASTEMPTY
            break
        nibbles = br.read(2)
        if nibbles == 3:  # metadata block
            if br.read(1):
                raise ValueError("brotli metadata reserved bit set")
            skip_bytes = br.read(2)
            skip = 0
            for k in range(skip_bytes):
                b = br.read(8)
                if k == skip_bytes - 1 and skip_bytes > 1 and b == 0:
                    raise ValueError("brotli metadata length not minimal")
                skip |= b << (8 * k)
            if skip_bytes:
                skip += 1
            if islast:
                raise ValueError("brotli metadata block marked last")
            br.align_byte()
            if br.pos + 8 * skip > len(data) * 8:
                raise ValueError("brotli metadata truncated")
            br.pos += 8 * skip
            continue
        mlen = 0
        for k in range(4 + nibbles):
            nib = br.read(4)
            if k == 3 + nibbles and nibbles > 0 and nib == 0:
                raise ValueError("brotli MLEN not minimally encoded")
            mlen |= nib << (4 * k)
        mlen += 1
        if max_output is not None and len(out) + mlen > max_output:
            raise ValueError("brotli output exceeds caller's cap")
        if not islast and br.read(1):  # ISUNCOMPRESSED
            br.align_byte()
            start = br.pos // 8
            if start + mlen > len(data):
                raise ValueError("brotli uncompressed block truncated")
            out += data[start : start + mlen]
            br.pos += 8 * mlen
            continue

        # --- compressed meta-block header ---
        nbl = []
        btype = []
        btype_prev = []
        blen = []
        btype_codes = []
        bcount_codes = []
        for _ in range(3):
            n = _var_len_uint8(br) + 1
            nbl.append(n)
            btype.append(0)
            btype_prev.append(1)
            if n >= 2:
                tcode = _read_prefix_code(br, n + 2)
                ccode = _read_prefix_code(br, 26)
                btype_codes.append(tcode)
                bcount_codes.append(ccode)
                blen.append(_read_block_len(br, ccode))
            else:
                btype_codes.append(None)
                bcount_codes.append(None)
                blen.append(1 << 60)
        npostfix = br.read(2)
        ndirect = br.read(4) << npostfix
        ctx_modes = [br.read(2) for _ in range(nbl[0])]
        ntrees_l = _var_len_uint8(br) + 1
        cmap_l = _read_context_map(br, 64 * nbl[0], ntrees_l)
        ntrees_d = _var_len_uint8(br) + 1
        cmap_d = _read_context_map(br, 4 * nbl[2], ntrees_d)
        lit_codes = [_read_prefix_code(br, 256) for _ in range(ntrees_l)]
        cmd_codes = [_read_prefix_code(br, 704) for _ in range(nbl[1])]
        dist_alpha = 16 + ndirect + ((2 * max_dist_bits) << npostfix)
        dist_codes = [_read_prefix_code(br, dist_alpha)
                      for _ in range(ntrees_d)]

        def switch(cat: int) -> None:
            sym = btype_codes[cat].read(br)
            if sym == 0:
                t = btype_prev[cat]
            elif sym == 1:
                t = (btype[cat] + 1) % nbl[cat]
            else:
                t = sym - 2
            btype_prev[cat] = btype[cat]
            btype[cat] = t
            blen[cat] = _read_block_len(br, bcount_codes[cat])

        # --- command loop ---
        produced = 0
        while produced < mlen:
            if blen[1] == 0:
                switch(1)
            blen[1] -= 1
            cmd = cmd_codes[btype[1]].read(br)
            cell = cmd >> 6
            ins_code = _CMD_CELLS[cell][0] + ((cmd >> 3) & 7)
            cpy_code = _CMD_CELLS[cell][1] + (cmd & 7)
            implicit = cell < 2
            ins_len = _INS_BASE[ins_code] + br.read(_INS_BITS[ins_code])
            cpy_len = _CPY_BASE[cpy_code] + br.read(_CPY_BITS[cpy_code])
            if stats is not None:
                stats["n_commands"] += 1

            for _ in range(ins_len):
                if produced >= mlen:
                    raise ValueError("brotli insert overruns MLEN")
                if blen[0] == 0:
                    switch(0)
                blen[0] -= 1
                mode = ctx_modes[btype[0]]
                p1 = out[-1] if out else 0
                p2 = out[-2] if len(out) >= 2 else 0
                ctx = ctx_lut[(mode << 9) + p1] | ctx_lut[
                    (mode << 9) + 256 + p2
                ]
                tree = cmap_l[(btype[0] << 6) + ctx]
                out.append(lit_codes[tree].read(br))
                produced += 1
            if produced >= mlen:
                if produced > mlen:
                    raise ValueError("brotli literals overrun MLEN")
                break

            max_dist = min(len(out), window)
            if implicit:
                distance = dist_rb[0]
                dcode = 0
            else:
                if blen[2] == 0:
                    switch(2)
                blen[2] -= 1
                dctx = min(cpy_len, 5) - 2
                tree = cmap_d[(btype[2] << 2) + dctx]
                dcode = dist_codes[tree].read(br)
                if dcode < 16:
                    if dcode < 4:
                        distance = dist_rb[dcode]
                    else:
                        base = dist_rb[(dcode - 4) // 6]  # 4-9→rb[0],10-15→rb[1]
                        delta = ((dcode - 4) % 6 >> 1) + 1
                        sign = -1 if (dcode % 2 == 0) else 1
                        distance = base + sign * delta
                        if distance <= 0:
                            raise ValueError("brotli short distance <= 0")
                elif dcode < 16 + ndirect:
                    distance = dcode - 16 + 1
                else:
                    h = dcode - ndirect - 16
                    hcode = h >> npostfix
                    lcode = h & ((1 << npostfix) - 1)
                    nbits = 1 + (hcode >> 1)
                    offset = ((2 + (hcode & 1)) << nbits) - 4
                    distance = (
                        ((offset + br.read(nbits)) << npostfix)
                        + lcode + ndirect + 1
                    )
            if lw_stream and distance > _LW_MAX_DISTANCE:
                raise ValueError(
                    "brotli distance exceeds the large-window cap"
                )

            if distance <= max_dist:
                if dcode != 0:
                    dist_rb.insert(0, distance)
                    dist_rb.pop()
                if produced + cpy_len > mlen:
                    raise ValueError("brotli copy overruns MLEN")
                if stats is not None and distance > stats["max_distance"]:
                    stats["max_distance"] = distance
                start = len(out) - distance
                for k in range(cpy_len):
                    out.append(out[start + k])
                produced += cpy_len
            else:
                # static-dictionary reference
                if not 4 <= cpy_len <= 24:
                    raise ValueError(
                        f"brotli dictionary copy length {cpy_len} invalid"
                    )
                ndbits = tables["sbbl"][cpy_len]
                if ndbits == 0:
                    raise ValueError(
                        f"brotli dictionary has no {cpy_len}-byte words"
                    )
                address = distance - max_dist - 1
                word_idx = address & ((1 << ndbits) - 1)
                tid = address >> ndbits
                if tid >= len(tables["transforms"]):
                    raise ValueError(
                        f"brotli transform index {tid} out of range"
                    )
                off = tables["offs"][cpy_len] + word_idx * cpy_len
                word = tables["dict"][off : off + cpy_len]
                piece = _transform_word(word, tid, tables)
                if produced + len(piece) > mlen:
                    raise ValueError("brotli dictionary word overruns MLEN")
                out += piece
                produced += len(piece)
                if stats is not None:
                    stats["n_dict_refs"] += 1
        if produced != mlen:
            raise ValueError("brotli meta-block produced short output")
    return bytes(out)


def brotli_decompress_lw(
    data: bytes,
    max_output: int | None = None,
    stats: dict | None = None,
) -> bytes:
    """Large-window-capable sibling of ``brotli_decompress`` (VERDICT
    r14 what's-missing #4): accepts BOTH standard RFC 7932 streams and
    the large-window extension (WBITS 10-30), exactly like the
    reference decoder with its LARGE_WINDOW parameter set. Test-tier
    this round by design — ``decode_content_encoding`` keeps routing
    ``br`` through the attested ``brotli_decompress`` (which detects
    large-window headers and raises, the quarantine contract) until
    r16 rotates the crawl gates in-window and flips the call site.
    """
    return _brotli_decode(
        data, max_output, large_window=True, stats=stats
    )


# --- writer (spec-subset: uncompressed meta-blocks) ---------------------------


def brotli_compress_stored(data: bytes, chunk: int = 65536) -> bytes:
    """A valid brotli stream using ISUNCOMPRESSED meta-blocks — the
    store-mode subset every brotli implementation decodes (the
    zstd_compress_stored posture: compressed-block ENCODING is a
    research project and out of scope by design; this writer exists
    so the engine can author ``Content-Encoding: br`` bodies and the
    quarantine gate can attest the decode path per-row without a
    native library in the execution path)."""
    if not 1 <= chunk <= 1 << 16:
        raise ValueError(f"brotli stored chunk {chunk} outside [1, 65536]")
    bits: list[tuple[int, int]] = [(0, 1)]  # WBITS = 16
    out = bytearray()
    acc = 0
    nacc = 0

    def flush_bits() -> None:
        nonlocal acc, nacc
        for value, n in bits:
            acc |= (value & ((1 << n) - 1)) << nacc
            nacc += n
            while nacc >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
        bits.clear()

    for i in range(0, len(data), chunk):
        part = data[i : i + chunk]
        bits.append((0, 1))  # ISLAST = 0
        bits.append((0, 2))  # MNIBBLES = 4
        bits.append((len(part) - 1, 16))
        bits.append((1, 1))  # ISUNCOMPRESSED
        flush_bits()
        if nacc:  # byte-align with zero padding
            out.append(acc & 0xFF)
            acc = 0
            nacc = 0
        out += part
    bits.append((1, 1))  # ISLAST
    bits.append((1, 1))  # ISLASTEMPTY
    flush_bits()
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)
