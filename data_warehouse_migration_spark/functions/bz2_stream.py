"""bzip2 streams from scratch — the BWT rung of the compression
ladder (deflate = LZ77+Huffman in functions/png, LZW in functions/gif
and the PDF filter, Rice in functions/flac; this adds the
Burrows-Wheeler family). Why it earns a place in a crawl engine:
Wikipedia dumps, many older Common Crawl segments, and mailing-list
archives ship ``.bz2``, and the format is MULTI-STREAM splittable the
same way member-gzip is (every stream starts with the 48-bit block
magic, so a reader can resynchronize mid-file).

Implemented per the de-facto spec (the format has no RFC; layout per
the bzip2 1.0 sources and the published format notes):

- stream header ``BZh{1-9}``; per block: the 48-bit block magic,
  block CRC, the deprecated randomized bit (rejected if set), origPtr;
- RLE1 (mandatory 4-byte run escape) → BWT → MTF → zero-run RLE2
  (RUNA/RUNB, bijective base-2) → Huffman with 2-6 tables switched
  every 50 symbols via unary-MTF selectors, delta-coded code lengths;
- bzip2's CRC-32: polynomial 0x04C11DB7 MSB-first (NOT the reflected
  zlib variant), per block and stream-combined (rotate-left-xor);
- decoder: multi-stream + multi-block, verifies both CRC levels,
  inverse BWT via the standard T-vector traversal;
- encoder: single-block-per-stream (fixture texts ≪ 900k), one
  optimal length-limited Huffman table duplicated into the minimum
  legal two groups (real multi-table files are covered on the DECODE
  side by stdlib-``bz2``-compressed pins in tests/test_bz2_stream.py
  — CPython links the reference libbz2, so those streams exercise
  table switching, selector MTF, and multi-block layout).

Unsupported constructs raise with the reason (the randomized bit).
Untrusted-input hygiene matches the gzip/WARC stack: every length/
pointer is bounds-checked before use, malformed streams raise
ValueError rather than looping or over-reading.

Scale shape: a ``.bz2``-member walk is the gzip-member posture —
archives are independent rows through one Arrow-batched stage, zero
shuffle; decode is serial per stream by format design, so streams are
the parallelism unit.
"""

from __future__ import annotations

# --- bzip2 CRC-32 (MSB-first, poly 0x04C11DB7) -------------------------------

_CRC_TABLE: list[int] = []


def _crc_table() -> list[int]:
    if not _CRC_TABLE:
        for i in range(256):
            c = i << 24
            for _ in range(8):
                c = ((c << 1) ^ 0x04C11DB7 if c & 0x80000000 else c << 1) & 0xFFFFFFFF
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def bz2_crc32(data: bytes) -> int:
    """bzip2's block CRC: 0x04C11DB7 MSB-first, init/final 0xFFFFFFFF —
    deliberately NOT zlib's reflected CRC-32."""
    table = _crc_table()
    c = 0xFFFFFFFF
    for b in data:
        c = ((c << 8) & 0xFFFFFFFF) ^ table[((c >> 24) ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


# --- bit I/O (MSB-first throughout the format) -------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("bzip2 stream truncated")
            out = (out << 1) | ((self.data[byte_i] >> (7 - bit_i)) & 1)
            self.pos += 1
        return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([self.acc << (8 - self.nbits)])
        return bytes(self.buf)


# --- RLE1 (the mandatory pre-BWT 4-byte run escape) --------------------------


def _rle1_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        run = 1
        while i + run < n and data[i + run] == b and run < 255 + 4:
            run += 1
        if run >= 4:
            out += bytes([b, b, b, b, run - 4])
            i += run
        else:
            out += bytes([b]) * run
            i += run
    return bytes(out)


def _rle1_decode(data: bytes, max_out: int | None = None) -> bytes:
    """RLE1 expansion; ``max_out`` raises DURING the walk (ADVICE
    r14: this is bzip2's amplification stage — up to ~51x of the
    format-capped BWT block — so the budget must bind before the
    expansion allocates, not after)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        run = 1
        while run < 4 and i + run < n and data[i + run] == b:
            run += 1
        out += bytes([b]) * run
        i += run
        if run == 4:
            if i >= n:
                raise ValueError("RLE1 run missing its count byte")
            out += bytes([b]) * data[i]
            i += 1
        if max_out is not None and len(out) > max_out:
            raise ValueError("bzip2 decoded output exceeds caller's cap")
    return bytes(out)


# --- BWT ---------------------------------------------------------------------


def _bwt_encode(data: bytes) -> tuple[bytes, int]:
    """(last column, origPtr) over all rotations — the doubled-buffer
    slice sort is O(n² log n) worst-case but the encoder's blocks are
    fixture-document-sized; the decoder (the crawl-facing side) is
    linear."""
    n = len(data)
    doubled = data + data
    order = sorted(range(n), key=lambda i: doubled[i : i + n])
    last = bytes(doubled[i + n - 1] for i in order)
    return last, order.index(0)


def _bwt_decode(last: bytes, orig_ptr: int) -> bytes:
    n = len(last)
    if not 0 <= orig_ptr < n:
        raise ValueError(f"origPtr {orig_ptr} outside block of {n}")
    counts = [0] * 256
    for b in last:
        counts[b] += 1
    base = [0] * 256
    total = 0
    for sym in range(256):
        base[sym] = total
        total += counts[sym]
    seen = [0] * 256
    t = [0] * n
    # the bzip2 tt construction: tt[cftab[ll[i]]++] = i — a SCATTER
    # (the inverse permutation of the gather form, which reconstructs
    # a rotated reversal instead)
    for i, b in enumerate(last):
        t[base[b] + seen[b]] = i
        seen[b] += 1
    out = bytearray(n)
    j = t[orig_ptr]
    for i in range(n):
        out[i] = last[j]
        j = t[j]
    return bytes(out)


# --- MTF + RLE2 (RUNA/RUNB zero runs, bijective base 2) ----------------------

_RUNA, _RUNB = 0, 1


def _mtf_rle2_encode(data: bytes, used: list[int]) -> list[int]:
    """MTF over the USED byte alphabet, zero runs emitted as
    RUNA/RUNB (value+1 in bijective base 2, LSB first), other MTF
    values shifted +1; the caller appends EOB."""
    alpha = list(used)
    out: list[int] = []
    zrun = 0

    def flush() -> None:
        nonlocal zrun
        v = zrun
        while v > 0:
            v -= 1
            out.append(_RUNB if v & 1 else _RUNA)
            v >>= 1
        zrun = 0

    for b in data:
        i = alpha.index(b)
        if i == 0:
            zrun += 1
            continue
        flush()
        alpha.insert(0, alpha.pop(i))
        out.append(i + 1)
    flush()
    return out


def _mtf_rle2_decode(
    symbols: list[int], used: list[int], eob: int, max_len: int | None = None
) -> bytes:
    """``max_len`` is the format's hard cap on the decoded BWT block
    (100_000·level): RUNA/RUNB runs grow as bijective base 2, so a few
    dozen hostile input bytes can request a multi-GiB run — the bound
    must be enforced WHILE ``zrun`` accumulates, before any
    allocation, or a crawl-scale quarantine lane feeding raw bytes
    here risks an executor OOM-kill that per-row quarantine cannot
    catch (ADVICE r12)."""
    alpha = list(used)
    out = bytearray()
    zrun = 0
    zbit = 1

    def check(extra: int) -> None:
        if max_len is not None and len(out) + extra > max_len:
            raise ValueError(
                f"bzip2 block decodes past its {max_len}-byte cap"
            )

    for s in symbols:
        if s in (_RUNA, _RUNB):
            zrun += zbit if s == _RUNA else 2 * zbit
            zbit <<= 1
            check(zrun)
            continue
        if zrun:
            out += bytes([alpha[0]]) * zrun
            zrun, zbit = 0, 1
        if s == eob:
            break
        i = s - 1
        if not 1 <= i + 1 <= len(alpha):
            raise ValueError(f"MTF symbol {s} outside alphabet")
        check(1)
        alpha.insert(0, alpha.pop(i))
        out.append(alpha[0])
    if zrun:
        out += bytes([alpha[0]]) * zrun
    return bytes(out)


# --- Huffman (bzip2 flavor: lengths 1-20, canonical by length/symbol) --------

_MAX_LEN = 20


def _huffman_lengths(freqs: list[int]) -> list[int]:
    """Optimal prefix-code lengths, clamped to the format's 20-bit cap
    by the reference implementation's trick (halve frequencies and
    rebuild until it fits)."""
    import heapq

    n = len(freqs)
    f = [max(1, x) for x in freqs]
    while True:
        heap = [(w, i, None) for i, w in enumerate(f)]
        heapq.heapify(heap)
        if len(heap) == 1:
            return [1]
        parents: dict[int, tuple] = {}
        nxt = n
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            parents[nxt] = (a[1], b[1])
            heapq.heappush(heap, (a[0] + b[0], nxt, None))
            nxt += 1
        lengths = [0] * n

        def walk(node: int, depth: int) -> None:
            stack = [(node, depth)]
            while stack:
                nd, d = stack.pop()
                if nd < n:
                    lengths[nd] = max(d, 1)
                else:
                    left, right = parents[nd]
                    stack.append((left, d + 1))
                    stack.append((right, d + 1))

        walk(heap[0][1], 0)
        if max(lengths) <= _MAX_LEN:
            return lengths
        f = [max(1, x // 2) for x in f]


def _canonical_codes(lengths: list[int]) -> list[int]:
    codes = [0] * len(lengths)
    code = 0
    for ln in range(1, max(lengths) + 1):
        for sym, sl in enumerate(lengths):
            if sl == ln:
                codes[sym] = code
                code += 1
        code <<= 1
    return codes


def _decode_table(lengths: list[int], codes: list[int]) -> list[dict[int, int]]:
    """Per-length code→symbol maps, built once per table per block
    (the per-symbol decode then extends the code a bit at a time —
    tables are ≤ 258 symbols, so dict probes are plenty)."""
    by_len: list[dict[int, int]] = [{} for _ in range(_MAX_LEN + 1)]
    for sym, ln in enumerate(lengths):
        if ln:
            by_len[ln][codes[sym]] = sym
    return by_len


def _decode_symbol(br: _BitReader, by_len: list[dict[int, int]]) -> int:
    code = 0
    for ln in range(1, _MAX_LEN + 1):
        code = (code << 1) | br.read(1)
        hit = by_len[ln].get(code)
        if hit is not None:
            return hit
    raise ValueError("invalid Huffman code in bzip2 block")


# --- block + stream layer ----------------------------------------------------

_BLOCK_MAGIC = 0x314159265359
_EOS_MAGIC = 0x177245385090


def bz2_compress(data: bytes, level: int = 9) -> bytes:
    """Compress to a single-stream, single-block bzip2 file (inputs
    beyond the block size raise — the gate corpus is document-sized;
    a production writer chunks per 100k·level and chains combined
    CRCs exactly as the footer already does)."""
    if not 1 <= level <= 9:
        raise ValueError(f"bzip2 level must be 1-9, got {level}")
    rle = _rle1_encode(data)
    if len(rle) > 100_000 * level:
        raise ValueError("input exceeds one bzip2 block; chunk it")
    if not rle:
        # empty stream: header + EOS magic + zero combined CRC
        bw = _BitWriter()
        bw.write(0x425A68, 24)
        bw.write(0x30 + level, 8)
        bw.write(_EOS_MAGIC, 48)
        bw.write(0, 32)
        return bw.getvalue()

    crc = bz2_crc32(data)
    last, orig_ptr = _bwt_encode(rle)
    used = sorted(set(last))
    syms = _mtf_rle2_encode(last, used)
    eob = len(used) + 1
    syms.append(eob)
    nsyms = len(used) + 2

    freqs = [0] * nsyms
    for s in syms:
        freqs[s] += 1
    lengths = _huffman_lengths(freqs)
    if len(lengths) < nsyms:  # single-symbol degenerate table
        lengths = lengths + [_MAX_LEN] * (nsyms - len(lengths))
    codes = _canonical_codes(lengths)
    n_selectors = (len(syms) + 49) // 50

    bw = _BitWriter()
    bw.write(0x425A68, 24)  # 'BZh'
    bw.write(0x30 + level, 8)
    bw.write(_BLOCK_MAGIC, 48)
    bw.write(crc, 32)
    bw.write(0, 1)  # randomized: never
    bw.write(orig_ptr, 24)
    # symbol map: 16 group bits, then 16 bits per used group
    groups_used = [0] * 16
    for b in used:
        groups_used[b >> 4] = 1
    for g in groups_used:
        bw.write(g, 1)
    for g in range(16):
        if groups_used[g]:
            for i in range(16):
                bw.write(1 if (g << 4) + i in set(used) else 0, 1)
    bw.write(2, 3)  # nGroups: the legal minimum, both tables identical
    bw.write(n_selectors, 15)
    for _ in range(n_selectors):
        bw.write(0, 1)  # selector 0 in unary-MTF ('0' terminator)
    for _ in range(2):  # two identical delta-coded tables
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
    bw.write(crc, 32)  # combined CRC of one block == its block CRC
    return bw.getvalue()


def _read_block(
    br: _BitReader, level: int, max_out: int | None = None
) -> bytes:
    crc_expected = br.read(32)
    if br.read(1):
        raise NotImplementedError(
            "randomized bzip2 blocks (deprecated since 0.9.5) are not decoded"
        )
    orig_ptr = br.read(24)
    groups_used = [br.read(1) for _ in range(16)]
    used: list[int] = []
    for g in range(16):
        if groups_used[g]:
            for i in range(16):
                if br.read(1):
                    used.append((g << 4) + i)
    if not used:
        raise ValueError("bzip2 block with an empty symbol map")
    n_groups = br.read(3)
    if not 2 <= n_groups <= 6:
        raise ValueError(f"bzip2 nGroups {n_groups} outside 2-6")
    n_selectors = br.read(15)
    if n_selectors == 0:
        raise ValueError("bzip2 block with zero selectors")
    sel_mtf = []
    for _ in range(n_selectors):
        j = 0
        while br.read(1):
            j += 1
            if j >= n_groups:
                raise ValueError("bzip2 selector exceeds nGroups")
        sel_mtf.append(j)
    order = list(range(n_groups))
    selectors = []
    for j in sel_mtf:
        order.insert(0, order.pop(j))
        selectors.append(order[0])

    nsyms = len(used) + 2
    tables = []
    for _ in range(n_groups):
        cur = br.read(5)
        lengths = []
        for _ in range(nsyms):
            while True:
                if not 1 <= cur <= _MAX_LEN:
                    raise ValueError(f"bzip2 code length {cur} outside 1-20")
                if not br.read(1):
                    break
                cur += -1 if br.read(1) else 1
            lengths.append(cur)
        tables.append(_decode_table(lengths, _canonical_codes(lengths)))

    eob = nsyms - 1
    syms: list[int] = []
    group_pos = 0
    count = 0
    by_len = tables[selectors[0]]
    while True:
        if count == 50:
            group_pos += 1
            if group_pos >= len(selectors):
                raise ValueError("bzip2 symbol stream overran its selectors")
            by_len = tables[selectors[group_pos]]
            count = 0
        s = _decode_symbol(br, by_len)
        count += 1
        syms.append(s)
        if s == eob:
            break

    # The BWT block (pre-RLE1 expansion) is hard-capped by the format
    # at 100_000·level bytes; _rle1_decode's own output is bounded
    # (≤ 259 output bytes per 5 input bytes) but that still amplifies
    # ~51x, so the caller's budget threads into the expansion itself.
    last = _mtf_rle2_decode(syms, used, eob, max_len=100_000 * level)
    block = _rle1_decode(_bwt_decode(last, orig_ptr), max_out)
    crc = bz2_crc32(block)
    if crc != crc_expected:
        raise ValueError(
            f"bzip2 block CRC mismatch: got {crc:08x}, header says "
            f"{crc_expected:08x}"
        )
    return block


def bz2_decompress(data: bytes, max_output: int | None = None) -> bytes:
    """Decompress a (possibly multi-stream, multi-block) bzip2 file,
    verifying every block CRC and each stream's combined CRC.

    ``max_output`` binds DURING decode (ADVICE r14): the remaining
    budget threads into each block's RLE1 expansion, so a hostile
    high-amplification stream raises before allocating past the cap
    rather than after a full decode."""
    out = bytearray()
    br = _BitReader(data)
    total_bits = len(data) * 8
    saw_stream = False
    while br.pos < total_bits:
        # streams are byte-aligned; trailing padding bits belong to
        # the previous stream
        if br.pos % 8:
            br.pos += 8 - br.pos % 8
        if total_bits - br.pos < 32:
            break
        if br.read(24) != 0x425A68:
            raise ValueError("bad bzip2 magic (expected 'BZh')")
        level = br.read(8) - 0x30
        if not 1 <= level <= 9:
            raise ValueError(f"bad bzip2 level byte {level + 0x30:#x}")
        saw_stream = True
        combined = 0
        while True:
            magic = br.read(48)
            if magic == _EOS_MAGIC:
                stored = br.read(32)
                if stored != combined:
                    raise ValueError(
                        f"bzip2 stream CRC mismatch: got {combined:08x}, "
                        f"footer says {stored:08x}"
                    )
                break
            if magic != _BLOCK_MAGIC:
                raise ValueError(f"bad bzip2 block magic {magic:012x}")
            remaining = (
                None if max_output is None else max_output - len(out)
            )
            block = _read_block(br, level, remaining)
            out += block
            combined = (
                ((combined << 1) & 0xFFFFFFFF) | (combined >> 31)
            ) ^ bz2_crc32(block)
    if not saw_stream:
        raise ValueError("no bzip2 stream found")
    return bytes(out)
