"""SQLite database FILE decoding from scratch — the container format
many real corpora ship in (app exports, annotation dumps, scraped
archives arrive as ``.sqlite``/``.db`` blobs beside the zip/tar/
WARC/TFRecord rungs already here). At 100 TB these are per-asset
binary columns: parse the page structure straight from bytes inside
Arrow-batched ``mapInPandas`` — no temp files, no per-asset
connection churn, stream tables page-by-page — with the stdlib
``sqlite3`` module as the in-container reference implementation
(fixtures authored by it, every decoded row cross-checked against
its SELECT output, the same adjudication pattern as CPython zipfile
for ZIP and libbrotli for brotli).

Implemented per the public file-format spec (sqlite.org/fileformat2):

- the 100-byte header: magic, page size (including the 1 == 65536
  encoding), usable-size reservation, text encoding (UTF-8 /
  UTF-16le / UTF-16be), schema format, page count;
- b-tree pages 0x05/0x0d (table interior/leaf) with cell pointer
  arrays, 4-byte child pointers + the rightmost pointer, in-order
  traversal;
- the record format: header of serial types, NULL / 1-8 byte
  big-endian two's-complement ints / float64 / the schema-format-4
  constants 0 and 1 / blob / text in the header's declared encoding;
- varints (1-9 bytes, 7-bit big-endian groups, 9th byte whole);
- payload overflow: the leaf spill formula (X = U-35,
  M = (U-12)*32/255 - 23, K = M + (P-M) % (U-4)) and the 4-byte
  linked overflow chain, cycle-guarded;
- ``sqlite_schema`` (root page 1, where the content area starts at
  offset 100) → named table root pages → full scans in rowid order;
- INTEGER PRIMARY KEY rowid aliasing: the aliased column is stored
  as NULL in the record and materialized from the cell's rowid, so
  decoded rows match the reference engine's SELECT output.

Honest capability boundaries (quarantine-routable raises, the
engine's standard posture): ``WITHOUT ROWID`` tables (index-b-tree
storage), write-ahead-log sidecars (a ``-wal`` file cannot be
reconstructed from the main database bytes alone; files shipped as
data assets are checkpointed), and non-db-image inputs.

Untrusted-input hygiene: every offset/length/pointer is
bounds-checked, overflow chains carry a visited set and the declared
payload length caps reads, truncation raises ValueError, and
``max_rows``/decode caps keep a hostile page graph from looping or
over-allocating.

Scale posture: pure per-asset byte code, zero shuffle; the natural
split unit is the TABLE (one (asset, table) pair per task via the
schema listing, each walking only its own b-tree pages).
"""

from __future__ import annotations

import re
import struct

_MAGIC = b"SQLite format 3\x00"
_ENCODINGS = {1: "utf-8", 2: "utf-16-le", 3: "utf-16-be"}


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    """SQLite varint: up to 8 bytes of 7-bit big-endian groups, a
    9th byte contributing all 8 bits. Returns (value, next_pos)."""
    result = 0
    for i in range(8):
        if pos + i >= len(data):
            raise ValueError("sqlite varint truncated")
        b = data[pos + i]
        if b < 0x80:
            return (result << 7) | b, pos + i + 1
        result = (result << 7) | (b & 0x7F)
    if pos + 8 >= len(data):
        raise ValueError("sqlite varint truncated")
    return (result << 8) | data[pos + 8], pos + 9


class _Db:
    """Parsed header + page accessor over one database image."""

    __slots__ = ("data", "page_size", "usable", "encoding", "n_pages")

    def __init__(self, data: bytes):
        if len(data) < 100 or data[:16] != _MAGIC:
            raise ValueError("not a SQLite database image")
        page_size = struct.unpack_from(">H", data, 16)[0]
        if page_size == 1:
            page_size = 65536
        if page_size < 512 or page_size & (page_size - 1):
            raise ValueError(f"sqlite page size {page_size} invalid")
        reserved = data[20]
        usable = page_size - reserved
        if usable < 480:
            raise ValueError("sqlite usable page size under the 480 floor")
        enc_code = struct.unpack_from(">I", data, 56)[0]
        if enc_code not in _ENCODINGS:
            raise ValueError(f"sqlite text encoding code {enc_code} invalid")
        n_pages = struct.unpack_from(">I", data, 28)[0]
        # legacy images may leave the header page count stale; the
        # file length is authoritative per the spec's validity rule
        if n_pages == 0 or n_pages * page_size > len(data):
            n_pages = len(data) // page_size
        if len(data) < page_size:
            raise ValueError("sqlite image shorter than one page")
        self.data = data
        self.page_size = page_size
        self.usable = usable
        self.encoding = _ENCODINGS[enc_code]
        self.n_pages = n_pages

    def page(self, number: int) -> tuple[int, int]:
        """(start offset, content offset) for a 1-based page number;
        page 1's content area begins after the 100-byte header."""
        if not 1 <= number <= self.n_pages:
            raise ValueError(f"sqlite page {number} out of range")
        start = (number - 1) * self.page_size
        return start, start + (100 if number == 1 else 0)


def _read_payload(db: _Db, page_start: int, cell: int,
                  payload_len: int, local: int) -> bytes:
    """Local prefix + the overflow chain (4-byte next pointers),
    cycle-guarded, length-capped by the declared payload size."""
    data = db.data
    if cell + local > page_start + db.page_size:
        raise ValueError("sqlite cell payload exceeds its page")
    payload = data[cell : cell + local]
    if local >= payload_len:
        return payload[:payload_len]
    next_ptr = struct.unpack_from(">I", data, cell + local)[0]
    out = [payload]
    got = local
    seen: set[int] = set()
    per_page = db.usable - 4
    while got < payload_len:
        if next_ptr == 0:
            raise ValueError("sqlite overflow chain ends early")
        if next_ptr in seen:
            raise ValueError("sqlite overflow chain loops")
        seen.add(next_ptr)
        start, _ = db.page(next_ptr)
        next_ptr = struct.unpack_from(">I", data, start)[0]
        take = min(per_page, payload_len - got)
        out.append(data[start + 4 : start + 4 + take])
        got += take
    return b"".join(out)


def _decode_record(db: _Db, payload: bytes) -> list:
    """The record format: a varint header of serial types, then the
    column bodies in order."""
    hdr_len, pos = _varint(payload, 0)
    if hdr_len > len(payload):
        raise ValueError("sqlite record header exceeds payload")
    serials = []
    while pos < hdr_len:
        st, pos = _varint(payload, pos)
        serials.append(st)
    if pos != hdr_len:
        raise ValueError("sqlite record header length mismatch")
    values = []
    body = hdr_len
    for st in serials:
        if st == 0:
            values.append(None)
        elif 1 <= st <= 6:
            n = (1, 2, 3, 4, 6, 8)[st - 1]
            if body + n > len(payload):
                raise ValueError("sqlite record integer truncated")
            values.append(
                int.from_bytes(payload[body : body + n], "big", signed=True)
            )
            body += n
        elif st == 7:
            if body + 8 > len(payload):
                raise ValueError("sqlite record float truncated")
            values.append(struct.unpack_from(">d", payload, body)[0])
            body += 8
        elif st in (8, 9):
            values.append(st - 8)
        elif st >= 12:
            n = (st - 12) // 2
            if body + n > len(payload):
                raise ValueError("sqlite record body truncated")
            raw = payload[body : body + n]
            body += n
            if st % 2:  # odd: text in the header's encoding
                try:
                    values.append(raw.decode(db.encoding))
                except UnicodeDecodeError as exc:
                    raise ValueError(f"sqlite text not {db.encoding}: {exc}")
            else:
                values.append(raw)
        else:
            raise ValueError(f"sqlite serial type {st} reserved")
    return values


def _walk_table(db: _Db, page_no: int, out: list,
                max_rows: int | None, depth: int = 0) -> None:
    """In-order traversal of a table b-tree: rowid-ordered rows of
    (rowid, record values)."""
    if depth > 40:  # a 2^40-page tree cannot be legitimate
        raise ValueError("sqlite b-tree deeper than sane bound")
    data = db.data
    start, content = db.page(page_no)
    if content >= len(data):
        raise ValueError("sqlite page header out of range")
    ptype = data[content]
    n_cells = struct.unpack_from(">H", data, content + 3)[0]
    if ptype == 0x05:  # interior table page
        header_len = 12
        rightmost = struct.unpack_from(">I", data, content + 8)[0]
        cells_at = content + header_len
        for i in range(n_cells):
            if max_rows is not None and len(out) >= max_rows:
                return
            off = struct.unpack_from(">H", data, cells_at + 2 * i)[0]
            cell = start + off
            if not content + header_len <= cell < start + db.page_size:
                raise ValueError("sqlite interior cell pointer out of page")
            child = struct.unpack_from(">I", data, cell)[0]
            _walk_table(db, child, out, max_rows, depth + 1)
        if max_rows is None or len(out) < max_rows:
            _walk_table(db, rightmost, out, max_rows, depth + 1)
        return
    if ptype != 0x0D:  # not a table leaf
        if ptype in (0x02, 0x0A):
            raise ValueError("sqlite index b-tree where table expected")
        raise ValueError(f"sqlite page type 0x{ptype:02x} invalid")
    header_len = 8
    cells_at = content + header_len
    usable_end = start + db.usable
    x = db.usable - 35
    m = (db.usable - 12) * 32 // 255 - 23
    for i in range(n_cells):
        if max_rows is not None and len(out) >= max_rows:
            return
        off = struct.unpack_from(">H", data, cells_at + 2 * i)[0]
        cell = start + off
        if not cells_at + 2 * n_cells <= cell < usable_end:
            raise ValueError("sqlite leaf cell pointer out of page")
        payload_len, pos = _varint(data, cell)
        rowid, pos = _varint(data, pos)
        if payload_len <= x:
            local = payload_len
        else:
            k = m + (payload_len - m) % (db.usable - 4)
            local = k if k <= x else m
        payload = _read_payload(db, start, pos, payload_len, local)
        out.append((rowid, _decode_record(db, payload)))


def sqlite_tables(data: bytes) -> list[dict]:
    """The ``sqlite_schema`` listing: one dict per schema row with
    ``type``/``name``/``tbl_name``/``rootpage``/``sql`` — tables,
    indexes, views, triggers as the reference engine lists them."""
    db = _Db(bytes(data))
    rows: list = []
    try:
        _walk_table(db, 1, rows, None)
    except struct.error as exc:  # a read crossing the file end
        raise ValueError(f"sqlite structure truncated: {exc}") from exc
    out = []
    for _rowid, values in rows:
        if len(values) != 5:
            raise ValueError("sqlite schema row does not have 5 columns")
        out.append(dict(zip(
            ("type", "name", "tbl_name", "rootpage", "sql"), values
        )))
    return out


_ROWID_ALIAS = re.compile(
    r"^\s*[\"\[`]?(\w+)[\"\]`]?\s+INTEGER\s+PRIMARY\s+KEY", re.IGNORECASE)
_CONSTRAINT = re.compile(
    r"^\s*(CONSTRAINT|PRIMARY\s+KEY|UNIQUE|CHECK|FOREIGN\s+KEY)\b",
    re.IGNORECASE)


def _column_defs(sql: str | None) -> list[str]:
    """The CREATE TABLE body split into top-level comma-separated
    definitions, table-level constraint clauses dropped — enough DDL
    reading for rowid aliasing and the column count; the differential
    tests pin the supported shapes."""
    if not sql:
        return []
    lparen = sql.find("(")
    if lparen < 0:
        return []
    body = sql[lparen + 1 : sql.rfind(")")]
    depth = 0
    defs, cur = [], []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            defs.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    defs.append("".join(cur))
    return [d for d in defs if d.strip() and not _CONSTRAINT.match(d)]


def _rowid_alias_index(sql: str | None) -> int | None:
    """Which column (if any) is the INTEGER PRIMARY KEY rowid alias:
    such a column is written as NULL in records and its value IS the
    cell rowid. Column-level declarations only (the overwhelmingly
    common shape); exotic table-level forms find no alias."""
    for i, col in enumerate(_column_defs(sql)):
        if _ROWID_ALIAS.match(col):
            return i
    return None


def sqlite_rows(
    data: bytes, table: str, max_rows: int | None = None
) -> list[tuple]:
    """Full scan of ``table`` in rowid order, decoded exactly as the
    reference engine's ``SELECT *`` returns it (rowid aliasing
    applied, missing trailing columns — rows written before an ALTER
    TABLE ADD COLUMN — padded with None)."""
    db = _Db(bytes(data))
    schema: list = []
    try:
        _walk_table(db, 1, schema, None)
    except struct.error as exc:
        raise ValueError(f"sqlite structure truncated: {exc}") from exc
    for _rowid, values in schema:
        if len(values) == 5 and values[0] == "table" and values[1] == table:
            sql = values[4]
            if sql and re.search(r"WITHOUT\s+ROWID", sql, re.IGNORECASE):
                raise NotImplementedError(
                    "sqlite WITHOUT ROWID tables (index-b-tree storage) "
                    "are not decoded"
                )
            rootpage = values[3]
            break
    else:
        raise ValueError(f"sqlite table {table!r} not in sqlite_schema")
    if not isinstance(rootpage, int) or rootpage <= 0:
        raise ValueError("sqlite schema rootpage invalid")
    alias = _rowid_alias_index(sql)
    n_cols = len(_column_defs(sql)) or None
    raw: list = []
    try:
        _walk_table(db, rootpage, raw, max_rows)
    except struct.error as exc:  # a read crossing the file end
        raise ValueError(f"sqlite structure truncated: {exc}") from exc
    out = []
    for rowid, values in raw:
        if alias is not None and alias < len(values) and values[alias] is None:
            values = list(values)
            values[alias] = rowid
        if n_cols is not None and len(values) < n_cols:
            values = list(values) + [None] * (n_cols - len(values))
        out.append(tuple(values))
    return out


def sqlite_rows_native(data: bytes, table: str) -> list[tuple]:
    """The native twin (the codec-seam pattern): same contract
    through the stdlib reference engine via a temp file — the
    production tier a cluster would use, and the adjudicator the
    differential tests compare the from-scratch parser against."""
    import os
    import sqlite3
    import tempfile

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
        raise ValueError(f"sqlite table name {table!r} not an identifier")
    fd, path = tempfile.mkstemp(suffix=".sqlite")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(bytes(data))
        con = sqlite3.connect(path)
        try:
            con.text_factory = str
            return [
                tuple(r) for r in
                con.execute(f'SELECT * FROM "{table}" ORDER BY rowid')
            ]
        finally:
            con.close()
    finally:
        os.unlink(path)
