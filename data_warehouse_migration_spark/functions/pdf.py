"""PDF text extraction (ISO 32000 subset), from scratch — the
document format a real crawl corpus is full of: after HTML, PDF is
the largest text source in public web archives, and a training-data
pipeline that cannot lift text out of it loses that slice. The
reference warehouse has no document surface — north-star territory,
next to the HTML rung.

Implemented from the public spec alone:

- object grammar: dictionaries ``<< >>``, arrays, names ``/X``,
  numbers, literal strings ``( )`` with balanced parens and the
  escape table (``\\(`` ``\\)`` ``\\\\`` ``\\n`` ``\\r`` ``\\t``
  octal ``\\ddd``, line continuations), hex strings ``< >``,
  booleans/null, indirect references ``n g R``;
- file structure: ``startxref`` from the end, the cross-reference
  TABLE, trailer ``/Root``, the catalog → pages tree (recursive
  ``/Kids``) → per-page ``/Contents`` (single or array, direct or
  indirect), stream ``/Length`` possibly indirect;
- filters: ``FlateDecode`` via the engine's OWN RFC 1950/1951
  decoder (functions/png) — the same inflate the PNG/gzip/zip rungs
  attest — or no filter;
- content streams: the text-object operators ``BT``/``ET``,
  ``Tj``/``'``/``TJ`` (strings concatenate; TJ kerning numbers are
  positioning, not glyphs), with ``Td``/``TD``/``T*`` line moves
  emitting newlines — the layout-free extraction rule every
  pdftotext-style tool starts from;
- a WRITER emitting the same subset (xref offsets computed, Flate
  or plain streams), so both directions pin each other and the gate
  can synthesize per-document PDFs whose extracted text is a pure
  string formula.

Unsupported constructs RAISE (xref streams, object streams,
encryption, non-Flate filters) rather than mis-extracting.

Scale posture: per-document byte code inside Arrow-batched
``mapInPandas``; zero shuffle — the codec posture.
"""

from __future__ import annotations

import re

from data_warehouse_migration_spark.functions.png import (
    zlib_compress,
    zlib_decompress,
)

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


# --- object-level tokenizer / parser ----------------------------------------


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


class _Name(str):
    """A PDF name (/X) — distinct from a string value."""


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b"%":
            while i < n and data[i] not in b"\r\n":
                i += 1
        elif c in _WS:
            i += 1
        else:
            break
    return i


def _parse_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Literal string at ``data[i] == '('``: balanced parens + the
    escape table (§7.3.4.2)."""
    assert data[i : i + 1] == b"("
    i += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            e = data[i : i + 1]
            if e == b"n":
                out += b"\n"
            elif e == b"r":
                out += b"\r"
            elif e == b"t":
                out += b"\t"
            elif e == b"b":
                out += b"\b"
            elif e == b"f":
                out += b"\f"
            elif e in (b"(", b")", b"\\"):
                out += e
            elif e.isdigit():  # octal, up to 3 digits
                j = i
                while j < i + 3 and j < n and chr(data[j]).isdigit():
                    j += 1
                out.append(int(data[i:j], 8) & 0xFF)
                i = j - 1
            elif e in (b"\n", b"\r"):  # line continuation
                if e == b"\r" and data[i + 1 : i + 2] == b"\n":
                    i += 1
            else:
                out += e  # spec: stray backslash is dropped
            i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated PDF string")


def _parse_hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    end = data.index(b">", i + 1)
    hx = re.sub(rb"[\s]", b"", data[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"  # §7.3.4.3: odd final digit implies trailing 0
    return bytes.fromhex(hx.decode("ascii")), end + 1


_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")
_NAME_ESC = re.compile(rb"#([0-9A-Fa-f]{2})")


def _parse_object(data: bytes, i: int):
    """Parse one object at offset i → (value, next_offset)."""
    i = _skip_ws(data, i)
    c = data[i : i + 1]
    if c == b"<":
        if data[i + 1 : i + 2] == b"<":
            d: dict = {}
            i += 2
            while True:
                i = _skip_ws(data, i)
                if data[i : i + 2] == b">>":
                    return d, i + 2
                key, i = _parse_object(data, i)
                if not isinstance(key, _Name):
                    raise ValueError("dictionary key is not a name")
                val, i = _parse_object(data, i)
                d[str(key)] = val
        return _parse_hex_string(data, i)
    if c == b"(":
        return _parse_string(data, i)
    if c == b"/":
        j = i + 1
        n = len(data)
        while j < n and data[j] not in _WS and data[j : j + 1] not in _DELIM:
            j += 1
        raw = data[i + 1 : j]
        raw = _NAME_ESC.sub(lambda m: bytes([int(m.group(1), 16)]), raw)
        return _Name(raw.decode("latin-1")), j
    if c == b"[":
        arr = []
        i += 1
        while True:
            i = _skip_ws(data, i)
            if data[i : i + 1] == b"]":
                return arr, i + 1
            v, i = _parse_object(data, i)
            arr.append(v)
    for kw, val in ((b"true", True), (b"false", False), (b"null", None)):
        if data[i : i + len(kw)] == kw:
            return val, i + len(kw)
    m = _NUM_RE.match(data, i)
    if m:
        # maybe an indirect reference: <int> <int> R
        j = _skip_ws(data, m.end())
        m2 = _NUM_RE.match(data, j)
        if m2 and b"." not in m.group():
            k = _skip_ws(data, m2.end())
            if data[k : k + 1] == b"R" and (
                k + 1 >= len(data)
                or data[k + 1] in _WS
                or data[k + 1 : k + 2] in _DELIM
            ):
                return _Ref(int(m.group())), k + 1
        tok = m.group()
        return (float(tok) if b"." in tok else int(tok)), m.end()
    raise ValueError(f"unparseable PDF object at byte {i}: {c!r}")


# --- document reader ---------------------------------------------------------


def _png_unpredict(raw: bytes, columns: int) -> bytes:
    """PNG predictors 10-15 (§7.4.4.4): each row is a filter byte +
    ``columns`` data bytes, filtered exactly as PNG scanlines with
    bpp = 1. Reuses the spec arithmetic the PNG rung attests."""
    row_len = columns + 1
    if len(raw) % row_len:
        raise ValueError("predictor data is not a whole number of rows")
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(raw), row_len):
        ft = raw[r]
        row = bytearray(raw[r + 1 : r + row_len])
        if ft == 1:  # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(columns):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(columns):
                a = row[i - 1] if i else 0
                b, c = prev[i], (prev[i - 1] if i else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG predictor filter {ft}")
        out += row
        prev = row
    return bytes(out)


class _Pdf:
    def __init__(self, data: bytes):
        self.data = data
        if not data.startswith(b"%PDF-"):
            raise ValueError("missing %PDF header")
        at = data.rfind(b"startxref")
        if at < 0:
            raise ValueError("missing startxref")
        m = _NUM_RE.search(data, at + 9)
        self.offsets: dict[int, object] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._read_xref(int(m.group()))

    def _decode_stream_at(self, pos: int) -> tuple[dict, bytes]:
        """Parse ``num gen obj <<dict>> stream`` at ``pos`` and decode
        its body (used before the offsets table exists, so /Length
        must be direct here — xref streams guarantee that in
        practice; an indirect one raises loudly)."""
        data = self.data
        m = re.match(rb"\s*\d+\s+\d+\s+obj", data[pos : pos + 40])
        if not m:
            raise ValueError("xref stream not at its startxref offset")
        d, j = _parse_object(data, pos + m.end())
        j = _skip_ws(data, j)
        if data[j : j + 6] != b"stream":
            raise ValueError("expected a stream object")
        j += 6
        if data[j : j + 2] == b"\r\n":
            j += 2
        elif data[j : j + 1] == b"\n":
            j += 1
        length = d["Length"]
        if isinstance(length, _Ref):
            length = self.obj(length)
        raw = data[j : j + int(length)]
        return d, self._apply_filters(d, raw)

    def _apply_filters(self, d: dict, raw: bytes) -> bytes:
        filt = d.get("Filter")
        if filt is None:
            body = raw
        elif str(filt) == "FlateDecode":
            body = zlib_decompress(raw)
        else:
            raise ValueError(f"unsupported PDF filter {filt}")
        parms = d.get("DecodeParms")
        if isinstance(parms, dict):
            pred = int(parms.get("Predictor", 1))
            if pred >= 10:
                body = _png_unpredict(body, int(parms["Columns"]))
            elif pred != 1:
                raise ValueError(f"unsupported predictor {pred}")
        return body

    def _read_xref_stream(self, pos: int) -> None:
        d, body = self._decode_stream_at(pos)
        w = [int(x) for x in d["W"]]
        if len(w) != 3:
            raise ValueError("xref stream /W must have 3 entries")
        size = int(d["Size"])
        index = d.get("Index", [0, size])
        ew = sum(w)
        pairs = [
            (int(index[i]), int(index[i + 1]))
            for i in range(0, len(index), 2)
        ]
        at = 0
        for start, count in pairs:
            for k in range(count):
                if at + ew > len(body):
                    raise ValueError("xref stream shorter than /Index")
                fields = []
                for width in w:
                    fields.append(
                        int.from_bytes(body[at : at + width], "big")
                        if width
                        else None
                    )
                    at += width
                typ = fields[0] if w[0] else 1  # default type 1 per spec
                num = start + k
                if typ == 1:
                    self.offsets.setdefault(num, fields[1])
                elif typ == 2:
                    self.offsets.setdefault(
                        num, ("objstm", fields[1], fields[2])
                    )
        for k, v in d.items():
            if k not in ("W", "Index", "Filter", "DecodeParms", "Length",
                         "Type", "Size", "Prev"):
                self.trailer.setdefault(k, v)
        self.trailer.setdefault("Size", size)
        if "Prev" in d:
            self._read_xref(int(d["Prev"]))

    def _read_xref(self, pos: int) -> None:
        data = self.data
        pos = _skip_ws(data, pos)
        if data[pos : pos + 4] != b"xref":
            self._read_xref_stream(pos)
            return
        pos += 4
        while True:
            pos = _skip_ws(data, pos)
            if data[pos : pos + 7] == b"trailer":
                t, _ = _parse_object(data, pos + 7)
                for k, v in t.items():
                    self.trailer.setdefault(k, v)
                if "XRefStm" in t:  # hybrid-reference file (§7.5.8.4)
                    self._read_xref_stream(int(t["XRefStm"]))
                if "Prev" in t:
                    self._read_xref(int(t["Prev"]))
                return
            m = re.match(rb"(\d+)\s+(\d+)", data[pos : pos + 40])
            if not m:
                raise ValueError("malformed xref subsection header")
            start, count = int(m.group(1)), int(m.group(2))
            pos += m.end()
            pos = _skip_ws(data, pos)
            for k in range(count):
                entry = data[pos : pos + 20]
                if entry[17:18] == b"n":
                    self.offsets.setdefault(start + k, int(entry[:10]))
                pos += 20

    def _objstm_load(self, num: int) -> dict[int, object]:
        """Parse an object stream (§7.5.7): header = N (objnum,
        offset) pairs, objects start at /First."""
        o = self.obj(_Ref(num))
        if not (isinstance(o, tuple) and o[0] == "stream"):
            raise ValueError(f"object stream {num} is not a stream")
        d, body = o[1], o[2]
        first = int(self.obj(d["First"]))
        count = int(self.obj(d["N"]))
        out: dict[int, object] = {}
        at = 0
        for _ in range(count):
            m1 = _NUM_RE.match(body, _skip_ws(body, at))
            m2 = _NUM_RE.match(body, _skip_ws(body, m1.end()))
            at = m2.end()
            onum, ooff = int(m1.group()), int(m2.group())
            out[onum], _ = _parse_object(body, first + ooff)
        return out

    def obj(self, ref):
        if not isinstance(ref, _Ref):
            return ref
        if ref.num in self._cache:
            return self._cache[ref.num]
        at = self.offsets[ref.num]
        if isinstance(at, tuple):  # ("objstm", container, index)
            _, container, _idx = at
            for onum, oval in self._objstm_load(container).items():
                # every compressed sibling decodes in one pass
                if onum not in self._cache and isinstance(
                    self.offsets.get(onum), tuple
                ):
                    self._cache[onum] = oval
            return self._cache[ref.num]
        data = self.data
        m = re.match(rb"\s*\d+\s+\d+\s+obj", data[at : at + 40])
        if not m:
            raise ValueError(f"object {ref.num} not at its xref offset")
        val, j = _parse_object(data, at + m.end())
        j = _skip_ws(data, j)
        if data[j : j + 6] == b"stream":
            j += 6
            if data[j : j + 2] == b"\r\n":
                j += 2
            elif data[j : j + 1] == b"\n":
                j += 1
            length = self.obj(val["Length"])
            raw = data[j : j + int(length)]
            val = ("stream", val, self._apply_filters(val, raw))
        self._cache[ref.num] = val
        return val

    def page_streams(self) -> list[bytes]:
        root = self.obj(self.trailer["Root"])
        if isinstance(root, tuple):
            raise ValueError("catalog must be a dictionary")
        out: list[bytes] = []

        def walk(node_ref) -> None:
            node = self.obj(node_ref)
            t = str(node.get("Type", ""))
            if t == "Pages":
                for kid in node["Kids"]:
                    walk(kid)
            elif t == "Page":
                contents = node.get("Contents")
                if contents is None:
                    out.append(b"")
                    return
                parts = contents if isinstance(contents, list) else [contents]
                body = b""
                for p in parts:
                    o = self.obj(p)
                    if not (isinstance(o, tuple) and o[0] == "stream"):
                        raise ValueError("page Contents is not a stream")
                    body += o[2]
                out.append(body)
            else:
                raise ValueError(f"unexpected pages-tree node type {t!r}")

        walk(root["Pages"])
        return out


_TEXT_OPS = {"Tj", "'", "TJ"}
_LINE_OPS = {"Td", "TD", "T*"}


def _extract_stream_text(content: bytes) -> list[str]:
    """Walk a content stream's tokens; strings shown by Tj/'/TJ
    append to the current line, Td/TD/T*/' start a new one. Returns
    the lines (the pdftotext-style layout-free reading)."""
    lines: list[str] = []
    cur: list[str] = []
    stack: list = []
    i = 0
    n = len(content)

    def flush() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        c = content[i : i + 1]
        if c == b"(" or c == b"<" or c == b"[" or c == b"/" or (
            c.isdigit() or c in b"+-."
        ):
            v, i = _parse_object(content, i)
            stack.append(v)
            continue
        j = i
        while j < n and content[j] not in _WS and content[j : j + 1] not in _DELIM:
            j += 1
        op = content[i:j].decode("latin-1")
        i = j if j > i else i + 1
        if op in _LINE_OPS:
            flush()
        elif op == "'":
            flush()
            if stack and isinstance(stack[-1], bytes):
                cur.append(stack[-1].decode("latin-1"))
        elif op == "Tj":
            if stack and isinstance(stack[-1], bytes):
                cur.append(stack[-1].decode("latin-1"))
        elif op == "TJ":
            if stack and isinstance(stack[-1], list):
                for item in stack[-1]:
                    if isinstance(item, bytes):
                        cur.append(item.decode("latin-1"))
                    elif isinstance(item, (int, float)) and item < -180:
                        # a kern wider than ~0.18 em is an inter-word
                        # gap (the pdftotext convention) — TeX and
                        # subset-font PDFs encode spaces this way
                        cur.append(" ")
        elif op == "ET":
            flush()
        stack.clear()  # operands are consumed by their operator
    flush()
    return lines


def pdf_extract_text(data: bytes) -> str:
    """All pages' text, lines joined by ``\\n``, pages by ``\\f``."""
    pdf = _Pdf(data)
    pages = [
        "\n".join(_extract_stream_text(s)) for s in pdf.page_streams()
    ]
    return "\f".join(pages)


# --- writer ------------------------------------------------------------------


def _escape_string(s: bytes) -> bytes:
    return (
        s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def build_pdf(pages: list[list[str]], flate: bool = True) -> bytes:
    """A well-formed single-xref PDF: one content stream per page,
    one line per list item (positioned via ``Td``), Helvetica, with
    ``FlateDecode`` streams when ``flate`` (the engine's own
    deflate). The extracted text of the result is exactly
    ``'\\n'.join(lines)`` per page — the identity the gate rides."""
    objects: list[bytes] = []  # 1-indexed

    def content_for(lines: list[str]) -> bytes:
        ops = [b"BT /F1 12 Tf 72 760 Td"]
        for k, line in enumerate(lines):
            if k:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _escape_string(line.encode("latin-1")) + b") Tj")
        ops.append(b"ET")
        return b"\n".join(ops)

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, lines in enumerate(pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {4 + 2 * i} 0 R >>"
            ).encode()
        )
        raw = content_for(lines)
        if flate:
            body = zlib_compress(raw, "dynamic")
            objects.append(
                f"<< /Length {len(body)} /Filter /FlateDecode >>\nstream\n".encode()
                + body
                + b"\nendstream"
            )
        else:
            objects.append(
                f"<< /Length {len(raw)} >>\nstream\n".encode()
                + raw
                + b"\nendstream"
            )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
