"""Internet message (RFC 5322) + MIME (RFC 2045-2046) parsing, from
scratch — the mailing-list / email slice of a public text corpus
(mbox archives are a classic pretraining source) and the multipart
grammar half the web's POST bodies use. The engine carries its own
base64 and quoted-printable codecs (both directions), header
unfolding, Content-Type parameter parsing, and recursive multipart
splitting; CPython's ``email``/``binascii`` are the independent
references in tests, never imported here.

Scale posture: per-message byte code inside Arrow-batched
``mapInPandas``; zero shuffle — one mbox file splits at ``From ``
lines, one message is one row.
"""

from __future__ import annotations

_B64_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
)
_B64_INDEX = {c: i for i, c in enumerate(_B64_ALPHABET)}


def base64_encode(raw: bytes, wrap: int = 76) -> str:
    """RFC 2045 §6.8: 3 octets → 4 chars, ``=`` padding, folded at
    ``wrap`` chars (0 = no folding)."""
    out = []
    for i in range(0, len(raw), 3):
        chunk = raw[i : i + 3]
        n = int.from_bytes(chunk.ljust(3, b"\x00"), "big")
        q = [
            _B64_ALPHABET[(n >> 18) & 63],
            _B64_ALPHABET[(n >> 12) & 63],
            _B64_ALPHABET[(n >> 6) & 63],
            _B64_ALPHABET[n & 63],
        ]
        if len(chunk) < 3:
            q[3] = "="
        if len(chunk) < 2:
            q[2] = "="
        out.append("".join(q))
    s = "".join(out)
    if wrap:
        s = "\r\n".join(s[i : i + wrap] for i in range(0, len(s), wrap))
    return s


def base64_decode(text: str) -> bytes:
    """Whitespace-tolerant (folded bodies), strict on alphabet."""
    clean = [c for c in text if c not in " \t\r\n"]
    while clean and clean[-1] == "=":
        clean.pop()
    out = bytearray()
    acc = bits = 0
    for c in clean:
        if c not in _B64_INDEX:
            raise ValueError(f"invalid base64 character {c!r}")
        acc = (acc << 6) | _B64_INDEX[c]
        bits += 6
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    return bytes(out)


def qp_encode(raw: bytes, wrap: int = 76) -> str:
    """Quoted-printable (RFC 2045 §6.7): ``=XX`` for ``=``, controls
    and 8-bit octets; trailing space/tab protected; soft breaks keep
    lines ≤ ``wrap``."""
    body = []
    for i, b in enumerate(raw):
        c = chr(b)
        literal = (32 <= b <= 126 and c != "=") or c in "\t"
        if c in " \t" and (i + 1 == len(raw) or raw[i + 1 : i + 2] == b"\n"):
            literal = False  # trailing whitespace must be encoded
        if c == "\n":
            body.append("\r\n")
        elif literal:
            body.append(c)
        else:
            body.append(f"={b:02X}")
    # soft line breaks
    lines_out = []
    for line in "".join(body).split("\r\n"):
        while len(line) > wrap:
            cut = wrap - 1
            if "=" in line[cut - 2 : cut]:  # never split an =XX triplet
                cut -= 2
            lines_out.append(line[:cut] + "=")
            line = line[cut:]
        lines_out.append(line)
    return "\r\n".join(lines_out)


def qp_decode(text: str) -> bytes:
    out = bytearray()
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "=":
            nxt = text[i + 1 : i + 3]
            if nxt[:1] == "\r" or nxt[:1] == "\n":  # soft break
                i += 2 if nxt[:2] == "\r\n" else 1
                i += 1
                continue
            if len(nxt) < 2:
                raise ValueError("truncated quoted-printable escape")
            out.append(int(nxt, 16))
            i += 3
        elif c == "\r" and text[i + 1 : i + 2] == "\n":
            out.append(0x0A)  # canonical CRLF → \n
            i += 2
        else:
            out.append(ord(c))
            i += 1
    return bytes(out)


def parse_headers(raw: str) -> tuple[list[tuple[str, str]], str]:
    """RFC 5322 header block → ([(name, unfolded value)], body).
    Folding (continuation lines starting with WSP) is unfolded to a
    single space; the blank line separates headers from body."""
    if raw.startswith("\r\n"):
        return [], raw[2:]  # empty header block (RFC 2046 parts)
    if raw.startswith("\n"):
        return [], raw[1:]
    if "\r\n\r\n" in raw:
        head, body = raw.split("\r\n\r\n", 1)
        lines = head.split("\r\n")
    else:
        head, _, body = raw.partition("\n\n")
        lines = head.split("\n")
    headers: list[tuple[str, str]] = []
    for ln in lines:
        if not ln:
            continue
        if ln[0] in " \t":
            if not headers:
                raise ValueError("continuation line before any header")
            name, val = headers[-1]
            headers[-1] = (name, val + " " + ln.strip())
        else:
            name, sep, val = ln.partition(":")
            if not sep:
                raise ValueError(f"malformed header line {ln!r}")
            headers.append((name.strip(), val.strip()))
    return headers, body


def header(headers: list[tuple[str, str]], name: str) -> str | None:
    for k, v in headers:
        if k.lower() == name.lower():
            return v
    return None


def parse_content_type(value: str | None) -> tuple[str, dict[str, str]]:
    """``type/subtype; key=value; key="quoted"`` → (lowered type,
    params). Defaults to text/plain per RFC 2045 §5.2."""
    if not value:
        return "text/plain", {}
    # split on ';' OUTSIDE quoted-strings (boundary="a;b" is legal)
    parts: list[str] = []
    cur: list[str] = []
    in_q = False
    for ch in value:
        if ch == '"':
            in_q = not in_q
            cur.append(ch)
        elif ch == ";" and not in_q:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    ctype = parts[0].strip().lower()
    params: dict[str, str] = {}
    for p in parts[1:]:
        k, sep, v = p.partition("=")
        if not sep:
            continue
        v = v.strip()
        if v[:1] == '"' and v[-1:] == '"':
            v = v[1:-1]
        params[k.strip().lower()] = v
    return ctype, params


def decode_body(headers: list[tuple[str, str]], body: str) -> bytes:
    cte = (header(headers, "Content-Transfer-Encoding") or "7bit").lower()
    if cte in ("7bit", "8bit", "binary"):
        return body.encode("latin-1")
    if cte == "base64":
        return base64_decode(body)
    if cte == "quoted-printable":
        return qp_decode(body)
    raise ValueError(f"unsupported Content-Transfer-Encoding {cte!r}")


def parse_message(raw: str) -> dict:
    """→ ``{'headers', 'content_type', 'params', 'parts' | 'body'}``
    with multipart/* recursed (preamble/epilogue dropped per RFC
    2046 §5.1.1; a missing terminal boundary raises)."""
    headers, body = parse_headers(raw)
    ctype, params = parse_content_type(header(headers, "Content-Type"))
    out = {"headers": headers, "content_type": ctype, "params": params}
    if ctype.startswith("multipart/"):
        boundary = params.get("boundary")
        if not boundary:
            raise ValueError("multipart without a boundary parameter")
        delim = "--" + boundary
        chunks = body.split(delim)
        if not any(c.startswith("--") for c in chunks[1:]):
            raise ValueError("multipart terminal boundary missing")
        parts = []
        for chunk in chunks[1:]:
            if chunk.startswith("--"):
                break  # terminal delimiter; epilogue follows
            # strip exactly the CRLF ending the boundary line and the
            # one preceding the next delimiter — a part may START with
            # its own blank line (empty header block), which a greedy
            # lstrip would swallow
            if chunk.startswith("\r\n"):
                chunk = chunk[2:]
            elif chunk.startswith("\n"):
                chunk = chunk[1:]
            if chunk.endswith("\r\n"):
                chunk = chunk[:-2]
            elif chunk.endswith("\n"):
                chunk = chunk[:-1]
            parts.append(parse_message(chunk))
        out["parts"] = parts
    else:
        out["body"] = decode_body(headers, body)
    return out


# --- mbox (RFC 4155, mboxrd quoting) -----------------------------------------


def mbox_join(messages: list[str]) -> str:
    """An mbox file from raw RFC 5322 messages: each preceded by a
    ``From `` separator line, body lines that could be mistaken for
    one quoted with ``>`` (mboxrd: ALL ``>*From `` lines gain one
    more ``>``, so unquoting is lossless — the property mboxo
    lacks)."""
    out = []
    for i, msg in enumerate(messages):
        out.append(f"From MAILER-DAEMON Thu Jan  1 00:00:0{i % 10} 1970")
        for line in msg.split("\n"):
            if line.lstrip(">").startswith("From "):
                line = ">" + line
            out.append(line)
    return "\n".join(out) + "\n"


def mbox_split(data: str) -> list[str]:
    """Split an mbox file into raw messages, reversing the mboxrd
    quoting. Content before the first ``From `` line raises — a
    valid mbox starts with a separator."""
    lines = data.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    messages: list[list[str]] = []
    for ln in lines:
        if ln.startswith("From "):
            messages.append([])
            continue
        if not messages:
            raise ValueError("mbox content before the first From_ line")
        if ln.lstrip(">").startswith("From "):
            ln = ln[1:]  # undo one level of mboxrd quoting
        messages[-1].append(ln)
    return ["\n".join(m) for m in messages]
