"""URL canonicalization (RFC 3986 §6), from scratch — the crawl
frontier's dedup key: the same resource hides behind case-varied
hosts, default ports, dot-segments, stray percent-encodings, and
fragment noise, and every crawl pipeline normalizes URLs before
frontier dedup and after-the-fact source analysis. The reference
warehouse has no URL surface — north-star territory, next to the
HTML rung.

Implemented from the RFC alone (syntax-based normalization §6.2.2 +
scheme-based §6.2.3):

- case: scheme and host lowercase; percent-triplet hex UPPERCASE;
- percent-encoding: decode UNRESERVED octets (ALPHA / DIGIT / ``-``
  ``.`` ``_`` ``~``) — ``%41`` → ``A``; reserved or other octets
  keep their triplets (``%2F`` stays — decoding it would change the
  path structure); malformed triplets pass through literally;
- path: dot-segment removal via the RFC's remove_dot_segments
  algorithm (``/a/b/../c/./d`` → ``/a/c/d``), empty path → ``/``
  when an authority is present;
- port: default ports dropped (http:80, https:443), empty port
  dropped;
- authority: the ``//`` is emitted iff the input HAD an authority
  component — ``http:page`` (authority-less, dirty crawl input)
  stays authority-less instead of promoting its first path segment
  to a host (ADVICE r11);
- query: kept byte-for-byte by default; ``sort_query=True``
  additionally orders ``&``-separated parameters by key (NOT part
  of the RFC — a crawl-dedup convention that merges param-order
  duplicates; off by default because it can change semantics);
- fragment: dropped (never sent to the server).

Plain string functions — usable inside any Spark pipeline via a
``pandas_udf``/``mapInPandas`` seam or driver-side; the gate runs
them through the same Arrow-batched shape as the other extraction
operators.
"""

from __future__ import annotations

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def _norm_percent(s: str) -> str:
    """Uppercase percent triplets and decode unreserved octets;
    malformed triplets stay literal."""
    out = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "%" and i + 2 < n + 1 and i + 3 <= n:
            hx = s[i + 1 : i + 3]
            if len(hx) == 2 and all(c in "0123456789abcdefABCDEF" for c in hx):
                octet = int(hx, 16)
                if chr(octet) in _UNRESERVED:
                    out.append(chr(octet))
                else:
                    out.append("%" + hx.upper())
                i += 3
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4, the buffer algorithm verbatim."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            # move the first segment (through the next '/') to output
            cut = inp.find("/", 1)
            if inp.startswith("/"):
                seg, inp = (inp[:cut], inp[cut:]) if cut != -1 else (inp, "")
            else:
                cut0 = inp.find("/")
                seg, inp = (
                    (inp[:cut0], inp[cut0:]) if cut0 != -1 else (inp, "")
                )
            out.append(seg)
    return "".join(out)


def split_url(url: str) -> tuple[str, str, str, str, str]:
    """Split into (scheme, authority, path, query, fragment) per the
    RFC's component grammar (no validation — crawl input is dirty)."""
    return _split_url_auth(url)[:5]


def _split_url_auth(url: str) -> tuple[str, str, str, str, str, bool]:
    """``split_url`` plus a ``had_authority`` flag: an authority-less
    URL of a known scheme (``http:page`` — dirty but real crawl
    input) must NOT grow a fabricated ``//`` authority on
    canonicalization, and the empty-authority form (``file:///x``)
    must keep its ``//`` — distinctions the 5-tuple alone loses
    (ADVICE r11)."""
    rest = url
    fragment = ""
    if "#" in rest:
        rest, fragment = rest.split("#", 1)
    query = ""
    if "?" in rest:
        rest, query = rest.split("?", 1)
    scheme = ""
    if ":" in rest:
        cand, after = rest.split(":", 1)
        if cand and cand[0].isalpha() and all(
            c.isalnum() or c in "+-." for c in cand
        ):
            scheme, rest = cand, after
    authority = ""
    had_authority = rest.startswith("//")
    if had_authority:
        rest = rest[2:]
        cut = len(rest)
        for ch in "/":
            k = rest.find(ch)
            if k != -1:
                cut = min(cut, k)
        authority, rest = rest[:cut], rest[cut:]
    return scheme, authority, rest, query, fragment, had_authority


def canonicalize_url(url: str, sort_query: bool = False) -> str:
    """Full RFC 3986 §6 syntax + scheme normalization; see module
    docstring for the exact rule set."""
    scheme, authority, path, query, _frag, had_auth = _split_url_auth(
        url.strip()
    )
    scheme = scheme.lower()

    userinfo = ""
    hostport = authority
    if "@" in authority:
        userinfo, hostport = authority.rsplit("@", 1)
    host, port = hostport, ""
    if host.startswith("["):  # IPv6 literal
        end = host.find("]")
        if end != -1 and end + 1 < len(host) and host[end + 1] == ":":
            host, port = host[: end + 1], host[end + 2 :]
    elif ":" in host:
        host, port = host.rsplit(":", 1)
    host = _norm_percent(host.lower())
    if port == _DEFAULT_PORTS.get(scheme, None) or port == "":
        port = ""
    auth = (userinfo + "@" if userinfo else "") + host + (
        ":" + port if port else ""
    )

    path = remove_dot_segments(_norm_percent(path))
    if auth and not path:
        path = "/"

    query = _norm_percent(query)
    if sort_query and query:
        query = "&".join(
            sorted(query.split("&"), key=lambda p: p.split("=", 1)[0])
        )

    out = ""
    if scheme:
        out += scheme + ":"
    if had_auth:
        out += "//" + auth
    out += path
    if query:
        out += "?" + query
    return out
