"""HTML → text extraction, from scratch — the crawl-ingest rung of
the text pipeline: every web-scale training corpus starts as HTML,
and the first operator it meets is tag-aware text extraction with
boilerplate signals (the trafilatura/jusText role). The reference
warehouse has no text-extraction surface at all — north-star
territory, like the codec rungs.

One-pass lexer over the markup (no DOM, no recursion — a crawl page
can be megabytes and malformed):

- tags with QUOTED attributes (a ``>`` inside ``href="a>b"`` must
  not close the tag), self-closing forms, case-insensitive names;
- ``<!-- comments -->`` (tags inside them are inert), ``<!DOCTYPE``/
  ``<![CDATA[``/``<?...`` declarations;
- RAW-TEXT elements (``script``/``style``/``textarea``/``title`` per
  the HTML5 parsing spec's raw-text/RCDATA rules): content runs to
  the matching case-insensitive close tag — an ``if (a < b)`` inside
  a script must not open a tag; script/style content is DROPPED,
  title/textarea content is text;
- character references: decimal ``&#65;``, hex ``&#x41;``, and the
  core named set (``amp lt gt quot apos nbsp``); unknown or
  unterminated references stay literal, as browsers do;
- BLOCK segmentation: the HTML block-level tags (``p div br li tr
  h1-h6 ...``) flush the current text block, inline tags don't —
  giving the block list that boilerplate heuristics score;
- link-density per block (chars inside ``<a>`` / total), THE
  classic boilerplate signal (Kohlschütter et al.): navigation and
  footer blocks are link-dominated, body prose is not.

Scale posture: extraction is per-document pure Python over one
string — it runs inside the same Arrow-batched ``mapInPandas`` seam
as the codecs (documents are the parallelism unit, zero shuffle),
and the cleaned text feeds the existing curation operators
(tokenization, Gopher rules, dedup) unchanged.
"""

from __future__ import annotations

#: Tags that terminate a text block (HTML's block-level / sectioning
#: set plus explicit line breaks and table cells).
BLOCK_TAGS = frozenset(
    """p div br hr li ul ol dl dt dd tr td th table thead tbody tfoot
    h1 h2 h3 h4 h5 h6 title blockquote pre article section header
    footer nav aside main form fieldset figure figcaption address
    caption""".split()
)

#: Raw-text / RCDATA elements: content runs to the literal close tag.
_RAW_TEXT = frozenset({"script", "style", "textarea", "title"})

#: Raw-text elements whose content is NOT text (dropped wholesale).
_DROP_CONTENT = frozenset({"script", "style"})

_NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": "\xa0",
}


def _decode_entities(s: str) -> str:
    """Decode character references; unknown/unterminated ones stay
    literal (browser behavior, and the honest choice for crawl text)."""
    out = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch != "&":
            out.append(ch)
            i += 1
            continue
        semi = s.find(";", i + 1)
        if semi == -1 or semi > i + 10:
            out.append(ch)
            i += 1
            continue
        body = s[i + 1 : semi]
        if body.startswith("#x") or body.startswith("#X"):
            try:
                cp = int(body[2:], 16)
            except ValueError:
                out.append(ch)
                i += 1
                continue
            out.append(chr(cp) if 0 < cp <= 0x10FFFF else "�")
            i = semi + 1
        elif body.startswith("#"):
            try:
                cp = int(body[1:], 10)
            except ValueError:
                out.append(ch)
                i += 1
                continue
            out.append(chr(cp) if 0 < cp <= 0x10FFFF else "�")
            i = semi + 1
        elif body in _NAMED_ENTITIES:
            out.append(_NAMED_ENTITIES[body])
            i = semi + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _normalize_ws(s: str) -> str:
    """Collapse ASCII whitespace + NBSP runs to single spaces and
    strip — the one normalization both the extractor and the SQL
    oracle implement (explicit class, not ``\\s``: engines disagree
    on VT)."""
    out = []
    in_ws = True  # leading whitespace is dropped
    for ch in s:
        if ch in " \t\r\n\x0c\xa0":
            in_ws = True
            continue
        if in_ws and out:
            out.append(" ")
        in_ws = False
        out.append(ch)
    return "".join(out)


def _scan_tag(html: str, i: int) -> tuple[str, bool, int]:
    """Scan a tag starting at ``html[i] == '<'`` whose next char is a
    letter or '/'. Returns (lowercased tag name, is_close, index past
    '>'), honoring quoted attribute values."""
    n = len(html)
    j = i + 1
    is_close = False
    if j < n and html[j] == "/":
        is_close = True
        j += 1
    start = j
    while j < n and (html[j].isalnum() or html[j] in "-_:"):
        j += 1
    name = html[start:j].lower()
    quote = None
    while j < n:
        ch = html[j]
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch == ">":
            return name, is_close, j + 1
        j += 1
    return name, is_close, n  # unterminated tag: swallow to EOF


def html_blocks(html: str) -> list[tuple[str, int, int]]:
    """Extract text blocks → list of ``(text, link_chars,
    total_chars)`` in document order (whitespace-normalized, empty
    blocks dropped). ``link_chars`` counts characters that sat inside
    an ``<a>`` element — the numerator of the block's link density."""
    blocks: list[tuple[str, int, int]] = []
    buf: list[str] = []
    link_buf: list[str] = []
    link_depth = 0
    i, n = 0, len(html)
    # lowered once: recomputing it per raw-text element would be
    # O(n · n_scripts) — quadratic on script-heavy multi-megabyte
    # crawl pages (ADVICE r11)
    low = html.lower()

    def flush() -> None:
        nonlocal buf, link_buf
        text = _normalize_ws(_decode_entities("".join(buf)))
        if text:
            link_text = _normalize_ws(_decode_entities("".join(link_buf)))
            blocks.append((text, len(link_text), len(text)))
        buf = []
        link_buf = []

    while i < n:
        ch = html[i]
        if ch != "<":
            buf.append(ch)
            if link_depth > 0:
                link_buf.append(ch)
            i += 1
            continue
        if html.startswith("<!--", i):
            end = html.find("-->", i + 4)
            i = n if end == -1 else end + 3
            continue
        if html.startswith("<![CDATA[", i):
            end = html.find("]]>", i + 9)
            text = html[i + 9 : end if end != -1 else n]
            buf.append(text)
            if link_depth > 0:
                link_buf.append(text)
            i = n if end == -1 else end + 3
            continue
        if html.startswith("<!", i) or html.startswith("<?", i):
            end = html.find(">", i + 2)
            i = n if end == -1 else end + 1
            continue
        nxt = html[i + 1] if i + 1 < n else ""
        if not (nxt.isalpha() or nxt == "/"):
            buf.append(ch)  # a bare '<' is text (browser behavior)
            if link_depth > 0:
                link_buf.append(ch)
            i += 1
            continue
        name, is_close, i = _scan_tag(html, i)
        if not is_close and name in _RAW_TEXT:
            # raw-text content runs to the literal close tag
            close = f"</{name}"
            end = low.find(close, i)
            content = html[i : end if end != -1 else n]
            if end == -1:
                i = n
            else:
                i = low.find(">", end)
                i = n if i == -1 else i + 1
            if name in _DROP_CONTENT:
                flush()
            else:
                flush()
                buf.append(content)
                flush()
            continue
        if name == "a":
            link_depth = max(0, link_depth + (-1 if is_close else 1))
        if name in BLOCK_TAGS:
            flush()
    flush()
    return blocks


def html_to_text(html: str) -> str:
    """Extracted text: blocks joined by newlines (script/style
    dropped, entities decoded, whitespace normalized per block)."""
    return "\n".join(b[0] for b in html_blocks(html))


def boilerplate_stats(html: str, link_density_max: float = 0.5) -> tuple[int, int]:
    """The classic link-density screen over the block list: returns
    ``(n_blocks, n_boilerplate)`` where a block is boilerplate when
    more than ``link_density_max`` of its characters are link text —
    the navigation/footer signature (Kohlschütter et al. 2010)."""
    blocks = html_blocks(html)
    boiler = sum(
        1 for _, link, total in blocks if total and link / total > link_density_max
    )
    return len(blocks), boiler
