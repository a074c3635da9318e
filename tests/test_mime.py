"""MIME pins (functions/mime — r11, RFC 5322 + 2045/2046). CPython's
``base64``/``quopri``/``email`` modules are the independent
references — never imported by the engine module itself."""

from __future__ import annotations

import base64 as stdb64
import email
import os
import quopri

import pytest

from data_warehouse_migration_spark.functions.mime import (
    base64_decode,
    base64_encode,
    decode_body,
    header,
    parse_content_type,
    parse_headers,
    parse_message,
    qp_decode,
    qp_encode,
)


def test_base64_vs_stdlib_all_paddings():
    for blob in (b"", b"a", b"ab", b"abc", b"abcd",
                 bytes(range(256)), os.urandom(301)):
        assert base64_encode(blob, wrap=0) == stdb64.b64encode(blob).decode()
        assert base64_decode(stdb64.b64encode(blob).decode()) == blob
        assert base64_decode(base64_encode(blob)) == blob  # folded


def test_base64_rejects_garbage():
    with pytest.raises(ValueError, match="invalid base64"):
        base64_decode("ab!d")


def test_qp_vs_stdlib():
    texts = [
        b"hello world",
        b"trailing space \nnext line",
        b"equals = sign and =3D lookalike",
        b"x" * 200,                      # forces soft breaks
        b"caf\xe9 8-bit \xff",
        b"tab\there",
    ]
    for t in texts:
        enc = qp_encode(t)
        assert max(len(ln) for ln in enc.split("\r\n")) <= 76
        assert qp_decode(enc) == t.replace(b"\r\n", b"\n")
        # stdlib decodes ours, we decode stdlib's
        assert quopri.decodestring(enc.encode()).replace(b"\r\n", b"\n") == t
        assert qp_decode(quopri.encodestring(t).decode()) == t


def test_qp_truncated_escape_raises():
    with pytest.raises(ValueError, match="truncated"):
        qp_decode("abc=4")


def test_header_unfolding_and_lookup():
    headers, body = parse_headers(
        "Subject: a long\r\n  folded subject\r\nX-N: v\r\n\r\nthe body"
    )
    assert header(headers, "subject") == "a long folded subject"
    assert header(headers, "X-n") == "v"
    assert header(headers, "missing") is None
    assert body == "the body"
    with pytest.raises(ValueError, match="malformed header"):
        parse_headers("not a header line\r\n\r\n")
    with pytest.raises(ValueError, match="continuation"):
        parse_headers(" folded first\r\n\r\n")


def test_content_type_params():
    ct, p = parse_content_type('multipart/Mixed; boundary="a=b;c"; x=1')
    assert ct == "multipart/mixed"
    assert p["boundary"] == "a=b;c"
    assert p["x"] == "1"
    assert parse_content_type(None) == ("text/plain", {})


def test_decode_body_ctes():
    h = [("Content-Transfer-Encoding", "base64")]
    assert decode_body(h, base64_encode(b"xyz")) == b"xyz"
    h2 = [("Content-Transfer-Encoding", "quoted-printable")]
    assert decode_body(h2, "a=3Db") == b"a=b"
    assert decode_body([], "plain") == b"plain"
    with pytest.raises(ValueError, match="Content-Transfer-Encoding"):
        decode_body([("Content-Transfer-Encoding", "uuencode")], "x")


def _multipart(bnd: str = "BND") -> str:
    return (
        f'Subject: T\r\nContent-Type: multipart/mixed; boundary="{bnd}"'
        "\r\n\r\npreamble\r\n"
        f"--{bnd}\r\nContent-Type: text/plain\r\n\r\nfirst part\r\n"
        f"--{bnd}\r\nContent-Type: text/html\r\n\r\n<p>second</p>\r\n"
        f"--{bnd}--\r\nepilogue"
    )


def test_multipart_structure():
    m = parse_message(_multipart())
    assert m["content_type"] == "multipart/mixed"
    assert [p["content_type"] for p in m["parts"]] == [
        "text/plain", "text/html",
    ]
    assert m["parts"][0]["body"] == b"first part"
    # stdlib email agrees on the same bytes
    em = email.message_from_string(_multipart())
    assert [p.get_payload(decode=True) for p in em.get_payload()] == [
        b"first part", b"<p>second</p>",
    ]


def test_multipart_missing_terminal_raises():
    broken = _multipart().replace("--BND--", "--BND")
    # now no chunk starts with '--' after the boundary splits
    broken = broken.replace("--BND\r\nContent-Type: text/html", "XX")
    with pytest.raises(ValueError):
        parse_message(broken)
    with pytest.raises(ValueError, match="boundary"):
        parse_message("Content-Type: multipart/mixed\r\n\r\nbody")


def test_nested_multipart():
    inner = (
        'Content-Type: multipart/alternative; boundary="IN"\r\n\r\n'
        "--IN\r\n\r\nplain alt\r\n--IN\r\n\r\nrich alt\r\n--IN--"
    )
    outer = (
        'Content-Type: multipart/mixed; boundary="OUT"\r\n\r\n'
        f"--OUT\r\n{inner}\r\n--OUT--"
    )
    m = parse_message(outer)
    assert m["parts"][0]["content_type"] == "multipart/alternative"
    assert [p["body"] for p in m["parts"][0]["parts"]] == [
        b"plain alt", b"rich alt",
    ]


def test_stdlib_built_message_parsed_by_ours():
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    em = MIMEMultipart()
    em["Subject"] = "From stdlib"
    em.attach(MIMEText("payload text"))
    m = parse_message(em.as_string().replace("\n", "\r\n"))
    assert header(m["headers"], "Subject") == "From stdlib"
    assert m["parts"][0]["body"].rstrip(b"\r\n") == b"payload text"


def test_mbox_roundtrip_and_quoting():
    from data_warehouse_migration_spark.functions.mime import (
        mbox_join,
        mbox_split,
    )

    msgs = [
        "Subject: a\n\nbody one\nFrom the start of a line\n>From quoted",
        "Subject: b\n\nsecond line\n>>From deep",
        "Subject: c\n\nmid-line From stays, as does mid->From",
    ]
    blob = mbox_join(msgs)
    assert mbox_split(blob) == msgs
    # mboxrd quoting is DEPTH-PRESERVING at line START only:
    # "From " → ">From ", ">From" → ">>From", ">>From" → ">>>From"
    assert ">From the start" in blob
    assert ">>From quoted" in blob
    assert ">>>From deep" in blob
    assert "mid-line From stays" in blob  # mid-line never quoted
    with pytest.raises(ValueError, match="before the first"):
        mbox_split("not a separator\nFrom x\n\nbody")


def test_mbox_read_by_stdlib_mailbox():
    import mailbox
    import tempfile
    import os

    from data_warehouse_migration_spark.functions.mime import mbox_join

    msgs = ["Subject: a\n\nalpha", "Subject: b\n\nbeta"]
    with tempfile.NamedTemporaryFile(
        "w", suffix=".mbox", delete=False
    ) as f:
        f.write(mbox_join(msgs))
        path = f.name
    try:
        mb = mailbox.mbox(path)
        assert [m["Subject"] for m in mb] == ["a", "b"]
        # stdlib keeps the newline that precedes the next separator
        assert [m.get_payload() for m in mb] == ["alpha\n", "beta\n"]
    finally:
        os.unlink(path)
