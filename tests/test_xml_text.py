"""XML parser (functions/xml_text): entity codec, document grammar,
well-formedness raises, and the MediaWiki dump shape the bz2 rung
composes with."""

from __future__ import annotations

import pytest

from data_warehouse_migration_spark.functions.xml_text import (
    XmlElement,
    build_wikidump,
    decode_entities,
    encode_entities,
    parse_xml,
    wikidump_pages,
)


def test_entity_codec_identity():
    nasty = "a < b && c > d \"quoted\" 'apos' &#65; literal"
    assert decode_entities(encode_entities(nasty)) == nasty
    assert decode_entities("&#65;&#x42;&lt;&amp;") == "AB<&"
    with pytest.raises(ValueError, match="undefined entity"):
        decode_entities("&nbsp;")
    with pytest.raises(ValueError, match="unterminated entity"):
        decode_entities("&amp no semicolon")
    with pytest.raises(ValueError, match="bad character reference"):
        decode_entities("&#12a;")


def test_document_grammar():
    root = parse_xml(
        '<?xml version="1.0"?>\n'
        "<!DOCTYPE doc [ <!ELEMENT doc ANY> ]>\n"
        "<!-- a comment with <fake> tags -->\n"
        '<doc a="1" b=\'x>y\'>pre<child k="&amp;v"/>mid'
        "<![CDATA[raw <not> &amp; text]]>post"
        "<deep><x>inner</x></deep></doc>"
        "<!-- trailing comment ok -->"
    )
    assert root.tag == "doc"
    assert root.attrs == {"a": "1", "b": "x>y"}
    assert root.find("child").attrs == {"k": "&v"}
    # CDATA stays verbatim (no entity decoding inside)
    assert root.text() == "premidraw <not> &amp; textpostinner"
    assert root.find("deep").find("x").text() == "inner"


def test_wellformedness_raises():
    bad = {
        "mismatch": "<a><b></a></b>",
        "unclosed": "<a><b></b>",
        "second root": "<a/><b/>",
        "stray text": "<a/>trailing words",
        "unquoted attr": "<a x=1/>",
        "unterminated comment": "<a><!-- oops</a>",
        "unterminated cdata": "<a><![CDATA[never ends</a>",
        "text before root": "hello <a/>",
    }
    for why, doc in bad.items():
        with pytest.raises(ValueError):
            parse_xml(doc)


def test_text_ordering_interleaved():
    root = parse_xml("<r>a<x>b</x>c<y>d</y>e</r>")
    assert root.text() == "abcde"


def test_wikidump_roundtrip():
    pages = [
        {"title": "Doc 7 <&>", "ns": 3, "page_id": 7,
         "text": "body with <tags> & \"entities\"\nand newlines"},
        {"title": "Talk:Doc 7", "ns": 1, "page_id": 8, "text": "ack"},
    ]
    back = wikidump_pages(build_wikidump(pages))
    assert [(p["title"], p["ns"], p["page_id"], p["text"]) for p in back] == [
        (p["title"], p["ns"], p["page_id"], p["text"]) for p in pages
    ]
    with pytest.raises(ValueError, match="MediaWiki"):
        wikidump_pages("<notadump/>")


def test_find_helpers():
    el = XmlElement("p", {})
    assert el.find("missing") is None
    assert el.find_all("missing") == []
