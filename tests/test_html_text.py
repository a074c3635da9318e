"""HTML → text extraction pins (functions/html_text — r11, the
crawl-ingest rung). Adversarial-parser cases: the inputs a real
crawl throws at an extractor — malformed tags, raw-text traps,
entity edge cases — each with a hand-derived expected output."""

from __future__ import annotations

import pytest

from data_warehouse_migration_spark.functions.html_text import (
    boilerplate_stats,
    html_blocks,
    html_to_text,
)


def test_basic_blocks_and_inline_tags():
    h = "<p>Hello <b>bold</b> and <i>italic</i>.</p><p>Second</p>"
    assert html_to_text(h) == "Hello bold and italic.\nSecond"


def test_script_style_content_dropped():
    h = (
        "<style>body { margin: 0; } /* <p>fake</p> */</style>"
        "<p>real</p>"
        '<script>var s = "</p><p>injected"; if (a < b) {}</script>'
        "<p>after</p>"
    )
    assert html_to_text(h) == "real\nafter"


def test_raw_text_runs_to_literal_close_tag():
    # per the HTML5 raw-text rules, "</div>" inside a script string
    # does NOT close the script — only the literal "</script" does
    h = '<script>v = "</div>";</script><div>text</div>'
    assert html_to_text(h) == "text"
    # title is RCDATA: its content IS text
    assert html_to_text("<title>My &amp; Title</title>") == "My & Title"


def test_quoted_attributes_hide_gt():
    h = '<p><a href="x?a>b" title=\'c>d\'>link</a> tail</p>'
    assert html_to_text(h) == "link tail"


def test_comments_and_declarations_skipped():
    h = (
        "<!DOCTYPE html><!-- <p>ghost</p> --><?xml version='1'?>"
        "<p>visible</p><!-- unterminated"
    )
    assert html_to_text(h) == "visible"


def test_cdata_is_text():
    assert html_to_text("<p><![CDATA[a < b & c]]></p>") == "a < b & c"


def test_bare_lt_is_text():
    assert html_to_text("<p>1 < 2 and x <= y</p>") == "1 < 2 and x <= y"


def test_entities_decimal_hex_named_and_malformed():
    assert html_to_text("<p>&#65;&#x42;&#X43;</p>") == "ABC"
    assert html_to_text("<p>&amp;&lt;&gt;&quot;&apos;</p>") == "&<>\"'"
    # NBSP normalizes to a plain space
    assert html_to_text("<p>a&nbsp;&nbsp;b</p>") == "a b"
    # unknown / unterminated references stay literal
    assert html_to_text("<p>&bogus; &amp broken &</p>") == "&bogus; &amp broken &"
    # out-of-range code point → replacement char, not a crash
    assert html_to_text("<p>&#1114112;</p>") == "�"


def test_whitespace_normalization_per_block():
    h = "<p>  a\t\tb\n\nc  </p><div>\n   \n</div><p>d</p>"
    assert html_to_text(h) == "a b c\nd"  # empty block dropped


def test_unterminated_tag_swallows_to_eof():
    assert html_to_text("<p>ok</p><a href='x") == "ok"


def test_link_density_boilerplate():
    h = (
        "<p>This is a long paragraph of real prose content with one "
        '<a href="#">small link</a> inside it.</p>'
        '<div><a href="/">Home</a> <a href="/about">About</a></div>'
    )
    blocks = html_blocks(h)
    assert len(blocks) == 2
    prose, nav = blocks
    # ("Home About" is 10 chars, 9 inside anchors — the separating
    # space is not link text)
    assert prose[1] / prose[2] < 0.5 and nav[1] / nav[2] >= 0.9
    assert boilerplate_stats(h) == (2, 1)
    # unbalanced </a> must not underflow the link depth
    assert boilerplate_stats("</a><p>text</p>") == (1, 0)


def test_block_vs_inline_segmentation():
    h = "<h1>T</h1>before<br>after<li>item</li><td>cell</td>"
    assert html_to_text(h) == "T\nbefore\nafter\nitem\ncell"
    # inline tags do not split blocks
    assert html_to_text("<p>a<span>b</span>c</p>") == "abc"


def test_case_insensitive_tags():
    h = "<P>one</P><SCRIPT>drop()</SCRIPT><DIV>two</DIV>"
    assert html_to_text(h) == "one\ntwo"
    assert html_to_text("<script>x</SCRIPT><p>y</p>") == "y"


def test_empty_and_textless_inputs():
    assert html_to_text("") == ""
    assert html_to_text("<p></p><div>\n</div>") == ""
    assert boilerplate_stats("") == (0, 0)


def test_extract_operator_roundtrip(spark):
    from data_warehouse_migration_spark.operators.web_extract import (
        extract_text_from_html,
    )

    rows = [
        (1, "<h1>A</h1><p>body &amp; soul</p><div><a href='#'>nav</a></div>"),
        (2, "<script>x<y</script><p>only</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r["doc_id"]: r
        for r in extract_text_from_html(df).collect()
    }
    assert got[1]["text"] == "A\nbody & soul\nnav"
    assert got[1]["n_blocks"] == 3 and got[1]["n_boilerplate"] == 1
    assert got[2]["text"] == "only"
    assert got[2]["n_chars"] == 4


def test_main_block_selection_short_text(spark):
    # ADVICE r11: for a very short doc text the title ('Doc {id}') can
    # be LONGER than the body paragraph; selection must still return
    # the paragraph (the oracle's pure string formula), not the title.
    from data_warehouse_migration_spark.operators.web_extract import (
        crawl_extract_main,
    )

    df = spark.createDataFrame(
        [(1234567, "en", ""), (7654321, "de", "x")],
        "doc_id long, lang string, text string",
    )
    got = {r["doc_id"]: r for r in crawl_extract_main(df).collect()}
    assert got[1234567]["main_text"] == "<raw> AB"
    assert got[7654321]["main_text"] == "x <raw> AB"


def test_raw_text_scan_linear_on_script_heavy_pages():
    # ADVICE r11: html.lower() is computed once, not per raw-text
    # element — correctness pin for the hoisted path (many scripts).
    page = "<p>keep</p>" + "<script>var x = '</div>';</script>" * 200 + "<p>end</p>"
    assert html_to_text(page) == "keep\nend"
