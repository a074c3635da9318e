"""URL canonicalization pins (functions/url — r11, RFC 3986 §6).
The RFC's own examples are the independent reference: §5.2.4's
dot-segment walkthroughs and §6.2.2's case/percent examples are
transcribed here verbatim."""

from __future__ import annotations

import pytest

from data_warehouse_migration_spark.functions.url import (
    canonicalize_url,
    remove_dot_segments,
    split_url,
)


def test_rfc_dot_segment_examples():
    # RFC 3986 §5.2.4's two worked examples
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
    # edge forms from the algorithm's case table
    assert remove_dot_segments("/a/b/..") == "/a/"
    assert remove_dot_segments("/a/b/.") == "/a/b/"
    assert remove_dot_segments("..") == ""
    assert remove_dot_segments("/../x") == "/x"
    assert remove_dot_segments("/a/../../..") == "/"


def test_rfc_case_and_percent_normalization():
    # §6.2.2.1: scheme and host lowercase, percent triplets uppercase
    assert (
        canonicalize_url("HTTP://www.EXAMPLE.com/")
        == "http://www.example.com/"
    )
    # §6.2.2.2: decode unreserved (%61 = 'a', %7E = '~'), keep and
    # upcase reserved (%2F must NOT decode — it would change the path)
    assert canonicalize_url("http://h/%61%2f%7E") == "http://h/a%2F~"
    # §6.2.3: empty path → '/', default port dropped
    assert canonicalize_url("http://h") == "http://h/"
    assert canonicalize_url("http://h:80/x") == "http://h/x"
    assert canonicalize_url("https://h:443/") == "https://h/"
    assert canonicalize_url("https://h:8443/") == "https://h:8443/"
    assert canonicalize_url("http://h:/x") == "http://h/x"  # empty port


def test_fragment_dropped_query_kept():
    assert canonicalize_url("http://h/p?x=1#sec") == "http://h/p?x=1"
    assert canonicalize_url("http://h/p?b=2&a=1") == "http://h/p?b=2&a=1"
    assert (
        canonicalize_url("http://h/p?b=2&a=1", sort_query=True)
        == "http://h/p?a=1&b=2"
    )


def test_userinfo_ipv6_and_malformed_triplets():
    assert canonicalize_url("http://U:p@HOST.co/x") == "http://U:p@host.co/x"
    assert (
        canonicalize_url("http://[2001:DB8::1]:80/x")
        == "http://[2001:db8::1]/x"
    )
    assert (
        canonicalize_url("http://[2001:db8::1]:8080/x")
        == "http://[2001:db8::1]:8080/x"
    )
    # malformed percent triplets pass through literally
    assert canonicalize_url("http://h/%zz/%4") == "http://h/%zz/%4"


def test_split_url_components():
    assert split_url("https://u@h:8080/p/q?a=1#f") == (
        "https", "u@h:8080", "/p/q", "a=1", "f",
    )
    assert split_url("//h/p") == ("", "h", "/p", "", "")
    assert split_url("/just/a/path") == ("", "", "/just/a/path", "", "")
    # a colon in the path must not be mistaken for a scheme
    assert split_url("./a:b")[0] == ""


def test_idempotence():
    urls = [
        "HTTP://WWW.Host3.COM:80/en/a/b/../c/./%61%2f7?b=7&a=1#z",
        "https://h/%7e%41?x=%2f",
        "http://h",
    ]
    for u in urls:
        once = canonicalize_url(u, sort_query=True)
        assert canonicalize_url(once, sort_query=True) == once


def test_gate_formula_matches_operator(spark):
    from data_warehouse_migration_spark.operators.web_extract import (
        url_canonicalize_features,
    )

    df = spark.createDataFrame(
        [(7, "en"), (12, "de")], "doc_id long, lang string"
    )
    got = {r["doc_id"]: r for r in url_canonicalize_features(df).collect()}
    assert got[7]["canonical_url"] == "http://www.host2.com/en/a/c/a%2F7?a=1&b=7"
    assert got[7]["host"] == "www.host2.com"
    assert got[12]["canonical_url"] == "http://www.host2.com/de/a/c/a%2F12?a=0&b=12"


def test_authority_never_fabricated():
    # ADVICE r11: 'http:page' (scheme, no '//') must not promote the
    # first path segment to a host.
    assert canonicalize_url("http:page") == "http:page"
    assert canonicalize_url("HTTP:a/b/../c") == "http:a/c"
    assert canonicalize_url("mailto:User@Example.com") == "mailto:User@Example.com"
    # empty authority is still an authority (file URLs)
    assert canonicalize_url("file:///Etc/./passwd") == "file:///Etc/passwd"
    # scheme-relative input keeps its authority
    assert canonicalize_url("//H.COM:80/x") == "//h.com:80/x"
    assert canonicalize_url("HTTP://H.COM:80/x") == "http://h.com/x"
