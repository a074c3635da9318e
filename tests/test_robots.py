"""robots.txt pins (functions/robots — RFC 9309). The RFC's own
normative behaviors are transcribed: group selection by longest
product-token match with ``*`` fallback, longest-path-match with
allow winning ties, ``*``/``$`` pattern syntax, empty rules, and
the line grammar (comments, unknown directives, multi-agent runs,
rules before any group)."""

from __future__ import annotations

from data_warehouse_migration_spark.functions.robots import (
    _pattern_matches,
    is_allowed,
    parse_robots,
)

POLICY = """
# global defaults
User-agent: *
Disallow: /private
Allow: /private/ok

User-agent: enginebot
User-agent: friendbot
Disallow: /d/
Allow: /d/open
Disallow: /w*/x$
Sitemap: http://h/sitemap.xml
Crawl-delay: 3
"""


def test_group_selection_shadows_star():
    # a named group applies INSTEAD of *, never merged with it
    assert is_allowed(POLICY, "enginebot", "/private") is True
    assert is_allowed(POLICY, "randombot", "/private") is False


def test_longest_agent_token_wins():
    txt = (
        "User-agent: bot\nDisallow: /a\n\n"
        "User-agent: bot-special\nDisallow: /b\n"
    )
    # 'bot-special/1.0' matches both tokens; the longer one wins
    assert is_allowed(txt, "bot-special/1.0", "/a") is True
    assert is_allowed(txt, "bot-special/1.0", "/b") is False
    assert is_allowed(txt, "bot/2.0", "/a") is False


def test_longest_path_match_allow_beats_disallow():
    assert is_allowed(POLICY, "randombot", "/private/ok/deep") is True
    # equal length: allow wins the tie
    txt = "User-agent: *\nDisallow: /pg\nAllow: /pg\n"
    assert is_allowed(txt, "any", "/pg/1") is True


def test_wildcard_and_anchor():
    assert _pattern_matches("/w*/x$", "/w1/x")
    assert not _pattern_matches("/w*/x$", "/w1/x/more")
    # '*' must backtrack: the first '/x' is not at the end, the
    # second is
    assert _pattern_matches("/w*/x$", "/w/x/x")
    assert _pattern_matches("/a*b*c", "/aXbYcZ")
    assert not _pattern_matches("/a*b*c", "/acb")
    assert _pattern_matches("/exact$", "/exact")
    assert not _pattern_matches("/exact$", "/exactly")
    # regex metacharacters in paths are literal
    assert _pattern_matches("/a.b", "/a.b")
    assert not _pattern_matches("/a.b", "/aXb")


def test_percent_normalization():
    assert _pattern_matches("/d/", "/%64/")      # %64 = d (unreserved)
    assert _pattern_matches("/%64/", "/d/")
    assert not _pattern_matches("/a%2Fb", "/a/b")  # reserved: NOT decoded


def test_empty_rule_matches_nothing():
    txt = "User-agent: *\nDisallow:\n"
    assert is_allowed(txt, "any", "/anything") is True


def test_default_allow_and_robots_txt():
    assert is_allowed("", "any", "/x") is True
    assert is_allowed(POLICY, "randombot", "/robots.txt") is True
    # no matching rule in the selected group → allow
    assert is_allowed(POLICY, "enginebot", "/elsewhere") is True


def test_line_grammar():
    groups = parse_robots(POLICY)
    assert len(groups) == 2
    assert groups[1][0] == ["enginebot", "friendbot"]
    # sitemap/crawl-delay are ignored, comments stripped
    assert groups[1][1] == [
        (False, "/d/"), (True, "/d/open"), (False, "/w*/x$"),
    ]
    # rules before any user-agent line belong to no group
    assert parse_robots("Disallow: /x\nUser-agent: *\nDisallow: /y\n") == [
        (["*"], [(False, "/y")])
    ]
    # directive names are case-insensitive; values keep case
    g = parse_robots("USER-AGENT: Bot\nDISALLOW: /CaseD\n")
    assert g == [(["bot"], [(False, "/CaseD")])]
    # a user-agent line AFTER rules starts a new group
    g2 = parse_robots(
        "User-agent: a\nDisallow: /1\nUser-agent: b\nDisallow: /2\n"
    )
    assert [t for t, _ in g2] == [["a"], ["b"]]


def test_case_insensitive_agent_match():
    assert is_allowed(POLICY, "EngineBot/9", "/d/secret") is False
