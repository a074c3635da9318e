"""robots.txt (RFC 9309) parsing and matching, from scratch — the
crawl-politeness filter that sits between the URL frontier
(functions/url canonicalization) and the fetch: at 100 TB-crawl
scale every candidate URL passes through exactly this check, so the
engine carries it next to WARC ingest. The reference warehouse has
no crawl surface — north-star territory.

Implemented from the RFC alone:

- line grammar: ``directive: value`` with ``#`` comments, unknown
  directives ignored, directive names case-insensitive (§2.1–2.2);
- groups: consecutive ``User-agent`` lines share one rule set; a
  later ``User-agent`` after rules starts a NEW group; blank lines
  do NOT terminate groups (§2.2.1);
- group selection: the group whose product token is the LONGEST
  case-insensitive prefix of the caller's agent string wins; the
  ``*`` group is the fallback; no group → everything allowed
  (§2.2.1);
- rule matching: longest-path-match wins, ``allow`` beats
  ``disallow`` on equal length; ``*`` matches any span, ``$``
  anchors the pattern end; an empty ``disallow:`` matches nothing
  (§2.2.2); octets compare percent-decoded for unreserved
  characters, mirroring the URL canonicalizer's convention.

Scale posture: pure per-row matching inside Arrow-batched
``mapInPandas`` — a robots table broadcast-joins the frontier on
host, then this check is row-local; zero shuffle beyond that join.
"""

from __future__ import annotations

import re


def parse_robots(text: str) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """→ list of groups ``(agent_tokens, rules)``; each rule is
    ``(is_allow, path_pattern)``. Rules seen before any User-agent
    line are ignored per the RFC (they belong to no group)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        name, _, value = line.partition(":")
        name = name.strip().lower()
        value = value.strip()
        if name == "user-agent":
            if not in_agent_run and agents:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(value.lower())
            in_agent_run = True
        elif name in ("allow", "disallow"):
            in_agent_run = False
            if agents:
                rules.append((name == "allow", value))
        else:
            in_agent_run = False  # sitemap/crawl-delay/unknown
    if agents:
        groups.append((agents, rules))
    return groups


def _select_group(
    groups: list[tuple[list[str], list[tuple[bool, str]]]], agent: str
) -> list[tuple[bool, str]] | None:
    """Longest product-token prefix match; ``*`` is the fallback."""
    agent = agent.lower()
    best: tuple[int, list[tuple[bool, str]]] | None = None
    star: list[tuple[bool, str]] | None = None
    for tokens, rules in groups:
        for tok in tokens:
            if tok == "*":
                if star is None:
                    star = rules
            elif agent.startswith(tok):
                if best is None or len(tok) > best[0]:
                    best = (len(tok), rules)
    if best is not None:
        return best[1]
    return star


_UNRESERVED = re.compile(r"%(4[1-9A-Fa-f]|5[0-9Aa]|6[1-9A-Fa-f]|7[0-9Aa]|3[0-9]|2[DdEe]|5[Ff]|7[Ee])")


def _norm_path(p: str) -> str:
    """Decode unreserved percent-triplets so ``/a`` and ``/%61``
    compare equal — the URL canonicalizer's §6.2.2.2 convention."""
    return _UNRESERVED.sub(lambda m: chr(int(m.group(1), 16)), p)


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 §2.2.2/2.2.3: prefix match with ``*`` (any span) and
    a final ``$`` (end anchor). Translated to an anchored regex so
    ``*`` backtracks correctly (``/w*/x$`` must match ``/w/x/x`` —
    a greedy first-occurrence scan would miss it)."""
    pattern, path = _norm_path(pattern), _norm_path(path)
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(re.escape(part) for part in pattern.split("*"))
    if anchored:
        rx += r"\Z"
    return re.match(rx, path) is not None


def is_allowed(robots_text: str, agent: str, path: str) -> bool:
    """The RFC verdict for ``agent`` fetching ``path``: select the
    group, take the LONGEST matching rule (allow wins equal-length
    ties), default allow. ``/robots.txt`` itself is always allowed."""
    if path == "/robots.txt":
        return True
    rules = _select_group(parse_robots(robots_text), agent)
    if rules is None:
        return True
    # (specificity, is_allow): tuple compare makes longer patterns
    # win and allow beat disallow on equal length; default allow.
    best = (-1, True)
    for is_allow, pattern in rules:
        if pattern == "":
            continue  # an empty rule matches nothing (§2.2.2)
        if _pattern_matches(pattern, path):
            plen = len(pattern) - (1 if pattern.endswith("$") else 0)
            best = max(best, (plen, is_allow))
    return best[1]
