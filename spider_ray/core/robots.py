"""robots.txt parsing + evaluation — SURVEY.md §2.2 M10 / Appendix A.9.

RFC 9309 semantics, pinned:

  * groups are runs of ``User-agent:`` lines followed by rules;
  * group selection: if any group names our agent (``spider-ray``,
    case-insensitive exact product token), only those groups apply;
    otherwise the ``*`` groups apply; otherwise allow-all;
  * rule matching: longest-path-match wins among all Allow/Disallow
    rules of the applicable groups; on equal length Allow wins;
  * an empty ``Disallow:`` value matches nothing (allow-all marker);
  * full pattern set: ``*`` matches any octet sequence (including
    empty), a trailing ``$`` anchors end-of-path (elsewhere ``$`` is a
    literal), everything else is a literal prefix; specificity for
    longest-match is the pattern's octet length as written (RFC 9309
    §2.2.2).  Wildcard-free rules (the entire fixture corpus) keep the
    plain ``startswith`` fast path;
  * a missing robots.txt (no row in the robots fixture) => allow-all
    with the default crawl delay.

``Crawl-delay`` lines are parsed when present but the authoritative
per-host delay comes from the robots fixture's ``crawl_delay_s`` column
(FIXTURES.md §3).  ``Sitemap:`` lines (a global directive, RFC 9309
§2.2.4) are collected independently of group selection and exposed as
``RobotsRules.sitemaps`` — the discovery hook into
``sources.read_sitemaps`` -> ``sitemap_seed_table``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

AGENT_TOKEN = "spider-ray"


@lru_cache(maxsize=4096)
def _wild_parts(pattern: str) -> tuple[tuple[str, ...], bool]:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    return tuple(body.split("*")), anchored


def _wild_match(pattern: str, s: str) -> bool:
    """RFC 9309 path pattern match: ``*`` = any octets, trailing ``$``
    = end anchor (a mid-pattern ``$`` is literal); unanchored patterns
    match any PREFIX of ``s``.  Deliberately NOT a regex: robots.txt is
    remote-controlled input, and a ``lit*lit*lit...`` pattern compiled
    to ``.*``-joined re backtracks exponentially on crafted paths.
    This is the classic glob segment scan — greedy leftmost `find` per
    middle segment is complete for existence (taking the earliest
    occurrence never blocks a later segment), O(len(s) * segments)
    worst case."""
    parts, anchored = _wild_parts(pattern)
    first = parts[0]
    if not s.startswith(first):
        return False
    if len(parts) == 1:  # no '*' at all
        return not anchored or len(s) == len(first)
    pos = len(first)
    for seg in parts[1:-1]:
        if not seg:
            continue  # '**' — zero-width
        i = s.find(seg, pos)
        if i < 0:
            return False
        pos = i + len(seg)
    last = parts[-1]
    if anchored:
        return (not last) or (
            s.endswith(last) and len(s) - len(last) >= pos
        )
    return (not last) or s.find(last, pos) >= 0


@dataclass
class RobotsRules:
    """Evaluated rule set for one host (already agent-selected)."""

    # list of (path_prefix, allow) — empty-valued Disallow rules are dropped
    rules: list[tuple[str, bool]] = field(default_factory=list)
    crawl_delay_s: float | None = None
    # ``Sitemap:`` is a GLOBAL directive (RFC 9309 §2.2.4: independent
    # of any user-agent group), so every line is kept regardless of
    # which groups were selected; document order, first-seen dedup.
    # Consumers feed these to sources.read_sitemaps for seed discovery.
    sitemaps: list[str] = field(default_factory=list)

    def allowed(self, path_query: str) -> bool:
        """Longest-pattern-match; ties -> allow; no match -> allow."""
        best_len = -1
        best_allow = True
        for prefix, allow in self.rules:
            if "*" in prefix or prefix.endswith("$"):
                if not _wild_match(prefix, path_query):
                    continue
            elif not path_query.startswith(prefix):
                continue
            plen = len(prefix)
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
        return best_allow


ALLOW_ALL = RobotsRules()


def parse_robots(body: bytes | str, agent: str = AGENT_TOKEN) -> RobotsRules:
    """Parse a robots.txt body and select the group(s) for ``agent``."""
    if isinstance(body, (bytes, bytearray, memoryview)):
        body = bytes(body).decode("utf-8", errors="replace")
    agent = agent.lower()

    # group collection: (agent_tokens, rules, crawl_delay)
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_agent_run = False  # consecutive User-agent lines share one group
    sitemaps: list[str] = []

    def flush() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agent_run:
                flush()
            cur_agents.append(value.lower())
            in_agent_run = True
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if key == "disallow" and value == "":
                continue  # empty Disallow matches nothing
            if value:
                cur_rules.append((value, key == "allow"))
        elif key == "crawl-delay":
            in_agent_run = False
            try:
                cur_delay = float(value)
            except ValueError:
                pass
        elif key == "sitemap":
            in_agent_run = False
            if value and value not in sitemaps:
                sitemaps.append(value)
        else:
            in_agent_run = False
    flush()

    ours = [g for g in groups if agent in g[0]]
    if not ours:
        ours = [g for g in groups if "*" in g[0]]
    if not ours:
        return RobotsRules(sitemaps=sitemaps)
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    for _, grules, gdelay in ours:
        rules.extend(grules)
        if gdelay is not None:
            delay = gdelay
    return RobotsRules(rules=rules, crawl_delay_s=delay, sitemaps=sitemaps)
