"""Unit tests: hashing, regdomain, extractor, robots, seqs, scope."""

from __future__ import annotations

import numpy as np
import pytest

from spider_ray.core.extract import extract_links, extract_text, extract_text_and_links
from spider_ray.core.hashing import hash_url_batch, url_hash_fp
from spider_ray.core.regdomain import registrable_domain
from spider_ray.core.robots import parse_robots
from spider_ray.core.scope import is_excluded, split_host_pq
from spider_ray.core.seqs import LINK_BITS, child_seq, domain_budget


# -- hashing -----------------------------------------------------------
def test_hash_stable():
    h, fp = url_hash_fp("https://site0000.example/")
    h2, fp2 = url_hash_fp("https://site0000.example/")
    assert (h, fp) == (h2, fp2)
    assert 0 < h < 2**64 and 0 < fp < 2**32


def test_hash_batch_matches_scalar():
    urls = [f"https://site{i:04d}.example/p/{i}" for i in range(50)]
    h64, fp = hash_url_batch(urls)
    for i, u in enumerate(urls):
        sh, sf = url_hash_fp(u)
        assert int(h64[i]) == sh and int(fp[i]) == sf
    assert h64.dtype == np.uint64 and fp.dtype == np.uint32


# -- regdomain ---------------------------------------------------------
@pytest.mark.parametrize(
    "host,want",
    [
        ("site0001.example", "site0001.example"),
        ("sub.site0001.example", "site0001.example"),
        ("a.b.site0001.example", "site0001.example"),
        ("www.bbc.co.uk", "bbc.co.uk"),
        ("bbc.co.uk", "bbc.co.uk"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
    ],
)
def test_regdomain(host, want):
    assert registrable_domain(host) == want


# -- extractor ---------------------------------------------------------
HTML = (
    b'<html><head><title>t p 1</title><script>var x="NOISE";</script>'
    b"<style>.c{color:red}</style></head>"
    b"<body><h1>Heading 1</h1>"
    b"<p>Para   with\n  runs</p>"
    b'<div>Nested <b>inline</b> text<br>after break</div>'
    b'<ul><li><a href="/p/1">link 0</a></li>'
    b'<li><a href="/p/1">link 0 again</a></li>'
    b'<li><a href="mailto:x@y">mail</a></li></ul>'
    b"<noscript>HIDDEN<a href='/hidden'>h</a></noscript></body></html>"
)


def test_extract_text_rules():
    text = extract_text(HTML)
    lines = text.split("\n")
    assert "Heading 1" in lines
    assert "Para with runs" in lines
    assert "Nested inline text" in lines
    assert "after break" in lines
    assert all("NOISE" not in ln for ln in lines)
    assert all("HIDDEN" not in ln for ln in lines)
    assert all("t p 1" not in ln for ln in lines)  # title inside skipped head
    assert "" not in lines


def test_extract_links_order_and_hidden():
    links = extract_links(HTML)
    # document order, duplicates kept, links inside skipped subtrees kept
    assert links == ["/p/1", "/p/1", "mailto:x@y", "/hidden"]


def test_combined_matches_separate():
    t, l = extract_text_and_links(HTML)
    assert t == extract_text(HTML)
    assert l == extract_links(HTML)


# -- robots ------------------------------------------------------------
ROBOTS_BODY = b"""
# comment
User-agent: *
Disallow: /private/
Allow: /private/ok

User-agent: spider-ray
Disallow: /p/13
"""


def test_robots_agent_precedence():
    r = parse_robots(ROBOTS_BODY)  # our agent -> only spider-ray group
    assert r.allowed("/private/x")  # * group does not apply to us
    assert not r.allowed("/p/13")
    assert not r.allowed("/p/134")  # prefix match
    assert r.allowed("/p/1")


def test_robots_star_group():
    r = parse_robots(b"User-agent: *\nDisallow: /private/\nAllow: /private/ok\n")
    assert not r.allowed("/private/x")
    assert r.allowed("/private/ok")  # longer allow wins
    assert r.allowed("/public")


def test_robots_empty_disallow_and_missing():
    r = parse_robots(b"User-agent: *\nDisallow:\n")
    assert r.allowed("/anything")
    r2 = parse_robots(b"")
    assert r2.allowed("/x")


def test_robots_crawl_delay_parsed():
    r = parse_robots(b"User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n")
    assert r.crawl_delay_s == 2.5


def test_robots_wildcards_and_anchor():
    r = parse_robots(
        b"User-agent: *\n"
        b"Disallow: /*.pdf$\n"
        b"Disallow: /tmp*\n"
        b"Allow: /tmp/keep\n"
        b"Disallow: /exact$\n"
    )
    assert not r.allowed("/docs/file.pdf")      # * spans dirs, $ anchors
    assert r.allowed("/docs/file.pdf?x=1")      # query breaks the anchor
    assert not r.allowed("/tmpanything/deep")   # open-ended * prefix
    assert r.allowed("/tmp/keep/sub")           # longer allow beats /tmp*
    assert not r.allowed("/exact")
    assert r.allowed("/exactly")                # $ is a real anchor
    # mid-pattern $ is a literal, and '*' alone matches everything
    r2 = parse_robots(b"User-agent: *\nDisallow: /a$b\nDisallow: /priv*\n")
    assert not r2.allowed("/a$b/c")
    assert r2.allowed("/ab")
    r3 = parse_robots(b"User-agent: *\nDisallow: *\nAllow: /ok/path/x\n")
    assert not r3.allowed("/anything")
    assert r3.allowed("/ok/path/x")             # longer allow wins over *


def test_robots_wildcard_matcher_equals_regex_reference():
    """The linear glob scan must agree with the naive regex translation
    (the semantics definition) on an exhaustive small alphabet."""
    import itertools
    import re

    from spider_ray.core.robots import _wild_match

    def ref(pattern: str, s: str) -> bool:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = ".*".join(re.escape(p) for p in body.split("*"))
        return re.match(rx + (r"\Z" if anchored else ""), s) is not None

    atoms = ["a", "b", "*", "$"]
    pats = ["".join(p) for n in range(5)
            for p in itertools.product(atoms, repeat=n)]
    strs = ["".join(p) for n in range(6)
            for p in itertools.product(["a", "b", "$"], repeat=n)]
    checked = 0
    for pat in pats:
        for s in strs:
            assert _wild_match(pat, s) == ref(pat, s), (pat, s)
            checked += 1
    assert checked > 100_000


def test_robots_wildcard_matcher_is_linear_on_redos_input():
    """robots.txt is remote-controlled: a lit*lit*... pattern must not
    backtrack exponentially on a crafted non-matching path (the reason
    the matcher is a glob scan, not a compiled '.*'-joined regex)."""
    import time

    r = parse_robots(
        ("User-agent: *\nDisallow: /" + "a*" * 24 + "b\n").encode()
    )
    path = "/" + "a" * 5000  # never matches: no trailing 'b'
    t0 = time.perf_counter()
    assert r.allowed(path)
    assert not r.allowed("/" + "a" * 5000 + "b")
    assert time.perf_counter() - t0 < 0.5


def test_robots_sitemaps_are_global_and_deduped():
    body = (
        b"Sitemap: https://s.example/a.xml\n"
        b"User-agent: otherbot\n"
        b"Disallow: /\n"
        b"Sitemap: https://s.example/b.xml.gz\n"
        b"User-agent: *\n"
        b"Disallow: /private/\n"
        b"Sitemap: https://s.example/a.xml\n"  # dup -> dropped
    )
    r = parse_robots(body)  # our agent matches only the * group...
    assert not r.allowed("/private/x")
    # ...but Sitemap lines are group-independent (RFC 9309 2.2.4):
    # all hosts' sitemaps survive, document order, first-seen dedup
    assert r.sitemaps == [
        "https://s.example/a.xml", "https://s.example/b.xml.gz",
    ]
    # sitemaps survive even with no applicable group at all
    r2 = parse_robots(b"Sitemap: https://s.example/c.xml\n")
    assert r2.allowed("/x") and r2.sitemaps == ["https://s.example/c.xml"]


# -- seqs / budget -----------------------------------------------------
def test_child_seq_unique_blocks():
    a = child_seq(5, 63)
    b = child_seq(6, 0)
    assert a == (5 << LINK_BITS) + 64
    assert b == (6 << LINK_BITS) + 1
    assert a != b


def test_budget():
    assert domain_budget(1.0) == 60
    assert domain_budget(5.0) == 12
    assert domain_budget(0.1) == 600
    assert domain_budget(None) == 60
    assert domain_budget(120.0) == 1


# -- scope -------------------------------------------------------------
def test_split_host_pq():
    assert split_host_pq("https://sub.site.example/p/1?a=1") == (
        "sub.site.example",
        "/p/1?a=1",
    )
    assert split_host_pq("http://h.example:8080/") == ("h.example", "/")


def test_is_excluded():
    assert is_excluded("/private/x3", ("^/private/",))
    assert not is_excluded("/p/3", ("^/private/",))
    assert is_excluded("/p/3?a=1", ("^/private/", r"\?a="))
