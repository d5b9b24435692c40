"""Public Suffix List engine (core/psl.py) and the A.3 backend switch."""

from __future__ import annotations

import pytest

from spider_ray.core import regdomain
from spider_ray.core.psl import VENDORED_DAT_PATH, PublicSuffixList

PSL = PublicSuffixList.snapshot()


@pytest.fixture(params=["snapshot", "vendored"])
def ruleset(request):
    """Every registrable-domain case must hold on BOTH the curated
    snapshot and the real vendored publicsuffix.org list (VERDICT r04
    item 8: unit tests run against the real list)."""
    return PSL if request.param == "snapshot" else PublicSuffixList.vendored()


@pytest.mark.parametrize(
    "host,expected",
    [
        # plain ICANN rules
        ("www.example.com", "example.com"),
        ("a.b.c.example.org", "example.org"),
        ("www.bbc.co.uk", "bbc.co.uk"),
        ("deep.sub.foo.co.uk", "foo.co.uk"),
        ("example.com", "example.com"),
        # private-section suffixes: each tenant is its own registrable
        # domain (the round-1 heuristic mis-grouped all of these)
        ("foo.blogspot.com", "foo.blogspot.com"),
        ("foo.blogspot.co.uk", "foo.blogspot.co.uk"),
        ("www.foo.blogspot.co.uk", "foo.blogspot.co.uk"),
        ("alice.github.io", "alice.github.io"),
        ("api.myapp.herokuapp.com", "myapp.herokuapp.com"),
        # wildcard registry *.ck: any second-level label is a suffix
        ("shop.stuff.co.ck", "stuff.co.ck"),
        # exception rule !www.ck beats the wildcard
        ("www.ck", "www.ck"),
        ("sub.www.ck", "www.ck"),
        # unknown TLD -> implicit default rule '*': last label is suffix
        ("foo.bar.unknowntld", "bar.unknowntld"),
        # host IS a public suffix: unchanged, never truncated
        ("co.uk", "co.uk"),
        ("blogspot.com", "blogspot.com"),
        # wildcard Japanese city domains with city.* exceptions
        ("a.b.kobe.jp", "a.b.kobe.jp"),
        ("city.kobe.jp", "city.kobe.jp"),
        ("www.city.kobe.jp", "city.kobe.jp"),
        # single label / IP literal unchanged
        ("localhost", "localhost"),
        ("192.168.0.1", "192.168.0.1"),
    ],
)
def test_psl_registrable(ruleset, host, expected):
    assert ruleset.registrable_domain(host) == expected


def test_vendored_list_is_the_real_one():
    """The vendored .dat is the verbatim publicsuffix.org list: full
    ICANN + private sections, thousands of rules, both wildcards and
    exceptions present — and it is what PSL mode loads by default."""
    import os

    assert os.path.isfile(VENDORED_DAT_PATH)
    p = PublicSuffixList.vendored()
    assert len(p.exact) > 5000
    assert len(p.wildcard) > 10
    assert len(p.exception) > 2
    # spot checks only the real list gets right (not in the snapshot):
    # *.compute.amazonaws.com makes y.compute... the public suffix
    assert (
        p.registrable_domain("x.y.compute.amazonaws.com")
        == "x.y.compute.amazonaws.com"
    )
    assert p.registrable_domain("a.b.s3.amazonaws.com") == "b.s3.amazonaws.com"
    try:
        regdomain.use_psl()
        # default PSL mode resolves to the vendored rules (object cache)
        assert regdomain._psl.exact == p.exact
    finally:
        regdomain.use_heuristic()


def test_full_dat_file_parses(tmp_path):
    """A verbatim .dat file (comments, sections, blank lines) loads and
    overrides the snapshot behavior."""
    dat = tmp_path / "public_suffix_list.dat"
    dat.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\nuk\nco.uk\n\n*.custom\n!ok.custom\n"
        "// ===END ICANN DOMAINS===\n"
        "// ===BEGIN PRIVATE DOMAINS===\nmysaas.com\n"
        "// ===END PRIVATE DOMAINS===\n"
    )
    p = PublicSuffixList.from_file(str(dat))
    assert p.registrable_domain("tenant.mysaas.com") == "tenant.mysaas.com"
    assert p.registrable_domain("a.b.custom") == "a.b.custom"
    assert p.registrable_domain("x.ok.custom") == "ok.custom"


def test_backend_switch_roundtrip():
    try:
        assert regdomain.registrable_domain("foo.blogspot.co.uk") == "blogspot.co.uk"
        regdomain.use_psl()
        assert regdomain.registrable_domain("foo.blogspot.co.uk") == "foo.blogspot.co.uk"
        # fixture hosts agree across backends (goldens stay valid)
        assert regdomain.registrable_domain("www.site7.example") == "site7.example"
    finally:
        regdomain.use_heuristic()
    assert regdomain.registrable_domain("foo.blogspot.co.uk") == "blogspot.co.uk"


def test_config_psl_roundtrip_and_hash_stability(tmp_path):
    from spider_ray.core.config import CrawlConfig

    base = dict(allowed_domains=frozenset({"a.example"}), exclusions={},
                robots_bodies={}, crawl_delays={})
    heur = CrawlConfig(**base)
    psl = CrawlConfig(**base, psl=True)
    assert CrawlConfig.from_json(psl.to_json()).psl is True
    assert CrawlConfig.from_json(heur.to_json()).psl is False
    # psl=False configs hash exactly as before the field existed
    assert "psl" not in heur.to_json()
    assert heur.config_hash() != psl.config_hash()


def test_psl_mode_crawl_engine_matches_oracle(
    ray_session, micro_fixture, tmp_path_factory
):
    """End-to-end PSL-mode parity: the psl flag rides the broadcast
    config into every worker (get_cfg / add_bucket pin the backend), so
    engine and oracle agree under the PSL backend exactly as they do
    under the heuristic.  Fixture hosts are *.example, where the two
    backends coincide — this proves the PLUMBING is consistent, the
    backend itself is covered by the unit tests above."""
    from spider_ray.core import regdomain
    from spider_ray.core.config import load_crawl_config
    from spider_ray.crawl.driver import CrawlDriver
    from spider_ray.oracle import OracleCrawl

    try:
        cfg = load_crawl_config(micro_fixture, psl=True)
        sim = OracleCrawl(micro_fixture, cfg)
        sim.run(3)
        ckpt = str(tmp_path_factory.mktemp("ckpt_psl"))
        drv = CrawlDriver(micro_fixture, ckpt, cfg)
        metrics = drv.run(max_rounds=3)
        drv.close()
        assert regdomain._psl is not None  # driver-side backend active
        for i, (mo, me) in enumerate(zip(sim.metrics[:3], metrics)):
            diffs = {k: (mo[k], me.get(k)) for k in mo
                     if k != "wall_s" and mo[k] != me.get(k)}
            assert not diffs, f"round {i + 1}: {diffs}"
    finally:
        regdomain.use_heuristic()
