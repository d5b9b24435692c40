"""robots.txt ``Sitemap:`` seed discovery (sources.seeds_from_robots):
the distributed discovery pipeline vs its sequential no-Ray twin on a
sitemap-advertising derived fixture, plus the crawl wiring (round-0
frontier seeded exactly with the discovered urls)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from spider_ray.fixtures.gen import (ensure_derived_fixture,
                                     inject_robots_sitemaps)
from spider_ray.sources.sitemap import (seeds_from_robots,
                                        seeds_from_robots_seq)


@pytest.fixture(scope="module")
def robots_fixture(tmp_path_factory, micro_fixture):
    dst = str(tmp_path_factory.mktemp("robots_sm") / "fix")
    return ensure_derived_fixture(micro_fixture, dst,
                                  inject_robots_sitemaps)


def test_discovery_matches_sequential_twin(ray_session, robots_fixture):
    eng = seeds_from_robots(robots_fixture)
    seq = seeds_from_robots_seq(robots_fixture)
    assert eng == seq
    assert len(eng) > 0
    assert len(eng) == len(set(eng))
    # only every-3rd host advertises; all discovered urls belong to
    # hosts that actually have a sitemap file
    advertised = {os.path.basename(p)[:-len(".xml")]
                  for p in glob.glob(
                      os.path.join(robots_fixture, "sitemaps", "*.xml"))}
    assert advertised, "derivation produced no sitemap files"
    assert {u.split("/", 3)[2] for u in eng} == advertised


def test_unannotated_fixture_discovers_nothing(ray_session, micro_fixture):
    assert seeds_from_robots(micro_fixture) == []
    assert seeds_from_robots_seq(micro_fixture) == []


def test_crawl_round0_frontier_is_discovered_seeds(
        ray_session, robots_fixture, tmp_path):
    from spider_ray.core.config import load_crawl_config
    from spider_ray.crawl.driver import CrawlDriver

    seeds = seeds_from_robots(robots_fixture)
    ckpt = str(tmp_path / "ckpt")
    drv = CrawlDriver(robots_fixture, ckpt,
                      load_crawl_config(robots_fixture, max_depth=0),
                      seed_urls=seeds)
    drv.run(max_rounds=1)
    drv.close()
    frontier_files = sorted(glob.glob(
        os.path.join(ckpt, "round=0000", "frontier", "*.parquet")))
    assert frontier_files
    got = sorted(
        u for f in frontier_files
        for u in pq.read_table(f, columns=["url"]).column("url").to_pylist()
    )
    from spider_ray.core.canon import canonicalize

    assert got == sorted({canonicalize(u) for u in seeds})
