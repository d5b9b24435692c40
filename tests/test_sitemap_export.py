"""Publish-direction sitemap export (sources.sitemaps_from_crawl):
a crawl checkpoint's extracted urls round-trip through per-host
urlsets + a sitemapindex back into the reader/seed path, and the
export is byte-deterministic."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from spider_ray.sources.sitemap import (parse_sitemap_bytes,
                                        read_sitemaps,
                                        sitemap_seed_table,
                                        sitemaps_from_crawl)


@pytest.fixture(scope="module")
def crawl_ckpt(tmp_path_factory, micro_fixture, ray_session):
    from spider_ray.crawl.driver import CrawlDriver

    ckpt = str(tmp_path_factory.mktemp("sm_export") / "ckpt")
    drv = CrawlDriver(micro_fixture, ckpt)
    drv.run(max_rounds=2)
    drv.close()
    return ckpt


def _extracted_urls(ckpt: str) -> set[str]:
    return {
        u
        for f in glob.glob(os.path.join(ckpt, "round=*", "out", "*.parquet"))
        for u in pq.read_table(f, columns=["url"]).column("url").to_pylist()
    }


def test_export_roundtrips_extracted_set(ray_session, crawl_ckpt, tmp_path):
    out = str(tmp_path / "sm")
    manifest = sitemaps_from_crawl(crawl_ckpt, out)
    want = _extracted_urls(crawl_ckpt)
    assert sum(manifest.column("n_urls").to_pylist()) == len(want)

    # per-host files carry exactly the extracted urls of that host
    got: set[str] = set()
    for p in manifest.column("path").to_pylist():
        with open(p, "rb") as f:
            t = parse_sitemap_bytes(f.read())
        got.update(t.column("url").to_pylist())
    assert got == want

    # the index advertises exactly the per-host sitemap urls
    with open(os.path.join(out, "sitemap_index.xml"), "rb") as f:
        idx = parse_sitemap_bytes(f.read())
    assert set(idx.column("kind").to_pylist()) == {"sitemap"}
    assert sorted(idx.column("url").to_pylist()) == sorted(
        f"https://{h}/sitemap.xml"
        for h in manifest.column("host").to_pylist()
    )

    # full reader round-trip: seeding a crawl from the export targets
    # exactly the published set (index rows are kind="sitemap" and
    # excluded by the seed rule)
    seeds = sitemap_seed_table(
        read_sitemaps(sorted(glob.glob(os.path.join(out, "*.xml"))))
    ).column("url").to_pylist()
    assert set(seeds) == want


def test_export_is_byte_deterministic(ray_session, crawl_ckpt, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    sitemaps_from_crawl(crawl_ckpt, a)
    sitemaps_from_crawl(crawl_ckpt, b)
    fa = sorted(os.listdir(a))
    assert fa == sorted(os.listdir(b))
    for name in fa:
        with open(os.path.join(a, name), "rb") as f1, \
                open(os.path.join(b, name), "rb") as f2:
            assert f1.read() == f2.read(), name


def test_export_without_outputs_raises(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError):
        sitemaps_from_crawl(str(tmp_path / "empty_ckpt"),
                            str(tmp_path / "sm"))
