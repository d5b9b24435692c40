"""End-to-end live-mode crawl (T3 wired into the driver) — VERDICT r02
next-round #4: a full multi-round crawl runs through the LiveFetcher
actor pool with the fake transport, politeness windows reserved from
the T2 gates, and the frontier/seen invariants hold.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest


def _read_all(ckpt: str, sub: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(ckpt, "round=*", sub, "*.parquet")))
    return pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )


@pytest.fixture(scope="module")
def live_run(ray_session, micro_fixture, tmp_path_factory):
    from spider_ray.crawl.driver import CrawlDriver

    ckpt = str(tmp_path_factory.mktemp("ckpt_live"))
    drv = CrawlDriver(
        micro_fixture, ckpt, fetch_mode="live",
        # full reservation protocol, zero-length sleeps (test speed)
        fetcher_kwargs={"politeness_scale": 0.0},
    )
    metrics = drv.run(max_rounds=4)
    stats = drv.seen_stats()
    drv.close()
    return ckpt, metrics, stats


def test_live_crawl_completes_rounds(live_run):
    ckpt, metrics, _ = live_run
    assert len(metrics) >= 2  # the fake web keeps discovering /next links
    for m in metrics:
        assert m["fetched"] + m["fetch_errors"] == m["selected"]
        assert m["fetch_timeouts"] <= m["fetch_errors"]
        assert m["selected"] > 0


def test_live_crawl_no_url_fetched_twice(live_run):
    ckpt, _, _ = live_run
    order = _read_all(ckpt, "order")
    assert len(order) > 0
    assert order["url"].is_unique  # cross-round seen-set held


def test_live_crawl_seen_covers_selected(live_run):
    ckpt, metrics, stats = live_run
    # every selected URL was committed to the seen shards (J2 semantics:
    # seen == will-be-fetched), and the exact sidecar saw no cuckoo
    # false positives
    n_selected = sum(m["selected"] for m in metrics)
    assert sum(s["items"] for s in stats) == n_selected
    assert all(s["false_hits"] == 0 for s in stats)


def test_live_crawl_extracted_from_fake_transport(live_run):
    ckpt, metrics, _ = live_run
    out = _read_all(ckpt, "out")
    assert len(out) == sum(m["fetched"] for m in metrics)
    assert out["text"].str.contains("fake body").all()


def test_live_frontier_chains_to_next_round(live_run):
    ckpt, metrics, _ = live_run
    # frontier rows written by round k == enqueued metric of round k
    for k, m in enumerate(metrics, start=1):
        files = sorted(
            glob.glob(os.path.join(ckpt, f"round={k:04d}", "frontier",
                                   "*.parquet"))
        )
        n = sum(pq.read_metadata(f).num_rows for f in files)
        assert n == m["enqueued"]


def test_live_crawl_counts_redirects(live_run):
    """fetch_redirects counts followed same-host hops: every SELECTED
    url whose fake response is a same-host 301 (d[0] % 16 == 6)
    contributes at least one hop, so the metric is bounded below by
    the deterministic count over the urls the crawl actually chose
    (chain continuations can only add hops on top)."""
    import hashlib

    ckpt, metrics, _ = live_run
    selected = _read_all(ckpt, "order")["url"]
    expect = sum(
        1 for u in selected
        if "/rloop" not in u
        and hashlib.sha1(u.encode()).digest()[0] % 16 == 6
    )
    got = sum(m.get("fetch_redirects", 0) for m in metrics)
    assert got >= expect
    if expect == 0:  # tiny-crawl fallback: exercise the path directly
        out = _fetch_batch(["http://d.example/p9"])  # any url works:
        assert "redirects" in out.schema.names


def _fetch_batch(urls):
    import pyarrow as pa

    from spider_ray.crawl.fetcher import LiveFetcher

    f = LiveFetcher(fake=True, politeness_scale=0.0)
    return f(pa.table({
        "url": pa.array(urls, pa.string()),
        "domain": pa.array(["d.example"] * len(urls), pa.string()),
    }))


def test_redirect_same_host_followed_to_final_body():
    """A same-host 301 chain ends in the TARGET's body under the
    ORIGINAL url row; hop count recorded; no redirect_to."""
    import hashlib

    # find a url whose fake response is 301 (d[0] % 16 == 6) and whose
    # target resolves to a 200
    url = None
    for i in range(5000):
        u = f"http://d.example/p{i}"
        d = hashlib.sha1(u.encode()).digest()
        if d[0] % 16 == 6:
            t = hashlib.sha1((u + "/r").encode()).digest()
            if t[0] % 32 != 1 and t[0] % 8 != 0 and t[0] % 16 != 6 \
                    and t[0] % 32 != 12:
                url = u
                break
    assert url is not None
    out = _fetch_batch([url])
    assert out.column("found")[0].as_py() == 1
    assert out.column("redirects")[0].as_py() == 1
    assert out.column("redirect_to")[0].as_py() == ""
    body = out.column("html")[0].as_py().decode()
    assert f"<h1>{url}/r</h1>" in body  # final hop's body
    assert out.column("url")[0].as_py() == url  # row keeps request url


def test_redirect_cross_host_not_followed():
    """An off-host 301 is never fetched inline (no politeness
    reservation for the target domain): fetch miss + target surfaced."""
    import hashlib

    url = next(
        u for u in (f"http://d.example/q{i}" for i in range(5000))
        if hashlib.sha1(u.encode()).digest()[0] % 32 == 12
    )
    out = _fetch_batch([url])
    assert out.column("found")[0].as_py() == 0
    assert out.column("redirects")[0].as_py() == 0
    from urllib.parse import urlsplit

    tgt = out.column("redirect_to")[0].as_py()
    assert tgt.startswith("http://offsite-")
    assert urlsplit(tgt).netloc != "d.example"


def test_conditional_fetch_304_roundtrip():
    """First fetch yields the entity tag; re-fetching with it returns
    304 (not_modified, no body, found stays 0); a stale validator
    re-fetches in full with a fresh tag."""
    import pyarrow as pa

    from spider_ray.crawl.fetcher import LiveFetcher

    f = LiveFetcher(fake=True, politeness_scale=0.0)
    url = "http://d.example/p2"  # plain-200 url (no 404/301/599 rule)
    import hashlib

    d = hashlib.sha1(url.encode()).digest()
    assert d[0] % 8 and d[0] % 32 != 1 and d[0] % 16 != 6 \
        and d[0] % 32 != 12
    first = f(pa.table({"url": pa.array([url]),
                        "domain": pa.array(["d.example"])}))
    assert first.column("found")[0].as_py() == 1
    tag = first.column("etag")[0].as_py()
    assert tag != ""
    again = f(pa.table({"url": pa.array([url]),
                        "domain": pa.array(["d.example"]),
                        "etag": pa.array([tag])}))
    assert again.column("not_modified")[0].as_py() == 1
    assert again.column("found")[0].as_py() == 0
    assert again.column("html")[0].as_py() == b""
    assert again.column("etag")[0].as_py() == tag  # current tag echoed
    stale = f(pa.table({"url": pa.array([url]),
                        "domain": pa.array(["d.example"]),
                        "etag": pa.array(["stale-validator"])}))
    assert stale.column("not_modified")[0].as_py() == 0
    assert stale.column("found")[0].as_py() == 1
    assert stale.column("etag")[0].as_py() == tag


def test_redirect_loop_bounded_by_max_redirects():
    out = _fetch_batch(["http://d.example/rloop"])
    assert out.column("found")[0].as_py() == 0
    assert out.column("redirects")[0].as_py() == 5  # default cap
    assert out.column("redirect_to")[0].as_py() == "http://d.example/rloop"


def test_reserve_fetch_slots_serializes_domain(ray_session, micro_fixture):
    """T2 politeness: consecutive reservations for one domain get
    non-overlapping, correctly spaced windows; scale=0 collapses the
    spacing to zero without breaking the protocol."""
    import ray

    from spider_ray.core.config import load_crawl_config
    from spider_ray.crawl.state import DomainGate

    cfg = load_crawl_config(micro_fixture)
    g = DomainGate.remote(0, cfg)
    d = "site00.example"
    delay = cfg.crawl_delay(d)
    (s1, sp1), = ray.get(g.reserve_fetch_slots.remote([d], [5], 1.0))
    (s2, sp2), = ray.get(g.reserve_fetch_slots.remote([d], [3], 1.0))
    assert sp1 == pytest.approx(delay)
    assert s2 >= s1 + 5 * delay - 1e-6  # window 2 starts after window 1
    (s3, sp3), = ray.get(g.reserve_fetch_slots.remote([d], [100], 0.0))
    assert sp3 == 0.0
    ray.kill(g)


def test_sitemap_seeded_crawl_round0(ray_session, micro_fixture, tmp_path):
    """CrawlDriver(seed_urls=...) — the --sitemaps CLI path — seeds
    round 0 from sitemap-discovered urls instead of seeds.parquet."""
    import glob

    import pyarrow.parquet as pq

    from spider_ray.core.config import load_seed_urls
    from spider_ray.crawl.driver import CrawlDriver
    from spider_ray.sources import (
        read_sitemaps, sitemap_bytes, sitemap_seed_table,
    )

    fixture_seeds = load_seed_urls(micro_fixture)
    picked = fixture_seeds[:3]
    sm = tmp_path / "seeds.xml"
    import pyarrow as pa

    sm.write_bytes(sitemap_bytes(pa.table({
        "kind": pa.array(["url"] * len(picked)),
        "url": pa.array(picked),
        "lastmod_ts": pa.array([0] * len(picked), pa.timestamp("us")),
        "changefreq": pa.array([""] * len(picked)),
        "priority": pa.array([-1] * len(picked), pa.int32()),
    })))
    seed_urls = sitemap_seed_table(
        read_sitemaps(str(sm))
    ).column("url").to_pylist()
    assert seed_urls == picked

    ckpt = str(tmp_path / "ckpt_sm")
    drv = CrawlDriver(micro_fixture, ckpt, seed_urls=seed_urls)
    drv.run(max_rounds=1)
    drv.close()
    frontier0 = pa.concat_tables([
        pq.read_table(f) for f in sorted(
            glob.glob(f"{ckpt}/round=0000/frontier/*.parquet"))
    ])
    assert sorted(frontier0.column("url").to_pylist()) == sorted(picked)


def test_oversize_body_aborted():
    """A response larger than max_body_bytes counts as a miss with
    NOTHING kept (truncated html would extract wrong text silently)."""
    out = _fetch_batch(["http://d.example/bigbody"])
    assert out.column("found")[0].as_py() == 0
    assert out.column("oversize")[0].as_py() == 1
    assert out.column("html")[0].as_py() == b""
    small = _fetch_batch(["http://d.example/p2"])
    assert small.column("oversize")[0].as_py() == 0
