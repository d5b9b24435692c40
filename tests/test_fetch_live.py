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
