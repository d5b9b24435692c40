"""Trap-guard crawl integration — engine vs oracle golden on a
trap-injected fixture (core/traps.py; SURVEY.md §2.2 M4 extension).

The guard is config-gated OFF by default: the pinned micro/small
goldens never see it (test_crawl_golden.py covers those bit-for-bit).
Here a modified micro fixture injects crawler-trap hrefs (a
repeated-segment path and a faceted-search query explosion) into every
7th page, and the crawl runs with ``trap_guard=True``: the engine must
match the oracle's order/metrics exactly and both must drop the trap
candidates with ``trap_dropped`` counts agreeing per round."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from spider_ray.fixtures.gen import TRAP_PATH  # noqa: E402

_TRAP_MARKS = (TRAP_PATH, "f9=v")  # path cycle, 10th facet param

ORDER_KEY = ["round", "depth", "domain", "seq", "url"]


def _read_all(ckpt: str, sub: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(ckpt, "round=*", sub, "*.parquet")))
    return pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )


def _norm(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    out = df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in out.columns:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
    return out


@pytest.fixture(scope="module")
def trap_fixture(micro_fixture, tmp_path_factory):
    """Micro fixture with trap hrefs injected by the shared helper
    (fixtures/gen.py inject_trap_links — the same derivation the
    golden generator and the harness query use)."""
    from spider_ray.fixtures.gen import inject_trap_links

    root = str(tmp_path_factory.mktemp("trapfix"))
    inject_trap_links(micro_fixture, root)
    # sanity: the injection actually landed in a nontrivial page count
    pages = pq.read_table(os.path.join(root, "pages.parquet"),
                          columns=["html"])
    injected = sum(
        1 for h in pages.column("html").to_pylist() if b'>loop</a>' in h
    )
    assert injected > 100
    return root


@pytest.fixture(scope="module")
def oracle_runs(trap_fixture):
    """Oracle with the guard ON and OFF on the same trap fixture."""
    from spider_ray.core.config import load_crawl_config
    from spider_ray.oracle import OracleCrawl

    on = OracleCrawl(
        trap_fixture, load_crawl_config(trap_fixture, trap_guard=True)
    )
    on.run()
    off = OracleCrawl(trap_fixture)
    off.run()
    return on, off


def test_guard_off_traps_get_selected(oracle_runs):
    _, off = oracle_runs
    trap_urls = [u for (_, _, _, _, u) in off.crawl_order
                 if any(t in u for t in _TRAP_MARKS)]
    assert trap_urls, "guard-off crawl must select the injected traps"
    assert all(m.get("trap_dropped", 0) == 0 for m in off.metrics)


def test_guard_on_oracle_drops_traps(oracle_runs):
    on, off = oracle_runs
    assert not any(
        any(t in u for t in _TRAP_MARKS)
        for (_, _, _, _, u) in on.crawl_order
    )
    assert sum(m["trap_dropped"] for m in on.metrics) > 0
    # guard only removes trap candidates; clean pages crawl identically
    clean_off = {u for (_, _, _, _, u) in off.crawl_order
                 if not any(t in u for t in _TRAP_MARKS)}
    clean_on = {u for (_, _, _, _, u) in on.crawl_order}
    assert clean_on == clean_off


def test_engine_matches_oracle_with_guard(
    ray_session, trap_fixture, oracle_runs, tmp_path_factory
):
    from spider_ray.core.config import load_crawl_config
    from spider_ray.crawl.driver import CrawlDriver

    on, _ = oracle_runs
    ckpt = str(tmp_path_factory.mktemp("trap_ckpt"))
    cfg = load_crawl_config(trap_fixture, trap_guard=True)
    drv = CrawlDriver(trap_fixture, ckpt, cfg)
    metrics = drv.run(max_rounds=50)
    drv.close()
    assert len(metrics) == len(on.metrics)
    for i, (mo, me) in enumerate(zip(on.metrics, metrics)):
        diffs = {k: (mo[k], me.get(k)) for k in mo
                 if k != "wall_s" and mo[k] != me.get(k)}
        assert not diffs, f"round {i + 1}: {diffs}"
    assert sum(m["trap_dropped"] for m in metrics) > 0
    eng = _norm(_read_all(ckpt, "order"), ORDER_KEY)
    gold = _norm(
        pd.DataFrame(
            on.crawl_order, columns=["seq", "round", "depth", "domain", "url"]
        ),
        ORDER_KEY,
    )
    pd.testing.assert_frame_equal(eng, gold)


def test_config_hash_stable_when_off(trap_fixture):
    from spider_ray.core.config import CrawlConfig, load_crawl_config

    off = load_crawl_config(trap_fixture)
    assert "trap" not in off.to_json()
    on = load_crawl_config(trap_fixture, trap_guard=True)
    assert on.config_hash() != off.config_hash()
    assert CrawlConfig.from_json(on.to_json()).trap_guard is True
    rt = CrawlConfig.from_json(on.to_json())
    assert rt.config_hash() == on.config_hash()
