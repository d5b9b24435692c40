"""Multi-file pages corpus (VERDICT r04 item 7).

A 100 TB corpus is tens of thousands of parquet files; the driver's
corpus spec therefore accepts a directory (or glob) of parts, not only
one file.  These tests split the micro fixture's pages.parquet into 8
shards and assert the crawl goldens are byte-identical to the
single-file run — the bucketed layout sorts by url inside each bucket,
so the split MUST be invisible.
"""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

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
def split_fixture(micro_fixture, tmp_path_factory):
    """Copy the micro fixture, replacing pages.parquet with a
    pages_parts/ directory of 8 shards (round-robin rows, so every
    shard interleaves domains — the adversarial split)."""
    root = str(tmp_path_factory.mktemp("micro_split"))
    for name in os.listdir(micro_fixture):
        if name == "pages.parquet":
            continue
        src = os.path.join(micro_fixture, name)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(root, name))
        else:
            shutil.copy2(src, os.path.join(root, name))
    pages = pq.read_table(os.path.join(micro_fixture, "pages.parquet"))
    parts_dir = os.path.join(root, "pages_parts")
    os.makedirs(parts_dir)
    n = 8
    assert len(pages) >= n
    for i in range(n):
        shard = pages.take(list(range(i, len(pages), n)))
        pq.write_table(shard, os.path.join(parts_dir, f"part-{i:02d}.parquet"))
    return root


@pytest.fixture(scope="module")
def single_run(ray_session, micro_fixture, tmp_path_factory):
    from spider_ray.crawl.driver import CrawlDriver

    ckpt = str(tmp_path_factory.mktemp("ckpt_single"))
    drv = CrawlDriver(micro_fixture, ckpt)
    metrics = drv.run(max_rounds=50)
    return ckpt, metrics


@pytest.fixture(scope="module")
def split_run(ray_session, split_fixture, tmp_path_factory):
    from spider_ray.crawl.driver import CrawlDriver

    ckpt = str(tmp_path_factory.mktemp("ckpt_split"))
    drv = CrawlDriver(split_fixture, ckpt, pages_file="pages_parts")
    metrics = drv.run(max_rounds=50)
    return ckpt, metrics


def test_metrics_identical(single_run, split_run):
    _, m1 = single_run
    _, m2 = split_run
    assert len(m1) == len(m2)
    for i, (a, b) in enumerate(zip(m1, m2)):
        diffs = {
            k: (a[k], b.get(k))
            for k in a
            if k != "wall_s" and a[k] != b.get(k)
        }
        assert not diffs, f"round {i + 1}: {diffs}"


def test_order_and_text_identical(single_run, split_run):
    ckpt1, _ = single_run
    ckpt2, _ = split_run
    pd.testing.assert_frame_equal(
        _norm(_read_all(ckpt1, "order"), ORDER_KEY),
        _norm(_read_all(ckpt2, "order"), ORDER_KEY),
    )
    cols = ["url", "text", "lang", "round", "seq"]
    pd.testing.assert_frame_equal(
        _norm(_read_all(ckpt1, "out"), cols),
        _norm(_read_all(ckpt2, "out"), cols),
    )


def test_glob_spec_equivalent(ray_session, split_fixture, split_run,
                              tmp_path_factory):
    """A glob spec resolves to the same sorted file list as the
    directory spec; the bucketed layouts must therefore match."""
    from spider_ray.crawl.driver import CrawlDriver

    ckpt = str(tmp_path_factory.mktemp("ckpt_glob"))
    drv = CrawlDriver(split_fixture, ckpt,
                      pages_file="pages_parts/part-*.parquet")
    metrics = drv.run(max_rounds=50)
    _, m2 = split_run
    assert len(metrics) == len(m2)
    for a, b in zip(metrics, m2):
        assert {k: v for k, v in a.items() if k != "wall_s"} == {
            k: v for k, v in b.items() if k != "wall_s"
        }


def test_missing_spec_raises(ray_session, tmp_path):
    from spider_ray.core.config import CrawlConfig
    from spider_ray.crawl.driver import CrawlDriver

    cfg = CrawlConfig(allowed_domains=frozenset(), exclusions={},
                      robots_bodies={}, crawl_delays={})
    drv = CrawlDriver(str(tmp_path), str(tmp_path / "ckpt"),
                      cfg=cfg, pages_file="nope-*.parquet")
    with pytest.raises(FileNotFoundError):
        drv._resolve_corpus_source(drv.pages_file)
