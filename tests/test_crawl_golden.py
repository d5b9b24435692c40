"""Oracle-vs-engine golden tests — SURVEY.md §5.2(2,3,4).

The single-threaded oracle simulator runs the pinned crawl spec on the
micro fixture; the distributed Ray engine must reproduce its crawl
order exactly, its URL-seen membership exactly, and its extracted text
byte-identically per url (BASELINE.json north_star), plus every
per-round metric except wall_s.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
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
def oracle_run(micro_fixture):
    from spider_ray.oracle import OracleCrawl

    sim = OracleCrawl(micro_fixture)
    sim.run()
    return sim


@pytest.fixture(scope="module")
def engine_run(ray_session, micro_fixture, tmp_path_factory):
    from spider_ray.crawl.driver import CrawlDriver

    ckpt = str(tmp_path_factory.mktemp("ckpt_golden"))
    drv = CrawlDriver(micro_fixture, ckpt)
    metrics = drv.run(max_rounds=50)
    return drv, ckpt, metrics


def test_metrics_match(oracle_run, engine_run):
    _, _, metrics = engine_run
    assert len(metrics) == len(oracle_run.metrics)
    for i, (mo, me) in enumerate(zip(oracle_run.metrics, metrics)):
        diffs = {k: (mo[k], me.get(k)) for k in mo if mo[k] != me.get(k)}
        assert not diffs, f"round {i + 1}: {diffs}"


def test_crawl_order_matches(oracle_run, engine_run):
    _, ckpt, _ = engine_run
    eng = _norm(_read_all(ckpt, "order"), ORDER_KEY)
    gold = _norm(
        pd.DataFrame(
            oracle_run.crawl_order, columns=["seq", "round", "depth", "domain", "url"]
        ),
        ORDER_KEY,
    )
    pd.testing.assert_frame_equal(eng, gold)


def test_extracted_text_byte_identical(oracle_run, engine_run):
    _, ckpt, _ = engine_run
    cols = ["url", "text", "lang", "round", "seq"]
    eng = _norm(_read_all(ckpt, "out"), cols)
    gold = _norm(pd.DataFrame(oracle_run.extracted, columns=cols), cols)
    pd.testing.assert_frame_equal(eng, gold)
    # explicit byte-identity vs the corpus text column (input_hint invariant)
    pages = pq.read_table(
        os.path.join(oracle_run_fixture_dir(oracle_run), "pages.parquet"),
        columns=["url", "text"],
    ).to_pandas()
    joined = eng.merge(pages, on="url", suffixes=("_eng", "_corpus"))
    assert len(joined) == len(eng)
    assert (
        joined["text_eng"].str.encode("utf-8")
        == joined["text_corpus"].str.encode("utf-8")
    ).all()


def oracle_run_fixture_dir(sim) -> str:
    return sim._fixture_dir


def test_seen_membership_matches(oracle_run, engine_run):
    drv, ckpt, _ = engine_run
    last = sorted(glob.glob(os.path.join(ckpt, "round=*")))[-1]
    exact = np.concatenate(
        [np.load(f) for f in sorted(glob.glob(os.path.join(last, "seen", "*.exact.npy")))]
    )
    gold = np.array(sorted(oracle_run.seen.values()), dtype=np.uint64)
    assert np.array_equal(np.sort(exact), gold)
    # cuckoo filters reported zero false-positive hits at test scale
    for st in drv.seen_stats():
        assert st["false_hits"] == 0


def test_manifests_complete(engine_run):
    _, ckpt, metrics = engine_run
    rounds = sorted(glob.glob(os.path.join(ckpt, "round=*")))
    assert len(rounds) == len(metrics) + 1  # + round 0
    for r in rounds:
        with open(os.path.join(r, "manifest.json")) as f:
            man = json.load(f)
        assert man["schema_version"] == 1
        assert os.path.isdir(os.path.join(r, "frontier"))
        assert glob.glob(os.path.join(r, "seen", "*.npz"))


def test_small_scale_engine_matches_oracle(ray_session, tmp_path_factory):
    """Second golden scale (~10k pages): the engine must match the
    oracle beyond the micro fixture — catches anything size-dependent
    (block splits, salting slices, bucket counts)."""
    from spider_ray.crawl.driver import CrawlDriver
    from spider_ray.fixtures.gen import generate
    from spider_ray.oracle import OracleCrawl

    fix = str(tmp_path_factory.mktemp("small_fix"))
    generate("small", fix)
    sim = OracleCrawl(fix)
    sim.run()
    ckpt = str(tmp_path_factory.mktemp("small_ckpt"))
    drv = CrawlDriver(fix, ckpt)
    metrics = drv.run(max_rounds=4)
    drv.close()
    for i, (mo, me) in enumerate(zip(sim.metrics[:4], metrics)):
        diffs = {k: (mo[k], me.get(k)) for k in mo
                 if k != "wall_s" and mo[k] != me.get(k)}
        assert not diffs, f"round {i + 1}: {diffs}"
    eng = _norm(_read_all(ckpt, "order"), ORDER_KEY)
    gold = _norm(
        pd.DataFrame(
            [r for r in sim.crawl_order if r[1] <= 4],
            columns=["seq", "round", "depth", "domain", "url"],
        ),
        ORDER_KEY,
    )
    pd.testing.assert_frame_equal(eng, gold)
