"""Continuous daemon mode (VERDICT r04 item 5 — the reference's
long-running loop that interleaves fresh crawling with scheduled
re-visits, §3.1 step 3): CrawlDriver.run_continuous vs the sequential
oracle's run_continuous on the same schedule must match byte-for-byte,
and a driver killed mid-schedule must resume to identical outputs."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

SCHEDULE = ["crawl", "crawl", "revisit", "crawl", "revisit", "crawl"]
ORDER_KEY = ["round", "depth", "domain", "seq", "url"]
EXTRACT_KEY = ["url", "text", "lang", "round", "seq"]
REVISIT_KEY = ["url", "domain", "old_checksum", "new_checksum", "changed",
               "round"]


def _collect(ckpt: str, sub: str, cols: list[str]) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(ckpt, "round=*", sub, "*.parquet")))
    df = pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )
    out = df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in out.columns:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
    return out


@pytest.fixture(scope="module")
def oracle_run(micro_fixture):
    from spider_ray.oracle import OracleCrawl

    sim = OracleCrawl(micro_fixture)
    results = sim.run_continuous(SCHEDULE)
    return sim, results


@pytest.fixture(scope="module")
def engine_run(ray_session, micro_fixture, tmp_path_factory):
    from spider_ray.crawl.driver import CrawlDriver

    ckpt = str(tmp_path_factory.mktemp("ckpt_cont"))
    drv = CrawlDriver(micro_fixture, ckpt)
    results = drv.run_continuous(SCHEDULE)
    drv.close()
    return ckpt, results


def _norm_oracle_order(sim) -> pd.DataFrame:
    df = pd.DataFrame(
        sim.crawl_order, columns=["seq", "round", "depth", "domain", "url"]
    )[ORDER_KEY]
    return df.sort_values(ORDER_KEY, kind="mergesort").reset_index(drop=True)


def _norm_oracle_extracted(sim) -> pd.DataFrame:
    df = pd.DataFrame(sim.extracted, columns=EXTRACT_KEY)
    return df.sort_values(EXTRACT_KEY, kind="mergesort").reset_index(drop=True)


def _norm_oracle_revisit(sim) -> pd.DataFrame:
    df = pd.DataFrame(sim.revisit_rows, columns=REVISIT_KEY)
    return df.sort_values(REVISIT_KEY, kind="mergesort").reset_index(drop=True)


def test_continuous_matches_oracle_byte_for_byte(oracle_run, engine_run):
    sim, oracle_results = oracle_run
    ckpt, engine_results = engine_run
    # every scheduled step produced a result dict, in schedule order
    assert len(engine_results) == len(SCHEDULE) == len(oracle_results)
    for step, mo, me in zip(SCHEDULE, oracle_results, engine_results):
        diffs = {
            k: (mo[k], me.get(k))
            for k in mo if k != "wall_s" and mo[k] != me.get(k)
        }
        assert not diffs, f"{step}: {diffs}"
    # crawl order (crawl rounds only; revisit rounds write empty order)
    pd.testing.assert_frame_equal(
        _collect(ckpt, "order", ORDER_KEY), _norm_oracle_order(sim)
    )
    # extracted text: crawl rounds + CHANGED pages of revisit rounds,
    # byte-identical per url (the north-rule invariant)
    pd.testing.assert_frame_equal(
        _collect(ckpt, "out", EXTRACT_KEY), _norm_oracle_extracted(sim)
    )
    # change-detection diff rows of both revisit passes
    got_rv = _collect(ckpt, "revisit", REVISIT_KEY)
    pd.testing.assert_frame_equal(got_rv, _norm_oracle_revisit(sim))
    assert set(got_rv["round"].unique()) == {3, 5}  # the revisit steps


def test_continuous_interleave_actually_crawls_after_revisit(engine_run):
    """The revisit round carries the frontier forward: the round-4
    crawl step must have consumed it (selected > 0), proving the
    daemon interleave continues deferred work after a revisit."""
    ckpt, results = engine_run
    crawl4 = results[3]
    assert "selected" in crawl4 and crawl4["selected"] > 0
    # frontier files of the revisit round equal the prior round's
    f3 = _frontier_df(ckpt, 3)
    f2 = _frontier_df(ckpt, 2)
    pd.testing.assert_frame_equal(f3, f2)


def _frontier_df(ckpt: str, k: int) -> pd.DataFrame:
    files = sorted(
        glob.glob(os.path.join(ckpt, f"round={k:04d}", "frontier",
                               "*.parquet"))
    )
    df = pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_continuous_resume_mid_schedule(
    ray_session, micro_fixture, tmp_path_factory, oracle_run, engine_run
):
    """Kill the daemon after step 3 (a revisit), restart with the SAME
    schedule: completed rounds are skipped, the rest run, and every
    output byte-equals the uninterrupted run."""
    from spider_ray.crawl.driver import CrawlDriver

    sim, _ = oracle_run
    base_ckpt, _ = engine_run
    ckpt = str(tmp_path_factory.mktemp("ckpt_cont_resume"))
    d1 = CrawlDriver(micro_fixture, ckpt)
    r1 = d1.run_continuous(SCHEDULE[:3])
    assert d1.latest_round() == 3
    d1.close()  # daemon death mid-schedule

    d2 = CrawlDriver(micro_fixture, ckpt)
    r2 = d2.run_continuous(SCHEDULE)
    d2.close()
    assert len(r1) == 3 and len(r2) == 3  # steps 1-3 skipped on resume
    for sub, cols in (
        ("order", ORDER_KEY), ("out", EXTRACT_KEY), ("revisit", REVISIT_KEY),
    ):
        pd.testing.assert_frame_equal(
            _collect(ckpt, sub, cols), _collect(base_ckpt, sub, cols)
        )
