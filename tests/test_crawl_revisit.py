"""Re-visit / change-detection golden tests (VERDICT r01 item 5).

The oracle simulator runs the pinned crawl + two re-visit passes over
the drifted corpus (pages_v2.parquet: every third page changed); the
distributed engine must reproduce the revisit diff table, the updated
page store, the changed-pages extracted text, and every revisit metric
exactly.  Two passes so the per-domain politeness deferral path (pass 1
defers what exceeds the budget, pass 2 picks it up) is exercised.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

N_PASSES = 2


def _read_all(ckpt: str, sub: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(ckpt, "round=*", sub, "*.parquet")))
    frames = [pq.read_table(f).to_pandas() for f in files]
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


def _norm(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    out = df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in out.columns:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
    return out


@pytest.fixture(scope="module")
def oracle_revisit(micro_fixture):
    from spider_ray.oracle import OracleCrawl

    sim = OracleCrawl(micro_fixture)
    sim.run()
    for _ in range(N_PASSES):
        sim.run_revisit()
    return sim


@pytest.fixture(scope="module")
def engine_revisit(ray_session, micro_fixture, tmp_path_factory):
    from spider_ray.crawl.driver import CrawlDriver

    ckpt = str(tmp_path_factory.mktemp("ckpt_revisit"))
    drv = CrawlDriver(micro_fixture, ckpt)
    drv.run(max_rounds=50)
    rmetrics = [drv.run_revisit() for _ in range(N_PASSES)]
    drv.close()
    return ckpt, rmetrics


def test_revisit_metrics_match(oracle_revisit, engine_revisit):
    from spider_ray.oracle import REVISIT_METRIC_KEYS

    _, rmetrics = engine_revisit
    assert len(rmetrics) == len(oracle_revisit.revisit_metrics) == N_PASSES
    for i, (mo, me) in enumerate(zip(oracle_revisit.revisit_metrics, rmetrics)):
        diffs = {
            k: (mo[k], me.get(k))
            for k in REVISIT_METRIC_KEYS
            if mo[k] != me.get(k)
        }
        assert not diffs, f"pass {i + 1}: {diffs}"
    # deferral path actually exercised: pass 1 must defer something the
    # later pass re-selects, else the budget head() is untested
    assert oracle_revisit.revisit_metrics[0]["revisit_deferred"] > 0
    assert oracle_revisit.revisit_metrics[0]["revisit_changed"] > 0
    assert oracle_revisit.revisit_metrics[0]["revisit_unchanged"] > 0


def test_revisit_diff_table_matches(oracle_revisit, engine_revisit):
    ckpt, _ = engine_revisit
    cols = ["url", "domain", "old_checksum", "new_checksum", "changed", "round"]
    eng = _norm(_read_all(ckpt, "revisit"), cols)
    gold = _norm(pd.DataFrame(oracle_revisit.revisit_rows, columns=cols), cols)
    pd.testing.assert_frame_equal(eng, gold)


def test_changed_pages_reextracted(oracle_revisit, engine_revisit):
    """Changed pages emit fresh text rows in out/ of the revisit rounds;
    they must match the oracle's and the v2 corpus text byte-for-byte."""
    ckpt, _ = engine_revisit
    first_rv = len(oracle_revisit.metrics) + 1
    cols = ["url", "text", "lang", "round", "seq"]
    eng = _read_all(ckpt, "out")
    eng = _norm(eng[eng["round"] >= first_rv], cols)
    gold = _norm(
        pd.DataFrame(
            [r for r in oracle_revisit.extracted if r[3] >= first_rv],
            columns=cols,
        ),
        cols,
    )
    assert len(gold) > 0
    pd.testing.assert_frame_equal(eng, gold)
    pages2 = pq.read_table(
        os.path.join(oracle_revisit._fixture_dir, "pages_v2.parquet"),
        columns=["url", "text"],
    ).to_pandas()
    joined = eng.merge(pages2, on="url", suffixes=("_eng", "_corpus"))
    assert len(joined) == len(eng)
    assert (joined["text_eng"] == joined["text_corpus"]).all()


def test_pagestate_latest_matches(oracle_revisit, engine_revisit):
    """Latest page-store row per url (across crawl + revisit rounds)
    equals the oracle's in-memory page_state."""
    ckpt, _ = engine_revisit
    cols = ["url", "url_hash64", "domain", "seq", "round", "checksum"]
    eng = _read_all(ckpt, "pagestate")
    eng = (
        eng.sort_values(["round"], kind="mergesort")
        .drop_duplicates("url", keep="last")
    )
    eng = _norm(eng, cols)
    gold = _norm(
        pd.DataFrame(
            [(u, *st[:3], st[3], st[4])
             for u, st in oracle_revisit.page_state.items()],
            columns=cols,
        ),
        cols,
    )
    pd.testing.assert_frame_equal(eng, gold)


def test_revisit_after_resume_matches_oracle(
    ray_session, micro_fixture, tmp_path_factory
):
    """Kill the driver between the crawl and the re-visit pass, and
    between two re-visit passes: a FRESH driver resumed from disk must
    produce the same revisit metrics as the oracle's in-process passes
    (the page store and seen state live in the checkpoint, not the
    driver)."""
    from spider_ray.crawl.driver import CrawlDriver
    from spider_ray.oracle import OracleCrawl, REVISIT_METRIC_KEYS

    sim = OracleCrawl(micro_fixture)
    sim.run()
    m1 = sim.run_revisit()
    m2 = sim.run_revisit()

    ckpt = str(tmp_path_factory.mktemp("ckpt_rv_resume"))
    drv = CrawlDriver(micro_fixture, ckpt)
    drv.run(max_rounds=50)
    drv.close()
    drv2 = CrawlDriver(micro_fixture, ckpt)
    e1 = drv2.run_revisit()
    drv2.close()
    drv3 = CrawlDriver(micro_fixture, ckpt)
    e2 = drv3.run_revisit()
    drv3.close()
    for want, got, tag in ((m1, e1, "pass1"), (m2, e2, "pass2")):
        diffs = {k: (want[k], got.get(k)) for k in REVISIT_METRIC_KEYS
                 if want[k] != got.get(k)}
        assert not diffs, f"{tag}: {diffs}"

    # the revisit rounds' seen snapshots must carry the FULL crawl seen
    # set (a fresh driver must load state before snapshotting, else the
    # checkpoint chain silently loses it)
    import numpy as np

    rounds = sorted(glob.glob(os.path.join(ckpt, "round=*")))
    def seen_count(rd):
        return sum(
            len(np.load(f))
            for f in glob.glob(os.path.join(rd, "seen", "*.exact.npy"))
        )
    assert seen_count(rounds[-1]) == seen_count(rounds[-3]) > 0
