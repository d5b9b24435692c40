"""Force the big-round distributed fallbacks (driver threshold = 0) and
assert they reproduce the oracle exactly — phase-B budget merge via
per-domain groupby AND the A4 gate push via groupby(gate).map_groups
(no driver-side histogram)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq


def test_distributed_select_and_gate_push_match_oracle(
    ray_session, micro_fixture, tmp_path_factory
):
    from spider_ray.crawl.driver import CrawlDriver
    from spider_ray.oracle import OracleCrawl

    sim = OracleCrawl(micro_fixture)
    sim.run()

    ckpt = str(tmp_path_factory.mktemp("ckpt_dist"))
    drv = CrawlDriver(micro_fixture, ckpt, phase_b_driver_threshold=0)
    metrics = drv.run(max_rounds=50)
    drv.close()

    assert len(metrics) == len(sim.metrics)
    for i, (mo, me) in enumerate(zip(sim.metrics, metrics)):
        diffs = {k: (mo[k], me.get(k)) for k in mo if mo[k] != me.get(k)}
        assert not diffs, f"round {i + 1}: {diffs}"

    # A4 totals: domains.parquet of the last round must equal the
    # histogram of all fetched pages (pagestate has one row per fetch)
    last = sorted(glob.glob(os.path.join(ckpt, "round=*")))[-1]
    doms = pq.read_table(os.path.join(last, "domains.parquet")).to_pandas()
    ps = pd.concat(
        [
            pq.read_table(f, columns=["domain"]).to_pandas()
            for f in glob.glob(os.path.join(ckpt, "round=*", "pagestate", "*.parquet"))
        ],
        ignore_index=True,
    )
    want = ps["domain"].value_counts().sort_index()
    got = doms.set_index("domain")["fetched_total"].sort_index()
    assert got.astype("int64").to_dict() == want.astype("int64").to_dict()
    assert int(got.sum()) == sum(m["fetched"] for m in sim.metrics)


def test_gate_load_state_clears_crash_staged_counts(ray_session, micro_fixture):
    """load_state is FULL state replacement: counts staged by a crashed
    round must not survive a checkpoint load (matters when a resuming
    driver re-attaches to live detached actors — stale staged counts
    would double into fetched_total at the next barrier and skew the
    A4 rate)."""
    import ray

    from spider_ray.core.config import load_crawl_config
    from spider_ray.crawl.state import DomainGate

    cfg = load_crawl_config(micro_fixture)
    gate = DomainGate.remote(0, cfg)
    try:
        # a crashed round-3 push, never committed
        ray.get(gate.note_fetched.remote(["a.example"], [7], 3))
        # resume: checkpoint state from round 2 replaces everything
        ray.get(gate.load_state.remote(["a.example", "b.example"], [4, 2], 2))
        ray.get(gate.commit_fetched.remote())  # must fold NOTHING extra
        st = ray.get(gate.export_state.remote())
        assert dict(zip(st["domain"], st["fetched_total"])) == {
            "a.example": 4,
            "b.example": 2,
        }
    finally:
        ray.kill(gate)
