"""Resume + invariance tests — SURVEY.md §5.2(3,4).

Resume: run 3 rounds, throw the driver (and its actors) away, build a
fresh driver on the same checkpoint directory and let it finish.  The
combined outputs must be byte-identical to an uninterrupted run.

Invariance: different shard/partition counts must not change any
output (catches arrival-order leaks, SURVEY.md §4.5).
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

ORDER_KEY = ["round", "depth", "domain", "seq", "url"]


def _collect(ckpt: str, sub: str, cols: list[str]) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(ckpt, "round=*", sub, "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    out = df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in out.columns:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
    return out


MAX_ROUNDS = 5  # capped: resume/invariance semantics show within 5 rounds


def _run_full(fixture: str, ckpt: str, **kw) -> list[dict]:
    from spider_ray.crawl.driver import CrawlDriver

    return CrawlDriver(fixture, ckpt, **kw).run(max_rounds=MAX_ROUNDS)


@pytest.fixture(scope="module")
def baseline_ckpt(ray_session, micro_fixture, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_base"))
    metrics = _run_full(micro_fixture, ckpt)
    return ckpt, metrics


def test_resume_is_byte_identical(ray_session, micro_fixture, tmp_path_factory,
                                  baseline_ckpt):
    from spider_ray.crawl.driver import CrawlDriver

    base_ckpt, base_metrics = baseline_ckpt
    ckpt = str(tmp_path_factory.mktemp("ckpt_resume"))
    # phase 1: 3 rounds, then abandon the driver mid-crawl
    d1 = CrawlDriver(micro_fixture, ckpt)
    d1.run(max_rounds=3)
    assert d1.latest_round() == 3
    d1.close()  # simulate driver death: actors and their state are gone
    # phase 2: fresh driver + fresh actors resume from the checkpoint
    d2 = CrawlDriver(micro_fixture, ckpt)
    d2.run(max_rounds=MAX_ROUNDS - 3)
    assert d2.start_round == 4

    for sub, cols in (
        ("order", ORDER_KEY),
        ("out", ["url", "text", "lang", "round", "seq"]),
    ):
        pd.testing.assert_frame_equal(
            _collect(ckpt, sub, cols), _collect(base_ckpt, sub, cols)
        )
    resumed_metrics = d1.metrics + d2.metrics
    for mo, me in zip(base_metrics, resumed_metrics):
        diffs = {k: (mo[k], me[k]) for k in mo if k != "wall_s" and mo[k] != me[k]}
        assert not diffs


def test_sink_failure_aborts_publish(ray_session, micro_fixture,
                                     tmp_path_factory, monkeypatch):
    """Sinks run on side threads overlapped with the round's critical
    path; a failed sink must re-raise at the write-join barrier BEFORE
    the manifest/rename publishes the round, leaving only a .tmp dir —
    i.e. exactly the mid-round-crash state resume already handles."""
    import spider_ray.crawl.driver as drv_mod

    ckpt = str(tmp_path_factory.mktemp("ckpt_sinkfail"))
    real_write = drv_mod._write_ds

    def boom(ds, dirpath, schema, n_rows):
        if dirpath.endswith("out"):
            raise RuntimeError("sink exploded")
        return real_write(ds, dirpath, schema, n_rows)

    monkeypatch.setattr(drv_mod, "_write_ds", boom)
    d1 = drv_mod.CrawlDriver(micro_fixture, ckpt)
    with pytest.raises(RuntimeError, match="sink exploded"):
        d1.run(max_rounds=1)
    d1.close()
    assert not os.path.exists(os.path.join(ckpt, "round=0001"))
    monkeypatch.undo()
    # recovery: a fresh driver replays the aborted round from scratch
    d2 = drv_mod.CrawlDriver(micro_fixture, ckpt)
    d2.run(max_rounds=1)
    d2.close()
    with open(os.path.join(ckpt, "round=0001", "manifest.json")) as f:
        import json

        assert json.load(f)["round"] == 1


def test_resume_after_midround_crash(ray_session, micro_fixture,
                                     tmp_path_factory, baseline_ckpt):
    """A crash MID-ROUND leaves a round=NNNN.tmp dir with partial
    output; resume must ignore it, replay that round from the last
    complete checkpoint, and produce byte-identical results (§4.4:
    'a mid-round crash loses only the .tmp dir')."""
    import json
    import os

    from spider_ray.crawl.driver import CrawlDriver

    base_ckpt, base_metrics = baseline_ckpt
    ckpt = str(tmp_path_factory.mktemp("ckpt_crash"))
    d1 = CrawlDriver(micro_fixture, ckpt)
    d1.run(max_rounds=2)
    d1.close()
    # simulate a crash during round 3: partial tmp dir with junk output
    tmp3 = os.path.join(ckpt, "round=0003.tmp")
    os.makedirs(os.path.join(tmp3, "frontier"))
    with open(os.path.join(tmp3, "frontier", "part-junk.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    d2 = CrawlDriver(micro_fixture, ckpt)
    d2.run(max_rounds=MAX_ROUNDS - 2)
    assert d2.start_round == 3  # resumed from the last COMPLETE round
    assert not os.path.exists(tmp3)  # junk replaced by the replayed round
    with open(os.path.join(ckpt, "round=0003", "manifest.json")) as f:
        assert json.load(f)["round"] == 3
    for sub, cols in (
        ("order", ORDER_KEY),
        ("out", ["url", "text", "lang", "round", "seq"]),
    ):
        pd.testing.assert_frame_equal(
            _collect(ckpt, sub, cols), _collect(base_ckpt, sub, cols)
        )


def test_invariance_under_partitioning(ray_session, micro_fixture,
                                       tmp_path_factory, baseline_ckpt):
    """Different num_shards / dedup partitions / fetch buckets ->
    identical outputs (determinism comes from data, never placement)."""
    from spider_ray.core.config import load_crawl_config

    base_ckpt, base_metrics = baseline_ckpt
    ckpt = str(tmp_path_factory.mktemp("ckpt_inv"))
    cfg = load_crawl_config(micro_fixture, num_shards=4, gate_pool_size=2)
    from spider_ray.crawl.driver import CrawlDriver

    metrics = CrawlDriver(
        micro_fixture, ckpt, cfg, fetch_buckets=7, dedup_parts=3, sel_slices=3
    ).run(max_rounds=MAX_ROUNDS)

    for sub, cols in (
        ("order", ORDER_KEY),
        ("out", ["url", "text", "lang", "round", "seq"]),
    ):
        pd.testing.assert_frame_equal(
            _collect(ckpt, sub, cols), _collect(base_ckpt, sub, cols)
        )
    for mo, me in zip(base_metrics, metrics):
        diffs = {k: (mo[k], me[k]) for k in mo if k != "wall_s" and mo[k] != me[k]}
        assert not diffs


def test_salting_preserves_semantics(ray_session, micro_fixture,
                                     tmp_path_factory, baseline_ckpt):
    """Selection slicing (the always-on A.8 salting: S hash slices per
    domain) must be placement-only: S=1 (no salting at all) and the
    default S=8 produce identical selections and outputs."""
    from spider_ray.crawl.driver import CrawlDriver

    base_ckpt, base_metrics = baseline_ckpt
    ckpt = str(tmp_path_factory.mktemp("ckpt_salt"))
    metrics = CrawlDriver(micro_fixture, ckpt, sel_slices=1).run(max_rounds=MAX_ROUNDS)
    pd.testing.assert_frame_equal(
        _collect(ckpt, "order", ORDER_KEY), _collect(base_ckpt, "order", ORDER_KEY)
    )
    for mo, me in zip(base_metrics, metrics):
        diffs = {k: (mo[k], me[k]) for k in mo if k != "wall_s" and mo[k] != me[k]}
        assert not diffs


def test_detached_named_actors_reattach(ray_session, micro_fixture,
                                        tmp_path_factory, baseline_ckpt):
    """SURVEY §2.3 deployment form: with actor_namespace set, T1/T2 are
    detached NAMED actors.  They survive the driver that created them;
    a second driver in the same namespace re-attaches to the SAME
    actors (get_if_exists) instead of spawning fresh ones, and resume
    from checkpoint stays byte-identical; close() removes them."""
    import ray

    from spider_ray.crawl.driver import CrawlDriver

    base_ckpt, base_metrics = baseline_ckpt
    ns = f"t-detached-{os.getpid()}"
    ckpt = str(tmp_path_factory.mktemp("ckpt_named"))
    d1 = CrawlDriver(micro_fixture, ckpt, actor_namespace=ns)
    d1.run(max_rounds=3)
    shard0_id = d1.shards[0]._actor_id
    gate0_id = d1.gates[0]._actor_id
    d1._io_pool.shutdown(wait=False)
    del d1  # driver gone; detached actors must outlive it
    assert ray.get_actor("seen:0", namespace=ns)._actor_id == shard0_id

    d2 = CrawlDriver(micro_fixture, ckpt, actor_namespace=ns)
    # re-attached, not recreated
    assert d2.shards[0]._actor_id == shard0_id
    assert d2.gates[0]._actor_id == gate0_id
    d2.run(max_rounds=MAX_ROUNDS - 3)
    assert d2.start_round == 4
    for sub, cols in (
        ("order", ORDER_KEY),
        ("out", ["url", "text", "lang", "round", "seq"]),
    ):
        pd.testing.assert_frame_equal(
            _collect(ckpt, sub, cols), _collect(base_ckpt, sub, cols)
        )
    # default close() is detach-only in namespace mode (the actors are
    # advertised as shared — ADVICE r02): the named actors stay alive
    d2.close()
    assert ray.get_actor("seen:0", namespace=ns)._actor_id == shard0_id
    # explicit teardown removes them: the namespace is now empty
    d3 = CrawlDriver(micro_fixture, ckpt, actor_namespace=ns)
    d3.close(kill_detached=True)
    with pytest.raises(ValueError):
        ray.get_actor("seen:0", namespace=ns)


def test_detached_actors_reset_on_fresh_crawl(ray_session, micro_fixture,
                                              tmp_path_factory):
    """A FRESH crawl (empty ckpt_dir) that re-attaches to detached
    actors polluted by a prior crawl must reset them, not inherit their
    seen-set/gate totals (ADVICE r02): the crawl into a wiped ckpt dir
    must produce the same outputs as one with genuinely fresh actors."""
    import ray

    from spider_ray.crawl.driver import CrawlDriver

    ns = f"t-reset-{os.getpid()}"
    ckpt1 = str(tmp_path_factory.mktemp("ckpt_pollute"))
    d1 = CrawlDriver(micro_fixture, ckpt1, actor_namespace=ns)
    d1.run(max_rounds=2)  # leaves a populated seen-set in the namespace
    stats_before = d1.seen_stats()
    assert sum(s["items"] for s in stats_before) > 0
    d1.close()  # detach-only: actors stay alive and polluted

    ckpt2 = str(tmp_path_factory.mktemp("ckpt_fresh"))
    d2 = CrawlDriver(micro_fixture, ckpt2, actor_namespace=ns)
    d2.run(max_rounds=MAX_ROUNDS)
    # a polluted seen-set would mark every URL already-seen and crawl
    # nothing; with the reset, outputs match a from-scratch crawl
    ckpt3 = str(tmp_path_factory.mktemp("ckpt_plain"))
    d3 = CrawlDriver(micro_fixture, ckpt3)
    d3.run(max_rounds=MAX_ROUNDS)
    pd.testing.assert_frame_equal(
        _collect(ckpt2, "order", ORDER_KEY), _collect(ckpt3, "order", ORDER_KEY)
    )
    d3.close()
    d2.close(kill_detached=True)
