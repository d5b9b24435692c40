"""Pluggable T1 snapshot backend (VERDICT r04 item 4 — the reference's
Storage-interface swap): the sqlite backend, selected by config, must
produce byte-identical crawls AND byte-identical kill-and-resume runs
vs the default npz file backend."""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

ORDER_KEY = ["round", "depth", "domain", "seq", "url"]
MAX_ROUNDS = 5


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


def test_store_roundtrip_unit(tmp_path):
    """Both backends round-trip an identical (filter, exact) pair."""
    from spider_ray.core.cuckoo import CuckooFilter
    from spider_ray.crawl.storage import get_state_store

    f = CuckooFilter(1 << 10)
    rng = np.random.default_rng(3)
    h64 = rng.integers(0, 2**63, 500, dtype=np.uint64)
    fps = rng.integers(1, 2**32, 500, dtype=np.uint32)
    f.add_batch(h64, fps)
    exact = set(h64.tolist())
    for name in ("file", "sqlite"):
        d = tmp_path / name
        d.mkdir()
        store = get_state_store(name)
        store.save_shard(str(d), 3, f, exact)
        # idempotent re-save (Ray may re-deliver the snapshot RPC)
        store.save_shard(str(d), 3, f, exact)
        g, ex = store.load_shard(str(d), 3, want_exact=True)
        assert np.array_equal(g.table, f.table)
        assert g.count == f.count and g.stash == f.stash
        assert ex == exact
    with pytest.raises(ValueError, match="unknown state_backend"):
        get_state_store("mongodb")
    with pytest.raises(FileNotFoundError):
        get_state_store("sqlite").load_shard(str(tmp_path / "sqlite"), 99, False)


def test_sqlite_backend_resume_byte_identical(
    ray_session, micro_fixture, tmp_path_factory
):
    """Full crawl + kill-and-resume on the sqlite backend: outputs and
    metrics byte-equal the file-backend baseline, snapshots actually
    live in seen.sqlite3 (no npz written), and resume reloads state
    from the DB."""
    from spider_ray.core.config import load_crawl_config
    from spider_ray.crawl.driver import CrawlDriver

    base = str(tmp_path_factory.mktemp("ckpt_file_base"))
    base_metrics = CrawlDriver(micro_fixture, base).run(max_rounds=MAX_ROUNDS)

    cfg = load_crawl_config(micro_fixture, state_backend="sqlite")
    ckpt = str(tmp_path_factory.mktemp("ckpt_sqlite"))
    d1 = CrawlDriver(micro_fixture, ckpt, cfg)
    d1.run(max_rounds=3)
    assert d1.latest_round() == 3
    d1.close()  # driver death: actor state gone, only the DB remains

    seen3 = os.path.join(ckpt, "round=0003", "seen")
    assert os.path.exists(os.path.join(seen3, "seen.sqlite3"))
    assert not glob.glob(os.path.join(seen3, "*.npz"))

    d2 = CrawlDriver(micro_fixture, ckpt, cfg)
    d2.run(max_rounds=MAX_ROUNDS - 3)
    assert d2.start_round == 4
    stats = d2.seen_stats()
    assert all(s["false_hits"] == 0 for s in stats)
    d2.close()

    for sub, cols in (
        ("order", ORDER_KEY),
        ("out", ["url", "text", "lang", "round", "seq"]),
    ):
        pd.testing.assert_frame_equal(
            _collect(ckpt, sub, cols), _collect(base, sub, cols)
        )
    resumed = d1.metrics + d2.metrics
    for mo, me in zip(base_metrics, resumed):
        diffs = {
            k: (mo[k], me[k]) for k in mo if k != "wall_s" and mo[k] != me[k]
        }
        assert not diffs
    # config round-trips the backend choice (resume guard reads it)
    from spider_ray.core.config import CrawlConfig

    assert CrawlConfig.from_json(cfg.to_json()).state_backend == "sqlite"
