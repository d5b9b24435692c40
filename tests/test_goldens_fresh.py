"""Guard against stale pinned goldens: recompute each sequential
golden and compare to the committed parquet byte-for-byte (values)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from spider_ray.goldens import GOLDENS, OUT_DIR


def test_committed_goldens_are_fresh():
    for name, fn in GOLDENS.items():
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        assert os.path.exists(path), f"missing golden {path}"
        committed = pq.read_table(path)
        fresh = fn()
        assert committed.equals(fresh), f"stale golden: {name}"
