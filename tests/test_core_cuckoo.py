"""Appendix A.4 cuckoo filter: determinism, no-false-negative, persistence."""

from __future__ import annotations

import numpy as np

from spider_ray.core.cuckoo import CuckooFilter
from spider_ray.core.hashing import url_hash_fp


def _items(n):
    return [url_hash_fp(f"https://s{i}.example/p/{i}") for i in range(n)]


def test_insert_then_found():
    f = CuckooFilter(capacity=4096)
    items = _items(2000)
    for h, fp in items:
        f.add(h, fp)
    assert f.count == len({(h, fp) for h, fp in items})
    for h, fp in items:
        assert f.contains(h, fp)


def test_idempotent_add():
    f = CuckooFilter(capacity=1024)
    items = _items(100)
    for h, fp in items * 3:
        f.add(h, fp)
    assert f.count == 100


def test_no_false_positives_at_test_scale():
    f = CuckooFilter(capacity=1 << 14)
    inserted = _items(5000)
    for h, fp in inserted:
        f.add(h, fp)
    probes = [url_hash_fp(f"https://other{i}.example/x") for i in range(5000)]
    hits = sum(f.contains(h, fp) for h, fp in probes)
    assert hits == 0  # 1.9e-9/lookup -> expected 0 at this scale


def test_deterministic_snapshot(tmp_path):
    items = _items(3000)
    f1 = CuckooFilter(capacity=4096)
    f2 = CuckooFilter(capacity=4096)
    # same insertion order (ascending seq per §4.5) -> byte-identical table
    for h, fp in items:
        f1.add(h, fp)
        f2.add(h, fp)
    assert np.array_equal(f1.table, f2.table)
    p = str(tmp_path / "shard.npz")
    f1.save(p)
    f3 = CuckooFilter.load(p)
    assert np.array_equal(f1.table, f3.table)
    assert f3.count == f1.count
    for h, fp in items:
        assert f3.contains(h, fp)


def test_saturation_goes_to_stash_not_lost():
    f = CuckooFilter(capacity=64)  # tiny: force kicks + stash
    items = _items(500)
    for h, fp in items:
        f.add(h, fp)
    for h, fp in items:
        assert f.contains(h, fp)  # zero false negatives even saturated


def test_batch_api():
    f = CuckooFilter(capacity=2048)
    items = _items(500)
    h = np.array([a for a, _ in items], dtype=np.uint64)
    fp = np.array([b for _, b in items], dtype=np.uint32)
    assert not f.contains_batch(h, fp).any()
    f.add_batch(h, fp)
    assert f.contains_batch(h, fp).all()
