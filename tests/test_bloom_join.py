"""bloom_semi_join exactness under FORCED false positives: a 64-bit
bloom over hundreds of keys saturates, so nearly every left row is
bloom-positive — the exact join must still produce precisely the true
semi/anti result (the bloom may only prune, never decide)."""

import pandas as pd
import ray.data

from spider_ray import ops


def _sets():
    left = ray.data.from_items(
        [{"k": i, "v": f"L{i}"} for i in range(500)]
    )
    right = ray.data.from_items(
        [{"k": i * 3, "r": 1} for i in range(100)]  # members: multiples of 3 < 300
    )
    members = {i * 3 for i in range(100)}
    return left, right, members


def test_semi_exact_with_saturated_bloom(ray_session):
    left, right, members = _sets()
    out = ops.bloom_semi_join(left, right, on="k", m_bits=64, k_hashes=2)
    got = sorted(out.to_pandas()["k"])
    want = sorted(k for k in range(500) if k in members)
    assert got == want


def test_anti_exact_with_saturated_bloom(ray_session):
    left, right, members = _sets()
    out = ops.bloom_semi_join(left, right, on="k", m_bits=64, k_hashes=2,
                              anti=True)
    got = sorted(out.to_pandas()["k"])
    want = sorted(k for k in range(500) if k not in members)
    assert got == want


def test_semi_keeps_left_columns_and_dups(ray_session):
    # duplicate left rows for a member key must all survive
    left = ray.data.from_items(
        [{"k": 7, "v": "a"}, {"k": 7, "v": "b"}, {"k": 8, "v": "c"}]
    )
    right = ray.data.from_items([{"k": 7}])
    out = ops.bloom_semi_join(left, right, on="k").to_pandas()
    assert sorted(out["v"]) == ["a", "b"]
    assert list(out.columns) == ["k", "v"]
