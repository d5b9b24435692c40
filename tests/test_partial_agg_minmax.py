"""Unit tests for ops.partial_sum_agg's min/max merge algebra — each
output column must re-combine with ITS OWN function across partial
blocks (sum of sums, min of mins, max of maxs, counts by sum), in both
the bounded tree-combine and the range-partitioned final."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from spider_ray import ops


def _ds(n_blocks=6):
    rng = np.random.default_rng(11)
    k = rng.integers(0, 4, 600)
    v = rng.integers(-50, 1000, 600)
    t = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v, pa.int64())})
    return (
        ray.data.from_arrow(t).repartition(n_blocks),
        {int(kk): (int(v[k == kk].sum()), int(v[k == kk].min()),
                   int(v[k == kk].max()), int((k == kk).sum()))
         for kk in np.unique(k)},
    )


@pytest.mark.parametrize("bounded", [True, False])
def test_minmax_merge_algebra(ray_session, bounded):
    ds, want = _ds()
    out = ops.partial_sum_agg(
        ds, keys=["k"], sums={"v": "s"}, counts="n",
        mins={"v": "lo"}, maxs={"v": "hi"}, bounded=bounded,
    )
    got = {
        r["k"]: (r["s"], r["lo"], r["hi"], r["n"]) for r in out.take_all()
    }
    assert got == want


def test_minmax_without_sums(ray_session):
    """mins/maxs alone (no sums) must still produce a valid spec."""
    t = pa.table(
        {"k": pa.array([1, 1, 2], pa.int64()),
         "v": pa.array([5, -3, 9], pa.int64())}
    )
    out = ops.partial_sum_agg(
        ray.data.from_arrow(t).repartition(3),
        keys=["k"], sums={}, counts=None, mins={"v": "lo"}, maxs={"v": "hi"},
    )
    got = {r["k"]: (r["lo"], r["hi"]) for r in out.take_all()}
    assert got == {1: (-3, 5), 2: (9, 9)}


def test_agg_join_fusion_matches_unfused(ray_session):
    """partial_sum_agg(unmerged=True) + partitioned_hash_join(left_pre)
    must equal the unfused agg-then-join, for every key — including
    keys absent from one side."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    rng = np.arange(1000)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array((rng * 7) % 53, pa.int64()),
        "v": pa.array(rng, pa.int64()),
    })).repartition(7)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(60), pa.int64()),
        "w": pa.array(np.arange(60) * 10, pa.int64()),
    })).repartition(3)

    from spider_ray import ops

    parts, merge = ops.partial_sum_agg(
        left, keys=["k"], sums={"v": "s"}, counts="n",
        bounded=False, unmerged=True)
    fused = ops.partitioned_hash_join(
        parts, right, on="k", left_pre=merge).to_pandas()

    agg = ops.partial_sum_agg(left, keys=["k"], sums={"v": "s"},
                              counts="n", bounded=False)
    unfused = ops.partitioned_hash_join(agg, right, on="k").to_pandas()

    key = ["k", "s", "n", "w"]
    a = fused[key].sort_values(key).reset_index(drop=True)
    b = unfused[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 53  # inner join keeps only keys present on both sides
