"""Loud canary for the ray sort() range-partitioning assumption.

Every shuffle rewrite in spider_ray.ops (partial_sum_agg's final merge,
partitioned_hash_join, exact_dedup, grouped_top_k, sessionize, asof, the
tf-idf document-frequency fold) follows the pattern

    ds.sort(keys).map_batches(combine, batch_size=None)

which is only correct if sort's range partitioning never splits a run of
EQUAL keys across two output blocks.  ray 2.49.2's boundary searchsorted
guarantees that, but it is an implementation detail, not a documented API
contract — so the ray version is pinned in pyproject.toml and THIS test
exists to fail loudly (instead of silently corrupting joins/dedups) if a
future ray bump changes boundary handling, e.g. a push-based shuffle.
"""
import numpy as np
import pyarrow as pa
import ray


def _distinct_keys_per_block(ds):
    """Distinct key values in each post-sort block (batch_size=None ==
    one batch per block, same view the ops-layer combiners get)."""
    per_block = []
    for t in ds.sort("k").iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t) == 0:
            continue
        per_block.append(set(t.column("k").unique().to_pylist()))
    return per_block


def test_sort_never_splits_equal_keys_across_blocks(ray_session):
    # Heavy duplicate runs: 200k rows over only 13 distinct keys, with a
    # hot key holding ~50% of rows, spread over many input blocks so the
    # range partitioner is forced to place boundaries inside runs if it
    # ever would.
    rng = np.random.default_rng(7)
    keys = np.concatenate([
        np.full(100_000, 6, dtype=np.int64),             # hot key
        rng.integers(0, 13, size=100_000, dtype=np.int64),
    ])
    rng.shuffle(keys)
    ds = ray.data.from_arrow(
        pa.table({"k": keys, "v": np.arange(len(keys), dtype=np.int64)})
    ).repartition(64)

    per_block = _distinct_keys_per_block(ds)
    assert len(per_block) > 1, "need >1 output block for the test to bite"
    seen: dict[int, int] = {}
    for i, block_keys in enumerate(per_block):
        for k in block_keys:
            assert k not in seen, (
                f"key {k} spans blocks {seen[k]} and {i}: ray sort() split an "
                "equal-key run across range partitions — the ops-layer "
                "sort+combine rewrites are NOT safe on this ray version"
            )
            seen[k] = i


def test_sort_blocks_are_globally_ordered(ray_session):
    # Companion invariant: block key-ranges must be non-overlapping and
    # ascending, or per-block combiners would see interleaved key ranges.
    rng = np.random.default_rng(11)
    ds = ray.data.from_arrow(
        pa.table({"k": rng.integers(0, 50, size=50_000, dtype=np.int64)})
    ).repartition(32)
    prev_max = None
    for block_keys in _distinct_keys_per_block(ds):
        lo, hi = min(block_keys), max(block_keys)
        if prev_max is not None:
            assert lo > prev_max, "post-sort block key ranges overlap"
        prev_max = hi


def test_sort_never_splits_equal_uint64_hash_keys(ray_session):
    """Crawl-path reliance (round 4): the candidate/children passes sort
    on the uint64 url_hash64 and dedupe per url inside per-block
    batches — every copy of a url must land in ONE block.  Mirror that
    shape: near-unique uint64 hash keys with a minority of duplicated
    runs (url re-discovered by many parents), plus string payload."""
    rng = np.random.default_rng(23)
    uniq = rng.integers(0, 2**63, size=30_000, dtype=np.uint64)
    dup_pool = rng.choice(uniq, size=500, replace=False)
    dups = np.repeat(dup_pool, rng.integers(2, 30, size=500))
    keys = np.concatenate([uniq, dups])
    rng.shuffle(keys)
    ds = ray.data.from_arrow(
        pa.table({
            "k": pa.array(keys, pa.uint64()),
            "url": pa.array([f"https://d{int(x) % 97}.example/p{int(x) % 1013}"
                             for x in keys], pa.string()),
        })
    ).repartition(48)
    per_block = _distinct_keys_per_block(ds)
    assert len(per_block) > 1
    seen: dict[int, int] = {}
    for i, block_keys in enumerate(per_block):
        for k in block_keys:
            assert k not in seen, (
                f"uint64 key {k} spans blocks {seen[k]} and {i}: the "
                "crawl's url_hash64 sort-dedupe (candidate/children "
                "passes) is NOT safe on this ray version"
            )
            seen[k] = i
