"""Webgraph family: block-count invariance.

Every webgraph query must produce bit-identical results when the
corpus streams through many small blocks instead of a few large ones —
the property that makes the family's single-shuffle shapes safe at
cluster scale (and under resume, where block composition differs).
Each query runs with a tiny target block size and is compared against
its committed golden parquet (which the default-config harness run
already matches, so equality here proves config-independence).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

_GOLDEN_PAIRED = [
    "host_link_graph",
    "host_pagerank",
    "anchor_texts",
    "canonical_clusters",
    "host_components",
    "hreflang_variants",
]


@pytest.mark.parametrize("name", _GOLDEN_PAIRED)
def test_block_count_invariance(ray_session, name):
    import ray.data

    import spider_ray.pipelines.webgraph as wg
    from spider_ray.goldens import OUT_DIR

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024  # force many small blocks
    try:
        got = getattr(wg, name)("ignored").to_pandas()
    finally:
        ctx.target_max_block_size = old
    want = pq.read_table(os.path.join(OUT_DIR, f"{name}.parquet")).to_pandas()
    # column order normalized like the driver's hash (sorted by name)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_url_templates_matches_python_recount(ray_session):
    """url_templates' oracle is a computing SQL twin; this is the
    python recount twin over the same pinned url list, under the
    small-block config."""
    import re

    import ray.data

    import spider_ray.pipelines.webgraph as wg
    from spider_ray.goldens import OUT_DIR

    urls = pq.read_table(
        os.path.join(OUT_DIR, "url_list.parquet")).column("url").to_pylist()
    counts: dict[str, int] = {}
    for u in urls:
        t = re.sub(r"[0-9]+", "{n}", u)
        counts[t] = counts.get(t, 0) + 1

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024
    try:
        got = wg.url_templates("ignored").to_pandas()
    finally:
        ctx.target_max_block_size = old
    assert dict(zip(got["template"], got["n"])) == counts
