"""Edge-case tests for the round-4b additions: multi-source BFS hop
counts (graph.py) and the exact global row_number (window.py).  The
sf-fixture oracle pairing lives in tests/test_harness.py; these pin
hand-computable boundary behavior and the multi-block scan stitching."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table):
    pq.write_table(table, os.path.join(tmp_path, f"{name}.parquet"))
    return str(tmp_path)


# -- bfs_hops_order_part -----------------------------------------------------

def test_bfs_chain_distances(ray_session, tmp_path):
    """A pure chain o1-p250-o2-p3-o3: the only seed is part 250
    (node 501); hop counts must walk outward 1-2-3 and stop at the
    hop bound, and an unreachable island (o7-p9) must not appear."""
    sf = _write(
        tmp_path, "lineitem",
        pa.table({
            # chain: o1 - p250 - o2 - p3 - o3 - p4 - o4  (+ island o7-p9)
            "l_orderkey": pa.array([1, 2, 2, 3, 3, 4, 7], pa.int64()),
            "l_partkey": pa.array([250, 250, 3, 3, 4, 4, 9], pa.int64()),
        }),
    )
    from spider_ray.pipelines.graph import bfs_hops_order_part

    got = {
        r["node"]: r["dist"]
        for r in bfs_hops_order_part(sf, hops=3).take_all()
    }
    # node ids: order o -> 2o, part p -> 2p+1
    assert got == {
        501: 0,            # seed: part 250
        2: 1, 4: 1,        # orders 1, 2
        7: 2,              # part 3
        6: 3,              # order 3
        # part 4 / order 4 are 4-5 hops out -> beyond the bound
    }


def test_bfs_multi_source_takes_min(ray_session, tmp_path):
    """Two seeds (parts 250 and 500) both reach order 5; its dist must
    be the MIN over sources, and a node adjacent to both seeds stays
    at 1 (never re-labeled by the later superstep)."""
    sf = _write(
        tmp_path, "lineitem",
        pa.table({
            # o5 touches p250 directly; p500 - o6 - p1 - o5 is 3 hops
            "l_orderkey": pa.array([5, 6, 6, 5], pa.int64()),
            "l_partkey": pa.array([250, 500, 1, 1], pa.int64()),
        }),
    )
    from spider_ray.pipelines.graph import bfs_hops_order_part

    got = {
        r["node"]: r["dist"]
        for r in bfs_hops_order_part(sf, hops=3).take_all()
    }
    assert got[501] == 0 and got[1001] == 0          # both seeds
    assert got[10] == 1                               # order 5: min(1, 3)
    assert got[12] == 1                               # order 6
    assert got[3] == 2                                # part 1 via o5/o6


# -- semdedup_embeddings -----------------------------------------------------

def test_semdedup_drops_planted_copy_keeps_orthogonal(ray_session, tmp_path):
    """Two orthogonal directions (-> 2 clusters with k=2); an exact
    copy of vector 0 must be dropped (cosine 1 to a lower id), the
    orthogonal vectors and the lowest-id member of each near-dup
    family must survive."""
    vecs = [
        [1.0, 0.0, 0.0, 0.0],   # 0: keep (lowest id of its family)
        [0.0, 1.0, 0.0, 0.0],   # 1: keep (orthogonal direction)
        [1.0, 0.0, 0.0, 0.0],   # 2: exact copy of 0 -> dropped
        [0.0, 0.9, 0.1, 0.0],   # 3: near-dup of 1 (cos ~0.994) -> dropped
        [0.0, 0.0, 0.0, 1.0],   # 4: orthogonal to everything -> keep
    ]
    sf = _write(
        tmp_path, "embeddings",
        pa.table({
            "vec_id": pa.array(range(5), pa.int64()),
            "embedding": pa.array([np.asarray(v, np.float32) for v in vecs],
                                  pa.list_(pa.float32())),
        }),
    )
    from spider_ray.pipelines.ann import semdedup_embeddings

    got = {r["vec_id"]: r["kept"]
           for r in semdedup_embeddings(sf, k=2, iterations=2,
                                        threshold=0.9).take_all()}
    assert got == {0: 1, 1: 1, 2: 0, 3: 0, 4: 1}


# -- global_rank_orders ------------------------------------------------------

def test_global_rank_multiblock_matches_single_block(ray_session, tmp_path):
    """Forcing tiny scan blocks (many blocks, ties straddling block
    boundaries) must stitch per-block offsets into the exact global
    row_number the single-block run produces."""
    rng = np.random.default_rng(11)
    n = 500
    # heavy ties: prices drawn from 20 distinct values
    prices = rng.choice(np.arange(20, dtype=np.float64) * 10.0, n)
    sf = _write(
        tmp_path, "orders",
        pa.table({
            "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
            "o_totalprice": pa.array(prices, pa.float64()),
        }),
    )
    from spider_ray.pipelines.window import global_rank_orders

    one = (global_rank_orders(sf).to_pandas()
           .sort_values("seq").reset_index(drop=True))
    many = (global_rank_orders(sf, scan_block_rows=37).to_pandas()
            .sort_values("seq").reset_index(drop=True))
    assert many.equals(one)
    # seq is a permutation of 1..n and respects the total order
    assert sorted(one["seq"]) == list(range(1, n + 1))
    p = one["o_totalprice"].to_numpy()
    k = one["o_orderkey"].to_numpy()
    assert ((p[:-1] > p[1:]) | ((p[:-1] == p[1:]) & (k[:-1] < k[1:]))).all()
