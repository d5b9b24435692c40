"""Unit tests for ops.connected_components — the dedup-cluster
backbone: min-label propagation over an edge Dataset (SURVEY §2.7 D4
extension; see spider_ray/pipelines/dedup.py dedup_clusters_minhash).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import ray.data

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spider_ray import ops  # noqa: E402


def _cc(edge_pairs, node_ids):
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edge_pairs], pa.int64()),
                "dst": pa.array([b for _, b in edge_pairs], pa.int64()),
            }
        )
    )
    nodes = ray.data.from_arrow(
        pa.table({"node": pa.array(node_ids, pa.int64())})
    )
    out = ops.connected_components(edges, nodes, node_col="node")
    return {r["node"]: r["label"] for r in out.take_all()}


def test_chain_needs_multiple_sweeps(ray_session):
    # a 7-node path: label 0 must propagate the full diameter, so a
    # single sweep is NOT enough — exercises the fixpoint loop
    n = 7
    labels = _cc([(i, i + 1) for i in range(n - 1)], list(range(n)))
    assert labels == {i: 0 for i in range(n)}


def test_isolated_nodes_and_duplicate_edges(ray_session):
    # two components {1,5,9} (duplicate + reversed edges) and {3,4};
    # 7 is isolated and must keep its own id
    labels = _cc([(5, 1), (1, 5), (5, 9), (9, 5), (4, 3)], [1, 3, 4, 5, 7, 9])
    assert labels == {1: 1, 5: 1, 9: 1, 3: 3, 4: 3, 7: 7}


def test_component_label_is_global_min(ray_session):
    # star around a high id plus a bridge to a low id elsewhere: every
    # member gets the GLOBAL min of the component, not a local min
    labels = _cc([(100, 50), (100, 60), (60, 2)], [2, 50, 60, 100])
    assert labels == {2: 2, 50: 2, 60: 2, 100: 2}


def test_triangle_count_clique_and_star(ray_session, tmp_path):
    """A 4-clique has exactly C(4,3)=4 triangles; a star has none.
    Each triangle must be counted exactly once (at its (degree, id)-
    minimum vertex), never 3x or 6x."""
    import pyarrow.parquet as pq

    from spider_ray.pipelines.graph import triangle_count_copurchase

    rows = []
    okey = 0
    # 4-clique over parts 1..4: the full basket twice -> every pair
    # reaches min_count=2
    for _ in range(2):
        okey += 1
        rows += [(okey, p) for p in (1, 2, 3, 4)]
    # star around 10: edges (10,11), (10,12) only — no triangle
    for other in (11, 12):
        for _ in range(2):
            okey += 1
            rows += [(okey, 10), (okey, other)]
    t = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    sf = str(tmp_path / "sf_tri")
    os.makedirs(sf, exist_ok=True)
    pq.write_table(t, f"{sf}/lineitem.parquet")

    out = triangle_count_copurchase(sf).take_all()
    assert out == [{"n_triangles": 4}]
