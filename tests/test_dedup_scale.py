"""Scale-behavior tests for the near-dup family: hot-bucket capping
(star pairs instead of O(n^2)) and planted-duplicate recall for the
approximate embedding LSH path."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spider_ray.pipelines.dedup import (
    embedding_near_dup_lsh,
    minhash_lsh_pairs,
    simhash_dedup_documents,
)

N_HOT = 200   # identical docs — one LSH bucket far above the test cap
TEST_CAP = 64  # explicit max_bucket so the star-cap path is exercised


@pytest.fixture(scope="module")
def hot_bucket_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hotdocs")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight again")
    texts = [base] * N_HOT + [
        f"completely unrelated document number {i} with its own distinct "
        f"words alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        for i in range(20)
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return str(d)


def test_minhash_hot_bucket_star_cap(ray_session, hot_bucket_dir):
    out = minhash_lsh_pairs(hot_bucket_dir, max_bucket=TEST_CAP).to_pandas()
    # star cap: the identical cluster yields N-1 hub edges, not C(N,2)
    assert len(out) == N_HOT - 1
    assert (out["jaccard_e6"] == 1_000_000).all()
    # hub is the smallest doc_id; every member connects to it
    assert (out["doc_a"] == 0).all()
    assert sorted(out["doc_b"]) == list(range(1, N_HOT))


def test_simhash_hot_bucket_star_cap(ray_session, hot_bucket_dir):
    out = simhash_dedup_documents(hot_bucket_dir,
                                  max_bucket=TEST_CAP).to_pandas()
    ident = out[(out["doc_a"] == 0) & (out["doc_b"] < N_HOT)]
    assert len(ident) == N_HOT - 1
    assert (ident["hamming"] == 0).all()
    # no quadratic blow-up from the hot bucket
    assert len(out) < N_HOT + TEST_CAP


@pytest.fixture(scope="module")
def planted_embeddings_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("plantemb")
    dim, n_base = 64, 20
    # deterministic pseudo-random base vectors (no RNG state)
    import hashlib

    def vec(seed: str) -> np.ndarray:
        buf = b"".join(
            hashlib.sha1(f"{seed}:{i}".encode()).digest()
            for i in range(dim * 8 // 20 + 1)
        )
        u = np.frombuffer(buf[: dim * 8], np.uint64)
        return (u / float(2**64)) * 2.0 - 1.0

    vecs = [vec(f"base{i}") for i in range(n_base)]
    # plant 5 near-copies of vectors 0..4 (cosine ~0.9999)
    for i in range(5):
        vecs.append(vecs[i] + 0.01 * vec(f"noise{i}"))
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    })
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    return str(d)


def test_embedding_lsh_recovers_planted_pairs(ray_session,
                                              planted_embeddings_dir):
    out = embedding_near_dup_lsh(planted_embeddings_dir,
                                 cosine_threshold=0.99).to_pandas()
    got = set(zip(out["vec_a"], out["vec_b"]))
    planted = {(i, 20 + i) for i in range(5)}
    assert planted <= got, f"missing planted pairs: {planted - got}"
    assert (out["cosine_e4"] >= 9900).all()
