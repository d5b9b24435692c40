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


# ---------------------------------------------------------------------------
# edit-distance similarity join (PassJoin pigeonhole)
# ---------------------------------------------------------------------------

def test_levenshtein_batch_known_distances(ray_session):
    from spider_ray.pipelines.dedup import _levenshtein_batch

    a40 = "abcdefghijklmnopqrstuvwxyzabcdefghijklmn"
    cases = [
        (a40, a40, 0),
        (a40, a40[:7] + "q" + a40[8:], 1),            # 1 substitution
        (a40, a40[1:] + "z", 2),                      # del front + ins back
        (a40, "q" * 40, 39),                          # far apart
    ]
    import numpy as np

    d = _levenshtein_batch([c[0] for c in cases], [c[1] for c in cases])
    assert list(d) == [c[2] for c in cases]


def test_edit_pairs_catches_shifted_segments(ray_session, tmp_path):
    """1 deletion at the front + 1 insertion at the back shifts EVERY
    aligned segment by one, so aligned-only candidate generation would
    miss the pair; the +/-d probe window must catch it.  The DuckDB
    brute-force twin proves exactness on the same tiny corpus."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spider_ray.pipelines.dedup import (
        _EDIT_PAIRS_SQL, edit_distance_pairs_documents)

    base = "the quick brown fox jumps over the lazy"  # 39 chars
    a = base + "x"            # 40
    b = a[1:] + "z"           # ed(a, b) = 2, all segments shifted
    c = "wholly unrelated text that is forty chr!"
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [a, b, c],
        "lang": ["en"] * 3,
        "n_chars": [40, 40, 40],
    })
    sf = str(tmp_path / "sf_edit")
    os.makedirs(sf, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(rows), f"{sf}/documents.parquet")

    df = edit_distance_pairs_documents(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{sf}/documents.parquet')")
    odf = con.execute(_EDIT_PAIRS_SQL).df()
    key = ["doc_a", "doc_b", "dist"]
    a_ = df[key].sort_values(key).reset_index(drop=True)
    b_ = odf[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a_, b_.astype(a_.dtypes.to_dict()))
    # the shifted pair itself is present at distance 2
    assert ((a_.doc_a == 1) & (a_.doc_b == 2) & (a_.dist == 2)).any()
