"""Frequency-family tests: the Misra-Gries mergeable bound (candidate
set provably a superset of everything above N/(cap+1), any merge-tree
shape), the heavy-hitters exactness guard, and the inverted index's
read-spy proof (unneeded buckets deleted -> identical results)."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

from spider_ray.pipelines import freq

SF = "/root/testdata/sf0.001"


def _mg_fold(chunks, cap):
    """Merge per-chunk exact counts through _mg_compress in an
    arbitrary tree (left fold here) — mirrors the pipeline's merge."""
    acc: dict[str, int] = {}
    for ch in chunks:
        for t, c in ch.items():
            acc[t] = acc.get(t, 0) + c
        acc = freq._mg_compress(acc, cap)
    return acc


@pytest.mark.parametrize("cap", [4, 16, 64])
def test_mg_bound_random(cap):
    """Every item with true count > N/(cap+1) survives the fold, and
    no surviving counter overstates its true count."""
    rng = np.random.default_rng(7)
    # zipf-ish skew so there are real heavy hitters
    items = [f"t{int(v)}" for v in rng.zipf(1.5, 5000) if v < 500]
    n = len(items)
    true: dict[str, int] = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    chunks = []
    for i in range(0, n, 97):
        ch: dict[str, int] = {}
        for it in items[i:i + 97]:
            ch[it] = ch.get(it, 0) + 1
        chunks.append(ch)
    folded = _mg_fold(chunks, cap)
    assert len(folded) <= cap
    bound = n // (cap + 1)
    for t, c in true.items():
        if c > bound:
            assert t in folded, (t, c, bound)
    for t, c in folded.items():
        assert c <= true[t]


def test_heavy_hitters_guard_raises(ray_session):
    """capacity k (== result size) makes the kth-count-vs-bound
    exactness assertion fail on real data — the pipeline must raise,
    never return a silently-approximate top-k."""
    with pytest.raises(Exception, match="heavy-hitters guarantee"):
        freq.heavy_hitters_terms(SF, k=20, capacity=20).take_all()


def test_text_index_reads_only_needed_buckets(ray_session, tmp_path):
    """Delete every bucket the pinned query terms do NOT hash to; the
    search result must be byte-identical — proof the search never
    touches unneeded partitions."""
    full_dir = str(tmp_path / "idx")
    freq.build_text_index(SF, full_dir)
    want = freq.text_index_search(SF, index_dir=full_dir).to_pandas()
    assert len(want) > 0

    pruned_dir = str(tmp_path / "idx_pruned")
    shutil.copytree(full_dir, pruned_dir)
    needed = {freq._term_bucket(t, freq.INDEX_BUCKETS)
              for t in freq.INDEX_TERMS}
    removed = 0
    for d in os.listdir(pruned_dir):
        if d.startswith("bucket=") and int(d.split("=")[1]) not in needed:
            shutil.rmtree(os.path.join(pruned_dir, d))
            removed += 1
    assert removed > 0  # the test is vacuous if nothing was deleted
    got = freq.text_index_search(SF, index_dir=pruned_dir).to_pandas()
    assert got.equals(want)


def test_phrase_search_reads_only_needed_buckets(ray_session, tmp_path):
    """Positional-index twin of the read-spy proof: delete every bucket
    the phrase's terms do NOT hash to; the phrase result is
    byte-identical, and a brute-force scan over the corpus confirms
    the hit counts."""
    import re

    import pyarrow.parquet as pq

    full_dir = str(tmp_path / "pidx")
    freq.build_text_index_pos(SF, full_dir)
    want = freq.phrase_search_documents(SF, index_dir=full_dir).to_pandas()
    assert len(want) > 0  # pinned phrase must be non-vacuous

    pruned_dir = str(tmp_path / "pidx_pruned")
    shutil.copytree(full_dir, pruned_dir)
    needed = {freq._term_bucket(t, freq.INDEX_BUCKETS) for t in freq.PHRASE}
    removed = 0
    for d in os.listdir(pruned_dir):
        if d.startswith("bucket=") and int(d.split("=")[1]) not in needed:
            shutil.rmtree(os.path.join(pruned_dir, d))
            removed += 1
    assert removed > 0
    got = freq.phrase_search_documents(SF, index_dir=pruned_dir).to_pandas()
    assert got.equals(want)

    # brute-force twin over the raw corpus
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = {}
    L = len(freq.PHRASE)
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        ws = freq._terms(txt)
        n = sum(1 for i in range(len(ws) - L + 1)
                if tuple(ws[i:i + L]) == freq.PHRASE)
        if n:
            exp[did] = n
    assert dict(zip(want["doc_id"], want["n_hits"])) == exp


def test_index_build_idempotent(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    p1 = freq.build_text_index(SF, d)
    mtime = os.path.getmtime(os.path.join(p1, "_META"))
    p2 = freq.build_text_index(SF, d)
    assert p1 == p2 and os.path.getmtime(os.path.join(p2, "_META")) == mtime


@pytest.mark.parametrize("chunk", [37, 97, 5000])
def test_mg_plus_exact_pass_is_chunking_invariant(chunk):
    """The MG candidate set DOES depend on batching — the exact second
    pass must erase that: top-k via (fold candidates -> exact counts)
    equals the true top-k for every chunking, whenever the kth count
    clears the N/(cap+1) bound (the pipeline's assert)."""
    rng = np.random.default_rng(3)
    items = [f"t{int(v)}" for v in rng.zipf(1.4, 8000) if v < 300]
    n, cap, k = len(items), 256, 10
    true: dict[str, int] = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert want[-1][1] > n // (cap + 1)  # bound holds on this data
    chunks = []
    for i in range(0, n, chunk):
        ch: dict[str, int] = {}
        for it in items[i:i + chunk]:
            ch[it] = ch.get(it, 0) + 1
        chunks.append(ch)
    cand = set(_mg_fold(chunks, cap))
    exact = {t: c for t, c in true.items() if t in cand}
    got = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want
