"""Vendored byte-level BPE tokenizer (spider_ray/core/bpe.py)."""

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spider_ray.core.bpe import (
    Bpe,
    MERGES_PATH,
    N_MERGES,
    load_merges,
    seed_corpus,
    train_bpe,
)


def test_committed_merge_table_is_fresh():
    """Training is a pure function of the embedded seed corpus; the
    committed bpe_merges.txt must match a from-scratch retrain."""
    assert train_bpe(seed_corpus(), N_MERGES) == load_merges(MERGES_PATH)


def test_seed_words_become_single_tokens():
    bpe = Bpe()
    for w in ["the", "order", "window", "batch", "stream", "table"]:
        assert bpe.encode_word(w) == [w.encode()], w


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_encode_is_lossless(text):
    """BPE is a segmentation: concatenating the tokens of each word
    must reproduce the word's exact UTF-8 bytes."""
    bpe = Bpe()
    import re

    for w in re.findall(r"\S+", text):
        assert b"".join(bpe.encode_word(w)) == w.encode("utf-8")


def test_engine_matches_naive_golden_on_fixture_docs():
    """Rank-table engine encode vs the goldens.py naive min-rank twin,
    over every distinct word in the sf0.001 documents table."""
    from spider_ray.goldens import _bpe_encode_naive

    bpe = Bpe()
    ranks = bpe.ranks
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    words = set()
    for txt in t.column("text").to_pylist():
        words.update(txt.split())
    assert words
    for w in sorted(words):
        assert bpe.encode_word(w) == _bpe_encode_naive(w, ranks), w


def test_chunk_bpe_step_in_pipeline(ray_session):
    """chunk_bpe behind the Step protocol: same windowing contract as
    the regex chunk step, token counts from the vendored tokenizer."""
    import pyarrow as pa
    import ray

    from spider_ray.steps import pipeline_from_config

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["en", "en"], pa.string()),
        "text": pa.array(["the fast order " * 40, "tiny"], pa.string()),
    })
    out = pipeline_from_config(
        ray.data.from_arrow(docs),
        [{"step": "chunk_bpe", "chunk_tokens": 64, "overlap": 16}],
    ).to_pandas().sort_values(["doc_id", "chunk_id"])
    # doc 1: 120 single-token words -> chunks at stride 48: 0,1,2
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk_id) == [0, 1, 2]
    assert list(d1.n_tokens) == [64, 64, 24]
    # doc 2: shorter than one chunk -> exactly one chunk
    d2 = out[out.doc_id == 2]
    assert list(d2.chunk_id) == [0]
    assert list(d2.n_tokens)[0] >= 1


def test_chunk_bpe_query_matches_golden(ray_session):
    from spider_ray.goldens import chunk_bpe_golden
    from spider_ray.pipelines.textstats import chunk_documents_bpe

    got = (
        chunk_documents_bpe("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    want = (
        chunk_bpe_golden("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


# --- train_bpe_from_counts (the incremental corpus-scale trainer) ---------

def _naive_train(word_counts, n_merges):
    """Brute full-recount reference of the same spec (mirrors
    goldens.train_bpe_golden's loop)."""
    from collections import Counter

    words = [([bytes([b]) for b in w.encode("utf-8")], f)
             for w, f in word_counts]
    out = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        out.append((best[0], best[1], pairs[best]))
        merged = best[0] + best[1]
        for syms, _f in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best[0] and syms[i + 1] == best[1]:
                    syms[i: i + 2] = [merged]
                else:
                    i += 1
    return out


def test_incremental_trainer_matches_naive_recount():
    from spider_ray.core.bpe import train_bpe_from_counts

    cases = [
        # overlapping-pair pathology: "aaaa" counts (a,a) with overlap
        # but merges non-overlapping left-to-right
        [("aaaa", 5), ("aaa", 3), ("ab", 7)],
        # ties everywhere: forces the (left, right) lexicographic break
        [("ab", 2), ("ba", 2), ("cd", 2), ("dc", 2)],
        # realistic mixed vocab incl. multi-byte utf-8
        [("the", 50), ("then", 20), ("them", 20), ("über", 9),
         ("crawl", 13), ("crawler", 7), ("data", 30), ("date", 11)],
        # single word, count 1 -> every pair count < 2, zero merges
        [("xyz", 1)],
    ]
    for wc in cases:
        assert train_bpe_from_counts(wc, 64) == _naive_train(wc, 64), wc


def test_incremental_trainer_matches_naive_on_random_vocab():
    import random

    from spider_ray.core.bpe import train_bpe_from_counts

    rng = random.Random(42)
    alphabet = "abcdeé"
    for _ in range(10):
        vocab = {}
        for _w in range(rng.randint(2, 40)):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 8)))
            vocab[w] = rng.randint(1, 30)
        wc = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
        assert train_bpe_from_counts(wc, 48) == _naive_train(wc, 48)
