"""Edge-case tests for the round-4 scoring/dedup additions: keep-best
dedup (argmax survivor, not first-seen), broadcast-LM rarity scoring
(vocab boundary + OOV smoothing), and per-label centroid accumulation
(float32 -> e6 fixed-point exactness).  The sf-fixture oracle pairing
lives in tests/test_harness.py; these pin hand-computable semantics."""

from __future__ import annotations

import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table):
    pq.write_table(table, os.path.join(tmp_path, f"{name}.parquet"))
    return str(tmp_path)


def _docs(tmp_path, texts, doc_ids=None):
    ids = doc_ids or list(range(1, len(texts) + 1))
    return _write(
        tmp_path, "documents",
        pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
    )


# -- dedup_keep_best_documents ------------------------------------------------

PREFIX = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def test_keep_best_survivor_is_longest_not_first(ray_session, tmp_path):
    """Three same-opening docs: the LONGEST survives even though it has
    the highest doc_id (keep-first would pick doc 10); the singleton
    survives untouched."""
    sf = _docs(
        tmp_path,
        [
            PREFIX + " short",
            PREFIX + " a bit longer tail here",
            PREFIX + " the longest tail of the three by a clear margin",
            "totally different opening words one two three four five",
        ],
        doc_ids=[10, 11, 12, 13],
    )
    from spider_ray.pipelines.dedup import dedup_keep_best_documents

    df = dedup_keep_best_documents(sf).to_pandas()
    assert sorted(df["doc_id"].tolist()) == [12, 13]
    fam = df[df["doc_id"] == 12].iloc[0]
    assert fam["n_chars"] == len(PREFIX + " the longest tail of the three by a clear margin")


def test_keep_best_tie_breaks_to_min_doc_id(ray_session, tmp_path):
    """Equal n_chars inside a family: min doc_id wins (the SQL twin's
    ORDER BY n_chars DESC, doc_id)."""
    sf = _docs(
        tmp_path,
        [PREFIX + " tail one", PREFIX + " tail two"],
        doc_ids=[7, 5],
    )
    from spider_ray.pipelines.dedup import dedup_keep_best_documents

    df = dedup_keep_best_documents(sf).to_pandas()
    assert df["doc_id"].tolist() == [5]


def test_keep_best_prefix_is_tokenized_not_raw(ray_session, tmp_path):
    """Case and whitespace variants of the same opening collapse into
    one family ('[a-z]+' of lower(text)), mixed-in punctuation too."""
    sf = _docs(
        tmp_path,
        [
            "Alpha, BETA gamma;delta epsilon zeta eta theta x",
            "alpha beta   gamma delta epsilon zeta eta theta longer tail",
        ],
        doc_ids=[1, 2],
    )
    from spider_ray.pipelines.dedup import dedup_keep_best_documents

    df = dedup_keep_best_documents(sf).to_pandas()
    assert df["doc_id"].tolist() == [2]


# -- unigram_lm_score_documents -----------------------------------------------

def test_lm_score_matches_sequential_twin_with_oov(ray_session, tmp_path):
    """22 distinct terms vs a 16-term vocabulary: the rarest terms fall
    out-of-vocab and score max rarity; every doc's score matches an
    independent sequential computation; terms 15/16 tie in count at the
    vocabulary boundary, so the count-DESC-term-ASC tie-break decides
    who is in-vocab."""
    # term i is 3 letters ('taa', 'tab', ...) and appears (22 - i)
    # times total — triangle layout, deterministic
    terms = [f"t{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(22)]
    texts = []
    for rep in range(22):
        row = [t for i, t in enumerate(terms) if (22 - i) > rep]
        if row:
            texts.append(" ".join(row))
    texts.append(terms[16])  # lift term 16's count to tie term 15's
    sf = _docs(tmp_path, texts)

    from spider_ray.pipelines.freq import (
        LM_RARITY_SCALE, LM_VOCAB_SIZE, unigram_lm_score_documents,
    )

    got = (
        unigram_lm_score_documents(sf)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    # sequential twin
    tok = lambda s: [w for w in s.lower().split() if len(w) >= 3]
    counts = Counter(w for t in texts for w in tok(t))
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:LM_VOCAB_SIZE]
    )
    assert len(counts) == 22 and len(vocab) == 16  # OOV path non-vacuous
    # boundary tie is real and resolved by term ASC: term 15 in, 16 out
    assert counts[terms[15]] == counts[terms[16]]
    assert terms[15] in vocab and terms[16] not in vocab
    for i, text in enumerate(texts):
        ws = tok(text)
        score = sum(
            LM_RARITY_SCALE // vocab[w] if w in vocab else LM_RARITY_SCALE
            for w in ws
        )
        row = got[got["doc_id"] == i + 1].iloc[0]
        assert row["n_tokens"] == len(ws)
        assert row["score"] == score
        assert row["rarity_e2"] == 100 * score // len(ws)


def test_lm_score_drops_tokenless_docs(ray_session, tmp_path):
    """A doc with no [a-z]{3,} token produces no row (matching the SQL
    twin, whose token join drops it)."""
    sf = _docs(tmp_path, ["12345 !!! ab", "real words here"])
    from spider_ray.pipelines.freq import unigram_lm_score_documents

    df = unigram_lm_score_documents(sf).to_pandas()
    assert df["doc_id"].tolist() == [2]


# -- centroid_by_label_embeddings ---------------------------------------------

def test_centroid_sums_are_exact_e6_of_float32(ray_session, tmp_path):
    """0.1 is not representable in float32; the op must floor the
    float64-widened FLOAT32 value (0.100000001490116...e6 -> 100000),
    not the decimal literal.  Sums and counts are exact per (label,
    pos); pos is 1-based."""
    vecs = np.array(
        [[0.1, -0.25, 2.0],
         [0.1, 0.75, -1.5],
         [1.0, 1.0, 1.0]],
        dtype=np.float32,
    )
    labels = [4, 4, 9]
    sf = _write(
        tmp_path, "embeddings",
        pa.table({
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }),
    )
    from spider_ray.pipelines.ann import centroid_by_label_embeddings

    df = (
        centroid_by_label_embeddings(sf)
        .to_pandas().sort_values(["label", "pos"]).reset_index(drop=True)
    )
    q = np.floor(vecs.astype(np.float64) * 1e6).astype(np.int64)
    exp = {
        (4, p + 1): q[0, p] + q[1, p] for p in range(3)
    } | {(9, p + 1): q[2, p] for p in range(3)}
    assert len(df) == 6
    for _, r in df.iterrows():
        assert r["sum_e6"] == exp[(r["label"], r["pos"])]
        assert r["n"] == (2 if r["label"] == 4 else 1)
    # the float32 widening is observable: floor(1e6 * float32(0.1))
    # is exactly 100000 (0.1f = 0.100000001490116...)
    assert exp[(4, 1)] == 200000
