"""Independent sequential golden generators (oracle.py pattern).

For pipelines whose semantics are not SQL-expressible (rolling-hash
fingerprints, SimHash banding, the fake media decode), the driver's
DuckDB oracle reads a PINNED parquet produced here — a from-scratch
sequential reimplementation of the same spec, deliberately written in
plain-Python style (no numpy vectorization, no Ray) so an engine bug
and a golden bug are unlikely to coincide.

Regenerate after a spec change with:

    python -m spider_ray.goldens            # writes /root/repo/goldens/

Goldens are computed from /root/testdata/sf0.01 — the fixed input of
the driver's correctness gate.  tests/test_goldens_fresh.py recomputes
them on the fly and fails if the committed files are stale.
"""

from __future__ import annotations

import hashlib
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "goldens")

def golden_sql(name: str, columns: str = "*") -> str:
    """DuckDB oracle that reads the pinned golden parquet — path built
    from the package location so a checkout anywhere works (ADVICE r02:
    the hardcoded /root/repo path broke silently elsewhere)."""
    return (
        f"SELECT {columns} "
        f"FROM read_parquet('{os.path.join(OUT_DIR, name)}.parquet')"
    )


_MASK = (1 << 64) - 1
_B = 1099511628211
_WIN = 16


def _fingerprint_seq(data: bytes) -> int:
    """O(n) sequential rolling hash — same spec as
    textstats.rolling_fingerprint, independent implementation."""
    n = len(data)
    if n == 0:
        return 0
    if n <= _WIN:
        h = 0
        for byte in data:
            h = (h * _B + byte) & _MASK
        return h >> 1
    top = pow(_B, _WIN - 1, 1 << 64)
    h = 0
    for byte in data[:_WIN]:
        h = (h * _B + byte) & _MASK
    best = h
    for i in range(n - _WIN):
        h = ((h - data[i] * top) * _B + data[i + _WIN]) & _MASK
        if h < best:
            best = h
    return best >> 1


def fingerprint_golden(sf_dir: str = SF_DIR) -> pa.Table:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    return pa.table({
        "doc_id": pa.array([d for d, _ in rows], pa.int64()),
        "fingerprint": pa.array(
            [_fingerprint_seq(x.encode("utf-8")) for _, x in rows], pa.int64()
        ),
    })


def _word_hash64(w: str) -> int:
    """The engine's shared word-hash PRIMITIVE (pandas siphash13, fixed
    key) — one scalar call.  The hash primitive is part of the pinned
    spec and intentionally shared; everything downstream of it (bit
    accumulation, banding, pairing) stays independently reimplemented."""
    import numpy as np
    import pandas as pd

    return int(pd.util.hash_array(np.asarray([w], dtype=object))[0])


def _simhash_seq(text: str) -> int:
    counts = [0] * 64
    for w in sorted(set(x.lower() for x in re.findall(r"\w+", text))):
        h = _word_hash64(w)
        for i in range(64):
            counts[i] += 1 if (h >> (63 - i)) & 1 else -1
    out = 0
    for i, v in enumerate(counts):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def simhash_pairs_golden(sf_dir: str = SF_DIR, max_hamming: int = 3) -> pa.Table:
    """ALL pairs at Hamming distance <= max_hamming.  With 4x16-bit
    bands and max_hamming=3 the pigeonhole principle makes the engine's
    banded LSH recover exactly this set (no fixture bucket exceeds the
    star cap), so full all-pairs IS the expected banded output."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    sigs = [(d, _simhash_seq(x)) for d, x in rows]
    a, b, hd = [], [], []
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            d = bin(sigs[i][1] ^ sigs[j][1]).count("1")
            if d <= max_hamming:
                a.append(sigs[i][0])
                b.append(sigs[j][0])
                hd.append(d)
    return pa.table({
        "doc_a": pa.array(a, pa.int64()),
        "doc_b": pa.array(b, pa.int64()),
        "hamming": pa.array(hd, pa.int64()),
    })


def decode_media_golden() -> pa.Table:
    """Sequential fake-decode of the synthetic media corpus: images
    only; feat_checksum is the integer sum of the 16 feature bytes."""
    ids, ws, hs, cs = [], [], [], []
    for i in range(256):
        if i % 3 == 0:
            continue  # audio/fake rows are filtered out by the pipeline
        seed = hashlib.sha1(f"media{i}".encode()).digest()
        payload = seed * (8 + i % 23)
        digest = hashlib.sha1(payload).digest()
        ids.append(i)
        ws.append(64 + digest[0])
        hs.append(64 + digest[1])
        cs.append(sum(digest[:16]))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "feat_checksum": pa.array(cs, pa.int64()),
    })


def decode_media_features_golden() -> pa.Table:
    """Sequential fake-decode with the feature vector EXPLODED to
    (media_id, width, height, feat_idx, feat_e6) integer rows — the
    hashable gate twin of the raw float-list feature pipeline."""
    import numpy as np

    mids, ws, hs, idxs, e6s = [], [], [], [], []
    for i in range(256):
        if i % 3 == 0:
            continue  # audio/fake rows are filtered out by the pipeline
        seed = hashlib.sha1(f"media{i}".encode()).digest()
        payload = seed * (8 + i % 23)
        digest = hashlib.sha1(payload).digest()
        for idx in range(16):
            f32 = np.float32(digest[idx]) / np.float32(255.0)
            mids.append(i)
            ws.append(64 + digest[0])
            hs.append(64 + digest[1])
            idxs.append(idx)
            e6s.append(int(np.floor(np.float64(f32) * 1_000_000.0 + 0.5)))
    return pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "feat_idx": pa.array(idxs, pa.int32()),
        "feat_e6": pa.array(e6s, pa.int64()),
    })


def _oracle_micro_run(revisit: bool = False):
    """Sequential oracle simulator on a FRESH micro fixture — the same
    deterministic corpus __ray_entry__'s crawl queries run on, and the
    same 4-round budget (max_rounds=4)."""
    import shutil
    import tempfile

    from spider_ray.fixtures.gen import generate
    from spider_ray.oracle import OracleCrawl

    tmp = tempfile.mkdtemp(prefix="spider_ray_goldens_")
    try:
        generate("micro", tmp)
        sim = OracleCrawl(tmp)
        sim.run(max_rounds=4)
        if revisit:
            sim.run_revisit()
        return sim
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def crawl_flagship_golden() -> pa.Table:
    """Crawl-order table of the 4-round micro crawl, from the
    single-threaded oracle — the engine twin is
    __ray_entry__._crawl_flagship (CRAWL_ORDER schema)."""
    sim = _oracle_micro_run()
    rows = sim.crawl_order  # (seq, round, depth, domain, url)
    return pa.table({
        "seq": pa.array([r[0] for r in rows], pa.int64()),
        "round": pa.array([r[1] for r in rows], pa.int32()),
        "depth": pa.array([r[2] for r in rows], pa.int32()),
        "domain": pa.array([r[3] for r in rows], pa.string()),
        "url": pa.array([r[4] for r in rows], pa.string()),
    })


def crawl_revisit_golden() -> pa.Table:
    """Checksum-diff table of one oracle re-visit pass (drifted corpus
    pages_v2) after the 4-round micro crawl — engine twin is
    __ray_entry__._crawl_revisit (REVISIT schema)."""
    sim = _oracle_micro_run(revisit=True)
    rows = sim.revisit_rows  # (url, domain, old_sum, new_sum, changed, round)
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "domain": pa.array([r[1] for r in rows], pa.string()),
        "old_checksum": pa.array([r[2] for r in rows], pa.string()),
        "new_checksum": pa.array([r[3] for r in rows], pa.string()),
        "changed": pa.array([r[4] for r in rows], pa.bool_()),
        "round": pa.array([r[5] for r in rows], pa.int32()),
    })


def hll_golden() -> pa.Table:
    """Sequential HyperLogLog over lineitem.l_orderkey — same pinned
    spec as pipelines/sketch.py (b=10, sha1 top-bits register, rho of
    the 54-bit suffix, ascending-register summation, linear-counting
    small-range correction), written as a plain row loop."""
    import math

    t = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"),
                      columns=["l_orderkey"])
    m = 1024
    regs = [0] * m
    for k in t.column("l_orderkey").to_pylist():
        h = int.from_bytes(hashlib.sha1(str(k).encode()).digest()[:8], "big")
        reg = h >> 54
        w = h & ((1 << 54) - 1)
        rho = 55 if w == 0 else 54 - w.bit_length() + 1
        if rho > regs[reg]:
            regs[reg] = rho
    s = 0.0
    for j in range(m):
        s += 2.0 ** (-float(regs[j]))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / s
    v = sum(1 for j in range(m) if regs[j] == 0)
    if e <= 2.5 * m and v > 0:
        e = m * math.log(m / v)
    return pa.table(
        {
            "m": pa.array([m], pa.int64()),
            "n_distinct_est": pa.array([int(math.floor(e + 0.5))], pa.int64()),
        }
    )


def resize_media_golden() -> pa.Table:
    """Sequential fake-resize of the synthetic media corpus (images
    only; 32x32 target; md5 of '32x32:' + payload)."""
    ids, ws, hs, md5s = [], [], [], []
    for i in range(256):
        if i % 3 == 0:
            continue  # audio rows are filtered out by the pipeline
        seed = hashlib.sha1(f"media{i}".encode()).digest()
        payload = seed * (8 + i % 23)
        ids.append(i)
        ws.append(32)
        hs.append(32)
        md5s.append(hashlib.md5(b"32x32:" + payload).hexdigest())
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "resized_md5": pa.array(md5s, pa.string()),
    })


def frame_sample_golden() -> pa.Table:
    """Sequential frame sampling of the synthetic video corpus: every
    4th frame; frame checksum = md5(payload + frame_idx_be32)."""
    mids, idxs, md5s = [], [], []
    for i in range(64):
        seed = hashlib.sha1(f"video{i}".encode()).digest()
        payload = seed * (16 + i % 17)
        n_frames = 8 + seed[2] % 56
        for fi in range(0, n_frames, 4):
            mids.append(i)
            idxs.append(fi)
            md5s.append(hashlib.md5(payload + fi.to_bytes(4, "big")).hexdigest())
    return pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "frame_idx": pa.array(idxs, pa.int32()),
        "frame_md5": pa.array(md5s, pa.string()),
    })


def _bpe_encode_naive(word: str, ranks: dict) -> list[bytes]:
    """Independent twin of core/bpe.Bpe.encode_word: same spec (merge
    the LOWEST-RANK adjacent pair, leftmost occurrence, until none
    remains), deliberately naive — recompute every pair's rank from
    scratch each round, no caching, no early exit."""
    syms = [bytes([b]) for b in word.encode("utf-8")]
    while True:
        candidates = []
        for i in range(len(syms) - 1):
            pair = (syms[i], syms[i + 1])
            if pair in ranks:
                candidates.append((ranks[pair], i))
        if not candidates:
            return syms
        _, i = min(candidates)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]


def chunk_bpe_golden(sf_dir: str = SF_DIR) -> pa.Table:
    """Sequential 64/16 BPE chunking over documents — the vendored
    merge table (core/bpe_merges.txt) is shared spec; the application
    algorithm and chunk assembly are re-implemented from scratch."""
    from spider_ray.core.bpe import load_merges

    ranks = {p: i for i, p in enumerate(load_merges())}
    word_re = re.compile(r"\S+")
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids, cids, ntoks, md5s = [], [], [], []
    cache: dict[str, list[bytes]] = {}
    for did, txt in sorted(zip(t.column("doc_id").to_pylist(),
                               t.column("text").to_pylist())):
        toks: list[bytes] = []
        for w in word_re.findall(txt):
            if w not in cache:
                cache[w] = _bpe_encode_naive(w, ranks)
            toks.extend(cache[w])
        n = len(toks)
        n_chunks = 1 if n <= 64 else ((n - 64 + 47) // 48) + 1
        for i in range(n_chunks):
            seg = toks[i * 48: i * 48 + 64]
            ids.append(did)
            cids.append(i)
            ntoks.append(len(seg))
            md5s.append(hashlib.md5(b" ".join(seg)).hexdigest())
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "chunk_id": pa.array(cids, pa.int64()),
        "n_tokens": pa.array(ntoks, pa.int64()),
        "chunk_md5": pa.array(md5s, pa.string()),
    })


def cms_golden(sf_dir: str = SF_DIR, d: int = 4, w: int = 2048,
               threshold: int = 900) -> pa.Table:
    """Sequential Count-Min twin of pipelines/sketch.cms_term_counts:
    same pinned spec (row i probes sha1(f"{i}:{term}")[:8] big-endian
    mod w; estimate = min over rows; report terms with estimate >=
    threshold), built one document at a time with no numpy fold — a
    linear sketch merges exactly, so the distributed engine must match
    this bit-for-bit."""
    term_re = re.compile(r"[a-z]+")
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    matrix = [[0] * w for _ in range(d)]
    vocab: set[str] = set()

    def cols(term: str) -> list[int]:
        return [
            int.from_bytes(
                hashlib.sha1(f"{i}:{term}".encode()).digest()[:8], "big"
            ) % w
            for i in range(d)
        ]

    for txt in t.column("text").to_pylist():
        for word in term_re.findall(txt.lower()):
            if len(word) >= 3:
                vocab.add(word)
                for i, c in enumerate(cols(word)):
                    matrix[i][c] += 1
    terms, ests = [], []
    for word in sorted(vocab):
        e = min(matrix[i][c] for i, c in enumerate(cols(word)))
        if e >= threshold:
            terms.append(word)
            ests.append(e)
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "est_count": pa.array(ests, pa.int64()),
    })


def train_bpe_golden(sf_dir: str = SF_DIR, n_merges: int = 200,
                     vocab_cap: int = 20) -> pa.Table:
    """Independent naive twin of pipelines/textstats.train_bpe_vocab +
    core/bpe.train_bpe_from_counts: same spec (word = \\S+ run; vocab
    capped to the ``vocab_cap`` most frequent words, ties word-asc;
    each round merges the highest-count adjacent pair with overlap
    counting, ties on smallest (left, right) bytes; merge applied
    left-to-right re-checking the same index; stop below count 2) —
    but FULL pair recount every round, no posting map, no Ray."""
    from collections import Counter

    word_re = re.compile(r"\S+")
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    freq: Counter = Counter()
    for txt in t.column("text").to_pylist():
        freq.update(word_re.findall(txt))
    vocab = sorted(freq.items(), key=lambda wc: (-wc[1], wc[0]))[:vocab_cap]

    words = [([bytes([b]) for b in w.encode("utf-8")], f) for w, f in vocab]
    ranks, lefts, rights, pcounts = [], [], [], []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best_pair = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best_pair] < 2:
            break
        ranks.append(rank)
        lefts.append(best_pair[0].hex())
        rights.append(best_pair[1].hex())
        pcounts.append(pairs[best_pair])
        merged = best_pair[0] + best_pair[1]
        for syms, _f in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == best_pair[0] and syms[i + 1] == best_pair[1]:
                    syms[i: i + 2] = [merged]
                else:
                    i += 1
    return pa.table({
        "rank": pa.array(ranks, pa.int64()),
        "left": pa.array(lefts, pa.string()),
        "right": pa.array(rights, pa.string()),
        "pair_count": pa.array(pcounts, pa.int64()),
    })


# the daemon schedule shared by the golden, the engine query and
# tests/test_crawl_continuous.py — step i is round i (virtual time)
CONTINUOUS_SCHEDULE = ["crawl", "crawl", "revisit", "crawl", "revisit",
                       "crawl"]


def crawl_continuous_golden() -> pa.Table:
    """Combined activity table of the oracle daemon running the pinned
    6-step crawl/revisit schedule on the micro fixture — crawl steps
    contribute their crawl-order rows, revisit steps their checksum
    diffs, in one schema so the driver gate hashes both effect kinds.
    Engine twin: __ray_entry__._crawl_continuous."""
    import shutil
    import tempfile

    from spider_ray.fixtures.gen import generate
    from spider_ray.oracle import OracleCrawl

    tmp = tempfile.mkdtemp(prefix="spider_ray_goldens_")
    try:
        generate("micro", tmp)
        sim = OracleCrawl(tmp)
        sim.run_continuous(CONTINUOUS_SCHEDULE)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    rows = [
        (rnd, "crawl", seq, depth, domain, url, False)
        for seq, rnd, depth, domain, url in sim.crawl_order
    ] + [
        (rnd, "revisit", -1, -1, domain, url, changed)
        for url, domain, _old, _new, changed, rnd in sim.revisit_rows
    ]
    rows.sort(key=lambda r: (r[0], r[1], r[2], r[5]))
    return pa.table({
        "round": pa.array([r[0] for r in rows], pa.int32()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "depth": pa.array([r[3] for r in rows], pa.int32()),
        "domain": pa.array([r[4] for r in rows], pa.string()),
        "url": pa.array([r[5] for r in rows], pa.string()),
        "changed": pa.array([r[6] for r in rows], pa.bool_()),
    })


def crawl_archive_golden() -> pa.Table:
    """Expected CDX record set (round, url, warc_ts, digest) of an
    archive-mode micro crawl: one record per fetched page per round,
    timestamp from the corpus capture column, digest = sha1(html).
    Engine twin reads the crawl's cdx sidecars
    (__ray_entry__._crawl_archive); filename/offset/length are
    block-composition-dependent and excluded from the golden."""
    import shutil
    import tempfile

    from spider_ray.fixtures.gen import generate
    from spider_ray.oracle import OracleCrawl

    tmp = tempfile.mkdtemp(prefix="spider_ray_goldens_")
    try:
        generate("micro", tmp)
        corpus_t = pq.read_table(os.path.join(tmp, "pages.parquet"),
                                 columns=["url", "warc_ts", "html"])
        sim = OracleCrawl(tmp)
        sim.run(max_rounds=4)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    corpus = {
        u: (ts, h)
        for u, ts, h in zip(
            corpus_t.column("url").to_pylist(),
            corpus_t.column("warc_ts").cast("int64").to_pylist(),
            corpus_t.column("html").to_pylist(),
        )
    }
    rows = []
    for url, _text, _lang, rnd, _seq in sim.extracted:
        ts, html = corpus[url]
        rows.append((rnd, url, ts, hashlib.sha1(html).hexdigest()))
    rows.sort()
    return pa.table({
        "round": pa.array([r[0] for r in rows], pa.int32()),
        "url": pa.array([r[1] for r in rows], pa.string()),
        "warc_ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "digest": pa.array([r[3] for r in rows], pa.string()),
    })


def crawl_trap_guard_golden() -> pa.Table:
    """Trap-guarded crawl activity (round-5 feature, core/traps.py):
    the 4-round micro crawl on the shared trap-injected fixture with
    ``trap_guard=True`` — crawl-order rows (kind="crawl") plus one
    per-round trap-drop counter row (kind="trap", count in seq), so
    the driver gate hashes both that traps were DROPPED and that the
    clean crawl is otherwise unchanged.  Engine twin:
    __ray_entry__._crawl_trap_guard."""
    import shutil
    import tempfile

    from spider_ray.core.config import load_crawl_config
    from spider_ray.fixtures.gen import generate, inject_trap_links
    from spider_ray.oracle import OracleCrawl

    tmp = tempfile.mkdtemp(prefix="spider_ray_goldens_")
    try:
        generate("micro", os.path.join(tmp, "base"))
        fix = inject_trap_links(os.path.join(tmp, "base"),
                                os.path.join(tmp, "traps"))
        sim = OracleCrawl(fix, load_crawl_config(fix, trap_guard=True))
        sim.run(max_rounds=4)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    rows = [
        (rnd, "crawl", seq, depth, domain, url)
        for seq, rnd, depth, domain, url in sim.crawl_order
    ] + [
        (rnd + 1, "trap", m["trap_dropped"], -1, "", "")
        for rnd, m in enumerate(sim.metrics)
    ]
    rows.sort(key=lambda r: (r[0], r[1], r[2], r[5]))
    return pa.table({
        "round": pa.array([r[0] for r in rows], pa.int32()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "depth": pa.array([r[3] for r in rows], pa.int32()),
        "domain": pa.array([r[4] for r in rows], pa.string()),
        "url": pa.array([r[5] for r in rows], pa.string()),
    })


def _host_edges_reference() -> dict:
    """Host-pair href-occurrence counts of the micro corpus, parsed
    with the STDLIB HTMLParser reference extractor — deliberately NOT
    the engine's fast scanner, so the webgraph goldens are a
    differential check on the scanner as well as on the pipeline
    (engine twin: spider_ray/pipelines/webgraph.py)."""
    import shutil
    import tempfile

    from spider_ray.core.canon import canonicalize
    from spider_ray.core.extract import extract_text_and_links_reference
    from spider_ray.core.scope import split_host_pq
    from spider_ray.fixtures.gen import generate

    tmp = tempfile.mkdtemp(prefix="spider_ray_goldens_")
    try:
        generate("micro", tmp)
        t = pq.read_table(os.path.join(tmp, "pages.parquet"),
                          columns=["url", "html"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    counts: dict = {}
    for url, html in zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist()):
        cu = canonicalize(url)
        if cu is None:
            continue
        src, _ = split_host_pq(cu)
        for href in extract_text_and_links_reference(html)[1]:
            child = canonicalize(href, base=url)
            if child is None:
                continue
            dst, _ = split_host_pq(child)
            counts[(src, dst)] = counts.get((src, dst), 0) + 1
    return counts


def host_link_graph_golden() -> pa.Table:
    """(src_host, dst_host, n) of the micro corpus, sorted by pair."""
    rows = sorted(_host_edges_reference().items())
    return pa.table({
        "src_host": pa.array([k[0] for k, _ in rows], pa.string()),
        "dst_host": pa.array([k[1] for k, _ in rows], pa.string()),
        "n": pa.array([n for _, n in rows], pa.int64()),
    })


def host_pagerank_golden() -> pa.Table:
    """Integer fixed-point PageRank (millionths, damping 85/100, 5
    supersteps, dangling mass dropped) over the distinct self-loop-free
    host edges — plain dict arithmetic, one superstep at a time."""
    edges = sorted({k for k in _host_edges_reference() if k[0] != k[1]})
    out: dict = {}
    nodes: set = set()
    for s, d in edges:
        out.setdefault(s, []).append(d)
        nodes.add(s)
        nodes.add(d)
    pr = {n: 1_000_000 for n in nodes}
    for _ in range(5):
        incoming = {n: 0 for n in nodes}
        for s, dsts in out.items():
            share = pr[s] // len(dsts)
            for d in dsts:
                incoming[d] += share
        pr = {n: 150_000 + (85 * incoming[n]) // 100 for n in nodes}
    rows = sorted(pr.items())
    return pa.table({
        "node": pa.array([n for n, _ in rows], pa.string()),
        "pr": pa.array([p for _, p in rows], pa.int64()),
    })


def anchor_texts_golden() -> pa.Table:
    """(dst_url, anchor_text, n): in-link anchor texts per canonical
    target of the micro corpus, stdlib reference parser (engine twin:
    webgraph.anchor_texts with the fast scanner's A.8 span path)."""
    import shutil
    import tempfile

    from spider_ray.core.canon import canonicalize
    from spider_ray.core.extract import extract_anchors_reference
    from spider_ray.fixtures.gen import generate

    tmp = tempfile.mkdtemp(prefix="spider_ray_goldens_")
    try:
        generate("micro", tmp)
        t = pq.read_table(os.path.join(tmp, "pages.parquet"),
                          columns=["url", "html"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    counts: dict = {}
    for url, html in zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist()):
        for href, text in extract_anchors_reference(html):
            child = canonicalize(href, base=url)
            if child is None:
                continue
            counts[(child, text)] = counts.get((child, text), 0) + 1
    rows = sorted(counts.items())
    return pa.table({
        "dst_url": pa.array([k[0] for k, _ in rows], pa.string()),
        "anchor_text": pa.array([k[1] for k, _ in rows], pa.string()),
        "n": pa.array([n for _, n in rows], pa.int64()),
    })


def canonical_clusters_golden() -> pa.Table:
    """(canonical_url, n_pages, first_url) over the canonical-annotated
    micro fixture — sequential dict loop (engine twin:
    webgraph.canonical_clusters, distributed multi-algebra fold)."""
    import shutil
    import tempfile

    from spider_ray.core.canon import canonicalize
    from spider_ray.core.extract import extract_canonical
    from spider_ray.fixtures.gen import generate, inject_canonical_links

    tmp = tempfile.mkdtemp(prefix="spider_ray_goldens_")
    try:
        generate("micro", os.path.join(tmp, "base"))
        fix = inject_canonical_links(os.path.join(tmp, "base"),
                                     os.path.join(tmp, "canon"))
        t = pq.read_table(os.path.join(fix, "pages.parquet"),
                          columns=["url", "html"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    clusters: dict = {}
    for url, html in zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist()):
        href = extract_canonical(html)
        target = canonicalize(href, base=url) if href is not None else None
        if target is None:
            target = canonicalize(url) or url
        n, first = clusters.get(target, (0, url))
        clusters[target] = (n + 1, min(first, url))
    rows = sorted(clusters.items())
    return pa.table({
        "canonical_url": pa.array([k for k, _ in rows], pa.string()),
        "n_pages": pa.array([v[0] for _, v in rows], pa.int64()),
        "first_url": pa.array([v[1] for _, v in rows], pa.string()),
    })


def url_list_golden() -> pa.Table:
    """The micro corpus url column, pinned as an INPUT parquet: the
    url_templates oracle is a COMPUTING DuckDB twin (regexp_replace +
    GROUP BY) over this list, not a pinned result table."""
    import shutil
    import tempfile

    from spider_ray.fixtures.gen import generate

    tmp = tempfile.mkdtemp(prefix="spider_ray_goldens_")
    try:
        generate("micro", tmp)
        t = pq.read_table(os.path.join(tmp, "pages.parquet"),
                          columns=["url"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return t.sort_by("url")


def host_components_golden() -> pa.Table:
    """(host, component_host) — weakly-connected components of the
    stdlib-parsed host edge set by sequential union-find;
    representative = member with minimal signed-int64 A.2 hash (engine
    twin: webgraph.host_components, distributed min-label
    propagation over the same id space)."""
    from spider_ray.core.hashing import url_hash64_signed as id64

    edges = sorted(_host_edges_reference())
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    hosts: set = set()
    for s, d in edges:
        hosts.add(s)
        hosts.add(d)
    for h in hosts:
        parent[h] = h
    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    comp: dict = {}
    for h in hosts:
        comp.setdefault(find(h), []).append(h)
    rows = []
    for members in comp.values():
        rep = min(members, key=lambda h: (id64(h), h))
        for h in members:
            rows.append((h, rep))
    rows.sort()
    return pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "component_host": pa.array([r[1] for r in rows], pa.string()),
    })


def hreflang_variants_golden() -> pa.Table:
    """(url, hreflang, alt_url) over the hreflang-annotated micro
    fixture — sequential loop (engine twin:
    webgraph.hreflang_variants)."""
    import shutil
    import tempfile

    from spider_ray.core.canon import canonicalize
    from spider_ray.core.extract import extract_hreflang
    from spider_ray.fixtures.gen import generate, inject_hreflang_links

    tmp = tempfile.mkdtemp(prefix="spider_ray_goldens_")
    try:
        generate("micro", os.path.join(tmp, "base"))
        fix = inject_hreflang_links(os.path.join(tmp, "base"),
                                    os.path.join(tmp, "hreflang"))
        t = pq.read_table(os.path.join(fix, "pages.parquet"),
                          columns=["url", "html"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    rows = []
    for url, html in zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist()):
        for hl, href in extract_hreflang(html):
            alt = canonicalize(href, base=url)
            if alt is not None:
                rows.append((url, hl, alt))
    rows.sort()
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "hreflang": pa.array([r[1] for r in rows], pa.string()),
        "alt_url": pa.array([r[2] for r in rows], pa.string()),
    })


GOLDENS = {
    "fingerprint_documents": fingerprint_golden,
    "chunk_documents_bpe": chunk_bpe_golden,
    "approx_distinct_orders_hll": hll_golden,
    "resize_media_fake": resize_media_golden,
    "frame_sample_media": frame_sample_golden,
    "simhash_dedup_documents": simhash_pairs_golden,
    "decode_media_fake": decode_media_golden,
    "decode_media_features": decode_media_features_golden,
    "train_bpe_vocab": train_bpe_golden,
    "cms_term_counts": cms_golden,
    "crawl_flagship": crawl_flagship_golden,
    "crawl_revisit": crawl_revisit_golden,
    "crawl_continuous": crawl_continuous_golden,
    "crawl_archive": crawl_archive_golden,
    "crawl_trap_guard": crawl_trap_guard_golden,
    "host_link_graph": host_link_graph_golden,
    "host_pagerank": host_pagerank_golden,
    "anchor_texts": anchor_texts_golden,
    "canonical_clusters": canonical_clusters_golden,
    "url_list": url_list_golden,
    "host_components": host_components_golden,
    "hreflang_variants": hreflang_variants_golden,
}


def write_all(out_dir: str = OUT_DIR) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in GOLDENS.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(fn(), path)
        print(f"wrote {path}")


if __name__ == "__main__":
    write_all()
