"""Frequency-analysis pipelines over the documents table: exact
heavy hitters via a mergeable Misra-Gries sketch + exact second pass,
n-gram language-model counts, and a materialized term-bucketed
inverted index whose searches read only the buckets they need.

Scale notes (the 100 TB contract for each operator):

- ``heavy_hitters_terms``: pass 1 state is bounded by the sketch
  capacity everywhere — each batch emits <= C counter rows, merge
  blocks compress back to <= C rows, and the final fold sees
  <= C x n_merge_blocks rows.  Agarwal et al., "Mergeable Summaries"
  (PODS 2012): Misra-Gries summaries merge by summing counters and
  subtracting the (C+1)-th largest, keeping total undercount
  <= N/(C+1) REGARDLESS of merge-tree shape — so the candidate set
  provably contains every term with true count > N/(C+1).  Pass 2
  exact-counts ONLY the <= C candidates (broadcast set, bounded
  partials), and the result asserts the guarantee (kth count strictly
  above the bound) instead of silently returning approximations.
- ``bigram_counts_documents``: per-batch partial counts, one
  range-partition shuffle over the (data-sized) bigram domain, then a
  threshold filter BEFORE the global top-k, which moves <= k rows per
  block.
- ``build_text_index`` / ``text_index_search``: same materialized
  layout discipline as the ANN IVF index (ann.py) and the crawl's
  domain-bucketed corpus — postings land in term-hash bucket
  partitions once, and a search reads ONLY the bucket dirs its query
  terms hash to (one read_parquet over that file list).  At multi-node
  scale the index dir lives on shared storage and each bucket holds
  many files; a bucket here is one file because the fixture is small.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from spider_ray import ops

_TERM_RE = re.compile(r"[a-z]+")

HH_K = 20
HH_CAPACITY = 512
BIGRAM_MIN_COUNT = 5
BIGRAM_K = 50
INDEX_TERMS = ("window", "shuffle", "spark")  # pinned search set
INDEX_BUCKETS = 16


def _terms(text: str) -> list[str]:
    """Shared tokenizer (identical to tfidf's SQL twin):
    maximal [a-z]+ runs of lower(text), length >= 3."""
    return [w for w in _TERM_RE.findall(text.lower()) if len(w) >= 3]


# ---------------------------------------------------------------------------
# exact heavy hitters: Misra-Gries candidates -> exact verify pass
# ---------------------------------------------------------------------------

def _mg_compress(counts: dict[str, int], cap: int) -> dict[str, int]:
    """Misra-Gries COMPRESS: subtract the (cap+1)-th largest counter
    from every counter and drop the non-positive — <= cap survive.
    Deterministic (pure function of the counter multiset)."""
    if len(counts) <= cap:
        return counts
    vals = sorted(counts.values(), reverse=True)
    d = vals[cap]
    return {t: c - d for t, c in counts.items() if c > d}


def heavy_hitters_terms(sf_dir: str, k: int = HH_K,
                        capacity: int = HH_CAPACITY):
    """Exact top-k most frequent terms, computed with bounded state.

    Two passes over the data (the classic heavy-hitters trade —
    sketch-sized shuffles instead of a vocabulary-sized one):
    pass 1 builds a mergeable Misra-Gries candidate set (<= capacity
    terms; provably a superset of everything with count > N/(cap+1));
    pass 2 exact-counts the candidates via a broadcast membership set.
    The result is EXACT — asserted, not hoped: the kth exact count
    must strictly exceed the sketch's undercount bound, else this
    raises rather than returning a silently-approximate top-k."""

    def mg_batch(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        n_batch = 0
        for txt in t.column("text").to_pylist():
            for w in _terms(txt):
                counts[w] = counts.get(w, 0) + 1
                n_batch += 1
        counts = _mg_compress(counts, capacity)
        terms = sorted(counts)
        n_col = [n_batch] + [0] * (len(terms) - 1) if terms else []
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "cnt": pa.array([counts[t_] for t_ in terms], pa.int64()),
                "n_batch": pa.array(n_col, pa.int64()),
            }
        )

    def mg_merge(t: pa.Table) -> pa.Table:
        # merge = sum counters per term, then COMPRESS; n_batch totals
        # ride along in a reserved empty-term row
        g = t.group_by("term").aggregate([("cnt", "sum"), ("n_batch", "sum")])
        counts = dict(zip(g.column("term").to_pylist(),
                          g.column("cnt_sum").to_pylist()))
        n_total = int(pc.sum(t.column("n_batch")).as_py() or 0)
        counts = _mg_compress(counts, capacity)
        terms = sorted(counts)
        n_col = [n_total] + [0] * (len(terms) - 1) if terms else []
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "cnt": pa.array([counts[t_] for t_ in terms], pa.int64()),
                "n_batch": pa.array(n_col, pa.int64()),
            }
        )

    ds = ops.read_table(sf_dir, "documents", columns=["text"])
    merged_ds = ds.map_batches(mg_batch, batch_format="pyarrow")
    # bounded-fan-in merge tree: each level folds ~64 summaries into
    # one (batch_size = 64 x capacity rows), so NO level ever holds
    # more than 64 summaries in memory — a single repartition(small)
    # would instead funnel every partial row of a 10^9-doc corpus into
    # a handful of blocks.  Three levels cover 64^3 ~ 262k source
    # batches; the mergeable-summaries bound is tree-shape-independent,
    # and the exact second pass makes the OUTPUT independent of how
    # batching shaped the candidate set (tests force this).
    for _ in range(3):
        merged_ds = merged_ds.map_batches(
            mg_merge, batch_size=capacity * 64, batch_format="pyarrow"
        )
    merged = (
        merged_ds.repartition(1)
        .map_batches(mg_merge, batch_size=None, batch_format="pyarrow")
        .take_all()  # <= capacity rows by construction
    )
    candidates = {r["term"] for r in merged}
    n_total = sum(r["n_batch"] for r in merged)
    bound = n_total // (capacity + 1)  # max undercount == max missed count
    cand_ref = ray.put(candidates)

    def exact_batch(t: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        counts: dict[str, int] = {}
        for txt in t.column("text").to_pylist():
            for w in _terms(txt):
                if w in cand:
                    counts[w] = counts.get(w, 0) + 1
        terms = sorted(counts)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "cnt": pa.array([counts[t_] for t_ in terms], pa.int64()),
            }
        )

    exact = ops.partial_sum_agg(
        ds.map_batches(exact_batch, batch_format="pyarrow"),
        keys=["term"], sums={"cnt": "n"}, counts=None,
    )  # bounded: <= capacity keys

    def final_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("term", "ascending")]
        )[:k]
        out = t.take(idx)
        if len(out) >= k and out.column("n")[k - 1].as_py() <= bound:
            raise RuntimeError(
                f"heavy-hitters guarantee violated: kth count "
                f"{out.column('n')[k - 1].as_py()} <= sketch bound {bound}; "
                f"raise capacity (= {capacity})"
            )
        return out

    return exact.repartition(1).map_batches(
        final_topk, batch_size=None, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# n-gram LM counts: bigrams above a frequency threshold
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def bigram_counts_documents(sf_dir: str, min_count: int = BIGRAM_MIN_COUNT,
                            k: int = BIGRAM_K):
    """Top-k most frequent word bigrams with count >= min_count — the
    n-gram LM-count kernel (per-batch partial counts -> one
    range-partition shuffle on the bigram itself -> threshold filter
    -> bounded top-k merge).  Tokens: \\w+ of lower(text), matching
    dedup.py's n-gram tokenizer and the SQL twin."""

    def bigram_partials(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for txt in t.column("text").to_pylist():
            ws = [w.lower() for w in _WORD_RE.findall(txt)]
            for i in range(len(ws) - 1):
                g = ws[i] + " " + ws[i + 1]
                counts[g] = counts.get(g, 0) + 1
        grams = sorted(counts)
        return pa.table(
            {
                "bigram": pa.array(grams, pa.string()),
                "cnt": pa.array([counts[g] for g in grams], pa.int64()),
            }
        )

    ds = ops.read_table(sf_dir, "documents", columns=["text"])
    totals = ops.partial_sum_agg(
        ds.map_batches(bigram_partials, batch_format="pyarrow"),
        keys=["bigram"], sums={"cnt": "n"}, counts=None,
        bounded=False,  # data-sized key domain: distributed final merge
    ).filter(expr=f"n >= {int(min_count)}")

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("bigram", "ascending")]
        )[:k]
        return t.take(idx)

    # survivors shrink to <= k per block before the single-block final
    return (
        totals.map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_topk, batch_size=None, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# unigram-LM rarity scoring: broadcast top-V vocab, per-doc score
# ---------------------------------------------------------------------------

# small at fixture scale so the OOV path is non-vacuous (the sf corpus
# has ~30 distinct terms; 16 leaves ~half out-of-vocab and makes the
# rank-boundary tie-break observable).  A production run uses ~50k.
LM_VOCAB_SIZE = 16
LM_RARITY_SCALE = 1_000_000


def unigram_lm_score_documents(sf_dir: str, vocab_size: int = LM_VOCAB_SIZE):
    """CCNet-style LM quality scoring in the broadcast-model shape:
    train a unigram model on the corpus (distributed term counts ->
    bounded top-V vocabulary), broadcast it, and score every document
    in one streaming pass.  The score is integer-exact so the DuckDB
    twin reproduces it bit-for-bit: token rarity = SCALE // count
    (out-of-vocab tokens get max rarity SCALE, i.e. count-1 smoothing),
    doc score = sum of rarities, rarity_e2 = mean rarity in e2 fixed
    point.  High scores = rare-token-heavy documents — the same
    filtering decision a real perplexity filter makes, minus the
    float log whose last-ulp behavior no two engines share.

    Scale shape: pass 1 is the bigram-counts kernel (per-batch partial
    counts, ONE range-partition shuffle over the term domain, top-V
    merge moving <= V rows per block); the vocabulary is V rows by
    construction — never data-sized — so the broadcast is a closure
    constant shipped once per worker, and pass 2 is shuffle-free."""

    def term_partials(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for txt in t.column("text").to_pylist():
            for w in _terms(txt):
                counts[w] = counts.get(w, 0) + 1
        ts = sorted(counts)
        return pa.table(
            {
                "term": pa.array(ts, pa.string()),
                "cnt": pa.array([counts[w] for w in ts], pa.int64()),
            }
        )

    ds = ops.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    totals = ops.partial_sum_agg(
        ds.select_columns(["text"]).map_batches(
            term_partials, batch_format="pyarrow"
        ),
        keys=["term"], sums={"cnt": "n"}, counts=None,
        bounded=False,  # term domain is data-sized at corpus scale
    )

    def local_topv(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("term", "ascending")]
        )[:vocab_size]
        return t.take(idx)

    vocab_rows = (
        totals.map_batches(local_topv, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_topv, batch_size=None, batch_format="pyarrow")
        .take_all()  # <= vocab_size rows by construction
    )
    rarity = {
        r["term"]: LM_RARITY_SCALE // r["n"] for r in vocab_rows
    }

    def score(t: pa.Table) -> pa.Table:
        doc_ids, n_toks, scores = [], [], []
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = _terms(txt)
            if not toks:
                continue  # SQL twin's join drops token-less docs too
            doc_ids.append(did)
            n_toks.append(len(toks))
            scores.append(
                sum(rarity.get(w, LM_RARITY_SCALE) for w in toks)
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "score": pa.array(scores, pa.int64()),
                "rarity_e2": pa.array(
                    [100 * s // n for s, n in zip(scores, n_toks)],
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# inverted text index: materialized term-hash-bucket layout + search
# ---------------------------------------------------------------------------

def _term_bucket(term: str, n_buckets: int) -> int:
    """Stable across processes/runs (never hash())."""
    return int.from_bytes(
        hashlib.sha1(term.encode()).digest()[:8], "big"
    ) % n_buckets


def default_text_index_dir(sf_dir: str, n_buckets: int) -> str:
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"/tmp/spider_ray_textidx/{tag}-b{n_buckets}"


def build_text_index(sf_dir: str, index_dir: str | None = None,
                     n_buckets: int = INDEX_BUCKETS) -> str:
    """Materialize the inverted index ONCE: (term, doc_id) postings
    written to the parquet partition of the term's hash bucket
    (index_dir/bucket=N/), postings sorted by (term, doc_id) inside
    each bucket so row-group stats prune within a bucket too.
    Idempotent; builds go to a .tmp dir renamed atomically (same
    pattern as ann.build_ivf_index)."""
    index_dir = index_dir or default_text_index_dir(sf_dir, n_buckets)
    if os.path.exists(os.path.join(index_dir, "_META")):
        return index_dir
    tmp = index_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def postings(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        terms: list[str] = []
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            for w in sorted(set(_terms(txt))):
                ids.append(did)
                terms.append(w)
        buckets = [_term_bucket(w, n_buckets) for w in terms]
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    ops.write_bucket_layout(
        ops.read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(postings, batch_format="pyarrow"),
        tmp, sort_keys=["term", "doc_id"],
    )
    with open(os.path.join(tmp, "_META"), "w") as f:
        f.write(f"n_buckets={n_buckets}\n")
    try:
        os.rename(tmp, index_dir)
    except OSError:
        if not os.path.exists(os.path.join(index_dir, "_META")):
            raise  # concurrent builder won the rename; reuse its index
    return index_dir


def text_index_search(sf_dir: str, terms: tuple[str, ...] = INDEX_TERMS,
                      index_dir: str | None = None,
                      n_buckets: int = INDEX_BUCKETS):
    """Posting lookup for a term set: reads ONLY the bucket partitions
    the query terms hash to (tests delete every other bucket and the
    result is unchanged — the read-spy proof)."""
    index_dir = build_text_index(sf_dir, index_dir, n_buckets)
    needed = sorted({_term_bucket(w, n_buckets) for w in terms})
    files = []
    for b in needed:
        d = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(d):
            files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    if not files:
        return ray.data.from_arrow(
            pa.table({"term": pa.array([], pa.string()),
                      "doc_id": pa.array([], pa.int64())})
        )
    term_set = set(terms)

    def lookup(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column("term"),
                        value_set=pa.array(sorted(term_set), pa.string()))
        return t.filter(mask)

    return (
        ray.data.read_parquet(files, columns=["term", "doc_id"])
        .map_batches(lookup, batch_format="pyarrow")
        .sort(["term", "doc_id"])
    )


# ---------------------------------------------------------------------------
# positional index + exact phrase search
# ---------------------------------------------------------------------------

PHRASE = ("fast", "merge")  # pinned phrase (adjacent in the filtered stream)
_POS_PACK = 1 << 32         # (doc_id, pos) packed into one int64 join key


def default_pos_index_dir(sf_dir: str, n_buckets: int) -> str:
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return f"/tmp/spider_ray_indexes/text_pos_{key}_b{n_buckets}"


def build_text_index_pos(sf_dir: str, index_dir: str | None = None,
                         n_buckets: int = INDEX_BUCKETS) -> str:
    """Positional inverted index: one (term, doc_id, pos) row PER
    OCCURRENCE (build_text_index keeps only distinct (term, doc));
    pos is the token's index in the filtered term stream, so phrase
    adjacency is pos arithmetic.  Same hash-bucket parquet layout and
    atomic-rename build as the non-positional index."""
    index_dir = index_dir or default_pos_index_dir(sf_dir, n_buckets)
    if os.path.exists(os.path.join(index_dir, "_META")):
        return index_dir
    tmp = index_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def postings(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        terms: list[str] = []
        poss: list[int] = []
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            for i, w in enumerate(_terms(txt)):
                ids.append(did)
                terms.append(w)
                poss.append(i)
        buckets = [_term_bucket(w, n_buckets) for w in terms]
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    ops.write_bucket_layout(
        ops.read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(postings, batch_format="pyarrow"),
        tmp, sort_keys=["term", "doc_id", "pos"],
    )
    with open(os.path.join(tmp, "_META"), "w") as f:
        f.write(f"n_buckets={n_buckets}\n")
    try:
        os.rename(tmp, index_dir)
    except OSError:
        if not os.path.exists(os.path.join(index_dir, "_META")):
            raise
    return index_dir


def phrase_search_documents(sf_dir: str, phrase: tuple[str, ...] = PHRASE,
                            index_dir: str | None = None,
                            n_buckets: int = INDEX_BUCKETS):
    """Exact phrase search over the positional index: (doc_id, n_hits)
    for every document containing the phrase's terms at consecutive
    positions of the filtered token stream.

    Scale shape: reads ONLY the bucket partitions the phrase's terms
    hash to (the IVF/index-layout pattern); adjacency is a chain of
    key-only SEMI joins on the packed (doc_id, pos) int64 — term i's
    postings shifted by -i all collapse onto term 0's key space, so
    each join ships one int64 column per side and the candidate set
    shrinks monotonically with each term.  The final per-doc count is
    one partial-aggregated groupby.  Never touches the corpus text."""
    index_dir = build_text_index_pos(sf_dir, index_dir, n_buckets)
    needed = sorted({_term_bucket(w, n_buckets) for w in phrase})
    files = []
    for b in needed:
        d = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(d):
            files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_hits": pa.array([], pa.int64())})
    if not files:
        return ray.data.from_arrow(empty)
    postings = ray.data.read_parquet(
        files, columns=["term", "doc_id", "pos"]
    ).materialize()

    def packed(term: str, shift: int):
        def f(t: pa.Table) -> pa.Table:
            kept = t.filter(pc.equal(t.column("term"), term))
            d = kept.column("doc_id").to_numpy(zero_copy_only=False)
            p = kept.column("pos").to_numpy(zero_copy_only=False)
            m = p >= shift  # a term at pos < shift can't end a prefix
            return pa.table(
                {"k": pa.array(d[m] * _POS_PACK + (p[m] - shift))}
            )
        return f

    matches = postings.map_batches(packed(phrase[0], 0),
                                   batch_format="pyarrow")
    for i, term in enumerate(phrase[1:], start=1):
        nxt = postings.map_batches(packed(term, i), batch_format="pyarrow")
        matches = ops.partitioned_hash_join(matches, nxt, on="k", how="semi")

    return ops.partial_sum_agg(
        matches,
        pre=lambda t: pa.table(
            {"doc_id": pc.divide(t.column("k"), _POS_PACK)}
        ),
        keys=["doc_id"], sums={}, counts="n_hits", bounded=False,
    ).sort("doc_id")


def _phrase_sql(phrase: tuple[str, ...] = PHRASE) -> str:
    conds = " AND ".join(
        f"ws[i + {j}] = '{w}'" for j, w in enumerate(phrase)
    )
    return f"""
    WITH d AS (
      SELECT doc_id,
             list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                         w -> length(w) >= 3) AS ws
      FROM documents
    ), hits AS (
      SELECT doc_id,
             CAST(len(list_filter(range(1, len(ws) - {len(phrase) - 2}),
                                  i -> {conds})) AS BIGINT) AS n_hits
      FROM d
    )
    SELECT doc_id, n_hits FROM hits WHERE n_hits >= 1
    """


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

FREQ_QUERIES = {
    "heavy_hitters_terms": heavy_hitters_terms,
    "bigram_counts_documents": bigram_counts_documents,
    "text_index_search": text_index_search,
    "phrase_search_documents": phrase_search_documents,
    "unigram_lm_score_documents": unigram_lm_score_documents,
}

FREQ_ORACLE_SQL = {
    "phrase_search_documents": _phrase_sql(),
    "unigram_lm_score_documents": f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
          FROM documents
        ), toks3 AS (
          SELECT doc_id, term FROM toks WHERE length(term) >= 3
        ), counts AS (
          SELECT term, COUNT(*) AS n FROM toks3 GROUP BY term
        ), vocab AS (
          SELECT term, n FROM counts
          ORDER BY n DESC, term LIMIT {LM_VOCAB_SIZE}
        ), scored AS (
          SELECT t.doc_id,
                 CASE WHEN v.n IS NULL THEN {LM_RARITY_SCALE}
                      ELSE {LM_RARITY_SCALE} // v.n END AS r
          FROM toks3 t LEFT JOIN vocab v USING (term)
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(r) AS BIGINT) AS score,
               CAST((100 * SUM(r)) // COUNT(*) AS BIGINT) AS rarity_e2
        FROM scored GROUP BY doc_id
    """,
    "heavy_hitters_terms": f"""
        WITH toks AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
          FROM documents
        )
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n
        FROM toks WHERE length(term) >= 3
        GROUP BY term ORDER BY n DESC, term LIMIT {HH_K}
    """,
    "bigram_counts_documents": rf"""
        WITH toks AS (
          SELECT list_transform(regexp_extract_all(text, '\w+'),
                                w -> lower(w)) AS ws
          FROM documents
        ), b AS (
          SELECT unnest(list_transform(
                     range(1, len(ws)),
                     i -> ws[i] || ' ' || ws[i + 1]
                 )) AS bigram
          FROM toks WHERE len(ws) >= 2
        )
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
        FROM b GROUP BY bigram HAVING COUNT(*) >= {BIGRAM_MIN_COUNT}
        ORDER BY n DESC, bigram LIMIT {BIGRAM_K}
    """,
    "text_index_search": f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_distinct(
                     regexp_extract_all(lower(text), '[a-z]+')
                 )) AS term
          FROM documents
        )
        SELECT term, doc_id FROM toks
        WHERE length(term) >= 3
          AND term IN ({", ".join(repr(t) for t in INDEX_TERMS)})
        ORDER BY term, doc_id
    """,
}
