"""Edge-case tests for the round-4 pipelines: full-outer join with
pre-aggregated counts, LAG window gaps, duplicated-n-gram fraction,
and fixed-point PageRank (pipelines/relational.py, window.py,
dedup.py, graph.py).  The sf-fixture oracle pairing lives in
tests/test_harness.py; these pin hand-computable boundary behavior."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table):
    pq.write_table(table, os.path.join(tmp_path, f"{name}.parquet"))
    return str(tmp_path)


# -- customers_events_full_outer ---------------------------------------------

def test_full_outer_keeps_both_null_sides(ray_session, tmp_path):
    """Customer 1 (BUILDING, no events) survives with NULL count; user 9
    (events, not a BUILDING customer) survives with NULL segment;
    customer 5 in another segment is filtered before the join."""
    _write(
        tmp_path, "customer",
        pa.table({
            "c_custkey": pa.array([1, 2, 5], pa.int64()),
            "c_mktsegment": pa.array(["BUILDING", "BUILDING", "MACHINERY"]),
        }),
    )
    sf = _write(
        tmp_path, "events",
        pa.table({"user_id": pa.array([2, 2, 9], pa.int64())}),
    )
    from spider_ray.pipelines.relational import customers_events_full_outer

    df = (
        customers_events_full_outer(sf)
        .to_pandas()
        .sort_values("user_key")
        .reset_index(drop=True)
    )
    assert df["user_key"].tolist() == [1, 2, 9]
    assert df["n_events"].tolist()[1] == 2
    assert pd.isna(df["n_events"].iloc[0])          # customer w/o events
    assert pd.isna(df["c_mktsegment"].iloc[2])      # event user outside seg
    assert df["c_mktsegment"].iloc[0] == "BUILDING"


# -- event_gaps_lag -----------------------------------------------------------

def test_lag_gap_first_event_and_tie_order(ray_session, tmp_path):
    """First event per user gets -1; equal timestamps order by
    event_id (the SQL twin's ORDER BY ts, event_id), so the tie's
    second row sees a 0 gap; gaps are exact integer microseconds."""
    base = pd.Timestamp("2024-03-01")
    us = pd.Timedelta(microseconds=1)
    ts = [base, base + 3 * us, base + 3 * us, base, base + pd.Timedelta(seconds=2)]
    sf = _write(
        tmp_path, "events",
        pa.table({
            "event_id": pa.array([10, 12, 11, 20, 21], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8, 8], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }),
    )
    from spider_ray.pipelines.window import event_gaps_lag

    df = event_gaps_lag(sf).to_pandas().set_index("event_id")
    assert df.loc[10, "gap_us"] == -1
    assert df.loc[11, "gap_us"] == 3      # ties: 11 before 12
    assert df.loc[12, "gap_us"] == 0
    assert df.loc[20, "gap_us"] == -1
    assert df.loc[21, "gap_us"] == 2_000_000
    assert df["gap_us"].dtype.kind == "i"


# -- dup_ngram_fraction -------------------------------------------------------

def test_dup_ngram_fraction_shared_and_short_docs(ray_session, tmp_path):
    """Doc A and B share exactly their first 5-gram; C is fully unique;
    D (4 words < n) emits no row.  Fractions are e6 fixed point over
    DISTINCT grams."""
    a = "alpha beta gamma delta epsilon zeta"      # grams: 2 (1 shared)
    b = "alpha beta gamma delta epsilon OMEGA"     # grams: 2 (1 shared)
    c = "one two three four five six"              # grams: 2 (0 shared)
    d = "too short to gram"                        # no row
    sf = _write(
        tmp_path, "documents",
        pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([a, b, c, d]),
        }),
    )
    from spider_ray.pipelines.dedup import dup_ngram_fraction_documents

    df = dup_ngram_fraction_documents(sf).to_pandas().set_index("doc_id")
    assert sorted(df.index.tolist()) == [1, 2, 3]
    assert df.loc[1, "n_grams"] == 2 and df.loc[1, "dup_frac_e6"] == 500_000
    assert df.loc[2, "dup_frac_e6"] == 500_000
    assert df.loc[3, "dup_frac_e6"] == 0


def test_dup_ngram_repeated_gram_counts_once(ray_session, tmp_path):
    """A gram repeated WITHIN one doc is one distinct gram — it does
    not make the doc 'shared with itself'."""
    rep = "x y z w v x y z w v"   # 5-gram 'x y z w v' occurs twice
    sf = _write(
        tmp_path, "documents",
        pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array([rep]),
        }),
    )
    from spider_ray.pipelines.dedup import dup_ngram_fraction_documents

    df = dup_ngram_fraction_documents(sf).to_pandas().set_index("doc_id")
    # distinct grams: positions 0..5 -> 6 grams, one duplicated -> 5… compute:
    # words = 10, grams = 6 windows, window 0 == window 5 -> 5 distinct
    assert df.loc[1, "n_grams"] == 5
    assert df.loc[1, "dup_frac_e6"] == 0


# -- pagerank_order_part ------------------------------------------------------

def _pagerank_reference(edges, iterations):
    """Sequential fixed-point PageRank twin (same integer arithmetic)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        inc = {}
        for s, d in edges:
            inc[d] = inc.get(d, 0) + pr[s] // deg[s]
        pr = {n: 150_000 + 85 * inc.get(n, 0) // 100 for n in nodes}
    return pr


def test_pagerank_matches_sequential_reference(ray_session, tmp_path):
    """Star + triangle lineitem graph, 5 supersteps, bit-exact vs the
    sequential integer twin."""
    li = [(1, 100), (1, 101), (1, 102), (2, 100), (3, 101), (2, 102),
          (2, 100)]  # duplicate edge must dedup
    sf = _write(
        tmp_path, "lineitem",
        pa.table({
            "l_orderkey": pa.array([o for o, _ in li], pa.int64()),
            "l_partkey": pa.array([p for _, p in li], pa.int64()),
        }),
    )
    from spider_ray.pipelines.graph import PR_ITERATIONS, pagerank_order_part

    got = {
        r["node"]: r["pr"] for r in pagerank_order_part(sf).take_all()
    }
    dedup = sorted({(o, p) for o, p in li})
    edges = [(2 * o, 2 * p + 1) for o, p in dedup] + [
        (2 * p + 1, 2 * o) for o, p in dedup
    ]
    want = _pagerank_reference(edges, PR_ITERATIONS)
    assert got == want


def test_pagerank_rank_mass_reasonable(ray_session, tmp_path):
    """On a regular graph (every node degree 2) PageRank is uniform:
    the fixed point of r = 0.15 + 0.85*r is 1.0 -> 1_000_000 exactly."""
    li = [(1, 100), (1, 101), (2, 100), (2, 101)]  # 4-cycle, all deg 2
    sf = _write(
        tmp_path, "lineitem",
        pa.table({
            "l_orderkey": pa.array([o for o, _ in li], pa.int64()),
            "l_partkey": pa.array([p for _, p in li], pa.int64()),
        }),
    )
    from spider_ray.pipelines.graph import pagerank_order_part

    got = {r["node"]: r["pr"] for r in pagerank_order_part(sf).take_all()}
    assert set(got.values()) == {1_000_000}
    assert len(got) == 4


# -- scrub_dup_spans ----------------------------------------------------------

def test_scrub_dup_spans_interval_union(ray_session, tmp_path):
    """Covered tokens are the UNION of dup 5-gram windows (overlapping
    windows don't double-count), short docs and unique docs pass
    through untouched, fully-duplicated docs scrub to md5('')."""
    import hashlib

    from spider_ray.pipelines.dedup import scrub_dup_spans_documents

    sf = _write(
        tmp_path, "documents",
        pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array([
                "a b c d e x y z",            # shares "a b c d e" with doc 1
                "q a b c d e",                # covered at positions 1..5
                "unique words only here now",  # 1 gram, seen once -> clean
                "too short",                   # < 5 tokens -> no grams
                "a b c d e f",                 # identical to doc 5: both
                "a b c d e f",                 # grams dup -> fully covered
            ], pa.string()),
        }),
    )
    got = {r["doc_id"]: r for r in scrub_dup_spans_documents(sf).take_all()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (got[0]["n_tokens"], got[0]["n_dup_tokens"]) == (8, 5)
    assert got[0]["clean_md5"] == md5("x y z")
    assert (got[1]["n_tokens"], got[1]["n_dup_tokens"]) == (6, 5)
    assert got[1]["clean_md5"] == md5("q")
    assert (got[2]["n_dup_tokens"], got[2]["clean_md5"]) == (
        0, md5("unique words only here now"))
    assert (got[3]["n_tokens"], got[3]["n_dup_tokens"]) == (2, 0)
    for d in (4, 5):
        assert (got[d]["n_tokens"], got[d]["n_dup_tokens"]) == (6, 6)
        assert got[d]["clean_md5"] == md5("")


# -- pack_training_sequences --------------------------------------------------

def test_pack_sequences_multiblock_scan_matches_single_block(
        ray_session, tmp_path):
    """The distributed prefix sum must stitch per-block offsets exactly:
    forcing tiny scan blocks (many blocks) yields byte-identical
    packing to the single-block run, and offsets are the true global
    cumulative sums."""
    from spider_ray.pipelines.textstats import pack_training_sequences

    rng = np.random.default_rng(5)
    n_docs = 400
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, n_docs)]
    sf = _write(
        tmp_path, "documents",
        pa.table({
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }),
    )
    one = (pack_training_sequences(sf, seq_len=64)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    many = (pack_training_sequences(sf, seq_len=64, scan_block_rows=37)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert many.equals(one)
    n = one["n_tokens"].to_numpy()
    want_start = np.cumsum(n) - n
    assert (one["start_off"].to_numpy() == want_start).all()
    assert (one["seq_id"].to_numpy() == want_start // 64).all()
