"""URL trap guard — kernel unit tests + vectorized-twin differential
fuzz (core/traps.py).  Crawl integration is covered in
tests/test_crawl_traps.py (golden vs oracle with the guard on)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from spider_ray.core.traps import (
    TRAP_DEPTH,
    TRAP_LENGTH,
    TRAP_NONE,
    TRAP_PARAMS,
    TRAP_REPEAT,
    trap_reason,
    trap_reasons_batch,
)

U = "https://site0001.example"


def test_clean_urls():
    for u in [
        f"{U}/",
        f"{U}/p/1",
        f"{U}/a/b/c/d?x=1&y=2",
        f"{U}/a/a",                      # run of 2 < 3
        f"{U}/a/b/a/b",                  # 2 pair repeats < 3
        f"{U}/p/1?" + "&".join(f"k{i}=v" for i in range(8)),  # 8 == max
    ]:
        assert trap_reason(u) == TRAP_NONE, u


def test_length_rule():
    u = f"{U}/" + "x" * 2000
    assert trap_reason(u) == TRAP_LENGTH
    # one long segment is depth 1 -> clean once the length cap is raised
    assert trap_reason(u, max_url_len=3000) == TRAP_NONE


def test_depth_rule():
    u = U + "".join(f"/s{i}" for i in range(17))
    assert trap_reason(u) == TRAP_DEPTH
    assert trap_reason(U + "".join(f"/s{i}" for i in range(16))) == TRAP_NONE


def test_repeat_run_rule():
    assert trap_reason(f"{U}/a/a/a") == TRAP_REPEAT
    assert trap_reason(f"{U}/x/a/a/a/y") == TRAP_REPEAT
    assert trap_reason(f"{U}/a/a/b/a/a") == TRAP_NONE  # runs of 2
    assert trap_reason(f"{U}/a/a/a/a", max_segment_repeats=5) == TRAP_NONE


def test_repeat_cycle_rule():
    assert trap_reason(f"{U}/a/b/a/b/a/b") == TRAP_REPEAT
    assert trap_reason(f"{U}/x/a/b/a/b/a/b") == TRAP_REPEAT
    assert trap_reason(f"{U}/a/b/a/b/a") == TRAP_NONE  # 2.5 pairs
    assert trap_reason(f"{U}/a/b/a/b") == TRAP_NONE


def test_params_rule():
    q9 = "&".join(f"k{i}=v" for i in range(9))
    assert trap_reason(f"{U}/p?{q9}") == TRAP_PARAMS
    assert trap_reason(f"{U}/p?") == TRAP_NONE  # empty query


def test_precedence_length_first():
    # a url that is too long AND too deep AND repeating -> LENGTH
    u = U + "".join("/a" for _ in range(600))
    assert trap_reason(u) == TRAP_LENGTH
    # too deep AND repeating -> DEPTH
    u2 = U + "".join("/a" for _ in range(20))
    assert trap_reason(u2, max_url_len=10_000) == TRAP_DEPTH


def _fuzz_urls(n: int) -> list[str]:
    """Deterministic adversarial url corpus: short-alphabet segments
    (forces repeats and cycles), variable depth, query tails."""
    urls = []
    segs = ["a", "b", "c", "aa", "ab"]
    for i in range(n):
        h = hashlib.sha1(f"trapfuzz{i}".encode()).digest()
        depth = h[0] % 22
        parts = [segs[h[1 + j % 18] % len(segs)] for j in range(depth)]
        u = U + "".join("/" + p for p in parts)
        if h[19] % 3 == 0:
            u += "?" + "&".join(
                f"k{j}=v" for j in range(h[18] % 12)
            )
        if h[19] % 7 == 0:
            u += "/" + "z" * (h[17] * 8)
        urls.append(u)
    return urls


def test_vectorized_twin_differential_fuzz():
    urls = _fuzz_urls(4000)
    expect = np.array([trap_reason(u) for u in urls], dtype=np.int8)
    got = trap_reasons_batch(urls)
    mismatch = np.flatnonzero(expect != got)
    assert mismatch.size == 0, [
        (urls[i], int(expect[i]), int(got[i])) for i in mismatch[:5]
    ]


def test_vectorized_twin_tight_thresholds():
    urls = _fuzz_urls(1500)
    kw = dict(max_url_len=60, max_path_depth=4,
              max_segment_repeats=2, max_query_params=2)
    expect = np.array([trap_reason(u, **kw) for u in urls], dtype=np.int8)
    got = trap_reasons_batch(urls, **kw)
    assert (expect == got).all()


def test_adversarial_timing_bounded():
    """Remote-controlled URLs must never make the batch path
    super-linear: overlong URLs (1 MB of pathological path shapes)
    are decided by the LENGTH rule BEFORE any regex touches them, and
    in-bound (<= max_url_len) adversarial repeat-bait stays fast."""
    import time

    mb = 1_000_000
    monsters = [
        U + "/" + "a" * mb,                       # one giant segment
        U + "/a" * (mb // 2),                     # maximal segment count
        U + "/ab" * (mb // 3),                    # repeat-bait pairs
        U + ("/" + "a" * 300 + "/" + "a" * 300) * (mb // 1200),
    ]
    t0 = time.perf_counter()
    got = trap_reasons_batch(monsters)
    el = time.perf_counter() - t0
    assert (got == TRAP_LENGTH).all()
    assert el < 0.5, f"overlong-url fast path took {el:.2f}s"
    # in-bound bait: worst shapes that fit under the length cap
    bait = []
    for i in range(2000):
        if i % 3 == 0:
            bait.append(U + "/ab" * 300)          # pair bait, no trip
        elif i % 3 == 1:
            bait.append(U + "/" + "a" * 500 + "/" + "a" * 500)
        else:
            bait.append(U + "/x/y" * 250)
    t0 = time.perf_counter()
    out = trap_reasons_batch(bait)
    el = time.perf_counter() - t0
    assert el < 2.0, f"in-bound adversarial batch took {el:.2f}s"
    # and the answers still equal the kernel's
    expect = np.array([trap_reason(u) for u in bait], dtype=np.int8)
    assert (out == expect).all()


def test_vectorized_empty_and_rootless():
    assert trap_reasons_batch([]).size == 0
    got = trap_reasons_batch(["https://x.example", f"{U}/"])
    assert (got == TRAP_NONE).all()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _seg = st.text(alphabet="abx9.-", min_size=1, max_size=4)

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(_seg, min_size=0, max_size=24),
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=2, max_value=5),
    )
    def test_vectorized_twin_property(segs, nparams, k):
        """Property form of the differential fuzz: random short-alphabet
        paths (maximal repeat/cycle density) at random repeat
        thresholds — batch twin == per-row kernel, always."""
        u = U + "".join("/" + s for s in segs)
        if nparams:
            u += "?" + "&".join(f"p{i}=1" for i in range(nparams))
        kw = dict(max_url_len=120, max_path_depth=10,
                  max_segment_repeats=k, max_query_params=6)
        assert trap_reasons_batch([u], **kw)[0] == trap_reason(u, **kw)
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass
