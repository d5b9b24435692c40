"""Differential property tests: the engine's vectorized kernels vs the
deliberately-naive sequential twins in spider_ray/goldens.py, on
arbitrary hypothesis-generated inputs (the pinned-parquet goldens only
cover the sf0.01 corpus; these cover the input space)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spider_ray.goldens import _fingerprint_seq, _simhash_seq
from spider_ray.pipelines.dedup import simhash64
from spider_ray.pipelines.textstats import rolling_fingerprint


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_rolling_fingerprint_matches_sequential(data: bytes):
    assert rolling_fingerprint(data) == _fingerprint_seq(data)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1000, max_size=5000))
def test_rolling_fingerprint_matches_sequential_long(data: bytes):
    assert rolling_fingerprint(data) == _fingerprint_seq(data)


def test_rolling_fingerprint_window_boundaries():
    # exactly at / around the 16-byte window switch-over
    for n in (0, 1, 15, 16, 17, 31, 32, 33):
        data = bytes(range(n % 256))[:n] or b""
        data = bytes((i * 37) % 256 for i in range(n))
        assert rolling_fingerprint(data) == _fingerprint_seq(data)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=300))
def test_simhash64_matches_sequential(text: str):
    assert simhash64(text) == _simhash_seq(text)


def test_fingerprint_stable_under_duplication():
    # content-defined: for a periodic document s*k (k >= 2), every
    # 16-byte window of s*2k already occurs in s*k, so doubling the
    # repetition cannot change the min-window fingerprint
    d = b"the quick brown fox jumps over the lazy dog " * 4
    assert rolling_fingerprint(d + d) == rolling_fingerprint(d)
