"""Appendix A.1 canonicalization — table-driven + property tests."""

from __future__ import annotations

import pytest

from spider_ray.core.canon import canonicalize

CASES = [
    # (input, base, expected)
    ("https://Site00.Example/", None, "https://site00.example/"),
    ("HTTP://EXAMPLE.COM/A/B", None, "http://example.com/A/B"),
    ("https://example.com", None, "https://example.com/"),
    ("https://example.com:443/x", None, "https://example.com/x"),
    ("http://example.com:80/x", None, "http://example.com/x"),
    ("http://example.com:8080/x", None, "http://example.com:8080/x"),
    ("https://example.com/a/b#frag", None, "https://example.com/a/b"),
    ("https://example.com/a/../b", None, "https://example.com/b"),
    ("https://example.com/a/./b/.", None, "https://example.com/a/b/"),
    ("https://example.com/../x", None, "https://example.com/x"),
    ("https://example.com/p?b=2&a=1", None, "https://example.com/p?b=2&a=1"),
    ("https://example.com/p?", None, "https://example.com/p"),
    ("https://example.com/%7Euser/%41%2F", None, "https://example.com/~user/A%2F"),
    ("https://example.com/%zz", None, "https://example.com/%zz"),
    ("https://example.com/a%2fb", None, "https://example.com/a%2Fb"),
    # relative resolution
    ("../p/4", "https://h.example/p/3", "https://h.example/p/4"),
    ("../p/1", "https://h.example/", "https://h.example/p/1"),
    ("/p/9?a=1#f", "https://h.example/p/2", "https://h.example/p/9?a=1"),
    ("x", "https://h.example/a/b", "https://h.example/a/x"),
    ("//other.example/z", "https://h.example/a", "https://other.example/z"),
    # rejected schemes
    ("mailto:x@example.com", "https://h.example/", None),
    ("javascript:void(0)", "https://h.example/", None),
    ("ftp://example.com/x", None, None),
    ("", "https://h.example/p/3", "https://h.example/p/3"),
]


@pytest.mark.parametrize("url,base,want", CASES)
def test_canonicalize_cases(url, base, want):
    assert canonicalize(url, base) == want


def test_idempotent():
    for url, base, want in CASES:
        if want is not None:
            assert canonicalize(want) == want


def test_hypothesis_idempotence():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet="abcXYZ019/%.?#&=~_- :@", min_size=0, max_size=40
        )
    )
    def inner(suffix):
        c1 = canonicalize("https://host.example/" + suffix)
        if c1 is not None:
            assert canonicalize(c1) == c1

    inner()
