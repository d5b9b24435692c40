"""Deterministic lorem generator — FIXTURES.md §1.

Words are drawn from a fixed 256-word list via sha1-seeded indices: no
``random`` module, no wall clock (SURVEY.md §4.5).  The seed is the
sha1 of the page URL, expanded by hashing ``seed || counter``.
"""

from __future__ import annotations

import hashlib

# 256 fixed words: 64 stems x 4 deterministic suffixes
_STEMS = [
    "lorem", "ipsum", "dolor", "amet", "consectetur", "adipiscing", "elit",
    "tempor", "incididunt", "labore", "dolore", "magna", "aliqua", "enim",
    "minim", "veniam", "quis", "nostrud", "exercitation", "ullamco",
    "laboris", "nisi", "aliquip", "commodo", "consequat", "duis", "aute",
    "irure", "reprehenderit", "voluptate", "velit", "esse", "cillum", "fugiat",
    "nulla", "pariatur", "excepteur", "sint", "occaecat", "cupidatat",
    "proident", "sunt", "culpa", "officia", "deserunt", "mollit", "anim",
    "laborum", "crawl", "spider", "frontier", "domain", "politeness",
    "robots", "parse", "fetch", "queue", "page", "link", "depth", "round",
    "shard", "batch", "arrow",
]
_SUFFIXES = ["", "s", "um", "is"]
WORDS = [s + suf for s in _STEMS for suf in _SUFFIXES][:256]
assert len(WORDS) == 256


def lorem(seed: bytes, n_words: int) -> str:
    """``n_words`` words chosen by sha1(seed || block_counter) expansion."""
    out: list[str] = []
    block = 0
    while len(out) < n_words:
        d = hashlib.sha1(seed + block.to_bytes(4, "big")).digest()
        for b in d:
            if len(out) >= n_words:
                break
            out.append(WORDS[b])
        block += 1
    return " ".join(out)
