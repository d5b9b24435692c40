"""URL hashing — SURVEY.md Appendix A.2.

``d = sha1(canonical_url.encode())``
``url_hash64 = big-endian uint64 of d[0:8]``
``fingerprint = big-endian uint32 of d[8:12], mapped 0 -> 1`` (cuckoo
fingerprints must be non-zero; 0 marks an empty slot).

Shard assignment everywhere is ``url_hash64 % num_shards``.
"""

from __future__ import annotations

import hashlib

import numpy as np


def url_hash_fp(url: str) -> tuple[int, int]:
    """(url_hash64, fingerprint32) for one canonical URL."""
    d = hashlib.sha1(url.encode("utf-8")).digest()
    h64 = int.from_bytes(d[0:8], "big")
    fp = int.from_bytes(d[8:12], "big") or 1
    return h64, fp


def url_hash64(url: str) -> int:
    return url_hash_fp(url)[0]


def url_hash64_signed(s: str) -> int:
    """Signed-int64 view of the A.2 hash — the shared node-id space of
    the host connected-components pair (engine AND golden import THIS
    so the min-label representative rule cannot drift between them)."""
    h = url_hash64(s)
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_url_batch(urls) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-ish batch form: two numpy arrays (uint64 h64, uint32 fp).

    sha1 has no numpy kernel, so this is a tight Python loop over the
    batch; it is the map_batches body, amortized over thousands of rows
    per call.  ``urls`` is any iterable of str.
    """
    n = len(urls)
    h64 = np.empty(n, dtype=np.uint64)
    fp = np.empty(n, dtype=np.uint32)
    sha1 = hashlib.sha1
    for i, u in enumerate(urls):
        d = sha1(u.encode("utf-8")).digest()
        h64[i] = int.from_bytes(d[0:8], "big")
        fp[i] = int.from_bytes(d[8:12], "big") or 1
    return h64, fp
