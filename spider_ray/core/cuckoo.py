"""Deterministic cuckoo filter — SURVEY.md Appendix A.4 / §2.3 T1.

The URL-seen set (the reference's Storage-existence check, SURVEY.md
§1.1) is sharded across ``num_shards`` of these filters; each shard
lives in a long-lived named Ray actor (spider_ray.crawl.state) and is
snapshotted to ``seen/shard-*.npz`` every round.

Pinned construction (changing any constant invalidates golden
snapshots):

  * bucket size 4, ``n_buckets = next_pow2(ceil(capacity / 4))``;
  * 32-bit fingerprints from hashing.url_hash_fp (never 0; 0 = empty);
  * ``i1 = url_hash64 % n_buckets``;
  * ``i2 = i1 XOR (BE_uint64(sha1(fp.to_bytes(4,'big'))[0:8]) % n_buckets)``
    (n_buckets is a power of two, so i2 < n_buckets and alt(i2) == i1);
  * kick eviction: at attempt t the evicted slot is ``(fp + t) % 4``
    where fp is the fingerprint being placed — fully deterministic, no
    RNG;
  * after 500 failed kicks the homeless fingerprint goes to a small
    overflow stash of (bucket_index, fp) pairs (a filter cannot be
    grown in place — ``i1`` depends on ``n_buckets`` — so capacity must
    be sized up front; the stash keeps correctness if sizing was wrong
    and its occupancy is exported as a health metric);
  * byte-stable snapshots require inserts applied in ascending ``seq``
    per shard (the crawl driver guarantees this at the commit barrier,
    SURVEY.md §4.5).

False-positive math: p ~= 2*4/2^32 per lookup => ~1.9e-9; at 10^10-URL
scale that is ~18 expected false-drops total, at test scale 0.  Test
mode keeps an exact set sidecar and asserts zero false hits
(tests/test_core_cuckoo.py, tests/test_crawl_golden.py).
"""

from __future__ import annotations

import hashlib

import numpy as np

BUCKET_SIZE = 4
MAX_KICKS = 500


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _alt_offset(fp: int) -> int:
    d = hashlib.sha1(int(fp).to_bytes(4, "big")).digest()
    return int.from_bytes(d[0:8], "big")


class CuckooFilter:
    """Single-shard deterministic cuckoo filter over 32-bit fingerprints."""

    def __init__(self, capacity: int = 1 << 16) -> None:
        self.n_buckets = max(1, _next_pow2((capacity + BUCKET_SIZE - 1) // BUCKET_SIZE))
        self.table = np.zeros((self.n_buckets, BUCKET_SIZE), dtype=np.uint32)
        self.count = 0
        self.stash: set[tuple[int, int]] = set()  # (bucket_index, fp)
        # alt-offset memo: sha1 per distinct fingerprint, not per operation
        self._alt_cache: dict[int, int] = {}

    # -- index math -----------------------------------------------------
    def _i2(self, i1: int, fp: int) -> int:
        off = self._alt_cache.get(fp)
        if off is None:
            off = _alt_offset(fp)
            self._alt_cache[fp] = off
        return i1 ^ (off % self.n_buckets)

    # -- membership -----------------------------------------------------
    def contains(self, h64: int, fp: int) -> bool:
        fp = int(fp)
        i1 = int(h64) % self.n_buckets
        if fp in self.table[i1]:
            return True
        i2 = self._i2(i1, fp)
        if fp in self.table[i2]:
            return True
        if self.stash and ((i1, fp) in self.stash or (i2, fp) in self.stash):
            return True
        return False

    def contains_batch(self, h64s, fps) -> np.ndarray:
        """Vector membership check; h64s/fps are integer arrays.

        Bucket compares are numpy-vectorized (the actor serves every
        lookup of its shard, so this loop is the hot path); only the
        sha1 alt-offset for first-bucket misses stays per-row."""
        h = np.asarray(h64s, dtype=np.uint64)
        fp = np.asarray(fps, dtype=np.uint32)
        i1 = (h % np.uint64(self.n_buckets)).astype(np.int64)
        out = (self.table[i1] == fp[:, None]).any(axis=1)
        miss = np.flatnonzero(~out)
        if len(miss):
            nb = self.n_buckets
            i2 = np.fromiter(
                (self._i2(int(i1[k]), int(fp[k])) for k in miss),
                np.int64,
                len(miss),
            )
            out[miss] = (self.table[i2] == fp[miss][:, None]).any(axis=1)
            if self.stash:
                still = miss[~out[miss]]
                for k in still:
                    a, b = (int(i1[k]), int(fp[k])), (int(self._i2(int(i1[k]), int(fp[k]))), int(fp[k]))
                    if a in self.stash or b in self.stash:
                        out[k] = True
        return out

    # -- insertion ------------------------------------------------------
    def add(self, h64: int, fp: int) -> None:
        """Insert; no-op if the fingerprint already sits in either bucket
        (keeps re-delivered batches idempotent, SURVEY.md §2.9)."""
        fp = int(fp)
        i1 = int(h64) % self.n_buckets
        i2 = self._i2(i1, fp)
        tbl = self.table
        if fp in tbl[i1] or fp in tbl[i2]:
            return
        if self.stash and ((i1, fp) in self.stash or (i2, fp) in self.stash):
            return
        for idx in (i1, i2):
            row = tbl[idx]
            empties = np.flatnonzero(row == 0)
            if empties.size:
                row[empties[0]] = fp
                self.count += 1
                return
        # deterministic kick loop
        cur_fp, cur_idx = fp, i2
        for t in range(MAX_KICKS):
            slot = (cur_fp + t) % BUCKET_SIZE
            evicted = int(tbl[cur_idx, slot])
            tbl[cur_idx, slot] = cur_fp
            cur_fp = evicted
            cur_idx = self._i2(cur_idx, cur_fp)
            row = tbl[cur_idx]
            empties = np.flatnonzero(row == 0)
            if empties.size:
                row[empties[0]] = cur_fp
                self.count += 1
                return
        # filter saturated: park the homeless fingerprint in the stash
        self.stash.add((cur_idx, cur_fp))
        self.count += 1

    def add_batch(self, h64s, fps) -> None:
        for k in range(len(h64s)):
            self.add(int(h64s[k]), int(fps[k]))

    # -- persistence ----------------------------------------------------
    def save(self, path: str) -> None:
        stash = np.array(sorted(self.stash), dtype=np.uint64).reshape(-1, 2)
        np.savez_compressed(
            path, table=self.table, count=np.int64(self.count), stash=stash
        )

    @classmethod
    def load(cls, path: str) -> "CuckooFilter":
        with np.load(path) as z:
            return cls._from_npz(z)

    @classmethod
    def _from_npz(cls, z) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.table = z["table"].copy()
        f.n_buckets = f.table.shape[0]
        f.count = int(z["count"])
        f.stash = {(int(a), int(b)) for a, b in z["stash"]}
        f._alt_cache = {}
        return f

    def to_bytes(self) -> bytes:
        """Snapshot as one blob (same npz payload as save()) — the unit
        a KV/SQL StateStore backend persists per shard."""
        import io

        buf = io.BytesIO()
        stash = np.array(sorted(self.stash), dtype=np.uint64).reshape(-1, 2)
        np.savez_compressed(
            buf, table=self.table, count=np.int64(self.count), stash=stash
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        import io

        with np.load(io.BytesIO(blob)) as z:
            return cls._from_npz(z)
