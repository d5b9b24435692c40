"""Long-lived singleton state actors — SURVEY.md §2.3 T1/T2.

These are the ONLY mutable state in the engine; every other stage is a
pure function over Arrow batches.  Both actor classes run with
``num_cpus=0``: they are memory-bound lookup servers doing micro-work
per RPC, and reserving CPU slices for them starves the real compute
stages (and deadlocks small sessions when two drivers coexist, e.g.
the resume test).  They are deliberately *not*
map_batches actor pools: a pool is N anonymous replicas, while the
URL-seen shard for ``url_hash64 % num_shards == i`` must be a single
authority across all stages and rounds (SURVEY.md §4.2 "Singleton
state").  Stage functions hold plain actor handles (serialized into
their closures) and fan batched RPCs out per shard.

Determinism: membership checks are read-only; inserts are staged during
the round (idempotent by url_hash64) and applied at the driver's commit
barrier sorted by (seq, url_hash64), so snapshots are byte-stable
regardless of batch arrival order (SURVEY.md §4.5).
"""

from __future__ import annotations

import os

import numpy as np
import ray

from spider_ray.core.config import CrawlConfig
from spider_ray.core.cuckoo import CuckooFilter
from spider_ray.core.seqs import ROUND_SECONDS


@ray.remote(num_cpus=0)
class CuckooShard:
    """One shard of the URL-seen set (the reference's Storage existence
    check, SURVEY.md §1.1) — a deterministic cuckoo filter plus, in test
    mode, an exact set sidecar asserting zero false-positive hits."""

    def __init__(self, shard_id: int, capacity: int, exact_mode: bool = True,
                 backend: str = "file"):
        from spider_ray.crawl.storage import get_state_store

        self.shard_id = shard_id
        self.capacity = capacity
        self.filter = CuckooFilter(capacity)
        self.exact: set[int] | None = set() if exact_mode else None
        self.pending: dict[int, tuple[int, int]] = {}  # h64 -> (seq, fp)
        self.false_hits = 0
        # pluggable snapshot target (the reference's Storage-interface
        # swap, §2.10): "file" npz layout or "sqlite" external-DB shape
        self.store = get_state_store(backend)

    def reset(self) -> None:
        """Back to the empty post-__init__ state.  A fresh crawl that
        re-attaches to pre-existing DETACHED actors (namespace mode)
        must not inherit a prior crawl's seen-set (ADVICE r02)."""
        self.filter = CuckooFilter(self.capacity)
        if self.exact is not None:
            self.exact = set()
        self.pending.clear()
        self.false_hits = 0

    def check_batch(self, h64s: np.ndarray, fps: np.ndarray) -> np.ndarray:
        out = self.filter.contains_batch(h64s, fps)
        if self.exact is not None:
            for k in range(len(h64s)):
                if out[k] and int(h64s[k]) not in self.exact:
                    self.false_hits += 1
        return out

    def stage_batch(self, seqs: np.ndarray, h64s: np.ndarray, fps: np.ndarray) -> int:
        """Buffer inserts; idempotent under task re-delivery (keyed h64)."""
        for k in range(len(h64s)):
            self.pending[int(h64s[k])] = (int(seqs[k]), int(fps[k]))
        return len(self.pending)

    def commit_pending(self) -> int:
        """Apply staged inserts in (seq, h64) order — the determinism
        barrier of SURVEY.md §4.5."""
        items = sorted(
            ((seq, h64, fp) for h64, (seq, fp) in self.pending.items())
        )
        for seq, h64, fp in items:
            self.filter.add(h64, fp)
            if self.exact is not None:
                self.exact.add(h64)
        n = len(items)
        self.pending.clear()
        return n

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "items": self.filter.count,
            "stash": len(self.filter.stash),
            "false_hits": self.false_hits,
        }

    def snapshot(self, dirpath: str) -> str:
        return self.store.save_shard(
            dirpath, self.shard_id, self.filter, self.exact
        )

    def load(self, dirpath: str) -> int:
        self.filter, exact = self.store.load_shard(
            dirpath, self.shard_id, want_exact=self.exact is not None
        )
        if exact is not None:
            self.exact = exact
        self.pending.clear()
        return self.filter.count


@ray.remote(num_cpus=0)
class DomainGate:
    """Per-domain politeness/robots state for domains with
    ``hash(domain) % P == gate_id`` (the reference's Domain runtime
    state, SURVEY.md §1.1).  Robots bodies are parsed once per host and
    cached for the life of the crawl; fetch totals accumulate at each
    round barrier and feed the exported per-domain rate."""

    def __init__(self, gate_id: int, cfg: CrawlConfig):
        self.gate_id = gate_id
        self.cfg = cfg
        self.fetched_total: dict[str, int] = {}
        self.rounds_seen = 0
        # round -> {domain: count}; folded into fetched_total at the
        # driver's round barrier.  Overwrite (not add) per (round,
        # domain) so re-delivered pushes are idempotent — required by
        # the distributed gate-push path, where counts arrive from
        # map_groups tasks that Ray may retry.
        self.staged: dict[int, dict[str, int]] = {}
        # live-mode politeness: next allowed wall-clock fetch time per
        # domain (reserve_fetch_slots); never consulted in corpus mode
        # and never part of the correctness path (A.9: budgets are
        # virtual-time, wall-clock pacing is an execution concern)
        self.next_wallclock: dict[str, float] = {}

    def reset(self) -> None:
        """Back to the empty post-__init__ state (fresh crawl onto
        re-attached detached actors — ADVICE r02)."""
        self.fetched_total.clear()
        self.rounds_seen = 0
        self.staged.clear()
        self.next_wallclock.clear()

    def reserve_fetch_slots(
        self, domains: list[str], counts: list[int], scale: float = 1.0
    ) -> list[tuple[float, float]]:
        """Live-mode politeness windows (T3 <- T2).  For each (domain,
        n): returns (start_wallclock, spacing_s) where start is the
        earliest time this caller may hit the domain and spacing is the
        per-request gap; the domain's next window begins after all n
        paced requests.  All reservations for a domain serialize
        through this one actor, so concurrent fetcher actors can never
        overlap a domain."""
        import time as _time

        now = _time.time()
        out = []
        for d, n in zip(domains, counts):
            spacing = self.cfg.crawl_delay(d) * scale
            start = max(now, self.next_wallclock.get(d, 0.0))
            self.next_wallclock[d] = start + max(0, int(n)) * spacing
            out.append((start, spacing))
        return out

    def check_batch(self, hosts: list[str], path_queries: list[str]) -> np.ndarray:
        cfg = self.cfg
        out = np.empty(len(hosts), dtype=bool)
        for k, (h, pq) in enumerate(zip(hosts, path_queries)):
            out[k] = cfg.robots_rules(h).allowed(pq)
        return out

    def note_fetched(self, domains: list[str], counts: list[int], round_no: int) -> None:
        """Stage this round's per-domain fetch counts (idempotent:
        the same (round, domain) overwrites).  Counts become visible in
        export_state only after commit_fetched at the round barrier."""
        staged = self.staged.setdefault(round_no, {})
        for d, c in zip(domains, counts):
            staged[d] = int(c)

    def commit_fetched(self) -> int:
        """Fold staged rounds into the running totals (round barrier)."""
        n = 0
        for rnd in sorted(self.staged):
            for d, c in self.staged[rnd].items():
                self.fetched_total[d] = self.fetched_total.get(d, 0) + c
                n += 1
            self.rounds_seen = max(self.rounds_seen, rnd)
        self.staged.clear()
        return n

    def export_state(self) -> dict:
        """Columns for the domains.parquet snapshot (schemas.DOMAINS)."""
        doms = sorted(self.fetched_total)
        elapsed = max(1.0, self.rounds_seen * ROUND_SECONDS)
        return {
            "domain": doms,
            "crawl_delay_s": [self.cfg.crawl_delay(d) for d in doms],
            "budget": [self.cfg.budget(d) for d in doms],
            "fetched_total": [self.fetched_total[d] for d in doms],
            "rate": [self.fetched_total[d] / elapsed for d in doms],
        }

    def load_state(self, domains: list[str], fetched: list[int], round_no: int) -> None:
        """Full state replacement from a checkpoint.  Clears any counts
        staged by a crashed round — matters when a resuming driver
        re-attaches to live detached actors rather than fresh ones."""
        self.fetched_total = dict(zip(domains, map(int, fetched)))
        self.rounds_seen = round_no
        self.staged.clear()


def gate_shard(domain: str, pool_size: int) -> int:
    """Deterministic gate assignment (never Python's salted hash())."""
    import hashlib

    return int.from_bytes(hashlib.sha1(domain.encode()).digest()[:4], "big") % pool_size
