"""Pluggable seen-set snapshot backends — SURVEY.md §2.10 / §1.1.

The reference exposed a ``Storage`` Go interface with two swappable
backends (in-memory and MongoDB) so the same crawl could persist its
seen-pages state to either.  This module is that seam for the Ray
engine's T1 state: ``CuckooShard.snapshot()/load()`` delegate to a
``StateStore`` selected by ``CrawlConfig.state_backend``, so the
persistence layer swaps without touching actor logic, checkpoint
protocol, or resume semantics.

Two backends ship:

* ``file`` (default) — one ``shard-NN.npz`` (+ ``.exact.npy`` sidecar
  in test mode) per shard per round dir; the layout every golden
  checkpoint in the test suite uses.
* ``sqlite`` — one ``seen.sqlite3`` database per round dir, table
  ``shards(shard_id, filter, exact)``, the cuckoo table stored as the
  same npz blob ``CuckooFilter.to_bytes()`` produces.  Stands in for
  the reference's external-DB mode: state outlives the actors in a
  queryable store, written transactionally (INSERT OR REPLACE keyed on
  shard_id is idempotent under Ray task retries).  Each shard actor
  opens its own short-lived connection; a 30 s busy timeout absorbs
  the once-per-round write overlap across shards.

Resume byte-identity holds for both: the LOADED state is what matters
(the determinism barrier orders inserts by (seq, h64) before any
snapshot), and both backends round-trip the identical blob —
tests/test_state_backend.py kills a sqlite-backed crawl mid-run and
proves the resumed outputs byte-equal the file-backed baseline.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np

from spider_ray.core.cuckoo import CuckooFilter


class FileStateStore:
    """npz-per-shard layout (the original, default backend)."""

    name = "file"

    def save_shard(self, dirpath: str, shard_id: int,
                   filt: CuckooFilter, exact: set[int] | None) -> str:
        path = os.path.join(dirpath, f"shard-{shard_id:02d}.npz")
        filt.save(path)
        if exact is not None:
            np.save(
                os.path.join(dirpath, f"shard-{shard_id:02d}.exact.npy"),
                np.array(sorted(exact), dtype=np.uint64),
            )
        return path

    def load_shard(self, dirpath: str, shard_id: int,
                   want_exact: bool) -> tuple[CuckooFilter, set[int] | None]:
        path = os.path.join(dirpath, f"shard-{shard_id:02d}.npz")
        filt = CuckooFilter.load(path)
        exact = None
        if want_exact:
            ep = os.path.join(dirpath, f"shard-{shard_id:02d}.exact.npy")
            if os.path.exists(ep):
                exact = set(np.load(ep).tolist())
        return filt, exact


class SqliteStateStore:
    """One SQLite database per snapshot dir; shards are rows."""

    name = "sqlite"
    _DB = "seen.sqlite3"

    def _conn(self, dirpath: str) -> sqlite3.Connection:
        con = sqlite3.connect(
            os.path.join(dirpath, self._DB), timeout=30.0
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS shards ("
            "shard_id INTEGER PRIMARY KEY, filter BLOB NOT NULL, "
            "exact BLOB)"
        )
        return con

    def save_shard(self, dirpath: str, shard_id: int,
                   filt: CuckooFilter, exact: set[int] | None) -> str:
        blob = filt.to_bytes()
        exact_blob = (
            np.array(sorted(exact), dtype=np.uint64).tobytes()
            if exact is not None else None
        )
        with self._conn(dirpath) as con:
            con.execute(
                "INSERT OR REPLACE INTO shards VALUES (?, ?, ?)",
                (shard_id, blob, exact_blob),
            )
        con.close()
        return os.path.join(dirpath, self._DB)

    def load_shard(self, dirpath: str, shard_id: int,
                   want_exact: bool) -> tuple[CuckooFilter, set[int] | None]:
        con = self._conn(dirpath)
        try:
            row = con.execute(
                "SELECT filter, exact FROM shards WHERE shard_id = ?",
                (shard_id,),
            ).fetchone()
        finally:
            con.close()
        if row is None:
            raise FileNotFoundError(
                f"shard {shard_id} not in {dirpath}/{self._DB}"
            )
        filt = CuckooFilter.from_bytes(row[0])
        exact = None
        if want_exact and row[1] is not None:
            exact = set(np.frombuffer(row[1], dtype=np.uint64).tolist())
        return filt, exact


_STORES = {"file": FileStateStore, "sqlite": SqliteStateStore}


def get_state_store(name: str):
    try:
        return _STORES[name]()
    except KeyError:
        raise ValueError(
            f"unknown state_backend {name!r}; one of {sorted(_STORES)}"
        ) from None
