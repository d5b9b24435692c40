"""Live-mode fetcher pool — SURVEY.md §2.3 T3.

In test/bench mode the crawl "fetches" by joining the frontier against
the pages corpus (stages.fetch_group, J1).  This module is the LIVE
swap point: an actor-pool `map_batches` stage whose actors own an HTTP
connection pool.  The sandbox has no network, so the transport is
stubbed — construct with ``fake=True`` for a deterministic synthetic
response (used to exercise the plumbing end-to-end), or swap
``_fetch_one`` for a real ``urllib3``/``aiohttp`` call in deployment.
The actor signature, batching, per-actor session setup and output
schema (matching fetch_group's) are final.

Usage (replacing the J1 join in driver.run_round step 9):

    selected.map_batches(
        LiveFetcher,
        fn_constructor_kwargs={"fake": True, "timeout_s": 10.0},
        batch_format="pyarrow",
        batch_size=64,              # in-flight requests per actor call
        concurrency=(4, 32),        # actor pool, autoscaling
        num_cpus=0.5,               # IO-bound: half a core per actor
    )
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class LiveFetcher:
    """Actor-pool fetch stage: session/pool built once per actor
    (__init__), one batch of URLs fetched per __call__."""

    def __init__(self, fake: bool = False, timeout_s: float = 10.0,
                 user_agent: str = "spider-ray/0.1") -> None:
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self.fake = fake
        if not fake:
            # deployment: build the real connection pool once per actor,
            # e.g. urllib3.PoolManager(maxsize=64, timeout=timeout_s)
            raise NotImplementedError(
                "no network in this environment; construct with fake=True "
                "to exercise the pipeline plumbing"
            )
        self._session = None  # the (stub) connection pool handle

    def _fetch_one(self, url: str) -> tuple[bytes, int]:
        """(body, status).  Stub: deterministic synthetic page keyed on
        the url; ~1/8 of urls 404 (exercises the miss path)."""
        d = hashlib.sha1(url.encode()).digest()
        if d[0] % 8 == 0:
            return b"", 404
        body = (
            f"<html><body><h1>{url}</h1><p>fake body {d.hex()[:16]}</p>"
            f'<a href="{url}/next">n</a></body></html>'
        ).encode()
        return body, 200

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        bodies: list[bytes] = []
        found = np.zeros(len(urls), dtype=np.int8)
        n_bytes = np.zeros(len(urls), dtype=np.int64)
        for i, u in enumerate(urls):
            body, status = self._fetch_one(u)
            bodies.append(body)
            if status == 200:
                found[i] = 1
                n_bytes[i] = len(body)
        out = batch.append_column("html", pa.array(bodies, pa.binary()))
        out = out.append_column(
            "lang", pa.array([""] * len(urls), pa.string())
        )
        out = out.append_column("found", pa.array(found))
        return out.append_column("n_bytes", pa.array(n_bytes))
