"""Live-mode fetcher pool — SURVEY.md §2.3 T3.

In test/bench mode the crawl "fetches" by joining the frontier against
the pages corpus (stages.fetch_group, J1).  This module is the LIVE
swap point, wired into the driver as ``CrawlDriver(fetch_mode="live")``
(VERDICT r02 next-round #4): an actor-pool ``map_batches`` stage whose
actors own an HTTP connection pool.  Two transports behind one seam
(``_fetch_one``): ``fake=True`` is a deterministic synthetic response
(used by the end-to-end live-crawl test; the sandbox has no DNS), and
``fake=False`` is the REAL urllib3 transport — pool built once per
actor, redirects and retries disabled at the transport layer (both are
frontier/politeness decisions), oversize transfers aborted mid-stream.
The real path is exercised in-sandbox against a loopback HTTP server
(tests/test_fetch_loopback.py) with the same redirect/304/politeness
assertions as the fake path.  The actor signature, batching, per-actor
session setup, politeness protocol and output schema (fetch_group's
plus a ``timeout`` counter column) are shared by both transports.

Politeness comes from T2 state, not from the fetcher: before fetching a
domain's rows, the actor reserves a wall-clock window from that
domain's DomainGate (``reserve_fetch_slots``) — the single per-domain
authority — then sleeps until its slot opens and paces requests
``crawl_delay * politeness_scale`` apart.  Because every reservation
for one domain serializes through one actor, two fetcher actors can
never overlap the same domain, no matter how blocks were assigned.
``politeness_scale=0`` keeps the full reservation protocol but skips
the sleeps (tests); 1.0 honors robots crawl-delay in real time.

Redirect policy (3xx): SAME-host redirects are followed inline, paced
by the same reserved spacing as any other request to that host, up to
``max_redirects`` hops — the extra requests stay inside the domain's
politeness window, so the T2 single-authority invariant holds.
CROSS-host redirects are never fetched inline (the actor holds no
reservation for the target's domain); the unfollowed target is
surfaced in the ``redirect_to`` output column and the row counts as a
fetch miss.  A deployment enqueues ``redirect_to`` values back into
the frontier exactly like extracted links (canonicalize -> scope
filter -> seen anti-join -> next round), which also gives
redirect-loop protection across rounds for free via the seen set;
over-limit same-host chains land in ``redirect_to`` the same way.
The ``redirects`` column counts followed hops per row (rides the
live-mode metrics as ``fetch_redirects``).

Conditional revalidation (re-visit bandwidth): when the input batch
carries an ``etag`` column (the validator persisted from a prior
fetch's output), each non-empty value is sent as ``If-None-Match``;
a 304 sets ``not_modified = 1`` with an empty body (``found`` stays 0
— there is no new entity to extract; the caller keeps its stored
text/checksum).  Every 200 returns the CURRENT entity tag in the
output ``etag`` column for the caller to persist (pagestate is the
natural home).  A redirect chain invalidates the validator — it was
minted for the original url's entity — so hops re-fetch
unconditionally.  The fake transport's etag is content-derived
(sha1 of the body), so the 304 path is deterministic and exact.
"""

from __future__ import annotations

import hashlib
import time
from urllib.parse import urljoin, urlsplit

import numpy as np
import pyarrow as pa


class LiveFetcher:
    """Actor-pool fetch stage: session/pool built once per actor
    (__init__), one batch of URLs fetched per __call__."""

    def __init__(self, fake: bool = False, timeout_s: float = 10.0,
                 user_agent: str = "spider-ray/0.1",
                 gate_handles: list | None = None,
                 pool_size: int = 0,
                 politeness_scale: float = 1.0,
                 max_redirects: int = 5,
                 max_body_bytes: int = 8 << 20) -> None:
        self.timeout_s = timeout_s
        self.user_agent = user_agent
        self.fake = fake
        self.max_redirects = max_redirects
        # response bodies are remote-controlled: without a cap one
        # multi-GB response blows the worker heap and the object-store
        # block it lands in.  Oversize responses count as fetch misses
        # (the `oversize` column/metric), mirroring how production
        # crawlers abort a too-large transfer rather than truncate
        # (truncated html would extract WRONG text silently).  The real
        # transport enforces this mid-stream (Content-Length check
        # before the read + a chunked read cap, _fetch_one_real); the
        # fake transport is checked after the fact in __call__.
        self.max_body_bytes = max_body_bytes
        self.gates = gate_handles or []
        self.pool_size = pool_size if gate_handles else 0
        self.politeness_scale = politeness_scale
        self._session = None  # the connection pool handle (live mode)
        if not fake:
            # real transport: ONE urllib3 pool per actor (__init__, not
            # per batch).  redirect=False — redirect policy lives in
            # __call__ (politeness-window-aware), never in the
            # transport.  retries=False — a retry is a re-fetch and
            # belongs to the frontier (next round), not to a transport
            # that would silently double-hit a host inside one
            # politeness slot.
            try:
                import urllib3
            except ImportError as e:  # pragma: no cover - env guard
                raise NotImplementedError(
                    "live transport needs urllib3; construct with "
                    "fake=True to exercise the pipeline plumbing"
                ) from e
            self._session = urllib3.PoolManager(
                maxsize=8,
                timeout=urllib3.Timeout(connect=timeout_s, read=timeout_s),
                retries=False,
                headers={"User-Agent": user_agent},
            )

    def _fetch_one(self, url: str,
                   etag: str = "") -> tuple[bytes, int, str, str]:
        """(body, status, location, etag) — dispatch to the fake or the
        real transport.  Contract shared by both: body is non-empty only
        for a 200 whose entity was fully received; status 599 means the
        transport timed out; status 0 means a connection-level failure;
        a body LONGER than max_body_bytes signals an aborted oversize
        transfer (the caller discards it and counts `oversize`)."""
        if self.fake:
            return self._fetch_one_fake(url, etag)
        return self._fetch_one_real(url, etag)

    def _fetch_one_real(self, url: str,
                        etag: str = "") -> tuple[bytes, int, str, str]:
        """urllib3 GET with streaming body read.  The oversize cap is
        enforced BEFORE buffering: a Content-Length beyond the cap
        aborts without reading the body at all, and a response that
        streams past the cap is cut off mid-transfer (connection
        dropped, never reused) — a truncated body must never reach the
        extractor, so both paths return a len == cap+1 placeholder that
        trips the caller's oversize check."""
        import urllib3

        headers = {"If-None-Match": etag} if etag else None
        try:
            r = self._session.request(
                "GET", url, headers=headers, redirect=False,
                preload_content=False,
            )
        except urllib3.exceptions.TimeoutError:
            return b"", 599, "", ""
        except (urllib3.exceptions.HTTPError, OSError):
            return b"", 0, "", ""
        cap = self.max_body_bytes
        try:
            status = int(r.status)
            loc = r.headers.get("Location") or ""
            et = r.headers.get("ETag") or ""
            if status != 200:
                # non-entity responses: the body (error page) is never
                # extracted — drop the connection rather than drain an
                # attacker-sized body to reuse a socket
                r.close()
                return b"", status, loc, et
            cl = r.headers.get("Content-Length")
            if cl is not None and cl.isdigit() and int(cl) > cap:
                r.close()
                return bytes(cap + 1), status, loc, et
            chunks: list[bytes] = []
            total = 0
            while True:
                chunk = r.read(65536)
                if not chunk:
                    break
                total += len(chunk)
                chunks.append(chunk)
                if total > cap:
                    r.close()  # mid-stream abort; socket is dirty
                    return bytes(cap + 1), status, loc, et
            r.release_conn()  # fully read: socket is clean for reuse
            return b"".join(chunks), status, loc, et
        except urllib3.exceptions.TimeoutError:
            r.close()
            return b"", 599, "", ""
        except (urllib3.exceptions.HTTPError, OSError):
            r.close()
            return b"", 0, "", ""

    def _fetch_one_fake(self, url: str,
                        etag: str = "") -> tuple[bytes, int, str, str]:
        """(body, status, location, etag).  Stub: deterministic
        synthetic page keyed on the url; ~1/8 of urls 404, ~1/32 time
        out (status 599), ~1/16 301 to a same-host child path and
        ~1/32 301 off-host, so the miss, timeout and both redirect
        paths are all exercised.  ``/rloop`` urls redirect to
        themselves (the over-limit guard's deterministic test case).
        A non-empty ``etag`` plays If-None-Match: the fake entity tag
        is content-derived, so a matching validator returns 304."""
        d = hashlib.sha1(url.encode()).digest()
        if "/bigbody" in url:  # deterministic oversize-response case
            return b"<html>" + b"x" * (64 << 20), 200, "", ""
        if "/rloop" in url:
            return b"", 301, url, ""
        if d[0] % 32 == 1:
            return b"", 599, "", ""  # simulated timeout
        if d[0] % 8 == 0:
            return b"", 404, "", ""
        if d[0] % 16 == 6:
            # same-host hop; relative Location exercises the urljoin
            return b"", 301, urlsplit(url).path.rstrip("/") + "/r", ""
        if d[0] % 32 == 12:
            return b"", 301, f"http://offsite-{d.hex()[:4]}.example/x", ""
        body = (
            f"<html><body><h1>{url}</h1><p>fake body {d.hex()[:16]}</p>"
            f'<a href="{url}/next">n</a></body></html>'
        ).encode()
        cur_etag = hashlib.sha1(body).hexdigest()
        if etag and etag == cur_etag:
            return b"", 304, "", cur_etag
        return body, 200, "", cur_etag

    def _reserve(self, domains: list[str],
                 counts: list[int]) -> dict[str, tuple[float, float]]:
        """Reserve politeness windows from the T2 gates: one RPC per
        gate shard, each returning (start_wallclock, spacing_s) per
        domain.  No gates configured => no pacing (plumbing-only use)."""
        if not self.gates:
            return {d: (0.0, 0.0) for d in domains}
        import ray

        from spider_ray.crawl.state import gate_shard

        by_gate: dict[int, tuple[list, list]] = {}
        for d, c in zip(domains, counts):
            g = gate_shard(d, self.pool_size)
            by_gate.setdefault(g, ([], []))[0].append(d)
            by_gate[g][1].append(int(c))
        futs = {
            g: self.gates[g].reserve_fetch_slots.remote(
                doms, cnts, self.politeness_scale
            )
            for g, (doms, cnts) in by_gate.items()
        }
        out: dict[str, tuple[float, float]] = {}
        for g, fut in futs.items():
            doms = by_gate[g][0]
            for d, slot in zip(doms, ray.get(fut)):
                out[d] = slot
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        n = len(urls)
        if "domain" in batch.schema.names:
            domains = batch.column("domain").to_pylist()
        else:
            domains = [""] * n
        # fetch order: grouped by domain so each domain's window is one
        # contiguous paced run
        order = sorted(range(n), key=lambda i: (domains[i], urls[i]))
        uniq: dict[str, int] = {}
        for i in order:
            uniq[domains[i]] = uniq.get(domains[i], 0) + 1
        slots = self._reserve(list(uniq), list(uniq.values()))

        if "etag" in batch.schema.names:
            etags_in = batch.column("etag").to_pylist()
            etags_in = ["" if e is None else e for e in etags_in]
        else:
            etags_in = [""] * n
        bodies: list[bytes] = [b""] * n
        found = np.zeros(n, dtype=np.int8)
        timeout = np.zeros(n, dtype=np.int8)
        n_bytes = np.zeros(n, dtype=np.int64)
        redirects = np.zeros(n, dtype=np.int32)
        redirect_to: list[str] = [""] * n
        not_modified = np.zeros(n, dtype=np.int8)
        oversize = np.zeros(n, dtype=np.int8)
        etags_out: list[str] = [""] * n
        prev_domain = None
        for i in order:
            d = domains[i]
            start, spacing = slots.get(d, (0.0, 0.0))
            if d != prev_domain:
                wait = start - time.time()
                if wait > 0:
                    time.sleep(wait)
                prev_domain = d
            elif spacing > 0:
                time.sleep(spacing)
            cur = urls[i]
            body, status, loc, et = self._fetch_one(cur, etags_in[i])
            # follow same-host 3xx inline (paced inside this domain's
            # reserved window); surface anything else in redirect_to
            while 300 <= status < 400 and status != 304:
                target = urljoin(cur, loc) if loc else ""
                if (not target
                        or urlsplit(target).netloc != urlsplit(cur).netloc
                        or redirects[i] >= self.max_redirects):
                    redirect_to[i] = target
                    break
                if spacing > 0:
                    time.sleep(spacing)
                redirects[i] += 1
                cur = target
                # the validator belonged to the ORIGINAL url's entity
                body, status, loc, et = self._fetch_one(cur)
            if status == 200 and len(body) > self.max_body_bytes:
                oversize[i] = 1
                body, status = b"", 0  # abort, keep nothing
            bodies[i] = body
            etags_out[i] = et
            if status == 200:
                found[i] = 1
                n_bytes[i] = len(body)
            elif status == 304:
                not_modified[i] = 1
            elif status == 599:
                timeout[i] = 1
        out = batch
        if "etag" in out.schema.names:
            out = out.drop_columns(["etag"])  # replaced by the fresh tag
        out = out.append_column("html", pa.array(bodies, pa.binary()))
        out = out.append_column("lang", pa.array([""] * n, pa.string()))
        out = out.append_column("found", pa.array(found))
        out = out.append_column("n_bytes", pa.array(n_bytes))
        out = out.append_column("timeout", pa.array(timeout))
        out = out.append_column("redirects", pa.array(redirects))
        out = out.append_column(
            "redirect_to", pa.array(redirect_to, pa.string())
        )
        out = out.append_column("not_modified", pa.array(not_modified))
        out = out.append_column("oversize", pa.array(oversize))
        return out.append_column("etag", pa.array(etags_out, pa.string()))
