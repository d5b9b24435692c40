"""REAL-transport fetcher over loopback HTTP (VERDICT r04 item 2).

tests/test_fetch_live.py proves the live-mode *semantics* on the fake
transport; this file drives the urllib3 transport (`fake=False`)
against a real in-process HTTP server on 127.0.0.1 — actual sockets,
actual headers — with the same redirect / 304 / oversize / timeout /
politeness assertions, plus a full end-to-end live crawl whose every
byte travels over loopback HTTP.
"""

from __future__ import annotations

import hashlib
import http.server
import threading
import time

import pyarrow as pa
import pytest

CAP = 4096  # small oversize cap so the big-body cases stay fast


def _page_body(path: str) -> bytes:
    n = int(path.rsplit("/", 1)[1])
    return (
        f"<html><body><h1>{path}</h1><p>loopback body {n}</p>"
        f'<a href="/p/{2 * n + 1}">a</a><a href="/p/{2 * n + 2}">b</a>'
        f"</body></html>"
    ).encode()


class _Handler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # noqa: D102 - silence test output
        pass

    def _send(self, status: int, body: bytes = b"", headers: dict | None = None):
        self.send_header  # noqa: B018 - (keep linters quiet about style)
        self.send_response(status)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def do_GET(self):  # noqa: N802 - http.server API
        p = self.path
        if p.startswith("/p/"):
            body = _page_body(p)
            tag = hashlib.sha1(body).hexdigest()
            if self.headers.get("If-None-Match") == tag:
                self._send(304, b"", {"ETag": tag})
                return
            self._send(200, body, {"ETag": tag})
        elif p == "/redir":
            self._send(301, b"", {"Location": "/p/1"})  # relative target
        elif p == "/offsite":
            self._send(301, b"", {"Location": "http://offsite.example/x"})
        elif p == "/loop":
            self._send(301, b"", {"Location": "/loop"})
        elif p == "/bigcl":
            # declared oversize: huge Content-Length, never fully sent —
            # a compliant client must abort BEFORE reading the body
            self.send_response(200)
            self.send_header("Content-Length", str(1 << 30))
            self.end_headers()
            self.wfile.write(b"x" * 100)
            self.close_connection = True
        elif p == "/bigstream":
            # streamed oversize: no Content-Length, body delimited by
            # connection close, CAP*4 bytes — the client must cut the
            # transfer mid-stream at its read cap
            self.send_response(200)
            self.send_header("Connection", "close")
            self.end_headers()
            for _ in range(4):
                self.wfile.write(b"y" * CAP)
            self.close_connection = True
        elif p == "/slow":
            time.sleep(2.0)
            self._send(200, b"<html>late</html>")
        else:
            self._send(404, b"nothing here")


@pytest.fixture(scope="module")
def loopback_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{port}"
    srv.shutdown()


def _fetcher(**kw):
    from spider_ray.crawl.fetcher import LiveFetcher

    kw.setdefault("politeness_scale", 0.0)
    kw.setdefault("max_body_bytes", CAP)
    kw.setdefault("timeout_s", 0.5)
    return LiveFetcher(fake=False, **kw)


def _batch(host: str, paths: list[str], etags: list[str] | None = None):
    cols = {
        "url": pa.array([f"http://{host}{p}" for p in paths], pa.string()),
        "domain": pa.array([host] * len(paths), pa.string()),
    }
    if etags is not None:
        cols["etag"] = pa.array(etags, pa.string())
    return pa.table(cols)


def test_loopback_200_body_and_etag(loopback_server):
    f = _fetcher()
    out = f(_batch(loopback_server, ["/p/0"]))
    assert out.column("found")[0].as_py() == 1
    body = out.column("html")[0].as_py()
    assert b"loopback body 0" in body
    assert out.column("n_bytes")[0].as_py() == len(body)
    assert out.column("etag")[0].as_py() == hashlib.sha1(body).hexdigest()


def test_loopback_304_roundtrip(loopback_server):
    f = _fetcher()
    first = f(_batch(loopback_server, ["/p/0"]))
    tag = first.column("etag")[0].as_py()
    again = f(_batch(loopback_server, ["/p/0"], etags=[tag]))
    assert again.column("not_modified")[0].as_py() == 1
    assert again.column("found")[0].as_py() == 0
    assert again.column("html")[0].as_py() == b""
    stale = f(_batch(loopback_server, ["/p/0"], etags=["stale"]))
    assert stale.column("not_modified")[0].as_py() == 0
    assert stale.column("found")[0].as_py() == 1
    assert stale.column("etag")[0].as_py() == tag


def test_loopback_redirects(loopback_server):
    f = _fetcher()
    out = f(_batch(loopback_server, ["/redir", "/offsite", "/loop"]))
    rows = {
        out.column("url")[i].as_py().rsplit("/", 1)[-1]: i
        for i in range(3)
    }
    i = rows["redir"]  # same-host: followed to the target's body
    assert out.column("found")[i].as_py() == 1
    assert out.column("redirects")[i].as_py() == 1
    assert b"loopback body 1" in out.column("html")[i].as_py()
    assert out.column("redirect_to")[i].as_py() == ""
    i = rows["offsite"]  # cross-host: never fetched, target surfaced
    assert out.column("found")[i].as_py() == 0
    assert out.column("redirect_to")[i].as_py() == "http://offsite.example/x"
    i = rows["loop"]  # self-loop: bounded by max_redirects
    assert out.column("found")[i].as_py() == 0
    assert out.column("redirects")[i].as_py() == 5
    assert out.column("redirect_to")[i].as_py().endswith("/loop")


def test_loopback_404_and_timeout(loopback_server):
    f = _fetcher()
    out = f(_batch(loopback_server, ["/missing", "/slow"]))
    rows = {
        out.column("url")[i].as_py().rsplit("/", 1)[-1]: i for i in range(2)
    }
    assert out.column("found")[rows["missing"]].as_py() == 0
    assert out.column("timeout")[rows["missing"]].as_py() == 0
    assert out.column("found")[rows["slow"]].as_py() == 0
    assert out.column("timeout")[rows["slow"]].as_py() == 1


def test_loopback_oversize_aborted_not_truncated(loopback_server):
    """Both oversize shapes — declared Content-Length and an unbounded
    stream — abort: oversize=1, no body kept (a truncated body must
    never reach the extractor)."""
    f = _fetcher()
    out = f(_batch(loopback_server, ["/bigcl", "/bigstream"]))
    for i in range(2):
        assert out.column("oversize")[i].as_py() == 1, out.column("url")[i]
        assert out.column("found")[i].as_py() == 0
        assert out.column("html")[i].as_py() == b""
        assert out.column("n_bytes")[i].as_py() == 0


def test_loopback_politeness_paced_by_real_gates(
    ray_session, micro_fixture, loopback_server
):
    """The REAL transport under the REAL T2 reservation protocol: one
    domain, several urls, a non-zero politeness scale — the batch must
    take at least (n-1) * spacing wall-clock, and consecutive requests
    for the domain are serialized through its gate."""
    import ray

    from spider_ray.core.config import load_crawl_config
    from spider_ray.crawl.state import DomainGate

    cfg = load_crawl_config(micro_fixture)
    gate = DomainGate.remote(0, cfg)
    try:
        scale = 0.05
        delay = cfg.crawl_delay(loopback_server)  # default 1.0 s
        f = _fetcher(gate_handles=[gate], pool_size=1,
                     politeness_scale=scale)
        paths = [f"/p/{i}" for i in range(4)]
        t0 = time.monotonic()
        out = f(_batch(loopback_server, paths))
        elapsed = time.monotonic() - t0
        assert out.column("found").to_pylist() == [1, 1, 1, 1]
        assert elapsed >= (len(paths) - 1) * delay * scale - 1e-3
    finally:
        ray.kill(gate)


def test_loopback_end_to_end_live_crawl(
    ray_session, tmp_path_factory, loopback_server
):
    """A full multi-round crawl where every fetched byte travels over a
    real loopback socket: seed /p/0, depth 2 => the 7-page binary tree
    /p/0../p/6, each body extracted from the server's real response and
    each child link discovered from that html."""
    import glob
    import json
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from spider_ray.core.regdomain import registrable_domain
    from spider_ray.crawl.driver import CrawlDriver

    host = loopback_server
    # scope works on the PORT-STRIPPED host (core.scope.split_host_pq),
    # so the allowed domain is regdomain("127.0.0.1"), not of host:port
    dom = registrable_domain(host.split(":")[0])
    fx = str(tmp_path_factory.mktemp("fx_loopback"))
    with open(os.path.join(fx, "config.json"), "w") as fcfg:
        json.dump({"allowed_domains": [dom], "exclusions": {},
                   "max_depth": 2}, fcfg)
    pq.write_table(
        pa.table({
            "host": pa.array([host]),
            "body": pa.array([b"User-agent: *\nAllow: /\n"], pa.binary()),
            "crawl_delay_s": pa.array([0.01]),
        }),
        os.path.join(fx, "robots.parquet"),
    )
    pq.write_table(
        pa.table({
            "url": pa.array([f"http://{host}/p/0"]),
            "max_depth": pa.array([2], pa.int32()),
        }),
        os.path.join(fx, "seeds.parquet"),
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt_loopback"))
    drv = CrawlDriver(
        fx, ckpt, fetch_mode="live",
        fetcher_kwargs={"fake": False, "politeness_scale": 0.0,
                        "timeout_s": 5.0},
    )
    try:
        metrics = drv.run(max_rounds=5)
    finally:
        drv.close()
    assert sum(m["fetched"] for m in metrics) == 7
    out = pd.concat([
        pq.read_table(f).to_pandas()
        for f in glob.glob(os.path.join(ckpt, "round=*", "out", "*.parquet"))
    ])
    assert len(out) == 7
    assert out["url"].is_unique
    assert sorted(out["url"]) == [f"http://{host}/p/{i}" for i in range(7)]
    # the extracted text came from the server's real bytes
    for _, row in out.iterrows():
        n = int(row["url"].rsplit("/", 1)[1])
        assert f"loopback body {n}" in row["text"]
    for m in metrics:
        assert m["fetched"] + m["fetch_errors"] == m["selected"]
