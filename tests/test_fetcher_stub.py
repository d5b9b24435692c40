"""T3 live-fetcher plumbing: actor-pool stage shape, stub transport."""

from __future__ import annotations

import pyarrow as pa
import pytest

from spider_ray.crawl.fetcher import LiveFetcher


def _batch(urls):
    return pa.table({"url": pa.array(urls, pa.string())})


def test_real_mode_builds_pool_and_misses_cleanly_offline():
    """fake=False is the REAL urllib3 transport (r05): construction
    builds the pool up front, and an unresolvable host is a clean
    connection-level fetch miss (found=0, no timeout flag, no body,
    no exception) — a crawl must survive dead hosts."""
    f = LiveFetcher(fake=False, timeout_s=0.5)
    assert f._session is not None
    out = f(_batch(["http://no-such-host.invalid/x"]))
    assert out.column("found")[0].as_py() == 0
    assert out.column("html")[0].as_py() == b""
    assert out.column("redirect_to")[0].as_py() == ""


def test_fake_fetch_deterministic_and_schema():
    f = LiveFetcher(fake=True)
    urls = [f"https://site{i:02d}.example/p/{i}" for i in range(64)]
    out1 = f(_batch(urls))
    out2 = f(_batch(urls))
    assert out1.equals(out2)  # deterministic
    assert out1.schema.names == ["url", "html", "lang", "found", "n_bytes",
                                 "timeout", "redirects", "redirect_to",
                                 "not_modified", "oversize", "etag"]
    found = out1.column("found").to_pylist()
    assert 0 < sum(found) < len(urls)  # both hit and 404 paths exercised
    for h, fl, nb in zip(out1.column("html").to_pylist(), found,
                         out1.column("n_bytes").to_pylist()):
        assert (len(h) > 0) == bool(fl)
        assert nb == len(h)


def test_actor_pool_stage_runs(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        _batch([f"https://s.example/{i}" for i in range(200)])
    )
    out = ds.map_batches(
        LiveFetcher,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
        num_cpus=0.5,
    ).materialize()
    assert out.count() == 200
    # extracted text pipes straight into the M7 stage schema
    assert {"url", "html", "found"} <= set(out.schema().base_schema.names)
