"""Unit tests for the bucketed corpus layout + selective fetch read."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spider_ray.crawl.stages import (
    FETCH_SUB,
    _read_bucket_pages,
    domain_bucket,
)


def _write_bucket(tmp_path, urls, n_files=2, row_group_size=4):
    d = tmp_path / "bucket=0"
    d.mkdir()
    urls = sorted(urls)
    chunk = (len(urls) + n_files - 1) // n_files
    for i in range(n_files):
        part = urls[i * chunk : (i + 1) * chunk]
        t = pa.table(
            {
                "url": pa.array(part, pa.string()),
                "html": pa.array([f"<p>{u}</p>".encode() for u in part], pa.binary()),
                "lang": pa.array(["en"] * len(part), pa.string()),
            }
        )
        pq.write_table(t, str(d / f"part-{i}.parquet"), row_group_size=row_group_size)
    return str(d)


def test_selective_read_exact_matches(tmp_path):
    urls = [f"https://s.example/p/{i:03d}" for i in range(40)]
    d = _write_bucket(tmp_path, urls)
    probe = urls[::7] + ["https://s.example/missing"]
    out = _read_bucket_pages(d, probe)
    got = sorted(out.column("url").to_pylist())
    assert got == sorted(urls[::7])
    # html round-trips exactly
    for u, h in zip(out.column("url").to_pylist(), out.column("html").to_pylist()):
        assert h == f"<p>{u}</p>".encode()


def test_selective_read_all_miss_reads_nothing(tmp_path):
    urls = [f"https://s.example/p/{i:03d}" for i in range(20)]
    d = _write_bucket(tmp_path, urls)
    out = _read_bucket_pages(d, ["https://other.example/x", "https://z.example/y"])
    assert out.num_rows == 0
    assert out.schema.names == ["url", "html", "lang"]


def test_selective_read_duplicate_probes(tmp_path):
    urls = [f"https://s.example/p/{i}" for i in range(10)]
    d = _write_bucket(tmp_path, urls)
    out = _read_bucket_pages(d, [urls[3], urls[3], urls[7]])
    assert sorted(out.column("url").to_pylist()) == sorted([urls[3], urls[7]])


def test_domain_bucket_spreads_hot_domain():
    nb = 128
    buckets = {domain_bucket("hot.example", h, nb) for h in range(10_000)}
    assert len(buckets) == FETCH_SUB  # exactly the sub-splits
    # a domain's sub-buckets are deterministic
    assert domain_bucket("hot.example", 42, nb) == domain_bucket("hot.example", 42, nb)


def test_domain_bucket_groups_same_domain_same_hash():
    nb = 64
    b1 = domain_bucket("a.example", 100, nb)
    b2 = domain_bucket("a.example", 100 + FETCH_SUB, nb)  # same sub-split
    assert b1 == b2


def test_stats_pruned_read_decodes_only_candidate_groups(tmp_path, monkeypatch):
    """Phase 1 is metadata-only: with 10 row groups and one probed
    range, read_row_group must be called once, and never pf.read."""
    import spider_ray.crawl.stages as stages

    urls = [f"https://s.example/p/{i:03d}" for i in range(40)]
    d = _write_bucket(tmp_path, urls, n_files=1, row_group_size=4)

    reads = []
    orig = pq.ParquetFile.read_row_group

    def spy(self, g, **kw):
        reads.append(g)
        return orig(self, g, **kw)

    monkeypatch.setattr(pq.ParquetFile, "read_row_group", spy)
    monkeypatch.setattr(
        pq.ParquetFile, "read",
        lambda self, **kw: (_ for _ in ()).throw(AssertionError("full read")),
    )
    out = stages._read_bucket_pages(d, [urls[13]])
    assert out.column("url").to_pylist() == [urls[13]]
    assert reads == [13 // 4]


def test_stats_missing_falls_back_to_scan(tmp_path):
    """Files without url statistics still read correctly (scan path)."""
    d = tmp_path / "bucket=0"
    d.mkdir()
    urls = sorted(f"https://s.example/p/{i}" for i in range(12))
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array([b"<p>x</p>"] * len(urls), pa.binary()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }
    )
    pq.write_table(t, str(d / "part-0.parquet"), row_group_size=5,
                   write_statistics=False)
    out = _read_bucket_pages(str(d), [urls[2], urls[11], "https://zz.example/m"])
    assert sorted(out.column("url").to_pylist()) == sorted([urls[2], urls[11]])

def _write_named_bucket(tmp_path, bucket, urls):
    d = tmp_path / f"bucket={bucket}"
    d.mkdir(exist_ok=True)
    urls = sorted(urls)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array([f"<p>{u}</p>".encode() for u in urls], pa.binary()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }
    )
    pq.write_table(t, str(d / "part-0.parquet"), row_group_size=4)


def _sel_batch(rows):
    """Minimal selected-frontier batch (url, domain, bucket)."""
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "domain": pa.array([r[1] for r in rows], pa.string()),
            "bucket": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


def test_fetch_batch_multi_mixed_and_partial_buckets(tmp_path):
    """fetch_batch_multi must equal per-bucket fetch_group on a block
    holding several buckets AND a partial bucket (the boundary-quality
    rewrite's contract: bucket purity is not required)."""
    from spider_ray.crawl.stages import fetch_batch_multi, fetch_group

    u3 = [f"https://a.example/p/{i:02d}" for i in range(12)]
    u7 = [f"https://b.example/q/{i:02d}" for i in range(8)]
    _write_named_bucket(tmp_path, 3, u3)
    _write_named_bucket(tmp_path, 7, u7)

    # sorted by (bucket, url) as the driver produces, with misses and
    # only PART of bucket 3's corpus probed
    rows = (
        [(u, "a.example", 3) for u in sorted(u3)[:5]]
        + [("https://a.example/zz-miss", "a.example", 3)]
        + [(u, "b.example", 7) for u in sorted(u7)]
        + [("https://c.example/none", "c.example", 9)]  # no such bucket dir
    )
    batch = _sel_batch(rows)
    got = fetch_batch_multi(batch, str(tmp_path))

    want = pa.concat_tables(
        [
            fetch_group(batch.slice(0, 6), str(tmp_path)),
            fetch_group(batch.slice(6, 8), str(tmp_path)),
            fetch_group(batch.slice(14, 1), str(tmp_path)),
        ]
    )
    assert got.schema.equals(want.schema)
    assert got.sort_by("url").equals(want.sort_by("url"))
    # hits carry real html, misses carry found=0 / empty html
    by_url = dict(zip(got.column("url").to_pylist(),
                      zip(got.column("found").to_pylist(),
                          got.column("html").to_pylist())))
    assert by_url[sorted(u3)[0]] == (1, f"<p>{sorted(u3)[0]}</p>".encode())
    # misses: found is NULL (pc.true_unless_null semantics, summed as 0
    # downstream) and html is the coalesced empty payload
    assert by_url["https://a.example/zz-miss"] == (None, b"")
    assert by_url["https://c.example/none"] == (None, b"")
    assert got.num_rows == 15


def test_fetch_batch_multi_empty_and_single_run(tmp_path):
    from spider_ray.crawl.stages import fetch_batch_multi, fetch_group

    u3 = [f"https://a.example/p/{i:02d}" for i in range(4)]
    _write_named_bucket(tmp_path, 3, u3)
    empty = _sel_batch([])
    out = fetch_batch_multi(empty, str(tmp_path))
    assert out.num_rows == 0
    one = _sel_batch([(u, "a.example", 3) for u in sorted(u3)])
    got = fetch_batch_multi(one, str(tmp_path))
    assert got.equals(fetch_group(one, str(tmp_path)))
    assert got.column("found").to_pylist() == [1, 1, 1, 1]
