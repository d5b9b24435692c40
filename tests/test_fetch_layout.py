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
