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
