"""WARC archive sink goldens — the raw-capture artifact (S5 sibling).

With ``archive_html=True`` the crawl keeps every fetched page as a
Common-Crawl-shaped member-gzip WARC record plus a CDX index row.  The
archive's RECORD SET must equal the sequential oracle's fetched set per
round, record payloads must be byte-identical to the fixture corpus
html, WARC-Date must be the corpus capture timestamp, and every CDX
(offset, length) must random-access-decode to exactly its record.
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def archive_run(ray_session, micro_fixture, tmp_path_factory):
    from spider_ray.crawl.driver import CrawlDriver

    ckpt = str(tmp_path_factory.mktemp("ckpt_archive"))
    drv = CrawlDriver(micro_fixture, ckpt, archive_html=True)
    drv.run(max_rounds=50)
    return ckpt


@pytest.fixture(scope="module")
def oracle_run(micro_fixture):
    from spider_ray.oracle import OracleCrawl

    sim = OracleCrawl(micro_fixture)
    sim.run()
    return sim


def _corpus(micro_fixture):
    t = pq.read_table(
        os.path.join(micro_fixture, "pages.parquet"),
        columns=["url", "warc_ts", "html"],
    )
    return {
        u: (ts, h)
        for u, ts, h in zip(
            t.column("url").to_pylist(),
            t.column("warc_ts").cast("int64").to_pylist(),
            t.column("html").to_pylist(),
        )
    }


def _engine_records(ckpt):
    """round -> {url: (ts_us, html)} parsed back from the WARC files."""
    from spider_ray.sources.warc import parse_warc_bytes

    per_round: dict[int, dict] = {}
    for f in sorted(glob.glob(os.path.join(ckpt, "round=*", "archive",
                                           "*.warc.gz"))):
        k = int(os.path.basename(os.path.dirname(os.path.dirname(f)))
                .split("=")[1])
        t = parse_warc_bytes(gzip.decompress(open(f, "rb").read()))
        d = per_round.setdefault(k, {})
        for u, ts, h in zip(
            t.column("url").to_pylist(),
            t.column("warc_ts").cast("int64").to_pylist(),
            t.column("html").to_pylist(),
        ):
            assert u not in d, f"duplicate archive record for {u}"
            d[u] = (ts, h)
    return per_round


def test_archive_record_set_matches_oracle(archive_run, oracle_run,
                                           micro_fixture):
    corpus = _corpus(micro_fixture)
    expected: dict[int, dict] = {}
    for url, _text, _lang, rnd, _seq in oracle_run.extracted:
        # WARC-Date truncates to whole seconds (the WARC timestamp
        # grain); payload must be the corpus html byte-for-byte
        ts, html = corpus[url]
        expected.setdefault(rnd, {})[url] = (ts // 1_000_000 * 1_000_000,
                                             html)
    got = _engine_records(archive_run)
    assert set(got) == set(expected)
    for rnd in expected:
        assert got[rnd] == expected[rnd], f"round {rnd} archive mismatch"


def test_cdx_random_access(archive_run, oracle_run):
    from spider_ray.sources.warc import parse_warc_bytes

    files = sorted(glob.glob(os.path.join(archive_run, "round=*", "archive",
                                          "*.cdx.parquet")))
    assert files
    total = 0
    for f in files:
        cdx = pq.read_table(f)
        total += cdx.num_rows
        warc_path = os.path.join(os.path.dirname(f),
                                 cdx.column("filename")[0].as_py())
        blob = open(warc_path, "rb").read()
        for row in cdx.to_pylist():
            member = blob[row["offset"]:row["offset"] + row["length"]]
            rec = parse_warc_bytes(gzip.decompress(member))
            assert rec.num_rows == 1
            assert rec.column("url")[0].as_py() == row["url"]
            html = rec.column("html")[0].as_py()
            assert hashlib.sha1(html).hexdigest() == row["digest"]
    assert total == len(oracle_run.extracted)


def test_extract_schema_unchanged_by_archive(archive_run, micro_fixture,
                                             tmp_path_factory):
    """The pass-through sink must not leak warc_ts into the extracted
    output: out/ schema equals the non-archive crawl's EXTRACTED."""
    from spider_ray.core.schemas import EXTRACTED

    files = sorted(glob.glob(os.path.join(archive_run, "round=*", "out",
                                          "*.parquet")))
    assert files
    assert pq.read_schema(files[0]).names == EXTRACTED.names
