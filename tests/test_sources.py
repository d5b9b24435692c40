"""Round-trip tests for the WARC and JSONL sources (spider_ray/sources).

The contract under test: a pages table written as WARC (plain or
member-gzip) reads back byte-identical in (url, warc_ts, html) through
the distributed reader, and a Dataset survives a JSONL round trip."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

from spider_ray.sources import read_jsonl, read_warc, warc_bytes
from spider_ray.sources.warc import parse_warc_bytes


def _pages() -> pa.Table:
    ts = pd.to_datetime(
        ["2024-05-01T12:00:00", "2024-05-02T01:02:03", "2024-05-03T23:59:59"]
    )
    return pa.table(
        {
            "url": pa.array(
                [
                    "https://a.example/x",
                    "https://b.example/y?q=1",
                    "https://c.example/z",
                ]
            ),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(
                [
                    b"<html><body>Hello</body></html>",
                    b"<p>bytes \xe2\x9c\x93 with\r\n\r\nCRLFCRLF inside</p>",
                    b"",
                ],
                pa.binary(),
            ),
        }
    )


def test_warc_roundtrip_plain_bytes():
    t = _pages()
    got = parse_warc_bytes(warc_bytes(t))
    assert got.column("url").to_pylist() == t.column("url").to_pylist()
    assert got.column("html").to_pylist() == t.column("html").to_pylist()
    assert got.column("warc_ts").to_pylist() == t.column("warc_ts").to_pylist()


def test_warc_roundtrip_distributed_reader(ray_session, tmp_path):
    t = _pages()
    plain = os.path.join(tmp_path, "part1.warc")
    gz = os.path.join(tmp_path, "part2.warc.gz")
    with open(plain, "wb") as f:
        f.write(warc_bytes(t.slice(0, 2)))
    with open(gz, "wb") as f:
        f.write(warc_bytes(t.slice(2), gzip_records=True))
    ds = read_warc([plain, gz])
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    want = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert df["url"].tolist() == want["url"].tolist()
    assert [bytes(b) for b in df["html"]] == [bytes(b) for b in want["html"]]
    assert df["warc_ts"].tolist() == want["warc_ts"].tolist()


def test_warc_skips_non_response_records():
    t = _pages().slice(0, 1)
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://a.example/x\r\n"
        b"Content-Length: 4\r\n\r\nGET \r\n\r\n"
    )
    got = parse_warc_bytes(req + warc_bytes(t))
    assert got.num_rows == 1
    assert got.column("url").to_pylist() == ["https://a.example/x"]


def test_jsonl_roundtrip(ray_session, tmp_path):
    import ray.data

    from spider_ray.sources import write_jsonl

    rows = [{"doc_id": i, "text": f"t{i}", "n": i * 2} for i in range(10)]
    ds = ray.data.from_items(rows, override_num_blocks=3)
    out = os.path.join(tmp_path, "jl")
    write_jsonl(ds, out)
    back = (
        read_jsonl(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert back.to_dict("records") == rows


# ---------------------------------------------------------------------------
# sitemap source (sitemaps.org protocol)
# ---------------------------------------------------------------------------

def _sitemap_rows() -> pa.Table:
    import pandas as pd

    ts = pd.to_datetime(
        ["2024-05-01T12:00:00", "2024-06-02T01:02:03", "1970-01-01T00:00:00"]
    )
    return pa.table(
        {
            "kind": pa.array(["url"] * 3),
            "url": pa.array(
                [
                    "https://a.example/x",
                    "https://b.example/y?q=1",
                    "https://c.example/z",
                ]
            ),
            "lastmod_ts": pa.array(ts, pa.timestamp("us")),
            "changefreq": pa.array(["daily", "", "never"]),
            "priority": pa.array([800, -1, 500], pa.int32()),
        }
    )


def test_sitemap_urlset_roundtrip():
    from spider_ray.sources import parse_sitemap_bytes, sitemap_bytes

    t = _sitemap_rows()
    got = parse_sitemap_bytes(sitemap_bytes(t))
    assert got.column("url").to_pylist() == t.column("url").to_pylist()
    assert got.column("kind").to_pylist() == ["url"] * 3
    assert (
        got.column("lastmod_ts").to_pylist()[:2]
        == t.column("lastmod_ts").to_pylist()[:2]
    )
    assert got.column("changefreq").to_pylist() == ["daily", "", "never"]
    assert got.column("priority").to_pylist() == [800, -1, 500]


def test_sitemap_index_kind_and_gzip():
    from spider_ray.sources import parse_sitemap_bytes, sitemap_bytes

    t = _sitemap_rows()
    buf = sitemap_bytes(t, index=True, gzipped=True)
    got = parse_sitemap_bytes(buf)
    assert got.column("kind").to_pylist() == ["sitemap"] * 3
    assert got.column("url").to_pylist() == t.column("url").to_pylist()


def test_sitemap_plain_text_and_namespace_prefix():
    from spider_ray.sources import parse_sitemap_bytes

    txt = b"https://a.example/1\n\n  https://a.example/2  \n"
    got = parse_sitemap_bytes(txt)
    assert got.column("url").to_pylist() == [
        "https://a.example/1", "https://a.example/2"
    ]
    # prefixed namespace + urlset detection on local name
    xml = (
        b'<?xml version="1.0"?><sm:urlset '
        b'xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<sm:url><sm:loc>https://p.example/a</sm:loc>"
        b"<sm:priority>0.25</sm:priority></sm:url></sm:urlset>"
    )
    got = parse_sitemap_bytes(xml)
    assert got.column("url").to_pylist() == ["https://p.example/a"]
    assert got.column("priority").to_pylist() == [250]


def test_sitemap_malformed_xml_falls_back_to_loc_scan():
    from spider_ray.sources import parse_sitemap_bytes

    bad = (
        b"<urlset><url><loc>https://x.example/keep</loc></url>"
        b"<url><loc>https://x.example/keep2</loc>"  # never closed
    )
    got = parse_sitemap_bytes(bad)
    assert got.column("url").to_pylist() == [
        "https://x.example/keep", "https://x.example/keep2"
    ]


def test_sitemap_distributed_reader_and_seed_table(ray_session, tmp_path):
    from spider_ray.sources import (
        read_sitemaps, sitemap_bytes, sitemap_seed_table,
    )

    t = _sitemap_rows()
    p1 = os.path.join(tmp_path, "a.xml")
    p2 = os.path.join(tmp_path, "b.xml.gz")
    with open(p1, "wb") as f:
        f.write(sitemap_bytes(t))
    # second file repeats url[0] with a NEWER lastmod + adds one more
    import pandas as pd

    t2 = pa.table(
        {
            "kind": pa.array(["url"] * 2),
            "url": pa.array(["https://a.example/x", "https://d.example/w"]),
            "lastmod_ts": pa.array(
                pd.to_datetime(["2025-01-01T00:00:00"] * 2),
                pa.timestamp("us"),
            ),
            "changefreq": pa.array(["", ""]),
            "priority": pa.array([-1, -1], pa.int32()),
        }
    )
    with open(p2, "wb") as f:
        f.write(sitemap_bytes(t2, gzipped=True))
    ds = read_sitemaps([p1, p2])
    seeds = sitemap_seed_table(ds, max_depth=2)
    urls = seeds.column("url").to_pylist()
    assert sorted(urls) == [
        "https://a.example/x", "https://b.example/y?q=1",
        "https://c.example/z", "https://d.example/w",
    ]
    assert len(urls) == len(set(urls))  # dup url collapsed
    assert seeds.column("max_depth").to_pylist() == [2] * 4
    # seed shape matches the crawl's seeds.parquet contract
    assert seeds.schema.names == ["url", "max_depth"]


def test_warc_hostile_content_length_terminates():
    """Content-Length is remote-controlled: negative values used to
    move the scan position backward (bytes.find clamps negative starts
    to 0 -> infinite loop), junk raised out of the read task.  All
    must terminate and keep scanning subsequent records."""
    from spider_ray.sources.warc import parse_warc_bytes

    for cl in (b"-10000", b"-50", b"abc", b"999999999"):
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: http://x/\r\n"
               b"Content-Length: " + cl + b"\r\n\r\npayload\r\n\r\n")
        t = parse_warc_bytes(rec + rec)
        assert t.num_rows >= 1  # parsed, did not hang or raise


def test_sitemap_entity_bomb_safe():
    """A billion-laughs DOCTYPE must not expand: ElementTree refuses
    the entity, and the malformed-XML fallback returns the literal
    (un-expanded) loc text in bounded time."""
    import time

    from spider_ray.sources import parse_sitemap_bytes

    bomb = (
        b'<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY l0 "lol">'
        + b"".join(
            b'<!ENTITY l%d "%s">' % (i, (b"&l%d;" % (i - 1)) * 10)
            for i in range(1, 9)
        )
        + b']><urlset><url><loc>http://x/&l8;</loc></url></urlset>'
    )
    t0 = time.perf_counter()
    t = parse_sitemap_bytes(bomb)
    assert time.perf_counter() - t0 < 5.0
    assert t.num_rows == 1
    assert len(t.column("url")[0].as_py()) < 100  # never expanded


def test_sitemap_bytes_escapes_ampersand_urls():
    """ADVICE r04: URLs with query strings ('&') must produce
    well-formed XML — strict ElementTree parse must accept the output
    and the values must round-trip."""
    from xml.etree import ElementTree

    from spider_ray.sources import parse_sitemap_bytes, sitemap_bytes

    t = pa.table(
        {
            "kind": pa.array(["url"]),
            "url": pa.array(["https://a.example/s?q=1&r=<2>&s=\"x\""]),
            "lastmod_ts": pa.array([0], pa.timestamp("us")),
            "changefreq": pa.array(["a&b"]),
            "priority": pa.array([-1], pa.int32()),
        }
    )
    buf = sitemap_bytes(t)
    ElementTree.fromstring(buf)  # must not raise (well-formed)
    got = parse_sitemap_bytes(buf)
    assert got.column("url").to_pylist() == t.column("url").to_pylist()
    assert got.column("changefreq").to_pylist() == ["a&b"]


def test_sitemap_bom_routes_to_xml_path():
    """ADVICE r04: a BOM'd XML sitemap must parse as XML, not fall
    through to the plain-text path."""
    from spider_ray.sources import parse_sitemap_bytes

    xml = (
        b'<?xml version="1.0"?><urlset '
        b'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>https://bom.example/a</loc></url></urlset>"
    )
    for buf in (
        b"\xef\xbb\xbf" + xml,                      # UTF-8 BOM
        xml.decode().encode("utf-16"),               # UTF-16 LE w/ BOM
        ("﻿" + xml.decode()).encode("utf-16-be"),  # UTF-16 BE
    ):
        got = parse_sitemap_bytes(buf)
        assert got.column("url").to_pylist() == ["https://bom.example/a"]
        assert got.column("kind").to_pylist() == ["url"]


def test_sitemap_bytes_skips_epoch_lastmod():
    """ADVICE r04: the absent-lastmod sentinel (epoch 0) must not emit
    a <lastmod>1970-01-01...</lastmod> element."""
    from spider_ray.sources import parse_sitemap_bytes, sitemap_bytes

    t = pa.table(
        {
            "kind": pa.array(["url", "url"]),
            "url": pa.array(["https://a.example/x", "https://a.example/y"]),
            "lastmod_ts": pa.array(
                [0, 1_714_564_800_000_000], pa.timestamp("us")
            ),
            "changefreq": pa.array(["", ""]),
            "priority": pa.array([-1, -1], pa.int32()),
        }
    )
    buf = sitemap_bytes(t)
    assert b"1970-01-01" not in buf
    assert buf.count(b"<lastmod>") == 1
    got = parse_sitemap_bytes(buf)
    assert got.column("lastmod_ts").to_pylist()[0].timestamp() == 0
