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
