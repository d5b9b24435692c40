"""WARC/1.0 source — ingest Common-Crawl-style archives into the
engine's pages-table shape (url, warc_ts, html) (SURVEY.md §2.1 S3
extension; BASELINE.json input_hint names the columns).

Implemented from the public WARC 1.0 / RFC 4180-style record layout:
each record is a ``WARC/1.0\\r\\n`` header block (Name: value lines,
terminated by a blank line), ``Content-Length`` octets of payload, and
a ``\\r\\n\\r\\n`` separator.  ``response`` records carry an HTTP
message as payload; the html body starts after the HTTP header block.
``.warc.gz`` files are member-gzip (one member per record is the
Common Crawl convention); ``gzip.decompress`` handles multi-member
streams, so both whole-file and per-record compression read
identically.

Scale shape: ``ray.data.read_binary_files`` streams one task per WARC
file (CC segments are ~1 GB — a natural task grain), and the parser is
a single pass over the byte buffer (no regex, no line-splitting of the
payload).  Output blocks go straight into the same bucketed-corpus
preparation as parquet pages input.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            out[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return out


def parse_warc_bytes(buf: bytes) -> pa.Table:
    """One pass over a (decompressed) WARC byte buffer -> pages rows.
    Only ``WARC-Type: response`` records emit a row; the html is the
    HTTP payload body, the url is ``WARC-Target-URI``, the timestamp is
    ``WARC-Date`` (ISO-8601, UTC)."""
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    pos = 0
    n = len(buf)
    while pos < n:
        start = buf.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = buf.find(_CRLF2, start)
        if hdr_end < 0:
            break
        headers = _parse_headers(buf[start + 5:hdr_end])
        # Content-Length is remote-controlled: a negative value would
        # move pos BACKWARD (bytes.find clamps negative starts to 0 ->
        # infinite loop on the same record), junk would raise out of
        # the read task; clamp both to "empty payload, keep scanning"
        try:
            length = max(0, int(headers.get("content-length", "0")))
        except ValueError:
            length = 0
        payload = buf[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type", "").lower() != "response":
            continue
        url = headers.get("warc-target-uri", "")
        date = headers.get("warc-date", "")
        try:
            ts = datetime.fromisoformat(date.replace("Z", "+00:00"))
            ts_us = int(ts.astimezone(timezone.utc).timestamp() * 1_000_000)
        except ValueError:
            ts_us = 0
        # payload is an HTTP message: body starts after its header block
        http_end = payload.find(_CRLF2)
        body = payload[http_end + 4:] if http_end >= 0 else payload
        urls.append(url)
        tss.append(ts_us)
        htmls.append(body)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")).cast(
                pa.timestamp("us")
            ),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def read_warc(paths) -> "ray.data.Dataset":  # noqa: F821
    """WARC file(s)/directory -> Dataset(url, warc_ts, html).  One
    parse task per file, streaming — no driver-side materialization."""
    import ray.data

    def parse(row: dict) -> list[dict]:
        buf = bytes(row["bytes"])
        # magic-byte check, not extension: ray's binary reader already
        # auto-decompresses *.gz by arrow filesystem convention
        if buf[:2] == b"\x1f\x8b":
            buf = gzip.decompress(buf)
        t = parse_warc_bytes(buf)
        return t.to_pylist()

    return ray.data.read_binary_files(paths, include_paths=True).flat_map(
        parse
    )


def warc_record(url: str, ts, html: bytes, *,
                gzip_member: bool = False) -> bytes:
    """One (url, timestamp, html) -> the bytes of one WARC/1.0 response
    record (minimal HTTP/1.1 200 envelope).  Fully DETERMINISTIC: the
    record carries no random ID and no wall-clock field — WARC-Date is
    the page's own capture timestamp, and ``gzip_member=True`` pins
    ``mtime=0`` in the gzip header — so identical inputs serialize to
    identical bytes on any worker, which is what lets the crawl's
    archive sink golden-compare against the sequential oracle and name
    files by content hash."""
    if isinstance(html, str):
        html = html.encode()
    if hasattr(ts, "strftime"):
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    elif isinstance(ts, (int, float)) and ts:
        # microseconds-since-epoch (the engine's warc_ts carrier dtype)
        date = datetime.fromtimestamp(
            ts / 1_000_000, tz=timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
    else:
        date = "1970-01-01T00:00:00Z"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: " + str(len(html)).encode() + _CRLF2[:2] +
        b"\r\n" + html
    )
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(http)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        "\r\n"
    ).encode()
    rec = hdr + http + _CRLF2
    return gzip.compress(rec, mtime=0) if gzip_member else rec


def warc_bytes(table: pa.Table, *, gzip_records: bool = False) -> bytes:
    """Pages rows -> a WARC/1.0 byte stream (response records with a
    minimal HTTP/1.1 200 envelope).  The writer half of the round-trip
    test; also the export path for interchange with WARC tooling.
    ``gzip_records=True`` emits the Common Crawl member-gzip layout
    (each record its own gzip member)."""
    return b"".join(
        warc_record(row["url"], row.get("warc_ts"), row["html"],
                    gzip_member=gzip_records)
        for row in table.to_pylist()
    )
