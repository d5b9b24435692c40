"""Sitemap source — sitemaps.org protocol ingest for seed discovery
(SURVEY.md §2.1 S1 extension: real crawls bootstrap their frontier
from robots.txt-advertised sitemaps, not only a hand-written seed
list).

Implemented from the public Sitemaps 0.9 protocol: a ``<urlset>``
document lists page ``<url>`` entries (``loc`` required; ``lastmod``,
``changefreq``, ``priority`` optional), a ``<sitemapindex>`` document
lists child ``<sitemap>`` files, and plain-text sitemaps are one URL
per line.  ``.gz`` variants are whole-file gzip.  Both document kinds
come back as rows of ONE schema with a ``kind`` discriminator:

    kind       "url" (page) | "sitemap" (child sitemap location)
    url        the <loc> value, stripped
    lastmod_ts timestamp(us) from <lastmod> (W3C datetime; 0 if absent)
    changefreq "" if absent
    priority   e3 fixed point (<priority>0.8</priority> -> 800;
               -1 if absent — the protocol default 0.5 is the
               CONSUMER's decision, absence is information)

``kind == "sitemap"`` rows are intentionally not fetched here: this
sandbox has no network, and in deployment child-sitemap fetches belong
to the politeness-governed fetch layer (same design as the live
fetcher's cross-host ``redirect_to``), not to a source that would hit
hosts with unthrottled reads.  The driver for that loop is
``read_sitemaps`` per wave: fetch the returned child locations through
the fetcher pool, feed the bodies back in, repeat.

Parsing is stdlib ``xml.etree`` on the namespace-agnostic local names
(real-world sitemaps mix default/prefixed/absent namespaces); a
malformed XML document falls back to a literal ``<loc>`` scan so one
bad byte does not drop a 50k-url sitemap.
"""

from __future__ import annotations

import gzip
import re
from datetime import datetime, timezone
from xml.sax.saxutils import escape as _xml_escape
from xml.etree import ElementTree

import pyarrow as pa

_LOC_RE = re.compile(rb"<loc[^>]*>(.*?)</loc>", re.S | re.I)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _ts_us(text: str) -> int:
    """W3C datetime (YYYY-MM-DD or full ISO-8601) -> epoch micros."""
    t = text.strip()
    try:
        dt = datetime.fromisoformat(t.replace("Z", "+00:00"))
    except ValueError:
        return 0
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.astimezone(timezone.utc).timestamp() * 1_000_000)


def _rows(kind: str, elem) -> dict | None:
    loc, lastmod, changefreq, priority = "", 0, "", -1
    for child in elem:
        name = _local(child.tag)
        text = (child.text or "").strip()
        if name == "loc":
            loc = text
        elif name == "lastmod":
            lastmod = _ts_us(text)
        elif name == "changefreq":
            changefreq = text.lower()
        elif name == "priority":
            try:
                priority = round(float(text) * 1000)
            except ValueError:
                priority = -1
    if not loc:
        return None
    return {
        "kind": kind,
        "url": loc,
        "lastmod_ts": lastmod,
        "changefreq": changefreq,
        "priority": priority,
    }


_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("url", pa.string()),
        ("lastmod_ts", pa.timestamp("us")),
        ("changefreq", pa.string()),
        ("priority", pa.int32()),
    ]
)


def _table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "kind": pa.array([r["kind"] for r in rows], pa.string()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "lastmod_ts": pa.array(
                [r["lastmod_ts"] for r in rows], pa.timestamp("us")
            ),
            "changefreq": pa.array(
                [r["changefreq"] for r in rows], pa.string()
            ),
            "priority": pa.array([r["priority"] for r in rows], pa.int32()),
        },
        schema=_SCHEMA,
    )


def parse_sitemap_bytes(buf: bytes) -> pa.Table:
    """One sitemap document (urlset, sitemapindex, or plain text;
    optionally gzipped) -> rows of the unified schema."""
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    # BOMs (common in real-world sitemap exports) would otherwise route
    # an XML document to the plain-text path: UTF-16 re-encodes to
    # UTF-8, a UTF-8 BOM is stripped (ElementTree handles BOM'd bytes,
    # but the b"<" dispatch below must see the "<").
    if buf[:2] in (b"\xff\xfe", b"\xfe\xff"):
        buf = buf.decode("utf-16").encode("utf-8")
    if buf[:3] == b"\xef\xbb\xbf":
        buf = buf[3:]
    stripped = buf.lstrip()
    rows: list[dict] = []
    if stripped[:1] == b"<":
        try:
            root = ElementTree.fromstring(buf)
        except ElementTree.ParseError:
            # malformed XML: literal <loc> scan keeps the urls; index
            # vs urlset is undecidable, so everything becomes "url"
            # (the consumer's seen-set/scope filters absorb mistakes)
            for m in _LOC_RE.finditer(buf):
                loc = m.group(1).decode("utf-8", errors="replace").strip()
                if loc:
                    rows.append(
                        {"kind": "url", "url": loc, "lastmod_ts": 0,
                         "changefreq": "", "priority": -1}
                    )
            return _table(rows)
        root_name = _local(root.tag)
        kind = "sitemap" if root_name == "sitemapindex" else "url"
        for elem in root:
            if _local(elem.tag) in ("url", "sitemap"):
                r = _rows(kind, elem)
                if r is not None:
                    rows.append(r)
        return _table(rows)
    # plain-text sitemap: one url per line
    for line in buf.decode("utf-8", errors="replace").splitlines():
        line = line.strip()
        if line:
            rows.append(
                {"kind": "url", "url": line, "lastmod_ts": 0,
                 "changefreq": "", "priority": -1}
            )
    return _table(rows)


def read_sitemaps(paths) -> "ray.data.Dataset":  # noqa: F821
    """Sitemap file(s)/directory -> Dataset(kind, url, lastmod_ts,
    changefreq, priority).  One parse task per file, streaming."""
    import ray.data

    def parse(row: dict) -> list[dict]:
        return parse_sitemap_bytes(bytes(row["bytes"])).to_pylist()

    return ray.data.read_binary_files(paths, include_paths=True).flat_map(
        parse
    )


def sitemap_seed_table(ds, *, max_depth: int = 0) -> pa.Table:
    """kind == "url" rows -> the crawl's (url, max_depth) seed shape,
    newest-lastmod first per url (a url listed by several sitemaps
    keeps one row).  Seed lists are bounded (they gate a crawl, not
    stream through it), so the driver-side collect is by contract.
    ``max_depth = 0`` seeds exactly the listed pages; > 0 lets the
    crawl expand around them."""
    def _urls_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column("kind"), "url"))

    tbl = pa.Table.from_pylist(
        ds.map_batches(_urls_only, batch_format="pyarrow").take_all(),
        schema=_SCHEMA,
    )
    if len(tbl) == 0:
        return pa.table(
            {"url": pa.array([], pa.string()),
             "max_depth": pa.array([], pa.int32())}
        )
    import pyarrow.compute as pc

    order = pc.sort_indices(
        tbl,
        sort_keys=[("lastmod_ts", "descending"), ("url", "ascending")],
    )
    tbl = tbl.take(order)
    # first occurrence after the sort = newest lastmod per url
    urls = tbl.column("url").to_pylist()
    seen: set[str] = set()
    keep_urls: list[str] = []
    for u in urls:
        if u not in seen:
            seen.add(u)
            keep_urls.append(u)
    return pa.table(
        {
            "url": pa.array(keep_urls, pa.string()),
            "max_depth": pa.array([max_depth] * len(keep_urls), pa.int32()),
        }
    )


def sitemap_bytes(table: pa.Table, *, index: bool = False,
                  gzipped: bool = False) -> bytes:
    """Rows -> sitemaps.org XML (urlset, or sitemapindex with
    ``index=True``).  The writer half of the round-trip test and the
    export path for interchange with sitemap tooling."""
    ns = "http://www.sitemaps.org/schemas/sitemap/0.9"
    root_tag, entry_tag = (
        ("sitemapindex", "sitemap") if index else ("urlset", "url")
    )
    parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n<{root_tag} '
             f'xmlns="{ns}">']
    for row in table.to_pylist():
        parts.append(f"<{entry_tag}>")
        parts.append(f"<loc>{_xml_escape(row['url'])}</loc>")
        ts = row.get("lastmod_ts")
        # lastmod_ts == 0 is the absent-lastmod sentinel (module
        # contract: absence is information) — a 1970-01-01 datetime is
        # truthy, so compare against the epoch, not bool(ts).
        # (naive .timestamp() is TZ-dependent; compare fields instead)
        _is_epoch = (
            ts is not None
            and getattr(ts, "year", 0) == 1970
            and getattr(ts, "month", 0) == 1
            and getattr(ts, "day", 0) == 1
            and getattr(ts, "hour", 1) == 0
            and getattr(ts, "minute", 1) == 0
            and getattr(ts, "second", 1) == 0
            and getattr(ts, "microsecond", 1) == 0
        )
        if ts and hasattr(ts, "strftime") and not _is_epoch:
            parts.append(
                f"<lastmod>{ts.strftime('%Y-%m-%dT%H:%M:%S+00:00')}"
                f"</lastmod>"
            )
        if not index:
            if row.get("changefreq"):
                parts.append(
                    f"<changefreq>{_xml_escape(row['changefreq'])}"
                    f"</changefreq>"
                )
            pr = row.get("priority", -1)
            if pr is not None and pr >= 0:
                parts.append(f"<priority>{pr / 1000:.3f}</priority>")
        parts.append(f"</{entry_tag}>")
    parts.append(f"</{root_tag}>\n")
    out = "".join(parts).encode()
    return gzip.compress(out) if gzipped else out


# -- robots.txt Sitemap: discovery ------------------------------------------

def _sitemap_local_paths(fixture_dir: str, sitemap_urls) -> list[str]:
    """Pinned sandbox transport for advertised sitemaps: the sitemap
    URL's host maps to ``<fixture>/sitemaps/<host>.xml`` (no network
    in this environment; a live deployment would fetch the URL through
    the same LiveFetcher seam).  Missing files are skipped — a robots
    body may advertise a sitemap the archive never captured."""
    import os

    from spider_ray.core.canon import canonicalize
    from spider_ray.core.scope import split_host_pq

    paths: list[str] = []
    seen: set[str] = set()
    for u in sitemap_urls:
        cu = canonicalize(u)
        if cu is None:
            continue
        host, _ = split_host_pq(cu)
        p = os.path.join(fixture_dir, "sitemaps", f"{host}.xml")
        if p not in seen and os.path.exists(p):
            seen.add(p)
            paths.append(p)
    return sorted(paths)


def seeds_from_robots(fixture_dir: str) -> list[str]:
    """Crawl-seed discovery from robots.txt ``Sitemap:`` directives —
    the reference-grade bootstrap: robots bodies are parsed for
    advertised sitemaps, those sitemaps are read, and their urls
    become the seed list.

    Engine shape: the robots table (one row per domain — 10^8 rows at
    web scale) parses DISTRIBUTED in map_batches; only the discovered
    (host, sitemap_url) rows — bounded by how many domains advertise
    sitemaps — collect to the driver, and the sitemap files then parse
    one task per file through sources.read_sitemaps.  Seed lists are
    bounded by contract (they gate a crawl, not stream through it;
    sitemap_seed_table's rule).  Sequential twin:
    seeds_from_robots_seq — the differential pair for the discovery
    path."""
    import os

    import ray.data

    from spider_ray.core.robots import parse_robots

    robots_path = os.path.join(fixture_dir, "robots.parquet")
    ds = ray.data.read_parquet(robots_path, columns=["body"])

    def discover(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        for body in t.column("body").to_pylist():
            urls.extend(parse_robots(bytes(body)).sitemaps)
        return pa.table({"sitemap_url": pa.array(urls, pa.string())})

    found = [r["sitemap_url"]
             for r in ds.map_batches(discover,
                                     batch_format="pyarrow").take_all()]
    paths = _sitemap_local_paths(fixture_dir, found)
    if not paths:
        return []
    # depth is a crawl-config scalar, applied by the caller (the CLI's
    # max_depth override) — the seed-table column is not consumed here
    return sitemap_seed_table(
        read_sitemaps(paths)
    ).column("url").to_pylist()


def seeds_from_robots_seq(fixture_dir: str) -> list[str]:
    """Sequential no-Ray twin of seeds_from_robots (golden pair):
    plain loops over robots bodies and sitemap files, the
    newest-lastmod-first-per-url rule reproduced with a python sort."""
    import os

    import pyarrow.parquet as pq

    from spider_ray.core.robots import parse_robots

    robots = pq.read_table(
        os.path.join(fixture_dir, "robots.parquet"), columns=["body"])
    found: list[str] = []
    for body in robots.column("body").to_pylist():
        found.extend(parse_robots(bytes(body)).sitemaps)
    rows: list[tuple[int, str]] = []
    for p in _sitemap_local_paths(fixture_dir, found):
        with open(p, "rb") as f:
            t = parse_sitemap_bytes(f.read())
        # int64 microsecond view of lastmod_ts — naive-datetime
        # .timestamp() is TZ-dependent (this module's own lastmod
        # contract note), the arrow cast is not
        for kind, url, ts_us in zip(
            t.column("kind").to_pylist(),
            t.column("url").to_pylist(),
            t.column("lastmod_ts").cast(pa.int64()).to_pylist(),
        ):
            if kind == "url":
                rows.append((ts_us or 0, url))
    rows.sort(key=lambda r: (-r[0], r[1]))
    seen: set[str] = set()
    out: list[str] = []
    for _, u in rows:
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


def sitemaps_from_crawl(ckpt_dir: str, out_dir: str) -> pa.Table:
    """Publish-direction sitemap export: every url the crawl extracted
    (the checkpoint's ``round=*/out`` tables) becomes one
    sitemaps.org urlset per host under ``out_dir/<host>.xml``, plus a
    ``sitemap_index.xml`` advertising them — the write half that
    round-trips through read_sitemaps / the robots seed-discovery
    convention (a re-crawl seeded from the export visits exactly the
    published set).

    Scale shape: pruned single-column url read -> host projection ->
    ONE host range-partition; equal hosts never split across blocks
    (the ops-layer sort contract), so each block writes its hosts'
    files independently — a partitioned file sink, no driver-side url
    list.  Returns the (host, path, n_urls) manifest (one row per
    host; the bounded index input).  Urls are de-duplicated and
    sorted per host, so the export is byte-deterministic for a given
    crawl."""
    import glob
    import os

    import ray.data

    files = sorted(glob.glob(
        os.path.join(ckpt_dir, "round=*", "out", "*.parquet")))
    if not files:
        raise FileNotFoundError(
            f"no extracted outputs under {ckpt_dir}/round=*/out")
    os.makedirs(out_dir, exist_ok=True)
    ds = ray.data.read_parquet(files, columns=["url"])

    def host_col(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        return pa.table({
            "host": pa.array([u.split("/", 3)[2] for u in urls],
                             pa.string()),
            "url": pa.array(urls, pa.string()),
        })

    def write_block(t: pa.Table) -> pa.Table:
        by: dict[str, list[str]] = {}
        for h, u in zip(t.column("host").to_pylist(),
                        t.column("url").to_pylist()):
            by.setdefault(h, []).append(u)
        hosts, paths, counts = [], [], []
        for h in sorted(by):
            urls = sorted(set(by[h]))
            xml = sitemap_bytes(
                pa.table({"url": pa.array(urls, pa.string())}))
            p = os.path.join(out_dir, f"{h}.xml")
            with open(p, "wb") as f:
                f.write(xml)
            hosts.append(h)
            paths.append(p)
            counts.append(len(urls))
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "path": pa.array(paths, pa.string()),
            "n_urls": pa.array(counts, pa.int64()),
        })

    manifest = pa.Table.from_pylist(
        ds.map_batches(host_col, batch_format="pyarrow")
        .sort("host")
        .map_batches(write_block, batch_size=None, batch_format="pyarrow")
        .take_all(),
        schema=pa.schema([("host", pa.string()), ("path", pa.string()),
                          ("n_urls", pa.int64())]),
    ).sort_by("host")
    idx = sitemap_bytes(
        pa.table({"url": pa.array(
            [f"https://{h}/sitemap.xml"
             for h in manifest.column("host").to_pylist()], pa.string())}),
        index=True,
    )
    with open(os.path.join(out_dir, "sitemap_index.xml"), "wb") as f:
        f.write(idx)
    return manifest
