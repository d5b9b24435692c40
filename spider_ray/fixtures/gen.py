"""Deterministic synthetic-web generator — FIXTURES.md §1–§4.

Generates, for a named scale, the four fixture inputs the crawl engine
and the oracle consume:

    pages.parquet   (url, warc_ts, html, text, lang)   — Table P
    seeds.parquet   (url, max_depth)
    robots.parquet  (host, body, crawl_delay_s)
    config.json     (allowed domains, per-domain exclusion rules, knobs)

Everything is keyed off sha1 — no ``random`` module, no wall clock —
so regeneration is byte-reproducible (seed 42 is implicit in the fixed
constants).  The ``text`` column is ``extract_text(html)`` computed
here with the same kernel the engine uses, which realizes the
"byte-identical extracted text per url" invariant by construction
(BASELINE.json input_hint).

Topology (FIXTURES.md §1): D domains ``site{i:04d}.example``; every
5th domain additionally serves every 10th page from host
``sub.site{i:04d}.example`` (exercises registrable-domain grouping);
domain 0 is hot — 10x the median page count, linked from every domain,
crawl-delay 0.1s (exercises salting + budget skew).
"""

from __future__ import annotations

import hashlib
import json
import os
from concurrent.futures import ProcessPoolExecutor

import pyarrow as pa
import pyarrow.parquet as pq

from spider_ray.core.extract import extract_text
from spider_ray.core.schemas import PAGES, ROBOTS, SEEDS
from spider_ray.fixtures.lorem import lorem

SCALES = {
    # name: (D domains, median pages/domain, n_seeds, max_depth,
    #        lorem words lo..hi, crawl-delay scale)
    # words 20..80 (~2 KB html) for correctness scales; "benchfat" uses
    # Common-Crawl-realistic page weight (~15-25 KB html, ~10-20 ms
    # parse) and 10x politeness budgets so the scaling benchmark is
    # extraction-compute-bound like a real crawl, not overhead-bound.
    "micro": (20, 50, 10, 4, (20, 80), 1.0),
    "small": (60, 150, 30, 5, (20, 80), 1.0),
    "bench": (200, 500, 100, 6, (20, 80), 1.0),
    "benchfat": (200, 500, 100, 6, (1500, 3000), 0.01),
}

_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
_LANGS = ["en", "de", "fr", "es", "zh"]


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")


def pages_per_domain(i: int, median: int) -> int:
    if i == 0:
        return 10 * median
    return median + ((i * 7) % 11) - 5


def host_of(i: int, j: int) -> str:
    base = f"site{i:04d}.example"
    if i % 5 == 0 and j % 10 == 7:
        return f"sub.{base}"
    return base


def path_of(j: int) -> str:
    return "/" if j == 0 else f"/p/{j}"


def url_of(i: int, j: int) -> str:
    return f"https://{host_of(i, j)}{path_of(j)}"


def links_of(i: int, j: int, p_i: int, d: int) -> list[str]:
    """Raw hrefs of page (i, j) in document order (FIXTURES.md §1 a–e)."""
    cur_host = host_of(i, j)
    hrefs: list[str] = []
    # (a) intra-domain triple, duplicates kept
    for k in ((j * 3 + 1) % p_i, (j * 3 + 2) % p_i, (j * 7 + 5) % p_i):
        if host_of(i, k) == cur_host:
            hrefs.append(path_of(k))
        else:
            hrefs.append(url_of(i, k))  # cross-host same registrable domain
    # (b) cross-domain to page 0 of domain (i+j) % D
    if j % 4 == 0:
        hrefs.append(url_of((i + j) % d, 0))
    # (c) excluded path
    if j % 5 == 0:
        hrefs.append(f"/private/x{j}")
    # (d) relative + query/fragment variants
    hrefs.append(f"../p/{(j + 1) % p_i}")
    hrefs.append(f"/p/{j}?a=1#frag")
    # (e) rejected schemes
    hrefs.append("mailto:contact@example.com")
    hrefs.append("javascript:void(0)")
    return hrefs


def html_of(i: int, j: int, p_i: int, d: int,
            words: tuple[int, int] = (20, 80)) -> bytes:
    url = url_of(i, j)
    domain = f"site{i:04d}.example"
    seed = hashlib.sha1(url.encode()).digest()
    lo_w, hi_w = words
    n_words = lo_w + _h(url + "#words") % (hi_w - lo_w + 1)
    if hi_w > 500:
        # fat mode (benchfat): realistic tag density — many short
        # paragraphs with inline markup, so parse cost matches real
        # Common-Crawl pages (thousands of tags) instead of one cheap
        # text node
        ws = lorem(seed, n_words).split(" ")
        paras = []
        for p0 in range(0, len(ws), 8):
            chunk = ws[p0 : p0 + 8]
            if len(chunk) > 3:
                chunk[1] = f"<b>{chunk[1]}</b>"
                chunk[3] = f"<i>{chunk[3]}</i>"
            paras.append(
                f'<p class="t{p0}">{" ".join(chunk)}</p>'
                f"<div><span>sep {p0}</span><br></div>"
            )
        para = "\n".join(paras)
    else:
        para = lorem(seed, n_words)
    items = "".join(
        f'<li><a href="{href}">link {k}</a></li>'
        for k, href in enumerate(links_of(i, j, p_i, d))
    )
    return (
        f'<html><head><title>{domain} page {j}</title>'
        f'<script>var x="NOISE{j}";</script>\n'
        f"<style>.c{{color:red}}</style></head>\n"
        f"<body><h1>Heading {j} of {domain}</h1>\n"
        f"<p>Deterministic paragraph {j}: {para}</p>\n"
        f"<div>Nested <b>inline {j}</b> text<br>after break</div>\n"
        f"<ul>{items}</ul>\n"
        f"<noscript>HIDDEN</noscript></body></html>"
    ).encode("utf-8")


def lang_of(url: str) -> str:
    r = _h(url + "#lang") % 100
    if r < 60:
        return _LANGS[0]
    return _LANGS[1 + (r - 60) // 10]


def _gen_domain_chunk(args) -> dict:
    """Generate all page rows for domains [lo, hi) — process-pool unit."""
    lo, hi, median, d, words = args
    urls, htmls, texts, langs, ordinals = [], [], [], [], []
    for i in range(lo, hi):
        p_i = pages_per_domain(i, median)
        for j in range(p_i):
            u = url_of(i, j)
            h = html_of(i, j, p_i, d, words)
            urls.append(u)
            htmls.append(h)
            texts.append(extract_text(h))
            langs.append(lang_of(u))
            ordinals.append((i, j))
    return {"urls": urls, "htmls": htmls, "texts": texts, "langs": langs,
            "ordinals": ordinals}


def generate(scale: str, outdir: str, processes: int | None = None) -> None:
    d, median, n_seeds, max_depth, words, delay_scale = SCALES[scale]
    os.makedirs(outdir, exist_ok=True)

    # ---- pages (parallel over domain chunks; deterministic by order) ----
    nproc = processes or min(8, os.cpu_count() or 1)
    bounds = []
    step = max(1, d // (nproc * 4))
    lo = 0
    while lo < d:
        bounds.append((lo, min(d, lo + step), median, d, words))
        lo += step
    if nproc > 1 and d > 4:
        with ProcessPoolExecutor(max_workers=nproc) as ex:
            chunks = list(ex.map(_gen_domain_chunk, bounds))
    else:
        chunks = [_gen_domain_chunk(b) for b in bounds]

    urls = [u for c in chunks for u in c["urls"]]
    htmls = [h for c in chunks for h in c["htmls"]]
    texts = [t for c in chunks for t in c["texts"]]
    langs = [l for c in chunks for l in c["langs"]]
    ts = [_EPOCH_US + k * 1_000_000 for k in range(len(urls))]
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES,
    )
    # fat pages get small row groups: the bucketed fetch reads whole row
    # groups per URL match, so group size bounds read amplification
    rg = 512 if words[1] > 500 else 4096
    pq.write_table(pages, os.path.join(outdir, "pages.parquet"),
                   row_group_size=rg)

    # ---- pages_v2: the corpus one re-visit interval later ---------------
    # every third page (by url hash) changed: a deterministic paragraph
    # appended before </body>, text re-extracted; warc_ts advanced one
    # day.  Correctness scales only — benchfat never exercises revisit
    # and re-extracting 100k fat pages would dominate generation time.
    if words[1] <= 500:
        v2_htmls, v2_texts, v2_ts = [], [], []
        for u, h, t, ts0 in zip(urls, htmls, texts, ts):
            if _h(u + "#rev") % 3 == 0:
                marker = f"<p>updated rev {_h(u + '#rev2') % 1000}</p></body>"
                h2 = h.replace(b"</body>", marker.encode(), 1)
                v2_htmls.append(h2)
                v2_texts.append(extract_text(h2))
                v2_ts.append(ts0 + 86_400_000_000)
            else:
                v2_htmls.append(h)
                v2_texts.append(t)
                v2_ts.append(ts0)
        pages_v2 = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(v2_ts, pa.timestamp("us")),
                "html": pa.array(v2_htmls, pa.binary()),
                "text": pa.array(v2_texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            },
            schema=PAGES,
        )
        pq.write_table(pages_v2, os.path.join(outdir, "pages_v2.parquet"),
                       row_group_size=rg)

    # ---- seeds ----------------------------------------------------------
    stride = max(1, d // n_seeds)
    seed_domains = list(range(0, d, stride))[:n_seeds]
    seeds = pa.table(
        {
            "url": pa.array([f"https://site{i:04d}.example/" for i in seed_domains]),
            "max_depth": pa.array([max_depth] * len(seed_domains), pa.int32()),
        },
        schema=SEEDS,
    )
    pq.write_table(seeds, os.path.join(outdir, "seeds.parquet"))

    # ---- robots ---------------------------------------------------------
    hosts = sorted(
        {host_of(i, j) for i in range(d) for j in range(pages_per_domain(i, median))}
    )
    r_hosts, r_bodies, r_delays = [], [], []
    for host in hosts:
        if (delay_scale >= 1.0 and _h(host + "#robots") % 5 == 0
                and host != "site0000.example"):
            # 20% of hosts have no robots.txt -> allow-all, default 1s
            # delay (correctness scales only; the bench scale covers all
            # hosts so no domain falls back to the 60/round default
            # budget and drags a long low-work round tail)
            continue
        body = "User-agent: *\nDisallow: /private/\n"
        if _h(host + "#agent") % 7 == 0:
            body += "\nUser-agent: spider-ray\nDisallow: /p/13\n"
        if host == "site0000.example":
            delay = 0.1 * delay_scale  # hot domain: big budget -> skew
        else:
            delay = (0.5, 1.0, 2.0, 5.0)[_h(host + "#delay") % 4] * delay_scale
        r_hosts.append(host)
        r_bodies.append(body.encode())
        r_delays.append(delay)
    robots = pa.table(
        {
            "host": pa.array(r_hosts),
            "body": pa.array(r_bodies, pa.binary()),
            "crawl_delay_s": pa.array(r_delays, pa.float64()),
        },
        schema=ROBOTS,
    )
    pq.write_table(robots, os.path.join(outdir, "robots.parquet"))

    # ---- config ---------------------------------------------------------
    domains = [f"site{i:04d}.example" for i in range(d)]
    exclusions = {
        dom: ["^/private/"] + ([r"\?a="] if i % 5 == 3 else [])
        for i, dom in enumerate(domains)
    }
    with open(os.path.join(outdir, "config.json"), "w") as f:
        json.dump(
            {
                "scale": scale,
                "allowed_domains": domains,
                "exclusions": exclusions,
                "max_depth": max_depth,
            },
            f,
            indent=1,
            sort_keys=True,
        )


# hrefs inject_trap_links adds: a repeated-segment path cycle and a
# faceted-search query explosion (both trip core/traps.py at default
# thresholds; neither resolves to a corpus page, so with the guard OFF
# they crawl as fetch misses)
TRAP_PATH = "/t/t/t/t/x"
TRAP_QUERY = "/p/1?" + "&".join(f"f{i}=v" for i in range(10))


def _derive_pages(src_dir: str, dst_dir: str, mutate) -> str:
    """Shared scaffold of the pages-mutating fixture derivations
    (trap/canonical/hreflang injection): copy the sidecars, let
    ``mutate(urls, htmls, texts)`` edit the row lists in place
    (callers recompute ``texts`` with the shared extraction kernel so
    the byte-identity invariant holds by construction), rebuild the
    table on the source schema.  One scaffold — a pages schema change
    is one edit, not three."""
    import shutil

    os.makedirs(dst_dir, exist_ok=True)
    for name in ("config.json", "robots.parquet", "seeds.parquet"):
        shutil.copy(os.path.join(src_dir, name), os.path.join(dst_dir, name))
    pages = pq.read_table(os.path.join(src_dir, "pages.parquet"))
    urls = pages.column("url").to_pylist()
    htmls = pages.column("html").to_pylist()
    texts = pages.column("text").to_pylist()
    mutate(urls, htmls, texts)
    out = pa.table(
        {
            "url": pages.column("url"),
            "warc_ts": pages.column("warc_ts"),
            "html": pa.array(htmls, pages.schema.field("html").type),
            "text": pa.array(texts, pages.schema.field("text").type),
            "lang": pages.column("lang"),
        },
        schema=pages.schema,
    )
    pq.write_table(out, os.path.join(dst_dir, "pages.parquet"))
    return dst_dir


def inject_trap_links(src_dir: str, dst_dir: str, every: int = 7) -> str:
    """Derive a trap-injected fixture: trap hrefs appended to every
    ``every``-th page's html.  Deterministic — shared by the golden
    generator (goldens.crawl_trap_guard_golden), the harness query
    (__ray_entry__._crawl_trap_guard) and tests/test_crawl_traps.py."""
    inject = (
        f'<a href="{TRAP_PATH}">loop</a>'
        f'<a href="{TRAP_QUERY}">facets</a>'
    ).encode()

    def mutate(urls, htmls, texts):
        for i in range(0, len(htmls), every):
            h = htmls[i]
            j = h.rfind(b"</body>")
            if j == -1:
                continue
            htmls[i] = h[:j] + inject + h[j:]
            texts[i] = extract_text(htmls[i])

    return _derive_pages(src_dir, dst_dir, mutate)


def inject_canonical_links(src_dir: str, dst_dir: str,
                           every: int = 5) -> str:
    """Derive a canonical-annotated fixture: every ``every``-th page
    (by table row order, which generation pins) declares a
    ``<link rel="canonical">`` in its head, pointing at the page at
    row ``k - (k % (3*every))`` — rows at multiples of ``3*every``
    therefore self-canonicalize.  Deterministic; shared by the golden
    generator (goldens.canonical_clusters_golden), the harness query
    and the webgraph tests."""
    def mutate(urls, htmls, texts):
        for k in range(0, len(htmls), every):
            target = urls[k - (k % (3 * every))]
            tag = f'<link rel="canonical" href="{target}">'.encode()
            htmls[k] = htmls[k].replace(b"<head>", b"<head>" + tag, 1)
            texts[k] = extract_text(htmls[k])

    return _derive_pages(src_dir, dst_dir, mutate)


def inject_hreflang_links(src_dir: str, dst_dir: str,
                          every: int = 6) -> str:
    """Derive an hreflang-annotated fixture: rows k, k+1, k+2 for
    every ``every``-th k form a language-variant group — each member
    declares the full self-referencing alternate set
    (<link rel="alternate" hreflang=en|de|fr href=...>) per the
    hreflang spec's recommendation.  Deterministic; input for the
    hreflang_variants pair (webgraph + goldens)."""
    _LANGS3 = ("en", "de", "fr")

    def mutate(urls, htmls, texts):
        for k in range(0, len(urls) - 2, every):
            group = [k, k + 1, k + 2]
            tags = "".join(
                f'<link rel="alternate" hreflang="{_LANGS3[j]}" '
                f'href="{urls[m]}">'
                for j, m in enumerate(group)
            ).encode()
            for m in group:
                htmls[m] = htmls[m].replace(b"<head>", b"<head>" + tags, 1)
                texts[m] = extract_text(htmls[m])

    return _derive_pages(src_dir, dst_dir, mutate)


def inject_robots_sitemaps(src_dir: str, dst_dir: str,
                           every: int = 3) -> str:
    """Derive a sitemap-advertising fixture: every ``every``-th host
    (robots row order, pinned by generation) gains a ``Sitemap:``
    directive in its robots body, and the advertised file is written
    under ``<dst>/sitemaps/<host>.xml`` listing every 4th of that
    host's pages (url sort order) — the deterministic input for the
    robots->sitemap seed-discovery pair
    (sources.seeds_from_robots / seeds_from_robots_seq)."""
    import shutil

    from spider_ray.sources.sitemap import sitemap_bytes

    os.makedirs(os.path.join(dst_dir, "sitemaps"), exist_ok=True)
    for name in ("config.json", "seeds.parquet", "pages.parquet",
                 "pages_v2.parquet"):
        src = os.path.join(src_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(dst_dir, name))
    by_host: dict = {}
    for u in pq.read_table(os.path.join(src_dir, "pages.parquet"),
                           columns=["url"]).column("url").to_pylist():
        host = u.split("/", 3)[2]
        by_host.setdefault(host, []).append(u)
    robots = pq.read_table(os.path.join(src_dir, "robots.parquet"))
    hosts = robots.column("host").to_pylist()
    bodies = robots.column("body").to_pylist()
    for i in range(0, len(hosts), every):
        h = hosts[i]
        urls = sorted(by_host.get(h, []))[::4]
        if not urls:
            continue
        bodies[i] = bodies[i] + (
            f"\nSitemap: https://{h}/sitemap.xml\n".encode()
        )
        xml = sitemap_bytes(pa.table({"url": pa.array(urls, pa.string())}))
        with open(os.path.join(dst_dir, "sitemaps", f"{h}.xml"), "wb") as f:
            f.write(xml)
    out = pa.table(
        {
            "host": robots.column("host"),
            "body": pa.array(bodies, robots.schema.field("body").type),
            "crawl_delay_s": robots.column("crawl_delay_s"),
        },
        schema=robots.schema,
    )
    pq.write_table(out, os.path.join(dst_dir, "robots.parquet"))
    return dst_dir


_ENTRY_FIXTURE = "/tmp/spider_ray_entry/fixture_micro"


def ensure_micro_fixture(path: str = _ENTRY_FIXTURE) -> str:
    """ONE cache-validity rule for the shared micro-fixture cache
    (previously duplicated in __ray_entry__ and pipelines.webgraph —
    a drifted copy would feed different corpora to crawl vs webgraph
    queries in the same run).  pages_v2 is the newest generated
    artifact; its absence means a stale or partial cache."""
    import shutil

    if not os.path.exists(os.path.join(path, "pages_v2.parquet")):
        shutil.rmtree(path, ignore_errors=True)
        generate("micro", path)
    return path


def ensure_derived_fixture(base_dir: str, dst_dir: str, derive) -> str:
    """Cache a derived fixture (trap/canonical injection) with a
    completion sentinel written AFTER ``derive`` finishes: re-derive
    when the sentinel is missing (crash mid-write left a partial
    corpus) or older than the base pages table (base regenerated —
    a bare pages.parquet existence check passed stale caches)."""
    import shutil

    sent = os.path.join(dst_dir, "_derived")
    base_pages = os.path.join(base_dir, "pages.parquet")
    if (not os.path.exists(sent)
            or os.path.getmtime(sent) < os.path.getmtime(base_pages)):
        shutil.rmtree(dst_dir, ignore_errors=True)
        derive(base_dir, dst_dir)
        with open(sent, "w") as f:
            f.write("ok")
    return dst_dir


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="generate synthetic-web fixtures")
    ap.add_argument("scale", choices=sorted(SCALES))
    ap.add_argument("outdir")
    ap.add_argument("--processes", type=int, default=None)
    args = ap.parse_args()
    generate(args.scale, args.outdir, args.processes)


if __name__ == "__main__":
    main()
