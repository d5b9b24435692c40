"""Web link-graph analytics over the crawl corpus (webtext family).

The crawl engine's own corpus IS a graph: every page's <a href> set is
an edge list.  This module derives the host-level link graph from the
pages table and runs authority analytics on it — the signals a real
crawler feeds back into frontier prioritization (SURVEY.md §2
extension; the "domain-rate + depth" priority key of T4 is exactly
where a host authority score would plug in).

Two pinned operators, both driver-gate-visible with sequential
goldens (spider_ray/goldens.py):

* ``host_link_graph`` — (src_host, dst_host, n): one row per directed
  host pair, n = number of href occurrences (multi-edges counted).
  Engine: pruned (url, html) read -> per-document extract kernel in
  ``map_batches`` (the same two-speed scanner the crawl's M7/M8 stage
  uses) -> one bounded=False partial-sum shuffle on the host pair.
  The golden twin parses with the STDLIB HTMLParser reference
  extractor, so engine scanner and oracle parser are differential by
  construction.
* ``host_pagerank`` — (host, pr): integer fixed-point PageRank
  (millionths, damping 85/100, 5 supersteps) over the DISTINCT
  self-loop-free host edges.  Same Pregel shape as
  graph.pagerank_order_part: one co-partitioned join + one
  partial-aggregated groupby per superstep, nothing data-sized on the
  driver.  Hosts with no in-links keep the base rank via a
  zero-contribution row per node unioned into every superstep's sum
  (never a driver-side fixup).  Dangling hosts (no out-links) drop
  their mass — pinned simplification, mirrored by the golden.

Scale shape: at 100 TB the pages read streams (column-pruned to
url+html), the extract map is embarrassingly parallel, and the only
exchanges are the (src,dst)-keyed aggregation and the per-superstep
join/agg pair — each moving one row per edge/node.  Host cardinality
(~10^8) stays distributed end-to-end.

Like the crawl_* queries, both entries ignore ``sf_dir``: the driver's
TPC-H tables carry no pages corpus, so the deterministic micro fixture
is the pinned input (BASELINE.json input_hint shape).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from spider_ray import ops
from spider_ray.core.canon import canonicalize
from spider_ray.core.extract import extract_anchors, extract_links
from spider_ray.core.scope import split_host_pq
from spider_ray.goldens import golden_sql

PR_ITERATIONS = 5
PR_INIT = 1_000_000
PR_BASE = 150_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100

def _ensure_micro_fixture() -> str:
    from spider_ray.fixtures.gen import ensure_micro_fixture

    return ensure_micro_fixture()


def _page_host_edges(urls: list[str], htmls: list[bytes],
                     links_of) -> tuple[list[str], list[str]]:
    """Shared per-page edge kernel: (src_hosts, dst_hosts) with one
    entry per canonicalizable href occurrence.  ``links_of`` is the
    href extractor — the fast scanner in the engine, the stdlib
    reference parser in the golden."""
    srcs: list[str] = []
    dsts: list[str] = []
    for url, html in zip(urls, htmls):
        cu = canonicalize(url)
        if cu is None:  # corpus urls are canonical; defensive only
            continue
        src_host, _ = split_host_pq(cu)
        for href in links_of(html):
            child = canonicalize(href, base=url)
            if child is None:
                continue
            dst_host, _ = split_host_pq(child)
            srcs.append(src_host)
            dsts.append(dst_host)
    return srcs, dsts


def host_link_graph(sf_dir: str):
    """Directed host-level link graph of the micro corpus:
    (src_host, dst_host, n) sorted by the pair."""
    fixture = _ensure_micro_fixture()
    pages = ray.data.read_parquet(
        os.path.join(fixture, "pages.parquet"), columns=["url", "html"]
    )

    def edges(t: pa.Table) -> pa.Table:
        srcs, dsts = _page_host_edges(
            t.column("url").to_pylist(), t.column("html").to_pylist(),
            extract_links,
        )
        return pa.table({
            "src_host": pa.array(srcs, pa.string()),
            "dst_host": pa.array(dsts, pa.string()),
        })

    counted = ops.partial_sum_agg(
        pages.map_batches(edges, batch_format="pyarrow"),
        keys=["src_host", "dst_host"], sums={}, counts="n",
        bounded=False,  # host-pair domain is data-sized
    )
    return counted.sort(["src_host", "dst_host"])


def host_pagerank(sf_dir: str, iterations: int = PR_ITERATIONS):
    """Integer fixed-point PageRank over the distinct self-loop-free
    host edges of the micro corpus: (host, pr) sorted by host."""
    edges_all = host_link_graph(sf_dir)

    def distinct_no_loops(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("src_host"), t.column("dst_host"))
        t = t.filter(keep)
        return pa.table({"src": t.column("src_host"),
                         "dst": t.column("dst_host")})

    # host_link_graph output is already one row per distinct pair;
    # materialized: three consumers (deg, the edges_deg join, the
    # node derivation) would each re-run the full corpus extract
    edges = edges_all.map_batches(distinct_no_loops,
                                  batch_format="pyarrow").materialize()
    deg = ops.partial_sum_agg(
        edges, keys=["src"], sums={}, counts="d", bounded=False
    )
    edges_deg = ops.partitioned_hash_join(edges, deg, on="src")\
        .materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            t.select(["src"]).rename_columns(["node"]),
            t.select(["dst"]).rename_columns(["node"]),
        ])

    nodes = ops.partial_sum_agg(
        edges.map_batches(both_ends, batch_format="pyarrow"),
        keys=["node"], sums={}, counts="_n", bounded=False,
    ).map_batches(
        lambda t: pa.table({"node": t.column("node")}),
        batch_format="pyarrow",
    ).materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"),
             "pr": pa.array(np.full(len(t), PR_INIT, np.int64))}),
        batch_format="pyarrow",
    ).materialize()

    zero_rows = nodes.map_batches(
        lambda t: pa.table(
            {"dst": t.column("node"),
             "c": pa.array(np.zeros(len(t), np.int64))}),
        batch_format="pyarrow",
    )

    for _ in range(iterations):
        sends = ops.partitioned_hash_join(
            edges_deg,
            ranks.map_batches(
                lambda t: t.rename_columns(["src", "pr"]),
                batch_format="pyarrow"),
            on="src",
        )

        def contrib(t: pa.Table) -> pa.Table:
            pr = t.column("pr").to_numpy(zero_copy_only=False)
            d = t.column("d").to_numpy(zero_copy_only=False)
            return pa.table({"dst": t.column("dst"),
                             "c": pa.array(pr // d)})

        sums = ops.partial_sum_agg(
            sends.map_batches(contrib, batch_format="pyarrow")
                 .union(zero_rows),
            keys=["dst"], sums={"c": "s"}, counts=None, bounded=False,
        )
        ranks = sums.map_batches(
            lambda t: pa.table(
                {"node": t.column("dst"),
                 "pr": pa.array(
                     PR_BASE
                     + (PR_DAMP_NUM
                        * t.column("s").to_numpy(zero_copy_only=False))
                     // PR_DAMP_DEN)}),
            batch_format="pyarrow",
        ).materialize()

    return ranks.sort("node")


def anchor_texts(sf_dir: str):
    """In-link anchor-text aggregation — the classic web relevance
    signal: for every canonical link target, the texts pages link to
    it WITH, counted.  (dst_url, anchor_text, n) sorted by the pair;
    empty anchors (image links, self-closed <a>) are kept — absence of
    text is itself signal.

    Engine: per-document ``extract_anchors`` kernel (the fast
    scanner's A.8 span path) in ``map_batches`` -> ONE pair-keyed
    bounded=False partial-sum shuffle.  The anchor kernel caps each
    text at 256 chars, so shuffle row width is bounded by spec, not by
    remote-controlled content.  Golden twin parses with the stdlib
    reference extractor (differential by construction)."""
    fixture = _ensure_micro_fixture()
    pages = ray.data.read_parquet(
        os.path.join(fixture, "pages.parquet"), columns=["url", "html"]
    )

    def rows(t: pa.Table) -> pa.Table:
        dsts: list[str] = []
        texts: list[str] = []
        for url, html in zip(t.column("url").to_pylist(),
                             t.column("html").to_pylist()):
            for href, text in extract_anchors(html):
                child = canonicalize(href, base=url)
                if child is None:
                    continue
                dsts.append(child)
                texts.append(text)
        return pa.table({
            "dst_url": pa.array(dsts, pa.string()),
            "anchor_text": pa.array(texts, pa.string()),
        })

    counted = ops.partial_sum_agg(
        pages.map_batches(rows, batch_format="pyarrow"),
        keys=["dst_url", "anchor_text"], sums={}, counts="n",
        bounded=False,  # (url, text) domain is data-sized
    )
    return counted.sort(["dst_url", "anchor_text"])


def _resolve_canonical(url: str, html) -> str:
    """Pinned cluster key: the page's rel=canonical href canonicalized
    against the page URL; the page's own canonical form when the tag
    is absent or its href unresolvable."""
    from spider_ray.core.extract import extract_canonical

    href = extract_canonical(html)
    if href is not None:
        target = canonicalize(href, base=url)
        if target is not None:
            return target
    return canonicalize(url) or url


def canonical_clusters(sf_dir: str):
    """rel=canonical duplicate clustering — the crawl-side dedup
    signal sites themselves publish: pages declaring the same
    canonical target are one logical document.  Output one row per
    cluster: (canonical_url, n_pages, first_url = lexicographic min
    member).

    Engine: per-document extract_canonical kernel in ``map_batches``
    over the canonical-annotated micro fixture (derived via
    fixtures.gen.inject_canonical_links) -> ONE bounded=False
    multi-algebra shuffle (count + string-min in the same partial
    fold).  Golden twin: sequential dict loop over the same derived
    corpus (goldens.canonical_clusters_golden)."""
    from spider_ray.fixtures.gen import (ensure_derived_fixture,
                                         inject_canonical_links)

    base = _ensure_micro_fixture()
    fixture = ensure_derived_fixture(
        base, "/tmp/spider_ray_entry/fixture_canon",
        inject_canonical_links)
    pages = ray.data.read_parquet(
        os.path.join(fixture, "pages.parquet"), columns=["url", "html"]
    )

    def rows(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        return pa.table({
            "canonical_url": pa.array(
                [_resolve_canonical(u, h)
                 for u, h in zip(urls, t.column("html").to_pylist())],
                pa.string()),
            "url": pa.array(urls, pa.string()),
        })

    agg = ops.partial_sum_agg(
        pages.map_batches(rows, batch_format="pyarrow"),
        keys=["canonical_url"], sums={}, counts="n_pages",
        mins={"url": "first_url"},
        bounded=False,  # cluster-key domain is data-sized
    )
    return agg.sort("canonical_url")


_TEMPLATE_DIGITS = re.compile(r"[0-9]+")


def url_templates(sf_dir: str):
    """URL template mining — collapse every digit run to ``{n}`` and
    count occurrences: surfaces the parametric page families
    (/product/{n}, site{n}.example/page/{n}) a crawler uses for
    scheduling and trap heuristics.  (template, n) sorted by template.

    Engine: pruned single-column url read -> compiled-regex vectorized
    map -> ONE bounded=False template-keyed shuffle.  Oracle: a REAL
    computing DuckDB twin — ``regexp_replace(..., 'g') GROUP BY`` over
    the pinned url_list golden parquet (same deterministic url set the
    corpus generator emits), not a pinned result table."""
    fixture = _ensure_micro_fixture()
    pages = ray.data.read_parquet(
        os.path.join(fixture, "pages.parquet"), columns=["url"]
    )

    def templ(t: pa.Table) -> pa.Table:
        sub = _TEMPLATE_DIGITS.sub
        return pa.table({
            "template": pa.array(
                [sub("{n}", u) for u in t.column("url").to_pylist()],
                pa.string()),
        })

    counted = ops.partial_sum_agg(
        pages.map_batches(templ, batch_format="pyarrow"),
        keys=["template"], sums={}, counts="n",
        bounded=False,  # template domain is data-sized
    )
    return counted.sort("template")


def _host_id64(host: str) -> int:
    """Node id space for host connected components (CC propagates min
    labels over int64; the shared signed view keeps engine and golden
    min()s identical by construction — core.hashing owns it).
    Collisions (~n²/2⁶⁴) would merge two hosts; at 10⁸ hosts that is
    ~10⁻³ expected collisions — documented, and the same id space the
    seen-set already relies on."""
    from spider_ray.core.hashing import url_hash64_signed

    return url_hash64_signed(host)


def host_components(sf_dir: str):
    """Weakly-connected components of the host link graph — the
    site-neighborhood structure (link farms, language clusters,
    isolated islands) a crawl operator audits.  Output one row per
    host: (host, component_host) where component_host is the member
    whose A.2 hash64 is minimal — a content-derived representative,
    stable under repartition/resume.

    Engine: hosts hashed to int64 ids, ops.connected_components
    min-label propagation (one join + one partial-min fold per sweep,
    sweeps = component diameter), then ONE tagged co-partition join
    maps both id columns back to host strings.  Golden twin:
    sequential union-find over the stdlib-parsed edge set
    (goldens.host_components_golden)."""
    # materialized: both the id projection and the node derivation
    # consume it — unmaterialized, each re-runs the corpus extract
    edges_all = host_link_graph(sf_dir).materialize()

    def to_ids(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.array([_host_id64(h) for h in
                             t.column("src_host").to_pylist()],
                            pa.int64()),
            "dst": pa.array([_host_id64(h) for h in
                             t.column("dst_host").to_pylist()],
                            pa.int64()),
        })

    def to_nodes(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            t.select(["src_host"]).rename_columns(["host"]),
            t.select(["dst_host"]).rename_columns(["host"]),
        ])

    edges = edges_all.map_batches(to_ids, batch_format="pyarrow")
    hosts = ops.exact_dedup(
        edges_all.map_batches(to_nodes, batch_format="pyarrow"),
        keys=["host"], order_by=[],
    ).map_batches(
        lambda t: pa.table({
            "host": t.column("host"),
            "node": pa.array([_host_id64(h) for h in
                              t.column("host").to_pylist()], pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()

    cc = ops.connected_components(edges, hosts)
    # map node -> host and label -> host in one co-partitioned join
    # each (both sides small per-key; the label side joins the same
    # hosts table on its id column)
    cc_host = ops.partitioned_hash_join(cc, hosts, on="node")
    rep = hosts.map_batches(
        lambda t: pa.table({"label": t.column("node"),
                            "component_host": t.column("host")}),
        batch_format="pyarrow",
    )
    out = ops.partitioned_hash_join(cc_host, rep, on="label")
    return out.map_batches(
        lambda t: t.select(["host", "component_host"]),
        batch_format="pyarrow",
    ).sort("host")


def hreflang_variants(sf_dir: str):
    """Cross-language variant mapping — the hreflang declarations a
    multilingual site publishes: one row per (url, hreflang, alt_url)
    alternate edge over the hreflang-annotated derived fixture.  The
    variant GROUP is recoverable as the connected component of these
    edges; the flat mapping is the operator (hash-stable, oracle-
    friendly), the grouping composes with host_components' machinery.

    Engine: per-document extract_hreflang kernel in map_batches ->
    canonicalize against the page url -> one sort.  Golden twin:
    sequential loop, same kernel (goldens.hreflang_variants_golden)."""
    from spider_ray.core.extract import extract_hreflang
    from spider_ray.fixtures.gen import (ensure_derived_fixture,
                                         inject_hreflang_links)

    base = _ensure_micro_fixture()
    fixture = ensure_derived_fixture(
        base, "/tmp/spider_ray_entry/fixture_hreflang",
        inject_hreflang_links)
    pages = ray.data.read_parquet(
        os.path.join(fixture, "pages.parquet"), columns=["url", "html"]
    )

    def rows(t: pa.Table) -> pa.Table:
        us: list[str] = []
        ls: list[str] = []
        alts: list[str] = []
        for url, html in zip(t.column("url").to_pylist(),
                             t.column("html").to_pylist()):
            for hl, href in extract_hreflang(html):
                alt = canonicalize(href, base=url)
                if alt is None:
                    continue
                us.append(url)
                ls.append(hl)
                alts.append(alt)
        return pa.table({
            "url": pa.array(us, pa.string()),
            "hreflang": pa.array(ls, pa.string()),
            "alt_url": pa.array(alts, pa.string()),
        })

    return pages.map_batches(rows, batch_format="pyarrow")\
                .sort(["url", "hreflang", "alt_url"])


WEBGRAPH_QUERIES = {
    "host_link_graph": host_link_graph,
    "host_pagerank": host_pagerank,
    "anchor_texts": anchor_texts,
    "canonical_clusters": canonical_clusters,
    "url_templates": url_templates,
    "host_components": host_components,
    "hreflang_variants": hreflang_variants,
}

WEBGRAPH_ORACLE_SQL = {
    "host_link_graph": golden_sql("host_link_graph",
                                  "src_host, dst_host, n"),
    "host_pagerank": golden_sql("host_pagerank", "node, pr"),
    "anchor_texts": golden_sql("anchor_texts",
                               "dst_url, anchor_text, n"),
    "canonical_clusters": golden_sql("canonical_clusters",
                                     "canonical_url, n_pages, first_url"),
    # computing twin: DuckDB re-derives the templates from the pinned
    # url LIST (not a pinned result) — RE2 and python re agree on the
    # digit-run pattern by construction
    "url_templates": (
        "SELECT regexp_replace(url, '[0-9]+', '{n}', 'g') AS template, "
        "COUNT(*) AS n FROM ("
        + golden_sql("url_list")
        + ") GROUP BY template"
    ),
    "host_components": golden_sql("host_components",
                                  "host, component_host"),
    "hreflang_variants": golden_sql("hreflang_variants",
                                    "url, hreflang, alt_url"),
}
