"""Per-page link keeping — the shared kernel behind M8 + A.5/A.7.

Given one fetched page's URL and its raw hrefs (document order), produce
the canonical, in-scope child URLs with their first-occurrence position
``j``.  Used verbatim by the oracle simulator and by the engine's
extract stage, so both assign identical (link_index, seq) to every
child.
"""

from __future__ import annotations

from spider_ray.core.canon import canonicalize
from spider_ray.core.config import CrawlConfig
from spider_ray.core.regdomain import registrable_domain
from spider_ray.core.scope import is_excluded, split_host_pq
from spider_ray.core.seqs import MAX_LINKS_PER_PAGE


def kept_links(
    page_url: str, hrefs: list[str], cfg: CrawlConfig, counters: dict | None = None
) -> list[tuple[str, str, str, int]]:
    """[(canon_url, host, domain, j)] for the kept links of one page.

    Drops (with counters): non-http(s) schemes, out-of-scope registrable
    domains, exclusion-rule matches, repeat occurrences, positions past
    MAX_LINKS_PER_PAGE-1.
    """
    out: list[tuple[str, str, str, int]] = []
    seen_here: set[str] = set()
    c = counters if counters is not None else {}
    for href in hrefs:
        cu = canonicalize(href, base=page_url)
        if cu is None:
            c["links_scheme_rejected"] = c.get("links_scheme_rejected", 0) + 1
            continue
        host, pq = split_host_pq(cu)
        domain = registrable_domain(host)
        if domain not in cfg.allowed_domains:
            c["links_out_of_scope"] = c.get("links_out_of_scope", 0) + 1
            continue
        if is_excluded(pq, cfg.exclusion_patterns(domain)):
            c["links_excluded"] = c.get("links_excluded", 0) + 1
            continue
        if cu in seen_here:
            c["links_dup_in_page"] = c.get("links_dup_in_page", 0) + 1
            continue
        j = len(out)
        if j >= MAX_LINKS_PER_PAGE:
            c["links_overflow"] = c.get("links_overflow", 0) + 1
            continue
        seen_here.add(cu)
        out.append((cu, host, domain, j))
    return out
