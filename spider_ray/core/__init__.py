"""Deterministic core kernels (SURVEY.md Appendix A).

Single source of truth for every pinned semantic: URL canonicalization,
hashing, registrable-domain extraction, HTML text/link extraction,
robots.txt evaluation, cuckoo-filter behavior, sequence numbering and
the politeness budget.  The oracle simulator, the fixture generator and
the Ray engine all import from here — byte-identity by construction.

No Ray imports anywhere in this package.
"""

from spider_ray.core.canon import canonicalize
from spider_ray.core.hashing import url_hash_fp, url_hash64
from spider_ray.core.regdomain import registrable_domain
from spider_ray.core.extract import extract_text, extract_links
from spider_ray.core.robots import RobotsRules, parse_robots
from spider_ray.core.cuckoo import CuckooFilter
from spider_ray.core.seqs import (
    LINK_BITS,
    MAX_LINKS_PER_PAGE,
    ROUND_SECONDS,
    DEFAULT_CRAWL_DELAY_S,
    child_seq,
    domain_budget,
)

__all__ = [
    "canonicalize",
    "url_hash_fp",
    "url_hash64",
    "registrable_domain",
    "extract_text",
    "extract_links",
    "RobotsRules",
    "parse_robots",
    "CuckooFilter",
    "LINK_BITS",
    "MAX_LINKS_PER_PAGE",
    "ROUND_SECONDS",
    "DEFAULT_CRAWL_DELAY_S",
    "child_seq",
    "domain_budget",
]
