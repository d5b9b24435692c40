"""Discovery sequence, ordering and politeness constants — Appendix A.5/A.9.

``seq`` is the global discovery sequence: seeds get ``seq = seed_index``
(their order in the seed file); a page with sequence ``p`` whose kept,
in-scope links occupy first-occurrence positions ``j = 0, 1, ...``
spawns children with ``seq = p * 2**LINK_BITS + j + 1``.  All observable
ordering derives from data via this formula — never from execution
order (SURVEY.md §4.5).

LINK_BITS sizing: SURVEY.md Appendix A.5 originally pinned
``MAX_LINKS_PER_PAGE = 2**20``, but with ``seq:int64`` that overflows at
depth 3 (seq grows by 2^20 per level).  Amended here (this repo owns the
spec — the reference mount was empty, SURVEY.md §0) to ``LINK_BITS = 6``
(64 kept links per page), which keeps seq < 2^63 through depth 8 with
up to 2^15 seeds.  Links past position 63 on a page are dropped and
counted in the ``links_overflow`` metric.  At production web scale one
would raise LINK_BITS (real pages carry hundreds of links) and lower
the depth limit, or widen seq to a fixed-length byte path; the
trade-off is documented in README.md.

Crawl order within a round: ascending ``(depth, domain, seq, url)``.
Intra-round duplicate URLs keep the minimum ``(depth, seq)``.

Politeness (A.9, virtual time — no wall clock in the correctness path):
``budget(domain) = max(1, floor(ROUND_SECONDS / crawl_delay_s))`` per
round, with ``crawl_delay_s`` taken from the robots fixture row whose
host equals the registrable domain, else DEFAULT_CRAWL_DELAY_S.
"""

from __future__ import annotations

import math

LINK_BITS = 6
MAX_LINKS_PER_PAGE = 1 << LINK_BITS  # positions 0 .. 63; j+1 <= 64 < 2**LINK_BITS + 1

ROUND_SECONDS = 60.0
DEFAULT_CRAWL_DELAY_S = 1.0


def child_seq(parent_seq: int, link_index: int) -> int:
    """seq of the child at kept-link position ``link_index`` (A.5)."""
    return (parent_seq << LINK_BITS) + link_index + 1


def domain_budget(crawl_delay_s: float | None) -> int:
    """Fetches allowed for one domain in one round (A.9)."""
    d = crawl_delay_s if crawl_delay_s and crawl_delay_s > 0 else DEFAULT_CRAWL_DELAY_S
    return max(1, math.floor(ROUND_SECONDS / d))
