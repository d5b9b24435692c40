"""URL trap detection — the crawler-trap guard (SURVEY.md §2.2 M4
extension; VERDICT r04 "what a real deployment hits" family).

Real crawls die in *traps*: infinitely-growing URL spaces a site emits
faster than any politeness budget drains them (calendar pages, session
ids re-appended per click, path-cycle links like ``/a/b/a/b/a/b/…``).
The classic defenses are structural — a URL is suspicious by SHAPE
regardless of content — and cheap enough to run on every candidate.

This module is the pure kernel, shared verbatim by the oracle and the
engine's vectorized stage twin (the repo's differential-twin pattern:
``trap_reason`` is the per-row reference; ``stages.flags_and_part_batch``
applies the same four rules with vectorized pandas/pyarrow ops, and a
fuzz test pins equality).  Rules, in pinned precedence order over the
CANONICAL url (scheme://host/path[?query], fragment already stripped):

  1. LENGTH  — ``len(url) > max_url_len``.  Session-id accretion and
               redirect loops grow URLs without bound; an 8 KB URL is
               never content.
  2. DEPTH   — more than ``max_path_depth`` path segments.  Recursive
               symlink-style traps produce arbitrarily deep paths.
  3. REPEAT  — ``max_segment_repeats`` or more CONSECUTIVE identical
               non-empty path segments (``/a/a/a``), or that many
               consecutive repeats of a two-segment cycle
               (``/a/b/a/b/a/b``) — the two shapes a self-referential
               relative href generates.
  4. PARAMS  — more than ``max_query_params`` ``&``-separated query
               parameters.  Faceted-search explosions.

Defaults are deliberately permissive (a real site's deepest legitimate
URLs must never trip them); they are config knobs on ``CrawlConfig``
and only consulted when ``trap_guard`` is enabled, so every pinned
fixture golden is reproduced bit-for-bit with the guard off.
"""

from __future__ import annotations

import re

import numpy as np

TRAP_NONE = 0
TRAP_LENGTH = 1
TRAP_DEPTH = 2
TRAP_REPEAT = 3
TRAP_PARAMS = 4

DEFAULT_MAX_URL_LEN = 1024
DEFAULT_MAX_PATH_DEPTH = 16
DEFAULT_MAX_SEGMENT_REPEATS = 3
DEFAULT_MAX_QUERY_PARAMS = 8


def _split_path_query(url: str) -> tuple[str, str]:
    """path, query of a canonical url (scheme://netloc/path[?query])."""
    scheme_end = url.find("://")
    host_start = scheme_end + 3 if scheme_end != -1 else 0
    path_start = url.find("/", host_start)
    if path_start == -1:
        return "", ""
    rest = url[path_start:]
    q = rest.find("?")
    if q == -1:
        return rest, ""
    return rest[:q], rest[q + 1:]


def trap_reason(
    url: str,
    max_url_len: int = DEFAULT_MAX_URL_LEN,
    max_path_depth: int = DEFAULT_MAX_PATH_DEPTH,
    max_segment_repeats: int = DEFAULT_MAX_SEGMENT_REPEATS,
    max_query_params: int = DEFAULT_MAX_QUERY_PARAMS,
) -> int:
    """Reason code (TRAP_*) for a canonical url, TRAP_NONE if clean.

    Pure, deterministic, allocation-light — the oracle applies it
    per-leg; the engine's vectorized twin must agree byte-for-byte
    (tests/test_traps.py differential fuzz)."""
    if len(url) > max_url_len:
        return TRAP_LENGTH
    path, query = _split_path_query(url)
    segs = [s for s in path.split("/") if s]
    if len(segs) > max_path_depth:
        return TRAP_DEPTH
    # consecutive identical segments: /a/a/a  (run length >= k)
    run = 1
    for i in range(1, len(segs)):
        run = run + 1 if segs[i] == segs[i - 1] else 1
        if run >= max_segment_repeats:
            return TRAP_REPEAT
    # two-segment cycle: /a/b/a/b/a/b — a chain of segs[i] == segs[i-2]
    # (with segs[i] != segs[i-1], else the rule above already fired) of
    # length c spans c+2 segments = (c+2)//2 repeats of the (a, b) pair
    chain = 0
    for i in range(2, len(segs)):
        if segs[i] == segs[i - 2]:
            chain += 1
            if (chain + 2) // 2 >= max_segment_repeats:
                return TRAP_REPEAT
        else:
            chain = 0
    if query:
        if query.count("&") + 1 > max_query_params:
            return TRAP_PARAMS
    return TRAP_NONE


# ---------------------------------------------------------------------------
# vectorized twin (engine hot path)
# ---------------------------------------------------------------------------

# Over-approximating REPEAT prefilter: any path with a segment equal to
# the one 1 or 2 hops earlier.  Every url trap_reason flags REPEAT
# contains such a pair (a run of k>=2 equal segments has a distance-1
# pair; a two-segment cycle has a distance-2 pair), so
# prefilter-misses are provably REPEAT-clean and never touch Python.
_REPEAT_PRE = re.compile(r"/([^/]+)(?:/[^/]+)?/\1(?=/|$)")
# one vectorized strip of scheme://host — identical to the stage's
# split_host_pq twin (stages.flags_and_part_batch)
_SCHEME_HOST = re.compile(r"^[a-z]+://[^/]*")


def trap_reasons_batch(
    urls,
    max_url_len: int = DEFAULT_MAX_URL_LEN,
    max_path_depth: int = DEFAULT_MAX_PATH_DEPTH,
    max_segment_repeats: int = DEFAULT_MAX_SEGMENT_REPEATS,
    max_query_params: int = DEFAULT_MAX_QUERY_PARAMS,
) -> np.ndarray:
    """Vectorized ``trap_reason`` over a sequence of canonical urls.

    Exact-by-construction (check-then-confirm, the repo's J2 pattern):
    LENGTH / DEPTH / PARAMS are computed with pandas str kernels;
    REPEAT uses ``_REPEAT_PRE`` as a vectorized over-approximation and
    confirms the (rare) hits with the pure kernel, whose answer is
    authoritative for those rows — so the result equals a per-row
    ``trap_reason`` map on every input (tests/test_traps.py fuzz).
    Returns an int8 array of TRAP_* codes."""
    import pandas as pd

    s = urls if isinstance(urls, pd.Series) else pd.Series(list(urls))
    n = len(s)
    out = np.zeros(n, dtype=np.int8)
    if n == 0:
        return out
    # LENGTH decided first (cheapest, highest precedence) so the regex
    # prefilter below never scans a remote-controlled overlong URL:
    # over-cap rows are TRAP_LENGTH by precedence whatever their path
    # looks like, and skipping them bounds every later kernel's input
    # to max_url_len bytes (adversarial-input discipline, SURVEY App F
    # round-4e; timing pinned in tests/test_traps.py)
    length = (s.str.len() > max_url_len).to_numpy()
    out[length] = TRAP_LENGTH
    inb = ~length
    if not inb.any():
        return out
    pqs = s[inb].str.replace(_SCHEME_HOST, "", regex=True)
    split = pqs.str.split("?", n=1)
    path = split.str[0]
    # NaN where no '?' -> '' (keeps the string dtype when NO row has a
    # query; '' also matches the kernel's falsy-empty-query semantics)
    query = split.str[1].fillna("")
    inb_idx = np.flatnonzero(inb)
    # rows needing the exact kernel (possible REPEAT)
    confirm = np.zeros(n, dtype=bool)
    confirm[inb_idx] = path.str.contains(_REPEAT_PRE, regex=True).to_numpy()
    if confirm.any():
        idx = np.flatnonzero(confirm)
        vals = s.to_numpy()
        for i in idx:
            out[i] = trap_reason(
                vals[i], max_url_len, max_path_depth,
                max_segment_repeats, max_query_params,
            )
    # precedence on the remaining in-bound rows: DEPTH > PARAMS
    rest = inb & ~confirm
    depth = np.zeros(n, dtype=bool)
    depth[inb_idx] = (path.str.count(r"/[^/]") > max_path_depth).to_numpy()
    depth &= rest
    out[depth] = TRAP_DEPTH
    rest &= ~depth
    # '?'-with-empty-query rows carry no params (kernel: '' is falsy)
    nonempty = (query.str.len() > 0).to_numpy()
    nparams = np.zeros(n, dtype=np.int64)
    nparams[inb_idx] = (query.str.count("&") + 1).to_numpy() * nonempty
    out[rest & (nparams > max_query_params)] = TRAP_PARAMS
    return out
