"""Scope / exclusion filtering — SURVEY.md §2.2 M4 (Domain.CanDownload).

The reference's per-domain "may I download this URL?" decision
(SURVEY.md §1.1 Domain [R, high]) re-expressed as a pure function over
the canonical URL:

  * scheme must be http(s) — already guaranteed by canonicalization;
  * the URL's registrable domain must be in the configured domain set
    (subdomains of a configured domain are allowed — this is what makes
    registrable-domain grouping meaningful);
  * the path+query string must not match any of the domain's exclusion
    regexes (config fixture: ``^/private/`` everywhere, ``\\?a=`` on a
    20% subset — FIXTURES.md §2).

``split_host_pq`` is the tiny parser both this filter and the robots
check share (robots rules also match against path+query).
"""

from __future__ import annotations

import re

# plain-dict memo, NOT functools.lru_cache: an lru_cache wrapper only
# pickles by qualified name, which breaks cloudpickle's by-value
# fallback for workers that cannot import this package
# (__ray_entry__._ensure_worker_importable)
_compiled: dict = {}


def _compile(pattern: str) -> re.Pattern:
    rx = _compiled.get(pattern)
    if rx is None:
        rx = re.compile(pattern)
        if len(_compiled) < 1024:
            _compiled[pattern] = rx
    return rx


def split_host_pq(canon_url: str) -> tuple[str, str]:
    """(host, path+query) of an already-canonical URL.

    Canonical URLs always look like scheme://netloc/path[?query] with a
    non-empty path, so plain string surgery beats urlsplit here (this
    runs once per candidate URL in the hot canonicalize stage).
    """
    rest = canon_url.split("://", 1)[1]
    slash = rest.find("/")
    netloc = rest[:slash]
    host = netloc.rsplit("@", 1)[-1]
    colon = host.rfind(":")
    if colon != -1 and host[colon + 1 :].isdigit():
        host = host[:colon]
    return host, rest[slash:]


def is_excluded(path_query: str, patterns: tuple[str, ...]) -> bool:
    return any(_compile(p).search(path_query) for p in patterns)
