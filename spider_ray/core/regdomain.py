"""Registrable-domain extraction — SURVEY.md Appendix A.3.

Two backends behind one interface:

- default: the pinned two-level heuristic (last two labels, or three
  when the last two form a known two-level suffix).  Fixture goldens
  are pinned to it; fixture hosts all live under ``*.example`` where
  both backends agree.
- ``use_psl()``: the full Public Suffix List algorithm
  (``spider_ray.core.psl`` — wildcard/exception rules, private-section
  suffixes like ``blogspot.com``), with an optional path to a verbatim
  ``public_suffix_list.dat`` for real-web deployments.

IP literals and single-label hosts are returned unchanged either way.
"""

from __future__ import annotations

_TWO_LEVEL_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
        "plc.uk", "sch.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
        "com.br", "net.br", "org.br", "gov.br",
        "co.nz", "net.nz", "org.nz", "govt.nz",
        "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
        "com.mx", "org.mx", "gob.mx",
        "co.in", "net.in", "org.in", "gov.in",
        "co.za", "org.za", "gov.za",
        "com.sg", "com.hk", "com.tw", "com.ar", "com.tr", "com.pl",
        "co.kr", "or.kr",
    }
)


# Active PSL backend; None = pinned heuristic.  A plain module global
# (never lru_cache — see the cloudpickle by-value constraint) that
# serializes into worker closures with whatever mode was set at driver
# pipeline-build time, so engine and oracle stay in lockstep.
_psl = None


def use_psl(dat_path: str | None = None) -> None:
    """Switch A.3 to the full PSL algorithm — the vendored verbatim
    ``public_suffix_list.dat`` (real publicsuffix.org data shipped as
    package data; falls back to the curated snapshot only when the
    data file was stripped), or an explicit ``dat_path``.  Idempotent
    for the default case, so per-batch callers pay the rule-set build
    exactly once per process."""
    global _psl
    from spider_ray.core.psl import PublicSuffixList

    if dat_path is None:
        if _psl is None or not getattr(_psl, "_is_default", False):
            _psl = PublicSuffixList.default()
            _psl._is_default = True
        return
    _psl = PublicSuffixList.from_file(dat_path)


def use_heuristic() -> None:
    """Back to the pinned two-level heuristic (fixture-golden mode)."""
    global _psl
    _psl = None


def registrable_domain(host: str) -> str:
    """Registrable domain for ``host`` (already lowercase per A.1)."""
    if _psl is not None:
        return _psl.registrable_domain(host)
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    last_two = ".".join(labels[-2:])
    if last_two in _TWO_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return last_two
