"""Public Suffix List engine — the v2 upgrade of SURVEY.md A.3.

Implements the publicsuffix.org matching algorithm in full (label-wise
longest match, ``*`` wildcard rules, ``!`` exception rules, implicit
default rule ``*``) over a pluggable rule set:

- ``PSL_SNAPSHOT`` — a curated built-in snapshot of well-known ICANN
  and private-section rules (multi-level ccTLD registries, wildcard
  TLDs with their exceptions, and the hosting-platform private suffixes
  such as ``blogspot.com`` / ``github.io`` that a real-web crawl must
  split on so unrelated tenants don't share one politeness budget).
- ``PublicSuffixList(rules)`` accepts any iterable of rule lines, so a
  deployment ships the full ``public_suffix_list.dat`` and loads it
  with ``PublicSuffixList.from_file(path)`` — the algorithm is
  identical, only the data grows.

The pinned two-level heuristic in ``regdomain.registrable_domain``
remains the default A.3 backend (the fixture goldens are pinned to
it); ``regdomain.use_psl()`` swaps this engine in behind the same
interface.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

# Curated snapshot. Sources: the publicsuffix.org list format and its
# widely documented entries. Comment lines ("//") and blanks are
# accepted and skipped so a verbatim .dat file parses unchanged.
PSL_SNAPSHOT = """
// --- ICANN section (snapshot subset) ---
com
net
org
edu
gov
mil
int
info
biz
name
io
co
uk
co.uk
org.uk
ac.uk
gov.uk
me.uk
net.uk
ltd.uk
plc.uk
sch.uk
nhs.uk
police.uk
au
com.au
net.au
org.au
edu.au
gov.au
id.au
asn.au
jp
co.jp
ne.jp
or.jp
ac.jp
go.jp
ad.jp
ed.jp
gr.jp
lg.jp
br
com.br
net.br
org.br
gov.br
edu.br
mil.br
art.br
blog.br
nz
co.nz
net.nz
org.nz
govt.nz
ac.nz
school.nz
cn
com.cn
net.cn
org.cn
gov.cn
edu.cn
ac.cn
mx
com.mx
org.mx
gob.mx
net.mx
edu.mx
in
co.in
net.in
org.in
gov.in
ac.in
edu.in
res.in
za
co.za
org.za
gov.za
ac.za
net.za
web.za
sg
com.sg
net.sg
org.sg
edu.sg
gov.sg
hk
com.hk
net.hk
org.hk
edu.hk
gov.hk
tw
com.tw
net.tw
org.tw
edu.tw
gov.tw
ar
com.ar
net.ar
org.ar
gob.ar
edu.ar
tr
com.tr
net.tr
org.tr
gov.tr
edu.tr
pl
com.pl
net.pl
org.pl
edu.pl
gov.pl
kr
co.kr
or.kr
ne.kr
re.kr
go.kr
ac.kr
ru
com.ru
org.ru
net.ru
ua
com.ua
net.ua
org.ua
gov.ua
edu.ua
il
co.il
org.il
net.il
ac.il
gov.il
muni.il
th
co.th
or.th
ac.th
go.th
net.th
in.th
id
co.id
or.id
ac.id
go.id
web.id
my
com.my
net.my
org.my
gov.my
edu.my
ph
com.ph
net.ph
org.ph
gov.ph
edu.ph
vn
com.vn
net.vn
org.vn
gov.vn
edu.vn
eg
com.eg
net.eg
org.eg
gov.eg
edu.eg
sa
com.sa
net.sa
org.sa
gov.sa
edu.sa
// wildcard registries and their exceptions
*.ck
!www.ck
*.bd
*.er
*.fk
*.jm
*.kh
*.mm
*.np
*.pg
*.ye
*.zw
kawasaki.jp
kitakyushu.jp
kobe.jp
nagoya.jp
sapporo.jp
sendai.jp
yokohama.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// --- private section (snapshot subset) ---
blogspot.com
blogspot.co.uk
blogspot.com.au
blogspot.ca
blogspot.de
blogspot.fr
blogspot.in
blogspot.jp
blogspot.co.nz
blogspot.com.br
blogspot.mx
blogspot.kr
blogspot.sg
blogspot.com.ar
blogspot.it
blogspot.nl
blogspot.se
blogspot.ch
github.io
githubusercontent.com
gitlab.io
herokuapp.com
appspot.com
netlify.app
vercel.app
pages.dev
workers.dev
web.app
firebaseapp.com
azurewebsites.net
cloudapp.net
cloudfront.net
elasticbeanstalk.com
s3.amazonaws.com
compute.amazonaws.com
wordpress.com
tumblr.com
neocities.org
readthedocs.io
fastly-edge.com
"""


VENDORED_DAT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data",
    "public_suffix_list.dat",
)
_VENDORED = None  # process-wide parse cache for the vendored list


class PublicSuffixList:
    """Compiled PSL rule set with the standard matching algorithm."""

    def __init__(self, rules: Iterable[str]):
        self.exact: set[tuple[str, ...]] = set()
        self.wildcard: set[tuple[str, ...]] = set()  # labels AFTER the '*'
        self.exception: set[tuple[str, ...]] = set()
        for line in rules:
            rule = line.strip().lower()
            if not rule or rule.startswith("//"):
                continue
            rule = rule.split()[0]
            if rule.startswith("!"):
                self.exception.add(tuple(rule[1:].split(".")))
            elif rule.startswith("*."):
                self.wildcard.add(tuple(rule[2:].split(".")))
            else:
                self.exact.add(tuple(rule.split(".")))

    @classmethod
    def from_file(cls, path: str | os.PathLike) -> "PublicSuffixList":
        with open(path, encoding="utf-8") as f:
            return cls(f)

    @classmethod
    def snapshot(cls) -> "PublicSuffixList":
        return cls(PSL_SNAPSHOT.splitlines())

    @classmethod
    def vendored(cls) -> "PublicSuffixList":
        """The vendored verbatim ``public_suffix_list.dat`` (the
        publicsuffix.org list, MPL-2.0 public data, shipped as package
        data so every worker that can import spider_ray loads the SAME
        rule set — no path-distribution problem on a cluster).  Parsed
        once per process."""
        global _VENDORED
        if _VENDORED is None:
            _VENDORED = cls.from_file(VENDORED_DAT_PATH)
        return _VENDORED

    @classmethod
    def default(cls) -> "PublicSuffixList":
        """PSL-mode default rule set: the vendored real list when the
        package data file is present, else the curated snapshot (keeps
        a data-stripped install functional, loudly)."""
        if os.path.isfile(VENDORED_DAT_PATH):
            return cls.vendored()
        import logging

        logging.getLogger(__name__).warning(
            "vendored public_suffix_list.dat missing (%s); PSL mode "
            "falls back to the curated snapshot", VENDORED_DAT_PATH,
        )
        return cls.snapshot()

    def suffix_len(self, labels: tuple[str, ...]) -> int:
        """Number of labels in the public suffix of ``labels``.

        Standard algorithm: an exception rule beats all (its suffix is
        the rule minus its leftmost label); otherwise the longest
        matching rule wins; with no match the default rule ``*``
        applies (the rightmost label is the suffix)."""
        n = len(labels)
        best = 1  # implicit default rule '*'
        for i in range(n):
            tail = labels[i:]
            if tail in self.exception:
                return n - i - 1
            if tail in self.exact:
                best = max(best, n - i)
            # wildcard '*.<tail[1:]>' matches any label in the '*' spot
            if len(tail) >= 2 and tail[1:] in self.wildcard:
                best = max(best, n - i)
        return best

    def registrable_domain(self, host: str) -> str:
        """Registrable domain (public suffix + 1 label).  IP literals,
        single labels and hosts that ARE a public suffix come back
        unchanged — same contract as the A.3 heuristic."""
        if not host or host[0].isdigit() and host.replace(".", "").isdigit():
            return host
        labels = tuple(host.split("."))
        if len(labels) < 2:
            return host
        ns = self.suffix_len(labels)
        if ns >= len(labels):
            return host
        return ".".join(labels[-(ns + 1):])
