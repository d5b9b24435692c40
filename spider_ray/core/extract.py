"""HTML text + link extraction — SURVEY.md Appendix A.6 / A.7.

``extract_text(html)`` is the pinned extractor E: the ``text`` column
of the pages corpus is ``E(html)`` computed at fixture-generation time,
and the engine's extraction stage must reproduce it **byte-identically
per url** (BASELINE.json ``input_hint``).  Rules:

  * parse with stdlib ``html.parser.HTMLParser`` (convert_charrefs=True);
  * skip the entire subtree of ``script style noscript template head
    iframe svg`` (no text, no block newlines from inside);
  * collapse each text node's internal whitespace runs to one space;
  * open and close of a block-boundary tag each emit a newline
    (``p div section article h1..h6 li ul ol table tr br title header
    footer nav blockquote pre``);
  * finally split on newlines, strip each line, drop empty lines, join
    with a single newline.

``extract_links(html)`` walks the same document and returns every
``<a href=...>`` value in document order — including inside
text-skipped subtrees (the text-skip and the link-walk are independent
by spec).  Canonicalization / scoping of those hrefs happens in the
caller (core.scope / crawl stages), not here.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS_RUN = re.compile(r"\s+")

# ---- whitespace-collapse fast path -----------------------------------------
# `_WS_RUN.sub(" ", t)` pays ~17ns/byte of generic regex scanning even
# when the text is already collapsed (it "replaces" every single space
# with a space).  For ASCII text — the overwhelming byte mass of a
# crawl — the \s set is exactly {\t \n \v \f \r \x1c-\x1f ' '}
# (verified exhaustively over all 128 codepoints in
# tests/test_extract_fast.py), so a C-level str.translate to ' '
# followed by a literal-prefixed "  +" collapse is byte-identical and
# ~6x faster (0.203s -> 0.035s over 11.7 MB of benchfat segments).
# Non-ASCII falls back to the regex (unicode \s is version-defined —
# never hand-roll it).
_WS_TABLE = {c: 0x20 for c in (9, 10, 11, 12, 13, 0x1C, 0x1D, 0x1E, 0x1F)}
_SP_RUN = re.compile("  +")
_sp_sub = _SP_RUN.sub


def _ws_collapse(t: str) -> str:
    if t.isascii():
        t = t.translate(_WS_TABLE)
        return _sp_sub(" ", t) if "  " in t else t
    return _WS_RUN.sub(" ", t)

SKIP_TAGS = frozenset(
    ("script", "style", "noscript", "template", "head", "iframe", "svg")
)
BLOCK_TAGS = frozenset(
    (
        "p", "div", "section", "article",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "li", "ul", "ol", "table", "tr", "br", "title",
        "header", "footer", "nav", "blockquote", "pre",
    )
)


class _Extractor(HTMLParser):
    """One pass over the document collecting text pieces, hrefs, and
    per-href anchor piece spans.

    Anchor-span spec (shared verbatim with the fast scanner, A.8):
    ``spans[k]`` is the half-open ``pieces`` index range of the text
    between link k's ``<a href>`` start event and the FIRST subsequent
    ``</a>`` end event or ``<a>`` start event (anchors never nest —
    any new ``<a>``, href or not, closes the open one), else EOF.  A
    self-closing ``<a href .../>`` gets an empty span.  Skip-subtree
    suppression applies to the PIECES (as everywhere), so an anchor
    inside <noscript> keeps its href (stdlib event order) and has
    empty text."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pieces: list[str] = []
        self.links: list[str] = []
        self.spans: list[tuple[int, int]] = []
        self._open_k: int | None = None
        self._skip_depth = 0

    def _close_anchor(self) -> None:
        if self._open_k is not None:
            s, _ = self.spans[self._open_k]
            self.spans[self._open_k] = (s, len(self.pieces))
            self._open_k = None

    def _start_anchor(self, attrs, selfclosing: bool) -> None:
        self._close_anchor()
        for k, v in attrs:
            if k == "href" and v is not None:
                self.links.append(v)
                at = len(self.pieces)
                self.spans.append((at, at if selfclosing else -1))
                if not selfclosing:
                    self._open_k = len(self.spans) - 1
                break

    # -- tag handling ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._start_anchor(attrs, selfclosing=False)
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth == 0 and tag in BLOCK_TAGS:
            self.pieces.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <br/> and friends: treat as open+close at once
        if tag == "a":
            self._start_anchor(attrs, selfclosing=True)
        if tag in SKIP_TAGS:
            return  # empty skip subtree
        if self._skip_depth == 0 and tag in BLOCK_TAGS:
            self.pieces.append("\n")
            self.pieces.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._close_anchor()
        if tag in SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            return
        if self._skip_depth == 0 and tag in BLOCK_TAGS:
            self.pieces.append("\n")

    # -- text -----------------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self.pieces.append(_WS_RUN.sub(" ", data))


def _parse(html: bytes | str) -> _Extractor:
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    p._close_anchor()  # unterminated at EOF: span runs to the end
    return p


# ---------------------------------------------------------------------------
# fast scanner — the production path.
#
# stdlib HTMLParser tokenizes at ~3.5 MB/s, which made extraction ~45%
# of the fetch+extract wall (BENCH r01).  This scanner produces the
# SAME (pieces, links) event stream for the construct set the spec
# covers — tags with quoted/unquoted attributes, comments,
# declarations/PIs, entity references in text and in href values,
# script/style raw-text (CDATA) content, self-closing tags, stray '<'
# as text — at >10x the throughput.  Equivalence with the stdlib
# reference implementation above is enforced by differential tests
# (tests/test_extract_fast.py: every fixture page byte-identical, plus
# an adversarial construct corpus).
# ---------------------------------------------------------------------------

from html import unescape as _unescape

# start-tag / tolerant-end-tag name: HTMLParser tagfind_tolerant —
# everything except whitespace, "/", ">" is part of the name
_TAGNAME_RE = re.compile(r"[a-zA-Z][^\t\n\r\f />\x00]*")
_ENDTAG_RE = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
# exact CPython attrfind_tolerant replica — used to pull href out of
# <a ...> spans (regex shortcuts mis-handle 'href' embedded in exotic
# attr NAMES or inside other attrs' values; <a> tags are rare enough
# that the faithful per-attr loop costs nothing)
_ATTRFIND = re.compile(
    r"((?<=['\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"('[^']*'|\"[^\"]*\"|(?!['\"])[^>\s]*))?(?:\s|/(?!>))*"
)
_DELIM_SKIP = re.compile(r"(?:\s|/(?!>))*")
# check_for_whole_start_tag: these next-chars mean "incomplete tag"
_INCOMPLETE_NEXT = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/ "
)


def _find_href(html: str, k: int, endpos: int):
    """First href attribute WITH a value in [k, endpos) — HTMLParser's
    parse_starttag attr loop + the extractor's v-is-not-None pick."""
    k = _DELIM_SKIP.match(html, k, endpos).end()
    while k < endpos:
        m = _ATTRFIND.match(html, k, endpos)
        if not m:
            break
        if m.group(2) and m.group(1).lower() == "href":
            v = m.group(3)
            if v and v[0] in "\"'":
                v = v[1:-1]
            return _unescape(v) if "&" in v else v
        if m.end() == k:
            break
        k = m.end()
    return None
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}


_MS_NAME_RE = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*")
_MS_CLOSE2 = re.compile(r"]\s*]\s*>")
_MS_CLOSE1 = re.compile(r"]\s*>")
# stdlib _markupbase._commentclose: whitespace may sit between the
# '--' and the '>' ('<!-- c -- >' IS a terminated comment)
_COMMENT_CLOSE = re.compile(r"--\s*>")
_MS_BRACKETED = frozenset(("temp", "cdata", "ignore", "include", "rcdata"))


_TOK = re.compile(
    r"(?P<text>[^<]+)"
    r"|<(?P<close>/)\s*(?P<cname>[a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"
    r"|<(?P<name>[a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"(?P<attrs>(?:\s+[^\s/>=\"'][^\s=>\"']*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>\"'][^\s>]*|))?)*+)"
    r"\s*(?P<sc>/?)>"
    r"|(?P<other><)"
)

# ---- segment fast path ----------------------------------------------------
# "Interesting" constructs need per-construct logic: <a> (href), the
# skip/raw-text elements (depth, cdata), and anything non-tag.  All
# OTHER well-formed tags only ever (a) break a text piece and (b) emit
# block newlines — so a whole run of text + boring tags is consumed by
# ONE C-level match and replayed with one C-level split, instead of a
# Python dispatch per tag.  The name lookahead requires a delimiter
# after the excluded name so <abbr>/<address> stay boring while <a> is
# interesting.
_INTER = r"/?(?:a|script|style|noscript|template|head|iframe|svg)[\t\n\r\f />]"
# The attr LOOPS are possessive (*+, python 3.11): crawl html is
# remote-controlled, and on an unterminated tag like "<p a= a= a= …"
# the value/next-attr split is ambiguous, so a backtracking loop
# explores exponentially many splits before failing (measured: hang on
# 20k repeats; <1 ms possessive).  Possessive is language-preserving
# here: every split point is decided by disjoint character classes
# except the value tail, where the greedy parse either reaches the
# same '>' as any backtracked parse or no parse reaches one (a shorter
# value leaves text no other grammar rule can consume) — pinned by the
# adversarial timing test and the old/new differential fuzz.
_WF_ATTRS = (
    r"(?:\s+[^\s/>=\"'][^\s=>\"']*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>\"'][^\s>]*|))?)*+"
)
# Segment grammar tightens the boring-tag attr grammar in two ways:
# bare quotes are excluded from unquoted values (<div a=b"c>), and '<'
# is excluded from attr names and values entirely (quoted or not).
# Such tags — vanishingly rare, and HTML5 parse errors anyway — fall
# to the exact single-tag _TOK branch instead of the segment path.
# The payoff is two invariants inside a _SEG-validated segment:
# (1) every quote belongs to a balanced ="…"/='…' pair, and (2) '<'
# occurs ONLY at a real tag start (text runs are [^<]+).  Together
# they let the sentinel rewrite below use cheap character-class scans
# (~40% of extract CPU at round-4 profile) instead of re-running the
# nested per-attribute grammar the segment match already proved:
# every scan starts at a real tag and no spurious mid-tag '<' exists
# for it to anchor on.
_WF_ATTRS_SEG = (
    r"(?:\s+[^\s/>=\"'<][^\s=>\"'<]*"
    r"(?:\s*=\s*(?:\"[^\"<]*\"|'[^'<]*'|[^\s>\"'<]+|))?)*+"
)
_SEG = re.compile(
    r"(?:[^<]+|<(?!" + _INTER + r")/?[a-zA-Z][-.a-zA-Z0-9:_]*"
    + _WF_ATTRS_SEG + r"\s*/?>)+",
    re.IGNORECASE,
)
_SEG_SPLIT = re.compile(
    r"<(/?)([a-zA-Z][-.a-zA-Z0-9:_]*)" + _WF_ATTRS_SEG + r"\s*(/?)>",
    re.IGNORECASE,
)
_BLOCK_CACHE: dict = {}

# ---- whole-segment C-path -------------------------------------------------
# The per-tag replay loop (split -> dict lookup -> append per tag) is
# pure Python overhead when nothing in the segment needs per-tag
# logic.  Two subs rewrite an ENTIRE segment in C: block-tag
# open/close -> "\x01" (newline sentinel), every remaining tag ->
# "\x00" (text-node boundary sentinel).  One "\x01" per block tag is
# enough even for self-closed blocks (the event stream says open+close
# = "\n\n") because _finish drops empty lines — any run of >= 1
# newline separates the same two lines; the final TEXT is identical.
# Neither sentinel is \s, so one whitespace-collapse pass over the
# rewritten segment cannot merge runs across text nodes or absorb
# block newlines — per-node semantics survive the batching.  _scan
# falls back to the replay loop whenever the rewrite could be
# ambiguous (literal sentinel bytes in the html, a '<' left over from
# a tag nested in an attribute value, an entity decoding to a
# sentinel).
_BLOCK_NAMES = (
    r"(?:p|div|section|article|h[1-6]|li|ul|ol|table|tr|br|title"
    r"|header|footer|nav|blockquote|pre)(?![-.a-zA-Z0-9:_])"
)
# Inside a _SEG-validated segment (see _WF_ATTRS_SEG) quotes occur
# only as balanced ="…"/='…' pairs, unquoted values/names never
# contain > " ', and '>' otherwise appears only inside quoted values
# or as the tag terminator — so a flat scan of (non->"' chars |
# balanced quote pair)* finds exactly the same tag end as the full
# per-attribute grammar, with no nested quantifiers.  Profiled on the
# benchfat corpus this halves the cost of the two sentinel subs, the
# hottest regex calls in the crawl's e7 extract stage.  Matches that
# START inside another tag's quoted attr value behave as before
# (leftmost-match swallows them or the leftover-'<' guard below routes
# the segment to the careful replay), same as the old _WF_ATTRS form.
_Q_SCAN = r"[^>\"']*+(?:(?:\"[^\"]*+\"|'[^']*+')[^>\"']*+)*+"
_BLOCK_ANY = re.compile(
    r"</?" + _BLOCK_NAMES + _Q_SCAN + r">", re.IGNORECASE
)
_ANY_TAG = re.compile(
    r"</?[a-zA-Z]" + _Q_SCAN + r">", re.IGNORECASE
)


def _scan(html: str) -> tuple[list[str], list[str], list[tuple[int, int]]]:
    """One pass -> (text pieces, hrefs), HTMLParser-equivalent.

    Three speeds, exact at each: (1) ``_SEG`` consumes a whole run of
    text + well-formed boring tags in one C match and replays it with
    one C split (or drops it wholesale inside skip subtrees); (2) the
    composite ``_TOK`` regex handles the interesting-but-well-formed
    constructs (<a href>, skip/raw-text elements) one per C call;
    (3) anything neither can prove well-formed — comments,
    declarations, marked sections, PIs, stray '<', tags with exotic
    names or quote-in-name attributes — lands on the careful
    HTMLParser-faithful branch.

    Documented divergence: on an unknown marked section (``<![weird]>``)
    the stdlib reference RAISES AssertionError; this scanner skips it
    as a bogus declaration instead — strictly more robust on crawl
    input, and the differential tests treat reference-raise as
    fast-must-not-raise."""
    pieces: list[str] = []
    links: list[str] = []
    spans: list[tuple[int, int]] = []  # per-link anchor piece ranges (A.8)
    open_k = -1  # index into spans of the open anchor, -1 = none
    append = pieces.append
    skip_depth = 0
    n = len(html)
    pos = 0
    find = html.find
    tok = _TOK.match
    ws_sub = _ws_collapse  # ASCII fast path, regex fallback

    def flush_eof(at: int) -> None:
        # construct unterminated at EOF with NO '>' in the remainder:
        # HTMLParser iteratively flushes '<'-delimited chunks as data
        # at close(); with no '>' anywhere every chunk is flat data, so
        # one flush of the whole remainder is equivalent (entities
        # never span the '<' chunk boundaries)
        if skip_depth == 0 and at < n:
            data = html[at:]
            if "&" in data:
                data = _unescape(data)
            append(ws_sub(data))

    def bogus_flush(at: int) -> int:
        # stdlib goahead incomplete-construct path at close(): flush
        # THROUGH the next '>' (else to the next '<', else one char)
        # as unescaped data, then RESUME parsing — an unterminated
        # comment/marked section does NOT swallow the document tail
        # (divergence found by the round-5 anchor fuzz: the '-->'/']>'
        # search failing says nothing about later plain '>'s)
        k = find(">", at + 1)
        if k < 0:
            k = find("<", at + 1)
            if k < 0:
                k = at + 1
        else:
            k += 1
        if skip_depth == 0:
            data = html[at:k]
            if "&" in data:
                data = _unescape(data)
            append(ws_sub(data))
        return k

    seg_match = _SEG.match
    seg_split = _SEG_SPLIT.split
    block_cache = _BLOCK_CACHE
    while pos < n:
        sm = seg_match(html, pos)
        if sm:
            if skip_depth:
                # inside a skip subtree: text and boring tags drop
                # wholesale; one C match consumes the whole run (the
                # matcher still respects quoted attributes, so a
                # '</noscript>' inside an attr value cannot fake a
                # subtree close)
                pos = sm.end()
                continue
            seg = sm.group(0)
            # whole-segment C-path (see _BLOCK_SELF block comment)
            if "\x00" not in seg and "\x01" not in seg:
                t = _ANY_TAG.sub("\x00", _BLOCK_ANY.sub("\x01", seg))
                if "<" not in t:
                    # no leftover '<': no block/boring sub fired inside
                    # another tag's quoted attribute value
                    ok = True
                    if "&" in t:
                        u = _unescape(t)
                        if (u.count("\x00") != t.count("\x00")
                                or u.count("\x01") != t.count("\x01")):
                            ok = False  # an entity decoded to a sentinel
                        else:
                            t = u
                    if ok:
                        append(ws_sub(t)
                               .replace("\x00", "").replace("\x01", "\n"))
                        pos = sm.end()
                        continue
            # careful replay: one event per tag, exactly the stdlib's
            parts = seg_split(seg)
            data = parts[0]
            if data:
                if "&" in data:
                    data = _unescape(data)
                append(ws_sub(data))
            i = 1
            np_ = len(parts)
            while i < np_:
                name = parts[i + 1]
                b = block_cache.get(name)
                if b is None:
                    b = name.lower() in BLOCK_TAGS
                    if len(block_cache) < 4096:
                        block_cache[name] = b
                if b:
                    append("\n")
                    if parts[i + 2] and not parts[i]:
                        append("\n")  # self-closed block: open+close
                data = parts[i + 3]
                if data:
                    if "&" in data:
                        data = _unescape(data)
                    append(ws_sub(data))
                i += 4
            pos = sm.end()
            continue
        m = tok(html, pos)
        lg = m.lastgroup
        if lg == "text":
            if skip_depth == 0:
                data = m.group(0)
                if "&" in data:
                    data = _unescape(data)
                append(ws_sub(data))
            pos = m.end()
            continue
        if lg == "sc":
            tag = m.group("name").lower()
            selfclose = m.group("sc") == "/"
            attrs_start = m.end("name")
            attrs_end = m.end() - 1
            pos = m.end()
        elif lg == "cname":
            tag = m.group("cname").lower()
            pos = m.end()
            if tag == "a" and open_k >= 0:
                spans[open_k] = (spans[open_k][0], len(pieces))
                open_k = -1
            if tag in SKIP_TAGS:
                if skip_depth > 0:
                    skip_depth -= 1
            elif skip_depth == 0 and tag in BLOCK_TAGS:
                append("\n")
            continue
        else:
            # ---- careful path: one non-well-formed construct --------
            nxt = html[pos + 1] if pos + 1 < n else ""
            if nxt == "/":
                em = _ENDTAG_RE.match(html, pos)
                if em:
                    tag = em.group(1).lower()
                    pos = em.end()
                else:
                    # tolerant path (HTMLParser parse_endtag): junk
                    # after the name still emits the endtag event
                    tm = _TAGNAME_RE.match(html, pos + 2)
                    gt = find(">", pos)
                    if gt == -1:
                        flush_eof(pos)
                        break
                    if tm is None:
                        pos = gt + 1
                        continue
                    tag = tm.group(0).lower()
                    pos = gt + 1
                if tag == "a" and open_k >= 0:
                    spans[open_k] = (spans[open_k][0], len(pieces))
                    open_k = -1
                if tag in SKIP_TAGS:
                    if skip_depth > 0:
                        skip_depth -= 1
                elif skip_depth == 0 and tag in BLOCK_TAGS:
                    append("\n")
                continue
            if nxt == "!":
                if html.startswith("<!--", pos):
                    cm = _COMMENT_CLOSE.search(html, pos + 4)
                    if cm is None:
                        pos = bogus_flush(pos)
                        continue
                    pos = cm.end()
                elif html.startswith("<![", pos):
                    sm = _MS_NAME_RE.match(html, pos + 3)
                    sect = sm.group(0).lower() if sm else ""
                    rx = _MS_CLOSE2 if sect in _MS_BRACKETED else _MS_CLOSE1
                    cm = rx.search(html, pos + 3)
                    if cm is None:
                        pos = bogus_flush(pos)
                        continue
                    pos = cm.end()
                else:
                    gt = find(">", pos)
                    if gt == -1:
                        flush_eof(pos)
                        break
                    pos = gt + 1
                continue
            if nxt == "?":
                gt = find(">", pos)
                if gt == -1:
                    flush_eof(pos)
                    break
                pos = gt + 1
                continue
            nm = _TAGNAME_RE.match(html, pos + 1)
            if nm is None:
                # stray '<': literal text (HTMLParser "invalid" path)
                if skip_depth == 0:
                    append("<")
                pos += 1
                continue
            tag = nm.group(0).lower()
            # Faithful check_for_whole_start_tag: walk the attributes
            # with the attrfind replica (quotes, bare values containing
            # quotes/'<'/'>', '=' runs — all resolved exactly as the
            # stdlib does) and dispatch on the character the walk
            # stops at.
            attrs_start = nm.end()
            k = _DELIM_SKIP.match(html, attrs_start).end()
            while True:
                am = _ATTRFIND.match(html, k)
                if am is None or am.end() == k:
                    break
                k = am.end()
            nxt2 = html[k : k + 1]
            if nxt2 == ">":
                attrs_end = k
                selfclose = False
                pos = k + 1
            elif nxt2 == "/" and html.startswith("/>", k):
                attrs_end = k
                selfclose = True
                pos = k + 2
            elif nxt2 == "" or nxt2 == "/" or nxt2 in _INCOMPLETE_NEXT:
                # incomplete at buffer end -> at close() the stdlib
                # re-emits from '<' as data: through the first '>',
                # else up to the next '<', else just the '<'
                gt = find(">", pos + 1)
                if gt != -1:
                    stop = gt + 1
                else:
                    lt2 = find("<", pos + 1)
                    stop = lt2 if lt2 != -1 else pos + 1
                if skip_depth == 0:
                    data = html[pos:stop]
                    if "&" in data:
                        data = _unescape(data)
                    append(ws_sub(data))
                pos = stop
                continue
            else:
                # walk stopped on a character no tag can contain here:
                # the span through it becomes data (parse_starttag's
                # end-not-in-('>','/>') path, no unescape)
                stop = k if k > pos + 1 else pos + 1
                if skip_depth == 0:
                    append(ws_sub(html[pos:stop]))
                pos = stop
                continue

        # ---- shared start-tag tail (fast and careful paths) ---------
        if (not selfclose and attrs_end > attrs_start
                and html[attrs_end - 1] == "/"):
            # _TOK's attr-NAME grammar can absorb a '/' that directly
            # precedes '>' (<script defer/>, <a download/>), where
            # the stdlib walk leaves it as the '/>' marker.  The
            # verdict matters for EVERY selfclose-sensitive tag — a
            # misread skip tag opens a subtree that swallows the rest
            # of the document — so recompute with the faithful
            # attrfind walk whenever the trigger shape appears (rare;
            # a '/' after a quoted value or whitespace is caught by
            # _TOK's own sc group).  Walk bounds INCLUDE the '>' so
            # the delimiter's /(?!>) lookahead can see it (truncating
            # at the '/' makes the lookahead vacuously succeed and
            # the walk eat the marker); every walk component itself
            # stops at '>'.
            k = _DELIM_SKIP.match(html, attrs_start,
                                  attrs_end + 1).end()
            while k < attrs_end:
                am = _ATTRFIND.match(html, k, attrs_end + 1)
                if am is None or am.end() == k:
                    break
                k = am.end()
            selfclose = k == attrs_end - 1
        if tag == "a":
            if open_k >= 0:  # anchors never nest: a new <a> closes
                spans[open_k] = (spans[open_k][0], len(pieces))
                open_k = -1
            v = _find_href(html, attrs_start, attrs_end)
            if v is not None:
                links.append(v)
                at = len(pieces)
                spans.append((at, at if selfclose else -1))
                if not selfclose:
                    open_k = len(spans) - 1
        if selfclose:
            if tag not in SKIP_TAGS and skip_depth == 0 and tag in BLOCK_TAGS:
                append("\n")
                append("\n")
            continue
        if tag in SKIP_TAGS:
            skip_depth += 1
            if tag in _CDATA_CLOSE:
                # raw-text element: no tag/entity parsing until the
                # matching close tag (HTMLParser CDATA_CONTENT_ELEMENTS)
                rx = _CDATA_CLOSE[tag]
                while True:
                    cm = rx.search(html, pos)
                    if cm is None:
                        pos = n  # unterminated: rest is (skipped) cdata
                        break
                    em = _ENDTAG_RE.match(html, cm.start())
                    if em and em.group(1).lower() == tag:
                        skip_depth -= 1
                        pos = em.end()
                        break
                    pos = cm.start() + 2  # '</xyz' not our close: go on
            continue
        if skip_depth == 0 and tag in BLOCK_TAGS:
            append("\n")
    if open_k >= 0:  # unterminated at EOF: span runs to the end
        spans[open_k] = (spans[open_k][0], len(pieces))
    return pieces, links, spans


def _pieces_links(html: bytes | str) -> tuple[list[str], list[str]]:
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    return _scan(html)[:2]


def _scan_full(html: bytes | str):
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    return _scan(html)


# After _ws_collapse every whitespace char in a piece is a plain ' '
# (verified exhaustively in tests/test_extract_fast.py), so per-line
# str.strip() + drop-empty-lines is exactly "collapse each space-
# padded newline run to one \n, then trim the ends" — one C regex
# pass instead of a Python strip per line (~15% of extract CPU on the
# benchfat profile at ~1.4k lines/page).
_NL_TRIM = re.compile(r" *\n[\n ]*")


def _finish(pieces: list[str]) -> str:
    raw = "".join(pieces)
    if "\n" in raw:
        raw = _NL_TRIM.sub("\n", raw)
    return raw.strip(" \n")


def extract_text(html: bytes | str) -> str:
    """Pinned extractor E(html) -> text (A.6)."""
    pieces, _ = _pieces_links(html)
    return _finish(pieces)


def extract_links(html: bytes | str) -> list[str]:
    """Raw href values of every <a href>, in document order (A.7)."""
    return _pieces_links(html)[1]


def extract_text_and_links(html: bytes | str) -> tuple[str, list[str]]:
    """Single-pass combined form used by the hot extract stage (M7+M8)."""
    pieces, links = _pieces_links(html)
    return _finish(pieces), links


def extract_text_and_links_reference(html: bytes | str) -> tuple[str, list[str]]:
    """stdlib-HTMLParser reference implementation (differential-test
    twin of the fast scanner; SURVEY.md A.6 rule source)."""
    p = _parse(html)
    return _finish(p.pieces), p.links


# -- anchor text (A.8) ------------------------------------------------------

ANCHOR_MAX_CHARS = 256


def _anchor_text(span_pieces: list[str]) -> str:
    """Pinned anchor normalization: the document-text finish rules,
    then single-line (block newlines inside the anchor become spaces),
    capped at ANCHOR_MAX_CHARS (remote-controlled content)."""
    t = _finish(span_pieces)
    if "\n" in t:
        t = t.replace("\n", " ")
    return t[:ANCHOR_MAX_CHARS]


def extract_anchors(html: bytes | str) -> list[tuple[str, str]]:
    """[(raw href, normalized anchor text)] per <a href>, in document
    order — same href set as extract_links (fast-scanner path)."""
    pieces, links, spans = _scan_full(html)
    return [(links[k], _anchor_text(pieces[s:e]))
            for k, (s, e) in enumerate(spans)]


def extract_anchors_reference(html: bytes | str) -> list[tuple[str, str]]:
    """stdlib-HTMLParser twin of extract_anchors (differential-test
    pair; also the webgraph golden's parser)."""
    p = _parse(html)
    return [(p.links[k], _anchor_text(p.pieces[s:e]))
            for k, (s, e) in enumerate(p.spans)]


# -- rel=canonical (A.9) ----------------------------------------------------

class _CanonicalFound(Exception):
    pass


class _CanonicalParser(HTMLParser):
    """First <link> whose rel token list contains 'canonical' (HTML
    rel is a case-insensitive, whitespace-separated token set) and
    that carries a non-None href.  NOT on the crawl hot path (the fast
    scanner treats <link> as a boring tag); runs in the canonical-
    cluster pipeline's actor pool, where stdlib speed parallelizes."""

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "link":
            return
        rel = href = None
        for k, v in attrs:
            if k == "rel" and rel is None:
                rel = v
            elif k == "href" and href is None:
                href = v
        if (rel is not None and href is not None
                and "canonical" in rel.lower().split()):
            raise _CanonicalFound(href)

    handle_startendtag = handle_starttag


class _HreflangParser(HTMLParser):
    """All <link rel~=alternate hreflang=... href=...> rows, document
    order, duplicates kept (same stdlib-parser tier as the canonical
    kernel — not on the crawl hot path)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.alts: list[tuple[str, str]] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "link":
            return
        rel = href = hreflang = None
        for k, v in attrs:
            if k == "rel" and rel is None:
                rel = v
            elif k == "href" and href is None:
                href = v
            elif k == "hreflang" and hreflang is None:
                hreflang = v
        if (rel is not None and href is not None and hreflang
                and "alternate" in rel.lower().split()):
            self.alts.append((hreflang, href))

    handle_startendtag = handle_starttag


def extract_hreflang(html: bytes | str) -> list[tuple[str, str]]:
    """[(hreflang, raw href)] of the document's rel=alternate hreflang
    links — the cross-language variant declarations (A.9 family)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _HreflangParser()
    try:
        p.feed(html)
        p.close()
    except (AssertionError, NotImplementedError):
        pass  # stdlib raises on unknown marked sections; keep prefix
    return p.alts


def extract_canonical(html: bytes | str) -> str | None:
    """Raw href of the document's first rel=canonical <link>, else
    None.  Shared by the engine pipeline and the sequential golden
    (the links.py shared-kernel pattern; the pipeline-level check is
    the distributed-vs-sequential differential)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _CanonicalParser(convert_charrefs=True)
    try:
        p.feed(html)
        p.close()
    except _CanonicalFound as hit:
        return hit.args[0]
    except (AssertionError, NotImplementedError):
        return None  # stdlib raises on unknown marked sections
    return None
