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
    """One pass over the document collecting text pieces and hrefs."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pieces: list[str] = []
        self.links: list[str] = []
        self._skip_depth = 0

    # -- tag handling ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)
                    break
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth == 0 and tag in BLOCK_TAGS:
            self.pieces.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <br/> and friends: treat as open+close at once
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)
                    break
        if tag in SKIP_TAGS:
            return  # empty skip subtree
        if self._skip_depth == 0 and tag in BLOCK_TAGS:
            self.pieces.append("\n")
            self.pieces.append("\n")

    def handle_endtag(self, tag: str) -> None:
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
    return p


def extract_text(html: bytes | str) -> str:
    """Pinned extractor E(html) -> text (A.6)."""
    p = _parse(html)
    raw = "".join(p.pieces)
    lines = [ln.strip() for ln in raw.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_links(html: bytes | str) -> list[str]:
    """Raw href values of every <a href>, in document order (A.7)."""
    return _parse(html).links


def extract_text_and_links(html: bytes | str) -> tuple[str, list[str]]:
    """Single-pass combined form used by the hot extract stage (M7+M8)."""
    p = _parse(html)
    raw = "".join(p.pieces)
    lines = [ln.strip() for ln in raw.split("\n")]
    return "\n".join(ln for ln in lines if ln), p.links
