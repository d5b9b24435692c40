"""URL canonicalization C(u, base) — SURVEY.md Appendix A.1.

Pinned rules (the golden fixtures encode exactly these):
  * resolve relative references against ``base`` (RFC 3986 §5, via
    ``urllib.parse.urljoin``);
  * lowercase scheme and host;
  * drop the fragment;
  * strip default ports (80 for http, 443 for https);
  * percent-normalize path and query: decode %XX that encodes an
    unreserved character ``[A-Za-z0-9._~-]``, uppercase the hex of any
    remaining %XX, leave malformed ``%`` sequences untouched;
  * remove dot-segments from the path (RFC 3986 §5.2.4);
  * empty path -> "/";
  * preserve query byte-order (no parameter sorting); drop a trailing
    lone "?";
  * reject schemes outside {http, https} -> returns ``None``.

Reference parity note: the Go reference normalized URLs before
enqueue/lookup (SURVEY.md §2.2 M1 [R, high]); the exact rule set above
is pinned by us because the reference mount was empty (SURVEY.md §0).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789._~-"
)
_HEX = frozenset("0123456789abcdefABCDEF")
_DEFAULT_PORT = {"http": 80, "https": 443}
_ALLOWED_SCHEMES = frozenset(("http", "https"))


def _normalize_percent(s: str) -> str:
    """Decode unreserved %XX, uppercase remaining %XX hex."""
    if "%" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX:
            ch = chr(int(s[i + 1 : i + 3], 16))
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


_WS_ENCODE = {ord(c): f"%{ord(c):02X}" for c in " \t\n\r\x0b\x0c"}


def _encode_ws(s: str) -> str:
    """Percent-encode raw whitespace so canonical URLs survive strip()."""
    return s.translate(_WS_ENCODE)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if "." not in path:
        return path
    output: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if output:
                output.pop()
        elif buf == "/..":
            buf = "/"
            if output:
                output.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            if buf.startswith("/"):
                j = buf.find("/", 1)
            else:
                j = buf.find("/")
            if j == -1:
                output.append(buf)
                buf = ""
            else:
                output.append(buf[:j])
                buf = buf[j:]
    return "".join(output)


def canonicalize(url: str, base: str | None = None) -> str | None:
    """Canonical form of ``url`` (resolved against ``base`` if given).

    Returns ``None`` when the URL is not a crawlable http(s) URL.
    Idempotent: ``canonicalize(canonicalize(u)) == canonicalize(u)``.
    """
    u = url.strip()
    if base is not None:
        try:
            u = urljoin(base, u)
        except ValueError:
            return None
    try:
        parts = urlsplit(u)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in _ALLOWED_SCHEMES:
        return None
    try:
        host = parts.hostname  # already lowercased by urlsplit
        port = parts.port
    except ValueError:
        return None
    if not host:
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORT[scheme]:
        netloc = f"{host}:{port}"
    # userinfo is preserved verbatim if present (not exercised by fixtures)
    if "@" in parts.netloc:
        userinfo = parts.netloc.rsplit("@", 1)[0]
        netloc = f"{userinfo}@{netloc}"
    path = _remove_dot_segments(_encode_ws(_normalize_percent(parts.path)))
    if not path:
        path = "/"
    query = _encode_ws(_normalize_percent(parts.query))
    result = f"{scheme}://{netloc}{path}"
    if query:
        result = f"{result}?{query}"
    return result
