"""URL canonicalization and domain extraction.

Reimplements the observed behavior of the reference canonicalizer
(``/root/reference/src/main/scala/com/ieps/crawler/utils/Canonical.scala:15-67``)
including its quirks, which are load-bearing for crawl-set parity:

* missing scheme => ``http://`` prepended (``Canonical.scala:24-26``)
* host lowercased by replacing EVERY occurrence of the host substring in the
  URL (Java ``String.replace`` replaces all; ``Canonical.scala:31``)
* fragment removed by deleting every occurrence of ``"#" + fragment``
  (``Canonical.scala:34-36``)
* any of 14 default index pages removed by SUBSTRING match: if the page name
  appears anywhere in the URL, ``"/" + name`` is deleted everywhere
  (``Canonical.scala:38-42``)
* a trailing ``/`` is appended to the WHOLE url when the original path does
  not end with ``/`` — even after a query string (``Canonical.scala:43-45``)
* normalization pass (crawler-commons BasicURLNormalizer analog): lowercase
  scheme+host, strip default ports, resolve ``/./`` and ``/../`` segments
  (``Canonical.scala:46``)
* the trailing ``/`` is stripped again when the lowercased URL ends in one of
  27 known file extensions + ``/`` (``Canonical.scala:49-53``)
* any parse error => ``None`` (``Canonical.scala:55-58``)

Domain extraction (``Canonical.scala:61-67``): host of the canonical URL; a
host starting with ``"www"`` loses its first FOUR characters (so
``www.x.si -> x.si`` but also ``wwwz.si -> .si`` — faithful quirk); any
error => ``""``.

The batch entry points (``canonicalize_batch``) are the `map_batches`
surface: python-level string work per URL (inherently non-vectorizable),
parallelized across Ray tasks; everything around it stays Arrow.
"""

from __future__ import annotations

import re
from typing import Optional

INDEX_PAGES = (
    "index.html", "index.htm", "index.shtml", "index.php", "default.html",
    "default.htm", "home.html", "home.htm", "index.php5", "index.php4",
    "index.cgi", "index.php3", "placeholder.html", "default.asp",
)

# Canonical.scala:13 — note ".ppt" and ".asp" appear twice in the reference
# array; duplicates are harmless for an endswith sweep.
EXTENSIONS = (
    ".html", ".htm", ".php", ".ppt", ".pdf", ".doc", ".docx", ".pptx",
    ".php5", ".php4", ".cgi", ".php3", ".asp", ".jpg", ".png", ".jpeg",
    ".svg", ".tiff", ".gif", ".jsp", ".jspx", ".aspx", ".zip", ".gz",
    ".tar.gz", ".tar",
)

_DEFAULT_PORT = {"http": 80, "https": 443}

# java.net.URI rejects authorities with characters outside the RFC host set
# (Canonical.scala:48 — the multi-arg URI ctor throws -> getCanonical None);
# we validate the host the same way.
_HOST_OK = re.compile(r"^[A-Za-z0-9._-]*$")

# scheme://[userinfo@]host[:port][/path][?query][#fragment]
_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?:(?P<user>[^/?#@]*)@)?"
    r"(?P<host>[^/?#:@]*)"
    r"(?::(?P<port>[^/?#]*))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<frag>.*))?$",
    re.S,
)


class _Parts:
    __slots__ = ("scheme", "user", "host", "port", "path", "query", "frag")

    def __init__(self, scheme, user, host, port, path, query, frag):
        self.scheme = scheme
        self.user = user
        self.host = host
        self.port = port
        self.path = path
        self.query = query
        self.frag = frag


def _parse(url: str) -> Optional[_Parts]:
    """java.net.URL-ish parse of an absolute http(s) URL; None on error."""
    m = _URL_RE.match(url)
    if m is None:
        return None
    scheme = m.group("scheme").lower()
    if scheme not in ("http", "https"):
        return None
    if not _HOST_OK.match(m.group("host")):
        return None
    port_s = m.group("port")
    port = None
    if port_s is not None:
        if port_s == "":
            port = None  # java: "http://x.si:/a" -> port -1
        else:
            try:
                port = int(port_s)
            except ValueError:
                return None  # java URL: invalid port -> MalformedURLException
            if port < 0 or port >= 1 << 31:
                return None  # java Integer.parseInt overflow -> Malformed
    return _Parts(scheme, m.group("user"), m.group("host"), port,
                  m.group("path") or "", m.group("query"), m.group("frag"))


def _resolve_dots(path: str) -> str:
    """RFC3986 remove_dot_segments, preserving empty segments (``//``)."""
    if not path:
        return path
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve a trailing "/" that came from "." or ".."
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    return "/".join(out)


def _rebuild(p: _Parts, *, lower_host: bool, strip_default_port: bool) -> str:
    host = p.host.lower() if lower_host else p.host
    s = p.scheme + "://"
    if p.user is not None:
        s += p.user + "@"
    s += host
    if p.port is not None and not (
        strip_default_port and _DEFAULT_PORT.get(p.scheme) == p.port
    ):
        s += ":" + str(p.port)
    s += p.path
    if p.query is not None:
        s += "?" + p.query
    if p.frag is not None:
        s += "#" + p.frag
    return s


def _basic_normalize(url: str) -> Optional[str]:
    """crawler-commons BasicURLNormalizer analog (documented subset):
    lowercase scheme+host, strip default port, resolve dot segments.
    Percent-encoding normalization is intentionally out of scope (the
    synthetic web uses unescaped ASCII URLs)."""
    p = _parse(url)
    if p is None:
        return None
    p.path = _resolve_dots(p.path)
    return _rebuild(p, lower_host=True, strip_default_port=True)


def canonicalize(url: Optional[str]) -> Optional[str]:
    """Port-faithful analog of ``Canonical.getCanonical`` (see module doc)."""
    if url is None:
        return None
    try:
        wild = url
        if not (wild.startswith("http://") or wild.startswith("https://")):
            wild = "http://" + wild
        p0 = _parse(wild)
        if p0 is None:
            return None
        # Canonical.scala:31 — replace ALL occurrences of the host substring
        url1 = wild
        if p0.host:
            url1 = url1.replace(p0.host, p0.host.lower())
        # Canonical.scala:34-36 — remove every "#"+fragment occurrence
        if p0.frag is not None and p0.frag != "":
            url1 = url1.replace("#" + p0.frag, "")
        elif p0.frag == "":
            url1 = url1.replace("#", "")  # bare trailing '#'
        # Canonical.scala:38-42 — substring-triggered index-page removal
        for name in INDEX_PAGES:
            if name in url1:
                url1 = url1.replace("/" + name, "")
        # Canonical.scala:43-45 — trailing slash on the whole string when the
        # ORIGINAL path does not end with "/"
        if not p0.path.endswith("/"):
            url1 = url1 + "/"
        c = _basic_normalize(url1)
        if c is None:
            return None
        # Canonical.scala:47-48 — rebuild from components (fragment dropped
        # by now); our normalize already produced component form.
        urii = c
        # Canonical.scala:49-53 — strip the trailing "/" after a known ext
        low = urii.lower()
        for ext in EXTENSIONS:
            if low.endswith(ext + "/"):
                urii = urii[:-1]
                low = low[:-1]
        return urii
    except Exception:
        return None


def extract_domain(url: Optional[str]) -> str:
    """Analog of ``Canonical.extractDomain`` (``Canonical.scala:61-67``)."""
    try:
        canon = canonicalize(url)
        if canon is None:
            return ""
        p = _parse(canon)
        if p is None or p.host is None:
            return ""
        host = p.host
        if host.startswith("www"):
            return host[4:]  # faithful quirk: drops 4 chars even sans dot
        return host
    except Exception:
        return ""


def canonicalize_many(urls) -> list:
    """Batch helper: list of canonical urls (None where unparseable)."""
    return [canonicalize(u) for u in urls]


def extract_domain_many(urls) -> list:
    return [extract_domain(u) for u in urls]
