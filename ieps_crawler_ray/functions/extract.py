"""HTML link / image / binary-doc extraction.

From-scratch analog of the reference extractor
(``/root/reference/src/main/scala/com/ieps/crawler/utils/ExtractFromHTML.scala``).
The reference parses with jsoup; here the default path is a tolerant
stdlib ``html.parser`` tokenizer (handles unquoted attributes, tags
spanning newlines, comments containing ``<a``, script CDATA — the
real-world-HTML cases a regex can't), with the original compiled-regex
path kept as a documented fallback and parity check.

Observed reference semantics reproduced here:

* ``a[href]`` links in document order, then ``onclick`` attribute values of
  ALL elements in document order (``ExtractFromHTML.scala:52-80``); each
  value goes through ``extractLink``: canonicalize the raw value, and on
  failure canonicalize ``domain + value`` (``:98-105``). Values that fail
  both are dropped.
* page links (``getPageLinks``, ``:86-88``): all links − those ending in
  {.pdf .doc .docx .ppt .pptx .zip .jpg "jpeg" .png}  (note ``jpeg``
  without the dot — faithful) → order-preserving distinct → keep only urls
  containing the scope substring (reference hardcodes ``"gov.si"``; here a
  parameter) → drop urls containing ``"///"``.
* data links (``getPageData``, ``:90-92``): all links ending in
  {.pdf .doc .docx .ppt .pptx}; NO distinct, NO scope filter (faithful).
* images (``getImages``, ``:25-47``): ``img[src]`` canonicalized; the
  fallback branch in ``imgLink`` (``:107-118``) is dead code in the
  reference (``getCanonical`` never throws), so a src that does not
  canonicalize is dropped. Relative srcs canonicalize to junk hosts and are
  later dropped by the same-domain filter — also faithful.
* image page_type = ``conType`` (``:120``): the extension after the last
  ``.``, sliced with the *char code of the last character* as the end index
  (Scala ``url.slice(url.lastIndexOf(".")+1, url.last)`` where ``url.last``
  is a Char implicitly widened to Int) — a faithful quirk, pinned in tests.
* same-domain filtering (``DomainWorkerActor.scala:273-279``): images and
  data links are kept only when ``extract_domain(url) == domain``;
  cross-domain images/data are dropped entirely. Page links are split into
  same-domain and cross-domain sets (both crawled).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional

from .canonical import canonicalize, extract_domain

NON_LINK_EXTENSIONS = (".pdf", ".doc", ".docx", ".ppt", ".pptx", ".zip",
                       ".jpg", "jpeg", ".png")
PAGE_DATA_EXTENSIONS = (".pdf", ".doc", ".docx", ".ppt", ".pptx")

# MIME -> data_type_code map (HeadlessBrowser.scala:33-39)
MIME_TO_DATA_TYPE = {
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "DOCX",
    "application/msword": "DOC",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation": "PPT",
    "application/vnd.ms-powerpoint": "PPT",
    "application/pdf": "PDF",
}

_ATTR = r"""\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))"""
_A_HREF = re.compile(r"<a\b[^>]*?\bhref" + _ATTR, re.I | re.S)
_IMG_SRC = re.compile(r"<img\b[^>]*?\bsrc" + _ATTR, re.I | re.S)
_ONCLICK = re.compile(r"<\w[^>]*?\bonclick" + _ATTR, re.I | re.S)


def _attr_val(m: re.Match) -> str:
    return next(g for g in m.groups() if g is not None)


class _ExtractParser(HTMLParser):
    """One-pass tolerant tokenizer: collects ``a[href]`` values, every
    element's ``onclick`` value, and ``img`` (src, alt) pairs, each in
    document order (``ExtractFromHTML.scala:25-80`` traversal orders).
    Comments, doctypes, script/style CDATA and processing instructions are
    skipped by the tokenizer itself — the jsoup-parity cases."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list = []
        self.onclicks: list = []
        self.imgs: list = []

    def handle_starttag(self, tag, attrs):
        d: dict = {}
        for k, v in attrs:
            if k not in d:         # first occurrence wins (jsoup keeps
                d[k] = v           # the first duplicate attribute)
        if tag == "a" and d.get("href") is not None:
            self.hrefs.append(d["href"])
        if d.get("onclick") is not None:
            self.onclicks.append(d["onclick"])
        if tag == "img" and d.get("src") is not None:
            self.imgs.append((d["src"], d.get("alt")))


def parse_html(html: str) -> _ExtractParser:
    """Tokenize once; a hard tokenizer failure degrades to whatever was
    collected before the failure (never raises on malformed input)."""
    p = _ExtractParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p


def extract_link(value: str, domain: str) -> Optional[str]:
    """``ExtractFromHTML.extractLink`` analog: canonicalize the value, else
    canonicalize ``domain + value``; None when both fail."""
    c = canonicalize(value)
    if c is not None:
        return c
    return canonicalize(domain + value)


def _links_from_parsed(p: _ExtractParser, domain: str) -> list:
    out = []
    for v in p.hrefs:
        c = extract_link(v, domain)
        if c is not None:
            out.append(c)
    for v in p.onclicks:
        c = extract_link(v, domain)
        if c is not None:
            out.append(c)
    return out


def all_links(html: str, domain: str) -> list:
    """``getAllLinks`` analog: a[href] then onclick values, canonicalized,
    failures dropped, document order preserved."""
    return _links_from_parsed(parse_html(html), domain)


def all_links_regex(html: str, domain: str) -> list:
    """Regex fallback path (original implementation) — kept for the
    parser-parity test on well-formed HTML."""
    out = []
    for m in _A_HREF.finditer(html):
        c = extract_link(_attr_val(m), domain)
        if c is not None:
            out.append(c)
    for m in _ONCLICK.finditer(html):
        c = extract_link(_attr_val(m), domain)
        if c is not None:
            out.append(c)
    return out


def page_links(links: list, scope_substring: str = "gov.si") -> list:
    """``getPageLinks`` analog over a precomputed ``all_links`` result."""
    kept = [u for u in links if not any(u.endswith(e) for e in NON_LINK_EXTENSIONS)]
    seen = set()
    distinct = []
    for u in kept:
        if u not in seen:
            seen.add(u)
            distinct.append(u)
    return [u for u in distinct if scope_substring in u and "///" not in u]


def data_links(links: list) -> list:
    """``getPageData`` analog: duplicates retained, no scope filter."""
    return [u for u in links if any(u.endswith(e) for e in PAGE_DATA_EXTENSIONS)]


def con_type(url: Optional[str]) -> Optional[str]:
    """``conType`` analog with the faithful char-code slice quirk."""
    if url is None or url == "":
        return None
    start = url.rfind(".") + 1
    stop = ord(url[-1])  # Scala: url.last widened Char->Int
    return url[start:stop].upper()


def _images_from_parsed(p: _ExtractParser) -> list:
    out = []
    for src, _alt in p.imgs:
        c = canonicalize(src)
        if c is not None:
            out.append((c, con_type(c)))
    return out


def image_links(html: str) -> list:
    """``getImages`` analog: canonical img srcs with their conType, in
    document order; srcs that fail to canonicalize are dropped."""
    return _images_from_parsed(parse_html(html))


def _alt_map_from_parsed(p: _ExtractParser) -> dict:
    out: dict = {}
    for src, alt in p.imgs:
        c = canonicalize(src)
        if c is not None and c not in out:
            out[c] = alt
    return out


def image_alt_map(html: str) -> dict:
    """Map canonical img src -> alt text (caption sidecar for the decode
    stage; first occurrence wins). Not a reference behavior — part of the
    north_rule caption-extraction extension."""
    return _alt_map_from_parsed(parse_html(html))


def extract_page(html: str, domain: str, scope_substring: str = "gov.si") -> dict:
    """Full extraction for one fetched page — the unit the parse stage maps
    over. Returns dict with:

      ``page_links_local`` / ``page_links_remote``: same/cross-domain page
      links (order preserved; enqueue order in the reference is data →
      images → page links, ``DomainWorkerActor.scala:183-205``)
      ``data_links``: same-domain binary-doc links (cross-domain dropped)
      ``images``: same-domain (canonical_src, con_type, alt) triples
      ``edges``: extraction-order page-link targets for the link graph
    """
    p = parse_html(html)  # ONE tokenizer pass feeds links+images+alts
    links = _links_from_parsed(p, domain)
    plinks = page_links(links, scope_substring)
    dlinks = [u for u in data_links(links) if extract_domain(u) == domain]
    local = [u for u in plinks if extract_domain(u) == domain]
    remote = [u for u in plinks if extract_domain(u) != domain]
    alts = _alt_map_from_parsed(p)
    imgs = [(u, t, alts.get(u)) for (u, t) in _images_from_parsed(p)
            if extract_domain(u) == domain]
    return {
        "page_links_local": local,
        "page_links_remote": remote,
        "data_links": dlinks,
        "images": imgs,
        "edges": plinks,
    }
