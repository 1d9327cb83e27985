"""HTML link / image / binary-doc extraction.

From-scratch analog of the reference extractor
(``/root/reference/src/main/scala/com/ieps/crawler/utils/ExtractFromHTML.scala``),
implemented with compiled regexes (no HTML parser library is available in
this environment; the synthetic web emits well-formed attributes, and the
unit tests pin the semantics below).

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


def extract_link(value: str, domain: str) -> Optional[str]:
    """``ExtractFromHTML.extractLink`` analog: canonicalize the value, else
    canonicalize ``domain + value``; None when both fail."""
    c = canonicalize(value)
    if c is not None:
        return c
    return canonicalize(domain + value)


def all_links(html: str, domain: str) -> list:
    """``getAllLinks`` analog: a[href] then onclick values, canonicalized,
    failures dropped, document order preserved."""
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


def image_links(html: str) -> list:
    """``getImages`` analog: canonical img srcs with their conType, in
    document order; srcs that fail to canonicalize are dropped."""
    out = []
    for m in _IMG_SRC.finditer(html):
        c = canonicalize(_attr_val(m))
        if c is not None:
            out.append((c, con_type(c)))
    return out


def image_alt_map(html: str) -> dict:
    """Map canonical img src -> alt text (caption sidecar for the decode
    stage; first occurrence wins). Not a reference behavior — part of the
    north_rule caption-extraction extension."""
    out: dict = {}
    tag_re = re.compile(r"<img\b[^>]*>", re.I | re.S)
    src_re = re.compile(r"\bsrc" + _ATTR, re.I | re.S)
    alt_re = re.compile(r"\balt" + _ATTR, re.I | re.S)
    for m in tag_re.finditer(html):
        tag = m.group(0)
        sm = src_re.search(tag)
        if not sm:
            continue
        c = canonicalize(_attr_val(sm))
        if c is None or c in out:
            continue
        am = alt_re.search(tag)
        out[c] = _attr_val(am) if am else None
    return out


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
    links = all_links(html, domain)
    plinks = page_links(links, scope_substring)
    dlinks = [u for u in data_links(links) if extract_domain(u) == domain]
    local = [u for u in plinks if extract_domain(u) == domain]
    remote = [u for u in plinks if extract_domain(u) != domain]
    alts = image_alt_map(html)
    imgs = [(u, t, alts.get(u)) for (u, t) in image_links(html)
            if extract_domain(u) == domain]
    return {
        "page_links_local": local,
        "page_links_remote": remote,
        "data_links": dlinks,
        "images": imgs,
        "edges": plinks,
    }
