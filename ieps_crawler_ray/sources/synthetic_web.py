"""Deterministic synthetic crawlable web (FIXTURES.md F2).

The sandbox stand-in for the internet: a pure function of ``WorldConfig``.
Page HTML is rendered LAZILY per URL (seeded per-page RNG), so fetch actors
only need the small config + the corpus table reference — nothing web-sized
is ever materialized or shipped. In production this module is replaced by a
real HTTP client inside the fetch actor pool (``stages/fetch.py``); the
status/content-type classification contract is identical
(``HeadlessBrowser.scala:47-105`` semantics).

The topology deliberately exercises every reference quirk path:
URL variants that canonicalize together (#fragment, index.html, UPPERCASE
host), ``www.`` and ``https`` aliases that fetch the same content under a
different canonical URL (-> content-hash DUPLICATE), robots-disallowed
/private/ paths, rooted hrefs (///), relative hrefs (junk hosts),
out-of-scope hosts, unknown hosts (INVALID 404), text/plain pages
(INVALID 400), error routes (404/403/500), doc links (.pdf/.docx/...),
.zip links (excluded), images with alt captions from the corpus, onclick
links, and Zipf-skewed domain sizes (one hot domain for the skew path).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class WorldConfig:
    n_domains: int = 5
    total_pages: int = 50
    n_corpus: int = 100
    seed: int = 42
    scope: str = "gov.si"
    zipf_s: float = 1.2
    n_seeds: int = 4


def _stable_u64(*parts) -> int:
    h = hashlib.blake2b("|".join(str(p) for p in parts).encode(),
                        digest_size=8)
    return int.from_bytes(h.digest(), "big")


class SyntheticWeb:
    """Deterministic web. ``fetch(url)`` is the only hot entry point."""

    def __init__(self, cfg: WorldConfig, corpus: pa.Table):
        self.cfg = cfg
        self.corpus = corpus
        self.n_corpus = corpus.num_rows
        self._corpus_ids = corpus.column("image_id").to_pylist()
        self._corpus_fmts = corpus.column("fmt").to_pylist()
        self._corpus_caps = corpus.column("caption").to_pylist()
        self.domains = [f"site{d:04d}.{cfg.scope}" for d in range(cfg.n_domains)]
        ranks = np.arange(1, cfg.n_domains + 1, dtype=np.float64)
        weights = ranks ** (-cfg.zipf_s)
        weights /= weights.sum()
        sizes = np.maximum(3, np.round(weights * cfg.total_pages)).astype(int)
        self.sizes = {dom: int(s) for dom, s in zip(self.domains, sizes)}
        self.seeds = [f"http://{self.domains[i]}/p/0/"
                      for i in range(min(cfg.n_seeds, cfg.n_domains))]

    # ---------------- robots / sitemaps ----------------

    def robots_txt(self, domain: str):
        base = domain[4:] if domain.startswith("www.") else domain
        if base not in self.sizes:
            return None
        d = self.domains.index(base)
        r = _stable_u64("robots", self.cfg.seed, d) % 100
        if r < 10:
            return None  # missing => allow-all + 4 s default
        lines = ["User-agent: *"]
        if 10 <= r < 25:
            lines.append("Disallow: /private/")
        elif 25 <= r < 30:
            # a band of domains disallows images/docs — exercises the
            # DISALLOWED-page path for kind 1/2 frontier entries
            lines.append("Disallow: /img/")
            lines.append("Disallow: /doc/")
        delay = (1, 2, 4)[_stable_u64("delay", self.cfg.seed, d) % 3]
        if r % 3 != 0:
            lines.append(f"Crawl-delay: {delay}")
        if r >= 92 or d < 2:  # seed-ish domains get sitemaps
            lines.append(f"Sitemap: http://{base}/sitemap.xml")
        return "\n".join(lines) + "\n"

    def _sitemap_ks(self, base: str) -> list:
        size = self.sizes[base]
        # deep pages (upper half) that the link graph may not reach
        return sorted({(_stable_u64("smap", self.cfg.seed, base, j) % size)
                       for j in range(4)})

    def has_sitemap_index(self, base: str) -> bool:
        """Half the sitemap-bearing domains serve a sitemap INDEX at
        /sitemap.xml whose <loc>s are child sitemaps — exercises the
        recursive descent path (SiteMaps.scala:12-55)."""
        return _stable_u64("smidx", self.cfg.seed, base) % 2 == 0

    def sitemap_xml(self, domain: str, part: int = None):
        base = domain[4:] if domain.startswith("www.") else domain
        if base not in self.sizes:
            return None
        ks = self._sitemap_ks(base)
        if part is None and self.has_sitemap_index(base):
            locs = "".join(
                f"<sitemap><loc>http://{base}/sitemap-{i}.xml</loc></sitemap>"
                for i in range(2))
            return f'<?xml version="1.0"?><sitemapindex>{locs}</sitemapindex>'
        if part is not None:
            if not self.has_sitemap_index(base) or part not in (0, 1):
                return None
            ks = [k for i, k in enumerate(ks) if i % 2 == part]
        urls = "".join(f"<url><loc>http://{base}/p/{k}/</loc></url>" for k in ks)
        return f'<?xml version="1.0"?><urlset>{urls}</urlset>'

    # ---------------- page rendering ----------------

    def _render_page(self, domain: str, k: int) -> str:
        cfg = self.cfg
        size = self.sizes[domain]
        d = self.domains.index(domain)
        rng = np.random.default_rng(_stable_u64("page", cfg.seed, domain, k))
        parts = [f"<html><head><title>{domain} page {k}</title></head><body>",
                 f"<h1>Page {k} of {domain}</h1>"]

        def a(href):
            parts.append(f'<a href="{href}">l</a>')

        # intra-domain links with canonicalization variants
        n_intra = int(rng.integers(2, 7))
        for _ in range(n_intra):
            t = int(rng.integers(0, size + 1))  # size => 404 target
            href = f"http://{domain}/p/{t}/"
            v = int(rng.integers(0, 12))
            if v == 0:
                href = f"http://{domain.upper()}/p/{t}/"
            elif v == 1:
                href = f"http://{domain}/p/{t}/index.html"
            elif v == 2:
                href = f"http://{domain}/p/{t}/#sec{int(rng.integers(9))}"
            elif v == 3:
                href = f"http://www.{domain}/p/{t}/"      # www alias page
            elif v == 4:
                href = f"https://{domain}/p/{t}/"          # https alias page
            elif v == 5:
                href = f"http://{domain}/dup/{t}/"         # content duplicate
            a(href)
        # cross-domain links
        for _ in range(int(rng.integers(1, 4))):
            dd = int(rng.integers(0, cfg.n_domains))
            tdom = self.domains[dd]
            t = int(rng.integers(0, self.sizes[tdom]))
            a(f"http://{tdom}/p/{t}/")
        # quirk / junk links
        v = int(rng.integers(0, 10))
        if v < 3:
            a(f"/p/{int(rng.integers(size))}")             # rooted -> ///
        if v in (3, 4):
            a(f"p/{int(rng.integers(size))}")              # relative -> junk host
        if v == 5:
            a(f"http://site{d:04d}.example.com/out")       # out of scope
        if v == 6:
            a(f"http://nohost{int(rng.integers(3))}.{cfg.scope}/")  # unknown host
        if v == 7:
            a(f"http://{domain}/plain/{k}")                # text/plain page
        if v == 8:
            a(f"http://{domain}/err/{int(rng.integers(3))}/")  # 500/403 route
        if v == 9 and cfg.scope not in ("",):
            a(f"http://{domain}/private/{int(rng.integers(5))}/")  # robots-gated
        # archive link (excluded by extension filter)
        if int(rng.integers(0, 4)) == 0:
            a(f"http://{domain}/files/a{k}.zip")
        # doc links
        for _ in range(int(rng.integers(0, 3))):
            j = int(rng.integers(0, 50))
            ext = ("pdf", "docx", "pptx", "doc")[int(rng.integers(4))]
            a(f"http://{domain}/doc/{j}.{ext}")
        # images (same-domain srcs; idx ties into the corpus)
        for i in range(int(rng.integers(1, 4))):
            idx = _stable_u64("img", cfg.seed, domain, k, i) % self.n_corpus
            fmt = self._corpus_fmts[idx]
            iid = self._corpus_ids[idx]
            alt = self._corpus_caps[idx]
            if int(rng.integers(0, 8)) == 0:
                parts.append(f'<img src="http://{domain}/img/{iid}.{fmt}">')
            else:
                parts.append(
                    f'<img src="http://{domain}/img/{iid}.{fmt}" alt="{alt}">')
        # onclick link
        if int(rng.integers(0, 3)) == 0:
            t = int(rng.integers(0, size))
            parts.append(
                f'<div onclick="http://{domain}/p/{t}/">click</div>')
        parts.append("</body></html>")
        return "\n".join(parts)

    def _doc_bytes(self, domain: str, j: int, ext: str) -> bytes:
        magic = {"pdf": b"%PDF-1.4\n", "doc": b"\xd0\xcf\x11\xe0",
                 "docx": b"PK\x03\x04", "pptx": b"PK\x03\x04",
                 "ppt": b"\xd0\xcf\x11\xe0"}[ext]
        rng = np.random.default_rng(_stable_u64("doc", self.cfg.seed, domain, j, ext))
        return magic + rng.bytes(int(rng.integers(200, 2000)))

    _DOC_MIME = {"pdf": "application/pdf",
                 "doc": "application/msword",
                 "docx": ("application/vnd.openxmlformats-officedocument"
                          ".wordprocessingml.document"),
                 "ppt": "application/vnd.ms-powerpoint",
                 "pptx": ("application/vnd.openxmlformats-officedocument"
                          ".presentationml.presentation")}

    # ---------------- fetch ----------------

    _URL = re.compile(r"^(https?)://([^/]+)(/.*)?$")

    def fetch(self, url: str) -> dict:
        """Returns {status, content_type, text, data, load_time_ms} or
        {"error": "unknown_host"/"malformed"} — the raw-wire result the
        fetch stage classifies (HeadlessBrowser.scala semantics)."""
        load = 50 + (_stable_u64("lt", url) % 400)
        m = self._URL.match(url)
        if not m:
            return {"error": "malformed"}
        host = m.group(2).lower()
        if ":" in host:
            host = host.split(":", 1)[0]
        base = host[4:] if host.startswith("www.") else host
        if base not in self.sizes:
            return {"error": "unknown_host"}
        domain = base
        path = m.group(3) or "/"
        size = self.sizes[domain]

        def html(status, text):
            return {"status": status, "content_type": "text/html",
                    "text": text, "data": None, "load_time_ms": load}

        if path == "/":
            # domain homepage: links into the first pages (every new domain's
            # root is enqueued first — DomainWorkerActor.scala:70-75 analog)
            links = "".join(f'<a href="http://{domain}/p/{t}/">p{t}</a>'
                            for t in range(min(5, size)))
            return html(200, f"<html><body><h1>{domain}</h1>{links}</body></html>")
        pm = re.match(r"^/p/(\d+)/?$", path)
        if pm:
            k = int(pm.group(1))
            if k >= size:
                return html(404, f"<html><body>not found {k}</body></html>")
            return html(200, self._render_page(domain, k))
        dm = re.match(r"^/dup/(\d+)/?$", path)
        if dm:  # same content as /p/k/ under a different URL => hash dup
            k = int(dm.group(1))
            if k >= size:
                return html(404, "<html><body>nope</body></html>")
            return html(200, self._render_page(domain, k))
        if re.match(r"^/private/(\d+)/?$", path):
            return html(200, "<html><body>private</body></html>")
        if path == "/robots.txt":
            txt = self.robots_txt(domain)
            if txt is None:
                return html(404, "<html><body>no robots</body></html>")
            return {"status": 200, "content_type": "text/plain", "text": txt,
                    "data": None, "load_time_ms": load}
        if path == "/sitemap.xml":
            xml = self.sitemap_xml(domain)
            return {"status": 200, "content_type": "application/xml",
                    "text": xml, "data": None, "load_time_ms": load}
        sm = re.match(r"^/sitemap-(\d+)\.xml$", path)
        if sm:
            xml = self.sitemap_xml(domain, part=int(sm.group(1)))
            if xml is None:
                return html(404, "<html><body>no sitemap part</body></html>")
            return {"status": 200, "content_type": "application/xml",
                    "text": xml, "data": None, "load_time_ms": load}
        if re.match(r"^/plain/\d+/?$", path):
            return {"status": 200, "content_type": "text/plain",
                    "text": "plain text body", "data": None,
                    "load_time_ms": load}
        em = re.match(r"^/err/(\d+)/?$", path)
        if em:
            status = (500, 403, 503)[int(em.group(1)) % 3]
            return html(status, "<html><body>err</body></html>")
        im = re.match(r"^/img/(img\d{8})\.(\w+)$", path)
        if im:
            iid, fmt = im.group(1), im.group(2)
            idx = int(iid[3:])
            if idx < self.n_corpus and self._corpus_fmts[idx] == fmt:
                data = self.corpus.column("bytes")[idx].as_py()
                return {"status": 200, "content_type": f"image/{fmt}",
                        "text": None, "data": data, "load_time_ms": load}
            return html(404, "<html><body>no image</body></html>")
        om = re.match(r"^/doc/(\d+)\.(pdf|docx?|pptx?)$", path)
        if om:
            j, ext = int(om.group(1)), om.group(2)
            return {"status": 200, "content_type": self._DOC_MIME[ext],
                    "text": None, "data": self._doc_bytes(domain, j, ext),
                    "load_time_ms": load}
        if re.match(r"^/files/.*\.zip$", path):
            return {"status": 200, "content_type": "application/zip",
                    "text": None, "data": b"PK\x03\x04zipzip",
                    "load_time_ms": load}
        return html(404, "<html><body>404</body></html>")

    def get_robots(self, domain: str):
        """robots fetch as the reference does it (getRobotsTxt)."""
        res = self.fetch(f"http://{domain}/robots.txt")
        if res.get("status") == 200:
            return res["text"]
        return None

    def get_sitemap_urls(self, domain: str, robots_text) -> list:
        """Sitemap URLs for a domain: parse robots 'Sitemap:' lines, fetch
        each, recursively descend sitemap indexes
        (SiteMaps.scala:12-55 analog)."""
        from ..functions.robots import parse_robots, resolve_sitemaps
        rules = parse_robots(robots_text)
        urls, _content = resolve_sitemaps(self.fetch, rules.sitemaps)
        return urls
