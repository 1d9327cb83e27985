"""Single-threaded oracle crawler (SURVEY.md §5.2, FIXTURES.md F5).

A sequential, dict-based implementation of the crawl semantics (reference v2
behavior per SURVEY.md §2-3, round-based deterministic refinement). The Ray
engine must reproduce its outputs exactly:

* final URL-seen set (set equality)
* per-domain processing order + seq + logical fetch_time (exact)
* pages / images / page_data / links tables (value equality)

It shares ONLY the pure policy functions in ``functions/`` with the engine
(canonicalize, extract, robots, fetch classification, per-domain schedule) —
those ARE the semantics; what the oracle checks is the distributed
arrangement: sharded seen-set actors, content-hash winner resolution,
domain-hash shuffles, checkpointing.

Semantics notes (pinned against the reference):
* a seed URL is never enqueued itself — only its domain's root + the
  domain's robots-sitemap URLs (``FrontierManagerActor.scala:51-75``,
  seed-init path; faithful quirk).
* every newly discovered domain enqueues its root first
  (``DomainWorkerActor.scala:70-75``); its sitemaps are fetched and stored
  but NOT enqueued (``FrontierManagerActor.scala:85-99`` discards
  ``inferSite``'s sitemap urls — faithful quirk).
* ``download`` (fetch image/doc payloads) is true iff the domain string is
  a substring of any seed URL (``FrontierManagerActor.scala:95,110``).
* content-hash DUPLICATE pages are still extracted; only URL-duplicates
  skip extraction (see fetchclass.py docstring).
* image rows: duplicate rows keep the ORIGINAL image's parent page;
  page_data duplicate rows keep their OWN parent (``CrawlerDIO.scala:
  159-178`` asymmetry, faithful).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions import image_codec as ic
from ..functions.canonical import canonicalize, extract_domain
from ..functions.extract import MIME_TO_DATA_TYPE, con_type, extract_page
from ..functions.fetchclass import (PT_DISALLOWED, PT_DUPLICATE, PT_HTML,
                                    classify_fetch, fetch_ok_for_extraction)
from ..functions.hashing import url_hash128
from ..functions.robots import parse_robots
from ..functions.schedule import (CLS_DATA, CLS_IMAGE, CLS_LINK, KIND_DATA,
                                  KIND_HTML, KIND_IMAGE,
                                  schedule_domain_rows)

_IMG_ID = re.compile(r"img(\d{8})")


class OracleCrawler:
    def __init__(self, web, scope: str = "gov.si", max_rounds=None,
                 max_pages=None):
        self.web = web
        self.scope = scope
        self.max_rounds = max_rounds
        self.max_pages = max_pages
        # state
        self.sites: dict = {}          # domain -> site dict
        self.domain_state: dict = {}   # domain -> [clock_ms, next_seq]
        self.seen_urls: set = set()
        self.hash_seen: set = set()
        self.image_seen: dict = {}     # filename -> original parent url
        self.data_seen: set = set()
        # outputs
        self.pages: list = []
        self.images: list = []
        self.page_data: list = []
        self.edge_records: list = []
        self.order: list = []          # (domain, rank, url, kind)

    # ------------------------------------------------------------------

    def _bootstrap_site(self, domain: str, seeds: list) -> None:
        if domain in self.sites:
            return
        robots_txt = self.web.get_robots(domain)
        rules = parse_robots(robots_txt)
        from ..functions.robots import resolve_sitemaps
        sitemap_urls, sitemap_content = resolve_sitemaps(
            self.web.fetch, rules.sitemaps)
        download = any(domain in s for s in seeds)
        self.sites[domain] = {
            "domain": domain, "robots_content": robots_txt,
            "sitemap_content": sitemap_content, "download": download,
            "rules": rules, "sitemap_urls": sitemap_urls,
        }
        self.domain_state[domain] = [0, 0]

    def run(self, seeds=None) -> dict:
        seeds = list(seeds) if seeds is not None else list(self.web.seeds)
        candidates: dict = {}

        def add_candidate(row):
            candidates.setdefault(row["domain"], []).append(row)

        # ---- generation 0: per seed, root + sitemap urls (seed-init path)
        for i, seed in enumerate(seeds):
            dom = extract_domain(seed)
            if not dom:
                continue
            first_time = dom not in self.sites
            self._bootstrap_site(dom, seeds)
            if not first_time:
                continue
            root = canonicalize(dom)
            add_candidate({"url": root, "domain": dom, "kind": KIND_HTML,
                           "parent_url": None, "p_dom": "", "p_seq": -1,
                           "cls": -1, "pos": 0, "enq_time": 0})
            for j, su in enumerate(self.web.get_sitemap_urls(
                    dom, self.sites[dom]["robots_content"])):
                cu = canonicalize(su)
                if cu is None or extract_domain(cu) != dom:
                    continue
                add_candidate({"url": cu, "domain": dom, "kind": KIND_HTML,
                               "parent_url": None, "p_dom": "", "p_seq": i,
                               "cls": 0, "pos": j, "enq_time": 0})

        rnd = 0
        while candidates:
            if self.max_rounds is not None and rnd >= self.max_rounds:
                break
            if self.max_pages is not None and len(self.pages) >= self.max_pages:
                break
            next_candidates: dict = {}

            def add_next(row):
                next_candidates.setdefault(row["domain"], []).append(row)

            # register new domains (robots fetch + root enqueue, this round)
            for dom in sorted(candidates):
                if dom not in self.sites:
                    self._bootstrap_site(dom, seeds)
                    root = canonicalize(dom)
                    candidates[dom].append(
                        {"url": root, "domain": dom, "kind": KIND_HTML,
                         "parent_url": None, "p_dom": "", "p_seq": -1,
                         "cls": -1, "pos": 0, "enq_time": 0})

            for dom in sorted(candidates):
                site = self.sites[dom]
                rules = site["rules"]
                delay = rules.get_delay_ms()
                rows = []
                for r in candidates[dom]:
                    r = dict(r)
                    r["allowed"] = rules.is_allowed(r["url"])
                    r["delay_ms"] = delay
                    if r["kind"] == KIND_HTML:
                        r["seen"] = r["url"] in self.seen_urls
                    rows.append(r)
                clock, nseq = self.domain_state[dom]
                scheduled, clock, nseq = schedule_domain_rows(
                    rows, clock, nseq, site["download"])
                self.domain_state[dom] = [clock, nseq]
                for r in scheduled:
                    self._process_row(r, rnd, add_next)

            candidates = next_candidates
            rnd += 1

        return self._finalize()

    # ------------------------------------------------------------------

    def _process_row(self, r: dict, rnd: int, add_next) -> None:
        dom, url, kind = r["domain"], r["url"], r["kind"]
        self.order.append((dom, r["seq"], url, kind))
        download = self.sites[dom]["download"]

        if not r["allowed"]:
            # handleDisallowed: stored as a page row for ANY kind
            if url not in self.seen_urls:
                self.seen_urls.add(url)
                self._add_page(r, rnd, PT_DISALLOWED, None, None, None, None)
            if kind != KIND_HTML and r.get("parent_url"):
                self.edge_records.append((r["parent_url"], url))
            return

        if kind == KIND_HTML:
            self.seen_urls.add(url)
            cls = classify_fetch(self.web.fetch(url))
            ptype = cls["page_type"]
            if ptype == PT_HTML and cls["content_hash"] in self.hash_seen:
                ptype = PT_DUPLICATE
            elif ptype == PT_HTML:
                self.hash_seen.add(cls["content_hash"])
            self._add_page(r, rnd, ptype, cls["http_status"], cls["html"],
                           cls["content_hash"], cls["load_time_ms"])
            if fetch_ok_for_extraction(cls):
                self._extract(r, cls["html"], dom, add_next)
            return

        # kind 1/2: images / binary docs
        first = r["first_in_round"]
        if kind == KIND_IMAGE:
            existed = url in self.image_seen
            dup = existed or not first
            orig_parent = self.image_seen.get(url, r.get("round_first_parent"))
            fetched = (not existed) and first and download
            data = None
            content_type = None
            if fetched:
                raw = self.web.fetch(url)
                if raw.get("status") is not None and 200 <= raw["status"] < 400:
                    data = raw.get("data")
                    content_type = raw.get("content_type")
            if not existed and first:
                self.image_seen[url] = r.get("parent_url")
            row = {"filename": url, "domain": dom,
                   "page_url": orig_parent if dup else r.get("parent_url"),
                   "con_type": r.get("con_type") or con_type(url),
                   "alt": r.get("alt"), "is_duplicate": dup,
                   "downloaded": data is not None, "data": data,
                   "content_type": content_type,
                   "round": rnd, "seq": r["seq"],
                   "fetch_time": r["fetch_time"]}
            self._decode_image(row)
            self.images.append(row)
        else:
            existed = url in self.data_seen
            dup = existed or not first
            fetched = (not existed) and first and download
            data = None
            data_type = None
            content_type = None
            if fetched:
                raw = self.web.fetch(url)
                if raw.get("status") is not None and 200 <= raw["status"] < 400:
                    data = raw.get("data")
                    content_type = raw.get("content_type")
                    data_type = MIME_TO_DATA_TYPE.get(content_type)
            if not existed and first:
                self.data_seen.add(url)
            self.page_data.append(
                {"filename": url, "domain": dom,
                 "page_url": r.get("parent_url"),  # dup keeps OWN parent
                 "data_type": data_type, "is_duplicate": dup,
                 "downloaded": data is not None, "data": data,
                 "content_type": content_type,
                 "round": rnd, "seq": r["seq"], "fetch_time": r["fetch_time"]})

    def _decode_image(self, row: dict) -> None:
        row.update({"w": None, "h": None, "fmt": None, "phash": None,
                    "caption": None})
        m = _IMG_ID.search(row["filename"])
        corpus_idx = int(m.group(1)) if m else None
        if row["data"] is not None:
            try:
                img, fmt = ic.decode_image(row["data"])
                row["w"], row["h"] = img.shape[1], img.shape[0]
                row["fmt"] = fmt
                row["phash"] = ic.phash64(img)
            except Exception:
                pass
        cap = row.pop("alt", None)
        if cap is None and corpus_idx is not None and \
                corpus_idx < self.web.n_corpus:
            cap = self.web._corpus_caps[corpus_idx]
        row["caption"] = cap

    def _add_page(self, r, rnd, ptype, status, html, chash, load_ms) -> None:
        self.pages.append({
            "url": r["url"], "domain": r["domain"], "page_type": ptype,
            "http_status": status, "html": html, "content_hash": chash,
            "load_time_ms": load_ms, "round": rnd, "seq": r["seq"],
            "fetch_time": r["fetch_time"], "enq_time": r.get("enq_time", 0),
            "kind": r["kind"],
        })

    def _extract(self, r: dict, html: str, dom: str, add_next) -> None:
        res = extract_page(html, dom, self.scope)
        purl, pseq = r["url"], r["seq"]
        # enqueue at the parent's fetch COMPLETION on its domain's
        # logical clock (fetch_time + the delay tick its fetch paid)
        enq = r["fetch_time"] + int(r.get("delay_ms", 4000))
        for t in res["edges"]:
            self.edge_records.append((purl, t))
        for i, u in enumerate(res["data_links"]):
            add_next({"url": u, "domain": dom, "kind": KIND_DATA,
                      "parent_url": purl, "p_dom": dom, "p_seq": pseq,
                      "cls": CLS_DATA, "pos": i, "enq_time": enq})
        for i, (u, ct, alt) in enumerate(res["images"]):
            add_next({"url": u, "domain": dom, "kind": KIND_IMAGE,
                      "parent_url": purl, "p_dom": dom, "p_seq": pseq,
                      "cls": CLS_IMAGE, "pos": i, "con_type": ct,
                      "alt": alt, "enq_time": enq})
        plinks = res["page_links_local"] + res["page_links_remote"]
        # preserve the original extraction order for pos
        order_index = {u: i for i, u in enumerate(res["edges"])}
        for u in plinks:
            tdom = extract_domain(u)
            if not tdom:
                continue
            add_next({"url": u, "domain": tdom, "kind": KIND_HTML,
                      "parent_url": purl, "p_dom": dom, "p_seq": pseq,
                      "cls": CLS_LINK, "pos": order_index.get(u, 0),
                      "enq_time": enq})

    # ------------------------------------------------------------------

    def _finalize(self) -> dict:
        page_urls = {p["url"] for p in self.pages}
        edges = sorted({(f, t) for (f, t) in self.edge_records
                        if t in page_urls and f in page_urls})
        seen_tbl = pa.table({
            "url": pa.array(sorted(self.seen_urls), pa.string())})
        order_tbl = pa.table({
            "domain": pa.array([o[0] for o in self.order], pa.string()),
            "seq": pa.array([o[1] for o in self.order], pa.int64()),
            "url": pa.array([o[2] for o in self.order], pa.string()),
            "kind": pa.array([o[3] for o in self.order], pa.int8()),
        })
        links_tbl = pa.table({
            "from_url": pa.array([e[0] for e in edges], pa.string()),
            "to_url": pa.array([e[1] for e in edges], pa.string()),
        })

        def col(rows, k, typ):
            return pa.array([row.get(k) for row in rows], typ)

        pages_tbl = pa.table({
            "url": col(self.pages, "url", pa.string()),
            "domain": col(self.pages, "domain", pa.string()),
            "page_type": col(self.pages, "page_type", pa.string()),
            "http_status": col(self.pages, "http_status", pa.int32()),
            "content_hash": col(self.pages, "content_hash", pa.string()),
            "html": col(self.pages, "html", pa.large_string()),
            "load_time_ms": col(self.pages, "load_time_ms", pa.int64()),
            "round": col(self.pages, "round", pa.int32()),
            "seq": col(self.pages, "seq", pa.int64()),
            "fetch_time": col(self.pages, "fetch_time", pa.int64()),
            "enq_time": col(self.pages, "enq_time", pa.int64()),
        })
        images_tbl = pa.table({
            "filename": col(self.images, "filename", pa.string()),
            "domain": col(self.images, "domain", pa.string()),
            "page_url": col(self.images, "page_url", pa.string()),
            "con_type": col(self.images, "con_type", pa.string()),
            "content_type": col(self.images, "content_type", pa.string()),
            "is_duplicate": col(self.images, "is_duplicate", pa.bool_()),
            "downloaded": col(self.images, "downloaded", pa.bool_()),
            "data": col(self.images, "data", pa.large_binary()),
            "w": col(self.images, "w", pa.int32()),
            "h": col(self.images, "h", pa.int32()),
            "fmt": col(self.images, "fmt", pa.string()),
            "phash": col(self.images, "phash", pa.int64()),
            "caption": col(self.images, "caption", pa.string()),
            "round": col(self.images, "round", pa.int32()),
            "seq": col(self.images, "seq", pa.int64()),
            "fetch_time": col(self.images, "fetch_time", pa.int64()),
        })
        pdata_tbl = pa.table({
            "filename": col(self.page_data, "filename", pa.string()),
            "domain": col(self.page_data, "domain", pa.string()),
            "page_url": col(self.page_data, "page_url", pa.string()),
            "data_type": col(self.page_data, "data_type", pa.string()),
            "content_type": col(self.page_data, "content_type", pa.string()),
            "is_duplicate": col(self.page_data, "is_duplicate", pa.bool_()),
            "downloaded": col(self.page_data, "downloaded", pa.bool_()),
            "data": col(self.page_data, "data", pa.large_binary()),
            "round": col(self.page_data, "round", pa.int32()),
            "seq": col(self.page_data, "seq", pa.int64()),
            "fetch_time": col(self.page_data, "fetch_time", pa.int64()),
        })
        sites_tbl = pa.table({
            "domain": pa.array(sorted(self.sites), pa.string()),
            "robots_content": pa.array(
                [self.sites[d]["robots_content"] for d in sorted(self.sites)],
                pa.large_string()),
            "sitemap_content": pa.array(
                [self.sites[d]["sitemap_content"] for d in sorted(self.sites)],
                pa.large_string()),
            "download": pa.array(
                [self.sites[d]["download"] for d in sorted(self.sites)],
                pa.bool_()),
        })
        return {"pages": pages_tbl, "images": images_tbl,
                "page_data": pdata_tbl, "links": links_tbl,
                "sites": sites_tbl, "seen": seen_tbl, "order": order_tbl}
