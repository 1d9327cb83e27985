"""robots.txt parsing, allow/deny checks, crawl-delay and sitemap discovery.

Analog of the reference's use of crawler-commons ``SimpleRobotRules``
(``/root/reference/src/main/scala/com/ieps/crawler/utils/SiteRobotsTxt.scala:11-52``):

* missing robots.txt  => allow everything, default crawl delay 4000 ms
  (``SiteRobotsTxt.scala:18,29,38``)
* ``Crawl-delay: S``  => delay = S seconds in millis (``getDelay``)
* longest-match Allow/Disallow prefix rules for ``User-agent: *``
* ``Sitemap:`` lines collected (``getSitemaps``)

This is a from-scratch parser of the public robots.txt convention; only the
behaviors the reference relies on are implemented.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

DEFAULT_CRAWL_DELAY_MS = 4000  # SiteRobotsTxt.scala:18


@dataclass
class RobotRules:
    # (path_prefix, allow) rules for User-agent: * — longest prefix wins,
    # Allow wins ties (Google semantics; crawler-commons is equivalent for
    # the simple fixtures we serve).
    rules: list = field(default_factory=list)
    crawl_delay_ms: Optional[int] = None
    sitemaps: list = field(default_factory=list)
    missing: bool = False  # no robots.txt => allow-all + default delay

    def is_allowed(self, url: str) -> bool:
        if self.missing or not self.rules:
            return True
        # match on the path component of the url
        path = _url_path(url)
        best_len = -1
        best_allow = True
        for prefix, allow in self.rules:
            if prefix == "":
                continue  # "Disallow:" empty = allow all, no rule
            if path.startswith(prefix):
                plen = len(prefix)
                if plen > best_len or (plen == best_len and allow and not best_allow):
                    best_len = plen
                    best_allow = allow
        return best_allow if best_len >= 0 else True

    def get_delay_ms(self) -> int:
        if self.missing or self.crawl_delay_ms is None:
            return DEFAULT_CRAWL_DELAY_MS
        return self.crawl_delay_ms


def _url_path(url: str) -> str:
    # strip scheme://host — find first "/" after "://"
    i = url.find("://")
    if i >= 0:
        j = url.find("/", i + 3)
        return url[j:] if j >= 0 else "/"
    return url if url.startswith("/") else "/" + url


def parse_robots(content: Optional[str]) -> RobotRules:
    """Parse robots.txt text for agent ``*``; None => missing (allow-all)."""
    if content is None:
        return RobotRules(missing=True)
    rules: list = []
    sitemaps: list = []
    delay: Optional[int] = None
    applies = False          # current agent group includes '*'
    seen_any_agent = False
    in_group_body = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                applies = False
                in_group_body = False
            if val == "*":
                applies = True
            seen_any_agent = True
        elif key in ("allow", "disallow"):
            in_group_body = True
            if applies or not seen_any_agent:
                rules.append((val, key == "allow"))
        elif key == "crawl-delay":
            in_group_body = True
            if applies or not seen_any_agent:
                try:
                    delay = int(float(val) * 1000)
                except ValueError:
                    pass
        elif key == "sitemap":
            sitemaps.append(val)  # global, agent-independent
    return RobotRules(rules=rules, crawl_delay_ms=delay, sitemaps=sitemaps)


def parse_sitemap_urls(xml: Optional[str]) -> list:
    """Extract <loc> URLs from a sitemap / sitemap-index document — analog of
    the reference's crawler-commons SiteMapParser use
    (``utils/SiteMaps.scala:12-55``). Regex-based: the synthetic world emits
    well-formed one-loc-per-line urlset XML."""
    if not xml:
        return []
    import re

    return re.findall(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", xml)


def parse_sitemap(xml: Optional[str]) -> tuple:
    """Classify a sitemap document: returns ``(page_urls, child_sitemaps)``.
    A ``<sitemapindex>`` document's <loc> entries are themselves sitemaps
    (``utils/SiteMaps.scala:12-55`` — the reference's SiteMapParser
    recursively descends indexes); a ``<urlset>`` document's are pages."""
    locs = parse_sitemap_urls(xml)
    if xml and "<sitemapindex" in xml:
        return [], locs
    return locs, []


SITEMAP_MAX_DEPTH = 3  # index-of-index bound (SiteMaps.scala recursion)


def resolve_sitemaps(fetch_fn, sitemap_urls: list,
                     max_depth: int = SITEMAP_MAX_DEPTH) -> tuple:
    """Recursively resolve robots ``Sitemap:`` entries to page URLs,
    descending sitemap indexes breadth-first to ``max_depth`` levels.
    ``fetch_fn(url) -> {status, text, ...}``. Returns
    ``(page_urls, top_level_content)`` where the content is the LAST
    successfully fetched top-level document (the value the sites table
    stores, matching the reference's one-sitemap-per-site column).

    A visited set guards against an index listing the same child twice
    and against cyclic indexes: each sitemap URL is fetched at most once
    within the depth bound, and the returned page list is deduplicated
    order-preserving (no geometric fan-out, no duplicate page URLs)."""
    urls: list = []
    seen_pages: set = set()
    visited: set = set()
    content = None
    frontier = list(sitemap_urls)
    for depth in range(max_depth):
        children: list = []
        for sm_url in frontier:
            if sm_url in visited:
                continue
            visited.add(sm_url)
            res = fetch_fn(sm_url)
            if res.get("status") == 200 and res.get("text"):
                if depth == 0:
                    content = res["text"]
                locs, subs = parse_sitemap(res["text"])
                for u in locs:
                    if u not in seen_pages:
                        seen_pages.add(u)
                        urls.append(u)
                children.extend(s for s in subs if s not in visited)
        frontier = children
        if not frontier:
            break
    return urls, content
