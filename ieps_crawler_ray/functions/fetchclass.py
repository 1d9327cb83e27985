"""Fetch-result classification — shared by oracle and engine fetch stage.

Reproduces ``HeadlessBrowser.getPageSource`` semantics
(``/root/reference/src/main/scala/com/ieps/crawler/utils/HeadlessBrowser.scala:47-105``):

* unknown host            -> INVALID, status 404
* malformed url           -> INVALID, status 400
* HTTP status >= 400      -> INVALID, that status, no content stored
* content-type not text/html -> INVALID, status 400 (generic exception path)
* else                    -> HTML, content + uppercase SHA-256 hash + load time

Failures are terminal — never retried (fetch idempotence still holds for
Ray task retries because the synthetic fetch is deterministic; in production
a retried fetch may differ, which the seen-set makes a no-op for dedup
purposes).
"""

from __future__ import annotations

from .hashing import content_hash

PT_HTML = "HTML"
PT_INVALID = "INVALID"
PT_DISALLOWED = "DISALLOWED"
PT_DUPLICATE = "DUPLICATE"
PT_FRONTIER = "FRONTIER"


def classify_fetch(raw: dict) -> dict:
    """raw: SyntheticWeb.fetch result. Returns dict(page_type, http_status,
    html, content_hash, load_time_ms)."""
    err = raw.get("error")
    if err == "unknown_host":
        return {"page_type": PT_INVALID, "http_status": 404, "html": None,
                "content_hash": None, "load_time_ms": None}
    if err == "malformed":
        return {"page_type": PT_INVALID, "http_status": 400, "html": None,
                "content_hash": None, "load_time_ms": None}
    status = raw["status"]
    if status >= 400:
        return {"page_type": PT_INVALID, "http_status": status, "html": None,
                "content_hash": None, "load_time_ms": None}
    if raw.get("content_type") != "text/html":
        return {"page_type": PT_INVALID, "http_status": 400, "html": None,
                "content_hash": None, "load_time_ms": None}
    text = raw.get("text") or ""
    return {"page_type": PT_HTML, "http_status": status, "html": text,
            "content_hash": content_hash(text),
            "load_time_ms": raw.get("load_time_ms")}


def fetch_ok_for_extraction(classified: dict) -> bool:
    """Extraction gate (DomainWorkerActor.scala:180): 200 <= status < 400
    and content present. Content-hash DUPLICATE pages ARE still extracted
    (faithful: insertIfNotExistsByHash marks the type but handleAllowed
    proceeds to extract — only URL-duplicates skip extraction)."""
    s = classified.get("http_status")
    return (classified["page_type"] == PT_HTML and s is not None
            and 200 <= s < 400 and classified.get("html") is not None)
