"""Per-domain frontier scheduling policy — the ordering/politeness contract.

This pure function is THE shared semantic definition used by both the
single-threaded oracle (``pipelines/oracle.py``) and the distributed engine
(inside ``groupby('domain').map_groups`` — ``stages/schedule.py``): given one
domain's frontier candidates for one BFS round plus the domain's carried
state, produce the deterministic processing order, sequence numbers and
logical politeness clock.

Contract (derived from the reference's per-domain FIFO BigQueue +
politeness delay semantics, ``DomainWorkerActor.scala:102-151``,
``queue/PageQueue.scala:38-68``, ``report/report.tex:163``):

* candidates sort by ``(p_dom, p_seq, cls, pos)`` — parent order, then the
  per-parent enqueue order data(0) → images(1) → page-links(2)
  (``DomainWorkerActor.scala:183-205``); domain roots use ``("", -1, -1, 0)``
  so they always lead their domain's first generation
  (``DomainWorkerActor.scala:70-75`` enqueues root before initialUrls).
* kind-0 rows: intra-round dedup on url (first by sort key wins) and rows
  already seen in earlier rounds are dropped (the reference's
  enqueue/dequeue dedup, ``DuplicateLinks.scala:22-29``); the dropped rows'
  link edges are preserved upstream from extraction records.
* every surviving row gets ``seq = next_seq++`` (per-domain FIFO key).
* the logical politeness clock advances by ``delay_ms`` for: kind-0 allowed
  rows (a fetch happens regardless of outcome), and kind-1/2 allowed rows
  iff the domain has ``download`` (``processPage`` schedules the delay tick
  only in those cases). Disallowed rows and non-download image/data rows
  get the current clock as ``fetch_time`` but do not advance it.
* kind-1/2 rows are never URL-deduped (every extraction yields a row —
  the reference's 68–83% duplicate-image behavior); the first row per
  filename in the round is flagged ``first_in_round`` and carries the
  round-first parent so the filename-seen actor can resolve the duplicate
  flag and the original-parent quirk deterministically.

The cross-domain interleaving is explicitly unconstrained (the reference
randomizes it); this engine's rounds are a deterministic refinement.
"""

from __future__ import annotations

KIND_HTML = 0
KIND_IMAGE = 1
KIND_DATA = 2

CLS_ROOT = -1
CLS_SITEMAP = 0   # also: data links (both sort before images by convention)
CLS_DATA = 0
CLS_IMAGE = 1
CLS_LINK = 2

SORT_KEY_FIELDS = ("p_dom", "p_seq", "cls", "pos")


def sort_key(row: dict) -> tuple:
    return (row.get("p_dom") or "", row.get("p_seq", -1),
            row.get("cls", 0), row.get("pos", 0))


def schedule_domain_rows(rows: list, clock_ms: int, next_seq: int,
                         download: bool) -> tuple:
    """Schedule one domain's candidate rows for one round.

    ``rows``: dicts with at least (url, kind, p_dom, p_seq, cls, pos,
    allowed: bool, delay_ms: int, seen: bool [kind 0 only]).

    Returns ``(scheduled, clock_ms, next_seq)`` where ``scheduled`` rows
    gain ``seq``, ``fetch_time`` (ms, logical), and for kind 1/2
    ``first_in_round`` + ``round_first_parent``.
    """
    ordered = sorted(rows, key=sort_key)
    out = []
    stored_urls: set = set()   # urls that store a page row this round
    first_by_filename: dict = {}
    for r in ordered:
        kind = r["kind"]
        if kind == KIND_HTML:
            if r.get("seen"):
                continue  # already stored in an earlier round
            if r["url"] in stored_urls:
                continue  # intra-round duplicate: first by sort key wins
            stored_urls.add(r["url"])
        r = dict(r)
        r["seq"] = next_seq
        next_seq += 1
        r["fetch_time"] = clock_ms
        if r.get("allowed", True):
            if kind == KIND_HTML or download:
                clock_ms += int(r.get("delay_ms", 4000))
        if kind == KIND_HTML:
            r["stores_page"] = True
            r["first_in_round"] = True
            r["round_first_parent"] = None
        else:
            fn = r["url"]
            if fn not in first_by_filename:
                first_by_filename[fn] = r.get("parent_url")
                r["first_in_round"] = True
            else:
                r["first_in_round"] = False
            r["round_first_parent"] = first_by_filename[fn]
            if not r.get("allowed", True):
                # handleDisallowed stores a page row for image/data entries
                # too, but insert-if-not-exists makes only the first stick
                sp = (fn not in stored_urls) and not r.get("seen")
                if sp:
                    stored_urls.add(fn)
                r["stores_page"] = sp
            else:
                r["stores_page"] = False
        out.append(r)
    return out, clock_ms, next_seq
