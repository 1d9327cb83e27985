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


def schedule_batch_df(df, state: dict, seeds: list):
    """Vectorized whole-batch scheduler — semantically identical to
    running ``schedule_domain_rows`` per domain group (the pure version
    stays as the oracle's reference implementation; conformance tests pin
    the equivalence). Processes every domain in ``df`` at once with
    pandas/numpy kernels — no per-row Python loop — which is what keeps
    the hot domain's partition task off the critical path.

    Input columns: url h1 h2 domain kind parent_url p_dom p_seq cls pos
    con_type alt seen allowed delay_ms. Returns a DataFrame with the
    scheduled rows plus seq, fetch_time, stores_page, first_in_round,
    round_first_parent, download, clock_after, next_seq_after.
    """
    import numpy as np
    import pandas as pd

    if not len(df):
        return df.iloc[0:0]

    df = df.sort_values(["domain", "p_dom", "p_seq", "cls", "pos"],
                        kind="stable").reset_index(drop=True)
    kind = df["kind"].to_numpy()
    seen = df["seen"].to_numpy(dtype=bool)
    allowed = df["allowed"].to_numpy(dtype=bool)
    k0 = kind == KIND_HTML

    # url "claims" in sort order: kind-0 rows always claim a page row
    # (unless seen); DISALLOWED media rows claim too (handleDisallowed
    # stores a page row; insert-if-not-exists keeps only the first)
    claims = (~seen) & (k0 | ~allowed)
    dup_claim = pd.Series(claims).groupby(
        [df["domain"], df["url"]]).cumsum().to_numpy() > 1
    # kind-0 drops: already seen, or lost the first-claim race
    drop = k0 & (seen | (claims & dup_claim))
    stores_page = claims & ~dup_claim

    # media bookkeeping over ALL media rows (allowed or not), pre-drop:
    # first_in_round + the round-first parent per (domain, filename)
    media = ~k0
    m_first = np.zeros(len(df), dtype=bool)
    if media.any():
        m_first = (~pd.Series(media).groupby(
            [df["domain"], df["url"]]).cumsum().gt(1).to_numpy()) & media
        firsts = df.loc[m_first, ["domain", "url", "parent_url"]]
        fp = dict(zip(zip(firsts["domain"], firsts["url"]),
                      firsts["parent_url"]))
        rfp = [fp.get((d, u)) if m else None
               for d, u, m in zip(df["domain"], df["url"], media)]
    else:
        rfp = [None] * len(df)
    df = df.assign(stores_page=stores_page, first_in_round=m_first,
                   round_first_parent=rfp)
    df = df[~drop].reset_index(drop=True)
    if not len(df):
        return df

    doms = df["domain"]
    uniq = doms.unique()
    clock0 = doms.map({d: state.get(d, (0, 0, False))[0]
                       for d in uniq}).to_numpy()
    seq0 = doms.map({d: state.get(d, (0, 0, False))[1]
                     for d in uniq}).to_numpy()
    download = doms.map({
        d: state.get(d, (0, 0, any(d in s for s in seeds)))[2]
        for d in uniq}).to_numpy(dtype=bool)

    grp = doms.to_numpy()
    g = pd.Series(np.arange(len(df))).groupby(grp)
    cum = g.cumcount().to_numpy()
    seq = seq0 + cum

    kind2 = df["kind"].to_numpy()
    adv = df["allowed"].to_numpy(dtype=bool) & (
        (kind2 == KIND_HTML) | download)
    contrib = np.where(adv, df["delay_ms"].to_numpy(), 0)
    incl = pd.Series(contrib).groupby(grp).cumsum().to_numpy()
    fetch_time = clock0 + incl - contrib      # exclusive prefix sum
    totals = pd.Series(contrib).groupby(grp).sum()
    counts = pd.Series(np.ones(len(df), np.int64)).groupby(grp).sum()
    clock_after = doms.map(dict(
        zip(totals.index, totals.to_numpy()))).to_numpy() + clock0
    next_seq_after = seq0 + doms.map(dict(
        zip(counts.index, counts.to_numpy()))).to_numpy()

    out = df.assign(seq=seq, fetch_time=fetch_time, download=download,
                    clock_after=clock_after,
                    next_seq_after=next_seq_after)
    # kind-0 rows: first_in_round True, no round-first parent (pure
    # version sets these for the HTML branch)
    k0m = out["kind"].to_numpy() == KIND_HTML
    out.loc[k0m, "first_in_round"] = True
    out.loc[k0m, "round_first_parent"] = None
    return out


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
