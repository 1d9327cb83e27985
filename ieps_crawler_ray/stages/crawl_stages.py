"""map_batches / map_groups stage bodies for the crawl pipeline.

Dataflow per BFS round (pipelines/crawl.py drives it):

  frontier candidates (Arrow)                 ONE streaming execution:
    -> map_batches(seen_robots_fn)            stateless tasks; batched actor
                                              RPCs: seen.contains + robots gate
    -> groupby('domain').map_groups(schedule) THE domain-hash shuffle; per-
                                              domain FIFO + politeness clock
    -> map_batches(make_fetch_fn(...))        stateless tasks (per-worker web
                                              cache): fetch + classify +
                                              decode + state registration
    -> write_parquet(rounds/gen=k/fetched)
  then a second, pruned-read execution:
    -> map_batches(parse_fn) over fetch-ok    stateless; emits next-round
       rows                                   candidates (exploded Arrow)
  DUPLICATE labels come back from the hash-winner actors at end_round —
  no extra per-row pass.

All stages are Arrow-native except the schedule group fn (pandas in, the
per-group python loop IS the semantics — bounded by the per-round per-domain
candidate count, and domains are hash-spread across groups).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray

from ..functions.extract import MIME_TO_DATA_TYPE, extract_page
from ..functions.fetchclass import PT_DISALLOWED, PT_HTML, classify_fetch
from ..functions.hashing import url_hash128_many
from ..functions.schedule import (KIND_DATA, KIND_HTML, KIND_IMAGE,
                                  schedule_batch_df)
from ..state.actors import shard_of_str
from .. import schema as S

_H1_MASK = (1 << 63) - 1


def shard_of_h1(h1, n: int):
    return (np.asarray(h1, dtype=np.int64) & _H1_MASK) % n


def _fanout_by_shard(shards: np.ndarray, n: int):
    """indices grouped per shard id."""
    order = np.argsort(shards, kind="stable")
    sorted_shards = shards[order]
    bounds = np.searchsorted(sorted_shards, np.arange(n + 1))
    return [(s, order[bounds[s]:bounds[s + 1]]) for s in range(n)
            if bounds[s + 1] > bounds[s]]


# ---------------------------------------------------------------------------
# stage 1: seen membership (contains only) + robots gate
# ---------------------------------------------------------------------------

def make_seen_robots_fn(handles: dict, rules_ref=None):
    """Gate: URL-seen membership (sharded actor RPC, vectorized probes)
    plus the robots allow/delay check. When ``rules_ref`` (a ``ray.put``
    of {domain: RobotRules} collected from the robots shards) is given,
    robots checks run LOCALLY in the task — the actor RPC is only the
    fetch-on-miss fallback for domains not yet cached anywhere."""
    seen_actors = handles["seen"]
    robots_actors = handles["robots"]
    n_seen = len(seen_actors)
    n_rob = len(robots_actors)

    def fn(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        h1 = batch.column("h1").to_numpy()
        h2 = batch.column("h2").to_numpy()
        urls = batch.column("url").to_pylist()
        domains = batch.column("domain").to_pylist()

        # membership for ALL kinds: disallowed image/data entries also store
        # page rows, so their urls live in the seen set too
        seen = np.zeros(nrows, dtype=bool)
        shards = shard_of_h1(h1, n_seen)
        parts = _fanout_by_shard(shards, n_seen)
        refs = [seen_actors[s].contains.remote(h1[idx], h2[idx])
                for s, idx in parts]
        for (s, idx), res in zip(parts, ray.get(refs)):
            seen[idx] = res

        allowed = np.ones(nrows, dtype=bool)
        delay = np.full(nrows, 4000, dtype=np.int64)
        rules = ray.get(rules_ref) if rules_ref is not None else {}
        miss = []
        for i, (d, u) in enumerate(zip(domains, urls)):
            r = rules.get(d)
            if r is None:
                miss.append(i)
            else:
                allowed[i] = r.is_allowed(u)
                delay[i] = r.get_delay_ms()
        if miss:
            midx = np.array(miss, dtype=np.int64)
            dshards = np.array([shard_of_str(domains[i], n_rob)
                                for i in miss])
            parts = _fanout_by_shard(dshards, n_rob)
            refs = [robots_actors[s].check.remote(
                [domains[midx[i]] for i in idx],
                [urls[midx[i]] for i in idx]) for s, idx in parts]
            for (s, idx), (a, d) in zip(parts, ray.get(refs)):
                allowed[midx[idx]] = a
                delay[midx[idx]] = d

        return (batch.append_column("seen", pa.array(seen))
                .append_column("allowed", pa.array(allowed))
                .append_column("delay_ms", pa.array(delay)))

    return fn


# ---------------------------------------------------------------------------
# stage 2: per-domain schedule (inside groupby('domain').map_groups)
# ---------------------------------------------------------------------------

def make_schedule_fn(state_ref, seeds: list, chunk_rows: int = 0):
    """Per-batch scheduler. A batch is one domain-hash frontier partition
    (written with ``partition_cols=['dpart']`` by the previous round), so
    every domain's rows arrive complete in one batch — the groupby happens
    here, locally, with NO runtime shuffle. state_ref: ray.put dict
    {domain: (clock_ms, next_seq, download)}.

    With ``chunk_rows`` > 0 the scheduled rows are YIELDED in chunks: the
    downstream (unfused) fetch operator then gets several small blocks per
    hot-domain partition instead of one huge one — this is the skew
    control. Chunking is safe post-schedule: seq and the politeness clock
    are already assigned, so fetch order is free."""

    def fn(df):
        state = ray.get(state_ref)
        full = schedule_batch_df(df, state, seeds)
        if not len(full):
            return  # nothing schedulable in this partition
        step = chunk_rows if chunk_rows > 0 else len(full) or 1
        for lo in range(0, len(full), step):
            yield full.iloc[lo:lo + step]

    return fn


# ---------------------------------------------------------------------------
# stage 3: fetch + classify + decode + state registration
# ---------------------------------------------------------------------------

_IMG_ID = re.compile(r"img(\d{8})")

# Per-worker-process cache of the resolved web client (ST5 analog —
# HeadlessBrowser.scala:27-31 one WebClient per worker). Ray worker
# processes persist across tasks AND across per-round executions, so a
# stateless-task fetch stage with a module-level cache costs the client
# setup once per worker per job — without paying a fresh actor-pool
# spin-up every BFS round the way map_batches(Cls) would.
_WEB_CACHE: dict = {}


def _resolve_web(web_ref):
    if not isinstance(web_ref, ray.ObjectRef):
        return web_ref
    key = web_ref.hex()
    if key not in _WEB_CACHE:
        _WEB_CACHE.clear()   # one web per job; drop stale entries
        _WEB_CACHE[key] = ray.get(web_ref)
    return _WEB_CACHE[key]


class FetchStage:
    """Fetch + classify + decode + state registration for one batch.
    Instantiated per task closure (cheap: the web client is resolved
    through the per-worker ``_WEB_CACHE``); state lives in the sharded
    actors reached via batched RPC fan-out."""

    def __init__(self, web_ref, handles: dict, round_no: int,
                 cand_sink=None):
        self.web = _resolve_web(web_ref)
        self.handles = handles
        self.round_no = round_no
        # (next_dir, scope, n_parts) — when set, OK-HTML rows are parsed
        # in-task (the html is already in memory) and the next-generation
        # candidates are side-written hive-partitioned on dpart, fusing
        # the parse stage into the fetch execution
        self.cand_sink = cand_sink

    # -- helpers ----------------------------------------------------------

    def _seen_add_submit(self, h1, h2):
        actors = self.handles["seen"]
        parts = _fanout_by_shard(shard_of_h1(h1, len(actors)), len(actors))
        return [actors[s].add.remote(h1[idx], h2[idx]) for s, idx in parts]

    def _hash_observe_submit(self, hashes, domains, seqs):
        actors = self.handles["hash"]
        shards = np.array([shard_of_str(h, len(actors)) for h in hashes])
        parts = _fanout_by_shard(shards, len(actors))
        return [actors[s].observe.remote(
            [hashes[i] for i in idx], [domains[i] for i in idx],
            [int(seqs[i]) for i in idx]) for s, idx in parts]

    def _register_submit(self, pool: str, filenames, parents):
        """Fire registry RPCs; returns (parts, refs) for _register_gather.
        Split so the HTML fetch work overlaps the registry round-trip."""
        actors = self.handles[pool]
        shards = np.array([shard_of_str(f, len(actors)) for f in filenames])
        parts = _fanout_by_shard(shards, len(actors))
        refs = [actors[s].register.remote(
            [filenames[i] for i in idx], [parents[i] for i in idx],
            self.round_no) for s, idx in parts]
        return parts, refs, len(filenames)

    @staticmethod
    def _register_gather(submitted):
        parts, refs, n = submitted
        existed = np.zeros(n, dtype=bool)
        orig = [None] * n
        for (s, idx), (ex, op) in zip(parts, ray.get(refs)):
            existed[idx] = ex
            for j, i in enumerate(idx):
                orig[i] = op[j]
        return existed, orig

    def _corpus_caption(self, filename: str):
        m = _IMG_ID.search(filename)
        if m:
            idx = int(m.group(1))
            if idx < self.web.n_corpus:
                return self.web._corpus_caps[idx]
        return None

    # -- the batch --------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = []
        # submit ALL state RPCs up front; gather right before their
        # results are needed — the HTML fetch/classify/parse work below
        # overlaps the registry round-trip
        store = [r for r in rows if r.get("stores_page")]
        seen_refs = self._seen_add_submit(
            np.array([r["h1"] for r in store], dtype=np.int64),
            np.array([r["h2"] for r in store], dtype=np.int64)) \
            if store else []
        imgs = [r for r in rows if r["kind"] == KIND_IMAGE and r["allowed"]]
        datas = [r for r in rows if r["kind"] == KIND_DATA and r["allowed"]]
        img_sub = self._register_submit(
            "img_reg", [r["url"] for r in imgs],
            [r["round_first_parent"] for r in imgs]) if imgs else None
        data_sub = self._register_submit(
            "data_reg", [r["url"] for r in datas],
            [r["round_first_parent"] for r in datas]) if datas else None

        obs_h, obs_d, obs_s = [], [], []
        # kind-0 rows first (no registry dependency — overlaps the RPCs)
        html_rows = [r for r in rows
                     if r["kind"] == KIND_HTML or not r["allowed"]]
        media_rows = [r for r in rows
                      if r["kind"] != KIND_HTML and r["allowed"]]

        img_existed: dict = {}
        img_orig: dict = {}
        data_existed: dict = {}

        def gather_registry():
            if img_sub is not None:
                ex, op = self._register_gather(img_sub)
                for r, e, o in zip(imgs, ex, op):
                    img_existed[r["url"]] = bool(e)
                    img_orig[r["url"]] = o
            if data_sub is not None:
                ex, _ = self._register_gather(data_sub)
                for r, e in zip(datas, ex):
                    data_existed[r["url"]] = bool(e)

        registry_done = [False]

        def row_iter():
            yield from html_rows
            gather_registry()
            registry_done[0] = True
            yield from media_rows

        for r in row_iter():
            o = {k: r.get(k) for k in
                 ("url", "h1", "h2", "domain", "kind", "parent_url", "seq",
                  "fetch_time", "enq_time", "allowed", "delay_ms",
                  "download", "stores_page", "con_type", "clock_after",
                  "next_seq_after")}
            o["round"] = self.round_no
            o.update({"page_type": None, "http_status": None, "html": None,
                      "content_hash": None, "load_time_ms": None,
                      "is_duplicate": None, "downloaded": None, "data": None,
                      "content_type": None, "data_type": None, "w": None,
                      "h": None, "fmt": None, "phash": None, "caption": None})
            kind = r["kind"]
            if not r["allowed"]:
                o["page_type"] = PT_DISALLOWED
                out.append(o)
                continue
            if kind == KIND_HTML:
                cls = classify_fetch(self.web.fetch(r["url"]))
                o.update({"page_type": cls["page_type"],
                          "http_status": cls["http_status"],
                          "html": cls["html"],
                          "content_hash": cls["content_hash"],
                          "load_time_ms": cls["load_time_ms"]})
                if cls["page_type"] == PT_HTML:
                    obs_h.append(cls["content_hash"])
                    obs_d.append(r["domain"])
                    obs_s.append(r["seq"])
                out.append(o)
                continue
            # images / page data
            first = r["first_in_round"]
            if kind == KIND_IMAGE:
                existed = img_existed.get(r["url"], True)
                dup = existed or not first
                o["is_duplicate"] = dup
                o["parent_url"] = (img_orig.get(r["url"])
                                   if dup else r.get("parent_url"))
                fetch_bytes = (not existed) and first and r["download"]
                if fetch_bytes:
                    raw = self.web.fetch(r["url"])
                    st = raw.get("status")
                    if st is not None and 200 <= st < 400:
                        o["data"] = raw.get("data")
                        o["content_type"] = raw.get("content_type")
                o["downloaded"] = o["data"] is not None
                if o["data"] is not None:
                    try:
                        from ..functions import image_codec as ic
                        img, fmt = ic.decode_image(o["data"])
                        o["w"], o["h"] = img.shape[1], img.shape[0]
                        o["fmt"] = fmt
                        o["phash"] = ic.phash64(img)
                    except Exception:
                        pass
                cap = r.get("alt")
                if cap is None:
                    cap = self._corpus_caption(r["url"])
                o["caption"] = cap
            else:
                existed = data_existed.get(r["url"], True)
                dup = existed or not first
                o["is_duplicate"] = dup
                fetch_bytes = (not existed) and first and r["download"]
                if fetch_bytes:
                    raw = self.web.fetch(r["url"])
                    st = raw.get("status")
                    if st is not None and 200 <= st < 400:
                        o["data"] = raw.get("data")
                        o["content_type"] = raw.get("content_type")
                        o["data_type"] = MIME_TO_DATA_TYPE.get(
                            raw.get("content_type"))
                o["downloaded"] = o["data"] is not None
            out.append(o)

        if not registry_done[0]:
            gather_registry()   # no media rows: still drain the RPCs
        hash_refs = (self._hash_observe_submit(obs_h, obs_d, obs_s)
                     if obs_h else [])
        result = pa.Table.from_pylist(out, schema=S.FETCHED_SCHEMA)
        cand_refs = (self._submit_candidates(out)
                     if self.cand_sink is not None else [])
        # barrier: all state mutations of this batch are durable before
        # the task completes (next round's gate may read them; candidate
        # submissions must land before the driver's round flush)
        ray.get(seen_refs + hash_refs + cand_refs)
        return result

    def _submit_candidates(self, out_rows: list) -> list:
        """Fused parse: extract next-round candidates from this batch's
        OK-HTML rows and submit the per-dpart slices to the candidate
        writer shards (one RPC per shard). The batch tag — a hash of the
        batch's (domain, seq) content — makes re-submission from a task
        retry a no-op on the writer."""
        import hashlib

        import pyarrow.compute as _pc

        scope, n_parts = self.cand_sink
        ok = [o for o in out_rows
              if o["kind"] == KIND_HTML and o["allowed"]
              and o["page_type"] == PT_HTML and o["html"] is not None
              and o["http_status"] is not None
              and 200 <= o["http_status"] < 400]
        if not ok:
            return []
        cand = extract_candidates(
            [o["url"] for o in ok], [o["domain"] for o in ok],
            [o["seq"] for o in ok], [o["html"] for o in ok],
            scope, n_parts,
            # enqueue at the parent's fetch COMPLETION on its domain's
            # logical clock (fetch_time + the delay tick its fetch paid)
            enq_times=[o["fetch_time"] + o["delay_ms"] for o in ok])
        if cand.num_rows == 0:
            return []
        tag = hashlib.blake2b(
            ("|".join(f"{o['domain']}:{o['seq']}" for o in ok)).encode(),
            digest_size=8).hexdigest()
        dparts = cand.column("dpart")
        cand = cand.drop_columns(["dpart"])
        writers = self.handles["cand_writers"]
        by_writer: dict = {}
        for part in _pc.unique(dparts).to_pylist():
            slice_t = cand.filter(_pc.equal(dparts, part))
            by_writer.setdefault(part % len(writers), []).append(
                (part, slice_t))
        return [writers[w].submit.remote(self.round_no, tag, parts)
                for w, parts in by_writer.items()]


def make_fetch_fn(web_ref, handles: dict, round_no: int, cand_sink=None):
    """Stateless-task fetch stage (see ``_WEB_CACHE``): one FetchStage per
    batch, construction amortized to a dict lookup after the first batch
    on each worker."""

    def fn(batch: pa.Table) -> pa.Table:
        return FetchStage(web_ref, handles, round_no, cand_sink)(batch)

    return fn


# ---------------------------------------------------------------------------
# stage 5: parse + explode next-round candidates
# ---------------------------------------------------------------------------

def extract_candidates(urls, domains, seqs, htmls, scope: str,
                       n_parts: int = 0, enq_times=None) -> pa.Table:
    """Parse fetched HTML and explode next-round frontier candidates.
    When ``n_parts`` > 0 a ``dpart = blake2b(domain) % n_parts`` column is
    appended — writing hive-partitioned on it IS the engine's domain
    shuffle (explicit hash partitioning, materialized once at write time,
    read back as complete per-domain blocks next round). ``enq_times``
    (aligned with ``urls``): the parent's logical fetch-completion time
    stamped on every candidate it emits (0 when absent)."""
    out_url, out_dom, out_kind = [], [], []
    out_parent, out_pdom, out_pseq = [], [], []
    out_cls, out_pos, out_ct, out_alt, out_enq = [], [], [], [], []
    if enq_times is None:
        enq_times = [0] * len(urls)

    def emit(u, dom, kind, parent, pdom, pseq, cls, pos, enq,
             ct=None, alt=None):
        out_url.append(u)
        out_dom.append(dom)
        out_kind.append(kind)
        out_parent.append(parent)
        out_pdom.append(pdom)
        out_pseq.append(pseq)
        out_cls.append(cls)
        out_pos.append(pos)
        out_ct.append(ct)
        out_alt.append(alt)
        out_enq.append(enq)

    from ..functions.canonical import extract_domain
    for u, dom, seq, html, enq in zip(urls, domains, seqs, htmls,
                                      enq_times):
        if html is None:
            continue
        res = extract_page(html, dom, scope)
        for i, du in enumerate(res["data_links"]):
            emit(du, dom, KIND_DATA, u, dom, seq, 0, i, enq)
        for i, (iu, ct, alt) in enumerate(res["images"]):
            emit(iu, dom, KIND_IMAGE, u, dom, seq, 1, i, enq, ct, alt)
        for i, lu in enumerate(res["edges"]):
            tdom = extract_domain(lu)
            if not tdom:
                continue
            emit(lu, tdom, KIND_HTML, u, dom, seq, 2, i, enq)

    h1, h2 = url_hash128_many(out_url)
    t = pa.table({
        "url": pa.array(out_url, pa.string()),
        "h1": pa.array(h1), "h2": pa.array(h2),
        "domain": pa.array(out_dom, pa.string()),
        "kind": pa.array(out_kind, pa.int8()),
        "parent_url": pa.array(out_parent, pa.string()),
        "p_dom": pa.array(out_pdom, pa.string()),
        "p_seq": pa.array(out_pseq, pa.int64()),
        "cls": pa.array(out_cls, pa.int32()),
        "pos": pa.array(out_pos, pa.int32()),
        "con_type": pa.array(out_ct, pa.string()),
        "alt": pa.array(out_alt, pa.string()),
        "enq_time": pa.array(out_enq, pa.int64()),
    }, schema=S.FRONTIER_SCHEMA)
    if n_parts:
        t = t.append_column("dpart", pa.array(
            [shard_of_str(d, n_parts) for d in out_dom], pa.int32()))
    return t


def candidate_rows_for_urls(urls_info: list) -> pa.Table:
    """Driver helper: build frontier rows (roots / sitemap urls).
    urls_info: list of dicts with url/domain/kind/p_dom/p_seq/cls/pos."""
    rows = []
    for info in urls_info:
        u = info["url"]
        rows.append({
            "url": u, "domain": info["domain"], "kind": info.get("kind", 0),
            "parent_url": None, "p_dom": info.get("p_dom", ""),
            "p_seq": info.get("p_seq", -1), "cls": info.get("cls", -1),
            "pos": info.get("pos", 0), "con_type": None, "alt": None,
            "enq_time": info.get("enq_time", 0),
        })
    h1, h2 = url_hash128_many([r["url"] for r in rows])
    for r, a, b in zip(rows, h1, h2):
        r["h1"], r["h2"] = int(a), int(b)
    return pa.Table.from_pylist(rows, schema=S.FRONTIER_SCHEMA)
