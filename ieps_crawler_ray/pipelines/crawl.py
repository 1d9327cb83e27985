"""The round-based BFS crawl driver (SURVEY.md §3.4 target shape).

One BFS *round* is one streaming-executor run over the current frontier
generation; discovered links become the next generation. All heavy data
moves as zero-copy Arrow through ``ray.data.Dataset``; the driver only
touches per-domain scalars and manifests.

Layout under ``cfg.out_dir`` (Parquet stands in for Lance in this env):

  frontier/gen=K/*.parquet          candidates for round K (extracted+roots)
  rounds/gen=K/fetched/*.parquet    wide per-round output (pages ∪ images ∪
                                    page_data are projections of this — the
                                    payload is written exactly once)
  rounds/gen=K/dup_overrides/*.parquet   h1 of content-hash DUPLICATE pages
  state/gen=K/...                   actor snapshots + domain state (resume)
  manifest/gen=K.json               counters + completion marker (lineage)

Resume: the latest complete manifest's state is restored into fresh actors
and the loop continues at K+1 — finished rounds are never recomputed
(north_rule resumability).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..config import CrawlConfig
from ..functions.canonical import canonicalize, extract_domain
from ..functions.hashing import url_hash128_many
from ..state.actors import make_actor_pools, shard_of_str
from ..stages.crawl_stages import (FetchStage, candidate_rows_for_urls,
                                   make_dup_query_fn, make_parse_fn,
                                   make_schedule_fn, make_seen_robots_fn)
from .. import schema as S


def _clean_empty_parquet(path: str) -> None:
    """Drop zero-row part files (Ray writes metadata-only parquet for empty
    datasets, which poisons later schema-unified reads of the directory)."""
    if not os.path.isdir(path):
        return
    for fn in os.listdir(path):
        fp = os.path.join(path, fn)
        if fn.endswith(".parquet"):
            try:
                if pq.read_metadata(fp).num_rows == 0:
                    os.remove(fp)
            except Exception:
                os.remove(fp)


def _num_rows(path: str) -> int:
    if not os.path.isdir(path) or not os.listdir(path):
        return 0
    return pads.dataset(path, format="parquet").count_rows()


def _write_manifest(out_dir: str, gen: int, payload: dict) -> None:
    mdir = os.path.join(out_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".gen={gen}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(dict(payload, complete=True), f)
    os.replace(tmp, os.path.join(mdir, f"gen={gen}.json"))


def _read_manifests(out_dir: str) -> dict:
    mdir = os.path.join(out_dir, "manifest")
    out = {}
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            if fn.startswith("gen=") and fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    m = json.load(f)
                if m.get("complete"):
                    out[int(fn[4:-5])] = m
    return out


class CrawlDriver:
    def __init__(self, web, cfg: CrawlConfig):
        self.web = web
        self.cfg = cfg
        self.web_ref = ray.put(web)
        self.handles = make_actor_pools(cfg, self.web_ref)
        self.domain_state: dict = {}   # domain -> (clock_ms, next_seq, download)
        self.pages_total = 0
        os.makedirs(cfg.out_dir, exist_ok=True)

    # ---------------- checkpoint / resume ----------------

    def _snapshot(self, gen: int) -> None:
        sdir = os.path.join(self.cfg.out_dir, "state", f"gen={gen}")
        os.makedirs(sdir, exist_ok=True)
        for i, a in enumerate(self.handles["seen"]):
            snap = ray.get(a.snapshot.remote())
            pq.write_table(pa.table({"h1": snap["h1"], "h2": snap["h2"]}),
                           os.path.join(sdir, f"seen_{i}.parquet"))
        for i, a in enumerate(self.handles["hash"]):
            pq.write_table(
                pa.table({"hash": pa.array(ray.get(a.snapshot.remote()),
                                           pa.string())}),
                os.path.join(sdir, f"hash_{i}.parquet"))
        for name in ("img_reg", "data_reg"):
            for i, a in enumerate(self.handles[name]):
                store = ray.get(a.snapshot.remote())
                keys = sorted(store)
                pq.write_table(pa.table({
                    "filename": pa.array(keys, pa.string()),
                    "parent": pa.array([store[k][0] for k in keys], pa.string()),
                    "round": pa.array([store[k][1] for k in keys], pa.int32()),
                }), os.path.join(sdir, f"{name}_{i}.parquet"))
        doms = sorted(self.domain_state)
        pq.write_table(pa.table({
            "domain": pa.array(doms, pa.string()),
            "clock_ms": pa.array([self.domain_state[d][0] for d in doms],
                                 pa.int64()),
            "next_seq": pa.array([self.domain_state[d][1] for d in doms],
                                 pa.int64()),
            "download": pa.array([self.domain_state[d][2] for d in doms],
                                 pa.bool_()),
        }), os.path.join(sdir, "domains.parquet"))
        sites = []
        for a in self.handles["robots"]:
            sites.extend(ray.get(a.dump_sites.remote()))
        pq.write_table(pa.table({
            "domain": pa.array([s["domain"] for s in sites], pa.string()),
            "robots_content": pa.array([s["robots_content"] for s in sites],
                                       pa.large_string()),
            "sitemap_content": pa.array([s["sitemap_content"] for s in sites],
                                        pa.large_string()),
        }), os.path.join(sdir, "sites.parquet"))

    def _restore(self, gen: int) -> None:
        sdir = os.path.join(self.cfg.out_dir, "state", f"gen={gen}")
        for i, a in enumerate(self.handles["seen"]):
            t = pq.read_table(os.path.join(sdir, f"seen_{i}.parquet"))
            ray.get(a.restore.remote({"h1": t.column("h1").to_numpy(),
                                      "h2": t.column("h2").to_numpy()}))
        for i, a in enumerate(self.handles["hash"]):
            t = pq.read_table(os.path.join(sdir, f"hash_{i}.parquet"))
            ray.get(a.restore.remote(t.column("hash").to_pylist()))
        for name in ("img_reg", "data_reg"):
            for i, a in enumerate(self.handles[name]):
                t = pq.read_table(os.path.join(sdir, f"{name}_{i}.parquet"))
                store = {fn: (p, r) for fn, p, r in zip(
                    t.column("filename").to_pylist(),
                    t.column("parent").to_pylist(),
                    t.column("round").to_pylist())}
                ray.get(a.restore.remote(store))
        t = pq.read_table(os.path.join(sdir, "domains.parquet"))
        self.domain_state = {
            d: (c, s, dl) for d, c, s, dl in zip(
                t.column("domain").to_pylist(),
                t.column("clock_ms").to_pylist(),
                t.column("next_seq").to_pylist(),
                t.column("download").to_pylist())}
        sites_t = pq.read_table(os.path.join(sdir, "sites.parquet"))
        sites = sites_t.to_pylist()
        by_shard: dict = {}
        for s in sites:
            by_shard.setdefault(
                shard_of_str(s["domain"], len(self.handles["robots"])),
                []).append(dict(s, sitemap_urls=[]))
        ray.get([self.handles["robots"][i].restore_sites.remote(v)
                 for i, v in by_shard.items()])

    # ---------------- generation 0 ----------------

    def _write_gen0(self) -> None:
        cfg = self.cfg
        infos = []
        for i, seed in enumerate(cfg.seeds):
            dom = extract_domain(seed)
            if not dom or dom in self.domain_state:
                continue
            download = any(dom in s for s in cfg.seeds)
            self.domain_state[dom] = (0, 0, download)
            shard = shard_of_str(dom, len(self.handles["robots"]))
            site = ray.get(self.handles["robots"][shard].bootstrap.remote(dom))
            infos.append({"url": canonicalize(dom), "domain": dom,
                          "p_dom": "", "p_seq": -1, "cls": -1, "pos": 0})
            for j, su in enumerate(site["sitemap_urls"]):
                cu = canonicalize(su)
                if cu is None or extract_domain(cu) != dom:
                    continue
                infos.append({"url": cu, "domain": dom, "p_dom": "",
                              "p_seq": i, "cls": 0, "pos": j})
        gdir = os.path.join(cfg.out_dir, "frontier", "gen=0")
        os.makedirs(gdir, exist_ok=True)
        pq.write_table(candidate_rows_for_urls(infos),
                       os.path.join(gdir, "roots.parquet"))

    # ---------------- one round ----------------

    def _run_round(self, gen: int) -> int:
        """Returns number of next-round candidates."""
        cfg = self.cfg
        fdir = os.path.join(cfg.out_dir, "frontier", f"gen={gen}")
        rdir = os.path.join(cfg.out_dir, "rounds", f"gen={gen}")
        n_cand = _num_rows(fdir)
        if n_cand == 0:
            _write_manifest(cfg.out_dir, gen, {"candidates": 0, "fetched": 0,
                                               "next_candidates": 0})
            return 0

        cand = rd.read_parquet(fdir)
        state_ref = ray.put(self.domain_state)
        gated = cand.map_batches(make_seen_robots_fn(self.handles),
                                 batch_format="pyarrow", batch_size=8192)
        sched = gated.groupby("domain").map_groups(
            make_schedule_fn(state_ref, cfg.seeds), batch_format="pandas")
        sched = sched.materialize()

        # per-domain state update (every row of a group carries the final
        # clock/seq — max() per domain is exact)
        agg = sched.groupby("domain").max(["clock_after", "next_seq_after"]) \
            .to_pandas()
        for _, row in agg.iterrows():
            d = row["domain"]
            old = self.domain_state.get(
                d, (0, 0, any(d in s for s in cfg.seeds)))
            self.domain_state[d] = (int(row["max(clock_after)"]),
                                    int(row["max(next_seq_after)"]), old[2])

        fetched_dir = os.path.join(rdir, "fetched")
        shutil.rmtree(fetched_dir, ignore_errors=True)
        fetched = sched.map_batches(
            FetchStage, fn_constructor_args=(self.web_ref, self.handles, gen),
            batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
            concurrency=cfg.fetch_concurrency, num_cpus=1)
        fetched.write_parquet(fetched_dir)
        _clean_empty_parquet(fetched_dir)

        # content-hash winner labels (barrier reached: fetch fully consumed)
        ov_dir = os.path.join(rdir, "dup_overrides")
        shutil.rmtree(ov_dir, ignore_errors=True)
        ov = rd.read_parquet(
            fetched_dir,
            columns=["h1", "content_hash", "domain", "seq", "page_type"]) \
            .map_batches(make_dup_query_fn(self.handles),
                         batch_format="pyarrow", batch_size=8192)
        ov.write_parquet(ov_dir)
        _clean_empty_parquet(ov_dir)
        ray.get([a.end_round.remote() for a in self.handles["hash"]])

        # parse + explode next-generation candidates
        next_dir = os.path.join(cfg.out_dir, "frontier", f"gen={gen + 1}")
        shutil.rmtree(next_dir, ignore_errors=True)
        os.makedirs(next_dir, exist_ok=True)
        ok = rd.read_parquet(
            fetched_dir,
            columns=["url", "domain", "kind", "seq", "html"],
            filter=((pc.field("kind") == 0) & pc.field("allowed")
                    & (pc.field("page_type") == "HTML")
                    & (pc.field("http_status") >= 200)
                    & (pc.field("http_status") < 400)))
        parsed = ok.map_batches(make_parse_fn(cfg.scope),
                                batch_format="pyarrow",
                                batch_size=cfg.parse_batch_size)
        parsed.write_parquet(next_dir)
        _clean_empty_parquet(next_dir)

        # new-domain discovery -> root enqueue + state entry
        doms = set()
        if _num_rows(next_dir) > 0:
            scanner = pads.dataset(next_dir, format="parquet") \
                .scanner(columns=["domain"])
            for b in scanner.to_batches():
                doms.update(pc.unique(b.column("domain")).to_pylist())
        new_doms = sorted(d for d in doms if d not in self.domain_state)
        if new_doms:
            infos = []
            for d in new_doms:
                self.domain_state[d] = (0, 0,
                                        any(d in s for s in cfg.seeds))
                infos.append({"url": canonicalize(d), "domain": d,
                              "p_dom": "", "p_seq": -1, "cls": -1, "pos": 0})
            pq.write_table(candidate_rows_for_urls(infos),
                           os.path.join(next_dir, "roots.parquet"))

        n_fetched = _num_rows(fetched_dir)
        n_pages = pads.dataset(fetched_dir, format="parquet").count_rows(
            filter=(pc.field("kind") == 0) |
                   (~pc.field("allowed") & pc.field("stores_page")))
        self.pages_total += n_pages
        n_next = _num_rows(next_dir)
        self._snapshot(gen)
        _write_manifest(cfg.out_dir, gen, {
            "candidates": n_cand, "fetched": n_fetched, "pages": n_pages,
            "pages_total": self.pages_total, "next_candidates": n_next,
            "new_domains": len(self.domain_state)})
        return n_next

    # ---------------- main loop ----------------

    def run(self, resume: bool = True) -> dict:
        cfg = self.cfg
        manifests = _read_manifests(cfg.out_dir) if resume else {}
        if manifests:
            last = max(manifests)
            self._restore(last)
            self.pages_total = manifests[last].get("pages_total", 0)
            gen = last + 1
        else:
            self._write_gen0()
            gen = 0
        while True:
            if cfg.max_rounds is not None and gen >= cfg.max_rounds:
                break
            if cfg.max_pages is not None and self.pages_total >= cfg.max_pages:
                break
            n_next = self._run_round(gen)
            if n_next == 0 and _num_rows(
                    os.path.join(cfg.out_dir, "frontier", f"gen={gen}")) == 0:
                break
            gen += 1
        return {"rounds": gen, "pages_total": self.pages_total}


def run_crawl(web, cfg: CrawlConfig, resume: bool = True) -> dict:
    return CrawlDriver(web, cfg).run(resume=resume)


# ---------------------------------------------------------------------------
# final-table views (lazy Datasets over the round outputs)
# ---------------------------------------------------------------------------

def _fetched_paths(out_dir: str) -> list:
    """Individual part files (read_parquet treats list entries as files)."""
    rdir = os.path.join(out_dir, "rounds")
    out = []
    if os.path.isdir(rdir):
        for g in sorted(os.listdir(rdir), key=lambda s: int(s.split("=")[1])):
            p = os.path.join(rdir, g, "fetched")
            if os.path.isdir(p):
                out.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                           if f.endswith(".parquet"))
    return out


def _dup_h1_set(out_dir: str) -> set:
    rdir = os.path.join(out_dir, "rounds")
    dup: set = set()
    if os.path.isdir(rdir):
        for g in os.listdir(rdir):
            p = os.path.join(rdir, g, "dup_overrides")
            if os.path.isdir(p) and os.listdir(p):
                t = pads.dataset(p, format="parquet").to_table()
                dup.update(t.column("h1").to_pylist())
    return dup


def read_pages(out_dir: str) -> rd.Dataset:
    """Final pages table: kind-0 rows plus stored DISALLOWED image/data
    rows, with content-hash DUPLICATE labels overlaid (broadcast set — at
    cluster scale this becomes a hash join on h1)."""
    paths = _fetched_paths(out_dir)
    dup_ref = ray.put(_dup_h1_set(out_dir))
    ds = rd.read_parquet(
        paths, filter=((pc.field("kind") == 0) |
                       (~pc.field("allowed") & pc.field("stores_page"))))

    def overlay(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        h1 = batch.column("h1").to_pylist()
        pt = batch.column("page_type").to_pylist()
        new_pt = ["DUPLICATE" if h in dup and p == "HTML" else p
                  for h, p in zip(h1, pt)]
        i = batch.schema.get_field_index("page_type")
        return batch.set_column(i, "page_type", pa.array(new_pt, pa.string()))

    return ds.map_batches(overlay, batch_format="pyarrow")


def read_images(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        _fetched_paths(out_dir),
        filter=((pc.field("kind") == 1) & pc.field("allowed")))


def read_page_data(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        _fetched_paths(out_dir),
        filter=((pc.field("kind") == 2) & pc.field("allowed")))


def read_order(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(_fetched_paths(out_dir),
                           columns=["domain", "seq", "url", "kind"])


def read_links(out_dir: str) -> rd.Dataset:
    """Distinct link edges: extraction pairs (kind-0 frontier candidates)
    plus disallowed image/data parent edges, filtered to stored pages."""
    fr = os.path.join(out_dir, "frontier")
    gens = [os.path.join(fr, g, f) for g in sorted(os.listdir(fr))
            for f in sorted(os.listdir(os.path.join(fr, g)))
            if f.endswith(".parquet")]
    cand = rd.read_parquet(
        gens, columns=["parent_url", "url"],
        filter=((pc.field("kind") == 0) & pc.field("parent_url").is_valid()))
    dis = rd.read_parquet(
        _fetched_paths(out_dir), columns=["parent_url", "url"],
        filter=((pc.field("kind") != 0) & ~pc.field("allowed")
                & pc.field("parent_url").is_valid()))
    pairs = cand.select_columns(["parent_url", "url"]).union(
        dis.select_columns(["parent_url", "url"]))

    page_urls_ref = ray.put(_page_url_set(out_dir))

    def sem_filter(batch: pa.Table) -> pa.Table:
        urls = ray.get(page_urls_ref)
        keep = [f in urls and t in urls
                for f, t in zip(batch.column("parent_url").to_pylist(),
                                batch.column("url").to_pylist())]
        return batch.filter(pa.array(keep))

    pairs = pairs.map_batches(sem_filter, batch_format="pyarrow")
    # exact dedup on the edge pair (groupby shuffle)
    return pairs.groupby(["parent_url", "url"]).count() \
        .select_columns(["parent_url", "url"])


def _page_url_set(out_dir: str) -> set:
    urls: set = set()
    for p in _fetched_paths(out_dir):
        scanner = pads.dataset(p, format="parquet").scanner(
            columns=["url", "kind", "allowed", "stores_page"],
            filter=(pc.field("kind") == 0) |
                   (~pc.field("allowed") & pc.field("stores_page")))
        for b in scanner.to_batches():
            urls.update(b.column("url").to_pylist())
    return urls


def read_sites(out_dir: str) -> pa.Table:
    sdir = os.path.join(out_dir, "state")
    gens = sorted(os.listdir(sdir), key=lambda s: int(s.split("=")[1]))
    return pq.read_table(os.path.join(sdir, gens[-1], "sites.parquet"))
