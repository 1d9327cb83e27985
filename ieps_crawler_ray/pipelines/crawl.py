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
  rounds/gen=K/dup_overrides/*.parquet   (domain, seq) of content-hash
                                         DUPLICATE pages (from end_round)
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

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..config import CrawlConfig
from ..functions.canonical import canonicalize, extract_domain
from ..state.actors import make_actor_pools, shard_of_str
from ..stages.crawl_stages import (candidate_rows_for_urls, make_fetch_fn,
                                   make_schedule_fn, make_seen_robots_fn)
from .. import schema as S


def _clean_empty_parquet(path: str) -> None:
    """Drop zero-row part files (Ray writes metadata-only parquet for empty
    datasets, which poisons later schema-unified reads of the directory).
    Recurses into hive-partition subdirectories."""
    if not os.path.isdir(path):
        return
    for root, _dirs, files in os.walk(path):
        for fn in files:
            fp = os.path.join(root, fn)
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


def _write_roots_partitioned(gdir: str, infos: list, n_parts: int) -> None:
    """Driver helper: write root/sitemap candidate rows into the gen dir's
    dpart=J hive layout (same partitioning the parse stage writes)."""
    from ..state.actors import shard_of_str as _sos
    by_part: dict = {}
    for info in infos:
        by_part.setdefault(_sos(info["domain"], n_parts), []).append(info)
    for part, part_infos in by_part.items():
        pdir = os.path.join(gdir, f"dpart={part}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(candidate_rows_for_urls(part_infos),
                       os.path.join(pdir, "roots.parquet"))


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
        # fire every shard's snapshot RPC up front; gather once
        seen_refs = [a.snapshot.remote() for a in self.handles["seen"]]
        hash_refs = [a.snapshot.remote() for a in self.handles["hash"]]
        reg_refs = {name: [a.snapshot.remote() for a in self.handles[name]]
                    for name in ("img_reg", "data_reg")}
        for i, snap in enumerate(ray.get(seen_refs)):
            pq.write_table(pa.table({"h1": snap["h1"], "h2": snap["h2"]}),
                           os.path.join(sdir, f"seen_{i}.parquet"))
        for i, hashes in enumerate(ray.get(hash_refs)):
            pq.write_table(
                pa.table({"hash": pa.array(hashes, pa.string())}),
                os.path.join(sdir, f"hash_{i}.parquet"))
        for name in ("img_reg", "data_reg"):
            for i, store in enumerate(ray.get(reg_refs[name])):
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
        _write_roots_partitioned(gdir, infos, cfg.num_domain_partitions)

    # ---------------- one round ----------------

    def _run_round(self, gen: int) -> int:
        """Returns number of next-round candidates."""
        import time as _time
        t_round = _time.time()
        cfg = self.cfg
        fdir = os.path.join(cfg.out_dir, "frontier", f"gen={gen}")
        rdir = os.path.join(cfg.out_dir, "rounds", f"gen={gen}")
        n_cand = _num_rows(fdir)
        if n_cand == 0:
            _write_manifest(cfg.out_dir, gen, {"candidates": 0, "fetched": 0,
                                               "next_candidates": 0})
            return 0

        # ONE streaming execution, NO runtime shuffle: the frontier is
        # already hive-partitioned on dpart = hash(domain) (written that
        # way by the previous round's parse), so each partition reads as
        # one block whose domains are complete — gate, schedule and fetch
        # are all narrow per-block transforms straight into the sink.
        fetched_dir = os.path.join(rdir, "fetched")
        shutil.rmtree(fetched_dir, ignore_errors=True)
        next_dir = os.path.join(cfg.out_dir, "frontier", f"gen={gen + 1}")
        shutil.rmtree(next_dir, ignore_errors=True)
        os.makedirs(next_dir, exist_ok=True)
        state_ref = ray.put(self.domain_state)
        part_dirs = []
        for pd_name in sorted(os.listdir(fdir)):
            pdir = os.path.join(fdir, pd_name)
            if os.path.isdir(pdir) and any(
                    f.endswith(".parquet") for f in os.listdir(pdir)):
                part_dirs.append(pdir)

        # two operators, one upstream task per domain-hash partition:
        #   [read own partition + gate + schedule]   one UDF, num_cpus=0.75
        #   [fetch -> sink]                          num_cpus=1 (unfused)
        # Gate and schedule are plain function calls INSIDE the read UDF so
        # every domain is processed complete regardless of block slicing;
        # the schedule result is yielded in fixed-size chunks and the small
        # target_max_block_size (set in run()) keeps those chunks separate
        # blocks, so the unfused fetch operator load-balances a hot
        # domain's work across the pool instead of on one straggler task.
        # broadcast the parsed robots rules (small: one entry per domain)
        # so the gate checks locally; actor RPC only on cache miss. Guarded:
        # past cfg.max_broadcast_rules domains the per-round gather itself
        # is the scale problem, so the gate runs entirely on the batched
        # robots-shard RPC path instead (rules_ref=None fallback). The
        # count proxy is driver-local (no extra RPC barrier): the shards'
        # rule caches track the domains the driver has discovered, so
        # len(domain_state) bounds the rules within one round's discovery.
        n_rules = len(self.domain_state)
        if n_rules <= cfg.max_broadcast_rules:
            rules: dict = {}
            for shard_rules in ray.get([a.dump_rules.remote()
                                        for a in self.handles["robots"]]):
                rules.update(shard_rules)
            rules_ref = ray.put(rules)
        else:
            rules_ref = None
        gate_fn = make_seen_robots_fn(self.handles, rules_ref)
        sched_fn = make_schedule_fn(state_ref, cfg.seeds,
                                    cfg.fetch_chunk_rows)

        def read_gate_schedule(batch: dict):
            for pdir in batch["pdir"]:
                t = pads.dataset(pdir, format="parquet").to_table()
                if t.num_rows == 0:
                    continue
                yield from sched_fn(gate_fn(t).to_pandas())

        sched = rd.from_items(
            [{"pdir": p} for p in part_dirs],
            override_num_blocks=len(part_dirs)) \
            .map_batches(read_gate_schedule, batch_format="numpy",
                         batch_size=None, num_cpus=0.75)
        fetched = sched.map_batches(
            make_fetch_fn(self.web_ref, self.handles, gen,
                          cand_sink=(cfg.scope,
                                     cfg.num_domain_partitions)),
            batch_format="pyarrow", batch_size=cfg.fetch_batch_size,
            num_cpus=1)
        t_exec = _time.time()
        fetched.write_parquet(fetched_dir)
        exec_seconds = round(_time.time() - t_exec, 3)
        _clean_empty_parquet(fetched_dir)

        # round flush: the candidate writer shards persist the next
        # generation (one file per dpart per shard) and report counts +
        # unique domains, so the driver never re-scans what it just wrote
        flush = ray.get([w.flush.remote(gen, next_dir)
                         for w in self.handles["cand_writers"]])
        n_next = sum(f[0] for f in flush)
        doms = set()
        next_per_part: dict = {}
        for _n, ds_, pp in flush:
            doms.update(ds_)
            for p, c in pp.items():
                next_per_part[p] = next_per_part.get(p, 0) + c

        # The per-domain state update (every row of a domain carries the
        # final clock/seq — max() per domain is exact) and the round
        # counters come from a narrow metadata pass over the round output.
        # Under cfg.max_local_meta_bytes it's ONE local arrow read; above
        # it, a distributed partial pre-agg (per-batch groupby max/sum in
        # tasks, only per-domain partials — bounded by the active-domain
        # count, never by row count — return to the driver).
        meta_cols = ["domain", "clock_after", "next_seq_after", "kind",
                     "allowed", "stores_page"]
        meta_paths = [os.path.join(fetched_dir, f)
                      for f in os.listdir(fetched_dir)
                      if f.endswith(".parquet")] \
            if os.path.isdir(fetched_dir) else []
        n_fetched = n_pages = 0
        dom_max: list = []  # (domain, clock_max, seq_max, n_rows)
        if meta_paths and sum(os.path.getsize(p) for p in meta_paths) \
                <= cfg.max_local_meta_bytes:
            meta = pads.dataset(meta_paths, format="parquet") \
                .to_table(columns=meta_cols)
            n_fetched = meta.num_rows
            n_pages = len(meta.filter(
                (pc.field("kind") == 0) |
                (~pc.field("allowed") & pc.field("stores_page"))))
            agg = meta.select(["domain", "clock_after", "next_seq_after"]) \
                .group_by("domain").aggregate(
                    [("clock_after", "max"), ("next_seq_after", "max"),
                     ("domain", "count")])
            dom_max = list(zip(agg.column("domain").to_pylist(),
                               agg.column("clock_after_max").to_pylist(),
                               agg.column("next_seq_after_max").to_pylist(),
                               agg.column("domain_count").to_pylist()))
        elif meta_paths:
            import pandas as _pd

            def _partial(df: "_pd.DataFrame") -> "_pd.DataFrame":
                is_page = (df["kind"] == 0) | \
                    (~df["allowed"] & df["stores_page"])
                g = df.groupby("domain").agg(
                    clock=("clock_after", "max"),
                    seq=("next_seq_after", "max"),
                    n=("domain", "size"))
                g["pages"] = is_page.groupby(df["domain"]).sum()
                return g.reset_index()

            parts = rd.read_parquet(meta_paths, columns=meta_cols) \
                .map_batches(_partial, batch_format="pandas").to_pandas()
            agg = parts.groupby("domain").agg(
                clock=("clock", "max"), seq=("seq", "max"),
                n=("n", "sum"), pages=("pages", "sum")).reset_index()
            n_fetched = int(agg["n"].sum())
            n_pages = int(agg["pages"].sum())
            dom_max = list(zip(agg["domain"], agg["clock"], agg["seq"],
                               agg["n"]))
        for d, c, s, _n in dom_max:
            old = self.domain_state.get(
                d, (0, 0, any(d in s2 for s2 in cfg.seeds)))
            self.domain_state[d] = (int(c), int(s), old[2])

        # content-hash DUPLICATE labels: resolved by the hash-winner shards
        # at end_round (one RPC per shard; they saw every observation).
        # Written hive-partitioned on dpart = hash(domain) so the
        # read_pages overlay can prune to the partitions a batch touches
        # instead of loading every round's dup set
        ov_dir = os.path.join(rdir, "dup_overrides")
        shutil.rmtree(ov_dir, ignore_errors=True)
        os.makedirs(ov_dir, exist_ok=True)
        dup_pairs = [p for dups in
                     ray.get([a.end_round.remote()
                              for a in self.handles["hash"]])
                     for p in dups]
        dup_by_part: dict = {}
        for d, s in dup_pairs:
            dup_by_part.setdefault(
                shard_of_str(d, cfg.num_domain_partitions), []).append((d, s))
        for part, prs in sorted(dup_by_part.items()):
            pdir_ov = os.path.join(ov_dir, f"dpart={part}")
            os.makedirs(pdir_ov, exist_ok=True)
            pq.write_table(pa.table({
                "domain": pa.array([d for d, _ in prs], pa.string()),
                "seq": pa.array([s for _, s in prs], pa.int64()),
            }), os.path.join(pdir_ov, "dups.parquet"))

        # new-domain discovery -> root enqueue + state entry (domains come
        # back from the writer flush — no read-back scan)
        new_doms = sorted(d for d in doms if d not in self.domain_state)
        if new_doms:
            # warm the robots shards for the newly discovered domains so
            # next round's broadcast covers them (parallel per shard)
            by_shard: dict = {}
            for d in new_doms:
                by_shard.setdefault(
                    shard_of_str(d, len(self.handles["robots"])),
                    []).append(d)
            boot_refs = [self.handles["robots"][s].bootstrap_many.remote(ds)
                         for s, ds in by_shard.items()]
            infos = []
            for d in new_doms:
                self.domain_state[d] = (0, 0,
                                        any(d in s for s in cfg.seeds))
                infos.append({"url": canonicalize(d), "domain": d,
                              "p_dom": "", "p_seq": -1, "cls": -1, "pos": 0})
            ray.get(boot_refs)
            _write_roots_partitioned(next_dir, infos,
                                     cfg.num_domain_partitions)
            n_next += len(infos)

        self.pages_total += n_pages
        self._snapshot(gen)
        # per-partition lineage: rows fetched per dpart this round (from
        # the per-domain partials — dpart is a pure function of domain) —
        # a resumed or audited run can account for every partition's
        # contribution
        per_part: dict = {}
        for d, _c, _s, n in dom_max:
            k = str(shard_of_str(d, cfg.num_domain_partitions))
            per_part[k] = per_part.get(k, 0) + int(n)
        _write_manifest(cfg.out_dir, gen, {
            "num_domain_partitions": cfg.num_domain_partitions,
            "candidates": n_cand, "fetched": n_fetched, "pages": n_pages,
            "pages_total": self.pages_total, "next_candidates": n_next,
            "new_domains": len(self.domain_state),
            "round_seconds": round(_time.time() - t_round, 3),
            "exec_seconds": exec_seconds,
            "fetched_per_partition": per_part,
            "next_candidates_per_partition": {
                str(k): int(v) for k, v in sorted(next_per_part.items())}})
        return n_next

    # ---------------- main loop ----------------

    def run(self, resume: bool = True) -> dict:
        cfg = self.cfg
        ctx = rd.DataContext.get_current()
        saved_block_size = ctx.target_max_block_size
        # small blocks so scheduled chunks become separate fetch tasks
        # (skew control; see _run_round)
        ctx.target_max_block_size = cfg.target_block_bytes
        try:
            return self._run_loop(resume)
        finally:
            ctx.target_max_block_size = saved_block_size

    def _run_loop(self, resume: bool) -> dict:
        cfg = self.cfg
        manifests = _read_manifests(cfg.out_dir) if resume else {}
        # the TERMINAL empty round writes a manifest but (having produced
        # no new state) no snapshot — restore from the newest gen that
        # has one, and short-circuit a crawl that already finished
        # instead of crashing on the missing snapshot / appending an
        # extra empty terminal round per resume
        snap_gens = [g for g in manifests if os.path.isdir(
            os.path.join(cfg.out_dir, "state", f"gen={g}"))]
        if manifests and not snap_gens:
            manifests = {}  # nothing restorable: start fresh
        if manifests:
            last = max(manifests)
            restore_gen = max(snap_gens)
            self._restore(restore_gen)
            self.pages_total = manifests[restore_gen].get("pages_total", 0)
            term = manifests[last]
            if term.get("candidates", 0) == 0 \
                    and term.get("next_candidates", 0) == 0 and last > 0:
                return {"rounds": last, "pages_total": self.pages_total}
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


def _dup_override_files(out_dir: str) -> list:
    """All dup_overrides parquet files across rounds (hive dpart layout;
    legacy flat files from pre-partitioned crawls are included too)."""
    rdir = os.path.join(out_dir, "rounds")
    out = []
    if os.path.isdir(rdir):
        for g in sorted(os.listdir(rdir)):
            p = os.path.join(rdir, g, "dup_overrides")
            if os.path.isdir(p):
                for root, _dirs, files in os.walk(p):
                    out.extend(os.path.join(root, f) for f in sorted(files)
                               if f.endswith(".parquet"))
    return out


def _dup_map_from_files(paths: list) -> dict:
    """domain -> sorted int64 seq array of content-hash DUPLICATE pages
    (the vectorized probe structure for the overlay)."""
    import numpy as np

    if not paths:
        return {}
    t = pads.dataset(paths, format="parquet").to_table(
        columns=["domain", "seq"])
    doms = np.asarray(t.column("domain").to_pylist(), dtype=object)
    seqs = t.column("seq").to_numpy(zero_copy_only=False)
    out: dict = {}
    order = np.argsort(doms, kind="stable")
    doms, seqs = doms[order], seqs[order]
    uniq, starts = np.unique(doms, return_index=True)
    bounds = list(starts) + [len(doms)]
    for i, d in enumerate(uniq):
        out[d] = np.sort(seqs[bounds[i]:bounds[i + 1]])
    return out


def _overlay_page_type(batch: pa.Table, dup_map: dict) -> pa.Table:
    """Vectorized DUPLICATE overlay: per unique domain in the batch, an
    np.isin probe of its seqs against the dup seq array."""
    import numpy as np

    doms = np.asarray(batch.column("domain").to_pylist(), dtype=object)
    seqs = batch.column("seq").to_numpy(zero_copy_only=False)
    mask = np.zeros(len(doms), dtype=bool)
    for d in np.unique(doms):
        arr = dup_map.get(d)
        if arr is not None and len(arr):
            rows = doms == d
            mask[rows] = np.isin(seqs[rows], arr)
    pt = batch.column("page_type")
    new_pt = pc.if_else(
        pc.and_(pa.array(mask), pc.equal(pt, "HTML")),
        pa.scalar("DUPLICATE", pa.string()), pt)
    i = batch.schema.get_field_index("page_type")
    return batch.set_column(i, "page_type", new_pt)


# broadcast-vs-partition-pruned threshold for the DUPLICATE overlay:
# below this total dup_overrides size the (domain -> seqs) lookup rides
# the object store once; above it each overlay actor loads ONLY the
# dpart partitions its batches touch (duplicates are ~2.5-3% of pages in
# the reference — linear in crawl size, so never a driver-side set of
# every dup pair at 10^10 pages)
_DUP_BROADCAST_LIMIT_BYTES = 64 * 1024 * 1024


def _read_num_partitions(out_dir: str) -> int:
    """num_domain_partitions recorded in the manifests (any round), with
    a frontier-dir scan fallback for crawls written before the field."""
    for m in _read_manifests(out_dir).values():
        if "num_domain_partitions" in m:
            return int(m["num_domain_partitions"])
    best = 0
    fdir = os.path.join(out_dir, "frontier")
    if os.path.isdir(fdir):
        for g in os.listdir(fdir):
            gd = os.path.join(fdir, g)
            if os.path.isdir(gd):
                for d in os.listdir(gd):
                    if d.startswith("dpart="):
                        best = max(best, int(d.split("=")[1]) + 1)
    return max(best, 1)


class _DupOverlayStage:
    """Actor-pool overlay for crawls whose dup set exceeds the broadcast
    limit: per-actor lazy load of the dpart partitions a batch touches
    (hive-pruned read), LRU-capped so one actor never accumulates the
    whole dup set."""

    def __init__(self, part_files: dict, n_parts: int,
                 max_cached_parts: int = 32):
        from collections import OrderedDict

        self.part_files = part_files      # dpart -> [parquet files]
        self.n_parts = n_parts
        self.max_cached = max_cached_parts
        self.cache: "OrderedDict[int, dict]" = OrderedDict()

    def _map_for(self, part: int) -> dict:
        m = self.cache.get(part)
        if m is None:
            m = _dup_map_from_files(self.part_files.get(part, []))
            self.cache[part] = m
            if len(self.cache) > self.max_cached:
                self.cache.popitem(last=False)
        else:
            self.cache.move_to_end(part)
        return m

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        doms = np.asarray(batch.column("domain").to_pylist(), dtype=object)
        merged: dict = {}
        for d in np.unique(doms):
            part_map = self._map_for(shard_of_str(d, self.n_parts))
            if d in part_map:
                merged[d] = part_map[d]
        return _overlay_page_type(batch, merged)


def _bytes_blocks(paths) -> int:
    """Read-task count sized by file BYTES (~64 MiB per task), floored
    at 8. The crawl sink writes one file per (generation, dpart), so a
    default one-block-per-file read hands every downstream exchange
    hundreds of near-empty blocks and the per-block × per-partition
    split overhead dominates (measured: read_links 129 s → 6 s at
    sf0.1). At real scale the same rule yields full-size blocks, so
    this is not a fixed sandbox constant."""
    return max(8, sum(os.path.getsize(p) for p in paths) // (64 << 20))


def read_pages(out_dir: str) -> rd.Dataset:
    """Final pages table: kind-0 rows plus stored DISALLOWED image/data
    rows, with content-hash DUPLICATE labels overlaid. Adaptive plan:
    under ``_DUP_BROADCAST_LIMIT_BYTES`` the (domain -> seqs) lookup is
    broadcast once via the object store; above it an actor-pool stage
    loads only the hive dpart partitions each batch touches (map-side
    hash join with partition pruning — no driver-side set, no wide
    shuffle of the page payload)."""
    paths = _fetched_paths(out_dir)
    ds = rd.read_parquet(
        paths, override_num_blocks=_bytes_blocks(paths),
        filter=((pc.field("kind") == 0) |
                (~pc.field("allowed") & pc.field("stores_page"))))
    dup_files = _dup_override_files(out_dir)
    if not dup_files:
        return ds
    total = sum(os.path.getsize(p) for p in dup_files)
    if total <= _DUP_BROADCAST_LIMIT_BYTES:
        dup_ref = ray.put(_dup_map_from_files(dup_files))

        def overlay(batch: pa.Table) -> pa.Table:
            return _overlay_page_type(batch, ray.get(dup_ref))

        return ds.map_batches(overlay, batch_format="pyarrow")

    n_parts = _read_num_partitions(out_dir)
    part_files: dict = {}
    for p in dup_files:
        part_dir = os.path.basename(os.path.dirname(p))
        if part_dir.startswith("dpart="):
            part_files.setdefault(int(part_dir.split("=")[1]), []).append(p)
        else:  # legacy flat file: un-prunable, attach to every partition
            for k in range(n_parts):
                part_files.setdefault(k, []).append(p)
    return ds.map_batches(
        _DupOverlayStage, fn_constructor_kwargs={
            "part_files": part_files, "n_parts": n_parts},
        batch_format="pyarrow", concurrency=(1, 8))


def read_images(out_dir: str) -> rd.Dataset:
    paths = _fetched_paths(out_dir)
    return rd.read_parquet(
        paths, override_num_blocks=_bytes_blocks(paths),
        filter=((pc.field("kind") == 1) & pc.field("allowed")))


def read_page_data(out_dir: str) -> rd.Dataset:
    paths = _fetched_paths(out_dir)
    return rd.read_parquet(
        paths, override_num_blocks=_bytes_blocks(paths),
        filter=((pc.field("kind") == 2) & pc.field("allowed")))


def read_order(out_dir: str) -> rd.Dataset:
    paths = _fetched_paths(out_dir)
    return rd.read_parquet(paths,
                           override_num_blocks=_bytes_blocks(paths),
                           columns=["domain", "seq", "url", "kind"])


# broadcast-vs-join threshold for the links semi-filter: below this total
# fetched-output size the distinct page-URL set rides the object store once
# (cheap in-task lookup); above it edges semi-join against the pages view
# with two partitioned hash joins — never a driver-side set of every URL
_LINKS_BROADCAST_LIMIT_BYTES = 64 * 1024 * 1024


def read_links(out_dir: str, distinct: bool = True) -> rd.Dataset:
    """Distinct link edges: extraction pairs (kind-0 frontier candidates)
    plus disallowed image/data parent edges, semi-filtered to stored pages
    (both endpoints must be stored — ``CrawlerDIO.scala:137-156`` inserts
    edges only between inserted pages). Adaptive plan: broadcast the
    distinct page-URL column under ``_LINKS_BROADCAST_LIMIT_BYTES``, else
    two partitioned hash semi-joins (the only correct shape at 10^10
    URLs). ``distinct=False`` skips the final pair-dedup exchange for
    consumers that dedup downstream anyway (the triangle kernel dedups
    on int64 node-id pairs — deduping the same edges on url strings
    first would be a wasted string shuffle)."""
    fr = os.path.join(out_dir, "frontier")
    gens = sorted(os.path.join(root, f)
                  for root, _d, files in os.walk(fr)
                  for f in files if f.endswith(".parquet"))
    cand = rd.read_parquet(
        gens, columns=["parent_url", "url"],
        override_num_blocks=_bytes_blocks(gens),
        filter=((pc.field("kind") == 0) & pc.field("parent_url").is_valid()))
    _fp = _fetched_paths(out_dir)
    dis = rd.read_parquet(
        _fp, columns=["parent_url", "url"],
        override_num_blocks=_bytes_blocks(_fp),
        filter=((pc.field("kind") != 0) & ~pc.field("allowed")
                & pc.field("parent_url").is_valid()))
    pairs = cand.select_columns(["parent_url", "url"]).union(
        dis.select_columns(["parent_url", "url"]))

    fetched = _fetched_paths(out_dir)
    page_urls = rd.read_parquet(
        fetched, columns=["url"],
        override_num_blocks=_bytes_blocks(fetched),
        filter=((pc.field("kind") == 0) |
                (~pc.field("allowed") & pc.field("stores_page"))))

    small = sum(os.path.getsize(p) for p in fetched) \
        < _LINKS_BROADCAST_LIMIT_BYTES
    if small:
        # distinct computed distributed; only the (bounded) URL column is
        # pulled back and shipped once via the object store. The probe is
        # a vectorized arrow is_in against the broadcast value set — no
        # per-row python loop in the hot path
        from .analytics import _distinct_rows
        distinct = _distinct_rows(page_urls, ["url"])
        chunks = [b.column("url").combine_chunks()
                  for b in distinct.iter_batches(batch_format="pyarrow")
                  if b.num_rows]
        urls_ref = ray.put(pa.concat_arrays(chunks) if chunks
                           else pa.array([], type=pa.string()))

        def sem_filter(batch: pa.Table) -> pa.Table:
            urls = ray.get(urls_ref)
            keep = pc.and_(
                pc.is_in(batch.column("parent_url"), value_set=urls),
                pc.is_in(batch.column("url"), value_set=urls))
            return batch.filter(keep)

        pairs = pairs.map_batches(sem_filter, batch_format="pyarrow")
    else:
        # two partitioned hash semi-joins expressed as groupby shuffles
        # (union edges with key markers, group on the key, keep edge rows
        # only where a marker lands in the group) — no join-operator actor
        # pools, no driver-side set; duplicates on the key side are
        # harmless because only edge rows are emitted. page_urls is
        # consumed twice — pin its blocks so the fetched-parquet scan +
        # filter runs once, not per semi-join
        page_urls = page_urls.materialize()
        pairs = _semi_keep(pairs, "parent_url", page_urls)
        pairs = _semi_keep(pairs, "url", page_urls)

    if not distinct:
        return pairs
    # exact dedup on the edge pair (one hash-partitioned shuffle, one
    # vectorized drop_duplicates per partition — no per-edge group calls)
    from .analytics import _distinct_rows
    return _distinct_rows(pairs, ["parent_url", "url"])


# hash-partition count for the vectorized semi-join: the shuffle groups
# on part = hash(k) % P (P groups total, each a vectorized isin probe)
# instead of on the raw key (10^10 per-key pandas calls). At cluster
# scale P should be ~4x the core count; partitions are hash-balanced.
_SEMI_JOIN_PARTITIONS = 64


def _key_parts(col: pa.ChunkedArray, n_parts: int) -> pa.Array:
    """Deterministic vectorized hash partition of a string column (pandas
    siphash with its fixed default key — stable across processes)."""
    import numpy as np
    import pandas as pd

    h = pd.util.hash_array(np.asarray(col.to_pylist(), dtype=object))
    return pa.array((h % n_parts).astype(np.int64))


def _semi_keep(edges: rd.Dataset, key_col: str, page_urls: rd.Dataset,
               n_parts: int = _SEMI_JOIN_PARTITIONS) -> rd.Dataset:
    """Partitioned hash semi-join: keep ``edges`` rows whose ``key_col``
    value appears in ``page_urls.url``. One groupby shuffle on
    hash(key) % n_parts — the same exchange shape as a hash join (the
    plan required at 10^10 URLs) but each group is a PARTITION processed
    with one vectorized ``isin`` probe, not a per-key pandas call."""
    import numpy as np

    other_col = "url" if key_col == "parent_url" else "parent_url"

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table({"k": b.column(key_col),
                         "other": b.column(other_col),
                         "part": _key_parts(b.column(key_col), n_parts),
                         "is_key": pa.array(
                             np.zeros(b.num_rows, dtype=bool))})

    def tag_keys(b: pa.Table) -> pa.Table:
        return pa.table({"k": b.column("url"),
                         "other": pa.nulls(b.num_rows, pa.string()),
                         "part": _key_parts(b.column("url"), n_parts),
                         "is_key": pa.array(
                             np.ones(b.num_rows, dtype=bool))})

    def keep(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        e = g[~g["is_key"]]
        keys = g.loc[g["is_key"], "k"]
        e = e[e["k"].isin(keys)]
        return pd.DataFrame({key_col: e["k"], other_col: e["other"]})

    u = edges.map_batches(tag_edges, batch_format="pyarrow").union(
        page_urls.map_batches(tag_keys, batch_format="pyarrow"))
    return u.groupby("part").map_groups(keep, batch_format="pandas")


def read_sites(out_dir: str) -> pa.Table:
    sdir = os.path.join(out_dir, "state")
    gens = sorted(os.listdir(sdir), key=lambda s: int(s.split("=")[1]))
    return pq.read_table(os.path.join(sdir, gens[-1], "sites.parquet"))


from ..functions.rounding import round6 as _round6  # noqa: E402


def crawl_stats(out_dir: str) -> "pd.DataFrame":
    """Crawl-statistics aggregation — the reference's post-hoc analysis
    (A2: counts by page_type, status histogram, avg load time, frontier
    wait time; ``r/loadTime.R:1-8``, ``r/waitTime.R:1-8``,
    ``report/report.tex:166-210``) as Ray Data passes over the pages
    view. The two ``wait_ms`` rows (mean / population sd of
    ``fetch_time - enq_time``, the logical frontier-queue wait) carry
    their value in the ``avg_load_ms`` column; their partials (count,
    sum, sum-of-squares) are integer-exact per batch so the statistic is
    summation-order independent and bit-equal to the HUGEINT SQL
    oracle."""
    import math

    from ray.data.aggregate import Count, Mean

    pages = read_pages(out_dir)
    by_type = pages.groupby("page_type").aggregate(
        Count(alias_name="n")).to_pandas()
    by_status = read_pages(out_dir).groupby("http_status").aggregate(
        Count(alias_name="n"),
        Mean("load_time_ms", alias_name="avg_load_ms")).to_pandas()
    import pandas as pd
    by_type = by_type.rename(columns={"page_type": "key"})
    by_type["stat"] = "page_type"
    by_status = by_status.rename(columns={"http_status": "key"})
    # int-valued keys rendered without a float suffix ('200', not '200.0';
    # null statuses stay null — matches CAST(http_status AS VARCHAR))
    by_status["key"] = by_status["key"].map(
        lambda v: None if pd.isna(v) else str(int(v)))
    by_status["stat"] = "http_status"

    # wait-time rows: pruned 2-column read of the pages rows; per-batch
    # integer partials (Python ints — sums of squares overflow int64 at
    # crawl scale), one tiny partial row per batch to the driver
    waits = rd.read_parquet(
        _fetched_paths(out_dir), columns=["fetch_time", "enq_time"],
        filter=((pc.field("kind") == 0) |
                (~pc.field("allowed") & pc.field("stores_page"))))

    def _wait_partial(b: pa.Table) -> pa.Table:
        w = (b.column("fetch_time").to_numpy(zero_copy_only=False)
             - b.column("enq_time").to_numpy(zero_copy_only=False)).tolist()
        return pa.table({
            "n": pa.array([len(w)], pa.int64()),
            "s": pa.array([str(sum(w))], pa.string()),
            "ss": pa.array([str(sum(v * v for v in w))], pa.string())})

    parts = waits.map_batches(_wait_partial,
                              batch_format="pyarrow").to_pandas()
    wait_rows = []
    n_w = int(parts["n"].sum()) if len(parts) else 0
    if n_w:
        s_w = sum(int(v) for v in parts["s"])
        ss_w = sum(int(v) for v in parts["ss"])
        mean_w = _round6(float(s_w) / n_w)
        sd_w = _round6(math.sqrt(float(n_w * ss_w - s_w * s_w)) / n_w)
        wait_rows = [{"stat": "wait_ms", "key": "mean", "n": n_w,
                      "avg_load_ms": mean_w},
                     {"stat": "wait_ms", "key": "sd", "n": n_w,
                      "avg_load_ms": sd_w}]

    out = pd.concat([by_type, by_status, pd.DataFrame(wait_rows)],
                    ignore_index=True)
    return out[["stat", "key", "n"] +
               [c for c in ("avg_load_ms",) if c in out.columns]]


def _main() -> None:
    """CLI: run the crawl engine over the deterministic synthetic world.

    python -m ieps_crawler_ray.pipelines.crawl --out /tmp/crawl \
        [--sf-dir /root/testdata/sf0.01] [--max-rounds N] [--no-resume]
    """
    import argparse
    import time

    p = argparse.ArgumentParser(
        description="Ray-Data-native crawl engine over the synthetic web")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="sf tier dir controlling world scale")
    p.add_argument("--max-rounds", type=int, default=None)
    p.add_argument("--max-pages", type=int, default=None)
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing checkpoints and restart")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args()

    import ray
    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)
    rd.DataContext.get_current().enable_progress_bars = False
    from .flagship import world_for_sf
    web = world_for_sf(args.sf_dir)
    cfg = CrawlConfig(out_dir=args.out, seeds=list(web.seeds),
                      max_rounds=args.max_rounds, max_pages=args.max_pages)
    t0 = time.time()
    res = run_crawl(web, cfg, resume=not args.no_resume)
    man = _read_manifests(args.out)
    fetched = sum(m.get("fetched", 0) for m in man.values())
    print(json.dumps(dict(res, fetched=fetched,
                          seconds=round(time.time() - t0, 2))))
    ray.shutdown()


if __name__ == "__main__":
    _main()
