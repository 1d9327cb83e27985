"""Sharded stateful Ray actors — the engine's mutable state plane.

Everything the reference keeps in Postgres indexes / per-worker memory
(``db/CrawlerDIO.scala:102-134``, ``actors/DomainWorkerActor.scala:56``)
lives here as sharded actors addressed by key hash:

* ``SeenShardActor``    — URL-seen membership (cuckoo + exact tier),
                          sharded by ``h1 % n``
* ``RobotsShardActor``  — robots.txt rule cache + fetch-on-miss + site rows,
                          sharded by ``hash(domain) % n``
* ``HashWinnerActor``   — content-hash first-writer resolution
                          (``CrawlerDIO.scala:82-86`` DUPLICATE semantics)
                          with a deterministic (domain, seq) winner rule,
                          sharded by hash prefix
* ``RegistryActor``     — image/page_data filename registry
                          (``CrawlerDIO.scala:157-178`` exists-check +
                          original-parent quirk), sharded by filename hash

All methods take/return numpy arrays or plain lists — one RPC per shard per
batch (the ``map_batches`` task splits each Arrow batch by shard key and
fans out). Actors snapshot to parquet per round for checkpoint/resume.
"""

from __future__ import annotations

import numpy as np
import ray

from ..functions.robots import parse_robots, resolve_sitemaps
from .cuckoo import SeenShard


@ray.remote(num_cpus=0)
class SeenShardActor:
    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.shard = SeenShard()

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        return self.shard.contains_many(h1, h2)

    def add(self, h1: np.ndarray, h2: np.ndarray) -> int:
        self.shard.add_many(h1, h2)
        return len(self.shard)

    def contains_and_add(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        return self.shard.contains_and_add(h1, h2)

    def count(self) -> int:
        return len(self.shard)

    def snapshot(self) -> dict:
        return self.shard.snapshot()

    def restore(self, snap: dict) -> None:
        self.shard = SeenShard.restore(snap)


@ray.remote(num_cpus=0)
class RobotsShardActor:
    """Caches parsed robots rules per domain; fetches on miss from the
    (simulated) web. Also owns the ``sites`` rows for its domains."""

    def __init__(self, shard_id: int, web_ref):
        self.shard_id = shard_id
        # Ray auto-resolves ObjectRef actor args; accept either form
        self.web = (ray.get(web_ref) if isinstance(web_ref, ray.ObjectRef)
                    else web_ref)
        self.rules: dict = {}
        self.sites: dict = {}

    def _ensure(self, domain: str) -> None:
        if domain in self.rules:
            return
        robots_txt = self.web.get_robots(domain) if self.web else None
        rules = parse_robots(robots_txt)
        # recursive sitemap-index descent (SiteMaps.scala:12-55), bounded;
        # web=None is a supported state (rules-only shard) — no fetches
        if self.web is not None and rules.sitemaps:
            sitemap_urls, sitemap_content = resolve_sitemaps(
                self.web.fetch, rules.sitemaps)
        else:
            sitemap_urls, sitemap_content = [], None
        self.rules[domain] = rules
        self.sites[domain] = {"domain": domain, "robots_content": robots_txt,
                              "sitemap_content": sitemap_content,
                              "sitemap_urls": sitemap_urls}

    def bootstrap(self, domain: str) -> dict:
        self._ensure(domain)
        return self.sites[domain]

    def check(self, domains: list, urls: list) -> tuple:
        allowed = np.empty(len(urls), dtype=bool)
        delay = np.empty(len(urls), dtype=np.int64)
        for i, (d, u) in enumerate(zip(domains, urls)):
            self._ensure(d)
            r = self.rules[d]
            allowed[i] = r.is_allowed(u)
            delay[i] = r.get_delay_ms()
        return allowed, delay

    def bootstrap_many(self, domains: list) -> int:
        for d in domains:
            self._ensure(d)
        return len(self.rules)

    def dump_rules(self) -> dict:
        """Parsed rules for every cached domain — broadcast by the driver
        each round so the gate checks robots LOCALLY in the partition
        tasks (vector-friendly, no per-row actor serialization); the actor
        RPC remains only the fetch-on-miss fallback."""
        return dict(self.rules)

    def dump_sites(self) -> list:
        return [self.sites[d] for d in sorted(self.sites)]

    def restore_sites(self, sites: list) -> None:
        for s in sites:
            self.sites[s["domain"]] = dict(s)
            self.rules[s["domain"]] = parse_robots(s["robots_content"])


@ray.remote(num_cpus=0)
class HashWinnerActor:
    """Content-hash dedup with the deterministic winner rule: within a
    round the (domain, seq)-minimal fetcher wins; hashes from earlier
    rounds always win (matches the oracle's sequential store order).

    The actor resolves the round's DUPLICATE labels itself at
    ``end_round`` (it has seen every observation), so the driver needs no
    second per-row query pass over the fetched output — one RPC per shard
    per round returns the loser ``(domain, seq)`` pairs."""

    def __init__(self, shard_id: int):
        self.prior: set = set()
        self.round_min: dict = {}
        self.round_obs: list = []   # (hash, domain, seq) seen this round

    def observe(self, hashes: list, domains: list, seqs: list) -> None:
        for h, d, s in zip(hashes, domains, seqs):
            self.round_obs.append((h, d, s))
            if h in self.prior:
                continue
            key = (d, s)
            cur = self.round_min.get(h)
            if cur is None or key < cur:
                self.round_min[h] = key

    def end_round(self) -> list:
        """Close the round; returns the (domain, seq) pairs of this
        round's DUPLICATE pages (observation whose hash was already prior,
        or lost the within-round winner race)."""
        dups = [(d, s) for h, d, s in self.round_obs
                if h in self.prior or self.round_min.get(h) != (d, s)]
        self.prior.update(self.round_min)
        self.round_min = {}
        self.round_obs = []
        return dups

    def snapshot(self) -> list:
        return sorted(self.prior)

    def restore(self, prior: list) -> None:
        self.prior = set(prior)
        self.round_min = {}
        self.round_obs = []


@ray.remote(num_cpus=0)
class RegistryActor:
    """Filename registry for images / page_data: exists-check + the
    original-parent quirk (dup image rows keep the ORIGINAL's page —
    ``CrawlerDIO.scala:159-166``). Register is idempotent: all callers for
    one filename in one round pass the same deterministic round-first
    parent, so task retries and block order don't matter."""

    def __init__(self, shard_id: int):
        self.store: dict = {}   # filename -> (original parent url, round)

    def register(self, filenames: list, parents: list, round_no: int) -> tuple:
        """Idempotent within a round: ``existed`` is true iff the filename
        was first registered in an EARLIER round (batch arrival order within
        the round must not matter — all callers pass the deterministic
        round-first parent)."""
        existed = np.empty(len(filenames), dtype=bool)
        orig = []
        for i, (fn, p) in enumerate(zip(filenames, parents)):
            cur = self.store.get(fn)
            if cur is None:
                self.store[fn] = (p, round_no)
                existed[i] = False
                orig.append(p)
            else:
                existed[i] = cur[1] < round_no
                orig.append(cur[0])
        return existed, orig

    def snapshot(self) -> dict:
        return dict(self.store)

    def restore(self, store: dict) -> None:
        self.store = {k: tuple(v) for k, v in store.items()}


@ray.remote(num_cpus=0)
class CandidateWriterActor:
    """Buffers next-generation frontier candidates for its dpart shard
    group and writes ONE parquet file per dpart at round flush. This is
    the write side of the engine's domain shuffle: fetch tasks submit
    per-dpart slices (idempotent via batch tags, so task retries don't
    duplicate rows), the driver flushes after the round's execution
    barrier. Keeps the frontier at ~one file per partition per round
    instead of (tasks x dparts) tiny files."""

    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.gen = None
        self.buf: dict = {}    # dpart -> [pa.Table]
        self.tags: set = set()

    def submit(self, gen: int, tag: str, parts: list) -> None:
        if self.gen != gen:
            self.buf, self.tags, self.gen = {}, set(), gen
        if tag in self.tags:
            return
        self.tags.add(tag)
        for dpart, table in parts:
            self.buf.setdefault(dpart, []).append(table)

    def flush(self, gen: int, next_dir: str) -> tuple:
        """Write buffered tables; returns (rows_written, unique_domains,
        rows_per_dpart) so the driver needs no read-back scan."""
        import os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if self.gen != gen:
            return 0, [], {}
        n = 0
        doms: set = set()
        per_part: dict = {}
        for dpart, tables in sorted(self.buf.items()):
            t = pa.concat_tables(tables)
            pdir = os.path.join(next_dir, f"dpart={dpart}")
            os.makedirs(pdir, exist_ok=True)
            pq.write_table(
                t, os.path.join(pdir, f"cand-w{self.shard_id}.parquet"))
            n += t.num_rows
            per_part[int(dpart)] = t.num_rows
            doms.update(pc.unique(t.column("domain")).to_pylist())
        self.buf, self.tags = {}, set()
        return n, sorted(doms), per_part


def make_actor_pools(cfg, web_ref):
    """Spawn all state actor pools; returns a handle bundle dict."""
    return {
        "seen": [SeenShardActor.remote(i) for i in range(cfg.num_seen_shards)],
        "robots": [RobotsShardActor.remote(i, web_ref)
                   for i in range(cfg.num_robots_shards)],
        "hash": [HashWinnerActor.remote(i) for i in range(cfg.num_hash_shards)],
        "img_reg": [RegistryActor.remote(i)
                    for i in range(cfg.num_registry_shards)],
        "data_reg": [RegistryActor.remote(i)
                     for i in range(cfg.num_registry_shards)],
        "cand_writers": [CandidateWriterActor.remote(i)
                         for i in range(cfg.num_writer_shards)],
    }


def shard_of_str(s: str, n: int) -> int:
    import hashlib
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=4).digest(),
                          "big") % n
