"""Engine configuration (the user-extension surface the reference lacks —
SURVEY.md §2.10: seeds, scope predicate, politeness budget, shard counts,
batch sizes, budgets are all hardcoded in the reference)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class CrawlConfig:
    out_dir: str
    seeds: list = field(default_factory=list)
    scope: str = "gov.si"            # ExtractFromHTML.scala:87 analog
    # sharded state actors (sized for the node; at cluster scale these grow
    # with the node count — shard count is the unit of state parallelism)
    num_seen_shards: int = 4
    num_robots_shards: int = 2
    num_hash_shards: int = 2
    num_registry_shards: int = 2
    num_writer_shards: int = 8
    # stage sizing
    fetch_batch_size: int = 1024
    # rows per scheduled chunk yielded to the (unfused) fetch operator —
    # combined with target_block_bytes this caps a fetch task's work, so a
    # hot domain's partition spreads over many fetch tasks (skew control)
    fetch_chunk_rows: int = 512
    # target_max_block_size during the crawl execution; scheduled rows are
    # ~170 B so this keeps one or two chunks per block
    target_block_bytes: int = 256 * 1024
    # number of domain-hash partitions the frontier is written in
    # (dpart = blake2b(domain) % P). The shuffle happens at WRITE time
    # (parse writes hive-partitioned parquet); each round then reads one
    # partition as one block and schedules it locally — no runtime
    # all-to-all. At cluster scale P grows with the node count; each
    # partition must fit a block (<= DataContext.target_max_block_size).
    num_domain_partitions: int = 32
    # per-round robots-rules broadcast guard: the driver gathers each
    # shard's parsed rules and ray.puts them ONCE per round so the gate
    # checks robots locally — cheap while the domain count is bounded, but
    # a driver-side materialization at web scale (10^7 domains). Above
    # this many cached domains the broadcast is skipped and the gate falls
    # back to the batched robots-shard RPC path (crawl_stages.py gate fn).
    max_broadcast_rules: int = 200_000
    # per-round metadata pass guard: under this many bytes of round output
    # the per-domain clock/seq maxima are computed with one local narrow
    # arrow read; above it a distributed per-batch partial pre-agg runs and
    # only per-domain partials (bounded by active-domain count) reach the
    # driver
    max_local_meta_bytes: int = 256 * 1024 * 1024
    # budgets
    max_rounds: Optional[int] = None
    max_pages: Optional[int] = None
