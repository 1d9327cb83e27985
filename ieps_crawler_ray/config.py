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
    # stage sizing
    fetch_concurrency: tuple = (2, 8)
    fetch_batch_size: int = 512
    parse_batch_size: int = 512
    schedule_num_partitions: Optional[int] = None  # default: cpus
    # budgets
    max_rounds: Optional[int] = None
    max_pages: Optional[int] = None
