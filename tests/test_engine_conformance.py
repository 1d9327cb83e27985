"""Ray engine vs single-threaded oracle — exact conformance
(SURVEY.md §5.2 / FIXTURES.md F5: URL-seen set equality, per-domain order,
pages/images/page_data/links value equality, logical politeness clock)."""

import shutil

import numpy as np
import pandas as pd
import pytest

from ieps_crawler_ray.config import CrawlConfig
from ieps_crawler_ray.pipelines import crawl as C
from ieps_crawler_ray.pipelines.oracle import OracleCrawler
from ieps_crawler_ray.sources.corpus import build_corpus_rows
from ieps_crawler_ray.sources.synthetic_web import SyntheticWeb, WorldConfig

OUT = "/tmp/ieps_test_crawl"


_WORLDS = {
    "w42": WorldConfig(n_domains=5, total_pages=60, n_corpus=60, seed=42,
                       n_seeds=3),
    # different RNG universe: other robots/sitemap mix, stronger skew,
    # more domains than seeds (exercises cross-domain discovery harder)
    "w7": WorldConfig(n_domains=9, total_pages=90, n_corpus=40, seed=7,
                      zipf_s=1.6, n_seeds=2),
    # third universe: many tiny domains, single seed, flat popularity —
    # maximizes new-domain discovery churn and sitemap-index coverage
    "w123": WorldConfig(n_domains=13, total_pages=110, n_corpus=30,
                        seed=123, zipf_s=1.05, n_seeds=1),
}


@pytest.fixture(scope="module", params=sorted(_WORLDS))
def world(request):
    cfg = _WORLDS[request.param]
    corpus = build_corpus_rows(cfg.n_corpus)
    return SyntheticWeb(cfg, corpus)


@pytest.fixture(scope="module")
def oracle(world):
    return OracleCrawler(world).run()


@pytest.fixture(scope="module")
def engine_out(world, ray_session):
    shutil.rmtree(OUT, ignore_errors=True)
    C.run_crawl(world, CrawlConfig(out_dir=OUT, seeds=list(world.seeds)))
    return OUT


def _assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame, keys, cols):
    a = a[keys + cols].sort_values(keys).reset_index(drop=True)
    b = b[keys + cols].sort_values(keys).reset_index(drop=True)
    assert len(a) == len(b), (len(a), len(b))
    for c in cols:
        ea, eb = a[c].values, b[c].values
        neq = ~((pd.isna(ea) & pd.isna(eb)) | (ea == eb))
        assert not neq.any(), (c, a[neq].head(3), b[neq].head(3))


def test_seen_set_exact(oracle, engine_out):
    o = set(oracle["seen"].column("url").to_pylist())
    e = set(C.read_pages(engine_out).to_pandas()["url"])
    assert o == e


def test_pages_exact(oracle, engine_out):
    _assert_frames_equal(
        oracle["pages"].to_pandas(), C.read_pages(engine_out).to_pandas(),
        ["url"], ["domain", "page_type", "http_status", "content_hash",
                  "seq", "fetch_time", "enq_time", "load_time_ms"])


def test_per_domain_order_exact(oracle, engine_out):
    _assert_frames_equal(
        oracle["order"].to_pandas(), C.read_order(engine_out).to_pandas(),
        ["domain", "seq"], ["url", "kind"])


def test_images_exact(oracle, engine_out):
    o = oracle["images"].to_pandas().rename(
        columns={"filename": "url", "page_url": "parent_url"})
    e = C.read_images(engine_out).to_pandas()
    _assert_frames_equal(o, e, ["domain", "seq"],
                         ["url", "parent_url", "is_duplicate", "downloaded",
                          "w", "h", "fmt", "caption", "fetch_time",
                          "con_type"])


def test_image_payload_bytes_exact(oracle, engine_out):
    o = oracle["images"].to_pandas()
    e = C.read_images(engine_out).to_pandas()
    o_d = {(r["domain"], r["seq"]): r["data"] for _, r in o.iterrows()
           if r["downloaded"]}
    e_d = {(r["domain"], r["seq"]): r["data"] for _, r in e.iterrows()
           if r["downloaded"]}
    assert o_d.keys() == e_d.keys()
    assert all(bytes(o_d[k]) == bytes(e_d[k]) for k in o_d)


def test_page_data_exact(oracle, engine_out):
    o = oracle["page_data"].to_pandas().rename(
        columns={"filename": "url", "page_url": "parent_url"})
    e = C.read_page_data(engine_out).to_pandas()
    _assert_frames_equal(o, e, ["domain", "seq"],
                         ["url", "parent_url", "data_type", "is_duplicate",
                          "downloaded", "fetch_time"])


def test_links_exact(oracle, engine_out):
    o = set(map(tuple, oracle["links"].to_pandas().values))
    e = set(map(tuple, C.read_links(engine_out).to_pandas().values))
    assert o == e


def test_links_join_path_matches_broadcast(oracle, engine_out, monkeypatch):
    """Force the partitioned-hash-semi-join plan (threshold 0) — the links
    view must stay exactly equal to the oracle without any driver-side
    URL-set materialization."""
    monkeypatch.setattr(C, "_LINKS_BROADCAST_LIMIT_BYTES", 0)
    o = set(map(tuple, oracle["links"].to_pandas().values))
    e = set(map(tuple, C.read_links(engine_out).to_pandas().values))
    assert o == e


def test_wait_stats_match_oracle(oracle, engine_out):
    """crawl_stats' wait_ms mean/sd rows equal an independent integer-
    exact recomputation from the oracle's pages table (A2 wait-time
    parity, r/waitTime.R analog)."""
    import math

    stats = C.crawl_stats(engine_out)
    w = stats[stats["stat"] == "wait_ms"].set_index("key")["avg_load_ms"]
    p = oracle["pages"].to_pandas()
    wait = [int(v) for v in (p["fetch_time"] - p["enq_time"])]
    n, s, ss = len(wait), sum(wait), sum(v * v for v in wait)
    assert n > 0
    mean = math.floor(float(s) / n * 1e6 + 0.5) / 1e6
    sd = math.floor(math.sqrt(float(n * ss - s * s)) / n * 1e6 + 0.5) / 1e6
    assert w["mean"] == mean
    assert w["sd"] == sd


def test_dup_overlay_partitioned_path_matches_broadcast(oracle, engine_out,
                                                        monkeypatch):
    """Force the partition-pruned actor-pool DUPLICATE overlay (threshold
    0) — the pages view must stay exactly equal to the oracle without the
    driver ever holding the full dup-pair set."""
    monkeypatch.setattr(C, "_DUP_BROADCAST_LIMIT_BYTES", 0)
    _assert_frames_equal(
        oracle["pages"].to_pandas(), C.read_pages(engine_out).to_pandas(),
        ["domain", "seq"],
        ["url", "page_type", "http_status", "content_hash"])


def test_distributed_meta_agg_conformance(world, oracle, ray_session):
    """max_local_meta_bytes=0 forces the per-round distributed partial
    pre-agg of domain clock/seq maxima; the crawl must still match the
    oracle exactly (ordering depends on exact clock propagation)."""
    if world.cfg.seed != 42:   # full extra crawl: one world suffices
        pytest.skip("forced-path crawl pinned to the w42 world")
    out = "/tmp/ieps_test_crawl_dmeta"
    shutil.rmtree(out, ignore_errors=True)
    C.run_crawl(world, CrawlConfig(out_dir=out, seeds=list(world.seeds),
                                   max_local_meta_bytes=0))
    _assert_frames_equal(
        oracle["pages"].to_pandas(), C.read_pages(out).to_pandas(),
        ["url"], ["page_type", "http_status", "content_hash", "seq",
                  "fetch_time"])


def test_rules_rpc_fallback_conformance(world, oracle, ray_session):
    """max_broadcast_rules=0 disables the per-round rules broadcast; the
    gate runs entirely on the batched robots-shard RPC path and the crawl
    must still match the oracle exactly."""
    if world.cfg.seed != 42:   # full extra crawl: one world suffices
        pytest.skip("forced-path crawl pinned to the w42 world")
    out = "/tmp/ieps_test_crawl_rpc"
    shutil.rmtree(out, ignore_errors=True)
    C.run_crawl(world, CrawlConfig(out_dir=out, seeds=list(world.seeds),
                                   max_broadcast_rules=0))
    _assert_frames_equal(
        oracle["pages"].to_pandas(), C.read_pages(out).to_pandas(),
        ["url"], ["page_type", "http_status", "content_hash", "seq",
                  "fetch_time"])


def test_sites_match(oracle, engine_out):
    o = oracle["sites"].to_pandas().set_index("domain")
    e = C.read_sites(engine_out).to_pandas().set_index("domain")
    assert set(o.index) == set(e.index)
    for d in o.index:
        assert o.loc[d, "robots_content"] == e.loc[d, "robots_content"] or (
            pd.isna(o.loc[d, "robots_content"])
            and pd.isna(e.loc[d, "robots_content"]))


def test_resume_identical(world, oracle, ray_session):
    """Kill after round 1, resume, and the final tables are identical to the
    uninterrupted run (north_rule resumability)."""
    out2 = "/tmp/ieps_test_crawl_resume"
    shutil.rmtree(out2, ignore_errors=True)
    # phase 1: stop after 2 rounds
    C.run_crawl(world, CrawlConfig(out_dir=out2, seeds=list(world.seeds),
                                   max_rounds=2))
    # phase 2: fresh driver + actors, resume from checkpoint
    C.run_crawl(world, CrawlConfig(out_dir=out2, seeds=list(world.seeds)),
                resume=True)
    e = C.read_pages(out2).to_pandas()
    _assert_frames_equal(
        oracle["pages"].to_pandas(), e, ["url"],
        ["page_type", "http_status", "content_hash", "seq", "fetch_time"])
    o_links = set(map(tuple, oracle["links"].to_pandas().values))
    e_links = set(map(tuple, C.read_links(out2).to_pandas().values))
    assert o_links == e_links


def test_resume_after_mid_round_crash(world, oracle, ray_session):
    """Crash MID-round: partial fetched/frontier files exist for the
    in-flight round but no manifest — resume must discard the partial
    round, redo it, and still match the oracle exactly."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    out3 = "/tmp/ieps_test_crawl_crash"
    shutil.rmtree(out3, ignore_errors=True)
    C.run_crawl(world, CrawlConfig(out_dir=out3, seeds=list(world.seeds),
                                   max_rounds=2))
    # simulate a crash during round 2: partial (garbage) outputs, no manifest
    part = os.path.join(out3, "rounds", "gen=2", "fetched")
    os.makedirs(part, exist_ok=True)
    pq.write_table(pa.table({"junk": pa.array([1, 2, 3])}),
                   os.path.join(part, "partial.parquet"))
    fpart = os.path.join(out3, "frontier", "gen=3", "dpart=0")
    os.makedirs(fpart, exist_ok=True)
    pq.write_table(pa.table({"junk": pa.array([9])}),
                   os.path.join(fpart, "partial.parquet"))

    C.run_crawl(world, CrawlConfig(out_dir=out3, seeds=list(world.seeds)),
                resume=True)
    e = C.read_pages(out3).to_pandas()
    _assert_frames_equal(
        oracle["pages"].to_pandas(), e, ["url"],
        ["page_type", "http_status", "content_hash", "seq", "fetch_time"])


def test_resume_of_completed_crawl_is_noop(world, oracle, ray_session):
    """Resuming an ALREADY-FINISHED crawl must return the same totals
    without crashing on the terminal round's snapshot-less manifest and
    without appending extra terminal manifests (regression: the empty
    terminal round writes a manifest but no state snapshot, and resume
    restored from max(manifests))."""
    import os

    out4 = "/tmp/ieps_test_crawl_done"
    shutil.rmtree(out4, ignore_errors=True)
    r1 = C.run_crawl(world, CrawlConfig(out_dir=out4,
                                        seeds=list(world.seeds)))
    mans = sorted(os.listdir(os.path.join(out4, "manifest")))
    r2 = C.run_crawl(world, CrawlConfig(out_dir=out4,
                                        seeds=list(world.seeds)),
                     resume=True)
    assert r2["rounds"] == r1["rounds"]
    assert r2["pages_total"] == r1["pages_total"]
    assert sorted(os.listdir(os.path.join(out4, "manifest"))) == mans
    e = C.read_pages(out4).to_pandas()
    _assert_frames_equal(
        oracle["pages"].to_pandas(), e, ["url"],
        ["page_type", "http_status", "content_hash", "seq", "fetch_time"])
