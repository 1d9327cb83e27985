"""Oracle crawler invariants on the tiny synthetic world (FIXTURES.md unit
tier). The oracle is itself the golden reference for the Ray engine; these
tests pin its own invariants."""

import numpy as np
import pytest

from ieps_crawler_ray.pipelines.oracle import OracleCrawler
from ieps_crawler_ray.sources.corpus import build_corpus_rows
from ieps_crawler_ray.sources.synthetic_web import SyntheticWeb, WorldConfig


@pytest.fixture(scope="module")
def world():
    corpus = build_corpus_rows(60)
    cfg = WorldConfig(n_domains=5, total_pages=60, n_corpus=60, seed=42,
                      n_seeds=3)
    return SyntheticWeb(cfg, corpus)


@pytest.fixture(scope="module")
def result(world):
    return OracleCrawler(world).run()


def test_deterministic(world, result):
    r2 = OracleCrawler(world).run()
    for k in result:
        assert result[k].equals(r2[k]), k


def test_unique_page_urls(result):
    urls = result["pages"].column("url").to_pylist()
    assert len(urls) == len(set(urls))
    assert set(urls) == set(result["seen"].column("url").to_pylist())


def test_page_types_present(result):
    types = set(result["pages"].column("page_type").to_pylist())
    assert {"HTML", "INVALID", "DUPLICATE"} <= types


def test_per_domain_seq_strictly_increasing(result):
    tbl = result["order"].to_pandas()
    for dom, g in tbl.groupby("domain"):
        seqs = g["seq"].to_numpy()
        assert (np.diff(seqs) > 0).all(), dom


def test_politeness_spacing(world, result):
    """Per-domain fetch_time spacing >= crawl delay for consecutive
    clock-advancing events (SURVEY.md §5.5)."""
    from ieps_crawler_ray.functions.robots import parse_robots
    pages = result["pages"].to_pandas()
    fetched = pages[pages["page_type"].isin(["HTML", "INVALID", "DUPLICATE"])]
    for dom, g in fetched.groupby("domain"):
        delay = parse_robots(world.robots_txt(dom)).get_delay_ms()
        ts = np.sort(g["fetch_time"].dropna().to_numpy())
        if len(ts) > 1:
            assert (np.diff(ts) >= delay).all(), dom


def test_duplicate_pages_share_content_hash(result):
    pages = result["pages"].to_pandas()
    dups = pages[pages["page_type"] == "DUPLICATE"]
    originals = set(pages[pages["page_type"] == "HTML"]["content_hash"])
    assert len(dups) > 0
    assert set(dups["content_hash"]) <= originals


def test_image_fidelity_against_corpus(world, result):
    """North_rule per-row invariant: decoded pixels allclose (PSNR>=40 for
    lossy), caption exact equality, phash equality with the corpus golden."""
    import re
    from ieps_crawler_ray.functions import image_codec as ic
    imgs = result["images"].to_pandas()
    dl = imgs[imgs["downloaded"]]
    assert len(dl) > 0
    corpus = world.corpus.to_pandas().set_index("image_id")
    checked = 0
    for _, row in dl.iterrows():
        m = re.search(r"(img\d{8})", row["filename"])
        assert m, row["filename"]
        ref = corpus.loc[m.group(1)]
        dec, fmt = ic.decode_image(row["data"])
        ref_dec, _ = ic.decode_image(ref["bytes"])
        assert fmt == ref["fmt"]
        assert (row["w"], row["h"]) == (ref["w"], ref["h"])
        if fmt in ("png", "bmp"):
            assert np.array_equal(dec, ref_dec)
        else:
            assert ic.psnr(dec, ref_dec) >= 40.0
        # (pandas floats nullable int64 — recompute from the decoded pixels)
        assert ic.phash64(dec) == ref["phash"]
        assert row["caption"] == ref["caption"]  # alt text == corpus caption
        checked += 1
    assert checked >= 5


def test_duplicate_image_keeps_original_parent(result):
    imgs = result["images"].to_pandas()
    dups = imgs[imgs["is_duplicate"]]
    if len(dups):
        firsts = imgs[~imgs["is_duplicate"]].set_index("filename")["page_url"]
        for _, row in dups.iterrows():
            if row["filename"] in firsts.index:
                assert row["page_url"] == firsts[row["filename"]]


def test_links_reference_existing_pages(result):
    urls = set(result["pages"].column("url").to_pylist())
    links = result["links"].to_pandas()
    assert len(links) > 0
    assert set(links["from_url"]) <= urls
    assert set(links["to_url"]) <= urls
    assert not links.duplicated(["from_url", "to_url"]).any()


def test_budget_stops_crawl(world):
    res = OracleCrawler(world, max_pages=10).run()
    # budget is checked at round boundaries: bounded, small
    assert res["pages"].num_rows <= 60


def test_sites_recorded(result):
    sites = result["sites"].to_pandas()
    assert (sites[sites["domain"].str.startswith("site000")]["robots_content"]
            .notna().any())
    doms = set(sites["domain"])
    pages_doms = set(result["pages"].column("domain").to_pylist())
    assert pages_doms <= doms
