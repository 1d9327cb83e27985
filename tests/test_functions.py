"""Unit tests for hashing, robots, and extraction (reference-pinned)."""

import numpy as np

from ieps_crawler_ray.functions import hashing, robots, extract


# ------------------------------ hashing -----------------------------------

def test_content_hash_uppercase_sha256():
    # HashGenerator.scala:7-15 — hex uppercase SHA-256
    assert hashing.content_hash("abc") == (
        "BA7816BF8F01CFEA414140DE5DAE2223B00361A396177A9CB410FF61F20015AD")


def test_url_hash128_stable_and_batch():
    h1, h2 = hashing.url_hash128("http://a.gov.si/")
    a1, a2 = hashing.url_hash128_many(["http://a.gov.si/", "http://b.gov.si/"])
    assert a1[0] == h1 and a2[0] == h2
    assert (a1[0], a2[0]) != (a1[1], a2[1])


def test_rolling_fingerprint_deterministic():
    f1 = hashing.rolling_fingerprint("the quick brown fox jumps over the lazy dog" * 5)
    f2 = hashing.rolling_fingerprint("the quick brown fox jumps over the lazy dog" * 5)
    assert np.array_equal(f1, f2)
    assert f1.size >= 1


# ------------------------------ robots ------------------------------------

def test_robots_missing_allows_all_with_default_delay():
    r = robots.parse_robots(None)
    assert r.is_allowed("http://a.gov.si/anything")
    assert r.get_delay_ms() == 4000  # SiteRobotsTxt.scala:18


def test_robots_disallow_prefix():
    r = robots.parse_robots("User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n")
    assert not r.is_allowed("http://a.gov.si/private/x")
    assert r.is_allowed("http://a.gov.si/public/x")
    assert r.get_delay_ms() == 2000


def test_robots_allow_overrides_longer_prefix():
    r = robots.parse_robots(
        "User-agent: *\nDisallow: /p/\nAllow: /p/ok/\n")
    assert not r.is_allowed("http://a.gov.si/p/no")
    assert r.is_allowed("http://a.gov.si/p/ok/yes")


def test_robots_other_agent_ignored():
    r = robots.parse_robots("User-agent: badbot\nDisallow: /\n")
    assert r.is_allowed("http://a.gov.si/x")


def test_robots_sitemaps_collected():
    r = robots.parse_robots("Sitemap: http://a.gov.si/sitemap.xml\n")
    assert r.sitemaps == ["http://a.gov.si/sitemap.xml"]


def test_sitemap_loc_parse():
    xml = ("<urlset><url><loc>http://a.gov.si/p/1</loc></url>"
           "<url><loc> http://a.gov.si/p/2 </loc></url></urlset>")
    assert robots.parse_sitemap_urls(xml) == [
        "http://a.gov.si/p/1", "http://a.gov.si/p/2"]


def test_sitemap_index_classification():
    idx = ("<sitemapindex><sitemap><loc>http://a.gov.si/s-0.xml</loc>"
           "</sitemap></sitemapindex>")
    flat = "<urlset><url><loc>http://a.gov.si/p/1</loc></url></urlset>"
    assert robots.parse_sitemap(idx) == ([], ["http://a.gov.si/s-0.xml"])
    assert robots.parse_sitemap(flat) == (["http://a.gov.si/p/1"], [])


def test_resolve_sitemaps_recurses_index():
    docs = {
        "http://a.gov.si/sitemap.xml":
            "<sitemapindex><sitemap><loc>http://a.gov.si/s-0.xml</loc>"
            "</sitemap><sitemap><loc>http://a.gov.si/s-1.xml</loc>"
            "</sitemap></sitemapindex>",
        "http://a.gov.si/s-0.xml":
            "<urlset><url><loc>http://a.gov.si/p/1/</loc></url></urlset>",
        "http://a.gov.si/s-1.xml":
            "<urlset><url><loc>http://a.gov.si/p/2/</loc></url></urlset>",
    }

    def fetch(u):
        t = docs.get(u)
        return {"status": 200 if t else 404, "text": t}

    urls, content = robots.resolve_sitemaps(
        fetch, ["http://a.gov.si/sitemap.xml"])
    assert urls == ["http://a.gov.si/p/1/", "http://a.gov.si/p/2/"]
    assert "<sitemapindex" in content  # top-level doc is what sites stores


def test_resolve_sitemaps_cycle_fetched_once():
    """A self-referencing index is fetched exactly once (visited set), not
    once per depth level."""
    calls = []

    def fetch(u):
        calls.append(u)
        return {"status": 200,
                "text": ("<sitemapindex><sitemap><loc>http://a.gov.si/"
                         "loop.xml</loc></sitemap></sitemapindex>")}

    urls, _ = robots.resolve_sitemaps(fetch, ["http://a.gov.si/loop.xml"])
    assert urls == []
    assert calls == ["http://a.gov.si/loop.xml"]


def test_resolve_sitemaps_depth_bounded():
    """A non-cyclic chain of distinct indexes terminates at
    SITEMAP_MAX_DEPTH levels even though every document is fresh."""
    calls = []

    def fetch(u):
        calls.append(u)
        k = int(u.rsplit("-", 1)[1].split(".")[0])
        return {"status": 200,
                "text": (f"<sitemapindex><sitemap><loc>http://a.gov.si/"
                         f"chain-{k + 1}.xml</loc></sitemap>"
                         f"</sitemapindex>")}

    urls, _ = robots.resolve_sitemaps(fetch, ["http://a.gov.si/chain-0.xml"])
    assert urls == []
    assert len(calls) == robots.SITEMAP_MAX_DEPTH


def test_resolve_sitemaps_duplicate_child_deduped():
    """An index listing the same child twice fetches it once and returns
    each page URL once (order preserved)."""
    calls = []
    docs = {
        "http://a.gov.si/idx.xml":
            "<sitemapindex><sitemap><loc>http://a.gov.si/s.xml</loc>"
            "</sitemap><sitemap><loc>http://a.gov.si/s.xml</loc>"
            "</sitemap></sitemapindex>",
        "http://a.gov.si/s.xml":
            "<urlset><url><loc>http://a.gov.si/p/1/</loc></url>"
            "<url><loc>http://a.gov.si/p/2/</loc></url>"
            "<url><loc>http://a.gov.si/p/1/</loc></url></urlset>",
    }

    def fetch(u):
        calls.append(u)
        t = docs.get(u)
        return {"status": 200 if t else 404, "text": t}

    urls, _ = robots.resolve_sitemaps(fetch, ["http://a.gov.si/idx.xml"])
    assert urls == ["http://a.gov.si/p/1/", "http://a.gov.si/p/2/"]
    assert calls.count("http://a.gov.si/s.xml") == 1


def test_world_sitemap_index_parts_union_to_flat_set():
    """An index domain's child sitemaps cover exactly the urls a flat
    sitemap would list."""
    from ieps_crawler_ray.sources.corpus import build_corpus_rows
    from ieps_crawler_ray.sources.synthetic_web import (SyntheticWeb,
                                                        WorldConfig)

    web = SyntheticWeb(WorldConfig(n_domains=5, total_pages=60, n_corpus=8,
                                   seed=42, n_seeds=3), build_corpus_rows(8))
    dom = "site0001.gov.si"          # sitemap INDEX domain in this world
    assert web.has_sitemap_index(dom)
    assert "<sitemapindex" in web.sitemap_xml(dom)
    urls = web.get_sitemap_urls(dom, web.robots_txt(dom))
    want = {f"http://{dom}/p/{k}/" for k in web._sitemap_ks(dom)}
    assert set(urls) == want and len(urls) == len(want)


# ------------------------------ extract -----------------------------------

HTML = """
<html><body>
<a href="http://site1.gov.si/p/1">one</a>
<a href='http://site1.gov.si/p/2#frag'>two</a>
<a href="http://other.gov.si/p/9">cross</a>
<a href="http://site1.gov.si/p/1">dupe</a>
<a href="http://site1.gov.si/doc/a.pdf">doc</a>
<a href="http://site1.gov.si/z.zip">zip</a>
<a href="/p/3">rooted</a>
<a href="http://example.com/out">outscope</a>
<div onclick="http://site1.gov.si/p/4">click</div>
<img src="http://site1.gov.si/img/i1.png" alt="cap one">
<img src="http://other.gov.si/img/i2.png" alt="x">
<img src="img/rel.png">
</body></html>
"""


def test_all_links_order_and_fallback():
    links = extract.all_links(HTML, "site1.gov.si")
    # a[href] order first, then onclick
    assert links[0] == "http://site1.gov.si/p/1/"
    assert links[1] == "http://site1.gov.si/p/2/"
    assert "http://site1.gov.si/p/4/" in links  # onclick
    assert "http:///p/3/" in links             # rooted href keeps empty host


def test_page_links_filters():
    links = extract.all_links(HTML, "site1.gov.si")
    pl = extract.page_links(links, "gov.si")
    assert "http://site1.gov.si/doc/a.pdf" not in pl   # data ext excluded
    assert "http://site1.gov.si/z.zip" not in pl
    assert "http://example.com/out/" not in pl         # scope filter
    assert "http:///p/3/" not in pl                    # /// filter
    assert pl.count("http://site1.gov.si/p/1/") == 1    # distinct
    assert "http://other.gov.si/p/9/" in pl             # cross-domain kept


def test_data_links_no_distinct_no_scope():
    links = extract.all_links(HTML + '<a href="http://x.com/b.docx">d</a>',
                              "site1.gov.si")
    dl = extract.data_links(links)
    assert "http://site1.gov.si/doc/a.pdf" in dl
    assert "http://x.com/b.docx" in dl  # no scope filter (faithful)


MESSY_HTML = """
<html><body>
<!-- commented out: <a href="http://site1.gov.si/ghost/">nope</a> -->
<a
   href=http://site1.gov.si/p/7
   class=unquoted>multiline unquoted</a>
<A HREF="http://site1.gov.si/p/8">uppercase</A>
<script>var s = '<a href="http://site1.gov.si/script-link/">x</a>';</script>
<a href="http://site1.gov.si/p/amp?a=1&amp;b=2">entity</a>
<img
  src=img/messy.png
  alt="messy alt">
</body></html>
"""


def test_tolerant_parser_on_messy_html():
    """jsoup-parity cases the regex path can't handle: comments containing
    <a, unquoted attrs across newlines, uppercase tags/attrs, script CDATA,
    entity-escaped attribute values."""
    links = extract.all_links(MESSY_HTML, "site1.gov.si")
    assert "http://site1.gov.si/p/7/" in links       # unquoted, multiline
    assert "http://site1.gov.si/p/8/" in links       # uppercase tag+attr
    assert not any("ghost" in u for u in links)      # comment skipped
    assert not any("script-link" in u for u in links)  # script CDATA
    assert any("a=1&b=2" in u for u in links)        # &amp; unescaped


def test_parser_matches_regex_on_wellformed_html():
    """On well-formed HTML the tokenizer path and the original regex path
    extract identical links (parity pin for the default-path swap)."""
    assert extract.all_links(HTML, "site1.gov.si") == \
        extract.all_links_regex(HTML, "site1.gov.si")


def test_parser_never_raises_on_garbage():
    garbage = "<a href='http://site1.gov.si/ok/'><<<>>\x00<img src=<a<"
    links = extract.all_links(garbage, "site1.gov.si")
    assert "http://site1.gov.si/ok/" in links


def test_con_type_quirk():
    # char-code slice quirk: last char 'g' (103) — short urls → full ext
    assert extract.con_type("http://a.gov.si/img/x.png") == "PNG"
    assert extract.con_type("http://a.gov.si/img/x.jpeg") == "JPEG"
    # a url longer than ord(last char) gets truncated (faithful quirk)
    long_url = "http://a.gov.si/" + "x" * 120 + ".png"
    ct = extract.con_type(long_url)
    assert ct == ""  # rfind('.')+1 == 137 > ord('g')=103 → empty slice


def test_image_links_same_domain_only_in_extract_page():
    res = extract.extract_page(HTML, "site1.gov.si", "gov.si")
    srcs = [u for (u, t, a) in res["images"]]
    assert srcs == ["http://site1.gov.si/img/i1.png"]
    assert res["images"][0][1] == "PNG"
    assert res["images"][0][2] == "cap one"
    # relative src canonicalizes to junk host and is dropped by domain filter
    assert all("rel.png" not in s for s in srcs)


def test_extract_page_split():
    res = extract.extract_page(HTML, "site1.gov.si", "gov.si")
    assert "http://site1.gov.si/p/1/" in res["page_links_local"]
    assert "http://other.gov.si/p/9/" in res["page_links_remote"]
    assert res["data_links"] == ["http://site1.gov.si/doc/a.pdf"]
    assert "http://other.gov.si/p/9/" in res["edges"]


def test_mime_map():
    assert extract.MIME_TO_DATA_TYPE["application/pdf"] == "PDF"
    assert extract.MIME_TO_DATA_TYPE["application/msword"] == "DOC"


def test_quantile_sketch_block_invariant(ray_session):
    """The histogram sketch must be partitioning-invariant: integer-add
    merge of partials gives the same result for any block layout."""
    from ieps_crawler_ray.pipelines.analytics import \
        events_value_quantile_sketch

    a = events_value_quantile_sketch("/root/testdata/sf0.001") \
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    b = events_value_quantile_sketch("/root/testdata/sf0.001") \
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)
    assert (a["p50_cents"] <= a["p90_cents"]).all()
    assert (a["p90_cents"] <= a["p99_cents"]).all()


def test_bloom_semijoin_exact_under_high_fp_rate(ray_session):
    """With a tiny bloom (high false-positive rate) the exact verify
    must still produce the exact semi-join result."""
    import duckdb

    from ieps_crawler_ray.pipelines.analytics import orders_semijoin_bloom

    sf = "/root/testdata/sf0.001"
    out = orders_semijoin_bloom(sf, m_bits=1 << 8, k_hashes=2) \
        .to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT o.o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM read_parquet('{sf}/orders.parquet') o
        WHERE o.o_custkey IN (
            SELECT c_custkey FROM read_parquet('{sf}/customer.parquet')
            WHERE c_mktsegment = 'BUILDING')
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """).df()
    assert out["n_orders"].tolist() == want["n_orders"].tolist()
    assert out["revenue_cents"].tolist() == want["revenue_cents"].tolist()


def test_table_io_parquet_roundtrip_and_lance_gate(tmp_path):
    """table_io writes/reads parquet; the .lance path is an explicit
    gated integration point (NotImplementedError without the wheel)."""
    import pyarrow as pa
    import pytest as _pytest

    from ieps_crawler_ray.sources import table_io as tio

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    p = str(tmp_path / "t.parquet")
    tio.write_table(t, p)
    assert tio.read_table(p).equals(t)
    if not tio.lance_available():
        with _pytest.raises(NotImplementedError):
            tio.write_table(t, str(tmp_path / "t.lance"))
        with _pytest.raises(NotImplementedError):
            tio.read_table(str(tmp_path / "t.lance"))


def test_bytes_blocks_scales_with_file_bytes(tmp_path):
    """Read-task sizing: floored at 8 for small outputs, grows ~linearly
    with bytes so exchanges never see hundreds of near-empty blocks."""
    from ieps_crawler_ray.pipelines.crawl import _bytes_blocks

    small = tmp_path / "small.bin"
    small.write_bytes(b"x" * 1024)
    assert _bytes_blocks([str(small)]) == 8
    import os

    big = tmp_path / "big.bin"
    big.touch()
    os.truncate(big, 1 << 30)  # sparse 1 GiB
    assert _bytes_blocks([str(big)]) == 16
    assert _bytes_blocks([str(big), str(small)]) == 16
