"""Driver-contract registry invariants: every `queries()` entry has a
matching `oracle_sql()` entry (the repo's all-queries-SQL-checked
claim), and the ENTIRE crawl/multimodal family sits inside the
driver's 50-entry correctness cap."""

import sys

sys.path.insert(0, "/root/repo")


def test_every_query_has_an_oracle(ray_session):
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    missing = sorted(set(q) - set(o))
    extra = sorted(set(o) - set(q))
    assert not missing, f"queries with no oracle: {missing}"
    assert not extra, f"oracles with no query: {extra}"


def test_cap_covers_crawl_and_image_families(ray_session):
    import __ray_entry__ as e

    q = list(e.queries())
    first50 = set(q[:50])
    fam = [n for n in q if n.startswith(("crawl_", "image_",
                                         "audio_", "video_"))]
    out = [n for n in fam if n not in first50]
    assert not out, f"crawl/multimodal entries past the cap: {out}"
    for must in ("crawl_flagship", "image_phash_neardup", "crawl_pagerank",
                 "events_asof_join", "events_distinct_users_hll",
                 "minhash_lsh_neardup", "embedding_semdedup", "user_funnel"):
        assert must in first50, must
