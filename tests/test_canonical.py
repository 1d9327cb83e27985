"""Unit tests pinning the reference canonicalizer quirks
(Canonical.scala:15-67 — see docstrings in functions/canonical.py)."""

from hypothesis import given, settings, strategies as st

from ieps_crawler_ray.functions.canonical import (
    canonicalize, extract_domain, EXTENSIONS)


def test_scheme_prepended():
    assert canonicalize("site1.gov.si") == "http://site1.gov.si/"
    assert canonicalize("https://site1.gov.si") == "https://site1.gov.si/"


def test_host_lowercased():
    assert canonicalize("http://SITE1.GOV.SI/Page") == "http://site1.gov.si/Page/"


def test_fragment_stripped():
    assert canonicalize("http://a.gov.si/p/1#frag") == "http://a.gov.si/p/1/"
    assert canonicalize("http://a.gov.si/p/1/#x") == "http://a.gov.si/p/1/"


def test_index_page_removed():
    assert canonicalize("http://a.gov.si/index.html") == "http://a.gov.si/"
    assert canonicalize("http://a.gov.si/dir/index.php") == "http://a.gov.si/dir/"
    # substring-triggered removal (Canonical.scala:38-42): name anywhere in
    # the url causes "/"+name removal everywhere
    assert canonicalize("http://a.gov.si/index.html?x=1") == "http://a.gov.si?x=1/"


def test_trailing_slash_added():
    assert canonicalize("http://a.gov.si") == "http://a.gov.si/"
    assert canonicalize("http://a.gov.si/p") == "http://a.gov.si/p/"
    # quirk: slash appended to the WHOLE url even after a query
    assert canonicalize("http://a.gov.si/p?q=1") == "http://a.gov.si/p?q=1/"


def test_extension_trailing_slash_stripped():
    assert canonicalize("http://a.gov.si/x.html") == "http://a.gov.si/x.html"
    assert canonicalize("http://a.gov.si/x.PDF") == "http://a.gov.si/x.PDF"
    assert canonicalize("http://a.gov.si/img/a.png") == "http://a.gov.si/img/a.png"


def test_default_port_stripped():
    assert canonicalize("http://a.gov.si:80/p") == "http://a.gov.si/p/"
    assert canonicalize("https://a.gov.si:443/p") == "https://a.gov.si/p/"
    assert canonicalize("http://a.gov.si:8080/p") == "http://a.gov.si:8080/p/"


def test_dot_segments_resolved():
    assert canonicalize("http://a.gov.si/x/../y") == "http://a.gov.si/y/"
    assert canonicalize("http://a.gov.si/x/./y") == "http://a.gov.si/x/y/"


def test_invalid_urls_none():
    assert canonicalize("http://a.gov.si:notaport/x") is None
    assert canonicalize(None) is None


def test_empty_host_preserved():
    # "/p/1" -> "http:///p/1/" — later dropped by the "///" filter, like the
    # reference (ExtractFromHTML.scala:88)
    assert canonicalize("/p/1") == "http:///p/1/"


def test_extract_domain_www_quirk():
    assert extract_domain("http://www.site1.gov.si/p") == "site1.gov.si"
    # faithful quirk (Canonical.scala:63): startswith("www") drops 4 chars
    assert extract_domain("http://wwwz.si/p") == "si/p"[:0] or \
        extract_domain("http://wwwz.si/p") == ".si"
    assert extract_domain("http://site1.gov.si/p") == "site1.gov.si"
    assert extract_domain("not a url at all ://") == ""
    assert extract_domain(None) == ""


def test_canonical_idempotent_on_query_less_samples():
    # NOTE the reference is NOT idempotent for urls with a query string: the
    # trailing "/" is appended to the whole url on every pass
    # (Canonical.scala:43-45). Idempotence holds for query-less urls only.
    samples = [
        "site1.gov.si", "http://SITE1.GOV.SI/Page#f", "http://a.gov.si/x.html",
        "http://a.gov.si/dir/index.php", "http://www.a.gov.si/a/../b",
    ]
    for s in samples:
        c1 = canonicalize(s)
        assert c1 is not None
        assert canonicalize(c1) == c1, s


def test_canonical_query_nonidempotence_faithful():
    c1 = canonicalize("http://a.gov.si:80/p?q=2")
    assert c1 == "http://a.gov.si/p?q=2/"
    assert canonicalize(c1) == "http://a.gov.si/p?q=2//"


def test_canonical_fragment_nonidempotence_faithful():
    """Faithful reference quirk (hypothesis-discovered): the host
    lowercasing at Canonical.scala:31 replaces EVERY occurrence of the
    host substring, so an upper-case host that also appears in the
    fragment lowercases the fragment BEFORE the ``replaceAll("#"+ref)``
    at :34 looks for it — the (original-case) fragment then survives
    the first pass, and the URI rebuild at :48 keeps getRef. A second
    pass sees the now-lowercase fragment and strips it."""
    c1 = canonicalize("A#A")
    assert c1 == "http://a#a/"
    assert canonicalize(c1) == "http://a/"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=60))
def test_canonicalize_never_raises(s):
    c = canonicalize(s)
    if c is not None and "?" not in c and "#" not in c:
        # idempotence on everything query-less and fragment-less that
        # parses (queries AND surviving fragments are faithfully
        # non-idempotent — see the two quirk tests above)
        assert canonicalize(c) == c
    extract_domain(s)  # never raises


def test_no_duplicate_semantics_in_extensions():
    # the reference array lists .ppt/.asp twice; our tuple is deduped but
    # endswith behavior is identical
    assert len(set(EXTENSIONS)) == len(EXTENSIONS)
