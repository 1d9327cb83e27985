"""Property-based tests (hypothesis) for the pure operator core:
canonicalizer idempotence, seen-set exactness (no false negatives and no
false positives on the exact tier), scheduler invariants (per-domain FIFO
seq, politeness spacing, dedup uniqueness)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ieps_crawler_ray.functions.canonical import canonicalize, extract_domain
from ieps_crawler_ray.functions.schedule import schedule_domain_rows
from ieps_crawler_ray.state.cuckoo import SeenShard

# --------------------------------------------------------------------------
# canonicalizer
# --------------------------------------------------------------------------

# query-less URLs only: the reference's append-"/"-to-the-whole-string
# quirk (Canonical.scala:43-45) makes query URLs non-idempotent BY DESIGN
# (the slash lands inside the query); the idempotence guarantee — and the
# reference's own behavior — holds for query-less URLs.
_url_chars = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
             "0123456789-._~/#", min_size=1, max_size=40)


@given(host=st.from_regex(r"[a-z][a-z0-9-]{0,20}(\.[a-z]{2,6}){1,2}",
                          fullmatch=True),
       path=_url_chars,
       scheme=st.sampled_from(["http://", "https://", ""]))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(host, path, scheme):
    u = f"{scheme}{host}/{path}"
    c1 = canonicalize(u)
    if c1 is None:
        return
    c2 = canonicalize(c1)
    assert c2 == c1, (u, c1, c2)
    # the canonical form's domain is stable too
    assert extract_domain(c1) == extract_domain(c1)


# --------------------------------------------------------------------------
# seen set: exact membership (cuckoo fast path + exact tier)
# --------------------------------------------------------------------------

@given(keys=st.lists(st.tuples(st.integers(-2**63, 2**63 - 1),
                               st.integers(-2**63, 2**63 - 1)),
                     min_size=0, max_size=300),
       probes=st.lists(st.tuples(st.integers(-2**63, 2**63 - 1),
                                 st.integers(-2**63, 2**63 - 1)),
                       min_size=0, max_size=100))
@settings(max_examples=50, deadline=None)
def test_seen_shard_exact_membership(keys, probes):
    shard = SeenShard(capacity_hint=1 << 8, hot_limit=64)  # force compaction
    if keys:
        h1 = np.array([k[0] for k in keys], dtype=np.int64)
        h2 = np.array([k[1] for k in keys], dtype=np.int64)
        shard.add_many(h1, h2)
    inserted = set(keys)
    all_probes = list(inserted) + probes
    p1 = np.array([p[0] for p in all_probes], dtype=np.int64)
    p2 = np.array([p[1] for p in all_probes], dtype=np.int64)
    got = shard.contains_many(p1, p2)
    want = np.array([p in inserted for p in all_probes])
    assert (got == want).all()


# --------------------------------------------------------------------------
# scheduler invariants
# --------------------------------------------------------------------------

_row = st.fixed_dictionaries({
    "url": st.from_regex(r"http://d\.si/p/[0-9]{1,2}/", fullmatch=True),
    "kind": st.sampled_from([0, 0, 0, 1, 2]),
    "parent_url": st.just("http://d.si/p/0/"),
    "p_dom": st.just("d.si"),
    "p_seq": st.integers(-1, 30),
    "cls": st.integers(-1, 2),
    "pos": st.integers(0, 9),
    "seen": st.booleans(),
    "allowed": st.booleans(),
    "delay_ms": st.sampled_from([1000, 4000]),
})


@given(rows=st.lists(_row, min_size=0, max_size=60),
       clock0=st.integers(0, 10**6), seq0=st.integers(0, 1000),
       download=st.booleans())
@settings(max_examples=100, deadline=None)
def test_schedule_invariants(rows, clock0, seq0, download):
    out, clock, nseq = schedule_domain_rows(rows, clock0, seq0, download)
    # seq is a gapless FIFO sequence
    seqs = [r["seq"] for r in out]
    assert seqs == list(range(seq0, seq0 + len(out)))
    assert nseq == seq0 + len(out)
    # politeness: fetch_time is monotonically non-decreasing and each
    # advancing row spaces the NEXT row by >= its delay
    prev_t, prev_gap = None, 0
    for r in out:
        if prev_t is not None:
            assert r["fetch_time"] >= prev_t + prev_gap
        prev_t = r["fetch_time"]
        adv = r.get("allowed", True) and (r["kind"] == 0 or download)
        prev_gap = r["delay_ms"] if adv else 0
    assert clock >= clock0
    # kind-0 urls are unique among scheduled rows
    k0_urls = [r["url"] for r in out if r["kind"] == 0]
    assert len(k0_urls) == len(set(k0_urls))
    # seen kind-0 candidates never schedule
    assert not any(r["kind"] == 0 and r.get("seen") for r in out)


# --------------------------------------------------------------------------
# WAV / Y4M codecs
# --------------------------------------------------------------------------

from ieps_crawler_ray.functions import audio_codec as _ac  # noqa: E402
from ieps_crawler_ray.functions import video_codec as _vc  # noqa: E402


@given(st.lists(st.floats(min_value=-1.0, max_value=1.0,
                          allow_nan=False, width=32),
                min_size=1, max_size=2000),
       st.sampled_from([8_000, 16_000, 44_100]))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(samples, sr):
    w = np.array(samples, dtype=np.float32)
    w2, sr2 = _ac.decode_wav(_ac.encode_wav(w, sr))
    assert sr2 == sr and len(w2) == len(w)
    assert np.abs(w - w2).max() <= 1.01 / 32767


@given(st.integers(min_value=1, max_value=4),
       st.integers(min_value=1, max_value=4),
       st.integers(min_value=1, max_value=5),
       st.integers(min_value=0, max_value=255).map(lambda v: v))
@settings(max_examples=30, deadline=None)
def test_y4m_flat_frames_roundtrip_exact(hw, ww, n_frames, val):
    """Flat-color frames survive 4:2:0 chroma subsampling exactly
    (2x2 blocks are constant), any even dims, any frame count."""
    h, w = hw * 2, ww * 2
    frames = [np.full((h, w, 3), val, np.uint8)] * n_frames
    dec, _ = _vc.decode_y4m(_vc.encode_y4m(frames))
    assert len(dec) == n_frames
    for fr in dec:
        assert (fr == frames[0]).all()


@given(st.integers(min_value=0, max_value=500))
@settings(max_examples=20, deadline=None)
def test_y4m_luma_bound_property(idx):
    frames = _vc.procedural_video(idx, max_frames=8)
    dec, _ = _vc.decode_y4m(_vc.encode_y4m(frames))
    for a, b in zip(frames, dec):
        ya = _vc._rgb_to_yuv(a)[..., 0].astype(int)
        yb = _vc._rgb_to_yuv(b)[..., 0].astype(int)
        # luma(yuv_to_rgb(y,u,v)) == y for ANY u,v (inverse-matrix
        # identity), so unclipped pixels roundtrip within rounding;
        # pixels clipped at 0/255 (box-averaged chroma vs high-contrast
        # 2x2 block) legitimately shift
        err = np.abs(ya - yb)
        clipped = ((b == 0) | (b == 255)).any(axis=-1)
        assert err[~clipped].max(initial=0) <= 1
        assert err.mean() <= 2.0
