"""Cuckoo / bloom / SeenShard unit tests."""

import numpy as np

from ieps_crawler_ray.state.cuckoo import BloomFilter, CuckooFilter, SeenShard


def test_cuckoo_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.int64).view(np.uint64)
    cf = CuckooFilter(capacity=8000)
    cf.add_many(keys)
    assert cf.contains_many(keys).all()


def test_cuckoo_low_false_positive_rate():
    rng = np.random.default_rng(8)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.int64).view(np.uint64)
    other = rng.integers(0, 2**63, size=5000, dtype=np.int64).view(np.uint64)
    cf = CuckooFilter(capacity=8000)
    cf.add_many(keys)
    fpr = cf.contains_many(other).mean()
    assert fpr < 0.01, fpr


def test_cuckoo_snapshot_roundtrip():
    keys = np.arange(100, dtype=np.uint64) * np.uint64(2654435761)
    cf = CuckooFilter(capacity=256)
    cf.add_many(keys)
    cf2 = CuckooFilter.restore(cf.snapshot())
    assert cf2.contains_many(keys).all()


def test_bloom():
    keys = np.arange(1000, dtype=np.uint64) * np.uint64(0x9E3779B9)
    b = BloomFilter(1000)
    b.add_many(keys)
    assert b.might_contain_many(keys).all()
    other = (np.arange(1000, dtype=np.uint64) + np.uint64(7)) * np.uint64(104729)
    assert b.might_contain_many(other).mean() < 0.05


def test_seen_shard_exact_128bit_with_spill():
    s = SeenShard(capacity_hint=128, hot_limit=64)  # tiny => forces spills
    h1 = np.arange(2000, dtype=np.int64)
    h2 = -h1
    assert s.contains_and_add(h1, h2).all()
    assert not s.contains_and_add(h1, h2).any()
    # same h1, different h2 -> distinct key (128-bit exactness)
    assert s.contains_and_add(h1[:5], h2[:5] + 1).all()
    # in-batch duplicate: first occurrence wins
    m = s.contains_and_add(np.array([99999, 99999], dtype=np.int64),
                           np.array([1, 1], dtype=np.int64))
    assert m.tolist() == [True, False]
    assert len(s) == 2006


def test_seen_shard_snapshot_restore():
    s = SeenShard(capacity_hint=64, hot_limit=32)
    h1 = np.arange(500, dtype=np.int64) * 3
    h2 = h1 * 7
    s.add_many(h1, h2)
    s2 = SeenShard.restore(s.snapshot())
    assert s2.contains_many(h1, h2).all()
    assert len(s2) == 500
    assert not s2.contains_many(h1 + 1, h2).any()


def test_cuckoo_stash_visible_from_both_buckets():
    """A fingerprint stashed under a key's ALTERNATE bucket must still be
    found: the kick loop stashes (fp, last_bucket) where last_bucket may be
    i2, and contains_many probes both (fp, i1) and (fp, i2)."""
    cf = CuckooFilter(capacity=256)
    key = np.array([0xDEADBEEFCAFE1234], dtype=np.uint64)
    fp = int(cf._fp(key)[0])
    i1 = int(cf._i1(key)[0])
    i2 = int(cf._i2(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
    assert i1 != i2
    for idx in (i1, i2):
        cf.stash = {(fp, idx)}
        assert cf.contains_many(key).all(), f"stash under bucket {idx} missed"


def test_cuckoo_rebuild_on_overflow():
    s = SeenShard(capacity_hint=64, hot_limit=1 << 20)
    h1 = np.arange(5000, dtype=np.int64)
    s.add_many(h1, h1)
    assert s.contains_many(h1, h1).all()
    assert s.cuckoo.n_buckets * 4 >= 5000
