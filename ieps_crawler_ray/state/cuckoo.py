"""Cuckoo filter + bloom filter + the two-tier exact SeenSet shard.

The reference's URL-seen membership is a Postgres ``unique(url)`` index
queried per record (``db/CrawlerDIO.scala:102-134``). The north_rule replaces
it with a sharded cuckoo-filter seen set with a bloom spill tier. One
``SeenShard`` here is the state held by ONE Ray actor
(``state/seen_actors.py``); sharding is by ``h1 % num_shards``.

Design for 10^10 keys:
* cuckoo filter (16-bit fingerprints, 4-slot buckets) answers "definitely
  new" with no false negatives — the overwhelmingly common case on a crawl
  frontier — in O(1) numpy probes per batch.
* positives (~0.1% false + true dups) are verified against the exact tier:
  a small "hot" python set plus immutable sorted int64 runs ("spills", the
  bloom-guarded cold tier). Runs are produced by periodic compaction and
  would live in object storage at real scale; each run carries a bloom
  filter so cold probes usually touch nothing.
* keys are 128-bit url hashes (h1, h2) so exactness holds at 10^10 keys;
  h1 (uniform) doubles as the shard / cuckoo key.
"""

from __future__ import annotations

import numpy as np

_FP_MASK = np.uint64(0xFFFF)
_EMPTY = np.uint16(0)


class CuckooFilter:
    """4-way bucketed cuckoo filter over uint64 keys, 16-bit fingerprints."""

    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 0x5EED):
        n_buckets = 1
        while n_buckets * 4 < capacity * 1.05:
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.stash: set = set()
        self.count = 0
        self._rng = np.random.default_rng(seed)

    # fingerprint: 16 bits, never 0
    @staticmethod
    def _fp(keys: np.ndarray) -> np.ndarray:
        fp = (keys >> np.uint64(48)) & _FP_MASK
        fp = np.where(fp == 0, np.uint64(1), fp)
        return fp.astype(np.uint16)

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (keys & self.mask).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo: alt index = i1 xor hash(fp)
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & self.mask
        return (i1.astype(np.uint64) ^ h).astype(np.int64)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe. No false negatives."""
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._i2(i1, fp)
        t = self.table
        hit = (t[i1] == fp[:, None]).any(axis=1) | (t[i2] == fp[:, None]).any(axis=1)
        if self.stash:
            # a stashed (fp, idx) records whichever bucket the kick loop
            # last held — that is always ONE of the key's two buckets
            # (every hop in the chain moves fp between its own pair), so
            # probing BOTH (fp, i1) and (fp, i2) is exact: no false
            # negatives even for entries stashed under the alternate bucket
            for j in np.nonzero(~hit)[0]:
                if (int(fp[j]), int(i1[j])) in self.stash or \
                        (int(fp[j]), int(i2[j])) in self.stash:
                    hit[j] = True
        return hit

    def add_many(self, keys: np.ndarray) -> None:
        """Vectorized fast path: free-slot placement into bucket 1 then
        bucket 2, slot by slot, first-wins per bucket per pass; only the
        rare overflow keys fall back to the per-key kick loop."""
        keys = keys.astype(np.uint64, copy=False)
        fp_all = self._fp(keys)
        i1_all = self._i1(keys)
        i2_all = self._i2(i1_all, fp_all)
        t = self.table
        pending = np.arange(len(keys))
        for bucket_of in (i1_all, i2_all):
            if not len(pending):
                break
            for s in range(4):
                if not len(pending):
                    break
                b = bucket_of[pending]
                free = t[b, s] == _EMPTY
                cand = np.nonzero(free)[0]
                if not cand.size:
                    continue
                # first candidate per bucket wins this pass (no write race)
                _ub, first = np.unique(b[cand], return_index=True)
                chosen = cand[first]
                t[b[chosen], s] = fp_all[pending[chosen]]
                keep = np.ones(len(pending), dtype=bool)
                keep[chosen] = False
                pending = pending[keep]
        self.count += len(keys) - len(pending)
        if not len(pending):
            return
        # slow path: cuckoo kicks for the overflow stragglers
        fp = fp_all
        i1 = i1_all
        i2 = i2_all
        for j in pending:
            f = fp[j]
            a, b = int(i1[j]), int(i2[j])
            placed = False
            for idx in (a, b):
                row = t[idx]
                free = np.nonzero(row == _EMPTY)[0]
                if free.size:
                    row[free[0]] = f
                    placed = True
                    break
            if not placed:
                cur_idx, cur_fp = a, int(f)
                for _ in range(self.MAX_KICKS):
                    slot = int(self._rng.integers(0, 4))
                    cur_fp, t[cur_idx, slot] = int(t[cur_idx, slot]), cur_fp
                    alt = int((np.uint64(cur_idx)
                               ^ ((np.uint64(cur_fp) * np.uint64(0x5BD1E995))
                                  & self.mask)))
                    row = t[alt]
                    free = np.nonzero(row == _EMPTY)[0]
                    if free.size:
                        row[free[0]] = cur_fp
                        placed = True
                        break
                    cur_idx = alt
                if not placed:
                    self.stash.add((cur_fp, cur_idx))
            self.count += 1

    def snapshot(self) -> dict:
        return {"table": self.table.copy(),
                "stash": np.array(sorted(self.stash), dtype=np.int64).reshape(-1, 2),
                "count": self.count}

    @classmethod
    def restore(cls, snap: dict) -> "CuckooFilter":
        obj = cls.__new__(cls)
        obj.table = snap["table"].copy()
        obj.n_buckets = obj.table.shape[0]
        obj.mask = np.uint64(obj.n_buckets - 1)
        obj.stash = {(int(a), int(b)) for a, b in snap["stash"]}
        obj.count = int(snap["count"])
        obj._rng = np.random.default_rng(0x5EED)
        return obj


class BloomFilter:
    """Simple 2-hash bloom over uint64 keys (guards cold spill runs)."""

    def __init__(self, capacity: int, bits_per_key: int = 10):
        n_bits = 1
        while n_bits < capacity * bits_per_key:
            n_bits <<= 1
        self.n_bits = n_bits
        self.mask = np.uint64(n_bits - 1)
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray):
        k = keys.astype(np.uint64, copy=False)
        p1 = k & self.mask
        p2 = ((k >> np.uint64(17)) * np.uint64(0x9E3779B97F4A7C15)) & self.mask
        return p1, p2

    def add_many(self, keys: np.ndarray) -> None:
        for p in self._positions(keys):
            np.bitwise_or.at(self.bits, (p >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (p & np.uint64(7)).astype(np.uint8))

    def might_contain_many(self, keys: np.ndarray) -> np.ndarray:
        p1, p2 = self._positions(keys)
        b1 = (self.bits[(p1 >> np.uint64(3)).astype(np.int64)]
              >> (p1 & np.uint64(7)).astype(np.uint8)) & 1
        b2 = (self.bits[(p2 >> np.uint64(3)).astype(np.int64)]
              >> (p2 & np.uint64(7)).astype(np.uint8)) & 1
        return (b1 & b2).astype(bool)


class SeenShard:
    """Exact 128-bit membership with cuckoo fast path and bloom-guarded
    sorted spill runs (see module docstring). The hot tier is a list of
    appended numpy chunks with a lazily built lexsorted cache — no
    per-key Python objects anywhere on the add path. ``len()`` counts
    keys as added (callers pass pre-deduplicated batches — the engine's
    gate and ``contains_and_add`` guarantee it; a task-retry re-add can
    only inflate this metric, never membership answers)."""

    def __init__(self, capacity_hint: int = 1 << 16, hot_limit: int = 1 << 18):
        self.cuckoo = CuckooFilter(capacity_hint)
        self.hot_chunks: list = []       # [(h1 np.int64, h2 np.int64)]
        self.hot_rows = 0
        self._hot_cache = None           # lexsorted (s1, s2) or None
        self.runs: list = []             # [(sorted_h1, h2_parallel, bloom)]
        self.hot_limit = hot_limit
        self.n = 0

    # -- sorted-pair membership helper -----------------------------------

    @staticmethod
    def _pairs_in_sorted(s1, s2, h1, h2, out, todo) -> None:
        """Mark ``out`` True for (h1,h2) pairs present in the lexsorted
        (s1,s2); only rows where ``todo`` is True are probed."""
        idx = np.nonzero(todo)[0]
        if not idx.size:
            return
        lo = np.searchsorted(s1, h1[idx], side="left")
        hi = np.searchsorted(s1, h1[idx], side="right")
        hit_rows = np.nonzero(hi > lo)[0]
        for r in hit_rows:           # rows whose h1 exists (rare for cold)
            j = idx[r]
            a, b = int(lo[r]), int(hi[r])
            p = a + int(np.searchsorted(s2[a:b], h2[j]))
            if p < b and s2[p] == h2[j]:
                out[j] = True
                todo[j] = False

    def _hot_sorted(self):
        if self._hot_cache is None and self.hot_chunks:
            a1 = np.concatenate([c[0] for c in self.hot_chunks])
            a2 = np.concatenate([c[1] for c in self.hot_chunks])
            order = np.lexsort((a2, a1))
            self._hot_cache = (a1[order], a2[order])
        return self._hot_cache

    def _exact_contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        out = np.zeros(len(h1), dtype=bool)
        todo = np.ones(len(h1), dtype=bool)
        hot = self._hot_sorted()
        if hot is not None:
            self._pairs_in_sorted(hot[0], hot[1], h1, h2, out, todo)
        for s1, s2, bloom in self.runs:
            if not todo.any():
                break
            idx = np.nonzero(todo)[0]
            maybe = bloom.might_contain_many(h1[idx].view(np.uint64))
            cand = idx[maybe]
            if cand.size == 0:
                continue
            sub = np.zeros(len(h1), dtype=bool)
            subtodo = np.zeros(len(h1), dtype=bool)
            subtodo[cand] = True
            self._pairs_in_sorted(s1, s2, h1, h2, sub, subtodo)
            out |= sub
            todo &= ~sub
        return out

    def contains_many(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        h1 = np.asarray(h1, dtype=np.int64)
        h2 = np.asarray(h2, dtype=np.int64)
        maybe = self.cuckoo.contains_many(h1.view(np.uint64))
        out = np.zeros(len(h1), dtype=bool)
        if maybe.any():
            idx = np.nonzero(maybe)[0]
            out[idx] = self._exact_contains(h1[idx], h2[idx])
        return out

    def add_many(self, h1: np.ndarray, h2: np.ndarray) -> None:
        h1 = np.asarray(h1, dtype=np.int64)
        h2 = np.asarray(h2, dtype=np.int64)
        if self.cuckoo.count + len(h1) > self.cuckoo.n_buckets * 4 * 0.9:
            # rebuild the cuckoo filter at 2x from the exact tier
            snap = self.snapshot()
            bigger = CuckooFilter(max((self.cuckoo.n_buckets * 4) * 2,
                                      len(snap["h1"]) + len(h1)))
            if len(snap["h1"]):
                bigger.add_many(snap["h1"].view(np.uint64))
            self.cuckoo = bigger
        self.cuckoo.add_many(h1.view(np.uint64))
        self.hot_chunks.append((h1.copy(), h2.copy()))
        self.hot_rows += len(h1)
        self._hot_cache = None
        self.n += len(h1)
        if self.hot_rows > self.hot_limit:
            self._compact()

    def contains_and_add(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Returns mask of NEW keys; adds them. Duplicates WITHIN the call
        resolve first-occurrence-wins (deterministic in input order)."""
        h1 = np.asarray(h1, dtype=np.int64)
        h2 = np.asarray(h2, dtype=np.int64)
        seen = self.contains_many(h1, h2)
        new = np.zeros(len(h1), dtype=bool)
        cand = np.nonzero(~seen)[0]
        if cand.size:
            # first occurrence per (h1,h2) pair wins, in input order:
            # lexsort with the original index as the last tie-break key
            o = np.lexsort((cand, h2[cand], h1[cand]))
            ch1, ch2, ci = h1[cand][o], h2[cand][o], cand[o]
            first = np.ones(len(ci), dtype=bool)
            first[1:] = (np.diff(ch1) != 0) | (ch2[1:] != ch2[:-1])
            new[ci[first]] = True
        if new.any():
            self.add_many(h1[new], h2[new])
        return new

    def _compact(self) -> None:
        hot = self._hot_sorted()
        if hot is None:
            return
        s1, s2 = hot
        # vectorized dedup of the sorted chunk (retry re-adds collapse)
        if len(s1):
            keep = np.ones(len(s1), dtype=bool)
            keep[1:] = (np.diff(s1) != 0) | (s2[1:] != s2[:-1])
            self.n -= int((~keep).sum())
            s1, s2 = s1[keep], s2[keep]
        bloom = BloomFilter(max(1, len(s1)))
        bloom.add_many(s1.view(np.uint64))
        self.runs.append((np.ascontiguousarray(s1),
                          np.ascontiguousarray(s2), bloom))
        self.hot_chunks = []
        self.hot_rows = 0
        self._hot_cache = None
        # size-tiered merging (LSM-style): repeatedly merge the two
        # smallest runs — amortized O(N log N) total merge work, unlike a
        # merge-everything policy which is quadratic in the long run
        while len(self.runs) > 8:
            self.runs.sort(key=lambda r: len(r[0]))
            a = self.runs.pop(0)
            b = self.runs.pop(0)
            a1 = np.concatenate([a[0], b[0]])
            a2 = np.concatenate([a[1], b[1]])
            order = np.lexsort((a2, a1))
            s1, s2 = a1[order], a2[order]
            bloom = BloomFilter(len(s1))
            bloom.add_many(s1.view(np.uint64))
            self.runs.append((s1, s2, bloom))

    def __len__(self) -> int:
        return self.n

    def snapshot(self) -> dict:
        """Checkpointable state: exact keys only (filters are rebuilt)."""
        parts1 = [r[0] for r in self.runs]
        parts2 = [r[1] for r in self.runs]
        hot = self._hot_sorted()
        if hot is not None:
            parts1.append(hot[0])
            parts2.append(hot[1])
        h1 = np.concatenate(parts1) if parts1 else np.empty(0, np.int64)
        h2 = np.concatenate(parts2) if parts2 else np.empty(0, np.int64)
        return {"h1": h1, "h2": h2}

    @classmethod
    def restore(cls, snap: dict) -> "SeenShard":
        obj = cls(capacity_hint=max(1 << 16, len(snap["h1"]) * 2))
        if len(snap["h1"]):
            obj.add_many(snap["h1"], snap["h2"])
        return obj
