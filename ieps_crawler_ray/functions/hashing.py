"""Hashing primitives.

* ``content_hash`` — hex-UPPERCASE SHA-256 of a text payload, the analog of
  the reference's ``HashGenerator.generateSHA256``
  (``/root/reference/src/main/scala/com/ieps/crawler/utils/HashGenerator.scala:7-15``),
  used for content-duplicate detection (``CrawlerDIO.scala:82-86`` analog).
* ``url_hash128`` — (h1, h2) two signed int64s from SHA-256 of the canonical
  URL. h1 is the partition / shard key (cuckoo fingerprint source); (h1, h2)
  together are the 128-bit exact identity used by the seen-set so URL-set
  parity holds even at 10^10 keys (64-bit would see birthday collisions).
* vectorized batch helpers returning numpy arrays for Arrow columns.
"""

from __future__ import annotations

import hashlib

import numpy as np


def content_hash(text: str) -> str:
    """Hex SHA-256, uppercased (HashGenerator.scala:10)."""
    return hashlib.sha256(text.encode("utf-8", "surrogatepass")).hexdigest().upper()


def url_hash128(url: str) -> tuple[int, int]:
    d = hashlib.sha256(url.encode("utf-8", "surrogatepass")).digest()
    h1 = int.from_bytes(d[0:8], "big", signed=True)
    h2 = int.from_bytes(d[8:16], "big", signed=True)
    return h1, h2


def url_hash128_many(urls) -> tuple[np.ndarray, np.ndarray]:
    n = len(urls)
    h1 = np.empty(n, dtype=np.int64)
    h2 = np.empty(n, dtype=np.int64)
    sha = hashlib.sha256
    for i, u in enumerate(urls):
        d = sha(u.encode("utf-8", "surrogatepass")).digest()
        h1[i] = int.from_bytes(d[0:8], "big", signed=True)
        h2[i] = int.from_bytes(d[8:16], "big", signed=True)
    return h1, h2


def content_hash_many(texts) -> list:
    sha = hashlib.sha256
    return [
        None if t is None else sha(t.encode("utf-8", "surrogatepass")).hexdigest().upper()
        for t in texts
    ]


def rolling_fingerprint(text: str, window: int = 16, mod_sel: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprint: Karp-Rabin rolling hashes over
    byte windows, keeping hashes ≡ 0 (mod 2**mod_sel). Vectorized numpy.
    Returns the sorted unique selected fingerprints as uint64."""
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if b.size < window:
        h = np.uint64(5381)
        for x in b.tolist():
            h = np.uint64((int(h) * 33 + x) & 0xFFFFFFFFFFFFFFFF)
        return np.array([h], dtype=np.uint64)
    base = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        pw = np.ones(window, dtype=np.uint64)
        for i in range(window - 2, -1, -1):
            pw[i] = pw[i + 1] * base
        # windows matrix via strides
        n = b.size - window + 1
        idx = np.arange(window)[None, :] + np.arange(n)[:, None]
        hashes = (b[idx].astype(np.uint64) * pw[None, :]).sum(axis=1)
    mask = (hashes & np.uint64((1 << mod_sel) - 1)) == 0
    sel = hashes[mask] if mask.any() else hashes[:1]
    return np.unique(sel)
