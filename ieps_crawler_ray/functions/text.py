"""Text-analysis kernels for the training-data pipeline operators:
tokenization, quality scoring, language-ID heuristic, SimHash, MinHash.

All batch-level and vectorized where the computation allows; per-document
python loops only where the algorithm is inherently per-document (hashing
of token sets), run inside map_batches tasks.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# Tiny per-language stopword profiles for the heuristic language ID. The
# synthetic `documents` table draws from an English-ish vocabulary with a
# random `lang` label, so this is a *mechanism* demonstration: frequencies
# of marker words vote for a language.
_LANG_MARKERS = {
    "en": {"the", "a", "and", "of", "to", "in"},
    "es": {"el", "la", "de", "que", "y", "los"},
    "de": {"der", "die", "und", "das", "ist", "ein"},
    "fr": {"le", "la", "et", "les", "des", "une"},
    "zh": set(),  # no-latin-marker fallback
}


def arrow_tokens(texts, lower: bool = True):
    """Vectorized ``TOKEN_RE``-equivalent tokenizer over an Arrow string
    array: one RE2 ``\\W+`` split pass in C++, no per-document python
    loop. Returns ``(tokens, parent_indices)`` — the flattened non-empty
    token array and, for each token, the row index of the document it
    came from (order-preserving within a document, so consecutive
    entries with equal parent are consecutive tokens).

    SEMANTICS NOTE: RE2's ``\\w`` is ASCII ``[0-9A-Za-z_]`` while
    python ``re.UNICODE`` ``\\w`` also matches non-ASCII word chars; on
    the all-ASCII corpus the two agree exactly, and the DuckDB oracles
    tokenize with RE2 as well (``regexp_extract_all('\\w+')``), so the
    arrow path matches the ORACLE's semantics even where python's
    would diverge on non-ASCII input."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if lower:
        texts = pc.utf8_lower(texts)
    lists = pc.split_pattern_regex(texts, r"\W+")
    toks = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists)
    keep = pc.not_equal(toks, "")
    return toks.filter(keep), parent.filter(keep)


def tokens(text: str) -> list:
    return TOKEN_RE.findall(text)


def token_count(text: str) -> int:
    return len(TOKEN_RE.findall(text))


def quality_metrics(text: str) -> dict:
    toks = TOKEN_RE.findall(text)
    return {
        "n_words": len(toks),
        "n_uniq_words": len(set(toks)),
        "max_word_len": max((len(t) for t in toks), default=0),
    }


def lang_id(text: str) -> str:
    toks = set(t.lower() for t in TOKEN_RE.findall(text))
    best, best_n = "en", -1
    for lang, markers in _LANG_MARKERS.items():
        n = len(toks & markers)
        if n > best_n:
            best, best_n = lang, n
    return best


def _h64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8", "surrogatepass"),
                        digest_size=8).digest(), "big")


def _h64_md5(s: str) -> int:
    """64-bit token hash matching DuckDB's ``md5_number_lower`` (bytes
    8..16 of the MD5 digest, little-endian) — lets the SimHash SQL oracle
    recompute identical codes."""
    return int.from_bytes(
        hashlib.md5(s.encode("utf-8", "surrogatepass")).digest()[8:16],
        "little")


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over distinct word features. Token hash is
    md5-derived (``_h64_md5``) so a SQL engine can recompute the codes
    bit-for-bit: code bit k = sign of the +/-1 vote sum over bit k of
    each distinct token's hash."""
    toks = TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    bits = np.arange(64, dtype=np.uint64)
    for t in set(toks):
        h = np.uint64(_h64_md5(t))
        b = ((h >> bits) & np.uint64(1)).astype(np.int64)
        acc += 2 * b - 1
    code = int(((acc > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum())
    if code >= 1 << 63:
        code -= 1 << 64
    return code


def char_shingles(text: str, k: int = 3) -> set:
    s = text.lower()
    return {s[i:i + k] for i in range(max(0, len(s) - k + 1))}


def word_shingles(text: str, k: int = 3) -> set:
    toks = TOKEN_RE.findall(text.lower())
    return {" ".join(toks[i:i + k]) for i in range(max(0, len(toks) - k + 1))}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


_MINHASH_PRIME = (1 << 61) - 1


def minhash_params(num_perm: int = 64, seed: int = 7):
    """a < 2^30 and 32-bit shingle hashes keep a*x + b < 2^63, so the
    permutation math stays in native int64 (no Python bigints)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 30, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MINHASH_PRIME, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingles: set, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide MinHash signature (uint64), fully vectorized:
    crc32 shingle hashes x int64 modular permutations."""
    import zlib

    if not shingles:
        return np.zeros(len(a), dtype=np.uint64)
    hv = np.fromiter((zlib.crc32(s.encode("utf-8", "surrogatepass"))
                      for s in shingles), dtype=np.int64, count=len(shingles))
    vals = (hv[:, None] * a[None, :] + b[None, :]) % _MINHASH_PRIME
    return vals.min(axis=0).astype(np.uint64)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list:
    """Split the signature into bands; key = (band_idx, hash(band_rows))."""
    rows = len(sig) // bands
    out = []
    for bi in range(bands):
        chunk = sig[bi * rows:(bi + 1) * rows]
        h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
        out.append((bi, int.from_bytes(h, "big", signed=True)))
    return out


# BPE-ish pre-tokenizer (GPT-2 style word/number/punct splitting with
# leading-space attachment). ASCII classes only so the same pattern runs
# verbatim in other regex engines (e.g. DuckDB's RE2 for the oracle).
BPE_ISH_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+")
BPE_ISH_PATTERN_SQL = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9[:space:]]+"


def bpe_ish_token_count(text: str) -> int:
    return len(BPE_ISH_RE.findall(text))


def simhash_band_keys(code: int, bands: int = 4) -> list:
    """Split a 64-bit SimHash into ``bands`` chunks; near-duplicates
    (small Hamming distance) collide on at least one chunk."""
    u = code & ((1 << 64) - 1)
    width = 64 // bands
    mask = (1 << width) - 1
    return [(bi, (u >> (bi * width)) & mask) for bi in range(bands)]


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def batch_word_counts(texts) -> dict:
    """Per-batch word-frequency Counter over the repo's shared token
    convention (``\\w+`` on ``lower()``) — the ONE kernel behind every
    vocab-bounded word-count partial (unigram LM, BPE learning)."""
    from collections import Counter
    c = Counter()
    for t in texts:
        c.update(TOKEN_RE.findall(t.lower()))
    return c
