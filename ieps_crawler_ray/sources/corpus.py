"""Deterministic image+caption corpus (FIXTURES.md F1 / BASELINE.json input_hint).

Schema (exact): (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64). Written as a Parquet dataset — the stand-in for
a Lance table in this environment (no ``lance`` wheel is available); the
layout keeps one row group per ~1k rows so readers can range-scan.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import image_codec as ic

CORPUS_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])

_FMT_CYCLE = ("png", "jpeg", "bmp")

_VOCAB = ("municipal park statue river bridge archive library portal form "
          "permit notice map office festival school museum road census "
          "ministry garden").split()


def caption_for(idx: int, seed: int = 42) -> str:
    rng = np.random.default_rng((seed << 16) ^ idx)
    words = rng.choice(len(_VOCAB), size=5, replace=True)
    return f"caption of img{idx:08d}: " + " ".join(_VOCAB[int(w)] for w in words)


# process-level memo: the procedural generate+encode+phash loop is
# ~6 ms/image of serial driver work, and a contract/bench process calls
# build_corpus_rows once per image query — the table is immutable, so
# cache it per parameter tuple (bounded: corpora are <= a few thousand
# rows of <= 50 KiB blobs; distinct tuples per process are ~1-2)
_ROWS_CACHE: dict = {}


def build_corpus_rows(n: int, seed: int = 42, start: int = 0,
                      min_size: int = 32, max_size: int = 128) -> pa.Table:
    key = (n, seed, start, min_size, max_size)
    cached = _ROWS_CACHE.get(key)
    if cached is not None:
        return cached
    out = _build_corpus_rows(n, seed, start, min_size, max_size)
    if len(_ROWS_CACHE) >= 4:
        _ROWS_CACHE.clear()
    _ROWS_CACHE[key] = out
    return out


def _build_corpus_rows(n: int, seed: int = 42, start: int = 0,
                       min_size: int = 32, max_size: int = 128) -> pa.Table:
    ids, blobs, ws, hs, fmts, caps, phashes = [], [], [], [], [], [], []
    for idx in range(start, start + n):
        img = ic.procedural_image(idx, seed=seed,
                                  min_size=min_size, max_size=max_size)
        fmt = _FMT_CYCLE[idx % 3]
        data = ic.encode_image(img, fmt)
        if fmt == "jpeg":
            # golden phash is of the DECODED pixels (what a consumer of the
            # stored bytes can reproduce; lossy roundtrip shifts a few bits)
            img = ic.decode_qjpg(data)
        ids.append(f"img{idx:08d}")
        blobs.append(data)
        hs.append(img.shape[0])
        ws.append(img.shape[1])
        fmts.append(fmt)
        caps.append(caption_for(idx, seed))
        phashes.append(ic.phash64(img))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    }, schema=CORPUS_SCHEMA)


def write_corpus(path: str, n: int, seed: int = 42) -> str:
    """Write the corpus table via sources/table_io: the path SUFFIX
    picks the backend (``.lance`` -> Lance when the wheel is present,
    else NotImplementedError; anything else -> parquet stand-in)."""
    from .table_io import write_table

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tbl = build_corpus_rows(n, seed)
    return write_table(tbl, path, row_group_size=1024)


def load_corpus(path: str) -> pa.Table:
    from .table_io import read_table

    return read_table(path)
