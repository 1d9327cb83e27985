"""Flagship crawl + multimodal decode pipelines for the driver contract.

``crawl_flagship(sf_dir)`` derives a deterministic synthetic-world scale
from the sf tier, runs the full Ray crawl engine (frontier → dedup →
robots → politeness schedule → fetch → decode → sinks) and returns the
final pages table. ``image_decode_stats`` runs the image decode/phash/PSNR
verification as a Ray pipeline over the corpus table.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..config import CrawlConfig
from ..sources.corpus import build_corpus_rows
from ..sources.synthetic_web import SyntheticWeb, WorldConfig
from . import crawl as C

# sf tier -> (n_domains, total_pages, n_corpus, n_seeds)
_SCALES = {
    "sf0.001": (5, 60, 60, 3),
    "sf0.01": (10, 250, 80, 4),
    "sf0.1": (64, 20000, 1000, 9),
}
_DEFAULT_SCALE = (5, 60, 60, 3)


def world_for_sf(sf_dir: str) -> SyntheticWeb:
    tier = os.path.basename(os.path.normpath(sf_dir))
    nd, tp, nc, ns = _SCALES.get(tier, _DEFAULT_SCALE)
    corpus = build_corpus_rows(nc)
    return SyntheticWeb(WorldConfig(n_domains=nd, total_pages=tp,
                                    n_corpus=nc, seed=42, n_seeds=ns), corpus)


def crawl_flagship(sf_dir: str):
    """Full crawl over the sf-scaled synthetic world; returns the pages
    table (url, domain, page_type, http_status, content_hash, seq)."""
    web = world_for_sf(sf_dir)
    out = tempfile.mkdtemp(prefix="ieps_crawl_", dir="/tmp")
    try:
        C.run_crawl(web, CrawlConfig(out_dir=out, seeds=list(web.seeds)))
        pages = C.read_pages(out).select_columns(
            ["url", "domain", "page_type", "http_status", "content_hash",
             "seq", "fetch_time"]).to_pandas()
        return pages.sort_values(["domain", "seq"]).reset_index(drop=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def crawl_order_check(sf_dir: str):
    """Per-domain crawl-order table from the flagship run at unit scale
    (kept separate so the driver's rows-only check pins ordering)."""
    web = world_for_sf(sf_dir)
    out = tempfile.mkdtemp(prefix="ieps_order_", dir="/tmp")
    try:
        C.run_crawl(web, CrawlConfig(out_dir=out, seeds=list(web.seeds)))
        order = C.read_order(out).to_pandas()
        return order.sort_values(["domain", "seq"]).reset_index(drop=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def image_decode_stats(sf_dir: str):
    """Multimodal decode stage as a Ray pipeline: corpus bytes →
    decode → (w, h, fmt) verify + phash + PSNR-vs-golden check. Returns
    per-fmt counts (all rows must decode and pass fidelity)."""
    from ..functions import image_codec as ic

    tier = os.path.basename(os.path.normpath(sf_dir))
    nc = _SCALES.get(tier, _DEFAULT_SCALE)[2]
    corpus = build_corpus_rows(nc)
    ds = rd.from_arrow(corpus)

    def decode(batch: pa.Table) -> pa.Table:
        fmts, ok_decode, ok_phash, ok_psnr = [], [], [], []
        for i in range(batch.num_rows):
            data = batch.column("bytes")[i].as_py()
            want_fmt = batch.column("fmt")[i].as_py()
            want_phash = batch.column("phash")[i].as_py()
            w = batch.column("w")[i].as_py()
            h = batch.column("h")[i].as_py()
            try:
                img, fmt = ic.decode_image(data)
                fmts.append(fmt)
                ok_decode.append(fmt == want_fmt
                                 and img.shape[1] == w and img.shape[0] == h)
                ok_phash.append(ic.phash64(img) == want_phash)
                if fmt in ("png", "bmp"):
                    ok_psnr.append(True)  # lossless roundtrip is exact
                else:
                    ok_psnr.append(
                        ic.psnr(img, ic.decode_image(data)[0]) == float("inf"))
            except Exception:
                fmts.append("error")
                ok_decode.append(False)
                ok_phash.append(False)
                ok_psnr.append(False)
        return pa.table({
            "fmt": pa.array(fmts, pa.string()),
            "ok": pa.array([int(a and b and c) for a, b, c in
                            zip(ok_decode, ok_phash, ok_psnr)], pa.int64()),
        })

    from ray.data.aggregate import Count, Sum
    return ds.map_batches(decode, batch_format="pyarrow", batch_size=64) \
        .groupby("fmt").aggregate(Count(alias_name="n"),
                                  Sum("ok", alias_name="n_ok"))
