"""Microbench: vectorized partition semi-join vs the per-key map_groups
it replaced (VERDICT r2 item 4).

Both plans have the identical one-shuffle exchange shape; the difference
is group granularity — per-key pandas calls (old) vs P hash partitions
each probed with one vectorized ``isin`` (new, ``crawl._semi_keep``).

    python scripts/bench_semi_keep.py [n_edges]
"""
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

sys.path.insert(0, ".")
from ieps_crawler_ray.pipelines import crawl as C  # noqa: E402


def make_inputs(n_edges: int, n_urls: int):
    rng = np.random.default_rng(1)
    urls = np.array([f"http://d{i % 97}.si/p{i}" for i in range(n_urls)],
                    dtype=object)
    src = urls[rng.integers(0, n_urls, n_edges)]
    dst = urls[rng.integers(0, n_urls, n_edges)]
    stored = urls[: n_urls // 2]
    edges = rd.from_arrow(pa.table({
        "parent_url": pa.array(src, pa.string()),
        "url": pa.array(dst, pa.string())})).materialize()
    pages = rd.from_arrow(pa.table({
        "url": pa.array(stored, pa.string())})).materialize()
    return edges, pages


def semi_keep_per_key(edges, key_col, page_urls):
    """The replaced plan: groupby on the RAW key, one pandas call per key."""
    other_col = "url" if key_col == "parent_url" else "parent_url"

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table({"k": b.column(key_col),
                         "other": b.column(other_col),
                         "is_key": pa.array(
                             np.zeros(b.num_rows, dtype=bool))})

    def tag_keys(b: pa.Table) -> pa.Table:
        return pa.table({"k": b.column("url"),
                         "other": pa.nulls(b.num_rows, pa.string()),
                         "is_key": pa.array(
                             np.ones(b.num_rows, dtype=bool))})

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        e = g[~g["is_key"]] if g["is_key"].any() else g.iloc[0:0]
        return pd.DataFrame({key_col: e["k"], other_col: e["other"]})

    u = edges.map_batches(tag_edges, batch_format="pyarrow").union(
        page_urls.map_batches(tag_keys, batch_format="pyarrow"))
    return u.groupby("k").map_groups(keep, batch_format="pandas")


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    rd.DataContext.get_current().enable_progress_bars = False
    edges, pages = make_inputs(n_edges, n_edges // 4)

    def run(fn):
        best = float("inf")
        rows = None
        for _ in range(3):
            t0 = time.time()
            out = fn(edges, "parent_url", pages).materialize()
            best = min(best, time.time() - t0)
            rows = out.count()
        return best, rows

    t_new, n_new = run(C._semi_keep)
    t_old, n_old = run(semi_keep_per_key)
    assert n_new == n_old, (n_new, n_old)
    print({"n_edges": n_edges, "rows": n_new,
           "per_key_sec": round(t_old, 2),
           "partitioned_sec": round(t_new, 2),
           "speedup": round(t_old / t_new, 1)})
    ray.shutdown()


if __name__ == "__main__":
    main()
