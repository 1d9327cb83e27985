"""Unit tests for the ML-data-prep operators (mlprep.py): CMS heavy
hitters, integer-quantized k-means, SemDeDup. The SQL-oracle hash
compare is the primary check (scripts/check_contract.py); these tests
pin the sketch/cluster semantics against independent local recomputes
and exercise the bounded-memory chunking path."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ieps_crawler_ray.pipelines import mlprep as M

SF = "/root/testdata/sf0.001"


def _exact_bigram_counts() -> Counter:
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    c = Counter()
    for s in t.column("text").to_pylist():
        toks = re.findall(r"\w+", s.lower())
        c.update(toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1))
    return c


def test_cms_estimates_dominate_exact(ray_session):
    out = M.corpus_heavy_hitters_cms(SF)
    exact = _exact_bigram_counts()
    assert len(out) == M._CMS_TOPK
    # CMS never underestimates; estimates are exact when no row collides
    for tok, est in zip(out["token"], out["est"]):
        assert est >= exact[tok] > 0
    # ordering contract: est desc, token asc
    key = list(zip(-out["est"], out["token"]))
    assert key == sorted(key)


def _local_kmeans(k: int, iterations: int) -> pd.DataFrame:
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas() \
        .sort_values("vec_id")
    E = np.stack(t["embedding"].to_numpy())
    Q = M._quantize(E)
    ids = t["vec_id"].to_numpy()
    C = Q[ids < k]  # t is sorted by vec_id → rows already in id order
    for _ in range(iterations):
        a = M._assign(Q, C)
        newC = C.copy()
        for c in range(k):
            sel = a == c
            if sel.any():
                newC[c] = np.floor(
                    Q[sel].sum(axis=0).astype(np.float64) / sel.sum()
                    + 0.5).astype(np.int64)
        C = newC
    return pd.DataFrame({"vec_id": ids, "cluster": M._assign(Q, C)})


def test_kmeans_matches_local_lloyd(ray_session):
    got = M.embedding_kmeans(SF).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    want = _local_kmeans(M._KM_K, M._KM_ITERS) \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"cluster": "int64"}),
        want.astype({"cluster": "int64"}))


def test_semdedup_drops_planted_companions(ray_session):
    out = M.embedding_semdedup(SF).to_pandas()
    planted = out[out["vec_id"] >= 1_000_000]
    originals = out[out["vec_id"] < 1_000_000]
    assert len(planted) > 0
    # every planted companion is dominated by its (smaller-id) original;
    # raw synthetic vectors have max pairwise cosine ~0.51 << 0.99
    assert not planted["kept"].any()
    assert originals["kept"].all()


def test_semdedup_chunked_verify_parity(ray_session, monkeypatch):
    base = M.embedding_semdedup(SF).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    monkeypatch.setattr(M, "_SDD_CHUNK", 3)
    chunked = M.embedding_semdedup(SF).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, chunked)


def test_semdedup_degenerate_single_cluster(ray_session, tmp_path):
    """VERDICT r3 item 1: a corpus where every vector is within tau of
    every other (k-means collapses it into one tight cluster) must
    still run with bounded per-task memory — the triangular chunk-join
    gives >8 pair tasks, no task holds more than 2×task_rows rows —
    and stay EXACT vs (a) a brute-force O(n²) recompute and (b) the
    single-chunk plan (task_rows=∞ ≡ the old one-task-per-cluster
    kernel)."""
    import pyarrow as pa

    d = tmp_path / "deg"
    d.mkdir()
    n, dim, task_rows = 600, 8, 16
    E = np.zeros((n, dim))
    E[:, 0] = 1.0
    E[:, 1] = 1e-5 * np.arange(n)   # pairwise cosine ≈ 1 >> 0.99
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(E.tolist(), pa.list_(pa.float64()))}),
        str(d / "embeddings.parquet"))

    out = M.embedding_semdedup(str(d), k=8, task_rows=task_rows) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)

    # structural: the dominant cluster spans many chunks → many bounded
    # pair tasks (each sees ≤ 2×task_rows rows), >8-way parallelism
    sizes = out.groupby("cluster").size()
    nchunks = int(-(-sizes.max() // task_rows))
    assert nchunks >= 8
    assert nchunks * (nchunks + 1) // 2 > 8

    # exactness (a): brute-force recompute of the planted quantized set
    Q = M._quantize(E)
    ids = np.arange(n, dtype=np.int64)
    sel = ids % 20 == 0
    Ep = E[sel].copy()
    Ep[:, 0] += 0.01
    Q = np.concatenate([Q, M._quantize(Ep)])
    ids = np.concatenate([ids, ids[sel] + 1_000_000])
    order = np.argsort(ids)
    Q, ids = Q[order], ids[order]
    cl = out.set_index("vec_id")["cluster"]
    want_kept = {}
    for i in range(len(ids)):
        dom = False
        for j in range(len(ids)):
            if ids[j] >= ids[i] or cl[ids[j]] != cl[ids[i]]:
                continue
            dot = float(Q[i].astype(np.float64) @ Q[j].astype(np.float64))
            na = float(Q[i].astype(np.float64) @ Q[i].astype(np.float64))
            nb = float(Q[j].astype(np.float64) @ Q[j].astype(np.float64))
            if dot > 0 and (dot * dot) * M._SDD_TAU_DEN >= \
                    (na * nb) * M._SDD_TAU_NUM:
                dom = True
                break
        want_kept[ids[i]] = not dom
    assert out["kept"].tolist() == [want_kept[v] for v in out["vec_id"]]
    # in this world only the smallest id of each cluster survives
    assert int(out["kept"].sum()) == out["cluster"].nunique()

    # exactness (b): single-chunk plan parity
    single = M.embedding_semdedup(str(d), k=8, task_rows=10**9) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, single)


def test_pq_matches_local_recompute(ray_session):
    got = M.knn_pq_adc(SF).sort_values(["query_id", "rank"]) \
        .reset_index(drop=True)
    # local replay: same init, same integer Lloyd, same ADC scoring
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas() \
        .sort_values("vec_id")
    Q = M._quantize(np.stack(t["embedding"].to_numpy()))
    ids = t["vec_id"].to_numpy()
    m, k, sub = M._PQ_M, M._PQ_K, Q.shape[1] // M._PQ_M
    books = np.stack([Q[ids < k][:, s * sub:(s + 1) * sub]
                      for s in range(m)])
    for _ in range(M._PQ_ITERS):
        new = books.copy()
        for s in range(m):
            Qs = Q[:, s * sub:(s + 1) * sub]
            a = M._assign(Qs, books[s])
            for c in range(k):
                sel = a == c
                if sel.any():
                    new[s, c] = np.floor(
                        Qs[sel].sum(axis=0).astype(np.float64)
                        / sel.sum() + 0.5).astype(np.int64)
        books = new
    dbm = ids >= M._PQ_NQ
    rows = []
    for qid in range(M._PQ_NQ):
        qv = Q[ids == qid][0]
        ad = np.zeros(dbm.sum(), dtype=np.int64)
        for s in range(m):
            Qs = Q[dbm][:, s * sub:(s + 1) * sub]
            codes = M._assign(Qs, books[s])
            qs = qv[s * sub:(s + 1) * sub].astype(np.float64)
            B = books[s].astype(np.float64)
            lut = ((qs * qs).sum() - 2.0 * (B @ qs)
                   + (B * B).sum(axis=1)).astype(np.int64)
            ad += lut[codes]
        order = np.lexsort((ids[dbm], ad))[:M._PQ_TOPK]
        for rank, c in enumerate(order, 1):
            rows.append((qid, rank, int(ids[dbm][c]), int(ad[c])))
    want = pd.DataFrame(
        rows, columns=["query_id", "rank", "neighbor_id", "adist"])
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


def test_cms_cells_in_range():
    cells = M._cms_cells(np.array([0, 1, 2**32 - 1], dtype=np.uint64))
    assert cells.shape == (M._CMS_D, 3)
    assert (cells >= 0).all() and (cells < M._CMS_W).all()


def test_bpe_learn_planted_merges(ray_session, tmp_path):
    """On a corpus dominated by one word, the first merges must build
    that word's most frequent character pairs, and each round's count
    reflects the delimited-string semantics shared with the oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ieps_crawler_ray.pipelines.mlprep import corpus_bpe_learn

    d = tmp_path / "bpe"
    d.mkdir()
    docs = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(["the the the cat", "the the dog",
                          "the cat sat", "the dog ran"], pa.string())})
    pq.write_table(docs, str(d / "documents.parquet"))
    out = corpus_bpe_learn(str(d), iterations=3)
    assert len(out) == 3
    # 'the' is the most frequent word: first merge must come from it
    assert out.iloc[0]["pair"] in ("t h", "h e")
    assert (out["merged_count"] > 0).all()
    assert out["iteration"].tolist() == [1, 2, 3]


def test_pca_power_matches_local_recompute(ray_session):
    """embedding_pca_power vs a pure-python-int replay of the protocol."""
    got = M.embedding_pca_power(SF).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas() \
        .sort_values("vec_id")
    Q = M._quantize(np.stack(t["embedding"].to_numpy()))
    G = [[sum(int(Q[r, i]) * int(Q[r, j]) for r in range(len(Q)))
          for j in range(Q.shape[1])] for i in range(Q.shape[1])]
    v = [M._PCA_SCALE] + [0] * (Q.shape[1] - 1)
    for _ in range(M._PCA_ITERS):
        u = [sum(G[i][j] * v[j] for j in range(len(v)))
             for i in range(len(v))]
        m = max(max(abs(x) for x in u), 1)
        v = [(x * M._PCA_SCALE) // m if x >= 0
             else -((-x * M._PCA_SCALE) // m) for x in u]
    want = pd.DataFrame({
        "vec_id": t["vec_id"].to_numpy(),
        "pc1_score": [sum(int(Q[r, i]) * v[i]
                          for i in range(len(v)))
                      for r in range(len(Q))]})
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))
    # the dominant direction must separate vectors (non-constant scores)
    assert got["pc1_score"].nunique() > 1
