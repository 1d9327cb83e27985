"""ML-data-prep operators (round-3 extensions): sketch-based heavy
hitters, distributed k-means over embeddings, and SemDeDup-style
semantic deduplication.

- ``corpus_heavy_hitters_cms`` — count-min-sketch heavy hitters over
  corpus word BIGRAMS (Cormode & Muthukrishnan 2005). The sketch is the
  ONLY global state: per-batch counts are folded into a fixed d×w
  counter grid (d=4 rows, w=2048 cells — 8 KiB regardless of corpus
  size), merged with one bounded groupby, and broadcast back for the
  estimate pass. Candidates are each block's LOCAL distinct bigrams —
  probed in place against the broadcast sketch with a per-block top-k,
  so no token-keyed exchange ever happens (driver merges ≤ blocks×k
  rows; see the function docstring for the equivalence proof).
  Output: top-k bigrams by ESTIMATED count (CMS overestimates on
  collisions are part of the semantics; the SQL oracle recomputes the
  identical cell sums, so estimates match bit-exactly — all arithmetic
  is int64).

- ``embedding_kmeans`` — fixed-iteration Lloyd k-means over the
  ``embeddings`` table, INTEGER-QUANTIZED for cross-engine exactness:
  coordinates are fixed-point ints (``floor(x*1e6+0.5)``), so every
  squared distance and every dot product is an integer < 2^53 and is
  EXACT in float64 regardless of summation order — the argmin ties out
  identically in numpy and DuckDB with no rounding-protocol hazard.
  Centroid update rounds back to the integer grid
  (``floor(sum/count + 0.5)``, IEEE-identical in both engines). Scale
  shape: centroids (k×dim) broadcast per iteration; each pass emits
  k×(dim+1) partial-sum rows per block (never the vectors), merged on
  the driver (bounded by blocks×k×dim, not by n).

- ``embedding_semdedup`` — semantic dedup in the SemDeDup shape
  (Abbas et al. 2023: cluster embeddings, then drop in-cluster
  near-duplicates): k-means cluster assignment, then within each
  cluster KEEP a vector iff no SMALLER-id vector in the same cluster
  has cosine >= tau with it ("dominated-by-earlier" — a deterministic,
  SQL-expressible variant of the paper's per-cluster pruning; at scale
  k grows ~n/target_cluster_size so clusters stay bounded, which is
  exactly the paper's regime). The raw synthetic embeddings have no
  near-dup pairs (max off-diagonal cosine ~0.51), so the query plants
  deterministic companions exactly like ``analytics.embedding_neardup``
  (vec_id%20==0 gains id+1_000_000 with coordinate 0 shifted +0.01)
  and the oracle mirrors the derivation. The cosine test is evaluated
  as ``dot>0 AND (dot*dot)*10000 >= (|a|^2*|b|^2)*9801`` (tau=0.99) —
  dot and the squared norms are exact integers in float64, and the two
  final products use the SAME association order in numpy and SQL, so
  the IEEE results are identical.

Reference parity note: ghajduk3/ieps-crawler has no sketch / clustering
stage — these are "beyond the reference" training-data operators from
the graft brief, expressed Ray-Data-first.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import text as T
from .analytics import _part_apply, _part_groupby_agg


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# ---------------------------------------------------------------------------
# BPE-style tokenizer merge learning
# ---------------------------------------------------------------------------

_BPE_ITERS = 5


def corpus_bpe_learn(sf_dir: str, iterations: int = _BPE_ITERS):
    """Distributed BPE-style tokenizer training: learn the top
    ``iterations`` byte-pair merges over the corpus word-frequency
    table (Sennrich et al. 2016 shape). Words are spelled as
    space-delimited character tokens; each round counts every candidate
    adjacent pair across the (vocab-bounded) word table, merges the
    argmax pair (ties to the lexicographically smaller pair) and
    rewrites the spellings.

    Cross-engine contract: pair counting and merge application both use
    DELIMITED-STRING semantics — non-overlapping ``str.count`` /
    ``str.replace`` of ``' a b '`` — which Python and SQL REPLACE
    implement identically (an immediately-repeated pair consumes its
    shared delimiter, slightly conservative vs classic token-wise BPE;
    deterministic and bit-identical in both engines, which is what the
    oracle checks).

    Scale shape: the heavy pass is ONE distributed word count
    (vocab-bounded groupby); each merge round is a map_batches pair
    count over the word table with a small groupby merge — the driver
    sees only the (pair, count) table, bounded by the active pair
    vocabulary (at 100 TB you cap candidates with the CMS sketch
    above). Output: (iteration, pair, merged_count)."""
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])

    def word_counts(batch: pa.Table) -> pa.Table:
        c = T.batch_word_counts(batch.column("text").to_pylist())
        return pa.table({"w": pa.array(list(c.keys()), pa.string()),
                         "c": pa.array(list(c.values()), pa.int64())})

    words = _part_groupby_agg(
        ds.map_batches(word_counts, batch_format="pyarrow"),
        ["w"], {"c": ("c", "sum")})

    def spell(batch: pa.Table) -> pa.Table:
        ss = [" " + " ".join(w) + " "
              for w in batch.column("w").to_pylist()]
        return pa.table({"s": pa.array(ss, pa.string()),
                         "c": batch.column("c")})

    spelled = words.map_batches(spell,
                                batch_format="pyarrow").materialize()
    merges = []
    for it in range(1, iterations + 1):
        def pair_counts(batch: pa.Table) -> pa.Table:
            from collections import Counter
            pc = Counter()
            for s_, c_ in zip(batch.column("s").to_pylist(),
                              batch.column("c").to_pylist()):
                toks = s_.split()
                for a, b in set(zip(toks, toks[1:])):
                    pat = f" {a} {b} "
                    pc[f"{a} {b}"] += s_.count(pat) * c_
            return pa.table({
                "pr": pa.array(list(pc.keys()), pa.string()),
                "n": pa.array(list(pc.values()), pa.int64())})

        cnt = _part_groupby_agg(
            spelled.map_batches(pair_counts, batch_format="pyarrow"),
            ["pr"], {"n": ("n", "sum")}).to_pandas()
        if not len(cnt):
            break
        cnt = cnt.sort_values(["n", "pr"],
                              ascending=[False, True]).iloc[0]
        pr, n = str(cnt["pr"]), int(cnt["n"])
        merges.append((it, pr, n))
        pat, rep = f" {pr} ", " " + pr.replace(" ", "") + " "

        def apply(batch: pa.Table, pat=pat, rep=rep) -> pa.Table:
            ss = [s_.replace(pat, rep)
                  for s_ in batch.column("s").to_pylist()]
            return pa.table({"s": pa.array(ss, pa.string()),
                             "c": batch.column("c")})

        spelled = spelled.map_batches(
            apply, batch_format="pyarrow").materialize()
    return pd.DataFrame(merges,
                        columns=["iteration", "pair", "merged_count"])


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 2048
_CMS_P = 2147483647          # 2^31 - 1 (Mersenne prime)
_CMS_A = [293339, 591893, 917503, 374321]   # < 2^20: a*x < 2^52, exact
_CMS_B = [12345, 67891, 24683, 98765]
_CMS_TOPK = 64


def _cms_cells(x: np.ndarray) -> np.ndarray:
    """(d, n) cell index per row for 32-bit keys ``x`` (uint64 in,
    products < 2^52 so no wraparound)."""
    x = x.astype(np.uint64)
    out = np.empty((_CMS_D, len(x)), dtype=np.int64)
    for j in range(_CMS_D):
        out[j] = (((np.uint64(_CMS_A[j]) * x + np.uint64(_CMS_B[j]))
                   % np.uint64(_CMS_P)) % np.uint64(_CMS_W)).astype(np.int64)
    return out


def _bigrams(text: str) -> list:
    toks = T.TOKEN_RE.findall(text.lower())
    return [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]


def corpus_heavy_hitters_cms(sf_dir: str, top_k: int = _CMS_TOPK):
    """Top-k corpus bigrams by count-min-sketch ESTIMATE (d=4, w=2048).

    Two streaming passes over ``documents``: (1) per-batch bigram counts
    folded into local d×w grids, emitted as (row, cell, n) partials and
    merged by one bounded groupby (≤ d·w = 8192 groups — the exchange
    never carries tokens); the merged 8 KiB sketch is ``ray.put`` once.
    (2) each block probes its LOCAL distinct bigrams against the
    broadcast sketch and emits only its top-k — no global distinct
    shuffle of the bigram vocabulary. Equivalence: ``estimate(token)``
    is a pure function of the broadcast sketch, so a token has the same
    estimate in every block; a global top-k member outranks all but
    < k tokens corpus-wide, hence outranks all but < k tokens in ANY
    block it appears in and survives that block's top-k. The driver
    dedupes the ≤ blocks×k union and takes the final top-k. Top-k by
    (est desc, token asc) — ties break on the raw byte order both
    engines share for ASCII. Key = low 32 bits of ``md5_number_lower``
    so the SQL oracle rebuilds identical cells in BIGINT arithmetic."""
    ds = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])

    def grid_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_bigrams(t))
        if not c:
            return pa.table({"row": pa.array([], pa.int64()),
                             "cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        keys = np.array([T._h64_md5(s) % (1 << 32) for s in c],
                        dtype=np.uint64)
        cnts = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        cells = _cms_cells(keys)
        grid = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        for j in range(_CMS_D):
            np.add.at(grid[j], cells[j], cnts)
        rows, cols = np.nonzero(grid)
        return pa.table({"row": pa.array(rows.astype(np.int64)),
                         "cell": pa.array(cols.astype(np.int64)),
                         "n": pa.array(grid[rows, cols])})

    merged = _part_groupby_agg(
        ds.map_batches(grid_partial, batch_format="pyarrow"),
        ["row", "cell"], {"n": ("n", "sum")}).to_pandas()
    sketch = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    sketch[merged["row"], merged["cell"]] = merged["n"]
    sk_ref = ray.put(sketch)

    def probe_topk(batch: pd.DataFrame) -> pd.DataFrame:
        # local distinct → probe broadcast sketch → per-block top-k.
        sk = ray.get(sk_ref)
        seen = set()
        for t in batch["text"]:
            seen.update(_bigrams(t))
        if not seen:
            return pd.DataFrame({"token": pd.Series(dtype=object),
                                 "est": pd.Series(dtype="int64")})
        toks = sorted(seen)
        keys = np.array([T._h64_md5(s) % (1 << 32) for s in toks],
                        dtype=np.uint64)
        cells = _cms_cells(keys)
        ests = np.min(
            np.stack([sk[j, cells[j]] for j in range(_CMS_D)]), axis=0)
        out = pd.DataFrame({"token": np.array(toks, dtype=object),
                            "est": ests.astype(np.int64)})
        return out.sort_values(["est", "token"],
                               ascending=[False, True]).head(top_k)

    parts = ds.map_batches(probe_topk, batch_format="pandas").to_pandas()
    # ≤ blocks×k rows: dedupe tokens (same est everywhere), final top-k
    return parts.drop_duplicates("token") \
        .sort_values(["est", "token"], ascending=[False, True]) \
        .head(top_k).reset_index(drop=True)


def _cms_oracle_sql(top_k: int = _CMS_TOPK) -> str:
    cells = "\n          UNION ALL ".join(
        f"SELECT tok, n, {j} AS row, "
        f"CAST((({_CMS_A[j]} * x + {_CMS_B[j]}) % {_CMS_P}) % {_CMS_W} "
        f"AS BIGINT) AS cell FROM keyed"
        for j in range(_CMS_D))
    return f"""
        WITH toks AS (
            SELECT regexp_extract_all(lower(text), '\\w+') AS w
            FROM documents),
        bg AS (
            SELECT w[i] || ' ' || w[i + 1] AS tok
            FROM toks, UNNEST(range(1, len(w))) AS t(i)),
        cnt AS (SELECT tok, COUNT(*) AS n FROM bg GROUP BY tok),
        keyed AS (
            SELECT tok, n,
                   CAST(md5_number_lower(tok) % 4294967296 AS BIGINT) AS x
            FROM cnt),
        cells AS ({cells}),
        cellsum AS (
            SELECT row, cell, SUM(n) AS s FROM cells GROUP BY row, cell),
        est AS (
            SELECT c.tok, MIN(cs.s) AS est
            FROM cells c JOIN cellsum cs USING (row, cell)
            GROUP BY c.tok)
        SELECT tok AS token, CAST(est AS BIGINT) AS est
        FROM est ORDER BY est DESC, token LIMIT {top_k}
    """


# ---------------------------------------------------------------------------
# Integer-quantized k-means
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3
_KM_SCALE = 1_000_000


def _quantize(M: np.ndarray) -> np.ndarray:
    """Fixed-point quantization (floor(x*1e6+0.5)): the repo's standard
    half-up protocol; makes all distance arithmetic integer-exact."""
    return np.floor(M.astype(np.float64) * _KM_SCALE + 0.5).astype(np.int64)


def _assign(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Argmin cluster per row. d2 terms are integers < 2^53 → exact in
    float64 in any order; ties break to the lowest cluster id (argmin
    returns the first minimum; SQL ORDER BY d2, cid does the same)."""
    Mf = M.astype(np.float64)
    Cf = C.astype(np.float64)
    d2 = (Mf * Mf).sum(axis=1, keepdims=True) \
        - 2.0 * (Mf @ Cf.T) + (Cf * Cf).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1).astype(np.int64)


def _kmeans_fit(qds: "rd.Dataset", k: int, iterations: int,
                dim: int) -> np.ndarray:
    """Lloyd iterations over a materialized quantized dataset with
    columns (vec_id, qe list<int64>). Init = the k smallest vec_ids'
    vectors. Per pass each block emits k×(dim+1) partial rows (sums +
    counts) — bounded by blocks×k×dim, never by n — merged on the
    driver; empty clusters keep their previous centroid."""
    init = qds.filter(expr=f"vec_id < {k}").to_pandas() \
        .sort_values("vec_id")
    C = np.stack(init["qe"].to_numpy()).astype(np.int64)
    assert C.shape == (k, dim)

    for _ in range(iterations):
        c_ref = ray.put(C)

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            Cb = ray.get(c_ref)
            M = np.stack(batch["qe"].to_numpy()).astype(np.int64)
            a = _assign(M, Cb)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, a, M)
            cnts = np.bincount(a, minlength=k).astype(np.int64)
            cid = np.repeat(np.arange(k, dtype=np.int64), dim + 1)
            j = np.tile(np.concatenate([np.arange(dim, dtype=np.int64),
                                        [-1]]), k)
            s = np.concatenate(
                [np.concatenate([sums[c], [cnts[c]]]) for c in range(k)])
            return pd.DataFrame({"cid": cid, "j": j, "s": s})

        p = qds.map_batches(partials, batch_format="pandas") \
            .to_pandas().groupby(["cid", "j"], as_index=False)["s"].sum()
        cnts = p[p["j"] == -1].set_index("cid")["s"]
        sums = p[p["j"] >= 0].pivot(index="cid", columns="j",
                                    values="s").to_numpy()
        newC = C.copy()
        for c in range(k):
            n = int(cnts.get(c, 0))
            if n > 0:
                # identical IEEE ops in SQL: FLOOR(SUM(v)::DOUBLE/n + .5)
                newC[c] = np.floor(
                    sums[c].astype(np.float64) / n + 0.5).astype(np.int64)
        C = newC
    return C


def _quantized_ds(sf_dir: str, plant: bool = False) -> "rd.Dataset":
    ds = rd.read_parquet(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        ids = batch["vec_id"].to_numpy()
        if plant:  # same derivation as analytics.embedding_neardup
            sel = ids % 20 == 0
            Mp = M[sel].copy()
            Mp[:, 0] += 0.01
            M = np.concatenate([M, Mp])
            ids = np.concatenate([ids, ids[sel] + 1_000_000])
        return pd.DataFrame({"vec_id": ids, "qe": list(_quantize(M))})

    return ds.map_batches(prep, batch_format="pandas").materialize()


def embedding_kmeans(sf_dir: str, k: int = _KM_K,
                     iterations: int = _KM_ITERS):
    """Fixed-iteration integer-quantized Lloyd k-means: final cluster
    assignment per vector (plus the per-cluster size via one tiny
    groupby in the SQL compare shape). See module docstring for the
    exactness argument."""
    qds = _quantized_ds(sf_dir)
    dim = len(qds.take(1)[0]["qe"])
    C = _kmeans_fit(qds, k, iterations, dim)
    c_ref = ray.put(C)

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(batch["qe"].to_numpy()).astype(np.int64)
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(),
                             "cluster": _assign(M, ray.get(c_ref))})

    return qds.map_batches(final, batch_format="pandas")


def _kmeans_sql_chain(k: int, iterations: int, plant: bool) -> str:
    """Shared CTE chain: quantized (optionally planted) embeddings `q`,
    centroid iterations c0..cT, final assignment aN."""
    if plant:
        base = """
        raw AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings),
        aug AS (
            SELECT vec_id, e FROM raw
            UNION ALL
            SELECT vec_id + 1000000 AS vec_id,
                   list_prepend(e[1] + 0.01, e[2:]) AS e
            FROM raw WHERE vec_id % 20 = 0),
        """
    else:
        base = """
        aug AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings),
        """
    head = f"""
        WITH {base}
        q AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(e,
                       x -> FLOOR(x * 1000000 + 0.5)) AS qe
            FROM aug),
        c0 AS MATERIALIZED (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
                   qe AS ce
            FROM q ORDER BY vec_id LIMIT {k})
    """
    its = []
    for i in range(1, iterations + 1):
        its.append(f"""
        , a{i} AS MATERIALIZED (
            SELECT vec_id, qe, cid FROM (
                SELECT q.vec_id, q.qe, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                           list_inner_product(q.qe, q.qe)
                           - 2 * list_inner_product(q.qe, c.ce)
                           + list_inner_product(c.ce, c.ce),
                           c.cid) AS rn
                FROM q CROSS JOIN c{i - 1} c) WHERE rn = 1),
        c{i} AS MATERIALIZED (
            SELECT p.cid, COALESCE(m.ce, p.ce) AS ce
            FROM c{i - 1} p LEFT JOIN (
                SELECT cid, list(cv ORDER BY j) AS ce FROM (
                    SELECT cid, j, FLOOR(SUM(v) / COUNT(*) + 0.5) AS cv
                    FROM (SELECT cid, UNNEST(qe) AS v,
                                 generate_subscripts(qe, 1) AS j
                          FROM a{i})
                    GROUP BY cid, j) GROUP BY cid) m
            ON p.cid = m.cid)
        """)
    return head + "".join(its)


def _kmeans_oracle_sql(k: int = _KM_K,
                       iterations: int = _KM_ITERS) -> str:
    # one extra assignment against the FINAL centroids (mirrors the
    # engine's final pass after the last update)
    chain = _kmeans_sql_chain(k, iterations, plant=False)
    return chain + f"""
        , afin AS (
            SELECT vec_id, cid FROM (
                SELECT q.vec_id, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                           list_inner_product(q.qe, q.qe)
                           - 2 * list_inner_product(q.qe, c.ce)
                           + list_inner_product(c.ce, c.ce),
                           c.cid) AS rn
                FROM q CROSS JOIN c{iterations} c) WHERE rn = 1)
        SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM afin
    """


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------

_SDD_TAU_NUM = 9801      # tau^2 = 0.9801 → tau = 0.99
_SDD_TAU_DEN = 10000
_SDD_CHUNK = 2048
# rows per pair-task chunk: a (cluster, cx, cy) task holds at most
# 2×_SDD_TASK_ROWS qe rows, so task memory is bounded no matter how
# big a cluster gets
_SDD_TASK_ROWS = 4096
# target vectors per k-means cluster when k is derived from n (the
# SemDeDup paper's constant-cluster-size regime); at sf0.01/sf0.1 the
# derived k stays at _KM_K so the static SQL oracle replays the same
# chain
_SDD_TARGET_CLUSTER = 8192
_SDD_MIX = 0x9E3779B97F4A7C15    # splitmix64 increment, chunk hashing


def _sdd_chunk_of(ids: np.ndarray, nc: int) -> np.ndarray:
    """Deterministic chunk id per vec_id (position/engine-independent):
    one uint64 multiplicative mix, mod the cluster's chunk count."""
    h = ids.astype(np.uint64) * np.uint64(_SDD_MIX)
    h ^= h >> np.uint64(31)
    return (h % np.uint64(nc)).astype(np.int64)


def _sdd_cross_dominated(Mi: np.ndarray, ni2: np.ndarray,
                         idi: np.ndarray, Mj: np.ndarray,
                         nj2: np.ndarray, idj: np.ndarray) -> np.ndarray:
    """dominated[i] = any j with idj[j] < idi[i] and cosine(i,j) >= tau,
    chunked over rows of Mi so the Gram block stays bounded. All
    products are exact integers in float64 (< 2^53) with the SAME
    association order as the SQL oracle."""
    n = len(idi)
    dominated = np.zeros(n, dtype=bool)
    for lo in range(0, n, _SDD_CHUNK):
        hi = min(lo + _SDD_CHUNK, n)
        G = Mi[lo:hi] @ Mj.T
        lhs = (G * G) * float(_SDD_TAU_DEN)
        rhs = np.multiply.outer(ni2[lo:hi], nj2) * float(_SDD_TAU_NUM)
        close = (G > 0) & (lhs >= rhs)
        earlier = idj[None, :] < idi[lo:hi, None]
        dominated[lo:hi] = (close & earlier).any(axis=1)
    return dominated


def embedding_semdedup(sf_dir: str, k: int = None,
                       iterations: int = _KM_ITERS,
                       task_rows: int = _SDD_TASK_ROWS):
    """SemDeDup-style semantic dedup (see module docstring): k-means over
    the planted-companion embedding set, then per-cluster keep-first at
    cosine >= 0.99. Output one row per vector: (vec_id, cluster, kept).

    Scale shape — no single task ever holds a whole cluster:
    - k defaults to ``max(_KM_K, n // _SDD_TARGET_CLUSTER)`` so clusters
      stay ~constant-size as n grows (the paper's regime; at the oracle
      tiers this resolves to the SQL chain's k = 8).
    - the in-cluster pairwise pass is an exact TRIANGULAR CHUNK-JOIN:
      each cluster's rows are hash-chunked on vec_id into
      ``ceil(count/task_rows)`` chunks; every row fans out once per
      chunk it must meet, and each (cluster, cx ≤ cy) pair task tests
      cross-chunk domination with a bounded Gram kernel
      (≤ 2×task_rows rows, ``_SDD_CHUNK``-row Gram blocks). Dominated
      flags OR-reduce per vec_id in one small groupby. A degenerate
      corpus where k-means collapses everything into one cluster still
      runs at (nchunks²/2)-way parallelism with bounded task memory —
      replication factor per row is nchunks = count/task_rows, a
      factor-task_rows saving over the O(count²) pair compute it feeds.
    Equivalence to the one-task-per-cluster plan (and the SQL oracle's
    NOT EXISTS): domination is a pairwise predicate against ALL
    earlier-id rows of the cluster (kept or not), so it distributes
    over any partition of the id space — every (i, j<i) pair lands in
    exactly one pair task."""
    qds = _quantized_ds(sf_dir, plant=True)
    if k is None:
        k = max(_KM_K, qds.count() // _SDD_TARGET_CLUSTER)
    dim = len(qds.take(1)[0]["qe"])
    C = _kmeans_fit(qds, k, iterations, dim)
    c_ref = ray.put(C)

    def with_cluster(batch: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(batch["qe"].to_numpy()).astype(np.int64)
        batch = batch.copy()
        batch["cluster"] = _assign(M, ray.get(c_ref))
        return batch

    clustered = qds.map_batches(
        with_cluster, batch_format="pandas").materialize()
    # cluster sizes → chunk counts (k rows on the driver)
    sizes = _part_groupby_agg(
        clustered.select_columns(["vec_id", "cluster"]),
        ["cluster"], {"n": ("vec_id", "size")}).to_pandas()
    nchunks = {int(c): max(1, -(-int(n) // task_rows))
               for c, n in zip(sizes["cluster"], sizes["n"])}

    if all(v == 1 for v in nchunks.values()):
        # every cluster fits one bounded task: the chunk-join's
        # degenerate case IS the single-pass plan — skip the fan-out
        # and OR-reduce exchanges (3 fewer shuffles; parity with the
        # multi-chunk path is pinned by the degenerate-corpus test)
        def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for cid, gg in g.groupby("cluster", sort=False):
                gg = gg.sort_values("vec_id")
                ids = gg["vec_id"].to_numpy()
                M = np.stack(gg["qe"].to_numpy()).astype(np.float64)
                na2 = (M * M).sum(axis=1)
                dom = _sdd_cross_dominated(M, na2, ids, M, na2, ids)
                outs.append(pd.DataFrame({
                    "vec_id": ids,
                    "cluster": np.full(len(ids), cid, dtype=np.int64),
                    "kept": ~dom}))
            if not outs:
                return pd.DataFrame({
                    "vec_id": pd.Series(dtype="int64"),
                    "cluster": pd.Series(dtype="int64"),
                    "kept": pd.Series(dtype=bool)})
            return pd.concat(outs, ignore_index=True)

        return _part_apply(clustered, ["cluster"], dedup_cluster)

    nc_ref = ray.put(nchunks)

    def fan_out(batch: pd.DataFrame) -> pd.DataFrame:
        # one copy of each row per chunk it must meet (nchunks copies)
        ncs = ray.get(nc_ref)
        outs = []
        for cid, g in batch.groupby("cluster", sort=False):
            nc = ncs[int(cid)]
            q = _sdd_chunk_of(g["vec_id"].to_numpy(), nc)
            for other in range(nc):
                gg = g.copy()
                gg["cx"] = np.minimum(q, other)
                gg["cy"] = np.maximum(q, other)
                outs.append(gg)
        if not outs:
            batch = batch.copy()
            batch["cx"] = pd.Series(dtype="int64")
            batch["cy"] = pd.Series(dtype="int64")
            return batch
        return pd.concat(outs, ignore_index=True)

    def pair_tasks(g: pd.DataFrame) -> pd.DataFrame:
        # one partition may hold several (cluster, cx, cy) tasks
        ncs = ray.get(nc_ref)
        outs = []
        for (cid, cx, cy), gg in g.groupby(["cluster", "cx", "cy"],
                                           sort=False):
            gg = gg.sort_values("vec_id")
            ids = gg["vec_id"].to_numpy()
            M = np.stack(gg["qe"].to_numpy()).astype(np.float64)
            na2 = (M * M).sum(axis=1)      # exact ints in float64
            q = _sdd_chunk_of(ids, ncs[int(cid)])
            if cx == cy:
                # diagonal: within-chunk triangular test; emits the
                # BASE row for every member of the chunk
                dom = _sdd_cross_dominated(M, na2, ids, M, na2, ids)
                outs.append(pd.DataFrame({
                    "vec_id": ids,
                    "cluster": np.full(len(ids), cid, dtype=np.int64),
                    "dom": dom}))
            else:
                mx, my = q == cx, q == cy
                for ma, mb in ((mx, my), (my, mx)):
                    if not ma.any() or not mb.any():
                        continue
                    dom = _sdd_cross_dominated(
                        M[ma], na2[ma], ids[ma],
                        M[mb], na2[mb], ids[mb])
                    if dom.any():   # off-diagonal: sparse True rows only
                        outs.append(pd.DataFrame({
                            "vec_id": ids[ma][dom],
                            "cluster": np.full(int(dom.sum()), cid,
                                               dtype=np.int64),
                            "dom": True}))
        if not outs:
            return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64"),
                                 "dom": pd.Series(dtype=bool)})
        return pd.concat(outs, ignore_index=True)

    flags = _part_apply(
        clustered.map_batches(fan_out, batch_format="pandas"),
        ["cluster", "cx", "cy"], pair_tasks)
    merged = _part_groupby_agg(flags, ["vec_id", "cluster"],
                               {"dom": ("dom", "max")})

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "vec_id": batch["vec_id"].astype("int64"),
            "cluster": batch["cluster"].astype("int64"),
            "kept": ~batch["dom"].astype(bool)})

    return merged.map_batches(finish, batch_format="pandas")


def _semdedup_oracle_sql(k: int = _KM_K,
                         iterations: int = _KM_ITERS) -> str:
    chain = _kmeans_sql_chain(k, iterations, plant=True)
    return chain + f"""
        , afin AS MATERIALIZED (
            SELECT vec_id, qe, cid FROM (
                SELECT q.vec_id, q.qe, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                           list_inner_product(q.qe, q.qe)
                           - 2 * list_inner_product(q.qe, c.ce)
                           + list_inner_product(c.ce, c.ce),
                           c.cid) AS rn
                FROM q CROSS JOIN c{iterations} c) WHERE rn = 1)
        SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
               NOT EXISTS (
                   SELECT 1 FROM afin b
                   WHERE b.cid = a.cid AND b.vec_id < a.vec_id
                     AND list_inner_product(a.qe, b.qe) > 0
                     AND (list_inner_product(a.qe, b.qe)
                          * list_inner_product(a.qe, b.qe))
                         * {_SDD_TAU_DEN} >=
                         (list_inner_product(a.qe, a.qe)
                          * list_inner_product(b.qe, b.qe))
                         * {_SDD_TAU_NUM}
               ) AS kept
        FROM afin a
    """


# ---------------------------------------------------------------------------
# Product-quantization ANN (IVF-free ADC variant)
# ---------------------------------------------------------------------------

_PQ_M = 4          # subspaces
_PQ_K = 8          # codewords per subspace
_PQ_ITERS = 2
_PQ_NQ = 5         # query ids (vec_id < _PQ_NQ), same split as knn_cosine
_PQ_TOPK = 3


def _pq_fit(qds: "rd.Dataset", m: int, k: int, iterations: int,
            dim: int) -> np.ndarray:
    """Train m per-subspace codebooks (Jégou et al. 2011, product
    quantization) with the same integer-exact Lloyd machinery as
    ``_kmeans_fit``, all m subspaces in ONE pass per iteration: each
    block emits m×k×(subdim+1) partial-sum rows (never vectors), merged
    on the driver. Init = the k smallest vec_ids' sub-vectors; training
    set = the whole table (queries included — the standard train-on-
    corpus-sample regime; at scale the sample is a bounded hash-filtered
    subset). Returns int64 codebooks of shape (m, k, dim//m)."""
    sub = dim // m
    init = qds.filter(expr=f"vec_id < {k}").to_pandas() \
        .sort_values("vec_id")
    C0 = np.stack(init["qe"].to_numpy()).astype(np.int64)
    # the filter(vec_id < k) init is equivalent to the oracle's
    # ORDER BY vec_id LIMIT k only for contiguous ids from 0 — fail
    # loudly (like _kmeans_fit) instead of silently training smaller
    # codebooks on a sparse id space
    assert C0.shape == (k, dim), \
        f"PQ init expects contiguous vec_ids 0..{k - 1}, got {C0.shape}"
    books = np.stack([C0[:, s * sub:(s + 1) * sub] for s in range(m)])

    for _ in range(iterations):
        b_ref = ray.put(books)

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            B = ray.get(b_ref)
            M_ = np.stack(batch["qe"].to_numpy()).astype(np.int64)
            frames = []
            for s in range(m):
                Ms = M_[:, s * sub:(s + 1) * sub]
                a = _assign(Ms, B[s])
                sums = np.zeros((k, sub), dtype=np.int64)
                np.add.at(sums, a, Ms)
                cnts = np.bincount(a, minlength=k).astype(np.int64)
                cid = np.repeat(np.arange(k, dtype=np.int64), sub + 1)
                j = np.tile(np.concatenate(
                    [np.arange(sub, dtype=np.int64), [-1]]), k)
                v = np.concatenate(
                    [np.concatenate([sums[c], [cnts[c]]])
                     for c in range(k)])
                frames.append(pd.DataFrame({
                    "s": np.full(len(v), s, dtype=np.int64),
                    "cid": cid, "j": j, "v": v}))
            return pd.concat(frames, ignore_index=True)

        p = qds.map_batches(partials, batch_format="pandas") \
            .to_pandas().groupby(["s", "cid", "j"],
                                 as_index=False)["v"].sum()
        new = books.copy()
        for s in range(m):
            ps = p[p["s"] == s]
            cnts = ps[ps["j"] == -1].set_index("cid")["v"]
            sums = ps[ps["j"] >= 0].pivot(index="cid", columns="j",
                                          values="v").to_numpy()
            for c in range(k):
                n = int(cnts.get(c, 0))
                if n > 0:
                    new[s, c] = np.floor(
                        sums[c].astype(np.float64) / n + 0.5
                    ).astype(np.int64)
        books = new
    return books


def knn_pq_adc(sf_dir: str, m: int = _PQ_M, k_codes: int = _PQ_K,
               iterations: int = _PQ_ITERS, n_queries: int = _PQ_NQ,
               top_k: int = _PQ_TOPK):
    """Approximate nearest neighbours via product quantization + ADC
    (asymmetric distance): train per-subspace codebooks, encode every
    database vector as m small codes, answer each query by summing
    per-subspace lookup-table distances to the codewords. Integer
    quantization makes every distance exact in both engines, so the SQL
    oracle replays codebook training, encoding, AND scoring bit-exactly.

    Scale shape: the compressed representation (m bytes/vector here; the
    point of PQ at 10^10 vectors) never leaves the workers — each block
    encodes locally and emits only its per-query partial top-k (queries ×
    k rows); codebooks and query LUTs are a tiny ``ray.put`` broadcast.
    Output: (query_id, rank, neighbor_id, adist) with adist the exact
    integer ADC distance; ties break to the smaller neighbor id."""
    qds = _quantized_ds(sf_dir)
    dim = len(qds.take(1)[0]["qe"])
    # the published MLPREP_ORACLE_SQL replays the subspace slices for
    # dim=64 (the testdata embedding width); a different width silently
    # diverges from that static SQL, so fail loudly instead
    if dim != 64:
        raise ValueError(
            f"knn_pq_adc oracle SQL is generated for dim=64, got {dim}; "
            "regenerate via _pq_oracle_sql(dim=...) for other widths")
    sub = dim // m
    books = _pq_fit(qds, m, k_codes, iterations, dim)

    qdf = qds.filter(expr=f"vec_id < {n_queries}").to_pandas() \
        .sort_values("vec_id")
    Q = np.stack(qdf["qe"].to_numpy()).astype(np.int64)
    q_ids = qdf["vec_id"].to_numpy()
    # per-query LUT: d2(query sub-vector, codeword) — ints, exact
    lut = np.zeros((m, len(q_ids), k_codes), dtype=np.int64)
    for s in range(m):
        Qs = Q[:, s * sub:(s + 1) * sub].astype(np.float64)
        Bs = books[s].astype(np.float64)
        lut[s] = ((Qs * Qs).sum(1, keepdims=True)
                  - 2.0 * (Qs @ Bs.T)
                  + (Bs * Bs).sum(1)[None, :]).astype(np.int64)
    bq_ref = ray.put((books, q_ids, lut))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        B, qi, L = ray.get(bq_ref)
        batch = batch[batch["vec_id"] >= n_queries]
        if not len(batch):
            return pd.DataFrame({
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "adist": pd.Series(dtype="int64")})
        M_ = np.stack(batch["qe"].to_numpy()).astype(np.int64)
        ids = batch["vec_id"].to_numpy()
        adist = np.zeros((len(qi), len(ids)), dtype=np.int64)
        for s in range(m):
            codes = _assign(M_[:, s * sub:(s + 1) * sub], B[s])
            adist += L[s][:, codes]
        rows = []
        for r in range(len(qi)):
            order = np.lexsort((ids, adist[r]))[:top_k]
            for c in order:
                rows.append((int(qi[r]), int(ids[c]), int(adist[r, c])))
        return pd.DataFrame(rows,
                            columns=["query_id", "neighbor_id", "adist"])

    parts = qds.map_batches(partial_topk, batch_format="pandas") \
        .to_pandas()
    out = []
    for q, g in parts.groupby("query_id"):
        g = g.sort_values(["adist", "neighbor_id"]).head(top_k)
        for rank, (_, r) in enumerate(g.iterrows(), 1):
            out.append((q, rank, int(r["neighbor_id"]),
                        int(r["adist"])))
    return pd.DataFrame(
        out, columns=["query_id", "rank", "neighbor_id", "adist"])


def _pq_subspace_chain(s: int, lo: int, hi: int, k: int,
                       iterations: int) -> str:
    """CTE chain training subspace ``s``'s codebook over ``q(vec_id,
    qe)`` (1-indexed DuckDB slice qe[lo:hi]); mirrors ``_pq_fit``."""
    sl = f"qe[{lo}:{hi}]"
    out = [f"""
        , s{s}c0 AS MATERIALIZED (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
                   {sl} AS ce
            FROM q ORDER BY vec_id LIMIT {k})
    """]
    for i in range(1, iterations + 1):
        out.append(f"""
        , s{s}a{i} AS MATERIALIZED (
            SELECT vec_id, sv, cid FROM (
                SELECT q.vec_id, {sl} AS sv, c.cid,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                           list_inner_product({sl}, {sl})
                           - 2 * list_inner_product({sl}, c.ce)
                           + list_inner_product(c.ce, c.ce),
                           c.cid) AS rn
                FROM q CROSS JOIN s{s}c{i - 1} c) WHERE rn = 1),
        s{s}c{i} AS MATERIALIZED (
            SELECT p.cid, COALESCE(m.ce, p.ce) AS ce
            FROM s{s}c{i - 1} p LEFT JOIN (
                SELECT cid, list(cv ORDER BY j) AS ce FROM (
                    SELECT cid, j, FLOOR(SUM(v) / COUNT(*) + 0.5) AS cv
                    FROM (SELECT cid, UNNEST(sv) AS v,
                                 generate_subscripts(sv, 1) AS j
                          FROM s{s}a{i})
                    GROUP BY cid, j) GROUP BY cid) m
            ON p.cid = m.cid)
        """)
    return "".join(out)


def _pq_oracle_sql(m: int = _PQ_M, k_codes: int = _PQ_K,
                   iterations: int = _PQ_ITERS, n_q: int = _PQ_NQ,
                   top_k: int = _PQ_TOPK, dim: int = 64) -> str:
    sub = dim // m
    chains, encodes, dists = [], [], []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        chains.append(_pq_subspace_chain(s, lo, hi, k_codes, iterations))
        encodes.append(f"""
        , s{s}code AS MATERIALIZED (
            SELECT vec_id, cid, ce FROM (
                SELECT q.vec_id, c.cid, c.ce,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                           list_inner_product(qe[{lo}:{hi}], qe[{lo}:{hi}])
                           - 2 * list_inner_product(qe[{lo}:{hi}], c.ce)
                           + list_inner_product(c.ce, c.ce),
                           c.cid) AS rn
                FROM q CROSS JOIN s{s}c{iterations} c
                WHERE q.vec_id >= {n_q}) WHERE rn = 1)
        """)
        dists.append(f"""
            list_inner_product(qq.qe[{lo}:{hi}], qq.qe[{lo}:{hi}])
            - 2 * list_inner_product(qq.qe[{lo}:{hi}], s{s}code.ce)
            + list_inner_product(s{s}code.ce, s{s}code.ce)
        """)
    joins = "".join(
        f" JOIN s{s}code ON s{s}code.vec_id = db.vec_id"
        for s in range(m))
    return f"""
        WITH aug AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings),
        q AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(e,
                       x -> FLOOR(x * 1000000 + 0.5)) AS qe
            FROM aug)
        {"".join(chains)}
        {"".join(encodes)}
        , scored AS (
            SELECT qq.vec_id AS query_id, db.vec_id AS neighbor_id,
                   CAST({" + ".join(dists)} AS BIGINT) AS adist
            FROM (SELECT vec_id, qe FROM q WHERE vec_id < {n_q}) qq
            CROSS JOIN (SELECT DISTINCT vec_id FROM q
                        WHERE vec_id >= {n_q}) db
            {joins}),
        ranked AS (
            SELECT query_id, neighbor_id, adist,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY adist, neighbor_id) AS rank
            FROM scored)
        SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adist
        FROM ranked WHERE rank <= {top_k}
    """


def _bpe_oracle_sql(iterations: int = _BPE_ITERS) -> str:
    """Generative SQL replay of corpus_bpe_learn: the word-frequency
    table, char spelling, and ``iterations`` chained (count -> argmax ->
    REPLACE) rounds — the delimited-string count/replace semantics are
    the engine's exactly (see corpus_bpe_learn docstring)."""
    out = [r"""
        WITH words AS MATERIALIZED (
            SELECT w, COUNT(*) AS c FROM (
                SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w
                FROM documents) GROUP BY w
        ),
        sp0 AS MATERIALIZED (
            SELECT ' ' || array_to_string(regexp_extract_all(w, '.'), ' ')
                   || ' ' AS s, c
            FROM words
        )"""]
    for i in range(1, iterations + 1):
        out.append(f"""
        , cand{i} AS MATERIALIZED (
            SELECT DISTINCT arr[j] || ' ' || arr[j + 1] AS pr
            FROM (SELECT string_split(trim(s), ' ') AS arr FROM sp{i - 1}),
                 UNNEST(range(1, len(arr))) AS u(j)
        ),
        cnt{i} AS MATERIALIZED (
            SELECT c2.pr,
                   CAST(SUM(w.c * ((length(w.s) - length(replace(w.s,
                        ' ' || c2.pr || ' ', '')))
                        // length(' ' || c2.pr || ' '))) AS BIGINT) AS n
            FROM sp{i - 1} w CROSS JOIN cand{i} c2 GROUP BY c2.pr
        ),
        m{i} AS MATERIALIZED (
            SELECT pr, n FROM cnt{i} WHERE n > 0
            ORDER BY n DESC, pr LIMIT 1
        ),
        sp{i} AS MATERIALIZED (
            SELECT replace(s, ' ' || (SELECT pr FROM m{i}) || ' ',
                   ' ' || replace((SELECT pr FROM m{i}), ' ', '') || ' ')
                   AS s, c
            FROM sp{i - 1}
        )""")
    selects = " UNION ALL ".join(
        f"SELECT {i} AS iteration, pr AS pair, n AS merged_count FROM m{i}"
        for i in range(1, iterations + 1))
    return "".join(out) + "\n        " + selects


# ---------------------------------------------------------------------------
# Distributed PCA (power iteration over the exact integer Gram matrix)
# ---------------------------------------------------------------------------

_PCA_ITERS = 3
_PCA_SCALE = 1_000_000


def _trunc_div(u: np.ndarray, m: int) -> np.ndarray:
    """Truncate-toward-zero (u * SCALE) / m on python-int arrays —
    DuckDB's BIGINT/HUGEINT ``//`` truncates while python's floors, so
    negatives route through the explicit sign split both engines share."""
    out = []
    for x in u:
        x = int(x)
        out.append((x * _PCA_SCALE) // m if x >= 0
                   else -((-x * _PCA_SCALE) // m))
    return np.array(out, dtype=object)


def embedding_pca_power(sf_dir: str, iterations: int = _PCA_ITERS):
    """Distributed PCA, first principal direction (round-4 extension):
    the dominant eigenvector of the UNCENTERED integer Gram matrix
    G = Σ x xᵀ over the quantized embeddings, by fixed-iteration power
    method, then each vector's first-PC projection score.

    Integer-exactness protocol (the k-means/PQ discipline applied to
    iterative linear algebra): coordinates are fixed-point ints, so G's
    entries are exact integer sums; each power step computes u = G·v in
    UNBOUNDED python-int arithmetic (the SQL oracle mirrors it in
    HUGEINT) and rescales v = trunc(u·1e6 / max|u|) back to the ±1e6
    grid — every quantity is an integer in BOTH engines, no float
    protocol hazard anywhere. Scale shape: each block emits one dim²
    partial (M.T @ M — int64-safe to ~9e6 rows/block at 1e6-scale
    coords), merged on the driver in python ints (bounded by
    blocks×dim², never by n; two-level merge at 100 TB); the power
    iterations touch only the dim×dim driver matrix; the final
    projection is one broadcast map_batches. Output: (vec_id,
    pc1_score) with score = x·v_final (≤ dim·1e12 — int64-safe)."""
    qds = _quantized_ds(sf_dir)
    dim = len(qds.take(1)[0]["qe"])

    def gram_partial(batch: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(batch["qe"].to_numpy()).astype(np.int64)
        P = M.T @ M
        i, j = np.nonzero(P)
        return pd.DataFrame({"i": i.astype(np.int64),
                             "j": j.astype(np.int64),
                             "s": P[i, j]})

    parts = qds.map_batches(gram_partial,
                            batch_format="pandas").to_pandas()
    # python-int merge: block partials are int64-exact, but the MERGED
    # sums can pass 2^63 at scale — object dtype keeps them unbounded
    parts["s"] = parts["s"].astype(object)
    gm = parts.groupby(["i", "j"], as_index=False)["s"].sum()
    G = np.zeros((dim, dim), dtype=object)
    G[gm["i"].to_numpy(dtype=np.int64),
      gm["j"].to_numpy(dtype=np.int64)] = gm["s"].to_numpy()

    v = np.array([_PCA_SCALE] + [0] * (dim - 1), dtype=object)
    for _ in range(iterations):
        u = G @ v                     # unbounded python ints
        m = max(max(int(abs(x)) for x in u), 1)
        v = _trunc_div(u, m)

    v_ref = ray.put(np.array([int(x) for x in v], dtype=np.int64))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        vv = ray.get(v_ref)
        M = np.stack(batch["qe"].to_numpy()).astype(np.int64)
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(),
                             "pc1_score": M @ vv})

    return qds.map_batches(project, batch_format="pandas")


def _pca_oracle_sql(iterations: int = _PCA_ITERS) -> str:
    chain = f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                 AS BIGINT)) AS qe
            FROM embeddings),
        dims AS (SELECT UNNEST(range(1, (SELECT MAX(len(qe)) FROM q) + 1))
                 AS i),
        flat AS MATERIALIZED (
            SELECT vec_id, UNNEST(qe) AS x,
                   generate_subscripts(qe, 1) AS i
            FROM q),
        g AS MATERIALIZED (
            SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS s
            FROM flat a JOIN flat b USING (vec_id)
            GROUP BY a.i, b.i),
        v0 AS (SELECT i, CAST(CASE WHEN i = 1 THEN {_PCA_SCALE}
                              ELSE 0 END AS HUGEINT) AS val
               FROM dims)"""
    for t in range(1, iterations + 1):
        chain += f"""
        , u{t} AS MATERIALIZED (
            SELECT g.i, SUM(g.s * v.val) AS val
            FROM g JOIN v{t - 1} v ON g.j = v.i GROUP BY g.i),
        m{t} AS (SELECT GREATEST(MAX(ABS(val)), 1) AS m FROM u{t}),
        v{t} AS MATERIALIZED (
            SELECT i, CASE WHEN val >= 0
                      THEN (val * {_PCA_SCALE}) // (SELECT m FROM m{t})
                      ELSE -((-val * {_PCA_SCALE})
                             // (SELECT m FROM m{t}))
                      END AS val
            FROM u{t})"""
    return chain + f"""
        SELECT f.vec_id,
               CAST(SUM(f.x * v.val) AS BIGINT) AS pc1_score
        FROM flat f JOIN v{iterations} v ON f.i = v.i
        GROUP BY f.vec_id
    """


MLPREP_ORACLE_SQL = {
    "embedding_pca_power": _pca_oracle_sql(),
    "corpus_heavy_hitters_cms": _cms_oracle_sql(),
    "embedding_kmeans": _kmeans_oracle_sql(),
    "embedding_semdedup": _semdedup_oracle_sql(),
    "knn_pq_adc": _pq_oracle_sql(),
    "corpus_bpe_learn": _bpe_oracle_sql(),
}
