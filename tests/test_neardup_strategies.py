"""Both text-attachment strategies of the near-dup verify stage produce
identical pairs (broadcast for small corpora, hash joins at scale)."""

import pandas as pd
import ray.data as rd

from ieps_crawler_ray.pipelines import analytics as A


def _pairs(df: pd.DataFrame) -> set:
    if df.empty:
        return set()
    return set(map(tuple, df[["doc_a", "doc_b"]].values))


def test_broadcast_and_join_strategies_agree(ray_session):
    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(sf + "/documents.parquet",
                           columns=["doc_id"])
    ids = docs["doc_id"].tolist()
    # candidate pairs: consecutive ids plus a few self-similar dups
    cand = pd.DataFrame({
        "doc_a": ids[:-1][:40],
        "doc_b": ids[1:][:40],
    })
    cand_ds = rd.from_pandas(cand)
    b = A._verify_jaccard_pairs(sf, cand_ds, 0.0,
                                strategy="broadcast").to_pandas()
    j = A._verify_jaccard_pairs(sf, rd.from_pandas(cand), 0.0,
                                strategy="join").to_pandas()
    assert _pairs(b) == _pairs(j)
    assert len(_pairs(b)) == 40  # threshold 0 keeps every candidate
