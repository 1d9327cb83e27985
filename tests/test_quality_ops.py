"""Unit tests for the round-3 corpus-quality operators
(ieps_crawler_ray/pipelines/quality.py): planted-PII parity vs DuckDB
(the sf corpora carry no PII, so the contract check alone would be
vacuous for the match counts), dup-ngram broadcast-vs-partitioned path
parity, pack-sequences bucket invariance, and a hand-computed Gopher
metrics case."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ieps_crawler_ray.pipelines import quality as Q

SF_SMALL = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array([f"src{i % 3}" for i in range(len(texts))],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True)


def test_pii_redact_planted_parity(ray_session, tmp_path):
    """Non-vacuous PII parity: planted emails/IPs/phones; the Ray
    operator's counts and redacted-text hashes must equal DuckDB running
    the exact oracle SQL over the same parquet."""
    texts = [
        "contact alice.smith+dev@example.co.uk or bob@test.org today",
        "server at 192.168.1.254 and 10.0.0.1 responded",
        "call +38612345678 or +4915112345678 now",
        "mixed: eve@corp.io from 8.8.8.8 dialed +12025550123",
        "no pii here at all just words",
        "edge a@b.cc 999.999.999.999 +123456 not-a-phone",
    ]
    d = _write_docs(tmp_path, texts)
    got = _sorted(Q.doc_pii_redact(d).to_pandas())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    want = _sorted(con.execute(
        Q.QUALITY_ORACLE_SQL["doc_pii_redact"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_emails"].sum() >= 3
    assert got["n_ips"].sum() >= 4  # 999.x still matches the \d{1,3} quads
    assert got["n_phones"].sum() >= 3


def test_dup_ngram_fallback_path_matches_broadcast(ray_session,
                                                   monkeypatch):
    """Force the partitioned groupby mark (dup-set over the broadcast
    limit) and pin it to the broadcast path's result."""
    broadcast = _sorted(Q.doc_dup_ngram_spans(SF_SMALL).to_pandas())
    monkeypatch.setattr(Q, "_DUP_SET_LIMIT_ROWS", 0)
    partitioned = _sorted(Q.doc_dup_ngram_spans(SF_SMALL).to_pandas())
    pd.testing.assert_frame_equal(broadcast, partitioned)
    # non-vacuity: the sf world plants duplicate docs, so dup grams exist
    assert broadcast["n_dup_grams"].sum() > 0


def test_pack_sequences_bucket_invariant(ray_session):
    """The distributed prefix-sum must be independent of the bucket
    count (the parallelism knob)."""
    a = _sorted(Q.doc_pack_sequences(SF_SMALL, n_buckets=1).to_pandas())
    b = _sorted(Q.doc_pack_sequences(SF_SMALL, n_buckets=7).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    # scan sanity: offsets are the exclusive prefix sum in doc_id order
    o = a.sort_values("doc_id", ignore_index=True)
    assert o["start_tok"].iloc[0] == 0
    assert (o["start_tok"].diff().iloc[1:].to_numpy()
            == o["n_tokens"].iloc[:-1].to_numpy()).all()


def test_gopher_metrics_hand_case(ray_session, tmp_path):
    """'a a a b' -> 4 words, top-word 3/4, uniq 2/4, mean len 1.0;
    trigrams (a a a), (a a b) distinct -> dup fraction 0. A second doc
    'x y x y x y' has repeated trigrams."""
    d = _write_docs(tmp_path, ["a a a b", "x y x y x y", ""])
    got = Q.doc_gopher_quality(d).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    r0 = got.iloc[0]
    assert r0["n_words"] == 4
    assert r0["frac_top_word"] == 0.75
    assert r0["frac_uniq_words"] == 0.5
    assert r0["mean_word_len"] == 1.0
    assert r0["frac_dup_3grams"] == 0.0
    r1 = got.iloc[1]
    # trigrams: xyx yxy xyx yxy -> 4 total, 2 distinct -> dup frac 0.5
    assert r1["n_words"] == 6
    assert r1["frac_dup_3grams"] == 0.5
    r2 = got.iloc[2]
    assert r2["n_words"] == 0 and r2["frac_top_word"] == 0.0


def test_mixture_sample_rates_deterministic(ray_session):
    """Every kept row's draw is below its source rate; rates depend only
    on the source name (stable across runs)."""
    from ieps_crawler_ray.functions.text import _h64_md5

    out = Q.corpus_mixture_sample(SF_SMALL).to_pandas()
    assert len(out) > 0
    for _, r in out.iterrows():
        rate = 100 + _h64_md5(r["source"]) % 900
        assert r["rate_permille"] == rate
        assert _h64_md5(str(r["doc_id"])) % 1000 < rate


def test_caption_dedup_longest_caption_wins(ray_session):
    """Planted length-diverse caption groups (the sf crawl world's dup
    images all share caption lengths, so this arm is otherwise
    unexercised): longest caption wins, ties break to smallest url;
    result equals a DuckDB window recomputation."""
    import ray.data as rd

    from ieps_crawler_ray.pipelines.flagship import _caption_dedup

    rows = pa.table({
        "url": pa.array(["u3", "u1", "u2", "u9", "u8", "u7", "u6"]),
        "caption": pa.array(["longest caption here", "short", None,
                             "same", "same", "other", "tiny"]),
        "phash": pa.array([5, 5, 5, 9, 9, 9, 2], pa.int64()),
    })
    got = _sorted(_caption_dedup(rd.from_arrow(rows)).to_pandas())
    con = duckdb.connect()
    con.register("im0", rows.to_pandas())
    want = _sorted(con.execute("""
        WITH im AS (SELECT phash, url, COALESCE(caption,'') AS cap FROM im0),
        best AS (SELECT phash, url, LEN(cap) AS caption_len,
                        ROW_NUMBER() OVER (PARTITION BY phash
                            ORDER BY LEN(cap) DESC, url) AS rk,
                        COUNT(*) OVER (PARTITION BY phash) AS n_copies
                 FROM im)
        SELECT phash, url, CAST(caption_len AS BIGINT) AS caption_len,
               CAST(n_copies AS BIGINT) AS n_copies
        FROM best WHERE rk = 1""").df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    by_ph = got.set_index("phash")
    assert by_ph.loc[5, "url"] == "u3"      # longest caption wins
    assert by_ph.loc[9, "url"] == "u7"      # 'other'(5) beats 'same'(4)
    assert by_ph.loc[2, "n_copies"] == 1


def test_unigram_logprob_hapax_closed_form(ray_session):
    """Hapax tokens never enter the broadcast dict; their score is the
    closed form ln(1/N). Verify totals against a local replay and that
    the keep flag is non-vacuous both ways on the sf corpus."""
    import math
    from collections import Counter

    import pandas as pd

    from ieps_crawler_ray.functions import text as T
    from ieps_crawler_ray.pipelines.quality import doc_unigram_logprob

    sf = "/root/testdata/sf0.001"
    out = doc_unigram_logprob(sf).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    corpus = Counter()
    for t in docs["text"]:
        corpus.update(T.TOKEN_RE.findall(t.lower()))
    n_tok = sum(corpus.values())

    def lp_micro(c):
        import numpy as np
        return int(np.floor(np.round(np.log(c / n_tok), 9) * 1e6 + 0.5))

    for _, row in docs.head(10).iterrows():
        tf = Counter(T.TOKEN_RE.findall(row["text"].lower()))
        want = sum(k * lp_micro(corpus[w]) for w, k in tf.items())
        assert out.loc[row["doc_id"], "logprob_micro"] == want
    assert 0 < out["keep"].sum() < len(out)


def test_benchmark_contamination_planted_hits(ray_session):
    """Every benchmark-source doc must flag itself; docs that share no
    snippet stay clean; n_hits counts snippets, not occurrences."""
    from ieps_crawler_ray.pipelines.quality import \
        doc_benchmark_contamination

    out = doc_benchmark_contamination("/root/testdata/sf0.001") \
        .to_pandas().set_index("doc_id")
    import pandas as pd
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    bench_ids = [i for i, t in zip(docs["doc_id"], docs["text"])
                 if i % 100 == 0 and len(t) >= 110]
    for i in bench_ids:
        assert out.loc[i, "contaminated"] == 1  # self-hit
    assert out["contaminated"].sum() >= len(bench_ids)
    assert (out["contaminated"] == (out["n_hits"] > 0).astype(int)).all()


def test_train_val_test_split_deterministic_and_complete(ray_session):
    from ieps_crawler_ray.pipelines.analytics import \
        doc_train_val_test_split

    a = doc_train_val_test_split("/root/testdata/sf0.001").to_pandas()
    b = doc_train_val_test_split("/root/testdata/sf0.001").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)
    counts = a["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def _tiny_docs_dir(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s0"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(d / "documents.parquet"))
    return str(d)


def test_unigram_logprob_empty_and_single_token_docs(ray_session,
                                                     tmp_path):
    from ieps_crawler_ray.pipelines.quality import doc_unigram_logprob

    sf = _tiny_docs_dir(tmp_path, ["", "word", "word word", "   "])
    out = doc_unigram_logprob(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 0
    assert out.loc[0, "logprob_micro"] == 0
    assert out.loc[0, "keep"] == 1  # 0 >= threshold*0
    assert out.loc[3, "n_tokens"] == 0
    # 'word' appears 3x in a 3-token corpus: logprob = ln(1) = 0
    assert out.loc[1, "logprob_micro"] == 0
    assert out.loc[2, "logprob_micro"] == 0


def test_bpe_learn_exhausts_merges_gracefully(ray_session, tmp_path):
    """A corpus whose spellings collapse before `iterations` rounds must
    return fewer merges, not raise or emit zero-count merges."""
    from ieps_crawler_ray.pipelines.mlprep import corpus_bpe_learn

    sf = _tiny_docs_dir(tmp_path, ["ab ab", "ab"])
    out = corpus_bpe_learn(sf, iterations=5)
    # 'ab' has exactly one pair to merge; afterwards no pairs remain
    assert len(out) == 1
    assert out.iloc[0]["pair"] == "a b"
    # frequency-weighted: the word 'ab' occurs 3 times corpus-wide
    assert out.iloc[0]["merged_count"] == 3


def test_contamination_short_docs_no_bench(ray_session, tmp_path):
    """A corpus too short to yield any benchmark snippet: all clean."""
    from ieps_crawler_ray.pipelines.quality import \
        doc_benchmark_contamination

    sf = _tiny_docs_dir(tmp_path, ["short doc", "another short"])
    out = doc_benchmark_contamination(sf).to_pandas()
    assert (out["n_hits"] == 0).all()
    assert (out["contaminated"] == 0).all()


def test_vocab_growth_matches_local_scan(ray_session):
    """corpus_vocab_growth vs a sequential one-pass set-union scan."""
    import re

    import pyarrow.parquet as pq

    from ieps_crawler_ray.pipelines.quality import corpus_vocab_growth

    got = corpus_vocab_growth(SF_SMALL).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    t = pq.read_table(f"{SF_SMALL}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id")
    seen: set = set()
    rows = []
    for i, txt in zip(t["doc_id"], t["text"]):
        toks = set(re.findall(r"\w+", txt.lower()))
        new = toks - seen
        seen |= new
        rows.append((int(i), len(new), len(seen)))
    want = pd.DataFrame(rows,
                        columns=["doc_id", "new_tokens", "vocab_size"])
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


def test_vocab_growth_bucket_invariant(ray_session):
    from ieps_crawler_ray.pipelines.quality import corpus_vocab_growth

    a = corpus_vocab_growth(SF_SMALL, n_buckets=64).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = corpus_vocab_growth(SF_SMALL, n_buckets=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_vocab_growth_distributed_path_parity(ray_session, monkeypatch):
    """Force the over-limit exchange path and pin it to the adaptive
    driver-merge path (same policy-parity discipline as
    _clusters_adaptive)."""
    from ieps_crawler_ray.pipelines import quality as Qm

    a = Qm.corpus_vocab_growth(SF_SMALL).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(Qm, "_VOCAB_LOCAL_LIMIT_ROWS", 0)
    b = Qm.corpus_vocab_growth(SF_SMALL).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_token_entropy_matches_local_counter(ray_session):
    """corpus_token_entropy vs a driver-side Counter recompute of the
    identical micro-bit integer protocol (and a planted uniform corpus
    where the entropy is known in closed form)."""
    import math
    from collections import Counter

    from ieps_crawler_ray.functions import text as T

    got = Q.corpus_token_entropy(SF_SMALL)
    assert len(got) == 1
    docs = pd.read_parquet(os.path.join(SF_SMALL, "documents.parquet"),
                           columns=["text"])
    c = Counter()
    for t in docs["text"]:
        c.update(T.TOKEN_RE.findall(t.lower()))
    nt = sum(c.values())
    e = sum(n * math.floor(math.log2(n) * 1e6 + 0.5) for n in c.values())
    ent = math.floor((math.log2(float(nt)) - float(e) / float(nt) / 1e6)
                     * 1e6 + 0.5) / 1e6
    row = got.iloc[0]
    assert int(row["n_tokens"]) == nt
    assert int(row["n_types"]) == len(c)
    assert row["entropy_bits"] == ent
    assert int(row["ttr_micro"]) == len(c) * 1_000_000 // nt
    assert 0.0 < row["entropy_bits"] <= math.log2(len(c)) + 1e-9


def test_token_entropy_uniform_corpus(ray_session, tmp_path):
    """On a corpus of 8 equally-frequent tokens H must be exactly
    log2(8) = 3 bits (up to the micro-bit quantization)."""
    sf = _write_docs(tmp_path, ["t0 t1 t2 t3", "t4 t5 t6 t7",
                                "t0 t1 t2 t3", "t4 t5 t6 t7"])
    got = Q.corpus_token_entropy(sf)
    row = got.iloc[0]
    assert int(row["n_tokens"]) == 16 and int(row["n_types"]) == 8
    assert abs(row["entropy_bits"] - 3.0) < 1e-5
