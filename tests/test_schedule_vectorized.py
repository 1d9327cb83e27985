"""Equivalence of the vectorized batch scheduler vs the pure per-domain
reference implementation (the oracle's semantics — SURVEY.md §2.6/O1)."""

import numpy as np
import pandas as pd
import pytest

from ieps_crawler_ray.functions.schedule import (schedule_batch_df,
                                                 schedule_domain_rows)

COLS = ["url", "domain", "kind", "parent_url", "p_dom", "p_seq", "cls",
        "pos", "con_type", "alt", "seen", "allowed", "delay_ms"]


def random_batch(seed: int, n_domains: int = 4, n_rows: int = 200):
    rng = np.random.default_rng(seed)
    doms = [f"d{i}.gov.si" for i in range(n_domains)]
    rows = []
    for _ in range(n_rows):
        dom = doms[int(rng.integers(n_domains))]
        kind = int(rng.choice([0, 0, 0, 1, 2]))
        url = (f"http://{dom}/p/{int(rng.integers(30))}/" if kind == 0
               else f"http://{dom}/m/{int(rng.integers(12))}.bin")
        rows.append({
            "url": url, "domain": dom, "kind": kind,
            "parent_url": f"http://{dom}/p/{int(rng.integers(30))}/",
            "p_dom": dom if rng.random() < 0.9 else "",
            "p_seq": int(rng.integers(-1, 20)),
            "cls": int(rng.integers(-1, 3)), "pos": int(rng.integers(8)),
            "con_type": None, "alt": None,
            "seen": bool(rng.random() < 0.25),
            "allowed": bool(rng.random() < 0.85),
            "delay_ms": int(rng.choice([1000, 2000, 4000])),
        })
    return pd.DataFrame(rows, columns=COLS)


def reference_schedule(df: pd.DataFrame, state: dict, seeds: list):
    outs = []
    for dom, g in df.groupby("domain", sort=True):
        clock, nseq, download = state.get(
            dom, (0, 0, any(dom in s for s in seeds)))
        sched, clock, nseq = schedule_domain_rows(
            g.to_dict("records"), clock, nseq, download)
        if not sched:
            continue
        out = pd.DataFrame(sched)
        out["download"] = download
        out["clock_after"] = clock
        out["next_seq_after"] = nseq
        outs.append(out)
    if not outs:
        return pd.DataFrame()
    return pd.concat(outs, ignore_index=True)


CHECK = ["url", "domain", "kind", "seq", "fetch_time", "stores_page",
         "first_in_round", "round_first_parent", "download",
         "clock_after", "next_seq_after"]


@pytest.mark.parametrize("seed", range(8))
def test_vectorized_matches_reference(seed):
    df = random_batch(seed)
    state = {"d0.gov.si": (123456, 17, True),
             "d1.gov.si": (0, 0, False)}
    seeds = ["http://d2.gov.si/p/0/"]
    ref = reference_schedule(df, state, seeds)
    vec = schedule_batch_df(df, state, seeds)
    assert len(ref) == len(vec)
    if not len(ref):
        return
    key = ["domain", "seq"]
    r = ref[CHECK].sort_values(key).reset_index(drop=True)
    v = vec[CHECK].sort_values(key).reset_index(drop=True)
    for c in CHECK:
        rc = r[c].where(pd.notna(r[c]), None).tolist()
        vc = v[c].where(pd.notna(v[c]), None).tolist()
        assert rc == vc, f"column {c} differs (seed {seed})"


def test_vectorized_empty():
    df = random_batch(0).iloc[0:0]
    out = schedule_batch_df(df, {}, [])
    assert len(out) == 0
