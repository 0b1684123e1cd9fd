"""MMR diverse top-k (stages/similarity.py:mmr_topk) vs a literal
greedy reference over the same candidate pool."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.similarity import mmr_topk


def _mk(n=40, d=8, seed=3):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, d)).astype(np.float32)
    # plant near-duplicates of vector 0 so plain top-k would pick copies
    for j in (1, 2, 3):
        V[j] = V[0] + rng.normal(scale=0.01, size=d).astype(np.float32)
    return V


def _ref_mmr(V, q, k, fetch, lam):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    rel = Vn @ qn
    # same prefilter: top-fetch by (score desc, id asc) on 6dp-rounded
    order = np.lexsort((np.arange(len(V)), -np.round(rel, 6)))[:fetch]
    ids = order.copy()
    relc = rel[ids]
    chosen, max_sim = [], np.full(len(ids), -np.inf)
    picked = np.zeros(len(ids), bool)
    for _ in range(k):
        score = lam * relc - (1 - lam) * max_sim if chosen else lam * relc
        score = np.where(picked, -np.inf, score)
        best = np.lexsort((ids, -score))[0]
        chosen.append(ids[best])
        picked[best] = True
        max_sim = np.maximum(max_sim, (Vn[ids] @ Vn[ids[best]]))
    return chosen


def test_mmr_matches_reference_and_diversifies():
    V = _mk()
    q = V[0].astype(np.float64)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(V)), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in V],
                    pa.list_(pa.float32()),
                ),
            }
        )
    ).repartition(4)
    out = mmr_topk(ds, q, k=8, fetch=20, lam=0.7).to_pandas()
    want = _ref_mmr(V.astype(np.float64), q, 8, 20, 0.7)
    assert out["vec_id"].tolist() == [int(w) for w in want]
    assert out["rank"].tolist() == list(range(1, 9))
    # diversification: at lam=0.3 the redundancy penalty dominates, so
    # the three near-copies of 0 must NOT all sit in the top-4 (plain
    # top-k — and lam=1.0 — puts 0,1,2,3 first)
    plain = mmr_topk(ds, q, k=4, fetch=20, lam=1.0).to_pandas()
    assert set(plain["vec_id"]) == {0, 1, 2, 3}
    div = mmr_topk(ds, q, k=4, fetch=20, lam=0.3).to_pandas()
    assert not {0, 1, 2, 3} <= set(div["vec_id"])
    want_div = _ref_mmr(V.astype(np.float64), q, 4, 20, 0.3)
    assert div["vec_id"].tolist() == [int(w) for w in want_div]
