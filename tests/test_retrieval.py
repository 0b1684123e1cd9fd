"""BM25 retrieval (stages/retrieval.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.retrieval import B, K1, bm25_topk


def _corpus():
    """Deterministic corpus with known term statistics."""
    rng = np.random.RandomState(11)
    vocab = ["alpha", "beta", "gamma", "delta", "noise"]
    docs = []
    for i in range(120):
        words = [vocab[j] for j in rng.randint(0, 5, size=20)]
        docs.append(" ".join(words))
    # plant a doc saturated with the rarest query term
    docs.append("zeta " * 15 + "zeta")
    return docs


def _reference_bm25(docs, terms, k):
    """Single-process reference implementation."""
    toks = [[t for t in d.split(" ") if t] for d in docs]
    n = len(toks)
    dl = np.array([len(t) for t in toks], float)
    avgdl = dl.mean()
    scores = np.zeros(n)
    for term in terms:
        tf = np.array([t.count(term) for t in toks], float)
        df = float((tf > 0).sum())
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        scores += idf * tf * (K1 + 1) / (
            tf + K1 * (1 - B + B * dl / avgdl)
        )
    scores = np.round(scores, 6)
    order = np.lexsort((np.arange(n), -scores))
    order = order[scores[order] > 0]
    return [(int(i), scores[i]) for i in order[:k]]


def _ds(docs, blocks=7):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    return rd.from_arrow(tbl).repartition(blocks)


def test_bm25_matches_reference():
    docs = _corpus()
    got = bm25_topk(_ds(docs), ["alpha", "zeta"], k=10).to_pandas()
    want = _reference_bm25(docs, ["alpha", "zeta"], 10)
    assert list(zip(got["doc_id"], got["score"])) == [
        (i, s) for i, s in want
    ]
    # the planted rare-term doc must dominate the ranking
    assert got["doc_id"].iloc[0] == len(docs) - 1


def test_bm25_deterministic_across_partitionings():
    docs = _corpus()
    a = bm25_topk(_ds(docs, blocks=2), ["beta", "gamma"], k=5).to_pandas()
    b = bm25_topk(_ds(docs, blocks=13), ["beta", "gamma"], k=5).to_pandas()
    assert a.equals(b)


def test_bm25_no_matches():
    docs = ["alpha beta", "gamma delta"]
    out = bm25_topk(_ds(docs, blocks=1), ["absent"], k=5).to_pandas()
    assert len(out) == 0


def test_rrf_fuse_hand_computed():
    import pyarrow as pa

    from theoremkb_ray.stages.retrieval import rrf_fuse

    # system A ranks: 10 (r1), 20 (r2), 30 (r3)
    a = pa.table(
        {"doc_id": pa.array([10, 20, 30], pa.int64()),
         "score": pa.array([3.0, 2.0, 1.0], pa.float64())}
    )
    # system B ranks: 20 (r1), 40 (r2)
    b = pa.table(
        {"doc_id": pa.array([20, 40], pa.int64()),
         "score": pa.array([9.0, 8.0], pa.float64())}
    )
    out = rrf_fuse([a, b], k=10, c=60).to_pandas()
    got = dict(zip(out["doc_id"], out["rrf"]))
    assert got == {
        10: round(1 / 61, 6),
        20: round(1 / 62 + 1 / 61, 6),
        30: round(1 / 63, 6),
        40: round(1 / 62, 6),
    }
    # fused order: 20 first (two contributions)
    assert out["doc_id"].iloc[0] == 20


def test_rrf_tie_breaks_by_id_and_score_ties_by_id():
    import pyarrow as pa

    from theoremkb_ray.stages.retrieval import rrf_fuse

    # equal scores inside a system -> rank by doc_id ascending
    a = pa.table(
        {"doc_id": pa.array([7, 3], pa.int64()),
         "score": pa.array([1.0, 1.0], pa.float64())}
    )
    out = rrf_fuse([a], k=10).to_pandas()
    assert list(out["doc_id"]) == [3, 7]  # 3 ranked 1st, equal-rrf tie -> id
