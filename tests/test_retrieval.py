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
