"""Weighted sampling (sampling.py:weighted_sample) and grouped
centroids (cluster.py:grouped_centroids)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.cluster import grouped_centroids
from theoremkb_ray.stages.sampling import weighted_sample


def _docs_ds(ids, w, blocks=5):
    tbl = pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, np.int64)),
            "n_chars": pa.array(np.asarray(w, np.int64)),
        }
    )
    return rd.from_arrow(tbl).repartition(blocks)


def _local_weighted(ids, w, k):
    r = (np.asarray(ids).astype(np.uint64) * np.uint64(2654435761)) % (
        np.uint64(1 << 32)
    )
    u = (r.astype(np.float64) + 1.0) / float((1 << 32) + 1)
    e = -np.log(u) / np.asarray(w, np.float64)
    order = np.lexsort((ids, e))
    return [int(ids[i]) for i in order[:k]]


def test_weighted_sample_matches_local_and_partition_invariant():
    rng = np.random.RandomState(0)
    ids = np.arange(1000, dtype=np.int64)
    w = rng.randint(1, 500, size=1000)
    a = weighted_sample(_docs_ds(ids, w, blocks=3), "doc_id", "n_chars", k=30).to_pandas()
    b = weighted_sample(_docs_ds(ids, w, blocks=17), "doc_id", "n_chars", k=30).to_pandas()
    assert list(a["doc_id"]) == _local_weighted(ids, w, 30)
    assert a.equals(b)


def test_weighted_sample_bias_toward_heavy_rows():
    ids = np.arange(2000, dtype=np.int64)
    w = np.where(ids % 2 == 0, 100, 1)
    got = weighted_sample(_docs_ds(ids, w), "doc_id", "n_chars", k=200).to_pandas()
    heavy = (got["doc_id"] % 2 == 0).sum()
    # heavy rows are 100x likelier per draw; expect the vast majority
    assert heavy > 180, heavy


def _emb_ds(g, X, blocks=6):
    tbl = pa.table(
        {
            "label": pa.array(np.asarray(g, np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.ravel(), pa.float32()), X.shape[1]
            ),
        }
    )
    return rd.from_arrow(tbl).repartition(blocks)


def test_grouped_centroids_match_numpy():
    rng = np.random.RandomState(4)
    g = rng.randint(0, 7, size=400)
    X = rng.randn(400, 24).astype(np.float32)
    out = (
        grouped_centroids(_emb_ds(g, X), "label", "embedding")
        .to_pandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        sel = g == row["label"]
        want = X[sel].astype(np.float64).mean(axis=0)
        got = np.asarray(row["centroid"], np.float64)
        assert row["n"] == int(sel.sum())
        assert np.allclose(got, want, atol=1e-12)


def test_grouped_centroids_partition_invariant_rounded():
    rng = np.random.RandomState(8)
    g = rng.randint(0, 3, size=200)
    X = rng.randn(200, 8).astype(np.float32)
    a = grouped_centroids(_emb_ds(g, X, 2), "label", "embedding").to_pandas()
    b = grouped_centroids(_emb_ds(g, X, 13), "label", "embedding").to_pandas()
    a = a.sort_values("label").reset_index(drop=True)
    b = b.sort_values("label").reset_index(drop=True)
    for x, y in zip(a["centroid"], b["centroid"]):
        assert np.allclose(
            np.asarray(x), np.asarray(y), atol=1e-10
        )  # partial-fold order differs; equality is up to fp assoc
