"""Distributed k-means + SemDedup (stages/cluster.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.stages.cluster import (
    _assign_dist2,
    deterministic_centroids,
    kmeans_assign,
    kmeans_fit,
    semdedup,
)


def _synth_embeddings(
    n: int = 300, d: int = 16, k: int = 4, seed: int = 3
):
    """k Gaussian blobs; returns (ids, X float32)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 4
    X = centers[np.arange(n) % k] + rng.randn(n, d) * 0.3
    return np.arange(n, dtype=np.int64), X.astype(np.float32)


def _ds(ids, X, blocks: int = 5):
    # deliberately scrambled row order across blocks: every result
    # below must be partition-independent
    perm = np.random.RandomState(9).permutation(len(ids))
    t = pa.table(
        {
            "vec_id": pa.array(ids[perm], pa.int64()),
            "embedding": pa.array(
                list(X[perm]), pa.list_(pa.float32())
            ),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def _local_lloyd(ids, X, k, iters):
    """Single-process reference Lloyd with the same init rule."""
    Xd = X.astype(np.float64)
    order = np.argsort(ids)
    C = Xd[order[:k]].copy()
    for _ in range(iters):
        a, _d2 = _assign_dist2(Xd, C)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = Xd[m].mean(0)
    a, d2 = _assign_dist2(Xd, C)
    return C, a, d2


def test_deterministic_centroids_are_smallest_ids():
    ids, X = _synth_embeddings()
    C = deterministic_centroids(_ds(ids, X), 6)
    np.testing.assert_array_equal(
        C, X[np.argsort(ids)[:6]].astype(np.float64)
    )


def test_kmeans_fit_matches_local_reference():
    ids, X = _synth_embeddings()
    C, inertia = kmeans_fit(_ds(ids, X), k=4, iters=5)
    C_ref, a_ref, d2_ref = _local_lloyd(ids, X, 4, 5)
    # centroid fold order differs between block layouts -> ulp-level
    np.testing.assert_allclose(C, C_ref, rtol=1e-12, atol=1e-12)
    assert inertia == pytest.approx(d2_ref_prev_iter(ids, X), rel=1e-9)


def d2_ref_prev_iter(ids, X, k=4, iters=5):
    """Inertia reported by kmeans_fit is measured against the
    START-of-last-iteration centroids (the partial pass both assigns
    and folds); reproduce that here."""
    Xd = X.astype(np.float64)
    order = np.argsort(ids)
    C = Xd[order[:k]].copy()
    for it in range(iters):
        a, d2 = _assign_dist2(Xd, C)
        last = d2.sum()
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = Xd[m].mean(0)
    return last


def test_kmeans_assign_matches_reference_and_recovers_blobs():
    ids, X = _synth_embeddings()
    C_ref, a_ref, _ = _local_lloyd(ids, X, 4, 5)
    out = (
        kmeans_assign(_ds(ids, X), C_ref)
        .drop_columns(["embedding"])
        .to_pandas()
        .sort_values("vec_id")
    )
    np.testing.assert_array_equal(out["cluster"].to_numpy(), a_ref)
    # blobs are well-separated: every true blob maps to ONE cluster
    true = ids % 4
    for b in range(4):
        assert len(set(a_ref[true == b])) == 1


def test_semdedup_drops_planted_near_duplicates():
    ids, X = _synth_embeddings(n=200, d=16, k=4)
    # plant 20 near-dups: copies of rows 0..19 with tiny noise, ids
    # above every original id
    rng = np.random.RandomState(7)
    dup_src = np.arange(20)
    dup_ids = 1000 + np.arange(20)
    dup_X = X[dup_src] + rng.randn(20, 16).astype(np.float32) * 1e-3
    all_ids = np.concatenate([ids, dup_ids])
    all_X = np.concatenate([X, dup_X])
    dropped = semdedup(
        _ds(all_ids, all_X), num_clusters=4, threshold=0.99
    ).to_pandas()
    got = set(dropped["vec_id"])
    # every planted dup is dropped; its keeper has a smaller id
    assert set(dup_ids) <= got
    kept = dict(zip(dropped["vec_id"], dropped["kept_id"]))
    for did, src in zip(dup_ids, dup_src):
        assert kept[did] < did
    # no false positives outside the blobs' natural near-pairs at
    # this threshold: everything dropped is cosine >= 0.99 to keeper
    assert (dropped["cosine"] >= 0.99).all()


def test_semdedup_partition_independent():
    ids, X = _synth_embeddings(n=150, d=8, k=3)
    a = (
        semdedup(_ds(ids, X, blocks=2), num_clusters=3, threshold=0.95)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        semdedup(_ds(ids, X, blocks=7), num_clusters=3, threshold=0.95)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
