"""Product-quantization ANN (stages/pq.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.pq import (
    _subspaces,
    deterministic_codebooks,
    pq_encode,
    pq_topk,
    pq_train,
)


def _blobs(n=400, d=32, k=8, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 5
    X = centers[np.arange(n) % k] + rng.randn(n, d) * 0.4
    return np.arange(n, dtype=np.int64), X.astype(np.float32)


def _ds(ids, X, blocks=6):
    order = np.argsort((ids * 2654435761) % 97, kind="stable")
    tbl = pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X[order].ravel(), pa.float32()), X.shape[1]
            ),
        }
    )
    return rd.from_arrow(tbl).repartition(blocks)


def test_encode_matches_local():
    ids, X = _blobs()
    ds = _ds(ids, X)
    books = pq_train(ds, m=4, ks=16)
    got = (
        pq_encode(ds, books)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    codes = np.stack(got["codes"].to_numpy())
    # local reference encoding
    subs = _subspaces(X.astype(np.float64), 4)
    for j in range(4):
        d2 = (
            (subs[j] ** 2).sum(1)[:, None]
            - 2 * subs[j] @ books[j].T
            + (books[j] ** 2).sum(1)[None, :]
        )
        assert (codes[:, j] == d2.argmin(1)).all()


def test_adc_distances_and_cluster_recall():
    ids, X = _blobs(n=600, d=32)
    ds = _ds(ids, X)
    rng = np.random.RandomState(9)
    qsel = rng.choice(len(X), 5, replace=False)
    Q = X[qsel] + 0.01
    books = pq_train(ds, m=8, ks=32)
    codes_ds = pq_encode(ds, books).materialize()
    approx = pq_topk(codes_ds, books, Q, k=10).to_pandas()

    # reference: exact ADC distance = |query - reconstructed(codes)|²
    codes_df = codes_ds.to_pandas().set_index("vec_id")
    m = books.shape[0]
    for qi in range(5):
        qsubs = _subspaces(Q[qi : qi + 1].astype(np.float64), m)[:, 0, :]
        rows = approx[approx["query_id"] == qi]
        assert len(rows) == 10
        for _, r in rows.iterrows():
            code = np.asarray(codes_df.loc[r["vec_id"], "codes"])
            want = sum(
                ((qsubs[j] - books[j][code[j]]) ** 2).sum()
                for j in range(m)
            )
            assert abs(r["adist"] - want) < 1e-9
        # blob-level recall: every neighbor from the query's own blob
        blob = qsel[qi] % 8
        assert (rows["vec_id"] % 8 == blob).all()


def test_pq_topk_agrees_with_brute_on_reconstructions():
    """When the corpus IS its own codebook reconstruction (every vector
    a codebook entry), ADC is exact — top-k must equal brute L2 top-k."""
    rng = np.random.RandomState(2)
    base = rng.randn(16, 16).astype(np.float32)
    ids = np.arange(200, dtype=np.int64)
    X = base[ids % 16]
    ds = _ds(ids, X, blocks=4)
    books = deterministic_codebooks(ds, m=4, ks=16)
    # smallest-16 ids cover all 16 distinct rows (ids 0..15)
    codes_ds = pq_encode(ds, books).materialize()
    Q = base[:3] + rng.randn(3, 16).astype(np.float32) * 0.05
    approx = pq_topk(codes_ds, books, Q, k=20).to_pandas()
    for qi in range(3):
        got = set(approx[approx["query_id"] == qi]["vec_id"])
        # exact L2 top-20 computed locally
        d2 = ((X.astype(np.float64) - Q[qi].astype(np.float64)) ** 2).sum(1)
        # ties: distances are identical within each residue class, so
        # compare the SET of distances instead of ids
        want_d = np.round(np.sort(d2)[:20], 9)
        got_d = np.round(
            np.sort(
                approx[approx["query_id"] == qi]["adist"].to_numpy()
            ),
            9,
        )
        assert np.array_equal(want_d, got_d)
        assert len(got) == 20


def test_deterministic_codebooks_partition_invariant():
    ids, X = _blobs(n=100, d=16)
    b1 = deterministic_codebooks(_ds(ids, X, blocks=2), m=4, ks=8)
    b2 = deterministic_codebooks(_ds(ids, X, blocks=11), m=4, ks=8)
    assert np.array_equal(b1, b2)


def test_ivfpq_recall_and_adc_exactness():
    from theoremkb_ray.stages.pq import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )

    ids, X = _blobs(n=800, d=32, k=8, seed=13)
    ds = _ds(ids, X, blocks=5)
    coarse, books = ivfpq_train(ds, num_centroids=8, m=8, ks=16)
    codes_ds = ivfpq_encode(ds, coarse, books).materialize()
    rng = np.random.RandomState(21)
    qsel = rng.choice(len(X), 4, replace=False)
    Q = X[qsel] + 0.01
    got = ivfpq_topk(codes_ds, coarse, books, Q, k=10, nprobe=2).to_pandas()

    codes_df = codes_ds.to_pandas().set_index("vec_id")
    m = books.shape[0]
    for qi in range(4):
        rows = got[got["query_id"] == qi]
        assert len(rows) == 10
        # blob-level recall: nprobe=2 must cover the query's own blob
        blob = qsel[qi] % 8
        assert (rows["vec_id"] % 8 == blob).mean() >= 0.9
        # ADC distance == |q - (coarse[c] + reconstructed residual)|²
        q64 = Q[qi].astype(np.float64)
        for _, r in rows.iterrows():
            rec = codes_df.loc[r["vec_id"]]
            c = int(rec["centroid"])
            code = np.asarray(rec["codes"])
            recon = coarse[c] + np.concatenate(
                [books[j][code[j]] for j in range(m)]
            )
            want = ((q64 - recon) ** 2).sum()
            assert abs(r["adist"] - want) < 1e-9


def test_ivfpq_probed_lists_only():
    from theoremkb_ray.stages.pq import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )

    ids, X = _blobs(n=400, d=16, k=4, seed=17)
    ds = _ds(ids, X, blocks=3)
    coarse, books = ivfpq_train(ds, num_centroids=4, m=4, ks=8)
    codes_ds = ivfpq_encode(ds, coarse, books).materialize()
    Q = X[:2] + 0.01
    out = ivfpq_topk(
        codes_ds, coarse, books, Q, k=5, nprobe=1
    ).to_pandas()
    codes_df = codes_ds.to_pandas().set_index("vec_id")
    # with nprobe=1 every returned vector sits in the query's single
    # probed coarse list
    for qi in range(2):
        q64 = Q[qi].astype(np.float64)
        probe = int(((q64[None, :] - coarse) ** 2).sum(1).argmin())
        rows = out[out["query_id"] == qi]
        assert (codes_df.loc[rows["vec_id"], "centroid"] == probe).all()
