"""Distributed embedding clustering (Lloyd k-means) + SemDedup pruning.

The curation step the reference approximates with its GloVe/autoencoder
similarity notebooks (reference: Styling/tools/thm_similarity/
model_autoencodeur.py:30-74 trains on an in-memory matrix) re-expressed
for a corpus that does not fit anywhere: k-means where every iteration
is ONE ``map_batches`` pass emitting k×(d+2) partial sums per block,
folded on the driver (the k·d centroid state is tiny and
cluster-count-bounded, never corpus-bounded), and SemDedup-style
near-duplicate pruning (Abbas et al. 2023, arXiv:2303.09540) that
shuffles rows ONCE by centroid and prunes inside each cluster with a
chunked cosine kernel — all-pairs work is bounded by cluster size,
never corpus size.

Scale contract:
- centroids are broadcast via ``ray.put`` once per iteration and
  fetched once per worker process (`state/broadcast.py`), never
  re-shipped per batch;
- the per-iteration driver fold receives k rows per *block* (cluster
  sums), i.e. O(blocks · k · d) doubles streamed, independent of rows;
- SemDedup's per-cluster matrix is computed in ``chunk × n`` strips,
  so peak memory is ``chunk · |cluster| · 8`` bytes; pick
  ``num_clusters`` so clusters stay ~corpus/k — the paper's operating
  point (50k clusters for 5B embeddings) keeps |cluster| ~1e5.

All distance arithmetic is float64 on exactly-widened float32 input,
matching a SQL engine that casts the column to DOUBLE[] — the
``kmeans_assign`` query is value-hash-checked against DuckDB
``list_distance`` (see pipelines/relational.py:SQL_KMEANS_ASSIGN).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.broadcast import get_broadcast
from .similarity import _stack64


def _assign_dist2(X: np.ndarray, C: np.ndarray):
    """(assignments, squared distances to own centroid).

    Matmul form ``|x|² - 2x·c + |c|²``: one GEMM instead of an
    (n, k, d) difference tensor. Ties go to the smallest cluster id
    (argmin first-hit), matching SQL ``ORDER BY dist, cluster``."""
    d2 = (
        (X * X).sum(1)[:, None]
        - 2.0 * (X @ C.T)
        + (C * C).sum(1)[None, :]
    )
    np.maximum(d2, 0.0, out=d2)
    a = d2.argmin(1)
    return a, d2[np.arange(len(X)), a]


def deterministic_centroids(
    ds, k: int, id_col: str = "vec_id", col: str = "embedding"
) -> np.ndarray:
    """Initial centroids = vectors of the k smallest ids.

    Deterministic under any partitioning AND SQL-expressible (ORDER BY
    id LIMIT k), which is what lets the assignment step be
    oracle-checked. Per-block partial top-k prunes before the global
    sort, so only ``blocks × k`` rows ever move."""

    def prune(b: pa.Table) -> pa.Table:
        if b.num_rows > k:
            ids = b[id_col].to_numpy(zero_copy_only=False)
            keep = np.sort(np.argpartition(ids, k)[:k])
            b = b.take(pa.array(keep))
        return b

    head = (
        ds.select_columns([id_col, col])
        .map_batches(prune, batch_format="pyarrow")
        .sort(id_col)
        .limit(k)
    )
    tbl = pa.concat_tables(
        head.iter_batches(batch_format="pyarrow", batch_size=k)
    )
    return _stack64(tbl[col])


def kmeans_fit(
    ds,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Full-corpus Lloyd k-means -> (centroids (k, d) float64, inertia).

    Unlike ``similarity.train_centroids`` (bounded driver SAMPLE — the
    IVF coarse quantizer), every iteration here sees every row: one
    streamed ``map_batches`` pass computes per-block per-cluster
    (count, vector-sum, inertia) partials; the driver folds them and
    re-broadcasts the k×d centroid block. Empty clusters keep their
    previous centroid. Deterministic up to float summation order of
    the partial fold (~1e-15 relative between block layouts)."""
    vecs = ds.select_columns([col]).materialize()
    C = deterministic_centroids(ds, k, id_col, col)
    inertia = float("nan")
    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(b: pa.Table) -> pa.Table:
            Ck = get_broadcast(c_ref)
            X = _stack64(b[col])
            a, d2 = _assign_dist2(X, Ck)
            kk, d = Ck.shape
            cnt = np.bincount(a, minlength=kk)
            sums = np.zeros((kk, d))
            np.add.at(sums, a, X)
            inert = np.bincount(a, weights=d2, minlength=kk)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(kk), pa.int64()),
                    "n": pa.array(cnt, pa.int64()),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                    "inertia": pa.array(inert, pa.float64()),
                }
            )

        cnt = np.zeros(len(C), np.int64)
        sums = np.zeros_like(C)
        inertia = 0.0
        for b in vecs.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            cl = b["cluster"].to_numpy(zero_copy_only=False)
            cnt_b = b["n"].to_numpy(zero_copy_only=False)
            np.add.at(cnt, cl, cnt_b)
            np.add.at(sums, cl, _stack64(b["vsum"]))
            inertia += float(
                b["inertia"].to_numpy(zero_copy_only=False).sum()
            )
        nz = cnt > 0
        C = C.copy()
        C[nz] = sums[nz] / cnt[nz, None]
    return C, inertia


class KMeansAssigner:
    """Actor-shaped batch fn: centroids fetched once per worker.

    Appends ``cluster`` (int64) and ``dist`` (float64 Euclidean,
    rounded to 6 dp — the shared engine/oracle precision contract,
    see similarity.cosine_pairs)."""

    def __init__(self, c_ref, col: str = "embedding") -> None:
        self.C = ray.get(c_ref)
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _stack64(batch[self.col])
        a, d2 = _assign_dist2(X, self.C)
        return batch.append_column(
            "cluster", pa.array(a.astype(np.int64))
        ).append_column(
            "dist", pa.array(np.round(np.sqrt(d2), 6), pa.float64())
        )


def kmeans_assign(ds, centroids: np.ndarray, col: str = "embedding"):
    """Assign every row to its nearest centroid (L2). Returns the
    input columns + ``cluster`` + ``dist``."""
    c_ref = ray.put(np.ascontiguousarray(centroids, np.float64))
    return ds.map_batches(
        KMeansAssigner,
        fn_constructor_args=(c_ref, col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )


def _prune_cluster(
    tbl: pa.Table,
    threshold: float,
    id_col: str,
    col: str,
    chunk: int = 512,
) -> pa.Table:
    """Drop every row cosine-similar (>= threshold) to a SMALLER-id row
    of the same cluster; emit (id, cluster, kept_id, cosine) for each
    dropped row. Keep-smallest-id is order- and partition-independent
    (same rule as the exact-dedup family, stages/dedup.py). The strip
    loop bounds memory at chunk×|cluster| floats."""
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    V = _stack64(tbl[col])[order]
    nrm = np.linalg.norm(V, axis=1)
    nrm[nrm == 0] = np.inf
    V = V / nrm[:, None]
    n = len(ids)
    out_id: list[np.ndarray] = []
    out_kept: list[np.ndarray] = []
    out_cos: list[np.ndarray] = []
    for s in range(1, n, chunk):
        e = min(s + chunk, n)
        S = V[s:e] @ V[:e].T
        # strict lower triangle by GLOBAL row index: col j counts only
        # for rows with j < s + r (smaller id, since sorted)
        hit = (S >= threshold) & (
            np.arange(e)[None, :] < np.arange(s, e)[:, None]
        )
        anyhit = hit.any(1)
        first = hit.argmax(1)  # first True == smallest similar id
        rows = np.flatnonzero(anyhit)
        out_id.append(ids[s + rows])
        out_kept.append(ids[first[rows]])
        out_cos.append(S[rows, first[rows]])
    cl = tbl["cluster"][0].as_py() if n else 0
    oid = np.concatenate(out_id) if out_id else np.empty(0, np.int64)
    okept = np.concatenate(out_kept) if out_kept else np.empty(0, np.int64)
    ocos = np.concatenate(out_cos) if out_cos else np.empty(0)
    return pa.table(
        {
            "vec_id": pa.array(oid, pa.int64()),
            "cluster": pa.array(
                np.full(len(oid), cl, np.int64), pa.int64()
            ),
            "kept_id": pa.array(okept, pa.int64()),
            "cosine": pa.array(
                np.round(ocos.astype(np.float64), 6), pa.float64()
            ),
        }
    )


def semdedup(
    ds,
    num_clusters: int = 10,
    threshold: float = 0.9,
    iters: int = 5,
    id_col: str = "vec_id",
    col: str = "embedding",
    centroids: "np.ndarray | None" = None,
):
    """SemDedup: cluster the embedding space, prune near-duplicates
    inside each cluster only (arXiv:2303.09540). Returns a Dataset of
    DROPPED rows ``(vec_id, cluster, kept_id, cosine)``.

    Cross-cluster duplicates are missed by design — that is the
    trade the paper makes to avoid the corpus-scale all-pairs join;
    recall is a function of ``num_clusters`` (planted-dup recall is
    asserted in tests/test_cluster.py). The per-cluster exchange is
    the disk-spool path (state/spool.py), not a sort-shuffle."""
    from ..state.spool import spooled_group_map

    if centroids is None:
        centroids, _ = kmeans_fit(ds, num_clusters, iters, id_col, col)
    assigned = kmeans_assign(ds, centroids, col).drop_columns(["dist"])

    def prune(tbl: pa.Table) -> pa.Table:
        return _prune_cluster(tbl, threshold, id_col, col)

    return spooled_group_map(assigned, "cluster", prune)


def grouped_centroids(ds, group_col: str = "label", col: str = "embedding"):
    """Per-group mean embedding (class centroids — the building block
    of nearest-class-mean classification and the per-cluster prototype
    SemDedup keeps).

    -> Dataset(group, n, centroid fixed_size_list<double>). One
    streamed pass emits per-block per-group (count, sum-vector)
    partials; the partial rows (blocks × groups, never corpus-sized)
    fold inside a ``groupby(group)`` — group cardinality bounds the
    exchange, row count never does. The `embedding_centroids` query
    flattens to (label, dim, centroid) and is value-hash-checked
    against DuckDB unnest + generate_subscripts + avg.
    """
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        X = _stack64(b[col])
        g = b[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(g, return_inverse=True)
        cnt = np.bincount(inv)
        sums = np.zeros((len(u), X.shape[1]))
        np.add.at(sums, inv, X)
        return pa.table(
            {
                group_col: pa.array(u, pa.int64()),
                "n": pa.array(cnt, pa.int64()),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), pa.float64()), X.shape[1]
                ),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        S = np.stack([np.asarray(v, np.float64) for v in g["sums"]])
        n = int(g["n"].sum())
        c = S.sum(axis=0) / n
        return pd.DataFrame(
            {
                group_col: [int(g[group_col].iloc[0])],
                "n": [n],
                "centroid": [c.tolist()],
            }
        )

    return (
        ds.select_columns([group_col, col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(fold, batch_format="pandas")
    )
