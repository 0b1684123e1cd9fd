"""Product-quantization ANN — the compressed-domain scale path for
similarity search.

At 100 TB a float32 embedding column cannot be re-scanned per query
(`similarity.brute_topk`) and even IVF (`similarity.ivf_topk`) still
stores full-precision vectors. PQ (Jégou et al. 2011, "Product
quantization for nearest neighbor search") stores ``m`` one-byte codes
per vector — 32× compression at d=64/m=8 — and answers queries with
asymmetric distance computation (ADC): a per-query (m, ks) lookup
table built ONCE, then each candidate's distance is ``m`` table
lookups + adds, no float vector ever touched again.

Scale shape:
- codebook training is bounded (driver sample, like the IVF coarse
  quantizer) — cost independent of corpus size;
- encoding is one streamed ``map_batches`` pass (m small GEMMs per
  batch via the ``|x|²-2xc+|c|²`` form), emitting 8-byte ids + m-byte
  codes — the ONLY thing the store keeps;
- queries broadcast the (q, m, ks) LUT once (``ray.put`` +
  per-worker-process cache) and scan the code table with vectorized
  ``np.take`` + top-k per batch, merged by a tiny sort.

The encode step with DETERMINISTIC codebooks (subvectors of the ks
smallest ids) is SQL-expressible and value-hash-checked (`pq_codes`
oracle, pipelines/relational.py: DuckDB list-slice + list_distance).
All distance arithmetic is float64 over exactly-widened float32, ties
to the smallest code id, matching SQL ``ORDER BY dist, code``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.broadcast import get_broadcast
from .cluster import _assign_dist2, deterministic_centroids
from .similarity import _stack64


def _subspaces(X: np.ndarray, m: int) -> np.ndarray:
    """(n, d) -> (m, n, d/m) view (no copy)."""
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    return X.reshape(n, m, d // m).transpose(1, 0, 2)


def deterministic_codebooks(
    ds, m: int = 8, ks: int = 16, id_col: str = "vec_id",
    col: str = "embedding",
) -> np.ndarray:
    """(m, ks, d/m) codebooks = subvectors of the ks smallest ids —
    the SQL-expressible initialisation used by the `pq_codes` oracle."""
    C = deterministic_centroids(ds, ks, id_col, col)  # (ks, d) float64
    return np.ascontiguousarray(_subspaces(C, m))


def pq_train(
    ds,
    m: int = 8,
    ks: int = 16,
    col: str = "embedding",
    sample_limit: int = 20_000,
    iters: int = 10,
) -> np.ndarray:
    """(m, ks, d/m) codebooks via per-subspace Lloyd k-means on a
    BOUNDED driver sample (same contract as `similarity.train_centroids`
    — training cost independent of corpus size). Deterministic: seeds
    are the first ks sample rows, Lloyd is seed-determined."""
    sample = ds.limit(sample_limit).select_columns([col]).to_pandas()
    X = np.stack([np.asarray(v, np.float32) for v in sample[col]]).astype(
        np.float64
    )
    subs = _subspaces(X, m)
    books = np.empty((m, ks, X.shape[1] // m))
    for j in range(m):
        S = subs[j]
        C = S[: min(ks, len(S))].copy()
        for _ in range(iters):
            a, _ = _assign_dist2(S, C)
            for c in range(len(C)):
                sel = a == c
                if sel.any():
                    C[c] = S[sel].mean(axis=0)
        books[j, : len(C)] = C
        if len(C) < ks:  # degenerate tiny sample: repeat last centroid
            books[j, len(C):] = C[-1]
    return books


class PQEncoder:
    """Actor: codebooks fetched once; per batch m small GEMM argmins."""

    def __init__(self, books_ref, id_col: str, col: str) -> None:
        self.books = get_broadcast(books_ref)  # (m, ks, dsub)
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _stack64(batch[self.col])
        m = self.books.shape[0]
        subs = _subspaces(X, m)
        codes = np.empty((X.shape[0], m), dtype=np.int64)
        for j in range(m):
            codes[:, j], _ = _assign_dist2(subs[j], self.books[j])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), pa.int64()), m
                ),
            }
        )


def pq_encode(
    ds,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    col: str = "embedding",
    concurrency=(1, 8),
    batch_size: int = 4096,
):
    """-> Dataset(id, codes fixed_size_list<int64>[m]): the compressed
    store. One streamed pass; output is ids + m-byte-equivalent codes."""
    books_ref = ray.put(np.ascontiguousarray(codebooks))
    return ds.select_columns([id_col, col]).map_batches(
        PQEncoder,
        fn_constructor_args=(books_ref, id_col, col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ADCScorer:
    """Actor: per-query LUT built once in __init__; per batch the
    approximate distance is m gathers + adds per candidate."""

    def __init__(self, books_ref, q_ref, k: int, id_col: str) -> None:
        books = get_broadcast(books_ref)  # (m, ks, dsub)
        Q = np.asarray(ray.get(q_ref), np.float32).astype(np.float64)
        m = books.shape[0]
        qsubs = _subspaces(Q, m)  # (m, q, dsub)
        # LUT[qi, j, c] = |q_sub - book| squared
        self.lut = np.stack(
            [
                ((qsubs[j][:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
                for j in range(m)
            ],
            axis=1,
        )  # (q, m, ks)
        self.k, self.id_col = k, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        codes_col = batch["codes"]
        arr = (
            codes_col.combine_chunks()
            if isinstance(codes_col, pa.ChunkedArray)
            else codes_col
        )
        m = self.lut.shape[1]
        codes = (
            arr.values.to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .reshape(len(arr), m)
        )
        nq = self.lut.shape[0]
        out_q, out_id, out_d = [], [], []
        for qi in range(nq):
            # gather per-subspace: D = sum_j lut[qi, j, codes[:, j]]
            D = self.lut[qi, np.arange(m)[None, :], codes].sum(axis=1)
            kk = min(self.k, len(D))
            sel = np.argpartition(D, kk - 1)[:kk] if kk else []
            out_q.extend([qi] * len(sel))
            out_id.extend(ids[sel].tolist())
            out_d.extend(D[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_id, pa.int64()),
                "adist": pa.array(out_d, pa.float64()),
            }
        )


def pq_topk(
    codes_ds,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    concurrency=(1, 8),
    batch_size: int = 8192,
):
    """-> Dataset(query_id, id, adist): ADC top-k over the code table.

    Per-batch candidates (blocks × k per query) merge through a tiny
    sort+limit — the full code table streams, nothing corpus-sized is
    collected."""
    books_ref = ray.put(np.ascontiguousarray(codebooks))
    q_ref = ray.put(np.asarray(queries))
    cand = codes_ds.map_batches(
        ADCScorer,
        fn_constructor_args=(books_ref, q_ref, k, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def per_query(g):
        g = g.sort_values(["adist", id_col], kind="mergesort").head(k)
        return g

    return cand.groupby("query_id").map_groups(
        per_query, batch_format="pandas"
    )


# --------------------------------------------------------------------
# IVF-PQ (IVFADC)
# --------------------------------------------------------------------


def _lloyd(S: np.ndarray, ks: int, iters: int) -> np.ndarray:
    """Seed-determined Lloyd on an in-memory sample (first-ks init)."""
    C = S[: min(ks, len(S))].copy()
    for _ in range(iters):
        a, _ = _assign_dist2(S, C)
        for c in range(len(C)):
            sel = a == c
            if sel.any():
                C[c] = S[sel].mean(axis=0)
    if len(C) < ks:
        C = np.vstack([C, np.repeat(C[-1:], ks - len(C), axis=0)])
    return C


def ivfpq_train(
    ds,
    num_centroids: int = 16,
    m: int = 8,
    ks: int = 16,
    col: str = "embedding",
    sample_limit: int = 20_000,
    iters: int = 10,
):
    """(coarse (nc, d), codebooks (m, ks, d/m)) — the IVFADC model
    (Jégou et al. 2011 §IV): coarse quantizer on a bounded driver
    sample, product codebooks trained on the RESIDUALS x - C[a(x)],
    which carry far less variance than raw vectors and quantize
    better. Training cost is sample-bounded, corpus-independent."""
    sample = ds.limit(sample_limit).select_columns([col]).to_pandas()
    X = np.stack([np.asarray(v, np.float32) for v in sample[col]]).astype(
        np.float64
    )
    coarse = _lloyd(X, num_centroids, iters)
    a, _ = _assign_dist2(X, coarse)
    R = X - coarse[a]
    subs = _subspaces(R, m)
    books = np.stack([_lloyd(subs[j], ks, iters) for j in range(m)])
    return coarse, books


class IVFPQEncoder:
    """Actor: coarse assign + residual PQ encode in one pass."""

    def __init__(self, model_ref, id_col: str, col: str) -> None:
        self.coarse, self.books = get_broadcast(model_ref)
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _stack64(batch[self.col])
        a, _ = _assign_dist2(X, self.coarse)
        R = X - self.coarse[a]
        m = self.books.shape[0]
        subs = _subspaces(R, m)
        codes = np.empty((X.shape[0], m), dtype=np.int64)
        for j in range(m):
            codes[:, j], _ = _assign_dist2(subs[j], self.books[j])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "centroid": pa.array(a, pa.int64()),
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), pa.int64()), m
                ),
            }
        )


def ivfpq_encode(
    ds,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    col: str = "embedding",
    concurrency=(1, 8),
    batch_size: int = 4096,
):
    """-> Dataset(id, centroid, codes): the IVF-PQ store — one int64
    list id + m code bytes per vector, nothing else retained."""
    model_ref = ray.put(
        (np.ascontiguousarray(coarse), np.ascontiguousarray(codebooks))
    )
    return ds.select_columns([id_col, col]).map_batches(
        IVFPQEncoder,
        fn_constructor_args=(model_ref, id_col, col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class IVFPQScorer:
    """Actor: per (query, probed-centroid) residual LUTs built once;
    per batch, only rows in probed lists are gathered and scored."""

    def __init__(self, model_ref, q_ref, nprobe: int, k: int,
                 id_col: str) -> None:
        coarse, books = get_broadcast(model_ref)
        Q = np.asarray(ray.get(q_ref), np.float32).astype(np.float64)
        m, ks, dsub = books.shape
        nq = len(Q)
        qa = np.argsort(
            ((Q[:, None, :] - coarse[None, :, :]) ** 2).sum(-1), axis=1
        )[:, :nprobe]  # (q, nprobe) probed centroid ids
        # LUT[(qi, c)] = (m, ks) squared dists of the query RESIDUAL
        self.luts: dict = {}
        self.probe_of_centroid: dict = {}
        for qi in range(nq):
            for c in qa[qi]:
                r = Q[qi] - coarse[c]
                rs = r.reshape(m, dsub)
                self.luts[(qi, int(c))] = np.stack(
                    [
                        ((rs[j][None, :] - books[j]) ** 2).sum(-1)
                        for j in range(m)
                    ]
                )  # (m, ks)
                self.probe_of_centroid.setdefault(int(c), []).append(qi)
        self.m, self.k, self.id_col = m, k, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cent = batch["centroid"].to_numpy(zero_copy_only=False)
        keep = np.isin(
            cent, np.fromiter(self.probe_of_centroid, dtype=np.int64)
        )
        out_q, out_id, out_d = [], [], []
        if keep.any():
            b = batch.filter(pa.array(keep))
            ids = b[self.id_col].to_numpy(zero_copy_only=False)
            cent_b = b["centroid"].to_numpy(zero_copy_only=False)
            arr = b["codes"].combine_chunks()
            codes = (
                arr.values.to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .reshape(len(arr), self.m)
            )
            jj = np.arange(self.m)[None, :]
            for c in np.unique(cent_b):
                sel = np.flatnonzero(cent_b == c)
                cc = codes[sel]
                for qi in self.probe_of_centroid[int(c)]:
                    lut = self.luts[(qi, int(c))]
                    D = lut[jj, cc].sum(axis=1)
                    kk = min(self.k, len(D))
                    top = np.argpartition(D, kk - 1)[:kk] if kk else []
                    out_q.extend([qi] * len(top))
                    out_id.extend(ids[sel[top]].tolist())
                    out_d.extend(D[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_id, pa.int64()),
                "adist": pa.array(out_d, pa.float64()),
            }
        )


def ivfpq_topk(
    codes_ds,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    concurrency=(1, 8),
    batch_size: int = 8192,
):
    """-> Dataset(query_id, id, adist): IVFADC search — each query
    scans only its ``nprobe`` probed lists' CODES (LUT gathers, no
    float vectors), candidates merge through a tiny per-query sort."""
    model_ref = ray.put(
        (np.ascontiguousarray(coarse), np.ascontiguousarray(codebooks))
    )
    q_ref = ray.put(np.asarray(queries))
    cand = codes_ds.map_batches(
        IVFPQScorer,
        fn_constructor_args=(model_ref, q_ref, nprobe, k, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def per_query(g):
        return g.sort_values(
            ["adist", id_col], kind="mergesort"
        ).head(k)

    return cand.groupby("query_id").map_groups(
        per_query, batch_format="pandas"
    )
