"""Similarity search over an embedding column (list<float>).

Two paths (SURVEY.md training-data additions; the reference's analog
is the GloVe+Annoy / TF-IDF cosine theorem matcher,
Styling/tools/thm_similarity/glovetools.py:10-33, model_tfidf.py:22-65):

- :func:`brute_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does ONE numpy matmul
  against it and keeps a per-batch top-k; a final tiny groupby merges
  per-batch candidates into the global top-k. Work per batch is
  (batch x dim) @ (dim x q) — fully vectorized, no shuffle of the
  vectors themselves.
- :func:`ivf_topk` — the scale path: a coarse quantizer (k-means
  trained on a driver-side sample) assigns each vector to a centroid
  list; a query only scans the ``nprobe`` nearest lists. The centroid
  assignment is a map_batches; candidate scanning shuffles only the
  probed lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _stack(col) -> np.ndarray:
    """list<float> column -> (n, d) float32 matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return m / nrm


class BruteScorer:
    """Actor: query matrix fetched once in __init__; per batch one
    matmul + argpartition top-k."""

    def __init__(self, q_ref, k: int, id_col: str, col: str) -> None:
        q = ray.get(q_ref)
        self.Q = _normalize(np.asarray(q, dtype=np.float32))  # (q, d)
        self.k = k
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        V = _normalize(_stack(batch[self.col]))  # (n, d)
        S = V @ self.Q.T  # (n, q)
        k = min(self.k, S.shape[0])
        top = np.argpartition(-S, k - 1, axis=0)[:k]  # (k, q)
        qn, out_q, out_id, out_s = S.shape[1], [], [], []
        for qi in range(qn):
            sel = top[:, qi]
            out_q.extend([qi] * len(sel))
            out_id.extend(ids[sel].tolist())
            out_s.extend(S[sel, qi].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def brute_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    col: str = "embedding",
    concurrency=(1, 8),
):
    """Exact cosine top-k of each query over the whole dataset.

    Returns Dataset(query_id, vec_id, score, rank) with k rows/query.
    """
    q_ref = ray.put(np.asarray(queries, dtype=np.float32))
    cands = ds.map_batches(
        BruteScorer,
        fn_constructor_args=(q_ref, k, id_col, col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cands.groupby("query_id").map_groups(merge, batch_format="pandas")


# ----------------------------------------------------------------- IVF


def train_centroids(
    ds,
    num_centroids: int = 16,
    col: str = "embedding",
    sample_limit: int = 20_000,
    iters: int = 10,
    seed: int = 0,
) -> np.ndarray:
    """Lloyd k-means on a driver-side sample (the coarse quantizer).

    The sample is bounded (``limit``) regardless of dataset size — the
    training cost does not grow with the corpus."""
    sample = ds.limit(sample_limit).to_pandas()
    X = _normalize(
        np.stack([np.asarray(v, np.float32) for v in sample[col]])
    )
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(num_centroids, len(X)), replace=False)]
    for _ in range(iters):
        S = X @ C.T
        assign = S.argmax(axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


class IVFAssigner:
    def __init__(self, c_ref, id_col: str, col: str) -> None:
        self.C = ray.get(c_ref)
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        V = _normalize(_stack(batch[self.col]))
        assign = (V @ self.C.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("centroid", pa.array(assign))


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Approximate cosine top-k: scan only the nprobe nearest centroid
    lists per query. Recall < 1.0 by design; tested vs brute force."""
    C = train_centroids(ds, num_centroids, col)
    c_ref = ray.put(C)
    assigned = ds.map_batches(
        IVFAssigner,
        fn_constructor_args=(c_ref, id_col, col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    Q = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    # mark batches: keep only vectors whose centroid is probed by some
    # query; score those vectors against the probing queries only
    probe_of_centroid: dict[int, list[int]] = {}
    for qi, ps in enumerate(probes):
        for p in ps:
            probe_of_centroid.setdefault(int(p), []).append(qi)
    poc_ref = ray.put(probe_of_centroid)
    q_ref = ray.put(Q)

    class ProbeScorer:
        def __init__(self) -> None:
            self.poc = ray.get(poc_ref)
            self.Q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cent = batch["centroid"].to_numpy(zero_copy_only=False)
            keep = np.array([int(c) in self.poc for c in cent])
            if not keep.any():
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], batch[id_col].type),
                        "score": pa.array([], pa.float64()),
                    }
                )
            b = batch.filter(pa.array(keep))
            ids = b[id_col].to_numpy(zero_copy_only=False)
            V = _normalize(_stack(b[col]))
            cent_b = b["centroid"].to_numpy(zero_copy_only=False)
            out_q, out_id, out_s = [], [], []
            for c in np.unique(cent_b):
                qis = self.poc[int(c)]
                m = cent_b == c
                S = V[m] @ self.Q[qis].T  # (n_c, len(qis))
                idx = np.flatnonzero(m)
                kk = min(k, S.shape[0])
                top = np.argpartition(-S, kk - 1, axis=0)[:kk]
                for j, qi in enumerate(qis):
                    sel = top[:, j]
                    out_q.extend([qi] * len(sel))
                    out_id.extend(ids[idx[sel]].tolist())
                    out_s.extend(S[sel, j].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_id),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    cands = assigned.map_batches(
        ProbeScorer,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cands.groupby("query_id").map_groups(merge, batch_format="pandas")


def _stack64(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix. float32 -> float64
    widening is EXACT, so downstream float64 arithmetic operates on
    identical values to a SQL engine that casts the same column to
    DOUBLE[] — the property the cosine_pairs oracle relies on."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


class _CosinePairScorer:
    """Actor-shaped batch fn: right side fetched once per worker."""

    def __init__(self, right_ref, threshold, id_col, col, self_join):
        rid, M = ray.get(right_ref)
        self.rid = rid
        self.M = M
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0] = np.inf  # zero vectors never pass the threshold
        self.rnorm = nrm
        self.threshold = threshold
        self.id_col, self.col = id_col, col
        self.self_join = self_join

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        B = _stack64(batch[self.col])
        bn = np.linalg.norm(B, axis=1)
        bn[bn == 0] = np.inf
        sims = (B @ self.M.T) / (bn[:, None] * self.rnorm[None, :])
        mask = sims >= self.threshold
        if self.self_join:
            # strict upper triangle by id: each unordered pair once
            mask &= ids[:, None] < self.rid[None, :]
        ai, bj = np.nonzero(mask)
        return pa.table(
            {
                "id_a": pa.array(ids[ai], pa.int64()),
                "id_b": pa.array(self.rid[bj], pa.int64()),
                "cosine": pa.array(np.round(sims[ai, bj], 6), pa.float64()),
            }
        )


def cosine_pairs(
    ds,
    threshold: float,
    id_col: str = "vec_id",
    col: str = "embedding",
    right: "pa.Table | None" = None,
    self_join: bool = True,
):
    """Exact cosine-similarity pair join: streamed left x broadcast
    right side, ONE float64 matmul per batch, emits
    ``(id_a, id_b, cosine)`` rows with ``cosine >= threshold``.

    This is the exact VERIFY kernel of the embedding near-dup family
    (reference analog: the theorem-similarity cosine matchers,
    Styling/tools/thm_similarity/model_tfidf.py:22-65). At corpus
    scale the right side must be a BOUNDED candidate set — e.g. the
    SRP-LSH bucket candidates from ``embedding_dup_edges`` — put into
    the object store ONCE (``ray.put``) and fetched once per worker,
    never re-shipped per batch; the left side streams. The benchmark
    query feeds the whole (small) embeddings table as its own right
    side: the exhaustive, oracle-checkable form. All arithmetic is
    float64 on exactly-widened float32 inputs, so engine and DuckDB
    oracle differ only by summation-order ulps (~1e-15), far below
    the shared 6-dp rounding."""
    if right is None:
        right = pa.concat_tables(
            ds.select_columns([id_col, col]).iter_batches(
                batch_format="pyarrow", batch_size=8192
            )
        )
    rid = right[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    M = _stack64(right[col])
    right_ref = ray.put((rid, M))
    return ds.map_batches(
        _CosinePairScorer,
        fn_constructor_args=(right_ref, threshold, id_col, col, self_join),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )


def mmr_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    fetch: int = 64,
    lam: float = 0.7,
    id_col: str = "vec_id",
    col: str = "embedding",
):
    """Maximal-marginal-relevance diverse top-k (Carbonell/Goldstein):
    greedily pick argmax of ``lam * cos(q, d) - (1 - lam) * max cos(d,
    chosen)`` — the diversity-aware sampling step of an eval-set or
    few-shot-pool builder, where plain top-k returns k near-copies.

    Two stages: an exact distributed cosine top-``fetch`` prefilter
    (:func:`brute_topk`, per-batch partial top-k, only ``fetch``
    (id, vector) rows reach the driver), then the inherently
    sequential k-step greedy runs on the bounded candidate matrix —
    each step is one vectorized (fetch,) update, never a corpus scan.
    Returns a pyarrow Table (rank, vec_id, relevance, mmr) in
    selection order; ties break to the smallest vec_id."""
    import pandas as pd

    q = np.asarray(query, dtype=np.float32).reshape(1, -1)
    cand = (
        brute_topk(ds, q, k=fetch, id_col=id_col, col=col)
        .to_pandas()
        .sort_values("rank")
    )
    ids = cand[id_col].to_numpy()
    # re-fetch candidate vectors via one filtered scan (bounded ids)
    id_set = set(int(i) for i in ids)

    def grab(b: pa.Table) -> pa.Table:
        m = np.isin(
            b[id_col].to_numpy(zero_copy_only=False), list(id_set)
        )
        return b.filter(pa.array(m))

    vec_tbl = (
        ds.map_batches(grab, batch_format="pyarrow")
        .to_pandas()
        .set_index(id_col)
    )
    V = _normalize(
        np.stack(
            [np.asarray(vec_tbl.loc[int(i), col]) for i in ids]
        ).astype(np.float64)
    )
    qn = _normalize(q.astype(np.float64))[0]
    rel = V @ qn
    n = len(ids)
    kk = min(k, n)
    chosen: list[int] = []
    max_sim = np.full(n, -np.inf)
    picked = np.zeros(n, bool)
    mmr_scores: list[float] = []
    for _ in range(kk):
        if chosen:
            score = lam * rel - (1.0 - lam) * max_sim
        else:
            score = lam * rel
        score = np.where(picked, -np.inf, score)
        # deterministic tie-break: highest score, then smallest id
        best = np.lexsort((ids, -score))[0]
        chosen.append(best)
        mmr_scores.append(float(score[best]))
        picked[best] = True
        max_sim = np.maximum(max_sim, V @ V[best])
    return pa.table(
        {
            "rank": pa.array(
                np.arange(1, kk + 1, dtype=np.int64), pa.int64()
            ),
            id_col: pa.array(
                ids[chosen].astype(np.int64), pa.int64()
            ),
            "relevance": pa.array(
                np.round(rel[chosen], 6), pa.float64()
            ),
            "mmr": pa.array(np.round(mmr_scores, 6), pa.float64()),
        }
    )
