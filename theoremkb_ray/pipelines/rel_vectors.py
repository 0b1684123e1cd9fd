"""Embedding-space queries over the embeddings table (ANN, clustering, outliers, projections).

Split from pipelines/relational.py (round 5) purely for maintainability;
every query registers into the shared REGISTRY exactly as before and
is re-exported by pipelines/relational.py.
"""


from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from ..stages.joins import broadcast_join, hash_join

from .relcore import (  # noqa: F401
    REGISTRY,
)
from . import relcore as _relcore


def _pq(sf_dir, table, columns=None):
    # late-bound so tests can monkeypatch relcore._pq in
    # ONE place and every domain module sees it
    return _relcore._pq(sf_dir, table, columns)


def q_ann_topk(sf_dir: str):
    """Similarity search: exact cosine top-5, queries = vec_id 0..2."""
    from ..stages.similarity import brute_topk

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 3)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    Q = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    out = brute_topk(ds, Q, k=5).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out[["query_id", "vec_id", "rank"]].astype(
        {"query_id": "int64", "vec_id": "int64", "rank": "int64"}
    )


SQL_ANN_TOPK = """
SELECT query_id, vec_id, rank FROM (
  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           v.embedding::DOUBLE[]) DESC,
                    v.vec_id) AS rank
  FROM embeddings q CROSS JOIN embeddings v
  WHERE q.vec_id < 3)
WHERE rank <= 5
"""


def q_cosine_pairs(sf_dir: str):
    """Exhaustive exact cosine self-join over the embeddings table:
    every unordered pair with cosine >= 0.4 (streamed left x broadcast
    right, float64 matmul per batch — stages/similarity.cosine_pairs).
    The oracle-checkable form of the embedding near-dup VERIFY kernel;
    at corpus scale the right side is the bounded SRP-LSH candidate
    set, not the full table."""
    from ..stages.similarity import cosine_pairs

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_pairs(emb, threshold=0.4)


SQL_COSINE_PAIRS = """
SELECT id_a, id_b, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS c
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
WHERE c >= 0.4
"""


def q_kmeans_assign(sf_dir: str):
    """Nearest-centroid assignment (the per-row step of distributed
    k-means, stages/cluster.py) with DETERMINISTIC centroids — the
    embeddings of the 8 smallest vec_ids — so the whole step is
    SQL-expressible and value-hash-checked (DuckDB list_distance).
    Float64 on exactly-widened float32 input on both sides; ties break
    to the smallest cluster id on both sides."""
    from ..stages.cluster import deterministic_centroids, kmeans_assign

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = deterministic_centroids(emb, 8)
    return kmeans_assign(emb, C).drop_columns(["embedding"])


SQL_KMEANS_ASSIGN = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
d AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
best AS (
  SELECT vec_id, cluster, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster)
           AS rn
  FROM d
)
SELECT vec_id, cluster, round(dist, 6) AS dist FROM best WHERE rn = 1
"""


def q_pq_codes(sf_dir: str):
    """Product-quantization encoding (stages/pq.py:pq_encode) with
    DETERMINISTIC codebooks — subvectors of the 16 smallest vec_ids —
    so the whole compressed store is SQL-expressible: for each of the
    8 subspaces DuckDB slices the DOUBLE[] embedding and argmins
    list_distance over the 16 codebook rows (ties to the smallest
    code on both sides). Output long form (vec_id, subspace, code)."""
    from ..stages.pq import deterministic_codebooks, pq_encode

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = deterministic_codebooks(emb, m=8, ks=16)
    codes = pq_encode(emb, books)

    def flatten(b: pa.Table) -> pa.Table:
        arr = b["codes"].combine_chunks()
        m = arr.type.list_size
        n = len(arr)
        return pa.table(
            {
                "vec_id": pa.array(
                    np.repeat(
                        b["vec_id"].to_numpy(zero_copy_only=False), m
                    ),
                    pa.int64(),
                ),
                "subspace": pa.array(
                    np.tile(np.arange(m, dtype=np.int64), n), pa.int64()
                ),
                "code": arr.values,
            }
        )

    return codes.map_batches(flatten, batch_format="pyarrow")


SQL_PQ_CODES = """
WITH base AS (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16),
books AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
         CAST(embedding AS DOUBLE[]) AS v
  FROM base
),
subs AS (SELECT range AS subspace FROM range(8)),
cent AS (
  SELECT subs.subspace, books.code,
         (books.v)[subs.subspace * 8 + 1 : subs.subspace * 8 + 8] AS cvec
  FROM subs CROSS JOIN books
),
d AS (
  SELECT e.vec_id, cent.subspace, cent.code,
         list_distance(
           (CAST(e.embedding AS DOUBLE[]))
             [cent.subspace * 8 + 1 : cent.subspace * 8 + 8],
           cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
best AS (
  SELECT vec_id, subspace, code,
         row_number() OVER (PARTITION BY vec_id, subspace
                            ORDER BY dist, code) AS rn
  FROM d
)
SELECT vec_id, subspace, code FROM best WHERE rn = 1
"""


def q_embedding_centroids(sf_dir: str):
    """Per-label mean embedding (stages/cluster.py:grouped_centroids —
    per-block (count, sum-vector) partials folded in a group-bounded
    exchange), flattened to (label, dim, centroid) long form."""
    from ..stages.cluster import grouped_centroids

    emb = _pq(sf_dir, "embeddings", ["label", "embedding"])
    cents = grouped_centroids(emb, "label", "embedding")

    def flatten(b: pa.Table) -> pa.Table:
        arr = b["centroid"].combine_chunks()
        d = (
            arr.type.list_size
            if pa.types.is_fixed_size_list(arr.type)
            else len(arr[0])
        )
        vals = np.concatenate(
            [np.asarray(v.as_py(), np.float64) for v in arr]
        )
        n = len(arr)
        return pa.table(
            {
                "label": pa.array(
                    np.repeat(
                        b["label"].to_numpy(zero_copy_only=False), d
                    ),
                    pa.int64(),
                ),
                "dim": pa.array(
                    np.tile(np.arange(d, dtype=np.int64), n), pa.int64()
                ),
                "centroid": pa.array(np.round(vals, 6), pa.float64()),
            }
        )

    return cents.map_batches(flatten, batch_format="pyarrow")


SQL_EMBEDDING_CENTROIDS = """
WITH x AS (
  SELECT label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
)
SELECT label, pos - 1 AS dim, round(avg(v), 6) AS centroid
FROM x GROUP BY label, pos
"""


REGISTRY.update({'ann_topk': (q_ann_topk, SQL_ANN_TOPK)})


REGISTRY.update({'cosine_pairs': (q_cosine_pairs, SQL_COSINE_PAIRS)})


REGISTRY.update({'kmeans_assign': (q_kmeans_assign, SQL_KMEANS_ASSIGN)})


REGISTRY.update({'pq_codes': (q_pq_codes, SQL_PQ_CODES)})


REGISTRY.update({'embedding_centroids': (q_embedding_centroids, SQL_EMBEDDING_CENTROIDS)})


def q_cov_embeddings(sf_dir: str):
    """Distributed covariance matrix of the first 8 embedding
    dimensions — the one-pass-shaped statistics kernel behind PCA /
    whitening over an embedding column. Two-pass centered form for
    float stability (the corr_agg shape lifted to a matrix): pass 1
    folds per-batch dimension sums to global means (D-row table,
    broadcast); pass 2 emits the 36 upper-triangle centered-product
    partials per batch and folds them with one tiny groupby.
    cov = sxy/(n-1) = SQL covar_samp to well below the 6 dp margin.
    Output is the (i, j, cov) upper triangle."""
    ds = _pq(sf_dir, "embeddings", ["embedding"])
    D = 8

    def mat(b: pa.Table) -> np.ndarray:
        arr = b["embedding"].combine_chunks()
        # flatten() respects slice offsets, unlike .values
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        dim = len(flat) // len(arr)
        return flat.reshape(len(arr), dim)[:, :D]

    def sum_partial(b: pa.Table) -> pa.Table:
        M = mat(b)
        return pa.table(
            {
                "k": pa.array(np.arange(D, dtype=np.int64), pa.int64()),
                "s": pa.array(M.sum(axis=0), pa.float64()),
                "n": pa.array(
                    np.full(D, M.shape[0], dtype=np.int64), pa.int64()
                ),
            }
        )

    sums = (
        ds.map_batches(sum_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("k")
    )
    n = int(sums["n"].iloc[0])
    mean = (sums["s"].to_numpy(np.float64) / n).copy()

    iu, ju = np.triu_indices(D)
    codes = iu * D + ju

    def prod_partial(b: pa.Table) -> pa.Table:
        Mc = mat(b) - mean
        G = Mc.T @ Mc
        return pa.table(
            {
                "code": pa.array(codes, pa.int64()),
                "sxy": pa.array(G[iu, ju], pa.float64()),
            }
        )

    agg = (
        ds.map_batches(prod_partial, batch_format="pyarrow")
        .groupby("code")
        .aggregate(Sum("sxy", alias_name="sxy"))
    )

    def finish(b: pa.Table) -> pa.Table:
        code = b["code"].to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "i": pa.array(code // D, pa.int64()),
                "j": pa.array(code % D, pa.int64()),
                "cov": pa.array(np.round(sxy / (n - 1), 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_COV_EMBEDDINGS = """
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       round(covar_samp(embedding[CAST(i + 1 AS INT)],
                        embedding[CAST(j + 1 AS INT)]), 6) AS cov
FROM embeddings,
     unnest(generate_series(0, 7)) AS t(i),
     unnest(generate_series(0, 7)) AS u(j)
WHERE i <= j
GROUP BY i, j
"""


REGISTRY.update({'cov_embeddings': (q_cov_embeddings, SQL_COV_EMBEDDINGS)})


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: for every
    embedding, the most-cosine-similar embedding with a DIFFERENT
    label (rank-1 under the ann_topk ordering contract: float64
    cosine DESC, vec_id ASC — ranks only cross the oracle, never
    floats). Engine: the full (id, label, L2-normalized matrix) side
    is broadcast once via ray.put and read zero-copy per task; each
    batch computes one matmul against it, masks same-label columns,
    and takes a vectorized argmax (matrix sorted by vec_id, so
    argmax's first-hit rule IS the vec_id tie-break). Scale path at
    an unbounded corpus = the IVF-bucketed variant
    (stages/similarity.py), same contract."""
    import ray

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    side = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    ids = side["vec_id"].to_numpy(np.int64)
    labels = side["label"].to_numpy(np.int64)
    M = np.stack(
        [np.asarray(v, np.float64) for v in side["embedding"]]
    )
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, labels, M))

    def fn(b: pa.Table) -> pa.Table:
        rids, rlabels, RM = ray.get(ref)
        arr = b["embedding"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        X = flat.reshape(len(arr), -1)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        S = X @ RM.T
        bl = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        S[bl[:, None] == rlabels[None, :]] = -np.inf
        best = S.argmax(axis=1)
        return pa.table(
            {
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
                "neg_id": pa.array(rids[best], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_HARD_NEGATIVES = """
SELECT vec_id, neg_id FROM (
  SELECT a.vec_id AS vec_id, b.vec_id AS neg_id,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]) DESC,
                    b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.label <> b.label)
WHERE rn = 1
"""


REGISTRY.update({'hard_negatives': (q_hard_negatives, SQL_HARD_NEGATIVES)})


def q_pca_project_embeddings(sf_dir: str):
    """Distributed PCA projection (the whitening / dimensionality-
    reduction step in front of clustering and SemDedup): full 64-dim
    covariance via the cov_embeddings two-pass centered machinery
    (upper-triangle partials, ONE tiny groupby), eigendecomposition of
    the 64x64 matrix on the driver (trivially small), then a third
    streaming pass projects every row onto the top-2 components.
    Sign-fixed (largest-|entry| positive) so results are deterministic
    under any partitioning. NO SQL ORACLE: eigendecomposition is not
    SQL-expressible; tests/test_analytics2.py checks the projection
    against numpy PCA directly and asserts partition invariance."""
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])

    def mat(b: pa.Table) -> np.ndarray:
        arr = b["embedding"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return flat.reshape(len(arr), -1)

    def sum_partial(b: pa.Table) -> pa.Table:
        M = mat(b)
        D = M.shape[1]
        return pa.table(
            {
                "k": pa.array(np.arange(D, dtype=np.int64), pa.int64()),
                "s": pa.array(M.sum(axis=0), pa.float64()),
                "n": pa.array(
                    np.full(D, M.shape[0], dtype=np.int64), pa.int64()
                ),
            }
        )

    sums = (
        ds.map_batches(sum_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("k")
    )
    D = len(sums)
    n = int(sums["n"].iloc[0])
    mean = (sums["s"].to_numpy(np.float64) / n).copy()
    iu, ju = np.triu_indices(D)
    codes = iu * D + ju

    def prod_partial(b: pa.Table) -> pa.Table:
        Mc = mat(b) - mean
        G = Mc.T @ Mc
        return pa.table(
            {
                "code": pa.array(codes, pa.int64()),
                "sxy": pa.array(G[iu, ju], pa.float64()),
            }
        )

    tri = (
        ds.map_batches(prod_partial, batch_format="pyarrow")
        .groupby("code")
        .aggregate(Sum("sxy", alias_name="sxy"))
        .to_pandas()
    )
    cov = np.zeros((D, D))
    ci = tri["code"].to_numpy(np.int64)
    cov[ci // D, ci % D] = tri["sxy"].to_numpy(np.float64)
    cov = (cov + cov.T - np.diag(np.diag(cov))) / (n - 1)
    w, V = np.linalg.eigh(cov)
    top = V[:, ::-1][:, :2].copy()  # eigh returns ascending
    for c in range(2):
        j = np.argmax(np.abs(top[:, c]))
        if top[j, c] < 0:
            top[:, c] = -top[:, c]

    def project(b: pa.Table) -> pa.Table:
        P = (mat(b) - mean) @ top
        return pa.table(
            {
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
                "pc1": pa.array(np.round(P[:, 0], 6), pa.float64()),
                "pc2": pa.array(np.round(P[:, 1], 6), pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


REGISTRY.update({'pca_project_embeddings': (q_pca_project_embeddings, None)})


def q_knn_vote_embeddings(sf_dir: str):
    """k-NN label vote (the embedding-space classifier / label-noise
    audit): every vector classified by the majority label of its 5
    cosine-nearest OTHER vectors. The whole (id, vec, label) side
    broadcasts once (ray.put); each batch scores with ONE float64
    matmul against the normalized matrix, kills the self column, and
    takes the arg-top-5 under the ann_topk ordering contract
    (similarity DESC, vec_id ASC). Vote ties break toward the
    smallest label — integer logic, hash-stable. Scale note: brute
    kNN is inherently index-broadcast (the query side streams; the
    index is the whole table) — beyond broadcast reach the scale plan
    is the IVF/PQ family (stages/similarity.py, stages/pq.py), same
    ordering contract."""
    import ray

    from ..state.broadcast import get_broadcast

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    allv = ds.to_pandas().sort_values("vec_id")
    ids = allv["vec_id"].to_numpy(np.int64)
    labels = allv["label"].to_numpy(np.int64)
    M = np.stack([np.asarray(v, np.float64) for v in allv["embedding"]])
    Mn = M / np.maximum(
        np.linalg.norm(M, axis=1, keepdims=True), 1e-300
    )
    ref = ray.put((ids, labels, Mn))
    K = 5

    class Vote:
        def __init__(self, model_ref) -> None:
            self.ids, self.labels, self.Mn = get_broadcast(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            q = np.stack(
                [
                    np.asarray(v, np.float64)
                    for v in b["embedding"].to_pylist()
                ]
            )
            qn = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-300
            )
            sim = qn @ self.Mn.T  # (nq, N)
            qid = b["vec_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            self_col = np.searchsorted(self.ids, qid)
            rows = np.arange(len(qid))
            sim[rows, self_col] = -np.inf
            # top-K under (sim DESC, vec_id ASC): lexsort on the
            # candidate axis; ids are pre-sorted so a stable sort on
            # -sim preserves the id tiebreak
            top = np.argsort(-sim, axis=1, kind="stable")[:, :K]
            votes = self.labels[top]  # (nq, K)
            nl = int(self.labels.max()) + 1
            counts = np.zeros((len(qid), nl), np.int64)
            np.add.at(counts, (rows[:, None], votes), 1)
            # majority, ties -> smallest label (argmax picks first max)
            pred = counts.argmax(axis=1).astype(np.int64)
            true = b["label"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.table(
                {
                    "vec_id": pa.array(qid),
                    "pred_label": pa.array(pred),
                    "label": pa.array(true),
                    "correct": pa.array(pred == true),
                }
            )

    return ds.map_batches(
        Vote,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=512,
    )


SQL_KNN_VOTE_EMBEDDINGS = """
WITH nn AS (
  SELECT q.vec_id AS vec_id, v.label AS vlabel,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           v.embedding::DOUBLE[]) DESC,
                    v.vec_id) AS rank
  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id),
vote AS (
  SELECT vec_id, vlabel, count(*) AS c FROM nn
  WHERE rank <= 5 GROUP BY vec_id, vlabel),
best AS (
  SELECT vec_id, vlabel AS pred_label,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY c DESC, vlabel) AS rn
  FROM vote)
SELECT b.vec_id, CAST(b.pred_label AS BIGINT) AS pred_label,
       CAST(e.label AS BIGINT) AS label,
       b.pred_label = e.label AS correct
FROM best b JOIN embeddings e ON b.vec_id = e.vec_id
WHERE b.rn = 1
"""


REGISTRY.update({'knn_vote_embeddings': (
            q_knn_vote_embeddings,
            SQL_KNN_VOTE_EMBEDDINGS,
        )})


def q_embedding_norms(sf_dir: str):
    """Per-vector L2 norms of the embedding table — the sanity audit
    before any cosine stage (un-normalized rows break dot-product
    shortcuts). Components quantize by FLOOR to milli-units so the
    squared sum is an exact int64 (floor of an identical double is
    identical in both engines — no .5-boundary exposure at all);
    sqrt + floor-quantized output on identical operands. Pure
    per-row scan, ZERO exchange."""
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])

    def fn(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        if offs[0] != 0:
            vals = emb.values.slice(offs[0]).to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            offs = offs - offs[0]
        q = np.floor(vals * 1000.0).astype(np.int64)
        sq = q * q
        n = len(offs) - 1
        d = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        ss = np.bincount(d, weights=sq, minlength=n)  # < 2^53: exact
        norm = np.floor(np.sqrt(ss) / 1000.0 * 1e6) / 1e6
        return pa.table({"vec_id": b["vec_id"], "l2_norm": pa.array(norm)})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_EMBEDDING_NORMS = """
SELECT vec_id,
       floor(sqrt(CAST(list_sum(list_transform(embedding,
                 x -> CAST(floor(x*1000) AS BIGINT)
                      * CAST(floor(x*1000) AS BIGINT))) AS BIGINT))
             / 1000.0 * 1000000) / 1000000 AS l2_norm
FROM embeddings
"""


REGISTRY.update({'embedding_norms': (q_embedding_norms, SQL_EMBEDDING_NORMS)})


def q_ann_filtered_topk(sf_dir: str):
    """Metadata-FILTERED vector search (the vector-DB staple): exact
    cosine top-5 among vectors whose label = 1 only, queries =
    vec_id 0..2. Pre-filtering the candidate stream keeps the scan
    one pass and the ranking contract identical to ann_topk
    (cosine DESC, vec_id tiebreak)."""
    from ..stages.similarity import brute_topk

    ds = _pq(
        sf_dir, "embeddings", ["vec_id", "embedding", "label"]
    ).map_batches(
        lambda b: b.filter(
            pc.equal(b["label"], pa.scalar(1, pa.int32()))
        ).select(["vec_id", "embedding"]),
        batch_format="pyarrow",
    )
    qdf = (
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 3)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    Q = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    out = brute_topk(ds, Q, k=5).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out[["query_id", "vec_id", "rank"]].astype(
        {"query_id": "int64", "vec_id": "int64", "rank": "int64"}
    )


SQL_ANN_FILTERED_TOPK = """
SELECT query_id, vec_id, rank FROM (
  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           v.embedding::DOUBLE[]) DESC,
                    v.vec_id) AS rank
  FROM embeddings q CROSS JOIN embeddings v
  WHERE q.vec_id < 3 AND v.label = 1)
WHERE rank <= 5
"""


#: matryoshka truncation width (dim_truncation_overlap)
TRUNC_DIMS = 8


def q_dim_truncation_overlap(sf_dir: str):
    """Matryoshka-style embedding-truncation eval: how much of the
    exact cosine top-10 survives when vectors are truncated to their
    first 8 dimensions? Two one-pass brute rankings (full + sliced
    list column) and a 3x10-row driver intersection; the per-query
    overlap count quantifies the recall cost of the cheaper index."""
    from ..stages.similarity import brute_topk

    full = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    trunc = full.map_batches(
        lambda b: pa.table(
            {
                "vec_id": b["vec_id"],
                "embedding": pc.list_slice(b["embedding"], 0, TRUNC_DIMS),
            }
        ),
        batch_format="pyarrow",
    )
    qdf = (
        full.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 3)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    Q = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    qids = qdf["vec_id"].to_numpy()
    tf = brute_topk(full, Q, k=10).to_pandas()
    tt = brute_topk(trunc, Q[:, :TRUNC_DIMS], k=10).to_pandas()
    rows = []
    for qi, qid in enumerate(qids):
        a = set(tf.loc[tf["query_id"] == qi, "vec_id"])
        b_ = set(tt.loc[tt["query_id"] == qi, "vec_id"])
        rows.append((int(qid), len(a & b_)))
    return pd.DataFrame(rows, columns=["query_id", "overlap"]).astype(
        {"query_id": "int64", "overlap": "int64"}
    )


SQL_DIM_TRUNCATION_OVERLAP = f"""
WITH fullk AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, v.vec_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                             v.embedding::DOUBLE[]) DESC,
                      v.vec_id) AS rank
    FROM embeddings q CROSS JOIN embeddings v WHERE q.vec_id < 3)
  WHERE rank <= 10
),
trunck AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, v.vec_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
                        (q.embedding::DOUBLE[])[1:{TRUNC_DIMS}],
                        (v.embedding::DOUBLE[])[1:{TRUNC_DIMS}]) DESC,
                      v.vec_id) AS rank
    FROM embeddings q CROSS JOIN embeddings v WHERE q.vec_id < 3)
  WHERE rank <= 10
)
SELECT f.query_id, CAST(count(*) AS BIGINT) AS overlap
FROM fullk f JOIN trunck t
  ON t.query_id = f.query_id AND t.vec_id = f.vec_id
GROUP BY f.query_id
"""


REGISTRY.update({'ann_filtered_topk': (q_ann_filtered_topk, SQL_ANN_FILTERED_TOPK)})


REGISTRY.update({'dim_truncation_overlap': (
            q_dim_truncation_overlap,
            SQL_DIM_TRUNCATION_OVERLAP,
        )})


#: kNN outlier parameters (knn_outliers_embeddings)
KNN_OUT_K = 5
KNN_OUT_TOP = 20


def q_knn_outliers_embeddings(sf_dir: str):
    """kNN-distance outlier detection: the 20 most isolated vectors
    by distance to their 5th nearest neighbour (the classic
    density-free anomaly score for embedding spaces). Candidates
    stream against the broadcast vector matrix one batch at a time
    (the ann_topk scan shape); per row the 5th-smallest L2 distance
    falls out of one argpartition. Ranking follows the ann ordering
    contract (score, then vec_id), which the synthetic embedding
    geometry keeps ulp-stable across both engines."""
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    all_df = ds.to_pandas().sort_values("vec_id")
    M = np.stack(
        [np.asarray(v, np.float64) for v in all_df["embedding"]]
    )
    ids = all_df["vec_id"].to_numpy(np.int64)

    def score(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [
                np.asarray(v, np.float64)
                for v in b["embedding"].to_pylist()
            ]
        )
        # exact squared distances, then per-row 5th-smallest excluding
        # self (distance 0 at the self column)
        d2 = (
            (Q * Q).sum(1)[:, None]
            - 2.0 * (Q @ M.T)
            + (M * M).sum(1)[None, :]
        )
        np.maximum(d2, 0.0, out=d2)
        # mask self by vec_id (duplicates of the same id keep one)
        self_col = np.searchsorted(ids, vid)
        d2[np.arange(len(vid)), self_col] = np.inf
        kth = np.partition(d2, KNN_OUT_K - 1, axis=1)[:, KNN_OUT_K - 1]
        return pa.table(
            {
                "vec_id": pa.array(vid, pa.int64()),
                "d2": pa.array(kth, pa.float64()),
            }
        )

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["d2", "vec_id"], ascending=[False, True])
        .head(KNN_OUT_TOP)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "vec_id"]].astype(np.int64)


SQL_KNN_OUTLIERS_EMBEDDINGS = f"""
WITH d AS (
  SELECT a.vec_id,
         list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           AS dist
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
),
kth AS (
  SELECT vec_id, dist FROM (
    SELECT vec_id, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist) AS rn
    FROM d) WHERE rn = {KNN_OUT_K}
)
SELECT CAST(row_number() OVER (ORDER BY dist DESC, vec_id)
            AS BIGINT) AS rank,
       vec_id
FROM kth
ORDER BY rank LIMIT {KNN_OUT_TOP}
"""


REGISTRY.update({'knn_outliers_embeddings': (
            q_knn_outliers_embeddings,
            SQL_KNN_OUTLIERS_EMBEDDINGS,
        )})


#: LOF parameters (lof_embeddings)
LOF_K = 5
LOF_TOP = 10


def q_lof_embeddings(sf_dir: str):
    """Local Outlier Factor over the embedding space — the
    density-RATIO anomaly score (a point is outlying relative to its
    neighbourhood's density, not the global scale). k=5 neighbours
    under the ann ordering contract; reachability sums fold in FIXED
    neighbour-rank order (r1+r2+r3+r4+r5 written explicitly on both
    engines, so no float-reduction-order divergence), and the top-10
    LOF scores are floor-quantized at 1e-4. One batched scan against
    the broadcast matrix; everything after the per-node 5-row
    neighbour table is vector-count-bounded."""
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    all_df = ds.to_pandas().sort_values("vec_id")
    M = np.stack(
        [np.asarray(v, np.float64) for v in all_df["embedding"]]
    )
    ids = all_df["vec_id"].to_numpy(np.int64)

    def knn_partial(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [np.asarray(v, np.float64) for v in b["embedding"].to_pylist()]
        )
        # distance expression mirrors DuckDB list_distance:
        # sqrt(sum (a_i - b_i)^2)
        d2 = (
            (Q * Q).sum(1)[:, None]
            - 2.0 * (Q @ M.T)
            + (M * M).sum(1)[None, :]
        )
        np.maximum(d2, 0.0, out=d2)
        self_col = np.searchsorted(ids, vid)
        d2[np.arange(len(vid)), self_col] = np.inf
        d = np.sqrt(d2)
        # k nearest by (dist, vec_id)
        order = np.lexsort(
            (np.broadcast_to(ids, d.shape), d), axis=1
        )[:, :LOF_K]
        rows = np.repeat(vid, LOF_K)
        cols = order.ravel()
        return pa.table(
            {
                "ai": pa.array(rows, pa.int64()),
                "bi": pa.array(ids[cols], pa.int64()),
                "rn": pa.array(
                    np.tile(
                        np.arange(1, LOF_K + 1, dtype=np.int64),
                        len(vid),
                    )
                ),
                "dist": pa.array(
                    d[np.repeat(np.arange(len(vid)), LOF_K), cols],
                    pa.float64(),
                ),
            }
        )

    nbr = (
        ds.map_batches(knn_partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["ai", "rn"])
    )
    kdist = nbr.loc[nbr["rn"] == LOF_K].set_index("ai")["dist"]
    # reach_j(a) = max(kdist(b_j), d(a, b_j)), folded in rank order
    reach = np.maximum(
        kdist.loc[nbr["bi"]].to_numpy(), nbr["dist"].to_numpy()
    )
    re_cols = reach.reshape(-1, LOF_K)
    a_ids = nbr["ai"].to_numpy(np.int64).reshape(-1, LOF_K)[:, 0]
    s = re_cols[:, 0]
    for j in range(1, LOF_K):
        s = s + re_cols[:, j]
    lrd = pd.Series(LOF_K * 1.0 / s, index=a_ids)
    nb_lrd = lrd.loc[nbr["bi"]].to_numpy().reshape(-1, LOF_K)
    t = nb_lrd[:, 0]
    for j in range(1, LOF_K):
        t = t + nb_lrd[:, j]
    lof = t / (LOF_K * 1.0 * lrd.loc[a_ids].to_numpy())
    out = (
        pd.DataFrame({"vec_id": a_ids, "lof": np.floor(lof * 1e4) / 1e4})
        .sort_values(["lof", "vec_id"], ascending=[False, True])
        .head(LOF_TOP)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "vec_id", "lof"]].astype(
        {"rank": np.int64, "vec_id": np.int64}
    )


def _lof_sql() -> str:
    k = LOF_K
    re_sum = " + ".join(
        f"max(CASE WHEN rn = {j} THEN re END)" for j in range(1, k + 1)
    )
    lrd_sum = " + ".join(
        f"max(CASE WHEN rn = {j} THEN nl END)" for j in range(1, k + 1)
    )
    return f"""
WITH d AS (
  SELECT a.vec_id AS ai, b.vec_id AS bi,
         list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           AS dist
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
),
nn AS (
  SELECT ai, bi, dist,
         row_number() OVER (PARTITION BY ai
                            ORDER BY dist, bi) AS rn
  FROM d
),
kd AS (SELECT ai, dist AS kdist FROM nn WHERE rn = {k}),
nbr AS (SELECT * FROM nn WHERE rn <= {k}),
reach AS (
  SELECT n.ai, n.rn, greatest(kk.kdist, n.dist) AS re
  FROM nbr n JOIN kd kk ON kk.ai = n.bi
),
lrd AS (
  SELECT ai, {k}.0 / ({re_sum}) AS lrd
  FROM reach GROUP BY ai
),
nl AS (
  SELECT n.ai, n.rn, l.lrd AS nl
  FROM nbr n JOIN lrd l ON l.ai = n.bi
),
lof AS (
  SELECT nl.ai,
         ({lrd_sum}) / ({k}.0 * max(la.lrd)) AS lof
  FROM nl JOIN lrd la ON la.ai = nl.ai
  GROUP BY nl.ai
)
SELECT CAST(row_number() OVER (ORDER BY floor(lof * 1e4) / 1e4 DESC,
                               ai) AS BIGINT) AS rank,
       ai AS vec_id,
       floor(lof * 1e4) / 1e4 AS lof
FROM lof
ORDER BY rank LIMIT {LOF_TOP}
"""


REGISTRY.update({'lof_embeddings': (q_lof_embeddings, _lof_sql())})


#: DBSCAN parameters (dbscan_embeddings)
DBSCAN_EPS = 1.2
DBSCAN_MINPTS = 5


def q_dbscan_embeddings(sf_dir: str):
    """DBSCAN over the embedding space: core points have >= 5
    neighbours within eps=1.2 (self excluded), clusters are connected
    components of the core-core eps-graph labelled by their min core
    id, border points take the min cluster among their core
    neighbours, everything else is noise (-1) — the classic
    density-based clustering, made deterministic by min-label rules.
    The eps-neighbour scan streams batches against the broadcast
    matrix; the core-core edge set is density-bounded and feeds the
    house union-find (the distributed CC path is the documented
    beyond-driver plan)."""
    from ..stages.canonicalize import connected_components_local

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    all_df = ds.to_pandas().sort_values("vec_id")
    M = np.stack(
        [np.asarray(v, np.float64) for v in all_df["embedding"]]
    )
    ids = all_df["vec_id"].to_numpy(np.int64)

    def nb_partial(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [np.asarray(v, np.float64) for v in b["embedding"].to_pylist()]
        )
        d2 = (
            (Q * Q).sum(1)[:, None]
            - 2.0 * (Q @ M.T)
            + (M * M).sum(1)[None, :]
        )
        np.maximum(d2, 0.0, out=d2)
        self_col = np.searchsorted(ids, vid)
        d2[np.arange(len(vid)), self_col] = np.inf
        d = np.sqrt(d2)
        rows, cols = np.where(d <= DBSCAN_EPS)
        return pa.table(
            {
                "ai": pa.array(vid[rows], pa.int64()),
                "bi": pa.array(ids[cols], pa.int64()),
            }
        )

    nb = (
        ds.map_batches(nb_partial, batch_format="pyarrow")
        .to_pandas()
    )
    deg = nb.groupby("ai").size()
    core = set(deg[deg >= DBSCAN_MINPTS].index)
    cc_edges = nb[
        nb["ai"].isin(core) & nb["bi"].isin(core)
        & (nb["ai"] < nb["bi"])
    ]
    tbl = pa.table(
        {
            "a": pa.array(
                cc_edges["ai"].astype(str).to_numpy(), pa.string()
            ),
            "b": pa.array(
                cc_edges["bi"].astype(str).to_numpy(), pa.string()
            ),
        }
    )
    comp = connected_components_local(tbl)
    label = {int(k): int(v) for k, v in comp.items()}
    for c in core:
        label.setdefault(c, c)  # isolated cores are their own cluster
    out_rows = []
    nb_core = nb[nb["bi"].isin(core)]
    border_lbl = (
        nb_core.assign(
            lbl=nb_core["bi"].map(lambda x: label[int(x)])
        )
        .groupby("ai")["lbl"]
        .min()
    )
    for vid in ids:
        v = int(vid)
        if v in core:
            out_rows.append((v, label[v]))
        elif v in border_lbl.index:
            out_rows.append((v, int(border_lbl.loc[v])))
        else:
            out_rows.append((v, -1))
    return pd.DataFrame(
        out_rows, columns=["vec_id", "cluster"]
    ).astype(np.int64)


SQL_DBSCAN_EMBEDDINGS = f"""
WITH RECURSIVE d AS (
  SELECT a.vec_id AS ai, b.vec_id AS bi,
         list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           AS dist
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
),
nb AS (SELECT ai, bi FROM d WHERE dist <= {DBSCAN_EPS}),
deg AS (SELECT ai, count(*) AS k FROM nb GROUP BY ai),
core AS (SELECT ai AS id FROM deg WHERE k >= {DBSCAN_MINPTS}),
e AS (
  SELECT n.ai AS a, n.bi AS b FROM nb n
  JOIN core ca ON ca.id = n.ai JOIN core cb ON cb.id = n.bi
  WHERE n.ai < n.bi
),
und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
reach(node, s) AS (
  SELECT id, id FROM core
  UNION
  SELECT und.b, reach.s FROM reach JOIN und ON und.a = reach.node
),
labels AS (SELECT node, MIN(s) AS component FROM reach GROUP BY node),
border AS (
  SELECT n.ai, MIN(l.component) AS cluster
  FROM nb n
  JOIN core c ON c.id = n.bi
  JOIN labels l ON l.node = n.bi
  LEFT JOIN core cc ON cc.id = n.ai
  WHERE cc.id IS NULL
  GROUP BY n.ai
)
SELECT em.vec_id,
       CAST(COALESCE(l.component, br.cluster, -1) AS BIGINT)
         AS cluster
FROM embeddings em
LEFT JOIN labels l ON l.node = em.vec_id
LEFT JOIN border br ON br.ai = em.vec_id
"""


REGISTRY.update({'dbscan_embeddings': (q_dbscan_embeddings, SQL_DBSCAN_EMBEDDINGS)})


def q_silhouette_kmeans(sf_dir: str):
    """Mean silhouette per k-means cluster — the standard clustering
    quality report over the deterministic-centroid assignment
    (kmeans_assign's contract). Every pairwise distance is
    MICRO-QUANTIZED to an integer before any aggregation, so a(i) and
    b(i) folds are exact integer sums under any order; the final
    s = (b - a) / max(a, b) means are single float expressions
    mirroring the oracle. The pairwise scan streams batches against
    the broadcast matrix; per-batch (i, cluster_j) partial sums keep
    the exchange at rows x k."""
    from ..stages.cluster import deterministic_centroids, kmeans_assign

    K = 8
    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = deterministic_centroids(emb, K)
    assign = (
        kmeans_assign(emb, C)
        .drop_columns(["embedding"])
        .to_pandas()
        .sort_values("vec_id")
    )
    all_df = emb.to_pandas().sort_values("vec_id")
    M = np.stack(
        [np.asarray(v, np.float64) for v in all_df["embedding"]]
    )
    ids = all_df["vec_id"].to_numpy(np.int64)
    cl = assign.set_index("vec_id")["cluster"].loc[ids].to_numpy(
        np.int64
    )
    csizes = np.bincount(cl, minlength=K).astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [np.asarray(v, np.float64) for v in b["embedding"].to_pylist()]
        )
        d2 = (
            (Q * Q).sum(1)[:, None]
            - 2.0 * (Q @ M.T)
            + (M * M).sum(1)[None, :]
        )
        np.maximum(d2, 0.0, out=d2)
        self_col = np.searchsorted(ids, vid)
        d2[np.arange(len(vid)), self_col] = 0.0
        dq = np.floor(np.sqrt(d2) * 1e6).astype(np.int64)
        dq[np.arange(len(vid)), self_col] = 0
        # per (row, cluster) integer distance sums
        sums = np.zeros((len(vid), K), np.int64)
        for c in range(K):
            sums[:, c] = dq[:, cl == c].sum(axis=1)
        out = {
            "vec_id": pa.array(vid, pa.int64()),
            "cluster": pa.array(
                cl[np.searchsorted(ids, vid)], pa.int64()
            ),
        }
        for c in range(K):
            out[f"s{c}"] = pa.array(sums[:, c], pa.int64())
        return pa.table(out)

    per_row = (
        emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    )
    own = per_row["cluster"].to_numpy(np.int64)
    S = per_row[[f"s{c}" for c in range(K)]].to_numpy(np.int64)
    n_own = csizes[own]
    a = np.where(
        n_own > 1,
        S[np.arange(len(own)), own] * 1.0 / (n_own - 1),
        0.0,
    )
    b_ = np.full(len(own), np.inf)
    for c in range(K):
        mean_c = np.where(csizes[c] > 0, S[:, c] * 1.0 / max(csizes[c], 1), np.inf)
        cand = np.where((own != c) & (csizes[c] > 0), mean_c, np.inf)
        b_ = np.minimum(b_, cand)
    s = np.where(
        n_own > 1, (b_ - a) / np.maximum(a, b_), 0.0
    )
    df = pd.DataFrame({"cluster": own, "s": s})
    out = (
        df.groupby("cluster")["s"]
        .apply(lambda g: np.floor(g.mean() * 1e6) / 1e6)
        .reset_index(name="mean_silhouette")
    )
    out["n"] = csizes[out["cluster"].to_numpy(np.int64)]
    return out.astype({"cluster": np.int64, "n": np.int64})


SQL_SILHOUETTE_KMEANS = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
dc AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM dc) WHERE rn = 1
),
cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n
       FROM assign GROUP BY cluster),
pd_ AS (
  SELECT a.vec_id AS i, ab.cluster AS cj,
         CAST(sum(CAST(floor(list_distance(
                 CAST(a.embedding AS DOUBLE[]),
                 CAST(b.embedding AS DOUBLE[])) * 1e6) AS BIGINT))
              AS BIGINT) AS s
  FROM embeddings a
  JOIN embeddings b ON b.vec_id <> a.vec_id
  JOIN assign ab ON ab.vec_id = b.vec_id
  GROUP BY 1, 2
),
rowstats AS (
  SELECT ai.vec_id, ai.cluster,
         (SELECT cs.n FROM cs WHERE cs.cluster = ai.cluster) AS n_own,
         COALESCE((SELECT p.s FROM pd_ p
                   WHERE p.i = ai.vec_id
                     AND p.cj = ai.cluster), 0) AS s_own,
         (SELECT min(p.s * 1.0 / cs.n)
          FROM pd_ p JOIN cs ON cs.cluster = p.cj
          WHERE p.i = ai.vec_id AND p.cj <> ai.cluster
            AND cs.n > 0) AS b
  FROM assign ai
),
sil AS (
  SELECT cluster,
         CASE WHEN n_own > 1
              THEN (b - s_own * 1.0 / (n_own - 1))
                   / greatest(s_own * 1.0 / (n_own - 1), b)
              ELSE 0.0 END AS s
  FROM rowstats
)
SELECT s.cluster,
       floor(avg(s.s) * 1e6) / 1e6 AS mean_silhouette,
       (SELECT n FROM cs WHERE cs.cluster = s.cluster) AS n
FROM sil s GROUP BY s.cluster
"""


REGISTRY.update({'silhouette_kmeans': (q_silhouette_kmeans, SQL_SILHOUETTE_KMEANS)})


def q_ari_kmeans_labels(sf_dir: str):
    """Adjusted Rand Index between the deterministic k-means
    assignment and the embeddings' ground-truth label column — the
    external clustering-validation metric. The k x labels contingency
    folds through one cell-count-sized exchange; every pair count is
    an exact integer binomial, so only the final ARI expression is
    float (mirrored, floor-quantized)."""
    from ..stages.cluster import deterministic_centroids, kmeans_assign

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    C = deterministic_centroids(
        emb.drop_columns(["label"]), 8
    )
    assign = kmeans_assign(
        emb.drop_columns(["label"]), C
    ).drop_columns(["embedding"])

    labels = emb.drop_columns(["embedding"])
    from ..stages.joins import hash_join

    both = hash_join(
        assign,
        labels.map_batches(
            lambda b: pa.table(
                {
                    "vec_id": b["vec_id"],
                    "label": pc.cast(b["label"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        on=["vec_id"],
        how="inner",
    )

    def cell_partial(b: pa.Table) -> pa.Table:
        c = b["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        l_ = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        packed = c * 1024 + l_
        u, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "cluster": pa.array(u // 1024, pa.int64()),
                "label": pa.array(u % 1024, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    cells = (
        both.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    nij = cells["n"].to_numpy(np.int64)
    a = cells.groupby("cluster")["n"].sum().to_numpy(np.int64)
    b_ = cells.groupby("label")["n"].sum().to_numpy(np.int64)
    n = int(nij.sum())
    sum_ij = int((nij * (nij - 1) // 2).sum())
    sum_a = int((a * (a - 1) // 2).sum())
    sum_b = int((b_ * (b_ - 1) // 2).sum())
    t = n * (n - 1) // 2
    exp = sum_a * 1.0 * sum_b / t
    ari = np.floor(
        (sum_ij - exp) / ((sum_a + sum_b) / 2.0 - exp) * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "n": [n],
            "pairs_together_both": [sum_ij],
            "ari": [float(ari)],
        }
    ).astype({"n": np.int64, "pairs_together_both": np.int64})


SQL_ARI_KMEANS_LABELS = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
dc AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM dc) WHERE rn = 1
),
cells AS (
  SELECT a.cluster, CAST(e.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS n
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY 1, 2
),
stats AS (
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(n * (n - 1) // 2) AS BIGINT) AS sum_ij
  FROM cells
),
ra AS (SELECT CAST(sum(s * (s - 1) // 2) AS BIGINT) AS sum_a
       FROM (SELECT CAST(sum(n) AS BIGINT) AS s
             FROM cells GROUP BY cluster)),
rb AS (SELECT CAST(sum(s * (s - 1) // 2) AS BIGINT) AS sum_b
       FROM (SELECT CAST(sum(n) AS BIGINT) AS s
             FROM cells GROUP BY label))
SELECT (SELECT n FROM stats) AS n,
       (SELECT sum_ij FROM stats) AS pairs_together_both,
       floor(((SELECT sum_ij FROM stats)
              - (SELECT sum_a FROM ra) * 1.0 * (SELECT sum_b FROM rb)
                / ((SELECT n FROM stats)
                   * ((SELECT n FROM stats) - 1) // 2))
             / (((SELECT sum_a FROM ra) + (SELECT sum_b FROM rb)) / 2.0
                - (SELECT sum_a FROM ra) * 1.0 * (SELECT sum_b FROM rb)
                  / ((SELECT n FROM stats)
                     * ((SELECT n FROM stats) - 1) // 2))
             * 1e6) / 1e6 AS ari
"""


REGISTRY.update({'ari_kmeans_labels': (q_ari_kmeans_labels, SQL_ARI_KMEANS_LABELS)})


def q_nmi_kmeans_labels(sf_dir: str):
    """Normalized Mutual Information between the k-means assignment
    and the true labels — the information-theoretic companion of ARI
    over the SAME cell-count contingency. Each MI/entropy term is
    nanounit-floor-quantized (math.log == DuckDB ln) so the integer
    sums are order-independent; NMI = I / ((H_C + H_L)/2) is one
    mirrored float expression over the three quantized sums."""
    import math

    from ..stages.cluster import deterministic_centroids, kmeans_assign
    from ..stages.joins import hash_join

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    C = deterministic_centroids(emb.drop_columns(["label"]), 8)
    assign = kmeans_assign(
        emb.drop_columns(["label"]), C
    ).drop_columns(["embedding"])
    both = hash_join(
        assign,
        emb.drop_columns(["embedding"]).map_batches(
            lambda b: pa.table(
                {
                    "vec_id": b["vec_id"],
                    "label": pc.cast(b["label"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        on=["vec_id"],
        how="inner",
    )

    def cell_partial(b: pa.Table) -> pa.Table:
        c = b["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        l_ = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        packed = c * 1024 + l_
        u, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "cluster": pa.array(u // 1024, pa.int64()),
                "label": pa.array(u % 1024, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    cells = (
        both.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = int(cells["n"].sum())
    a = cells.groupby("cluster")["n"].sum()
    b_ = cells.groupby("label")["n"].sum()
    mi = 0
    for _, r in cells.iterrows():
        nij, ai, bj = int(r["n"]), int(a[r["cluster"]]), int(b_[r["label"]])
        term = (nij * 1.0 / n) * math.log(
            (nij * 1.0 / n) / ((ai * 1.0 / n) * (bj * 1.0 / n))
        )
        mi += int(np.floor(term * 1e9))
    hc = sum(
        int(np.floor(-(int(x) * 1.0 / n)
                     * math.log(int(x) * 1.0 / n) * 1e9))
        for x in a
    )
    hl = sum(
        int(np.floor(-(int(x) * 1.0 / n)
                     * math.log(int(x) * 1.0 / n) * 1e9))
        for x in b_
    )
    nmi = np.floor(mi * 1.0 / ((hc + hl) / 2.0) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n": [n],
            "mi_nano": [mi],
            "nmi": [float(nmi)],
        }
    ).astype({"n": np.int64, "mi_nano": np.int64})


SQL_NMI_KMEANS_LABELS = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
dc AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM dc) WHERE rn = 1
),
cells AS (
  SELECT a.cluster, CAST(e.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS n
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY 1, 2
),
nn AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM cells),
ra AS (SELECT cluster, CAST(sum(n) AS BIGINT) AS s
       FROM cells GROUP BY cluster),
rb AS (SELECT label, CAST(sum(n) AS BIGINT) AS s
       FROM cells GROUP BY label),
mi AS (
  SELECT CAST(sum(CAST(floor(
           (c.n * 1.0 / (SELECT n FROM nn))
           * ln((c.n * 1.0 / (SELECT n FROM nn))
                / ((ra.s * 1.0 / (SELECT n FROM nn))
                   * (rb.s * 1.0 / (SELECT n FROM nn))))
           * 1e9) AS BIGINT)) AS BIGINT) AS v
  FROM cells c JOIN ra ON ra.cluster = c.cluster
               JOIN rb ON rb.label = c.label
),
hc AS (SELECT CAST(sum(CAST(floor(
         -(s * 1.0 / (SELECT n FROM nn))
         * ln(s * 1.0 / (SELECT n FROM nn)) * 1e9) AS BIGINT))
       AS BIGINT) AS v FROM ra),
hl AS (SELECT CAST(sum(CAST(floor(
         -(s * 1.0 / (SELECT n FROM nn))
         * ln(s * 1.0 / (SELECT n FROM nn)) * 1e9) AS BIGINT))
       AS BIGINT) AS v FROM rb)
SELECT (SELECT n FROM nn) AS n,
       (SELECT v FROM mi) AS mi_nano,
       floor((SELECT v FROM mi) * 1.0
             / (((SELECT v FROM hc) + (SELECT v FROM hl)) / 2.0)
             * 1e6) / 1e6 AS nmi
"""


REGISTRY.update({'nmi_kmeans_labels': (q_nmi_kmeans_labels, SQL_NMI_KMEANS_LABELS)})


def q_davies_bouldin_kmeans(sf_dir: str):
    """Davies-Bouldin index of the k-means assignment (lower =
    tighter clusters): per-cluster scatter is an exact integer fold
    of micro-quantized member-to-centroid distances finished with
    integer division, pairwise centroid separations quantize the same
    way, and each cluster's worst ratio nano-quantizes before the
    order-independent integer mean. One rows x k scan; everything
    after is k-bounded."""
    from ..stages.cluster import deterministic_centroids, kmeans_assign

    K = 8
    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = deterministic_centroids(emb, K)
    Cm = np.stack([np.asarray(v, np.float64) for v in C])
    assign = kmeans_assign(emb, C)

    def scatter_partial(b: pa.Table) -> pa.Table:
        cl = b["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [np.asarray(v, np.float64) for v in b["embedding"].to_pylist()]
        )
        d = np.sqrt(
            np.maximum(
                (Q * Q).sum(1)[:, None]
                - 2.0 * (Q @ Cm.T)
                + (Cm * Cm).sum(1)[None, :],
                0.0,
            )
        )
        dq = np.floor(
            d[np.arange(len(cl)), cl] * 1e6
        ).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(
                    np.arange(K, dtype=np.int64)
                ),
                "s": pa.array(
                    np.bincount(cl, weights=dq, minlength=K).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "n": pa.array(
                    np.bincount(cl, minlength=K).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    agg = (
        assign.map_batches(scatter_partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("cluster")
    )
    s = agg["s"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    sigma = np.where(n > 0, s // np.maximum(n, 1), 0)  # micro ints
    cd = np.sqrt(
        np.maximum(
            (Cm * Cm).sum(1)[:, None]
            - 2.0 * (Cm @ Cm.T)
            + (Cm * Cm).sum(1)[None, :],
            0.0,
        )
    )
    cdq = np.floor(cd * 1e6).astype(np.int64)
    acc = 0
    for i in range(K):
        best = 0
        for j in range(K):
            if j == i or cdq[i, j] == 0:
                continue
            r = int(
                np.floor(
                    (int(sigma[i]) + int(sigma[j]))
                    * 1.0
                    / int(cdq[i, j])
                    * 1e9
                )
            )
            best = max(best, r)
        acc += best
    db = np.floor(acc * 1.0 / K / 1e9 * 1e6) / 1e6
    return pd.DataFrame(
        {"k": [K], "db_index": [float(db)]}
    ).astype({"k": np.int64})


SQL_DAVIES_BOULDIN_KMEANS = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
dc AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT vec_id, cluster, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM dc) WHERE rn = 1
),
sig AS (
  SELECT cluster,
         CAST(sum(CAST(floor(dist * 1e6) AS BIGINT)) AS BIGINT)
           // CAST(count(*) AS BIGINT) AS sigma
  FROM assign GROUP BY cluster
),
cd AS (
  SELECT a.cluster AS i, b.cluster AS j,
         CAST(floor(list_distance(a.cvec, b.cvec) * 1e6) AS BIGINT)
           AS d
  FROM cent a JOIN cent b ON b.cluster <> a.cluster
),
ratios AS (
  SELECT cd.i,
         CAST(max(CAST(floor((si.sigma + sj.sigma) * 1.0 / cd.d * 1e9)
                       AS BIGINT)) AS BIGINT) AS best
  FROM cd JOIN sig si ON si.cluster = cd.i
          JOIN sig sj ON sj.cluster = cd.j
  WHERE cd.d > 0
  GROUP BY cd.i
)
SELECT CAST(8 AS BIGINT) AS k,
       floor(CAST(sum(best) AS BIGINT) * 1.0 / 8 / 1e9 * 1e6) / 1e6
         AS db_index
FROM ratios
"""


def q_dunn_kmeans(sf_dir: str):
    """Dunn index (higher = better separated): min inter-cluster
    pairwise distance over max intra-cluster diameter. Both extrema
    fold over MICRO-QUANTIZED integer distances (min/max are
    order-free, so no float-reduction hazard anywhere); per-batch
    partial min/max rows keep the exchange at 2 x batches."""
    from ..stages.cluster import deterministic_centroids, kmeans_assign

    K = 8
    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = deterministic_centroids(emb, K)
    assign = (
        kmeans_assign(emb, C)
        .drop_columns([])
        .to_pandas()
        .sort_values("vec_id")
    )
    ids = assign["vec_id"].to_numpy(np.int64)
    cl = assign["cluster"].to_numpy(np.int64)
    M = np.stack(
        [np.asarray(v, np.float64) for v in assign["embedding"]]
    )

    emb2 = kmeans_assign(emb, C)

    def extrema_partial(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bc = b["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [np.asarray(v, np.float64) for v in b["embedding"].to_pylist()]
        )
        d = np.sqrt(
            np.maximum(
                (Q * Q).sum(1)[:, None]
                - 2.0 * (Q @ M.T)
                + (M * M).sum(1)[None, :],
                0.0,
            )
        )
        dq = np.floor(d * 1e6).astype(np.int64)
        self_col = np.searchsorted(ids, vid)
        same = bc[:, None] == cl[None, :]
        dq_self = dq.copy()
        dq_self[np.arange(len(vid)), self_col] = -1
        intra = dq_self[same]
        intra_max = int(intra.max()) if intra.size else -1
        inter = dq[~same]
        inter_min = int(inter.min()) if inter.size else 2**62
        return pa.table(
            {
                "intra_max": pa.array([intra_max], pa.int64()),
                "inter_min": pa.array([inter_min], pa.int64()),
            }
        )

    parts = emb2.map_batches(
        extrema_partial, batch_format="pyarrow"
    ).to_pandas()
    intra = int(parts["intra_max"].max())
    inter = int(parts["inter_min"].min())
    dunn = np.floor(inter * 1.0 / intra * 1e6) / 1e6
    return pd.DataFrame(
        {
            "intra_max_micro": [intra],
            "inter_min_micro": [inter],
            "dunn": [float(dunn)],
        }
    ).astype(
        {"intra_max_micro": np.int64, "inter_min_micro": np.int64}
    )


SQL_DUNN_KMEANS = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
dc AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM dc) WHERE rn = 1
),
pd_ AS (
  SELECT aa.cluster AS ca, ab.cluster AS cb,
         CAST(floor(list_distance(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))
                    * 1e6) AS BIGINT) AS d
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  JOIN assign aa ON aa.vec_id = a.vec_id
  JOIN assign ab ON ab.vec_id = b.vec_id
)
SELECT (SELECT CAST(max(d) AS BIGINT) FROM pd_ WHERE ca = cb)
         AS intra_max_micro,
       (SELECT CAST(min(d) AS BIGINT) FROM pd_ WHERE ca <> cb)
         AS inter_min_micro,
       floor((SELECT min(d) FROM pd_ WHERE ca <> cb) * 1.0
             / (SELECT max(d) FROM pd_ WHERE ca = cb) * 1e6) / 1e6
         AS dunn
"""


REGISTRY.update({'davies_bouldin_kmeans': (
            q_davies_bouldin_kmeans,
            SQL_DAVIES_BOULDIN_KMEANS,
        )})


REGISTRY.update({'dunn_kmeans': (q_dunn_kmeans, SQL_DUNN_KMEANS)})
