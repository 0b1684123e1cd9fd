"""BM25 text retrieval over the documents table.

Training-data addition (SURVEY.md): ranked keyword retrieval is the
lexical counterpart of the embedding similarity search in
``stages/similarity.py`` (the reference's TF-IDF theorem matcher,
Styling/tools/thm_similarity/model_tfidf.py:22-65, is the same idea
per target document; BM25 is the corpus-level generalization).

Scale shape — ONE corpus scan, ZERO shuffle of document payloads:

- the query-term list is broadcast (it is tiny: a handful of strings);
- a single ``map_batches`` pass tokenizes each batch with Arrow
  kernels, counts per-doc query-term frequencies + document length
  vectorized (flat ``np.bincount`` over doc x term indices), and emits
  (a) one wide row per MATCHED doc (doc_id, dl, tf_0..tf_{q-1}) and
  (b) one partial-stats row per batch (n_docs, sum_dl, df_j partials);
- the partial-stats rows (one per batch) fold to the global N, avgdl
  and per-term document frequencies on the driver — O(batches) rows,
  never corpus-sized;
- a second pass over the (small) matched subset applies the BM25
  formula with the now-known idf constants and keeps a per-batch
  top-k; the global top-k merges candidates with a tiny sort+limit.

At 100 TB the only materialized intermediate is the matched subset,
which is bounded by the selectivity of the query terms — the corpus
itself streams through exactly once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: BM25 free parameters (Robertson/Sparck-Jones defaults).
K1 = 1.2
B = 0.75


def _term_counts(batch: pa.Table, text_col: str, terms: list[str]):
    """Vectorized per-doc whitespace tokenization + query-term counts.

    Returns (dl, tf) — ``dl[i]`` = non-empty token count of doc i,
    ``tf[i, j]`` = occurrences of ``terms[j]`` in doc i.
    """
    toks = pc.split_pattern(batch[text_col], " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    n = len(toks)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    dl = np.bincount(doc_idx[nonempty], minlength=n)
    # match flat tokens against the query terms (index_in: null if absent)
    q = len(terms)
    hit = pc.index_in(flat, value_set=pa.array(terms, pa.string()))
    hit_np = hit.to_numpy(zero_copy_only=False)  # float with NaN for miss
    mask = ~np.isnan(hit_np)
    tf = np.bincount(
        doc_idx[mask] * q + hit_np[mask].astype(np.int64), minlength=n * q
    ).reshape(n, q)
    return dl, tf


def bm25_topk(
    ds,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """-> Dataset(doc_id, score): global BM25 top-k for ``query_terms``.

    ``score`` is rounded to 6 decimals; ordering is (score DESC,
    doc_id ASC) — ties at the cutoff resolve identically to the SQL
    ``ORDER BY score DESC, doc_id LIMIT k`` oracle because both sides
    order by the ROUNDED score.
    """
    terms = list(query_terms)
    q = len(terms)
    tf_cols = [f"tf_{j}" for j in range(q)]

    def scan(batch: pa.Table) -> pa.Table:
        dl, tf = _term_counts(batch, text_col, terms)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        matched = tf.sum(axis=1) > 0
        cols = {
            "kind": pa.array(
                np.r_[np.ones(int(matched.sum()), np.int64), 0], pa.int64()
            ),
            id_col: pa.array(np.r_[ids[matched], -1], pa.int64()),
            "n": pa.array(np.r_[np.ones(int(matched.sum()), np.int64),
                                len(ids)], pa.int64()),
            "dl": pa.array(np.r_[dl[matched], dl.sum()], pa.int64()),
        }
        # stats row carries per-term df partials in the tf columns
        df_part = (tf > 0).sum(axis=0)
        for j, c in enumerate(tf_cols):
            cols[c] = pa.array(np.r_[tf[matched, j], df_part[j]], pa.int64())
        return pa.table(cols)

    scanned = ds.map_batches(scan, batch_format="pyarrow").materialize()

    # fold the per-batch partial-stats rows (O(number of batches))
    stats = (
        scanned.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], 0)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    n_docs = int(stats["n"].sum())
    avgdl = float(stats["dl"].sum()) / max(n_docs, 1)
    df = stats[tf_cols].sum(axis=0).to_numpy(dtype=np.float64)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        tf = np.stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in tf_cols],
            axis=1,
        ).astype(np.float64)
        norm = K1 * (1.0 - B + B * dl / avgdl)
        s = (idf[None, :] * tf * (K1 + 1.0) / (tf + norm[:, None])).sum(
            axis=1
        )
        s = np.round(s, 6)
        kk = min(k, len(s))
        sel = np.argpartition(-s, kk - 1)[:kk] if kk else np.array([], int)
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(sel, pa.int64())),
                "score": pa.array(s[sel], pa.float64()),
            }
        )

    return (
        scanned.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], 1)),
            batch_format="pyarrow",
        )
        .map_batches(score, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )


def density_topk(
    ds,
    query_terms: list[str],
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """-> Dataset(doc_id, score): top-k by query-term DENSITY —
    ``(sum of query-term tfs) / doc length``. The integer tf total is
    divided ONCE, so the score is bit-identical under any batch
    composition (unlike a per-term float sum). Rounded 6dp; ordered by
    (score DESC, doc_id) like :func:`bm25_topk`."""
    terms = list(query_terms)

    def score(batch: pa.Table) -> pa.Table:
        dl, tf = _term_counts(batch, text_col, terms)
        total = tf.sum(axis=1)
        matched = total > 0
        s = np.round(
            total[matched].astype(np.float64)
            / np.maximum(dl[matched].astype(np.float64), 1.0),
            6,
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[matched]
        kk = min(k, len(s))
        sel = (
            np.argpartition(-s, kk - 1)[:kk] if kk else np.array([], int)
        )
        return pa.table(
            {
                id_col: pa.array(ids[sel], pa.int64()),
                "score": pa.array(s[sel], pa.float64()),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )


def rrf_fuse(rankings, k: int = 10, c: int = 60, id_col: str = "doc_id"):
    """Reciprocal-rank fusion of bounded top-K rankings
    (Cormack/Clarke/Buettcher): ``rrf(d) = sum_i 1/(c + rank_i(d))``
    over the systems that ranked d, ranks 1-based in each system's
    (score DESC, id ASC) order.

    Each input is a SMALL Dataset/Table already truncated to its top-K
    (the bounded output of :func:`bm25_topk` / :func:`density_topk` /
    an ANN top-k) — K rows per system reach the driver, never the
    corpus, so the fuse itself is O(systems * K). The fused terms add
    in the order the rankings are given (float determinism: the SQL
    twin coalesces in the same order). Returns a pyarrow Table
    (doc_id, rrf) of the top-k by (rrf DESC, doc_id)."""
    import pandas as pd

    ranked: list[pd.DataFrame] = []
    for r in rankings:
        df = r.to_pandas() if hasattr(r, "to_pandas") else pd.DataFrame(r)
        df = df.sort_values(
            ["score", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        ranked.append(df[[id_col, "rank"]])
    ids = np.unique(np.concatenate([d[id_col].to_numpy() for d in ranked]))
    rrf = np.zeros(len(ids), np.float64)
    for d in ranked:
        pos = np.searchsorted(ids, d[id_col].to_numpy())
        contrib = np.zeros(len(ids), np.float64)
        contrib[pos] = 1.0 / (c + d["rank"].to_numpy().astype(np.float64))
        rrf = rrf + contrib  # fixed order: one system at a time
    rrf = np.round(rrf, 6)
    order = np.lexsort((ids, -rrf))[:k]
    return pa.table(
        {
            id_col: pa.array(ids[order], pa.int64()),
            "rrf": pa.array(rrf[order], pa.float64()),
        }
    )
