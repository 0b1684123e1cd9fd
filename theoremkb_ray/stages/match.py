"""Theorem matching: given (citing_doc, cited_doc) pairs, match each
result of the citing doc to its best-matching result in the cited doc.

Re-expresses the reference's TF-IDF cosine matcher (reference:
Styling/tools/thm_similarity/model_tfidf.py:22-65 — a TfidfVectorizer
fitted PER TARGET PAPER, cosine argmax per citing theorem; reported
~80% top-1 success, thm_similarity/README.md:13-15) as:

    results x doc_pairs (broadcast)  ->  fan-out rows tagged pair_id
    ->  groupby(pair_id)             ->  per-pair vectorized TF-IDF
                                         cosine argmax (numpy hashed
                                         counts; no sklearn)

The only shuffle is on pair_id; the doc-pair table is the broadcast
small side. Group size = results of two documents (tiny), so
map_groups granularity is per PAIR — bounded, not per-corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.hashing import hash_strings
from ..state.broadcast import get_broadcast

_DIM = 1 << 15


def _hashed_counts(texts: list[str]) -> np.ndarray:
    """(n, _DIM) float32 hashed token-count matrix."""
    M = np.zeros((len(texts), _DIM), dtype=np.float32)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        idx = (hash_strings(toks) % np.uint64(_DIM)).astype(np.int64)
        np.add.at(M[i], idx, 1.0)
    return M


def _fanout_batch(batch: pa.Table, pairs_ref) -> pa.Table:
    """results batch -> rows replicated per participating doc pair.

    pairs maps doc_id -> list[(pair_id, role)]; role 'src' for the
    citing doc, 'dst' for the cited doc."""
    part: dict[str, list[tuple[int, str]]] = get_broadcast(pairs_ref)
    docs = batch["doc_id"].to_numpy(zero_copy_only=False)
    eids = batch["entity_id"].to_numpy(zero_copy_only=False)
    names = batch["name"].to_numpy(zero_copy_only=False)
    kinds = batch["kind"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_numpy(zero_copy_only=False)
    o_pair, o_role, o_eid, o_name, o_text = [], [], [], [], []
    for i in range(len(docs)):
        if kinds[i] == "proof":
            continue
        for pair_id, role in part.get(docs[i], ()):
            o_pair.append(pair_id)
            o_role.append(role)
            o_eid.append(eids[i])
            o_name.append(names[i])
            o_text.append(texts[i])
    return pa.table(
        {
            "pair_id": pa.array(o_pair, pa.int64()),
            "role": pa.array(o_role, pa.string()),
            "entity_id": pa.array(o_eid, pa.string()),
            "name": pa.array(o_name, pa.string()),
            "text": pa.array(o_text, pa.string()),
        }
    )


def _match_pair(g: pd.DataFrame) -> pd.DataFrame:
    src = g[g["role"] == "src"]
    dst = g[g["role"] == "dst"]
    empty = pd.DataFrame(
        {
            "src_entity": pd.Series(dtype=str),
            "dst_entity": pd.Series(dtype=str),
            "confidence": pd.Series(dtype=float),
        }
    )
    if len(src) == 0 or len(dst) == 0:
        return empty
    # TF-IDF fitted on the TARGET doc's results (reference semantics)
    D = _hashed_counts(dst["text"].tolist())
    df = (D > 0).sum(axis=0).astype(np.float32)
    idf = np.log((1.0 + len(dst)) / (1.0 + df)) + 1.0
    Dw = D * idf
    Dn = Dw / np.maximum(np.linalg.norm(Dw, axis=1, keepdims=True), 1e-9)
    S = _hashed_counts(src["text"].tolist()) * idf
    Sn = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-9)
    sim = Sn @ Dn.T  # (n_src, n_dst)
    best = sim.argmax(axis=1)
    return pd.DataFrame(
        {
            "src_entity": src["entity_id"].to_numpy(),
            "dst_entity": dst["entity_id"].to_numpy()[best],
            "confidence": np.round(sim[np.arange(len(src)), best], 6),
        }
    )


def tfidf_match(results_ds, doc_pairs: list[tuple[str, str]]):
    """Match results across document pairs.

    doc_pairs: [(citing_doc_id, cited_doc_id), ...]. Returns a Dataset
    (src_entity, dst_entity, confidence) with one row per citing
    result (top-1 match, the reference's argmax)."""
    part: dict[str, list[tuple[int, str]]] = {}
    for pid, (src_doc, dst_doc) in enumerate(doc_pairs):
        part.setdefault(src_doc, []).append((pid, "src"))
        part.setdefault(dst_doc, []).append((pid, "dst"))
    ref = ray.put(part)
    fanned = results_ds.map_batches(
        lambda b: _fanout_batch(b, ref), batch_format="pyarrow"
    )
    return fanned.groupby("pair_id").map_groups(
        _match_pair, batch_format="pandas"
    )


def jaccard_match(ds, candidates, text_col: str = "text", id_col: str = "doc_id"):
    """Top-1 match of every row of ``ds`` against a SMALL candidate
    table by token-SET Jaccard similarity (the catalog-matching shape:
    docs vs a bounded reference set — J9's argmax contract with an
    exact-integer similarity, so the winner is value-hash-oracle-able;
    the TF-IDF sibling :func:`tfidf_match` keeps the reference's
    per-pair cosine semantics).

    ``candidates``: a pyarrow Table / pandas DataFrame with
    ``(id_col, text_col)``. Broadcast once as (union-vocab sorted hash
    array, per-candidate boolean membership matrix); each batch scores
    docs x candidates with ONE sparse-ish matmul — no shuffle, no
    pairwise token join (the token-join plan explodes as
    sum_t df_a(t)*df_b(t); this stays |docs| x |candidates|).
    Ties break toward the smallest candidate id. Zero-token docs and
    zero-intersection docs emit no row (no meaningful match).
    """
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import flat_token_hashes_arrow

    if isinstance(candidates, pa.Table):
        candidates = candidates.to_pandas()
    cand = candidates.sort_values(id_col, kind="mergesort")
    cand_ids = cand[id_col].to_numpy()
    cand_sets = [
        np.unique(hash_strings(t.split()))
        if t.split()
        else np.empty(0, np.uint64)
        for t in cand[text_col].tolist()
    ]
    union = np.unique(
        np.concatenate(cand_sets)
        if cand_sets and any(len(s) for s in cand_sets)
        else np.empty(0, np.uint64)
    )
    M = np.zeros((len(cand_sets), len(union)), np.float64)
    for ci, s in enumerate(cand_sets):
        M[ci, np.searchsorted(union, s)] = 1.0
    sizes = M.sum(axis=1)
    ref = ray.put((union, M, sizes, cand_ids))

    class Score:
        def __init__(self, model_ref) -> None:
            (
                self.union,
                self.M,
                self.sizes,
                self.cand_ids,
            ) = get_broadcast(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            flat, starts = flat_token_hashes_arrow(b[text_col])
            n_docs = len(starts) - 1
            lengths = np.diff(starts)
            d = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
            # distinct (doc, token) membership over the candidate vocab
            order = np.lexsort((flat, d))
            kd, kh = d[order], flat[order]
            new = np.ones(len(kd), bool)
            new[1:] = (kd[1:] != kd[:-1]) | (kh[1:] != kh[:-1])
            kd, kh = kd[new], kh[new]
            n_distinct = np.bincount(kd, minlength=n_docs).astype(
                np.float64
            )
            idx = np.searchsorted(self.union, kh)
            hit = (idx < len(self.union)) & (
                len(self.union) > 0
                and self.union[np.minimum(idx, len(self.union) - 1)]
                == kh
            )
            X = np.zeros((n_docs, len(self.union)), np.float64)
            X[kd[hit], idx[hit]] = 1.0
            inter = X @ self.M.T  # docs x candidates
            union_sz = (
                n_distinct[:, None] + self.sizes[None, :] - inter
            )
            with np.errstate(invalid="ignore", divide="ignore"):
                sim = np.where(union_sz > 0, inter / union_sz, 0.0)
            best = np.argmax(sim, axis=1)  # first max = smallest cand id
            rows = np.arange(n_docs)
            keep = inter[rows, best] > 0
            return pa.table(
                {
                    "doc_id": b[id_col].filter(pa.array(keep)),
                    "match_id": pa.array(
                        self.cand_ids[best[keep]], pa.int64()
                    ),
                    "inter_n": pa.array(
                        inter[rows, best][keep].astype(np.int64),
                        pa.int64(),
                    ),
                    "sim": pa.array(
                        sim[rows, best][keep], pa.float64()
                    ),
                }
            )

    return ds.map_batches(
        Score,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
    )
