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
