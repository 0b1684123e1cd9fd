"""Corpus language-model quality scoring (CCNet-style perplexity
filter) — train a token LM distributed, score every document against
it with one broadcast + one vectorized pass.

The reference has no LM stage (its quality signal is the CRF itself);
this is one of the training-data operators a 100-TB pipeline needs:
rank documents by how "corpus-like" they are and filter the tails
(Wenzek et al., CCNet, LREC 2020 — perplexity of a small LM trained
on trusted text is the standard web-corpus quality score).

Scale shape:
- ``unigram_lm``: per-batch partial counts (np.unique over the flat
  token-hash array — one Arrow split + one siphash per batch) ->
  ``groupby(hash).sum`` over VOCABULARY-sized rows (not corpus-sized)
  -> driver collect of the vocabulary, gated by ``vocab_max`` with a
  keep-top-frequency fallback so the broadcast stays bounded on
  open-vocabulary corpora.
- ``perplexity``: the (sorted hash, logp) pair is ``ray.put`` ONCE;
  each batch is one searchsorted + one ``np.add.reduceat`` — no
  shuffle, no per-row Python.

Tokenization is the shared whitespace kernel
(`functions/hashing.py:flat_token_hashes_arrow`), which matches
DuckDB ``regexp_split_to_array(text, '\\s+')`` token-for-token — the
`perplexity_docs` query is value-hash-oracled against a pure-SQL
re-derivation of the same MLE model.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import flat_token_hashes_arrow


def unigram_lm(ds, text_col: str = "text", vocab_max: int = 5_000_000):
    """Train an MLE unigram LM over ``ds[text_col]``.

    Returns ``(hashes, logp, oov_logp, total)``: uint64 sorted token
    hashes, float64 log-probabilities, the out-of-vocabulary floor
    (log(1/total) — only reachable when the vocabulary was capped or
    the LM scores a different corpus), and the total token count.

    The groupby moves one row per DISTINCT token per block — the
    partial ``np.unique`` inside the batch is the combiner that keeps
    the exchange vocabulary-sized. If the merged vocabulary exceeds
    ``vocab_max`` rows, only the ``vocab_max`` most frequent tokens
    are kept (logged); the dropped tail scores as OOV.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = flat_token_hashes_arrow(b[text_col])
        u, c = np.unique(flat, return_counts=True)
        # int64 VIEW of the uint64 hash: Ray's groupby sort round-trips
        # keys through Python ints and overflows on values >= 2^63
        return pa.table(
            {
                "h": pa.array(u.view(np.int64)),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    n_vocab = counts.count()
    # full-corpus token count BEFORE any vocab cap: the MLE denominator
    # (and the OOV floor) must reflect the whole corpus, or capped and
    # uncapped models disagree on the tokens they share
    total = float(counts.sum("n") or 0.0)
    if n_vocab > vocab_max:
        import logging

        logging.getLogger(__name__).warning(
            "unigram_lm: vocabulary %d exceeds vocab_max %d; keeping "
            "the most frequent %d tokens (tail scores as OOV)",
            n_vocab,
            vocab_max,
            vocab_max,
        )
        counts = counts.sort("n", descending=True).limit(vocab_max)

    hs, ns = [], []
    for b in counts.iter_batches(batch_format="pyarrow"):
        hs.append(b["h"].to_numpy(zero_copy_only=False))
        ns.append(b["n"].to_numpy(zero_copy_only=False))
    h = np.concatenate(hs).astype(np.int64, copy=False).view(np.uint64)
    n = np.concatenate(ns).astype(np.float64, copy=False)
    order = np.argsort(h)
    h, n = h[order], n[order]
    logp = np.log(n / total) if total else n
    oov = float(np.log(1.0 / max(total, 1.0)))
    return h, logp, oov, total


class PerplexityScorer:
    """map_batches callable: (doc_id, text) -> (doc_id, n_tokens, nll).

    ``nll`` is the mean negative log-probability of the document's
    tokens under the broadcast LM (exp(nll) = perplexity). The LM
    tuple is fetched once per worker via the broadcast cache; the
    per-batch work is searchsorted + reduceat. Zero-token documents
    are dropped (they have no defined perplexity — and the SQL oracle
    naturally emits no row for them)."""

    def __init__(self, lm_ref) -> None:
        from ..state.broadcast import get_broadcast

        self.h, self.logp, self.oov, _ = get_broadcast(lm_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, starts = flat_token_hashes_arrow(batch["text"])
        lp = np.full(len(flat), self.oov, np.float64)
        if len(self.h) and len(flat):
            idx = np.searchsorted(self.h, flat)
            idx[idx >= len(self.h)] = len(self.h) - 1
            hit = self.h[idx] == flat
            lp[hit] = self.logp[idx[hit]]
        n_tok = np.diff(starts)
        sums = np.add.reduceat(
            np.concatenate([lp, [0.0]]), np.minimum(starts[:-1], len(lp))
        )
        sums[n_tok == 0] = 0.0
        keep = n_tok > 0
        nll = -sums[keep] / n_tok[keep]
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "n_tokens": pa.array(n_tok[keep], pa.int64()),
                "nll": pa.array(nll, pa.float64()),
            }
        )


def perplexity(ds, lm, batch_size: int | None = None):
    """Score every row of ``ds`` against a trained LM tuple. The LM is
    put in the object store once; workers share it read-only."""
    import ray

    lm_ref = ray.put(lm)
    return ds.map_batches(
        PerplexityScorer,
        fn_constructor_args=(lm_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )
