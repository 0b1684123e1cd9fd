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


# --------------------------------------------------------------------
# Bigram LM (add-k smoothed) — the KenLM-shaped upgrade of the unigram
# filter: p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + k) / (c(w_{i-1}) + k·V).
# Context-sensitive perplexity separates shuffled-token junk from
# fluent text, which a unigram model cannot (same token multiset ->
# same unigram score). Counts are exact integers, so the score is a
# pure function of the corpus and the `bigram_perplexity_docs` query
# is value-hash-oracled against a DuckDB re-derivation.
# --------------------------------------------------------------------

_BIG_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix_pair(prev: np.ndarray, cur: np.ndarray) -> np.ndarray:
    """Combine two uint64 token hashes into one bigram key
    (splitmix64-style finalizer over an asymmetric combine, so
    (a,b) != (b,a)). Collision probability over a real vocabulary is
    ~n²/2⁶⁴ — the same budget the unigram hashes already spend."""
    z = (prev * _BIG_MIX + cur) + _BIG_MIX
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bigram_pairs(flat: np.ndarray, starts: np.ndarray, with_pos=False):
    """(prev, cur[, position-mask]) for the within-doc bigrams of a
    flat token array with doc offsets. A position is a bigram slot iff
    it is not its doc's first token. Trailing empty docs have
    ``start == len(flat)`` and are skipped rather than clamped — a
    clamp would clear the final real slot (the reduceat-starts trap).
    """
    pos = np.ones(len(flat), bool)
    s = starts[:-1]
    pos[s[s < len(flat)]] = False
    prev = flat[:-1][pos[1:]] if len(flat) else flat[:0]
    cur = flat[1:][pos[1:]] if len(flat) else flat[:0]
    return (prev, cur, pos) if with_pos else (prev, cur)


def bigram_lm(ds, text_col: str = "text", k: float = 1.0):
    """Train an add-``k`` bigram LM over ``ds[text_col]``.

    Returns ``(uni_h, uni_n, bi_h, bi_n, V, k)``: sorted uint64
    unigram hashes with their counts, sorted uint64 bigram keys with
    their counts, the vocabulary size and the smoothing constant.

    ONE fused exchange trains both tables: each batch emits its
    partial unigram AND bigram counts (np.unique combiners keep the
    moved rows type-bounded, not token-bounded), tagged with a
    ``kind`` column, and a single ``groupby(kind, h).sum`` merges
    them. The exchange is bounded by the corpus' bigram-type count —
    the same scale envelope as the cooccurrence operator."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        flat, starts = flat_token_hashes_arrow(b[text_col])
        uh, uc = np.unique(flat, return_counts=True)
        keys = _mix_pair(*_bigram_pairs(flat, starts))
        bh, bc = np.unique(keys, return_counts=True)
        kind = np.concatenate(
            [np.zeros(len(uh), np.int8), np.ones(len(bh), np.int8)]
        )
        return pa.table(
            {
                "kind": pa.array(kind),
                "h": pa.array(
                    np.concatenate([uh, bh]).view(np.int64)
                ),
                "n": pa.array(
                    np.concatenate([uc, bc]).astype(np.int64)
                ),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "h"])
        .aggregate(Sum("n", alias_name="n"))
    )
    ks, hs, ns = [], [], []
    for b in counts.iter_batches(batch_format="pyarrow"):
        ks.append(b["kind"].to_numpy(zero_copy_only=False))
        hs.append(b["h"].to_numpy(zero_copy_only=False))
        ns.append(b["n"].to_numpy(zero_copy_only=False))
    kind = np.concatenate(ks) if ks else np.empty(0, np.int8)
    h = (
        np.concatenate(hs).astype(np.int64, copy=False).view(np.uint64)
        if hs
        else np.empty(0, np.uint64)
    )
    n = (
        np.concatenate(ns).astype(np.float64, copy=False)
        if ns
        else np.empty(0, np.float64)
    )
    uni_h, uni_n = h[kind == 0], n[kind == 0]
    bi_h, bi_n = h[kind == 1], n[kind == 1]
    o = np.argsort(uni_h)
    uni_h, uni_n = uni_h[o], uni_n[o]
    o = np.argsort(bi_h)
    bi_h, bi_n = bi_h[o], bi_n[o]
    return uni_h, uni_n, bi_h, bi_n, float(len(uni_h)), float(k)


class BigramScorer:
    """map_batches callable: (doc_id, text) -> (doc_id, n_bigrams,
    nll) where nll = -mean ln p(w_i | w_{i-1}) over positions
    i = 2..n. Docs with fewer than two tokens emit no row (no bigram
    positions — the SQL twin's ``len(a) >= 2`` filter)."""

    def __init__(self, lm_ref) -> None:
        from ..state.broadcast import get_broadcast

        (
            self.uni_h,
            self.uni_n,
            self.bi_h,
            self.bi_n,
            self.V,
            self.k,
        ) = get_broadcast(lm_ref)

    def _lookup(self, keys, h, n):
        out = np.zeros(len(keys), np.float64)
        if len(h) and len(keys):
            idx = np.searchsorted(h, keys)
            idx[idx >= len(h)] = len(h) - 1
            hit = h[idx] == keys
            out[hit] = n[idx[hit]]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, starts = flat_token_hashes_arrow(batch["text"])
        n_tok = np.diff(starts)
        prev, cur, pos = _bigram_pairs(flat, starts, with_pos=True)
        # per-position logp, aligned with flat; doc-first slots stay 0
        lp = np.zeros(len(flat), np.float64)
        c2 = self._lookup(_mix_pair(prev, cur), self.bi_h, self.bi_n)
        c1 = self._lookup(prev, self.uni_h, self.uni_n)
        lp[pos] = np.log((c2 + self.k) / (c1 + self.k * self.V))
        sums = np.add.reduceat(
            np.concatenate([lp, [0.0]]), np.minimum(starts[:-1], len(lp))
        )
        n_big = np.maximum(n_tok - 1, 0)
        keep = n_big > 0
        nll = -sums[keep] / n_big[keep]
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "n_bigrams": pa.array(n_big[keep], pa.int64()),
                "nll": pa.array(nll, pa.float64()),
            }
        )


def bigram_perplexity(ds, lm, batch_size: int | None = None):
    """Score every row of ``ds`` against a trained bigram LM tuple;
    the tuple is ``ray.put`` once and shared read-only by workers."""
    import ray

    lm_ref = ray.put(lm)
    return ds.map_batches(
        BigramScorer,
        fn_constructor_args=(lm_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )


# --------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al.,
# NeurIPS 2023): score every document by the log-likelihood ratio of
# an add-1 smoothed unigram LM fit on a TARGET subset (the "domain
# you want more of") against one fit on the raw corpus, then keep the
# top-scoring fraction. The reference has no analog (it curates by
# CRF structure); this is the standard pretraining-mixture selection
# operator. Scale shape: two vocabulary-sized count exchanges, both
# tables ray.put once, one shuffle-free scoring pass.
# --------------------------------------------------------------------


def unigram_counts(ds, text_col: str = "text"):
    """(sorted uint64 token hashes, float64 counts, total tokens) for
    ``ds[text_col]`` — the raw-count sibling of :func:`unigram_lm`
    (same partial-``np.unique`` combiner, vocabulary-sized exchange,
    no smoothing applied)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = flat_token_hashes_arrow(b[text_col])
        u, c = np.unique(flat, return_counts=True)
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
    )
    hs, ns = [], []
    for b in counts.iter_batches(batch_format="pyarrow"):
        hs.append(b["h"].to_numpy(zero_copy_only=False))
        ns.append(b["n"].to_numpy(zero_copy_only=False))
    h = (
        np.concatenate(hs).astype(np.int64, copy=False).view(np.uint64)
        if hs
        else np.empty(0, np.uint64)
    )
    n = (
        np.concatenate(ns).astype(np.float64, copy=False)
        if ns
        else np.empty(0, np.float64)
    )
    o = np.argsort(h)
    h, n = h[o], n[o]
    return h, n, float(n.sum())


class DSIRScorer:
    """map_batches callable: (doc_id, text) -> (doc_id, n_tokens,
    dsir_score) with

        dsir_score = mean_t [ ln p_target(t) - ln p_raw(t) ]
        p_*(t) = (c_*(t) + 1) / (T_* + V)

    where V is the RAW-corpus vocabulary size (the feature space both
    models share — a token outside it contributes the two smoothing
    floors). Positive = more target-like than corpus-average."""

    def __init__(self, model_ref) -> None:
        from ..state.broadcast import get_broadcast

        (
            self.th,
            self.tn,
            self.t_denom,
            self.rh,
            self.rn,
            self.r_denom,
        ) = get_broadcast(model_ref)

    @staticmethod
    def _counts(keys, h, n):
        out = np.zeros(len(keys), np.float64)
        if len(h) and len(keys):
            idx = np.searchsorted(h, keys)
            idx[idx >= len(h)] = len(h) - 1
            hit = h[idx] == keys
            out[hit] = n[idx[hit]]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, starts = flat_token_hashes_arrow(batch["text"])
        ct = self._counts(flat, self.th, self.tn)
        cr = self._counts(flat, self.rh, self.rn)
        lr = np.log((ct + 1.0) / self.t_denom) - np.log(
            (cr + 1.0) / self.r_denom
        )
        n_tok = np.diff(starts)
        sums = np.add.reduceat(
            np.concatenate([lr, [0.0]]), np.minimum(starts[:-1], len(lr))
        )
        sums[n_tok == 0] = 0.0
        keep = n_tok > 0
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "n_tokens": pa.array(n_tok[keep], pa.int64()),
                "dsir_score": pa.array(
                    sums[keep] / n_tok[keep], pa.float64()
                ),
            }
        )


def dsir_scores(ds, target, text_col: str = "text"):
    """Importance-ratio scores for every row of ``ds`` against the
    ``target`` subset. Trains both unigram count tables (two
    vocabulary-sized exchanges), broadcasts them once, scores in one
    streaming pass. Zero-token docs emit no row (matching the SQL
    twin). ``target`` is typically ``ds`` filtered by a predicate —
    Ray Data dedupes the shared read."""
    import ray

    th, tn, t_total = unigram_counts(target, text_col)
    rh, rn, r_total = unigram_counts(ds, text_col)
    V = float(len(rh))
    model_ref = ray.put((th, tn, t_total + V, rh, rn, r_total + V))
    return ds.map_batches(
        DSIRScorer,
        fn_constructor_args=(model_ref,),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
    )


def dsir_select(ds, target, frac: float = 0.25, text_col: str = "text"):
    """Keep the top-``frac`` of ``ds`` by DSIR score (ties broken by
    doc_id for determinism under any partitioning). The threshold is
    found with a distributed sort + limit over the SCORES table (one
    row per doc, far smaller than the corpus), never by collecting
    documents on the driver."""
    scored = dsir_scores(ds, target, text_col).materialize()
    k = max(1, int(scored.count() * frac))
    return (
        scored.sort(["dsir_score", "doc_id"], descending=[True, False])
        .limit(k)
    )
