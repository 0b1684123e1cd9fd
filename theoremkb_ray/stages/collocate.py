"""Corpus-level collocation mining and per-source distribution drift.

Two corpus-statistics operators a training-data pipeline runs before
deciding what to keep (neither exists in the reference, whose corpus
statistics are the per-layer tag tallies — `Styling/tools/analysis.py`
counts extraction kinds; these are the web-corpus analogs):

- :func:`collocations` — every adjacent-token pair occurring at least
  ``min_count`` times, scored with pointwise mutual information
  ``pmi = ln(c(a,b)·N / (c(a)·c(b)))`` (Church & Hanks 1990). The
  standard phrase-mining / tokenizer-merge-candidate signal.
- :func:`source_drift` — per-source KL divergence of the source's
  unigram distribution against the whole-corpus distribution: the
  mixture-diagnostics number that tells you which ingest feed has
  drifted away from the corpus it is supposed to extend.

Scale shape (both): per-batch ``np.unique`` combiners keep every
exchange TYPE-bounded (vocabulary / bigram-type rows, never
corpus-token rows); unigram count tables are broadcast once as sorted
uint64 hash arrays, never Python dicts. Exact integer counts make both
operators value-hash-oracle-able (``collocations_pmi``,
``source_drift`` in ``__ray_entry__``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import (
    flat_token_hashes_arrow,
    flat_tokens_arrow,
    hash_strings,
)
from .lm import _mix_pair, unigram_counts


def _pair_indices(starts: np.ndarray, n_flat: int) -> np.ndarray:
    """Indices ``i`` such that ``(flat[i-1], flat[i])`` is a within-doc
    adjacent pair (every position that is not its doc's first token).
    Trailing empty docs have ``start == n_flat`` and are skipped, not
    clamped (the reduceat-starts trap)."""
    pos = np.ones(n_flat, bool)
    s = starts[:-1]
    pos[s[s < n_flat]] = False
    return np.nonzero(pos)[0]


def collocations(ds, text_col: str = "text", min_count: int = 5):
    """All adjacent-token pairs with corpus count >= ``min_count``,
    PMI-scored. Returns a Dataset with columns
    ``(prev, cur, pair_n, pmi)``.

    The membership predicate is an exact integer count, so the result
    SET is deterministic under any partitioning (no float-boundary
    top-k)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        flat, starts = flat_tokens_arrow(b[text_col])
        h = (
            hash_strings(flat.to_numpy(zero_copy_only=False))
            if len(flat)
            else np.empty(0, np.uint64)
        )
        ci = _pair_indices(starts, len(flat))
        keys = _mix_pair(h[ci - 1], h[ci]) if len(ci) else h[:0]
        _, first, cnt = np.unique(
            keys, return_index=True, return_counts=True
        )
        sel_prev = pa.array(ci[first] - 1, pa.int64())
        sel_cur = pa.array(ci[first], pa.int64())
        return pa.table(
            {
                "prev": flat.take(sel_prev),
                "cur": flat.take(sel_cur),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    pair_counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["prev", "cur"])
        .aggregate(Sum("n", alias_name="pair_n"))
    )

    uh, un, total = unigram_counts(ds, text_col)
    import ray

    uni_ref = ray.put((uh, un, float(total)))

    class ScorePMI:
        def __init__(self, ref) -> None:
            from ..state.broadcast import get_broadcast

            self.h, self.n, self.total = get_broadcast(ref)

        def _c(self, keys):
            idx = np.searchsorted(self.h, keys)
            idx[idx >= len(self.h)] = max(len(self.h) - 1, 0)
            # every pair token was counted by the same tokenizer, so
            # the lookup always hits; guard anyway for empty models
            return (
                self.n[idx] if len(self.h) else np.ones(len(keys))
            )

        def __call__(self, b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            b = b.filter(
                pc.greater_equal(b["pair_n"], pa.scalar(min_count))
            )
            ca = self._c(
                hash_strings(b["prev"].to_numpy(zero_copy_only=False))
            )
            cb = self._c(
                hash_strings(b["cur"].to_numpy(zero_copy_only=False))
            )
            c2 = b["pair_n"].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            pmi = np.log(c2 * self.total / (ca * cb))
            return b.append_column("pmi", pa.array(pmi, pa.float64()))

    return pair_counts.map_batches(
        ScorePMI,
        fn_constructor_args=(uni_ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def source_drift(ds, group_col: str = "source", text_col: str = "text"):
    """Per-group KL divergence of the group's unigram distribution
    from the whole-corpus distribution:
    ``kl = Σ_t p_g(t)·ln(p_g(t)/p_c(t))`` over the group's token
    types. Returns ``(group_col, n_tokens, kl)`` — one row per group.

    One type-bounded exchange builds the (group, token, count) table;
    the corpus-wide distribution is re-aggregated from it (second
    type-bounded exchange) and broadcast; the per-group fold runs in
    ``map_groups`` over vocabulary-sized groups."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        groups = b[group_col]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        flat, starts = flat_token_hashes_arrow(b[text_col])
        lengths = np.diff(starts)
        gidx = pc.dictionary_encode(groups)
        codes = np.asarray(gidx.indices)
        dict_vals = gidx.dictionary
        tok_codes = np.repeat(codes.astype(np.int64), lengths)
        # per-batch (group code, token hash) counts via one lexsort
        order = np.lexsort((flat, tok_codes))
        kc, kh = tok_codes[order], flat[order]
        new = np.ones(len(kc), bool)
        new[1:] = (kc[1:] != kc[:-1]) | (kh[1:] != kh[:-1])
        starts_u = np.nonzero(new)[0]
        cnt = np.diff(np.append(starts_u, len(kc)))
        return pa.table(
            {
                group_col: dict_vals.take(
                    pa.array(kc[starts_u], pa.int64())
                ),
                "h": pa.array(kh[starts_u].view(np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    typed = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "h"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    # corpus-wide counts from the typed table (vocab-sized rows)
    glob = typed.groupby("h").aggregate(Sum("n", alias_name="n"))
    hs, ns = [], []
    for b in glob.iter_batches(batch_format="pyarrow"):
        hs.append(b["h"].to_numpy(zero_copy_only=False))
        ns.append(b["n"].to_numpy(zero_copy_only=False))
    gh = (
        np.concatenate(hs).astype(np.int64, copy=False).view(np.uint64)
        if hs
        else np.empty(0, np.uint64)
    )
    gn = (
        np.concatenate(ns).astype(np.float64, copy=False)
        if ns
        else np.empty(0, np.float64)
    )
    o = np.argsort(gh)
    gh, gn = gh[o], gn[o]
    g_total = float(gn.sum())
    import ray

    glob_ref = ray.put((gh, gn, g_total))

    def per_group(df):
        import pandas as pd

        from ..state.broadcast import get_broadcast

        h_arr, n_arr, total = get_broadcast(glob_ref)
        hh = df["h"].to_numpy().astype(np.int64).view(np.uint64)
        nn = df["n"].to_numpy().astype(np.float64)
        ns_total = nn.sum()
        idx = np.searchsorted(h_arr, hh)
        idx[idx >= len(h_arr)] = max(len(h_arr) - 1, 0)
        pc_ = n_arr[idx] / total
        pg = nn / ns_total
        kl = float(np.sum(pg * np.log(pg / pc_)))
        return pd.DataFrame(
            {
                group_col: [df[group_col].iloc[0]],
                "n_tokens": [int(ns_total)],
                "kl": [kl],
            }
        )

    return typed.groupby(group_col).map_groups(
        per_group, batch_format="pandas"
    )
