"""Fuzzy (approximate-string) self-join via deletion neighborhoods.

The scalable form of "titles within one token edit" (the SymSpell /
FastSS technique; the reference's GROBID title matcher,
Styling/tools/references/get_links.py:57-162, normalizes then
EXACT-matches — this operator is what it needs when titles disagree by
a word). Definition: two rows pair iff they share a VARIANT, where a
row's variants are its (token-capped) string plus every
one-token-deletion of it — this captures token-level edit distance <= 1
(insert/delete: one's identity equals the other's deletion;
substitute: both delete the differing position).

Scale shape:
- variant generation is vectorized per deletion index (Arrow list
  take + binary_join — the `chunk_documents` index trick), so a batch
  pays ``max_tokens`` vectorized passes, never a per-row loop;
- variants exchange on a coarse hash; within a group, candidate runs
  come from a sort + run detection, and pairing compares the ACTUAL
  variant strings (no hash-collision false positives — the
  `fuzzy_pairs` oracle is exact string equality in DuckDB);
- variant count per row is bounded by ``max_tokens + 1`` and variant
  length by the token cap, so the exchange volume is a constant
  factor of the key column, independent of document body size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings


def _emit_variants(
    b: pa.Table, id_col: str, text_col: str, max_tokens: int, coarse: int
) -> pa.Table:
    toks = pc.split_pattern(b[text_col], " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    toks = pc.list_slice(toks, 0, max_tokens)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    ntok = np.diff(offs)
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)

    out_ids, out_vars = [], []
    # identity variant (the capped string itself)
    out_ids.append(ids)
    out_vars.append(pc.binary_join(toks, " "))
    # deletion variants, one vectorized pass per deletion index
    for i in range(max_tokens):
        sel = np.flatnonzero(ntok > max(i, 0))
        sel = sel[ntok[sel] > 1]  # deleting the only token -> ""
        sel = sel[ntok[sel] > i]
        if not len(sel):
            continue
        lens = ntok[sel] - 1
        total = int(lens.sum())
        lcum = np.cumsum(np.r_[0, lens[:-1]])
        # full ranges minus the deleted position
        base = np.repeat(offs[sel], lens)
        within = np.arange(total) - np.repeat(lcum, lens)
        idx = base + within + (within >= i)
        taken = flat.take(pa.array(idx, pa.int64()))
        new_offs = np.r_[0, np.cumsum(lens)].astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), taken
        )
        out_ids.append(ids[sel])
        out_vars.append(pc.binary_join(lists, " "))
    all_ids = np.concatenate(out_ids)
    var_arr = pa.concat_arrays(
        [v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
         for v in out_vars]
    )
    ck = (
        hash_strings(var_arr.to_numpy(zero_copy_only=False))
        % np.uint64(coarse)
    ).astype(np.int64)
    return pa.table(
        {
            "id": pa.array(all_ids, pa.int64()),
            "variant": var_arr,
            "ck": pa.array(ck, pa.int64()),
        }
    )


def fuzzy_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 12,
    coarse: int = 64,
    hot_cap: int | None = None,
):
    """-> Dataset(id_a, id_b): distinct pairs within token edit
    distance <= 1 on the first ``max_tokens`` tokens (id_a < id_b).

    ``hot_cap``: production guard for degenerate keys (a web corpus
    has millions of docs titled "untitled" — all-pairs on that run is
    quadratic). Runs longer than the cap emit STAR edges to the run's
    min id instead of all pairs — connected components are preserved
    (the dedup use case) but pair completeness is not, so the exact
    `fuzzy_pairs` oracle runs uncapped."""

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["variant", "id"])
        dup = g[g.duplicated("variant", keep=False)]
        if dup.empty:
            return pd.DataFrame(
                {
                    "id_a": np.empty(0, np.int64),
                    "id_b": np.empty(0, np.int64),
                }
            )
        dup = dup.sort_values(["variant", "id"], kind="mergesort")
        ids = dup["id"].to_numpy()
        v = dup["variant"].to_numpy()
        change = np.r_[True, v[1:] != v[:-1]]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(v)))
        out_a, out_b = [], []
        two = starts[lens == 2]
        if len(two):
            out_a.append(ids[two])
            out_b.append(ids[two + 1])
        for s0, ln in zip(starts[lens > 2], lens[lens > 2]):
            if hot_cap is not None and ln > hot_cap:
                run = ids[s0 : s0 + ln]
                mn = run.min()
                others = run[run != mn]
                out_a.append(np.full(len(others), mn, np.int64))
                out_b.append(others)
                continue
            ii, jj = np.triu_indices(ln, k=1)
            out_a.append(ids[s0 + ii])
            out_b.append(ids[s0 + jj])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        bb = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        keep = a != bb
        a, bb = a[keep], bb[keep]
        lo, hi = np.minimum(a, bb), np.maximum(a, bb)
        packed = np.unique(lo * (1 << 32) + hi)
        return pd.DataFrame(
            {
                "id_a": (packed >> 32).astype(np.int64),
                "id_b": (packed & ((1 << 32) - 1)).astype(np.int64),
            }
        )

    cand = (
        ds.select_columns([id_col, text_col])
        .map_batches(
            lambda b: _emit_variants(b, id_col, text_col, max_tokens, coarse),
            batch_format="pyarrow",
        )
        .groupby("ck")
        .map_groups(pairs_in_group, batch_format="pandas")
    )

    # distinct across coarse groups (the same pair can arise from
    # variants landing in different groups): one more tiny exchange
    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        packed = np.unique(
            g["id_a"].to_numpy() * (1 << 32) + g["id_b"].to_numpy()
        )
        return pd.DataFrame(
            {
                "id_a": (packed >> 32).astype(np.int64),
                "id_b": (packed & ((1 << 32) - 1)).astype(np.int64),
            }
        )

    def key(b: pa.Table) -> pa.Table:
        k = (
            b["id_a"].to_numpy(zero_copy_only=False) * 31
            + b["id_b"].to_numpy(zero_copy_only=False)
        ) % coarse
        return b.append_column("pk", pa.array(k, pa.int64()))

    return (
        cand.map_batches(key, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(dedup_pairs, batch_format="pandas")
    )
