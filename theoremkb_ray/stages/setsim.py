"""Prefix-filtered set-similarity self-join (PPJoin-style).

All-pairs token-set Jaccard >= t — the classic exact near-duplicate
join (Chaudhuri/Ganti/Kaushik SSJoin, Xiao et al. PPJoin). The
reference's theorem matcher scores candidate pairs it is GIVEN
(Styling/tools/references/get_links.py matches titles after exact
normalization); this operator is the missing piece that DISCOVERS the
candidate pairs at corpus scale without an all-pairs product.

Algorithm (two Dataset passes + one pair-bounded exchange):

1. **Global token order.** One ``map_batches`` pass emits per-batch
   partial document frequencies; a tiny ``groupby`` reduces them and
   the (token-hash -> df) table is broadcast once via ``ray.put`` as a
   sorted-hash + rank pair of numpy arrays (never a Python dict).
   Ordering tokens rarest-first minimizes candidate generation; the
   prefix-filter THEOREM only needs SOME consistent global order, so
   at 100 TB the df table can be truncated to the top-k frequent
   tokens with the tail falling back to hash order — correctness is
   unaffected, only candidate counts grow.
2. **Prefix postings.** Per doc: the distinct token-hash set (first
   ``max_tokens`` whitespace tokens), sorted by (df, hash). If
   Jaccard(a, b) >= t then the two prefixes of length
   ``n - ceil(t*n) + 1`` must share a token, so each doc emits one
   posting row per PREFIX token only, carrying (token, id, n,
   sorted token-set). Posting volume is O(docs * (1-t) * max_tokens)
   — a constant factor of the id column, independent of body size.
3. **Candidate pairs + verify.** Postings exchange on a coarse hash
   of the token; within a group, runs of equal token yield candidate
   pairs (id_a < id_b), the Jaccard LENGTH filter
   (min(n) >= t * max(n)) prunes vectorized, and survivors verify by
   exact sorted-array intersection. Verified pairs deduplicate in one
   final pair-bounded exchange (the same pair can surface under
   several shared prefix tokens).

No stage materializes the corpus; the only driver-side object is the
bounded df table. Skew note: prefix tokens are rare-first by
construction, so posting groups are small; a degenerate corpus (every
doc identical) degrades to the true output size, which is inherently
quadratic in that case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import flat_tokens_arrow, hash_strings


def _doc_distinct_hashes(
    texts, max_tokens: int
) -> tuple[np.ndarray, np.ndarray]:
    """(flat distinct token hashes, int64[N+1] offsets): per-doc
    DISTINCT hashes of the first ``max_tokens`` whitespace tokens,
    sorted by hash within each doc."""
    flat, starts = flat_tokens_arrow(texts)
    n_docs = len(starts) - 1
    if len(flat) == 0:
        return np.empty(0, np.uint64), np.zeros(n_docs + 1, np.int64)
    lens = np.diff(starts)
    d = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    pos = np.arange(len(d), dtype=np.int64) - np.repeat(starts[:-1], lens)
    keep = pos < max_tokens
    h = hash_strings(flat.to_numpy(zero_copy_only=False))[keep]
    d = d[keep]
    # distinct within doc: sort by (doc, hash), drop equal neighbours
    order = np.lexsort((h, d))
    h, d = h[order], d[order]
    uniq = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
    h, d = h[uniq], d[uniq]
    offs = np.zeros(n_docs + 1, np.int64)
    offs[1:] = np.cumsum(np.bincount(d, minlength=n_docs))
    return h, offs


def _df_partials(
    b: pa.Table, text_col: str, max_tokens: int
) -> pa.Table:
    h, _ = _doc_distinct_hashes(b[text_col], max_tokens)
    tok, cnt = np.unique(h, return_counts=True)
    return pa.table(
        {
            "tok": pa.array(tok.view(np.int64), pa.int64()),
            "df": pa.array(cnt.astype(np.int64), pa.int64()),
        }
    )


def token_df_table(ds, text_col: str, max_tokens: int) -> pa.Table:
    """Global (tok, df) via partial counts + one small groupby —
    output bounded by vocabulary size, not corpus size."""
    parts = ds.select_columns([text_col]).map_batches(
        lambda b: _df_partials(b, text_col, max_tokens),
        batch_format="pyarrow",
    )
    t = parts.groupby("tok").sum("df").to_pandas()
    return pa.table(
        {
            "tok": pa.array(t["tok"].to_numpy(), pa.int64()),
            "df": pa.array(t["sum(df)"].to_numpy(), pa.int64()),
        }
    )


def _emit_postings(
    b: pa.Table,
    ref,
    id_col: str,
    text_col: str,
    threshold: float,
    max_tokens: int,
    coarse: int,
) -> pa.Table:
    from ..state.broadcast import get_broadcast

    vocab_h, vocab_rank = get_broadcast(ref)
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h, offs = _doc_distinct_hashes(b[text_col], max_tokens)
    n_docs = len(offs) - 1
    lens = np.diff(offs)
    if len(h) == 0:
        return pa.table(
            {
                "tok": pa.array([], pa.int64()),
                "id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "toks": pa.array([], pa.list_(pa.int64())),
                "ck": pa.array([], pa.int64()),
            }
        )
    d = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    # rank lookup (every token is in the vocab by construction here; a
    # truncated table at scale would map misses to a hash-order tail
    # tier — still one consistent global order, so still correct)
    pos = np.clip(np.searchsorted(vocab_h, h), 0, len(vocab_h) - 1)
    rank = np.where(
        vocab_h[pos] == h,
        vocab_rank[pos],
        np.int64(np.iinfo(np.int64).max // 2),
    )
    # sort within doc by (rank, hash) — rarest-first prefix order
    order = np.lexsort((h, rank, d))
    h_o, d_o = h[order], d[order]
    # prefix mask: position-within-doc < n - ceil(t*n) + 1
    starts = offs[:-1]
    pos_in_doc = np.arange(len(d_o), dtype=np.int64) - np.repeat(
        starts, lens
    )
    # epsilon guards the float product at exact-integer boundaries
    # (0.7*10 must ceil to 7, never 8): a too-LOW ceil only posts an
    # extra token, a too-high one loses recall
    p = lens - np.ceil(threshold * lens - 1e-9).astype(np.int64) + 1
    prefix = pos_in_doc < np.repeat(p, lens)
    # token-set list column (hash-sorted sets, as produced by
    # _doc_distinct_hashes before the rank re-sort)
    sets = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), pa.array(h.view(np.int64), pa.int64())
    )
    sel_doc = d_o[prefix]
    tok = h_o[prefix]
    ck = (tok % np.uint64(coarse)).astype(np.int64)
    return pa.table(
        {
            "tok": pa.array(tok.view(np.int64), pa.int64()),
            "id": pa.array(ids[sel_doc], pa.int64()),
            "n": pa.array(lens[sel_doc], pa.int64()),
            "toks": sets.take(pa.array(sel_doc, pa.int64())),
            "ck": pa.array(ck, pa.int64()),
        }
    )


_POP8 = np.array(
    [bin(i).count("1") for i in range(256)], dtype=np.uint16
)  #: byte-popcount LUT (numpy < 2.0 has no bitwise_count)


def _popcount_rows(words: np.ndarray) -> np.ndarray:
    """Row-wise popcount of a (n, B) uint64 matrix."""
    by = words.view(np.uint8).reshape(len(words), -1)
    return _POP8[by].sum(axis=1).astype(np.int64)


def _pairs_in_group(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Candidate pairs from runs of equal prefix token, verified by
    BITSET intersection over the group's token universe: every doc's
    set becomes a (B,) uint64 mask (B = ceil(|group vocab| / 64)), so
    a candidate verifies with one AND + popcount — fully vectorized
    across all pairs. Degenerate corpora (tiny shared vocabulary, the
    worst case for prefix filtering) produce millions of candidates
    per token run; the packed-pair np.unique dedup + bitset verify
    keeps that case out of Python loops entirely."""
    empty = pd.DataFrame(
        {
            "id_a": np.empty(0, np.int64),
            "id_b": np.empty(0, np.int64),
            "sim": np.empty(0, np.float64),
        }
    )
    g = g.sort_values(["tok", "id"], kind="mergesort")
    tok = g["tok"].to_numpy()
    ids = g["id"].to_numpy()
    ns = g["n"].to_numpy()
    sets = g["toks"].to_numpy()
    change = np.r_[True, tok[1:] != tok[:-1]]
    starts = np.flatnonzero(change)
    runlens = np.diff(np.append(starts, len(tok)))
    cand_a: list[np.ndarray] = []
    cand_b: list[np.ndarray] = []
    for s0, ln in zip(starts[runlens > 1], runlens[runlens > 1]):
        ii, jj = np.triu_indices(ln, k=1)
        ia, ib = s0 + ii, s0 + jj
        # Jaccard length filter, vectorized at generation time
        na, nb = ns[ia], ns[ib]
        keep = (
            np.minimum(na, nb) >= threshold * np.maximum(na, nb) - 1e-9
        ) & (ids[ia] != ids[ib])
        cand_a.append(ia[keep])
        cand_b.append(ib[keep])
    if not cand_a:
        return empty
    ia = np.concatenate(cand_a)
    ib = np.concatenate(cand_b)
    if not len(ia):
        return empty
    # canonical orientation + vectorized pair dedup (a pair can recur
    # under every shared prefix token)
    lo_row = np.where(ids[ia] <= ids[ib], ia, ib)
    hi_row = np.where(ids[ia] <= ids[ib], ib, ia)
    # rows of the same doc id under different tokens are distinct row
    # indices — dedupe by DOC-id pair via first-row representatives
    # (row indices are group-local < 2**32, so the pack is exact and
    # id magnitude never constrains it)
    uid, first_row = np.unique(ids, return_index=True)
    rep = first_row[np.searchsorted(uid, ids)]
    packed = (rep[lo_row].astype(np.uint64) << np.uint64(32)) | rep[
        hi_row
    ].astype(np.uint64)
    upacked = np.unique(packed)
    ra = (upacked >> np.uint64(32)).astype(np.int64)
    rb = (upacked & np.uint64(0xFFFFFFFF)).astype(np.int64)

    # --- bitset verify over the group's token universe: build masks
    # only for docs that appear in some candidate
    need = np.unique(np.concatenate([ra, rb]))
    toks_per = [np.asarray(sets[r]) for r in need]
    vocab_g = (
        np.unique(np.concatenate(toks_per))
        if toks_per
        else np.empty(0, np.int64)
    )
    B = max(1, (len(vocab_g) + 63) // 64)
    masks = np.zeros((len(need), B), np.uint64)
    for mi, tarr in enumerate(toks_per):
        idx = np.searchsorted(vocab_g, tarr)
        np.bitwise_or.at(
            masks,
            (np.full(len(idx), mi), idx >> 6),
            np.uint64(1) << (idx & 63).astype(np.uint64),
        )
    pos_a = np.searchsorted(need, ra)
    pos_b = np.searchsorted(need, rb)
    inter = _popcount_rows(masks[pos_a] & masks[pos_b])
    na = ns[ra].astype(np.int64)
    nb = ns[rb].astype(np.int64)
    union = na + nb - inter
    ok = union > 0
    sim = np.zeros(len(inter), np.float64)
    sim[ok] = inter[ok] / union[ok]
    keep = ok & (sim >= threshold)
    if not keep.any():
        return empty
    a_ids = ids[ra[keep]]
    b_ids = ids[rb[keep]]
    lo = np.minimum(a_ids, b_ids)
    hi = np.maximum(a_ids, b_ids)
    return pd.DataFrame(
        {
            "id_a": lo.astype(np.int64),
            "id_b": hi.astype(np.int64),
            "sim": np.round(sim[keep], 6),
        }
    )


def setsim_self_join(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    max_tokens: int = 24,
    coarse: int = 64,
):
    """-> Dataset(id_a, id_b, sim): every pair with token-set Jaccard
    >= ``threshold`` over the distinct set of the first ``max_tokens``
    whitespace tokens (id_a < id_b, sim rounded to 6dp)."""
    import ray

    df_tbl = token_df_table(
        ds.select_columns([text_col]), text_col, max_tokens
    )
    toks = df_tbl["tok"].to_numpy().view(np.uint64)
    dfs = df_tbl["df"].to_numpy()
    order = np.argsort(toks, kind="mergesort")
    vocab_h = toks[order]
    # rank = position in (df asc, hash asc) order
    rank_order = np.lexsort((vocab_h, dfs[order]))
    vocab_rank = np.empty(len(vocab_h), np.int64)
    vocab_rank[rank_order] = np.arange(len(vocab_h), dtype=np.int64)
    ref = ray.put((vocab_h, vocab_rank))

    postings = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _emit_postings(
            b, ref, id_col, text_col, threshold, max_tokens, coarse
        ),
        batch_format="pyarrow",
    )
    pairs = postings.groupby("ck").map_groups(
        lambda g: _pairs_in_group(g, threshold), batch_format="pandas"
    )

    # distinct across coarse groups (a pair can be found under prefix
    # tokens that hash to different groups)
    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[
            ["id_a", "id_b", "sim"]
        ]

    def _key(b: pa.Table) -> pa.Table:
        k = (
            b["id_a"].to_numpy(zero_copy_only=False) * 1315423911
            + b["id_b"].to_numpy(zero_copy_only=False)
        ) % coarse
        return b.append_column("pk", pa.array(k, pa.int64()))

    return (
        pairs.map_batches(_key, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_dedup, batch_format="pandas")
    )


def _containment_pairs_in_group(
    g: pd.DataFrame, threshold: float
) -> pd.DataFrame:
    """Ordered candidate verification for :func:`containment_join`.

    Rows carry ``kind``: 'q' rows are CONTAINED-side prefix postings
    (rarest floor((1-t)*n)+1 tokens — if none of those hit the
    container's set, containment < t, so recall is exact), 'x' rows
    are container-side full postings. Candidates are q-row x x-row
    products within a token run, direction known at generation; each
    verifies with one bitset intersection."""
    empty = pd.DataFrame(
        {
            "id_a": np.empty(0, np.int64),
            "id_b": np.empty(0, np.int64),
            "containment": np.empty(0, np.float64),
        }
    )
    g = g.sort_values(["tok", "kind", "id"], kind="mergesort")
    tok = g["tok"].to_numpy()
    ids = g["id"].to_numpy()
    ns = g["n"].to_numpy()
    sets = g["toks"].to_numpy()
    kind = g["kind"].to_numpy()
    change = np.r_[True, tok[1:] != tok[:-1]]
    starts = np.flatnonzero(change)
    runlens = np.diff(np.append(starts, len(tok)))
    cand_q: list[np.ndarray] = []
    cand_x: list[np.ndarray] = []
    for s0, ln in zip(starts, runlens):
        rows = np.arange(s0, s0 + ln)
        qr = rows[kind[rows] == "q"]
        xr = rows[kind[rows] == "x"]
        if not len(qr) or not len(xr):
            continue
        qq = np.repeat(qr, len(xr))
        xx = np.tile(xr, len(qr))
        keep = ids[qq] != ids[xx]
        cand_q.append(qq[keep])
        cand_x.append(xx[keep])
    if not cand_q:
        return empty
    qa = np.concatenate(cand_q)
    xb = np.concatenate(cand_x)
    if not len(qa):
        return empty
    # dedupe ordered (contained, container) doc pairs via first-row
    # representatives (per kind, so the mask build sees each doc once)
    uid, first_row = np.unique(ids, return_index=True)
    rep = first_row[np.searchsorted(uid, ids)]
    packed = (rep[qa].astype(np.uint64) << np.uint64(32)) | rep[
        xb
    ].astype(np.uint64)
    upacked, ui = np.unique(packed, return_index=True)
    ra = qa[ui]
    rb = xb[ui]

    need = np.unique(np.concatenate([rep[ra], rep[rb]]))
    toks_per = [np.asarray(sets[r]) for r in need]
    vocab_g = (
        np.unique(np.concatenate(toks_per))
        if toks_per
        else np.empty(0, np.int64)
    )
    B = max(1, (len(vocab_g) + 63) // 64)
    masks = np.zeros((len(need), B), np.uint64)
    for mi, tarr in enumerate(toks_per):
        idx = np.searchsorted(vocab_g, tarr)
        np.bitwise_or.at(
            masks,
            (np.full(len(idx), mi), idx >> 6),
            np.uint64(1) << (idx & 63).astype(np.uint64),
        )
    pos_a = np.searchsorted(need, rep[ra])
    pos_b = np.searchsorted(need, rep[rb])
    inter = _popcount_rows(masks[pos_a] & masks[pos_b])
    na = ns[ra].astype(np.float64)
    cont = np.zeros(len(inter), np.float64)
    okn = na > 0
    cont[okn] = inter[okn] / na[okn]
    keep = okn & (cont >= threshold)
    if not keep.any():
        return empty
    return pd.DataFrame(
        {
            "id_a": ids[ra[keep]].astype(np.int64),
            "id_b": ids[rb[keep]].astype(np.int64),
            "containment": np.round(cont[keep], 6),
        }
    )


def _emit_containment_postings(
    b: pa.Table,
    ref,
    id_col: str,
    text_col: str,
    threshold: float,
    max_tokens: int,
    coarse: int,
) -> pa.Table:
    """Both posting kinds in one pass: 'q' = contained-side prefix
    (rarest floor((1-t)*n)+1 tokens), 'x' = container-side full set.
    The q token-set column carries the FULL set (verification needs
    it), only the posted-token count shrinks."""
    from ..state.broadcast import get_broadcast

    vocab_h, vocab_rank = get_broadcast(ref)
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h, offs = _doc_distinct_hashes(b[text_col], max_tokens)
    n_docs = len(offs) - 1
    lens = np.diff(offs)
    if len(h) == 0:
        return pa.table(
            {
                "tok": pa.array([], pa.int64()),
                "id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "kind": pa.array([], pa.string()),
                "toks": pa.array([], pa.list_(pa.int64())),
                "ck": pa.array([], pa.int64()),
            }
        )
    d = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    pos = np.clip(np.searchsorted(vocab_h, h), 0, len(vocab_h) - 1)
    rank = np.where(
        vocab_h[pos] == h,
        vocab_rank[pos],
        np.int64(np.iinfo(np.int64).max // 2),
    )
    order = np.lexsort((h, rank, d))
    h_o, d_o = h[order], d[order]
    starts = offs[:-1]
    pos_in_doc = np.arange(len(d_o), dtype=np.int64) - np.repeat(
        starts, lens
    )
    # epsilon: (1-0.8)*5 computes 0.999... in floats; the prefix
    # bound needs p > (1-t)*n EXACTLY, and a too-large p only costs
    # an extra posting
    p = np.floor((1.0 - threshold) * lens + 1e-9).astype(np.int64) + 1
    prefix = pos_in_doc < np.repeat(p, lens)
    sets = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), pa.array(h.view(np.int64), pa.int64())
    )

    def rows(sel_doc, tok, kind):
        ck = (tok % np.uint64(coarse)).astype(np.int64)
        return pa.table(
            {
                "tok": pa.array(tok.view(np.int64), pa.int64()),
                "id": pa.array(ids[sel_doc], pa.int64()),
                "n": pa.array(lens[sel_doc], pa.int64()),
                "kind": pa.array(
                    np.full(len(sel_doc), kind), pa.string()
                ),
                "toks": sets.take(pa.array(sel_doc, pa.int64())),
                "ck": pa.array(ck, pa.int64()),
            }
        )

    q = rows(d_o[prefix], h_o[prefix], "q")
    x = rows(d_o, h_o, "x")
    return pa.concat_tables([q, x])


# 16-bit popcount lookup (numpy 1.x has no bitwise_count)
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.view(np.uint64)
    m = np.uint64(0xFFFF)
    return (
        _POP16[(x & m).astype(np.int64)].astype(np.int64)
        + _POP16[((x >> np.uint64(16)) & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(32)) & m).astype(np.int64)]
        + _POP16[((x >> np.uint64(48)) & m).astype(np.int64)]
    )


def _containment_bitmask(
    ds,
    id_col: str,
    text_col: str,
    threshold: float,
    max_tokens: int,
    vocab_h: np.ndarray,
):
    """Small-vocabulary fast plan for :func:`containment_join`: with a
    GLOBAL vocabulary of <= 64 distinct tokens every doc's set is one
    uint64 bitmask, so candidate generation collapses — the posting
    plan's prefix filter degenerates here (rare tokens aren't rare:
    measured 60M candidates vs 25M total ordered pairs at 5k docs).
    One bounded (id, mask, n) table broadcasts; each batch verifies
    against ALL masks with chunked uint64 AND + popcount (the same
    broadcast-matmul shape as brute-force ANN). Quadratic work is
    inherent at this vocabulary (the OUTPUT is near-quadratic); the
    caller gates this plan on a doc-count budget."""
    import ray
    import ray.data as rd

    from ..state.broadcast import get_broadcast

    def mask_batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h, offs = _doc_distinct_hashes(b[text_col], max_tokens)
        bit = np.searchsorted(vocab_h, h).astype(np.uint64)
        d = np.repeat(
            np.arange(len(offs) - 1, dtype=np.int64), np.diff(offs)
        )
        masks = np.zeros(len(ids), np.uint64)
        np.bitwise_or.at(masks, d, np.uint64(1) << bit)
        n = np.diff(offs)
        keep = n > 0
        return pa.table(
            {
                "id": pa.array(ids[keep], pa.int64()),
                "mask": pa.array(masks[keep].view(np.int64), pa.int64()),
                "n": pa.array(n[keep], pa.int64()),
            }
        )

    tbl = (
        ds.select_columns([id_col, text_col])
        .map_batches(mask_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("id", kind="mergesort")
    )
    all_ids = tbl["id"].to_numpy(np.int64)
    all_masks = tbl["mask"].to_numpy(np.int64).view(np.uint64)
    ref = ray.put((all_ids, all_masks))

    class Verify:
        def __init__(self, model_ref) -> None:
            self.ids, self.masks = get_broadcast(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            qa_id = b["id"].to_numpy(zero_copy_only=False)
            qa_mask = (
                b["mask"].to_numpy(zero_copy_only=False).view(np.uint64)
            )
            qa_n = b["n"].to_numpy(zero_copy_only=False)
            out_a, out_b, out_c = [], [], []
            CH = 32_768  # bound the (batch x chunk) AND matrix
            for lo in range(0, len(self.masks), CH):
                mb = self.masks[lo : lo + CH]
                inter = _popcount64(qa_mask[:, None] & mb[None, :])
                cont = inter / qa_n[:, None]
                hit = (cont >= threshold) & (
                    qa_id[:, None] != self.ids[lo : lo + CH][None, :]
                )
                ai, bi = np.nonzero(hit)
                out_a.append(qa_id[ai])
                out_b.append(self.ids[lo : lo + CH][bi])
                out_c.append(np.round(cont[ai, bi], 6))
            return pa.table(
                {
                    "id_a": pa.array(
                        np.concatenate(out_a) if out_a else [], pa.int64()
                    ),
                    "id_b": pa.array(
                        np.concatenate(out_b) if out_b else [], pa.int64()
                    ),
                    "containment": pa.array(
                        np.concatenate(out_c) if out_c else [],
                        pa.float64(),
                    ),
                }
            )

    docs = rd.from_arrow(
        pa.table(
            {
                "id": pa.array(all_ids, pa.int64()),
                "mask": pa.array(all_masks.view(np.int64), pa.int64()),
                "n": pa.array(tbl["n"].to_numpy(np.int64), pa.int64()),
            }
        )
    ).repartition(max(1, len(all_ids) // 2048))
    return docs.map_batches(
        Verify,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=1024,
    )


def containment_join(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_tokens: int = 24,
    coarse: int = 64,
    small_vocab_docs: int = 150_000,
):
    """-> Dataset(id_a, id_b, containment): ORDERED pairs where doc
    ``id_a``'s token set is >= ``threshold`` CONTAINED in ``id_b``'s —
    the subset-duplicate / boilerplate-quotation detector (asymmetric
    near-dup: a short doc embedded in a long one never clears Jaccard
    but clears containment).

    Same posting machinery as :func:`setsim_self_join`, with the
    containment-specific prefix theorem: the CONTAINED side posts only
    its floor((1-t)*n)+1 rarest tokens (if none hit the container's
    set, more than (1-t)*n tokens are missing and containment < t),
    while the CONTAINER side posts its full set — candidates are
    q-prefix x x-full products per token run, direction known at
    generation."""
    import ray

    df_tbl = token_df_table(
        ds.select_columns([text_col]), text_col, max_tokens
    )
    if len(df_tbl) <= 64 and ds.count() <= small_vocab_docs:
        # <= 64 distinct tokens globally: the prefix filter degenerates
        # (candidates exceed all-pairs) — switch to the uint64 bitmask
        # plan. Gated on doc count: the work (and the OUTPUT) is
        # near-quadratic at this vocabulary on any plan.
        vocab_sorted = np.sort(df_tbl["tok"].to_numpy().view(np.uint64))
        return _containment_bitmask(
            ds, id_col, text_col, threshold, max_tokens, vocab_sorted
        )
    toks = df_tbl["tok"].to_numpy().view(np.uint64)
    dfs = df_tbl["df"].to_numpy()
    order = np.argsort(toks, kind="mergesort")
    vocab_h = toks[order]
    rank_order = np.lexsort((vocab_h, dfs[order]))
    vocab_rank = np.empty(len(vocab_h), np.int64)
    vocab_rank[rank_order] = np.arange(len(vocab_h), dtype=np.int64)
    ref = ray.put((vocab_h, vocab_rank))

    postings = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _emit_containment_postings(
            b, ref, id_col, text_col, threshold, max_tokens, coarse
        ),
        batch_format="pyarrow",
    )
    pairs = postings.groupby("ck").map_groups(
        lambda g: _containment_pairs_in_group(g, threshold),
        batch_format="pandas",
    )

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[
            ["id_a", "id_b", "containment"]
        ]

    def _key(b: pa.Table) -> pa.Table:
        k = (
            b["id_a"].to_numpy(zero_copy_only=False) * 1315423911
            + b["id_b"].to_numpy(zero_copy_only=False)
        ) % coarse
        return b.append_column("pk", pa.array(k, pa.int64()))

    return (
        pairs.map_batches(_key, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_dedup, batch_format="pandas")
    )
