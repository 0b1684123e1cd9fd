"""Sequence packing for LM training: a distributed ORDERED PREFIX SUM
(scan) over per-document token counts.

Training corpora are consumed as one concatenated token stream chopped
into fixed-size sequences (budget = context length); each document
needs its absolute ``start_offset`` in that stream to know which
training sequence(s) it lands in. A global ordered cumsum is the
classic "wide" operation a naive engine does with one total sort +
serial pass; here it is the textbook two-phase scan:

1. one ``map_batches`` pass emits per-doc token counts tagged with a
   COARSE bucket (``doc_id // bucket_size`` — contiguous id ranges,
   so bucket order == stream order);
2. per-bucket totals are streamed to the driver (one tiny row per
   bucket per block) and exclusively-scanned there — driver state is
   O(num_buckets), tunable via ``bucket_size`` at corpus scale;
3. the scanned bucket bases go back via ONE ``ray.put`` (sorted
   numpy arrays, searchsorted lookup — never a Python dict), and a
   per-bucket ``map_groups`` does the within-bucket cumsum
   vectorized. Groups are ~``bucket_size`` docs each, so the group
   exchange is coarse (no millions-of-tiny-groups regime).

Token definition matches the ``token_count`` query / DuckDB oracle:
``count_substring(text, ' ') + 1`` == ``len(string_split(text, ' '))``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..state.broadcast import get_broadcast


def pack_token_stream(
    ds,
    budget: int = 2048,
    id_col: str = "doc_id",
    col: str = "text",
    bucket_size: int = 4096,
):
    """-> Dataset(doc_id, n_tokens, start_offset, seq_id, pos_in_seq).

    ``start_offset`` is the exclusive prefix sum of ``n_tokens`` in
    ``id_col`` order; ``seq_id = start_offset // budget`` is the
    training sequence the document STARTS in, ``pos_in_seq`` its
    offset there. Deterministic under any partitioning."""

    def counts(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tok = pc.cast(
            pc.add(pc.count_substring(b[col], " "), 1), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(tok, pa.int64()),
                "bucket": pa.array(ids // bucket_size, pa.int64()),
            }
        )

    toks = ds.map_batches(counts, batch_format="pyarrow").materialize()

    # --- phase 2: bucket totals -> driver exclusive scan (tiny:
    # one (bucket, sum) row per bucket per block, folded streaming)
    def partial(b: pa.Table) -> pa.Table:
        bk = b["bucket"].to_numpy(zero_copy_only=False)
        tk = b["n_tokens"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(bk, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(u, pa.int64()),
                "total": pa.array(
                    np.bincount(inv, weights=tk).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    bks: list[np.ndarray] = []
    tots: list[np.ndarray] = []
    for b in toks.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        bks.append(b["bucket"].to_numpy(zero_copy_only=False))
        tots.append(b["total"].to_numpy(zero_copy_only=False))
    if not bks:  # empty input: fall through with a dummy base table
        bks, tots = [np.array([0], np.int64)], [np.array([0], np.int64)]
    df = (
        pd.DataFrame(
            {"bucket": np.concatenate(bks), "t": np.concatenate(tots)}
        )
        .groupby("bucket", as_index=False, sort=True)
        .sum()
    )
    buckets = df["bucket"].to_numpy()
    base = np.r_[0, np.cumsum(df["t"].to_numpy())[:-1]]  # exclusive
    base_ref = ray.put((buckets, base))

    # --- phase 3: within-bucket ordered cumsum + broadcast base
    def finish(g: pd.DataFrame) -> pd.DataFrame:
        bkts, bases = get_broadcast(base_ref)
        g = g.sort_values("doc_id", kind="mergesort")
        tok = g["n_tokens"].to_numpy()
        b0 = bases[np.searchsorted(bkts, g["bucket"].iloc[0])]
        start = b0 + np.r_[0, np.cumsum(tok)[:-1]]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": tok,
                "start_offset": start,
                "seq_id": start // budget,
                "pos_in_seq": start % budget,
            }
        )

    return toks.groupby("bucket").map_groups(finish, batch_format="pandas")
