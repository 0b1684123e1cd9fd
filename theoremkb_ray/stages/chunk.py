"""Document chunking — fixed-size overlapping token windows, the step
that turns cleaned documents into LM training examples (the
counterpart of `stages/pack.py`, which packs whole docs into
fixed-token sequences; chunking SPLITS long docs instead).

Fully vectorized and shuffle-free: chunk boundaries are a pure
function of each row, so the operator is one ``map_batches`` pass —
token lists come from one Arrow ``split_pattern``, every chunk's
token indices are built with two ``np.repeat``/``cumsum`` sweeps into
a single ``take`` + ``binary_join``, and no Python loop touches a
document. Overlap duplicates at most ``window/stride`` of the bytes
(1.33x at the 64/48 default) inside the output blocks only.

The `chunk_docs` query is value-hash-checked against DuckDB
``generate_series`` + list-slice + ``array_to_string`` — byte-exact
chunk text, both sides splitting on single spaces with no empty-token
filtering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(
    ds,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """-> Dataset(id, chunk_id, n_tokens, chunk): windows of ``window``
    whitespace tokens every ``stride`` tokens (the final window may be
    short; a doc always yields >= 1 chunk)."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def chunk(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ")
        toks = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        )
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.values
        ntok = np.diff(offs)
        n_chunks = (np.maximum(ntok, 1) - 1) // stride + 1
        doc_idx = np.repeat(np.arange(len(ntok), dtype=np.int64), n_chunks)
        # chunk ordinal within its doc -> start token
        cum = np.cumsum(np.r_[0, n_chunks[:-1]])
        ordinal = np.arange(len(doc_idx)) - np.repeat(cum, n_chunks)
        start = ordinal * stride
        length = np.minimum(window, ntok[doc_idx] - start)
        # flat token indices of every chunk, one take
        g_start = offs[doc_idx] + start
        total = int(length.sum())
        lcum = np.cumsum(np.r_[0, length[:-1]])
        idx = np.repeat(g_start, length) + (
            np.arange(total) - np.repeat(lcum, length)
        )
        taken = flat.take(pa.array(idx, pa.int64()))
        new_offs = np.r_[0, np.cumsum(length)].astype(np.int32)
        chunks = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), taken
        )
        return pa.table(
            {
                id_col: b[id_col].take(pa.array(doc_idx, pa.int64())),
                "chunk_id": pa.array(ordinal, pa.int64()),
                "n_tokens": pa.array(length, pa.int64()),
                "chunk": pc.binary_join(chunks, " "),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")
