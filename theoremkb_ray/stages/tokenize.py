"""Tokenize stage: ``content`` -> per-document line-list column.

The reference converts PDFs to an ALTO Page>TextBlock>TextLine>String
hierarchy via a pdfalto subprocess (reference:
Styling/src/lib/paper/__init__.py:230-253); for a text corpus the
hierarchy collapses to document > line > word. We keep ONE ROW PER
DOCUMENT with a ``lines: list<string>`` column so intra-document order
is preserved without any global sort (SURVEY.md §2.9) — sequences are
never exploded to rows before sequence-model scoring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tokenize_batch(batch: pa.Table) -> pa.Table:
    """Split ``content`` into a ``lines`` list column (zero-copy split)."""
    lines = pc.split_pattern(batch["content"], "\n")
    return batch.append_column("lines", lines)


def explode_lines(
    lines_col: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, np.ndarray]:
    """Flatten a list<string> column -> (flat values, int64 offsets).

    offsets has len(docs)+1 entries; doc i owns flat[offsets[i]:offsets[i+1]].
    Zero-copy on the Arrow side.
    """
    if isinstance(lines_col, pa.ChunkedArray):
        lines_col = lines_col.combine_chunks()
    offsets = lines_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # normalize offsets to start at 0 (sliced arrays carry a base offset)
    values = lines_col.values
    if offsets[0] != 0:
        values = values.slice(offsets[0])
        offsets = offsets - offsets[0]
    return values, offsets


def tokenize(ds, batch_size: int = 512):
    return ds.map_batches(
        tokenize_batch, batch_format="pyarrow", batch_size=batch_size
    )
