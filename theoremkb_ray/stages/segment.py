"""Segmentation: label line spans as theorem/proof/definition/... results.

Two interchangeable segmenters over the tokenized corpus:

- :class:`NaiveSegmenter` — vectorized re-expression of the reference's
  naive extractor (reference:
  Styling/src/lib/extractors/results/naive_extractor.py:20-55): a
  result starts on a styled (bold/italic) line whose first word pattern
  is a result label; it runs until the next blank line or next start.
  The whole state machine is numpy cumulative-max algebra over the
  flattened line array — no Python loop over lines or documents.

- :class:`CRFSegmenter` (stages/crf.py) — the flagship learned
  linear-chain tagger actor pool (reference flagship:
  Styling/src/lib/extractors/crf.py:43-132), producing the same span
  column via Viterbi decoding + BIO stitching.

Both attach a ``spans: list<struct<label,group,start_line,end_line>>``
column (offset-interval analog of the reference's LabelledBBX layer;
reference: Styling/src/lib/annotations.py:29-80) and keep one row per
document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import RESULT_KINDS, SPAN_STRUCT
from .features import line_features
from .tokenize import explode_lines


def _segmented_last_index(
    marker: np.ndarray, doc_start: np.ndarray, fill: np.ndarray | int
) -> np.ndarray:
    """For each global line i: the largest marked index <= i within the
    same document, else ``fill`` (broadcast). Pure numpy accumulate."""
    gidx = np.arange(len(marker), dtype=np.int64)
    cand = np.where(marker, gidx, -1)
    last = np.maximum.accumulate(cand)
    return np.where(last >= doc_start, last, fill)


def naive_spans_flat(
    flat_lines: pa.Array, offsets: np.ndarray
) -> dict[str, np.ndarray]:
    """Compute result spans over a flattened batch of documents.

    Returns flat span arrays plus ``doc_idx`` mapping each span to its
    document: {doc_idx, label_id, group, start_line, end_line} with
    line numbers local to the document.
    """
    f = line_features(flat_lines)
    n = len(f["bold"])
    if n == 0:
        return {
            k: np.empty(0, dtype=np.int64)
            for k in ("doc_idx", "label_id", "group", "start_line", "end_line")
        }
    lengths = np.diff(offsets)
    doc_idx_per_line = np.repeat(
        np.arange(len(lengths), dtype=np.int64), lengths
    )
    doc_start = offsets[:-1][doc_idx_per_line]
    doc_end = offsets[1:][doc_idx_per_line] - 1

    # repetitive page furniture (same digit-masked pattern >= 2x in the
    # doc, reference TextLine.py:86-99) never STARTS a result. Numbered
    # heads ("Theorem 2.1.") and proof heads ("Proof." / "Proof of
    # Theorem N.") legitimately share patterns within a doc, so only
    # UNNUMBERED non-proof repeats are suppressed — a styled running
    # footer, not a result environment.
    from ..schema import RESULT_KINDS as _RK
    from .features import repetitive_flags

    rep = repetitive_flags(flat_lines, offsets)
    furniture = rep & ~f["has_head_num"] & (f["kind_id"] != _RK.index("proof"))
    is_start = (f["bold"] | f["italic"]) & (f["kind_id"] >= 0) & ~furniture
    blank = f["blank"]

    # span start lines (global indices)
    starts = np.flatnonzero(is_start)
    if len(starts) == 0:
        return {
            k: np.empty(0, dtype=np.int64)
            for k in ("doc_idx", "label_id", "group", "start_line", "end_line")
        }
    # end of each span: line before the next blank-or-start event,
    # clamped to the document's last line
    events = np.flatnonzero(is_start | blank)
    pos = np.searchsorted(events, starts, side="right")
    next_event = np.where(
        pos < len(events), events[np.minimum(pos, len(events) - 1)], n
    )
    end = np.minimum(next_event - 1, doc_end[starts])

    # per-document group numbering: cumulative start count minus the
    # count before the document began
    cs = np.cumsum(is_start)
    span_doc = doc_idx_per_line[starts]
    base = cs[offsets[:-1][span_doc]] - is_start[offsets[:-1][span_doc]]
    group = cs[starts] - base

    return {
        "doc_idx": span_doc,
        "label_id": f["kind_id"][starts].astype(np.int64),
        "group": group.astype(np.int64),
        "start_line": starts - doc_start[starts],
        "end_line": end - doc_start[starts],
    }


def spans_to_list_column(
    spans: dict[str, np.ndarray], num_docs: int
) -> pa.ListArray:
    """Pack flat span rows into a per-document list<struct> column.

    Spans arrive ordered by (doc_idx, start_line) — guaranteed by the
    construction above (starts are scanned in global line order)."""
    counts = np.bincount(spans["doc_idx"], minlength=num_docs)
    offsets = np.zeros(num_docs + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    labels = pa.array(
        np.asarray(RESULT_KINDS, dtype=object)[spans["label_id"]]
        if len(spans["label_id"])
        else [],
        pa.string(),
    )
    struct = pa.StructArray.from_arrays(
        [
            labels,
            pa.array(spans["group"], pa.int64()),
            pa.array(spans["start_line"], pa.int64()),
            pa.array(spans["end_line"], pa.int64()),
        ],
        fields=list(SPAN_STRUCT),
    )
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)


class NaiveSegmenter:
    """map_batches callable: tokenized batch -> batch + ``spans`` column."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = explode_lines(batch["lines"])
        spans = naive_spans_flat(flat, offsets)
        col = spans_to_list_column(spans, batch.num_rows)
        return batch.append_column("spans", col)


def segment_naive(ds, batch_size: int = 256):
    return ds.map_batches(
        NaiveSegmenter(), batch_format="pyarrow", batch_size=batch_size
    )
