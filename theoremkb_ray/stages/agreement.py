"""Inter-extractor agreement + segmentation evaluation.

Re-expresses:
- the reference's agreement diff of two annotation layers (reference:
  Styling/src/lib/extractors/misc/aggreement.py:25-45) as a
  per-document span-set comparison of two segmenters — zero shuffle
  (both segmenters run over the same document row);
- the reference's ``cli.py test`` token-level classification report
  (reference: Styling/src/cli.py:148-198) as a distributed
  per-label confusion aggregation -> P/R/F1 table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


from .crf import CRFSegmenter
from .segment import NaiveSegmenter
from .tokenize import explode_lines


def spans_to_line_labels(
    spans_col: pa.Array | pa.ChunkedArray,
    offsets: np.ndarray,
    fill: str = "O",
) -> np.ndarray:
    """Project a list<SPAN_STRUCT> column onto the flat line array:
    one label per line, ``fill`` outside any span. Fully vectorized —
    spans flatten to (doc_idx, label, start, end) arrays and the fill
    is a single scatter (np.repeat + grouped arange), no per-doc loop.
    Later spans win on overlap (BIO coalescing emits disjoint spans, so
    this only matters for adversarial input)."""
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    n_total = int(offsets[-1])
    out = np.full(n_total, fill, dtype=object)
    list_off = spans_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = spans_col.values
    if list_off[0] != 0:
        vals = vals.slice(list_off[0], list_off[-1] - list_off[0])
        list_off = list_off - list_off[0]
    n_spans = len(vals)
    if n_spans == 0:
        return out
    span_doc = np.repeat(
        np.arange(len(list_off) - 1, dtype=np.int64), np.diff(list_off)
    )
    labels = vals.field("label").to_numpy(zero_copy_only=False)
    s0 = vals.field("start_line").to_numpy(zero_copy_only=False)
    s1 = vals.field("end_line").to_numpy(zero_copy_only=False)
    starts = offsets[span_doc] + s0
    lens = (s1 - s0 + 1).astype(np.int64)
    base = np.repeat(starts, lens)
    grouped_arange = np.arange(lens.sum()) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    out[base + grouped_arange] = np.repeat(labels, lens)
    return out


def _span_keys(
    spans_col: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a span list column to (doc_idx, uint64 span-key) where
    the key hashes (label, start, end) — set ops become np.intersect1d."""
    from ..functions.hashing import hash_strings, splitmix64

    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    list_off = spans_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = spans_col.values
    if list_off[0] != 0:
        vals = vals.slice(list_off[0], list_off[-1] - list_off[0])
        list_off = list_off - list_off[0]
    span_doc = np.repeat(
        np.arange(len(list_off) - 1, dtype=np.int64), np.diff(list_off)
    )
    if len(vals) == 0:
        return span_doc, np.zeros(0, dtype=np.uint64)
    lab = hash_strings(vals.field("label").to_numpy(zero_copy_only=False))
    s0 = vals.field("start_line").to_numpy(zero_copy_only=False).astype(np.uint64)
    s1 = vals.field("end_line").to_numpy(zero_copy_only=False).astype(np.uint64)
    key = splitmix64(
        lab ^ splitmix64(s0 ^ splitmix64(s1 ^ span_doc.astype(np.uint64)))
    )
    return span_doc, key


class AgreementDiff:
    """map_batches callable over tokenized docs: run BOTH segmenters,
    emit one row per doc with span counts + agreement stats. Zero
    shuffle (both segmenters see the same document row); span-set
    intersection via hashed keys + np.intersect1d, no per-doc Python."""

    def __init__(self) -> None:
        self.a = NaiveSegmenter()
        self.b = CRFSegmenter()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a = self.a(batch)["spans"]
        out_b = self.b(batch)["spans"]
        n_docs = batch.num_rows
        import pyarrow.compute as pc

        n_a = pc.list_value_length(out_a).to_numpy(zero_copy_only=False)
        n_b = pc.list_value_length(out_b).to_numpy(zero_copy_only=False)
        doc_a, keys_a = _span_keys(out_a)
        doc_b, keys_b = _span_keys(out_b)
        common_keys = np.intersect1d(keys_a, keys_b)  # doc idx is in key
        in_common = np.isin(keys_a, common_keys)
        n_common = np.bincount(
            doc_a[in_common], minlength=n_docs
        ).astype(np.int64)
        equal = (n_a == n_b) & (n_common == n_a)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_naive": pa.array(n_a.astype(np.int64)),
                "n_crf": pa.array(n_b.astype(np.int64)),
                "n_common": pa.array(n_common),
                "equal": pa.array(equal),
            }
        )


def agreement(ds, batch_size: int = 256, concurrency=(1, 4)):
    return ds.map_batches(
        AgreementDiff,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AgreementSpans:
    """Per-DISAGREEMENT rows — the reference's granularity: its
    AgreementExtractor emits one labelled box per token where two
    layers disagree, labelled "lbl1 - lbl2" (reference:
    Styling/src/lib/extractors/misc/aggreement.py:25-45). Here: one
    row per line where the two segmenters assign different labels,
    carrying both labels plus the combined reference-style tag.
    Vectorized: both span lists project onto the flat line array
    (single scatter each) and one numpy comparison finds the rows."""

    def __init__(self) -> None:
        self.a = NaiveSegmenter()
        self.b = CRFSegmenter()

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_a = self.a(batch)["spans"]
        spans_b = self.b(batch)["spans"]
        flat, offsets = explode_lines(batch["lines"])
        lab_a = spans_to_line_labels(spans_a, offsets)
        lab_b = spans_to_line_labels(spans_b, offsets)
        diff = lab_a != lab_b
        lengths = np.diff(offsets)
        doc_idx = np.repeat(np.arange(batch.num_rows), lengths)[diff]
        line_idx = (np.arange(int(offsets[-1])) - np.repeat(offsets[:-1], lengths))[diff]
        docs = batch["doc_id"].to_numpy(zero_copy_only=False)[doc_idx]
        la = lab_a[diff].astype(str)
        lb = lab_b[diff].astype(str)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.string()),
                "line": pa.array(line_idx, pa.int64()),
                "label_naive": pa.array(la, pa.string()),
                "label_crf": pa.array(lb, pa.string()),
                "label": pa.array(
                    np.char.add(np.char.add(la, " - "), lb), pa.string()
                ),
            }
        )


def agreement_spans(ds, batch_size: int = 256, concurrency=(1, 4)):
    """Disagreement rows between the naive and CRF segmenters."""
    return ds.map_batches(
        AgreementSpans,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ------------------------------------------------ classification report


def line_confusion_batch(
    batch: pa.Table, gold_ref
) -> pa.Table:
    """Per-batch partial confusion counts (pred_label, gold_label, n)
    at LINE level; gold spans broadcast. Merged by a tiny groupby —
    the partial+final pattern.

    The gold side arrives as SORTED NUMPY ARRAYS (doc-hash keys +
    group offsets + parallel label/start/end columns), not a Python
    dict-of-lists: a dict is re-pickled into every worker process
    (the links-dict scale cliff fixed in `emit.py:emit_triples`),
    while numpy broadcast halves are zero-copy plasma reads and the
    per-batch probe is one searchsorted."""
    from ..functions.hashing import hash_strings
    from ..state.broadcast import get_broadcast

    doc_keys, starts, ends, g_labels, g_s0, g_s1 = get_broadcast(gold_ref)
    flat, offsets = explode_lines(batch["lines"])
    n_total = int(offsets[-1])
    pred = spans_to_line_labels(batch["spans"], offsets)
    gold = np.full(n_total, "O", dtype=object)
    if len(doc_keys):
        h = hash_strings(batch["doc_id"].to_numpy(zero_copy_only=False))
        pos = np.searchsorted(doc_keys, h)
        pos[pos >= len(doc_keys)] = len(doc_keys) - 1
        matched = np.flatnonzero(doc_keys[pos] == h)
        for i in matched:
            base = offsets[i]
            for j in range(starts[pos[i]], ends[pos[i]]):
                gold[base + g_s0[j] : base + g_s1[j] + 1] = g_labels[j]
    counts = (
        pd.DataFrame({"pred": pred, "gold": gold})
        .groupby(["pred", "gold"], sort=False)
        .size()
        .reset_index(name="n")
    )
    return pa.table(
        {
            "pred": pa.array(counts["pred"], pa.string()),
            "gold": pa.array(counts["gold"], pa.string()),
            "n": pa.array(counts["n"].to_numpy(), pa.int64()),
        }
    )


def classification_report(
    segmented_ds, gold_spans: pa.Table
) -> pd.DataFrame:
    """Line-level P/R/F1 per label vs gold spans (the reference's
    sklearn classification_report analog, distributed)."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash_strings

    # gold broadcast = sorted doc-hash keys + group offsets + parallel
    # span columns (all numpy — no per-worker dict re-pickling; 64-bit
    # doc-hash collisions are ~1e-5 at 10M docs, same budget as the
    # emit.py links probe)
    h = hash_strings(gold_spans["doc_id"].to_numpy(zero_copy_only=False))
    order = np.argsort(h, kind="stable")
    h = h[order]
    g_labels = np.asarray(gold_spans["label"].to_pylist(), dtype=object)[order]
    g_s0 = gold_spans["start_line"].to_numpy(zero_copy_only=False)[order]
    g_s1 = gold_spans["end_line"].to_numpy(zero_copy_only=False)[order]
    doc_keys = np.unique(h)
    starts = np.searchsorted(h, doc_keys, side="left")
    ends = np.searchsorted(h, doc_keys, side="right")
    ref = ray.put((doc_keys, starts, ends, g_labels, g_s0, g_s1))
    conf = (
        segmented_ds.map_batches(
            lambda b: line_confusion_batch(b, ref),
            batch_format="pyarrow",
        )
        .groupby(["pred", "gold"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    labels = sorted(set(conf["pred"]) | set(conf["gold"]))
    rows = []
    for lab in labels:
        tp = conf[(conf["pred"] == lab) & (conf["gold"] == lab)]["n"].sum()
        fp = conf[(conf["pred"] == lab) & (conf["gold"] != lab)]["n"].sum()
        fn = conf[(conf["pred"] != lab) & (conf["gold"] == lab)]["n"].sum()
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        rows.append(
            {
                "label": lab,
                "precision": round(p, 4),
                "recall": round(r, 4),
                "f1": round(f1, 4),
                "support": int(tp + fn),
            }
        )
    return pd.DataFrame(rows)
