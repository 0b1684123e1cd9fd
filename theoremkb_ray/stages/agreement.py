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


def _span_set(spans_cell) -> set[tuple]:
    return {
        (s["label"], s["start_line"], s["end_line"]) for s in spans_cell
    }


class AgreementDiff:
    """map_batches callable over tokenized docs: run BOTH segmenters,
    emit one row per doc with span counts + agreement stats."""

    def __init__(self) -> None:
        self.a = NaiveSegmenter()
        self.b = CRFSegmenter()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a = self.a(batch)["spans"].combine_chunks()
        out_b = self.b(batch)["spans"].combine_chunks()
        docs = batch["doc_id"].to_pylist()
        n_a, n_b, n_common, equal = [], [], [], []
        for i in range(batch.num_rows):
            sa = _span_set(out_a[i].as_py())
            sb = _span_set(out_b[i].as_py())
            n_a.append(len(sa))
            n_b.append(len(sb))
            n_common.append(len(sa & sb))
            equal.append(sa == sb)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.string()),
                "n_naive": pa.array(n_a, pa.int64()),
                "n_crf": pa.array(n_b, pa.int64()),
                "n_common": pa.array(n_common, pa.int64()),
                "equal": pa.array(equal, pa.bool_()),
            }
        )


def agreement(ds, batch_size: int = 256, concurrency=(1, 4)):
    return ds.map_batches(
        AgreementDiff,
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
    the partial+final pattern."""
    from ..state.broadcast import get_broadcast

    gold_by_doc: dict[str, list] = get_broadcast(gold_ref)
    spans_col = batch["spans"].combine_chunks()
    docs = batch["doc_id"].to_pylist()
    flat, offsets = explode_lines(batch["lines"])
    n_total = int(offsets[-1])
    pred = np.full(n_total, "O", dtype=object)
    gold = np.full(n_total, "O", dtype=object)
    for i in range(batch.num_rows):
        base = offsets[i]
        for s in spans_col[i].as_py():  # few spans per doc
            pred[base + s["start_line"] : base + s["end_line"] + 1] = s["label"]
        for label, s0, s1 in gold_by_doc.get(docs[i], []):
            gold[base + s0 : base + s1 + 1] = label
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

    gold_by_doc: dict[str, list] = {}
    for d, l, s0, s1 in zip(
        gold_spans["doc_id"].to_pylist(),
        gold_spans["label"].to_pylist(),
        gold_spans["start_line"].to_pylist(),
        gold_spans["end_line"].to_pylist(),
    ):
        gold_by_doc.setdefault(d, []).append((l, s0, s1))
    ref = ray.put(gold_by_doc)
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
