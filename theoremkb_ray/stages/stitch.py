"""Stitch stage: spans -> result rows (KG node candidates) -> base triples.

Re-expresses the reference's per-paper ordered fold that accumulates
text per result id and names results (reference:
Styling/tools/theoremdb/extract_graph.py:133-229 ``extract_results``
and 232-288 ``extract_links`` naming) as a per-batch transform: the
document row already carries its ordered lines + spans, so stitching
needs NO shuffle — document == row (SURVEY.md §3.3 restatement).

Outputs one row per result (RESULT_SCHEMA + ``proof_target_name``),
from which ``triples_from_results`` derives the (doc, states, entity)
and (theorem, proved_by, proof) triples.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.text import normalize_text
from ..schema import (
    NUMBERED_KINDS,
    PRED_PROVED_BY,
    PRED_STATES,
    entity_id,
)
from .tokenize import explode_lines

_RE_PROOF_OF = re.compile(
    r"Proof of ([A-Za-z]+) (\d+(?:\.\d+)*)\.", re.IGNORECASE
)
_RE_HEAD_NUM = re.compile(r"^[A-Za-z]+ (\d+(?:\.\d+)*)\.")
_NUMBERED = set(NUMBERED_KINDS)


class StitchResults:
    """map_batches callable: doc rows (lines+spans) -> result rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, line_off = explode_lines(batch["lines"])
        flat_np = flat.to_numpy(zero_copy_only=False)

        spans_col = batch["spans"]
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        s_off = spans_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        sv = spans_col.values
        if s_off[0] != 0:
            sv = sv.slice(s_off[0], s_off[-1] - s_off[0])
            s_off = s_off - s_off[0]
        lab = sv.field("label").to_numpy(zero_copy_only=False)
        grp = sv.field("group").to_numpy(zero_copy_only=False)
        st = sv.field("start_line").to_numpy(zero_copy_only=False)
        en = sv.field("end_line").to_numpy(zero_copy_only=False)

        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        repos = batch["repo"].to_numpy(zero_copy_only=False)

        n_spans = len(lab)
        out = {
            "doc_id": np.empty(n_spans, dtype=object),
            "repo": np.empty(n_spans, dtype=object),
            "kind": lab,
            "group": grp.astype(np.int64),
            "name": np.empty(n_spans, dtype=object),
            "entity_id": np.empty(n_spans, dtype=object),
            "text": np.empty(n_spans, dtype=object),
            "start_line": st.astype(np.int64),
            "end_line": en.astype(np.int64),
            "proof_target_name": np.empty(n_spans, dtype=object),
        }

        for d in range(batch.num_rows):
            base = line_off[d]
            doc_id = doc_ids[d]
            repo = repos[d]
            last_numbered: str | None = None
            for s in range(s_off[d], s_off[d + 1]):
                head = flat_np[base + st[s]]
                kind = lab[s]
                target = ""
                if kind == "proof":
                    m = _RE_PROOF_OF.search(head)
                    if m:
                        target = f"{m.group(1).lower()} {m.group(2)}"
                    elif last_numbered is not None:
                        target = last_numbered
                    name = f"proof {grp[s]}"
                else:
                    # strip the style marker, then "Kind N.M."
                    stripped = head
                    if stripped.startswith("\\textbf{") or stripped.startswith(
                        "\\textit{"
                    ):
                        stripped = stripped[8:]
                    m = _RE_HEAD_NUM.match(stripped)
                    num = m.group(1) if m else str(grp[s])
                    name = f"{kind} {num}"
                    if kind in _NUMBERED:
                        last_numbered = name
                text = normalize_text(
                    "\n".join(flat_np[base + st[s] : base + en[s] + 1])
                )
                out["doc_id"][s] = doc_id
                out["repo"][s] = repo
                out["name"][s] = name
                out["entity_id"][s] = entity_id(doc_id, name)
                out["text"][s] = text
                out["proof_target_name"][s] = target
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "repo": pa.array(out["repo"], pa.string()),
                "kind": pa.array(out["kind"], pa.string()),
                "group": pa.array(out["group"], pa.int64()),
                "name": pa.array(out["name"], pa.string()),
                "entity_id": pa.array(out["entity_id"], pa.string()),
                "text": pa.array(out["text"], pa.string()),
                "start_line": pa.array(out["start_line"], pa.int64()),
                "end_line": pa.array(out["end_line"], pa.int64()),
                "proof_target_name": pa.array(
                    out["proof_target_name"], pa.string()
                ),
            }
        )


def stitch(ds, batch_size: int = 256):
    return ds.map_batches(
        StitchResults(), batch_format="pyarrow", batch_size=batch_size
    )


def triples_from_results_batch(batch: pa.Table) -> pa.Table:
    """Result rows -> (doc, states, entity) + (thm, proved_by, proof)."""
    kind = batch["kind"].to_numpy(zero_copy_only=False)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    eid = batch["entity_id"].to_numpy(zero_copy_only=False)
    target = batch["proof_target_name"].to_numpy(zero_copy_only=False)

    is_proof = kind == "proof"
    numbered = ~is_proof

    subs = list(doc[numbered])
    preds = [PRED_STATES] * int(numbered.sum())
    objs = list(eid[numbered])

    has_t = is_proof & (target != "")
    for d, e, t in zip(doc[has_t], eid[has_t], target[has_t]):
        subs.append(entity_id(d, t))
        preds.append(PRED_PROVED_BY)
        objs.append(e)
    n = len(subs)
    return pa.table(
        {
            "subject": pa.array(subs, pa.string()),
            "predicate": pa.array(preds, pa.string()),
            "object": pa.array(objs, pa.string()),
            "confidence": pa.array([1.0] * n, pa.float64()),
            "provenance": pa.array(["stitch"] * n, pa.string()),
        }
    )


def triples_from_results(results_ds, batch_size: int = 4096):
    return results_ds.map_batches(
        triples_from_results_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
    )
