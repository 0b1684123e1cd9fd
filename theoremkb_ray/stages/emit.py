"""Fused triple emission: result rows -> ALL triples in one pass.

Combines what stitch.triples_from_results + mentions.MentionExtractor
+ link.CitationResolver produce, in a single stateless map stage:
(doc, states, entity), (thm, proved_by, proof), intra-document cites,
and cross-document cites resolved against the broadcast links dict.

Why fused: the flagship pipeline's triple branches all consume the
same (already materialized) results table; three separate Dataset
executions cost three rounds of scheduler/actor startup that dominate
wall time at moderate scale. The unfused stages remain available as
standalone operators (mentions.py / link.py) — this stage reuses their
logic via a per-process cached extractor, so semantics are identical
(asserted by tests/test_pipeline.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schema import PRED_CITES, PRED_PROVED_BY, PRED_STATES, entity_id
from ..state.broadcast import get_broadcast
from .mentions import MentionExtractor

_EXTRACTOR: MentionExtractor | None = None


def _extractor() -> MentionExtractor:
    global _EXTRACTOR
    if _EXTRACTOR is None:
        _EXTRACTOR = MentionExtractor()  # compiled once per process
    return _EXTRACTOR


def emit_triples_batch(
    batch: pa.Table, links_ref=None
) -> pa.Table:
    """results batch -> triples batch (states, proved_by, cites)."""
    links: dict = get_broadcast(links_ref) if links_ref is not None else {}

    kind = batch["kind"].to_numpy(zero_copy_only=False)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    eid = batch["entity_id"].to_numpy(zero_copy_only=False)
    target = batch["proof_target_name"].to_numpy(zero_copy_only=False)

    subs: list[str] = []
    preds: list[str] = []
    objs: list[str] = []
    provs: list[str] = []

    is_proof = kind == "proof"
    for d, e in zip(doc[~is_proof], eid[~is_proof]):
        subs.append(d)
        preds.append(PRED_STATES)
        objs.append(e)
        provs.append("stitch")
    has_t = is_proof & (target != "")
    for d, e, t in zip(doc[has_t], eid[has_t], target[has_t]):
        subs.append(entity_id(d, t))
        preds.append(PRED_PROVED_BY)
        objs.append(e)
        provs.append("stitch")

    # mentions (intra + extra) via the shared extractor
    m = _extractor()(batch)
    m_doc = m["doc_id"].to_numpy(zero_copy_only=False)
    m_src = m["src_entity"].to_numpy(zero_copy_only=False)
    m_kind = m["kind"].to_numpy(zero_copy_only=False)
    m_num = m["num"].to_numpy(zero_copy_only=False)
    m_tag = m["cite_tag"].to_numpy(zero_copy_only=False)
    for i in range(len(m_doc)):
        if m_tag[i] == "":
            subs.append(m_src[i])
            preds.append(PRED_CITES)
            objs.append(entity_id(m_doc[i], f"{m_kind[i]} {m_num[i]}"))
            provs.append("mention.intra")
        else:
            to = links.get((m_doc[i], m_tag[i]))
            if to is None:
                continue  # unresolvable citation tag -> dropped
            subs.append(m_src[i])
            preds.append(PRED_CITES)
            objs.append(entity_id(to, f"{m_kind[i]} {m_num[i]}"))
            provs.append("mention.extra")

    n = len(subs)
    return pa.table(
        {
            "subject": pa.array(subs, pa.string()),
            "predicate": pa.array(preds, pa.string()),
            "object": pa.array(objs, pa.string()),
            "confidence": pa.array(np.ones(n), pa.float64()),
            "provenance": pa.array(provs, pa.string()),
        }
    )


def emit_triples(results_ds, links_tbl: pa.Table | None = None, batch_size: int = 2048):
    import ray

    links_ref = None
    if links_tbl is not None and links_tbl.num_rows > 0:
        d = {
            (f, t): to
            for f, t, to in zip(
                links_tbl["doc_from"].to_pylist(),
                links_tbl["tag"].to_pylist(),
                links_tbl["doc_to"].to_pylist(),
            )
        }
        links_ref = ray.put(d)
    return results_ds.map_batches(
        lambda b: emit_triples_batch(b, links_ref),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
