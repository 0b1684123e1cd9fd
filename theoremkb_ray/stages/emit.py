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
    """results batch -> triples batch (states, proved_by, cites).

    states/proved_by emission is pure numpy string concatenation; only
    the mention sweep (regex-bound by nature) and the per-mention link
    lookup touch Python objects. Cites provenance carries
    ``|n=<nres_in>`` and ``|tag=<cite_tag>`` so the graph-CSV export
    can reproduce the reference's edge-table columns
    (extract_graph.py:274-307)."""
    links: dict = get_broadcast(links_ref) if links_ref is not None else {}

    kind = batch["kind"].to_numpy(zero_copy_only=False)
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    eid = batch["entity_id"].to_numpy(zero_copy_only=False)
    target = batch["proof_target_name"].to_numpy(zero_copy_only=False)

    def family(subs, pred: str, objs, provs) -> pa.Table:
        n = len(subs)
        prov_arr = (
            pa.array([provs] * n, pa.string())
            if isinstance(provs, str)
            else pa.array(provs, pa.string())
        )
        return pa.table(
            {
                "subject": pa.array(subs, pa.string()),
                "predicate": pa.array([pred] * n, pa.string()),
                "object": pa.array(objs, pa.string()),
                "confidence": pa.array(np.ones(n), pa.float64()),
                "provenance": prov_arr,
            }
        )

    is_proof = kind == "proof"
    # (doc, states, entity) — zero-loop column reuse
    t_states = family(doc[~is_proof], PRED_STATES, eid[~is_proof], "stitch")
    # (theorem, proved_by, proof) — vectorized entity-id concat
    has_t = is_proof & (target != "")
    p_subs = np.char.add(
        np.char.add(doc[has_t].astype(str), "#"), target[has_t].astype(str)
    )
    t_proved = family(p_subs, PRED_PROVED_BY, eid[has_t], "stitch")

    # mentions (intra + extra) via the shared extractor (regex-bound);
    # the per-mention link lookup stays a dict probe — mentions are
    # ~100x fewer than lines, and the dict is broadcast once per worker
    m = _extractor()(batch)
    m_doc = m["doc_id"].to_numpy(zero_copy_only=False)
    m_src = m["src_entity"].to_numpy(zero_copy_only=False)
    m_grp = m["src_group"].to_numpy(zero_copy_only=False)
    m_kind = m["kind"].to_numpy(zero_copy_only=False)
    m_num = m["num"].to_numpy(zero_copy_only=False)
    m_tag = m["cite_tag"].to_numpy(zero_copy_only=False)
    c_subs: list[str] = []
    c_objs: list[str] = []
    c_provs: list[str] = []
    for i in range(len(m_doc)):
        if m_tag[i] == "":
            c_subs.append(m_src[i])
            c_objs.append(entity_id(m_doc[i], f"{m_kind[i]} {m_num[i]}"))
            c_provs.append(f"mention.intra|n={m_grp[i]}")
        else:
            to = links.get((m_doc[i], m_tag[i]))
            if to is None:
                continue  # unresolvable citation tag -> dropped
            c_subs.append(m_src[i])
            c_objs.append(entity_id(to, f"{m_kind[i]} {m_num[i]}"))
            c_provs.append(f"mention.extra|n={m_grp[i]}|tag={m_tag[i]}")
    t_cites = family(c_subs, PRED_CITES, c_objs, c_provs)

    return pa.concat_tables([t_states, t_proved, t_cites])


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
