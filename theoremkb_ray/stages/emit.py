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

from ..schema import PRED_CITES, PRED_PROVED_BY, PRED_STATES
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

    Fully vectorized: states/proved_by are numpy string concatenation,
    mention emission is masked numpy, and the citation lookup is a
    ``searchsorted`` probe into the broadcast (sorted uint64 key hash,
    doc_to Arrow array) pair — see :func:`emit_triples` for why the
    broadcast is NOT a Python dict. Only the mention regex sweep
    (regex-bound by nature) touches Python objects. Cites provenance
    carries ``|n=<nres_in>`` and ``|tag=<cite_tag>`` so the graph-CSV
    export can reproduce the reference's edge-table columns
    (extract_graph.py:274-307)."""
    link_keys, link_to = (
        get_broadcast(links_ref)
        if links_ref is not None
        else (np.empty(0, np.uint64), None)
    )

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

    # mentions (intra + extra) via the shared extractor (regex-bound)
    m = _extractor()(batch)
    m_src = m["src_entity"].to_numpy(zero_copy_only=False)
    m_tag = m["cite_tag"].to_numpy(zero_copy_only=False).astype(str)
    m_doc_s = m["doc_id"].to_numpy(zero_copy_only=False).astype(str)
    m_grp_s = m["src_group"].to_numpy(zero_copy_only=False).astype(str)
    # "kind num" — the entity name both intra and extra objects use
    name = np.char.add(
        np.char.add(
            m["kind"].to_numpy(zero_copy_only=False).astype(str), " "
        ),
        m["num"].to_numpy(zero_copy_only=False).astype(str),
    )

    intra = m_tag == ""
    i_subs = m_src[intra]
    # entity_id(doc, name) = "{doc}#{name}" (schema.py:135), vectorized
    i_objs = np.char.add(np.char.add(m_doc_s[intra], "#"), name[intra])
    i_provs = np.char.add("mention.intra|n=", m_grp_s[intra])
    t_intra = family(i_subs, PRED_CITES, i_objs, i_provs)

    ext = np.flatnonzero(~intra)
    if len(ext) and len(link_keys):
        qk = _link_key_hashes(m_doc_s[ext], m_tag[ext])
        idx = np.searchsorted(link_keys, qk)
        idx[idx >= len(link_keys)] = max(len(link_keys) - 1, 0)
        found = link_keys[idx] == qk  # unresolvable tags -> dropped
        ext = ext[found]
        to = (
            link_to.take(pa.array(idx[found], pa.int64()))
            .to_numpy(zero_copy_only=False)
            .astype(str)
        )
        e_objs = np.char.add(np.char.add(to, "#"), name[ext])
        e_provs = np.char.add(
            np.char.add(
                np.char.add("mention.extra|n=", m_grp_s[ext]), "|tag="
            ),
            m_tag[ext],
        )
        t_extra = family(m_src[ext], PRED_CITES, e_objs, e_provs)
    else:
        t_extra = family([], PRED_CITES, [], [])

    return pa.concat_tables([t_states, t_proved, t_intra, t_extra])


def _link_key_hashes(doc_from, tag) -> np.ndarray:
    """uint64 key hash of (doc_from, tag): each column siphashed
    separately (one C pass each), tag salted, mixed with splitmix64.
    The former NUL-join + hash spent ~10s of DRIVER time per flagship
    run materializing 2.3M wide-unicode concatenations (np.char.add);
    per-column hashing is ~50x faster and the salt keeps (a,b)/(b,a)
    from colliding. 64-bit collision odds across ~10M keys stay
    ~1e-5. Used by BOTH the broadcast build and the per-batch probe,
    so the scheme only has to agree with itself."""
    from ..functions.hashing import hash_strings, splitmix64

    hd = hash_strings(doc_from)
    ht = hash_strings(tag, seed=0x9E3779B97F4A7C15)
    return splitmix64(hd ^ ht)


def build_links_ref(links_tbl: pa.Table | None):
    """Driver-side build of the broadcast citation side: (sorted
    uint64 key-hash numpy array, doc_to Arrow StringArray) in plasma.
    ~4s of pure driver CPU at 4.5M links (two siphash passes + one
    argsort), so the flagship starts it on a BACKGROUND thread while
    phase 1 (read/segment/stitch) runs — it depends only on the side
    table, never on results (pipelines/kg.py:start_links_builder)."""
    import pyarrow.compute as pc
    import ray

    if links_tbl is None or links_tbl.num_rows == 0:
        return None
    keys = _link_key_hashes(
        links_tbl["doc_from"].to_numpy(zero_copy_only=False),
        links_tbl["tag"].to_numpy(zero_copy_only=False),
    )
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    # last-wins on duplicate keys: keep the final element of each
    # equal-key run
    last = np.r_[keys[1:] != keys[:-1], True]
    to_sorted = pc.take(
        pc.cast(links_tbl["doc_to"], pa.string()),
        pa.array(order[last], pa.int64()),
    ).combine_chunks()
    return ray.put((keys[last], to_sorted))


def emit_triples(
    results_ds,
    links_tbl: pa.Table | None = None,
    batch_size: int = 2048,
    links_ref=None,
):
    """Fused results -> triples pass.

    The links side table is broadcast as a (sorted uint64 key-hash
    numpy array, doc_to Arrow StringArray) PAIR, not a Python dict:
    a dict of millions of (doc, tag) tuples must be re-pickled into
    every worker process (O(|links|) CPU + heap PER WORKER — measured
    as the whole flagship's scale cliff at 2.3M links: the emit stage
    went 10s -> 130s because each worker spent its first batch
    deserializing a ~500MB dict). The numpy half is a zero-copy plasma
    read and the Arrow half ships as out-of-band buffers; the per-batch
    probe is one searchsorted. Duplicate (doc_from, tag) rows keep the
    LAST occurrence (dict-insertion semantics, bit-compatible with the
    old implementation). ``links_ref``: pass a pre-built
    :func:`build_links_ref` result (e.g. from the overlapped builder
    thread) to skip the driver-side build here."""
    if links_ref is None:
        links_ref = build_links_ref(links_tbl)
    return results_ds.map_batches(
        lambda b: emit_triples_batch(b, links_ref),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
