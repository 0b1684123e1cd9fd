"""Citation resolution: cross-document mention rows -> cites triples.

Re-expresses the reference's citation-link table lookup
(reference: Styling/tools/theoremdb/db.py:13-26 ``loadLinks`` building
``(pdf_from -> tag -> pdf_to)`` and
Styling/tools/references/get_links.py:105-162 bibliography resolution)
as a **broadcast hash join**: the links side table is small relative to
the corpus (one row per distinct citation edge), so it is ``ray.put``
once and read by every map task — no shuffle. A partitioned hash-join
fallback (``resolve_citations_shuffle``) covers a links table too big
to broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..schema import PRED_CITES


def _links_index(links_tbl: pa.Table):
    """(sorted uint64 key-hash array, doc_to Arrow array) — the
    broadcastable form of the links table. A Python dict here is the
    scale cliff emit_triples documents (O(|links|) deserialization per
    worker); the numpy half is a zero-copy plasma read. Duplicate
    (doc_from, tag) keys keep MAX(doc_to) — a value-defined winner,
    so the broadcast and shuffle plans agree run-to-run regardless of
    input row or partition order (an index-defined 'last' would be
    nondeterministic on the shuffle side)."""
    import pyarrow.compute as pc

    from .emit import _link_key_hashes

    keys = _link_key_hashes(
        links_tbl["doc_from"].to_numpy(zero_copy_only=False),
        links_tbl["tag"].to_numpy(zero_copy_only=False),
    )
    doc_to = links_tbl["doc_to"].to_numpy(zero_copy_only=False).astype(str)
    order = np.lexsort((doc_to, keys))
    keys = keys[order]
    last = np.r_[keys[1:] != keys[:-1], True]
    to_sorted = pc.take(
        pc.cast(links_tbl["doc_to"], pa.string()),
        pa.array(order[last], pa.int64()),
    ).combine_chunks()
    return keys[last], to_sorted


class CitationResolver:
    """Actor-pool callable: extra-doc mention rows -> cites triples.

    The broadcast links index is fetched from the object store once
    per actor in ``__init__`` (NOT re-shipped per batch); the lookup
    is one searchsorted probe per batch."""

    def __init__(self, links_ref: "ray.ObjectRef") -> None:
        self.keys, self.to = ray.get(links_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .emit import _link_key_hashes

        doc = batch["doc_id"].to_numpy(zero_copy_only=False).astype(str)
        src = batch["src_entity"].to_numpy(zero_copy_only=False)
        tag = batch["cite_tag"].to_numpy(zero_copy_only=False).astype(str)
        grp = (
            batch["src_group"].to_numpy(zero_copy_only=False)
            if "src_group" in batch.column_names
            else np.zeros(batch.num_rows, dtype=np.int64)
        ).astype(str)
        name = np.char.add(
            np.char.add(
                batch["kind"].to_numpy(zero_copy_only=False).astype(str),
                " ",
            ),
            batch["num"].to_numpy(zero_copy_only=False).astype(str),
        )
        if len(doc) and len(self.keys):
            qk = _link_key_hashes(doc, tag)
            idx = np.searchsorted(self.keys, qk)
            idx[idx >= len(self.keys)] = max(len(self.keys) - 1, 0)
            found = self.keys[idx] == qk  # unresolvable tag -> dropped
        else:
            found = np.zeros(len(doc), dtype=bool)
        to = (
            self.to.take(pa.array(idx[found], pa.int64()))
            .to_numpy(zero_copy_only=False)
            .astype(str)
            if found.any()
            else np.empty(0, dtype="U1")
        )
        # entity_id(to, name) = "{to}#{name}" (schema.py:135)
        objs = np.char.add(np.char.add(to, "#"), name[found])
        provs = np.char.add(
            np.char.add(np.char.add("mention.extra|n=", grp[found]), "|tag="),
            tag[found],
        )
        n = int(found.sum())
        return pa.table(
            {
                "subject": pa.array(src[found], pa.string()),
                "predicate": pa.array([PRED_CITES] * n, pa.string()),
                "object": pa.array(objs, pa.string()),
                "confidence": pa.array([1.0] * n, pa.float64()),
                "provenance": pa.array(provs, pa.string()),
            }
        )


def resolve_citations(
    mentions_ds,
    links_tbl: pa.Table,
    batch_size: int = 4096,
    concurrency=(1, 4),
):
    """Broadcast-join path (default; links table fits in memory)."""
    extra = mentions_ds.map_batches(
        lambda b: b.filter(pa.compute.not_equal(b["cite_tag"], "")),
        batch_format="pyarrow",
    )
    links_ref = ray.put(_links_index(links_tbl))
    return extra.map_batches(
        CitationResolver,
        fn_constructor_args=(links_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resolve_citations_shuffle(mentions_ds, links_ds, num_buckets: int = 64):
    """Partitioned hash-join fallback for a links table too large to
    broadcast: bucket both sides by hash(doc_from) and join per bucket.

    Uses pandas merge inside the group fn — the documented pattern for
    a both-sides-large equi-join (ray_guide 'Joins and lookups').

    This IS the at-scale path (it exists precisely because the links
    table outgrew the broadcast), so the exchange is adaptive: it
    routes through ``spooled_group_map`` with ``fine_col`` = the full
    64-bit hash of the join doc — ``num_buckets`` only sets the
    initial fan-out and oversized partitions are re-split on the fine
    hash, keeping per-reduce-task bytes flat as both sides grow. The
    re-split preserves correctness because the merge only needs
    (doc_id == doc_from) co-location and both sides' fine key is the
    hash of that doc."""
    import pyarrow.compute as pc

    from ..functions.hashing import hash_strings

    def add_bucket_m(b: pa.Table) -> pa.Table:
        h = hash_strings(b["doc_id"].to_numpy(zero_copy_only=False))
        b = b.append_column(
            "bucket", pa.array((h % num_buckets).astype(np.int64))
        )
        return b.append_column("fine", pa.array(h.view(np.int64)))

    def add_bucket_l(b: pa.Table) -> pa.Table:
        h = hash_strings(b["doc_from"].to_numpy(zero_copy_only=False))
        b = b.append_column(
            "bucket", pa.array((h % num_buckets).astype(np.int64))
        )
        return b.append_column("fine", pa.array(h.view(np.int64)))

    extra = mentions_ds.map_batches(
        lambda b: b.filter(pc.not_equal(b["cite_tag"], "")),
        batch_format="pyarrow",
    ).map_batches(add_bucket_m, batch_format="pyarrow")
    links_b = links_ds.map_batches(add_bucket_l, batch_format="pyarrow")

    # align both sides to one schema (union needs identical columns)
    COLS = [
        ("doc_id", pa.string()),
        ("src_entity", pa.string()),
        ("src_group", pa.int64()),
        ("kind", pa.string()),
        ("num", pa.string()),
        ("cite_tag", pa.string()),
        ("doc_from", pa.string()),
        ("tag", pa.string()),
        ("doc_to", pa.string()),
        ("bucket", pa.int64()),
        ("fine", pa.int64()),
        ("side", pa.string()),
    ]

    def align(side):
        def fn(b: pa.Table) -> pa.Table:
            b = b.append_column(
                "side", pa.array([side] * b.num_rows, pa.string())
            )
            cols = []
            for name, typ in COLS:
                if name in b.column_names:
                    cols.append(b[name])
                else:
                    cols.append(pa.nulls(b.num_rows, typ))
            return pa.table(dict(zip([c[0] for c in COLS], cols)))

        return fn

    unioned = extra.map_batches(align("m"), batch_format="pyarrow").union(
        links_b.map_batches(align("l"), batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g[g["side"] == "m"]
        l = g[g["side"] == "l"]
        if len(m) == 0 or len(l) == 0:
            return pd.DataFrame(
                {
                    "subject": pd.Series(dtype=str),
                    "predicate": pd.Series(dtype=str),
                    "object": pd.Series(dtype=str),
                    "confidence": pd.Series(dtype=float),
                    "provenance": pd.Series(dtype=str),
                }
            )
        # drop the null-aligned link columns from the mentions side
        # BEFORE merging — otherwise pandas suffixes the collision to
        # doc_to_x/doc_to_y and the projection below KeyErrors
        m = m[["doc_id", "src_entity", "src_group", "kind", "num",
               "cite_tag"]]
        # broadcast-plan parity: duplicate (doc_from, tag) keys keep
        # MAX(doc_to) — the same value-defined winner _links_index
        # picks, so both plans agree regardless of spool-partition row
        # order (bibliography resolution emits unique keys anyway;
        # this tie-break only matters for adversarial inputs)
        l = l.sort_values(
            ["doc_from", "tag", "doc_to"], kind="mergesort"
        ).drop_duplicates(["doc_from", "tag"], keep="last")
        j = m.merge(
            l[["doc_from", "tag", "doc_to"]],
            left_on=["doc_id", "cite_tag"],
            right_on=["doc_from", "tag"],
            how="inner",
        )
        obj = j["doc_to"] + "#" + j["kind"] + " " + j["num"]
        grp = j["src_group"].fillna(0).astype(np.int64).astype(str)
        prov = "mention.extra|n=" + grp + "|tag=" + j["cite_tag"]
        return pd.DataFrame(
            {
                "subject": j["src_entity"],
                "predicate": PRED_CITES,
                "object": obj,
                "confidence": 1.0,
                "provenance": prov,
            }
        )

    from ..state.spool import spooled_group_map

    return spooled_group_map(
        unioned, "bucket", join_bucket, batch_format="pandas",
        fine_col="fine",
    )
