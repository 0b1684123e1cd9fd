"""Query operators over the materialized triple store.

The reference explores its extracted theorem graph with ad-hoc pandas
over the exported CSVs (`Styling/tools/theoremdb/extract_graph.py`
save_graph + notebook joins); here the same questions are first-class
distributed operators over the triple Dataset:

- ``triple_pattern``  — the (s?, p?, o?) point/prefix filter every
  triple store needs (SPARQL's single BGP), pure per-batch Arrow.
- ``two_hop``         — S -p1-> X -p2-> O via ONE mid-node-bucketed
  exchange (never a full shuffle join of the store against itself).
- ``cocitation_pairs``— pairs of subjects citing the same object,
  weighted by how many objects they share: the co-citation network
  used for related-result recommendations. Pair generation happens
  inside the mid-node group with a documented hot-object cap, the
  same skew-defense contract as the canonicalizer's LSH buckets
  (stages/canonicalize.py star-edge cap).

Scale notes: both exchanges are keyed on the JOIN NODE (object / mid
node), so a hot entity (a paper every repo cites) is the skew risk —
``max_fanout`` bounds the quadratic blowup per object and truncation
is LOGGED, never silent (the crash-loud lesson from the reference's
silent chunk skips, Styling/src/cli.py:228-229).

Every exchange here routes through ``state.spool.spooled_group_map``
with ``fine_col`` = the full 64-bit hash of the join node: the coarse
bucket count (``_COCITE_BUCKETS``) only sets the INITIAL fan-out, and
any partition larger than ``max_partition_bytes`` is re-split on a
decorrelated hash of the fine key before the reduce side reads it —
per-task bytes stay flat as the store grows instead of one task
concat-reading 1/64 of a predicate's legs at 100x scale. The re-split
is correct because every group fn below relies ONLY on join-node
co-location (rows sharing a mid/object/subject share the fine hash),
never on seeing the whole coarse bucket.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

_COCITE_BUCKETS = 64


def triple_pattern(
    triples,
    subject: str | None = None,
    predicate: str | None = None,
    obj: str | None = None,
    subject_prefix: str | None = None,
    object_prefix: str | None = None,
):
    """Filter the triple Dataset on any combination of exact
    subject / predicate / object and subject/object prefixes (the
    repo-scoped lookup: prefix ``org/name/``). Stateless per-batch
    Arrow kernels — no exchange, predicate pushdown stays in the
    scan."""

    def fn(b: pa.Table) -> pa.Table:
        keep = None

        def conj(m):
            nonlocal keep
            keep = m if keep is None else pc.and_(keep, m)

        if subject is not None:
            conj(pc.equal(b["subject"], subject))
        if predicate is not None:
            conj(pc.equal(b["predicate"], predicate))
        if obj is not None:
            conj(pc.equal(b["object"], obj))
        if subject_prefix is not None:
            conj(pc.starts_with(b["subject"], subject_prefix))
        if object_prefix is not None:
            conj(pc.starts_with(b["object"], object_prefix))
        return b if keep is None else b.filter(keep)

    return triples.map_batches(fn, batch_format="pyarrow")


def _bucket_on(col: str, nbuckets: int):
    from ..functions.hashing import hash_strings

    def fn(b: pa.Table) -> pa.Table:
        h = hash_strings(b[col].to_numpy(zero_copy_only=False))
        return b.append_column(
            "bucket",
            pa.array((h % np.uint64(nbuckets)).astype(np.int64)),
        )

    return fn


def _spooled(legs, per_bucket, fine_col: str, drop: list[str],
             empty_schema: "pa.Schema | None" = None):
    """One adaptive exchange: coarse-bucket spool keyed on ``bucket``
    with oversized partitions re-split on ``fine_col`` (the full hash
    of the join node), so per-reduce-task bytes stay bounded however
    large one predicate's legs grow. ``empty_schema`` gives the
    no-matches result a real schema (an empty exchange otherwise
    yields a schema-less Dataset whose to_pandas() has no columns)."""
    import ray.data as rd

    from ..state.spool import spooled_group_map

    def run(g: pa.Table) -> pa.Table:
        out = per_bucket(g.drop_columns(drop).to_pandas())
        return pa.Table.from_pandas(out, preserve_index=False)

    out = spooled_group_map(legs, "bucket", run, fine_col=fine_col)
    if empty_schema is not None and out.count() == 0:
        return rd.from_arrow(empty_schema.empty_table())
    return out


def two_hop(triples, pred1: str, pred2: str, nbuckets: int = _COCITE_BUCKETS):
    """S -pred1-> X -pred2-> O. Both legs are pre-filtered per batch
    (only pred1/pred2 rows reach the exchange), tagged by side, and
    co-located by hash(mid node) in ONE adaptive exchange; the
    per-group join is a merge on the mid node. Output (subject, mid,
    object), distinct within group by construction of the input store
    (triples are unique). Correct under re-split: the join needs only
    mid-node co-location and ``fine`` IS hash(mid)."""
    legs = triples.map_batches(
        _two_hop_pre(pred1, pred2), batch_format="pyarrow"
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "subject": pd.Series(dtype="object"),
                    "mid": pd.Series(dtype="object"),
                    "object": pd.Series(dtype="object"),
                }
            )
        out = left.merge(right, on="mid")
        return pd.DataFrame(
            {
                "subject": out["node_x"],
                "mid": out["mid"],
                "object": out["node_y"],
            }
        )

    return _spooled(
        legs,
        per_bucket,
        "fine",
        drop=["fine"],
        empty_schema=pa.schema(
            [("subject", pa.string()), ("mid", pa.string()),
             ("object", pa.string())]
        ),
    )


def _two_hop_pre(pred1: str, pred2: str, nbuckets: int = _COCITE_BUCKETS):
    from ..functions.hashing import hash_strings

    def fn(b: pa.Table) -> pa.Table:
        m1 = pc.equal(b["predicate"], pred1)
        m2 = pc.equal(b["predicate"], pred2)
        l1 = b.filter(m1)  # mid = object
        l2 = b.filter(m2)  # mid = subject
        mid = pa.concat_arrays(
            [l1["object"].combine_chunks(), l2["subject"].combine_chunks()]
        )
        node = pa.concat_arrays(
            [l1["subject"].combine_chunks(), l2["object"].combine_chunks()]
        )
        side = np.concatenate(
            [np.zeros(len(l1), np.int64), np.ones(len(l2), np.int64)]
        )
        h = hash_strings(mid.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bucket": pa.array(
                    (h % np.uint64(nbuckets)).astype(np.int64)
                ),
                "fine": pa.array(h.view(np.int64)),
                "mid": mid,
                "node": node,
                "side": pa.array(side),
            }
        )

    return fn


def cocitation_pairs(
    triples,
    predicate: str = "cites",
    max_fanout: int = 1024,
    nbuckets: int = _COCITE_BUCKETS,
):
    """Pairs of subjects that cite the same object, weighted by the
    number of shared objects (co-citation strength). One exchange
    keyed on the cited object generates within-group pairs; a second,
    pair-keyed exchange folds the counts. Objects cited by more than
    ``max_fanout`` subjects are truncated to the lexicographically
    first ``max_fanout`` (deterministic under any partitioning) with
    a WARNING — the quadratic guard for hub entities.

    Returns a Dataset (subj_a, subj_b, n_shared) with subj_a <
    subj_b.

    Scan tip: when reading from a materialized store, pass
    ``read_triples(store, predicate="cites")`` as ``triples`` — the
    predicate filter then prunes parquet row groups at the scan
    (sources/sinks.py) and the per-batch re-filter below is a no-op,
    instead of streaming the whole store through the filter."""
    cites = triple_pattern(triples, predicate=predicate)

    def pre(b: pa.Table) -> pa.Table:
        from ..functions.hashing import hash_strings

        h = hash_strings(b["object"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bucket": pa.array(
                    (h % np.uint64(nbuckets)).astype(np.int64)
                ),
                "fine": pa.array(h.view(np.int64)),
                "object": b["object"],
                "subject": b["subject"],
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["object", "subject"]).sort_values(
            ["object", "subject"], kind="mergesort"
        )
        obj = g["object"].to_numpy()
        sub = g["subject"].to_numpy()
        n = len(obj)
        if n == 0:
            return pd.DataFrame(
                {
                    "subj_a": pd.Series(dtype="object"),
                    "subj_b": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = obj[1:] != obj[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            k = e - s
            if k < 2:
                continue
            if k > max_fanout:
                logger.warning(
                    "cocitation: object %r fanout %d > cap %d — "
                    "truncating to first %d subjects",
                    obj[s],
                    k,
                    max_fanout,
                    max_fanout,
                )
                e = s + max_fanout
                k = max_fanout
            ii, jj = np.triu_indices(k, 1)
            a_parts.append(sub[s:e][ii])
            b_parts.append(sub[s:e][jj])
        if not a_parts:
            return pd.DataFrame(
                {
                    "subj_a": pd.Series(dtype="object"),
                    "subj_b": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        aa = np.concatenate(a_parts)
        bb = np.concatenate(b_parts)
        df = (
            pd.DataFrame({"subj_a": aa, "subj_b": bb})
            .groupby(["subj_a", "subj_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return df

    pairs = _spooled(
        cites.map_batches(pre, batch_format="pyarrow"),
        per_bucket,
        "fine",
        drop=["fine"],
        empty_schema=pa.schema(
            [("subj_a", pa.string()), ("subj_b", pa.string()),
             ("n", pa.int64())]
        ),
    )
    from ray.data.aggregate import Sum

    return (
        pairs.groupby(["subj_a", "subj_b"])
        .aggregate(Sum("n", alias_name="n_shared"))
    )


def star_join(
    triples,
    required: dict[str, str | None],
    nbuckets: int = _COCITE_BUCKETS,
):
    """Star-pattern match: subjects having ALL the required
    (predicate -> object-or-wildcard) edges — the multi-BGP SPARQL
    shape ``?s p1 o1 . ?s p2 ?x . ...`` with a shared subject.

    ONE exchange keyed on the subject: each batch pre-filters to the
    required predicates (tagging rows with the pattern index they
    satisfy), groups co-locate by hash(subject), and a group passes
    iff it covers every pattern index. Returns the distinct matching
    subjects. Predicate values of None are wildcards (any object).
    """
    from ..functions.hashing import hash_strings

    pats = sorted(required.items())
    npat = len(pats)

    def pre(b: pa.Table) -> pa.Table:
        subs, idxs = [], []
        for i, (pred, obj) in enumerate(pats):
            m = pc.equal(b["predicate"], pred)
            if obj is not None:
                m = pc.and_(m, pc.equal(b["object"], obj))
            s = b.filter(m)["subject"].combine_chunks()
            subs.append(s)
            idxs.append(np.full(len(s), i, np.int64))
        sub = pa.concat_arrays(subs)
        h = hash_strings(sub.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bucket": pa.array(
                    (h % np.uint64(nbuckets)).astype(np.int64)
                ),
                "fine": pa.array(h.view(np.int64)),
                "subject": sub,
                "pat": pa.array(np.concatenate(idxs) if idxs else
                                np.empty(0, np.int64)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"subject": pd.Series(dtype="object")})
        cov = g.drop_duplicates(["subject", "pat"]).groupby(
            "subject", sort=False
        )["pat"].size()
        return pd.DataFrame({"subject": cov[cov == npat].index.to_numpy()})

    return _spooled(
        triples.map_batches(pre, batch_format="pyarrow"),
        per_bucket,
        "fine",
        drop=["fine"],
        empty_schema=pa.schema([("subject", pa.string())]),
    )


def neg_pattern(
    triples,
    have: tuple[str, str | None],
    lack: tuple[str, str | None],
    nbuckets: int = _COCITE_BUCKETS,
):
    """Negation (NOT EXISTS) pattern: subjects having a ``have``
    (predicate, object-or-wildcard) edge but NO ``lack`` edge — the
    SPARQL ``FILTER NOT EXISTS`` / anti-join shape over the store.

    Same ONE subject-keyed exchange as :func:`star_join`: rows
    matching either pattern co-locate by hash(subject); a subject
    passes iff its group covers the have-pattern and not the
    lack-pattern. Distinct subjects out."""
    from ..functions.hashing import hash_strings

    pats = [have, lack]

    def pre(b: pa.Table) -> pa.Table:
        subs, idxs = [], []
        for i, (pred, obj) in enumerate(pats):
            m = pc.equal(b["predicate"], pred)
            if obj is not None:
                m = pc.and_(m, pc.equal(b["object"], obj))
            s = b.filter(m)["subject"].combine_chunks()
            subs.append(s)
            idxs.append(np.full(len(s), i, np.int64))
        sub = pa.concat_arrays(subs)
        h = hash_strings(sub.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bucket": pa.array(
                    (h % np.uint64(nbuckets)).astype(np.int64)
                ),
                "fine": pa.array(h.view(np.int64)),
                "subject": sub,
                "pat": pa.array(
                    np.concatenate(idxs) if idxs else np.empty(0, np.int64)
                ),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"subject": pd.Series(dtype="object")})
        d = g.drop_duplicates(["subject", "pat"])
        have_s = set(d.loc[d["pat"] == 0, "subject"])
        lack_s = set(d.loc[d["pat"] == 1, "subject"])
        keep = sorted(have_s - lack_s)
        return pd.DataFrame({"subject": pd.Series(keep, dtype="object")})

    return _spooled(
        triples.map_batches(pre, batch_format="pyarrow"),
        per_bucket,
        "fine",
        drop=["fine"],
        empty_schema=pa.schema([("subject", pa.string())]),
    )


def two_hop_store(
    store_dir: str,
    pred1: str,
    pred2: str,
    nbuckets: int = _COCITE_BUCKETS,
):
    """:func:`two_hop` reading each leg DIRECTLY from a materialized
    store with predicate pushdown (sources/sinks.py:read_triples):
    two pruned scans — parquet row-group statistics drop every row
    group whose predicate min/max excludes the leg — instead of one
    full-store scan filtered per batch. For a selective predicate
    over a 100 TB store this is the difference between reading the
    store twice-ish and reading only the matched legs. Downstream is
    the same adaptive mid-node exchange."""
    from ..functions.hashing import hash_strings
    from ..sources.sinks import read_triples

    def leg(side: int, mid_col: str, node_col: str):
        def fn(b: pa.Table) -> pa.Table:
            mid = b[mid_col].combine_chunks()
            h = hash_strings(mid.to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "bucket": pa.array(
                        (h % np.uint64(nbuckets)).astype(np.int64)
                    ),
                    "fine": pa.array(h.view(np.int64)),
                    "mid": mid,
                    "node": b[node_col].combine_chunks(),
                    "side": pa.array(
                        np.full(b.num_rows, side, np.int64)
                    ),
                }
            )

        return fn

    legs = read_triples(store_dir, predicate=pred1).map_batches(
        leg(0, "object", "subject"), batch_format="pyarrow"
    ).union(
        read_triples(store_dir, predicate=pred2).map_batches(
            leg(1, "subject", "object"), batch_format="pyarrow"
        )
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "subject": pd.Series(dtype="object"),
                    "mid": pd.Series(dtype="object"),
                    "object": pd.Series(dtype="object"),
                }
            )
        out = left.merge(right, on="mid")
        return pd.DataFrame(
            {
                "subject": out["node_x"],
                "mid": out["mid"],
                "object": out["node_y"],
            }
        )

    return _spooled(
        legs,
        per_bucket,
        "fine",
        drop=["fine"],
        empty_schema=pa.schema(
            [("subject", pa.string()), ("mid", pa.string()),
             ("object", pa.string())]
        ),
    )


def star_join_store(
    store_dir: str,
    required: dict[str, str | None],
    nbuckets: int = _COCITE_BUCKETS,
):
    """:func:`star_join` over a materialized store, reading ONLY the
    required predicates' row groups (predicate-list pushdown,
    sources/sinks.py:read_triples) instead of scanning the whole
    store; same adaptive subject-keyed exchange."""
    from ..sources.sinks import read_triples

    return star_join(
        read_triples(store_dir, predicate=sorted(required)),
        required,
        nbuckets=nbuckets,
    )


def neg_pattern_store(
    store_dir: str,
    have: tuple[str, str | None],
    lack: tuple[str, str | None],
    nbuckets: int = _COCITE_BUCKETS,
):
    """:func:`neg_pattern` over a materialized store with
    predicate-list scan pushdown (only the have/lack predicates'
    row groups are read)."""
    from ..sources.sinks import read_triples

    return neg_pattern(
        read_triples(store_dir, predicate=[have[0], lack[0]]),
        have,
        lack,
        nbuckets=nbuckets,
    )
