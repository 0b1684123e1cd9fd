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

from ..state.raypatch import apply_empty_to_pandas_patch

# typed-empty results (empty_schema paths below) must keep their
# columns through to_pandas (state/raypatch.py)
apply_empty_to_pandas_patch()

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


# ------------------------------------------------- multi-pattern BGP


def _store_files(store_dir: str) -> list[str]:
    import glob
    import os

    parts = sorted(
        glob.glob(os.path.join(store_dir, "part=*", "*.parquet"))
    )
    parts += sorted(
        glob.glob(os.path.join(store_dir, "delta_*", "part=*", "*.parquet"))
    )
    return parts


def pattern_scan_stats(
    store_dir: str,
    predicate: str | None,
    subject: str | None = None,
) -> dict:
    """Row-group-level scan estimate for one triple pattern, from
    parquet METADATA only (no data read): a row group is admitted iff
    its predicate min/max admits ``predicate`` and its subject
    min/max admits ``subject`` (the store's sorted-partition layout,
    sources/sinks.py, is what makes these statistics selective).
    Returns est_rows / est_bytes over admitted row groups plus the
    store totals — the planner's selectivity estimate AND the
    scanned-bytes bound a pruned scan cannot exceed.

    est_rows prefers the EXACT per-partition predicate histograms the
    sink records in its manifests (state/manifest.py pred_counts —
    min/max alone under the subject-first sort order admits any
    predicate lexically between two present ones); est_bytes stays
    the row-group-admission bound, because that is what the scan
    physically reads."""
    import pyarrow.parquet as pq

    est_rows = est_bytes = tot_rows = tot_bytes = 0
    for f in _store_files(store_dir):
        md = pq.ParquetFile(f).metadata
        names = md.schema.names
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            tot_rows += g.num_rows
            tot_bytes += g.total_byte_size
            admit = True
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                name = names[ci] if ci < len(names) else col.path_in_schema
                if (
                    predicate is not None
                    and name == "predicate"
                    and not (st.min <= predicate <= st.max)
                ):
                    admit = False
                if (
                    subject is not None
                    and name == "subject"
                    and not (st.min <= subject <= st.max)
                ):
                    admit = False
            if admit:
                est_rows += g.num_rows
                est_bytes += g.total_byte_size
    if predicate is not None and subject is None:
        exact = _manifest_pred_rows(store_dir, predicate)
        if exact is not None:
            est_rows = min(est_rows, exact)
    return {
        "est_rows": est_rows,
        "est_bytes": est_bytes,
        "total_rows": tot_rows,
        "total_bytes": tot_bytes,
    }


def _manifest_pred_rows(store_dir: str, predicate: str) -> int | None:
    """Exact rows carrying ``predicate`` from the sink's per-partition
    manifests (None when any segment predates the pred_counts
    histogram — the caller falls back to row-group admission)."""
    import glob
    import os

    from ..state.manifest import read_manifests

    total = 0
    dirs = [store_dir] + sorted(
        d
        for d in glob.glob(os.path.join(store_dir, "delta_*"))
        if os.path.isdir(d)
    )
    seen = False
    for d in dirs:
        for m in read_manifests(d):
            seen = True
            pc_map = m.get("pred_counts")
            if pc_map is None:
                return None
            total += int(pc_map.get(predicate, 0))
    return total if seen else None


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def bgp_plan(store_dir: str, patterns: list[tuple]) -> list[dict]:
    """Order N triple patterns into a join-connected left-deep chain,
    most-selective first, using :func:`pattern_scan_stats` (predicate
    + literal-subject row-group statistics of the sorted store).

    Each pattern is ``(s, p, o)``; terms starting with ``"?"`` are
    variables, anything else a literal. The predicate must be a
    literal (a variable predicate scans the whole store — allowed,
    estimated at full size). Returns the ordered plan: one dict per
    pattern with the pattern, its scan estimate, and the variables it
    shares with the bindings built so far (empty for the first;
    raises for a disconnected pattern — a cross product at store
    scale is always a planning error, never something to run
    silently)."""
    stats = []
    for pat in patterns:
        s, p, o = pat
        stats.append(
            pattern_scan_stats(
                store_dir,
                None if _is_var(p) else p,
                None if _is_var(s) else s,
            )
        )
    remaining = list(range(len(patterns)))
    plan: list[dict] = []
    bound: set[str] = set()

    def pat_vars(i):
        return {t for t in patterns[i] if _is_var(t)}

    while remaining:
        if not plan:
            cand = remaining
        else:
            cand = [i for i in remaining if pat_vars(i) & bound]
            if not cand:
                raise ValueError(
                    "disconnected BGP: patterns "
                    f"{[patterns[i] for i in remaining]} share no "
                    "variable with the bindings built so far — a "
                    "cross product over the store; split the query "
                    "or add a linking pattern."
                )
        best = min(cand, key=lambda i: stats[i]["est_rows"])
        plan.append(
            {
                "pattern": patterns[best],
                **stats[best],
                "join_vars": sorted(pat_vars(best) & bound),
            }
        )
        bound |= pat_vars(best)
        remaining.remove(best)
    return plan


def _scan_pattern(store_dir: str, pattern: tuple):
    """Pruned scan of one pattern -> Dataset of its variable columns
    (names without the '?'). Literal terms filter; the predicate /
    literal-subject filters are PUSHED into the parquet read
    (sources/sinks.py:read_triples row-group pruning)."""
    from ..sources.sinks import read_triples

    s, p, o = pattern
    ds = read_triples(
        store_dir,
        predicate=None if _is_var(p) else p,
        # exact literal subject: prefix pruning with the full string
        subject_prefix=None if _is_var(s) else s,
    )

    def fn(b: pa.Table) -> pa.Table:
        keep = None

        def conj(m):
            nonlocal keep
            keep = m if keep is None else pc.and_(keep, m)

        if not _is_var(s):
            conj(pc.equal(b["subject"], s))
        if not _is_var(o):
            conj(pc.equal(b["object"], o))
        if _is_var(s) and _is_var(o) and s == o:
            conj(pc.equal(b["subject"], b["object"]))
        if keep is not None:
            b = b.filter(keep)
        cols: dict[str, pa.ChunkedArray] = {}
        if _is_var(s):
            cols[s[1:]] = b["subject"]
        if _is_var(p):
            cols[p[1:]] = b["predicate"]
        if _is_var(o) and o[1:] not in cols:
            cols[o[1:]] = b["object"]
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def bgp_query(
    store_dir: str,
    patterns: list[tuple],
    nbuckets: int = _COCITE_BUCKETS,
    optional: list[tuple] | None = None,
    minus: list[tuple] | None = None,
):
    """Execute a basic graph pattern over a materialized store:
    :func:`bgp_plan` orders the legs by row-group-statistics
    selectivity, each leg is a PRUNED scan (only admitted row groups
    leave storage), and consecutive legs join on their shared
    variables through the same adaptive spool exchange every kgquery
    operator uses (fine key = hash of the join-variable tuple, so
    oversized buckets re-split without breaking co-location).

    Bag semantics (like the SQL join the oracle runs): no implicit
    DISTINCT. Returns a Dataset with one column per variable.

    ``optional`` patterns run AFTER the required chain as LEFT joins
    (SPARQL OPTIONAL): bindings keep their rows when the pattern has
    no match, with the pattern's new variables null. Each optional
    pattern must share >= 1 variable with the required bindings and
    may only introduce NEW variables (the simple, well-defined
    OPTIONAL subset; re-binding an existing var raises).

    ``minus`` patterns run LAST (SPARQL MINUS / FILTER NOT EXISTS):
    a binding is dropped when the pattern matches on its shared
    variables; the pattern's own extra variables are existential and
    never join the output. Same one-adaptive-exchange shape as every
    other leg — the right side ships only its DISTINCT shared-var
    tuples plus a presence marker.
    Reference analog: the graph tables these queries serve,
    Styling/tools/theoremdb/extract_graph.py:298-307 — composed there
    with hand-written pandas joins, planned here."""
    from ..functions.hashing import hash_strings

    plan = bgp_query.last_plan = bgp_plan(store_dir, patterns)
    bindings = _scan_pattern(store_dir, plan[0]["pattern"])
    bound_cols = [
        t[1:] for t in plan[0]["pattern"] if _is_var(t)
    ]
    # de-dup while preserving order (s == o same-var patterns)
    bound_cols = list(dict.fromkeys(bound_cols))

    steps = [dict(p, how="inner") for p in plan[1:]]
    # OPTIONAL legs run last, in caller order (their join columns are
    # resolved against the bindings at execution time below)
    steps += [
        {"pattern": opat, "join_vars": None, "how": "left"}
        for opat in (optional or [])
    ]
    steps += [
        {"pattern": mpat, "join_vars": None, "how": "minus"}
        for mpat in (minus or [])
    ]

    for step in steps:
        right = _scan_pattern(store_dir, step["pattern"])
        right_cols = list(
            dict.fromkeys(t[1:] for t in step["pattern"] if _is_var(t))
        )
        if step["how"] == "left":
            shared = [c for c in right_cols if c in bound_cols]
            new = [c for c in right_cols if c not in bound_cols]
            if not shared:
                raise ValueError(
                    f"disconnected OPTIONAL pattern {step['pattern']}: "
                    "shares no variable with the required bindings"
                )
            if not new:
                raise ValueError(
                    f"OPTIONAL pattern {step['pattern']} introduces no "
                    "new variable; re-binding existing vars is not "
                    "supported (use a required pattern)"
                )
            join_cols = shared
        elif step["how"] == "minus":
            shared = [c for c in right_cols if c in bound_cols]
            if not shared:
                raise ValueError(
                    f"disconnected MINUS pattern {step['pattern']}: "
                    "shares no variable with the bindings"
                )
            join_cols = shared
        else:
            join_cols = [v[1:] for v in step["join_vars"]]
        if step["how"] == "minus":
            # output schema unchanged; the right side contributes
            # only its shared columns (existence check)
            all_cols = list(bound_cols)
            right_cols = list(join_cols)
        else:
            all_cols = bound_cols + [
                c for c in right_cols if c not in bound_cols
            ]

        def tag(side: int, have: list[str], all_cols=all_cols,
                join_cols=join_cols):
            def fn(b: pa.Table) -> pa.Table:
                key = None
                for c in join_cols:
                    part = b[c].combine_chunks() if b.num_rows else (
                        pa.chunked_array([], pa.string())
                    )
                    part = pc.cast(part, pa.string())
                    key = (
                        part
                        if key is None
                        else pc.binary_join_element_wise(
                            key, part, "\x1f"
                        )
                    )
                h = hash_strings(
                    key.to_numpy(zero_copy_only=False)
                    if b.num_rows
                    else np.empty(0, dtype=object)
                )
                cols = {
                    "bucket": pa.array(
                        (h % np.uint64(nbuckets)).astype(np.int64)
                    ),
                    "fine": pa.array(h.view(np.int64)),
                    "side": pa.array(
                        np.full(b.num_rows, side, np.int64)
                    ),
                }
                for c in all_cols:
                    cols[c] = (
                        b[c]
                        if c in have
                        else pa.nulls(b.num_rows, pa.string())
                    )
                return pa.table(cols)

            return fn

        legs = bindings.map_batches(
            tag(0, bound_cols), batch_format="pyarrow"
        ).union(
            right.map_batches(tag(1, right_cols), batch_format="pyarrow")
        )

        def per_bucket(g: pd.DataFrame, all_cols=all_cols,
                       join_cols=join_cols, bound_cols=list(bound_cols),
                       right_cols=list(right_cols),
                       how=step["how"]) -> pd.DataFrame:
            left = g[g["side"] == 0][bound_cols]
            rt = g[g["side"] == 1][right_cols]
            if len(left) == 0 or (len(rt) == 0 and how == "inner"):
                return pd.DataFrame(
                    {c: pd.Series(dtype="object") for c in all_cols}
                )
            if len(rt) == 0:  # left/minus, nothing on the right
                out = left.copy()
                for c in all_cols:
                    if c not in out.columns:
                        out[c] = None
                return out[all_cols]
            if how == "minus":
                rt2 = rt[join_cols].drop_duplicates()
                out = left.merge(
                    rt2, on=join_cols, how="left", indicator=True
                )
                out = out[out["_merge"] == "left_only"].drop(
                    columns=["_merge"]
                )
                return out[all_cols]
            out = left.merge(rt, on=join_cols, how=how)
            if how == "left":
                # pandas fills misses with NaN; normalize to None so
                # Arrow infers string-or-null, not float
                out = out.where(pd.notna(out), None)
            return out[all_cols]

        bindings = _spooled(
            legs,
            per_bucket,
            "fine",
            drop=["fine"],
            empty_schema=pa.schema(
                [(c, pa.string()) for c in all_cols]
            ),
        )
        bound_cols = all_cols
    return bindings


def reachable_store(
    store_dir: str,
    predicate: str | list[str],
    seeds: list[str],
    max_hops: int = 4,
    inverse: bool = False,
):
    """Bounded transitive closure (SPARQL property-path ``pred{1,H}``)
    over a materialized store: BFS levels from ``seeds``, returning
    (node, hop) with hop = first-reached level (0 for seeds).

    ``predicate`` may be a list — SPARQL alternation ``(p1|p2){1,H}``
    — in which case the per-hop scan prunes to the UNION of the
    predicates' row groups (read_triples predicate-list pushdown).
    ``inverse=True`` walks edges object -> subject (SPARQL ``^pred``),
    same pruned scan with the roles swapped.

    Per hop: ONE pruned scan of the predicate's row groups
    (sources/sinks.py:read_triples pushdown — the store is never read
    whole), with the current frontier broadcast once via ``ray.put``
    and each batch semi-joined against it by sorted searchsorted.
    Driver state is the reached-NODE set — node-bounded, not
    edge-bounded, which is this operator's documented partitioning
    assumption (node ids for the queried component fit one machine;
    for edge-scale frontiers use stages/graph.py's distributed BFS).
    Reference analog: the citation-graph walks of
    Styling/tools/theoremdb/extract_graph.py done in networkx."""
    import ray

    from ..sources.sinks import read_triples
    from ..state.broadcast import get_broadcast

    reached: dict[str, int] = {s: 0 for s in seeds}
    frontier = sorted(set(seeds))
    for hop in range(1, max_hops + 1):
        if not frontier:
            break
        ref = ray.put(np.array(frontier, dtype=object))

        src_col, dst_col = (
            ("object", "subject") if inverse else ("subject", "object")
        )

        def step(b: pa.Table, ref=ref, src_col=src_col,
                 dst_col=dst_col) -> pa.Table:
            fr = get_broadcast(ref)
            src = b[src_col].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(fr, src)
            idx[idx >= len(fr)] = len(fr) - 1
            hit = fr[idx] == src
            return pa.table(
                {"node": b.filter(pa.array(hit))[dst_col]}
            )

        objs: set[str] = set()
        scan = read_triples(store_dir, predicate=predicate).map_batches(
            step, batch_format="pyarrow"
        )
        for t in scan.iter_batches(batch_format="pyarrow"):
            objs.update(t["node"].to_pylist())
        new = sorted(objs - reached.keys())
        for n in new:
            reached[n] = hop
        frontier = new
    out = pd.DataFrame(
        sorted(reached.items()), columns=["node", "hop"]
    )
    out["hop"] = out["hop"].astype(np.int64)
    return out


def predicate_stats(store_dir: str) -> pd.DataFrame:
    """Store-wide ``GROUP BY predicate`` answered from the sink's
    partition manifests alone — ZERO data rows read. The sink records
    an exact per-partition predicate histogram in every manifest
    (sources/sinks.py pred_counts; |predicates| is schema-bounded),
    so the fold is a driver-side sum over segments x partitions.
    Falls back to one pruned-column scan + groupby for stores written
    before the histograms existed. Returns DataFrame(predicate, n)
    sorted by predicate — the instant-answer form of the kind-tally
    queries the reference computes by scanning its CSVs
    (Styling/tools/theoremdb/extract_graph.py)."""
    import glob
    import os

    from ..state.manifest import read_manifests

    totals: dict[str, int] = {}
    dirs = [store_dir] + sorted(
        d
        for d in glob.glob(os.path.join(store_dir, "delta_*"))
        if os.path.isdir(d)
    )
    seen = False
    for d in dirs:
        for m in read_manifests(d):
            seen = True
            pc_map = m.get("pred_counts")
            if pc_map is None:  # pre-histogram store: real scan
                from ray.data.aggregate import Count

                from ..sources.sinks import read_triples

                df = (
                    read_triples(store_dir)
                    .select_columns(["predicate"])
                    .groupby("predicate")
                    .count()
                    .to_pandas()
                    .rename(columns={"count()": "n"})
                    .sort_values("predicate", kind="mergesort")
                    .reset_index(drop=True)
                )
                df["n"] = df["n"].astype(np.int64)
                return df
            for k, v in pc_map.items():
                totals[k] = totals.get(k, 0) + int(v)
    if not seen:
        raise FileNotFoundError(
            f"no partition manifests under {store_dir!r}"
        )
    out = pd.DataFrame(
        sorted(totals.items()), columns=["predicate", "n"]
    )
    out["n"] = out["n"].astype(np.int64)
    return out


def bgp_construct(
    store_dir: str,
    patterns: list[tuple],
    template: list[tuple],
    optional: list[tuple] | None = None,
    minus: list[tuple] | None = None,
    nbuckets: int = _COCITE_BUCKETS,
):
    """SPARQL CONSTRUCT: evaluate a BGP (with optional/minus legs)
    and emit NEW triples from ``template`` — the rule-based
    enrichment step of KG construction (e.g. derive
    ``(?c located_in ?r)`` from ``in_nation ∘ in_region``). Each
    template entry is ``(s, p, o)`` of variables (must be bound by
    the patterns; a template var an OPTIONAL leg left null drops that
    binding's emission for that template, like SPARQL's
    incomplete-triple rule) or literals. Returns a Dataset
    (subject, predicate, object) — feed it to
    :func:`materialize_construct` to append the derivation to the
    store as a delta segment."""
    tvars = {t for pat in template for t in pat if _is_var(t)}
    bound = {
        t[1:]
        for pat in list(patterns) + list(optional or [])
        for t in pat
        if _is_var(t)
    }
    missing = sorted(v for v in tvars if v[1:] not in bound)
    if missing:
        raise ValueError(
            f"CONSTRUCT template uses unbound variables {missing}"
        )
    bindings = bgp_query(
        store_dir, patterns, nbuckets=nbuckets,
        optional=optional, minus=minus,
    )

    def emit(b: pa.Table) -> pa.Table:
        outs = []
        for s, p, o in template:
            cols = {}
            null_mask = None
            for name, term in (
                ("subject", s), ("predicate", p), ("object", o)
            ):
                if _is_var(term):
                    arr = pc.cast(b[term[1:]], pa.string())
                    nulls = pc.is_null(arr)
                    null_mask = (
                        nulls
                        if null_mask is None
                        else pc.or_(null_mask, nulls)
                    )
                    cols[name] = arr
                else:
                    cols[name] = pa.array(
                        [term] * b.num_rows, pa.string()
                    )
            t = pa.table(cols)
            if null_mask is not None:
                # SPARQL incomplete-triple rule: a null (OPTIONAL
                # miss) in any position suppresses that triple
                t = t.filter(pc.invert(null_mask))
            outs.append(t)
        return pa.concat_tables(outs)

    return bindings.map_batches(emit, batch_format="pyarrow")


def materialize_construct(
    store_dir: str,
    patterns: list[tuple],
    template: list[tuple],
    optional: list[tuple] | None = None,
    minus: list[tuple] | None = None,
) -> dict:
    """Run :func:`bgp_construct` and append the derived triples to
    the SAME store as a new ``delta_NNN`` segment (store partition
    function + salt from ``_store_meta.json``, per-partition
    manifests with ``lineage="construct:..."``) — materialized
    inference over the LSM layout: queries see the derived edges
    immediately via the segment union, and the next auto-compaction
    folds them into the base. Returns {"segment", "rows"}."""
    import json
    import os

    from ..sources.sinks import materialize_triples

    with open(os.path.join(store_dir, "_store_meta.json")) as f:
        meta = json.load(f)
    n_seg = len(
        [d for d in os.listdir(store_dir) if d.startswith("delta_")]
    )
    seg_dir = os.path.join(store_dir, f"delta_{n_seg:03d}")
    rule = " . ".join("(%s %s %s)" % pat for pat in template)
    summary = materialize_triples(
        bgp_construct(
            store_dir, patterns, template,
            optional=optional, minus=minus,
        ),
        seg_dir,
        num_partitions=int(meta["num_partitions"]),
        salt_repos=meta.get("salt_repos") or {},
        resume=False,
        lineage=f"construct:{rule}",
    )
    rows = sum(r["rows"] for r in summary.take_all())
    return {"segment": seg_dir, "rows": int(rows)}


def _new_triples_only(derived, store_dir: str, head_preds: list[str],
                      nbuckets: int = _COCITE_BUCKETS):
    """Distinct derived triples NOT already in the store: one
    adaptive exchange keyed on hash(s,p,o). The store side is a
    PRUNED scan of only the head predicates' row groups — a rule can
    only re-derive triples of its own head predicate, so the rest of
    a 100 TB store never enters the diff."""
    from ..functions.hashing import hash_strings
    from ..sources.sinks import read_triples

    def keyed(side: int):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {
                        "bucket": pa.array([], pa.int64()),
                        "fine": pa.array([], pa.int64()),
                        "side": pa.array([], pa.int64()),
                        "subject": pa.array([], pa.string()),
                        "predicate": pa.array([], pa.string()),
                        "object": pa.array([], pa.string()),
                    }
                )
            key = pc.binary_join_element_wise(
                b["subject"], b["predicate"], b["object"], "\x1f"
            )
            h = hash_strings(key.to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "bucket": pa.array(
                        (h % np.uint64(nbuckets)).astype(np.int64)
                    ),
                    "fine": pa.array(h.view(np.int64)),
                    "side": pa.array(np.full(b.num_rows, side, np.int64)),
                    "subject": b["subject"],
                    "predicate": b["predicate"],
                    "object": b["object"],
                }
            )

        return fn

    store_side = read_triples(
        store_dir, predicate=sorted(set(head_preds))
    ).map_batches(keyed(1), batch_format="pyarrow")
    legs = derived.map_batches(keyed(0), batch_format="pyarrow").union(
        store_side
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        new = g[g["side"] == 0]
        if len(new) == 0:
            return pd.DataFrame(
                {
                    c: pd.Series(dtype="object")
                    for c in ("subject", "predicate", "object")
                }
            )
        have = set(g.loc[g["side"] == 1, "fine"])
        new = new[~new["fine"].isin(have)]
        new = new.sort_values(
            ["subject", "predicate", "object"], kind="mergesort"
        ).drop_duplicates(["subject", "predicate", "object"])
        return new[["subject", "predicate", "object"]]

    return _spooled(
        legs,
        per_bucket,
        "fine",
        drop=[],  # per_bucket needs the fine hash for the diff
        empty_schema=pa.schema(
            [("subject", pa.string()), ("predicate", pa.string()),
             ("object", pa.string())]
        ),
    )


def apply_rules_to_fixpoint(
    store_dir: str,
    rules: list[dict],
    max_iters: int = 10,
    nbuckets: int = _COCITE_BUCKETS,
) -> pd.DataFrame:
    """Forward chaining: apply CONSTRUCT ``rules`` repeatedly,
    appending each iteration's NEW triples as one delta segment,
    until an iteration derives nothing (or ``max_iters``) — naive
    datalog over the LSM store, the classic materialized-inference
    loop (e.g. a transitivity rule closes a chain in O(log n)
    iterations because later rounds re-read earlier derivations).

    Each rule is ``{"patterns": [...], "template": [...]}`` plus
    optional ``"optional"`` / ``"minus"`` legs. Per iteration, per
    rule: one planned BGP evaluation (pruned scans, adaptive
    exchanges), then ONE diff exchange against the store restricted
    to the rule heads' predicates (:func:`_new_triples_only`), then
    one segment append. Returns the iteration log
    (iter, derived_new, segment).

    ``nbuckets`` sets both exchanges' coarse fan-out — the default
    suits store-scale rule bodies; pass a small value for
    few-thousand-triple rule domains, where per-iteration wall is
    otherwise dominated by empty-bucket task overhead (the adaptive
    re-split still grows fan-out when a bucket outgrows the cap).
    Per-iteration segment appends are deliberate: a crashed fixpoint
    resumes from its last materialized iteration (an in-memory
    accumulation variant measured SLOWER at small scale — extra
    union/materialize rounds — and loses that restartability)."""
    log = []
    for it in range(1, max_iters + 1):
        import ray.data as rd

        new_parts = []
        head_preds = []
        for rule in rules:
            derived = bgp_construct(
                store_dir,
                rule["patterns"],
                rule["template"],
                optional=rule.get("optional"),
                minus=rule.get("minus"),
                nbuckets=nbuckets,
            )
            head_preds += [
                t[1] for t in rule["template"] if not _is_var(t[1])
            ]
            new_parts.append(derived)
        derived_all = new_parts[0]
        for d in new_parts[1:]:
            derived_all = derived_all.union(d)
        new = _new_triples_only(
            derived_all, store_dir, head_preds, nbuckets=nbuckets
        )
        n_new = new.count()
        if n_new == 0:
            log.append({"iter": it, "derived_new": 0, "segment": None})
            break
        res = _append_segment(store_dir, new, f"fixpoint iter {it}")
        log.append(
            {"iter": it, "derived_new": int(n_new),
             "segment": res["segment"]}
        )
    return pd.DataFrame(log)


def _append_segment(store_dir: str, triples, lineage: str) -> dict:
    """Append a triples Dataset to the store as the next delta
    segment (store partition function + salt from _store_meta)."""
    import json
    import os

    from ..sources.sinks import materialize_triples

    with open(os.path.join(store_dir, "_store_meta.json")) as f:
        meta = json.load(f)
    n_seg = len(
        [d for d in os.listdir(store_dir) if d.startswith("delta_")]
    )
    seg_dir = os.path.join(store_dir, f"delta_{n_seg:03d}")
    summary = materialize_triples(
        triples,
        seg_dir,
        num_partitions=int(meta["num_partitions"]),
        salt_repos=meta.get("salt_repos") or {},
        resume=False,
        lineage=lineage,
    )
    rows = sum(r["rows"] for r in summary.take_all())
    return {"segment": seg_dir, "rows": int(rows)}
