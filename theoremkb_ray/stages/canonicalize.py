"""Entity canonicalization: near-duplicate result entities (forks /
mirrors of a repo re-stating the same theorem) are merged to one
canonical id.

The reference only dedups result names per paper with a ``set()``
(reference: Styling/tools/theoremdb/extract_graph.py:232-288) and
matches theorems across papers pairwise with TF-IDF cosine
(reference: Styling/tools/thm_similarity/model_tfidf.py:22-65). At
corpus scale that becomes:

1. candidate generation — MinHash-LSH banding over result-text
   shingles: ``groupby((band_idx, band_hash))`` buckets; any two
   entities sharing a bucket are candidates (SURVEY.md D6/J9).
2. verify — SimHash-64 Hamming distance carried *in the band row*
   (8 bytes) so verification needs no extra join: pairs with
   hamming <= threshold survive.
3. connected components — iterative min-label propagation via
   ``groupby(node).aggregate(Min)``; O(log n) rounds, early-stopped by
   a label checksum. (A driver-side union-find fast path exists for
   provably-small edge sets.)
4. rewrite — triples' subject/object mapped to the canonical (min)
   entity id via a broadcast map (component count << corpus).

Skew note: a hot LSH bucket (boilerplate text) would cost O(g^2)
pairs; buckets larger than ``cap`` emit star edges to the bucket-min
entity instead — O(g) edges, identical connected components.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..state.raypatch import apply_join_patch
from ..functions.hashing import (
    band_hashes,
    flat_token_hashes_arrow,
    hamming64,
    hash_strings,
    minhash_signatures_flat,
    shingle_hashes_flat,
    simhash64_flat,
)

# Dataset.join schema-broadcast fix (state/raypatch.py)
apply_join_patch()

NUM_PERM = 64
NUM_BANDS = 16  # r = 4 -> catches Jaccard >= ~0.75 with high prob.
HAMMING_MAX = 18  # true near-dup shingle-simhash distances run 2-16; random pairs >=23


class BandEmitter:
    """map_batches callable: result rows -> LSH band rows.

    Output: (id, band_idx, band_hash, simhash).
    Proof entities are excluded (identity lives on numbered results).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["kind"], "proof")
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.string()),
                    "band_idx": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.uint64()),
                    "simhash": pa.array([], pa.uint64()),
                }
            )
        eids = batch["entity_id"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        # one Arrow split + one siphash + reduceat sketches for the
        # whole batch — no per-doc Python loop
        flat, starts = flat_token_hashes_arrow(batch["text"])
        fs, fd = shingle_hashes_flat(flat, starts, k=3)
        sigs = minhash_signatures_flat(fs, fd, n, NUM_PERM)
        bands = band_hashes(sigs, NUM_BANDS)  # (n, NUM_BANDS)
        sstarts = np.zeros(n + 1, np.int64)
        sstarts[1:] = np.cumsum(np.bincount(fd, minlength=n))
        sims = simhash64_flat(fs, sstarts)

        rep = NUM_BANDS
        # NOTE: no extra payload beyond the 8-byte simhash — every
        # column here is multiplied by NUM_BANDS in the shuffle
        return pa.table(
            {
                "id": pa.array(np.repeat(eids, rep), pa.string()),
                "band_idx": pa.array(
                    np.tile(np.arange(rep, dtype=np.int32), n)
                ),
                "band_hash": pa.array(bands.reshape(-1)),
                "simhash": pa.array(np.repeat(sims, rep)),
            }
        )


def dedup_pairs(pairs_ds, coarse: int = 64):
    """Drop duplicate (a, b) edges (a pair surfaces in up to NUM_BANDS
    LSH bands). One coarse-keyed shuffle on the pair hash; exactness
    holds because a pair's rows always share a coarse bucket."""

    def add_ph(b: pa.Table) -> pa.Table:
        ph = hash_strings(b["a"].to_numpy(zero_copy_only=False)) ^ hash_strings(
            b["b"].to_numpy(zero_copy_only=False)
        )
        return b.append_column(
            "ph", pa.array((ph % np.uint64(coarse)).astype(np.int64))
        )

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).drop(columns=["ph"])

    return (
        pairs_ds.map_batches(add_ph, batch_format="pyarrow")
        .groupby("ph")
        .map_groups(drop, batch_format="pandas")
    )


def candidate_pairs(
    band_ds,
    cap: int = 50,
    dedup: bool = True,
    pin_bands: bool = True,
    n_rows_hint: int | None = None,
):
    """Coarse-keyed bucket groupby -> verified near-dup edges
    (a, b, confidence), deduplicated across bands by default.

    A pair surfaces in up to NUM_BANDS bands. Keeping the duplicates
    is semantically fine (union-find / min-label propagation are
    idempotent) and skips one shuffle — but it inflates the SERIAL
    driver-side edge collect + union-find 16x, which measurably hurts
    scaling efficiency as the corpus grows. The parallel dedup shuffle
    wins; dedup=False exists for pipelines that keep the edges
    distributed end-to-end."""
    from .dedup import pairs_from_bands

    pairs = pairs_from_bands(
        band_ds, cap=cap, pin_bands=pin_bands, n_rows_hint=n_rows_hint
    )
    if dedup:
        pairs = dedup_pairs(pairs)

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "confidence": pa.array([], pa.float64()),
                }
            )
        ham = hamming64(
            b["sim_a"].to_numpy(zero_copy_only=False),
            b["sim_b"].to_numpy(zero_copy_only=False),
        )
        keep = ham <= HAMMING_MAX
        conf = 1.0 - ham[keep] / 64.0
        return pa.table(
            {
                "a": b["a"].filter(pa.array(keep)),
                "b": b["b"].filter(pa.array(keep)),
                "confidence": pa.array(conf, pa.float64()),
            }
        )

    return pairs.map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------------ connected components


def connected_components_local_arrays(edges: pa.Table):
    """Driver-side CC fast path, Arrow end to end: returns
    ``(uniq: pa.StringArray, min_idx: np.int64[n])`` where
    ``uniq.take(min_idx)[i]`` is the lexicographic MIN string of node
    ``uniq[i]``'s component.

    Node codes come from ONE ``pc.dictionary_encode`` over the
    concatenated edge columns (C hash table) — the pandas factorize
    over 27M PYTHON string objects it replaces was ~4s of driver time
    per flagship run at 13.7M edges; min-label propagation is
    np.minimum.at + label[label] pointer jumping (O(log n) rounds),
    and the min STRING per component is one Arrow UTF8 sort + an
    integer groupby. Property-tested against a BFS oracle in
    tests/test_properties.py via the dict wrapper."""
    import pandas as pd

    a = edges["a"]
    b = edges["b"]
    both = pa.chunked_array(
        [pc.cast(a, pa.string()), pc.cast(b, pa.string())]
    ).combine_chunks()
    if len(both) == 0:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    enc = pc.dictionary_encode(both)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary
    n = len(uniq)
    E = len(codes) // 2
    ea, eb = codes[:E], codes[E:]
    label = np.arange(n, dtype=np.int64)
    while True:
        m = np.minimum(label[ea], label[eb])
        before = label.copy()
        np.minimum.at(label, ea, m)
        np.minimum.at(label, eb, m)
        while True:  # pointer jumping until stable
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(label, before):
            break
    o = pc.sort_indices(uniq).to_numpy(zero_copy_only=False)
    first_seen = (
        pd.Series(np.arange(len(o))).groupby(label[o], sort=False).min()
    )
    pos = first_seen.reindex(label).to_numpy()
    return uniq, o[pos].astype(np.int64)


def connected_components_local(edges: pa.Table) -> dict[str, str]:
    """Dict form of :func:`connected_components_local_arrays` (every
    node -> min component string, identity rows included) — the
    operator-surface/test interface; the flagship fast path consumes
    the arrays directly and never builds this dict."""
    uniq, min_idx = connected_components_local_arrays(edges)
    if len(uniq) == 0:
        return {}
    nodes = uniq.to_numpy(zero_copy_only=False)
    min_strings = uniq.take(pa.array(min_idx, pa.int64())).to_numpy(
        zero_copy_only=False
    )
    return dict(zip(nodes, min_strings))


def _label_checksum(lds) -> int:
    """EXACT label-multiset checksum: per-batch wrap-around uint64 sum
    of label hashes, combined exactly on the driver with Python ints.
    (A float64 sum would discard the low ~11 bits of each 64-bit hash,
    leaving a false-convergence window.)"""

    def h(b: pa.Table) -> pa.Table:
        s = hash_strings(b["label"].to_numpy(zero_copy_only=False))
        part = int(s.sum(dtype=np.uint64))  # exact mod 2^64
        return pa.table({"h": pa.array([str(part)], pa.string())})

    total = 0
    for b in lds.map_batches(h, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for v in b["h"].to_pylist():
            total = (total + int(v)) & 0xFFFFFFFFFFFFFFFF
    return total


def connected_components_distributed(
    edges_ds, max_iters: int = 64
):
    """Min-label propagation with hash-partitioned joins.

    labels(v) <- min(labels(v), min over neighbors u of labels(u)),
    iterated until the label-multiset checksum is stable. Per round:
    one Dataset.join (edges |x| labels on node) + one groupby-Min —
    two keyed exchanges over edge-sized data, NO per-node task
    granularity. Components of diameter d converge in <= d rounds;
    the loop runs UNTIL the exact checksum is stable and raises if
    ``max_iters`` rounds pass without convergence (a silent exit would
    return split components = wrong canonical ids).
    Returns a Dataset (node, label)."""
    from ray.data.aggregate import Min

    def sym(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [b["a"].combine_chunks(), b["b"].combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [b["b"].combine_chunks(), b["a"].combine_chunks()]
                ),
            }
        )

    E = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()
    labels = (
        E.groupby("node")
        .aggregate(Min("nbr", alias_name="label"))
        .map_batches(
            lambda b: b.set_column(
                1, "label", pc.min_element_wise(b["label"], b["node"])
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # join partition count bounded by cluster CPUs: Dataset.join spawns
    # one aggregator actor per partition, and a partition count above
    # the CPU count deadlocks a small cluster (aggregators reserve the
    # slots the map tasks need)
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    n_parts = max(2, min(16, ncpu // 2))

    prev = _label_checksum(labels)
    converged = False
    for _ in range(max_iters):
        # label of each edge's node, delivered to its neighbor
        joined = E.join(
            labels, join_type="inner", num_partitions=n_parts, on=("node",)
        )
        cand = joined.map_batches(
            lambda b: pa.table({"node": b["nbr"], "cand": b["label"]}),
            batch_format="pyarrow",
        )
        self_rows = labels.map_batches(
            lambda b: pa.table({"node": b["node"], "cand": b["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            cand.union(self_rows)
            .groupby("node")
            .aggregate(Min("cand", alias_name="label"))
            .materialize()
        )
        cur = _label_checksum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components_distributed: labels not stable after "
            f"{max_iters} rounds (component diameter > {max_iters}?); "
            "refusing to return possibly-split components"
        )
    return labels


def canonical_map(
    edges_ds, distributed_threshold: int = 5_000_000
) -> dict[str, str]:
    """edges Dataset -> {entity: canonical_entity} (non-identity only)."""
    # pin the (small) edge set: count + collect must not re-run the
    # upstream band/bucket pipeline twice
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return {}
    if n_edges <= distributed_threshold:
        tbl = _collect(edges_ds)
        return {
            k: v for k, v in connected_components_local(tbl).items() if k != v
        }
    labels = connected_components_distributed(edges_ds)
    out: dict[str, str] = {}
    for b in labels.iter_batches(batch_format="pyarrow"):
        for n_, l_ in zip(b["node"].to_pylist(), b["label"].to_pylist()):
            if n_ != l_:
                out[n_] = l_
    return out


def _collect(ds) -> pa.Table:
    tabs = [
        pa.Table.from_batches([rb]) if isinstance(rb, pa.RecordBatch) else rb
        for rb in ds.iter_batches(batch_format="pyarrow")
    ]
    if not tabs:
        return pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    return pa.concat_tables(tabs, promote_options="default")


def _rewrite_batch(batch: pa.Table, map_ref) -> pa.Table:
    """Rewrite subject/object to canonical ids. The canonical map is
    broadcast ONCE as a (sorted uint64 key-hash numpy array, key
    strings, canonical values) triple and fetched once per worker via
    the broadcast cache; the per-batch probe is searchsorted + an
    exact string-equality verify on the hits.

    History of this hot spot: pandas ``Series.map(dict)`` rebuilt the
    hash Series per batch (~10ms each); Arrow ``index_in`` fixed that
    but re-hashes its value_set on EVERY call — O(|map|) per BLOCK,
    which at 1.07M map entries x 2 columns x hundreds of blocks made
    the rewrite the flagship's superlinear term (total work =
    blocks x map instead of rows log map). searchsorted against the
    broadcast-once sorted hash array is O(rows log map) per block with
    zero per-block setup; the verify step removes 64-bit hash
    collisions exactly."""
    import numpy as np

    from ..functions.hashing import hash_strings
    from ..state.broadcast import get_broadcast

    kh, keys, vals = get_broadcast(map_ref)
    if len(kh) == 0:
        return batch

    def remap(col) -> pa.Array:
        arr = (
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        s = arr.to_numpy(zero_copy_only=False)
        h = hash_strings(s)
        idx = np.searchsorted(kh, h)
        idx[idx >= len(kh)] = max(len(kh) - 1, 0)
        hit = kh[idx] == h
        if not hit.any():
            return arr
        take_idx = pa.array(idx[hit], pa.int64())
        # exact verify: a 64-bit collision must not rewrite a stranger
        exact = pc.equal(
            pc.take(keys, take_idx), arr.filter(pa.array(hit))
        ).to_numpy(zero_copy_only=False)
        hit_pos = np.flatnonzero(hit)[exact]
        if len(hit_pos) == 0:
            return arr
        out = s.copy()
        out[hit_pos] = (
            pc.take(vals, pa.array(idx[hit_pos], pa.int64()))
            .to_numpy(zero_copy_only=False)
        )
        return pa.array(out, pa.string())

    batch = batch.set_column(
        batch.column_names.index("subject"),
        "subject",
        remap(batch["subject"]),
    )
    return batch.set_column(
        batch.column_names.index("object"),
        "object",
        remap(batch["object"]),
    )


def rewrite_triples_arrays(triples_ds, keys_arr, vals_arr):
    """Broadcast-rewrite from Arrow (keys, canonical values) arrays —
    the dict-free fast path (no million-entry Python dict round-trip
    between CC and the broadcast build)."""
    if len(keys_arr) == 0:
        return triples_ds
    import numpy as np

    from ..functions.hashing import hash_strings

    kh = hash_strings(keys_arr.to_numpy(zero_copy_only=False))
    order = np.argsort(kh, kind="stable")
    take = pa.array(order, pa.int64())
    keys = keys_arr.take(take)
    vals = vals_arr.take(take)
    ref = ray.put((kh[order], keys, vals))
    return triples_ds.map_batches(
        lambda b: _rewrite_batch(b, ref),
        batch_format="pyarrow",
        batch_size=None,
    )


def rewrite_triples(triples_ds, canon: dict[str, str], concurrency=None):
    if not canon:
        return triples_ds
    import numpy as np

    keys_arr = pa.array(np.array(list(canon.keys()), dtype=object), pa.string())
    vals_arr = pa.array(
        np.array(list(canon.values()), dtype=object), pa.string()
    )
    return rewrite_triples_arrays(triples_ds, keys_arr, vals_arr)


def connected_components(edges_ds, distributed_threshold: int = 5_000_000):
    """edges Dataset (a, b) -> Dataset (node, label) for EVERY node in
    the edge set, identity rows included (label = lexicographic MIN of
    the component). The general-purpose CC operator surface: small
    edge sets take the vectorized driver fast path, large ones the
    hash-partitioned min-label propagation — both property-tested
    against the same BFS oracle."""
    import ray.data as rd

    edges_ds = edges_ds.materialize()
    if edges_ds.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "label": pa.array([], pa.string()),
                }
            )
        )
    if edges_ds.count() <= distributed_threshold:
        m = connected_components_local(_collect(edges_ds))
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(list(m.keys()), pa.string()),
                    "label": pa.array(list(m.values()), pa.string()),
                }
            )
        )
    return connected_components_distributed(edges_ds)


def canonical_map_ds(edges_ds):
    """edges Dataset -> mapping Dataset (node, label), non-identity rows
    only — the fully distributed form of :func:`canonical_map` (nothing
    funnels through the driver)."""
    labels = connected_components_distributed(edges_ds)
    return labels.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["node"], b["label"]))),
        batch_format="pyarrow",
    )


def rewrite_triples_join(triples_ds, mapping_ds, num_partitions: int | None = None):
    """Rewrite subject/object via PARTITIONED HASH JOINS — the fallback
    for a canonical map too large to broadcast (at 100x corpus scale
    the map itself can exceed driver/worker memory; a broadcast dict
    would OOM every worker). Two left-outer ``Dataset.join``s (subject,
    then object) + a coalesce; partition count bounded by cluster CPUs
    (the documented aggregator-actor deadlock guard)."""
    if num_partitions is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, min(16, ncpu // 2))

    from .joins import strip_schema_metadata

    # read-back parquet triples carry pandas schema metadata, which is
    # unhashable and knocks the join aggregators off their fast path
    triples_ds = strip_schema_metadata(triples_ds)
    mapping = mapping_ds.materialize()

    def coalesce(col: str):
        def fn(b: pa.Table) -> pa.Table:
            new = pc.coalesce(b["label"], b[col])
            b = b.set_column(b.column_names.index(col), col, new)
            # Ray's join may or may not retain the right key column
            return b.drop_columns(
                [c for c in ("node", "label") if c in b.column_names]
            )

        return fn

    subj_keyed = triples_ds.join(
        mapping,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("subject",),
        right_on=("node",),
    ).map_batches(coalesce("subject"), batch_format="pyarrow")
    return subj_keyed.join(
        mapping,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("object",),
        right_on=("node",),
    ).map_batches(coalesce("object"), batch_format="pyarrow")


def canonicalize_triples(
    triples_ds,
    edges_ds,
    edge_threshold: int = 5_000_000,
    map_broadcast_max: int = 2_000_000,
):
    """End-to-end canonicalization with scale-adaptive physical plans:

    - edges <= ``edge_threshold``: driver union-find (exact, cheap) +
      broadcast rewrite;
    - edges above, mapping <= ``map_broadcast_max``: distributed
      min-label propagation, mapping collected + broadcast rewrite;
    - both large: distributed CC + partitioned hash-join rewrite —
      NOTHING corpus-sized ever reaches the driver.
    """
    from ..state.prof import mark

    edges_ds = edges_ds.materialize()
    mark("canonicalize: edges materialized")
    n_edges = edges_ds.count()
    if n_edges == 0:
        return triples_ds
    if n_edges <= edge_threshold:
        tbl = _collect(edges_ds)
        mark("canonicalize: edges collected")
        uniq, min_idx = connected_components_local_arrays(tbl)
        keep = np.flatnonzero(min_idx != np.arange(len(min_idx)))
        keys_arr = uniq.take(pa.array(keep, pa.int64()))
        vals_arr = uniq.take(pa.array(min_idx[keep], pa.int64()))
        mark("canonicalize: driver CC done")
        return rewrite_triples_arrays(triples_ds, keys_arr, vals_arr)
    mapping = canonical_map_ds(edges_ds).materialize()
    if mapping.count() <= map_broadcast_max:
        canon = {}
        for b in mapping.iter_batches(batch_format="pyarrow"):
            for n_, l_ in zip(
                b["node"].to_pylist(), b["label"].to_pylist()
            ):
                canon[n_] = l_
        return rewrite_triples(triples_ds, canon)
    return rewrite_triples_join(triples_ds, mapping)
