"""Deduplication operators over a document table (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine).

The reference only ever dedups exactly and in memory
(``drop_duplicates(subset=["texts"])``, NLP/2.1 cell 15; per-result
``set()`` dedup, tools/theoremdb/extract_graph.py:55-61). These
operators are the corpus-scale generalization this engine adds by
design (SURVEY.md §2.7 D1/D6): every variant is

    per-batch vectorized sketch  ->  bucket groupby (the one shuffle)
    ->  per-bucket verify        ->  connected components -> canonical

Common output contract: ``assignments(ds) -> Dataset(id, canonical)``
with identity rows for unique documents, and ``dedup(ds)`` keeping
only canonical rows. Canonical = lexicographic min of each duplicate
component (deterministic under any parallelism).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.raypatch import apply_empty_to_pandas_patch, apply_join_patch
from ..functions.hashing import (
    band_hashes,
    flat_token_hashes_arrow,
    hamming64,
    hash_strings,
    minhash_signatures_flat,
    shingle_hashes,
    shingle_hashes_flat,
    simhash64_flat,
)

# Dataset.join schema-broadcast fix + typed-empty to_pandas fix
# (state/raypatch.py)
apply_join_patch()
apply_empty_to_pandas_patch()
from .canonicalize import connected_components_local, _collect

# --------------------------------------------------------------- exact dedup


def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    h = hash_strings(batch[col].to_numpy(zero_copy_only=False))
    return batch.append_column("text_hash", pa.array(h))


def exact_dedup(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    coarse: int = 64,
    max_partition_bytes: int | None = None,
):
    """Exact dedup: hash-partition on content hash, keep the min-id row
    per group (the reference's drop_duplicates, distributed).

    The shuffle key is ``text_hash % coarse`` — NOT the raw hash:
    grouping by the raw 64-bit hash would make one Ray group per
    unique document (scheduler overhead linear in distinct docs).
    Within a partition the exact dedup is a vectorized pandas
    drop-min; correctness is unchanged because a text's rows always
    share a coarse bucket.

    Scale: the exchange routes through ``spooled_group_map`` with
    ``fine_col="text_hash"`` — oversized coarse partitions (full text
    payload!) are re-split on a decorrelated hash of the FINE key, so
    per-reduce-task bytes stay bounded as the corpus grows instead of
    one task concat-reading 1/coarse of the whole corpus. The re-split
    preserves correctness because equal texts share the fine hash (the
    same argument documented for pairs_from_bands below), and
    first_per_text only relies on fine-key co-location."""
    from ..state.spool import MAX_PARTITION_BYTES, spooled_group_map

    if max_partition_bytes is None:
        max_partition_bytes = MAX_PARTITION_BYTES

    def add_hash(b: pa.Table) -> pa.Table:
        b = add_text_hash(b, col)
        h = b["text_hash"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "coarse", pa.array((h % np.uint64(coarse)).astype(np.int64))
        )

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text_hash", id_col], kind="mergesort")
        return g.drop_duplicates("text_hash", keep="first")

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    out = spooled_group_map(
        hashed,
        "coarse",
        first_per_text,
        batch_format="pandas",
        fine_col="text_hash",
        max_partition_bytes=max_partition_bytes,
    )
    if out.count() == 0:
        # typed empty carrying the input schema — spool's empty result
        # is schema-less, which would break downstream column selection
        # on an empty corpus (kgquery's _spooled empty_schema argument)
        import ray.data as rd

        return rd.from_arrow(ds.schema().base_schema.empty_table())
    return out.drop_columns(["text_hash", "coarse"])


# ----------------------------------------------------------- minhash-LSH


class MinHashBandEmitter:
    """Stateless-but-configured batch fn: doc rows -> LSH band rows
    carrying the verification payload (simhash + token count)."""

    def __init__(
        self,
        col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 64,
        num_bands: int = 16,
        shingle_k: int = 3,
    ) -> None:
        self.col, self.id_col = col, id_col
        self.num_perm, self.num_bands = num_perm, num_bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[self.id_col], pa.string()).to_numpy(
            zero_copy_only=False
        )
        n = batch.num_rows
        # one Arrow split + one siphash + reduceat sketches for the
        # whole batch — no per-doc Python loop
        flat, starts = flat_token_hashes_arrow(batch[self.col])
        fs, fd = shingle_hashes_flat(flat, starts, k=self.shingle_k)
        sigs = minhash_signatures_flat(fs, fd, n, self.num_perm)
        bands = band_hashes(sigs, self.num_bands)
        # verification payload = a SIGNATURE DIGEST (bit i = low bit
        # of MinHash slot i), not a shingle simhash: hamming between
        # digests estimates 0.5 x (64 - matching slots), i.e. a direct
        # Jaccard estimate that stays reliable for SHORT documents —
        # a simhash majority over a handful of shingles is noisy
        # enough that a true 0.86-Jaccard pair of ~10-token docs
        # measured hamming 13 and slipped the old <=12 verify
        # (found by the sf0.1 oracle sweep; see _verify_hamming)
        p = min(self.num_perm, 64)
        sims = np.zeros(n, dtype=np.uint64)
        for i in range(p):
            sims |= (sigs[:, i] & np.uint64(1)) << np.uint64(i)
        n_tok = np.diff(starts).astype(np.int32)
        rep = self.num_bands
        return pa.table(
            {
                "id": pa.array(np.repeat(ids, rep), pa.string()),
                "band_idx": pa.array(np.tile(np.arange(rep, dtype=np.int32), n)),
                "band_hash": pa.array(bands.reshape(-1)),
                "simhash": pa.array(np.repeat(sims, rep)),
                "n_tokens": pa.array(np.repeat(n_tok, rep)),
            }
        )


_EMPTY_PAIRS = {
    "a": pd.Series(dtype=str),
    "b": pd.Series(dtype=str),
    "sim_a": pd.Series(dtype="uint64"),
    "sim_b": pd.Series(dtype="uint64"),
}


def _pairs_from_coarse(g: pd.DataFrame, cap: int = 50) -> pd.DataFrame:
    """Pair generation inside ONE COARSE bucket (= many LSH buckets).

    Grouping by the raw (band_idx, band_hash) key would create millions
    of tiny Ray groups — pure scheduler overhead. Instead the shuffle
    key is ``band_hash % COARSE`` and the exact sub-bucketing happens
    here in pandas: filter to rows whose sub-bucket has >= 2 members
    (kills ~everything), then loop only over actual candidate buckets.
    <= cap members: all pairs; above: star edges to the min id (same
    connected components, linear cost — the hot-bucket guard)."""
    g = g.drop_duplicates(["band_idx", "band_hash", "id"])
    dup = g[g.duplicated(["band_idx", "band_hash"], keep=False)]
    if dup.empty:
        return pd.DataFrame(_EMPTY_PAIRS)
    dup = dup.sort_values(
        ["band_idx", "band_hash", "id"], kind="mergesort"
    )
    ids = dup["id"].to_numpy()
    sims = dup["simhash"].to_numpy()
    bi = dup["band_idx"].to_numpy()
    bh = dup["band_hash"].to_numpy()
    n = len(ids)
    # run boundaries of equal (band_idx, band_hash) — pure numpy;
    # iterating pandas groups costs ~0.5 ms/group and melts down at
    # millions of candidate buckets
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(bi[1:], bi[:-1], out=change[1:])
    change[1:] |= bh[1:] != bh[:-1]
    starts = np.flatnonzero(change)
    lens = np.diff(np.append(starts, n))

    out_a, out_b, out_sa, out_sb = [], [], [], []
    # len-2 runs (the overwhelming case): one vectorized emit
    two = starts[lens == 2]
    if len(two):
        out_a.append(ids[two])
        out_b.append(ids[two + 1])
        out_sa.append(sims[two])
        out_sb.append(sims[two + 1])
    # longer runs: loop only over those (rare)
    for s, ln in zip(starts[lens > 2], lens[lens > 2]):
        m = int(ln)
        if m <= cap:
            ia, ib = np.triu_indices(m, k=1)
        else:  # hot bucket -> star edges (same components, linear)
            ia = np.zeros(m - 1, dtype=np.int64)
            ib = np.arange(1, m, dtype=np.int64)
        out_a.append(ids[s + ia])
        out_b.append(ids[s + ib])
        out_sa.append(sims[s + ia])
        out_sb.append(sims[s + ib])
    if not out_a:
        return pd.DataFrame(_EMPTY_PAIRS)
    return pd.DataFrame(
        {
            "a": np.concatenate(out_a),
            "b": np.concatenate(out_b),
            "sim_a": np.concatenate(out_sa),
            "sim_b": np.concatenate(out_sb),
        }
    )


COARSE_BUCKETS = 64


def hot_band_hashes(
    band_ds,
    driver_rows_max: int = 4_000_000,
    hot_collect_max: int = 20_000_000,
    n_rows: int | None = None,
):
    """Band hashes occurring >= 2 times, as a broadcastable Arrow
    array — or None when the hot set is too large to broadcast.

    The wide pair shuffle moves (id, simhash, ...) x NUM_BANDS rows,
    but almost every band bucket is a singleton that produces no pair.
    Finding the non-singleton hashes first means the wide shuffle only
    carries rows that can actually pair — at low duplicate density
    that's orders of magnitude less data.

    Physical plan: under ``driver_rows_max`` rows, ONE driver-side
    collect + numpy sort (8 bytes/row; cheaper than any exchange at
    that size). Above the gate, a SPOOLED range exchange
    (`state/spool.py:spooled_group_map`): each block appends its
    hashes to per-range parquet spool partitions (range = top bits of
    the hash), then one task per range sorts its ~n/ranges hashes and
    emits only its duplicated values — only the (small) hot set
    reaches the driver. Measured at 44M rows: spool 4.2 s vs driver
    14.6 s at 32 CPUs, 10.1 s vs 41.2 s at 8 — the spool path wins at
    BOTH parallelism levels (the driver sort is serial) and preserves
    scaling. Above ``hot_collect_max`` hot hashes the prefilter is
    skipped entirely (returns None — the caller falls through to the
    unfiltered shuffle).

    ``n_rows`` skips the count pass when the caller already knows the
    band volume (bands are exactly NUM_BANDS rows per emitted id, so
    a pinned upstream's count times NUM_BANDS is free) — with
    pin_bands=False the count would otherwise re-run the whole minhash
    emitter once just to pick a plan. An overestimate only biases the
    driver-vs-spool gate toward the spool path, never correctness."""
    if n_rows is None:
        n_rows = band_ds.count()
    if n_rows <= driver_rows_max:
        chunks = []
        for b in band_ds.select_columns(["band_hash"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            chunks.append(
                b["band_hash"].to_numpy(zero_copy_only=False)
            )
        if not chunks:
            return pa.array([], pa.uint64())
        h = np.concatenate(chunks).astype(np.uint64, copy=False)
        h.sort()  # quicksort: stability is meaningless for raw values
        hot = (
            np.unique(h[1:][h[1:] == h[:-1]])
            if len(h) > 1
            else np.empty(0, np.uint64)
        )
        if len(hot) > hot_collect_max:
            return None
        return pa.array(hot, pa.uint64())

    # ranges sized so each task sorts a few million hashes; power of
    # two so the range id is a bit shift
    from ..state.spool import spooled_group_map

    ranges = 64
    while ranges < 4096 and n_rows // ranges > 4_000_000:
        ranges *= 2
    shift = np.uint64(64 - int(np.log2(ranges)))

    def add_range(b: pa.Table) -> pa.Table:
        h = b["band_hash"].to_numpy(zero_copy_only=False).astype(
            np.uint64, copy=False
        )
        return pa.table(
            {
                "band_hash": pa.array(h),
                "range_id": pa.array((h >> shift).astype(np.int64)),
            }
        )

    def find_hot(g: pa.Table) -> pa.Table:
        h = g["band_hash"].to_numpy(zero_copy_only=False).astype(
            np.uint64, copy=False
        )
        h = np.sort(h)
        hot = (
            np.unique(h[1:][h[1:] == h[:-1]])
            if len(h) > 1
            else np.empty(0, np.uint64)
        )
        return pa.table({"blob": pa.array([hot.tobytes()], pa.binary())})

    hot_parts = spooled_group_map(
        band_ds.select_columns(["band_hash"]).map_batches(
            add_range, batch_format="pyarrow", batch_size=None
        ),
        "range_id",
        find_hot,
        # find_hot only needs equal hashes co-located, so oversized
        # ranges may be re-split on the hash itself (adaptive fan-out)
        fine_col="band_hash",
    )
    chunks = [
        np.frombuffer(m, dtype=np.uint64)
        for b in hot_parts.iter_batches(batch_format="pyarrow")
        for m in b["blob"].to_pylist()
    ]
    if sum(len(c) for c in chunks) > hot_collect_max:
        return None
    if not chunks:
        return pa.array([], pa.uint64())
    hot = np.concatenate(chunks)
    hot.sort()  # groups arrive unordered; keep deterministic output
    return pa.array(hot, pa.uint64())


def pairs_from_bands(
    band_ds,
    cap: int = 50,
    coarse: int = COARSE_BUCKETS,
    prefilter: bool = True,
    pin_bands: bool = True,
    n_rows_hint: int | None = None,
):
    """LSH band rows -> candidate pair rows via ONE coarse-keyed
    exchange (see :func:`_pairs_from_coarse`), preceded (by default) by
    the :func:`hot_band_hashes` singleton-bucket prefilter so the
    exchange only moves rows that can actually pair. The exchange is
    the disk spool (`state/spool.py`) — measured 29 s vs 143 s for
    Ray's sort-based groupby on a 6M-row survivor set."""
    import ray
    import ray.data as rd

    from ..state.spool import spooled_group_map

    from ..state.prof import mark

    if prefilter:
        # Bands are consumed twice (hot pass + pair pass). pin_bands
        # trades plasma for recompute: True pins them (right when the
        # emitter is expensive, e.g. minhash over full document text);
        # False re-executes the band emitter per pass (right when bands
        # derive from an ALREADY-PINNED upstream — the flagship's
        # entity-name bands are ~11 rows/result and materializing them
        # was a 10.7GB plasma pin at 2.2M docs, while re-running the
        # vectorized emitter costs seconds).
        if pin_bands:
            band_ds = band_ds.materialize()
            mark("pairs_from_bands: bands materialized")
            n_rows_hint = None  # pinned: count() is metadata, free
        hot = hot_band_hashes(band_ds, n_rows=n_rows_hint)
        mark("pairs_from_bands: hot prefilter built")
        if hot is not None and len(hot) == 0:
            return rd.from_pandas(pd.DataFrame(_EMPTY_PAIRS))
        if hot is not None:
            # sorted-uint64 membership via searchsorted: pc.is_in
            # rebuilds its hash set from the (multi-million-entry)
            # value_set on EVERY call — measured 64 s vs 4 s over 44M
            # band rows
            hot_np = hot.to_numpy(zero_copy_only=False).astype(
                np.uint64, copy=False
            )
            hot_ref = ray.put(hot_np)

            def keep_hot(b: pa.Table) -> pa.Table:
                from ..state.broadcast import get_broadcast

                hs = get_broadcast(hot_ref)
                h = b["band_hash"].to_numpy(
                    zero_copy_only=False
                ).astype(np.uint64, copy=False)
                if len(hs) == 0 or len(h) == 0:
                    return b.slice(0, 0)
                idx = np.searchsorted(hs, h)
                idx[idx >= len(hs)] = len(hs) - 1
                return b.filter(pa.array(hs[idx] == h))

            band_ds = band_ds.map_batches(
                keep_hot, batch_format="pyarrow", batch_size=None
            )

    def add_coarse(b: pa.Table) -> pa.Table:
        h = b["band_hash"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "coarse", pa.array((h % np.uint64(coarse)).astype(np.int64))
        )

    out = spooled_group_map(
        band_ds.map_batches(
            add_coarse, batch_format="pyarrow", batch_size=None
        ),
        "coarse",
        lambda g: _pairs_from_coarse(g, cap),
        batch_format="pandas",
        # _pairs_from_coarse sub-buckets by (band_idx, band_hash)
        # anyway, so a coarse bucket that outgrows one task's heap is
        # re-split on band_hash — fan-out grows with survivor volume
        fine_col="band_hash",
    )
    mark("pairs_from_bands: spooled pair-gen done")
    return out


def _verify_hamming(b: pa.Table, max_ham: int) -> pa.Table:
    if b.num_rows == 0:
        return pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
        )
    ham = hamming64(
        b["sim_a"].to_numpy(zero_copy_only=False),
        b["sim_b"].to_numpy(zero_copy_only=False),
    )
    keep = pa.array(ham <= max_ham)
    return pa.table({"a": b["a"].filter(keep), "b": b["b"].filter(keep)})


def minhash_dup_edges(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 16,
    num_perm: int = 64,
    num_bands: int = 16,
):
    """Candidate pairs from MinHash-LSH banding, verified by the
    signature-digest hamming: digest bits are the low bits of the 64
    signature slots, so E[hamming] = 0.5 x (#differing slots) and the
    default 16 accepts estimated Jaccard >= ~0.5 (32 differing
    slots) — the oracle's threshold, with the bimodal dup landscape
    providing the margin (non-dup band collisions sit at ~32 +- 4)."""
    bands = ds.map_batches(
        MinHashBandEmitter(col, id_col, num_perm, num_bands),
        batch_format="pyarrow",
        batch_size=2048,
    )
    pairs = pairs_from_bands(bands)
    return pairs.map_batches(
        lambda b: _verify_hamming(b, max_hamming), batch_format="pyarrow"
    )


def dup_assignments(
    edges_ds, distributed_threshold: int = 5_000_000
) -> dict[str, str]:
    """Edge Dataset -> {id: canonical_id} (identity entries omitted).

    Same scale gate as ``canonicalize.canonical_map``: a small edge set
    is union-found on the driver; above the threshold the components
    come from distributed min-label propagation and only the (far
    smaller) non-identity mapping is collected. For a mapping too big
    even for that, use :func:`dup_assignments_ds` + a distributed
    anti-join (:func:`dedup_by_edges`)."""
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return {}
    if n_edges <= distributed_threshold:
        tbl = _collect(edges_ds)
        return {
            k: v
            for k, v in connected_components_local(tbl).items()
            if k != v
        }
    out: dict[str, str] = {}
    for b in dup_assignments_ds(edges_ds).iter_batches(
        batch_format="pyarrow"
    ):
        for n_, l_ in zip(b["node"].to_pylist(), b["label"].to_pylist()):
            out[n_] = l_
    return out


def dup_assignments_ds(edges_ds):
    """Edge Dataset -> mapping Dataset (node, label), non-identity rows
    only; fully distributed (nothing edge- or corpus-sized reaches the
    driver)."""
    from .canonicalize import canonical_map_ds

    return canonical_map_ds(edges_ds)


def minhash_dedup(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    distributed_threshold: int = 5_000_000,
    **kw,
):
    """Keep one representative (min id) per near-duplicate component."""
    import ray

    from ..state.broadcast import get_broadcast

    canon = dup_assignments(
        minhash_dup_edges(ds, col, id_col, **kw),
        distributed_threshold=distributed_threshold,
    )
    dup_ref = ray.put(pa.array(sorted(canon.keys()), pa.string()))

    def drop(b: pa.Table) -> pa.Table:
        dups = get_broadcast(dup_ref)
        ids = pc.cast(b[id_col], pa.string())
        keep = pc.invert(pc.is_in(ids, value_set=dups))
        return b.filter(keep)

    return ds.map_batches(drop, batch_format="pyarrow")


def dedup_by_edges(ds, edges_ds, id_col: str = "doc_id"):
    """Distributed end-to-end dedup: drop every non-canonical id via a
    partitioned ANTI-join against the mapping Dataset — the path for a
    duplicate set too large to broadcast (nothing reaches the driver)."""
    import ray

    mapping = dup_assignments_ds(edges_ds).materialize()
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    n_parts = max(2, min(16, ncpu // 2))

    def cast_id(b: pa.Table) -> pa.Table:
        idx = b.column_names.index(id_col)
        return b.set_column(idx, id_col, pc.cast(b[id_col], pa.string()))

    return ds.map_batches(cast_id, batch_format="pyarrow").join(
        mapping.select_columns(["node"]),
        join_type="left_anti",
        num_partitions=n_parts,
        on=(id_col,),
        right_on=("node",),
    )


# --------------------------------------------------------------- simhash


class SimHashEmitter:
    """doc rows -> (id, simhash, 8x8-bit band keys) rows.

    Near-identical docs (hamming <= 7 over 64 bits) share at least one
    exact 8-bit band (pigeonhole) -> bucket groupby finds ALL such
    candidates. Tradeoff vs MinHash-LSH: 8-bit keys collide at ~1/256
    per band for unrelated docs, so buckets grow linearly with corpus
    size — the star-edge cap + hamming verify keep that linear, but at
    web scale prefer :func:`minhash_dup_edges` (this variant is the
    cheap near-IDENTICAL detector, Manku-style)."""

    def __init__(self, col: str = "text", id_col: str = "doc_id") -> None:
        self.col, self.id_col = col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[self.id_col], pa.string()).to_numpy(
            zero_copy_only=False
        )
        n = batch.num_rows
        flat, starts = flat_token_hashes_arrow(batch[self.col])
        fs, fd = shingle_hashes_flat(flat, starts, k=3)
        sstarts = np.zeros(n + 1, np.int64)
        sstarts[1:] = np.cumsum(np.bincount(fd, minlength=n))
        sims = simhash64_flat(fs, sstarts)
        bands = np.stack(
            [(sims >> np.uint64(8 * i)) & np.uint64(0xFF) for i in range(8)],
            axis=1,
        )
        return pa.table(
            {
                "id": pa.array(np.repeat(ids, 8), pa.string()),
                "band_idx": pa.array(np.tile(np.arange(8, dtype=np.int32), n)),
                "band_hash": pa.array(bands.reshape(-1)),
                "simhash": pa.array(np.repeat(sims, 8)),
                "n_tokens": pa.array(
                    np.repeat(np.diff(starts).astype(np.int32), 8)
                ),
            }
        )


def simhash_dup_edges(
    ds, col: str = "text", id_col: str = "doc_id", max_hamming: int = 6
):
    bands = ds.map_batches(
        SimHashEmitter(col, id_col), batch_format="pyarrow", batch_size=2048
    )
    pairs = pairs_from_bands(bands)
    return pairs.map_batches(
        lambda b: _verify_hamming(b, max_hamming), batch_format="pyarrow"
    )


# --------------------------------------------------- n-gram Jaccard verify


class NgramSetStore:
    """Recompute char-n-gram sets for candidate verification."""

    @staticmethod
    def ngrams(text: str, n: int = 5) -> np.ndarray:
        if len(text) < n:
            return hash_strings([text]) if text else np.empty(0, np.uint64)
        grams = [text[i : i + n] for i in range(len(text) - n + 1)]
        return np.unique(hash_strings(grams))


class JaccardVerifier:
    """Actor-pool callable: candidate pair rows -> verified edges.

    The id -> n-gram-set map (bounded: only ids that appear in some
    candidate pair) is broadcast as THREE flat numpy arrays — sorted
    id-hash keys, CSR offsets, flattened gram hashes — NOT a Python
    dict: the arrays are a zero-copy plasma read per actor (the same
    sorted-array pattern as the links broadcast, stages/emit.py), where
    a dict would cost O(|map|) deserialization in every worker. Lookup
    is one vectorized searchsorted per batch; per pair the intersection
    is a C-level ``np.intersect1d`` over CSR slices (the pair loop is
    candidate-bounded — post-LSH — so it never sees the corpus)."""

    def __init__(self, gmap_ref, threshold: float) -> None:
        import ray

        self.keys, self.offsets, self.flat = ray.get(gmap_ref)
        self.threshold = threshold

    def _lookup(self, ids: np.ndarray) -> np.ndarray:
        """id strings -> CSR row index, -1 when absent."""
        qk = hash_strings(ids)
        idx = np.searchsorted(self.keys, qk)
        idx[idx >= len(self.keys)] = max(len(self.keys) - 1, 0)
        found = (
            self.keys[idx] == qk
            if len(self.keys)
            else np.zeros(len(ids), dtype=bool)
        )
        return np.where(found, idx, -1)

    def __call__(self, b: pa.Table) -> pa.Table:
        a_in = b["a"].to_numpy(zero_copy_only=False)
        b_in = b["b"].to_numpy(zero_copy_only=False)
        if len(a_in) == 0 or len(self.keys) == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        ia = self._lookup(a_in)
        ib = self._lookup(b_in)
        offs, flat = self.offsets, self.flat
        a_out, b_out, j_out = [], [], []
        for k in np.flatnonzero((ia >= 0) & (ib >= 0)):
            ga = flat[offs[ia[k]] : offs[ia[k] + 1]]
            gb = flat[offs[ib[k]] : offs[ib[k] + 1]]
            if len(ga) == 0 or len(gb) == 0:
                continue
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            union = len(ga) + len(gb) - inter
            j = inter / union if union else 0.0
            if j >= self.threshold:
                a_out.append(a_in[k])
                b_out.append(b_in[k])
                j_out.append(j)
        return pa.table(
            {
                "a": pa.array(a_out, pa.string()),
                "b": pa.array(b_out, pa.string()),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )


def ngram_jaccard_edges(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n: int = 5,
):
    """Candidates from MinHash-LSH; verification = EXACT char-n-gram
    Jaccard (the precise-but-costlier cousin of the hamming verify).

    DISTRIBUTED end-to-end: the pair stream stays a Dataset (deduped
    across bands by one coarse-keyed shuffle, verified in
    ``map_batches``); the only driver-sized objects are the DISTINCT
    candidate-id set and the id -> n-gram-set map built from it — both
    bounded by the number of near-duplicate docs, not by the corpus or
    the pair count. Returns a Dataset (a, b, jaccard).
    """
    import ray

    from .canonicalize import dedup_pairs

    cand = dedup_pairs(
        minhash_dup_edges(ds, col, id_col, max_hamming=64)  # no pre-filter
    ).materialize()
    need_ids = np.array(
        sorted(set(cand.unique("a")) | set(cand.unique("b"))), dtype=object
    )
    if len(need_ids) == 0:
        return cand.map_batches(
            lambda b: pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "jaccard": pa.array([], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
    # membership broadcast = a SORTED uint64 hash array, not a Python
    # set: zero-copy plasma read per actor, vectorized searchsorted
    # probe per batch (hash collisions only over-include — an extra
    # gram set is computed, never a wrong verdict key: the verifier
    # keys on the same hash)
    need_ref = ray.put(np.sort(hash_strings(need_ids)))

    class GramEmitter:
        def __init__(self, ref) -> None:
            self.need: np.ndarray = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = pc.cast(b[id_col], pa.string()).to_numpy(
                zero_copy_only=False
            )
            if len(ids) == 0:
                return pa.table(
                    {
                        "id": pa.array([], pa.string()),
                        "grams": pa.array([], pa.list_(pa.uint64())),
                    }
                )
            qk = hash_strings(ids)
            idx = np.searchsorted(self.need, qk)
            idx[idx >= len(self.need)] = max(len(self.need) - 1, 0)
            keep = np.flatnonzero(self.need[idx] == qk)
            texts = b[col].to_numpy(zero_copy_only=False)
            out_id = [ids[i] for i in keep]
            out_g = [NgramSetStore.ngrams(texts[i], n) for i in keep]
            return pa.table(
                {
                    "id": pa.array(out_id, pa.string()),
                    "grams": pa.array(
                        [g.tolist() for g in out_g], pa.list_(pa.uint64())
                    ),
                }
            )

    # gram map: computed distributed, collected bounded (|need| rows),
    # broadcast as (sorted id-hash keys, CSR offsets, flat gram hashes)
    grams_tbl = _collect(
        ds.map_batches(
            GramEmitter,
            fn_constructor_args=(need_ref,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )
    gkeys = hash_strings(
        grams_tbl["id"].to_numpy(zero_copy_only=False)
    )
    order = np.argsort(gkeys, kind="stable")
    gkeys = gkeys[order]
    lists = grams_tbl["grams"].to_pylist()
    lens = np.array([len(lists[i]) for i in order], dtype=np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = (
        np.concatenate(
            [np.asarray(lists[i], dtype=np.uint64) for i in order]
        )
        if lens.sum()
        else np.empty(0, np.uint64)
    )
    gmap_ref = ray.put((gkeys, offsets, flat))
    return cand.map_batches(
        JaccardVerifier,
        fn_constructor_args=(gmap_ref, threshold),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
    )


# ------------------------------------------------------- embedding cosine


class SRPBandEmitter:
    """Signed-random-projection LSH for embedding vectors: 64 sign bits
    -> 4x16-bit bands; cosine-similar vectors collide whp."""

    def __init__(self, dim: int, id_col: str = "vec_id", col: str = "embedding") -> None:
        rng = np.random.RandomState(0xBEEF)
        self.R = rng.standard_normal((dim, 64)).astype(np.float32)
        self.id_col, self.col = id_col, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[self.id_col], pa.string()).to_numpy(
            zero_copy_only=False
        )
        emb = np.stack(
            [np.asarray(v, dtype=np.float32) for v in batch[self.col].to_pylist()]
        )
        proj = emb @ self.R  # (n, 64)
        bits = (proj > 0).astype(np.uint8)
        sig = np.packbits(bits, axis=1).view(np.uint64).reshape(-1)
        n = len(ids)
        bands = np.stack(
            [(sig >> np.uint64(16 * i)) & np.uint64(0xFFFF) for i in range(4)],
            axis=1,
        )
        return pa.table(
            {
                "id": pa.array(np.repeat(ids, 4), pa.string()),
                "band_idx": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_hash": pa.array(bands.reshape(-1)),
                "simhash": pa.array(np.repeat(sig, 4)),
                "n_tokens": pa.array(np.zeros(4 * n, dtype=np.int32)),
            }
        )


def embedding_dup_edges(
    ds,
    dim: int,
    id_col: str = "vec_id",
    col: str = "embedding",
    max_hamming: int = 6,
):
    """Near-duplicate vectors by SRP-simhash hamming (cos >= ~0.96)."""
    bands = ds.map_batches(
        SRPBandEmitter(dim, id_col, col),
        batch_format="pyarrow",
        batch_size=2048,
    )
    pairs = pairs_from_bands(bands)
    return pairs.map_batches(
        lambda b: _verify_hamming(b, max_hamming), batch_format="pyarrow"
    )


# ------------------------------------------------ exact substring dedup


def substring_dup_counts(
    ds,
    k: int = 8,
    id_col: str = "doc_id",
    col: str = "text",
    coarse: int = 64,
):
    """Corpus-wide EXACT substring duplication (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" signal,
    re-expressed shuffle-friendly): for every document, count its
    distinct whitespace-token k-gram windows that also occur in at
    least one OTHER document.

    Unlike :mod:`decontaminate` (broadcast membership against a small
    benchmark set) this is a corpus SELF-join, so it must shuffle:

    1. per batch: one Arrow split + siphash + rolling k-gram hash for
       the whole batch (``shingle_hashes_flat``), then per-doc
       distinct via ONE lexsort run-dedup — (gram, doc_id) pair rows;
    2. exchange on ``gram %% coarse`` (a gram's rows always co-locate,
       so per-gram distinct-doc counts are exact within a group; 64
       coarse keys, never per-gram Ray groups);
    3. inside each coarse group: lexsort by gram, run-length = its
       distinct-doc count (pairs are globally distinct since a doc is
       one row), keep grams in >= 2 docs, emit per-doc partial counts;
    4. tiny final ``groupby(doc_id).sum``.

    Docs shorter than k tokens contribute one gram of all their
    tokens; empty docs none (``shingle_hashes_flat`` rules, mirrored
    by the SQL oracle). Gram identity is the 64-bit rolling hash —
    collisions are negligible at corpus scale (same argument as
    decontaminate.py). At 100 TB step 2 is the one all-to-all; it
    rides the same coarse-key pattern as the LSH pair generation
    (state/spool.py is the drop-in if Ray's sort-shuffle becomes the
    bottleneck)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def emit_pairs(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.string()).to_numpy(zero_copy_only=False)
        flat, starts = flat_token_hashes_arrow(b[col])
        grams, gdoc = shingle_hashes_flat(flat, starts, k=k)
        if len(grams) == 0:
            return pa.table(
                {
                    "gram": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.string()),
                    "coarse": pa.array([], pa.int64()),
                }
            )
        # per-doc distinct grams: one lexsort + run dedup
        order = np.lexsort((grams, gdoc))
        g, d = grams[order], gdoc[order]
        first = np.ones(len(g), dtype=bool)
        first[1:] = (g[1:] != g[:-1]) | (d[1:] != d[:-1])
        g, d = g[first], d[first]
        return pa.table(
            {
                "gram": pa.array(g, pa.uint64()),
                "doc_id": pa.array(ids[d], pa.string()),
                "coarse": pa.array(
                    (g % np.uint64(coarse)).astype(np.int64)
                ),
            }
        )

    pairs = ds.map_batches(emit_pairs, batch_format="pyarrow")

    def per_group(b: pa.Table) -> pa.Table:
        g = b["gram"].to_numpy(zero_copy_only=False)
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g, d = g[order], d[order]
        runs = np.ones(len(g), dtype=bool)
        runs[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(runs)
        lens = np.diff(np.append(starts, len(g)))
        shared = lens >= 2  # gram occurs in >= 2 distinct docs
        keep = np.repeat(shared, lens)
        if not keep.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        docs, counts = np.unique(d[keep], return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    partial = pairs.groupby("coarse").map_groups(
        per_group, batch_format="pyarrow"
    )
    return partial.groupby("doc_id").aggregate(
        Sum("n", alias_name="shared_grams")
    )


# ------------------------------------------- exact word-n-gram dedup


def _ngram_size_partial(t: pa.Table) -> pa.Table:
    """Per-batch fold of the spool's per-doc gram-size contribution
    rows (b IS NULL) into (hash(a), sum w) partials — output bounded
    by the batch's distinct docs, so the driver-side final fold pulls
    doc-bounded partials, never (doc, gram) rows."""
    from ..functions.hashing import hash_strings

    t = t.filter(pc.is_null(t["b"]))
    if len(t) == 0:
        return pa.table(
            {
                "ah": pa.array([], pa.uint64()),
                "w": pa.array([], pa.int64()),
            }
        )
    h = hash_strings(t["a"].to_numpy(zero_copy_only=False))
    w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    u, inv = np.unique(h, return_inverse=True)
    return pa.table(
        {
            "ah": pa.array(u, pa.uint64()),
            "w": pa.array(
                np.bincount(inv, weights=w).astype(np.int64), pa.int64()
            ),
        }
    )


def exact_ngram_dup_edges(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
    df_cap: int = 64,
    coarse: int = 64,
):
    """EXACT near-duplicate edges by word-n-gram Jaccard — the
    deterministic sibling of the MinHash path (recall 1 by
    construction: any pair with J > 0 shares a gram, so it surfaces in
    that gram's group). Semantics are "discriminative-gram Jaccard":
    grams occurring in more than ``df_cap`` documents are excluded
    from BOTH the intersection and the set sizes — that keeps a stop
    phrase from generating df^2 candidate pairs at corpus scale while
    staying a well-defined, SQL-expressible contract (the oracle
    applies the same df filter).

    Physical plan (no all-pairs): distinct gram hashes per doc ->
    ONE coarse-keyed spool exchange on the gram hash (adaptive
    fan-out via fine_col) where each gram run emits per-doc size
    contributions (df <= cap) and per-pair co-occurrence rows
    (2 <= df <= cap) -> two small groupby-sums -> distributed joins
    pair<->sizes -> Jaccard filter. Returns Dataset (a, b, jaccard).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..state.spool import spooled_group_map

    def gram_rows(b: pa.Table) -> pa.Table:
        # fully vectorized: ONE Arrow whitespace split + ONE siphash
        # for the batch, n-gram hashes via the flat shingle kernel
        # (equal token sequences -> equal hashes, which is all the
        # df/Jaccard semantics use), then per-doc unique by lexsort.
        # Docs shorter than n tokens emit nothing (matching the SQL
        # twin), so the short-doc fallback path is filtered out first.
        from ..functions.hashing import (
            flat_token_hashes_arrow,
            shingle_hashes_flat,
        )

        ids = pc.cast(b[id_col], pa.string())
        th, starts = flat_token_hashes_arrow(b[col])
        lengths = np.diff(starts)
        keep = lengths >= n
        doc_idx = np.flatnonzero(keep)
        empty = pa.table(
            {
                "gram": pa.array([], pa.uint64()),
                "id": pa.array([], pa.string()),
                "ck": pa.array([], pa.int64()),
            }
        )
        if len(doc_idx) == 0:
            return empty
        th2 = th[np.repeat(keep, lengths)]
        st2 = np.zeros(len(doc_idx) + 1, np.int64)
        st2[1:] = np.cumsum(lengths[keep])
        sh, sd = shingle_hashes_flat(th2, st2, k=n)
        if len(sh) == 0:
            return empty
        order = np.lexsort((sh, sd))
        sh, sd = sh[order], sd[order]
        uniq = np.ones(len(sh), dtype=bool)
        uniq[1:] = (sh[1:] != sh[:-1]) | (sd[1:] != sd[:-1])
        g = sh[uniq]
        with np.errstate(over="ignore"):
            ck = (
                (g * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
            ).astype(np.int64) % coarse
        return pa.table(
            {
                "gram": pa.array(g),
                "id": ids.take(pa.array(doc_idx[sd[uniq]])),
                "ck": pa.array(ck),
            }
        )

    def per_gram_group(b: pa.Table) -> pa.Table:
        g = b["gram"].to_numpy(zero_copy_only=False)
        ids = b["id"].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g, ids = g[order], ids[order]
        change = np.ones(len(g), dtype=bool)
        change[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(g)))
        ok = lens <= df_cap
        # size contributions: every (doc, gram) row of a df<=cap gram
        size_ids = ids[np.repeat(ok, lens)]
        a_out, b_out = [], []
        for s, ln in zip(starts[ok & (lens >= 2)], lens[ok & (lens >= 2)]):
            members = np.sort(ids[s : s + ln])
            ia, ib = np.triu_indices(int(ln), k=1)
            a_out.append(members[ia])
            b_out.append(members[ib])
        sid, scnt = (
            np.unique(size_ids, return_counts=True)
            if len(size_ids)
            else (np.empty(0, object), np.empty(0, np.int64))
        )
        if a_out:
            cnt = (
                pd.DataFrame(
                    {"a": np.concatenate(a_out), "b": np.concatenate(b_out)}
                )
                .groupby(["a", "b"], sort=False)
                .size()
                .reset_index(name="w")
            )
            p_a = cnt["a"].to_numpy()
            p_b = cnt["b"].to_numpy()
            p_w = cnt["w"].to_numpy().astype(np.int64)
        else:
            p_a = p_b = np.empty(0, object)
            p_w = np.empty(0, np.int64)
        return pa.table(
            {
                "a": pa.array(
                    np.concatenate([sid.astype(object), p_a.astype(object)]),
                    pa.string(),
                ),
                "b": pa.array(
                    [None] * len(sid) + list(p_b.astype(object)), pa.string()
                ),
                "w": pa.array(
                    np.concatenate([scnt, p_w]).astype(np.int64)
                ),
            }
        )

    rows = spooled_group_map(
        ds.map_batches(gram_rows, batch_format="pyarrow"),
        "ck",
        per_gram_group,
        fine_col="gram",
    )
    # rows is already materialized (spooled_group_map pins its result),
    # so the consumers below never recompute the exchange.
    #
    # Finish plan is size-adaptive. The per-doc gram-size table is
    # doc-bounded; when its per-batch partials fold small enough to
    # broadcast (sorted id-hash + count arrays, never a Python dict),
    # the Jaccard finish needs ONE pair-bucketed exchange and zero
    # joins — measured 10.3 s -> ~2 s at sf0.1 vs the general plan
    # (two string-keyed groupbys + two distributed hash joins), which
    # remains the fallback when the doc table outgrows the budget.
    from ..functions.hashing import hash_strings

    size_parts = rows.map_batches(
        lambda t: _ngram_size_partial(t), batch_format="pyarrow"
    ).to_pandas()
    # driver fold of per-batch partials: bounded by docs-with-grams
    sh = size_parts["ah"].to_numpy(np.uint64)
    sw = size_parts["w"].to_numpy(np.int64)
    uh, inv = np.unique(sh, return_inverse=True)
    un = np.bincount(inv, weights=sw).astype(np.int64)

    SIZE_BROADCAST_BUDGET = 48 << 20  # bytes of (hash, count) arrays
    if uh.nbytes + un.nbytes <= SIZE_BROADCAST_BUDGET:
        import ray

        from ..state.broadcast import get_broadcast

        ref = ray.put((uh, un))

        def add_pk(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["b"]))
            ha = hash_strings(t["a"].to_numpy(zero_copy_only=False))
            hb = hash_strings(t["b"].to_numpy(zero_copy_only=False))
            pk = ((ha * np.uint64(0x9E3779B97F4A7C15)) ^ hb) % np.uint64(
                coarse
            )
            return t.append_column(
                "pk", pa.array(pk.astype(np.int64), pa.int64())
            )

        def pair_finish(g: pd.DataFrame) -> pd.DataFrame:
            uh_, un_ = get_broadcast(ref)  # process-cached fetch
            c = (
                g.groupby(["a", "b"], sort=False)["w"].sum().reset_index()
            )
            ha = hash_strings(c["a"].to_numpy())
            hb = hash_strings(c["b"].to_numpy())
            na = un_[np.searchsorted(uh_, ha)].astype(np.float64)
            nb = un_[np.searchsorted(uh_, hb)].astype(np.float64)
            it = c["w"].to_numpy(np.int64).astype(np.float64)
            j = it / (na + nb - it)
            keep = j >= threshold
            return pd.DataFrame(
                {
                    "a": c["a"].to_numpy()[keep],
                    "b": c["b"].to_numpy()[keep],
                    "jaccard": j[keep],
                }
            )

        pairs_ds = rows.map_batches(
            add_pk, batch_format="pyarrow"
        ).materialize()
        if pairs_ds.count() == 0:
            return rd.from_arrow(
                pa.table(
                    {
                        "a": pa.array([], pa.string()),
                        "b": pa.array([], pa.string()),
                        "jaccard": pa.array([], pa.float64()),
                    }
                )
            )
        return pairs_ds.groupby("pk").map_groups(
            pair_finish, batch_format="pandas"
        )

    sizes = (
        rows.map_batches(
            lambda t: t.filter(pc.is_null(t["b"])).drop_columns(["b"]),
            batch_format="pyarrow",
        )
        .groupby("a")
        .aggregate(Sum("w", alias_name="n_grams"))
    )
    inter = (
        rows.map_batches(
            lambda t: t.filter(pc.is_valid(t["b"])),
            batch_format="pyarrow",
        )
        .groupby(["a", "b"])
        .aggregate(Sum("w", alias_name="inter"))
        .materialize()
    )
    if inter.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    from .joins import hash_join

    sa = sizes.map_batches(
        lambda t: t.rename_columns(["a", "na"]), batch_format="pyarrow"
    )
    sb = sizes.map_batches(
        lambda t: t.rename_columns(["b", "nb"]), batch_format="pyarrow"
    )
    joined = hash_join(hash_join(inter, sa, on=["a"]), sb, on=["b"])

    def score(t: pa.Table) -> pa.Table:
        it = t["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = it / (na + nb - it)
        keep = j >= threshold
        return pa.table(
            {
                "a": t["a"].filter(pa.array(keep)),
                "b": t["b"].filter(pa.array(keep)),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def ngram_dedup(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
    df_cap: int = 64,
):
    """Keep one representative (lexicographic min id) per exact
    word-n-gram-Jaccard component (see :func:`exact_ngram_dup_edges`).
    Deterministic — unlike the MinHash/SimHash paths there is no
    probabilistic recall term, so the result has an exact SQL twin."""
    import ray

    from ..state.broadcast import get_broadcast

    canon = dup_assignments(
        exact_ngram_dup_edges(ds, col, id_col, n, threshold, df_cap)
    )
    dup_ref = ray.put(pa.array(sorted(canon.keys()), pa.string()))

    def drop(b: pa.Table) -> pa.Table:
        dups = get_broadcast(dup_ref)
        ids = pc.cast(b[id_col], pa.string())
        keep = pc.invert(pc.is_in(ids, value_set=dups))
        return b.filter(keep)

    return ds.map_batches(drop, batch_format="pyarrow")


def novelty(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    coarse: int = 64,
):
    """Per-document n-gram novelty score: the fraction of a doc's
    DISTINCT word-n-grams that occur in NO other document
    (corpus document-frequency exactly 1). High novelty = original
    content; low novelty = boilerplate / near-copy — the memorization
    screen of the curation family (the complement of
    :func:`exact_ngram_dup_edges`'s overlap view, reusing its gram
    kernel). Docs shorter than ``n`` tokens contribute their whole
    token sequence as one gram (the ``shingle_hashes_flat`` rule);
    empty docs emit no row.

    Physical plan: distinct (gram-hash, doc) rows per batch -> ONE
    coarse-keyed spool exchange on the gram hash (adaptive fan-out)
    where each gram run is flagged df==1 -> one doc-keyed groupby
    folding (n_grams, n_unique). No join, no all-pairs, nothing on
    the driver. Returns (doc_id, n_grams, n_unique, novelty).
    """
    from ray.data.aggregate import Count, Sum

    from ..state.spool import spooled_group_map

    def gram_rows(b: pa.Table) -> pa.Table:
        from ..functions.hashing import (
            flat_token_hashes_arrow,
            shingle_hashes_flat,
        )

        th, starts = flat_token_hashes_arrow(b[col])
        sh, sd = shingle_hashes_flat(th, starts, k=n)
        if len(sh) == 0:
            return pa.table(
                {
                    "gram": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.int64()),
                    "ck": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((sh, sd))
        sh, sd = sh[order], sd[order]
        uniq = np.ones(len(sh), dtype=bool)
        uniq[1:] = (sh[1:] != sh[:-1]) | (sd[1:] != sd[:-1])
        g = sh[uniq]
        docs = (
            b[id_col]
            .take(pa.array(sd[uniq]))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        with np.errstate(over="ignore"):
            ck = (
                (g * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
            ).astype(np.int64) % coarse
        return pa.table(
            {
                "gram": pa.array(g),
                "doc_id": pa.array(docs),
                "ck": pa.array(ck),
            }
        )

    def per_gram_group(b: pa.Table) -> pa.Table:
        g = b["gram"].to_numpy(zero_copy_only=False)
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        g, d = g[order], d[order]
        change = np.ones(len(g), dtype=bool)
        change[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(g)))
        uniq = np.repeat(lens == 1, lens)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "uniq": pa.array(uniq.astype(np.int64)),
            }
        )

    per_doc = (
        spooled_group_map(
            ds.map_batches(gram_rows, batch_format="pyarrow"),
            "ck",
            per_gram_group,
            fine_col="gram",
        )
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n_grams"),
            Sum("uniq", alias_name="n_unique"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        ng = b["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        nu = b["n_unique"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_grams": pa.array(ng),
                "n_unique": pa.array(nu),
                "novelty": pa.array(nu / ng, pa.float64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")
