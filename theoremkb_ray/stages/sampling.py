"""Sampling operators (SURVEY.md §2.6 O5-O8).

All sampling here is HASH-DETERMINISTIC: membership depends only on
the row's key and the seed, never on partitioning, block order, or
cluster size — the property the reference gets for free from
single-process sklearn ``train_test_split`` (reference:
Styling/src/cli.py:74-82) and that a distributed engine must provide
explicitly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash_strings, key_rank64, splitmix64


def _key_hash(batch: pa.Table, key_col: str, seed: int) -> np.ndarray:
    # integer keys take the SQL-reproducible splitmix64 chain (the
    # DuckDB oracle twin recomputes it), strings the siphash path
    return key_rank64(
        batch[key_col].to_numpy(zero_copy_only=False), seed=seed
    )


def train_test_split(
    ds, key_col: str, test_fraction: float = 0.2, seed: int = 0
):
    """(train_ds, test_ds) split by key hash (O5 analog).

    Rows with the same key always land on the same side (no leakage
    between splits for grouped data)."""
    thresh = np.uint64(int(test_fraction * 2**64))

    def part(is_test: bool):
        def fn(b: pa.Table) -> pa.Table:
            h = _key_hash(b, key_col, seed)
            mask = h < thresh
            return b.filter(pa.array(mask if is_test else ~mask))

        return fn

    train = ds.map_batches(part(False), batch_format="pyarrow")
    test = ds.map_batches(part(True), batch_format="pyarrow")
    return train, test


def _stratified_prune_batch(
    b: pa.Table,
    group_col: str,
    key_col: str,
    n_per_group: int,
    seed: int,
) -> pa.Table:
    """Per-batch partial for :func:`stratified_sample`: keep the
    ``n_per_group`` smallest ``key_rank64`` ranks per group within
    this batch — the exchange then moves at most ``blocks x groups x
    n_per_group`` rows. Module-level so tests can assert the bound
    directly."""
    if b.num_rows == 0:
        return b
    h = key_rank64(b[key_col].to_numpy(zero_copy_only=False), seed=seed)
    grp = b[group_col].to_numpy(zero_copy_only=False)
    _, inv = np.unique(grp, return_inverse=True)
    order = np.lexsort((h, inv))
    # position within the batch-local group under rank order
    pos = np.empty(len(order), np.int64)
    sorted_inv = inv[order]
    starts = np.flatnonzero(np.r_[True, sorted_inv[1:] != sorted_inv[:-1]])
    pos[order] = np.arange(len(order)) - np.repeat(
        starts, np.diff(np.r_[starts, len(order)])
    )
    return b.filter(pa.array(pos < n_per_group))


def stratified_sample(
    ds, group_col: str, n_per_group: int, key_col: str, seed: int = 0
):
    """n rows per group, deterministically (O6: the reference's
    per-class undersampling, NLP/2.1 cells 19-21): rank rows inside
    each group by key hash and keep the n smallest — reproducible
    under any partitioning.

    Scale shape: a per-batch partial PRUNES each group to its
    ``n_per_group`` smallest ranks BEFORE the exchange (the same
    partial-prune :func:`mixture_sample` uses), so at most
    ``blocks x groups x n_per_group`` rows ever move — one
    low-cardinality class (a constant fraction of a 100 TB corpus)
    can never land whole on a single reduce task. Correct because the
    global n smallest ranks of a group survive any per-batch prune to
    the batch-local n smallest (min-of-mins)."""

    def prune(b: pa.Table) -> pa.Table:
        return _stratified_prune_batch(
            b, group_col, key_col, n_per_group, seed
        )

    def take(g: pd.DataFrame) -> pd.DataFrame:
        h = key_rank64(g[key_col].to_numpy(), seed=seed)
        order = np.argsort(h, kind="stable")
        return g.iloc[order[:n_per_group]]

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(take, batch_format="pandas")
    )


#: Knuth multiplicative hash — chosen over splitmix64 for
#: :func:`mixture_sample` ONLY because it is expressible in ANSI SQL
#: ((key * 2654435761) % 2^32), so the query is DuckDB-oracle-checkable.
#: uint64 wrap-around is safe: 2^32 divides 2^64, so
#: (a*b mod 2^64) mod 2^32 == a*b mod 2^32.
_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)


def mixture_sample(ds, group_col: str, key_col: str, quotas: dict):
    """Domain/language mixture resampling: keep a fixed quota of rows
    per group, deterministically (the "data mixing" step of a training
    corpus — e.g. rebalance languages to target proportions).

    Rank = (key * Knuth) mod 2^32; each group keeps its quota smallest
    ranks (ties broken by key). Membership is a pure function of
    (key, quotas) — identical under any partitioning.

    Scale shape: the per-batch partial prunes every group to its quota
    BEFORE the shuffle, so at most ``blocks x groups x quota`` rows
    move; the final exchange groups on ``group_col``, which is
    LOW-CARDINALITY BY DESIGN (languages, domains, sources — this
    operator's partitioning assumption). For high-cardinality groups
    use :func:`stratified_sample` with a coarse key instead."""
    import pyarrow.compute as pc

    def rank_of(keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.uint64) * _KNUTH) % _MOD32

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        rank = rank_of(keys)
        grp = b[group_col].to_numpy(zero_copy_only=False)
        codes, inv = np.unique(grp, return_inverse=True)
        order = np.lexsort((keys, rank, inv))
        # position within the group under (rank, key) order
        pos = np.empty(len(order), np.int64)
        sorted_inv = inv[order]
        starts = np.flatnonzero(
            np.r_[True, sorted_inv[1:] != sorted_inv[:-1]]
        )
        pos[order] = np.arange(len(order)) - np.repeat(
            starts, np.diff(np.r_[starts, len(order)])
        )
        q = np.array([quotas.get(c, 0) for c in codes], np.int64)
        keep = pos < q[inv]
        return b.filter(pa.array(keep))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        keys = g[key_col].to_numpy()
        rank = rank_of(keys)
        order = np.lexsort((keys, rank))
        q = int(quotas.get(g[group_col].iloc[0], 0))
        return g.iloc[order[:q]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
    )


def balance_context_window(
    tags: np.ndarray, offsets: np.ndarray, window: int = 10
) -> np.ndarray:
    """Keep-mask for sequence training: all labelled lines plus a
    ±window context; long all-O stretches are dropped (O7: the
    reference's balance sampling around labelled blocks,
    Styling/src/lib/extractors/crf.py:196-218). Vectorized via
    distance-to-nearest-labelled-line computed with two cummax sweeps."""
    n = len(tags)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    lengths = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)
    doc_start = offsets[:-1][doc_idx]
    labelled = tags > 0
    gidx = np.arange(n, dtype=np.int64)
    # last labelled index <= i (within doc)
    last = np.maximum.accumulate(np.where(labelled, gidx, -1))
    last = np.where(last >= doc_start, last, -(10 * window))
    dist_back = gidx - last
    # next labelled index >= i (within doc): reverse min-sweep
    doc_end = offsets[1:][doc_idx] - 1
    big = n + 10 * window
    ridx = gidx[::-1]
    nxt = np.minimum.accumulate(
        np.where(labelled[::-1], ridx, big)
    )[::-1]
    valid_fwd = nxt <= doc_end  # stays within this document
    dist_fwd = np.where(valid_fwd, nxt - gidx, 10 * window)
    keep = (dist_back <= window) | (dist_fwd <= window)
    return keep


def shuffle_shards(
    ds,
    key_col: str = "doc_id",
    num_shards: int = 16,
    sub_bits: int = 8,
):
    """Deterministic shuffle-shard assignment for training export (O8+:
    the step after :func:`mixture_sample` in a corpus build — shard the
    kept docs into ``num_shards`` output files in pseudo-random order).

    -> Dataset(key, shard, pos): ``shard = fold(knuth(key)) %
    num_shards`` where ``fold(r) = (r >> 16) XOR r`` — the XOR fold
    matters: a multiplicative (Knuth) hash's LOW bits are nearly the
    identity (the multiplier is odd, so ``r mod 16 == key mod 16``),
    and ``r % S`` without the fold degenerates to ``key % S`` — not a
    shuffle at all. ``pos`` = the row's position within its shard
    under ``(knuth(key), key)`` order. A global ``random_shuffle`` would move
    every byte through an all-to-all exchange; here ONLY the
    (key, hash) pairs participate, and writers later co-locate payloads
    by (shard, pos) with a partitioned sink. Equivalent to DuckDB
    ``row_number() OVER (PARTITION BY shard ORDER BY rnk, key)`` — the
    ``shuffle_export`` query's value-hash oracle.

    Mechanics = the two-phase ordered scan of stages/pack.py with a
    hash-derived bucket: bucket = (shard, top ``sub_bits`` of rank), so
    bucket order == within-shard rank order; per-bucket totals are
    scanned on the driver (O(num_shards * 2^sub_bits) state) with the
    running sum reset at shard boundaries, and a per-bucket group pass
    emits final positions vectorized."""
    import ray

    from ..state.broadcast import get_broadcast

    n_sub = 1 << sub_bits
    shift = np.uint64(32 - sub_bits)

    def keyed(b: pa.Table) -> pa.Table:
        keys = (
            b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        rank = (keys.astype(np.uint64) * _KNUTH) % _MOD32
        shard = (
            ((rank >> np.uint64(16)) ^ rank) % np.uint64(num_shards)
        ).astype(np.int64)
        bucket = shard * n_sub + (rank >> shift).astype(np.int64)
        return pa.table(
            {
                key_col: pa.array(keys, pa.int64()),
                "rnk": pa.array(rank.astype(np.int64), pa.int64()),
                "shard": pa.array(shard, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    def counts(b: pa.Table) -> pa.Table:
        bk = b["bucket"].to_numpy(zero_copy_only=False)
        u, c = np.unique(bk, return_counts=True)
        return pa.table(
            {"bucket": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    bks, cnts = [], []
    for b in keyed_ds.map_batches(
        counts, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        bks.append(b["bucket"].to_numpy(zero_copy_only=False))
        cnts.append(b["n"].to_numpy(zero_copy_only=False))
    if not bks:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        )
    df = (
        pd.DataFrame(
            {"bucket": np.concatenate(bks), "n": np.concatenate(cnts)}
        )
        .groupby("bucket", as_index=True, sort=True)["n"]
        .sum()
    )
    buckets = df.index.to_numpy()
    tot = df.to_numpy()
    # exclusive scan, restarted at every shard boundary
    csum = np.r_[0, np.cumsum(tot)[:-1]]
    shard_of = buckets // n_sub
    starts = np.flatnonzero(np.r_[True, shard_of[1:] != shard_of[:-1]])
    base = csum - np.repeat(csum[starts], np.diff(np.r_[starts, len(csum)]))
    base_ref = ray.put((buckets, base))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        bkts, bases = get_broadcast(base_ref)
        order = np.lexsort((g[key_col].to_numpy(), g["rnk"].to_numpy()))
        g = g.iloc[order]
        b0 = bases[np.searchsorted(bkts, int(g["bucket"].iloc[0]))]
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                "shard": g["shard"].to_numpy(),
                "pos": b0 + np.arange(len(g), dtype=np.int64),
            }
        )

    return keyed_ds.groupby("bucket").map_groups(
        finish, batch_format="pandas"
    )


def weighted_sample(
    ds,
    key_col: str,
    weight_col: str,
    k: int = 25,
):
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis–Spirakis A-Res scheme with hash-derived uniforms.

    Each row gets ``u = (knuth(key) + 1) / (2^32 + 1)`` in (0, 1) and
    exponential key ``e = -ln(u) / w``; the k SMALLEST e win —
    equivalent to drawing k items sequentially with probability
    proportional to the remaining weights. Because u is a pure hash,
    the selection is partition-invariant AND SQL-expressible — the
    `weighted_sample` oracle re-derives it with DuckDB ln() (double
    precision on both sides; the only divergence window is a <1-ulp
    ln difference landing exactly on the k-th boundary).

    Distributed shape: per-batch argpartition prune to k rows, then a
    global sort+limit over blocks × k survivors — identical to the
    `deterministic_centroids` prune, nothing corpus-sized moves.
    """

    def prune(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        r = ((keys.astype(np.uint64) * _KNUTH) % _MOD32).astype(np.float64)
        u = (r + 1.0) / float((1 << 32) + 1)
        e = -np.log(u) / w
        out = pa.table(
            {
                key_col: pa.array(keys, pa.int64()),
                weight_col: b[weight_col],
                "es_key": pa.array(e, pa.float64()),
            }
        )
        if len(e) > k:
            sel = np.sort(np.argpartition(e, k)[:k])
            out = out.take(pa.array(sel, pa.int64()))
        return out

    picked = (
        ds.select_columns([key_col, weight_col])
        .map_batches(prune, batch_format="pyarrow")
        .sort(["es_key", key_col])
        .limit(k)
    )
    # round the reported key only AFTER selection (ordering used full
    # precision); 6 dp matches the driver's float-hash contract
    return picked.map_batches(
        lambda b: b.set_column(
            b.column_names.index("es_key"),
            "es_key",
            pa.array(
                np.round(
                    b["es_key"].to_numpy(zero_copy_only=False), 6
                ),
                pa.float64(),
            ),
        ),
        batch_format="pyarrow",
    )
