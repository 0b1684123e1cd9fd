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

from ..functions.hashing import hash_strings, splitmix64


def _key_hash(batch: pa.Table, key_col: str, seed: int) -> np.ndarray:
    import pyarrow.compute as pc

    keys = pc.cast(batch[key_col], pa.string()).to_numpy(zero_copy_only=False)
    return splitmix64(hash_strings(keys) ^ np.uint64(seed))


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


def stratified_sample(
    ds, group_col: str, n_per_group: int, key_col: str, seed: int = 0
):
    """n rows per group, deterministically (O6: the reference's
    per-class undersampling, NLP/2.1 cells 19-21): rank rows inside
    each group by key hash and keep the n smallest — reproducible
    under any partitioning."""

    def take(g: pd.DataFrame) -> pd.DataFrame:
        h = splitmix64(
            hash_strings(g[key_col].astype(str).to_numpy())
            ^ np.uint64(seed)
        )
        order = np.argsort(h, kind="stable")
        return g.iloc[order[:n_per_group]]

    return ds.groupby(group_col).map_groups(take, batch_format="pandas")


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
