"""Disk-mediated keyed exchange — the sort-shuffle bypass.

Ray Data's sort-based ``groupby(key).map_groups`` moves every row
through a sample + per-block sort + k-way reduce; on this workload a
few-hundred-MB exchange costs ~25-70 s of wall regardless of how
little the downstream group fn needs (measured in the flagship: the
LSH pair-gen exchange and the hot-hash range exchange were both
dominated by the shuffle, not the group work). The triple sink's
hive-partitioned spool (`sources/sinks.py:materialize_triples`)
measured ~4x faster for the same data movement, so this module
generalizes it:

1. every map task appends its rows to ``spool/key=K/`` feather files
   (NO network exchange — each task writes the partitions it holds);
2. one task per key reads ``key=K`` back and applies the group fn.

Storage contract: on a multi-node cluster ``spool_dir`` must live on
storage every node can read (the same contract the triple store's own
output directory already has — shared FS or object store). The
contract is ENFORCED, not just documented:

- if the cluster has >1 alive node and no shared scratch has been
  declared (``$TKB_SCRATCH`` unset and no explicit ``spool_dir``),
  :func:`spooled_group_map` falls back to Ray's native sort-based
  ``groupby().map_groups`` — slower, but correct on any topology;
- every exchange reconciles rows-written against rows-read per key
  (the map side tallies per-key row counts through the object store,
  the reduce side recounts from disk) and RAISES on any mismatch, so
  a violated storage contract fails loudly instead of silently
  under-merging.

Fan-out is adaptive: callers that key on a coarsened hash
(``fine_hash % coarse``) pass ``fine_col`` so oversized partitions can
be re-split on ``mix(fine) % s`` after the write — per-reduce-task
bytes stay bounded while bucket count grows with data volume, instead
of 1/coarse of the survivor set landing in one task's heap at 100x
scale. Splitting on a hash of the FINE key preserves the only
invariant group fns rely on: rows sharing a fine key stay co-located.

Single node: any local path. The spool is deleted on success.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.feather as pf

#: default scratch root; override per-call or via $TKB_SCRATCH
SCRATCH_ENV = "TKB_SCRATCH"

#: spool compression: zstd (level 1) over lz4 — the sink phase is
#: DISK-bound at high CPU counts (measured 92s at 32 CPUs vs 95s at
#: 8 for the same 28.5M-triple spool: wall = IO bytes / bandwidth,
#: not CPU), and these string-heavy blocks compress ~2x better under
#: zstd for a decode cost the idle CPUs absorb. Override with
#: $TKB_SPOOL_COMP (lz4 restores the old behavior).
SPOOL_COMPRESSION = os.environ.get("TKB_SPOOL_COMP", "zstd")

#: re-split any spool partition larger than this before the reduce
#: side reads it whole (only when the caller provides ``fine_col``).
#: 256 MiB of lz4 feather decodes to well under a worker's heap even
#: with the group fn's own working set on top.
MAX_PARTITION_BYTES = 256 << 20

_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 / Fibonacci constant


def scratch_dir() -> str:
    return os.environ.get(SCRATCH_ENV, "/tmp/tkb_scratch")


def _alive_nodes() -> int:
    """Alive Ray nodes, 1 if Ray state is unavailable (local mode)."""
    try:
        import ray

        if not ray.is_initialized():
            return 1
        return sum(1 for n in ray.nodes() if n.get("Alive")) or 1
    except Exception:
        return 1


def _shared_scratch_declared(spool_dir: str | None) -> bool:
    """True when the caller has taken responsibility for the storage
    contract: an explicit spool_dir or an exported $TKB_SCRATCH both
    declare 'this path is readable from every node'."""
    return spool_dir is not None or SCRATCH_ENV in os.environ


def _mix_mod(vals: np.ndarray, s: int) -> np.ndarray:
    """Deterministic re-hash of fine keys for sub-splitting.

    The coarse key is typically ``fine % coarse``; taking ``fine % s``
    again would correlate with it (and for s sharing factors with
    coarse, collapse to few sub-buckets). splitmix-style multiply +
    xor-fold decorrelates the low bits (bare Knuth low bits are the
    identity — see stages/sampling.py shard-hash fix)."""
    h = vals.astype(np.uint64, copy=False) * _MIX
    h ^= h >> np.uint64(32)
    return (h % np.uint64(s)).astype(np.int64)


def spool_write_partitioned(
    ds, base: str, key_col: str
) -> tuple[list[int], dict[int, int]]:
    """Write ``ds`` to ``base/<key_col>=K/*.feather``, one file per
    (task, key). Returns ``(sorted keys, {key: rows_written})`` and
    raises if the keys found on disk disagree with the keys the map
    tasks reported writing (a task that wrote to another node's local
    disk is invisible to this listing — the multi-node storage
    contract violated).

    Why not ``write_parquet(partition_cols=...)``: the spool is
    transient and read back exactly once, so parquet's encode/decode
    tax is pure overhead — Arrow IPC (feather, lz4) writes ~3x and
    reads ~5x faster on these string-heavy blocks, which is the
    difference between a finalize pass bound by useful work and one
    bound by 12k small-file decodes. Executes the pipeline (this IS
    the exchange's map side). Key values must be non-negative ints."""

    def write_batch(b: pa.Table) -> pa.Table:
        n = b.num_rows
        empty = pa.table(
            {
                "__key": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        part = b[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(part, kind="stable")
        b = b.take(pa.array(order))
        part = part[order]
        bounds = np.flatnonzero(np.diff(part)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [n]])
        tag = f"{os.getpid()}_{time.monotonic_ns()}"
        for s, e in zip(starts, ends):
            d = os.path.join(base, f"{key_col}={int(part[s])}")
            os.makedirs(d, exist_ok=True)
            pf.write_feather(
                b.slice(s, e - s).drop_columns([key_col]),
                os.path.join(d, f"{tag}_{s}.feather"),
                compression=SPOOL_COMPRESSION,
            )
        return pa.table(
            {
                "__key": pa.array(part[starts].astype(np.int64)),
                "n": pa.array((ends - starts).astype(np.int64)),
            }
        )

    # fold the per-(task, key) tallies driver-side: bounded by
    # tasks x keys rows of two ints — tiny next to the data moved
    expected: dict[int, int] = {}
    for t in ds.map_batches(
        write_batch, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for k, n in zip(t["__key"].to_pylist(), t["n"].to_pylist()):
            expected[k] = expected.get(k, 0) + n

    disk_keys = (
        sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(base)
            if d.startswith(f"{key_col}=")
        )
        if os.path.isdir(base)
        else []
    )
    if disk_keys != sorted(expected):
        missing = sorted(set(expected) - set(disk_keys))
        stray = sorted(set(disk_keys) - set(expected))
        raise RuntimeError(
            f"spool exchange reconciliation failed at {base!r}: map tasks "
            f"reported writing {len(expected)} keys but the driver sees "
            f"{len(disk_keys)} on disk (missing={missing[:8]}, "
            f"stray={stray[:8]}). On a multi-node cluster the spool dir "
            f"must live on shared storage readable from every node — set "
            f"${SCRATCH_ENV} to a shared path or pass spool_dir explicitly."
        )
    return disk_keys, expected


def read_spool_partition(base: str, key_col: str, k: int) -> pa.Table:
    """Read one spool partition back as a single Arrow table (key
    column re-attached)."""
    d = os.path.join(base, f"{key_col}={k}")
    tbls = [
        pf.read_table(os.path.join(d, f))
        for f in sorted(os.listdir(d))
        if f.endswith(".feather")
    ]
    tbl = pa.concat_tables(tbls, promote_options="default")
    return tbl.append_column(
        key_col, pa.array(np.full(len(tbl), k, np.int64))
    )


def _partition_bytes(base: str, key_col: str, k: int) -> int:
    d = os.path.join(base, f"{key_col}={k}")
    return sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".feather")
    )


def _resplit_partition(
    base: str, key_col: str, fine_col: str, k: int, sub_ids: list[int]
) -> dict[int, int]:
    """Stream one oversized partition file-by-file into ``len(sub_ids)``
    new partitions keyed on ``mix(fine) % s``. Peak memory = one spool
    file, regardless of partition size. Returns rows per new key."""
    s = len(sub_ids)
    d = os.path.join(base, f"{key_col}={k}")
    counts = np.zeros(s, dtype=np.int64)
    for f in sorted(os.listdir(d)):
        if not f.endswith(".feather"):
            continue
        t = pf.read_table(os.path.join(d, f))
        fine = t[fine_col].to_numpy(zero_copy_only=False)
        sub = _mix_mod(fine, s)
        order = np.argsort(sub, kind="stable")
        t = t.take(pa.array(order))
        sub = sub[order]
        bounds = np.flatnonzero(np.diff(sub)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(sub)]])
        tag = f"{os.getpid()}_{time.monotonic_ns()}"
        for a, e in zip(starts, ends):
            sid = sub_ids[int(sub[a])]
            nd = os.path.join(base, f"{key_col}={sid}")
            os.makedirs(nd, exist_ok=True)
            pf.write_feather(
                t.slice(a, e - a),
                os.path.join(nd, f"{tag}_{a}.feather"),
                compression=SPOOL_COMPRESSION,
            )
            counts[int(sub[a])] += e - a
    shutil.rmtree(d)
    return {sid: int(c) for sid, c in zip(sub_ids, counts) if c}


def _split_oversized(
    base: str,
    key_col: str,
    fine_col: str,
    keys: list[int],
    expected: dict[int, int],
    max_bytes: int,
) -> tuple[list[int], dict[int, int]]:
    """Grow the fan-out to fit the data: any partition over
    ``max_bytes`` is re-split by a decorrelated hash of ``fine_col``
    so no reduce task ever concat-reads more than ~max_bytes,
    however large the survivor set grew. One Ray task per oversized
    partition (each streams file-by-file — bounded memory)."""
    import ray

    sizes = {k: _partition_bytes(base, key_col, k) for k in keys}
    big = [k for k in keys if sizes[k] > max_bytes]
    if not big:
        return keys, expected

    resplit = ray.remote(num_cpus=1)(_resplit_partition)
    next_id = max(keys) + 1
    refs, plans = [], []
    for k in big:
        # 2x oversplit: ceil(size/max) targets sub-partitions AT the
        # cap, so ordinary hash variance (few fine keys per sub, or a
        # chunky per-key payload) routinely lands the max sub 2-3x
        # over it. Doubling s targets cap/2 — realized maxima stay
        # near/below the cap for the cost of a few extra reduce tasks.
        s = 2 * int(-(-sizes[k] // max_bytes))
        sub_ids = list(range(next_id, next_id + s))
        next_id += s
        refs.append(resplit.remote(base, key_col, fine_col, k, sub_ids))
        plans.append(k)
    new_expected = dict(expected)
    for k, sub_counts in zip(plans, ray.get(refs)):
        old = new_expected.pop(k)
        if sum(sub_counts.values()) != old:
            raise RuntimeError(
                f"spool re-split of {key_col}={k} lost rows: had {old}, "
                f"re-spooled {sum(sub_counts.values())}"
            )
        new_expected.update(sub_counts)
    return sorted(new_expected), new_expected


def _finalize_spool(
    base: str,
    key_col: str,
    keys: list[int],
    expected: dict[int, int],
    fn,
    batch_format: str,
):
    """Reduce side: one task per key reads its partition (recounting
    rows against the map side's tally — a lost file or directory
    raises instead of under-merging) and applies ``fn``."""
    import ray.data as rd

    exp_keys = np.array(sorted(expected), dtype=np.int64)
    exp_rows = np.array([expected[k] for k in exp_keys], dtype=np.int64)

    def run_group(b: pa.Table) -> pa.Table:
        outs = []
        for k in b["__key"].to_pylist():
            try:
                tbl = read_spool_partition(base, key_col, k)
            except (FileNotFoundError, pa.ArrowInvalid) as e:
                raise RuntimeError(
                    f"spool partition {key_col}={k} unreadable at {base!r}"
                    f" ({e}); on multi-node clusters ${SCRATCH_ENV} must"
                    f" point at shared storage."
                ) from e
            i = int(np.searchsorted(exp_keys, k))
            want = int(exp_rows[i]) if i < len(exp_keys) and exp_keys[i] == k else -1
            if len(tbl) != want:
                raise RuntimeError(
                    f"spool exchange reconciliation failed: partition "
                    f"{key_col}={k} has {len(tbl)} rows on disk but map "
                    f"tasks wrote {want}. The spool dir is not shared "
                    f"across nodes or was tampered with — set "
                    f"${SCRATCH_ENV} to shared storage."
                )
            if batch_format == "pandas":
                res = fn(tbl.to_pandas())
                outs.append(pa.Table.from_pandas(res, preserve_index=False))
            else:
                outs.append(fn(tbl))
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="default")

    keys_ds = rd.from_arrow(
        pa.table({"__key": pa.array(keys, pa.int64())})
    ).repartition(len(keys))
    return keys_ds.map_batches(
        run_group, batch_format="pyarrow", batch_size=1
    ).materialize()


def _native_group_map(ds, key_col: str, fn, batch_format: str):
    """Ray's sort-based groupby — the topology-safe fallback when the
    spool's shared-storage contract can't be assumed."""
    return (
        ds.groupby(key_col)
        .map_groups(fn, batch_format=batch_format)
        .materialize()
    )


def spooled_group_map(
    ds,
    key_col: str,
    fn,
    spool_dir: str | None = None,
    batch_format: str = "pyarrow",
    keep_spool: bool = False,
    fine_col: str | None = None,
    max_partition_bytes: int | None = None,
):
    """``groupby(key_col).map_groups(fn)`` via a disk spool.

    ``fn`` receives one whole group as a pyarrow Table (or pandas
    DataFrame with ``batch_format="pandas"``), with the key column
    present, and returns the same format. Returns a Dataset of the
    concatenated results (materialized — the spool must outlive reads,
    so results are pinned before cleanup). Key values must be integers
    (hive partition directory names are parsed back with int()).

    ``fine_col``: when the key is a coarsened hash (``fine % coarse``)
    name the fine column here — partitions larger than
    ``max_partition_bytes`` are then re-split on a decorrelated hash
    of it, keeping per-reduce-task memory flat as data volume grows.
    ``fn`` must only rely on fine-key co-location (true for every
    bucketed group fn in this repo), NOT on seeing the whole coarse
    group — and not on the key column's VALUE either (re-split
    partitions carry fresh synthetic key ids). ``fine_col`` must be
    an integer column (its values are re-hashed with splitmix).
    Omit it for fns that need the full semantic group (e.g.
    SemDedup's per-cluster prune).

    Multi-node guard: with >1 alive node and no declared shared
    scratch (no ``spool_dir``, no ``$TKB_SCRATCH``) this transparently
    degrades to the native sort-based groupby rather than silently
    losing every partition written on a non-driver node."""
    import ray.data as rd

    if max_partition_bytes is None:
        # resolved at CALL time so tests / deployments can tune the
        # module attribute (a def-time default would freeze it)
        max_partition_bytes = MAX_PARTITION_BYTES

    if not _shared_scratch_declared(spool_dir) and _alive_nodes() > 1:
        return _native_group_map(ds, key_col, fn, batch_format)

    base = spool_dir or os.path.join(
        scratch_dir(), f"spool_{os.getpid()}_{id(ds):x}"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    keys, expected = spool_write_partitioned(ds, base, key_col)
    if not keys:
        shutil.rmtree(base, ignore_errors=True)
        return rd.from_items([]).materialize()
    if fine_col is not None:
        n0 = len(keys)
        keys, expected = _split_oversized(
            base, key_col, fine_col, keys, expected, max_partition_bytes
        )
        if len(keys) != n0:
            import logging

            logging.getLogger(__name__).info(
                "spool exchange %s: fan-out grew %d -> %d partitions "
                "(re-split on %s, cap %d MiB)",
                key_col,
                n0,
                len(keys),
                fine_col,
                max_partition_bytes >> 20,
            )
    out = _finalize_spool(base, key_col, keys, expected, fn, batch_format)
    if not keep_spool:
        shutil.rmtree(base, ignore_errors=True)
    return out
