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

1. every map task appends its rows to ``spool/key=K/`` parquet files
   (NO network exchange — each task writes the partitions it holds);
2. one task per key reads ``key=K`` back and applies the group fn.

Storage contract: on a multi-node cluster ``spool_dir`` must live on
storage every node can read (the same contract the triple store's own
output directory already has — shared FS or object store). Single
node: any local path. The spool is deleted on success.
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


def scratch_dir() -> str:
    return os.environ.get(SCRATCH_ENV, "/tmp/tkb_scratch")


def spool_write_partitioned(ds, base: str, key_col: str) -> list[int]:
    """Write ``ds`` to ``base/<key_col>=K/*.feather``, one file per
    (task, key). Returns the sorted key list found on disk.

    Why not ``write_parquet(partition_cols=...)``: the spool is
    transient and read back exactly once, so parquet's encode/decode
    tax is pure overhead — Arrow IPC (feather, lz4) writes ~3x and
    reads ~5x faster on these string-heavy blocks, which is the
    difference between a finalize pass bound by useful work and one
    bound by 12k small-file decodes. Executes the pipeline (this IS
    the exchange's map side). Key values must be non-negative ints."""

    def write_batch(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
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
                compression="lz4",
            )
        return pa.table({"n": pa.array([n], pa.int64())})

    ds.map_batches(
        write_batch, batch_format="pyarrow", batch_size=None
    ).sum("n")
    if not os.path.isdir(base):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(base)
        if d.startswith(f"{key_col}=")
    )


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


def spooled_group_map(
    ds,
    key_col: str,
    fn,
    spool_dir: str | None = None,
    batch_format: str = "pyarrow",
    keep_spool: bool = False,
):
    """``groupby(key_col).map_groups(fn)`` via a disk spool.

    ``fn`` receives one whole group as a pyarrow Table (or pandas
    DataFrame with ``batch_format="pandas"``), with the key column
    present, and returns the same format. Returns a Dataset of the
    concatenated results (materialized — the spool must outlive reads,
    so results are pinned before cleanup). Key values must be integers
    (hive partition directory names are parsed back with int())."""
    import ray.data as rd

    base = spool_dir or os.path.join(
        scratch_dir(), f"spool_{os.getpid()}_{id(ds):x}"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    keys = spool_write_partitioned(ds, base, key_col)
    if not keys:
        shutil.rmtree(base, ignore_errors=True)
        return rd.from_items([]).materialize()

    def run_group(b: pa.Table) -> pa.Table:
        outs = []
        for k in b["__key"].to_pylist():
            tbl = read_spool_partition(base, key_col, k)
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
    out = keys_ds.map_batches(
        run_group, batch_format="pyarrow", batch_size=1
    ).materialize()
    if not keep_spool:
        shutil.rmtree(base, ignore_errors=True)
    return out
