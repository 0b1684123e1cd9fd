"""Generic keyed stage checkpoint: materialize any Dataset as
hash-partitioned parquet with per-partition manifests, and resume by
processing ONLY pending partitions.

This generalizes the triple-store sink (sources/sinks.py) so that
intermediate stages — the results table after segmentation is the
important one — checkpoint the same way, giving true MID-PIPELINE
resume (north rule): a job killed after segmentation restarts, sees
the results checkpoint complete, and goes straight to linking /
canonicalization / materialize without re-running the CRF.

Partition key: ``hash(key_col) % P`` — a pure row function, so a
restarted run computes identical partitions regardless of block
layout or parallelism.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash_strings
from .manifest import (
    completed_partitions,
    rollup_hash,
    write_partition_manifest,
)


def _add_part(batch: pa.Table, key_col: str, num_partitions: int) -> pa.Table:
    if "ckpt_part" in batch.column_names:
        batch = batch.drop_columns(["ckpt_part"])
    h = hash_strings(
        pa.compute.cast(batch[key_col], pa.string()).to_numpy(
            zero_copy_only=False
        )
    )
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    return batch.append_column("ckpt_part", pa.array(part))


def checkpoint_dataset(
    ds,
    out_dir: str,
    key_col: str,
    num_partitions: int = 32,
    resume: bool = True,
    stage: str = "checkpoint",
    lineage: str = "",
):
    """Write ``ds`` as a keyed checkpoint; returns (part, rows) summary.

    With resume=True, rows whose partition already has a manifest are
    filtered out BEFORE the shuffle, so only pending partitions move
    and write."""
    os.makedirs(out_dir, exist_ok=True)
    keyed = ds.map_batches(
        lambda b: _add_part(b, key_col, num_partitions),
        batch_format="pyarrow",
    )
    done = completed_partitions(out_dir) if resume else set()
    if done:
        done_arr = pa.array(sorted(done), pa.int64())
        keyed = keyed.map_batches(
            lambda b: b.filter(
                pa.compute.invert(
                    pa.compute.is_in(b["ckpt_part"], value_set=done_arr)
                )
            ),
            batch_format="pyarrow",
        )

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["ckpt_part"].iloc[0])
        g = g.drop(columns=["ckpt_part"]).sort_values(
            key_col, kind="mergesort"
        ).reset_index(drop=True)
        pdir = os.path.join(out_dir, f"part={part:05d}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, "data.parquet.tmp")
        final = os.path.join(pdir, "data.parquet")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, final)
        roll = rollup_hash("\n".join(g[key_col].astype(str)).encode())
        write_partition_manifest(out_dir, part, len(g), roll, stage, lineage)
        return pd.DataFrame({"part": [part], "rows": [len(g)]})

    summary = (
        keyed.groupby("ckpt_part")
        .map_groups(write_part, batch_format="pandas")
        .materialize()
    )
    # partitions that received no rows are complete too — stamp them
    # (otherwise checkpoint_complete could never hold for small inputs)
    have = completed_partitions(out_dir)
    for part in range(num_partitions):
        if part not in have:
            write_partition_manifest(
                out_dir, part, 0, rollup_hash(b""), stage, lineage
            )
    return summary


def checkpoint_complete(out_dir: str, num_partitions: int = 32) -> bool:
    return completed_partitions(out_dir) >= set(range(num_partitions))


def validate_checkpoint_lineage(
    out_dir: str, stage: str, lineage: str
) -> bool:
    """Check every existing manifest was produced by (stage, lineage).

    The manifests record the producing stage + upstream lineage id for
    exactly this purpose: a resume against a checkpoint dir written
    from a DIFFERENT corpus/segmenter must not silently reuse stale
    partitions. Returns True when the dir is empty/new; raises
    ``ValueError`` on a mismatch (continuing would either serve stale
    results or interleave partitions of two different runs)."""
    from .manifest import read_manifests

    for m in read_manifests(out_dir):
        got = (m.get("stage"), m.get("lineage"))
        if got != (stage, lineage):
            raise ValueError(
                f"checkpoint lineage mismatch in {out_dir}: manifest "
                f"part={m.get('part')} was written by stage={got[0]!r} "
                f"lineage={got[1]!r}, current run is stage={stage!r} "
                f"lineage={lineage!r}; refusing to resume — use a fresh "
                "checkpoint dir or delete the stale one"
            )
    return True


def read_checkpoint(out_dir: str):
    import glob

    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    return rd.read_parquet(files)
