"""Per-partition output manifests with lineage — the resume unit.

The reference checkpoints by rewriting cumulative CSVs after each
chunk and skipping already-tagged papers (reference:
Styling/tools/theoremdb/extract_graph.py:334-335,
Styling/src/cli.py:207-211). Here every output partition directory
gets a ``manifest_<part>.json`` recording the partition key, row
count, a content roll-up hash, the producing stage and its upstream
lineage id; a restarted job anti-joins pending partitions against the
completed manifest set (SURVEY.md §4 'Checkpoint / resume').

Writes are atomic: data + manifest go to a temp name first, then
``os.replace`` — a crash mid-write never yields a partial partition
with a manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid


def _mdir(out_dir: str) -> str:
    d = os.path.join(out_dir, "_manifests")
    os.makedirs(d, exist_ok=True)
    return d


def manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(_mdir(out_dir), f"manifest_{part:05d}.json")


def write_partition_manifest(
    out_dir: str,
    part: int,
    rows: int,
    content_hash: str,
    stage: str,
    lineage: str,
    pred_counts: dict[str, int] | None = None,
) -> None:
    doc = {
        "part": part,
        "rows": rows,
        "content_hash": content_hash,
        "stage": stage,
        "lineage": lineage,
    }
    if pred_counts is not None:
        # per-partition predicate histogram: exact selectivity for
        # the BGP planner without touching data (|predicates| is
        # small and fixed by the schema — bytes per manifest bounded)
        doc["pred_counts"] = pred_counts
    tmp = manifest_path(out_dir, part) + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, manifest_path(out_dir, part))


def completed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifests")
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("manifest_") and name.endswith(".json"):
            try:
                with open(os.path.join(mdir, name)) as f:
                    out.add(int(json.load(f)["part"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue  # torn manifest -> treat partition as pending
    return out


def read_manifests(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "_manifests")
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("manifest_") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out


def rollup_hash(rows_bytes: bytes) -> str:
    return hashlib.sha256(rows_bytes).hexdigest()
