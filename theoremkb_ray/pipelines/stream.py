"""Micro-batch continuous ingestion: watch a directory, append new
documents to the store as delta segments.

The streaming story for a batch engine (the same posture Ray Data
itself takes): arrival = files landing in a directory; each poll runs
ONE bounded micro-batch through the delta path
(`pipelines/delta.py:run_kg_delta`). All state lives in the store —
the ``_processed/`` sidecar is the exactly-once ledger, so the
watcher itself is stateless and restart-safe: a crashed round that
wrote its segment but not its sidecar entry re-selects those docs
next round and appends an empty... no — the sidecar is written AFTER
the segment materializes, so a crash between the two re-processes the
micro-batch into a second segment; consumers deduplicate by triple
identity or compact. That at-least-once window is the standard
file-ingestion contract (a Kafka-style offset commit would need a
transactional store).

Per round, only the ID columns of the watched files are scanned for
selection; content is read once for the selected delta. An idle round
(nothing new) costs one pruned column scan.
"""

from __future__ import annotations

import glob
import os
import time

import pandas as pd


def watch_and_ingest(
    watch_dir: str,
    store_dir: str,
    pattern: str = "*.parquet",
    poll_interval: float = 0.5,
    max_rounds: int | None = None,
    stop_after_idle: int = 2,
    compact_max_segments: int = 8,
    compact_max_bytes_ratio: float = 0.5,
    **delta_kwargs,
) -> pd.DataFrame:
    """Poll ``watch_dir`` for corpus parquet files and ingest new
    documents as delta segments until ``stop_after_idle`` consecutive
    idle rounds (or ``max_rounds``). Returns the per-round log
    (round, files, n_new, rows, segment, compacted).

    After every ingesting round the size-tiered compaction policy
    runs (`delta.maybe_compact`): when ``compact_max_segments``
    delta directories have accumulated OR their bytes reach
    ``compact_max_bytes_ratio`` of the base, the segments fold back
    into the base partitions (sidecars carried, store contents
    unchanged). Set ``compact_max_segments=0`` to disable."""
    from .delta import maybe_compact, run_kg_delta

    rows = []
    idle = 0
    rnd = 0
    while True:
        rnd += 1
        files = sorted(glob.glob(os.path.join(watch_dir, pattern)))
        meta_path = os.path.join(store_dir, "_store_meta.json")
        if files and not os.path.exists(meta_path):
            # bootstrap: the first micro-batch CREATES the store
            from ..sources.corpus import read_corpus
            from .delta import record_processed
            from .kg import run_kg

            summary = run_kg(
                watch_dir,
                store_dir,
                segmenter=delta_kwargs.get("segmenter", "crf"),
                canonicalize=delta_kwargs.get("canonicalize", True),
                links_tbl=delta_kwargs.get("links_tbl"),
            )
            record_processed(read_corpus(watch_dir), store_dir)
            n_rows = sum(r["rows"] for r in summary.take_all())
            n_new, seg = n_rows, store_dir
        elif files:
            res = run_kg_delta(watch_dir, store_dir, **delta_kwargs)
            n_new, n_rows, seg = (
                res["n_new"], res["rows"], res["segment"],
            )
        else:
            n_new, n_rows, seg = 0, 0, None
        compacted = 0
        if n_new and compact_max_segments:
            c = maybe_compact(
                store_dir,
                max_segments=compact_max_segments,
                max_bytes_ratio=compact_max_bytes_ratio,
            )
            if c is not None:
                compacted = c["compacted_segments"]
        rows.append(
            {
                "round": rnd,
                "files": len(files),
                "n_new": n_new,
                "rows": n_rows,
                "segment": seg,
                "compacted": compacted,
            }
        )
        idle = idle + 1 if n_new == 0 else 0
        if idle >= stop_after_idle:
            break
        if max_rounds is not None and rnd >= max_rounds:
            break
        time.sleep(poll_interval)
    return pd.DataFrame(rows)
