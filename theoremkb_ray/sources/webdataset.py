"""WebDataset-style tar-shard sink/source for multimodal payloads.

Large-scale multimodal training jobs consume corpora as numbered tar
shards whose members pair a sample key with its binary payload and a
JSON metadata sidecar (``<key>.payload`` + ``<key>.json``) — the
WebDataset convention. This module writes a Dataset of binary rows as
such shards and reads them back:

- shard assignment is ``hash(key) % num_shards`` — a pure function of
  the key, so re-runs land samples in the same shard (resumable: a
  crashed run just rewrites the missing shard files);
- each shard is written by the task that owns its group (one keyed
  exchange, no driver collect), members sorted by key with zeroed
  tar timestamps so shard bytes are DETERMINISTIC;
- a ``_wds_manifest.json`` sidecar records per-shard row/byte counts
  (the materialize_triples manifest idea, reference analog
  Styling/tools/theoremdb/extract_graph.py:298-307's cumulative CSV
  checkpoint — made per-partition instead of cumulative).

Reading streams one tar per input block; payload bytes round-trip
exactly (tests/test_webdataset.py).
"""

from __future__ import annotations

import glob
import io
import json
import os
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa


def write_webdataset(
    ds,
    out_dir: str,
    key_col: str = "media_id",
    payload_col: str = "payload",
    num_shards: int = 8,
):
    """Write binary rows as WebDataset tar shards; returns the
    per-shard summary DataFrame (shard, rows, bytes)."""
    from ..functions.hashing import hash_strings

    os.makedirs(out_dir, exist_ok=True)

    def add_shard(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False).astype("U")
        h = hash_strings(keys)
        return b.append_column(
            "_shard",
            pa.array(
                (h % np.uint64(num_shards)).astype(np.int64), pa.int64()
            ),
        )

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["_shard"].iloc[0])
        g = g.sort_values(key_col, kind="mergesort")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in g.iterrows():
                key = str(row[key_col])
                payload = row[payload_col]
                meta = {
                    c: row[c]
                    for c in g.columns
                    if c not in (payload_col, "_shard")
                    and not isinstance(row[c], (bytes, bytearray))
                }
                for name, data in (
                    (f"{key}.payload", bytes(payload)),
                    (
                        f"{key}.json",
                        json.dumps(
                            meta, sort_keys=True, default=str
                        ).encode(),
                    ),
                ):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(data))
        data = buf.getvalue()
        path = os.path.join(out_dir, f"shard_{shard:05d}.tar")
        with open(path, "w+b") as f:
            f.write(data)
        return pd.DataFrame(
            {
                "shard": [shard],
                "rows": [len(g)],
                "bytes": [len(data)],
            }
        )

    summary = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    with open(os.path.join(out_dir, "_wds_manifest.json"), "w") as f:
        json.dump(
            {
                "num_shards": num_shards,
                "key_col": key_col,
                "shards": summary.to_dict("records"),
            },
            f,
            indent=1,
        )
    return summary


def read_webdataset(out_dir: str):
    """Tar shards -> Dataset(key, payload, meta_json); one tar is
    parsed per task (the shard file list is the input dataset, so
    shards stream through the executor like any other source)."""
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, "shard_*.tar")))

    def parse(b: pa.Table) -> pa.Table:
        keys, payloads, metas = [], [], []
        for path in b["path"].to_pylist():
            with tarfile.open(path, mode="r") as tar:
                members = {m.name: m for m in tar.getmembers()}
                for name in sorted(members):
                    if not name.endswith(".payload"):
                        continue
                    key = name[: -len(".payload")]
                    payloads.append(
                        tar.extractfile(members[name]).read()
                    )
                    jm = members.get(f"{key}.json")
                    metas.append(
                        tar.extractfile(jm).read().decode()
                        if jm is not None
                        else "{}"
                    )
                    keys.append(key)
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta_json": pa.array(metas, pa.string()),
            }
        )

    return rd.from_items([{"path": p} for p in files]).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )
