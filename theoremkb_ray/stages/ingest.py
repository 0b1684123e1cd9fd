"""Ingest stage: derive ``doc_id`` and verify/compute the per-row
``content_sha256`` invariant.

Replaces the reference's ``register`` + SQLite Paper rows
(reference: Styling/src/cli.py:25-43,
Styling/src/lib/paper/__init__.py:130-166): identity is derived from
the corpus row itself, never stored in a database.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import sha256_hex


class ShaMismatch(ValueError):
    """A row's recomputed sha256 disagrees with the stored invariant."""


def ingest_batch(batch: pa.Table, verify: bool = True) -> pa.Table:
    """Add ``doc_id`` (+ ``content_sha256`` if absent); verify if present.

    Vectorized except the sha256 digest itself (no Arrow kernel exists);
    zero-copy for all pass-through columns.
    """
    doc_id = pc.binary_join_element_wise(
        batch["repo"], batch["path"], "/"
    )
    doc_id = pc.binary_join_element_wise(doc_id, batch["commit"], "@")
    sha = pa.array(sha256_hex(batch["content"].to_pylist()), pa.string())
    if "content_sha256" in batch.column_names:
        if verify:
            ok = pc.all(pc.equal(batch["content_sha256"], sha)).as_py()
            if not ok:
                bad = pc.sum(
                    pc.cast(pc.not_equal(batch["content_sha256"], sha), pa.int64())
                ).as_py()
                raise ShaMismatch(
                    f"content_sha256 invariant violated for {bad} rows"
                )
    else:
        batch = batch.append_column("content_sha256", sha)
    if "doc_id" not in batch.column_names:
        batch = batch.append_column("doc_id", doc_id)
    return batch


def ingest(ds, verify: bool = True, batch_size: int = 512):
    """Dataset-level wrapper."""
    return ds.map_batches(
        lambda b: ingest_batch(b, verify=verify),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def clamp_content(ds, max_bytes: int = 2_000_000):
    """Per-row cost cap: truncate pathological documents to
    ``max_bytes`` and flag them (``clamped`` column) instead of letting
    one mega-file stall a whole task — the engine-grade version of the
    reference's hard-coded paper blacklist (reference:
    Styling/src/cli.py:213). Truncation lands on a line boundary so
    the tokenizer still sees whole lines; flagged rows double as the
    dead-letter record (filter ``clamped`` to audit them)."""

    def fn(b: pa.Table) -> pa.Table:
        import numpy as np

        lens = pc.binary_length(b["content"]).to_numpy(zero_copy_only=False)
        over = lens > max_bytes
        if not over.any():
            return b.append_column(
                "clamped", pa.array(np.zeros(b.num_rows, dtype=bool))
            )
        contents = b["content"].to_numpy(zero_copy_only=False)
        out = contents.copy()
        for i in np.flatnonzero(over):
            cut = contents[i][:max_bytes]
            nl = cut.rfind("\n")
            out[i] = cut[: nl if nl > 0 else max_bytes]
        b = b.set_column(
            b.column_names.index("content"),
            "content",
            pa.array(out, pa.string()),
        )
        return b.append_column("clamped", pa.array(over))

    return ds.map_batches(fn, batch_format="pyarrow")
