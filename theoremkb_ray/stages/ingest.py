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


def _invalid_mask(batch: pa.Table):
    """Rows with a null identity column or null content — the
    poison-pill rows a crawler inevitably produces."""
    bad = pc.is_null(batch["content"])
    for c in ("repo", "path", "commit"):
        bad = pc.or_(bad, pc.is_null(batch[c]))
    return bad


def ingest_batch(
    batch: pa.Table, verify: bool = True, on_error: str = "raise"
) -> pa.Table:
    """Add ``doc_id`` (+ ``content_sha256`` if absent); verify if present.

    Vectorized except the sha256 digest itself (no Arrow kernel exists);
    zero-copy for all pass-through columns.

    ``on_error="quarantine"`` DROPS rows that would otherwise abort the
    run (null identity/content, sha mismatch) instead of raising — the
    production posture for a crawled corpus where one poison row must
    not kill a 100 TB job. :func:`quarantined_rows` re-derives the
    dropped rows with reasons for the dead-letter audit.
    """
    bad = _invalid_mask(batch)
    has_bad = pc.any(bad).as_py()
    if has_bad:
        if on_error != "quarantine":
            n = pc.sum(pc.cast(bad, pa.int64())).as_py()
            raise ShaMismatch(
                f"{n} rows with null identity/content "
                "(pass on_error='quarantine' to drop instead)"
            )
        batch = batch.filter(pc.invert(bad))
        if batch.num_rows == 0:
            # fall through so the schema still gains doc_id/sha columns
            pass
    doc_id = pc.binary_join_element_wise(
        batch["repo"], batch["path"], "/"
    )
    doc_id = pc.binary_join_element_wise(doc_id, batch["commit"], "@")
    sha = pa.array(sha256_hex(batch["content"].to_pylist()), pa.string())
    if "content_sha256" in batch.column_names:
        if verify:
            mism = pc.not_equal(batch["content_sha256"], sha)
            if pc.any(mism).as_py():
                if on_error == "quarantine":
                    batch = batch.filter(pc.invert(mism))
                    # recompute derived arrays on the filtered rows
                    doc_id = pc.binary_join_element_wise(
                        batch["repo"], batch["path"], "/"
                    )
                    doc_id = pc.binary_join_element_wise(
                        doc_id, batch["commit"], "@"
                    )
                    sha = pa.array(
                        sha256_hex(batch["content"].to_pylist()),
                        pa.string(),
                    )
                else:
                    bad_n = pc.sum(pc.cast(mism, pa.int64())).as_py()
                    raise ShaMismatch(
                        f"content_sha256 invariant violated for {bad_n} rows"
                    )
    else:
        batch = batch.append_column("content_sha256", sha)
    if "doc_id" not in batch.column_names:
        batch = batch.append_column("doc_id", doc_id)
    return batch


def ingest(
    ds,
    verify: bool = True,
    batch_size: int = 512,
    on_error: str = "raise",
):
    """Dataset-level wrapper. ``on_error="quarantine"`` streams past
    poison rows instead of aborting (see :func:`ingest_batch`)."""
    return ds.map_batches(
        lambda b: ingest_batch(b, verify=verify, on_error=on_error),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def quarantined_rows(ds, verify: bool = True, batch_size: int = 512):
    """The dead-letter view: rows :func:`ingest` would drop under
    ``on_error="quarantine"``, each with a ``reason``. A second pass
    over the same (lazy) input — run it only for audits; the happy
    path never pays for it."""

    def fn(b: pa.Table) -> pa.Table:
        bad = _invalid_mask(b)
        reasons = pa.array(
            [
                "null_field" if x else ""
                for x in bad.to_pylist()
            ],
            pa.string(),
        )
        if verify and "content_sha256" in b.column_names:
            ok_rows = b.filter(pc.invert(bad))
            if ok_rows.num_rows:
                sha = pa.array(
                    sha256_hex(ok_rows["content"].to_pylist()), pa.string()
                )
                mism = pc.not_equal(ok_rows["content_sha256"], sha)
                # scatter mismatch reasons back into full-batch order
                import numpy as np

                full = np.array(reasons.to_pylist(), dtype=object)
                idx = np.flatnonzero(
                    ~np.asarray(bad.to_pylist(), dtype=bool)
                )
                mm = np.asarray(mism.to_pylist(), dtype=bool)
                full[idx[mm]] = "sha_mismatch"
                reasons = pa.array(full.tolist(), pa.string())
        keep = pc.not_equal(reasons, "")
        return b.append_column("reason", reasons).filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


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
