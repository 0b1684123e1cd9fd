"""PII redaction — scrub emails / IPv4 addresses / phone numbers from
a text column, with per-class match counts.

The reference has no redaction stage (its corpus is published papers);
this is a standard compliance pass a web-scale training-data pipeline
runs before anything else. Design constraints:

- **Fully vectorized**: one ``pc.count_substring_regex`` +
  ``pc.replace_substring_regex`` per PII class per batch — Arrow's RE2
  engine, no Python loop, no actor state needed (patterns are
  precompiled inside Arrow per call).
- **Oracle-parity**: the patterns are RE2-compatible AND DuckDB
  ``regexp_replace``-compatible (DuckDB is also RE2), and replacements
  are applied in a FIXED order (email -> ipv4 -> phone) so the SQL
  oracle's nested ``regexp_replace`` reproduces the output
  byte-for-byte. Counts are measured on the ORIGINAL text on both
  sides.
- **Scale shape**: pure map — no shuffle, no driver state; streams at
  read speed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: (name, RE2 pattern, replacement token) — order is part of the
#: contract (see module docstring); keep in sync with SQL_REDACT in
#: __ray_entry__.py.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(id cols..., redacted, n_email, n_ipv4, n_phone) for one batch."""
    text = pc.cast(batch[text_col], pa.string())
    out = {c: batch[c] for c in batch.column_names if c != text_col}
    redacted = text
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(text, pat), pa.int64()
        )
        redacted = pc.replace_substring_regex(redacted, pat, repl)
    out["redacted"] = redacted
    return pa.table(out)


def redact(ds, text_col: str = "text"):
    """Scrub PII from ``ds[text_col]``; adds per-class counts and a
    ``redacted`` column (original text column is dropped)."""
    return ds.map_batches(
        lambda b: redact_batch(b, text_col), batch_format="pyarrow"
    )
