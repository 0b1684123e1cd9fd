"""Declarative data-quality expectations — the "contract check" a
production table runs before anything downstream trusts it (the
engine-grade version of the reference's scattered assert/check_dtype
calls, Styling/src/lib/misc/namespaces.py + notebook sanity cells).

Rules are data, not code::

    validate(ds, [
        {"column": "doc_id", "check": "not_null"},
        {"column": "doc_id", "check": "unique"},
        {"column": "n_chars", "check": "in_range", "lo": 0, "hi": 1e9},
        {"column": "lang", "check": "in_set", "values": ["en", "de"]},
        {"column": "sha", "check": "regex", "pattern": r"[0-9a-f]{64}"},
    ])

Execution shape: every per-row rule is one vectorized Arrow predicate
inside a SINGLE shared ``map_batches`` pass emitting per-rule
violation counts (bounded partials); ``unique`` is the one rule that
needs an exchange — only the checked column's values move, through a
coarse-keyed group count. ``mode="report"`` returns the per-rule
violation table; ``mode="raise"`` raises ``ValidationError`` naming
every failed rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings


class ValidationError(ValueError):
    """At least one expectation failed; message lists them all."""


def _rule_name(r: dict) -> str:
    extra = {
        k: v for k, v in r.items() if k not in ("column", "check")
    }
    tail = f" {extra}" if extra else ""
    return f"{r['column']}:{r['check']}{tail}"


def _violations(batch: pa.Table, r: dict) -> int:
    col = batch[r["column"]]
    check = r["check"]
    if check == "not_null":
        return col.null_count
    if check == "in_range":
        x = pc.cast(col, pa.float64())
        bad = pc.or_(
            pc.less(x, float(r["lo"])), pc.greater(x, float(r["hi"]))
        )
        return int(
            pc.sum(pc.cast(pc.fill_null(bad, True), pa.int64())).as_py()
            or 0
        )
    if check == "in_set":
        ok = pc.is_in(
            col, value_set=pa.array(list(r["values"]), col.type)
        )
        return int(
            pc.sum(
                pc.cast(pc.invert(pc.fill_null(ok, False)), pa.int64())
            ).as_py()
            or 0
        )
    if check == "regex":
        ok = pc.match_substring_regex(
            pc.cast(col, pa.string()), f"^(?:{r['pattern']})$"
        )
        return int(
            pc.sum(
                pc.cast(pc.invert(pc.fill_null(ok, False)), pa.int64())
            ).as_py()
            or 0
        )
    raise ValueError(f"unknown check {check!r}")


def validate(
    ds, rules: list[dict], mode: str = "report", coarse: int = 64
) -> pd.DataFrame:
    """-> DataFrame(rule, violations, rows) per rule (see module doc)."""
    per_row = [r for r in rules if r["check"] != "unique"]
    uniques = [r for r in rules if r["check"] == "unique"]
    cols = sorted({r["column"] for r in rules})
    ds = ds.select_columns(cols).materialize()

    counts: dict[str, int] = {_rule_name(r): 0 for r in rules}
    total = 0

    if per_row:

        def partial(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "n": pa.array([b.num_rows], pa.int64()),
                    **{
                        _rule_name(r): pa.array(
                            [_violations(b, r)], pa.int64()
                        )
                        for r in per_row
                    },
                }
            )

        for b in ds.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            total += int(pc.sum(b["n"]).as_py() or 0)
            for r in per_row:
                counts[_rule_name(r)] += int(
                    pc.sum(b[_rule_name(r)]).as_py() or 0
                )
    else:
        total = ds.count()

    for r in uniques:
        c = r["column"]

        def key(b: pa.Table, _c=c) -> pa.Table:
            vals = pc.cast(b[_c], pa.string()).to_numpy(
                zero_copy_only=False
            )
            ck = (hash_strings(vals) % np.uint64(coarse)).astype(np.int64)
            return pa.table(
                {"v": pa.array(vals, pa.string()), "ck": pa.array(ck)}
            )

        def dup_count(g: pd.DataFrame) -> pd.DataFrame:
            vc = g["v"].value_counts()
            # violations = rows beyond the first occurrence of each value
            return pd.DataFrame({"d": [int((vc - 1).clip(lower=0).sum())]})

        dups = (
            ds.map_batches(key, batch_format="pyarrow")
            .groupby("ck")
            .map_groups(dup_count, batch_format="pandas")
        )
        counts[_rule_name(r)] = int(
            sum(
                b["d"].to_numpy(zero_copy_only=False).sum()
                for b in dups.iter_batches(batch_format="pyarrow")
            )
        )

    report = pd.DataFrame(
        {
            "rule": [_rule_name(r) for r in rules],
            "violations": [counts[_rule_name(r)] for r in rules],
            "rows": total,
        }
    )
    if mode == "raise":
        bad = report[report["violations"] > 0]
        if len(bad):
            msg = "; ".join(
                f"{r['rule']} ({r['violations']} rows)"
                for _, r in bad.iterrows()
            )
            raise ValidationError(f"expectations failed: {msg}")
    return report
