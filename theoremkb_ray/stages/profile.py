"""One-pass dataset profiling — the ``describe()`` every data
engineer runs before trusting a new table.

Single streamed pass over all requested columns at once; each block
emits one bounded partial row per column:

- numeric: (n, n_null, min, max, mean, M2) with the per-batch moments
  computed vectorized and merged via the Chan/Welford parallel update
  — numerically stable where naive sum-of-squares cancels (the same
  pathology fixed in rollup.segment_mean_std);
- strings: (n, n_null, min, max) plus an HLL register block for
  approximate distinct counts (`sketches.hll_partial`) — cardinality
  profiling without a distinct shuffle.

Driver state: columns × (a few scalars + 16 KiB HLL) — independent of
row count. The exact numeric stats are value-hash-checked by the
`describe_stats` oracle (DuckDB aggregate functions); the HLL
estimate is approximate by design and tested against exact distincts
in tests/test_profile.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import HLL_P, hll_estimate, hll_partial
from ..functions.hashing import hash_strings


def _merge_moments(a, b):
    """Chan et al. parallel (n, mean, M2) merge."""
    n1, m1, s1 = a
    n2, m2, s2 = b
    n = n1 + n2
    if n == 0:
        return (0.0, 0.0, 0.0)
    d = m2 - m1
    m = m1 + d * n2 / n
    s = s1 + s2 + d * d * n1 * n2 / n
    return (n, m, s)


def describe(ds, columns: list[str] | None = None) -> pd.DataFrame:
    """-> DataFrame(column, dtype, n, n_null, n_distinct_approx, min,
    max, mean, std) — one streamed pass, bounded partials."""
    schema = ds.schema()
    names = columns or schema.names
    types = {
        c: schema.base_schema.field(c).type for c in names
    }
    numeric = {
        c for c in names
        if pa.types.is_integer(types[c]) or pa.types.is_floating(types[c])
    }

    def partial(b: pa.Table) -> pa.Table:
        rows = []
        for c in names:
            col = b[c]
            n = len(col)
            n_null = col.null_count
            regs = hll_partial(
                hash_strings(
                    pc.cast(col, pa.string()).to_numpy(
                        zero_copy_only=False
                    )
                )
            )
            if c in numeric:
                x = col.to_numpy(zero_copy_only=False).astype(np.float64)
                x = x[~np.isnan(x)]
                if len(x):
                    mean = float(x.mean())
                    rows.append(
                        {
                            "column": c,
                            "n": n,
                            "n_null": n_null,
                            "lo": float(x.min()),
                            "hi": float(x.max()),
                            "m_n": float(len(x)),
                            "m_mean": mean,
                            "m_M2": float(((x - mean) ** 2).sum()),
                            "s_lo": "",
                            "s_hi": "",
                            "regs": regs.tobytes(),
                        }
                    )
                    continue
                rows.append(
                    {
                        "column": c, "n": n, "n_null": n_null,
                        "lo": np.nan, "hi": np.nan,
                        "m_n": 0.0, "m_mean": 0.0, "m_M2": 0.0,
                        "s_lo": "", "s_hi": "", "regs": regs.tobytes(),
                    }
                )
            else:
                valid = col.drop_null()
                s_lo = (
                    str(pc.min(valid).as_py()) if len(valid) else ""
                )
                s_hi = (
                    str(pc.max(valid).as_py()) if len(valid) else ""
                )
                rows.append(
                    {
                        "column": c, "n": n, "n_null": n_null,
                        "lo": np.nan, "hi": np.nan,
                        "m_n": 0.0, "m_mean": 0.0, "m_M2": 0.0,
                        "s_lo": s_lo, "s_hi": s_hi,
                        "regs": regs.tobytes(),
                    }
                )
        return pa.Table.from_pylist(rows)

    acc: dict[str, dict] = {}
    for b in (
        ds.select_columns(list(names))
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for row in b.to_pylist():
            c = row["column"]
            a = acc.setdefault(
                c,
                {
                    "n": 0, "n_null": 0, "lo": np.inf, "hi": -np.inf,
                    "mom": (0.0, 0.0, 0.0), "s_lo": None, "s_hi": None,
                    "regs": np.zeros(1 << HLL_P, np.uint8),
                },
            )
            a["n"] += row["n"]
            a["n_null"] += row["n_null"]
            if not np.isnan(row["lo"]):
                a["lo"] = min(a["lo"], row["lo"])
                a["hi"] = max(a["hi"], row["hi"])
            a["mom"] = _merge_moments(
                a["mom"], (row["m_n"], row["m_mean"], row["m_M2"])
            )
            if row["s_lo"]:
                a["s_lo"] = (
                    row["s_lo"] if a["s_lo"] is None
                    else min(a["s_lo"], row["s_lo"])
                )
                a["s_hi"] = (
                    row["s_hi"] if a["s_hi"] is None
                    else max(a["s_hi"], row["s_hi"])
                )
            np.maximum(
                a["regs"],
                np.frombuffer(row["regs"], np.uint8),
                out=a["regs"],
            )
    out = []
    for c in names:
        a = acc.get(c)
        if a is None:
            continue
        nm, mean, M2 = a["mom"]
        is_num = c in numeric
        out.append(
            {
                "column": c,
                "dtype": str(types[c]),
                "n": a["n"],
                "n_null": a["n_null"],
                "n_distinct_approx": round(hll_estimate(a["regs"]), 1),
                "min": (
                    a["lo"] if is_num and np.isfinite(a["lo"])
                    else a["s_lo"]
                ),
                "max": (
                    a["hi"] if is_num and np.isfinite(a["hi"])
                    else a["s_hi"]
                ),
                "mean": round(mean, 6) if is_num and nm else None,
                "std": (
                    round(float(np.sqrt(M2 / nm)), 6)
                    if is_num and nm
                    else None
                ),
            }
        )
    return pd.DataFrame(out)
