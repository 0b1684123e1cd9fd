"""One-pass profiler (stages/profile.py:describe)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.profile import describe


def _ds(blocks=7):
    rng = np.random.RandomState(5)
    n = 3000
    vals = rng.randn(n) * 3 + 1000.0  # large mean vs spread: stability
    nulls = rng.rand(n) < 0.1
    num = pa.array(
        [None if m else float(v) for v, m in zip(vals, nulls)],
        pa.float64(),
    )
    cats = pa.array(
        [f"cat{int(i) % 37:02d}" for i in rng.randint(0, 37, n)],
        pa.string(),
    )
    return (
        rd.from_arrow(
            pa.table(
                {
                    "x": num,
                    "label": cats,
                    "k": pa.array(np.arange(n, dtype=np.int64)),
                }
            )
        ).repartition(blocks),
        vals[~nulls],
        int(nulls.sum()),
    )


def test_describe_stats_and_distinct():
    ds, clean, n_null = _ds()
    df = describe(ds).set_index("column")
    x = df.loc["x"]
    assert x["n"] == 3000 and x["n_null"] == n_null
    assert abs(x["mean"] - clean.mean()) < 1e-6
    assert abs(x["std"] - clean.std()) < 1e-6  # Welford vs numpy
    assert x["min"] == clean.min() and x["max"] == clean.max()
    lbl = df.loc["label"]
    assert lbl["min"] == "cat00" and lbl["max"] == "cat36"
    # HLL ~0.8% error at p=14; 37 distinct values
    assert abs(lbl["n_distinct_approx"] - 37) <= 2
    k = df.loc["k"]
    assert abs(k["n_distinct_approx"] - 3000) < 3000 * 0.05


def test_describe_partition_invariant_exact_stats():
    ds1, _, _ = _ds(blocks=2)
    ds2, _, _ = _ds(blocks=13)
    a = describe(ds1).set_index("column")
    b = describe(ds2).set_index("column")
    for c in ["x", "k"]:
        for stat in ["n", "n_null", "min", "max"]:
            assert a.loc[c][stat] == b.loc[c][stat]
        assert abs(a.loc[c]["mean"] - b.loc[c]["mean"]) < 1e-9
        assert abs(a.loc[c]["std"] - b.loc[c]["std"]) < 1e-9
