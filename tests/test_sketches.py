"""Mergeable-sketch operators: HLL distinct, Count-Min heavy hitters,
deterministic uniform sampling (stages/sketches.py).

The estimators can't be value-hash-oracled (they are approximate by
design), so these tests pin the guarantees that matter at scale:
error bounds vs exact answers, merge associativity across block
splits, and partitioning-independence of the sample."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.functions.hashing import hash_strings
from theoremkb_ray.stages.sketches import (
    approx_distinct,
    cm_partial,
    cm_query,
    heavy_hitters,
    hll_estimate,
    hll_partial,
    uniform_sample,
)


def _string_ds(values, blocks=8):
    return rd.from_arrow(
        pa.table({"v": pa.array(values, pa.string())})
    ).repartition(blocks)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(11)
    vals = [f"user_{i}" for i in rng.integers(0, 50_000, size=200_000)]
    exact = len(set(vals))
    est = approx_distinct(_string_ds(vals), "v")
    assert abs(est - exact) / exact < 0.02  # p=14 -> ~0.8% typical

    # merge = element-wise max: splitting the stream must not change
    # the registers (the property that makes the partial per-block)
    h = hash_strings(np.array(vals, dtype=object))
    whole = hll_partial(h)
    merged = np.maximum(hll_partial(h[:67_331]), hll_partial(h[67_331:]))
    assert np.array_equal(whole, merged)
    assert hll_estimate(whole) == hll_estimate(merged)


def test_hll_small_range_linear_counting():
    vals = [f"k{i}" for i in range(300)]
    est = approx_distinct(_string_ds(vals, blocks=3), "v")
    assert abs(est - 300) / 300 < 0.05


def test_cm_overestimates_never_under():
    rng = np.random.default_rng(5)
    vals = np.array(
        [f"item_{i}" for i in rng.zipf(1.5, size=50_000) % 1000],
        dtype=object,
    )
    sk = cm_partial(hash_strings(vals))
    uniq, true_counts = np.unique(vals.astype(str), return_counts=True)
    ests = cm_query(sk, hash_strings(uniq.astype(object)))
    assert (ests >= true_counts).all()  # CM never underestimates
    # width 16k >> 1k distinct: estimates are near-exact here
    assert (ests - true_counts).max() <= 2


def test_heavy_hitters_recovers_planted_skew():
    rng = np.random.default_rng(3)
    tail = [f"cold_{i}" for i in rng.integers(0, 5_000, size=30_000)]
    hot = [f"hot_{i % 10}" for i in range(40_000)]  # 4k each vs ~6 tail
    vals = tail + hot
    rng.shuffle(vals)
    out = heavy_hitters(_string_ds(vals), "v", k=10)
    assert sorted(out["value"]) == [f"hot_{i}" for i in range(10)]
    true = pd.Series(vals).value_counts()
    for _, row in out.iterrows():
        assert row["est_count"] >= true[row["value"]]  # overestimate only


def test_uniform_sample_deterministic_across_partitionings():
    vals = [f"doc_{i}" for i in range(20_000)]
    a = uniform_sample(_string_ds(vals, blocks=4), "v", k=100, seed=9)
    b = uniform_sample(_string_ds(vals, blocks=32), "v", k=100, seed=9)
    sa = sorted(a.to_pandas()["v"])
    sb = sorted(b.to_pandas()["v"])
    assert sa == sb and len(sa) == 100
    assert set(sa) <= set(vals)
    # a different seed picks a (near-)disjoint sample
    c = uniform_sample(_string_ds(vals, blocks=4), "v", k=100, seed=10)
    assert len(set(sorted(c.to_pandas()["v"])) & set(sa)) < 10


def test_uniform_sample_is_unbiased_across_range():
    # ranks are a hash: the 500-sample of 0..49999 should span the key
    # space instead of clustering (a smoke test against accidental
    # correlation between key order and rank)
    vals = [f"{i:06d}" for i in range(50_000)]
    s = uniform_sample(_string_ds(vals), "v", k=500, seed=1).to_pandas()
    picked = np.sort(s["v"].astype(int).to_numpy())
    assert picked[0] < 2_000 and picked[-1] > 48_000
    gaps = np.diff(picked)
    assert gaps.max() < 1_500  # mean gap 100; a huge hole = clustering


@pytest.mark.parametrize("k", [1, 7])
def test_uniform_sample_small_k(k):
    vals = [f"x{i}" for i in range(50)]
    out = uniform_sample(_string_ds(vals, blocks=2), "v", k=k).to_pandas()
    assert len(out) == k


def test_tdigest_quantiles_accuracy():
    import ray.data as rd

    from theoremkb_ray.stages.sketches import tdigest_quantiles

    rng = np.random.RandomState(6)
    # skewed distribution: lognormal
    x = rng.lognormal(0.0, 1.0, size=50_000)
    ds = rd.from_arrow(
        pa.table({"v": pa.array(x, pa.float64())})
    ).repartition(13)
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = tdigest_quantiles(ds, "v", qs, delta=200)
    for q in qs:
        exact_rank = q * len(x)
        # rank error bound ~ 4 * N * q(1-q) / delta, with slack
        tol = max(4.0 * len(x) * q * (1 - q) / 200, 2.0) * 3
        got_rank = float((x <= got[q]).sum())
        assert abs(got_rank - exact_rank) <= tol, (q, got_rank, exact_rank)
    # extremes clamp to the true min/max
    ext = tdigest_quantiles(ds, "v", [0.0, 1.0], delta=200)
    assert ext[0.0] == x.min() and ext[1.0] == x.max()


def test_tdigest_partition_invariance_is_approximate_but_stable():
    import ray.data as rd

    from theoremkb_ray.stages.sketches import tdigest_quantiles

    rng = np.random.RandomState(9)
    x = rng.randn(20_000)
    t1 = tdigest_quantiles(
        rd.from_arrow(pa.table({"v": pa.array(x)})).repartition(3),
        "v", [0.5], delta=200,
    )
    t2 = tdigest_quantiles(
        rd.from_arrow(pa.table({"v": pa.array(x)})).repartition(17),
        "v", [0.5], delta=200,
    )
    # different partitionings give different digests but both land
    # within the rank-error envelope of the true median
    for t in (t1, t2):
        rank = float((x <= t[0.5]).sum())
        assert abs(rank - 10_000) < 600


def test_tdigest_grouped_accuracy():
    import ray.data as rd

    from theoremkb_ray.stages.sketches import tdigest_quantiles_grouped

    rng = np.random.RandomState(12)
    g = rng.randint(0, 5, size=30_000)
    # distinct per-group distributions (shifted normals)
    x = rng.randn(30_000) + g * 10.0
    ds = rd.from_arrow(
        pa.table(
            {
                "grp": pa.array(g.astype(np.int64)),
                "v": pa.array(x, pa.float64()),
            }
        )
    ).repartition(9)
    out = tdigest_quantiles_grouped(
        ds, "grp", "v", [0.1, 0.5, 0.9], delta=100
    ).to_pandas()
    assert len(out) == 15
    for _, row in out.iterrows():
        sel = x[g == row["grp"]]
        rank = float((sel <= row["est"]).sum())
        want = row["q"] * len(sel)
        tol = max(4 * len(sel) * row["q"] * (1 - row["q"]) / 100, 2) * 3
        assert abs(rank - want) <= tol, (row["grp"], row["q"])


def test_approx_distinct_grouped():
    import ray.data as rd

    from theoremkb_ray.stages.sketches import approx_distinct_grouped

    rng = np.random.RandomState(3)
    n = 40_000
    g = rng.randint(0, 4, size=n)
    # group k draws from a key space of size 100 * 10^k
    keys = np.array(
        [rng.randint(0, 100 * 10 ** gi) for gi in g], dtype=np.int64
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "grp": pa.array(g.astype(np.int64)),
                "k": pa.array(keys),
            }
        )
    ).repartition(11)
    out = (
        approx_distinct_grouped(ds, "grp", "k")
        .to_pandas()
        .set_index("grp")
        .sort_index()
    )
    import pandas as pd

    exact = (
        pd.DataFrame({"grp": g, "k": keys})
        .groupby("grp")["k"]
        .nunique()
    )
    for gi in range(4):
        got = out.loc[gi, "n_distinct_approx"]
        want = exact[gi]
        assert abs(got - want) / want < 0.08, (gi, got, want)
