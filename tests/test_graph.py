"""PageRank (stages/graph.py) + shuffle-shard export (sampling.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.stages.graph import pagerank
from theoremkb_ray.stages.sampling import shuffle_shards


def _edges_ds(E: np.ndarray, blocks: int = 4):
    perm = np.random.RandomState(1).permutation(len(E))
    t = pa.table(
        {
            "src": pa.array(E[perm, 0], pa.int64()),
            "dst": pa.array(E[perm, 1], pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def _local_pagerank(E, damping=0.85, iters=10):
    nodes = np.unique(E)
    n = len(nodes)
    src = np.searchsorted(nodes, E[:, 0])
    dst = np.searchsorted(nodes, E[:, 1])
    deg = np.bincount(src, minlength=n)
    dang = deg == 0
    invd = np.zeros(n)
    invd[~dang] = 1.0 / deg[~dang]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.bincount(dst, weights=(r * invd)[src], minlength=n)
        r = (1 - damping) / n + damping * (contrib + r[dang].sum() / n)
    return nodes, np.round(r * n, 6)


def test_pagerank_matches_local_reference_with_dangling():
    # star + chain + a dangling sink (node 99 has no out-edges)
    E = np.array(
        [[0, 1], [0, 2], [0, 3], [1, 2], [2, 3], [3, 0], [2, 99], [3, 99]],
        dtype=np.int64,
    )
    out = (
        pagerank(_edges_ds(E), iters=15)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    nodes, ref = _local_pagerank(E, iters=15)
    np.testing.assert_array_equal(out["node"].to_numpy(), nodes)
    np.testing.assert_allclose(out["rank"].to_numpy(), ref, atol=1e-6)
    # rank mass conservation: mean(rank_scaled) == 1
    assert out["rank"].mean() == pytest.approx(1.0, abs=1e-5)


def test_pagerank_partition_independent():
    rng = np.random.RandomState(5)
    E = np.unique(rng.randint(0, 200, size=(2000, 2)), axis=0)
    E = E[E[:, 0] != E[:, 1]].astype(np.int64)
    a = pagerank(_edges_ds(E, 2)).to_pandas().sort_values("node")
    b = pagerank(_edges_ds(E, 9)).to_pandas().sort_values("node")
    np.testing.assert_allclose(
        a["rank"].to_numpy(), b["rank"].to_numpy(), atol=2e-6
    )


def test_pagerank_empty():
    t = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    assert pagerank(rd.from_arrow(t)).count() == 0


def test_shuffle_shards_matches_window_reference():
    ids = np.arange(0, 5000, 3, dtype=np.int64)  # gappy keys
    perm = np.random.RandomState(2).permutation(len(ids))
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids[perm], pa.int64())})
    ).repartition(6)
    out = (
        shuffle_shards(ds, "doc_id", num_shards=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rnk = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
        1 << 32
    )
    df = pd.DataFrame({"doc_id": ids, "rnk": rnk.astype(np.int64)})
    # XOR-fold before the modulo (a bare Knuth rank's low bits are the
    # identity — see stages/sampling.py:shuffle_shards)
    df["shard"] = ((rnk >> np.uint64(16)) ^ rnk).astype(np.int64) % 16
    df["pos"] = (
        df.sort_values(["rnk", "doc_id"])
        .groupby("shard")
        .cumcount()
        .sort_index()
    )
    df = df.sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_array_equal(
        out["shard"].to_numpy(), df["shard"].to_numpy()
    )
    np.testing.assert_array_equal(
        out["pos"].to_numpy(), df["pos"].to_numpy()
    )
    # positions are a permutation of 0..n-1 within each shard
    for s, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))


def test_pagerank_distributed_matches_broadcast():
    from theoremkb_ray.stages.graph import pagerank, pagerank_distributed

    # ring + chords, duplicate-free via set (set-dedup keeps the ring
    # edge when a chord coincides with it, so no node goes dangling —
    # the distributed variant's documented contract)
    n = 200
    src = list(range(n)) + [i for i in range(0, n, 3)]
    dst = [(i + 1) % n for i in range(n)] + [
        (i * 7 + 3) % n for i in range(0, n, 3)
    ]
    edges = sorted(set(zip(src, dst)))
    tbl = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    a = (
        pagerank(ds, iters=8)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        pagerank_distributed(ds, iters=8)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert (a["node"] == b["node"]).all()
    # both 6-dp rounded; allow 1 ulp of the rounding grid for float
    # association differences between the two physical plans
    assert (np.abs(a["rank"] - b["rank"]) <= 1e-6 + 1e-12).all()
