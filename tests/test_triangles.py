"""Triangle counting (stages/graph.py:triangle_count)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.graph import triangle_count


def _ds(src, dst, blocks=4):
    tbl = pa.table(
        {
            "src": pa.array(np.asarray(src, np.int64)),
            "dst": pa.array(np.asarray(dst, np.int64)),
        }
    )
    return rd.from_arrow(tbl).repartition(blocks)


def _count(ds):
    return int(triangle_count(ds).to_pandas()["triangles"].iloc[0])


def test_complete_graph():
    # K6: C(6,3) = 20 triangles
    src, dst = zip(*[(i, j) for i in range(6) for j in range(6) if i != j])
    assert _count(_ds(src, dst)) == 20


def test_ring_no_triangles():
    n = 50
    src = list(range(n))
    dst = [(i + 1) % n for i in src]
    assert _count(_ds(src, dst)) == 0


def test_ring_plus_two_chords():
    # edges (i, i+1) and (i, i+2): exactly n triangles (i, i+1, i+2)
    n = 40
    src = list(range(n)) * 2
    dst = [(i + 1) % n for i in range(n)] + [(i + 2) % n for i in range(n)]
    assert _count(_ds(src, dst)) == n


def test_normalization_multiedges_selfloops_direction():
    # one triangle {0,1,2} expressed with duplicates, reversals, loops
    src = [0, 1, 1, 2, 2, 0, 0, 5, 5]
    dst = [1, 0, 2, 1, 0, 2, 0, 6, 6]
    assert _count(_ds(src, dst, blocks=2)) == 1


def test_matches_bruteforce_on_random_graph():
    rng = np.random.RandomState(7)
    n = 60
    src, dst = [], []
    for _ in range(400):
        a, b = rng.randint(0, n, 2)
        src.append(a)
        dst.append(b)
    got = _count(_ds(src, dst, blocks=6))
    # brute force: adjacency matrix trace(A^3)/6
    A = np.zeros((n, n), np.int64)
    for a, b in zip(src, dst):
        if a != b:
            A[a, b] = A[b, a] = 1
    want = int(np.trace(A @ A @ A) // 6)
    assert got == want


def test_node_clustering_complete_graph():
    from theoremkb_ray.stages.graph import node_clustering

    # K5: every node in C(4,2)=6 triangles, coeff exactly 1.0
    src, dst = zip(*[(i, j) for i in range(5) for j in range(5) if i != j])
    out = node_clustering(_ds(src, dst)).to_pandas().sort_values("node")
    assert (out["triangles"] == 6).all()
    assert (out["coeff"] == 1.0).all()


def test_node_clustering_matches_bruteforce():
    from theoremkb_ray.stages.graph import node_clustering

    rng = np.random.RandomState(11)
    n = 40
    src = rng.randint(0, n, 300)
    dst = rng.randint(0, n, 300)
    out = (
        node_clustering(_ds(src, dst, blocks=5))
        .to_pandas()
        .set_index("node")
        .sort_index()
    )
    A = np.zeros((n, n), np.int64)
    for a, b in zip(src, dst):
        if a != b:
            A[a, b] = A[b, a] = 1
    tri = np.diag(A @ A @ A) // 2
    deg = A.sum(1)
    present = np.flatnonzero(deg > 0)
    assert list(out.index) == list(present)
    assert (out["triangles"].to_numpy() == tri[present]).all()
    denom = deg[present] * (deg[present] - 1)
    coeff = np.where(denom > 0, 2.0 * tri[present] / np.maximum(denom, 1), 0)
    assert np.allclose(out["coeff"].to_numpy(), np.round(coeff, 6))
