"""FW-BW peeling SCC vs transitive-closure brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.graph import scc


def _edges_ds(src, dst, parallelism=1):
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, np.int64)),
                "dst": pa.array(np.asarray(dst, np.int64)),
            }
        )
    )
    return ds.repartition(parallelism) if parallelism > 1 else ds


def _brute_scc(src, dst, n):
    reach = np.eye(n, dtype=bool)
    reach[src, dst] = True
    for _ in range(n):
        new = reach | (reach @ reach)
        if (new == reach).all():
            break
        reach = new
    mutual = reach & reach.T
    scc_id = np.array([np.flatnonzero(mutual[i]).min() for i in range(n)])
    return scc_id


def _check(src, dst, n, parallelism=1, **kw):
    got = scc(_edges_ds(src, dst, parallelism), **kw).to_pandas()
    want = _brute_scc(np.asarray(src), np.asarray(dst), n)
    got_map = dict(zip(got["node"], got["scc_id"]))
    touched = set(map(int, src)) | set(map(int, dst))
    for v in touched:
        assert got_map[v] == want[v], (v, got_map[v], want[v])


def test_scc_cycle_and_tail():
    # 0->1->2->0 cycle with tail 2->3->4
    src = [0, 1, 2, 2, 3]
    dst = [1, 2, 0, 3, 4]
    _check(src, dst, 5, parallelism=3)


def test_scc_two_cycles_bridge():
    # cycles {0,1} and {2,3} bridged 1->2 (one-way: stays two SCCs)
    src = [0, 1, 1, 2, 3]
    dst = [1, 0, 2, 3, 2]
    _check(src, dst, 4)


def test_scc_random_vs_bruteforce():
    rng = np.random.default_rng(11)
    n = 40
    for trial in range(5):
        m = rng.integers(30, 90)
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        keep = src != dst
        _check(src[keep], dst[keep], n, parallelism=4)


def test_scc_distributed_path_matches_driver():
    src = [0, 1, 2, 2, 3, 5, 6]
    dst = [1, 2, 0, 3, 4, 6, 5]
    a = scc(_edges_ds(src, dst, 2)).to_pandas()
    b = scc(_edges_ds(src, dst, 2), driver_threshold=0).to_pandas()
    am = dict(zip(a["node"], a["scc_id"]))
    bm = dict(zip(b["node"], b["scc_id"]))
    assert am == bm
