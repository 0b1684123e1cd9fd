"""Connected components + edge dedup correctness."""

import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.canonicalize import (
    connected_components_distributed,
    connected_components_local,
    dedup_pairs,
)


def _edges_tbl():
    # components: {a,b,c,d} (chain), {x,y}, {p} absent (no edges)
    return pa.table(
        {
            "a": pa.array(["b", "c", "d", "y"]),
            "b": pa.array(["a", "b", "c", "x"]),
        }
    )


def test_local_union_find():
    canon = connected_components_local(_edges_tbl())
    assert canon["b"] == "a" and canon["c"] == "a" and canon["d"] == "a"
    assert canon["y"] == "x" and canon["x"] == "x"


def test_distributed_matches_local():
    edges = rd.from_arrow(_edges_tbl())
    labels = connected_components_distributed(edges).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    want = connected_components_local(_edges_tbl())
    assert got == want


def test_distributed_long_chain_converges():
    # a chain of length 12 needs several propagation rounds
    nodes = [f"n{i:02d}" for i in range(12)]
    t = pa.table({"a": pa.array(nodes[1:]), "b": pa.array(nodes[:-1])})
    labels = connected_components_distributed(
        rd.from_arrow(t), max_iters=16
    ).to_pandas()
    assert set(labels["label"]) == {"n00"}


def test_dedup_pairs():
    t = pa.table(
        {
            "a": pa.array(["x", "x", "x", "y"]),
            "b": pa.array(["z", "z", "w", "z"]),
            "sim_a": pa.array([1, 1, 1, 2], pa.uint64()),
            "sim_b": pa.array([1, 1, 1, 2], pa.uint64()),
        }
    )
    out = dedup_pairs(rd.from_arrow(t)).to_pandas()
    assert len(out) == 3
    assert set(zip(out["a"], out["b"])) == {("x", "z"), ("x", "w"), ("y", "z")}
