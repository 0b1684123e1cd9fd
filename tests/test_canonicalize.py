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


def _triples_tbl():
    return pa.table(
        {
            "subject": pa.array(["b", "q", "y", "d"]),
            "predicate": pa.array(["cites"] * 4),
            "object": pa.array(["c", "x", "q", "z"]),
            "confidence": pa.array([1.0] * 4),
            "provenance": pa.array(["t"] * 4),
        }
    )


def test_canonicalize_triples_paths_identical():
    """All three physical plans (driver union-find + broadcast,
    distributed CC + broadcast, distributed CC + hash-join rewrite)
    produce the same rewritten triples."""
    from theoremkb_ray.stages.canonicalize import canonicalize_triples

    def run(edge_threshold, map_broadcast_max):
        out = canonicalize_triples(
            rd.from_arrow(_triples_tbl()),
            rd.from_arrow(_edges_tbl()),
            edge_threshold=edge_threshold,
            map_broadcast_max=map_broadcast_max,
        ).to_pandas()
        return sorted(zip(out["subject"], out["predicate"], out["object"]))

    local = run(10**6, 10**6)
    dist_broadcast = run(0, 10**6)
    dist_join = run(0, 0)
    # {a,b,c,d} -> a; {x,y} -> x; q untouched
    assert local == sorted(
        [("a", "cites", "a"), ("q", "cites", "x"),
         ("x", "cites", "q"), ("a", "cites", "z")]
    )
    assert dist_broadcast == local
    assert dist_join == local


def test_distributed_cc_raises_when_not_converged():
    import pytest

    nodes = [f"n{i:02d}" for i in range(12)]
    t = pa.table({"a": pa.array(nodes[1:]), "b": pa.array(nodes[:-1])})
    with pytest.raises(RuntimeError, match="not stable"):
        connected_components_distributed(rd.from_arrow(t), max_iters=2)


def test_rewrite_triples_searchsorted_matches_dict_semantics():
    # direct unit test of the broadcast-hash rewrite: mapped ids
    # rewritten in both columns, unmapped ids untouched, and ids that
    # merely SHARE A PREFIX with a mapped id stay untouched (the exact
    # string verify after the hash probe)
    from theoremkb_ray.stages.canonicalize import rewrite_triples

    canon = {f"e{i}": "root" for i in range(500)}
    subs = [f"e{i}" for i in range(500)] + ["e5000", "unrelated", "e1x"]
    objs = ["e499"] * 503
    t = pa.table(
        {
            "subject": pa.array(subs),
            "predicate": pa.array(["cites"] * len(subs)),
            "object": pa.array(objs),
            "confidence": pa.array([1.0] * len(subs)),
            "provenance": pa.array(["t"] * len(subs)),
        }
    )
    out = (
        rewrite_triples(rd.from_arrow(t).repartition(4), canon)
        .to_pandas()
        .sort_index()
    )
    want_subs = ["root"] * 500 + ["e5000", "unrelated", "e1x"]
    assert sorted(out["subject"]) == sorted(want_subs)
    assert set(out["object"]) == {"root"}
    # empty map is the identity
    same = rewrite_triples(rd.from_arrow(t), {}).to_pandas()
    assert sorted(same["subject"]) == sorted(subs)


def test_connected_components_wrapper_paths_identical():
    """The public CC operator returns identity rows too, and its
    local-fastpath and distributed outputs are identical."""
    from theoremkb_ray.stages.canonicalize import connected_components

    edges = rd.from_arrow(_edges_tbl())
    local = connected_components(edges).to_pandas()
    dist = connected_components(
        rd.from_arrow(_edges_tbl()), distributed_threshold=0
    ).to_pandas()
    as_map = lambda df: dict(zip(df["node"], df["label"]))  # noqa: E731
    assert as_map(local) == as_map(dist)
    # every node present, including component roots (identity rows)
    assert set(local["node"]) == {"a", "b", "c", "d", "x", "y"}
    assert as_map(local)["a"] == "a" and as_map(local)["x"] == "x"
