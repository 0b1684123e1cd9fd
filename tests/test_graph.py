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


def _mk_edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    ).repartition(5)


def _ref_graph(n=120):
    # ring + tendrils: multiples of 3 form a squared ring (deg >= 4);
    # every other node hangs off a chain so peeling takes many rounds
    pairs = []
    ring = [i for i in range(n) if i % 3 == 0]
    for idx, i in enumerate(ring):
        pairs.append((i, ring[(idx + 1) % len(ring)]))
        pairs.append((i, ring[(idx + 2) % len(ring)]))
    for i in range(1, n):
        if i % 3 != 0:
            pairs.append((i, i // 2))  # tree tendril
    # direction noise + duplicates + self loop (normalized away)
    pairs += [(b, a) for a, b in pairs[:17]] + [(5, 5), (9, 12), (9, 12)]
    return n, pairs


def _adj_from(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def test_kcore_matches_local_peel():
    from theoremkb_ray.stages.graph import kcore

    n, pairs = _ref_graph()
    adj = _adj_from(pairs)
    alive = set(adj)
    k = 3
    while True:
        drop = {u for u in alive if len(adj[u] & alive) < k}
        if not drop:
            break
        alive -= drop
    got = kcore(_mk_edges(pairs), k=k).to_pandas().sort_values("node")
    assert list(got["node"]) == sorted(alive)
    for _, r in got.iterrows():
        assert r["core_deg"] == len(adj[r["node"]] & alive)
    assert len(alive) > 0  # the squared ring must survive


def test_kcore_empty_core():
    from theoremkb_ray.stages.graph import kcore

    # pure tree: 2-core is empty, peel cascades over many rounds
    pairs = [(i, i // 2) for i in range(1, 64)]
    out = kcore(_mk_edges(pairs), k=2)
    assert out.schema().names == ["node", "core_deg"]
    assert out.count() == 0


def test_bfs_hops_matches_local_bfs():
    from collections import deque

    from theoremkb_ray.stages.graph import bfs_hops

    n, pairs = _ref_graph()
    adj = _adj_from(pairs)
    dist = {0: 0, 7: 0}
    q = deque([0, 7])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    cap = 6
    want = sorted((u, d) for u, d in dist.items() if d <= cap)
    got = bfs_hops(_mk_edges(pairs), seeds=[0, 7], max_hops=cap).to_pandas()
    assert sorted(zip(got["node"], got["hops"])) == want


def test_link_predict_matches_local_reference():
    import math

    from theoremkb_ray.stages.graph import link_predict

    n, pairs = _ref_graph()
    adj = _adj_from(pairs)
    scores = {}
    nodes = sorted(adj)
    for c in nodes:
        nbrs = sorted(adj[c])
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                a, b = nbrs[i], nbrs[j]
                if b in adj[a]:
                    continue
                cn, aa = scores.get((a, b), (0, 0.0))
                scores[(a, b)] = (cn + 1, aa + 1.0 / math.log(len(adj[c])))
    want = {
        (a, b): (
            cn,
            round(cn / (len(adj[a]) + len(adj[b]) - cn), 6),
            round(aa, 6),
        )
        for (a, b), (cn, aa) in scores.items()
        if cn >= 2
    }
    got = link_predict(_mk_edges(pairs), min_common=2).to_pandas()
    got_map = {
        (r.a, r.b): (r.cn, r.jaccard, r.adamic_adar)
        for r in got.itertuples()
    }
    assert set(got_map) == set(want)
    for key in want:
        assert got_map[key][0] == want[key][0], key
        assert abs(got_map[key][1] - want[key][1]) <= 1e-6
        assert abs(got_map[key][2] - want[key][2]) <= 1e-6
    assert len(want) > 10


def test_round3_graph_partition_independence():
    from theoremkb_ray.stages.graph import bfs_hops, kcore

    n, pairs = _ref_graph(60)
    for parts in (1, 11):
        ds = _mk_edges(pairs).repartition(parts)
        a = kcore(ds, k=3).to_pandas().sort_values("node").reset_index(drop=True)
        b = (
            bfs_hops(ds, seeds=[0], max_hops=8)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        if parts == 1:
            ref_a, ref_b = a, b
        else:
            assert ref_a.equals(a)
            assert ref_b.equals(b)


def _local_harmonic(E, max_hops=3):
    """Dict-BFS reference: per source, min distance to every node <= max_hops."""
    adj: dict[int, list[int]] = {}
    for s, d in E:
        if s != d:
            adj.setdefault(int(s), []).append(int(d))
    rows = []
    nodes = sorted({int(x) for e in E for x in e})
    for u in nodes:
        dist = {u: 0}
        frontier = [u]
        for d in range(1, max_hops + 1):
            nxt = []
            for v in frontier:
                for w in adj.get(v, ()):
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        ds = [d for v, d in dist.items() if v != u]
        if ds:
            rows.append(
                (
                    u,
                    len(ds),
                    max(ds),
                    round(sum(1.0 / d for d in ds), 6),
                )
            )
    return pd.DataFrame(
        rows, columns=["node", "n_reach", "ecc", "harmonic"]
    )


def test_harmonic_bounded_matches_local_bfs():
    from theoremkb_ray.stages.graph import harmonic_bounded

    rng = np.random.RandomState(7)
    E = rng.randint(0, 40, size=(150, 2)).astype(np.int64)
    out = (
        harmonic_bounded(_edges_ds(E, blocks=5), max_hops=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    ref = _local_harmonic(E).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"node": "int64", "n_reach": "int64", "ecc": "int64"}),
        ref.astype({"node": "int64", "n_reach": "int64", "ecc": "int64"}),
    )


def test_harmonic_bounded_chain_exact():
    from theoremkb_ray.stages.graph import harmonic_bounded

    # directed chain 0->1->2->3->4: hop-3 horizon truncates 0's reach
    E = np.array([[0, 1], [1, 2], [2, 3], [3, 4]], dtype=np.int64)
    out = (
        harmonic_bounded(_edges_ds(E, blocks=2), max_hops=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out.loc[out["node"] == 0, "n_reach"].item() == 3
    assert out.loc[out["node"] == 0, "ecc"].item() == 3
    assert out.loc[out["node"] == 0, "harmonic"].item() == round(
        1 + 1 / 2 + 1 / 3, 6
    )
    assert 4 not in set(out["node"])  # sink reaches nothing


def test_feature_propagate_exact_and_partition_invariant():
    """h_{k+1}(v) = h_k(v) + sum of in-neighbour h_k; tiny graph with
    hand-computed rounds, re-run at a different partitioning."""
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.stages.graph import feature_propagate

    # edges: 0->1, 1->2, 2->0, 0->2 ; feats x = node + 1
    edges = pa.table(
        {"src": pa.array([0, 1, 2, 0], pa.int64()),
         "dst": pa.array([1, 2, 0, 2], pa.int64())}
    )
    feats = pa.table(
        {"node": pa.array([0, 1, 2, 3], pa.int64()),
         "x": pa.array([1, 2, 3, 7], pa.int64())}
    )
    # round 1: h1(0)=1+3=4, h1(1)=2+1=3, h1(2)=3+2+1=6, h1(3)=7 (no in)
    # round 2: h2(0)=4+6=10, h2(1)=3+4=7, h2(2)=6+3+4=13, h2(3)=7
    want = {0: (4, 10), 1: (3, 7), 2: (6, 13), 3: (7, 7)}
    for parts in (1, 3):
        out = feature_propagate(
            rd.from_arrow(edges).repartition(parts),
            rd.from_arrow(feats).repartition(parts),
            rounds=2,
        ).to_pandas()
        got = {
            int(r.node): (int(r.h1), int(r.h2))
            for r in out.itertuples(False)
        }
        assert got == want, got


def test_personalized_pagerank_teleports_to_seeds():
    """On a directed star 0->1..4 plus back-edges, PPR seeded at {0}
    must (a) conserve total mass, (b) give 0 a much higher rank than
    uniform PageRank does, (c) leave unreachable-from-seed nodes at
    rank 0 when no path exists."""
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.stages.graph import pagerank

    # component A: 0 <-> 1, 0 <-> 2 ; component B: 3 <-> 4
    edges = pa.table(
        {
            "src": pa.array([0, 1, 0, 2, 3, 4], pa.int64()),
            "dst": pa.array([1, 0, 2, 0, 4, 3], pa.int64()),
        }
    )
    ds = rd.from_arrow(edges)
    out = pagerank(ds, iters=30, seeds=[0]).to_pandas()
    r = dict(zip(out["node"], out["rank"]))
    n = len(r)
    # mass conservation: raw ranks sum to 1 -> scaled ranks sum to n
    assert abs(sum(r.values()) - n) < 1e-3
    # seed dominates its component
    assert r[0] > r[1] > 0
    assert abs(r[1] - r[2]) < 1e-9  # symmetric leaves
    # disconnected component gets NO personalized mass
    assert r[3] == 0.0 and r[4] == 0.0
    # unknown seed raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(ds, iters=2, seeds=[99]).to_pandas()


def test_harmonic_plans_agree(ray_session):
    """Broadcast-CSR BFS and the distributed frontier-join plan must
    produce identical centralities."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.stages.graph import harmonic_bounded

    rng = np.random.RandomState(5)
    n = 120
    src = rng.randint(0, n, 500)
    dst = (src + rng.randint(1, 9, 500)) % n
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    ).repartition(4)
    fast = (
        harmonic_bounded(ds, max_hops=3, plan="broadcast")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    slow = (
        harmonic_bounded(ds, max_hops=3, plan="distributed")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0


def test_feature_propagate_plans_agree(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.stages.graph import feature_propagate

    rng = np.random.RandomState(9)
    n = 60
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(rng.randint(0, n, 300), pa.int64()),
                "dst": pa.array(rng.randint(0, n, 300), pa.int64()),
            }
        )
    ).repartition(4)
    feats = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(np.arange(n), pa.int64()),
                "x": pa.array(rng.randint(0, 5, n), pa.int64()),
            }
        )
    ).repartition(3)
    fast = (
        feature_propagate(edges, feats, rounds=2, plan="broadcast")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    slow = (
        feature_propagate(edges, feats, rounds=2, plan="distributed")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)


# ------------------------------------------ HITS / label propagation


def _local_hits(E: np.ndarray, rounds: int = 1):
    nodes = np.unique(E)
    src = np.searchsorted(nodes, E[:, 0])
    dst = np.searchsorted(nodes, E[:, 1])
    h = np.ones(len(nodes), np.int64)
    for _ in range(rounds):
        a = np.bincount(dst, weights=h[src], minlength=len(nodes)).astype(
            np.int64
        )
        h = np.bincount(src, weights=a[dst], minlength=len(nodes)).astype(
            np.int64
        )
    a = np.bincount(dst, weights=h[src], minlength=len(nodes)).astype(
        np.int64
    )
    return nodes, h, a


def test_hits_matches_local_reference():
    from theoremkb_ray.stages.graph import hits

    rng = np.random.RandomState(5)
    E = rng.randint(0, 40, size=(300, 2)).astype(np.int64)
    got = (
        hits(_edges_ds(E), rounds=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    nodes, h, a = _local_hits(E, rounds=2)
    assert (got["node"].to_numpy() == nodes).all()
    assert (got["hub"].to_numpy() == h).all()
    assert (got["auth"].to_numpy() == a).all()


def test_hits_budget_gate_raises():
    from theoremkb_ray.stages.graph import hits

    E = np.array([[0, 1], [1, 2], [2, 0]], np.int64)
    with pytest.raises(ValueError, match="broadcast_budget_rows"):
        hits(_edges_ds(E, blocks=1), broadcast_budget_rows=2)


def _local_label_prop(E: np.ndarray, rounds: int = 3):
    # undirected, deduped, no self loops; synchronous mode updates
    und = set()
    for s, d in E:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj: dict[int, list[int]] = {}
    for s, d in und:
        adj.setdefault(int(s), []).append(int(d))
        adj.setdefault(int(d), []).append(int(s))
    nodes = sorted(adj)
    lab = {v: v for v in nodes}
    for _ in range(rounds):
        nxt = {}
        for v in nodes:
            cnt: dict[int, int] = {}
            for u in adj[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[v] = best
        lab = nxt
    return nodes, [lab[v] for v in nodes]


def test_label_propagation_matches_local_and_plans_agree():
    from theoremkb_ray.stages.graph import label_propagation

    rng = np.random.RandomState(9)
    # two planted cliques of 12 + a single bridge edge
    A = np.array(
        [(i, j) for i in range(12) for j in range(i + 1, 12)], np.int64
    )
    B = A + 100
    E = np.vstack([A, B, [[5, 105]]])
    # shuffle + duplicate some edges, add reversed copies
    E = np.vstack([E, E[rng.permutation(len(E))[:20]][:, ::-1]])

    got_b = (
        label_propagation(_edges_ds(E), rounds=3, plan="broadcast")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    got_d = (
        label_propagation(_edges_ds(E), rounds=3, plan="distributed")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    nodes, lab = _local_label_prop(E, rounds=3)
    assert got_b["node"].tolist() == nodes
    assert got_b["label"].tolist() == lab
    # plan agreement: broadcast and distributed produce identical labels
    assert got_d["node"].tolist() == got_b["node"].tolist()
    assert got_d["label"].tolist() == got_b["label"].tolist()
    # planted communities recovered: each clique converges to one label
    df = got_b.set_index("node")["label"]
    assert df.loc[list(range(12))].nunique() == 1
    assert df.loc[list(range(100, 112))].nunique() == 1


def test_boruvka_mst_matches_kruskal():
    """Distributed Boruvka vs a literal Kruskal under the same
    (w, packed-key) total order: identical edge set and total weight
    on random graphs, at several partition counts."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.stages.graph import boruvka_mst

    rng = np.random.RandomState(7)
    for trial in range(3):
        n = 40
        m = 120
        src = rng.randint(0, n, m).astype(np.int64)
        dst = rng.randint(0, n, m).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        w = rng.randint(1, 50, len(src)).astype(np.int64)
        tbl = pa.table({"src": src, "dst": dst, "w": w})

        # brute Kruskal with the same deterministic tie order
        key = (src.astype(np.uint64) << np.uint64(32)) | dst.astype(
            np.uint64
        )
        order = np.lexsort((key.astype(np.int64), w))
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        want = set()
        total = 0
        for i in order:
            a, b = find(int(src[i])), find(int(dst[i]))
            if a == b:
                continue
            parent[max(a, b)] = min(a, b)
            want.add(int(key[i]))
            total += int(w[i])

        got_tbl, n_comp = boruvka_mst(
            rd.from_arrow(tbl).repartition(3 + trial)
        )
        got = set(
            (int(s) << 32) | int(d)
            for s, d in zip(
                got_tbl["src"].to_pylist(), got_tbl["dst"].to_pylist()
            )
        )
        assert got == want, trial
        assert int(sum(got_tbl["w"].to_pylist())) == total
        # forest size identity: edges = nodes_touched - components
        touched = len(np.unique(np.r_[src, dst]))
        assert len(got) == touched - n_comp


def test_boruvka_rejects_out_of_range_ids(ray_session):
    """Packed (src<<32|dst) tie-break keys silently collide for ids
    outside [0, 2^32) — must raise, not corrupt (round-3 ADVICE)."""
    import pytest
    import ray.data as rd

    from theoremkb_ray.stages.graph import boruvka_mst

    bad = pa.table(
        {
            "src": pa.array([0, 1 << 33], pa.int64()),
            "dst": pa.array([1, 2], pa.int64()),
            "w": pa.array([1, 2], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match=r"2\^32"):
        boruvka_mst(rd.from_arrow(bad))
    neg = pa.table(
        {
            "src": pa.array([-3], pa.int64()),
            "dst": pa.array([1], pa.int64()),
            "w": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="node ids"):
        boruvka_mst(rd.from_arrow(neg))


def test_boruvka_empty_edges_returns_empty_forest(ray_session):
    import ray.data as rd

    from theoremkb_ray.stages.graph import boruvka_mst

    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
        }
    )
    tbl, n_comp = boruvka_mst(rd.from_arrow(empty))
    assert tbl.num_rows == 0 and n_comp == 0
