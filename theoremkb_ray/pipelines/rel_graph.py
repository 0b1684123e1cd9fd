"""Graph and triple-store queries (centrality, components, paths, KG patterns over the customer-derived store).

Split from pipelines/relational.py (round 5) purely for maintainability;
every query registers into the shared REGISTRY exactly as before and
is re-exported by pipelines/relational.py.
"""


from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from ..stages.joins import broadcast_join, hash_join

from .relcore import (  # noqa: F401
    REGISTRY,
    _by_user_bucket,
)
from . import relcore as _relcore


def _pq(sf_dir, table, columns=None):
    # late-bound so tests can monkeypatch relcore._pq in
    # ONE place and every domain module sees it
    return _relcore._pq(sf_dir, table, columns)


def q_connected_components(sf_dir: str):
    """Connected components over a deterministic LONG-CHAIN graph:
    edges c_custkey -> c_custkey+1 except where c_custkey % 101 == 0,
    so components are 101-key intervals of diameter 100 — the regime
    that punishes any CC implementation with a fixed low iteration
    cap. Node ids travel as 12-digit zero-padded strings (the CC
    kernel's lexicographic MIN == numeric MIN), cast back to int64 at
    the edge. Oracle = DuckDB recursive-CTE transitive closure."""
    from ..stages.canonicalize import connected_components

    cust = _pq(sf_dir, "customer", ["c_custkey"])

    def edges(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = k[k % 101 != 0]

        def pad(x: np.ndarray):
            return pc.utf8_lpad(
                pc.cast(pa.array(x, pa.int64()), pa.string()), 12, "0"
            )

        return pa.table({"a": pad(a), "b": pad(a + 1)})

    labs = connected_components(
        cust.map_batches(edges, batch_format="pyarrow")
    )

    def unpad(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(b["node"], pa.int64()),
                "component": pc.cast(b["label"], pa.int64()),
            }
        )

    return labs.map_batches(unpad, batch_format="pyarrow")


SQL_CONNECTED_COMPONENTS = """
WITH RECURSIVE e AS (
  SELECT c_custkey AS a, c_custkey + 1 AS b
  FROM customer WHERE c_custkey % 101 <> 0
),
und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
reach(node, s) AS (
  SELECT a, a FROM und GROUP BY a
  UNION
  SELECT und.b, reach.s FROM reach JOIN und ON und.a = reach.node
)
SELECT node, MIN(s) AS component FROM reach GROUP BY node
"""


def q_pagerank(sf_dir: str):
    """Power-iteration PageRank (stages/graph.py) over a deterministic
    ring+chord digraph on the customer keys: every node has the ring
    edge ``c -> (c+1) % N``; every third node adds the chord
    ``c -> (7c+3) % N``. No dangling nodes, in-degree >= 1 everywhere,
    diameter ~N/chords — an honest iterative-convergence workload.
    Edge duplicates (chord == ring target) are masked per ROW, so no
    global dedup exchange is needed. Oracle = DuckDB recursive CTE
    with aggregate recursion (10 exact iterations)."""
    from ..stages.graph import pagerank

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n  # drop chords equal to the ring edge
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    return pagerank(
        cust.map_batches(edges, batch_format="pyarrow"),
        damping=0.85,
        iters=10,
    )


SQL_PAGERANK = """
WITH RECURSIVE
cnt AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src,
         (c_custkey + 1) % (SELECT n FROM cnt) AS dst
  FROM customer
  UNION
  SELECT c_custkey AS src,
         (c_custkey * 7 + 3) % (SELECT n FROM cnt) AS dst
  FROM customer WHERE c_custkey % 3 = 0
),
dg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src),
pr(it, node, r) AS (
  SELECT 0, c_custkey, CAST(1.0 AS DOUBLE) / (SELECT n FROM cnt)
  FROM customer
  UNION ALL
  SELECT p.it + 1, e.dst,
         CAST(0.15 AS DOUBLE) / (SELECT n FROM cnt)
           + CAST(0.85 AS DOUBLE) * SUM(p.r / dg.d)
  FROM pr p JOIN dg ON dg.src = p.node JOIN e ON e.src = p.node
  WHERE p.it < 10
  GROUP BY p.it + 1, e.dst
)
SELECT node, round(r * (SELECT n FROM cnt), 6) AS rank
FROM pr WHERE it = 10
"""


def q_triangle_count(sf_dir: str):
    """Exact triangle count (stages/graph.py:triangle_count —
    degree-oriented wedge generation + coarse closure exchange) over a
    deterministic undirected graph on the customer keys: ring edges
    (i, i+1) and (i, i+2) — one triangle per node — plus chords
    (i, 5i+1) for every 4th node for irregular degree. Normalization
    (direction/self-loop/multi-edge) is exercised because the
    generator emits raw directed rows and the chord can collide with
    ring edges. Oracle = DuckDB 3-way self-join on the id-ordered
    unique edge set."""
    from ..stages.graph import triangle_count

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = c[c % 4 == 0]
        src = np.concatenate([c, c, ch])
        dst = np.concatenate([(c + 1) % n, (c + 2) % n, (ch * 5 + 1) % n])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return triangle_count(cust.map_batches(edges, batch_format="pyarrow"))


SQL_TRIANGLE_COUNT = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
raw AS (
  SELECT c_custkey AS a, (c_custkey + 1) % (SELECT n FROM cnt) AS b
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey + 2) % (SELECT n FROM cnt) FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 5 + 1) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 4 = 0
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
)
SELECT count(*) AS triangles
FROM e e1
JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
"""


def q_node_clustering(sf_dir: str):
    """Per-node triangle counts + local clustering coefficient
    (stages/graph.py:node_clustering) over the same deterministic
    ring+chord graph as `triangle_count`; oracle unpivots the 3-way
    self-join over the triangle corners and derives the coefficient
    from the exact degrees."""
    from ..stages.graph import node_clustering

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = c[c % 4 == 0]
        src = np.concatenate([c, c, ch])
        dst = np.concatenate([(c + 1) % n, (c + 2) % n, (ch * 5 + 1) % n])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return node_clustering(cust.map_batches(edges, batch_format="pyarrow"))


SQL_NODE_CLUSTERING = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
raw AS (
  SELECT c_custkey AS a, (c_custkey + 1) % (SELECT n FROM cnt) AS b
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey + 2) % (SELECT n FROM cnt) FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 5 + 1) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 4 = 0
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
),
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
corners AS (
  SELECT a AS node FROM t
  UNION ALL SELECT b FROM t
  UNION ALL SELECT c FROM t
),
tri AS (SELECT node, count(*) AS triangles FROM corners GROUP BY node),
ends AS (
  SELECT u AS node FROM e UNION ALL SELECT v FROM e
),
deg AS (SELECT node, count(*) AS d FROM ends GROUP BY node)
SELECT deg.node,
       COALESCE(tri.triangles, 0) AS triangles,
       round(
         CASE WHEN deg.d >= 2
              THEN 2.0 * COALESCE(tri.triangles, 0)
                   / (deg.d * (deg.d - 1))
              ELSE 0.0 END, 6) AS coeff
FROM deg LEFT JOIN tri ON tri.node = deg.node
"""


REGISTRY.update({'connected_components': (q_connected_components, SQL_CONNECTED_COMPONENTS)})


REGISTRY.update({'pagerank': (q_pagerank, SQL_PAGERANK)})


REGISTRY.update({'triangle_count': (q_triangle_count, SQL_TRIANGLE_COUNT)})


REGISTRY.update({'node_clustering': (q_node_clustering, SQL_NODE_CLUSTERING)})


def q_kcore_nodes(sf_dir: str):
    """k-core decomposition (stages/graph.py:kcore — parallel peel,
    one streaming edge pass per round) over a deterministic graph
    built to need MULTIPLE peel rounds: the binary-tree edges
    (i, i//2) cascade-peel from the leaves up (~log2 n rounds) while a
    squared ring over the multiples of 5 (i, i+5), (i, i+10) keeps a
    guaranteed min-degree-4 3-core alive. Oracle replays the peel with
    a DuckDB recursive CTE carrying the surviving edge set per level
    (24 levels >= the peel depth at every tested sf)."""
    from ..stages.graph import kcore

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        tree = c[c >= 1]
        ring = c[c % 5 == 0]
        src = np.concatenate([tree, ring, ring])
        dst = np.concatenate(
            [tree // 2, (ring + 5) % n, (ring + 10) % n]
        )
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return kcore(cust.map_batches(edges, batch_format="pyarrow"), k=3)


SQL_KCORE_NODES = """
WITH RECURSIVE cnt AS (SELECT count(*) AS n FROM customer),
raw AS (
  SELECT c_custkey AS a, c_custkey // 2 AS b
  FROM customer WHERE c_custkey >= 1
  UNION ALL
  SELECT c_custkey, (c_custkey + 5) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey, (c_custkey + 10) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 5 = 0
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
),
peel(iter, u, v) AS (
  SELECT 0, u, v FROM e
  UNION ALL
  SELECT p.iter + 1, p.u, p.v
  FROM peel p
  WHERE p.iter < 24
    AND p.u IN (SELECT x FROM (
          SELECT u AS x, count(*) AS c FROM (
            SELECT u, v FROM peel UNION ALL SELECT v, u FROM peel
          ) GROUP BY 1) WHERE c >= 3)
    AND p.v IN (SELECT x FROM (
          SELECT u AS x, count(*) AS c FROM (
            SELECT u, v FROM peel UNION ALL SELECT v, u FROM peel
          ) GROUP BY 1) WHERE c >= 3)
),
core AS (SELECT u, v FROM peel WHERE iter = 24),
adj AS (SELECT u AS node, v FROM core UNION ALL SELECT v, u FROM core)
SELECT CAST(node AS BIGINT) AS node, count(*) AS core_deg
FROM adj GROUP BY node
"""


def q_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distance (stages/graph.py:bfs_hops —
    level-synchronous frontier, node-sized driver state) from node 0
    over the ring + multiplicative-chord graph (chords (i, 5i+1) every
    4th node make distances logarithmic). Capped at 16 hops on BOTH
    sides; oracle = DuckDB recursive UNION walk with min(d)."""
    from ..stages.graph import bfs_hops

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = c[c % 4 == 0]
        src = np.concatenate([c, ch])
        dst = np.concatenate([(c + 1) % n, (ch * 5 + 1) % n])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return bfs_hops(
        cust.map_batches(edges, batch_format="pyarrow"),
        seeds=[0],
        max_hops=16,
    )


SQL_BFS_HOPS = """
WITH RECURSIVE cnt AS (SELECT count(*) AS n FROM customer),
raw AS (
  SELECT c_custkey AS a, (c_custkey + 1) % (SELECT n FROM cnt) AS b
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 5 + 1) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 4 = 0
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
),
adj AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
walk(node, d) AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS d
  UNION
  SELECT adj.y, walk.d + 1
  FROM walk JOIN adj ON adj.x = walk.node
  WHERE walk.d < 16
)
SELECT node, CAST(min(d) AS BIGINT) AS hops FROM walk GROUP BY node
"""


def q_link_predict(sf_dir: str):
    """Link-prediction scores (stages/graph.py:link_predict — wedge
    generation with per-group pre-aggregated (pair, cn, aa) partials,
    existing edges riding the same exchange as the non-edge filter)
    over the triangle_count ring+chord graph: every non-edge pair with
    >= 2 common neighbors scored by common-neighbor count,
    neighborhood Jaccard, and Adamic-Adar. Oracle = DuckDB wedge
    self-join + ANTI JOIN against the edge set."""
    from ..stages.graph import link_predict

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = c[c % 4 == 0]
        src = np.concatenate([c, c, ch])
        dst = np.concatenate([(c + 1) % n, (c + 2) % n, (ch * 5 + 1) % n])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return link_predict(
        cust.map_batches(edges, batch_format="pyarrow"), min_common=2
    )


SQL_LINK_PREDICT = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
raw AS (
  SELECT c_custkey AS a, (c_custkey + 1) % (SELECT n FROM cnt) AS b
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey + 2) % (SELECT n FROM cnt) FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 5 + 1) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 4 = 0
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
),
adj AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT x, count(*) AS d FROM adj GROUP BY x),
w AS (
  SELECT a.y AS pa, b.y AS pb, count(*) AS cn,
         sum(1.0 / ln(dc.d)) AS aa
  FROM adj a
  JOIN adj b ON a.x = b.x AND a.y < b.y
  JOIN deg dc ON dc.x = a.x
  GROUP BY 1, 2
),
nw AS (SELECT w.* FROM w ANTI JOIN e ON e.u = w.pa AND e.v = w.pb)
SELECT CAST(pa AS BIGINT) AS a, CAST(pb AS BIGINT) AS b, cn,
       round(CAST(cn AS DOUBLE) / (da.d + db.d - cn), 6) AS jaccard,
       round(aa, 6) AS adamic_adar
FROM nw
JOIN deg da ON da.x = pa
JOIN deg db ON db.x = pb
WHERE cn >= 2
"""


REGISTRY.update({'kcore_nodes': (q_kcore_nodes, SQL_KCORE_NODES)})


REGISTRY.update({'bfs_hops': (q_bfs_hops, SQL_BFS_HOPS)})


REGISTRY.update({'link_predict': (q_link_predict, SQL_LINK_PREDICT)})


def q_sequence_triples(sf_dir: str):
    """Strict-adjacency sequence mining: per user, the number of
    click -> view -> purchase runs with NO intervening event (the
    contiguous variant of the funnel; transitions/funnel count
    non-contiguous progressions). Vectorized three-way shift compare
    inside user buckets; users with zero matches are dropped. Oracle
    = two lead() windows + filter."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        n = len(u)
        if n < 3:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_triples": pd.Series(dtype="int64"),
                }
            )
        hit = (
            (et[:-2] == "click")
            & (et[1:-1] == "view")
            & (et[2:] == "purchase")
            & (u[:-2] == u[2:])
        )
        uu, inv = np.unique(u[:-2][hit], return_inverse=True)
        return pd.DataFrame(
            {
                "user_id": uu,
                "n_triples": np.bincount(inv).astype(np.int64),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_SEQUENCE_TRIPLES = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e1,
         lead(event_type, 2) OVER w AS e2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, count(*) AS n_triples
FROM s
WHERE event_type = 'click' AND e1 = 'view' AND e2 = 'purchase'
GROUP BY user_id
"""


REGISTRY.update({'sequence_triples': (q_sequence_triples, SQL_SEQUENCE_TRIPLES)})


def q_harmonic_centrality(sf_dir: str):
    """Bounded-hop harmonic centrality
    (stages/graph.py:harmonic_bounded — all-pairs <=3-hop directed
    distances via iterated distributed frontier-edge hash joins, NO
    per-node driver state) over the pagerank ring+chord digraph.
    Emits per node: reachable-set size, 3-hop eccentricity, and
    sum(1/d). Oracle = DuckDB recursive UNION walk + min(d) with the
    identical hop cap."""
    from ..stages.graph import harmonic_bounded

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    return harmonic_bounded(
        cust.map_batches(edges, batch_format="pyarrow"), max_hops=3
    )


SQL_HARMONIC_CENTRALITY = """
WITH RECURSIVE cnt AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT c_custkey AS src,
           (c_custkey + 1) % (SELECT n FROM cnt) AS dst
    FROM customer
    UNION ALL
    SELECT c_custkey,
           (c_custkey * 7 + 3) % (SELECT n FROM cnt)
    FROM customer WHERE c_custkey % 3 = 0)
  WHERE src <> dst),
walk(src, dst, d) AS (
  SELECT src, dst, 1 FROM e
  UNION
  SELECT w.src, e.dst, w.d + 1
  FROM walk w JOIN e ON e.src = w.dst WHERE w.d < 3
),
md AS (
  SELECT src, dst, min(d) AS d FROM walk
  WHERE src <> dst GROUP BY src, dst)
SELECT src AS node, CAST(count(*) AS BIGINT) AS n_reach,
       CAST(max(d) AS BIGINT) AS ecc,
       round(sum(1.0 / d), 6) AS harmonic
FROM md GROUP BY src
"""


REGISTRY.update({'harmonic_centrality': (
            q_harmonic_centrality,
            SQL_HARMONIC_CENTRALITY,
        )})


def q_feature_propagate(sf_dir: str):
    """Two rounds of GNN-style integer message passing
    (stages/graph.py feature_propagate) over the same ring+chord
    digraph as ``pagerank``: h0 = c_custkey % 97 + 1,
    h_{k+1}(v) = h_k(v) + sum of h_k over in-neighbours. Integer
    aggregation makes the result exact under any partitioning; the
    oracle is the unrolled two-round join+group SQL."""
    from ..stages.graph import feature_propagate

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    def feats(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(c, pa.int64()),
                "x": pa.array(c % 97 + 1, pa.int64()),
            }
        )

    # num_partitions sized to the (tiny) node space: the default
    # shuffle width spins up far more join partitions than rows
    # warrant and the 4 joins pay that overhead four times
    out = feature_propagate(
        cust.map_batches(edges, batch_format="pyarrow"),
        cust.map_batches(feats, batch_format="pyarrow"),
        rounds=2,
        num_partitions=8,
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b["node"],
                "h1": b["h1"],
                "h2": b["h2"],
            }
        ),
        batch_format="pyarrow",
    )


SQL_FEATURE_PROPAGATE = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src,
         (c_custkey + 1) % (SELECT n FROM cnt) AS dst
  FROM customer
  UNION
  SELECT c_custkey AS src,
         (c_custkey * 7 + 3) % (SELECT n FROM cnt) AS dst
  FROM customer WHERE c_custkey % 3 = 0
),
f0 AS (SELECT c_custkey AS node, c_custkey % 97 + 1 AS h FROM customer),
s1 AS (SELECT e.dst AS node, sum(f0.h) AS s
       FROM e JOIN f0 ON f0.node = e.src GROUP BY e.dst),
f1 AS (SELECT f0.node, f0.h + COALESCE(s1.s, 0) AS h
       FROM f0 LEFT JOIN s1 USING (node)),
s2 AS (SELECT e.dst AS node, sum(f1.h) AS s
       FROM e JOIN f1 ON f1.node = e.src GROUP BY e.dst),
f2 AS (SELECT f1.node, f1.h + COALESCE(s2.s, 0) AS h
       FROM f1 LEFT JOIN s2 USING (node))
SELECT f1.node AS c_custkey,
       CAST(f1.h AS BIGINT) AS h1,
       CAST(f2.h AS BIGINT) AS h2
FROM f1 JOIN f2 USING (node)
"""


REGISTRY.update({'feature_propagate': (q_feature_propagate, SQL_FEATURE_PROPAGATE)})


def q_ppr_seeds(sf_dir: str):
    """Personalized PageRank (stages/graph.py:pagerank with seeds):
    teleport uniform over the seed set c_custkey % 100 == 0 instead
    of all nodes — 'importance relative to THESE papers', the KG
    recommendation shape. Same ring+chord digraph, 10 exact
    iterations, recursive-CTE oracle with a CASE seed term."""
    from ..stages.graph import pagerank

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    seeds = np.arange(0, n, 100, dtype=np.int64)
    return pagerank(
        cust.map_batches(edges, batch_format="pyarrow"),
        damping=0.85,
        iters=10,
        seeds=seeds,
    )


SQL_PPR_SEEDS = """
WITH RECURSIVE
cnt AS (SELECT count(*) AS n FROM customer),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM customer
       WHERE c_custkey % 100 = 0),
e AS (
  SELECT c_custkey AS src,
         (c_custkey + 1) % (SELECT n FROM cnt) AS dst
  FROM customer
  UNION
  SELECT c_custkey AS src,
         (c_custkey * 7 + 3) % (SELECT n FROM cnt) AS dst
  FROM customer WHERE c_custkey % 3 = 0
),
dg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src),
pr(it, node, r) AS (
  SELECT 0, c_custkey,
         CASE WHEN c_custkey % 100 = 0
              THEN CAST(1.0 AS DOUBLE) / (SELECT s FROM ns)
              ELSE CAST(0.0 AS DOUBLE) END
  FROM customer
  UNION ALL
  SELECT p.it + 1, e.dst,
         CASE WHEN e.dst % 100 = 0
              THEN CAST(0.15 AS DOUBLE) / (SELECT s FROM ns)
              ELSE CAST(0.0 AS DOUBLE) END
           + CAST(0.85 AS DOUBLE) * SUM(p.r / dg.d)
  FROM pr p JOIN dg ON dg.src = p.node JOIN e ON e.src = p.node
  WHERE p.it < 10
  GROUP BY p.it + 1, e.dst
)
SELECT node, round(r * (SELECT n FROM cnt), 6) AS rank
FROM pr WHERE it = 10
"""


REGISTRY.update({'ppr_seeds': (q_ppr_seeds, SQL_PPR_SEEDS)})


# ------------------------------------------- HITS / label propagation


def _ring_chord_edges(cust, n: int):
    """The pagerank ring+chord digraph over the customer keys (shared
    by pagerank / feature_propagate / hits so the oracles reuse one
    edge CTE)."""

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    return cust.map_batches(edges, batch_format="pyarrow")


def q_hits_scores(sf_dir: str):
    """HITS hubs/authorities (stages/graph.py:hits) over the pagerank
    ring+chord digraph — exact UNNORMALIZED integer power iteration
    (hub = h1, auth = a2), so the oracle is three unrolled join+group
    CTEs and the value hash is bit-exact."""
    from ..stages.graph import hits

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()
    return hits(_ring_chord_edges(cust, n), rounds=1)


SQL_HITS_SCORES = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src,
         (c_custkey + 1) % (SELECT n FROM cnt) AS dst
  FROM customer
  UNION
  SELECT c_custkey AS src,
         (c_custkey * 7 + 3) % (SELECT n FROM cnt) AS dst
  FROM customer WHERE c_custkey % 3 = 0
),
a1 AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY 1),
h1 AS (SELECT e.src AS node, CAST(sum(a1.a) AS BIGINT) AS h
       FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1),
a2 AS (SELECT e.dst AS node, CAST(sum(h1.h) AS BIGINT) AS a
       FROM e JOIN h1 ON h1.node = e.src GROUP BY 1)
SELECT c.c_custkey AS node,
       coalesce(h1.h, 0) AS hub, coalesce(a2.a, 0) AS auth
FROM customer c
LEFT JOIN h1 ON h1.node = c.c_custkey
LEFT JOIN a2 ON a2.node = c.c_custkey
"""


def q_label_prop_communities(sf_dir: str):
    """Community detection by synchronous label propagation
    (stages/graph.py:label_propagation) over a planted-community
    graph on the customer keys: eight stride-8 residue rings
    (``c -> c+8``, wrapping to the class minimum) plus sparse bridges
    (``c -> c+1`` for ``c % 101 == 0``). Three deterministic rounds
    (neighbour-label mode, ties to the smallest label) — the oracle
    unrolls the rounds as mode-per-node CTEs."""
    from ..stages.graph import label_propagation

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring = np.where(c + 8 < n, c + 8, c % 8)
        br = c[c % 101 == 0]
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, br]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring, (br + 1) % n]), pa.int64()
                ),
            }
        )

    return label_propagation(
        cust.map_batches(edges, batch_format="pyarrow"), rounds=3
    )


SQL_LABEL_PROP_COMMUNITIES = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
ed AS (
  SELECT c_custkey AS src,
         CASE WHEN c_custkey + 8 < (SELECT n FROM cnt)
              THEN c_custkey + 8 ELSE c_custkey % 8 END AS dst
  FROM customer
  UNION
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM cnt) AS dst
  FROM customer WHERE c_custkey % 101 = 0),
eu AS (
  SELECT src, dst FROM ed WHERE src <> dst
  UNION
  SELECT dst, src FROM ed WHERE src <> dst),
l0 AS (SELECT c_custkey AS node, CAST(c_custkey AS BIGINT) AS label
       FROM customer),
c1 AS (SELECT e.src AS node, l.label, count(*) AS cnt
       FROM eu e JOIN l0 l ON l.node = e.dst GROUP BY 1, 2),
l1 AS (SELECT node, label FROM (
         SELECT node, label,
                row_number() OVER (PARTITION BY node
                                   ORDER BY cnt DESC, label) AS rn
         FROM c1) WHERE rn = 1),
c2 AS (SELECT e.src AS node, l.label, count(*) AS cnt
       FROM eu e JOIN l1 l ON l.node = e.dst GROUP BY 1, 2),
l2 AS (SELECT node, label FROM (
         SELECT node, label,
                row_number() OVER (PARTITION BY node
                                   ORDER BY cnt DESC, label) AS rn
         FROM c2) WHERE rn = 1),
c3 AS (SELECT e.src AS node, l.label, count(*) AS cnt
       FROM eu e JOIN l2 l ON l.node = e.dst GROUP BY 1, 2),
l3 AS (SELECT node, label FROM (
         SELECT node, label,
                row_number() OVER (PARTITION BY node
                                   ORDER BY cnt DESC, label) AS rn
         FROM c3) WHERE rn = 1)
SELECT node, label FROM l3
"""


REGISTRY.update({'hits_scores': (q_hits_scores, SQL_HITS_SCORES)})


REGISTRY.update({'label_prop_communities': (
            q_label_prop_communities,
            SQL_LABEL_PROP_COMMUNITIES,
        )})


def _ring_chord_edges_ds(sf_dir: str):
    """The deterministic ring+chord digraph on customer keys shared
    by the pagerank/bfs/kcore family (see q_pagerank docstring)."""
    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    return cust.map_batches(edges, batch_format="pyarrow"), n


def q_reciprocal_edges(sf_dir: str):
    """Edge reciprocity of the house digraph — the fraction of
    directed edges whose reverse edge also exists (a standard
    social-graph health metric). Each edge lands in the bucket of its
    UNORDERED pair key, so both directions of a pair always meet in
    the same group after ONE coarse exchange; within a bucket a
    packed-uint64 sort + run-length scan marks pairs seen in both
    orientations. Integer basis points — no float anywhere."""
    from ..functions.hashing import splitmix64

    eds, _n = _ring_chord_edges_ds(sf_dir)
    B = 64

    def bucketize(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        pairk = (lo << np.uint64(32)) | hi
        bucket = (splitmix64(pairk) % np.uint64(B)).astype(np.int64)
        fwd = (s <= d).astype(np.uint64)  # orientation bit
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "pairk": pa.array(pairk.astype(np.int64)),
                "fwd": pa.array(fwd.astype(np.int64)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pk = g["pairk"].to_numpy(np.int64)
        fw = g["fwd"].to_numpy(np.int64)
        order = np.argsort(pk, kind="mergesort")
        pk, fw = pk[order], fw[order]
        brk = np.empty(len(pk), dtype=bool)
        if len(pk):
            brk[0] = True
            brk[1:] = pk[1:] != pk[:-1]
        grp = np.cumsum(brk) - 1
        both = np.zeros(grp[-1] + 1 if len(pk) else 0, np.int64)
        has_f = np.zeros_like(both)
        has_b = np.zeros_like(both)
        np.maximum.at(has_f, grp, fw)
        np.maximum.at(has_b, grp, 1 - fw)
        both = has_f & has_b
        n_edges = len(pk)
        n_recip = int(np.bincount(grp)[both.astype(bool)].sum()) if len(pk) else 0
        return pd.DataFrame({"n_edges": [n_edges], "n_recip": [n_recip]})

    parts = (
        eds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    n_edges = int(parts["n_edges"].sum())
    n_recip = int(parts["n_recip"].sum())
    return pd.DataFrame(
        {
            "n_edges": [n_edges],
            "n_reciprocal": [n_recip],
            "recip_bp": [n_recip * 10000 // n_edges],
        }
    )


SQL_RECIPROCAL_EDGES = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM nn) AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey, (7 * c_custkey + 3) % (SELECT n FROM nn)
  FROM customer
  WHERE c_custkey % 3 = 0
    AND (7 * c_custkey + 3) % (SELECT n FROM nn)
        <> (c_custkey + 1) % (SELECT n FROM nn)
),
r AS (
  SELECT count(*) AS n_recip
  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
)
SELECT (SELECT count(*) FROM e) AS n_edges,
       (SELECT n_recip FROM r) AS n_reciprocal,
       CAST((SELECT n_recip FROM r) * 10000
            // (SELECT count(*) FROM e) AS BIGINT) AS recip_bp
"""


def q_indegree_hist(sf_dir: str):
    """In-degree distribution of the house digraph (the two-phase
    count-then-histogram shape over graph edges — q13's pattern on a
    graph): per-dst counts after ONE exchange of per-batch partials,
    then a count-bounded histogram. All nodes have the ring in-edge,
    so the zero bucket is structurally empty and both engines omit
    it."""
    eds, _n = _ring_chord_edges_ds(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"dst": pa.array(u, pa.int64()), "n": pa.array(cnt.astype(np.int64))}
        )

    counts = (
        eds.map_batches(partial, batch_format="pyarrow")
        .groupby("dst")
        .aggregate(Sum("n", alias_name="indeg"))
    )

    def hist(b: pa.Table) -> pa.Table:
        c = b["indeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table(
            {
                "indeg": pa.array(u, pa.int64()),
                "n_nodes": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        counts.map_batches(hist, batch_format="pyarrow")
        .groupby("indeg")
        .aggregate(Sum("n_nodes", alias_name="n_nodes"))
    )


SQL_INDEGREE_HIST = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM nn) AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey, (7 * c_custkey + 3) % (SELECT n FROM nn)
  FROM customer
  WHERE c_custkey % 3 = 0
    AND (7 * c_custkey + 3) % (SELECT n FROM nn)
        <> (c_custkey + 1) % (SELECT n FROM nn)
),
d AS (SELECT dst, count(*) AS indeg FROM e GROUP BY dst)
SELECT indeg, count(*) AS n_nodes FROM d GROUP BY indeg
"""


REGISTRY.update({'reciprocal_edges': (q_reciprocal_edges, SQL_RECIPROCAL_EDGES)})


REGISTRY.update({'indegree_hist': (q_indegree_hist, SQL_INDEGREE_HIST)})


def q_assortativity_edges(sf_dir: str):
    """Out-in degree assortativity of the house ring+chord digraph —
    the Pearson correlation, over directed edges, of the source's
    out-degree with the target's in-degree (positive: hubs link to
    hubs). Degrees fold via two grouped counts (node-bounded),
    broadcast as sorted arrays; ONE edge scan then folds the six
    Pearson sums as exact int64 partials, and the only float math is
    the final r on identical operands."""
    eds, _n = _ring_chord_edges_ds(sf_dir)
    eds = eds.materialize()
    od = eds.groupby("src").aggregate(Count(alias_name="d")).to_pandas()
    idg = eds.groupby("dst").aggregate(Count(alias_name="d")).to_pandas()
    ok_ = np.sort(od["src"].to_numpy(np.int64))
    odeg = od.set_index("src")["d"].loc[ok_].to_numpy(np.int64)
    ik = np.sort(idg["dst"].to_numpy(np.int64))
    ideg = idg.set_index("dst")["d"].loc[ik].to_numpy(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        dx = odeg[np.searchsorted(ok_, s)]
        dy = ideg[np.searchsorted(ik, d)]
        return pa.table(
            {
                "m": pa.array([len(s)], pa.int64()),
                "sx": pa.array([int(dx.sum())], pa.int64()),
                "sy": pa.array([int(dy.sum())], pa.int64()),
                "sxx": pa.array([int((dx * dx).sum())], pa.int64()),
                "syy": pa.array([int((dy * dy).sum())], pa.int64()),
                "sxy": pa.array([int((dx * dy).sum())], pa.int64()),
            }
        )

    t = eds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    m, sx, sy = int(t["m"]), int(t["sx"]), int(t["sy"])
    sxx, syy, sxy = int(t["sxx"]), int(t["syy"]), int(t["sxy"])
    import math

    r = (m * sxy - sx * sy) / math.sqrt(
        float(m * sxx - sx * sx) * float(m * syy - sy * sy)
    )
    return pd.DataFrame({"assortativity": [round(r, 6)]})


SQL_ASSORTATIVITY_EDGES = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM nn) AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey, (7 * c_custkey + 3) % (SELECT n FROM nn)
  FROM customer
  WHERE c_custkey % 3 = 0
    AND (7 * c_custkey + 3) % (SELECT n FROM nn)
        <> (c_custkey + 1) % (SELECT n FROM nn)
),
od AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
idg AS (SELECT dst, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY dst),
j AS (SELECT od.d AS dx, idg.d AS dy
      FROM e JOIN od ON e.src = od.src JOIN idg ON e.dst = idg.dst),
s AS (SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
             CAST(sum(dx*dx) AS BIGINT) AS sxx,
             CAST(sum(dy*dy) AS BIGINT) AS syy,
             CAST(sum(dx*dy) AS BIGINT) AS sxy
      FROM j)
SELECT round((m*sxy - sx*sy)
             / sqrt((m*sxx - sx*sx) * 1.0 * (m*syy - sy*sy)), 6)
         AS assortativity
FROM s
"""


REGISTRY.update({'assortativity_edges': (q_assortativity_edges, SQL_ASSORTATIVITY_EDGES)})


def q_scc_nodes(sf_dir: str):
    """Strongly connected components of a planted block digraph over
    the customer keys (stages/graph.py:scc — FW-BW-MIN peeling,
    driver fast path under 5M edges, distributed per-round exchanges
    above). Graph: 12-key blocks, chain c -> c+1 inside the block,
    back edges c -> block-start at offsets 4 and 8 — so each block's
    first (maxb+1) nodes form one SCC (maxb = largest multiple of 4
    present) and the chain tail past the last back edge is singletons.
    The construction has a CLOSED FORM the SQL twin states directly,
    while the engine runs the general algorithm (generic correctness
    pinned vs a transitive-closure brute force in tests/test_scc.py).
    Output (node, scc_id = min member)."""
    from ..stages.graph import scc

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = c % 12
        chain = c[(off < 11) & (c + 1 < n)]
        back = c[(off % 4 == 0) & (off > 0)]
        return pa.table(
            {
                "src": pa.array(np.concatenate([chain, back]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([chain + 1, back - (back % 12)]),
                    pa.int64(),
                ),
            }
        )

    return scc(cust.map_batches(edges, batch_format="pyarrow"))


SQL_SCC_NODES = """
WITH k AS (
  SELECT c_custkey AS c, c_custkey // 12 AS b, c_custkey % 12 AS off
  FROM customer
),
bl AS (SELECT b, CAST(max(off) AS BIGINT) AS mx FROM k GROUP BY b)
SELECT c AS node,
       CASE WHEN mx >= 4 AND off <= (mx // 4) * 4
            THEN b * 12 ELSE c END AS scc_id
FROM k JOIN bl USING (b)
"""


REGISTRY.update({'scc_nodes': (q_scc_nodes, SQL_SCC_NODES)})


# ------------------------------------------------ triple-store op oracles


def _cust_triples(sf_dir: str):
    """Customer/nation/region facts as a triple Dataset — the
    relational-table twin of the flagship store, existing so the
    kgquery OPERATORS themselves (two_hop, star_join) get DuckDB
    oracles: the synth-corpus store has model scoring upstream and
    can never be SQL-checked, this one is three joins."""
    nation = _pq(
        sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    region = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nk = np.sort(nation["n_nationkey"].to_numpy(np.int64))
    nname = nation.set_index("n_nationkey")["n_name"].loc[nk].to_numpy()

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"])

    def fn(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = nname[
            np.searchsorted(
                nk,
                b["c_nationkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            )
        ]
        seg = b["c_mktsegment"].to_numpy(zero_copy_only=False)
        subj = np.char.add("cust/", c.astype("U"))
        return pa.table(
            {
                "subject": pa.array(
                    np.concatenate([subj, subj]), pa.string()
                ),
                "predicate": pa.array(
                    ["in_nation"] * len(c) + ["in_segment"] * len(c)
                ),
                "object": pa.array(
                    np.concatenate(
                        [np.char.add("nation/", nat.astype("U")), seg]
                    ),
                    pa.string(),
                ),
            }
        )

    nr = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    import ray.data as rd

    nation_tbl = pa.table(
        {
            "subject": pa.array(
                ("nation/" + nr["n_name"]).tolist(), pa.string()
            ),
            "predicate": pa.array(["in_region"] * len(nr)),
            "object": pa.array(
                ("region/" + nr["r_name"]).tolist(), pa.string()
            ),
        }
    )
    return cust.map_batches(fn, batch_format="pyarrow").union(
        rd.from_arrow(nation_tbl)
    )


def q_two_hop_customers(sf_dir: str):
    """two_hop over the customer triple store: cust -in_nation-> X
    -in_region-> region (stages/kgquery.py — ONE mid-node-bucketed
    exchange, never a store self-join). The oracle is the plain
    customer |x| nation |x| region join."""
    from ..stages.kgquery import two_hop

    return two_hop(_cust_triples(sf_dir), "in_nation", "in_region")


SQL_TWO_HOP_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS subject,
       'nation/' || n_name AS mid,
       'region/' || r_name AS object
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
"""


def q_star_join_customers(sf_dir: str):
    """star_join over the customer triple store: subjects with BOTH an
    in_segment=BUILDING edge and any in_nation edge — the multi-BGP
    shared-subject SPARQL shape resolved in one subject-keyed
    exchange; the oracle is a WHERE clause."""
    from ..stages.kgquery import star_join

    return star_join(
        _cust_triples(sf_dir),
        {"in_segment": "BUILDING", "in_nation": None},
    )


SQL_STAR_JOIN_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS subject
FROM customer WHERE c_mktsegment = 'BUILDING'
"""


REGISTRY.update({'two_hop_customers': (q_two_hop_customers, SQL_TWO_HOP_CUSTOMERS)})


REGISTRY.update({'star_join_customers': (
            q_star_join_customers,
            SQL_STAR_JOIN_CUSTOMERS,
        )})


#: deterministic-walk parameters (random_walks)
WALK_SEED_MOD = 50  # walkers start from custkey % 50 == 0
WALK_STEPS = 3


def q_random_walks(sf_dir: str):
    """DeepWalk/node2vec-style corpus generation: deterministic
    3-step walks over the house digraph, one walk per seed node
    (custkey % 50 == 0). The 'random' next hop is the out-neighbour
    minimizing key_rank64((cur << 32) | dst, seed=step) — a pure
    function of (cur, step, dst), so walks are identical under any
    partitioning and the SQL twin replays the splitmix chain
    bit-for-bit. Per step: ONE streamed edge scan against the
    broadcast frontier (walker count is corpus/50-bounded; the
    beyond-driver plan is the pagerank_distributed hash-join shape),
    per-batch best-per-walker partials, tiny driver fold."""
    import ray

    from ..functions.hashing import key_rank64

    eds, _n = _ring_chord_edges_ds(sf_dir)
    cust = _pq(sf_dir, "customer", ["c_custkey"])
    seeds = (
        cust.filter(
            lambda r: r["c_custkey"] % WALK_SEED_MOD == 0
        ).to_pandas()["c_custkey"].to_numpy(np.int64)
    )
    walkers = np.sort(seeds)
    cur = walkers.copy()
    path = [walkers]
    for step in range(1, WALK_STEPS + 1):
        order = np.argsort(cur, kind="mergesort")
        cur_sorted = cur[order]  # walker ids carried via order
        uniq, starts = np.unique(cur_sorted, return_index=True)
        ref = ray.put((uniq, starts, order, cur_sorted, step))

        def best_partial(b: pa.Table, _ref=ref) -> pa.Table:
            u, st, ord_, curs, s = ray.get(_ref)
            src = b["src"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            dst = b["dst"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            pos = np.searchsorted(u, src)
            pos = np.clip(pos, 0, len(u) - 1)
            hit = u[pos] == src
            src, dst, pos = src[hit], dst[hit], pos[hit]
            # fan out one row per walker currently AT this src node
            ends = np.r_[st[1:], len(curs)]
            reps = (ends - st)[pos]
            w_idx = np.concatenate(
                [ord_[st[p]: ends[p]] for p in pos]
            ) if len(pos) else np.empty(0, np.int64)
            dsts = np.repeat(dst, reps)
            srcs = np.repeat(src, reps)
            key = (srcs.astype(np.uint64) << np.uint64(32)) | dsts.astype(
                np.uint64
            )
            rank = key_rank64(key.astype(np.int64), seed=s)
            o = np.lexsort((dsts, rank, w_idx))
            w_s, d_s, r_s = w_idx[o], dsts[o], rank[o]
            first = np.r_[True, w_s[1:] != w_s[:-1]]
            return pa.table(
                {
                    "w": pa.array(w_s[first], pa.int64()),
                    "dst": pa.array(d_s[first], pa.int64()),
                    "rank": pa.array(
                        r_s[first].astype(np.int64), pa.int64()
                    ),
                }
            )

        parts = eds.map_batches(
            best_partial, batch_format="pyarrow"
        ).to_pandas()
        parts["rank"] = parts["rank"].astype(np.uint64)
        parts = parts.sort_values(
            ["w", "rank", "dst"], kind="mergesort"
        ).drop_duplicates("w", keep="first")
        nxt = np.empty(len(walkers), np.int64)
        nxt[parts["w"].to_numpy(np.int64)] = parts["dst"].to_numpy(
            np.int64
        )
        cur = nxt
        path.append(cur.copy())
    return pd.DataFrame(
        {
            "walker": path[0],
            "n1": path[1],
            "n2": path[2],
            "n3": path[3],
        }
    )


def _walk_rank_ctes(prefix: str, src_cte: str, carry: str, seed: int) -> str:
    from __ray_entry__ import _splitmix_round_ctes  # lazy: avoids cycle

    return f"""{_splitmix_round_ctes(prefix + 'a', src_cte, carry)}
{prefix}x AS (SELECT {carry}, xor(x, CAST({seed} AS UBIGINT)) AS x
              FROM {prefix}a4),
{_splitmix_round_ctes(prefix + 'b', prefix + 'x', carry)}
{prefix}r AS (SELECT {carry}, x FROM {prefix}b4)"""


def _random_walks_sql() -> str:
    steps = []
    prev = "seeds"
    prev_col = "node"
    carry_cols = ["walker"]
    for s in range(1, WALK_STEPS + 1):
        carry = ", ".join(carry_cols + ["dst"])
        steps.append(f"""
c{s} AS (SELECT {', '.join(carry_cols)}, e.dst AS dst,
         CAST({prev}.{prev_col} AS UBIGINT) * 4294967296
           + CAST(e.dst AS UBIGINT) AS x
         FROM {prev} JOIN e ON e.src = {prev}.{prev_col}),
{_walk_rank_ctes(f'w{s}', f'c{s}', carry, s)},
p{s} AS (SELECT {', '.join(carry_cols)}, dst AS n{s} FROM (
  SELECT {carry},
         row_number() OVER (PARTITION BY walker ORDER BY x, dst) AS rn
  FROM w{s}r) WHERE rn = 1)""")
        prev = f"p{s}"
        prev_col = f"n{s}"
        carry_cols.append(f"n{s}")
    body = ",".join(steps)
    return f"""
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM nn) AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey, (7 * c_custkey + 3) % (SELECT n FROM nn)
  FROM customer
  WHERE c_custkey % 3 = 0
    AND (7 * c_custkey + 3) % (SELECT n FROM nn)
        <> (c_custkey + 1) % (SELECT n FROM nn)
),
seeds AS (SELECT c_custkey AS walker, c_custkey AS node
          FROM customer WHERE c_custkey % {WALK_SEED_MOD} = 0),
{body}
SELECT walker, n1, n2, n3 FROM p{WALK_STEPS}
"""


REGISTRY.update({'random_walks': (q_random_walks, _random_walks_sql())})


def q_kg_negation_customers(sf_dir: str):
    """neg_pattern (SPARQL FILTER NOT EXISTS) over the customer
    triple store: subjects with an in_nation edge but NO
    in_segment=MACHINERY edge — the anti-join query shape a
    triple-store consumer uses for 'entities lacking X'. One
    subject-keyed exchange (stages/kgquery.py:neg_pattern); the
    oracle is a plain inequality."""
    from ..stages.kgquery import neg_pattern

    return neg_pattern(
        _cust_triples(sf_dir),
        have=("in_nation", None),
        lack=("in_segment", "MACHINERY"),
    )


SQL_KG_NEGATION_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS subject
FROM customer WHERE c_mktsegment <> 'MACHINERY'
"""


REGISTRY.update({'kg_negation_customers': (
            q_kg_negation_customers,
            SQL_KG_NEGATION_CUSTOMERS,
        )})


def q_mst_star_ring(sf_dir: str):
    """Distributed Boruvka minimum spanning tree
    (stages/graph.py:boruvka_mst — per-round per-component min
    outgoing edge under a total (w, key) order, O(log n) rounds, one
    edge scan per round) running the GENERAL algorithm on a planted
    star+ring graph whose unique MST the oracle states in closed
    form: star edges 0->i weigh i, ring edges weigh 10n + node, so
    the MST is exactly the star — n-1 edges totalling n(n-1)/2.
    Union-find is not SQL-expressible; the closed-form instance puts
    the machinery under the value-hash gate (generic correctness vs
    brute Kruskal in tests/test_graph.py)."""
    from ..stages.graph import boruvka_mst

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()
    # key-base independence: the closed-form oracle (n-1 edges,
    # n(n-1)/2 weight) assumes 0-BASED contiguous node ids — normalize
    # by the min key so the planted instance holds on 1-based TPC-H
    # keys as well as the repo's 0-based synth keys
    base = int(cust.min("c_custkey"))

    def edges(b: pa.Table) -> pa.Table:
        c = (
            b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            - base
        )
        ring_dst = (c + 1) % n
        ring_w = 10 * n + c
        star = c[c > 0]
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([c, np.zeros(len(star), np.int64)]),
                    pa.int64(),
                ),
                "dst": pa.array(
                    np.concatenate([ring_dst, star]), pa.int64()
                ),
                "w": pa.array(
                    np.concatenate([ring_w, star]), pa.int64()
                ),
            }
        )

    mst, n_comp = boruvka_mst(cust.map_batches(edges, batch_format="pyarrow"))
    return pd.DataFrame(
        {
            "n_edges": [mst.num_rows],
            "total_weight": [int(sum(mst["w"].to_pylist()))],
            "n_components": [n_comp],
        }
    ).astype(np.int64)


SQL_MST_STAR_RING = """
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer)
SELECT (SELECT n FROM nn) - 1 AS n_edges,
       (SELECT n FROM nn) * ((SELECT n FROM nn) - 1) // 2
         AS total_weight,
       CAST(1 AS BIGINT) AS n_components
"""


REGISTRY.update({'mst_star_ring': (q_mst_star_ring, SQL_MST_STAR_RING)})


#: bounded-hop cheapest-path parameters (cheapest_path_hops)
SSSP_HOPS = 8
SSSP_SOURCE = 0


def q_cheapest_path_hops(sf_dir: str):
    """Weighted single-source cheapest paths within <= 8 hops —
    distributed Bellman-Ford: one edge scan per relaxation round
    against the broadcast distance array (node-bounded, the bfs_hops
    contract; beyond-driver = distances as a keyed Dataset with a
    hash join + groupby-min per round), per-batch per-node minima
    shrink each round's fold. Integer weights make every round exact;
    the identical hop cap on both sides makes the bounded metric
    well-defined. Oracle = the recursive bounded walk with min(cost).
    Returns reachable nodes with their cheapest bounded cost."""
    eds, _n = _ring_chord_edges_ds(sf_dir)

    def with_w(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (s * 7 + d * 3) % 97 + 1
        return pa.table(
            {
                "src": pa.array(s, pa.int64()),
                "dst": pa.array(d, pa.int64()),
                "w": pa.array(w.astype(np.int64), pa.int64()),
            }
        )

    edges = eds.map_batches(with_w, batch_format="pyarrow").materialize()
    INF = np.int64(2**62)
    n = int(_n)
    dist = np.full(n, INF, np.int64)
    dist[SSSP_SOURCE] = 0
    import ray

    for _ in range(SSSP_HOPS):
        ref = ray.put(dist)

        def relax(b: pa.Table, _ref=ref) -> pa.Table:
            dd = ray.get(_ref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            ok = dd[s] < np.int64(2**62)
            if not ok.any():
                return pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            d, cand = d[ok], dd[s[ok]] + w[ok]
            order = np.lexsort((cand, d))
            d, cand = d[order], cand[order]
            first = np.r_[True, d[1:] != d[:-1]]
            return pa.table(
                {
                    "node": pa.array(d[first], pa.int64()),
                    "c": pa.array(cand[first], pa.int64()),
                }
            )

        parts = edges.map_batches(
            relax, batch_format="pyarrow"
        ).to_pandas()
        if len(parts) == 0:
            break
        best = parts.groupby("node")["c"].min()
        nxt = dist.copy()
        idx = best.index.to_numpy(np.int64)
        np.minimum.at(nxt, idx, best.to_numpy(np.int64))
        if np.array_equal(nxt, dist):
            break
        dist = nxt
    reach = np.flatnonzero(dist < INF)
    return pd.DataFrame(
        {"node": reach.astype(np.int64), "cost": dist[reach]}
    ).astype(np.int64)


SQL_CHEAPEST_PATH_HOPS = f"""
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT src, dst, (src * 7 + dst * 3) % 97 + 1 AS w FROM (
    SELECT c_custkey AS src,
           (c_custkey + 1) % (SELECT n FROM nn) AS dst
    FROM customer
    UNION ALL
    SELECT c_custkey, (7 * c_custkey + 3) % (SELECT n FROM nn)
    FROM customer
    WHERE c_custkey % 3 = 0
      AND (7 * c_custkey + 3) % (SELECT n FROM nn)
          <> (c_custkey + 1) % (SELECT n FROM nn)
  )
),
walk(node, cost, hops) AS (
  SELECT {SSSP_SOURCE}, CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, walk.cost + e.w, walk.hops + 1
  FROM walk JOIN e ON e.src = walk.node
  WHERE walk.hops < {SSSP_HOPS}
)
SELECT node, CAST(min(cost) AS BIGINT) AS cost
FROM walk GROUP BY node
"""


REGISTRY.update({'cheapest_path_hops': (
            q_cheapest_path_hops,
            SQL_CHEAPEST_PATH_HOPS,
        )})


def q_kg_twohop_agg_customers(sf_dir: str):
    """Aggregate composed over the adaptive kgquery exchange: count
    of customers per region reachable via the two-hop path
    cust -in_nation-> nation -in_region-> region (stages/kgquery.py
    two_hop, now spool-re-split on hash(mid)); the oracle is the
    three-way join + GROUP BY. Proves the kgquery output composes
    into downstream Dataset aggregates without materializing the
    path set driver-side."""
    from ray.data.aggregate import Count

    from ..stages.kgquery import two_hop

    paths = two_hop(_cust_triples(sf_dir), "in_nation", "in_region")
    return (
        paths.groupby("object")
        .aggregate(Count(alias_name="n_customers"))
        .sort("object")
    )


SQL_KG_TWOHOP_AGG_CUSTOMERS = """
SELECT 'region/' || r_name AS object,
       count(*) AS n_customers
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name ORDER BY object
"""


REGISTRY.update({'kg_twohop_agg_customers': (
            q_kg_twohop_agg_customers,
            SQL_KG_TWOHOP_AGG_CUSTOMERS,
        )})


# ----------------------------------- planned multi-pattern BGP (r5)


def q_bgp_customers(sf_dir: str):
    """3-pattern BGP through the planner (stages/kgquery.py:bgp_query)
    over a MATERIALIZED customer triple store:

        (?c in_segment BUILDING) (?c in_nation ?n) (?n in_region ?r)

    — the SPARQL shape the reference's graph notebooks compose with
    hand-written pandas joins (extract_graph.py:298-307). The store
    is materialized to scratch, legs are ordered by row-group-
    statistics selectivity and read through pruned scans, and the two
    joins run the same adaptive spool exchange as every kgquery
    operator. The oracle is the plain 3-way SQL join."""
    import os
    import shutil
    import tempfile

    from ..sources.sinks import materialize_triples
    from ..stages.kgquery import bgp_query
    from ..state.spool import scratch_dir

    os.makedirs(scratch_dir(), exist_ok=True)
    store = tempfile.mkdtemp(prefix="bgp_cust_", dir=scratch_dir())
    try:
        materialize_triples(
            _cust_triples(sf_dir), store, num_partitions=4, resume=False
        )
        out = bgp_query(
            store,
            [
                ("?c", "in_nation", "?n"),
                ("?n", "in_region", "?r"),
                ("?c", "in_segment", "BUILDING"),
            ],
        )
        # every exchange output is spool-materialized; one defensive
        # materialize so the result outlives the scratch store
        return out.materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_BGP_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS c,
       'nation/' || n_name AS n,
       'region/' || r_name AS r
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE c_mktsegment = 'BUILDING'
"""


REGISTRY.update({'bgp_customers': (q_bgp_customers, SQL_BGP_CUSTOMERS)})


# --------------------------- OPTIONAL BGP + property path (r5)


def _spender_store(sf_dir: str):
    """Materialize a small customer store to scratch: in_nation edges
    for every customer plus a big_spender edge ONLY where
    c_acctbal > 5000 — the partial predicate OPTIONAL needs. Returns
    the store path (caller removes it)."""
    import os
    import tempfile

    from ..sources.sinks import materialize_triples
    from ..state.spool import scratch_dir

    cust = _pq(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def to_triples(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        subj = np.char.add("cust/", c.astype("U"))
        rich = bal > 5000
        return pa.table(
            {
                "subject": pa.array(
                    np.concatenate([subj, subj[rich]]), pa.string()
                ),
                "predicate": pa.array(
                    ["in_nation"] * len(c)
                    + ["big_spender"] * int(rich.sum())
                ),
                "object": pa.array(
                    np.concatenate(
                        [
                            np.char.add("nation/", nk.astype("U")),
                            np.full(int(rich.sum()), "yes", object),
                        ]
                    ),
                    pa.string(),
                ),
            }
        )

    os.makedirs(scratch_dir(), exist_ok=True)
    store = tempfile.mkdtemp(prefix="bgp_opt_", dir=scratch_dir())
    materialize_triples(
        cust.map_batches(to_triples, batch_format="pyarrow"),
        store,
        num_partitions=4,
        resume=False,
    )
    return store


def q_bgp_optional_customers(sf_dir: str):
    """OPTIONAL BGP leg through the planner: required
    (?c in_nation ?n) LEFT-joined with optional (?c big_spender ?b)
    over a materialized store — customers without the edge keep their
    row with b null (SPARQL OPTIONAL semantics; SQL twin = LEFT JOIN
    against the acctbal predicate that mints the edge)."""
    import shutil

    from ..stages.kgquery import bgp_query

    store = _spender_store(sf_dir)
    try:
        return bgp_query(
            store,
            [("?c", "in_nation", "?n")],
            optional=[("?c", "big_spender", "?b")],
        ).materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_BGP_OPTIONAL_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS c,
       'nation/' || CAST(c_nationkey AS VARCHAR) AS n,
       CASE WHEN c_acctbal > 5000 THEN 'yes' END AS b
FROM customer
"""


REGISTRY.update(
    {
        "bgp_optional_customers": (
            q_bgp_optional_customers,
            SQL_BGP_OPTIONAL_CUSTOMERS,
        )
    }
)


REACH_SEED_MOD = 1000
REACH_HOPS = 3


def q_kg_reach_customers(sf_dir: str):
    """Bounded property path (``refers{0,3}``) over a materialized
    store via per-hop PRUNED scans + broadcast frontier
    (stages/kgquery.py:reachable_store): deterministic ring-ish edges
    cust/k -refers-> cust/((7k mod K)+1), seeds = custkey % 1000 == 1,
    BFS level per reached node. The SQL twin is the recursive CTE
    DuckDB runs over the same derived edge set."""
    import os
    import shutil
    import tempfile

    from ..sources.sinks import materialize_triples
    from ..stages.kgquery import reachable_store
    from ..state.spool import scratch_dir

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    keys = cust.to_pandas()["c_custkey"].to_numpy(np.int64)
    kmax = int(keys.max())

    def to_edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = (c * 7) % kmax + 1
        return pa.table(
            {
                "subject": pa.array(
                    np.char.add("cust/", c.astype("U")), pa.string()
                ),
                "predicate": pa.array(["refers"] * len(c)),
                "object": pa.array(
                    np.char.add("cust/", o.astype("U")), pa.string()
                ),
            }
        )

    os.makedirs(scratch_dir(), exist_ok=True)
    store = tempfile.mkdtemp(prefix="kg_reach_", dir=scratch_dir())
    try:
        materialize_triples(
            cust.map_batches(to_edges, batch_format="pyarrow"),
            store,
            num_partitions=4,
            resume=False,
        )
        seeds = [
            f"cust/{k}" for k in sorted(keys)
            if k % REACH_SEED_MOD == 1
        ]
        return reachable_store(
            store, "refers", seeds, max_hops=REACH_HOPS
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_KG_REACH_CUSTOMERS = f"""
WITH RECURSIVE
edges AS (
  SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS s,
         'cust/' || CAST(((c_custkey * 7) %
             (SELECT max(c_custkey) FROM customer)) + 1 AS VARCHAR) AS o
  FROM customer
),
reach(node, hop) AS (
  SELECT 'cust/' || CAST(c_custkey AS VARCHAR), 0
  FROM customer WHERE c_custkey % {REACH_SEED_MOD} = 1
  UNION ALL
  SELECT e.o, r.hop + 1
  FROM reach r JOIN edges e ON e.s = r.node
  WHERE r.hop < {REACH_HOPS}
)
SELECT node, min(hop) AS hop FROM reach GROUP BY node ORDER BY node
"""


REGISTRY.update(
    {"kg_reach_customers": (q_kg_reach_customers, SQL_KG_REACH_CUSTOMERS)}
)


# ----------------------- MINUS BGP + manifest-only stats (r5)


def q_bgp_minus_customers(sf_dir: str):
    """SPARQL MINUS through the planner: (?c in_nation ?n) MINUS
    (?c in_segment BUILDING) over the customer store — bindings whose
    subject has the excluded edge are dropped in the same adaptive
    exchange (right side ships only distinct shared-var tuples). SQL
    twin: NOT EXISTS / <> filter."""
    import os
    import shutil
    import tempfile

    from ..sources.sinks import materialize_triples
    from ..stages.kgquery import bgp_query
    from ..state.spool import scratch_dir

    os.makedirs(scratch_dir(), exist_ok=True)
    store = tempfile.mkdtemp(prefix="bgp_minus_", dir=scratch_dir())
    try:
        materialize_triples(
            _cust_triples(sf_dir), store, num_partitions=4, resume=False
        )
        return bgp_query(
            store,
            [("?c", "in_nation", "?n")],
            minus=[("?c", "in_segment", "BUILDING")],
        ).materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_BGP_MINUS_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS c,
       'nation/' || n_name AS n
FROM customer JOIN nation ON n_nationkey = c_nationkey
WHERE c_mktsegment <> 'BUILDING'
"""


REGISTRY.update(
    {
        "bgp_minus_customers": (
            q_bgp_minus_customers,
            SQL_BGP_MINUS_CUSTOMERS,
        )
    }
)


def q_kg_pred_stats_customers(sf_dir: str):
    """Store-wide GROUP BY predicate answered from partition
    manifests ALONE (stages/kgquery.py:predicate_stats — zero data
    rows read after materialization): the instant form of the
    reference's kind tallies. SQL twin re-derives the same counts
    from the relational tables that mint each predicate's edges."""
    import os
    import shutil
    import tempfile

    from ..sources.sinks import materialize_triples
    from ..stages.kgquery import predicate_stats
    from ..state.spool import scratch_dir

    os.makedirs(scratch_dir(), exist_ok=True)
    store = tempfile.mkdtemp(prefix="kg_stats_", dir=scratch_dir())
    try:
        materialize_triples(
            _cust_triples(sf_dir), store, num_partitions=4, resume=False
        )
        return predicate_stats(store)
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_KG_PRED_STATS_CUSTOMERS = """
SELECT predicate, n FROM (
  SELECT 'in_nation' AS predicate, count(*) AS n FROM customer
  UNION ALL
  SELECT 'in_region', count(*) FROM nation
  UNION ALL
  SELECT 'in_segment', count(*) FROM customer
) ORDER BY predicate
"""


REGISTRY.update(
    {
        "kg_pred_stats_customers": (
            q_kg_pred_stats_customers,
            SQL_KG_PRED_STATS_CUSTOMERS,
        )
    }
)


def q_kg_construct_customers(sf_dir: str):
    """SPARQL CONSTRUCT as the KG-enrichment rule it exists for:
    derive (?c located_in ?r) from in_nation ∘ in_region over the
    customer store (stages/kgquery.py:bgp_construct — planned pruned
    scans + the adaptive exchange, then a pure per-batch template
    emit). SQL twin: the same join projected to triple columns."""
    import os
    import shutil
    import tempfile

    from ..sources.sinks import materialize_triples
    from ..stages.kgquery import bgp_construct
    from ..state.spool import scratch_dir

    os.makedirs(scratch_dir(), exist_ok=True)
    store = tempfile.mkdtemp(prefix="kg_cons_", dir=scratch_dir())
    try:
        materialize_triples(
            _cust_triples(sf_dir), store, num_partitions=4, resume=False
        )
        return bgp_construct(
            store,
            [("?c", "in_nation", "?n"), ("?n", "in_region", "?r")],
            [("?c", "located_in", "?r")],
        ).materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_KG_CONSTRUCT_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS subject,
       'located_in' AS predicate,
       'region/' || r_name AS object
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
"""


REGISTRY.update(
    {
        "kg_construct_customers": (
            q_kg_construct_customers,
            SQL_KG_CONSTRUCT_CUSTOMERS,
        )
    }
)


CLOSURE_CHAIN = 64


def q_kg_closure_customers(sf_dir: str):
    """Forward-chaining fixpoint as an oracle-checked query: seed a
    64-node succ-chain store (cust/k -succ-> cust/k+1 for k <
    CLOSURE_CHAIN), apply the transitivity rule
    (?a succ ?b)(?b succ ?c) -> (?a succ ?c) to fixpoint
    (stages/kgquery.py:apply_rules_to_fixpoint — O(log n) iterations,
    each one planned BGP + one head-pruned diff exchange + one
    segment append), and return the closed edge set. SQL twin: the
    recursive CTE computing the same transitive closure."""
    import os
    import shutil
    import tempfile

    from ..sources.sinks import materialize_triples, read_triples
    from ..stages.kgquery import apply_rules_to_fixpoint
    from ..state.spool import scratch_dir

    cust = _pq(sf_dir, "customer", ["c_custkey"])

    def to_edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = c[c < CLOSURE_CHAIN]
        return pa.table(
            {
                "subject": pa.array(
                    np.char.add("cust/", c.astype("U")), pa.string()
                ),
                "predicate": pa.array(["succ"] * len(c)),
                "object": pa.array(
                    np.char.add("cust/", (c + 1).astype("U")),
                    pa.string(),
                ),
            }
        )

    os.makedirs(scratch_dir(), exist_ok=True)
    store = tempfile.mkdtemp(prefix="kg_closure_", dir=scratch_dir())
    try:
        materialize_triples(
            cust.map_batches(to_edges, batch_format="pyarrow"),
            store,
            num_partitions=2,
            resume=False,
        )
        apply_rules_to_fixpoint(
            store,
            [
                {
                    "patterns": [
                        ("?a", "succ", "?b"),
                        ("?b", "succ", "?c"),
                    ],
                    "template": [("?a", "succ", "?c")],
                }
            ],
            max_iters=12,
            # 64-node rule domain: small fan-out, else empty-bucket
            # task overhead dominates the O(log n) iterations
            nbuckets=4,
        )
        out = (
            read_triples(store)
            .to_pandas()[["subject", "object"]]
            .sort_values(["subject", "object"], kind="mergesort")
            .reset_index(drop=True)
        )
        return out
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_KG_CLOSURE_CUSTOMERS = f"""
WITH RECURSIVE
edges AS (
  SELECT c_custkey AS a, c_custkey + 1 AS b FROM customer
  WHERE c_custkey < {CLOSURE_CHAIN}
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
)
SELECT 'cust/' || CAST(a AS VARCHAR) AS subject,
       'cust/' || CAST(b AS VARCHAR) AS object
FROM reach ORDER BY subject, object
"""


REGISTRY.update(
    {
        "kg_closure_customers": (
            q_kg_closure_customers,
            SQL_KG_CLOSURE_CUSTOMERS,
        )
    }
)
