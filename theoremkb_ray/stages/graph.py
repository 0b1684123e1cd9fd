"""Graph analytics over extracted link structure: PageRank.

The KG the flagship builds is a citation graph (reference: the
theorem-graph CSVs of Styling/tools/theoremdb/extract_graph.py —
nodes = papers/results, edges = cites/proved_by); ranking its nodes
is the canonical "which papers matter" query the reference leaves to
downstream consumers. This module implements power-iteration PageRank
in the EDGES >> NODES regime that fits a 100 TB corpus:

- the edge list stays a Dataset (streamed every iteration — the same
  access pattern every distributed PageRank has; edges are integer-
  indexed ONCE up front so iterations touch two int64 columns, not
  the raw keys);
- the rank vector is driver-resident (O(N) doubles — 8 GB at 1e9
  nodes, the practical ceiling) and broadcast once per iteration via
  ``ray.put`` (numpy array, never a dict — see BASELINE.md scale
  lessons); BEYOND that ceiling use :func:`pagerank_distributed`,
  which keeps ranks as a keyed Dataset and pays the honest
  2-exchanges-per-iteration join cost;
- each block emits only its OBSERVED (dst, partial-sum) rows — the
  per-iteration driver traffic is O(blocks × distinct-dst-per-block),
  not O(blocks × N);
- dangling mass (out-degree-0 nodes) is redistributed uniformly on
  the driver, where the rank vector already lives.

The ``pagerank`` query is value-hash-checked against a DuckDB
recursive-CTE oracle (pipelines/relational.py:SQL_PAGERANK) on a
deterministic ring+chord graph with no dangling nodes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..state.broadcast import get_broadcast


def _collect_unique(ds, cols: list[str]) -> np.ndarray:
    """Distinct values across columns: per-block np.unique partials,
    driver merge. Driver memory is O(distinct), the module's stated
    node-count bound."""

    def partial(b: pa.Table) -> pa.Table:
        vals = np.unique(
            np.concatenate(
                [
                    b[c].to_numpy(zero_copy_only=False).astype(np.int64)
                    for c in cols
                ]
            )
        )
        return pa.table({"v": pa.array(vals, pa.int64())})

    parts = [
        b["v"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts))


def pagerank(
    edges_ds,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    seeds=None,
):
    """-> Dataset(node, rank) — rank scaled by N (mean 1.0), so the
    6-dp precision contract keeps ~6 significant digits at any N.

    ``seeds``: optional array of node ids for PERSONALIZED PageRank —
    the teleport vector becomes uniform over the seed set instead of
    uniform over all nodes (r_0 = 1/|S| on seeds, 0 elsewhere;
    dangling mass also returns to the seeds). With ``seeds=None`` the
    classic uniform teleport is unchanged.

    Multi-edges must be deduplicated upstream if the semantics call
    for it (the oracle graph is generated duplicate-free)."""
    nodes = _collect_unique(edges_ds, [src_col, dst_col])
    n = len(nodes)
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.float64()),
                }
            )
        )
    nodes_ref = ray.put(nodes)

    # --- index edges once: (src, dst) -> (si, di) int64, pinned so
    # iterations replay two integer columns, not the original table
    def index(b: pa.Table) -> pa.Table:
        nd = get_broadcast(nodes_ref)
        s = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "si": pa.array(np.searchsorted(nd, s), pa.int64()),
                "di": pa.array(np.searchsorted(nd, d), pa.int64()),
            }
        )

    idx = edges_ds.map_batches(index, batch_format="pyarrow").materialize()

    # --- out-degree: per-block bincount partials, driver fold
    def deg_partial(b: pa.Table) -> pa.Table:
        si = b["si"].to_numpy(zero_copy_only=False)
        u, c = np.unique(si, return_counts=True)
        return pa.table(
            {"i": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    deg = np.zeros(n, np.int64)
    for b in idx.map_batches(
        deg_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        np.add.at(
            deg,
            b["i"].to_numpy(zero_copy_only=False),
            b["c"].to_numpy(zero_copy_only=False),
        )
    dangling = deg == 0
    inv_deg = np.zeros(n)
    inv_deg[~dangling] = 1.0 / deg[~dangling]

    if seeds is not None:
        seed_ids = np.unique(np.asarray(seeds, dtype=np.int64))
        pos = np.searchsorted(nodes, seed_ids)
        ok = (pos < n) & (nodes[np.minimum(pos, n - 1)] == seed_ids)
        if not ok.all():
            raise ValueError("personalization seeds not in the graph")
        # the SQL twin writes the same division (1/|S|), so the seed
        # weights are bit-identical on both sides
        svec = np.zeros(n)
        svec[pos] = 1.0 / len(seed_ids)
        ranks = svec.copy()
        teleport = np.zeros(n)
        teleport[pos] = (1.0 - damping) / len(seed_ids)
    else:
        svec = np.full(n, 1.0 / n)
        ranks = svec.copy()
        teleport = np.full(n, (1.0 - damping) / n)
    for _ in range(iters):
        rod_ref = ray.put(ranks * inv_deg)  # rank/outdeg, 0 at dangling

        def contrib(b: pa.Table) -> pa.Table:
            rod = get_broadcast(rod_ref)
            si = b["si"].to_numpy(zero_copy_only=False)
            di = b["di"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(di, return_inverse=True)
            return pa.table(
                {
                    "i": pa.array(u, pa.int64()),
                    "s": pa.array(
                        np.bincount(inv, weights=rod[si]), pa.float64()
                    ),
                }
            )

        acc = np.zeros(n)
        for b in idx.map_batches(
            contrib, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            np.add.at(
                acc,
                b["i"].to_numpy(zero_copy_only=False),
                b["s"].to_numpy(zero_copy_only=False),
            )
        dmass = float(ranks[dangling].sum())
        if seeds is None:
            # identical arithmetic to the classic formulation (x/n,
            # not x*(1/n)) so the existing oracle stays bit-stable
            ranks = teleport + damping * (acc + dmass / n)
        else:
            ranks = teleport + damping * (acc + dmass * svec)

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "rank": pa.array(
                    np.round(ranks * n, 6), pa.float64()
                ),
            }
        )
    )


# --------------------------------------------------------------------
# Triangle counting
# --------------------------------------------------------------------

_TRI_COARSE = 64  #: exchange width for wedge generation / closure check


def triangle_count(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    coarse: int = _TRI_COARSE,
):
    """Global count wrapper over :func:`_triangle_core` (docs there)."""
    return _triangle_core(edges_ds, src_col, dst_col, coarse, False)


def node_clustering(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    coarse: int = _TRI_COARSE,
):
    """-> Dataset(node, triangles, coeff): per-node triangle counts
    and local clustering coefficient ``2T / (d (d-1))`` (0 where
    d < 2), 6-dp rounded. Same machinery as :func:`triangle_count`
    with wedge rows carrying their center so a closed wedge credits
    all three corners; per-group partial (node, count) rows fold
    through a node-bounded exchange. Oracle `node_clustering`
    (pipelines/relational.py) re-derives it with the DuckDB 3-way
    self-join unpivoted over the triangle corners."""
    return _triangle_core(edges_ds, src_col, dst_col, coarse, True)


def _triangle_core(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    coarse: int = _TRI_COARSE,
    per_node: bool = False,
):
    """-> Dataset with one row ``{triangles: int64}`` — exact global
    triangle count of the UNDIRECTED simple graph underlying the edge
    list (direction, self-loops and multi-edges are normalized away).

    Degree-oriented wedge counting (the MapReduce-classic shape,
    Suri & Vassilvitskii 2011):

    1. normalize + dedup edges through a coarse packed-key exchange
       (never a driver set);
    2. degrees and the (degree, id) orientation rank are node-sized
       driver state — the same O(N) bound as :func:`pagerank` — and
       broadcast once;
    3. each edge orients low-rank -> high-rank, so every node's
       out-neighborhood is O(sqrt(E))-bounded, which bounds wedge
       fan-out C(outdeg, 2) — the step that explodes on skewed graphs
       without orientation;
    4. wedges (pairs of out-neighbors of a shared center) are emitted
       inside a coarse ``groupby(center % K)`` with numpy run
       detection (no per-node Ray groups);
    5. closure check = one more coarse exchange where wedge instances
       and oriented edges meet on the packed (lo, hi) key and a
       vectorized ``searchsorted`` membership counts matches — the
       edge set is never collected anywhere.

    The ``triangle_count`` query is value-hash-checked against a
    DuckDB 3-way self-join oracle on a deterministic ring+chord graph
    (pipelines/relational.py:SQL_TRIANGLE_COUNT).
    """
    import pandas as pd
    import ray.data as rd

    nodes = _collect_unique(edges_ds, [src_col, dst_col])
    n = len(nodes)
    if n < 3:
        if per_node:
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array(nodes, pa.int64()),
                        "triangles": pa.array([0] * n, pa.int64()),
                        "coeff": pa.array([0.0] * n, pa.float64()),
                    }
                )
            )
        return rd.from_arrow(
            pa.table({"triangles": pa.array([0], pa.int64())})
        )
    nodes_ref = ray.put(nodes)

    # ---- 1. normalize to packed undirected (lo_idx, hi_idx) keys
    def norm(b: pa.Table) -> pa.Table:
        nd = get_broadcast(nodes_ref)
        s = np.searchsorted(
            nd, b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        d = np.searchsorted(
            nd, b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        packed = lo * n + hi  # n <= 2^31 in the driver-rank regime
        return pa.table(
            {
                "packed": pa.array(packed, pa.int64()),
                "ek": pa.array(packed % coarse, pa.int64()),
            }
        )

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"packed": np.unique(g["packed"].to_numpy())}
        )

    uniq = (
        edges_ds.map_batches(norm, batch_format="pyarrow")
        .groupby("ek")
        .map_groups(dedup_group, batch_format="pandas")
        .materialize()
    )

    # ---- 2. degrees + orientation rank (node-sized driver state)
    def deg_partial(b: pa.Table) -> pa.Table:
        p = b["packed"].to_numpy(zero_copy_only=False)
        ends = np.concatenate([p // n, p % n])
        u, c = np.unique(ends, return_counts=True)
        return pa.table(
            {"i": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    deg = np.zeros(n, np.int64)
    for b in uniq.map_batches(
        deg_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        np.add.at(
            deg,
            b["i"].to_numpy(zero_copy_only=False),
            b["c"].to_numpy(zero_copy_only=False),
        )
    rank = np.empty(n, np.int64)
    rank[np.lexsort((np.arange(n), deg))] = np.arange(n)
    rank_ref = ray.put(rank)

    # ---- 3+4. orient + wedge generation inside coarse center groups
    def orient(b: pa.Table) -> pa.Table:
        r = get_broadcast(rank_ref)
        p = b["packed"].to_numpy(zero_copy_only=False)
        lo, hi = p // n, p % n
        swap = r[lo] > r[hi]
        a = np.where(swap, hi, lo)  # center candidate: lower rank
        c = np.where(swap, lo, hi)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(c, pa.int64()),
                "ck": pa.array(a % coarse, pa.int64()),
            }
        )

    oriented = uniq.map_batches(
        orient, batch_format="pyarrow"
    ).materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        r = get_broadcast(rank_ref)
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        # neighbors sorted by (center, neighbor RANK) so each wedge
        # pair is itself low-rank -> high-rank oriented
        order = np.lexsort((r[b], a))
        a, b = a[order], b[order]
        m = len(a)
        change = np.empty(m, dtype=bool)
        change[0] = True
        np.not_equal(a[1:], a[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, m))
        # wedge keys are packed canonically by ID (min*n+max) to match
        # the id-canonical `uniq` edge keys in the closure exchange —
        # the rank order above only bounds fan-out, it is not the key
        out, out_c = [], []
        two = starts[lens == 2]
        if len(two):
            x, y = b[two], b[two + 1]
            out.append(np.minimum(x, y) * n + np.maximum(x, y))
            out_c.append(a[two])
        for s0, ln in zip(starts[lens > 2], lens[lens > 2]):
            nb = b[s0 : s0 + ln]
            ii, jj = np.triu_indices(ln, k=1)
            x, y = nb[ii], nb[jj]
            out.append(np.minimum(x, y) * n + np.maximum(x, y))
            out_c.append(np.full(len(x), a[s0], np.int64))
        if not out:
            return pd.DataFrame(
                {
                    "packed": np.empty(0, np.int64),
                    "center": np.empty(0, np.int64),
                }
            )
        return pd.DataFrame(
            {
                "packed": np.concatenate(out),
                "center": np.concatenate(out_c),
            }
        )

    wedge_ds = (
        oriented.groupby("ck")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(
            lambda t: t.append_column(
                "ek",
                pa.array(
                    t["packed"].to_numpy(zero_copy_only=False) % coarse,
                    pa.int64(),
                ),
            ).append_column(
                "kind",
                pa.array(np.ones(len(t), np.int64), pa.int64()),
            ),
            batch_format="pyarrow",
        )
    )

    # column order mirrors the wedge rows (packed, center, ek, kind) —
    # union requires identical schemas
    edges_tagged = uniq.map_batches(
        lambda t: t.append_column(
            "center", pa.array(np.full(len(t), -1, np.int64), pa.int64())
        )
        .append_column(
            "ek",
            pa.array(
                t["packed"].to_numpy(zero_copy_only=False) % coarse,
                pa.int64(),
            ),
        )
        .append_column(
            "kind", pa.array(np.zeros(len(t), np.int64), pa.int64())
        ),
        batch_format="pyarrow",
    )

    # ---- 5. closure: wedge instances meet edges on the packed key
    def close_group(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].to_numpy()
        p = g["packed"].to_numpy()
        eset = np.sort(p[kind == 0])
        wsel = kind == 1
        w = p[wsel]
        if not len(w) or not len(eset):
            matched = np.zeros(0, dtype=bool)
        else:
            pos = np.searchsorted(eset, w)
            pos[pos == len(eset)] = len(eset) - 1
            matched = eset[pos] == w
        if not per_node:
            return pd.DataFrame({"t": [int(matched.sum())]})
        # credit all three corners of each closed wedge
        if not matched.any():
            return pd.DataFrame(
                {
                    "i": np.empty(0, np.int64),
                    "t": np.empty(0, np.int64),
                }
            )
        wp = w[matched]
        centers = g["center"].to_numpy()[wsel][matched]
        corners = np.concatenate([centers, wp // n, wp % n])
        u, c = np.unique(corners, return_counts=True)
        return pd.DataFrame({"i": u, "t": c})

    counted = (
        edges_tagged.union(wedge_ds)
        .groupby("ek")
        .map_groups(close_group, batch_format="pandas")
    )
    if not per_node:
        total = sum(
            b["t"].to_numpy(zero_copy_only=False).sum()
            for b in counted.iter_batches(batch_format="pyarrow")
        )
        return rd.from_arrow(
            pa.table({"triangles": pa.array([int(total)], pa.int64())})
        )
    # node-bounded driver fold (same O(N) contract as deg/rank)
    tri = np.zeros(n, np.int64)
    for b in counted.iter_batches(batch_format="pyarrow"):
        np.add.at(
            tri,
            b["i"].to_numpy(zero_copy_only=False),
            b["t"].to_numpy(zero_copy_only=False),
        )
    denom = deg.astype(np.float64) * (deg - 1)
    coeff = np.where(denom > 0, 2.0 * tri / np.maximum(denom, 1), 0.0)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "triangles": pa.array(tri, pa.int64()),
                "coeff": pa.array(np.round(coeff, 6), pa.float64()),
            }
        )
    )


def pagerank_distributed(
    edges_ds,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
):
    """:func:`pagerank` beyond the driver-resident-rank ceiling: the
    rank vector lives as a DATASET, so node count is bounded by the
    cluster, not the driver. Honest cost: each iteration is one hash
    join (edges ⋈ ranks on src) plus one groupby(dst) — 2 exchanges ×
    ``iters``; the broadcast variant exists precisely because this is
    ~an order of magnitude more data movement when ranks DO fit the
    driver. Semantics identical (no-dangling graphs; exact equality
    with :func:`pagerank` is asserted in tests/test_graph.py).

    Degrees are joined in once up front (edges carry ``inv_deg``), and
    the per-iteration contribution is pre-aggregated per (block, dst)
    before the shuffle so the groupby moves partial sums, not one row
    per edge."""
    import pandas as pd
    import ray.data as rd

    from .joins import hash_join, strip_schema_metadata

    edges = strip_schema_metadata(
        edges_ds.map_batches(
            lambda b: pa.table(
                {
                    "src": pc.cast(b[src_col], pa.int64()),
                    "dst": pc.cast(b[dst_col], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    # out-degree joined into the edge table ONCE
    def deg_partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        u, c = np.unique(s, return_counts=True)
        return pa.table(
            {"src": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    from ray.data.aggregate import Sum as _Sum

    degs = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("src")
        .aggregate(_Sum("c", alias_name="deg"))
    )
    edges = hash_join(
        edges, degs, on=["src"], how="inner",
        num_partitions=num_partitions,
    ).map_batches(
        lambda b: pa.table(
            {
                "src": b["src"],
                "dst": b["dst"],
                "inv_deg": pc.divide(
                    pa.scalar(1.0),
                    pc.cast(b["deg"], pa.float64()),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    # node table (distinct endpoints) as the rank seed
    def ends(b: pa.Table) -> pa.Table:
        v = np.unique(
            np.concatenate(
                [
                    b["src"].to_numpy(zero_copy_only=False),
                    b["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"node": pa.array(v, pa.int64())})

    def dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.unique(g["node"].to_numpy())})

    nodes = (
        edges.map_batches(ends, batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column(
                "nk",
                pa.array(
                    b["node"].to_numpy(zero_copy_only=False) % 64,
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("nk")
        .map_groups(dedup_nodes, batch_format="pandas")
        .materialize()
    )
    n = nodes.count()
    base = (1.0 - damping) / n

    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "rank",
            pa.array(np.full(b.num_rows, 1.0 / n), pa.float64()),
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        contrib = hash_join(
            edges, ranks, on=["src"], right_on=["node"], how="inner",
            num_partitions=num_partitions,
        ).map_batches(
            # pre-aggregate per (block, dst) BEFORE the shuffle
            lambda b: _dst_partials(b),
            batch_format="pyarrow",
        )
        summed = contrib.groupby("dst").aggregate(
            _Sum("s", alias_name="s")
        )
        # left join on nodes keeps zero-in-degree nodes at the base rank
        ranks = hash_join(
            nodes, summed, on=["node"], right_on=["dst"], how="left",
            num_partitions=num_partitions,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "rank": pc.add(
                        pa.scalar(base),
                        pc.multiply(
                            pa.scalar(damping),
                            pc.fill_null(b["s"], 0.0),
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return ranks.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "rank": pc.round(
                    pc.multiply(b["rank"], pa.scalar(float(n))),
                    ndigits=6,
                ),
            }
        ),
        batch_format="pyarrow",
    )


def _dst_partials(b: pa.Table) -> pa.Table:
    dst = b["dst"].to_numpy(zero_copy_only=False)
    w = b["rank"].to_numpy(zero_copy_only=False) * b[
        "inv_deg"
    ].to_numpy(zero_copy_only=False)
    u, inv = np.unique(dst, return_inverse=True)
    return pa.table(
        {
            "dst": pa.array(u, pa.int64()),
            "s": pa.array(np.bincount(inv, weights=w), pa.float64()),
        }
    )




# ------------------------------------------------- round-3 additions


def _unique_undirected(edges_ds, src_col: str, dst_col: str, coarse: int):
    """Shared normalization for the round-3 graph family: index nodes
    (O(N) driver state, the module's stated bound), drop self-loops,
    canonicalize direction, dedup multi-edges through a coarse packed-
    key exchange (never a driver set). Returns
    ``(uniq_ds[packed], nodes, n, nodes_ref)`` with ``packed = lo*n+hi``
    over node INDICES — the same key layout :func:`_triangle_core`
    uses."""
    import pandas as pd

    nodes = _collect_unique(edges_ds, [src_col, dst_col])
    n = len(nodes)
    nodes_ref = ray.put(nodes)

    def norm(b: pa.Table) -> pa.Table:
        nd = get_broadcast(nodes_ref)
        s = np.searchsorted(
            nd, b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        d = np.searchsorted(
            nd, b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        packed = lo * n + hi
        return pa.table(
            {
                "packed": pa.array(packed, pa.int64()),
                "ek": pa.array(packed % coarse, pa.int64()),
            }
        )

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"packed": np.unique(g["packed"].to_numpy())})

    uniq = (
        edges_ds.map_batches(norm, batch_format="pyarrow")
        .groupby("ek")
        .map_groups(dedup_group, batch_format="pandas")
        .materialize()
    )
    return uniq, nodes, n, nodes_ref


def _alive_degrees(uniq, alive: np.ndarray, n: int) -> np.ndarray:
    """One streaming pass over the deduped edge Dataset: degree of
    every node counting only edges whose BOTH endpoints are alive.
    Per-block (idx, count) partials; node-sized driver fold."""
    alive_ref = ray.put(alive)

    def partial(b: pa.Table) -> pa.Table:
        av = get_broadcast(alive_ref)
        p = b["packed"].to_numpy(zero_copy_only=False)
        lo, hi = p // n, p % n
        keep = av[lo] & av[hi]
        ends = np.concatenate([lo[keep], hi[keep]])
        u, c = np.unique(ends, return_counts=True)
        return pa.table(
            {"i": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    deg = np.zeros(n, np.int64)
    for b in uniq.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        np.add.at(
            deg,
            b["i"].to_numpy(zero_copy_only=False),
            b["c"].to_numpy(zero_copy_only=False),
        )
    return deg


def kcore(
    edges_ds,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    coarse: int = _TRI_COARSE,
    max_rounds: int = 64,
):
    """-> Dataset(node, core_deg): the k-core of the undirected simple
    graph (maximal subgraph with min degree >= k) by parallel peeling
    — every round drops ALL nodes of current degree < k at once, so
    round count is the graph's peeling complexity (typically tens),
    not node count. Each round is ONE streaming pass over the deduped
    edge Dataset (per-block degree partials against a broadcast alive
    mask); the alive/degree vectors are node-sized driver state — the
    same O(N) ceiling :func:`pagerank` documents. Raises on
    non-convergence at ``max_rounds`` (the CC convergence-guard rule:
    never return silently-unpeeled cores).

    Reference context: the theorem-graph CSVs
    (Styling/tools/theoremdb/extract_graph.py) feed citation-graph
    consumers; core decomposition is the standard "dense citation
    community" query on that artifact. Oracle `kcore_nodes`
    (pipelines/relational.py) replays the peel with a DuckDB recursive
    CTE carrying the surviving edge set per level."""
    import ray.data as rd

    uniq, nodes, n, _ = _unique_undirected(edges_ds, src_col, dst_col, coarse)
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "core_deg": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return rd.from_arrow(empty)

    alive = np.ones(n, dtype=bool)
    deg = _alive_degrees(uniq, alive, n)
    for _round in range(max_rounds):
        drop = alive & (deg < k)
        if not drop.any():
            break
        alive &= deg >= k
        if not alive.any():
            break
        deg = _alive_degrees(uniq, alive, n)
    else:
        raise RuntimeError(
            f"kcore: peeling did not converge in {max_rounds} rounds"
        )
    if not alive.any():
        return rd.from_arrow(empty)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes[alive], pa.int64()),
                "core_deg": pa.array(deg[alive], pa.int64()),
            }
        )
    )


def bfs_hops(
    edges_ds,
    seeds,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 16,
    coarse: int = _TRI_COARSE,
):
    """-> Dataset(node, hops): minimum hop distance from any seed over
    the undirected simple graph, capped at ``max_hops`` (unreached
    nodes are absent). Level-synchronous frontier BFS: the visited /
    frontier vectors are node-sized driver state, each level is one
    streaming pass over the deduped edges emitting per-block
    frontier-neighbor partials. Edges incident to no frontier node
    contribute nothing to driver traffic.

    Oracle `bfs_hops` (pipelines/relational.py): DuckDB recursive
    UNION walk with min(d) per node — identical cap on both sides."""
    import ray.data as rd

    uniq, nodes, n, _ = _unique_undirected(edges_ds, src_col, dst_col, coarse)
    dist = np.full(n, -1, np.int64)
    seed_idx = np.flatnonzero(
        np.isin(nodes, np.asarray(list(seeds), np.int64))
    )
    dist[seed_idx] = 0
    frontier = np.zeros(n, dtype=bool)
    frontier[seed_idx] = True

    for hop in range(1, max_hops + 1):
        if not frontier.any():
            break
        fr_ref = ray.put(frontier)

        def partial(b: pa.Table) -> pa.Table:
            fr = get_broadcast(fr_ref)
            p = b["packed"].to_numpy(zero_copy_only=False)
            lo, hi = p // n, p % n
            out = np.unique(
                np.concatenate([hi[fr[lo]], lo[fr[hi]]])
            )
            return pa.table({"i": pa.array(out, pa.int64())})

        cand = np.zeros(n, dtype=bool)
        for b in uniq.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            cand[b["i"].to_numpy(zero_copy_only=False)] = True
        newly = cand & (dist < 0)
        dist[newly] = hop
        frontier = newly

    reached = dist >= 0
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes[reached], pa.int64()),
                "hops": pa.array(dist[reached], pa.int64()),
            }
        )
    )


def link_predict(
    edges_ds,
    min_common: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    coarse: int = _TRI_COARSE,
    max_degree: int | None = None,
):
    """-> Dataset(a, b, cn, jaccard, adamic_adar): link-prediction
    scores for every NON-edge pair with >= ``min_common`` common
    neighbors — common-neighbor count, neighborhood Jaccard, and
    Adamic-Adar (sum of 1/ln(deg(center)) over shared neighbors).

    Shape mirrors :func:`_triangle_core`: adjacency rows grouped by a
    coarse center key generate wedge pairs with numpy run detection;
    each group PRE-AGGREGATES (pair, count, aa-weight) partials before
    the pair-keyed exchange, where existing edges ride along as tagged
    rows so the non-edge filter happens inside the same exchange (no
    extra join). Degrees are node-sized driver state broadcast once.

    Wedge fan-out is C(deg, 2) per center — the documented hub hazard;
    ``max_degree`` skips centers above the cap (the standard
    recall-for-cost trade on skewed graphs; None = exact). Pairs with
    cn < ``min_common`` never leave the generating group unpruned —
    they still ship as partials, but the packed-key exchange is
    wedge-bounded exactly like the triangle closure check."""
    import pandas as pd
    import ray.data as rd

    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "cn": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
            "adamic_adar": pa.array([], pa.float64()),
        }
    )
    uniq, nodes, n, nodes_ref = _unique_undirected(
        edges_ds, src_col, dst_col, coarse
    )
    if n < 3:
        return rd.from_arrow(empty)
    deg = _alive_degrees(uniq, np.ones(n, dtype=bool), n)
    deg_ref = ray.put(deg)

    # adjacency rows (center, nbr) both directions, coarse center key
    def adj(b: pa.Table) -> pa.Table:
        p = b["packed"].to_numpy(zero_copy_only=False)
        lo, hi = p // n, p % n
        c = np.concatenate([lo, hi])
        v = np.concatenate([hi, lo])
        return pa.table(
            {
                "c": pa.array(c, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "ck": pa.array(c % coarse, pa.int64()),
            }
        )

    def wedge_partials(g: pd.DataFrame) -> pd.DataFrame:
        d = get_broadcast(deg_ref)
        c = g["c"].to_numpy()
        v = g["v"].to_numpy()
        order = np.lexsort((v, c))
        c, v = c[order], v[order]
        m = len(c)
        change = np.empty(m, dtype=bool)
        change[0] = True
        np.not_equal(c[1:], c[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, m))
        sel = lens >= 2
        if max_degree is not None:
            sel &= lens <= max_degree
        pk, wt = [], []
        for s0, ln in zip(starts[sel], lens[sel]):
            nb = v[s0 : s0 + ln]
            ii, jj = np.triu_indices(ln, k=1)
            pk.append(nb[ii] * n + nb[jj])  # nb sorted asc -> lo*n+hi
            wt.append(
                np.full(len(ii), 1.0 / np.log(d[c[s0]]), np.float64)
            )
        if not pk:
            return pd.DataFrame(
                {
                    "packed": np.empty(0, np.int64),
                    "cn": np.empty(0, np.int64),
                    "aa": np.empty(0, np.float64),
                }
            )
        pka = np.concatenate(pk)
        wta = np.concatenate(wt)
        u, inv = np.unique(pka, return_inverse=True)
        return pd.DataFrame(
            {
                "packed": u,
                "cn": np.bincount(inv),
                "aa": np.bincount(inv, weights=wta),
            }
        )

    wedge_ds = (
        uniq.map_batches(adj, batch_format="pyarrow")
        .groupby("ck")
        .map_groups(wedge_partials, batch_format="pandas")
        .map_batches(
            lambda t: t.append_column(
                "ek",
                pa.array(
                    t["packed"].to_numpy(zero_copy_only=False) % coarse,
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
        )
    )
    # existing edges ride the same exchange tagged cn = -1
    edges_tagged = uniq.map_batches(
        lambda t: pa.table(
            {
                "packed": t["packed"],
                "cn": pa.array(np.full(len(t), -1, np.int64), pa.int64()),
                "aa": pa.array(np.zeros(len(t)), pa.float64()),
                "ek": pa.array(
                    t["packed"].to_numpy(zero_copy_only=False) % coarse,
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        d = get_broadcast(deg_ref)
        nd = get_broadcast(nodes_ref)
        p = g["packed"].to_numpy()
        cn = g["cn"].to_numpy()
        aa = g["aa"].to_numpy()
        is_edge = cn < 0
        eset = np.sort(p[is_edge])
        wsel = ~is_edge
        p, cn, aa = p[wsel], cn[wsel], aa[wsel]
        u, inv = np.unique(p, return_inverse=True)
        cn_t = np.bincount(inv, weights=cn).astype(np.int64)
        aa_t = np.bincount(inv, weights=aa)
        if len(eset):
            pos = np.searchsorted(eset, u)
            pos[pos == len(eset)] = len(eset) - 1
            keep = eset[pos] != u
        else:
            keep = np.ones(len(u), dtype=bool)
        keep &= cn_t >= min_common
        u, cn_t, aa_t = u[keep], cn_t[keep], aa_t[keep]
        lo, hi = u // n, u % n
        jac = cn_t / (d[lo] + d[hi] - cn_t)
        return pd.DataFrame(
            {
                "a": nd[lo],
                "b": nd[hi],
                "cn": cn_t,
                "jaccard": np.round(jac, 6),
                "adamic_adar": np.round(aa_t, 6),
            }
        )

    out = (
        wedge_ds.union(edges_tagged)
        .groupby("ek")
        .map_groups(finish, batch_format="pandas")
    )
    return out


def _harmonic_broadcast(
    src: np.ndarray, dst: np.ndarray, max_hops: int
):
    """Small-graph plan for :func:`harmonic_bounded`: the whole edge
    list fits the broadcast budget, so BFS runs inside ``map_batches``
    against ONE shared CSR (ray.put) — per batch of source nodes, each
    level is a repeat/cumsum neighbor gather + packed-int dedup, no
    per-level distributed exchange. Replaces 2*(max_hops-1)+2 cluster
    exchanges with zero; identical semantics (min walk distance,
    through-source walks pruned — a shortest path never revisits its
    source)."""
    import ray
    import ray.data as rd

    from ..state.broadcast import get_broadcast

    # dense node index + CSR (dedup parallel edges, drop self loops)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    nodes = np.unique(np.concatenate([src, dst]))
    s_idx = np.searchsorted(nodes, src).astype(np.int64)
    d_idx = np.searchsorted(nodes, dst).astype(np.int64)
    order = np.lexsort((d_idx, s_idx))
    s_idx, d_idx = s_idx[order], d_idx[order]
    uniq = np.r_[True, (s_idx[1:] != s_idx[:-1]) | (d_idx[1:] != d_idx[:-1])]
    s_idx, d_idx = s_idx[uniq], d_idx[uniq]
    N = np.int64(len(nodes))
    offs = np.zeros(N + 1, np.int64)
    offs[1:] = np.cumsum(np.bincount(s_idx, minlength=int(N)))
    queries = nodes[np.unique(s_idx)]
    ref = ray.put((nodes, offs, d_idx))

    class Bfs:
        def __init__(self, model_ref) -> None:
            self.nodes, self.offs, self.flat = get_broadcast(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            qn = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            B = len(qn)
            qi = np.searchsorted(self.nodes, qn)
            n_nodes = np.int64(len(self.nodes))
            seen = np.sort(np.arange(B, dtype=np.int64) * n_nodes + qi)
            cur_q = np.arange(B, dtype=np.int64)
            cur_n = qi.copy()
            n_reach = np.zeros(B, np.int64)
            ecc = np.zeros(B, np.int64)
            harm = np.zeros(B, np.float64)
            for d in range(1, max_hops + 1):
                deg = self.offs[cur_n + 1] - self.offs[cur_n]
                tot = int(deg.sum())
                if tot == 0:
                    break
                nq = np.repeat(cur_q, deg)
                base = np.repeat(self.offs[cur_n], deg)
                intra = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(deg) - deg, deg
                )
                nn = self.flat[base + intra]
                pack = np.unique(nq * n_nodes + nn)
                pos = np.searchsorted(seen, pack)
                pos_c = np.minimum(pos, len(seen) - 1)
                new = pack[(seen[pos_c] != pack) | (pos >= len(seen))]
                if len(new) == 0:
                    break
                gq = new // n_nodes
                cnt = np.bincount(gq, minlength=B)
                n_reach += cnt
                ecc[cnt > 0] = d
                harm += np.bincount(
                    gq, weights=np.full(len(new), 1.0 / d), minlength=B
                )
                seen = np.sort(np.concatenate([seen, new]))
                cur_q = gq
                cur_n = new % n_nodes
            return pa.table(
                {
                    "node": pa.array(qn, pa.int64()),
                    "n_reach": pa.array(n_reach, pa.int64()),
                    "ecc": pa.array(ecc, pa.int64()),
                    "harmonic": pa.array(np.round(harm, 6), pa.float64()),
                }
            )

    qds = rd.from_arrow(
        pa.table({"node": pa.array(queries, pa.int64())})
    ).repartition(max(1, len(queries) // 4096))
    return qds.map_batches(
        Bfs,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=2048,
    )


def harmonic_bounded(
    edges_ds,
    max_hops: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_budget_rows: int = 2_000_000,
    plan: str = "auto",
):
    """-> Dataset(node, n_reach, ecc, harmonic): bounded-hop harmonic
    centrality over a DIRECTED graph — for every node u, the set of
    nodes v != u with walk distance d(u, v) <= max_hops contributes
    sum(1/d) (harmonic), max d (ecc) and a count (n_reach).

    Contrast with :func:`bfs_hops` (node-sized driver vectors, one
    source set): here the (src, dst, d) pair frontier stays a Dataset
    end to end — per-level expansion is a distributed hash join of
    the frontier against the edge list, level dedup and the final
    min-distance fold are coarse-bucketed exchanges (pair-hash % 64)
    with vectorized pandas combines inside each bucket — NOT
    ``Dataset.groupby(...).aggregate`` which goes pathological at
    high key cardinality (measured 45 s for a 119k-row / 115k-key
    sum on 8 CPUs vs 2 s for the bucketed combine). No per-node
    driver state, so the node set never has to fit on the driver;
    the scale contract is instead that k-hop OUT-neighborhoods are
    bounded (frontier size <= n * max_outdeg**k rows), which is what
    makes bounded-hop centrality tractable on any engine. Reference
    analog: the citation-graph CSVs of
    Styling/tools/theoremdb/extract_graph.py are exactly the edge
    lists downstream consumers rank.
    """
    import pandas as pd
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..functions.hashing import splitmix64
    from .joins import hash_join

    coarse = _TRI_COARSE

    def norm(b: pa.Table) -> pa.Table:
        s = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        return pa.table(
            {
                "src": pa.array(s[keep], pa.int64()),
                "dst": pa.array(d[keep], pa.int64()),
            }
        )

    def add_pair_bucket(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = (splitmix64(splitmix64(s) + d) % np.uint64(coarse)).astype(
            np.int64
        )
        return b.append_column("bucket", pa.array(bk))

    def distinct_pairs(ds):
        def dedup(g: pd.DataFrame) -> pd.DataFrame:
            return g[["src", "dst"]].drop_duplicates()

        return (
            ds.map_batches(add_pair_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(dedup, batch_format="pandas")
        )

    nrm = edges_ds.map_batches(norm, batch_format="pyarrow")
    if plan == "auto":
        # one cheap pass decides: below the budget the whole edge list
        # broadcasts and BFS runs inside map_batches (zero per-level
        # exchanges); above it, the frontier stays a Dataset
        plan = (
            "broadcast"
            if nrm.count() <= broadcast_budget_rows
            else "distributed"
        )
    if plan == "broadcast":
        df = nrm.to_pandas()  # bounded by broadcast_budget_rows
        return _harmonic_broadcast(
            df["src"].to_numpy(np.int64),
            df["dst"].to_numpy(np.int64),
            max_hops,
        )
    edges = distinct_pairs(nrm)

    # Edge copy with join-safe names for the expansion side.
    def rename_edges(b: pa.Table) -> pa.Table:
        return pa.table({"via": b["src"], "nxt": b["dst"]})

    hop_edges = edges.map_batches(rename_edges, batch_format="pyarrow")

    def with_d(ds, d: int):
        def add(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": b["src"],
                    "dst": b["dst"],
                    "d": pa.array(
                        np.full(len(b), d, np.int64), pa.int64()
                    ),
                }
            )

        return ds.map_batches(add, batch_format="pyarrow")

    levels = [with_d(edges, 1)]
    frontier = edges
    for d in range(2, max_hops + 1):
        expanded = hash_join(frontier, hop_edges, on=["dst"], right_on=["via"])

        def step(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False)
            nx = b["nxt"].to_numpy(zero_copy_only=False)
            keep = s != nx
            return pa.table(
                {
                    "src": pa.array(s[keep], pa.int64()),
                    "dst": pa.array(nx[keep], pa.int64()),
                }
            )

        frontier = distinct_pairs(
            expanded.map_batches(step, batch_format="pyarrow")
        )
        levels.append(with_d(frontier, d))

    all_levels = levels[0]
    for lv in levels[1:]:
        all_levels = all_levels.union(lv)

    min_d = all_levels.groupby(["src", "dst"]).aggregate(
        Min("d", alias_name="d")
    )

    def score(b: pa.Table) -> pa.Table:
        d = b["d"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "node": b["src"],
                "inv": pa.array(1.0 / d, pa.float64()),
                "d": b["d"],
            }
        )

    agg = (
        min_d.map_batches(score, batch_format="pyarrow")
        .groupby("node")
        .aggregate(
            Count(alias_name="n_reach"),
            Max("d", alias_name="ecc"),
            Sum("inv", alias_name="h"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(b["node"], pa.int64()),
                "n_reach": pc.cast(b["n_reach"], pa.int64()),
                "ecc": pc.cast(b["ecc"], pa.int64()),
                "harmonic": pa.array(
                    np.round(
                        b["h"].to_numpy(zero_copy_only=False), 6
                    ),
                    pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------
# Neighbor feature propagation (message passing)
# --------------------------------------------------------------------


def feature_propagate(
    edges_ds,
    feats_ds,
    rounds: int = 2,
    node_col: str = "node",
    feat_col: str = "x",
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    broadcast_budget_rows: int = 2_000_000,
    plan: str = "auto",
):
    """GNN-style message passing over a directed edge Dataset:
    ``h_0 = x``; ``h_{k+1}(v) = h_k(v) + sum_{(u->v)} h_k(u)``.

    The GraphSAGE-sum aggregation shape (one hop of neighbourhood
    context per round) with INTEGER features, so the result is exact
    and independent of partitioning / summation order — what the
    reference's per-paper context features (theorem counts seen by a
    citing paper) look like when the corpus is a graph, and the
    oracle-checkable core of learned graph featurization.

    Scale shape per round: one hash-partitioned join (edges x current
    features on ``src``) + per-batch partial sums per ``dst`` + one
    small groupby, then a LEFT join back onto the feature Dataset
    (nodes with no in-edges keep their value). Nothing is collected on
    the driver; the feature vector lives as a Dataset like
    :func:`pagerank_distributed`'s rank vector.

    When the feature table fits ``broadcast_budget_rows`` the state
    instead broadcasts per round (the pagerank-degrees-broadcast
    pattern): each round is one edge scan gathering h[src] by
    searchsorted + one 64-bucket exchange of per-batch dst partials,
    replacing three exchanges with one — measured 8.1 s -> ~2.5 s at
    sf0.1. ``plan="distributed"`` pins the Dataset-state path.

    Returns Dataset(node, h1, ..., h{rounds}) with int64 columns.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .joins import hash_join, strip_schema_metadata

    edges = strip_schema_metadata(
        edges_ds.map_batches(
            lambda b: pa.table(
                {
                    "src": pc.cast(b[src_col], pa.int64()),
                    "dst": pc.cast(b[dst_col], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    hist_cols: list[str] = []
    cur = strip_schema_metadata(
        feats_ds.map_batches(
            lambda b: pa.table(
                {
                    "node": pc.cast(b[node_col], pa.int64()),
                    "h": pc.cast(b[feat_col], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    if plan == "auto":
        plan = (
            "broadcast"
            if cur.count() <= broadcast_budget_rows
            else "distributed"
        )
    if plan == "broadcast":
        import pandas as pd
        import ray

        from ..functions.hashing import splitmix64
        from ..state.broadcast import get_broadcast

        feats = cur.to_pandas()  # bounded by broadcast_budget_rows
        order = np.argsort(feats["node"].to_numpy(np.int64), kind="stable")
        nodes = feats["node"].to_numpy(np.int64)[order]
        h = feats["h"].to_numpy(np.int64)[order]
        hist: list[np.ndarray] = []
        NB = 64
        for _k in range(rounds):
            ref = ray.put((nodes, h))

            def msg_partial(b: pa.Table, _ref=ref) -> pa.Table:
                nodes_, h_ = get_broadcast(_ref)
                s = b["src"].to_numpy(zero_copy_only=False)
                d = b["dst"].to_numpy(zero_copy_only=False)
                pos_ = np.searchsorted(nodes_, s)
                pos_c = np.minimum(pos_, len(nodes_) - 1)
                # srcs without a feature row contribute nothing — the
                # distributed plan's inner join on src drops them
                m = (pos_ < len(nodes_)) & (nodes_[pos_c] == s)
                hv = h_[pos_c[m]]
                u, inv = np.unique(d[m], return_inverse=True)
                sm = np.zeros(len(u), np.int64)
                np.add.at(sm, inv, hv)
                bk = (
                    splitmix64(u.astype(np.uint64)) % np.uint64(NB)
                ).astype(np.int64)
                return pa.table(
                    {
                        "bk": pa.array(bk, pa.int64()),
                        "node": pa.array(u, pa.int64()),
                        "insum": pa.array(sm, pa.int64()),
                    }
                )

            def fold(g: pd.DataFrame) -> pd.DataFrame:
                n = g["node"].to_numpy(np.int64)
                s = g["insum"].to_numpy(np.int64)
                u, inv = np.unique(n, return_inverse=True)
                return pd.DataFrame(
                    {
                        "node": u,
                        "insum": np.bincount(inv, weights=s).astype(
                            np.int64
                        ),
                    }
                )

            sums = (
                edges.map_batches(msg_partial, batch_format="pyarrow")
                .groupby("bk")
                .map_groups(fold, batch_format="pandas")
                .to_pandas()  # node-bounded
            )
            nxt = h.copy()
            pos = np.searchsorted(nodes, sums["node"].to_numpy(np.int64))
            # dsts outside the feature table are dropped, matching the
            # distributed plan's left join onto the feature Dataset
            ok = (pos < len(nodes)) & (
                nodes[np.minimum(pos, len(nodes) - 1)]
                == sums["node"].to_numpy(np.int64)
            )
            nxt[pos[ok]] += sums["insum"].to_numpy(np.int64)[ok]
            h = nxt
            hist.append(h.copy())
        cols = {"node": pa.array(nodes, pa.int64())}
        for i, arr in enumerate(hist, 1):
            cols[f"h{i}"] = pa.array(arr, pa.int64())
        return rd.from_arrow(pa.table(cols)).repartition(
            max(1, len(nodes) // 8192)
        )

    for k in range(1, rounds + 1):
        msgs = hash_join(
            edges,
            cur.select_columns(["node", "h"]),
            on=["src"],
            right_on=["node"],
            num_partitions=num_partitions,
        )

        def partial(b: pa.Table) -> pa.Table:
            d = b["dst"].to_numpy(zero_copy_only=False)
            h = b["h"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(d, return_inverse=True)
            s = np.zeros(len(u), np.int64)
            np.add.at(s, inv, h)  # int64 adds: no float53 cap
            return pa.table(
                {
                    "node": pa.array(u, pa.int64()),
                    "insum": pa.array(s, pa.int64()),
                }
            )

        sums = (
            msgs.map_batches(partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("insum", alias_name="insum"))
        )
        joined = hash_join(
            cur, sums, on=["node"], how="left",
            num_partitions=num_partitions,
        )
        col = f"h{k}"
        keep = ["node", "h"] + hist_cols

        def step(b: pa.Table, _col=col, _keep=tuple(keep)) -> pa.Table:
            h = b["h"].to_numpy(zero_copy_only=False)
            ins = pc.fill_null(
                pc.cast(b["insum"], pa.int64()), 0
            ).to_numpy(zero_copy_only=False)
            nxt = h + ins
            cols = {c: b[c] for c in _keep}
            cols["h"] = pa.array(nxt, pa.int64())
            cols[_col] = pa.array(nxt, pa.int64())
            cols["node"] = b["node"]
            return pa.table(cols)

        cur = joined.map_batches(step, batch_format="pyarrow")
        hist_cols.append(col)
        if k < rounds:
            cur = cur.materialize()

    return cur.select_columns(["node"] + hist_cols)


# --------------------------------------------------------------------
# HITS hubs/authorities and label-propagation communities
# --------------------------------------------------------------------


def _edge_gather_sum(
    edges, nodes: np.ndarray, vec: np.ndarray, gather_col: str, emit_col: str
) -> np.ndarray:
    """One broadcast-state half-round: for every edge, read the score
    of its ``gather_col`` endpoint from the broadcast (nodes, vec)
    pair, sum per ``emit_col`` endpoint (in-batch partials -> ONE
    64-bucket exchange -> node-bounded driver scatter). Exact int64
    arithmetic: independent of partitioning."""
    import pandas as pd
    import ray
    import ray.data as rd  # noqa: F401

    from ..functions.hashing import splitmix64
    from ..state.broadcast import get_broadcast

    NB = 64
    ref = ray.put((nodes, vec))

    def partial(b: pa.Table, _ref=ref) -> pa.Table:
        nodes_, vec_ = get_broadcast(_ref)
        g = b[gather_col].to_numpy(zero_copy_only=False)
        e = b[emit_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nodes_, g)
        posc = np.minimum(pos, len(nodes_) - 1)
        m = (pos < len(nodes_)) & (nodes_[posc] == g)
        u, inv = np.unique(e[m], return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, vec_[posc[m]])
        bk = (splitmix64(u.astype(np.uint64)) % np.uint64(NB)).astype(
            np.int64
        )
        return pa.table(
            {
                "bk": pa.array(bk, pa.int64()),
                "node": pa.array(u, pa.int64()),
                "s": pa.array(s, pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        n = g["node"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        u, inv = np.unique(n, return_inverse=True)
        return pd.DataFrame(
            {"node": u, "s": np.bincount(inv, weights=s).astype(np.int64)}
        )

    sums = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # node-bounded
    )
    out = np.zeros(len(nodes), np.int64)
    pos = np.searchsorted(nodes, sums["node"].to_numpy(np.int64))
    out[pos] = sums["s"].to_numpy(np.int64)
    return out


def hits(
    edges_ds,
    rounds: int = 1,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_budget_rows: int = 2_000_000,
):
    """HITS hubs/authorities (Kleinberg) with EXACT integer scores —
    the unnormalized power iteration: ``h_0 = 1``;
    ``a_{k+1}(v) = sum_{(u->v)} h_k(u)``;
    ``h_{k+1}(u) = sum_{(u->v)} a_{k+1}(v)``; after ``rounds`` full
    updates one extra authority half-round. Skipping the usual L2
    normalization keeps every value an int64 (ordering is unchanged —
    normalization is a positive scalar per iteration), so the result
    is bit-exact under any partitioning and SQL-expressible as
    unrolled join+group CTEs.

    Scale shape: the node score vector is node-bounded driver state
    under ``broadcast_budget_rows`` (the pagerank-degrees pattern);
    each half-round is ONE edge scan + ONE 64-bucket exchange via
    :func:`_edge_gather_sum`. Beyond the budget use
    :func:`feature_propagate`-style Dataset state (hash_join per
    half-round) — the budget raise is a deliberate loud gate, not a
    silent fallback, because unnormalized scores overflow int64 long
    before the node table outgrows a 256-node cluster's driver.

    Returns Dataset(node, hub, auth): hub = h_rounds,
    auth = a_{rounds+1}.
    """
    import ray.data as rd

    from .joins import strip_schema_metadata

    edges = strip_schema_metadata(
        edges_ds.map_batches(
            lambda b: pa.table(
                {
                    "src": pc.cast(b[src_col], pa.int64()),
                    "dst": pc.cast(b[dst_col], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()

    nodes = _collect_unique(edges, ["src", "dst"])
    if len(nodes) > broadcast_budget_rows:
        raise ValueError(
            f"hits: {len(nodes)} nodes exceed broadcast_budget_rows="
            f"{broadcast_budget_rows}; raise the budget explicitly or "
            "pre-partition the graph — unnormalized HITS overflows "
            "int64 before driver state becomes the binding constraint"
        )
    h = np.ones(len(nodes), np.int64)
    a = np.zeros(len(nodes), np.int64)
    for _ in range(rounds):
        a = _edge_gather_sum(edges, nodes, h, "src", "dst")
        h = _edge_gather_sum(edges, nodes, a, "dst", "src")
    a = _edge_gather_sum(edges, nodes, h, "src", "dst")
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "hub": pa.array(h, pa.int64()),
                "auth": pa.array(a, pa.int64()),
            }
        )
    ).repartition(max(1, len(nodes) // 8192))


def label_propagation(
    edges_ds,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_budget_rows: int = 2_000_000,
    plan: str = "auto",
):
    """Synchronous label propagation (community detection): labels
    start as the node id; each round every node adopts the most
    frequent label among its UNDIRECTED neighbours, ties broken to
    the SMALLEST label — fully deterministic, so the unrolled
    mode-per-node rounds are SQL-expressible (row_number over count
    DESC, label ASC).

    Input edges are treated as undirected: both directions are
    emitted and globally deduped ONCE (in-batch dedup on the packed
    (min,max) key + one exchange), then the deduped edge Dataset is
    pinned and replayed every round.

    Scale shape per round (broadcast plan, node table within budget):
    ONE edge scan emitting per-batch (node, label) count partials +
    ONE 64-bucket exchange whose fold resolves the per-node argmax —
    all (node, label) pairs for a node land in the same bucket, so
    the argmax is exact. Beyond the budget (``plan="distributed"``)
    each round is an edges x labels hash_join + grouped count + a
    per-node map_groups argmax — three exchanges, nothing on the
    driver.

    Returns Dataset(node, label) after ``rounds`` rounds.
    """
    import pandas as pd
    import ray
    import ray.data as rd

    from ..functions.hashing import splitmix64
    from ..state.broadcast import get_broadcast
    from .joins import hash_join, strip_schema_metadata

    def symmetrize(b: pa.Table) -> pa.Table:
        s = b[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d  # self loops contribute nothing to neighbour modes
        s, d = s[m], d[m]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        packed = (lo.astype(np.uint64) << np.uint64(32)) | hi.astype(
            np.uint64
        )
        u = np.unique(packed)
        return pa.table({"packed": pa.array(u.view(np.int64), pa.int64())})

    from ray.data.aggregate import Count

    uniq = (
        strip_schema_metadata(edges_ds)
        .map_batches(symmetrize, batch_format="pyarrow")
        .groupby("packed")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["packed"])
    )

    def unpack(b: pa.Table) -> pa.Table:
        p = b["packed"].to_numpy(zero_copy_only=False).view(np.uint64)
        lo = (p >> np.uint64(32)).astype(np.int64)
        hi = (p & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "dst": pa.array(np.concatenate([hi, lo]), pa.int64()),
            }
        )

    edges = uniq.map_batches(unpack, batch_format="pyarrow").materialize()
    nodes = _collect_unique(edges, ["src"])
    if plan == "auto":
        plan = (
            "broadcast"
            if len(nodes) <= broadcast_budget_rows
            else "distributed"
        )

    if plan == "broadcast":
        labels = nodes.copy()
        NB = 64
        for _ in range(rounds):
            ref = ray.put((nodes, labels))

            def partial(b: pa.Table, _ref=ref) -> pa.Table:
                nodes_, lab_ = get_broadcast(_ref)
                s = b["src"].to_numpy(zero_copy_only=False)
                d = b["dst"].to_numpy(zero_copy_only=False)
                # neighbour label of edge (src <- dst's label)
                pos = np.searchsorted(nodes_, d)
                nl = lab_[pos]
                key = np.stack([s, nl], axis=1)
                u, cnt = np.unique(key, axis=0, return_counts=True)
                bk = (
                    splitmix64(u[:, 0].astype(np.uint64)) % np.uint64(NB)
                ).astype(np.int64)
                return pa.table(
                    {
                        "bk": pa.array(bk, pa.int64()),
                        "node": pa.array(u[:, 0], pa.int64()),
                        "lab": pa.array(u[:, 1], pa.int64()),
                        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                    }
                )

            def fold(g: pd.DataFrame) -> pd.DataFrame:
                n = g["node"].to_numpy(np.int64)
                lb = g["lab"].to_numpy(np.int64)
                c = g["cnt"].to_numpy(np.int64)
                # merge split partials, then per-node argmax
                # (count DESC, label ASC)
                key = np.stack([n, lb], axis=1)
                u, inv = np.unique(key, axis=0, return_inverse=True)
                cs = np.bincount(inv, weights=c).astype(np.int64)
                order = np.lexsort((u[:, 1], -cs, u[:, 0]))
                su, slb, scs = u[order, 0], u[order, 1], cs[order]
                first = np.ones(len(su), bool)
                first[1:] = su[1:] != su[:-1]
                return pd.DataFrame(
                    {"node": su[first], "lab": slb[first]}
                )

            best = (
                edges.map_batches(partial, batch_format="pyarrow")
                .groupby("bk")
                .map_groups(fold, batch_format="pandas")
                .to_pandas()  # node-bounded
            )
            nxt = labels.copy()
            pos = np.searchsorted(nodes, best["node"].to_numpy(np.int64))
            nxt[pos] = best["lab"].to_numpy(np.int64)
            labels = nxt
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "label": pa.array(labels, pa.int64()),
                }
            )
        ).repartition(max(1, len(nodes) // 8192))

    # distributed plan: Dataset label state, three exchanges per round
    cur = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array(nodes, pa.int64()),
            }
        )
    )
    for _ in range(rounds):
        msgs = hash_join(
            edges, cur, on=["dst"], right_on=["node"]
        )  # (src, dst, label-of-dst)

        def cpartial(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False)
            lb = b["label"].to_numpy(zero_copy_only=False)
            key = np.stack([s, lb], axis=1)
            u, cnt = np.unique(key, axis=0, return_counts=True)
            return pa.table(
                {
                    "node": pa.array(u[:, 0], pa.int64()),
                    "lab": pa.array(u[:, 1], pa.int64()),
                    "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        from ray.data.aggregate import Sum

        counts = (
            msgs.map_batches(cpartial, batch_format="pyarrow")
            .groupby(["node", "lab"])
            .aggregate(Sum("cnt", alias_name="cnt"))
        )

        def argmax(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(
                ["cnt", "lab"], ascending=[False, True], kind="mergesort"
            )
            return pd.DataFrame(
                {
                    "node": [int(g["node"].iloc[0])],
                    "label": [int(g["lab"].iloc[0])],
                }
            )

        nxt = counts.groupby("node").map_groups(
            argmax, batch_format="pandas"
        )
        # isolated nodes keep their initial label (= node id); none
        # exist after symmetrize+unpack, but keep the fill for safety
        joined = hash_join(
            cur.select_columns(["node"]), nxt, on=["node"], how="left"
        )

        def fill(b: pa.Table) -> pa.Table:
            lab = pc.coalesce(
                pc.cast(b["label"], pa.int64()), pc.cast(b["node"], pa.int64())
            )
            return pa.table({"node": b["node"], "label": lab})

        cur = joined.map_batches(fill, batch_format="pyarrow").materialize()
    return cur


# ------------------------------------------------------------------ SCC

# SCC's per-round sweeps use Dataset.join — same Ray 2.49.2
# empty-schema-block shuffle bug exposure as the other join users
from ..state.raypatch import apply_join_patch as _scc_join_patch

_scc_join_patch()


def _scc_peel_local(src: np.ndarray, dst: np.ndarray, max_rounds: int = 256):
    """Vectorized FW-BW-MIN peeling on int64 node ids (driver fast
    path). Per outer round: forward-min labels (min id reachable FROM
    each node — new[src] = min(old[src], old[dst]) swept to fixpoint)
    and backward-min labels (reversed); nodes with fwd == bwd are
    exactly the SCC of that min node (fwd(u)=m means u reaches m,
    bwd(u)=m means m reaches u) and peel off with scc_id = fwd; their
    edges drop and the next round continues on the remainder. Each
    round peels at least the SCC of the minimum live node, and the
    min-label sweeps converge in <= longest-remaining-path rounds —
    ``max_rounds`` guards both loops and RAISES rather than returning
    split components (the crash-loud contract of
    connected_components_distributed)."""
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    ea = np.searchsorted(nodes, src)
    eb = np.searchsorted(nodes, dst)
    scc_id = nodes.copy()  # default: own id (singleton)
    assigned = np.zeros(n, bool)

    def sweep(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        lab = nodes.copy()
        for _ in range(max_rounds):
            before = lab.copy()
            np.minimum.at(lab, a, lab[b])
            if np.array_equal(lab, before):
                return lab
        raise RuntimeError(
            f"scc: min-label sweep not stable after {max_rounds} rounds"
        )

    for _ in range(max_rounds):
        if len(ea) == 0:
            break
        fwd = sweep(ea, eb)  # min reachable FROM v (along out-edges)
        bwd = sweep(eb, ea)  # min reaching v (along in-edges)
        peel = (fwd == bwd) & ~assigned
        # nodes not on any live edge peel as singletons implicitly
        live = np.zeros(n, bool)
        live[ea] = True
        live[eb] = True
        peel &= live
        if not peel.any():
            raise RuntimeError(
                "scc: no progress in FW-BW peel round (cyclic labels?)"
            )
        scc_id[peel] = fwd[peel]
        assigned |= peel
        keep = ~(peel[ea] | peel[eb])
        ea, eb = ea[keep], eb[keep]
    else:
        if len(ea):
            raise RuntimeError(
                "scc: edges remain after max_rounds peel rounds"
            )
    return nodes, scc_id


def scc(edges_ds, driver_threshold: int = 5_000_000, max_rounds: int = 256):
    """Strongly connected components of a directed int64 edge
    Dataset (src, dst) -> Dataset (node, scc_id), scc_id = MIN node
    of the component. Scale-adaptive like connected_components:
    edge sets under ``driver_threshold`` collect once and run the
    vectorized FW-BW peel on the driver; larger sets run the same
    peeling with each min-label sweep as per-round distributed
    exchanges (one groupby-Min per direction per round) — rounds are
    bounded by the longest simple path in the live subgraph, the
    documented convergence assumption (planted/bounded-diameter
    graphs converge in graph-defined rounds regardless of data
    volume)."""
    import ray.data as rd

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "scc_id": pa.array([], pa.int64()),
                }
            )
        )
    if n_edges <= driver_threshold:
        tabs = [
            t for t in edges_ds.iter_batches(batch_format="pyarrow")
        ]
        tbl = pa.concat_tables(
            [pa.Table.from_batches([t]) if isinstance(t, pa.RecordBatch)
             else t for t in tabs]
        )
        src = tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = tbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes, ids = _scc_peel_local(src, dst, max_rounds=max_rounds)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "scc_id": pa.array(ids, pa.int64()),
                }
            )
        )
    return _scc_distributed(edges_ds, max_rounds=max_rounds)


def _scc_distributed(edges_ds, max_rounds: int = 64):
    """Distributed FW-BW peel: each min-label sweep mirrors
    connected_components_distributed's proven join shape — a
    materialized DIRECTED message table (node, nbr) per direction
    (fwd: node=dst delivers its label to nbr=src; bwd: reversed),
    per round one same-name-key Dataset.join + groupby-Min, stopped
    by an exact label checksum. Peeled nodes drop between outer
    rounds. Exact but round-hungry on long paths; the driver fast
    path covers every realistic edge volume first."""
    from ray.data.aggregate import Min

    import ray as _ray
    import ray.data as rd

    def msg_table(E, direction: str):
        def fn(b: pa.Table) -> pa.Table:
            s_ = pc.cast(b["src"], pa.int64())
            d_ = pc.cast(b["dst"], pa.int64())
            if direction == "fwd":
                return pa.table({"node": d_, "nbr": s_})
            return pa.table({"node": s_, "nbr": d_})

        return E.map_batches(fn, batch_format="pyarrow").materialize()

    def init_labels(E):
        def fn(b: pa.Table) -> pa.Table:
            both = pa.concat_arrays(
                [
                    pc.cast(b["src"], pa.int64()).combine_chunks(),
                    pc.cast(b["dst"], pa.int64()).combine_chunks(),
                ]
            )
            return pa.table({"node": both, "label": both})

        return (
            E.map_batches(fn, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(2)
            .materialize()
        )

    def sweep(E, direction: str):
        M = msg_table(E, direction)
        lab = init_labels(E)
        prev = _scc_label_checksum(lab)
        for _ in range(max_rounds):
            joined = M.join(
                lab, join_type="inner", num_partitions=4, on=("node",)
            )
            cand = joined.map_batches(
                lambda b: pa.table(
                    {"node": b["nbr"], "cand": b["label"]}
                ),
                batch_format="pyarrow",
            )
            self_rows = lab.map_batches(
                lambda b: pa.table(
                    {"node": b["node"], "cand": b["label"]}
                ),
                batch_format="pyarrow",
            )
            lab = (
                cand.union(self_rows)
                .groupby("node")
                .aggregate(Min("cand", alias_name="label"))
                # compact: sort-based aggregate emits schema-less
                # 0-row blocks that break the next round's Acero join
                .repartition(2)
                .materialize()
            )
            cur = _scc_label_checksum(lab)
            if cur == prev:
                return lab
            prev = cur
        raise RuntimeError(
            f"scc distributed: sweep not stable after {max_rounds} rounds"
        )

    E = edges_ds
    out_parts = []
    for _ in range(max_rounds):
        E = E.materialize()
        if E.count() == 0:
            break
        fwd = sweep(E, "fwd").repartition(2).materialize()
        bwd = sweep(E, "bwd").map_batches(
            lambda b: pa.table({"node": b["node"], "blabel": b["label"]}),
            batch_format="pyarrow",
        ).repartition(2).materialize()
        both = fwd.join(
            bwd, join_type="inner", num_partitions=4, on=("node",)
        )
        peel = both.map_batches(
            lambda b: pa.table(
                {"node": b["node"], "scc_id": b["label"]}
            ).filter(pc.equal(b["label"], b["blabel"])),
            batch_format="pyarrow",
        ).materialize()
        if peel.count() == 0:
            raise RuntimeError("scc distributed: no progress in peel round")
        out_parts.append(peel)
        peeled = np.sort(
            peel.to_pandas()["node"].to_numpy(np.int64)
        )  # bounded: one peel's nodes
        pref = _ray.put(peeled)

        def drop(b: pa.Table) -> pa.Table:
            from ..state.broadcast import get_broadcast

            pk = get_broadcast(pref)
            s_ = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d_ = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)

            def hit(v):
                pos = np.minimum(
                    np.searchsorted(pk, v), max(len(pk) - 1, 0)
                )
                return (pk[pos] == v) if len(pk) else np.zeros(len(v), bool)

            return b.filter(pa.array(~(hit(s_) | hit(d_))))

        # repartition compacts the post-drop blocks: fully-filtered
        # partitions otherwise carry SCHEMA-LESS empty blocks into the
        # next round's join (Acero: "no match for key field"); the
        # merge restores one schema'd block set per round
        E = E.map_batches(drop, batch_format="pyarrow").repartition(2)
    else:
        raise RuntimeError("scc distributed: edges remain after max_rounds")
    out = out_parts[0]
    for p_ in out_parts[1:]:
        out = out.union(p_)
    out = out.materialize()
    # nodes that never peeled (e.g. a sink on a dropped edge) are
    # singletons — distributed anti-join against the peeled set
    from .joins import hash_join

    def all_nodes(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [
                pc.cast(b["src"], pa.int64()).combine_chunks(),
                pc.cast(b["dst"], pa.int64()).combine_chunks(),
            ]
        )
        u = np.unique(both.to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u, pa.int64())})

    nodes_ds = (
        edges_ds.map_batches(all_nodes, batch_format="pyarrow")
        .groupby("node")
        .count()
        .map_batches(
            lambda b: pa.table({"node": b["node"]}),
            batch_format="pyarrow",
        )
        .repartition(2)
        .materialize()
    )
    missing = hash_join(nodes_ds, out, on=["node"], how="anti").map_batches(
        lambda b: pa.table({"node": b["node"], "scc_id": b["node"]}),
        batch_format="pyarrow",
    )
    return out.union(missing)


def _scc_label_checksum(lds) -> int:
    total = 0
    for b in lds.iter_batches(batch_format="pyarrow"):
        v = (
            b["label"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        total = (total + int(v.sum(dtype=np.uint64))) & 0xFFFFFFFFFFFFFFFF
        total = (total + len(v)) & 0xFFFFFFFFFFFFFFFF
    return total


# ------------------------------------------------------------- MST


def boruvka_mst(edges_ds, max_rounds: int = 64):
    """Minimum spanning forest by Boruvka's algorithm — the
    DISTRIBUTABLE MST: each round, every component picks its minimum
    outgoing edge (ties broken by the packed edge key, so the forest
    is unique even with duplicate weights) and components merge;
    component count at least halves per round, so O(log n) rounds.

    Edge Dataset (src, dst, w int64) is scanned ONCE PER ROUND
    against the broadcast label array (node-bounded, the
    pagerank-degrees contract; the beyond-driver plan keeps labels as
    a keyed Dataset and turns the per-round min into a hash join +
    groupby-min); per-batch per-component minima shrink each round's
    exchange to component-count rows. Returns (chosen edge table
    with columns src, dst, w; n_components). Crash-loud on
    non-convergence. Generic correctness is pinned against a brute
    Kruskal in tests/test_graph.py."""
    import ray

    from ..functions.hashing import hash_strings  # noqa: F401 (parity)

    edges_ds = edges_ds.materialize()
    node_parts = [
        np.r_[
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dst"].to_numpy(zero_copy_only=False).astype(np.int64),
        ]
        for b in edges_ds.iter_batches(batch_format="pyarrow")
    ]
    if not node_parts:  # empty edge set -> empty forest, 0 components
        return (
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            ),
            0,
        )
    nodes = np.unique(np.concatenate(node_parts))
    # tie-break keys pack (src << 32 | dst): out-of-range ids would
    # silently collide packed keys and corrupt the chosen-edge map
    if nodes[0] < 0 or nodes[-1] >= (1 << 32):
        raise ValueError(
            "boruvka_mst requires node ids in [0, 2^32): got range "
            f"[{int(nodes[0])}, {int(nodes[-1])}] — rank/normalize ids "
            "first (e.g. node - node.min() or a dictionary encode)"
        )
    label = np.arange(len(nodes), dtype=np.int64)
    chosen: dict[int, int] = {}  # packed (src<<32|dst) -> weight

    for _ in range(max_rounds):
        ref = ray.put((nodes, label))

        def min_out(b: pa.Table, _ref=ref) -> pa.Table:
            nds, lab = ray.get(_ref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            ls = lab[np.searchsorted(nds, s)]
            ld = lab[np.searchsorted(nds, d)]
            out = ls != ld
            if not out.any():
                return pa.table(
                    {
                        "comp": pa.array([], pa.int64()),
                        "w": pa.array([], pa.int64()),
                        "key": pa.array([], pa.int64()),
                    }
                )
            s, d, w, ls, ld = s[out], d[out], w[out], ls[out], ld[out]
            key = (s.astype(np.uint64) << np.uint64(32)) | d.astype(
                np.uint64
            )
            comp = np.concatenate([ls, ld])
            ww = np.concatenate([w, w])
            kk = np.concatenate([key, key]).astype(np.int64)
            order = np.lexsort((kk, ww, comp))
            comp, ww, kk = comp[order], ww[order], kk[order]
            first = np.r_[True, comp[1:] != comp[:-1]]
            return pa.table(
                {
                    "comp": pa.array(comp[first], pa.int64()),
                    "w": pa.array(ww[first], pa.int64()),
                    "key": pa.array(kk[first], pa.int64()),
                }
            )

        parts = edges_ds.map_batches(
            min_out, batch_format="pyarrow"
        ).to_pandas()
        if len(parts) == 0:
            break
        parts = parts.sort_values(
            ["comp", "w", "key"], kind="mergesort"
        ).drop_duplicates("comp", keep="first")
        # merge: union-find over component ids (path-halving), then
        # ONE vectorized relabel pass — the per-edge label==hi scan
        # was O(components x nodes) on star-heavy rounds
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        merged = False
        for key, wv in zip(
            parts["key"].to_numpy(np.int64),
            parts["w"].to_numpy(np.int64),
        ):
            k = np.uint64(key)
            s = int(k >> np.uint64(32))
            d = int(k & np.uint64(0xFFFFFFFF))
            ls = find(int(label[np.searchsorted(nodes, s)]))
            ld = find(int(label[np.searchsorted(nodes, d)]))
            if ls == ld:
                continue
            lo, hi = (ls, ld) if ls < ld else (ld, ls)
            parent[hi] = lo
            chosen[int(key)] = int(wv)
            merged = True
        if not merged:
            break
        # resolve roots for DISTINCT labels only (component count
        # shrinks geometrically), then one vectorized gather
        uniq = np.unique(label)
        roots = np.array([find(int(u)) for u in uniq], dtype=np.int64)
        label = roots[np.searchsorted(uniq, label)]
    else:
        raise RuntimeError(
            "boruvka_mst did not converge within max_rounds"
        )
    keys = np.array(sorted(chosen), dtype=np.uint64)
    ws = np.array([chosen[int(k)] for k in keys], dtype=np.int64)
    tbl = pa.table(
        {
            "src": pa.array(
                (keys >> np.uint64(32)).astype(np.int64), pa.int64()
            ),
            "dst": pa.array(
                (keys & np.uint64(0xFFFFFFFF)).astype(np.int64),
                pa.int64(),
            ),
            "w": pa.array(ws, pa.int64()),
        }
    )
    n_comp = len(np.unique(label))
    return tbl, n_comp
