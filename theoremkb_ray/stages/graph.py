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
  nodes, the practical ceiling; beyond that a vertex-partitioned
  rank join is required, see connected_components_distributed in
  stages/canonicalize.py for the analogous escalation) and broadcast
  once per iteration via ``ray.put`` (numpy array, never a dict —
  see BASELINE.md scale lessons);
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
):
    """-> Dataset(node, rank) — rank scaled by N (mean 1.0), so the
    6-dp precision contract keeps ~6 significant digits at any N.

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

    ranks = np.full(n, 1.0 / n)
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
        dmass = float(ranks[dangling].sum()) / n
        ranks = (1.0 - damping) / n + damping * (acc + dmass)

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
