"""Mergeable sketches — approximate aggregates for 100-TB cardinality.

The reference has no approximate aggregates (SURVEY.md §2.5: its
corpora fit in one process); at web scale exact `distinct` and exact
top-k become all-to-all shuffles over every unique value. These
operators bound the data movement to O(blocks x sketch_size)
regardless of cardinality:

- :func:`approx_distinct` — HyperLogLog (p=14 -> 16 KiB per partial,
  ~0.8% relative error). One numpy pass per batch, per-block partial
  registers, element-wise-max merge of ``n_blocks`` tiny rows.
- :func:`heavy_hitters` — Count-Min sketch (depth x width uint64,
  summed across blocks) + per-block candidate top-k union; returns
  candidates with their CM-estimated counts (an overestimate bounded
  by eps*N whp), so the driver never sees more than
  ``blocks x candidates_per_block`` rows even when the value space is
  astronomical.
- :func:`uniform_sample` — deterministic k-sample WITHOUT shuffling:
  rank every row by ``splitmix64(hash(key) ^ seed)`` and keep the
  global k smallest (per-batch partial top-k, tiny merge). Membership
  depends only on (key, seed) — reproducible under any partitioning,
  the same determinism contract as `stages/sampling.py`.

All three follow the partial+final pattern: the per-batch kernel is
pure numpy, each block contributes one bounded-size partial row, and
the merge handles ``n_blocks`` rows — nothing corpus-sized ever moves
or reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings, splitmix64

# --------------------------------------------------------------- HLL

HLL_P = 14  # 2^14 registers = 16 KiB, rel. err ~1.04/sqrt(2^14) = 0.8%


def _col_hashes(batch: pa.Table, col: str, seed: int = 0) -> np.ndarray:
    vals = pc.cast(batch[col], pa.string())
    h = hash_strings(vals.to_numpy(zero_copy_only=False))
    if seed:
        h = splitmix64(h ^ np.uint64(seed))
    return h


def hll_partial(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """uint8[2^p] register array for one batch of 64-bit hashes."""
    regs = np.zeros(1 << p, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)  # low 64-p bits shifted to the top
    # rho = leading zeros of `rest` within 64-p bits, + 1
    rho = np.full(len(hashes), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        # position of highest set bit via float64 exponent trick is
        # unsafe >2^53; use a 4-step binary probe on uint64 instead
        v = rest[nz]
        lz = np.zeros(v.shape, dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            m = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[m] += np.uint8(shift)
            v[m] <<= np.uint64(shift)
        rho[nz] = lz + 1
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with linear-counting small range."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, col: str, p: int = HLL_P) -> float:
    """Approximate COUNT(DISTINCT col) via per-block HLL partials.

    Shuffle volume: one 2^p-byte row per block, merged on the driver
    (n_blocks x 16 KiB — constant in the value cardinality; the exact
    version is a full repartition of every distinct value)."""

    def partial(b: pa.Table) -> pa.Table:
        regs = hll_partial(_col_hashes(b, col), p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for r in b["regs"].to_pylist():
            np.maximum(merged, np.asarray(r, np.uint8), out=merged)
    return hll_estimate(merged)


# --------------------------------------------------------- Count-Min


CM_DEPTH = 4
CM_WIDTH = 1 << 14


def cm_partial(
    hashes: np.ndarray,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> np.ndarray:
    """int64[depth, width] Count-Min partial for one batch (row d uses
    an independent splitmix64 re-seed of the value hash)."""
    sk = np.zeros((depth, width), dtype=np.int64)
    for d in range(depth):
        np.add.at(sk[d], _cm_idx(hashes, d, width), 1)
    return sk


def _cm_idx(hashes: np.ndarray, d: int, width: int) -> np.ndarray:
    # mask the row seed into 64 bits BEFORE np.uint64 conversion —
    # 0x9E..15 * (d+1) exceeds 2^64 for d >= 1 and raises OverflowError
    seed = np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF)
    return (splitmix64(hashes ^ seed) % np.uint64(width)).astype(np.int64)


def cm_query(
    sk: np.ndarray, hashes: np.ndarray, width: int = CM_WIDTH
) -> np.ndarray:
    """Estimated counts (min over depth rows) for each query hash."""
    depth = sk.shape[0]
    ests = np.empty((depth, len(hashes)), dtype=np.int64)
    for d in range(depth):
        ests[d] = sk[d][_cm_idx(hashes, d, width)]
    return ests.min(axis=0)


def heavy_hitters(
    ds,
    col: str,
    k: int = 10,
    candidates_per_block: int = 64,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
):
    """Top-k frequent values with CM-estimated counts.

    Per block: exact within-block counts (Arrow group-by) -> keep the
    block's top ``candidates_per_block`` as candidates + fold ALL
    values into a CM partial. Merge: sum the CM partials, union the
    candidates, estimate each candidate's global count from the merged
    sketch, return the k largest. A global heavy hitter is a heavy
    hitter in some block, so the candidate union catches every value
    with frequency >= 1/candidates_per_block of a block; counts are
    CM overestimates (bounded by N*e/width whp). Driver traffic:
    blocks x (sketch + candidate list) — independent of cardinality.

    Returns a pandas DataFrame (value, est_count) sorted desc.
    """
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        vals = pc.cast(b[col], pa.string())
        counts = pa.TableGroupBy(
            pa.table({"v": vals}), "v"
        ).aggregate([("v", "count")])
        order = pc.sort_indices(
            counts, sort_keys=[("v_count", "descending")]
        )[:candidates_per_block]
        cand = counts.take(order)["v"]
        sk = cm_partial(hash_strings(vals.to_numpy(zero_copy_only=False)),
                        depth, width)
        return pa.table(
            {
                "sketch": pa.array([sk.reshape(-1)], pa.list_(pa.int64())),
                "cands": pa.array(
                    [cand.to_pylist()], pa.list_(pa.string())
                ),
            }
        )

    merged = np.zeros((depth, width), dtype=np.int64)
    cands: set[str] = set()
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for row_sk, row_c in zip(
            b["sketch"].to_pylist(), b["cands"].to_pylist()
        ):
            merged += np.asarray(row_sk, np.int64).reshape(depth, width)
            cands.update(row_c)
    if not cands:
        return pd.DataFrame({"value": [], "est_count": []})
    cl = sorted(cands)
    ests = cm_query(merged, hash_strings(np.array(cl, dtype=object)), width)
    out = (
        pd.DataFrame({"value": cl, "est_count": ests})
        .sort_values(["est_count", "value"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return out


# ---------------------------------------------------- uniform sample


def uniform_sample(ds, key_col: str, k: int, seed: int = 0):
    """Deterministic uniform k-sample without replacement, no shuffle.

    Rank = ``key_rank64(key, seed)`` — for integer keys a pure
    splitmix64 chain the DuckDB oracle reproduces exactly (UHUGEINT
    wrap-around arithmetic), for strings the siphash path. Keep the k
    smallest ranks globally (per-batch partial top-k -> merge of
    n_blocks x k rows). Equivalent to sorting all rows by an i.i.d.
    uniform key and taking the head — but only k rows per block ever
    move. Returns a Dataset with the original columns."""
    from ..functions.hashing import key_rank64

    def partial(b: pa.Table) -> pa.Table:
        h = key_rank64(b[key_col].to_numpy(zero_copy_only=False), seed=seed)
        if len(h) > k:
            # sort keep FIRST so ranks stay aligned with the taken rows
            keep = np.sort(np.argpartition(h, k)[:k])
            b = b.take(pa.array(keep))
            h = h[keep]
        # sign-bit flip maps uint64 order onto int64 order — Ray's sort
        # round-trips boundary keys through Python ints and overflows
        # on raw uint64 values >= 2^63
        rank = (h ^ np.uint64(1 << 63)).view(np.int64)
        return b.append_column("_rank", pa.array(rank, pa.int64()))

    ranked = ds.map_batches(partial, batch_format="pyarrow")
    return (
        ranked.sort("_rank")
        .limit(k)
        .map_batches(
            lambda b: b.drop_columns(["_rank"]), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------- quantile digest


def _tdigest_compress(
    means: np.ndarray, weights: np.ndarray, delta: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted (mean, weight) centroids down to the k-size bound
    of the t-digest scale function k1 (Dunning & Ertl 2019): a
    centroid may absorb its neighbor while the merged weight stays
    under the local capacity q(1-q)·4N/δ, which keeps tail centroids
    tiny (accurate extreme quantiles) and mid centroids coarse."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m, out_w = [], []
    cur_m, cur_w = float(means[0]), float(weights[0])
    acc = 0.0  # weight fully to the left of the current centroid
    for m, w in zip(means[1:], weights[1:]):
        q = (acc + cur_w / 2.0) / total
        cap = 4.0 * total * q * (1.0 - q) / delta
        if cur_w + w <= max(cap, 1.0):
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            acc += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def tdigest_quantiles(
    ds,
    col: str,
    quantiles: list[float],
    delta: int = 200,
):
    """Approximate quantiles from a MERGEABLE t-digest: each block
    emits a compressed (means, weights, min, max) partial — O(δ)
    doubles regardless of rows — and the driver merges + re-compresses.
    Unlike the exact two-pass `global_quantiles` operator this is
    single-pass and its driver state is bounded by δ, not by the
    value distribution; accuracy is tested against the exact path
    (rank error ~q(1-q)/δ). Returns {q: value}."""

    def _prebin(x: np.ndarray, k: int):
        """Sorted equal-weight binning, fully vectorized — the raw
        block never reaches the (Python-loop) compressor; only <= k
        pre-binned centroids do. Starts are strictly increasing and
        non-empty, sidestepping the reduceat trailing-empty-segment
        trap (see BASELINE.md scale lessons)."""
        x = np.sort(x)
        k = min(k, len(x))
        starts = (np.arange(k) * len(x)) // k
        sums = np.add.reduceat(x, starts)
        cnts = np.diff(np.r_[starts, len(x)])
        return sums / cnts, cnts.astype(np.float64)

    def partial(b: pa.Table) -> pa.Table:
        x = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return pa.table(
                {
                    "m": pa.array([[]], pa.list_(pa.float64())),
                    "w": pa.array([[]], pa.list_(pa.float64())),
                    "lo": pa.array([np.inf], pa.float64()),
                    "hi": pa.array([-np.inf], pa.float64()),
                }
            )
        pm, pw = _prebin(x, 2 * delta)
        m, w = _tdigest_compress(pm, pw, delta)
        return pa.table(
            {
                "m": pa.array([m.tolist()], pa.list_(pa.float64())),
                "w": pa.array([w.tolist()], pa.list_(pa.float64())),
                "lo": pa.array([float(x.min())], pa.float64()),
                "hi": pa.array([float(x.max())], pa.float64()),
            }
        )

    ms, ws = [], []
    lo, hi = np.inf, -np.inf
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for m_row, w_row in zip(b["m"].to_pylist(), b["w"].to_pylist()):
            ms.append(np.asarray(m_row, np.float64))
            ws.append(np.asarray(w_row, np.float64))
        lo = min(lo, float(pc.min(b["lo"]).as_py()))
        hi = max(hi, float(pc.max(b["hi"]).as_py()))
    if not ms or not np.isfinite(lo):
        return {q: float("nan") for q in quantiles}
    means, weights = _tdigest_compress(
        np.concatenate(ms), np.concatenate(ws), delta
    )
    total = weights.sum()
    # centroid midpoints in cumulative-weight space, exact endpoints
    cum = np.cumsum(weights) - weights / 2.0
    out = {}
    for q in quantiles:
        target = q * total
        if target <= cum[0]:
            out[q] = lo if q <= 0 else float(
                lo + (means[0] - lo) * (target / max(cum[0], 1e-12))
            )
        elif target >= cum[-1]:
            span = total - cum[-1]
            out[q] = hi if q >= 1 else float(
                means[-1]
                + (hi - means[-1])
                * ((target - cum[-1]) / max(span, 1e-12))
            )
        else:
            out[q] = float(np.interp(target, cum, means))
    return out


def tdigest_quantiles_grouped(
    ds,
    group_col: str,
    col: str,
    quantiles: list[float],
    delta: int = 100,
):
    """Per-group approximate quantiles from mergeable digests ->
    Dataset(group, q, est).

    Per block, each group present gets one compressed digest row
    (O(groups-per-block × δ) partial output, independent of row
    count); the per-group fold happens inside ``groupby(group)`` —
    the exchange is group-bounded, exactly like
    `cluster.grouped_centroids`. The single-group accuracy contract
    (rank error ~q(1-q)/δ, exact min/max endpoints) is inherited from
    :func:`tdigest_quantiles` and tested per group."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        x = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(g, kind="mergesort")
        g, x = g[order], x[order]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        ends = np.r_[starts[1:], len(g)]
        rows_g, rows_m, rows_w, rows_lo, rows_hi = [], [], [], [], []
        for s, e in zip(starts, ends):
            xi = x[s:e]
            xi = xi[~np.isnan(xi)]
            if not len(xi):
                continue
            xs = np.sort(xi)
            k = min(2 * delta, len(xs))
            bs = (np.arange(k) * len(xs)) // k
            sums = np.add.reduceat(xs, bs)
            cnts = np.diff(np.r_[bs, len(xs)])
            m, w = _tdigest_compress(
                sums / cnts, cnts.astype(np.float64), delta
            )
            rows_g.append(g[s])
            rows_m.append(m.tolist())
            rows_w.append(w.tolist())
            rows_lo.append(float(xs[0]))
            rows_hi.append(float(xs[-1]))
        return pa.table(
            {
                group_col: pa.array(rows_g),
                "m": pa.array(rows_m, pa.list_(pa.float64())),
                "w": pa.array(rows_w, pa.list_(pa.float64())),
                "lo": pa.array(rows_lo, pa.float64()),
                "hi": pa.array(rows_hi, pa.float64()),
            }
        )

    def fold(gdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate(
            [np.asarray(v, np.float64) for v in gdf["m"]]
        )
        weights = np.concatenate(
            [np.asarray(v, np.float64) for v in gdf["w"]]
        )
        means, weights = _tdigest_compress(means, weights, delta)
        lo, hi = float(gdf["lo"].min()), float(gdf["hi"].max())
        total = weights.sum()
        cum = np.cumsum(weights) - weights / 2.0
        out_q, out_e = [], []
        for q in quantiles:
            target = q * total
            if target <= cum[0]:
                est = lo if q <= 0 else float(
                    lo + (means[0] - lo) * (target / max(cum[0], 1e-12))
                )
            elif target >= cum[-1]:
                span = total - cum[-1]
                est = hi if q >= 1 else float(
                    means[-1]
                    + (hi - means[-1])
                    * ((target - cum[-1]) / max(span, 1e-12))
                )
            else:
                est = float(np.interp(target, cum, means))
            out_q.append(q)
            out_e.append(est)
        return pd.DataFrame(
            {
                group_col: [gdf[group_col].iloc[0]] * len(out_q),
                "q": out_q,
                "est": out_e,
            }
        )

    return (
        ds.select_columns([group_col, col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(fold, batch_format="pandas")
    )


def approx_distinct_grouped(
    ds, group_col: str, col: str, p: int = 12
):
    """Per-group approximate COUNT(DISTINCT col) -> Dataset(group,
    n_distinct_approx) — grouped cardinality without a distinct
    shuffle.

    Per block each group present contributes one 2^p-byte HLL register
    row (p=12 -> 4 KiB; grouped profiles use a smaller p than the
    global sketch since there is one per group); registers merge by
    element-wise max inside ``groupby(group)`` — the exchange is
    group-bounded like `cluster.grouped_centroids`, never row-bounded.
    Relative error ~1.04/sqrt(2^p) = 1.6% at the default."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        h = _col_hashes(b, col)
        order = np.argsort(g, kind="mergesort")
        g, h = g[order], h[order]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        ends = np.r_[starts[1:], len(g)]
        rows_g, rows_r = [], []
        for s, e in zip(starts, ends):
            rows_g.append(g[s])
            rows_r.append(hll_partial(h[s:e], p).tobytes())
        return pa.table(
            {
                group_col: pa.array(rows_g),
                "regs": pa.array(rows_r, pa.binary()),
            }
        )

    def fold(gdf: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(1 << p, np.uint8)
        for r in gdf["regs"]:
            np.maximum(merged, np.frombuffer(r, np.uint8), out=merged)
        return pd.DataFrame(
            {
                group_col: [gdf[group_col].iloc[0]],
                "n_distinct_approx": [round(hll_estimate(merged), 1)],
            }
        )

    return (
        ds.select_columns([group_col, col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(fold, batch_format="pandas")
    )
