"""Join operators (SURVEY.md §2.4).

Two physical strategies, chosen by side size — the same decision the
reference makes implicitly by loading its links CSV into a dict
(reference: Styling/tools/theoremdb/db.py:13-26) versus pandas merges:

- :func:`broadcast_join` — small right side: ``ray.put`` the table
  once; every map task fetches it from the object store (NOT re-shipped
  per batch) and merges per batch with pandas. Supports
  inner/left/semi/anti (semi/anti re-express the reference's
  parent-class gating and skip-filters, J2/J3/M24).
- :func:`hash_join` — both sides large: Ray Data's hash-partitioned
  ``Dataset.join`` (one all-to-all exchange on the key).
"""

from __future__ import annotations


import pandas as pd
import pyarrow as pa
import ray

from ..state.raypatch import apply_join_patch

# every Dataset.join in this repo needs the schema-broadcast fix
# (see state/raypatch.py) — install it as soon as joins are importable
apply_join_patch()


def _join_batch(
    batch: pd.DataFrame, right_ref, on, right_on, how
) -> pa.Table:
    """Stateless join task: the right side is fetched ONCE per worker
    process via the broadcast cache (same amortization as an actor's
    __init__ without paying actor-pool startup).

    Returns an ARROW table even though the merge runs in pandas:
    downstream groupby/sort on pandas blocks hits Ray's slow
    pandas-block sort path (~400x slower per block than Arrow —
    measured 4.4 s vs 10 ms per 9k-row block on the bench suite), so
    blocks must re-enter the stream as Arrow."""
    from ..state.broadcast import get_broadcast

    right = get_broadcast(right_ref)
    if not isinstance(right, pd.DataFrame):
        right = right.to_pandas()
    if how in ("semi", "anti"):
        if len(right_on) == 1:
            mask = batch[on[0]].isin(set(right[right_on[0]]))
        else:
            keys = set(map(tuple, right[right_on].itertuples(index=False)))
            mask = pd.Series(
                list(map(tuple, batch[on].itertuples(index=False))),
                index=batch.index,
            ).isin(keys)
        out = batch[~mask if how == "anti" else mask]
    else:
        out = batch.merge(right, left_on=on, right_on=right_on, how=how)
    return pa.Table.from_pandas(out, preserve_index=False)


def _side_bytes(t) -> int:
    """In-memory size of a candidate broadcast side."""
    if isinstance(t, pa.Table):
        return t.nbytes
    return int(t.memory_usage(deep=True).sum())


#: above this, a "broadcast" side stops being small: every worker
#: heap pays for a copy and the ray.put itself becomes the bottleneck
#: — route to the hash-partitioned join instead (safe by default; the
#: caller shouldn't have to know the side outgrew the plan)
MAX_BROADCAST_BYTES = 256 << 20


def broadcast_join(
    left_ds,
    right: pa.Table | pd.DataFrame,
    on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    concurrency=None,  # kept for API compat; stateless tasks autoscale
    batch_size: int = 8192,
    max_broadcast_bytes: int = MAX_BROADCAST_BYTES,
):
    """Broadcast hash join. Auto-switches to :func:`hash_join` when
    the build side exceeds ``max_broadcast_bytes`` — same rows, one
    hash exchange instead of a per-worker copy of an oversized side."""
    assert how in ("inner", "left", "semi", "anti")
    on = list(on)
    r_on = list(right_on or on)
    if _side_bytes(right) > max_broadcast_bytes:
        import ray.data as rd

        tbl = (
            right
            if isinstance(right, pa.Table)
            else pa.Table.from_pandas(right, preserve_index=False)
        )
        join_r_on = list(r_on)
        if how in ("inner", "left"):
            # Dataset.join drops the right key columns; the pandas
            # broadcast merge keeps them whenever the names differ.
            # Join on throwaway copies so the schema stays identical
            # either way the plan resolves.
            for i, (lc, rc) in enumerate(zip(on, r_on)):
                if rc != lc:
                    tmp = f"__tkb_jk_{i}"
                    tbl = tbl.append_column(tmp, tbl[rc])
                    join_r_on[i] = tmp
        return hash_join(
            left_ds, rd.from_arrow(tbl), on=on, right_on=join_r_on, how=how
        )
    right_ref = ray.put(right)
    return left_ds.map_batches(
        lambda b: _join_batch(b, right_ref, on, r_on, how),
        batch_format="pandas",
        batch_size=batch_size,
    )


#: logical -> Ray Dataset.join join_type
_JOIN_TYPES = {
    "inner": "inner",
    "left": "left_outer",
    "left_outer": "left_outer",
    "right_outer": "right_outer",
    "full_outer": "full_outer",
    "semi": "left_semi",
    "anti": "left_anti",
}


def _bounded_partitions(requested: int | None = None) -> int:
    """Dataset.join spawns one aggregator ACTOR per partition; a count
    at or above the cluster CPU count deadlocks a small cluster (the
    aggregators reserve the slots the map tasks need). Cap by CPUs."""
    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    cap = max(2, min(16, ncpu // 2))
    return min(requested, cap) if requested else cap


def strip_schema_metadata(ds):
    """Drop Arrow schema metadata before a ``Dataset.join``.

    Parquet written by pandas carries a ``b'pandas'`` schema-metadata
    dict; a pa.Schema with metadata is UNHASHABLE, so every
    HashShuffleAggregator actor falls off Ray's schema-dedup fast path
    and logs a 'Failed to hash the schemas' warning per block pair.
    Stripping costs a zero-copy schema replacement per batch."""
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def hash_join(
    left_ds,
    right_ds,
    on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
):
    """Both-sides-large equi-join via Ray's hash-partitioned join.

    ``how`` accepts inner/left/right_outer/full_outer plus semi/anti —
    the DISTRIBUTED fallback for :func:`broadcast_join`'s semi/anti
    when the key side is too large to collect and broadcast (the
    existence filter runs inside Ray's hash-partitioned join, nothing
    reaches the driver)."""
    left_ds = strip_schema_metadata(left_ds)
    right_ds = strip_schema_metadata(right_ds)
    return left_ds.join(
        right_ds,
        join_type=_JOIN_TYPES[how],
        num_partitions=_bounded_partitions(num_partitions),
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
    )


# --------------------------------------------------------------------
# Interval (range) join
# --------------------------------------------------------------------


def interval_join(
    points_ds,
    intervals_ds,
    ts_col: str = "ts",
    start_col: str = "start_us",
    end_col: str = "end_us",
    point_cols: list[str] | None = None,
    interval_cols: list[str] | None = None,
    bucket_us: int = 6 * 3600 * 1_000_000,
    coarse: int = 64,
):
    """Distributed point-in-interval join: rows of ``points_ds`` whose
    timestamp falls in ``[start, end)`` of a row of ``intervals_ds``.
    Timestamps/bounds are int64 epoch microseconds (Arrow timestamp[us]
    columns are viewed zero-copy as int64).

    Neither inequality key fits a hash join, and a broadcast is only
    possible while the interval side is small — this is the general
    path (the interval analog of the `asof_join` family, SURVEY §2.9):

    - time is cut into fixed ``bucket_us`` buckets; each POINT maps to
      exactly one bucket, each INTERVAL replicates to the buckets it
      overlaps (replication factor = span/bucket + 1 — intervals are
      the small side by row count even when too large to broadcast);
    - buckets are coarse-keyed (``bucket % coarse``) into the group
      exchange, and the exact per-bucket pairing happens vectorized
      inside the group: points sorted by ts, each interval finds its
      matching point RANGE with two searchsorted calls — no n×m mask;
    - a point matching an interval does so in its OWN bucket only, so
      no dedup pass is needed.

    Output columns: ``interval_cols + point_cols`` (default: all of
    both minus the bookkeeping keys).
    """
    import numpy as np

    def _us(col) -> "np.ndarray":
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.int64())
        return arr.to_numpy(zero_copy_only=False).astype(np.int64)

    pschema = points_ds.schema()
    ischema = intervals_ds.schema()
    pcols = point_cols or [c for c in pschema.names if c != ts_col]
    icols = interval_cols or [
        c for c in ischema.names if c not in (start_col, end_col)
    ]
    ptypes = {c: pschema.base_schema.field(c).type for c in pcols}
    itypes = {c: ischema.base_schema.field(c).type for c in icols}

    def tag_points(b: pa.Table) -> pa.Table:
        ts = _us(b[ts_col])
        bucket = ts // bucket_us
        cols = {
            "bucket": pa.array(bucket, pa.int64()),
            "ck": pa.array(bucket % coarse, pa.int64()),
            "kind": pa.array(np.ones(len(ts), np.int8), pa.int8()),
            "__ts": pa.array(ts, pa.int64()),
            "__s": pa.array(np.zeros(len(ts), np.int64), pa.int64()),
            "__e": pa.array(np.zeros(len(ts), np.int64), pa.int64()),
        }
        for c in pcols:
            cols[f"p_{c}"] = b[c]
        for c in icols:
            cols[f"i_{c}"] = pa.nulls(len(ts), itypes[c])
        return pa.table(cols)

    def tag_intervals(b: pa.Table) -> pa.Table:
        s = _us(b[start_col])
        e = _us(b[end_col])
        first = s // bucket_us
        last = np.maximum(first, (e - 1) // bucket_us)
        reps = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        # bucket sequence: first[i] + offset within each repeat run
        off = np.arange(len(idx)) - np.repeat(
            np.cumsum(np.r_[0, reps[:-1]]), reps
        )
        bucket = first[idx] + off
        cols = {
            "bucket": pa.array(bucket, pa.int64()),
            "ck": pa.array(bucket % coarse, pa.int64()),
            "kind": pa.array(np.zeros(len(idx), np.int8), pa.int8()),
            "__ts": pa.array(np.zeros(len(idx), np.int64), pa.int64()),
            "__s": pa.array(s[idx], pa.int64()),
            "__e": pa.array(e[idx], pa.int64()),
        }
        take = pa.array(idx, pa.int64())
        for c in pcols:
            cols[f"p_{c}"] = pa.nulls(len(idx), ptypes[c])
        for c in icols:
            cols[f"i_{c}"] = b[c].take(take)
        return pa.table(cols)

    tagged_p = points_ds.map_batches(tag_points, batch_format="pyarrow")
    tagged_i = intervals_ds.map_batches(
        tag_intervals, batch_format="pyarrow"
    )

    def pair_group(g: "pd.DataFrame") -> "pd.DataFrame":
        out = []
        for bucket, gb in g.groupby("bucket", sort=False):
            pts = gb[gb["kind"] == 1]
            ivs = gb[gb["kind"] == 0]
            if pts.empty or ivs.empty:
                continue
            pts = pts.sort_values("__ts", kind="mergesort")
            ts = pts["__ts"].to_numpy()
            lo = np.searchsorted(ts, ivs["__s"].to_numpy(), side="left")
            hi = np.searchsorted(ts, ivs["__e"].to_numpy(), side="left")
            cnt = hi - lo
            keep = cnt > 0
            if not keep.any():
                continue
            ivs = ivs[keep]
            lo, cnt = lo[keep], cnt[keep]
            p_take = np.concatenate(
                [np.arange(a, a + c) for a, c in zip(lo, cnt)]
            )
            i_take = np.repeat(np.arange(len(ivs)), cnt)
            left = (
                ivs[[f"i_{c}" for c in icols]]
                .iloc[i_take]
                .reset_index(drop=True)
            )
            right = (
                pts[[f"p_{c}" for c in pcols]]
                .iloc[p_take]
                .reset_index(drop=True)
            )
            out.append(pd.concat([left, right], axis=1))
        if not out:
            return pd.DataFrame(
                {
                    **{f"i_{c}": pd.Series(dtype="int64") for c in icols},
                    **{f"p_{c}": pd.Series(dtype="int64") for c in pcols},
                }
            )
        return pd.concat(out, ignore_index=True)

    joined = (
        tagged_p.union(tagged_i)
        .groupby("ck")
        .map_groups(pair_group, batch_format="pandas")
    )
    rename = {f"i_{c}": c for c in icols}
    rename.update({f"p_{c}": c for c in pcols})
    out_types = {**{c: itypes[c] for c in icols},
                 **{c: ptypes[c] for c in pcols}}

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.rename_columns([rename[c] for c in b.column_names])
        # the pandas group exchange upcasts nullable ints to float64 —
        # restore the declared schema (values are lossless by now)
        for i, c in enumerate(b.column_names):
            if b.column(i).type != out_types[c]:
                b = b.set_column(i, c, pc.cast(b.column(i), out_types[c]))
        return b

    return joined.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------
# Bloom-filter semi / anti join
# --------------------------------------------------------------------


def _bloom_positions(keys, bits: int, hashes: int):
    """(n, hashes) bit positions via double hashing of splitmix64."""
    import numpy as np

    from ..functions.hashing import hash_strings, splitmix64

    arr = np.asarray(keys)
    if arr.dtype.kind in "iu":
        h1 = splitmix64(arr.astype(np.uint64))
    else:
        h1 = hash_strings(arr)
    h2 = splitmix64(h1) | np.uint64(1)  # odd -> full-period stride
    i = np.arange(hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(bits)
    return pos.astype(np.int64)


def bloom_semi_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str | None = None,
    how: str = "semi",
    bits: int = 1 << 22,
    hashes: int = 4,
    num_partitions: int | None = None,
):
    """Semi/anti join with a Bloom prefilter — the middle path between
    :func:`broadcast_join` (needs the exact key set driver-resident)
    and :func:`hash_join` (shuffles the FULL probe side).

    - build: one pass over the key side emits per-batch DISTINCT bit
      positions; the driver ORs them into a packed ``bits/64``-word
      bitmap (memory = ``bits/8`` bytes — 512 KiB at the 2^22 default
      — regardless of key cardinality);
    - probe: the bitmap is broadcast once; rows whose ``hashes`` bits
      are all set are *maybes*, the rest are definite non-members
      (Bloom filters have no false negatives);
    - exact tail: semi keeps only maybes and verifies them through the
      hash-partitioned ``Dataset.join`` — the shuffle now moves just
      ``|true matches| + |false positives|`` rows (fp rate ~0.024 at
      4 hashes / 8 bits-per-key). Anti keeps definite non-members
      immediately and unions the exact-anti of the maybes.

    Output == exact semi/anti join, bit-for-bit: the filter only
    prunes, never decides membership.
    """
    import numpy as np

    right_on = right_on or on

    # ---- build (per-batch distinct positions -> driver OR)
    def positions(b: pa.Table) -> pa.Table:
        keys = b[right_on].to_numpy(zero_copy_only=False)
        pos = np.unique(_bloom_positions(keys, bits, hashes))
        return pa.table({"p": pa.array(pos, pa.int64())})

    words = np.zeros(bits // 64, np.uint64)
    for b in (
        right_ds.select_columns([right_on])
        .map_batches(positions, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        p = b["p"].to_numpy(zero_copy_only=False)
        np.bitwise_or.at(
            words, p // 64, np.uint64(1) << (p % 64).astype(np.uint64)
        )
    words_ref = ray.put(words)

    def classify(b: pa.Table, want_maybe: bool) -> pa.Table:
        from ..state.broadcast import get_broadcast

        w = get_broadcast(words_ref)
        keys = b[on].to_numpy(zero_copy_only=False)
        pos = _bloom_positions(keys, bits, hashes)
        hit = (
            (w[pos // 64] >> (pos % 64).astype(np.uint64))
            & np.uint64(1)
        ).astype(bool).all(axis=1)
        return b.filter(pa.array(hit if want_maybe else ~hit))

    maybes = left_ds.map_batches(
        lambda b: classify(b, True), batch_format="pyarrow"
    )

    if how == "semi":
        return hash_join(
            maybes,
            right_ds.select_columns([right_on]),
            on=[on],
            right_on=[right_on],
            how="semi",
            num_partitions=num_partitions,
        )
    if how == "anti":
        definite = left_ds.map_batches(
            lambda b: classify(b, False), batch_format="pyarrow"
        )
        survivors = hash_join(
            maybes,
            right_ds.select_columns([right_on]),
            on=[on],
            right_on=[right_on],
            how="anti",
            num_partitions=num_partitions,
        )
        return definite.union(survivors)
    raise ValueError(f"how must be semi|anti, got {how!r}")


# --------------------------------------------------------------------
# Salted skew join
# --------------------------------------------------------------------


def skew_join(
    left_ds,
    right_ds,
    on: str,
    right_on: str | None = None,
    salt: int = 8,
    hot_keys: list | None = None,
    hot_threshold: float = 0.01,
    num_partitions: int | None = None,
):
    """Inner equi-join hardened against HOT KEYS — the case where a
    plain hash join sends one key's entire row set to a single
    aggregator and that partition becomes the pipeline's wall-clock
    (the same pathology the triple sink's repo salting fixes,
    sources/sinks.py:detect_skewed_repos).

    - hot keys are detected with the Count-Min heavy-hitter sketch
      (stages/sketches.py:heavy_hitters — driver traffic independent
      of key cardinality) unless passed explicitly;
    - LEFT hot rows get ``salt`` pseudo-random salts (splitmix64 of a
      row-position mix — salt values only spread load, they never
      decide membership, so determinism of the VALUE doesn't matter);
      cold rows get salt 0;
    - RIGHT hot rows REPLICATE ``salt`` times (salt 0..S-1); cold rows
      once with salt 0 — replication cost = |hot right rows| × salt,
      bounded because hot keys are few by definition;
    - the join runs on (key, salt) and drops the salt: every left row
      still meets every matching right row exactly once, so the output
      is bit-for-bit the plain inner join (the `skew_join` oracle).

    For hot keys on BOTH sides (a true many-to-many hot pair) the
    right-side replication keeps correctness but the output itself is
    |L_hot| × |R_hot| — no join strategy shrinks that.
    """
    import numpy as np

    from ..functions.hashing import hash_strings, splitmix64

    right_on = right_on or on

    if hot_keys is None:
        from .sketches import heavy_hitters

        # a key is "hot" when it holds >= hot_threshold of ALL left
        # rows — the regime where one hash partition degenerates into
        # the straggler. Both passes touch only the key column.
        keys_only = left_ds.select_columns([on]).materialize()
        total = keys_only.count()
        hh = heavy_hitters(keys_only, on, k=32)
        cut = hot_threshold * total
        hot_keys = [
            v for v, c in zip(hh["value"], hh["est_count"]) if c >= cut
        ]
    hot_arr = pa.array([str(h) for h in hot_keys], pa.string())

    def salt_left(b: pa.Table) -> pa.Table:
        keys = pa.compute.cast(b[on], pa.string())
        hot = pa.compute.is_in(keys, value_set=hot_arr).to_numpy(
            zero_copy_only=False
        )
        h = hash_strings(keys.to_numpy(zero_copy_only=False))
        mix = splitmix64(h ^ np.arange(len(h), dtype=np.uint64))
        s = np.where(hot, (mix % np.uint64(salt)).astype(np.int64), 0)
        return b.append_column("__salt", pa.array(s, pa.int64()))

    def explode_right(b: pa.Table) -> pa.Table:
        keys = pa.compute.cast(b[right_on], pa.string())
        hot = pa.compute.is_in(keys, value_set=hot_arr).to_numpy(
            zero_copy_only=False
        )
        reps = np.where(hot, salt, 1).astype(np.int64)
        idx = np.repeat(np.arange(len(reps)), reps)
        off = np.arange(len(idx)) - np.repeat(
            np.cumsum(np.r_[0, reps[:-1]]), reps
        )
        out = b.take(pa.array(idx, pa.int64()))
        return out.append_column("__salt", pa.array(off, pa.int64()))

    left_s = left_ds.map_batches(salt_left, batch_format="pyarrow")
    right_s = right_ds.map_batches(explode_right, batch_format="pyarrow")
    joined = hash_join(
        left_s,
        right_s,
        on=[on, "__salt"],
        right_on=[right_on, "__salt"],
        how="inner",
        num_partitions=num_partitions,
    )
    return joined.drop_columns(["__salt"])
