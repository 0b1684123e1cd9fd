"""Keyed TTL dedup — the stateful streaming dedup a TTL cache gives
you, as a Ray stage.

``window_dedup_events`` (pipelines/relational.py) is the BATCH
expressible form (distinct per tumbling window, SQL-oracle-checked).
This module is the true streaming semantics: an event is a duplicate
iff the same key was KEPT within the last ``ttl`` of event time —
chains reset from the kept event, not from the previous row, which no
single SQL window function expresses. The reference has no streaming
surface at all (its closest analog is the SQLite get_xml cache,
Styling/src/lib/misc/…); this is part of the §2.9 streaming-shaped
family this engine adds by design.

Two forms:

- :func:`ttl_dedup` — event-time batch replay: ONE coarse
  hash(key)-bucketed exchange co-locates each key's history, then a
  vectorized per-group sweep (sort by ts, one pass over runs) applies
  the kept-based TTL rule. Deterministic for any partitioning; ties
  on ts break by a caller row id. Use when the data is at rest.
  Scale shape: the exchange routes through ``spooled_group_map`` with
  ``fine_col="__ttl_key"`` — oversized coarse buckets (full event
  payloads!) are re-split on a decorrelated hash of the per-key hash,
  so per-reduce-task bytes stay bounded as event volume grows instead
  of one task concat-reading 1/64 of the whole table. Correct because
  the sweep only relies on a KEY's rows being co-located (it re-sorts
  by ``__ttl_key`` inside each partition), never on seeing the whole
  coarse bucket — the same argument as exact_dedup
  (stages/dedup.py:68-75).
- :class:`TtlDedupActor` — processing-order micro-batch form for the
  continuous-ingest path: a bounded per-actor ``{key_hash: last_kept
  ts}`` dict with amortized expiry sweeps. State is PARTITIONED by
  construction only if each key reaches a stable actor;
  :func:`ttl_dedup_streaming` ships that routing built-in
  (``hash(key) % n_actors`` sub-batch dispatch over raw Ray actor
  handles, per-actor call order preserved), so exact streaming
  semantics no longer depend on caller discipline. The exact batch
  form above is the reconciliation path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: coarse exchange width — same contract as relational.py's
#: COARSE_USER_BUCKETS (a key's rows always share a bucket)
TTL_BUCKETS = 64


def ttl_dedup(
    ds,
    key_cols: list[str],
    ts_col: str = "ts",
    ttl_us: int = 3_600_000_000,
    id_col: str | None = None,
    max_partition_bytes: int | None = None,
):
    """Event-time TTL dedup over a Dataset: keep a row iff no row
    with the same key was KEPT in the preceding ``ttl_us``
    microseconds. Returns the kept rows (original columns).

    One exchange: rows co-locate by ``hash(key) % TTL_BUCKETS`` via
    ``spooled_group_map(fine_col="__ttl_key")`` — oversized buckets
    re-split on the per-key hash so no reduce task ever reads more
    than ~max_partition_bytes of payload (flat per-task memory at any
    corpus size; a key's rows always stay together). The per-group
    sweep sorts by (key, ts, id) and walks each key's run with a
    vectorized segmented scan — numpy loop over KEPT events only
    (bounded by output size, not input)."""
    import pyarrow.compute as pc

    from ..functions.hashing import hash_strings
    from ..state.spool import spooled_group_map

    def add_bucket(b: pa.Table) -> pa.Table:
        key = None
        for c in key_cols:
            part = pc.cast(b[c], pa.string())
            key = (
                part
                if key is None
                else pc.binary_join_element_wise(key, part, "\x1f")
            )
        h = hash_strings(key.to_numpy(zero_copy_only=False))
        b = b.append_column(
            "__ttl_bucket",
            pa.array((h % np.uint64(TTL_BUCKETS)).astype(np.int64)),
        )
        return b.append_column("__ttl_key", pa.array(h.view(np.int64)))

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        order_cols = ["__ttl_key", ts_col] + (
            [id_col] if id_col else []
        )
        g = g.sort_values(order_cols, kind="mergesort").reset_index(
            drop=True
        )
        ts = (
            g[ts_col].astype("datetime64[us]").astype(np.int64)
            if np.issubdtype(g[ts_col].dtype, np.datetime64)
            or str(g[ts_col].dtype).startswith("datetime")
            else g[ts_col].to_numpy(np.int64)
        )
        key = g["__ttl_key"].to_numpy(np.int64)
        n = len(g)
        keep = np.zeros(n, dtype=bool)
        # per-key runs; within a run, walk kept anchors: each kept
        # event at t admits the next kept at the first ts > t + ttl.
        run_start = np.flatnonzero(
            np.r_[True, key[1:] != key[:-1]]
        )
        run_end = np.r_[run_start[1:], n]
        ts = np.asarray(ts)
        for s, e in zip(run_start, run_end):
            i = s
            while i < e:
                keep[i] = True
                # first index with ts > ts[i] + ttl — searchsorted on
                # the sorted run, so the loop iterates once per KEPT
                # event, not per row
                i = s + int(
                    np.searchsorted(
                        ts[s:e], ts[i] + ttl_us, side="right"
                    )
                )
        return g[keep].drop(columns=["__ttl_bucket", "__ttl_key"])

    out = spooled_group_map(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        "__ttl_bucket",
        sweep,
        batch_format="pandas",
        fine_col="__ttl_key",
        max_partition_bytes=max_partition_bytes,
    )
    if out.count() == 0:
        # typed empty: carry the input schema (spool's empty result is
        # schema-less; mirrors exact_dedup's empty handling)
        import ray.data as rd

        return rd.from_arrow(ds.schema().base_schema.empty_table())
    return out


#: re-hash for actor routing — decorrelated from the TTL_BUCKETS
#: coarse key (splitmix-style multiply + fold, state/spool.py:_MIX
#: rationale); raw ``h % n`` would correlate with ``h % 64``.
_ROUTE_MIX = np.uint64(0x9E3779B97F4A7C15)


def ttl_dedup_streaming(
    batches,
    key_cols: list[str],
    ts_col: str = "ts",
    ttl_us: int = 3_600_000_000,
    n_actors: int = 4,
    max_in_flight: int = 8,
):
    """Exact streaming TTL dedup with BUILT-IN key-stable routing:
    each micro-batch is split by ``mix(hash(key)) % n_actors`` and the
    sub-batches dispatched to a fixed pool of :class:`TtlDedupActor`
    Ray actors. Per-actor call order is Ray's actor-semantics
    guarantee, so every occurrence of a key reaches the SAME actor in
    submission order — the exact-semantics contract the bare actor
    documents, now enforced here instead of by caller discipline.

    ``batches`` is an iterable of pyarrow Tables in stream order (the
    micro-batch source — e.g. ``ds.iter_batches(batch_format=
    "pyarrow")`` of an ordered ingest, or the per-poll deltas of
    pipelines/stream.py). Yields the kept sub-tables as they resolve.
    Backpressure: at most ``max_in_flight`` outstanding calls per
    actor — the consumer never buffers the stream unbounded.

    Scale shape: this is the per-ingest-point consumer. The stream
    source is inherently ordered (a single poll loop / partition
    consumer); to scale beyond one consumer, shard KEYS across
    consumers first (each consumer owns ``hash(key) % n_consumers``)
    and run one pool per consumer — the routing here keeps each pool
    exact over its key shard. The at-rest reconciliation path is
    :func:`ttl_dedup` (exact under any partitioning)."""
    import pyarrow.compute as pc
    import ray

    from ..functions.hashing import hash_strings

    RemoteActor = ray.remote(num_cpus=1)(TtlDedupActor)
    actors = [
        RemoteActor.remote(key_cols, ts_col, ttl_us)
        for _ in range(n_actors)
    ]
    pending: list[list] = [[] for _ in range(n_actors)]

    def drain(i: int, down_to: int):
        while len(pending[i]) > down_to:
            ref = pending[i].pop(0)
            t = ray.get(ref)
            if t.num_rows:
                yield t

    try:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            key = None
            for c in key_cols:
                part = pc.cast(batch[c], pa.string())
                key = (
                    part
                    if key is None
                    else pc.binary_join_element_wise(key, part, "\x1f")
                )
            h = hash_strings(key.to_numpy(zero_copy_only=False))
            m = h * _ROUTE_MIX
            m ^= m >> np.uint64(32)
            route = (m % np.uint64(n_actors)).astype(np.int64)
            for i in range(n_actors):
                sel = np.flatnonzero(route == i)
                if len(sel) == 0:
                    continue
                # stable take preserves stream order within the batch
                sub = batch.take(pa.array(sel, pa.int64()))
                pending[i].append(actors[i].__call__.remote(sub))
                yield from drain(i, max_in_flight)
        for i in range(n_actors):
            yield from drain(i, 0)
    finally:
        for a in actors:
            ray.kill(a)


class TtlDedupActor:
    """Processing-order micro-batch TTL dedup for the continuous
    ingest path (pipelines/stream.py): keeps a bounded
    ``{key_hash: last_kept_event_ts}`` map per actor.

    Semantics contract: exact iff every occurrence of a key reaches
    the SAME actor in event-time order — which
    :func:`ttl_dedup_streaming` enforces with built-in
    ``mix(hash(key)) % n_actors`` routing (prefer it over wiring this
    class manually); used bare with unrouted batches the semantics
    are per-actor approximate (duplicates admitted across actors,
    never false drops of first-seen keys). State is bounded: entries older than
    ``ttl_us`` are swept whenever the map exceeds ``sweep_above``.
    For at-rest data prefer :func:`ttl_dedup` (exact under any
    partitioning)."""

    def __init__(
        self,
        key_cols: list[str],
        ts_col: str = "ts",
        ttl_us: int = 3_600_000_000,
        sweep_above: int = 1_000_000,
    ) -> None:
        self.key_cols, self.ts_col = key_cols, ts_col
        self.ttl_us = ttl_us
        self.sweep_above = sweep_above
        self.last_kept: dict[int, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.hashing import hash_strings

        if batch.num_rows == 0:
            return batch
        key = None
        for c in self.key_cols:
            part = pc.cast(batch[c], pa.string())
            key = (
                part
                if key is None
                else pc.binary_join_element_wise(key, part, "\x1f")
            )
        kh = hash_strings(key.to_numpy(zero_copy_only=False)).view(
            np.int64
        )
        ts_arr = batch[self.ts_col]
        if pa.types.is_timestamp(ts_arr.type):
            ts_arr = pc.cast(ts_arr, pa.int64())
        ts = ts_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(kh), dtype=bool)
        lk = self.last_kept
        for i in range(len(kh)):  # stateful by definition: the
            # decision for row i depends on kept rows < i — bounded
            # by micro-batch size, the documented streaming contract
            k = int(kh[i])
            t = int(ts[i])
            prev = lk.get(k)
            if prev is None or t - prev > self.ttl_us:
                lk[k] = t
                keep[i] = True
        if len(lk) > self.sweep_above:
            horizon = int(ts.max()) - self.ttl_us
            self.last_kept = {
                k: t for k, t in lk.items() if t >= horizon
            }
        return batch.filter(pa.array(keep))
