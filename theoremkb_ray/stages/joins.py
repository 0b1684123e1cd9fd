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


def broadcast_join(
    left_ds,
    right: pa.Table | pd.DataFrame,
    on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    concurrency=None,  # kept for API compat; stateless tasks autoscale
    batch_size: int = 8192,
):
    """Broadcast hash join; right side must fit in worker memory."""
    assert how in ("inner", "left", "semi", "anti")
    right_ref = ray.put(right)
    on = list(on)
    r_on = list(right_on or on)
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
