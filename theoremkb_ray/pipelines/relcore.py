"""Relational operator suite over the driver's TPC-H-ish tables.

Each entry re-expresses an operator family from SURVEY.md §2 as a Ray
Data pipeline AND carries the equivalent ANSI SQL for the DuckDB
oracle (the ``__ray_entry__.py`` contract). Column names match the SQL
exactly; computed doubles are rounded identically on both sides so the
order-insensitive value-hash comparison is stable.

Scale notes baked in:
- every read prunes columns (``read_parquet(columns=[...])``);
- grouped aggregates use Ray's partial+final AggregateFns (combine per
  block, merge small partials — no raw-row shuffle of values that can
  be pre-reduced);
- small dimension tables broadcast (ray.put) instead of shuffling;
- both-sides-large joins use the hash-partitioned ``Dataset.join``.
"""


from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from ..stages.joins import broadcast_join, hash_join


REGISTRY: dict[str, tuple] = {}


def _pq(sf_dir: str, table: str, columns: list[str] | None = None):
    # metadata strip fuses with the read task; pandas-written parquet
    # carries a b'pandas' schema-metadata dict that makes pa.Schema
    # UNHASHABLE, knocking every downstream sort/groupby/join reduce
    # off Ray's schema-dedup fast path (one warning per block pair)
    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns
    ).map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def _round_cols(decimals: dict[str, int]):
    def fn(b: pa.Table) -> pa.Table:
        for col, d in decimals.items():
            if col in b.column_names:
                b = b.set_column(
                    b.column_names.index(col),
                    col,
                    pc.round(pc.cast(b[col], pa.float64()), ndigits=d),
                )
        return b

    return fn


#: coarse shuffle width for per-user event queries: grouping by the
#: raw user_id would create one Ray group PER USER (~0.5 ms each —
#: millions of groups at high cardinality); instead shuffle on
#: hash(user_id) %% K and do the per-user work vectorized inside the
#: coarse group. Correctness: a user's rows always share a bucket.
COARSE_USER_BUCKETS = 64


def _by_user_bucket(ds, col: str = "user_id"):
    from ..functions.hashing import splitmix64

    def add_bucket(b: pa.Table) -> pa.Table:
        u = b[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (
            splitmix64(u) % np.uint64(COARSE_USER_BUCKETS)
        ).astype(np.int64)
        return b.append_column("bucket", pa.array(bucket))

    return ds.map_batches(add_bucket, batch_format="pyarrow").groupby("bucket")


def _date_us(col) -> np.ndarray:
    return (
        col.to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )
