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

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


class _BroadcastJoiner:
    def __init__(self, right_ref, on, right_on, how) -> None:
        right = ray.get(right_ref)
        self.right = right if isinstance(right, pd.DataFrame) else right.to_pandas()
        self.on = list(on)
        self.right_on = list(right_on)
        self.how = how
        if how in ("semi", "anti"):
            self.keys = set(
                map(tuple, self.right[self.right_on].itertuples(index=False))
            )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.how in ("semi", "anti"):
            mask = pd.Series(
                list(
                    map(
                        tuple,
                        batch[self.on].itertuples(index=False),
                    )
                ),
                index=batch.index,
            ).isin(self.keys)
            if self.how == "anti":
                mask = ~mask
            return batch[mask]
        return batch.merge(
            self.right,
            left_on=self.on,
            right_on=self.right_on,
            how=self.how,
        )


def broadcast_join(
    left_ds,
    right: pa.Table | pd.DataFrame,
    on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    concurrency=(1, 8),
    batch_size: int = 8192,
):
    """Broadcast hash join; right side must fit in worker memory."""
    assert how in ("inner", "left", "semi", "anti")
    right_ref = ray.put(right)
    return left_ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(right_ref, on, right_on or on, how),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def hash_join(
    left_ds,
    right_ds,
    on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    num_partitions: int = 16,
):
    """Both-sides-large equi-join via Ray's hash-partitioned join."""
    return left_ds.join(
        right_ds,
        join_type=how,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
    )
