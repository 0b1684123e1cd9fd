"""Salted skew join (stages/joins.py:skew_join)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.joins import skew_join


def _sides(seed=0):
    rng = np.random.RandomState(seed)
    # key 7 is pathologically hot on the left: 70% of all rows
    keys = np.where(
        rng.rand(2000) < 0.7, 7, rng.randint(0, 50, 2000)
    ).astype(np.int64)
    left = pa.table(
        {
            "k": pa.array(keys),
            "lv": pa.array(np.arange(2000, dtype=np.int64)),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(np.arange(50, dtype=np.int64)),
            "rv": pa.array(np.arange(50, dtype=np.int64) * 100),
        }
    )
    return left, right


def _want(left, right):
    return (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="k", right_on="rk")
        .sort_values(["lv"])
        .reset_index(drop=True)
    )


def test_explicit_hot_keys_exact():
    left, right = _sides()
    got = (
        skew_join(
            rd.from_arrow(left).repartition(6),
            rd.from_arrow(right).repartition(2),
            on="k",
            right_on="rk",
            salt=8,
            hot_keys=["7"],
        )
        .to_pandas()
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    want = _want(left, right)
    assert len(got) == len(want)
    # Ray's join merges the right key column into the left one
    pd.testing.assert_frame_equal(
        got[["k", "lv", "rv"]], want[["k", "lv", "rv"]]
    )


def test_auto_hot_key_detection_exact():
    left, right = _sides(seed=3)
    got = (
        skew_join(
            rd.from_arrow(left).repartition(6),
            rd.from_arrow(right).repartition(2),
            on="k",
            right_on="rk",
            salt=4,
        )
        .to_pandas()
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    want = _want(left, right)
    assert len(got) == len(want)
    assert (got["lv"].to_numpy() == want["lv"].to_numpy()).all()
    assert (got["rv"].to_numpy() == want["rv"].to_numpy()).all()


def test_no_hot_keys_degenerates_to_plain_join():
    left, right = _sides(seed=5)
    got = skew_join(
        rd.from_arrow(left).repartition(3),
        rd.from_arrow(right).repartition(1),
        on="k",
        right_on="rk",
        salt=8,
        hot_keys=[],
    ).to_pandas()
    assert len(got) == len(_want(left, right))
