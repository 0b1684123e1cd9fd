"""Interval (range) join (stages/joins.py:interval_join)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.joins import interval_join

US = 1_000_000


def _points(ts, blocks=4, **extra):
    cols = {
        "event_id": pa.array(range(len(ts)), pa.int64()),
        "ts": pa.array(np.asarray(ts, np.int64), pa.int64()),
    }
    for k, v in extra.items():
        cols[k] = pa.array(v)
    return rd.from_arrow(pa.table(cols)).repartition(blocks)


def _intervals(rows, blocks=2):
    ids, starts, ends, names = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "window_id": pa.array(ids, pa.int64()),
                "start_us": pa.array(np.asarray(starts, np.int64)),
                "end_us": pa.array(np.asarray(ends, np.int64)),
                "name": pa.array(names, pa.string()),
            }
        )
    ).repartition(blocks)


def _reference(ts, rows):
    out = []
    for eid, t in enumerate(ts):
        for wid, s, e, name in rows:
            if s <= t < e:
                out.append((wid, name, eid))
    return sorted(out)


def test_matches_reference_with_overlaps_and_long_intervals():
    rng = np.random.RandomState(3)
    ts = rng.randint(0, 100 * 3600 * US, size=500)
    rows = [
        # short, long (spans many buckets), overlapping, empty-range
        (0, 2 * 3600 * US, 7 * 3600 * US, "short"),
        (1, 0, 90 * 3600 * US, "long"),
        (2, 5 * 3600 * US, 30 * 3600 * US, "overlap"),
        (3, 50 * 3600 * US, 50 * 3600 * US, "empty"),
    ]
    got = interval_join(
        _points(ts),
        _intervals(rows),
        point_cols=["event_id"],
        interval_cols=["window_id", "name"],
        bucket_us=6 * 3600 * US,
    ).to_pandas()
    got_t = sorted(
        map(tuple, got[["window_id", "name", "event_id"]].itertuples(False))
    )
    assert got_t == _reference(ts, rows)
    # string column survives the exchange with its type
    assert got["name"].dtype == object
    assert got["window_id"].dtype == np.int64
    assert got["event_id"].dtype == np.int64


def test_boundary_semantics_half_open():
    # start inclusive, end exclusive
    ts = [10 * US, 20 * US]
    rows = [(0, 10 * US, 20 * US, "w")]
    got = interval_join(
        _points(ts, blocks=1),
        _intervals(rows, blocks=1),
        point_cols=["event_id"],
        interval_cols=["window_id"],
        bucket_us=3600 * US,
    ).to_pandas()
    assert list(got["event_id"]) == [0]


def test_no_matches_empty_result():
    got = interval_join(
        _points([0, US]),
        _intervals([(0, 50 * US, 60 * US, "w")]),
        point_cols=["event_id"],
        interval_cols=["window_id"],
        bucket_us=10 * US,
    ).to_pandas()
    assert len(got) == 0


def test_timestamp_typed_points():
    base = pd.Timestamp("2024-01-01").value // 1000  # ns -> us
    ts_us = np.array([base + i * 3600 * US for i in range(5)], np.int64)
    tbl = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(ts_us, pa.int64()).cast(pa.timestamp("us")),
        }
    )
    pts = rd.from_arrow(tbl).repartition(2)
    rows = [(7, base + 3600 * US, base + 3 * 3600 * US + 1, "w")]
    got = interval_join(
        pts,
        _intervals(rows, blocks=1),
        point_cols=["event_id"],
        interval_cols=["window_id"],
    ).to_pandas()
    assert sorted(got["event_id"]) == [1, 2, 3]
