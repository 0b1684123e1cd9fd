"""Event-stream / telemetry / user-behavior queries over the events table (windows, sessions, funnels, statistics).

Split from pipelines/relational.py (round 5) purely for maintainability;
every query registers into the shared REGISTRY exactly as before and
is re-exported by pipelines/relational.py.
"""


from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from ..stages.joins import broadcast_join, hash_join

from .relcore import (  # noqa: F401
    COARSE_USER_BUCKETS,
    REGISTRY,
    _by_user_bucket,
    _date_us,
    _round_cols,
)
from . import relcore as _relcore


def _pq(sf_dir, table, columns=None):
    # late-bound so tests can monkeypatch relcore._pq in
    # ONE place and every domain module sees it
    return _relcore._pq(sf_dir, table, columns)


def q_window_tumbling(sf_dir: str):
    """§2.9 stream-shaped: tumbling 1h window per event_type."""
    ds = _pq(sf_dir, "events", ["ts", "event_type", "value"])

    def add_window(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        hour = pc.divide(us, 3_600_000_000)
        return b.append_column("hour", pc.cast(hour, pa.int64()))

    out = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return out.map_batches(
        _round_cols({"sum_value": 4}), batch_format="pyarrow"
    )


SQL_WINDOW_TUMBLING = """
SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, hour
"""


def q_window_hopping(sf_dir: str):
    """§2.9 stream-shaped: HOPPING window — 2h size, 1h hop, so every
    event belongs to exactly two overlapping windows (window_start is
    the hour index the window opens at). The 2x fan-out never reaches
    the exchange: each batch duplicates rows in numpy, pre-aggregates
    (event_type, window_start) partials with a pandas hash groupby,
    and only the tiny partial table shuffles."""
    ds = _pq(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        h = (
            pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        et = b["event_type"].to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": np.tile(et, 2),
                "window_start": np.concatenate([h, h - 1]),
                "n": 1,
                "sum_value": np.tile(val, 2),
            }
        )
        agg = df.groupby(
            ["event_type", "window_start"], as_index=False, sort=False
        ).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
    )
    return out.map_batches(
        _round_cols({"sum_value": 4}), batch_format="pyarrow"
    )


SQL_WINDOW_HOPPING = """
SELECT event_type, CAST(h - k AS BIGINT) AS window_start,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM (SELECT event_type, value,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h FROM events),
     unnest([0, 1]) AS t(k)
GROUP BY event_type, window_start
"""


def q_json_extract(sf_dir: str):
    """§2.8 JSON scalar: extract props.k (vectorized regex, no
    per-row json.loads)."""
    ds = _pq(sf_dir, "events", ["event_id", "props"])

    def fn(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(
            pc.if_else(pc.is_valid(m), pc.struct_field(m, "k"), None),
            pa.int64(),
        )
        return pa.table({"event_id": b["event_id"], "k": k})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_JSON_EXTRACT = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


def q_asof_join(sf_dir: str):
    """As-of join (SURVEY.md custom-operator case): each 'click' event
    matched to the latest prior 'view' event of the same user.
    Partition by user -> per-group pandas merge_asof (sorted within
    group; the documented bucketed as-of pattern)."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        views = g[g["event_type"] == "view"].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        if len(clicks) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "view_event_id": pd.Series(dtype="float64"),
                }
            )
        # ONE vectorized merge_asof for the whole bucket (by=user):
        # no per-user pandas groups
        j = pd.merge_asof(
            clicks,
            views[["user_id", "ts", "event_id"]].rename(
                columns={"event_id": "view_event_id"}
            ),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        return j[["event_id", "user_id", "view_event_id"]]

    out = _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")

    def fix_types(b: pa.Table) -> pa.Table:
        col = pc.cast(b["view_event_id"], pa.float64())
        return b.set_column(
            b.column_names.index("view_event_id"), "view_event_id", col
        )

    return out.map_batches(fix_types, batch_format="pyarrow")


SQL_ASOF_JOIN = """
SELECT c.event_id AS event_id, c.user_id AS user_id,
       CAST(v.event_id AS DOUBLE) AS view_event_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts > v.ts
"""


def q_session_window(sf_dir: str):
    """Session windows (streaming §2.9): per user, a >30-minute gap
    starts a new session; emit session counts per user."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "n_sessions": pd.Series(dtype="int64")}
            )
        ts = g["ts"].to_numpy()
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        # compare in microseconds — truncating to whole seconds would
        # disagree with SQL epoch() on gaps within 1s of the threshold
        gaps_us = np.zeros(n, dtype=np.int64)
        gaps_us[1:] = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
        new_session = new_user | (gaps_us > 1800 * 1_000_000)
        starts = np.flatnonzero(new_user)
        n_sessions = np.add.reduceat(new_session.astype(np.int64), starts)
        return pd.DataFrame({"user_id": u[starts], "n_sessions": n_sessions})

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_SESSION_WINDOW = """
SELECT user_id, count(*) AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM (SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM events))
WHERE new_session = 1 GROUP BY user_id
"""


def q_running_sum(sf_dir: str):
    """Running aggregate: cumulative value per user ordered by
    (ts, event_id) — ordered-fold semantics inside map_groups."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # pandas groupby-cumsum is a single C kernel over the sorted
        # frame (NOT per-user Python groups), and float addition order
        # per user is identical to the per-user form
        run = g.groupby("user_id", sort=False)["value"].cumsum().round(4)
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "running_value": run,
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_RUNNING_SUM = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 4)
         AS running_value
FROM events
"""


def q_window_moving_avg(sf_dir: str):
    """Sliding window frame (§2.9): per-user moving average of
    ``value`` over the last 3 events ordered by (ts, event_id).
    Coarse-bucket shuffle + ONE vectorized shifted-add pass per bucket
    — the in-frame summation order (v[i-2] + v[i-1] + v[i]) matches
    SQL's left-to-right frame order, so the rounded doubles hash-match
    the oracle."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        v = g["value"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "moving_avg": pd.Series(dtype="float64"),
                }
            )
        same1 = np.zeros(n, dtype=bool)
        same1[1:] = u[1:] == u[:-1]  # row i-1 belongs to the same user
        same2 = np.zeros(n, dtype=bool)
        same2[2:] = u[2:] == u[:-2]  # row i-2 belongs to the same user
        v1 = np.zeros(n)
        v1[1:] = v[:-1]
        v2 = np.zeros(n)
        v2[2:] = v[:-2]
        s = np.where(same2, v2, 0.0) + np.where(same1, v1, 0.0) + v
        cnt = 1 + same1.astype(np.int64) + same2.astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "moving_avg": np.round(s / cnt, 4),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_WINDOW_MOVING_AVG = """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             4) AS moving_avg
FROM events
"""


def q_range_join(sf_dir: str):
    """Point-in-interval join (stages/joins.py:interval_join — the
    bucket-replication exchange, NOT a broadcast): events fall into
    deterministic 5-hour maintenance windows anchored every 7 hours
    per supplier key. Each event moves once; each interval replicates
    to the <=2 six-hour buckets it overlaps; pairing is two
    searchsorted calls per interval inside the coarse group."""
    from ..stages.joins import interval_join

    HOUR_US = 3600 * 1_000_000
    base_us = 1_704_067_200_000_000  # epoch us of 2024-01-01 00:00:00

    events = _pq(sf_dir, "events", ["event_id", "ts"])
    supp = _pq(sf_dir, "supplier", ["s_suppkey"])

    def windows(b: pa.Table) -> pa.Table:
        k = b["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = base_us + k * 7 * HOUR_US
        return pa.table(
            {
                "window_id": pa.array(k, pa.int64()),
                "start_us": pa.array(start, pa.int64()),
                "end_us": pa.array(start + 5 * HOUR_US, pa.int64()),
            }
        )

    intervals = supp.map_batches(windows, batch_format="pyarrow")
    return interval_join(
        events,
        intervals,
        ts_col="ts",
        point_cols=["event_id"],
        interval_cols=["window_id"],
    )


SQL_RANGE_JOIN = """
WITH w AS (
  SELECT s_suppkey AS window_id,
         TIMESTAMP '2024-01-01' + s_suppkey * INTERVAL 7 HOUR AS ws,
         TIMESTAMP '2024-01-01' + s_suppkey * INTERVAL 7 HOUR
           + INTERVAL 5 HOUR AS we
  FROM supplier
)
SELECT w.window_id, e.event_id
FROM events e JOIN w ON e.ts >= w.ws AND e.ts < w.we
"""


#: event types pivoted into columns (fixed, so the schema is static)
PIVOT_TYPES = ["click", "view", "purchase", "error"]


def q_pivot_events(sf_dir: str):
    """PIVOT: per-user event-type counts as COLUMNS. Partial pivot per
    batch (one bincount over user×type), tiny final groupby over the
    partials — the pivot happens before the exchange, so only
    (users × 4) partial rows shuffle, never events."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])
    type_arr = pa.array(PIVOT_TYPES, pa.string())

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.index_in(b["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        keep = ~np.isnan(t)
        u, t = u[keep], t[keep].astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        k = len(PIVOT_TYPES)
        counts = np.bincount(inv * k + t, minlength=len(uu) * k).reshape(
            len(uu), k
        )
        cols = {"user_id": pa.array(uu, pa.int64())}
        for j, name in enumerate(PIVOT_TYPES):
            cols[f"n_{name}"] = pa.array(counts[:, j], pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Sum as _Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            *[
                _Sum(f"n_{name}", alias_name=f"n_{name}")
                for name in PIVOT_TYPES
            ]
        )
    )


SQL_PIVOT_EVENTS = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""


def q_latest_record(sf_dir: str):
    """Latest-record-wins dedup (the SCD/crawl pattern: keep each
    key's newest row): per-batch prune to each user's latest event,
    then one coarse-bucket exchange finishes the argmax — only
    (users × blocks) pruned rows move."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prune(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        ts = b["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(b["ts"], pa.ChunkedArray) else b["ts"].cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        # latest = max (ts, event_id) per user within the batch
        order = np.lexsort((eid, ts, u))
        last = np.flatnonzero(
            np.r_[u[order][1:] != u[order][:-1], True]
        )
        return b.take(pa.array(order[last], pa.int64()))

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        keep = g.groupby("user_id", sort=False).tail(1)
        return keep.drop(columns=["bucket"])

    return _by_user_bucket(pruned).map_groups(
        finish, batch_format="pandas"
    )


SQL_LATEST_RECORD = """
SELECT event_id, user_id, ts, value FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_intersect_keys(sf_dir: str):
    """INTERSECT: customer keys that appear in both the orders and
    events key spaces — distinct-intersection via two semi joins over
    pruned key columns."""
    from ..stages.joins import broadcast_join

    ev_users = (
        _pq(sf_dir, "events", ["user_id"])
        .groupby("user_id")
        .count()
        .select_columns(["user_id"])
    )
    o_keys = (
        _pq(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
    )
    return broadcast_join(
        o_keys, ev_users.to_pandas(), on=["o_custkey"],
        right_on=["user_id"], how="semi",
    )


SQL_INTERSECT_KEYS = """
SELECT o_custkey FROM orders
INTERSECT
SELECT user_id FROM events
"""


def q_except_keys(sf_dir: str):
    """EXCEPT: customer keys with orders but no events — distinct keys
    anti-joined against the (small) distinct event-user set."""
    from ..stages.joins import broadcast_join

    ev_users = (
        _pq(sf_dir, "events", ["user_id"])
        .groupby("user_id")
        .count()
        .select_columns(["user_id"])
    )
    o_keys = (
        _pq(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
    )
    return broadcast_join(
        o_keys, ev_users.to_pandas(), on=["o_custkey"],
        right_on=["user_id"], how="anti",
    )


SQL_EXCEPT_KEYS = """
SELECT o_custkey FROM orders
EXCEPT
SELECT user_id FROM events
"""


def q_window_range_frame(sf_dir: str):
    """Time-RANGE window frame (vs the ROWS frame of
    `window_moving_avg`): per user, the sum of values in the last hour
    INCLUDING the current event — per-user sorted prefix sums + one
    searchsorted per row inside coarse buckets."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    HOUR_US = 3600 * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].astype("int64").to_numpy()
        val = g["value"].to_numpy(dtype=np.float64)
        uid = g["user_id"].to_numpy()
        csum = np.cumsum(val)
        out = np.empty(len(g))
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(g)]
        for s, e in zip(starts, ends):
            t = ts[s:e]
            lo = np.searchsorted(t, t - HOUR_US, side="left") + s
            # csum is GLOBAL over the sorted bucket, so subtracting
            # csum[lo-1] removes both the out-of-window rows of this
            # user and every earlier user's contribution in one shot
            out[s:e] = csum[s:e] - np.where(lo > 0, csum[lo - 1], 0.0)
        g["hour_sum"] = np.round(out, 6)
        return g.drop(columns=["bucket"])

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_WINDOW_RANGE_FRAME = """
SELECT event_id, user_id, ts, value,
       round(SUM(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ), 6) AS hour_sum
FROM events
"""


def q_lag_lead(sf_dir: str):
    """LAG/LEAD window functions: each event with its user's previous
    and next value — one vectorized shift inside the coarse user
    buckets (nulls at partition edges)."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)["value"]
        g["prev_value"] = grp.shift(1)
        g["next_value"] = grp.shift(-1)
        return g.drop(columns=["bucket"])

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_LAG_LEAD = """
SELECT event_id, user_id, ts, value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_date_parts(sf_dir: str):
    """Temporal rollup: per-day event counts + mean value via Arrow
    floor_temporal — the date_trunc kernel exercised end to end
    (timestamps never leave Arrow until the final tiny groupby)."""
    ds = _pq(sf_dir, "events", ["ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b["ts"], unit="day")
        t = pa.table({"day": day, "value": b["value"]})
        g = pa.TableGroupBy(t, "day").aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return g.rename_columns(["day", "n", "vsum"])

    from ray.data.aggregate import Sum as _Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            _Sum("n", alias_name="n"), _Sum("vsum", alias_name="vsum")
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        mean = pc.round(
            pc.divide(
                pc.cast(b["vsum"], pa.float64()),
                pc.cast(b["n"], pa.float64()),
            ),
            ndigits=6,
        )
        return pa.table(
            {
                "day": pc.cast(b["day"], pa.string()),
                "n": b["n"],
                "mean_value": mean,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_DATE_PARTS = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
       count(*) AS n,
       round(sum(value) / count(*), 6) AS mean_value
FROM events GROUP BY 1
"""


REGISTRY.update({'window_tumbling': (q_window_tumbling, SQL_WINDOW_TUMBLING)})


REGISTRY.update({'json_extract': (q_json_extract, SQL_JSON_EXTRACT)})


REGISTRY.update({'asof_join': (q_asof_join, SQL_ASOF_JOIN)})


REGISTRY.update({'session_window': (q_session_window, SQL_SESSION_WINDOW)})


REGISTRY.update({'running_sum': (q_running_sum, SQL_RUNNING_SUM)})


REGISTRY.update({'window_hopping': (q_window_hopping, SQL_WINDOW_HOPPING)})


REGISTRY.update({'window_moving_avg': (q_window_moving_avg, SQL_WINDOW_MOVING_AVG)})


REGISTRY.update({'range_join': (q_range_join, SQL_RANGE_JOIN)})


REGISTRY.update({'pivot_events': (q_pivot_events, SQL_PIVOT_EVENTS)})


REGISTRY.update({'latest_record': (q_latest_record, SQL_LATEST_RECORD)})


REGISTRY.update({'intersect_keys': (q_intersect_keys, SQL_INTERSECT_KEYS)})


REGISTRY.update({'except_keys': (q_except_keys, SQL_EXCEPT_KEYS)})


REGISTRY.update({'window_range_frame': (q_window_range_frame, SQL_WINDOW_RANGE_FRAME)})


REGISTRY.update({'lag_lead': (q_lag_lead, SQL_LAG_LEAD)})


REGISTRY.update({'date_parts': (q_date_parts, SQL_DATE_PARTS)})


# ------------------------------------------------- round-3 additions


def q_funnel_users(sf_dir: str):
    """Ordered event-sequence funnel: per user, the longest completed
    prefix of click -> view -> purchase with STRICTLY increasing
    timestamps (each step's time = the earliest qualifying event after
    the previous step). The classic product-analytics operator; one
    user-bucketed shuffle, vectorized ``reduceat`` folds per bucket."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])
    INF = np.iinfo(np.int64).max

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "steps": pd.Series(dtype="int64")}
            )
        ts = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        et = g["event_type"].to_numpy()
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_user)
        seg = np.cumsum(new_user) - 1

        def first_after(mask, prev):
            cand = np.where(mask & (ts > prev[seg]), ts, INF)
            return np.minimum.reduceat(cand, starts)

        none = np.full(len(starts), -1, np.int64)  # ts > -1 always
        t1 = first_after(et == "click", none)
        t2 = first_after(et == "view", t1)
        t3 = first_after(et == "purchase", t2)
        steps = (
            (t1 < INF).astype(np.int64)
            + (t2 < INF)
            + (t3 < INF)
        )
        return pd.DataFrame({"user_id": u[starts], "steps": steps})

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_FUNNEL_USERS = """
WITH c AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'click' GROUP BY user_id),
v AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN c USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > c.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN v.user_id IS NOT NULL THEN 2
                 WHEN c.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS steps
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN c USING (user_id)
LEFT JOIN v USING (user_id)
LEFT JOIN p USING (user_id)
"""


def q_retention_cohorts(sf_dir: str):
    """Cohort retention: users grouped by first-active day (epoch
    days), counted on each later active day offset. Day arithmetic is
    integer on both sides. Partial dedup of (user, day) inside
    map_batches, one user-bucketed shuffle, then a tiny
    (cohort, offset) groupby-sum."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86_400_000_000

    def to_days(b: pa.Table) -> pa.Table:
        ts = (
            b["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        day = ts // DAY_US
        pairs = np.unique(
            np.stack(
                [b["user_id"].to_numpy(zero_copy_only=False), day],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "day": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    days = ds.map_batches(to_days, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {"cohort_day": pd.Series(dtype="int64"),
                 "day_offset": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            )
        dedup = np.ones(n, dtype=bool)
        dedup[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[dedup], d[dedup]
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new_user) - 1
        cohort = d[new_user][seg]
        off = d - cohort
        key = cohort * 100_000 + off  # offsets < 100k days
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame(
            {
                "cohort_day": uk // 100_000,
                "day_offset": uk % 100_000,
                "n": cnt.astype(np.int64),
            }
        )

    partial = _by_user_bucket(days).map_groups(
        per_bucket, batch_format="pandas"
    )
    return partial.groupby(["cohort_day", "day_offset"]).aggregate(
        Sum("n", alias_name="n_users")
    )


SQL_RETENTION_COHORTS = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
           FROM events),
f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
       count(*) AS n_users
FROM d JOIN f USING (user_id)
GROUP BY f.cohort_day, day_offset
"""


REGISTRY.update({'funnel_users': (q_funnel_users, SQL_FUNNEL_USERS)})


REGISTRY.update({'retention_cohorts': (q_retention_cohorts, SQL_RETENTION_COHORTS)})


def q_cumulative_users(sf_dir: str):
    """Daily active / new / cumulative distinct users — the growth
    dashboard triple. Per-batch distinct-(user, day) partials, one
    user-bucketed exchange folding active-day and first-day counts,
    a tiny day-keyed sum, then an ordered cumulative fold over the
    day table (calendar-bounded cardinality, so the single-block
    finalize is justified)."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86_400_000_000

    def to_days(b: pa.Table) -> pa.Table:
        ts = (
            b["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        pairs = np.unique(
            np.stack(
                [b["user_id"].to_numpy(zero_copy_only=False), ts // DAY_US],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "day": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {"day": pd.Series(dtype="int64"),
                 "n_active": pd.Series(dtype="int64"),
                 "n_new": pd.Series(dtype="int64")}
            )
        dedup = np.ones(n, dtype=bool)
        dedup[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[dedup], d[dedup]
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        act_day, act_n = np.unique(d, return_counts=True)
        new_day, new_n = np.unique(d[new_user], return_counts=True)
        days = np.union1d(act_day, new_day)
        out = pd.DataFrame({"day": days})
        out["n_active"] = 0
        out["n_new"] = 0
        out.loc[np.searchsorted(days, act_day), "n_active"] = act_n
        out.loc[np.searchsorted(days, new_day), "n_new"] = new_n
        return out

    per_day = (
        _by_user_bucket(ds.map_batches(to_days, batch_format="pyarrow"))
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("day")
        .aggregate(
            Sum("n_active", alias_name="n_active"),
            Sum("n_new", alias_name="n_new"),
        )
    )

    def cum(b: pa.Table) -> pa.Table:
        new = b["n_new"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "day": pc.cast(b["day"], pa.int64()),
                "n_active": pc.cast(b["n_active"], pa.int64()),
                "n_new": pa.array(new),
                "cum_users": pa.array(np.cumsum(new)),
            }
        )

    return (
        per_day.sort("day").repartition(1)
        .map_batches(cum, batch_format="pyarrow", batch_size=None)
    )


SQL_CUMULATIVE_USERS = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
           FROM events),
f AS (SELECT user_id, min(day) AS fday FROM d GROUP BY user_id),
act AS (SELECT day, count(*) AS n_active FROM d GROUP BY day),
nw AS (SELECT fday AS day, count(*) AS n_new FROM f GROUP BY fday)
SELECT act.day, act.n_active,
       COALESCE(nw.n_new, 0) AS n_new,
       CAST(sum(COALESCE(nw.n_new, 0))
            OVER (ORDER BY act.day) AS BIGINT) AS cum_users
FROM act LEFT JOIN nw USING (day)
"""


REGISTRY.update({'cumulative_users': (q_cumulative_users, SQL_CUMULATIVE_USERS)})


def q_event_transitions(sf_dir: str):
    """First-order Markov transition matrix over per-user event
    streams: consecutive event-type pairs ordered by (ts, event_id)
    within each user, counted globally, with the per-from-type
    transition probability. One user-bucketed exchange with
    vectorized within-bucket pair extraction; the transition matrix is
    type-vocabulary-sized, so the probability normalization runs on a
    single final block. Oracle = lead() window + count + window sum."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        n = len(u)
        if n < 2:
            return pd.DataFrame(
                {
                    "from_type": pd.Series(dtype=object),
                    "to_type": pd.Series(dtype=object),
                    "n": pd.Series(dtype="int64"),
                }
            )
        same = u[1:] == u[:-1]
        ft, tt = et[:-1][same], et[1:][same]
        uniq_f, fc = np.unique(ft, return_inverse=True)
        uniq_t, tc = np.unique(tt, return_inverse=True)
        packed = fc.astype(np.int64) * len(uniq_t) + tc
        upk, cnt = np.unique(packed, return_counts=True)
        return pd.DataFrame(
            {
                "from_type": uniq_f[upk // len(uniq_t)],
                "to_type": uniq_t[upk % len(uniq_t)],
                "n": cnt.astype(np.int64),
            }
        )

    def prob(b: pa.Table) -> pa.Table:
        f = b["from_type"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_f, inv = np.unique(f, return_inverse=True)
        tot = np.bincount(inv, weights=n)
        return pa.table(
            {
                "from_type": b["from_type"],
                "to_type": b["to_type"],
                "n": pa.array(n, pa.int64()),
                "p": pa.array(np.round(n / tot[inv], 6), pa.float64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        _by_user_bucket(ds)
        .map_groups(pairs, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(_Sum("n", alias_name="n"))
        .repartition(1)
        .map_batches(prob, batch_format="pyarrow", batch_size=None)
    )


SQL_EVENT_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_type AS ft,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS tt
  FROM events
),
c AS (
  SELECT ft AS from_type, tt AS to_type, count(*) AS n
  FROM s WHERE tt IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type),
             6) AS p
FROM c
"""


REGISTRY.update({'event_transitions': (q_event_transitions, SQL_EVENT_TRANSITIONS)})


def q_outliers_mad(sf_dir: str):
    """Robust per-group outlier detection: flag events whose value
    deviates from the group median by more than 3x the median absolute
    deviation (the MAD rule — robust to the heavy upper tail the mean
    +/- k*sigma rule would swallow). Exact per-group medians: groups
    are event-type-sized so each fits one task (the same contract as
    quantiles_group); flagged rows keep their identity columns. Oracle
    = DuckDB median() twice + join."""
    ds = _pq(sf_dir, "events", ["event_id", "event_type", "value"])

    def per_grp(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        med = np.quantile(v, 0.5, method="linear")
        mad = np.quantile(np.abs(v - med), 0.5, method="linear")
        flag = np.abs(v - med) > 3 * mad
        out = g.loc[flag, ["event_id", "event_type", "value"]].copy()
        out["med"] = np.round(med, 4)
        out["mad"] = np.round(mad, 4)
        return out

    return ds.groupby("event_type").map_groups(per_grp, batch_format="pandas")


SQL_OUTLIERS_MAD = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY 1
),
mad AS (
  SELECT e.event_type, median(abs(e.value - m.med)) AS mad,
         min(m.med) AS med
  FROM events e JOIN med m USING (event_type) GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       round(m.med, 4) AS med, round(m.mad, 4) AS mad
FROM events e JOIN mad m USING (event_type)
WHERE abs(e.value - m.med) > 3 * m.mad
"""


def q_chi_square_events(sf_dir: str):
    """Chi-square test of independence between event type and a
    deterministic user cohort (user_id % 4): contingency counts fold
    as (type, cohort, n) partials per batch — the exchange is
    cell-count-sized, never row-sized — and the statistic (including
    the zero-observed cells' expected mass) is computed on the final
    single block. Oracle = CROSS JOIN of the margins LEFT JOIN the
    observed cells."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            b["event_type"].combine_chunks()
            if isinstance(b["event_type"], pa.ChunkedArray)
            else b["event_type"]
        )
        t = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = b["user_id"].to_numpy(zero_copy_only=False) % 4
        packed = t * 4 + k
        upk, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "t": enc.dictionary.take(pa.array(upk // 4, pa.int64())),
                "k": pa.array(upk % 4, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        t = b["t"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ut, ti = np.unique(t, return_inverse=True)
        uk, ki = np.unique(k, return_inverse=True)
        obs = np.zeros((len(ut), len(uk)))
        obs[ti, ki] = n
        rt = obs.sum(axis=1, keepdims=True)
        ct = obs.sum(axis=0, keepdims=True)
        e = rt * ct / obs.sum()
        chi2 = ((obs - e) ** 2 / e).sum()
        dof = (len(ut) - 1) * (len(uk) - 1)
        return pa.table(
            {
                "chi2": pa.array([round(float(chi2), 6)], pa.float64()),
                "dof": pa.array([dof], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["t", "k"])
        .aggregate(_Sum("n", alias_name="n"))
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )


SQL_CHI_SQUARE_EVENTS = """
WITH c AS (
  SELECT event_type AS t, user_id % 4 AS k, count(*) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT t, sum(o) AS r FROM c GROUP BY 1),
ct AS (SELECT k, sum(o) AS cc FROM c GROUP BY 1),
tot AS (SELECT sum(o) AS n FROM c),
grid AS (
  SELECT rt.t, ct.k, COALESCE(c.o, 0) AS o,
         CAST(rt.r AS DOUBLE) * ct.cc / tot.n AS e
  FROM rt CROSS JOIN ct CROSS JOIN tot
  LEFT JOIN c ON c.t = rt.t AND c.k = ct.k
)
SELECT round(sum((o - e) * (o - e) / e), 6) AS chi2,
       CAST((SELECT count(*) - 1 FROM rt)
            * (SELECT count(*) - 1 FROM ct) AS BIGINT) AS dof
FROM grid
"""


def q_interval_coverage_users(sf_dir: str):
    """Per-user union-of-intervals coverage: each event opens a
    30-minute activity window; overlapping windows merge (the classic
    sweep), and the output is each user's merged-interval count and
    total covered MICROSECONDS (exact int64 — no float drift). One
    user-bucketed exchange; the sweep is a segmented cumulative max
    (offset trick keeps it one numpy pass per bucket). Oracle = the
    textbook window-function island detection (max(e) OVER preceding
    rows) + island aggregation."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    WIN_US = 30 * 60 * 1_000_000
    OFF = np.int64(1) << 46  # > any in-bucket time span (rebased)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_intervals": pd.Series(dtype="int64"),
                    "coverage_us": pd.Series(dtype="int64"),
                }
            )
        s = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = s.min()
        s0 = s - base
        e0 = s0 + WIN_US
        assert int(e0.max()) < int(OFF), "time span exceeds offset trick"
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        uidx = np.cumsum(new_user) - 1
        # segmented cumulative max of e0 within each user run
        m = np.maximum.accumulate(e0 + uidx * OFF) - uidx * OFF
        prev_m = np.empty(n, np.int64)
        prev_m[0] = 0
        prev_m[1:] = m[:-1]
        brk = new_user | (s0 > prev_m)
        grp = np.cumsum(brk) - 1
        gstart = np.flatnonzero(brk)
        gend = np.append(gstart[1:], n) - 1
        length = m[gend] - s0[gstart]
        iv_user = u[gstart]
        uu, inv = np.unique(iv_user, return_inverse=True)
        return pd.DataFrame(
            {
                "user_id": uu,
                "n_intervals": np.bincount(inv).astype(np.int64),
                "coverage_us": np.bincount(inv, weights=length).astype(
                    np.int64
                ),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_INTERVAL_COVERAGE_USERS = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + 1800000000 AS e
  FROM events
),
o AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_max
  FROM iv
),
g AS (
  SELECT user_id, s, e,
         CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END
           AS brk
  FROM o
),
gg AS (
  SELECT user_id, s, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY s, e) AS grp
  FROM g
),
m AS (
  SELECT user_id, grp, min(s) AS s, max(e) AS e
  FROM gg GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_intervals,
       CAST(sum(e - s) AS BIGINT) AS coverage_us
FROM m GROUP BY user_id
"""


REGISTRY.update({'outliers_mad': (q_outliers_mad, SQL_OUTLIERS_MAD)})


REGISTRY.update({'chi_square_events': (q_chi_square_events, SQL_CHI_SQUARE_EVENTS)})


REGISTRY.update({'interval_coverage_users': (
            q_interval_coverage_users,
            SQL_INTERVAL_COVERAGE_USERS,
        )})


def q_hhi_events(sf_dir: str):
    """Per-event-type Herfindahl-Hirschman concentration index of
    user activity: HHI = sum over users of (share of the type's
    events)^2 — the standard "is this event type driven by a few
    power users?" diagnostic. Two pre-aggregated exchanges, both
    count-sized: (type, user) counts, then per-type sum of squares +
    total. Oracle = nested GROUP BY."""
    from ray.data.aggregate import Sum as _Sum

    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def pair_counts(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            b["event_type"].combine_chunks()
            if isinstance(b["event_type"], pa.ChunkedArray)
            else b["event_type"]
        )
        t = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, ui = np.unique(u, return_inverse=True)
        packed = t * len(uu) + ui
        upk, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "event_type": enc.dictionary.take(
                    pa.array(upk // len(uu), pa.int64())
                ),
                "user_id": pa.array(uu[upk % len(uu)], pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    def squares(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "sq": pa.array(n * n, pa.float64()),
                "tot": pa.array(n, pa.float64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        sq = b["sq"].to_numpy(zero_copy_only=False)
        tot = b["tot"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": b["event_type"],
                "n_users": pc.cast(b["n_users"], pa.int64()),
                "hhi": pa.array(np.round(sq / (tot * tot), 6), pa.float64()),
            }
        )

    return (
        ds.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(_Sum("n", alias_name="n"))
        .map_batches(squares, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            _Sum("sq", alias_name="sq"),
            _Sum("tot", alias_name="tot"),
            Count(alias_name="n_users"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


SQL_HHI_EVENTS = """
WITH c AS (
  SELECT event_type, user_id, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, count(*) AS n_users,
       round(sum(CAST(n AS DOUBLE) * n)
             / (sum(CAST(n AS DOUBLE)) * sum(CAST(n AS DOUBLE))),
             6) AS hhi
FROM c GROUP BY event_type
"""


REGISTRY.update({'hhi_events': (q_hhi_events, SQL_HHI_EVENTS)})


def q_burstiness_users(sf_dir: str):
    """Per-user inter-event-gap statistics: gap count, mean/population
    -std of the gap in seconds, and the Goh-Barabasi burstiness
    coefficient B = (sigma - mu) / (sigma + mu) (-1 = periodic, 0 =
    Poisson, ->1 = bursty). One user-bucketed exchange; inside each
    bucket the sweep is one mergesort + vectorized int64-microsecond
    diffs + bincount folds (gaps are diffed in integer microseconds
    FIRST, then divided — the float-second epoch values are too coarse
    at 2^53 to subtract). Users with a single event have no gap and
    emit nothing; all-zero-gap users are filtered on BOTH sides
    (sigma + mu > 0)."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = (
            g["ts"]
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        same = u[1:] == u[:-1]
        gaps = (t[1:] - t[:-1])[same].astype(np.float64) / 1e6
        gu = u[1:][same]
        if len(gu) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_gaps": pd.Series(dtype="int64"),
                    "mean_gap_s": pd.Series(dtype="float64"),
                    "std_gap_s": pd.Series(dtype="float64"),
                    "burstiness": pd.Series(dtype="float64"),
                }
            )
        uu, inv = np.unique(gu, return_inverse=True)
        n = np.bincount(inv)
        mu = np.bincount(inv, gaps) / n
        d = gaps - mu[inv]
        sig = np.sqrt(np.bincount(inv, d * d) / n)
        keep = (sig + mu) > 0
        b = (sig[keep] - mu[keep]) / (sig[keep] + mu[keep])
        return pd.DataFrame(
            {
                "user_id": uu[keep],
                "n_gaps": n[keep].astype(np.int64),
                "mean_gap_s": np.round(mu[keep], 4),
                "std_gap_s": np.round(sig[keep], 4),
                "burstiness": np.round(b, 6),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_BURSTINESS_USERS = """
WITH g AS (
  SELECT user_id,
         CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
           / 1000000.0 AS gap
  FROM events),
s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         avg(gap) AS mu, stddev_pop(gap) AS sigma
  FROM g WHERE gap IS NOT NULL GROUP BY user_id)
SELECT user_id, n_gaps,
       round(mu, 4) AS mean_gap_s,
       round(sigma, 4) AS std_gap_s,
       round((sigma - mu) / (sigma + mu), 6) AS burstiness
FROM s WHERE sigma + mu > 0
"""


REGISTRY.update({'burstiness_users': (q_burstiness_users, SQL_BURSTINESS_USERS)})


def q_decay_score_users(sf_dir: str):
    """Recency-weighted engagement: per user, sum of value *
    exp(-age / tau) with tau = 7 days, age measured from the corpus'
    global max timestamp — the standard feature-store decay score.
    Two passes: a scalar max-ts aggregate (one number to the driver),
    then user-bucketed partial folds (factorize + bincount inside each
    bucket; a user's rows share a bucket so partials are exact)."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "value"])
    tau_us = 7.0 * 86400.0 * 1e6

    mt = ds.max("ts")
    mt_us = np.datetime64(mt, "us").astype(np.int64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        w = g["value"].to_numpy(np.float64) * np.exp(
            (t - mt_us) / tau_us
        )
        code, users = pd.factorize(g["user_id"].to_numpy())
        score = np.bincount(code, w)
        n = np.bincount(code)
        return pd.DataFrame(
            {
                "user_id": users,
                "n_events": n.astype(np.int64),
                "decay_score": np.round(score, 6),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_DECAY_SCORE_USERS = """
WITH m AS (SELECT max(ts) AS mt FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value * exp(
         (epoch_us(ts) - epoch_us(m.mt)) / (7.0 * 86400 * 1000000))),
         6) AS decay_score
FROM events, m GROUP BY user_id
"""


REGISTRY.update({'decay_score_users': (q_decay_score_users, SQL_DECAY_SCORE_USERS)})


def q_ewma_users(sf_dir: str):
    """Per-user exponentially-weighted moving average of event values
    (alpha = 0.25, events ordered by ts then event_id) — the
    sequential streaming-feature shape (feature-store 'current EWMA'):
    e_1 = v_1, e_i = a*v_i + (1-a)*e_{i-1}; one row per user with the
    FINAL ewma and the event count. Users are bucketed by hash
    (the `_by_user_bucket` exchange), and within a bucket the
    recurrence closes in one vectorized weighted dot per user — the
    weight of v_i in e_n is a*(1-a)^(n-i) (and (1-a)^(n-1) for v_1),
    so old events underflow harmlessly instead of looping per row.
    Oracle = per-user recursive CTE on row_number."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    a = 0.25

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        v = g["value"].to_numpy(np.float64)
        change = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(u)))
        # position from the END of each user's run: n - i
        pos = np.arange(len(u), dtype=np.int64) - np.repeat(starts, lens)
        from_end = np.repeat(lens, lens) - 1 - pos
        w = a * np.power(1.0 - a, from_end.astype(np.float64))
        # v_1's weight is (1-a)^(n-1), not a*(1-a)^(n-1)
        first = np.repeat(starts, lens) == np.arange(len(u))
        w[first] = np.power(
            1.0 - a, (np.repeat(lens, lens) - 1)[first].astype(np.float64)
        )
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        ewma = np.zeros(len(starts), np.float64)
        np.add.at(ewma, seg, w * v)
        return pd.DataFrame(
            {
                "user_id": u[starts],
                "n_events": lens.astype(np.int64),
                "ewma": np.round(ewma, 6),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_EWMA_USERS = """
WITH RECURSIVE ev AS (
  SELECT user_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
n AS (SELECT user_id, max(rn) AS n_events FROM ev GROUP BY user_id),
r AS (
  SELECT user_id, rn, value AS e FROM ev WHERE rn = 1
  UNION ALL
  SELECT ev.user_id, ev.rn, 0.25 * ev.value + 0.75 * r.e
  FROM ev JOIN r ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
)
SELECT r.user_id, CAST(n.n_events AS BIGINT) AS n_events,
       round(r.e, 6) AS ewma
FROM r JOIN n ON n.user_id = r.user_id AND r.rn = n.n_events
"""


REGISTRY.update({'ewma_users': (q_ewma_users, SQL_EWMA_USERS)})


def q_global_rownum(sf_dir: str):
    """Distributed zipWithIndex: a contiguous global row number over
    events in (ts, event_id) order, without a single-task global
    sort. Phase 1: one pass of per-batch counts per ORDERED time
    bucket (6-hour windows — range buckets, so bucket order IS row
    order); the bounded bucket->count table folds to an exclusive
    prefix on the driver. Phase 2: per-bucket groups sort locally and
    add their broadcast base. A corpus with a hot window would split
    that window's bucket by sub-range — the documented partitioning
    assumption of every ordered-scan operator here (see
    stages/pack.py). Oracle = row_number() OVER (ORDER BY ts,
    event_id) - 1."""
    ds = _pq(sf_dir, "events", ["event_id", "ts"])
    W = 6 * 3600 * 1_000_000  # 6h in microseconds

    def add_wb(b: pa.Table) -> pa.Table:
        t = b["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "ts": b["ts"],
                "wb": pa.array(t // W, pa.int64()),
            }
        )

    wb_ds = ds.map_batches(add_wb, batch_format="pyarrow").materialize()

    def cnt_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b["wb"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"wb": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    cnt = (
        wb_ds.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("wb")
        .sum("c")
        .to_pandas()
        .sort_values("wb")
    )
    wbs = cnt["wb"].to_numpy(np.int64)
    base = np.r_[0, np.cumsum(cnt["sum(c)"].to_numpy(np.int64))[:-1]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        b0 = base[np.searchsorted(wbs, g["wb"].iloc[0])]
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "rn": b0 + np.arange(len(g), dtype=np.int64),
            }
        )

    return wb_ds.groupby("wb").map_groups(per_bucket, batch_format="pandas")


SQL_GLOBAL_ROWNUM = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT)
         AS rn
FROM events
"""


REGISTRY.update({'global_rownum': (q_global_rownum, SQL_GLOBAL_ROWNUM)})


def q_ab_test_events(sf_dir: str):
    """Two-proportion z-test between deterministic user cohorts
    (user_id % 2): did cohort A convert (>= 15 'purchase' events — a
    per-user intensity threshold that stays meaningful at every scale
    because per-user event counts are scale-invariant in this corpus)
    at a different rate than cohort B? The experiment-analysis
    primitive of an event pipeline. Per-batch per-user purchase-count
    partials shrink the exchange to one row per (batch, user); a
    user-keyed sum folds them; the 2-row cohort table finishes on the
    driver with the pooled z formula written EXACTLY as the oracle's
    SQL expression tree so the float64 ops match ulp-for-ulp."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])
    THRESH = 15

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        isp = (
            pc.equal(b["event_type"], "purchase")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        us, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "np": pa.array(
                    np.bincount(inv, weights=isp).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("np", alias_name="np"))
    )

    def cohort_partial(b: pa.Table) -> pa.Table:
        grp = (
            b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 2
        )
        conv = (
            b["np"].to_numpy(zero_copy_only=False).astype(np.int64)
            >= THRESH
        ).astype(np.int64)
        return pa.table(
            {
                "grp": pa.array([0, 1], pa.int64()),
                "n": pa.array(
                    [int((grp == 0).sum()), int((grp == 1).sum())],
                    pa.int64(),
                ),
                "k": pa.array(
                    [int(conv[grp == 0].sum()), int(conv[grp == 1].sum())],
                    pa.int64(),
                ),
            }
        )

    c = (
        per_user.map_batches(cohort_partial, batch_format="pyarrow")
        .groupby("grp")
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
        .to_pandas()
        .set_index("grp")
    )
    n_a, k_a = int(c.loc[0, "n"]), int(c.loc[0, "k"])
    n_b, k_b = int(c.loc[1, "n"]), int(c.loc[1, "k"])
    rate_a = k_a / float(n_a)
    rate_b = k_b / float(n_b)
    p = (k_a + k_b) / float(n_a + n_b)
    z = (rate_a - rate_b) / np.sqrt(
        p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b)
    )
    return pd.DataFrame(
        {
            "n_a": [n_a],
            "conv_a": [k_a],
            "rate_a": [round(rate_a, 6)],
            "n_b": [n_b],
            "conv_b": [k_b],
            "rate_b": [round(rate_b, 6)],
            "z": [round(float(z), 6)],
        }
    )


SQL_AB_TEST_EVENTS = """
WITH u AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) >= 15
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
c AS (
  SELECT user_id % 2 AS grp, count(*) AS n,
         CAST(sum(conv) AS BIGINT) AS k
  FROM u GROUP BY 1
),
w AS (
  SELECT max(CASE WHEN grp = 0 THEN n END) AS n_a,
         max(CASE WHEN grp = 0 THEN k END) AS conv_a,
         max(CASE WHEN grp = 1 THEN n END) AS n_b,
         max(CASE WHEN grp = 1 THEN k END) AS conv_b
  FROM c
)
SELECT n_a, conv_a, round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
       n_b, conv_b, round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
       round((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
             / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z
FROM w
"""


REGISTRY.update({'ab_test_events': (q_ab_test_events, SQL_AB_TEST_EVENTS)})


def q_anomaly_hours(sf_dir: str):
    """Hourly traffic anomaly detection: z-score of each hour's event
    count against the corpus-wide hourly mean/std (sample std), flag
    hours with |z| > 2 — the monitoring primitive of a streaming
    pipeline, run as a batch diagnostic. Per-batch hour-bucket count
    partials shrink the exchange; the hour table is bounded by the
    TIME SPAN, not the row count, so the driver finish is
    scale-safe. Both sides compare the ROUNDED z against the
    threshold, so boundary floats cannot diverge."""
    ds = _pq(sf_dir, "events", ["ts"])
    H = 3600 * 1_000_000

    def hour_partial(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        u, c = np.unique(t // H, return_counts=True)
        return pa.table(
            {"hb": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    h = (
        ds.map_batches(hour_partial, batch_format="pyarrow")
        .groupby("hb")
        .sum("c")
        .to_pandas()
    )
    n = h["sum(c)"].to_numpy(np.float64)
    m = n.mean()
    sd = np.sqrt(((n - m) ** 2).sum() / (len(n) - 1))
    z = np.round((n - m) / sd, 6)
    keep = np.abs(z) > 2
    return pd.DataFrame(
        {
            "hb": (h["hb"].to_numpy(np.int64)[keep] * H).astype(
                "datetime64[us]"
            ),
            "n": n[keep].astype(np.int64),
            "z": z[keep],
        }
    )


SQL_ANOMALY_HOURS = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hb, count(*) AS n
  FROM events GROUP BY 1
),
s AS (SELECT avg(n) AS m, stddev_samp(n) AS sd FROM h)
SELECT h.hb, h.n, round((h.n - s.m) / s.sd, 6) AS z
FROM h, s
WHERE abs(round((h.n - s.m) / s.sd, 6)) > 2
"""


REGISTRY.update({'anomaly_hours': (q_anomaly_hours, SQL_ANOMALY_HOURS)})


def q_burst_users(sf_dir: str):
    """Sliding-window rate detection (bot / abuse screening): each
    user's MAX event count in any 23-hour trailing window, exact
    RANGE-frame semantics (window [t-23h, t], ts peers included).
    Per-user work is fully vectorized inside coarse user-hash groups:
    rows sort by (user, ts), each user's timestamps are shifted into
    DISJOINT ranges separated by > the window span (prefix-sum of
    spans), after which ONE global searchsorted pair answers every
    per-user window query; per-user max via maximum.reduceat. No
    per-user Python loop, one exchange."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    W = 23 * 3600 * 1_000_000  # 23h in us
    GAP = W + 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((t, u))
        u, t = u[order], t[order]
        m = len(u)
        new = np.empty(m, dtype=bool)
        new[0] = True
        np.not_equal(u[1:], u[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        # per-user span -> disjoint offset so windows never cross users
        seg_id = np.cumsum(new) - 1
        seg_min = t[starts]
        rel = t - seg_min[seg_id]  # >= 0, sorted within segment
        spans = np.zeros(len(starts), dtype=np.int64)
        ends = np.r_[starts[1:], m] - 1
        spans = rel[ends]
        offs = np.r_[0, np.cumsum(spans[:-1] + GAP)]
        tt = rel + offs[seg_id]  # globally sorted, segments disjoint
        lo = np.searchsorted(tt, tt - W, side="left")
        hi = np.searchsorted(tt, tt, side="right")
        cnt = hi - lo
        mx = np.maximum.reduceat(cnt, starts)
        return pd.DataFrame(
            {"user_id": u[starts], "max_burst": mx.astype(np.int64)}
        )

    return _by_user_bucket(ds).map_groups(
        per_bucket, batch_format="pandas"
    )


SQL_BURST_USERS = """
WITH w AS (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 23 HOURS PRECEDING
                     AND CURRENT ROW) AS c
  FROM events
)
SELECT user_id, max(c) AS max_burst FROM w GROUP BY user_id
"""


REGISTRY.update({'burst_users': (q_burst_users, SQL_BURST_USERS)})


def q_top_paths_users(sf_dir: str):
    """Path mining: the global top-10 strict-adjacency event-type
    trigram paths (the generalization of sequence_triples' fixed
    funnel). Trigrams extract vectorized inside coarse user-hash
    groups; the path vocabulary is bounded (|types|^3), so only a
    tiny (path, count) table shuffles. Tie-break: count DESC, path
    ASC — identical in both engines."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        if len(u) < 3:
            return pd.DataFrame({"path": [], "n": []})
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        if not same.any():
            return pd.DataFrame({"path": [], "n": []})
        codes, uniq = pd.factorize(et)
        k = len(uniq)
        tri = (
            codes[:-2][same] * k * k
            + codes[1:-1][same] * k
            + codes[2:][same]
        )
        cnt = np.bincount(tri)
        nz = np.flatnonzero(cnt)
        path = [
            f"{uniq[c // (k * k)]}>{uniq[(c // k) % k]}>{uniq[c % k]}"
            for c in nz
        ]  # bounded: |types|^3 strings, not per-row work
        return pd.DataFrame({"path": path, "n": cnt[nz].astype(np.int64)})

    agg = (
        _by_user_bucket(ds)
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    agg = agg.sort_values(
        ["n", "path"], ascending=[False, True], kind="mergesort"
    ).head(10)
    return agg.reset_index(drop=True)


SQL_TOP_PATHS_USERS = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3,
         lead(user_id) OVER w AS u2,
         lead(user_id, 2) OVER w AS u3
  FROM events
  WINDOW w AS (ORDER BY user_id, ts, event_id)
)
SELECT event_type || '>' || e2 || '>' || e3 AS path,
       count(*) AS n
FROM s
WHERE user_id = u2 AND user_id = u3
GROUP BY 1
ORDER BY n DESC, path ASC
LIMIT 10
"""


REGISTRY.update({'top_paths_users': (q_top_paths_users, SQL_TOP_PATHS_USERS)})


def q_tail_latency_users(sf_dir: str):
    """Per-user p95 inter-event gap in seconds (the streaming-SLA /
    engagement-cadence metric): gaps derive from the ORDERED per-user
    event stream (ts, event_id), then an exact linear-interpolation
    quantile per user — the quantiles_group contract applied to a
    SEQUENTIALLY DERIVED column. Gap seconds are integer-microsecond
    differences divided by 1e6 once, so both engines interpolate
    identical doubles. Users with < 2 events have no gaps and are
    absent from both sides."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame(
                {"user_id": [], "n_gaps": [], "p95_gap_s": []}
            )
        gu = u[1:][same]
        gap = ((t[1:] - t[:-1])[same]) / 1e6
        starts = np.r_[0, np.flatnonzero(gu[1:] != gu[:-1]) + 1]
        lens = np.diff(np.append(starts, len(gu)))
        # vectorized per-user linear-interpolation quantile (numpy's
        # 'linear' formula applied across ALL users at once): gaps are
        # already grouped by user, sort within user, index the 95th
        # rank per segment — no per-user loop
        order = np.lexsort((gap, gu))
        gs = gap[order]
        h = (lens - 1) * 0.95
        f = np.floor(h).astype(np.int64)
        frac = h - f
        lo = gs[starts + f]
        hi = gs[starts + np.minimum(f + 1, lens - 1)]
        p95 = lo + frac * (hi - lo)
        # floor-quantize: microsecond-exact gaps interpolated at
        # frac=.25/.75 DO land on exact .00005 boundaries where the
        # two engines' round() half-rules diverge
        return pd.DataFrame(
            {
                "user_id": gu[starts],
                "n_gaps": lens.astype(np.int64),
                "p95_gap_s": np.floor(p95 * 1e4) / 1e4,
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_TAIL_LATENCY_USERS = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id),
                   ts) / 1000000.0 AS gap_s
  FROM events
)
SELECT user_id, count(gap_s) AS n_gaps,
       floor(quantile_cont(gap_s, 0.95) * 10000) / 10000 AS p95_gap_s
FROM g WHERE gap_s IS NOT NULL
GROUP BY user_id
"""


def q_cusum_users(sf_dir: str):
    """CUSUM drift detection per user (the sequential
    change-point-monitoring primitive): S_i = max(0, S_{i-1} +
    value_i - 60) over the (ts, event_id)-ordered stream; one row per
    user with max(S). The nonlinear recurrence closes WITHOUT a
    per-row loop via the prefix identity S_i = P_i - min(0,
    running_min(P_i)) (P = prefix sums of value - 60); per-user
    segment isolation uses a staircase offset (earlier segments
    shifted far ABOVE later ones so their minima never leak
    forward). Oracle = per-user recursive CTE of the literal
    recurrence — algebraically identical, float-different only at
    ~1e-13 against a 1e-6 rounding grid."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    K = 60.0

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        # EXACT integer cents: value has 2 decimals, so prefix sums,
        # staircase offsets and running minima are all int64 — zero
        # precision loss (a float staircase would erode P's low bits
        # once offsets dwarf the values)
        d = np.rint(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        ) - np.int64(K * 100)
        change = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(u)))
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        # per-segment prefix sums: global cumsum minus the cumsum just
        # before each segment start
        cs = np.cumsum(d)
        base = np.r_[np.int64(0), cs[starts[1:] - 1]]
        P = cs - base[seg]
        # staircase: earlier segments pushed far above later ones so a
        # running min never crosses a segment boundary (int64 bound:
        # n_segments * (sum|d| + 1) must fit — ~2^63 headroom)
        BIG = np.int64(np.abs(d).sum() + 1)
        stair = (np.int64(len(starts)) - seg) * BIG
        runmin = np.minimum.accumulate(P + stair) - stair
        S = P - np.minimum(np.int64(0), runmin)
        mx = np.maximum.reduceat(S, starts)
        return pd.DataFrame(
            {
                "user_id": u[starts],
                "n_events": lens.astype(np.int64),
                "max_cusum": np.round(mx / 100.0, 6),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_CUSUM_USERS = """
WITH RECURSIVE ev AS (
  SELECT user_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
n AS (SELECT user_id, max(rn) AS n_events FROM ev GROUP BY user_id),
r AS (
  SELECT user_id, rn, greatest(0, value - 60) AS s FROM ev WHERE rn = 1
  UNION ALL
  SELECT ev.user_id, ev.rn, greatest(0, r.s + ev.value - 60)
  FROM ev JOIN r ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
)
SELECT r.user_id, CAST(any_value(n.n_events) AS BIGINT) AS n_events,
       round(max(r.s), 6) AS max_cusum
FROM r JOIN n ON n.user_id = r.user_id
GROUP BY r.user_id
"""


REGISTRY.update({'tail_latency_users': (q_tail_latency_users, SQL_TAIL_LATENCY_USERS)})


REGISTRY.update({'cusum_users': (q_cusum_users, SQL_CUSUM_USERS)})


def q_target_encode_events(sf_dir: str):
    """Leave-one-out target encoding (the categorical-feature ML
    primitive): every event's type encoded as the mean event value of
    all OTHER events of the same type — (sum - self)/(n - 1). Group
    partials fold as integer cents (one grouped exchange over ~5
    keys), broadcast back over the scan; both engines divide the same
    two integers so the doubles agree to the last bit."""
    ds = _pq(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        et = b["event_type"]
        u = pc.unique(et)
        idx = pc.index_in(et, u).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": u,
                "n": pa.array(
                    np.bincount(idx, minlength=len(u)).astype(np.int64)
                ),
                "sc": pa.array(
                    np.bincount(idx, weights=cents, minlength=len(u)).astype(
                        np.int64
                    )
                ),
            }
        )

    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sc", alias_name="sc"))
        .to_pandas()
        .sort_values("event_type", kind="mergesort")
    )
    types = stats["event_type"].tolist()
    n_of = dict(zip(types, stats["n"].to_numpy(np.int64)))
    sc_of = dict(zip(types, stats["sc"].to_numpy(np.int64)))
    import ray

    ref = ray.put((n_of, sc_of))

    from ..state.broadcast import get_broadcast

    class Encode:
        def __init__(self, model_ref) -> None:
            self.n_of, self.sc_of = get_broadcast(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            et = b["event_type"]
            u = pc.unique(et)
            idx = pc.index_in(et, u).to_numpy(zero_copy_only=False)
            n = np.array([self.n_of[t.as_py()] for t in u], np.int64)[idx]
            sc = np.array([self.sc_of[t.as_py()] for t in u], np.int64)[idx]
            cents = np.rint(
                b["value"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            loo = (sc - cents) / (n - 1) / 100.0
            # floor-quantize: LOO means hit exact .0000005 boundaries
            # (denominators like n-1=1600 give terminating binary
            # fractions) where round() half-rules diverge
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "event_type": et,
                    "loo_enc": pa.array(
                        np.floor(loo * 1e6) / 1e6, pa.float64()
                    ),
                }
            )

    return ds.map_batches(
        Encode,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


SQL_TARGET_ENCODE_EVENTS = """
WITH s AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(round(value * 100.0) AS BIGINT)) AS sc
  FROM events GROUP BY 1)
SELECT event_id, e.event_type,
       floor((s.sc - CAST(round(e.value * 100.0) AS BIGINT))
             / (s.n - 1) / 100.0 * 1000000.0) / 1000000.0 AS loo_enc
FROM events e JOIN s ON e.event_type = s.event_type
"""


def q_rolling_median_users(sf_dir: str):
    """Exact rolling median per user (ROWS 4 PRECEDING .. CURRENT over
    the (ts, event_id)-ordered stream): windows materialize as a
    (n, 5) shifted-column matrix with int64-max sentinels past segment
    starts, one vectorized row sort, and the two middle ranks picked
    per actual window width — no per-row loop, no per-user loop.
    Arithmetic stays integer cents until ONE division identical to the
    oracle's, so both engines round the same double."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    W = 5
    SENT = np.int64(2**62)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        )
        n = len(u)
        change = np.r_[True, u[1:] != u[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(change, np.arange(n), -1)
        )
        offset = np.arange(n) - seg_start  # position within user
        win = np.full((n, W), SENT, np.int64)
        for d in range(W):
            valid = offset >= d
            win[valid, d] = cents[np.flatnonzero(valid) - d]
        win.sort(axis=1)
        w = np.minimum(offset + 1, W)
        rows = np.arange(n)
        a = win[rows, (w - 1) // 2]
        b = win[rows, w // 2]
        med = (a + b) / 2.0 / 100.0
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": u,
                "roll_med": np.round(med, 4),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_ROLLING_MEDIAN_USERS = """
SELECT event_id, user_id,
       round(median(CAST(round(value * 100.0) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             / 100.0, 4) AS roll_med
FROM events
"""


REGISTRY.update({'target_encode_events': (
            q_target_encode_events,
            SQL_TARGET_ENCODE_EVENTS,
        )})


REGISTRY.update({'rolling_median_users': (
            q_rolling_median_users,
            SQL_ROLLING_MEDIAN_USERS,
        )})


def q_distinct_users_daily(sf_dir: str):
    """Exact grouped COUNT(DISTINCT) — daily active users per event
    type. The classic two-phase distinct: batches pre-dedup their
    (type, day, user) triples so the ONE exchange carries only unique
    observations per block, then the grouped finalizer counts unique
    users per (type, day) with a vectorized diff over the sorted
    column — the exact-distinct sibling of approx_distinct_users'
    HLL."""
    ds = _pq(sf_dir, "events", ["event_type", "ts", "user_id"])
    DAY = np.int64(86_400_000_000)

    def triple(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        out = pa.table(
            {
                "event_type": b["event_type"],
                "day_us": pa.array((t // DAY) * DAY, pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
            }
        )
        # in-batch dedup cuts the exchange to unique triples per block
        return out.group_by(
            ["event_type", "day_us", "user_id"]
        ).aggregate([])

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        u = np.sort(g["user_id"].to_numpy(np.int64))
        n = 1 + int((u[1:] != u[:-1]).sum()) if len(u) else 0
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "day": pd.to_datetime(
                    [g["day_us"].iloc[0]], unit="us"
                ).strftime("%Y-%m-%d"),
                "n_users": [n],
            }
        )

    return (
        ds.map_batches(triple, batch_format="pyarrow")
        .groupby(["event_type", "day_us"])
        .map_groups(finalize, batch_format="pandas")
    )


SQL_DISTINCT_USERS_DAILY = """
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def q_event_concat_users(sf_dir: str):
    """Ordered string aggregation — each user's first-20-event type
    path as ONE comma-joined string (the session-trace export shape).
    Per bucket: one mergesort, per-user offsets clipped to 20, an
    Arrow ListArray built directly on those offsets, and
    pc.binary_join — the string reduction never drops to a Python
    per-user loop."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    CAP = 20

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        lens = np.diff(np.append(starts, len(u)))
        take = np.minimum(lens, CAP)
        # gather the first-CAP row indices per user without a loop
        idx = np.repeat(starts, take) + (
            np.arange(take.sum()) - np.repeat(np.cumsum(take) - take, take)
        )
        vals = pa.array(
            g["event_type"].to_numpy()[idx].astype(object), pa.string()
        )
        offsets = pa.array(
            np.r_[0, np.cumsum(take)].astype(np.int32), pa.int32()
        )
        lists = pa.ListArray.from_arrays(offsets, vals)
        path = pc.binary_join(lists, ",")
        return pd.DataFrame(
            {
                "user_id": u[starts],
                "n_events": lens.astype(np.int64),
                "path": path.to_pandas(),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_EVENT_CONCAT_USERS = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events)
SELECT user_id, any_value(n_events) AS n_events,
       string_agg(event_type, ',' ORDER BY rn) AS path
FROM r WHERE rn <= 20 GROUP BY user_id
"""


def q_fill_forward_users(sf_dir: str):
    """Time-series gap fill (the resample / state-at-boundary shape):
    each user's value forward-filled onto an hourly grid from their
    first full hour boundary to their last. Per bucket the grids of
    ALL users flatten into one array (repeat + cumsum, no per-user
    loop) and ONE staircase-offset searchsorted maps every grid point
    to its user's latest event at-or-before it — the distributed
    as-of-join kernel reused for resampling. Carried value stays
    integer cents until the final /100."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    HOUR = np.int64(3_600_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        )
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        ends = np.append(starts[1:], len(u)) - 1
        h0 = (t[starts] // HOUR + 1) * HOUR  # first boundary >= min ts
        h1 = (t[ends] // HOUR) * HOUR  # last boundary <= max ts
        n = np.maximum((h1 - h0) // HOUR + 1, 0).astype(np.int64)
        if int(n.sum()) == 0:
            return pd.DataFrame(
                {"user_id": [], "hour": [], "value": []}
            )
        seg = np.repeat(np.arange(len(starts)), n)
        local = np.arange(int(n.sum())) - np.repeat(
            np.cumsum(n) - n, n
        )
        grid = h0[seg] + local * HOUR
        # staircase offsets isolate users inside ONE searchsorted
        span = np.int64(t.max() - t.min() + 2) + HOUR
        uid_rank = np.cumsum(np.r_[False, u[1:] != u[:-1]])
        key_ev = t - t.min() + uid_rank * span
        key_gr = grid - t.min() + seg * span
        idx = np.searchsorted(key_ev, key_gr, side="right") - 1
        return pd.DataFrame(
            {
                "user_id": u[starts][seg],
                "hour": pd.to_datetime(grid, unit="us").strftime(
                    "%Y-%m-%d %H:00"
                ),
                "value": np.round(cents[idx] / 100.0, 2),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_FILL_FORWARD_USERS = """
WITH b AS (
  SELECT user_id,
         date_trunc('hour', min(ts)) + INTERVAL 1 HOUR AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM b WHERE h0 <= h1),
r AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT g.user_id, strftime(g.h, '%Y-%m-%d %H:00') AS hour,
       round(max_by(CAST(round(r.value * 100.0) AS BIGINT), r.rn)
             / 100.0, 2) AS value
FROM grid g JOIN r ON r.user_id = g.user_id AND r.ts <= g.h
GROUP BY g.user_id, g.h
"""


REGISTRY.update({'distinct_users_daily': (
            q_distinct_users_daily,
            SQL_DISTINCT_USERS_DAILY,
        )})


REGISTRY.update({'event_concat_users': (q_event_concat_users, SQL_EVENT_CONCAT_USERS)})


REGISTRY.update({'fill_forward_users': (q_fill_forward_users, SQL_FILL_FORWARD_USERS)})


def q_twap_users(sf_dir: str):
    """Time-weighted average value per user (the TWAP / state-integral
    metric): each value weighted by how long it was the user's latest
    observation. Per bucket ONE mergesort gives the ordered stream;
    the integral folds as int64 cents x microsecond products (bounded
    by max-cents x total-span, no overflow), and the single division
    happens on identical integers in both engines. Single-event users
    have no holding period and are absent from both sides."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        )
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame({"user_id": [], "twap": []})
        gu = u[:-1][same]
        dt = (t[1:] - t[:-1])[same]
        wv = cents[:-1][same] * dt
        starts = np.r_[0, np.flatnonzero(gu[1:] != gu[:-1]) + 1]
        num = np.add.reduceat(wv, starts)
        den = np.add.reduceat(dt, starts)
        twap = num / den / 100.0
        return pd.DataFrame(
            {
                "user_id": gu[starts],
                "twap": np.floor(twap * 1e6) / 1e6,
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_TWAP_USERS = """
WITH g AS (
  SELECT user_id,
         CAST(round(value * 100.0) AS BIGINT) AS cents,
         date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) AS dt
  FROM events)
SELECT user_id,
       floor(sum(cents * dt) / sum(dt) / 100.0 * 1000000.0)
         / 1000000.0 AS twap
FROM g WHERE dt IS NOT NULL GROUP BY user_id
"""


def q_time_to_convert(sf_dir: str):
    """Conversion latency (the funnel-timing metric): per user, the
    seconds from their FIRST signup to their first purchase at or
    after it. One ordered pass per bucket; both timestamps stay int64
    micros and the /1e6 happens on identical operands. Users without
    a signup, or without a purchase after it, are absent from both
    sides."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        seg = np.cumsum(np.r_[False, u[1:] != u[:-1]])
        BIG = np.int64(2**62)
        # first signup per user: min over masked staircase
        ts_sig = np.where(et == "signup", t, BIG)
        t0 = np.minimum.reduceat(ts_sig, starts)
        # first purchase at/after the signup
        ts_pur = np.where(
            (et == "purchase") & (t >= t0[seg]), t, BIG
        )
        t1 = np.minimum.reduceat(ts_pur, starts)
        ok = (t0 < BIG) & (t1 < BIG)
        return pd.DataFrame(
            {
                "user_id": u[starts][ok],
                "convert_s": (t1[ok] - t0[ok]) / 1e6,
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_TIME_TO_CONVERT = """
WITH s AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY 1),
p AS (
  SELECT e.user_id, min(e.ts) AS t1
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.t0
  GROUP BY 1)
SELECT s.user_id,
       date_diff('microsecond', s.t0, p.t1) / 1000000.0 AS convert_s
FROM s JOIN p ON s.user_id = p.user_id
"""


REGISTRY.update({'twap_users': (q_twap_users, SQL_TWAP_USERS)})


REGISTRY.update({'time_to_convert': (q_time_to_convert, SQL_TIME_TO_CONVERT)})


def q_bounce_rate_users(sf_dir: str):
    """Sessionized bounce rate per user (the engagement-quality
    metric): sessions split on > 30 min inactivity gaps, a bounce is
    a single-event session. Session boundaries derive from ONE
    ordered pass per bucket (gap mask + cumsum — the session_window
    kernel re-used for a per-user ratio); bounce_rate divides the two
    integers identically in both engines."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])
    GAP = np.int64(30 * 60 * 1_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        new_sess = np.r_[
            True, (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > GAP)
        ]
        sess = np.cumsum(new_sess) - 1
        sess_len = np.bincount(sess)
        sess_user = u[np.flatnonzero(new_sess)]
        order = np.argsort(sess_user, kind="stable")
        su = sess_user[order]
        sl = sess_len[order]
        starts = np.r_[0, np.flatnonzero(su[1:] != su[:-1]) + 1]
        n_sessions = np.diff(np.append(starts, len(su)))
        bounces = np.add.reduceat((sl == 1).astype(np.int64), starts)
        return pd.DataFrame(
            {
                "user_id": su[starts],
                "n_sessions": n_sessions.astype(np.int64),
                "bounces": bounces,
                # floor-quantize: session ratios like 1/64 terminate
                # with a trailing 5 at the 6th decimal
                "bounce_rate": np.floor(bounces / n_sessions * 1e6)
                / 1e6,
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_BOUNCE_RATE_USERS = """
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN date_diff('microsecond',
                             lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                             ts) > 1800000000
                   OR lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM m),
agg AS (
  SELECT user_id, sess_id, count(*) AS len
  FROM s GROUP BY user_id, sess_id)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS bounces,
       floor(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 1000000.0) / 1000000.0
         AS bounce_rate
FROM agg GROUP BY user_id
"""


def q_attribution_last_touch(sf_dir: str):
    """Last-touch attribution (the marketing-analytics as-of shape):
    every purchase credited to the user's most recent PRIOR
    click-or-view. Per bucket: one mergesort, then a staircase-offset
    searchsorted maps each purchase to the latest earlier touch — the
    as-of kernel with a side filter, no per-user loop. Ties at equal
    ts resolve to the larger event_id (the sort order's last row),
    matching the oracle's max_by over (ts, rn). Purchases with no
    prior touch are absent from both sides."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        eid = g["event_id"].to_numpy(np.int64)
        uid_rank = np.cumsum(np.r_[False, u[1:] != u[:-1]])
        span = np.int64(t.max() - t.min() + 2)
        key = (t - t.min()) + uid_rank * span
        touch = (et == "click") | (et == "view")
        buy = et == "purchase"
        tk = key[touch]
        # strictly earlier: searchsorted left on (key) of purchases
        pos = np.searchsorted(tk, key[buy], side="left") - 1
        ok = pos >= 0
        # the candidate must belong to the same user segment
        same = np.zeros(ok.sum(), bool)
        cand = pos[ok]
        same = uid_rank[np.flatnonzero(touch)][cand] == uid_rank[buy][ok]
        rows = np.flatnonzero(buy)[ok][same]
        src = np.flatnonzero(touch)[cand[same]]
        return pd.DataFrame(
            {
                "purchase_id": eid[rows],
                "user_id": u[rows],
                "touch_id": eid[src],
                "touch_type": et[src],
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_ATTRIBUTION_LAST_TOUCH = """
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         row_number() OVER (ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type IN ('click', 'view')),
p AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = 'purchase')
SELECT p.event_id AS purchase_id, p.user_id,
       max_by(t.event_id, t.rn) AS touch_id,
       max_by(t.event_type, t.rn) AS touch_type
FROM p JOIN t ON t.user_id = p.user_id AND t.ts < p.ts
GROUP BY p.event_id, p.user_id
"""


REGISTRY.update({'bounce_rate_users': (q_bounce_rate_users, SQL_BOUNCE_RATE_USERS)})


REGISTRY.update({'attribution_last_touch': (
            q_attribution_last_touch,
            SQL_ATTRIBUTION_LAST_TOUCH,
        )})


def q_rfm_segments(sf_dir: str):
    """RFM segmentation (the classic user-value composite): per user
    Recency (last event), Frequency (event count), Monetary (value
    sum), each scored NTILE(4) under a deterministic
    (metric DESC, user_id) total order, composed as 100r+10f+m.
    The metric table derives from ONE grouped integer fold (per-batch
    partials: last-ts max, count, cent sum); the NTILE step runs on
    that USER-BOUNDED table driver-side — the documented gate; at a
    user population beyond driver reach the rank step is
    rank_global_orders' value-bucket machinery per metric (3 bucketed
    exchanges + joins), which this query deliberately avoids at bench
    scale. Integer metrics end to end: ties and tiles are exact."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "value"])
    from ray.data.aggregate import Max

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        last = np.full(len(uu), np.int64(-(2**62)))
        np.maximum.at(last, inv, t)
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "last_ts": pa.array(last, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "sc": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("last_ts", alias_name="last_ts"),
            Sum("n", alias_name="n"),
            Sum("sc", alias_name="sc"),
        )
        .to_pandas()  # user-bounded (see docstring gate)
    )
    uid = agg["user_id"].to_numpy(np.int64)
    N = len(uid)

    def ntile4(metric: np.ndarray) -> np.ndarray:
        # rank under (metric DESC, user_id ASC), then NTILE(4)
        order = np.lexsort((uid, -metric))
        rank = np.empty(N, np.int64)
        rank[order] = np.arange(N)
        q, r = divmod(N, 4)
        if q == 0:
            return rank + 1
        split = (q + 1) * r
        return (
            np.where(rank < split, rank // (q + 1), r + (rank - split) // q)
            + 1
        )

    r = ntile4(agg["last_ts"].to_numpy(np.int64))
    f = ntile4(agg["n"].to_numpy(np.int64))
    m = ntile4(agg["sc"].to_numpy(np.int64))
    return pd.DataFrame(
        {
            "user_id": uid,
            "r_score": r,
            "f_score": f,
            "m_score": m,
            "rfm": 100 * r + 10 * f + m,
        }
    )


SQL_RFM_SEGMENTS = """
WITH u AS (
  SELECT user_id, max(ts) AS last_ts, count(*) AS n,
         sum(CAST(round(value * 100.0) AS BIGINT)) AS sc
  FROM events GROUP BY 1),
s AS (
  SELECT user_id,
         CAST(ntile(4) OVER (ORDER BY last_ts DESC, user_id) AS BIGINT)
           AS r_score,
         CAST(ntile(4) OVER (ORDER BY n DESC, user_id) AS BIGINT)
           AS f_score,
         CAST(ntile(4) OVER (ORDER BY sc DESC, user_id) AS BIGINT)
           AS m_score
  FROM u)
SELECT user_id, r_score, f_score, m_score,
       100 * r_score + 10 * f_score + m_score AS rfm
FROM s
"""


REGISTRY.update({'rfm_segments': (q_rfm_segments, SQL_RFM_SEGMENTS)})


# ----------------------------------------- mode / SCD2 / seasonal baseline


def q_mode_event_users(sf_dir: str):
    """Grouped MODE with deterministic tie-break (the categorical
    summary-statistic shape): each user's most frequent event type,
    ties resolved to the lexicographically smallest type. Two-phase
    counts (in-batch (user, type) tallies, ONE grouped sum) so the
    exchange carries count partials, never raw events; the per-user
    argmax runs in a user-bounded map_groups finalizer."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["user_id", "event_type"]).aggregate(
            [("user_id", "count")]
        ).rename_columns(["user_id", "event_type", "cnt"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("cnt", alias_name="n"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["n", "event_type"], ascending=[False, True], kind="mergesort"
        )
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "mode_type": [g["event_type"].iloc[0]],
                "n": [int(g["n"].iloc[0])],
            }
        )

    return counts.groupby("user_id").map_groups(pick, batch_format="pandas")


SQL_MODE_EVENT_USERS = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT user_id, event_type AS mode_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c)
SELECT user_id, mode_type, n FROM r WHERE rn = 1
"""


def q_scd2_users(sf_dir: str):
    """Slowly-changing-dimension (type-2) interval build — the
    temporal-table construction shape: each user's event-type stream
    collapses into validity intervals [valid_from, valid_to) at every
    type CHANGE, the open interval marked with an empty valid_to.
    Per-user groups are user-bounded; inside each group the change
    mask, interval starts and leads are pure numpy over the
    (ts, event_id)-ordered stream — the deterministic total order
    both sides share."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["event_id"].to_numpy(np.int64), g["ts"].to_numpy().astype("datetime64[us]"))
        )
        ts = g["ts"].to_numpy().astype("datetime64[us]")[order]
        typ = g["event_type"].to_numpy()[order]
        start = np.ones(len(typ), bool)
        start[1:] = typ[1:] != typ[:-1]
        s_ts = ts[start]
        s_typ = typ[start]
        vfrom = pd.Series(s_ts).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        vto = np.roll(vfrom.to_numpy(), -1)
        vto[-1] = ""
        return pd.DataFrame(
            {
                "user_id": np.full(len(s_ts), int(g["user_id"].iloc[0])),
                "event_type": s_typ,
                "valid_from": vfrom.to_numpy(),
                "valid_to": vto,
            }
        )

    return ds.groupby("user_id").map_groups(intervals, batch_format="pandas")


SQL_SCD2_USERS = """
WITH o AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER w AS prev_type
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type, ts
  FROM o WHERE prev_type IS NULL OR event_type <> prev_type),
iv AS (
  SELECT user_id, event_type,
         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
         coalesce(strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts),
                           '%Y-%m-%d %H:%M:%S.%f'), '') AS valid_to
  FROM s)
SELECT * FROM iv
"""


def q_seasonal_mae_events(sf_dir: str):
    """Seasonal-naive forecast evaluation (the time-series baseline
    shape): predict each hour's event count by the count 24 h
    earlier and report, per event type, the number of scoreable hours
    and the integer sum of absolute errors. Hourly counts fold as
    in-batch partials through ONE grouped sum; the lag-24h match is a
    vectorized searchsorted inside a per-type finalizer whose group
    is bounded by the DISTINCT-HOUR count (time-range/3600), not the
    row count — hours stay small even at 100 TB. Output is all-int,
    so the hash compare is exact; MAE = sum_abs_err / n_hours is
    derivable."""
    ds = _pq(sf_dir, "events", ["event_type", "ts"])
    HOUR = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        hr = (t // HOUR) * HOUR
        tb = pa.table({"event_type": b["event_type"], "hour_us": pa.array(hr)})
        return tb.group_by(["event_type", "hour_us"]).aggregate(
            [("hour_us", "count")]
        ).rename_columns(["event_type", "hour_us", "cnt"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour_us"])
        .aggregate(Sum("cnt", alias_name="n"))
    )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        h = g["hour_us"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        order = np.argsort(h, kind="stable")
        h, n = h[order], n[order]
        base = h - np.int64(24) * HOUR
        pos = np.searchsorted(h, base)
        ok = (pos < len(h)) & (h[np.minimum(pos, len(h) - 1)] == base)
        err = np.abs(n[ok] - n[pos[ok]])
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_hours": [int(ok.sum())],
                "sum_abs_err": [int(err.sum())],
            }
        )

    return counts.groupby("event_type").map_groups(
        score, batch_format="pandas"
    )


SQL_SEASONAL_MAE_EVENTS = """
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT a.event_type, count(*) AS n_hours,
       CAST(sum(abs(a.n - b.n)) AS BIGINT) AS sum_abs_err
FROM c a JOIN c b
  ON b.event_type = a.event_type AND a.h = b.h + INTERVAL 24 HOUR
GROUP BY 1
"""


REGISTRY.update({'mode_event_users': (q_mode_event_users, SQL_MODE_EVENT_USERS)})


REGISTRY.update({'scd2_users': (q_scd2_users, SQL_SCD2_USERS)})


REGISTRY.update({'seasonal_mae_events': (
            q_seasonal_mae_events,
            SQL_SEASONAL_MAE_EVENTS,
        )})


def q_abandoned_clicks(sf_dir: str):
    """Abandonment funnel (the conversion-window NOT-EXISTS shape):
    per calendar day, how many clicks had NO purchase by the same
    user within the following hour. Per-user groups sort once; the
    window probe is TWO searchsorted calls over the user's purchase
    timestamps (no per-click loop); per-group (day, n, n_abandoned)
    partials fold through ONE grouped sum."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])
    HOUR = np.int64(3_600_000_000)
    DAY = np.int64(86_400_000_000)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        typ = g["event_type"].to_numpy()
        ct = np.sort(t[typ == "click"])
        pt = np.sort(t[typ == "purchase"])
        if len(ct) == 0:
            return pd.DataFrame(
                {"day_us": [], "n": [], "nab": []}
            ).astype(np.int64)
        lo = np.searchsorted(pt, ct, side="right")
        hi = np.searchsorted(pt, ct + HOUR, side="right")
        ab = (hi == lo).astype(np.int64)
        day = (ct // DAY) * DAY
        u, inv = np.unique(day, return_inverse=True)
        return pd.DataFrame(
            {
                "day_us": u,
                "n": np.bincount(inv).astype(np.int64),
                "nab": np.bincount(inv, weights=ab).astype(np.int64),
            }
        )

    agg = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("day_us")
        .aggregate(
            Sum("n", alias_name="n_clicks"),
            Sum("nab", alias_name="n_abandoned"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        d = pd.to_datetime(
            b["day_us"].to_numpy(zero_copy_only=False), unit="us"
        ).strftime("%Y-%m-%d")
        return pa.table(
            {
                "day": pa.array(d, pa.string()),
                "n_clicks": pc.cast(b["n_clicks"], pa.int64()),
                "n_abandoned": pc.cast(b["n_abandoned"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_ABANDONED_CLICKS = """
WITH cl AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
pu AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
SELECT strftime(date_trunc('day', cl.ts), '%Y-%m-%d') AS day,
       count(*) AS n_clicks,
       CAST(count(*) FILTER (NOT EXISTS (
           SELECT 1 FROM pu
           WHERE pu.user_id = cl.user_id
             AND pu.ts > cl.ts
             AND pu.ts <= cl.ts + INTERVAL 1 HOUR)) AS BIGINT)
         AS n_abandoned
FROM cl GROUP BY 1
"""


REGISTRY.update({'abandoned_clicks': (q_abandoned_clicks, SQL_ABANDONED_CLICKS)})


def q_cohort_ltv_users(sf_dir: str):
    """Cohort lifetime-value rollup (the classic LTV matrix): users
    cohorted by the DAY-BUCKET (10-day bin) of their first event;
    purchase value accumulates per (cohort, age-in-buckets). First-ts
    folds as ONE grouped min of integer microseconds; the cohort
    lookup broadcasts as sorted arrays under a budget with the
    hash-join fallback (user-bounded state); cents sum exactly."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type", "value"])
    BIN = np.int64(10 * 86_400_000_000)
    from ray.data.aggregate import Min

    def us_cols(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t_us": pa.array(t, pa.int64()),
                "event_type": b["event_type"],
                "value": b["value"],
            }
        )

    base = ds.map_batches(us_cols, batch_format="pyarrow").materialize()
    firsts = (
        base.groupby("user_id")
        .aggregate(Min("t_us", alias_name="first_us"))
        .to_pandas()  # user-bounded (documented gate; see rfm_segments)
    )
    uid = firsts["user_id"].to_numpy(np.int64)
    order = np.argsort(uid, kind="stable")
    uid_s = uid[order]
    cohort_s = (firsts["first_us"].to_numpy(np.int64)[order] // BIN)

    import ray

    from ..state.broadcast import get_broadcast

    ref = ray.put((uid_s, cohort_s))

    def per_batch(b: pa.Table, _ref=ref) -> pa.Table:
        uid_, coh_ = get_broadcast(_ref)
        m = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        )
        u = b["user_id"].to_numpy(zero_copy_only=False)[m]
        t = b["t_us"].to_numpy(zero_copy_only=False)[m]
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        pos = np.searchsorted(uid_, u)
        coh = coh_[pos]
        age = t // BIN - coh
        key = np.stack([coh, age], axis=1)
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        return pa.table(
            {
                "cohort": pa.array(uk[:, 0], pa.int64()),
                "age": pa.array(uk[:, 1], pa.int64()),
                "cents": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
                "n_purch": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    return (
        base.map_batches(per_batch, batch_format="pyarrow")
        .groupby(["cohort", "age"])
        .aggregate(
            Sum("cents", alias_name="cents"),
            Sum("n_purch", alias_name="n_purch"),
        )
    )


SQL_COHORT_LTV_USERS = """
WITH f AS (
  SELECT user_id,
         CAST(floor(epoch_us(min(ts)) / 864000000000) AS BIGINT)
           AS cohort
  FROM events GROUP BY 1),
p AS (
  SELECT e.user_id, f.cohort,
         CAST(floor(epoch_us(e.ts) / 864000000000) AS BIGINT)
           - f.cohort AS age,
         CAST(round(e.value * 100.0) AS BIGINT) AS cents
  FROM events e JOIN f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase')
SELECT cohort, age, CAST(sum(cents) AS BIGINT) AS cents,
       count(*) AS n_purch
FROM p GROUP BY 1, 2
"""


def q_churn_weekly_users(sf_dir: str):
    """Weekly churn / retention transitions: for every week w, how
    many users were active in w, how many of those returned in w+1,
    and how many churned. Distinct (user, week) pairs dedup in batch
    before ONE exchange; the per-user week set is tiny, so the
    retained/churned flags are a vectorized diff over each user's
    sorted weeks inside a user-keyed finalizer, and the final grouped
    sum is week-bounded."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    WEEK = np.int64(7 * 86_400_000_000)

    def pairs(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.stack([u, t // WEEK], axis=1)
        uk = np.unique(key, axis=0)
        return pa.table(
            {
                "user_id": pa.array(uk[:, 0], pa.int64()),
                "week": pa.array(uk[:, 1], pa.int64()),
            }
        )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        w = np.unique(g["week"].to_numpy(np.int64))
        nxt = np.zeros(len(w), np.int64)
        pos = np.searchsorted(w, w + 1)
        ok = (pos < len(w)) & (w[np.minimum(pos, len(w) - 1)] == w + 1)
        nxt[ok] = 1
        return pd.DataFrame(
            {"week": w, "n_active": 1, "n_retained": nxt}
        )

    agg = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("week")
        .aggregate(
            Sum("n_active", alias_name="n_active"),
            Sum("n_retained", alias_name="n_retained"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        a = b["n_active"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = b["n_retained"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "week": pc.cast(b["week"], pa.int64()),
                "n_active": pa.array(a, pa.int64()),
                "n_retained": pa.array(r, pa.int64()),
                "n_churned": pa.array(a - r, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_CHURN_WEEKLY_USERS = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS week
  FROM events)
SELECT a.week, count(*) AS n_active,
       CAST(count(b.user_id) AS BIGINT) AS n_retained,
       CAST(count(*) - count(b.user_id) AS BIGINT) AS n_churned
FROM uw a LEFT JOIN uw b
  ON b.user_id = a.user_id AND b.week = a.week + 1
GROUP BY 1
"""


REGISTRY.update({'cohort_ltv_users': (q_cohort_ltv_users, SQL_COHORT_LTV_USERS)})


REGISTRY.update({'churn_weekly_users': (
            q_churn_weekly_users,
            SQL_CHURN_WEEKLY_USERS,
        )})


# ------------------------------------ telemetry dedup / rolling distinct


def q_dedup_events_window(sf_dir: str):
    """Telemetry near-duplicate suppression (the at-least-once
    ingestion cleanup): an event is a duplicate when the PREVIOUS
    event of the same (user, type) lies strictly less than 5 s
    earlier (lag semantics — deterministic, unlike chained
    suppression). Per-user groups lexsort once by (type, ts,
    event_id); the lag test is one vectorized diff. Output: kept-row
    counts per event type (kept = first in its burst under lag
    semantics)."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    FIVE_S = np.int64(5_000_000)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        typ = g["event_type"].to_numpy()
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, t, typ))
        st, styp = t[order], typ[order]
        same = np.zeros(len(st), bool)
        same[1:] = styp[1:] == styp[:-1]
        dup = same & (np.diff(st, prepend=st[:1]) < FIVE_S)
        keep_typ = styp[~dup]
        u, cnt = np.unique(keep_typ, return_counts=True)
        return pd.DataFrame({"event_type": u, "n": cnt.astype(np.int64)})

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_kept"))
    )


SQL_DEDUP_EVENTS_WINDOW = """
WITH l AS (
  SELECT event_type,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts,
         ts
  FROM events)
SELECT event_type, count(*) AS n_kept
FROM l
WHERE prev_ts IS NULL OR ts - prev_ts >= INTERVAL 5 SECOND
GROUP BY 1
"""


def q_wau_users(sf_dir: str):
    """Rolling distinct users (the DAU/WAU engagement shape): for
    every calendar day with events, the count of users active that
    day (DAU) and in the trailing 7 days (WAU). Naive rolling
    COUNT(DISTINCT) re-counts every user x day; instead each user's
    active-day set becomes merged coverage INTERVALS (gap <= 6 days
    fuses), which emit +1/-1 diff rows — the exchange carries
    interval endpoints, not user-day pairs, and the finisher is one
    day-bounded cumulative sum. DAU rides the same exchange as
    per-day distinct partials."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    DAY = np.int64(86_400_000_000)

    def pairs(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.stack([u, t // DAY], axis=1)
        uk = np.unique(key, axis=0)
        return pa.table(
            {
                "user_id": pa.array(uk[:, 0], pa.int64()),
                "day": pa.array(uk[:, 1], pa.int64()),
            }
        )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["day"].to_numpy(np.int64))
        # merge [d, d+6] windows: a gap > 6 starts a new interval
        brk = np.ones(len(d), bool)
        brk[1:] = np.diff(d) > 6
        starts = d[brk]
        ends = np.append(d[np.flatnonzero(brk)[1:] - 1], d[-1]) + 7
        # diff rows: +1 at interval start, -1 at end (exclusive)
        day = np.concatenate([starts, ends])
        delta = np.concatenate(
            [np.ones(len(starts), np.int64), -np.ones(len(ends), np.int64)]
        )
        # DAU partials ride along: +1 on each active day
        day = np.concatenate([day, d])
        kind = np.concatenate(
            [np.zeros(len(delta), np.int64), np.ones(len(d), np.int64)]
        )
        delta = np.concatenate([delta, np.ones(len(d), np.int64)])
        return pd.DataFrame({"day": day, "kind": kind, "delta": delta})

    agg = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["day", "kind"])
        .aggregate(Sum("delta", alias_name="delta"))
        .to_pandas()  # day-bounded: |days| x 2 rows
    )
    # cumulative sum of kind-0 diffs over ALL days; report only days
    # that actually have events (kind-1 rows)
    days = np.unique(agg["day"].to_numpy(np.int64))
    wau = np.zeros(len(days), np.int64)
    k0 = agg[agg["kind"] == 0]
    np.add.at(
        wau,
        np.searchsorted(days, k0["day"].to_numpy(np.int64)),
        k0["delta"].to_numpy(np.int64),
    )
    wau = np.cumsum(wau)
    k1 = agg[agg["kind"] == 1].sort_values("day")
    dau_days = k1["day"].to_numpy(np.int64)
    out_day = pd.to_datetime(dau_days * DAY, unit="us").strftime(
        "%Y-%m-%d"
    )
    return pd.DataFrame(
        {
            "day": out_day,
            "n_dau": k1["delta"].to_numpy(np.int64),
            "n_wau": wau[np.searchsorted(days, dau_days)],
        }
    )


SQL_WAU_USERS = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
  FROM events),
d AS (SELECT DISTINCT day FROM ud)
SELECT strftime(make_timestamp(d.day * 86400000000), '%Y-%m-%d') AS day,
       (SELECT count(DISTINCT u.user_id) FROM ud u
        WHERE u.day = d.day) AS n_dau,
       (SELECT count(DISTINCT u.user_id) FROM ud u
        WHERE u.day BETWEEN d.day - 6 AND d.day) AS n_wau
FROM d
"""


REGISTRY.update({'dedup_events_window': (
            q_dedup_events_window,
            SQL_DEDUP_EVENTS_WINDOW,
        )})


REGISTRY.update({'wau_users': (q_wau_users, SQL_WAU_USERS)})


# --------------------------------------- streaks / mix shift


def q_streaks_users(sf_dir: str):
    """Gaps-and-islands (the consecutive-activity streak shape): per
    user, the longest run of CONSECUTIVE active days and how many
    distinct runs (islands) the activity splits into. (user, day)
    pairs dedup in batch before ONE exchange; inside the user-bounded
    finalizer the island decomposition is one diff over the sorted
    unique days — the day - row_number() trick without the window
    function."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    DAY = np.int64(86_400_000_000)

    def pairs(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.stack([u, t // DAY], axis=1)
        uk = np.unique(key, axis=0)
        return pa.table(
            {
                "user_id": pa.array(uk[:, 0], pa.int64()),
                "day": pa.array(uk[:, 1], pa.int64()),
            }
        )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["day"].to_numpy(np.int64))
        brk = np.ones(len(d), bool)
        brk[1:] = np.diff(d) > 1
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, len(d)))
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "longest_streak": [int(lens.max())],
                "n_islands": [int(len(starts))],
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


SQL_STREAKS_USERS = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
  FROM events),
isl AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM ud),
runs AS (
  SELECT user_id, grp, count(*) AS len
  FROM isl GROUP BY 1, 2)
SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
       count(*) AS n_islands
FROM runs GROUP BY 1
"""


REGISTRY.update({'streaks_users': (q_streaks_users, SQL_STREAKS_USERS)})


# ------------------------------------------- streaming-state shapes (cont.)


def q_cume_distinct_users(sf_dir: str):
    """Running COUNT(DISTINCT) — for every user's active hour, how
    many distinct event types the user has seen up to and including
    that hour (the classic cumulative-cardinality window, which SQL
    windows cannot express directly; the oracle uses the
    first-occurrence + inequality-join decomposition). Per-batch
    distinct (user, hour, type) triples shrink the exchange to the
    active-cell count; ONE user-bucketed exchange; per bucket the
    count is a packed-key double searchsorted — no per-user loop.
    Hour numbers rebased from epoch stay < 2^21, so (user << 21 | hr)
    packs collision-free for user ids < 2^42."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])
    HOUR_US = 3_600_000_000

    def pre(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hr = (
            b["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        ) // HOUR_US
        t = b["event_type"].to_numpy(zero_copy_only=False)
        tu, tcode = np.unique(t, return_inverse=True)
        df = pd.DataFrame(
            {"user_id": u, "hr": hr, "event_type": tu[tcode]}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "hr", "event_type"])
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "hr": pd.Series(dtype="str"),
                    "n_types": pd.Series(dtype="int64"),
                }
            )
        u = g["user_id"].to_numpy(np.int64)
        hr = g["hr"].to_numpy(np.int64)
        base = hr.min()
        hr0 = hr - base
        assert hr0.max() < (1 << 21), "hour span exceeds pack width"
        # first hour per (user, type)
        ft = g.groupby(["user_id", "event_type"], sort=False)["hr"].min()
        fu = ft.index.get_level_values(0).to_numpy(np.int64)
        fh = ft.to_numpy(np.int64) - base
        fpack = np.sort((fu << 21) | fh)
        # active cells (user, hour)
        cells = pd.DataFrame({"u": u, "h": hr0}).drop_duplicates()
        cu = cells["u"].to_numpy(np.int64)
        chh = cells["h"].to_numpy(np.int64)
        n = np.searchsorted(fpack, (cu << 21) | chh, side="right") - np.searchsorted(
            fpack, cu << 21, side="left"
        )
        hrs = ((chh + base) * HOUR_US).astype("datetime64[us]")
        return pd.DataFrame(
            {
                "user_id": cu,
                "hr": pd.Series(hrs).dt.strftime("%Y-%m-%d %H"),
                "n_types": n.astype(np.int64),
            }
        )

    return _by_user_bucket(
        ds.map_batches(pre, batch_format="pyarrow")
    ).map_groups(per_bucket, batch_format="pandas")


SQL_CUME_DISTINCT_USERS = """
WITH d AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr
           FROM events),
f AS (SELECT user_id, event_type, min(date_trunc('hour', ts)) AS fhr
      FROM events GROUP BY 1, 2)
SELECT d.user_id, strftime(d.hr, '%Y-%m-%d %H') AS hr,
       count(*) AS n_types
FROM d JOIN f ON f.user_id = d.user_id AND f.fhr <= d.hr
GROUP BY 1, 2
"""


def q_interarrival_events(sf_dir: str):
    """Exact inter-arrival-time order statistics per event type: the
    gap from each event to the SAME user's next event (any type),
    attributed to the earlier event's type; per type the exact
    discrete p50/p90 (element at floor(q*(n-1)) of the sorted gaps —
    no interpolation, so int64 microseconds stay exact end to end).
    Exchange 1 buckets by user (gaps need per-user order); exchange 2
    groups the 5 types, each group one numpy sort (the documented
    quantiles_group task-size contract)."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(u) < 2:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="str"),
                    "gap_us": pd.Series(dtype="int64"),
                }
            )
        same = u[1:] == u[:-1]
        gap = (t[1:] - t[:-1])[same]
        et = g["event_type"].to_numpy()[:-1][same]
        return pd.DataFrame({"event_type": et, "gap_us": gap})

    gds = _by_user_bucket(ds).map_groups(gaps, batch_format="pandas")

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["gap_us"].to_numpy(np.int64))
        n = len(v)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [n],
                "p50_us": [int(v[(n - 1) // 2])],
                "p90_us": [int(v[((n - 1) * 9) // 10])],
            }
        )

    return gds.groupby("event_type").map_groups(stats, batch_format="pandas")


SQL_INTERARRIVAL_EVENTS = """
WITH s AS (
  SELECT event_type,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
           - epoch_us(ts) AS gap
  FROM events),
g AS (SELECT event_type, gap FROM s WHERE gap IS NOT NULL),
r AS (SELECT event_type, gap,
             row_number() OVER (PARTITION BY event_type ORDER BY gap) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM g)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       CAST(max(CASE WHEN rn - 1 = (n - 1) // 2 THEN gap END) AS BIGINT)
         AS p50_us,
       CAST(max(CASE WHEN rn - 1 = ((n - 1) * 9) // 10 THEN gap END)
            AS BIGINT) AS p90_us
FROM r GROUP BY 1
"""


REGISTRY.update({'cume_distinct_users': (q_cume_distinct_users, SQL_CUME_DISTINCT_USERS)})


REGISTRY.update({'interarrival_events': (q_interarrival_events, SQL_INTERARRIVAL_EVENTS)})


# ------------------------------------------------ model-eval / graph stats


def q_auc_events(sf_dir: str):
    """ROC-AUC of `value` as a score for predicting purchase events —
    the Mann-Whitney closed form over the score HISTOGRAM, not the
    row set: scores quantize exactly to cents, per-batch partial
    (cents -> pos/neg counts) fold through ONE bounded exchange
    (vocabulary = distinct prices, not rows), and the tie-aware
    rank-sum
        num = sum_v pos_v * (2 * neg_below_v + neg_v)
    accumulates in exact int64 on the sorted histogram. AUC =
    num / (2*P*N) is the single float division, identical operands in
    both engines (ties count 1/2 via the 2x scaling)."""
    ev = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        is_pos = (
            b["event_type"].to_numpy(zero_copy_only=False) == "purchase"
        ).astype(np.int64)
        u, inv = np.unique(cents, return_inverse=True)
        return pa.table(
            {
                "c": pa.array(u, pa.int64()),
                "pos": pa.array(np.bincount(inv, weights=is_pos).astype(np.int64)),
                "neg": pa.array(
                    np.bincount(inv, weights=1 - is_pos).astype(np.int64)
                ),
            }
        )

    h = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum("pos", alias_name="pos"), Sum("neg", alias_name="neg"))
        .to_pandas()
        .sort_values("c", kind="mergesort")
    )
    pos = h["pos"].to_numpy(np.int64)
    neg = h["neg"].to_numpy(np.int64)
    cumneg = np.concatenate([[0], np.cumsum(neg)[:-1]])
    num = int((pos * (2 * cumneg + neg)).sum())
    P, N = int(pos.sum()), int(neg.sum())
    return pd.DataFrame({"auc": [round(num / (2 * P * N), 6)]})


SQL_AUC_EVENTS = """
WITH h AS (
  SELECT CAST(round(value*100) AS BIGINT) AS c,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos,
         CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS neg
  FROM events GROUP BY 1
),
w AS (
  SELECT pos, neg,
         CAST(COALESCE(sum(neg) OVER
              (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS cumneg
  FROM h
)
SELECT round(CAST(sum(pos * (2*cumneg + neg)) AS BIGINT)
             / (2.0 * (SELECT sum(pos) FROM h) * (SELECT sum(neg) FROM h)),
             6) AS auc
FROM w
"""


def q_acf_hours(sf_dir: str):
    """Sample autocorrelation of the hourly event-count series at lags
    1..24 (the seasonality fingerprint behind the anomaly/seasonal
    queries). The DISTRIBUTED part is the count fold: per-batch
    (hour -> n) partials through one hour-bounded exchange; the
    zero-filled grid (calendar hours between min and max — bounded by
    time span, not data volume) then yields, per lag, the six Pearson
    sums in exact int64, floats only in the final r per lag with
    identical operands in both engines."""
    ev = _pq(sf_dir, "events", ["ts"])
    HOUR = 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        h = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64) // HOUR
        u, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {"h": pa.array(u, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    hc = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    h = hc["h"].to_numpy(np.int64)
    lo, hi = int(h.min()), int(h.max())
    c = np.zeros(hi - lo + 1, np.int64)
    c[h - lo] = hc["n"].to_numpy(np.int64)
    import math

    out = []
    for lag in range(1, 25):
        x, y = c[:-lag], c[lag:]
        m = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        sxy = int((x * y).sum())
        r = (m * sxy - sx * sy) / math.sqrt(
            float(m * sxx - sx * sx) * float(m * syy - sy * sy)
        )
        out.append((lag, round(r, 6)))
    return pd.DataFrame(out, columns=["lag", "acf"])


SQL_ACF_HOURS = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
bt AS (
  SELECT CAST(epoch(h - (SELECT min(h) FROM b)) AS BIGINT) // 3600 AS t, c
  FROM b
),
grid AS (
  SELECT COALESCE(bt.c, 0) AS c, gs.t
  FROM (SELECT unnest(generate_series(
          0,
          (SELECT CAST(epoch(max(h) - min(h)) AS BIGINT) // 3600 FROM b)))
          AS t) gs
  LEFT JOIN bt ON bt.t = gs.t
),
l AS (
  SELECT k.lag, a.c AS x, y.c AS y
  FROM grid a
  JOIN (SELECT unnest(generate_series(1, 24)) AS lag) k ON TRUE
  JOIN grid y ON y.t = a.t + k.lag
),
s AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
         CAST(sum(x*y) AS BIGINT) AS sxy
  FROM l GROUP BY lag
)
SELECT lag, round((m*sxy - sx*sy)
                  / sqrt((m*sxx - sx*sx) * 1.0 * (m*syy - sy*sy)), 6) AS acf
FROM s
"""


REGISTRY.update({'auc_events': (q_auc_events, SQL_AUC_EVENTS)})


REGISTRY.update({'acf_hours': (q_acf_hours, SQL_ACF_HOURS)})


# ------------------------------------------- streaming / profiling (cont.)


def q_late_arrivals(sf_dir: str):
    """Watermark late-data accounting — the streaming-ingest health
    metric: processing events in ARRIVAL order (event_id), the
    watermark is the running max event-time seen so far; an event is
    LATE if its own timestamp is more than 10 minutes behind the
    watermark at arrival. Same two-phase ordered-scan plan as
    global_rownum: per-arrival-range partials (max ts per event_id
    range bucket) fold to an exclusive prefix max on the driver
    (bucket-bounded), then per-bucket groups resolve lateness with a
    local shifted cummax against the broadcast incoming watermark —
    the fact stream is never globally sorted in one task."""
    ds = _pq(sf_dir, "events", ["event_id", "ts", "event_type"])
    W = 1000  # arrival-range bucket width (contiguous event_id ranges)
    LATE_US = 10 * 60 * 1_000_000

    def pre(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64)
        return pa.table(
            {
                "wb": pa.array(eid // W, pa.int64()),
                "event_id": pa.array(eid),
                "t": pa.array(t),
                "event_type": b["event_type"],
            }
        )

    pds = ds.map_batches(pre, batch_format="pyarrow").materialize()

    def mx_partial(b: pa.Table) -> pa.Table:
        wb = b["wb"].to_numpy(zero_copy_only=False)
        t = b["t"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(wb, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, t)
        return pa.table(
            {"wb": pa.array(u, pa.int64()), "mx": pa.array(mx, pa.int64())}
        )

    mx = (
        pds.map_batches(mx_partial, batch_format="pyarrow")
        .groupby("wb")
        .max("mx")
        .to_pandas()
        .sort_values("wb")
    )
    wbs = mx["wb"].to_numpy(np.int64)
    # exclusive prefix max: the watermark ENTERING each bucket
    run = np.maximum.accumulate(mx["max(mx)"].to_numpy(np.int64))
    base = np.r_[np.iinfo(np.int64).min, run[:-1]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort")
        t = g["t"].to_numpy(np.int64)
        b0 = int(base[np.searchsorted(wbs, int(g["wb"].iloc[0]))])
        cm = np.maximum.accumulate(t)
        wm = np.r_[b0, np.maximum(cm[:-1], b0)]
        late = (wm != np.iinfo(np.int64).min) & (t < wm - LATE_US)
        df = pd.DataFrame({"event_type": g["event_type"], "late": late})
        out = (
            df.groupby("event_type", sort=False)
            .agg(n_total=("late", "size"), n_late=("late", "sum"))
            .reset_index()
        )
        out["n_late"] = out["n_late"].astype(np.int64)
        return out

    part = (
        pds.groupby("wb")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_late", alias_name="n_late"),
        )
    )
    return part


SQL_LATE_ARRIVALS = """
WITH w AS (
  SELECT event_type, ts,
         max(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN wm IS NOT NULL
                      AND ts < wm - INTERVAL 10 MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM w GROUP BY event_type
"""


def q_entropy_users(sf_dir: str):
    """Per-user behavioral entropy (Shannon entropy of the user's
    event-type mix — the engagement-diversity curation feature).
    Integer-exact end to end via the microlog contract: per-batch
    (user, type) count partials fold through one exchange; within
    hash(user)-bucketed groups the per-type terms c*round(ln(c/n)*1e6)
    accumulate as int64 (math.log per DISTINCT (user,type) row — libm,
    matching DuckDB's ln ulp-for-ulp, never numpy's SIMD log), and the
    single float division happens on identical operands."""
    import math

    from ..functions.hashing import splitmix64

    ev = _pq(sf_dir, "events", ["user_id", "event_type"])

    def cnt_partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "user_id": b["user_id"].to_numpy(zero_copy_only=False),
                    "event_type": b["event_type"].to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ev.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("c", alias_name="c"))
    )
    B = 64

    def bucketize(b: pa.Table) -> pa.Table:
        from ..functions.hashing import hash_strings

        h = hash_strings(
            b["user_id"].to_numpy(zero_copy_only=False).astype("U")
        )
        return b.append_column(
            "bucket", pa.array((h % np.uint64(B)).astype(np.int64))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("user_id", kind="mergesort")
        n = g.groupby("user_id", sort=False)["c"].transform("sum").to_numpy(
            np.int64
        )
        c = g["c"].to_numpy(np.int64)
        micro = np.fromiter(
            (round(math.log(ci / ni) * 1e6) for ci, ni in zip(c, n)),
            np.int64,
            len(c),
        )
        term = c * micro
        out = pd.DataFrame(
            {"user_id": g["user_id"], "n": n, "term": term}
        ).groupby(["user_id", "n"], sort=False)["term"].sum().reset_index()
        # floor-quantize: -term/(n*1e6) can land EXACTLY on a
        # .0000005 boundary (term, n are exact ints), where numpy's
        # half-even and DuckDB's half-away disagree
        x = -out["term"] / (out["n"] * 1_000_000.0)
        out["entropy"] = np.floor(x * 1e6) / 1e6
        return out[["user_id", "entropy"]]

    return (
        counts.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


SQL_ENTROPY_USERS = """
WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
n AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1)
SELECT c.user_id,
       floor((-sum(c.c * CAST(round(ln(c.c * 1.0 / n.n) * 1000000)
                              AS BIGINT))
              / (n.n * 1000000.0)) * 1000000) / 1000000 AS entropy
FROM c JOIN n USING (user_id)
GROUP BY c.user_id, n.n
"""


REGISTRY.update({'late_arrivals': (q_late_arrivals, SQL_LATE_ARRIVALS)})


REGISTRY.update({'entropy_users': (q_entropy_users, SQL_ENTROPY_USERS)})


def q_pareto_users(sf_dir: str):
    """Revenue concentration — the smallest number of users covering
    >= 80% of purchase revenue (the whale-curve metric). The
    distributed part is the per-user cent fold (ONE exchange,
    user-bounded output); the ordered 80% scan then runs on that
    bounded table with the integer test 5*cum >= 4*total — no float
    anywhere in the decision. Beyond a driver-sized user table the
    scan becomes the value-bucketed ordered-prefix plan
    (rank_global_orders) — documented, not needed at house scale.
    Output: (n_users, covered_cents, total_cents), all exact ints."""
    ev = _pq(sf_dir, "events", ["user_id", "event_type", "value"])

    def cents_partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b["event_type"], "purchase")
        t = b.filter(m)
        cents = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(uu),
                "cents": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
            }
        )

    per_user = (
        ev.map_batches(cents_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values(["cents", "user_id"], ascending=[False, True],
                     kind="mergesort")
    )
    cents = per_user["cents"].to_numpy(np.int64)
    total = int(cents.sum())
    cum = np.cumsum(cents)
    k = int(np.searchsorted(5 * cum, 4 * total, side="left")) + 1
    return pd.DataFrame(
        {
            "n_users": [k],
            "covered_cents": [int(cum[k - 1])],
            "total_cents": [total],
        }
    )


SQL_PARETO_USERS = """
WITH pu AS (
  SELECT user_id,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
o AS (
  SELECT cents,
         CAST(sum(cents) OVER (ORDER BY cents DESC, user_id) AS BIGINT)
           AS cum,
         row_number() OVER (ORDER BY cents DESC, user_id) AS rn
  FROM pu
),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM pu)
SELECT CAST(min(rn) AS BIGINT) AS n_users,
       CAST(min_by(cum, rn) AS BIGINT) AS covered_cents,
       (SELECT total FROM t) AS total_cents
FROM o WHERE 5 * cum >= 4 * (SELECT total FROM t)
"""


REGISTRY.update({'pareto_users': (q_pareto_users, SQL_PARETO_USERS)})


# ------------------------------------------- calibration / shares / dedup


def q_calibration_bins(sf_dir: str):
    """Score-calibration curve — events ranked globally by
    (value, event_id), cut into 10 equal rank bins (bin =
    rank*10 // N, stated identically in the SQL), purchase rate per
    bin. Global ranking uses the range-bucketed ordered-scan plan
    (per-value-range counts fold to an exclusive prefix, local sort
    adds the base) — same contract as global_rownum, keyed on the
    score instead of time. Rates floor-quantize after one division
    on identical integer operands."""
    ev = _pq(sf_dir, "events", ["event_id", "event_type", "value"])
    W = 5000  # cents per range bucket (value domain is bounded)

    def pre(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "wb": pa.array(cents // W, pa.int64()),
                "cents": pa.array(cents),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "is_pos": pa.array(
                    (
                        b["event_type"].to_numpy(zero_copy_only=False)
                        == "purchase"
                    ).astype(np.int64)
                ),
            }
        )

    pds = ev.map_batches(pre, batch_format="pyarrow").materialize()
    n_total = pds.count()

    def cnt_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b["wb"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"wb": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    cnt = (
        pds.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("wb")
        .sum("c")
        .to_pandas()
        .sort_values("wb")
    )
    wbs = cnt["wb"].to_numpy(np.int64)
    base = np.r_[0, np.cumsum(cnt["sum(c)"].to_numpy(np.int64))[:-1]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "event_id"], kind="mergesort")
        b0 = int(base[np.searchsorted(wbs, int(g["wb"].iloc[0]))])
        rank = b0 + np.arange(len(g), dtype=np.int64)
        bin_ = rank * 10 // n_total
        pos = g["is_pos"].to_numpy(np.int64)
        u, inv = np.unique(bin_, return_inverse=True)
        return pd.DataFrame(
            {
                "bin": u,
                "n": np.bincount(inv).astype(np.int64),
                "purchases": np.bincount(inv, weights=pos).astype(np.int64),
            }
        )

    agg = (
        pds.groupby("wb")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("bin")
        .aggregate(
            Sum("n", alias_name="n"), Sum("purchases", alias_name="purchases")
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = b["purchases"].to_numpy(zero_copy_only=False).astype(np.int64)
        rate = np.floor(p / n * 1e6) / 1e6
        return b.append_column("rate", pa.array(rate))

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_CALIBRATION_BINS = """
WITH r AS (
  SELECT event_type,
         row_number() OVER (ORDER BY CAST(round(value*100) AS BIGINT),
                            event_id) - 1 AS rn
  FROM events
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
SELECT CAST(rn * 10 // (SELECT n FROM n) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS purchases,
       floor(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             * 1.0 / count(*) * 1000000) / 1000000 AS rate
FROM r GROUP BY 1
"""


REGISTRY.update({'calibration_bins': (q_calibration_bins, SQL_CALIBRATION_BINS)})


def q_mutual_info_events(sf_dir: str):
    """Mutual information between event type and spend decile — the
    feature-relevance score (does WHAT a user does predict HOW MUCH
    they spend?). The contingency table folds as per-batch integer
    partials through one cell-bounded exchange (|types| x 10 cells);
    MI accumulates on the bounded table as
    sum n_ij * round(ln(n_ij*N / (n_i*n_j)) * 1e6) in exact int64
    (microlog contract: math.log per CELL, matching DuckDB's ln), and
    the output divides once on identical operands, floor-quantized.
    Deciles are integer rank bins over (cents, event_id) — the same
    range-bucketed global rank as calibration_bins, restated in SQL."""
    import math

    ev = _pq(sf_dir, "events", ["event_id", "event_type", "value"])
    W = 5000

    def pre(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "wb": pa.array(cents // W, pa.int64()),
                "cents": pa.array(cents),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "event_type": b["event_type"],
            }
        )

    pds = ev.map_batches(pre, batch_format="pyarrow").materialize()
    n_total = pds.count()

    def cnt_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b["wb"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"wb": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    cnt = (
        pds.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("wb")
        .sum("c")
        .to_pandas()
        .sort_values("wb")
    )
    wbs = cnt["wb"].to_numpy(np.int64)
    base = np.r_[0, np.cumsum(cnt["sum(c)"].to_numpy(np.int64))[:-1]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "event_id"], kind="mergesort")
        b0 = int(base[np.searchsorted(wbs, int(g["wb"].iloc[0]))])
        rank = b0 + np.arange(len(g), dtype=np.int64)
        out = pd.DataFrame(
            {"event_type": g["event_type"], "bin": rank * 10 // n_total}
        )
        return (
            out.groupby(["event_type", "bin"], sort=False)
            .size()
            .reset_index(name="n")
        )

    cells = (
        pds.groupby("wb")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["event_type", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n_i = cells.groupby("event_type")["n"].sum()
    n_j = cells.groupby("bin")["n"].sum()
    total = 0
    for t, b_, nij in zip(
        cells["event_type"], cells["bin"], cells["n"].to_numpy(np.int64)
    ):
        ratio = (int(nij) * n_total) / (int(n_i[t]) * int(n_j[b_]))
        total += int(nij) * round(math.log(ratio) * 1e6)
    mi = np.floor(total / (n_total * 1_000_000.0) * 1e6) / 1e6
    return pd.DataFrame({"mi": [mi]})


SQL_MUTUAL_INFO_EVENTS = """
WITH r AS (
  SELECT event_type,
         (row_number() OVER (ORDER BY CAST(round(value*100) AS BIGINT),
                             event_id) - 1) * 10
           // (SELECT count(*) FROM events) AS bin
  FROM events
),
cells AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
          FROM r GROUP BY 1, 2),
ni AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_i
       FROM cells GROUP BY 1),
nj AS (SELECT bin, CAST(sum(n) AS BIGINT) AS n_j FROM cells GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
s AS (
  SELECT CAST(sum(cells.n
               * CAST(round(ln((cells.n * tot.n * 1.0) / (n_i * n_j))
                            * 1000000) AS BIGINT)) AS BIGINT) AS micro
  FROM cells
  JOIN ni USING (event_type) JOIN nj USING (bin) CROSS JOIN tot
)
SELECT floor(micro / ((SELECT n FROM tot) * 1000000.0) * 1000000)
         / 1000000 AS mi
FROM s
"""


REGISTRY.update({'mutual_info_events': (q_mutual_info_events, SQL_MUTUAL_INFO_EVENTS)})


def q_peak_concurrency_events(sf_dir: str):
    """Sweep-line peak concurrency — treating every event as a
    30-minute activity interval, the maximum number simultaneously
    active and the first instant it happens (capacity planning's
    favorite number). Interval edges (+1 at start, -1 at end; ends
    sort before starts at equal times — half-open intervals) flow
    through the range-bucketed ordered-scan plan: per-time-bucket NET
    sums fold to an exclusive prefix (the carry entering each
    bucket), each bucket resolves its local running max + first time
    hitting it, and the driver combines the bounded per-bucket
    summaries. All integers."""
    ev = _pq(sf_dir, "events", ["ts"])
    DUR = 30 * 60 * 1_000_000
    WB = 6 * 3600 * 1_000_000

    def edges(b: pa.Table) -> pa.Table:
        t = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64)
        tt = np.concatenate([t, t + DUR])
        dd = np.concatenate(
            [np.ones(len(t), np.int64), -np.ones(len(t), np.int64)]
        )
        return pa.table(
            {
                "wb": pa.array(tt // WB, pa.int64()),
                "t": pa.array(tt),
                "d": pa.array(dd),
            }
        )

    eds = ev.map_batches(edges, batch_format="pyarrow").materialize()

    def net_partial(b: pa.Table) -> pa.Table:
        wb = b["wb"].to_numpy(zero_copy_only=False)
        d = b["d"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(wb, return_inverse=True)
        return pa.table(
            {
                "wb": pa.array(u, pa.int64()),
                "net": pa.array(
                    np.bincount(inv, weights=d).astype(np.int64)
                ),
            }
        )

    net = (
        eds.map_batches(net_partial, batch_format="pyarrow")
        .groupby("wb")
        .sum("net")
        .to_pandas()
        .sort_values("wb")
    )
    wbs = net["wb"].to_numpy(np.int64)
    carry = np.r_[0, np.cumsum(net["sum(net)"].to_numpy(np.int64))[:-1]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "d"], kind="mergesort")  # -1 before +1
        c0 = int(carry[np.searchsorted(wbs, int(g["wb"].iloc[0]))])
        run = c0 + np.cumsum(g["d"].to_numpy(np.int64))
        mx = int(run.max())
        at = int(g["t"].to_numpy(np.int64)[int(np.argmax(run))])
        return pd.DataFrame({"peak": [mx], "at_us": [at]})

    parts = (
        eds.groupby("wb")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    peak = int(parts["peak"].max())
    at_us = int(parts.loc[parts["peak"] == peak, "at_us"].min())
    return pd.DataFrame({"peak": [peak], "at_us": [at_us]})


SQL_PEAK_CONCURRENCY_EVENTS = """
WITH e AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS t, 1 AS d FROM events
  UNION ALL
  SELECT CAST(epoch_us(ts + INTERVAL 30 MINUTE) AS BIGINT), -1
  FROM events
),
r AS (
  SELECT t, CAST(sum(d) OVER (ORDER BY t, d
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
  FROM e
),
m AS (SELECT CAST(max(c) AS BIGINT) AS peak FROM r)
SELECT (SELECT peak FROM m) AS peak,
       CAST(min(t) AS BIGINT) AS at_us
FROM r WHERE c = (SELECT peak FROM m)
"""


REGISTRY.update({'peak_concurrency_events': (
            q_peak_concurrency_events,
            SQL_PEAK_CONCURRENCY_EVENTS,
        )})


def q_markov_accuracy_events(sf_dir: str):
    """Next-event prediction accuracy of the majority transition
    model — the baseline every sequence model must beat. Per-user
    strictly-adjacent (prev, next) pairs (order = ts, event_id) fold
    through hash(user)-bucketed groups into the |types|^2-bounded
    transition count table; BOTH the model (argmax next per prev,
    ties -> lexicographically first) and its training accuracy read
    off that same table — no second data pass. Integer counts end to
    end, one floor-quantized division."""
    from ..functions.hashing import hash_strings

    ev = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    B = 64

    def pre(b: pa.Table) -> pa.Table:
        h = hash_strings(
            b["user_id"].to_numpy(zero_copy_only=False).astype("U")
        )
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(B)).astype(np.int64)),
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "event_type": b["event_type"],
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        same = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        prev = g["event_type"].to_numpy()[:-1][same]
        nxt = g["event_type"].to_numpy()[1:][same]
        return (
            pd.DataFrame({"prev": prev, "next": nxt})
            .groupby(["prev", "next"], sort=False)
            .size()
            .reset_index(name="n")
        )

    counts = (
        ev.map_batches(pre, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["prev", "next"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    # majority next per prev: max n, ties -> lexicographically first
    counts = counts.sort_values(
        ["prev", "n", "next"], ascending=[True, False, True],
        kind="mergesort",
    )
    maj = counts.drop_duplicates("prev", keep="first")[["prev", "next"]]
    hit = counts.merge(maj, on=["prev", "next"])["n"].sum()
    total = counts["n"].sum()
    acc = np.floor(int(hit) / int(total) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n_pairs": [int(total)],
            "n_correct": [int(hit)],
            "accuracy": [acc],
        }
    )


SQL_MARKOV_ACCURACY_EVENTS = """
WITH p AS (
  SELECT event_type AS prev,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next
  FROM events
),
c AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS n
      FROM p WHERE next IS NOT NULL GROUP BY 1, 2),
m AS (SELECT prev, next FROM
        (SELECT prev, next,
                row_number() OVER (PARTITION BY prev
                                   ORDER BY n DESC, next) AS rn
         FROM c)
      WHERE rn = 1),
s AS (SELECT CAST(sum(c.n) AS BIGINT) AS total,
             CAST(sum(CASE WHEN m.next IS NOT NULL THEN c.n ELSE 0 END)
                  AS BIGINT) AS hit
      FROM c LEFT JOIN m ON c.prev = m.prev AND c.next = m.next)
SELECT total AS n_pairs, hit AS n_correct,
       floor(hit * 1.0 / total * 1000000) / 1000000 AS accuracy
FROM s
"""


REGISTRY.update({'markov_accuracy_events': (
            q_markov_accuracy_events,
            SQL_MARKOV_ACCURACY_EVENTS,
        )})


def _stump_user_table(sf_dir: str):
    """Shared feature table for the stump / PR-curve pair: one
    user-keyed exchange of per-batch (spend-cents, purchase-count)
    partials -> (user, x=total cents, y=converted >= 15 purchases)."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        isp = (
            pc.equal(b["event_type"], "purchase")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        us, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "x": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
                "np": pa.array(
                    np.bincount(inv, weights=isp).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("x", alias_name="x"), Sum("np", alias_name="np"))
    )


#: integer-arithmetic threshold grid shared by stump + PR curve
STUMP_BUCKETS = 64
STUMP_THRESH = 15  # conversion rule, matches ab_test_events


def _stump_histogram(sf_dir: str):
    """(thresholds, n_le, pos_le, n_total, pos_total): cumulative
    counts at each of the <= 63 distinct integer value-range
    thresholds t_i = xmin + (i*(xmax-xmin))//B. Two tiny aggregates
    over the user-bounded feature table (global min/max, then
    64-bucket histogram partials) — never a per-user driver collect."""
    from ray.data.aggregate import Max, Min

    # the per-user table is user-bounded (not data-volume-bound), so
    # pinning it is safe at any corpus scale and saves re-running the
    # event fold for the second (histogram) pass
    users = _stump_user_table(sf_dir).materialize()
    mm = users.aggregate(Min("x"), Max("x"))
    xmin, xmax = int(mm["min(x)"]), int(mm["max(x)"])
    i = np.arange(1, STUMP_BUCKETS, dtype=np.int64)
    thr = np.unique(xmin + (i * (xmax - xmin)) // STUMP_BUCKETS)

    def hist_partial(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        y = (
            b["np"].to_numpy(zero_copy_only=False) >= STUMP_THRESH
        ).astype(np.int64)
        bucket = np.searchsorted(thr, x, side="left")
        n = np.bincount(bucket, minlength=len(thr) + 1).astype(np.int64)
        p = np.bincount(
            bucket, weights=y, minlength=len(thr) + 1
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    np.arange(len(thr) + 1, dtype=np.int64)
                ),
                "n": pa.array(n, pa.int64()),
                "p": pa.array(p, pa.int64()),
            }
        )

    h = (
        users.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"), Sum("p", alias_name="p"))
        .to_pandas()
        .sort_values("bucket")
    )
    full_n = np.zeros(len(thr) + 1, np.int64)
    full_p = np.zeros(len(thr) + 1, np.int64)
    full_n[h["bucket"].to_numpy()] = h["n"].to_numpy()
    full_p[h["bucket"].to_numpy()] = h["p"].to_numpy()
    n_le = np.cumsum(full_n)[:-1]  # #{x <= thr[i]}
    pos_le = np.cumsum(full_p)[:-1]
    return thr, n_le, pos_le, int(full_n.sum()), int(full_p.sum())


def q_decision_stump_events(sf_dir: str):
    """Best single-threshold decision stump (the CART/GBDT split
    primitive): does total spend predict conversion (>= 15
    purchases)? Candidate thresholds are the integer value-range grid
    (never data-volume-bound); split quality = summed per-side
    (pos^2 + neg^2)/n — maximizing it minimizes weighted Gini — as
    one float expression mirroring the oracle's tree, ties -> lowest
    threshold. All counts reach the driver as a <= 64-row histogram;
    the per-user fold is the only data-sized exchange."""
    thr, n_le, pos_le, n_tot, pos_tot = _stump_histogram(sf_dir)
    n_l, p_l = n_le, pos_le
    n_r, p_r = n_tot - n_le, pos_tot - pos_le
    keep = (n_l > 0) & (n_r > 0)
    thr, n_l, p_l, n_r, p_r = (
        a[keep] for a in (thr, n_l, p_l, n_r, p_r)
    )
    score = ((p_l * p_l + (n_l - p_l) * (n_l - p_l)) * 1.0) / n_l + (
        (p_r * p_r + (n_r - p_r) * (n_r - p_r)) * 1.0
    ) / n_r
    best = np.lexsort((thr, -score))[0]
    return pd.DataFrame(
        {
            "t_cents": [int(thr[best])],
            "n_left": [int(n_l[best])],
            "pos_left": [int(p_l[best])],
            "n_right": [int(n_r[best])],
            "pos_right": [int(p_r[best])],
            "score": [float(np.floor(score[best] * 1e6) / 1e6)],
        }
    )


_SQL_STUMP_BASE = f"""
u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         CASE WHEN sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) >= {STUMP_THRESH}
              THEN 1 ELSE 0 END AS y
  FROM events GROUP BY user_id
),
mm AS (SELECT min(x) AS lo, max(x) AS hi FROM u),
thr AS (
  SELECT DISTINCT CAST((SELECT lo FROM mm)
         + (i * ((SELECT hi FROM mm) - (SELECT lo FROM mm)))
           // {STUMP_BUCKETS} AS BIGINT) AS t
  FROM generate_series(1, {STUMP_BUCKETS - 1}) g(i)
),
cnt AS (
  SELECT thr.t,
         CAST(count(*) FILTER (u.x <= thr.t) AS BIGINT) AS n_l,
         CAST(sum(u.y) FILTER (u.x <= thr.t) AS BIGINT) AS p_l,
         CAST(count(*) FILTER (u.x > thr.t) AS BIGINT) AS n_r,
         CAST(sum(u.y) FILTER (u.x > thr.t) AS BIGINT) AS p_r
  FROM thr CROSS JOIN u GROUP BY thr.t
)"""


SQL_DECISION_STUMP_EVENTS = (
    "WITH "
    + _SQL_STUMP_BASE
    + """
SELECT t AS t_cents, n_l AS n_left, p_l AS pos_left,
       n_r AS n_right, p_r AS pos_right,
       floor(((p_l * p_l + (n_l - p_l) * (n_l - p_l)) * 1.0 / n_l
              + (p_r * p_r + (n_r - p_r) * (n_r - p_r)) * 1.0 / n_r)
             * 1e6) / 1e6 AS score
FROM cnt WHERE n_l > 0 AND n_r > 0
ORDER BY (p_l * p_l + (n_l - p_l) * (n_l - p_l)) * 1.0 / n_l
         + (p_r * p_r + (n_r - p_r) * (n_r - p_r)) * 1.0 / n_r DESC,
         t ASC
LIMIT 1
"""
)


def q_pr_curve_events(sf_dir: str):
    """Precision/recall/F1 curve of the 'total spend >= t' conversion
    classifier over the same integer threshold grid as the stump —
    the model-eval sibling of auc_events (which integrates this
    curve's ranking). Predicted positive at t = x > t, so TP/PP read
    straight off the cumulative histogram; precision, recall and F1
    (= 2TP/(PP+P), one division) are single float expressions over
    exact integers, floor-quantized."""
    thr, n_le, pos_le, n_tot, pos_tot = _stump_histogram(sf_dir)
    pp = n_tot - n_le
    tp = pos_tot - pos_le
    keep = pp > 0
    thr, pp, tp = thr[keep], pp[keep], tp[keep]
    prec = np.floor((tp * 1.0) / pp * 1e6) / 1e6
    rec = np.floor((tp * 1.0) / pos_tot * 1e6) / 1e6
    f1 = np.floor((2 * tp * 1.0) / (pp + pos_tot) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "t_cents": thr.astype(np.int64),
            "pred_pos": pp.astype(np.int64),
            "tp": tp.astype(np.int64),
            "prec": prec,
            "rec": rec,
            "f1": f1,
        }
    )


SQL_PR_CURVE_EVENTS = (
    "WITH "
    + _SQL_STUMP_BASE
    + """,
tot AS (SELECT CAST(sum(y) AS BIGINT) AS p FROM u)
SELECT t AS t_cents, n_r AS pred_pos, p_r AS tp,
       floor(p_r * 1.0 / n_r * 1e6) / 1e6 AS prec,
       floor(p_r * 1.0 / (SELECT p FROM tot) * 1e6) / 1e6 AS rec,
       floor(2 * p_r * 1.0 / (n_r + (SELECT p FROM tot)) * 1e6) / 1e6
         AS f1
FROM cnt WHERE n_r > 0
"""
)


REGISTRY.update({'decision_stump_events': (
            q_decision_stump_events,
            SQL_DECISION_STUMP_EVENTS,
        )})


REGISTRY.update({'pr_curve_events': (q_pr_curve_events, SQL_PR_CURVE_EVENTS)})


#: bootstrap parameters (bootstrap_ci_events)
BOOT_B = 200
BOOT_SEED = 17


def q_bootstrap_ci_events(sf_dir: str):
    """Deterministic bootstrap 95% CI for mean per-user spend: 200
    resamples whose member indices are a pure splitmix64 function of
    (resample, position) — reproducible under any partitioning, and
    the SQL twin replays the chain bit-for-bit. The per-user cents
    fold is the only data-sized exchange; resampling happens over the
    user-BOUNDED table (driver-side here; at an unbounded user count
    the same membership function drives B broadcast-scored scans).
    Resample sums are exact int64; each mean is one floor-quantized
    division; the CI reads ranks 6 and 195 of the 200 ordered means."""
    from ..functions.hashing import key_rank64

    users = (
        _stump_user_table(sf_dir)
        .to_pandas()
        .sort_values("user_id", kind="mergesort")
    )
    x = users["x"].to_numpy(np.int64)
    n = len(x)
    means = np.empty(BOOT_B, np.float64)
    i = np.arange(n, dtype=np.uint64)
    for b in range(1, BOOT_B + 1):
        key = (np.uint64(b) << np.uint64(32)) | i
        idx = key_rank64(key.astype(np.int64), seed=BOOT_SEED) % np.uint64(n)
        s = int(x[idx.astype(np.int64)].sum())
        means[b - 1] = np.floor(s * 1.0 / n * 1e6) / 1e6
    means.sort(kind="stable")
    point = np.floor(int(x.sum()) * 1.0 / n * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n_users": [n],
            "point_mean": [point],
            "ci_lo": [means[5]],
            "ci_hi": [means[BOOT_B - 6]],
        }
    )


def _bootstrap_ci_sql() -> str:
    from __ray_entry__ import _key_rank_sql  # lazy: avoids cycle

    return f"""
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
ru AS (SELECT x AS cents,
              row_number() OVER (ORDER BY user_id) - 1 AS pos
       FROM u),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
g AS (SELECT gb.b, gi.i
      FROM generate_series(1, {BOOT_B}) gb(b)
      CROSS JOIN (SELECT pos AS i FROM ru) gi),
{_key_rank_sql('g', '(b * 4294967296 + i)', 'b, i', BOOT_SEED)},
sel AS (
  SELECT r.b, ru.cents
  FROM r JOIN ru
    ON ru.pos = CAST(r.x % CAST((SELECT n FROM nn) AS UBIGINT)
                     AS BIGINT)
),
m AS (
  SELECT b,
         floor(CAST(sum(cents) AS BIGINT) * 1.0
               / (SELECT n FROM nn) * 1e6) / 1e6 AS mean
  FROM sel GROUP BY b
),
o AS (SELECT mean, row_number() OVER (ORDER BY mean) AS rn FROM m)
SELECT (SELECT n FROM nn) AS n_users,
       floor((SELECT CAST(sum(x) AS BIGINT) FROM u) * 1.0
             / (SELECT n FROM nn) * 1e6) / 1e6 AS point_mean,
       (SELECT mean FROM o WHERE rn = 6) AS ci_lo,
       (SELECT mean FROM o WHERE rn = {BOOT_B - 5}) AS ci_hi
"""


REGISTRY.update({'bootstrap_ci_events': (
            q_bootstrap_ci_events,
            _bootstrap_ci_sql(),
        )})


def q_emd_cohorts_events(sf_dir: str):
    """1-D earth-mover (Wasserstein-1) distance between the per-user
    spend distributions of the two experiment cohorts (user_id % 2) —
    the drift metric that, unlike KS or JSD, weighs HOW FAR mass
    moved. Over the ordered distinct-cents support, EMD = sum over
    gaps of |F_A - F_B| * gap; the integrand cross-multiplies integer
    cumulative counts (|cumA*nB - cumB*nA| * gap), so the whole sum
    is exact integer arithmetic with ONE final floor-quantized
    division. Per-user cents fold is the only data-sized exchange;
    the support table is user-bounded."""
    ds = _pq(sf_dir, "events", ["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        us, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "x": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    users = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("x", alias_name="x"))
        .to_pandas()
    )
    cohort = users["user_id"].to_numpy(np.int64) % 2
    x = users["x"].to_numpy(np.int64)
    order = np.argsort(x, kind="mergesort")
    x, cohort = x[order], cohort[order]
    v, start = np.unique(x, return_index=True)
    ca_per = np.bincount(
        np.searchsorted(v, x), weights=(cohort == 0), minlength=len(v)
    ).astype(np.int64)
    cb_per = np.bincount(
        np.searchsorted(v, x), weights=(cohort == 1), minlength=len(v)
    ).astype(np.int64)
    cuma = np.cumsum(ca_per)
    cumb = np.cumsum(cb_per)
    na, nb = int(cuma[-1]), int(cumb[-1])
    gaps = (v[1:] - v[:-1]).astype(object)
    s = int(
        sum(
            abs(int(cuma[i]) * nb - int(cumb[i]) * na) * int(gaps[i])
            for i in range(len(v) - 1)
        )
    )
    emd = np.floor(s * 1.0 / (na * nb) * 1e6) / 1e6
    return pd.DataFrame(
        {"n_a": [na], "n_b": [nb], "emd_cents": [float(emd)]}
    )


SQL_EMD_COHORTS_EVENTS = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         user_id % 2 AS cohort
  FROM events GROUP BY user_id
),
v AS (
  SELECT x,
         CAST(count(*) FILTER (cohort = 0) AS BIGINT) AS ca,
         CAST(count(*) FILTER (cohort = 1) AS BIGINT) AS cb
  FROM u GROUP BY x
),
nn AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
              CAST(sum(cb) AS BIGINT) AS nb FROM v),
w AS (
  SELECT x,
         CAST(sum(ca) OVER (ORDER BY x) AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY x) AS BIGINT) AS cumb,
         lead(x) OVER (ORDER BY x) AS nx
  FROM v
),
t AS (
  SELECT CAST(sum(abs(cuma * (SELECT nb FROM nn)
                      - cumb * (SELECT na FROM nn))
                  * (nx - x)) AS BIGINT) AS s
  FROM w WHERE nx IS NOT NULL
)
SELECT (SELECT na FROM nn) AS n_a,
       (SELECT nb FROM nn) AS n_b,
       floor((SELECT s FROM t) * 1.0
             / ((SELECT na FROM nn) * (SELECT nb FROM nn))
             * 1e6) / 1e6 AS emd_cents
"""


REGISTRY.update({'emd_cohorts_events': (
            q_emd_cohorts_events,
            SQL_EMD_COHORTS_EVENTS,
        )})


def q_attribution_linear(sf_dir: str):
    """LINEAR multi-touch attribution (the equal-credit sibling of
    attribution_last_touch): every click/view in the 24 h before a
    purchase shares that purchase's credit equally. Credit is the
    integer micro-unit floor(1e6 // k) per touch — integer DIVISION
    on both engines, so per-type credit sums are exact BIGINTs under
    any partitioning; purchases with no prior touch land in an
    'unattributed' bucket at full credit. One user-bucketed exchange;
    per-user window counts are two searchsorteds over the
    disjoint-offset touch timeline (the burst_users trick), no
    per-user loop."""
    ds = _pq(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]
    )
    W = 24 * 3600 * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        ty = g["event_type"].to_numpy()
        new = np.r_[True, u[1:] != u[:-1]]
        seg_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(u)] - 1
        rel = t - t[starts][seg_id]
        spans = rel[ends]
        offs = np.r_[0, np.cumsum(spans[:-1] + W + 1_000_000)]
        tt = rel + offs[seg_id]  # per-user-disjoint timeline
        is_p = ty == "purchase"
        res = {"click": 0, "view": 0}
        kc = np.zeros(int(is_p.sum()), np.int64)
        kv = np.zeros_like(kc)
        for name, arr in (("click", kc), ("view", kv)):
            tm = tt[ty == name]
            lo = np.searchsorted(tm, tt[is_p] - W, side="left")
            hi = np.searchsorted(tm, tt[is_p], side="left")
            arr[:] = hi - lo
        k = kc + kv
        has = k > 0
        per = np.zeros_like(k)
        per[has] = 1_000_000 // k[has]
        return pd.DataFrame(
            {
                "event_type": ["click", "view", "unattributed"],
                "credit_micro": [
                    int((kc[has] * per[has]).sum()),
                    int((kv[has] * per[has]).sum()),
                    int((~has).sum()) * 1_000_000,
                ],
            }
        )

    def pre(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b["event_type"],
            value_set=pa.array(["click", "view", "purchase"]),
        )
        b = b.filter(keep)
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )

    parts = (
        _by_user_bucket(ds.map_batches(pre, batch_format="pyarrow"))
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby("event_type", sort=True)["credit_micro"]
        .sum()
        .reset_index()
    )
    out["credit_micro"] = out["credit_micro"].astype(np.int64)
    out["credit"] = out["credit_micro"] / 1e6
    return out


SQL_ATTRIBUTION_LINEAR = """
WITH p AS (SELECT event_id AS pid, user_id, ts FROM events
           WHERE event_type = 'purchase'),
t AS (SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'view')),
tc AS (
  SELECT p.pid, t.event_type AS ty, CAST(count(*) AS BIGINT) AS c
  FROM p JOIN t ON t.user_id = p.user_id
               AND t.ts < p.ts
               AND t.ts >= p.ts - INTERVAL 24 HOUR
  GROUP BY 1, 2
),
k AS (SELECT pid, CAST(sum(c) AS BIGINT) AS k FROM tc GROUP BY pid),
cr AS (
  SELECT tc.ty AS event_type,
         CAST(sum(tc.c * (1000000 // k.k)) AS BIGINT) AS credit_micro
  FROM tc JOIN k ON k.pid = tc.pid GROUP BY 1
),
un AS (
  SELECT 'unattributed' AS event_type,
         CAST(count(*) AS BIGINT) * 1000000 AS credit_micro
  FROM p LEFT JOIN k ON k.pid = p.pid WHERE k.pid IS NULL
),
allc AS (SELECT * FROM cr UNION ALL SELECT * FROM un)
SELECT event_type, credit_micro, credit_micro / 1e6 AS credit
FROM allc ORDER BY event_type
"""


def q_drawdown_users(sf_dir: str):
    """Maximum drawdown per user over the (ts, event_id)-ordered
    value series — the running-peak-minus-current metric every
    monitoring/finance pipeline computes. Exact integer cents: one
    user-bucketed exchange, per-user cummax inside the coarse group
    (pandas groupby.cummax — C-speed, no Python loop), max of the
    gap."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
                "event_id": b["event_id"],
                "v": pa.array(
                    np.rint(
                        b["value"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
                ),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        peak = g.groupby("user_id", sort=False)["v"].cummax()
        dd = peak - g["v"]
        out = (
            dd.groupby(g["user_id"], sort=False)
            .max()
            .reset_index()
        )
        out.columns = ["user_id", "max_drawdown_cents"]
        return out.astype(
            {"user_id": np.int64, "max_drawdown_cents": np.int64}
        )

    return _by_user_bucket(
        ds.map_batches(pre, batch_format="pyarrow")
    ).map_groups(per_bucket, batch_format="pandas")


SQL_DRAWDOWN_USERS = """
WITH v AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100.0) AS BIGINT) AS v
  FROM events
),
w AS (
  SELECT user_id,
         max(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) - v AS dd
  FROM v
)
SELECT user_id, CAST(max(dd) AS BIGINT) AS max_drawdown_cents
FROM w GROUP BY user_id
"""


REGISTRY.update({'attribution_linear': (
            q_attribution_linear,
            SQL_ATTRIBUTION_LINEAR,
        )})


REGISTRY.update({'drawdown_users': (q_drawdown_users, SQL_DRAWDOWN_USERS)})


def q_wilson_ci_cohorts(sf_dir: str):
    """Wilson score 95% interval for each cohort's conversion rate —
    the small-sample-safe CI the two-proportion z-test (ab_test)
    should be read with. Inputs are the exact integer (converted,
    total) pairs from one user fold; the interval is a single float
    expression evaluated in the oracle's exact tree shape (math.sqrt
    == DuckDB sqrt, both correctly rounded), floor-quantized."""
    import math

    users = _stump_user_table(sf_dir).to_pandas()
    conv = (users["np"].to_numpy(np.int64) >= STUMP_THRESH).astype(
        np.int64
    )
    grp = users["user_id"].to_numpy(np.int64) % 2
    Z = 1.96
    rows = []
    for c in (0, 1):
        n = int((grp == c).sum())
        x = int(conv[grp == c].sum())
        p = x * 1.0 / n
        ctr = p + (Z * Z) / (2.0 * n)
        half = Z * math.sqrt(
            (p * (1.0 - p)) / n + (Z * Z) / (4.0 * n * n)
        )
        den = 1.0 + (Z * Z) / n
        rows.append(
            (
                c,
                n,
                x,
                np.floor((ctr - half) / den * 1e6) / 1e6,
                np.floor((ctr + half) / den * 1e6) / 1e6,
            )
        )
    return pd.DataFrame(
        rows, columns=["cohort", "n", "converted", "ci_lo", "ci_hi"]
    ).astype({"cohort": np.int64, "n": np.int64, "converted": np.int64})


SQL_WILSON_CI_COHORTS = f"""
WITH u AS (
  SELECT user_id % 2 AS cohort,
         CASE WHEN sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) >= {STUMP_THRESH}
              THEN 1 ELSE 0 END AS y
  FROM events GROUP BY user_id
),
c AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS x
      FROM u GROUP BY cohort)
SELECT cohort, n, x AS converted,
       floor(((x * 1.0 / n + (1.96 * 1.96) / (2.0 * n))
              - 1.96 * sqrt(((x * 1.0 / n) * (1.0 - x * 1.0 / n)) / n
                            + (1.96 * 1.96) / (4.0 * n * n)))
             / (1.0 + (1.96 * 1.96) / n) * 1e6) / 1e6 AS ci_lo,
       floor(((x * 1.0 / n + (1.96 * 1.96) / (2.0 * n))
              + 1.96 * sqrt(((x * 1.0 / n) * (1.0 - x * 1.0 / n)) / n
                            + (1.96 * 1.96) / (4.0 * n * n)))
             / (1.0 + (1.96 * 1.96) / n) * 1e6) / 1e6 AS ci_hi
FROM c
"""


REGISTRY.update({'wilson_ci_cohorts': (
            q_wilson_ci_cohorts,
            SQL_WILSON_CI_COHORTS,
        )})


def q_ks_test_cohorts(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov D between the cohort spend
    distributions — the max-gap companion of emd_cohorts_events,
    derived from the same integer cumulative machinery: D =
    max_v |cumA(v)*nB - cumB(v)*nA| / (nA*nB), with the numerator an
    exact integer max and a single quantized division. Reports the
    smallest support value attaining the max (deterministic tie
    rule). One per-user fold is the only data-sized exchange."""
    ds = _pq(sf_dir, "events", ["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        us, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "x": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    users = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("x", alias_name="x"))
        .to_pandas()
    )
    cohort = users["user_id"].to_numpy(np.int64) % 2
    x = users["x"].to_numpy(np.int64)
    order = np.argsort(x, kind="mergesort")
    x, cohort = x[order], cohort[order]
    v, start = np.unique(x, return_index=True)
    pos = np.searchsorted(v, x)
    ca = np.bincount(pos, weights=(cohort == 0), minlength=len(v))
    cb = np.bincount(pos, weights=(cohort == 1), minlength=len(v))
    cuma = np.cumsum(ca).astype(np.int64)
    cumb = np.cumsum(cb).astype(np.int64)
    na, nb = int(cuma[-1]), int(cumb[-1])
    gap = np.abs(cuma * nb - cumb * na)
    best = int(gap.max())
    at = int(v[np.flatnonzero(gap == best)[0]])
    d = np.floor(best * 1.0 / (na * nb) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n_a": [na],
            "n_b": [nb],
            "ks_d": [float(d)],
            "d_at_cents": [at],
        }
    ).astype({"n_a": np.int64, "n_b": np.int64, "d_at_cents": np.int64})


SQL_KS_TEST_COHORTS = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         user_id % 2 AS cohort
  FROM events GROUP BY user_id
),
v AS (
  SELECT x,
         CAST(count(*) FILTER (cohort = 0) AS BIGINT) AS ca,
         CAST(count(*) FILTER (cohort = 1) AS BIGINT) AS cb
  FROM u GROUP BY x
),
nn AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
              CAST(sum(cb) AS BIGINT) AS nb FROM v),
w AS (
  SELECT x,
         abs(CAST(sum(ca) OVER (ORDER BY x) AS BIGINT)
               * (SELECT nb FROM nn)
             - CAST(sum(cb) OVER (ORDER BY x) AS BIGINT)
               * (SELECT na FROM nn)) AS gap
  FROM v
),
m AS (SELECT CAST(max(gap) AS BIGINT) AS best FROM w)
SELECT (SELECT na FROM nn) AS n_a,
       (SELECT nb FROM nn) AS n_b,
       floor((SELECT best FROM m) * 1.0
             / ((SELECT na FROM nn) * (SELECT nb FROM nn))
             * 1e6) / 1e6 AS ks_d,
       (SELECT min(x) FROM w WHERE gap = (SELECT best FROM m))
         AS d_at_cents
"""


def q_cramers_v_events(sf_dir: str):
    """Cramer's V effect size over the event_type x cohort
    contingency — the interpretable companion of chi_square_events
    (same cell-count-sized exchange): V = sqrt(chi2 / (N *
    min(r-1, c-1))), rounded like the chi-square precedent."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            b["event_type"].combine_chunks()
            if isinstance(b["event_type"], pa.ChunkedArray)
            else b["event_type"]
        )
        t = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = b["user_id"].to_numpy(zero_copy_only=False) % 4
        packed = t * 4 + k
        upk, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "t": enc.dictionary.take(pa.array(upk // 4, pa.int64())),
                "k": pa.array(upk % 4, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        import math

        t = b["t"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ut, ti = np.unique(t, return_inverse=True)
        uk, ki = np.unique(k, return_inverse=True)
        obs = np.zeros((len(ut), len(uk)))
        obs[ti, ki] = n
        rt = obs.sum(axis=1, keepdims=True)
        ct = obs.sum(axis=0, keepdims=True)
        tot = obs.sum()
        e = rt * ct / tot
        chi2 = ((obs - e) ** 2 / e).sum()
        denom = tot * min(len(ut) - 1, len(uk) - 1)
        v = math.sqrt(chi2 / denom)
        return pa.table(
            {
                "cramers_v": pa.array([round(v, 6)], pa.float64()),
                "n": pa.array([int(tot)], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["t", "k"])
        .aggregate(Sum("n", alias_name="n"))
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )


SQL_CRAMERS_V_EVENTS = """
WITH c AS (
  SELECT event_type AS t, user_id % 4 AS k, count(*) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT t, sum(o) AS r FROM c GROUP BY 1),
ct AS (SELECT k, sum(o) AS cc FROM c GROUP BY 1),
tot AS (SELECT sum(o) AS n FROM c),
grid AS (
  SELECT rt.t, ct.k, COALESCE(c.o, 0) AS o,
         CAST(rt.r AS DOUBLE) * ct.cc / tot.n AS e
  FROM rt CROSS JOIN ct CROSS JOIN tot
  LEFT JOIN c ON c.t = rt.t AND c.k = ct.k
)
SELECT round(sqrt(sum((o - e) * (o - e) / e)
                  / (CAST((SELECT n FROM tot) AS DOUBLE)
                     * least((SELECT count(*) - 1 FROM rt),
                             (SELECT count(*) - 1 FROM ct)))), 6)
         AS cramers_v,
       CAST((SELECT n FROM tot) AS BIGINT) AS n
FROM grid
"""


REGISTRY.update({'ks_test_cohorts': (q_ks_test_cohorts, SQL_KS_TEST_COHORTS)})


REGISTRY.update({'cramers_v_events': (q_cramers_v_events, SQL_CRAMERS_V_EVENTS)})


#: PSI bucket count (psi_cohorts_events)
PSI_BUCKETS = 10


def q_psi_cohorts_events(sf_dir: str):
    """Population Stability Index between the cohort spend
    distributions — the model-monitoring drift gate (PSI > 0.2 =>
    investigate): sum over value-range buckets of
    (pa - pb) * ln(pa / pb). Buckets come from the integer global
    min/max grid (never data-volume-bound); zero-count buckets are
    excluded on BOTH sides (the standard convention); each term is
    nanounit-floor-quantized so the integer sum is
    order-independent, with math.log == DuckDB ln ulp-for-ulp."""
    import math

    from ray.data.aggregate import Max, Min

    users = _stump_user_table(sf_dir).materialize()
    mm = users.aggregate(Min("x"), Max("x"))
    xmin, xmax = int(mm["min(x)"]), int(mm["max(x)"])
    i = np.arange(1, PSI_BUCKETS, dtype=np.int64)
    thr = np.unique(xmin + (i * (xmax - xmin)) // PSI_BUCKETS)

    def hist_partial(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        coh = b["user_id"].to_numpy(zero_copy_only=False) % 2
        bucket = np.searchsorted(thr, x, side="left")
        nb_ = len(thr) + 1
        a = np.bincount(
            bucket[coh == 0], minlength=nb_
        ).astype(np.int64)
        c = np.bincount(
            bucket[coh == 1], minlength=nb_
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(np.arange(nb_, dtype=np.int64)),
                "na": pa.array(a, pa.int64()),
                "nb": pa.array(c, pa.int64()),
            }
        )

    h = (
        users.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("na", alias_name="na"), Sum("nb", alias_name="nb")
        )
        .to_pandas()
    )
    na = h["na"].to_numpy(np.int64)
    nb_ = h["nb"].to_numpy(np.int64)
    Na, Nb = int(na.sum()), int(nb_.sum())
    acc = 0
    used = 0
    for a, c in zip(na, nb_):
        if a == 0 or c == 0:
            continue
        used += 1
        pa_ = int(a) * 1.0 / Na
        pb_ = int(c) * 1.0 / Nb
        term = (pa_ - pb_) * math.log(pa_ / pb_)
        acc += int(np.floor(term * 1e9))
    return pd.DataFrame(
        {
            "n_a": [Na],
            "n_b": [Nb],
            "n_buckets_used": [used],
            "psi_nano": [acc],
        }
    ).astype(
        {
            "n_a": np.int64,
            "n_b": np.int64,
            "n_buckets_used": np.int64,
            "psi_nano": np.int64,
        }
    )


SQL_PSI_COHORTS_EVENTS = f"""
WITH u AS (
  SELECT user_id % 2 AS cohort,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
mm AS (SELECT min(x) AS lo, max(x) AS hi FROM u),
thr AS (
  SELECT DISTINCT CAST((SELECT lo FROM mm)
         + (i * ((SELECT hi FROM mm) - (SELECT lo FROM mm)))
           // {PSI_BUCKETS} AS BIGINT) AS t
  FROM generate_series(1, {PSI_BUCKETS - 1}) g(i)
),
bkt AS (
  SELECT u.cohort,
         (SELECT count(*) FROM thr WHERE thr.t < u.x) AS bucket
  FROM u
),
h AS (
  SELECT bucket,
         CAST(count(*) FILTER (cohort = 0) AS BIGINT) AS na,
         CAST(count(*) FILTER (cohort = 1) AS BIGINT) AS nb
  FROM bkt GROUP BY bucket
),
nn AS (SELECT CAST(sum(na) AS BIGINT) AS Na,
              CAST(sum(nb) AS BIGINT) AS Nb FROM h),
terms AS (
  SELECT CAST(floor((na * 1.0 / (SELECT Na FROM nn)
                     - nb * 1.0 / (SELECT Nb FROM nn))
                    * ln((na * 1.0 / (SELECT Na FROM nn))
                         / (nb * 1.0 / (SELECT Nb FROM nn)))
                    * 1e9) AS BIGINT) AS ti
  FROM h WHERE na > 0 AND nb > 0
)
SELECT (SELECT Na FROM nn) AS n_a,
       (SELECT Nb FROM nn) AS n_b,
       (SELECT CAST(count(*) AS BIGINT) FROM terms)
         AS n_buckets_used,
       CAST(COALESCE((SELECT sum(ti) FROM terms), 0) AS BIGINT)
         AS psi_nano
"""


REGISTRY.update({'psi_cohorts_events': (
            q_psi_cohorts_events,
            SQL_PSI_COHORTS_EVENTS,
        )})


def q_transition_entropy_events(sf_dir: str):
    """Conditional entropy H(next | prev) of the user event streams —
    how predictable the next event type is given the current one (the
    information-theoretic companion of markov_accuracy_events, read
    off the SAME types^2-bounded transition table): H = -sum_{p,n}
    P(p,n) * ln(n_pn / n_p), each cell's term microlog-quantized to
    an exact integer so the sum is order-independent."""
    import math

    from ..functions.hashing import hash_strings

    ev = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    B = 64

    def pre(b: pa.Table) -> pa.Table:
        h = hash_strings(
            b["user_id"].to_numpy(zero_copy_only=False).astype("U")
        )
        return pa.table(
            {
                "bucket": pa.array(
                    (h % np.uint64(B)).astype(np.int64)
                ),
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "event_type": b["event_type"],
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        same = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        prev = g["event_type"].to_numpy()[:-1][same]
        nxt = g["event_type"].to_numpy()[1:][same]
        return (
            pd.DataFrame({"prev": prev, "next": nxt})
            .groupby(["prev", "next"], sort=False)
            .size()
            .reset_index(name="n")
        )

    counts = (
        ev.map_batches(pre, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["prev", "next"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = int(counts["n"].sum())
    row_tot = counts.groupby("prev")["n"].transform("sum")
    acc = 0
    for n_pn, n_p in zip(
        counts["n"].to_numpy(np.int64), row_tot.to_numpy(np.int64)
    ):
        term = -(int(n_pn) * 1.0 / total) * math.log(
            int(n_pn) * 1.0 / int(n_p)
        )
        acc += int(np.floor(term * 1e9))
    return pd.DataFrame(
        {"n_pairs": [total], "cond_entropy_nano": [acc]}
    ).astype({"n_pairs": np.int64, "cond_entropy_nano": np.int64})


SQL_TRANSITION_ENTROPY_EVENTS = """
WITH p AS (
  SELECT event_type AS prev,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next
  FROM events
),
c AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS n
      FROM p WHERE next IS NOT NULL GROUP BY 1, 2),
rt AS (SELECT prev, CAST(sum(n) AS BIGINT) AS np FROM c GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
terms AS (
  SELECT CAST(floor(-(c.n * 1.0 / (SELECT total FROM tot))
                    * ln(c.n * 1.0 / rt.np) * 1e9) AS BIGINT) AS ti
  FROM c JOIN rt ON rt.prev = c.prev
)
SELECT (SELECT total FROM tot) AS n_pairs,
       CAST(sum(ti) AS BIGINT) AS cond_entropy_nano
FROM terms
"""


REGISTRY.update({'transition_entropy_events': (
            q_transition_entropy_events,
            SQL_TRANSITION_ENTROPY_EVENTS,
        )})


def q_theilsen_hours(sf_dir: str):
    """Theil-Sen robust trend of the hourly event-count series — the
    outlier-immune slope estimator (median of all pairwise slopes)
    monitoring pipelines prefer over OLS. The hourly count table is
    time-bounded (one exchange of per-batch partials); the pairwise
    slope enumeration is bounded-squared and fully vectorized on the
    driver, with the median picked by the same float ordering the
    oracle uses (identical per-pair expression), floor-quantized."""
    ds = _pq(sf_dir, "events", ["ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = _date_us(b["ts"]) // (3600 * 1_000_000)
        u, n = np.unique(t, return_counts=True)
        return pa.table(
            {
                "hour": pa.array(u, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("hour")
    )
    t = h["hour"].to_numpy(np.int64)
    c = h["n"].to_numpy(np.int64)
    i, j = np.triu_indices(len(t), k=1)
    slopes = (c[j] - c[i]) * 1.0 / (t[j] - t[i])
    slopes.sort(kind="stable")
    m = len(slopes)
    if m % 2:
        med = slopes[m // 2]
    else:
        med = (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0
    return pd.DataFrame(
        {
            "n_hours": [len(t)],
            "n_pairs": [m],
            "slope_per_hour": [float(np.floor(med * 1e6) / 1e6)],
        }
    ).astype({"n_hours": np.int64, "n_pairs": np.int64})


SQL_THEILSEN_HOURS = """
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
p AS (
  SELECT (b.n - a.n) * 1.0 / (b.hour - a.hour) AS slope
  FROM h a JOIN h b ON b.hour > a.hour
),
o AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
             count(*) OVER () AS m
      FROM p)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM h) AS n_hours,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_pairs,
       floor(CASE WHEN (SELECT max(m) FROM o) % 2 = 1
                  THEN (SELECT slope FROM o
                        WHERE rn = (m + 1) // 2)
                  ELSE ((SELECT slope FROM o WHERE rn = m // 2)
                        + (SELECT slope FROM o WHERE rn = m // 2 + 1))
                       / 2.0 END * 1e6) / 1e6 AS slope_per_hour
"""


REGISTRY.update({'theilsen_hours': (q_theilsen_hours, SQL_THEILSEN_HOURS)})


def q_spearman_users(sf_dir: str):
    """Spearman rank correlation between per-user total spend and
    purchase count — the monotone-association metric that ignores the
    spend distribution's heavy tail. Ranks are row_numbers under a
    DETERMINISTIC (value, user_id) order, so both rank vectors are
    exact integers and every Pearson-on-ranks moment (sum r, sum r^2,
    sum r1*r2) folds as integers; the final correlation is one
    mirrored float expression. The per-user fold is the only
    data-sized exchange (the rank assignment itself is user-bounded,
    with the rank_global_orders value-bucket machinery as the
    beyond-driver plan)."""
    users = _stump_user_table(sf_dir).to_pandas()
    uid = users["user_id"].to_numpy(np.int64)
    x = users["x"].to_numpy(np.int64)
    p = users["np"].to_numpy(np.int64)
    rx = np.empty(len(uid), np.int64)
    rx[np.lexsort((uid, x))] = np.arange(1, len(uid) + 1)
    rp = np.empty(len(uid), np.int64)
    rp[np.lexsort((uid, p))] = np.arange(1, len(uid) + 1)
    n = len(uid)
    s1 = int(rx.sum())
    s2 = int(rp.sum())
    s11 = int((rx * rx).sum())
    s22 = int((rp * rp).sum())
    s12 = int((rx * rp).sum())
    import math

    num = n * s12 - s1 * s2
    den = math.sqrt((n * s11 - s1 * s1) * 1.0) * math.sqrt(
        (n * s22 - s2 * s2) * 1.0
    )
    rho = np.floor(num * 1.0 / den * 1e6) / 1e6
    return pd.DataFrame(
        {"n": [n], "spearman": [float(rho)]}
    ).astype({"n": np.int64})


SQL_SPEARMAN_USERS = f"""
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np
  FROM events GROUP BY user_id
),
r AS (
  SELECT user_id,
         CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS rx,
         CAST(row_number() OVER (ORDER BY np, user_id) AS BIGINT) AS rp
  FROM u
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rx) AS BIGINT) AS s1,
         CAST(sum(rp) AS BIGINT) AS s2,
         CAST(sum(rx * rx) AS BIGINT) AS s11,
         CAST(sum(rp * rp) AS BIGINT) AS s22,
         CAST(sum(rx * rp) AS BIGINT) AS s12
  FROM r
)
SELECT n,
       floor((n * s12 - s1 * s2) * 1.0
             / (sqrt((n * s11 - s1 * s1) * 1.0)
                * sqrt((n * s22 - s2 * s2) * 1.0)) * 1e6) / 1e6
         AS spearman
FROM m
"""


def q_durbin_watson_hours(sf_dir: str):
    """Durbin-Watson autocorrelation statistic of the hourly
    event-count residuals (e_t = n*c_t - S, the cross-multiplied
    integer residual, so BOTH sums are exact integers and only the
    final ratio is float). The hourly table is time-bounded; counts
    fold through one exchange. DW ~ 2 means no lag-1 correlation."""
    ds = _pq(sf_dir, "events", ["ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = _date_us(b["ts"]) // (3600 * 1_000_000)
        u, n = np.unique(t, return_counts=True)
        return pa.table(
            {
                "hour": pa.array(u, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("hour")
    )
    c = h["n"].to_numpy(np.int64).astype(object)
    n = len(c)
    S = int(sum(c))
    e = [n * int(v) - S for v in c]
    num = sum(
        (e[t] - e[t - 1]) * (e[t] - e[t - 1]) for t in range(1, n)
    )
    den = sum(v * v for v in e)
    dw = np.floor(num * 1.0 / den * 1e6) / 1e6
    return pd.DataFrame(
        {"n_hours": [n], "dw": [float(dw)]}
    ).astype({"n_hours": np.int64})


SQL_DURBIN_WATSON_HOURS = """
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
st AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(c) AS BIGINT) AS s FROM h),
e AS (
  SELECT hour,
         (SELECT n FROM st) * c - (SELECT s FROM st) AS e,
         lag((SELECT n FROM st) * c - (SELECT s FROM st))
           OVER (ORDER BY hour) AS ep
  FROM h
)
SELECT (SELECT n FROM st) AS n_hours,
       floor(CAST(sum((e - ep) * (e - ep))
                  FILTER (ep IS NOT NULL) AS HUGEINT) * 1.0
             / CAST(sum(e * e) AS HUGEINT) * 1e6) / 1e6 AS dw
FROM e
"""


REGISTRY.update({'spearman_users': (q_spearman_users, SQL_SPEARMAN_USERS)})


REGISTRY.update({'durbin_watson_hours': (
            q_durbin_watson_hours,
            SQL_DURBIN_WATSON_HOURS,
        )})


def q_kendall_users(sf_dir: str):
    """Kendall's tau-b between per-user spend and purchase count —
    the concordance-based companion of Spearman, tie-corrected.
    Concordant/discordant/tie counts are exact integers from the
    pairwise comparison over the user-BOUNDED feature table
    (vectorized O(n^2) here; the beyond-driver plan is merge-sort
    inversion counting inside value buckets); tau-b is one mirrored
    float expression."""
    import math

    users = _stump_user_table(sf_dir).to_pandas()
    x = users["x"].to_numpy(np.int64)
    p = users["np"].to_numpy(np.int64)
    n = len(x)
    dx = np.sign(x[:, None] - x[None, :])
    dp = np.sign(p[:, None] - p[None, :])
    iu = np.triu_indices(n, k=1)
    sx, sp = dx[iu], dp[iu]
    C = int(((sx * sp) > 0).sum())
    D = int(((sx * sp) < 0).sum())
    tx = int((sx == 0).sum())  # ties in x (incl. double ties)
    tp = int((sp == 0).sum())
    both = int(((sx == 0) & (sp == 0)).sum())
    n0 = n * (n - 1) // 2
    # tau-b: ties counted per variable (double ties excluded from
    # each variable's correction is the textbook n1/n2 convention:
    # n1 = sum over x-tie groups, n2 = sum over p-tie groups — these
    # are tx and tp as counted above)
    tau = np.floor(
        (C - D)
        * 1.0
        / (
            math.sqrt((n0 - tx) * 1.0)
            * math.sqrt((n0 - tp) * 1.0)
        )
        * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "n": [n],
            "concordant": [C],
            "discordant": [D],
            "tau_b": [float(tau)],
        }
    ).astype({"n": np.int64, "concordant": np.int64, "discordant": np.int64})


SQL_KENDALL_USERS = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np
  FROM events GROUP BY user_id
),
pr AS (
  SELECT sign(b.x - a.x) AS sx, sign(b.np - a.np) AS sp
  FROM u a JOIN u b ON b.user_id > a.user_id
),
m AS (
  SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n,
         CAST(count(*) FILTER (sx * sp > 0) AS BIGINT) AS c,
         CAST(count(*) FILTER (sx * sp < 0) AS BIGINT) AS d,
         CAST(count(*) FILTER (sx = 0) AS BIGINT) AS tx,
         CAST(count(*) FILTER (sp = 0) AS BIGINT) AS tp
  FROM pr
)
SELECT n, c AS concordant, d AS discordant,
       floor((c - d) * 1.0
             / (sqrt((n * (n - 1) // 2 - tx) * 1.0)
                * sqrt((n * (n - 1) // 2 - tp) * 1.0)) * 1e6) / 1e6
         AS tau_b
FROM m
"""


REGISTRY.update({'kendall_users': (q_kendall_users, SQL_KENDALL_USERS)})


def _anova_f(parts: list[tuple[int, int, int]]):
    """(n_g, S_g, Q_g) integer group moments -> (ssb, ssw, F) floats
    via the computational formula with EXPLICIT per-group fold order
    (mirrored in SQL)."""
    n = sum(p[0] for p in parts)
    S = sum(p[1] for p in parts)
    Q = sum(p[2] for p in parts)
    k = len(parts)
    ssb = 0.0
    for ng, sg, _ in parts:
        ssb = ssb + sg * 1.0 * sg / ng
    ssb = ssb - S * 1.0 * S / n
    sst = Q - S * 1.0 * S / n
    ssw = sst - ssb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return ssb, ssw, f, n, k


def q_anova_cohorts(sf_dir: str):
    """One-way ANOVA of per-user spend across the four deterministic
    cohorts (user_id % 4): group moments (n, sum, sum-of-squares) are
    exact integer cents folds, the F statistic is a single float
    expression with explicit per-group fold order mirrored by the
    oracle. One user fold + one 4-row group fold."""
    users = _stump_user_table(sf_dir).to_pandas()
    x = users["x"].to_numpy(np.int64)
    g = users["user_id"].to_numpy(np.int64) % 4
    parts = []
    for c in range(4):
        xs = x[g == c]
        parts.append(
            (len(xs), int(xs.sum()), int((xs.astype(object) ** 2).sum()))
        )
    ssb, ssw, f, n, k = _anova_f(parts)
    return pd.DataFrame(
        {
            "n": [n],
            "f_stat": [float(np.floor(f * 1e6) / 1e6)],
            "ssb": [float(np.floor(ssb * 1e2) / 1e2)],
            "ssw": [float(np.floor(ssw * 1e2) / 1e2)],
        }
    ).astype({"n": np.int64})


SQL_ANOVA_COHORTS = """
WITH u AS (
  SELECT user_id % 4 AS g,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
m AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS q
  FROM u GROUP BY g
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(s) AS BIGINT) AS s,
               CAST(sum(q) AS BIGINT) AS q FROM m),
piv AS (
  SELECT max(CASE WHEN g = 0 THEN s END) AS s0,
         max(CASE WHEN g = 0 THEN n END) AS n0,
         max(CASE WHEN g = 1 THEN s END) AS s1,
         max(CASE WHEN g = 1 THEN n END) AS n1,
         max(CASE WHEN g = 2 THEN s END) AS s2,
         max(CASE WHEN g = 2 THEN n END) AS n2,
         max(CASE WHEN g = 3 THEN s END) AS s3,
         max(CASE WHEN g = 3 THEN n END) AS n3
  FROM m
),
f AS (
  SELECT (SELECT n FROM tot) AS n,
         ((((0.0 + s0 * 1.0 * s0 / n0) + s1 * 1.0 * s1 / n1)
           + s2 * 1.0 * s2 / n2) + s3 * 1.0 * s3 / n3)
           - (SELECT s FROM tot) * 1.0 * (SELECT s FROM tot)
             / (SELECT n FROM tot) AS ssb,
         (SELECT q FROM tot)
           - (SELECT s FROM tot) * 1.0 * (SELECT s FROM tot)
             / (SELECT n FROM tot) AS sst
  FROM piv
)
SELECT n,
       floor((ssb / 3) / ((sst - ssb) / (n - 4)) * 1e6) / 1e6
         AS f_stat,
       floor(ssb * 1e2) / 1e2 AS ssb,
       floor((sst - ssb) * 1e2) / 1e2 AS ssw
FROM f
"""


REGISTRY.update({'anova_cohorts': (q_anova_cohorts, SQL_ANOVA_COHORTS)})


#: churn rule for the survival curve: inactive for the final day of
#: the log (the synthetic users ping near-daily; max silence ~2.4 d)
KM_CHURN_DAYS = 1


def q_kaplan_meier_churn(sf_dir: str):
    """Kaplan-Meier survival curve of user lifetime (first to last
    activity, churn observed when the user has been silent for the
    final 30 days of the log, censored otherwise) — survival analysis
    in LOG space so nothing needs a float product: each factor
    ln(1 - d/n) nanounit-quantizes (math.log == DuckDB ln) and the
    curve is the exact integer running sum over ordered event times.
    One per-user (first, last) fold; the KM sweep runs over the
    user-bounded duration table."""
    import math

    from ray.data.aggregate import Max, Min

    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
            }
        )

    spans = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("t", alias_name="t0"), Max("t", alias_name="t1"))
        .to_pandas()
    )
    day = 24 * 3600 * 1_000_000
    tmax = int(spans["t1"].max())
    dur = (
        (spans["t1"].to_numpy(np.int64) - spans["t0"].to_numpy(np.int64))
        // day
    ).astype(np.int64)
    churned = (
        spans["t1"].to_numpy(np.int64) <= tmax - KM_CHURN_DAYS * day
    ).astype(np.int64)
    order = np.argsort(dur, kind="mergesort")
    dur, churned = dur[order], churned[order]
    times = np.unique(dur[churned == 1])
    n_total = len(dur)
    rows = []
    logs = 0
    for t in times:
        n_risk = int((dur >= t).sum())
        d = int(((dur == t) & (churned == 1)).sum())
        logs += int(np.floor(math.log(1.0 - d * 1.0 / n_risk) * 1e9))
        rows.append((int(t), n_risk, d, logs))
    return pd.DataFrame(
        rows, columns=["t_days", "n_risk", "d", "log_surv_nano"]
    ).astype(np.int64)


SQL_KAPLAN_MEIER_CHURN = f"""
WITH u AS (
  SELECT user_id,
         CAST(epoch_us(min(ts)) AS BIGINT) AS t0,
         CAST(epoch_us(max(ts)) AS BIGINT) AS t1
  FROM events GROUP BY user_id
),
mx AS (SELECT CAST(max(t1) AS BIGINT) AS tmax FROM u),
d AS (
  SELECT (t1 - t0) // 86400000000 AS dur,
         CASE WHEN t1 <= (SELECT tmax FROM mx)
                         - {KM_CHURN_DAYS} * 86400000000
              THEN 1 ELSE 0 END AS churned
  FROM u
),
ev AS (
  SELECT dur AS t,
         CAST(sum(churned) AS BIGINT) AS dd
  FROM d GROUP BY dur HAVING sum(churned) > 0
),
km AS (
  SELECT ev.t, ev.dd,
         (SELECT CAST(count(*) AS BIGINT) FROM d
          WHERE d.dur >= ev.t) AS n_risk
  FROM ev
)
SELECT t AS t_days, n_risk, dd AS d,
       CAST(sum(CAST(floor(ln(1.0 - dd * 1.0 / n_risk) * 1e9)
                     AS BIGINT)) OVER (ORDER BY t) AS BIGINT)
         AS log_surv_nano
FROM km ORDER BY t
"""


REGISTRY.update({'kaplan_meier_churn': (
            q_kaplan_meier_churn,
            SQL_KAPLAN_MEIER_CHURN,
        )})


def q_logrank_cohorts(sf_dir: str):
    """Log-rank test between the two cohorts' churn survival curves
    (the Kaplan-Meier companion): at each churn time, cohort-0's
    expected events E = d * n0/n and the hypergeometric variance fold
    as NANOUNIT-quantized terms over exact integer risk counts, so
    both running sums are order-independent integers; the final
    chi-square is one mirrored float expression. Same per-user span
    fold as kaplan_meier_churn."""
    from ray.data.aggregate import Max, Min

    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
            }
        )

    spans = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("t", alias_name="t0"), Max("t", alias_name="t1"))
        .to_pandas()
    )
    day = 24 * 3600 * 1_000_000
    tmax = int(spans["t1"].max())
    dur = (
        (spans["t1"].to_numpy(np.int64) - spans["t0"].to_numpy(np.int64))
        // day
    ).astype(np.int64)
    churned = (
        spans["t1"].to_numpy(np.int64)
        <= tmax - KM_CHURN_DAYS * day
    ).astype(np.int64)
    grp = spans["user_id"].to_numpy(np.int64) % 2
    times = np.unique(dur[churned == 1])
    o0 = 0
    e_nano = 0
    v_nano = 0
    for t in times:
        at = dur >= t
        n = int(at.sum())
        n0 = int((at & (grp == 0)).sum())
        ev = (dur == t) & (churned == 1)
        d = int(ev.sum())
        d0 = int((ev & (grp == 0)).sum())
        o0 += d0
        e = d * 1.0 * n0 / n
        e_nano += int(np.floor(e * 1e9))
        if n > 1:
            v = (
                d * 1.0 * n0 / n
                * (1.0 - n0 * 1.0 / n)
                * (n - d)
                / (n - 1)
            )
            v_nano += int(np.floor(v * 1e9))
    chi2 = np.floor(
        (o0 - e_nano / 1e9)
        * (o0 - e_nano / 1e9)
        / (v_nano / 1e9)
        * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "observed_0": [o0],
            "expected_0_nano": [e_nano],
            "var_nano": [v_nano],
            "logrank_chi2": [float(chi2)],
        }
    ).astype(
        {
            "observed_0": np.int64,
            "expected_0_nano": np.int64,
            "var_nano": np.int64,
        }
    )


SQL_LOGRANK_COHORTS = f"""
WITH u AS (
  SELECT user_id,
         CAST(epoch_us(min(ts)) AS BIGINT) AS t0,
         CAST(epoch_us(max(ts)) AS BIGINT) AS t1
  FROM events GROUP BY user_id
),
mx AS (SELECT CAST(max(t1) AS BIGINT) AS tmax FROM u),
d AS (
  SELECT user_id % 2 AS g,
         (t1 - t0) // 86400000000 AS dur,
         CASE WHEN t1 <= (SELECT tmax FROM mx)
                         - {KM_CHURN_DAYS} * 86400000000
              THEN 1 ELSE 0 END AS churned
  FROM u
),
ev AS (
  SELECT dur AS t,
         CAST(sum(churned) AS BIGINT) AS dd,
         CAST(sum(CASE WHEN g = 0 THEN churned ELSE 0 END)
              AS BIGINT) AS d0
  FROM d GROUP BY dur HAVING sum(churned) > 0
),
terms AS (
  SELECT ev.t, ev.dd, ev.d0,
         (SELECT CAST(count(*) AS BIGINT) FROM d
          WHERE d.dur >= ev.t) AS n,
         (SELECT CAST(count(*) AS BIGINT) FROM d
          WHERE d.dur >= ev.t AND d.g = 0) AS n0
  FROM ev
),
agg AS (
  SELECT CAST(sum(d0) AS BIGINT) AS o0,
         CAST(sum(CAST(floor(dd * 1.0 * n0 / n * 1e9) AS BIGINT))
              AS BIGINT) AS e_nano,
         CAST(sum(CASE WHEN n > 1 THEN
                CAST(floor(dd * 1.0 * n0 / n * (1.0 - n0 * 1.0 / n)
                           * (n - dd) / (n - 1) * 1e9) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS v_nano
  FROM terms
)
SELECT o0 AS observed_0, e_nano AS expected_0_nano,
       v_nano AS var_nano,
       floor((o0 - e_nano / 1e9) * (o0 - e_nano / 1e9)
             / (v_nano / 1e9) * 1e6) / 1e6 AS logrank_chi2
FROM agg
"""


REGISTRY.update({'logrank_cohorts': (q_logrank_cohorts, SQL_LOGRANK_COHORTS)})


def q_uniformity_hours(sf_dir: str):
    """Chi-square uniformity test of event arrival over hour-of-day —
    the load-skew detector: chi2 = sum (24*n_h - N)^2 / (24*N) keeps
    the numerator an exact integer sum (cross-multiplied against the
    uniform expectation), with a single quantized division. One
    24-row exchange."""
    ds = _pq(sf_dir, "events", ["ts"])

    def partial(b: pa.Table) -> pa.Table:
        hod = (
            _date_us(b["ts"]) // (3600 * 1_000_000)
        ) % 24
        cnt = np.bincount(hod, minlength=24).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(np.arange(24, dtype=np.int64)),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("h")
    )
    n_h = np.zeros(24, np.int64)
    n_h[h["h"].to_numpy()] = h["n"].to_numpy()
    N = int(n_h.sum())
    num = int(sum((24 * int(x) - N) ** 2 for x in n_h))
    chi2 = np.floor(num * 1.0 / (24 * N) * 1e6) / 1e6
    return pd.DataFrame(
        {"n": [N], "chi2_uniform": [float(chi2)], "dof": [23]}
    ).astype({"n": np.int64, "dof": np.int64})


SQL_UNIFORMITY_HOURS = """
WITH h AS (
  SELECT (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
SELECT (SELECT total FROM t) AS n,
       floor(CAST(sum((24 * n - (SELECT total FROM t))
                      * (24 * n - (SELECT total FROM t))) AS BIGINT)
             * 1.0 / (24 * (SELECT total FROM t)) * 1e6) / 1e6
         AS chi2_uniform,
       CAST(23 AS BIGINT) AS dof
FROM h
"""


REGISTRY.update({'uniformity_hours': (q_uniformity_hours, SQL_UNIFORMITY_HOURS)})


def q_kruskal_hours(sf_dir: str):
    """Kruskal-Wallis H across hour-of-day groups — the
    nonparametric ANOVA (does spend RANK differ by hour?). Ranks are
    globally unique under (cents, event_id), assigned WITHOUT a
    global sort: a distinct-cents-bounded count table broadcasts as
    a sorted CDF (rank base = #values strictly smaller), and
    within-value tie positions resolve inside coarse value-hash
    buckets — so per-group rank sums fold as exact integers through
    one exchange. Each R_g^2/n_g term milli-quantizes to an integer
    (Python int / HUGEINT) before the order-independent sum; H is
    one mirrored float expression."""
    from ..functions.hashing import splitmix64

    ds = _pq(sf_dir, "events", ["event_id", "ts", "value"])

    def val_partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, n = np.unique(cents, return_counts=True)
        return pa.table(
            {
                "v": pa.array(u, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    vals = (
        ds.map_batches(val_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("v")
    )
    v_sorted = vals["v"].to_numpy(np.int64)
    cum_less = np.r_[0, np.cumsum(vals["n"].to_numpy(np.int64))[:-1]]
    B = 64

    def pre(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        g = (
            (_date_us(b["ts"]) // (3600 * 1_000_000)) % 24
        ).astype(np.int64)
        bucket = (
            splitmix64(cents.astype(np.uint64)) % np.uint64(B)
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "v": pa.array(cents, pa.int64()),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "g": pa.array(g, pa.int64()),
            }
        )

    def per_bucket(gd: pd.DataFrame) -> pd.DataFrame:
        gd = gd.sort_values(["v", "event_id"], kind="mergesort")
        v = gd["v"].to_numpy(np.int64)
        gg = gd["g"].to_numpy(np.int64)
        new = np.r_[True, v[1:] != v[:-1]]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        tie = np.arange(len(v), dtype=np.int64) - starts[seg] + 1
        base = cum_less[np.searchsorted(v_sorted, v)]
        rnk = base + tie
        out = (
            pd.DataFrame({"g": gg, "r": rnk})
            .groupby("g", sort=False)
            .agg(r=("r", "sum"), n=("r", "size"))
            .reset_index()
        )
        return out.astype(np.int64)

    rg = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
        .groupby("g")
        .sum()
        .reset_index()
    )
    N = int(rg["n"].sum())
    s_q = 0
    for _, row in rg.iterrows():
        r = int(row["r"]) * 1.0
        t = r * r / int(row["n"])
        s_q += int(np.floor(t * 1e3))
    h = np.floor(
        (
            12.0 / (N * (N + 1.0)) * (float(s_q) / 1e3)
            - 3.0 * (N + 1.0)
        )
        * 1e6
    ) / 1e6
    return pd.DataFrame(
        {"n": [N], "groups": [len(rg)], "h_stat": [float(h)]}
    ).astype({"n": np.int64, "groups": np.int64})


SQL_KRUSKAL_HOURS = """
WITH r AS (
  SELECT (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS g,
         CAST(row_number() OVER (
           ORDER BY CAST(round(value * 100.0) AS BIGINT), event_id)
         AS BIGINT) AS rnk
  FROM events
),
rg AS (
  SELECT g, CAST(sum(rnk) AS HUGEINT) AS r,
         CAST(count(*) AS BIGINT) AS n
  FROM r GROUP BY g
),
st AS (SELECT CAST(sum(n) AS BIGINT) AS n,
              CAST(count(*) AS BIGINT) AS k FROM rg),
terms AS (
  SELECT CAST(floor((r * 1.0) * (r * 1.0) / n * 1e3) AS HUGEINT) AS t
  FROM rg
)
SELECT (SELECT n FROM st) AS n,
       (SELECT k FROM st) AS groups,
       floor((12.0 / ((SELECT n FROM st)
                      * ((SELECT n FROM st) + 1.0))
              * (CAST((SELECT sum(t) FROM terms) AS DOUBLE) / 1e3)
              - 3.0 * ((SELECT n FROM st) + 1.0)) * 1e6) / 1e6
         AS h_stat
"""


REGISTRY.update({'kruskal_hours': (q_kruskal_hours, SQL_KRUSKAL_HOURS)})


def q_partial_corr_users(sf_dir: str):
    """Partial correlation between per-user spend and purchase count
    CONTROLLING for total activity — the confounder-adjusted
    association (busy users buy more of everything). All three
    pairwise Pearson correlations come from one user fold's exact
    integer moments; the partial r is one mirrored float expression
    r_xy.z = (rxy - rxz*ryz) / (sqrt(1-rxz^2) * sqrt(1-ryz^2))."""
    import math

    ds = _pq(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        isp = (
            pc.equal(b["event_type"], "purchase")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        us, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "x": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
                "y": pa.array(
                    np.bincount(inv, weights=isp).astype(np.int64),
                    pa.int64(),
                ),
                "z": pa.array(
                    np.bincount(inv).astype(np.int64), pa.int64()
                ),
            }
        )

    users = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("x", alias_name="x"),
            Sum("y", alias_name="y"),
            Sum("z", alias_name="z"),
        )
        .to_pandas()
    )
    x = users["x"].to_numpy(np.int64).astype(object)
    y = users["y"].to_numpy(np.int64).astype(object)
    z = users["z"].to_numpy(np.int64).astype(object)
    n = len(x)

    def corr(a, b_):
        sa, sb = int(sum(a)), int(sum(b_))
        sab = int(sum(p * q for p, q in zip(a, b_)))
        saa = int(sum(p * p for p in a))
        sbb = int(sum(q * q for q in b_))
        return (n * sab - sa * sb) * 1.0 / (
            math.sqrt((n * saa - sa * sa) * 1.0)
            * math.sqrt((n * sbb - sb * sb) * 1.0)
        )

    rxy, rxz, ryz = corr(x, y), corr(x, z), corr(y, z)
    pr = np.floor(
        (rxy - rxz * ryz)
        / (math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz))
        * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "n": [n],
            "r_xy": [float(np.floor(rxy * 1e6) / 1e6)],
            "partial_r": [float(pr)],
        }
    ).astype({"n": np.int64})


SQL_PARTIAL_CORR_USERS = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS z
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(z) AS HUGEINT) AS sz,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(x * z) AS HUGEINT) AS sxz,
         CAST(sum(y * z) AS HUGEINT) AS syz,
         CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(y * y) AS HUGEINT) AS syy,
         CAST(sum(z * z) AS HUGEINT) AS szz
  FROM u
),
r AS (
  SELECT n,
         (n * sxy - sx * sy) * 1.0
           / (sqrt((n * sxx - sx * sx) * 1.0)
              * sqrt((n * syy - sy * sy) * 1.0)) AS rxy,
         (n * sxz - sx * sz) * 1.0
           / (sqrt((n * sxx - sx * sx) * 1.0)
              * sqrt((n * szz - sz * sz) * 1.0)) AS rxz,
         (n * syz - sy * sz) * 1.0
           / (sqrt((n * syy - sy * sy) * 1.0)
              * sqrt((n * szz - sz * sz) * 1.0)) AS ryz
  FROM m
)
SELECT n, floor(rxy * 1e6) / 1e6 AS r_xy,
       floor((rxy - rxz * ryz)
             / (sqrt(1.0 - rxz * rxz) * sqrt(1.0 - ryz * ryz))
             * 1e6) / 1e6 AS partial_r
FROM r
"""


REGISTRY.update({'partial_corr_users': (q_partial_corr_users, SQL_PARTIAL_CORR_USERS)})


def q_runs_test_hours(sf_dir: str):
    """Wald-Wolfowitz runs test on the hourly count series vs its
    median: too FEW runs of above/below-median hours means clustered
    load, too many means oscillation. Runs, n_above and n_below are
    exact integers over the time-bounded hourly table (median = the
    lower middle order statistic, an explicit integer convention);
    the z-score against the expected run count is one mirrored float
    expression."""
    import math

    ds = _pq(sf_dir, "events", ["ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = _date_us(b["ts"]) // (3600 * 1_000_000)
        u, n = np.unique(t, return_counts=True)
        return pa.table(
            {
                "hour": pa.array(u, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("hour")
    )
    c = h["n"].to_numpy(np.int64)
    m = len(c)
    med = int(np.sort(c)[(m - 1) // 2])  # lower median
    sign = c > med  # strictly-above vs at-or-below
    n1 = int(sign.sum())
    n2 = m - n1
    runs = 1 + int((sign[1:] != sign[:-1]).sum())
    exp_r = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var_r = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    z = np.floor((runs - exp_r) / math.sqrt(var_r) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n_hours": [m],
            "runs": [runs],
            "n_above": [n1],
            "z": [float(z)],
        }
    ).astype({"n_hours": np.int64, "runs": np.int64, "n_above": np.int64})


SQL_RUNS_TEST_HOURS = """
WITH h AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
med AS (
  SELECT c AS m FROM (
    SELECT c, row_number() OVER (ORDER BY c) AS rn,
           count(*) OVER () AS cnt
    FROM h) WHERE rn = (cnt + 1) // 2
),
s AS (
  SELECT hour, CASE WHEN c > (SELECT m FROM med)
                    THEN 1 ELSE 0 END AS sgn
  FROM h
),
w AS (
  SELECT sgn, lag(sgn) OVER (ORDER BY hour) AS prev FROM s
),
m AS (
  SELECT CAST((SELECT count(*) FROM h) AS BIGINT) AS mh,
         CAST((SELECT sum(sgn) FROM s) AS BIGINT) AS n1,
         CAST(1 + (SELECT count(*) FROM w
                   WHERE prev IS NOT NULL AND sgn <> prev)
              AS BIGINT) AS runs
)
SELECT mh AS n_hours, runs, n1 AS n_above,
       floor((runs - (1.0 + 2.0 * n1 * (mh - n1) / (n1 + (mh - n1))))
             / sqrt(2.0 * n1 * (mh - n1)
                    * (2.0 * n1 * (mh - n1) - n1 - (mh - n1))
                    / ((n1 + (mh - n1)) * (n1 + (mh - n1))
                       * (n1 + (mh - n1) - 1.0)))
             * 1e6) / 1e6 AS z
FROM m
"""


REGISTRY.update({'runs_test_hours': (q_runs_test_hours, SQL_RUNS_TEST_HOURS)})


def q_bartlett_cohorts(sf_dir: str):
    """Bartlett's test of equal variances across the four spend
    cohorts — the assumption check behind anova_cohorts, computed
    from the same exact integer group moments: each sample variance
    is (n*q - s^2) / (n*(n-1)) mirrored, the pooled variance and
    both correction sums fold in explicit group order, and ln is
    ulp-identical on both engines."""
    import math

    users = _stump_user_table(sf_dir).to_pandas()
    x = users["x"].to_numpy(np.int64)
    g = users["user_id"].to_numpy(np.int64) % 4
    moments = []
    for c in range(4):
        xs = x[g == c].astype(object)
        moments.append(
            (len(xs), int(sum(xs)), int(sum(v * v for v in xs)))
        )
    k = 4
    N = sum(m[0] for m in moments)
    var = [
        (n * q - s * s) * 1.0 / (n * (n - 1)) for n, s, q in moments
    ]
    sp = 0.0
    for (n, _s, _q), v in zip(moments, var):
        sp = sp + (n - 1) * v
    sp = sp / (N - k)
    lnsum = 0.0
    inv = 0.0
    for (n, _s, _q), v in zip(moments, var):
        lnsum = lnsum + (n - 1) * math.log(v)
        inv = inv + 1.0 / (n - 1)
    stat = ((N - k) * math.log(sp) - lnsum) / (
        1.0 + (inv - 1.0 / (N - k)) / (3.0 * (k - 1))
    )
    return pd.DataFrame(
        {
            "n": [N],
            "k": [k],
            "bartlett_chi2": [float(np.floor(stat * 1e6) / 1e6)],
        }
    ).astype({"n": np.int64, "k": np.int64})


SQL_BARTLETT_COHORTS = """
WITH u AS (
  SELECT user_id % 4 AS g,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
m AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS HUGEINT) AS s,
         CAST(sum(x * x) AS HUGEINT) AS q
  FROM u GROUP BY g
),
v AS (
  SELECT g, n, (n * q - s * s) * 1.0 / (n * (n - 1)) AS var
  FROM m
),
piv AS (
  SELECT max(CASE WHEN g = 0 THEN n END) AS n0,
         max(CASE WHEN g = 0 THEN var END) AS v0,
         max(CASE WHEN g = 1 THEN n END) AS n1,
         max(CASE WHEN g = 1 THEN var END) AS v1,
         max(CASE WHEN g = 2 THEN n END) AS n2,
         max(CASE WHEN g = 2 THEN var END) AS v2,
         max(CASE WHEN g = 3 THEN n END) AS n3,
         max(CASE WHEN g = 3 THEN var END) AS v3,
         CAST(sum(n) AS BIGINT) AS nn
  FROM v
)
SELECT nn AS n, CAST(4 AS BIGINT) AS k,
       floor(((nn - 4) * ln(((((0.0 + (n0 - 1) * v0)
                                + (n1 - 1) * v1)
                               + (n2 - 1) * v2)
                              + (n3 - 1) * v3) / (nn - 4))
              - ((((0.0 + (n0 - 1) * ln(v0)) + (n1 - 1) * ln(v1))
                  + (n2 - 1) * ln(v2)) + (n3 - 1) * ln(v3)))
             / (1.0 + (((((0.0 + 1.0 / (n0 - 1)) + 1.0 / (n1 - 1))
                         + 1.0 / (n2 - 1)) + 1.0 / (n3 - 1))
                       - 1.0 / (nn - 4)) / (3.0 * 3))
             * 1e6) / 1e6 AS bartlett_chi2
FROM piv
"""


REGISTRY.update({'bartlett_cohorts': (q_bartlett_cohorts, SQL_BARTLETT_COHORTS)})


# ================================================= round-4 additions
# Scale-pattern queries: incremental-view partial-state merge,
# windowed streaming dedup, and an aggregate composed over the
# adaptive kgquery exchange.


def q_incremental_agg_events(sf_dir: str):
    """Incremental view maintenance (IVM) — the continuously-ingested
    aggregate pattern at 100 TB: the events table is split at a fixed
    event-time cutoff into BASE and DELTA; each side folds to
    MERGEABLE per-type partial states (count, integer micro-unit sum,
    min/max value) with per-batch pre-aggregation so only
    |types|-bounded partials reach either exchange; the two state
    tables then merge driver-side (types-bounded) and finalize.
    Oracle: the plain full-table GROUP BY — proving merged
    incremental state == full recompute, the IVM invariant the
    reference's per-paper re-extraction loop never needed but a
    streaming store does. Micro-units (value x 1e6, rounded) keep the
    fold exact under any partitioning."""
    from ray.data.aggregate import Count, Max, Min, Sum

    # fixed event-time split point: 2024-01-15T00:00Z — mid-range of
    # the synth events table, so BOTH sides carry real rows and the
    # merge step is exercised (an empty side is still correct)
    cutoff_us = 1_705_276_800_000_000

    def states(ds):
        def partial(b: pa.Table) -> pa.Table:
            et = b["event_type"].to_numpy(zero_copy_only=False)
            v = b["value"].to_numpy(zero_copy_only=False)
            micro = np.rint(v * 1e6).astype(np.int64)
            df = (
                pd.DataFrame({"event_type": et, "micro": micro})
                .groupby("event_type", sort=False)
                .agg(
                    n=("micro", "size"),
                    s=("micro", "sum"),
                    mn=("micro", "min"),
                    mx=("micro", "max"),
                )
                .reset_index()
            )
            return pa.Table.from_pandas(df, preserve_index=False)

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(
                Sum("n", alias_name="n"),
                Sum("s", alias_name="s"),
                Min("mn", alias_name="mn"),
                Max("mx", alias_name="mx"),
            )
            .to_pandas()  # |event types| rows — driver-bounded
        )

    ds = _pq(sf_dir, "events", ["ts", "event_type", "value"])

    def side(keep_base: bool):
        def fn(b: pa.Table) -> pa.Table:
            us = pc.cast(b["ts"], pa.int64())
            m = (
                pc.less(us, cutoff_us)
                if keep_base
                else pc.greater_equal(us, cutoff_us)
            )
            return b.filter(m)

        return fn

    base = states(ds.map_batches(side(True), batch_format="pyarrow"))
    delta = states(ds.map_batches(side(False), batch_format="pyarrow"))
    # merge the two state tables — the IVM step (associative folds)
    merged = (
        pd.concat([base, delta], ignore_index=True)
        .groupby("event_type", sort=True)
        .agg(n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"),
             mx=("mx", "max"))
        .reset_index()
    )
    merged["sum_value"] = (merged.pop("s") / 1e6).round(4)
    merged["min_value"] = (merged.pop("mn") / 1e6).round(6)
    merged["max_value"] = (merged.pop("mx") / 1e6).round(6)
    return merged[
        ["event_type", "n", "sum_value", "min_value", "max_value"]
    ]


SQL_INCREMENTAL_AGG_EVENTS = """
SELECT event_type,
       count(*) AS n,
       round(sum(round(value * 1e6) / 1e6), 4) AS sum_value,
       round(min(round(value * 1e6) / 1e6), 6) AS min_value,
       round(max(round(value * 1e6) / 1e6), 6) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_window_dedup_events(sf_dir: str):
    """Streaming windowed dedup: an event is a duplicate when the
    same (user_id, event_type) already fired inside the same 1h
    tumbling event-time window; output = kept events per type. The
    exchange ships only per-batch-DEDUPED (user, type, window) keys
    (the partial-distinct shrink — duplicates die in the map side),
    then a coarse hash(user)-bucketed group finishes the distinct;
    per-type counts fold from |buckets| x |types| partials. The
    streaming analog: a keyed TTL cache, expressed as its batch
    equivalent."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import splitmix64

    ds = _pq(sf_dir, "events", ["ts", "user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        win = us // 3_600_000_000
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"user_id": u, "event_type": et, "win": win}
        ).drop_duplicates()
        bucket = (
            splitmix64(df["user_id"].to_numpy().astype(np.uint64))
            % np.uint64(COARSE_USER_BUCKETS)
        ).astype(np.int64)
        df["bucket"] = bucket
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        kept = g.drop_duplicates(["user_id", "event_type", "win"])
        out = (
            kept.groupby("event_type", sort=False)
            .size()
            .reset_index(name="kept")
        )
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finish, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("kept", alias_name="kept"))
        .sort("event_type")
    )


SQL_WINDOW_DEDUP_EVENTS = """
SELECT event_type, count(*) AS kept FROM (
  SELECT DISTINCT user_id, event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win
  FROM events)
GROUP BY event_type ORDER BY event_type
"""


REGISTRY.update({'incremental_agg_events': (
            q_incremental_agg_events,
            SQL_INCREMENTAL_AGG_EVENTS,
        )})


REGISTRY.update({'window_dedup_events': (
            q_window_dedup_events,
            SQL_WINDOW_DEDUP_EVENTS,
        )})


# --------------------------------------------------- TTL dedup (events)


TTL_DEDUP_US = 1_800_000_000  # 30 min of event time


def q_ttl_dedup_events(sf_dir: str):
    """Streaming TTL dedup with KEPT-ANCHOR semantics over the events
    table: an event survives iff no event with the same
    (user_id, event_type) was KEPT in the preceding 30 min — chains
    re-anchor on kept events, which no single SQL window function
    expresses (LAG compares to the previous ROW). Engine:
    stages/ttl_dedup.py — one coarse hash(key) exchange, per-group
    segmented sweep iterating once per KEPT event. Oracle: recursive
    CTE carrying the anchor down each key's rn-chain (kept iff
    ts == anchor). Output: kept events per type."""
    from ray.data.aggregate import Count

    from ..stages.ttl_dedup import ttl_dedup

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def to_us(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.column_names.index("ts"),
            "ts",
            pc.cast(b["ts"], pa.int64()),
        )

    kept = ttl_dedup(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key_cols=["user_id", "event_type"],
        ts_col="ts",
        ttl_us=TTL_DEDUP_US,
        id_col="event_id",
    )
    return (
        kept.groupby("event_type")
        .aggregate(Count(alias_name="kept"))
        .sort("event_type")
    )


SQL_TTL_DEDUP_EVENTS = f"""
WITH RECURSIVE ordered AS (
  SELECT user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS ts,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
chain AS (
  SELECT user_id, event_type, rn, ts, ts AS anchor
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_type, o.rn, o.ts,
         CASE WHEN o.ts - c.anchor > {TTL_DEDUP_US}
              THEN o.ts ELSE c.anchor END
  FROM ordered o
  JOIN chain c ON o.user_id = c.user_id
              AND o.event_type = c.event_type
              AND o.rn = c.rn + 1
)
SELECT event_type, count(*) AS kept
FROM chain WHERE ts = anchor
GROUP BY event_type ORDER BY event_type
"""


REGISTRY.update({'ttl_dedup_events': (q_ttl_dedup_events, SQL_TTL_DEDUP_EVENTS)})


# --------------------------------------- time-decayed aggregates


DECAY_HALF_LIFE_US = 86_400_000_000  # 1 day of event time


def q_decayed_counts_events(sf_dir: str):
    """Exponentially time-decayed count + value sum per event type —
    the streaming freshness-weighted aggregate (each event contributes
    2^(-(t_ref - ts)/half_life), so yesterday's event counts half of
    today's). t_ref = the table's max ts, computed in the same scan's
    partial fold (no second pass): each batch emits per-type partials
    of (sum 2^(ts/h), sum v*2^(ts/h), max ts) — the decay factors out
    as 2^(-t_ref/h) AFTER the fold, which is what makes this partial-
    aggregable at all. Scale: |types|-bounded exchange; floats enter
    only in the final scaling step, rounded for the value-hash."""
    from ray.data.aggregate import Max, Sum

    h = float(DECAY_HALF_LIFE_US)

    # exponent-range discipline: exp2 of an absolute us/h overflows
    # double (ts ~1.7e15 / 8.6e10 ~ 2e4 -> 2^2e4). Every exponent
    # below is kept RELATIVE: per-batch to the batch min (span
    # asserted < MAX_BATCH_HL half-lives — a batch spanning more
    # fails LOUDLY instead of returning inf), per-partial to its
    # 512-half-life ERA floor (factor < 2^512), and the final
    # era -> t_ref scaling is always <= 0 (underflow to 0.0 is the
    # CORRECT contribution of data thousands of half-lives stale).
    # No fixed calendar epoch anywhere, so arbitrarily-late event
    # times can't push the rebase factor to inf (round-4 advisory).
    MAX_BATCH_HL = 256.0
    ERA_US = int(512 * h)

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False)
        base = int(us.min()) if len(us) else 0
        if len(us) and (int(us.max()) - base) / h >= MAX_BATCH_HL:
            raise ValueError(
                "decayed_counts: one batch spans "
                f"{(int(us.max()) - base) / h:.0f} half-lives "
                f"(>= {MAX_BATCH_HL:.0f}); the per-batch partial would "
                "overflow float64. Shrink the block/batch size or "
                "raise the half-life."
            )
        w = np.exp2((us - base) / h)
        df = pd.DataFrame(
            {"event_type": et, "w": w, "wv": w * v, "mx": us, "base": base}
        )
        g = (
            df.groupby("event_type", sort=False)
            .agg(w=("w", "sum"), wv=("wv", "sum"), mx=("mx", "max"))
            .reset_index()
        )
        g["base"] = base
        return pa.Table.from_pandas(g, preserve_index=False)

    # rebase each partial to its ERA floor (era = base // ERA_US, a
    # DATA-DERIVED grid, not a calendar epoch): factor = 2^((base -
    # era_floor)/h) in [1, 2^512) — always representable. Partials
    # then fold per (event_type, era); cross-era combination happens
    # driver-side over a |types| x |eras| table with non-positive
    # exponents only.
    def rebase(b: pa.Table) -> pa.Table:
        base = b["base"].to_numpy(zero_copy_only=False).astype(np.int64)
        era = base // ERA_US
        f = np.exp2((base - era * ERA_US) / h)
        return pa.table(
            {
                "event_type": b["event_type"],
                "era": pa.array(era, pa.int64()),
                "w": pa.array(
                    b["w"].to_numpy(zero_copy_only=False) * f
                ),
                "wv": pa.array(
                    b["wv"].to_numpy(zero_copy_only=False) * f
                ),
                "mx": b["mx"],
            }
        )

    folded = (
        _pq(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(rebase, batch_format="pyarrow")
        .groupby(["event_type", "era"])
        .aggregate(
            Sum("w", alias_name="w"),
            Sum("wv", alias_name="wv"),
            Max("mx", alias_name="mx"),
        )
        .to_pandas()  # |types| x |eras| rows (eras = span/512 HL)
    )
    t_ref = int(folded["mx"].max())
    # era_floor <= base <= ts <= t_ref, so these exponents are <= 0:
    # no overflow possible; stale eras underflow to their true ~0.
    scale = np.exp2(
        (folded["era"].to_numpy(np.int64) * ERA_US - t_ref) / h
    )
    folded = folded.assign(
        w=folded["w"] * scale, wv=folded["wv"] * scale
    )
    g = (
        folded.groupby("event_type", sort=False)[["w", "wv"]]
        .sum()
        .reset_index()
    )
    out = pd.DataFrame(
        {
            "event_type": g["event_type"],
            "decayed_count": g["w"].round(6),
            "decayed_value": g["wv"].round(6),
        }
    ).sort_values("event_type", kind="mergesort").reset_index(drop=True)
    return out


SQL_DECAYED_COUNTS_EVENTS = f"""
WITH t AS (SELECT max(epoch_us(ts)) AS t_ref FROM events)
SELECT event_type,
       round(sum(pow(2.0, (epoch_us(ts) - (SELECT t_ref FROM t))
                          / {float(DECAY_HALF_LIFE_US)})), 6)
         AS decayed_count,
       round(sum(value * pow(2.0, (epoch_us(ts) - (SELECT t_ref FROM t))
                                  / {float(DECAY_HALF_LIFE_US)})), 6)
         AS decayed_value
FROM events GROUP BY event_type ORDER BY event_type
"""


REGISTRY.update({'decayed_counts_events': (
            q_decayed_counts_events,
            SQL_DECAYED_COUNTS_EVENTS,
        )})
