"""Keyed TTL dedup (stages/ttl_dedup.py): kept-anchor semantics,
partition invariance, actor-form contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.ttl_dedup import TtlDedupActor, ttl_dedup

TTL = 6


def _brute_ttl(df: pd.DataFrame) -> set[int]:
    """Reference kept-set: per key, keep an event iff ts > last KEPT
    ts + TTL (chains anchor on kept events, not previous rows)."""
    kept = set()
    last: dict[str, int] = {}
    for r in df.sort_values(["k", "ts", "rid"]).itertuples():
        if r.k not in last or r.ts - last[r.k] > TTL:
            last[r.k] = r.ts
            kept.add(r.rid)
    return kept


def _events(n=600, n_keys=17, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": [f"k{rng.randint(n_keys)}" for _ in range(n)],
            "ts": rng.randint(0, 60, n).astype(np.int64),
        }
    )


def test_ttl_dedup_matches_bruteforce_any_partitioning(ray_session):
    df = _events()
    want = _brute_ttl(df)
    for parts in (1, 7):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
        out = ttl_dedup(
            ds, ["k"], ts_col="ts", ttl_us=TTL, id_col="rid"
        ).to_pandas()
        assert set(out["rid"]) == want, parts
        assert list(out.columns) == ["rid", "k", "ts"]


def test_ttl_chain_anchors_on_kept_event(ray_session):
    """ts = 0, 5, 9 with ttl 6: 5 is dropped (within 6 of kept 0),
    9 is KEPT (9 - 0 > 6) — LAG-on-previous-row semantics would drop
    it; this pins the kept-anchor rule."""
    df = pd.DataFrame(
        {"rid": [0, 1, 2], "k": ["a"] * 3, "ts": [0, 5, 9]}
    )
    out = ttl_dedup(
        rd.from_arrow(pa.Table.from_pandas(df)),
        ["k"],
        ts_col="ts",
        ttl_us=TTL,
        id_col="rid",
    ).to_pandas()
    assert sorted(out["rid"]) == [0, 2]


def test_ttl_actor_single_stream_exact():
    """One actor fed event-time-ordered micro-batches reproduces the
    batch form exactly, across batch boundaries."""
    df = _events().sort_values(["ts", "rid"]).reset_index(drop=True)
    want = _brute_ttl(df)
    actor = TtlDedupActor(["k"], ts_col="ts", ttl_us=TTL)
    got = set()
    for s in range(0, len(df), 64):
        chunk = pa.Table.from_pandas(
            df.iloc[s : s + 64], preserve_index=False
        )
        got.update(actor(chunk)["rid"].to_pylist())
    assert got == want


def test_ttl_actor_state_sweep_bounds_memory():
    actor = TtlDedupActor(
        ["k"], ts_col="ts", ttl_us=10, sweep_above=50
    )
    for wave in range(10):
        t = wave * 100  # every wave far past the TTL of the previous
        chunk = pa.table(
            {
                "k": [f"w{wave}_k{i}" for i in range(40)],
                "ts": pa.array([t] * 40, pa.int64()),
            }
        )
        actor(chunk)
    # expired entries were swept: far fewer than the 400 total keys
    assert len(actor.last_kept) <= 90


# ------------------------------------------------- hypothesis property


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def event_frames(draw):
    n = draw(st.integers(1, 120))
    n_keys = draw(st.integers(1, 6))
    ttl = draw(st.integers(1, 12))
    keys = draw(
        st.lists(
            st.integers(0, n_keys - 1), min_size=n, max_size=n
        )
    )
    ts = draw(st.lists(st.integers(0, 40), min_size=n, max_size=n))
    return (
        pd.DataFrame(
            {
                "rid": np.arange(n, dtype=np.int64),
                "k": [f"k{v}" for v in keys],
                "ts": np.asarray(ts, dtype=np.int64),
            }
        ),
        ttl,
    )


@given(event_frames())
@settings(max_examples=40, deadline=None)
def test_ttl_actor_property_matches_brute(frame_ttl):
    """Single-actor micro-batch form == brute kept-anchor oracle on
    adversarial random inputs (ties, bursts, interleaved keys),
    across arbitrary batch boundaries."""
    df, ttl = frame_ttl
    ordered = df.sort_values(["ts", "rid"]).reset_index(drop=True)
    kept = set()
    last: dict[str, int] = {}
    for r in ordered.itertuples():
        if r.k not in last or r.ts - last[r.k] > ttl:
            last[r.k] = r.ts
            kept.add(r.rid)
    actor = TtlDedupActor(["k"], ts_col="ts", ttl_us=ttl)
    got = set()
    cut = max(1, len(ordered) // 3)
    for s in range(0, len(ordered), cut):
        chunk = pa.Table.from_pandas(
            ordered.iloc[s : s + cut], preserve_index=False
        )
        got.update(actor(chunk)["rid"].to_pylist())
    assert got == kept


def test_ttl_streaming_routing_matches_batch_across_pool_sizes(
    ray_session,
):
    """Round-5: ttl_dedup_streaming ships key-stable routing built-in
    (hash(key) % n_actors sub-batch dispatch) — exact streaming
    semantics must no longer depend on caller discipline. Feed the
    stream in event-time order; for 1, 2 and 4 actors the kept set
    must equal the exact batch form's."""
    import ray.data as rd

    from theoremkb_ray.stages.ttl_dedup import (
        ttl_dedup,
        ttl_dedup_streaming,
    )

    df = _events(n=900, n_keys=23, seed=11).sort_values(
        ["ts", "rid"], kind="mergesort"
    )
    tbl = pa.Table.from_pandas(df.reset_index(drop=True))
    want = set(
        ttl_dedup(
            rd.from_arrow(tbl), ["k"], ts_col="ts", ttl_us=TTL,
            id_col="rid",
        )
        .to_pandas()["rid"]
    )
    # micro-batch stream of uneven sizes
    cuts = [0, 64, 65, 300, 301, 555, 900]
    batches = [
        tbl.slice(a, b - a) for a, b in zip(cuts[:-1], cuts[1:])
    ]
    for n_actors in (1, 2, 4):
        got = [
            t
            for t in ttl_dedup_streaming(
                batches, ["k"], ts_col="ts", ttl_us=TTL,
                n_actors=n_actors, max_in_flight=2,
            )
        ]
        kept = set(
            np.concatenate(
                [t["rid"].to_numpy(zero_copy_only=False) for t in got]
            )
        )
        assert kept == want, n_actors


def test_ttl_streaming_ties_within_batch_follow_stream_order(
    ray_session,
):
    """Equal-ts events for one key inside one micro-batch: the FIRST
    in stream order is kept (matches the batch form's id tie-break
    when ids are assigned in stream order)."""
    from theoremkb_ray.stages.ttl_dedup import ttl_dedup_streaming

    tbl = pa.table(
        {
            "rid": pa.array([0, 1, 2], pa.int64()),
            "k": pa.array(["a", "a", "a"]),
            "ts": pa.array([5, 5, 20], pa.int64()),
        }
    )
    got = list(
        ttl_dedup_streaming(
            [tbl], ["k"], ts_col="ts", ttl_us=TTL, n_actors=2
        )
    )
    kept = sorted(
        int(x)
        for t in got
        for x in t["rid"].to_numpy(zero_copy_only=False)
    )
    assert kept == [0, 2]
