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
