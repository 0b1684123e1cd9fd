"""Round-5 advisory fixes, each pinned by a regression test:

1. decayed_counts: no fixed-epoch rebase — far-future event times
   stay finite (the old 2024-01-01 floor overflowed to inf ~1024
   half-lives out); a single batch spanning too many half-lives
   raises loudly instead of returning inf.
2. fim_transform: non-ASCII text raises loudly instead of splitting
   codepoints / silently diverging from the character-based oracle.
3. read_triples subject_prefix: astral-codepoint subjects are not
   wrongly excluded by a prefix+U+FFFF upper bound.
4. resolve_citations broadcast/shuffle: duplicate (doc_from, tag)
   link keys resolve to a value-defined winner (max doc_to) on BOTH
   plans — deterministic under any partition order.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


# ------------------------------------------------ decayed counts


def _write_events(tmp_path, ts_us, event_type, value):
    tbl = pa.table(
        {
            "ts": pa.array(
                np.asarray(ts_us, np.int64), pa.timestamp("us")
            ),
            "event_type": pa.array(event_type),
            "value": pa.array(np.asarray(value, np.float64)),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_decayed_counts_far_future_stays_finite(ray_session, tmp_path):
    """Event times ~40 years past 2024 (>> 1024 one-day half-lives
    beyond the old fixed floor): the era-rebased fold must match the
    direct t_ref-relative formula, finitely."""
    from theoremkb_ray.pipelines.relational import (
        DECAY_HALF_LIFE_US as H,
        q_decayed_counts_events,
    )

    base = 2_900_000_000_000_000  # ~2061
    rng = np.random.RandomState(3)
    n = 400
    ts = base + rng.randint(0, 40 * 86_400_000_000, n)  # 40-day window
    et = [("click", "view", "buy")[i % 3] for i in range(n)]
    val = rng.uniform(0, 10, n)
    sf_dir = _write_events(tmp_path, ts, et, val)
    out = q_decayed_counts_events(sf_dir)
    assert np.isfinite(out["decayed_count"]).all()
    assert np.isfinite(out["decayed_value"]).all()
    # truth: direct single-process computation relative to max ts
    t_ref = int(ts.max())
    w = np.exp2((ts - t_ref) / float(H))
    want = (
        pd.DataFrame({"event_type": et, "w": w, "wv": w * val})
        .groupby("event_type", sort=True)[["w", "wv"]]
        .sum()
        .reset_index()
    )
    got = out.sort_values("event_type").reset_index(drop=True)
    np.testing.assert_allclose(
        got["decayed_count"], want["w"], rtol=1e-9, atol=1e-6
    )
    np.testing.assert_allclose(
        got["decayed_value"], want["wv"], rtol=1e-9, atol=1e-6
    )


def test_decayed_counts_wide_batch_raises_loudly(ray_session, tmp_path):
    """One batch spanning >256 half-lives (a single block covering a
    year at a 1-day half-life) must raise, not return inf/nan."""
    from theoremkb_ray.pipelines.relational import (
        q_decayed_counts_events,
    )

    # 2000 shuffled rows over a 400-half-life window: however Ray
    # blocks the file, some batch spans far beyond 256 HL
    rng = np.random.RandomState(0)
    ts = rng.randint(0, 400 * 86_400_000_000, 2000).astype(np.int64)
    ts[:2] = [0, 400 * 86_400_000_000 - 1]
    rng.shuffle(ts)
    sf_dir = _write_events(
        tmp_path, ts, ["click"] * 2000, np.ones(2000)
    )
    with pytest.raises(Exception, match="half-lives"):
        q_decayed_counts_events(sf_dir)


# ------------------------------------------------ fim transform


def test_fim_transform_non_ascii_raises_loudly(ray_session, tmp_path):
    from theoremkb_ray.pipelines.relational import q_fim_transform_docs

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                ["plain ascii body long enough", "théorème — naïve ünïcode"]
            ),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    with pytest.raises(Exception, match="ASCII|codepoint"):
        r = q_fim_transform_docs(str(tmp_path))
        # materialize if lazily returned
        if hasattr(r, "to_pandas"):
            r.to_pandas()


# --------------------------------------- read_triples prefix bound


def test_prefix_upper_bound_covers_astral_and_ffff():
    from theoremkb_ray.sources.sinks import _prefix_upper_bound

    assert _prefix_upper_bound("abc") == "abd"
    # carry past a maxed-out last codepoint
    assert _prefix_upper_bound("a" + chr(0x10FFFF)) == "b"
    assert _prefix_upper_bound(chr(0x10FFFF)) is None
    # surrogate gap is skipped
    assert _prefix_upper_bound("x" + chr(0xD7FF)) == "x"
    # ordering property on adversarial subjects
    subjects = ["doc:", "doc:" + chr(0xFFFF), "doc:" + chr(0x10000),
                "doc:a", "dod", "doc"]
    hi = _prefix_upper_bound("doc:")
    for s in subjects:
        assert (s >= "doc:" and s < hi) == s.startswith("doc:"), s


def test_read_triples_prefix_keeps_astral_subjects(
    ray_session, tmp_path
):
    """A subject whose char after the prefix is U+FFFF or astral must
    survive subject_prefix pruning (the old +'\\uffff' bound dropped
    them)."""
    from theoremkb_ray.sources.sinks import (
        materialize_triples,
        read_triples,
    )

    subs = [
        "doc:alpha",
        "doc:" + chr(0xFFFF) + "tail",
        "doc:" + chr(0x1F600) + "emoji",
        "other:beta",
    ]
    tbl = pa.table(
        {
            "subject": pa.array(subs),
            "predicate": pa.array(["states"] * 4),
            "object": pa.array([f"o{i}" for i in range(4)]),
            "confidence": pa.array([1.0] * 4),
            "provenance": pa.array(["t"] * 4),
        }
    )
    store = os.path.join(str(tmp_path), "store")
    materialize_triples(
        rd.from_arrow(tbl), store, num_partitions=2, resume=False
    )
    got = set(
        read_triples(store, subject_prefix="doc:").to_pandas()["subject"]
    )
    assert got == set(subs[:3])


# ------------------------------- citation join dup-key determinism


def test_citation_dup_links_deterministic_and_plans_agree(ray_session):
    """Duplicate (doc_from, tag) keys: both plans must keep
    max(doc_to) regardless of input row order / partitioning."""
    from theoremkb_ray.stages.link import (
        resolve_citations,
        resolve_citations_shuffle,
    )

    mentions = pa.table(
        {
            "doc_id": pa.array(["p1", "p1", "p2"]),
            "src_entity": pa.array(["e1", "e2", "e3"]),
            "src_group": pa.array([0, 1, 0], pa.int64()),
            "kind": pa.array(["theorem"] * 3),
            "num": pa.array(["1", "2", "3"]),
            "cite_tag": pa.array(["[4]", "[4]", "[9]"]),
        }
    )
    links = pd.DataFrame(
        {
            "doc_from": ["p1", "p1", "p1", "p2"],
            "tag": ["[4]", "[4]", "[4]", "[9]"],
            "doc_to": ["tB", "tZ", "tA", "tQ"],  # winner: tZ
        }
    )

    def norm(df):
        return (
            df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True)
        )

    outs = []
    for order in (slice(None), slice(None, None, -1)):
        ltbl = pa.Table.from_pandas(
            links.iloc[order].reset_index(drop=True),
            preserve_index=False,
        )
        b = norm(
            resolve_citations(
                rd.from_arrow(mentions), ltbl
            ).to_pandas()
        )
        s = norm(
            resolve_citations_shuffle(
                rd.from_arrow(mentions).repartition(3),
                rd.from_arrow(ltbl).repartition(2),
                num_buckets=4,
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(b, s)
        outs.append(b)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert set(
        outs[0][outs[0]["subject"].isin(["e1", "e2"])]["object"]
    ) == {"tZ#theorem 1", "tZ#theorem 2"}
