"""Deletion-neighborhood fuzzy join (stages/fuzzy.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.fuzzy import fuzzy_pairs


def _pairs(texts, blocks=4, max_tokens=12):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)
    df = fuzzy_pairs(ds, max_tokens=max_tokens).to_pandas()
    return set(map(tuple, df[["id_a", "id_b"]].itertuples(False)))


def test_edit_classes():
    texts = [
        "the quick brown fox jumps",      # 0 base
        "the quick brown fox jumps",      # 1 exact dup      -> pair
        "the quick brown fox",            # 2 deletion       -> pair
        "the quick brown fox jumps high", # 3 insertion      -> pair
        "the quick brown cat jumps",      # 4 substitution   -> pair
        "the slow brown cat jumps",       # 5 distance 2 from 0
        "entirely different words here",  # 6 unrelated
    ]
    got = _pairs(texts)
    for want in [(0, 1), (0, 2), (0, 3), (0, 4)]:
        assert want in got, want
    assert (0, 5) not in got
    assert not any(6 in p for p in got)
    # 4 and 5 differ by one substitution -> pair
    assert (4, 5) in got


def test_prefix_cap_ignores_tail():
    a = " ".join(f"t{i}" for i in range(12)) + " tailA tailB"
    b = " ".join(f"t{i}" for i in range(12)) + " other words entirely"
    got = _pairs([a, b], max_tokens=12)
    assert (0, 1) in got  # identical capped prefixes


def test_partition_invariance_and_no_selfpairs():
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(vocab[j] for j in rng.randint(0, 12, size=6))
        for _ in range(150)
    ]
    p1 = _pairs(texts, blocks=2)
    p2 = _pairs(texts, blocks=11)
    assert p1 == p2
    assert all(a < b for a, b in p1)


def test_hot_cap_preserves_components():
    # 40 docs share one degenerate title: uncapped -> C(40,2) pairs;
    # capped -> star edges, same connected component
    texts = ["untitled document placeholder"] * 40 + [
        "a unique other title here"
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    full = fuzzy_pairs(ds).to_pandas()
    capped = fuzzy_pairs(ds, hot_cap=5).to_pandas()
    assert len(full) == 40 * 39 // 2
    assert len(capped) < len(full)
    # star edges: every dup doc connects (directly) to doc 0
    assert set(capped["id_a"]) == {0}
    assert set(capped["id_b"]) == set(range(1, 40))
