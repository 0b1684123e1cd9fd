"""Prefix-filtered set-similarity self-join (stages/setsim.py)."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.setsim import setsim_self_join


def _run(texts, threshold=0.7, max_tokens=24, blocks=4):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)
    df = setsim_self_join(
        ds, threshold=threshold, max_tokens=max_tokens
    ).to_pandas()
    return {
        (a, b): s
        for a, b, s in df[["id_a", "id_b", "sim"]].itertuples(False)
    }


def _brute(texts, threshold=0.7, max_tokens=24):
    sets = [set(t.split()[:max_tokens]) for t in texts]
    out = {}
    for i, j in itertools.combinations(range(len(texts)), 2):
        u = len(sets[i] | sets[j])
        if u == 0:
            continue
        sim = len(sets[i] & sets[j]) / u
        if sim >= threshold:
            out[(i, j)] = round(sim, 6)
    return out


def test_matches_brute_force():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in range(60)
    ]
    # plant near-dups: shared base with one token changed / appended
    base = "alpha beta gamma delta epsilon zeta eta theta"
    texts += [base, base, base + " iota", "alpha beta gamma delta"]
    for th in (0.5, 0.7, 0.9):
        got = _run(texts, threshold=th)
        want = _brute(texts, threshold=th)
        assert got == want, (
            sorted(set(want) - set(got))[:5],
            sorted(set(got) - set(want))[:5],
        )


def test_exact_dups_and_threshold_cut():
    got = _run(
        [
            "a b c d e f g h i j",       # 0
            "a b c d e f g h i j",       # 1: J=1.0
            "a b c d e f g h i k",       # 2: J=9/11 vs 0
            "a b c d e",                 # 3: J=0.5 vs 0 -> below 0.7
            "x y z",                     # 4: unrelated
        ],
        threshold=0.7,
    )
    assert got[(0, 1)] == 1.0
    assert abs(got[(0, 2)] - round(9 / 11, 6)) < 1e-9
    assert (0, 3) not in got
    assert not any(4 in p for p in got)


def test_duplicate_tokens_and_empty_docs():
    got = _run(
        [
            "dup dup dup dup a b",  # set {dup,a,b}
            "dup a b",              # identical set -> J=1.0
            "",                     # empty: never pairs
            "   ",                  # whitespace only
        ],
        threshold=0.7,
    )
    assert got == {(0, 1): 1.0}


def test_containment_join_directional():
    import itertools

    from theoremkb_ray.stages.setsim import containment_join
    import pyarrow as pa
    import ray.data as rd

    texts = [
        "a b c d e f g h i j",   # 0: superset
        "a b c d",               # 1: fully contained in 0 (C=1.0)
        "a b c x",               # 2: 3/4 = 0.75 in 0 -> below 0.8
        "a b c d e",             # 3: contained in 0; contains 1? 4/4
        "z y w v",               # 4: unrelated
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    out = containment_join(ds, threshold=0.8).to_pandas()
    got = {
        (a, b): c
        for a, b, c in out[["id_a", "id_b", "containment"]].itertuples(
            False
        )
    }
    # brute reference
    sets = [set(t.split()) for t in texts]
    want = {}
    for i, j in itertools.permutations(range(len(texts)), 2):
        if not sets[i]:
            continue
        c = len(sets[i] & sets[j]) / len(sets[i])
        if c >= 0.8:
            want[(i, j)] = round(c, 6)
    assert got == want, (got, want)
    assert got[(1, 0)] == 1.0      # small inside big
    assert (0, 1) not in got        # big not inside small
    assert (2, 0) not in got        # 0.75 below threshold


def test_containment_plans_agree():
    """The small-vocab bitmask plan and the posting plan must produce
    identical pairs; pin each via the gating knobs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.stages.setsim import containment_join

    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(20)]  # <= 64 distinct tokens
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(3, 12)))
        for _ in range(80)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(5)
    fast = (
        containment_join(ds, threshold=0.8)  # bitmask (vocab <= 64)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    slow = (
        containment_join(ds, threshold=0.8, small_vocab_docs=0)  # postings
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0
