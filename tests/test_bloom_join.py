"""Bloom-prefiltered semi/anti join (stages/joins.py:bloom_semi_join)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.joins import _bloom_positions, bloom_semi_join


def _ds(tbl, blocks=4):
    return rd.from_arrow(tbl).repartition(blocks)


def _sides(seed=0, n_left=800, key_space=300, n_right_keys=60):
    rng = np.random.RandomState(seed)
    left = pa.table(
        {
            "k": pa.array(
                rng.randint(0, key_space, n_left).astype(np.int64)
            ),
            "payload": pa.array(np.arange(n_left, dtype=np.int64)),
        }
    )
    rkeys = rng.choice(key_space, n_right_keys, replace=False).astype(
        np.int64
    )
    right = pa.table({"rk": pa.array(rkeys)})
    return left, right, set(rkeys.tolist())


def test_semi_exact():
    left, right, rset = _sides()
    got = bloom_semi_join(
        _ds(left), _ds(right, 2), on="k", right_on="rk", how="semi"
    ).to_pandas()
    want = left.to_pandas()[left.to_pandas()["k"].isin(rset)]
    assert sorted(got["payload"]) == sorted(want["payload"])


def test_anti_exact():
    left, right, rset = _sides(seed=1)
    got = bloom_semi_join(
        _ds(left), _ds(right, 2), on="k", right_on="rk", how="anti"
    ).to_pandas()
    want = left.to_pandas()[~left.to_pandas()["k"].isin(rset)]
    assert sorted(got["payload"]) == sorted(want["payload"])


def test_exact_under_heavy_false_positives():
    # 64-bit bitmap with 60 keys x 4 hashes: nearly every probe is a
    # "maybe" — the exact verify tail must still produce exact output
    left, right, rset = _sides(seed=2)
    for how in ("semi", "anti"):
        got = bloom_semi_join(
            _ds(left), _ds(right, 2), on="k", right_on="rk",
            how=how, bits=64,
        ).to_pandas()
        w = left.to_pandas()["k"].isin(rset)
        want = left.to_pandas()[w if how == "semi" else ~w]
        assert sorted(got["payload"]) == sorted(want["payload"]), how


def test_string_keys():
    left = pa.table(
        {
            "k": pa.array([f"key{i % 40}" for i in range(200)]),
            "payload": pa.array(np.arange(200, dtype=np.int64)),
        }
    )
    right = pa.table({"rk": pa.array([f"key{i}" for i in range(0, 40, 3)])})
    got = bloom_semi_join(
        _ds(left), _ds(right, 1), on="k", right_on="rk", how="semi"
    ).to_pandas()
    want = left.to_pandas()[
        left.to_pandas()["k"].isin(set(right["rk"].to_pylist()))
    ]
    assert sorted(got["payload"]) == sorted(want["payload"])


def test_no_false_negatives_property():
    # every member key's bits must all be set by construction
    keys = np.arange(1000, dtype=np.int64)
    pos = _bloom_positions(keys, bits=1 << 14, hashes=4)
    words = np.zeros((1 << 14) // 64, np.uint64)
    np.bitwise_or.at(
        words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
    )
    hit = (
        (words[pos // 64] >> (pos % 64).astype(np.uint64)) & np.uint64(1)
    ).astype(bool)
    assert hit.all()
