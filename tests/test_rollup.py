"""A1 hierarchical rollup machinery (segment kernels + stage)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.rollup import (
    doc_deltas,
    hierarchical_features,
    line_word_rollup,
    segment_mean_std,
    segment_min_max,
    segment_mode,
    segment_nth,
    standardize_per_doc,
)


OFF = np.array([0, 3, 3, 5], dtype=np.int64)  # segs: [0,3), [], [3,5)
VALS = np.array([2.0, 5.0, 2.0, 7.0, 1.0])


def test_segment_min_max():
    mins, maxs = segment_min_max(VALS, OFF)
    assert list(mins) == [2.0, 0.0, 1.0]
    assert list(maxs) == [5.0, 0.0, 7.0]


def test_segment_mean_std_population():
    mean, std = segment_mean_std(VALS, OFF)
    np.testing.assert_allclose(mean, [3.0, 0.0, 4.0])
    np.testing.assert_allclose(std, [np.sqrt(2.0), 0.0, 3.0])
    # single-element segment: population std 0
    m1, s1 = segment_mean_std(np.array([9.0]), np.array([0, 1]))
    assert s1[0] == 0.0


def test_segment_nth_strings_and_numeric():
    arr = pa.array(["a", "b", "c", "d", "e"])
    first = segment_nth(arr, OFF, 0)
    second = segment_nth(arr, OFF, 1)
    last = segment_nth(arr, OFF, -1)
    assert first.to_pylist() == ["a", None, "d"]
    assert second.to_pylist() == ["b", None, "e"]
    assert last.to_pylist() == ["c", None, "e"]
    nums = segment_nth(VALS, OFF, 1)
    assert list(nums) == [5.0, 0.0, 1.0]
    # n beyond every segment -> all null
    third = segment_nth(arr, OFF, 3)
    assert third.to_pylist() == [None, None, None]


def test_segment_mode_counter():
    codes = np.array([7, 7, 3, 9, 9, 9, 5], dtype=np.int64)
    off = np.array([0, 3, 3, 7], dtype=np.int64)
    mode, best, n_distinct = segment_mode(codes, off)
    assert list(mode) == [7, -1, 9]
    assert list(best) == [2, 0, 3]
    assert list(n_distinct) == [2, 0, 2]
    # tie -> smallest code wins (deterministic)
    m2, b2, _ = segment_mode(
        np.array([4, 2, 2, 4], dtype=np.int64), np.array([0, 4])
    )
    assert list(m2) == [2] and list(b2) == [2]


def test_doc_deltas_reset_at_boundaries():
    v = np.array([1.0, 4.0, 9.0, 2.0, 10.0])
    off = np.array([0, 3, 5], dtype=np.int64)
    prev_d, next_d = doc_deltas(v, off)
    assert list(prev_d) == [0.0, 3.0, 5.0, 0.0, 8.0]
    assert list(next_d) == [-3.0, -5.0, 0.0, -8.0, 0.0]


def test_standardize_per_doc():
    v = np.array([1.0, 2.0, 3.0, 5.0, 5.0])
    off = np.array([0, 3, 5], dtype=np.int64)
    z = standardize_per_doc(v, off)
    np.testing.assert_allclose(z[:3].mean(), 0.0, atol=1e-12)
    np.testing.assert_allclose(z[3:], [0.0, 0.0])  # zero-std guard


def test_line_word_rollup():
    flat = pa.array(["alpha bb c", "", "xyz"], pa.string())
    r = line_word_rollup(flat)
    assert list(r["n_words"]) == [3, 1, 1]
    assert list(r["min_word_len"]) == [1, 0, 3]
    assert list(r["max_word_len"]) == [5, 0, 3]
    assert r["first_word"].to_pylist() == ["alpha", "", "xyz"]
    assert r["second_word"].to_pylist() == ["bb", None, None]
    assert r["last_word"].to_pylist() == ["c", "", "xyz"]
    assert list(r["n_distinct_patterns"]) == [3, 1, 1]


def test_hierarchical_features_stage(gold100):
    from theoremkb_ray.stages.ingest import ingest
    from theoremkb_ray.stages.tokenize import tokenize

    ds = hierarchical_features(
        tokenize(ingest(rd.from_arrow(gold100["corpus"]))),
        deltas=True,
        standardize=True,
    )
    df = ds.to_pandas()
    assert {"doc_id", "line", "n_words", "avg_word_len",
            "avg_word_len_prev", "avg_word_len_z",
            "line_bold", "first_word"} <= set(df.columns)
    # per-doc z-scores: mean ~ 0 within each doc for non-constant col
    g = df.groupby("doc_id")["avg_word_len_z"].mean()
    assert np.abs(g).max() < 1e-8
    # line count matches the tokenizer
    n_lines = sum(
        len(c.split("\n"))
        for c in gold100["corpus"]["content"].to_pylist()
    )
    assert len(df) == n_lines
