"""Hierarchical feature rollup — the A1 general machinery.

The reference aggregates child-node features up the ALTO hierarchy
(word -> line -> block -> page) with, per parent: min/max/std/mean of
numeric children, ``dict(Counter(...))`` of categorical children, and
the first / second / last child's full feature row, then joins the
parent's own features and adds ±1-sibling deltas and a document-wide
standardization pass (reference: Styling/src/lib/paper/features.py:
96-180 ``get_features``, 23-40 ``_standardize``).

Here the same machinery is a set of *vectorized segment kernels*
(reduceat / lexsort over flat child arrays — no per-parent Python) and
one actor-pool stage, ``hierarchical_features``, that emits a per-line
feature table: word-child rollups + the line's own features + deltas +
optional per-document z-scores. Zero shuffle: a document's lines live
in its row, so every rollup is task-local.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .tokenize import explode_lines

# ------------------------------------------------- segment kernels


def segment_sums(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    # reduceat over the starts of NON-EMPTY segments only: a clipped
    # start for a trailing empty segment would split the preceding
    # segment's reduction (found by hypothesis — values [0,1], offsets
    # [0,2,2] returned sum 0 for the first segment). Gaps between
    # consecutive non-empty starts contain no values, so each
    # reduction still covers exactly one segment.
    counts = np.diff(offsets)
    out = np.zeros(len(counts), dtype=np.float64)
    nz = np.flatnonzero(counts)
    if len(nz) == 0 or len(values) == 0:
        return out
    out[nz] = np.add.reduceat(values.astype(np.float64), offsets[:-1][nz])
    return out


def segment_min_max(
    values: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    counts = np.diff(offsets)
    n = len(counts)
    mins = np.zeros(n, dtype=np.float64)
    maxs = np.zeros(n, dtype=np.float64)
    nz = np.flatnonzero(counts)
    if len(nz) == 0 or len(values) == 0:
        return mins, maxs
    starts = offsets[:-1][nz]  # see segment_sums: non-empty starts only
    v = values.astype(np.float64)
    mins[nz] = np.minimum.reduceat(v, starts)
    maxs[nz] = np.maximum.reduceat(v, starts)
    return mins, maxs


def segment_mean_std(
    values: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Population mean/std per segment (the reference's ``.agg(['std',
    'mean'])`` analog; population std so a 1-child segment is 0)."""
    counts = np.diff(offsets).astype(np.float64)
    vals = np.asarray(values, dtype=np.float64)
    s1 = segment_sums(vals, offsets)
    n = np.maximum(counts, 1.0)
    mean = s1 / n
    mean[counts == 0] = 0.0
    # two-pass centered variance: E[x²]-E[x]² cancels catastrophically
    # when |mean| >> std (hypothesis found a 3e-5 absolute error on
    # values ~1e3 with spread ~1) — subtract the segment mean FIRST
    seg_of = np.repeat(
        np.arange(len(counts), dtype=np.int64), np.diff(offsets)
    )
    centered_sq = (vals - mean[seg_of]) ** 2
    s2c = segment_sums(centered_sq, offsets)
    var = np.maximum(s2c / n, 0.0)
    return mean, np.sqrt(var)


def segment_nth(
    values: pa.Array | np.ndarray, offsets: np.ndarray, n: int
):
    """n-th child per segment (n >= 0 from the start, n < 0 from the
    end — the reference's ``groupby.nth(0/1/-1)``); None/0 where the
    segment has fewer than |n|+1 children. Works on Arrow string
    arrays (returns pa.Array with nulls) and numpy arrays."""
    counts = np.diff(offsets)
    if n >= 0:
        idx = offsets[:-1] + n
        valid = counts > n
    else:
        idx = offsets[1:] + n
        valid = counts >= -n
    idx = idx.clip(min=0, max=max(int(offsets[-1]) - 1, 0))
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if len(values) == 0:
            return pa.array([None] * len(counts), values.type)
        taken = values.take(pa.array(idx, pa.int64()))
        return pc.if_else(pa.array(valid), taken, None)
    if len(values) == 0:
        return np.zeros(len(counts), dtype=np.float64)
    return np.where(valid, np.asarray(values)[idx], 0)


def segment_mode(
    codes: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-segment most-frequent code + its count + distinct count —
    the vectorized core of the reference's ``dict(Counter(x))``
    categorical aggregation. One lexsort over (segment, code), run-
    length detection, and a max-reduceat; no per-segment Python."""
    counts = np.diff(offsets)
    n_seg = len(counts)
    m = len(codes)
    if m == 0:
        z = np.zeros(n_seg, dtype=np.int64)
        return z - 1, z, z
    seg_of = np.repeat(np.arange(n_seg, dtype=np.int64), counts)
    order = np.lexsort((codes, seg_of))
    s, c = seg_of[order], codes[order]
    new_run = np.ones(m, dtype=bool)
    new_run[1:] = (s[1:] != s[:-1]) | (c[1:] != c[:-1])
    run_starts = np.flatnonzero(new_run)
    run_seg = s[run_starts]
    run_code = c[run_starts]
    run_len = np.diff(np.append(run_starts, m))
    n_runs_per_seg = np.zeros(n_seg, dtype=np.int64)
    np.add.at(n_runs_per_seg, run_seg, 1)
    # per segment pick the longest run (ties -> smallest code): sort
    # runs by (segment, -len, code) and keep each segment's first
    o2 = np.lexsort((run_code, -run_len, run_seg))
    first = np.ones(len(o2), dtype=bool)
    first[1:] = run_seg[o2][1:] != run_seg[o2][:-1]
    sel = o2[first]
    mode_code = np.full(n_seg, -1, dtype=np.int64)
    best_count = np.zeros(n_seg, dtype=np.int64)
    mode_code[run_seg[sel]] = run_code[sel]
    best_count[run_seg[sel]] = run_len[sel]
    return mode_code, best_count, n_runs_per_seg


def doc_deltas(
    values: np.ndarray, doc_offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """±1-sibling deltas within a document (reference ``.diff(±1)``,
    features.py:163-170): value - prev, value - next; 0 at document
    boundaries."""
    n = len(values)
    prev_d = np.zeros(n, dtype=np.float64)
    next_d = np.zeros(n, dtype=np.float64)
    if n == 0:
        return prev_d, next_d
    v = values.astype(np.float64)
    prev_d[1:] = v[1:] - v[:-1]
    next_d[:-1] = v[:-1] - v[1:]
    starts = doc_offsets[:-1]
    ends = doc_offsets[1:] - 1
    prev_d[starts[starts < n]] = 0.0
    next_d[ends[(ends >= 0) & (ends < n)]] = 0.0
    return prev_d, next_d


def standardize_per_doc(
    values: np.ndarray, doc_offsets: np.ndarray
) -> np.ndarray:
    """Document-wide z-score (reference ``_standardize``,
    features.py:23-40 — sklearn preprocessing.scale per document)."""
    counts = np.diff(doc_offsets)
    mean, std = segment_mean_std(values, doc_offsets)
    mean_l = np.repeat(mean, counts)
    std_l = np.repeat(np.where(std > 0, std, 1.0), counts)
    return (values.astype(np.float64) - mean_l) / std_l


# ------------------------------------------------- the rollup stage


def line_word_rollup(flat_lines: pa.Array) -> dict[str, object]:
    """Word-child rollup per line: n/min/max/mean/std of word lengths,
    first/second/last word, mode word-pattern + distinct-pattern count
    (the Counter analog). Splits on a single space, matching the SQL
    oracle's string_split semantics."""
    from ..functions.hashing import hash_strings
    from .features import line_patterns

    words = pc.split_pattern(flat_lines, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = words.values
    if offs[0] != 0:
        vals = vals.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
    lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
    mins, maxs = segment_min_max(lens, offs)
    mean, std = segment_mean_std(lens, offs)
    pats = line_patterns(vals)
    codes = hash_strings(pats.to_numpy(zero_copy_only=False)).astype(
        np.int64
    ) if len(vals) else np.zeros(0, dtype=np.int64)
    _, mode_n, n_distinct = segment_mode(codes, offs)
    return {
        "n_words": np.diff(offs).astype(np.int64),
        "min_word_len": mins.astype(np.int64),
        "max_word_len": maxs.astype(np.int64),
        "avg_word_len": mean,
        "std_word_len": std,
        "first_word": segment_nth(vals, offs, 0),
        "second_word": segment_nth(vals, offs, 1),
        "last_word": segment_nth(vals, offs, -1),
        "mode_pattern_count": mode_n.astype(np.int64),
        "n_distinct_patterns": n_distinct.astype(np.int64),
    }


class HierarchicalFeatures:
    """map_batches callable: tokenized docs -> per-line feature rows.

    Word rollups + the line's own features (features.line_features) +
    prev/next deltas of the numeric columns + optional per-document
    standardization — the full get_features pipeline, per batch."""

    def __init__(
        self,
        deltas: bool = True,
        standardize: bool = False,
        extractors: dict | None = None,
    ) -> None:
        self.deltas = deltas
        self.standardize = standardize
        # registered extractors are SNAPSHOTTED at pipeline-build time
        # and shipped in the constructor args (cloudpickle) — driver
        # registrations reach every worker process
        self.extractors = extractors or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .features import line_features

        flat, doc_off = explode_lines(batch["lines"])
        roll = line_word_rollup(flat)
        lf = line_features(flat)
        lengths = np.diff(doc_off)
        doc_ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), lengths
        )
        line_idx = np.arange(int(doc_off[-1])) - np.repeat(
            doc_off[:-1], lengths
        )
        cols: dict[str, object] = {
            "doc_id": pa.array(doc_ids, pa.string()),
            "line": pa.array(line_idx, pa.int64()),
        }
        numeric: dict[str, np.ndarray] = {}
        for k, v in roll.items():
            if isinstance(v, np.ndarray) and v.dtype != object:
                numeric[k] = v.astype(np.float64)
            cols[k] = v if not isinstance(v, np.ndarray) else pa.array(v)
        for k in ("bold", "italic", "blank", "qed", "has_head_num"):
            arr = np.asarray(lf[k], dtype=bool)
            cols[f"line_{k}"] = pa.array(arr)
            numeric[f"line_{k}"] = arr.astype(np.float64)
        if self.deltas:
            for k, v in list(numeric.items()):
                pd_, nd_ = doc_deltas(v, doc_off)
                cols[f"{k}_prev"] = pa.array(pd_)
                cols[f"{k}_next"] = pa.array(nd_)
        if self.standardize:
            for k, v in numeric.items():
                cols[f"{k}_z"] = pa.array(
                    standardize_per_doc(v, doc_off)
                )
        # user-registered feature extractors (registry.py §2.10)
        for name, fn in self.extractors.items():
            for k, v in fn(flat, doc_off).items():
                cols[f"{name}_{k}"] = (
                    v if isinstance(v, (pa.Array, pa.ChunkedArray)) else pa.array(v)
                )
        return pa.table(cols)


def hierarchical_features(
    ds,
    deltas: bool = True,
    standardize: bool = False,
    batch_size: int = 256,
    concurrency=(1, 8),
):
    from ..registry import _FEATURE_EXTRACTORS

    return ds.map_batches(
        HierarchicalFeatures,
        fn_constructor_args=(deltas, standardize, dict(_FEATURE_EXTRACTORS)),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
