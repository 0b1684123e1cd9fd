"""Property-based tests (hypothesis) for the pure numpy kernels.

The reference has no randomized testing (SURVEY.md §5); these pin the
vectorized kernels against brute-force per-segment / per-element
Python oracles on adversarial random inputs — empty segments, ties,
doc boundaries, single-element docs."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# ------------------------------------------------------------ strategies


@st.composite
def segmented_values(draw, max_segs=8, max_len=6):
    """Random (values, offsets) with empty segments allowed."""
    counts = draw(
        st.lists(
            st.integers(0, max_len), min_size=1, max_size=max_segs
        )
    )
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    vals = draw(
        st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=int(offsets[-1]),
            max_size=int(offsets[-1]),
        )
    )
    return np.asarray(vals, dtype=np.float64), offsets


# ------------------------------------------------------ segment kernels


@settings(max_examples=60, deadline=None)
@given(segmented_values())
def test_segment_sums_min_max_match_loop(sv):
    from theoremkb_ray.stages.rollup import segment_min_max, segment_sums

    vals, offs = sv
    sums = segment_sums(vals, offs)
    mins, maxs = segment_min_max(vals, offs)
    for i in range(len(offs) - 1):
        seg = vals[offs[i] : offs[i + 1]]
        if len(seg) == 0:
            assert sums[i] == 0.0 and mins[i] == 0.0 and maxs[i] == 0.0
        else:
            # reduceat may associate differently than np.sum; under
            # catastrophic cancellation the *relative* error is
            # unbounded, so scale the tolerance by the magnitude sum
            np.testing.assert_allclose(
                sums[i],
                seg.sum(),
                rtol=1e-9,
                atol=1e-9 * float(np.abs(seg).sum()),
            )
            assert mins[i] == seg.min()
            assert maxs[i] == seg.max()


@settings(max_examples=60, deadline=None)
@given(segmented_values())
def test_segment_mean_std_match_loop(sv):
    from theoremkb_ray.stages.rollup import segment_mean_std

    vals, offs = sv
    means, stds = segment_mean_std(vals, offs)
    for i in range(len(offs) - 1):
        seg = vals[offs[i] : offs[i + 1]]
        if len(seg) == 0:
            assert means[i] == 0.0 and stds[i] == 0.0
        else:
            np.testing.assert_allclose(means[i], seg.mean(), atol=1e-6)
            np.testing.assert_allclose(
                stds[i], seg.std(), atol=1e-5
            )  # population std


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 3), min_size=0, max_size=30),
    st.lists(st.integers(0, 6), min_size=1, max_size=6),
)
def test_segment_mode_matches_counter(codes, counts):
    from theoremkb_ray.stages.rollup import segment_mode

    total = sum(counts)
    codes = (codes * (total // max(len(codes), 1) + 1))[:total]
    codes = np.asarray(codes, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    mode, best, n_distinct = segment_mode(codes, offs)
    for i in range(len(counts)):
        seg = codes[offs[i] : offs[i + 1]]
        if len(seg) == 0:
            assert mode[i] == -1 and best[i] == 0 and n_distinct[i] == 0
            continue
        c = Counter(seg.tolist())
        top = max(c.values())
        # tie rule: smallest code among the most frequent
        want_mode = min(k for k, v in c.items() if v == top)
        assert mode[i] == want_mode
        assert best[i] == top
        assert n_distinct[i] == len(c)


@settings(max_examples=40, deadline=None)
@given(segmented_values(max_segs=5, max_len=5), st.integers(-3, 3))
def test_segment_nth_matches_indexing(sv, n):
    from theoremkb_ray.stages.rollup import segment_nth

    vals, offs = sv
    out = segment_nth(vals, offs, n)
    for i in range(len(offs) - 1):
        seg = vals[offs[i] : offs[i + 1]]
        ok = (n >= 0 and len(seg) > n) or (n < 0 and len(seg) >= -n)
        assert out[i] == (seg[n] if ok else 0)


# ----------------------------------------------------------- BIO decode


def _bio_decode_reference(tag_ids, offsets):
    """Per-doc per-line Python BIO decoder (the reference's group
    counter semantics, extractors/crf.py:107-131)."""
    spans = []
    for d in range(len(offsets) - 1):
        seq = tag_ids[offsets[d] : offsets[d + 1]]
        group = 0
        cur = None  # (kind, start)
        for j, t in enumerate(seq):
            kind = (t - 1) // 2 if t > 0 else -1
            is_b = t > 0 and (t - 1) % 2 == 0
            if cur is not None and (t == 0 or is_b or kind != cur[0]):
                spans.append((d, cur[0], cur[2], cur[1], j - 1))
                cur = None
            if t > 0 and cur is None:
                group += 1
                cur = (kind, j, group)
        if cur is not None:
            spans.append((d, cur[0], cur[2], cur[1], len(seq) - 1))
    return spans


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(0, 6), min_size=0, max_size=40),
    st.lists(st.integers(0, 10), min_size=1, max_size=5),
)
def test_tags_to_spans_matches_reference_decoder(tags, counts):
    from theoremkb_ray.stages.crf import tags_to_spans_flat

    total = sum(counts)
    tags = (tags * (total // max(len(tags), 1) + 1))[:total]
    tag_ids = np.asarray(tags, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    got = tags_to_spans_flat(tag_ids, offs)
    got_spans = sorted(
        zip(
            got["doc_idx"].tolist(),
            got["label_id"].tolist(),
            got["group"].tolist(),
            got["start_line"].tolist(),
            got["end_line"].tolist(),
        )
    )
    want = sorted(_bio_decode_reference(tag_ids, offs))
    assert got_spans == want


# -------------------------------------------------------------- minhash


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=30),
    st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=30),
)
def test_minhash_union_is_elementwise_min(a, b):
    """Exact MinHash identity: sig(A ∪ B) == min(sig(A), sig(B)) —
    the property that makes signatures mergeable sketches."""
    from theoremkb_ray.functions.hashing import minhash_signature

    A = np.asarray(a, dtype=np.uint64)
    B = np.asarray(b, dtype=np.uint64)
    U = np.union1d(A, B) if len(A) or len(B) else np.empty(0, np.uint64)
    su = minhash_signature(U.astype(np.uint64), num_perm=16)
    sm = np.minimum(
        minhash_signature(A, num_perm=16), minhash_signature(B, num_perm=16)
    )
    assert (su == sm).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=30))
def test_minhash_order_invariant(a):
    from theoremkb_ray.functions.hashing import minhash_signature

    A = np.asarray(a, dtype=np.uint64)
    rng = np.random.RandomState(7)
    P = A[rng.permutation(len(A))]
    assert (
        minhash_signature(A, num_perm=16)
        == minhash_signature(P, num_perm=16)
    ).all()


# --------------------------------------------------------- hamming / cc


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=20),
    st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=20),
)
def test_hamming64_matches_popcount(xs, ys):
    from theoremkb_ray.functions.hashing import hamming64

    n = min(len(xs), len(ys))
    a = np.asarray(xs[:n], dtype=np.uint64)
    b = np.asarray(ys[:n], dtype=np.uint64)
    got = hamming64(a, b)
    want = [bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b)]
    assert got.tolist() == want


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=30,
    )
)
def test_connected_components_local_min_label(edges):
    """Every node's label is the lexicographic MIN of its component
    (BFS oracle)."""
    from theoremkb_ray.stages.canonicalize import connected_components_local

    names = [f"n{i:02d}" for i in range(13)]
    tbl = pa.table(
        {
            "a": pa.array([names[x] for x, _ in edges]),
            "b": pa.array([names[y] for _, y in edges]),
        }
    )
    got = connected_components_local(tbl)
    # BFS oracle
    adj: dict[str, set] = {}
    for x, y in edges:
        adj.setdefault(names[x], set()).add(names[y])
        adj.setdefault(names[y], set()).add(names[x])
    seen = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = set(), [start]
        while stack:
            v = stack.pop()
            if v in comp:
                continue
            comp.add(v)
            stack.extend(adj[v] - comp)
        seen |= comp
        lo = min(comp)
        for v in comp:
            assert got[v] == lo


# ---------------------------------------------- chunking property


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(1, 40), min_size=1, max_size=6),
    st.integers(2, 10),
    st.integers(1, 10),
)
def test_chunk_documents_matches_loop(ntoks, window, stride):
    import ray.data as rd

    from theoremkb_ray.stages.chunk import chunk_documents

    stride = min(stride, window)
    texts = [
        " ".join(f"t{d}_{i}" for i in range(n))
        for d, n in enumerate(ntoks)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)
    got = sorted(
        map(
            tuple,
            chunk_documents(ds, window=window, stride=stride)
            .to_pandas()[["doc_id", "chunk_id", "n_tokens", "chunk"]]
            .itertuples(False),
        )
    )
    want = []
    for d, t in enumerate(texts):
        toks = t.split(" ")
        s, cid = 0, 0
        while True:
            piece = toks[s : s + window]
            want.append((d, cid, len(piece), " ".join(piece)))
            cid += 1
            s += stride
            if s >= len(toks):
                break
    assert got == sorted(want)


# ------------------------------------------ interval-join property


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=40),
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 400)),
        min_size=1,
        max_size=8,
    ),
    st.integers(50, 400),
)
def test_interval_join_matches_loop(ts, spans, bucket):
    import ray.data as rd

    from theoremkb_ray.stages.joins import interval_join

    pts = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(len(ts)), pa.int64()),
                "ts": pa.array(np.asarray(ts, np.int64)),
            }
        )
    ).repartition(2)
    ivs = rd.from_arrow(
        pa.table(
            {
                "window_id": pa.array(range(len(spans)), pa.int64()),
                "start_us": pa.array(
                    np.asarray([s for s, _ in spans], np.int64)
                ),
                "end_us": pa.array(
                    np.asarray([s + w for s, w in spans], np.int64)
                ),
            }
        )
    ).repartition(2)
    df = interval_join(
        pts, ivs, point_cols=["event_id"],
        interval_cols=["window_id"], bucket_us=bucket,
    ).to_pandas()
    # an all-empty result can come back schemaless through Ray
    got = (
        sorted(
            map(tuple, df[["window_id", "event_id"]].itertuples(False))
        )
        if len(df)
        else []
    )
    want = sorted(
        (wi, ei)
        for ei, t in enumerate(ts)
        for wi, (s, w) in enumerate(spans)
        if s <= t < s + w
    )
    assert got == want


# -------------------------------------- weighted-sample property


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 999)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 20),
)
def test_weighted_sample_matches_loop(rows, k):
    import ray.data as rd

    from theoremkb_ray.stages.sampling import weighted_sample

    ids = np.array([r[0] for r in rows], np.int64)
    w = np.array([r[1] for r in rows], np.int64)
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
    ).repartition(3)
    got = weighted_sample(ds, "doc_id", "n_chars", k=k).to_pandas()
    r = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
        1 << 32
    )
    u = (r.astype(np.float64) + 1.0) / float((1 << 32) + 1)
    e = -np.log(u) / w
    order = np.lexsort((ids, e))
    want = [int(ids[i]) for i in order[: min(k, len(ids))]]
    assert list(got["doc_id"]) == want
