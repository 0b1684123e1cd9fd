"""Deterministic vectorized hashing kernels: stable 64-bit hashes,
shingles, MinHash signatures, SimHash, rolling fingerprints.

All hashes are process-independent (no PYTHONHASHSEED dependence):
string hashing goes through pandas' C siphash (``pd.util.hash_array``
with a fixed key), numeric mixing uses splitmix64-style arithmetic on
uint64 with wraparound. These back the dedup / LSH candidate-generation
stages (SURVEY.md §2.7 D1/D6) — the one sketch family added by design
on top of the reference (which only has exact in-memory dedup, e.g.
``drop_duplicates`` in NLP/2.1 cell 15).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY = "theoremkb_ray0__"  # 16 bytes, fixed -> deterministic

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash of an array of strings (C siphash, no loop)."""
    arr = np.asarray(values, dtype=object)
    h = pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)
    if seed:
        h = splitmix64(h ^ _U64(seed))
    return h.astype(np.uint64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)) & _MASK64
        x = ((x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK64
        x = ((x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK64
        x = x ^ (x >> _U64(31))
    return x


def key_rank64(values, seed: int = 0) -> np.ndarray:
    """uint64 sampling rank of a key column.

    Integer keys rank by a pure splitmix64 chain —
    ``splitmix64(splitmix64(u64(key)) ^ seed)`` — which a SQL oracle
    can reproduce exactly with 128-bit wrap-around arithmetic
    (DuckDB UHUGEINT; see ``_splitmix_rank_ctes`` in
    ``__ray_entry__.py``), so hash-deterministic sampling over integer
    keys is value-hash-checkable. Non-integer keys fall back to the
    siphash path of :func:`hash_strings` (not SQL-expressible).

    Negative integers wrap mod 2**64 at runtime; the SQL twin assumes
    non-negative keys (DuckDB refuses CAST(negative AS UBIGINT)).
    """
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        with np.errstate(over="ignore"):
            h = splitmix64(arr.astype(np.uint64))
    else:
        h = hash_strings(arr)
    if seed:
        h = splitmix64(h ^ _U64(seed))
    return h


def shingle_hashes(token_hashes: np.ndarray, k: int = 3) -> np.ndarray:
    """uint64 hashes of all k-grams of a token-hash sequence.

    Combines k consecutive token hashes with a position-salted mix —
    order-sensitive, vectorized (no Python loop over shingles).
    """
    n = len(token_hashes)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        k = n
    th = token_hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        acc = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):  # k is tiny (3); inner ops are vectorized
            acc = (acc * _U64(0x100000001B3) + th[j : n - k + 1 + j]) & _MASK64
    return splitmix64(acc)


# Fixed random-but-deterministic universal-hash parameters for MinHash.
_MINHASH_RNG = np.random.RandomState(0xC0FFEE)


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(0xC0FFEE + num_perm)
    a = rng.randint(1, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64) | _U64(1)
    b = rng.randint(0, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(
    shingles: np.ndarray, num_perm: int = 128
) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle-hash set.

    h_i(x) = splitmix-free universal hash (a_i * x + b_i) mod 2^64;
    empty input yields the all-max signature (matches nothing).
    """
    if len(shingles) == 0:
        return np.full(num_perm, _MASK64, dtype=np.uint64)
    a, b = _minhash_params(num_perm)
    with np.errstate(over="ignore"):
        # (S, P) matrix of permuted hashes -> column mins
        m = (shingles[:, None] * a[None, :] + b[None, :]) & _MASK64
    return m.min(axis=0)


def minhash_signatures(
    list_of_shingle_arrays: list[np.ndarray], num_perm: int = 128
) -> np.ndarray:
    """Batch variant: (N, num_perm) uint64 signatures."""
    out = np.empty((len(list_of_shingle_arrays), num_perm), dtype=np.uint64)
    for i, s in enumerate(list_of_shingle_arrays):
        out[i] = minhash_signature(s, num_perm)
    return out


def flat_tokens_arrow(texts):
    """(flat pyarrow StringArray of tokens, int64[N+1] doc offsets)
    for a pyarrow string (chunked) array — ONE Arrow whitespace split
    for the whole batch. Arrow's ``utf8_split_whitespace`` emits empty
    tokens at string edges; those are dropped so tokenization matches
    Python ``str.split`` (and DuckDB ``regexp_split_to_array('\\s+')``
    + empty filter)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    lst = pc.utf8_split_whitespace(texts)
    counts = lst.value_lengths().to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    flat = lst.flatten()
    n = len(counts)
    starts = np.zeros(n + 1, np.int64)
    if len(flat) == 0:
        return flat, starts
    keep = pc.greater(pc.binary_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    d = np.repeat(np.arange(n, dtype=np.int64), counts)[keep_np]
    flat = flat.filter(keep)
    starts[1:] = np.cumsum(np.bincount(d, minlength=n))
    return flat, starts


def flat_token_hashes_arrow(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat token hashes, int64[N+1] doc offsets) for a pyarrow
    string (chunked) array — :func:`flat_tokens_arrow` + ONE siphash
    call for the whole batch."""
    flat, starts = flat_tokens_arrow(texts)
    if len(flat) == 0:
        return np.empty(0, np.uint64), starts
    h = hash_strings(flat.to_numpy(zero_copy_only=False))
    return h, starts


def shingle_hashes_flat(
    flat_tokens: np.ndarray, starts: np.ndarray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Batch variant of :func:`shingle_hashes` over ONE flat token-hash
    array for N docs (``starts``: int64[N+1] doc offsets).

    Returns (flat_shingles, shingle_doc) — identical values to calling
    ``shingle_hashes`` per doc (docs shorter than k get one shingle of
    all their tokens; empty docs get none). One numpy pass for the
    common case; only the rare short docs (<k tokens) loop.
    """
    n_docs = len(starts) - 1
    lengths = np.diff(starts)
    F = len(flat_tokens)
    th = flat_tokens.astype(np.uint64, copy=False)
    if F == 0 or n_docs == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    d = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    out_s: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    if F >= k:
        # positions whose k-gram stays inside one doc
        pos = np.flatnonzero(d[: F - k + 1] == d[k - 1 :])
        if len(pos):
            with np.errstate(over="ignore"):
                acc = np.zeros(len(pos), dtype=np.uint64)
                for j in range(k):
                    acc = (acc * _U64(0x100000001B3) + th[pos + j]) & _MASK64
            out_s.append(splitmix64(acc))
            out_d.append(d[pos])
    short = np.flatnonzero((lengths > 0) & (lengths < k))
    for i in short:  # rare: docs with fewer than k tokens
        out_s.append(shingle_hashes(th[starts[i] : starts[i + 1]], k=k))
        out_d.append(np.full(1, i, np.int64))
    if not out_s:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    s = np.concatenate(out_s)
    sd = np.concatenate(out_d)
    order = np.argsort(sd, kind="stable")  # short-doc fixups in doc order
    return s[order], sd[order]


def minhash_signatures_flat(
    flat_shingles: np.ndarray,
    shingle_doc: np.ndarray,
    n_docs: int,
    num_perm: int = 128,
) -> np.ndarray:
    """(N, num_perm) MinHash signatures from a flat shingle array with
    per-shingle doc ids (sorted by doc). Identical output to
    :func:`minhash_signatures` without a per-doc Python loop.

    Streams one PERMUTATION at a time through a reused F-sized buffer
    instead of materializing the full (F, P) matrix: peak extra memory
    is 8F bytes, not 8FP — the matrix version allocates ~P x the
    shingle array fresh on every batch (hundreds of MB at real batch
    sizes), which both caps batch size and stalls on first-touch page
    faults; the streamed loop is P slim vectorized passes over warm
    memory. uint64 arithmetic wraps mod 2^64 — identical to the old
    explicit ``& MASK`` (measured byte-identical in test_dedup)."""
    out = np.full((n_docs, num_perm), _MASK64, dtype=np.uint64)
    if len(flat_shingles) == 0:
        return out
    a, b = _minhash_params(num_perm)
    fs = flat_shingles.astype(np.uint64, copy=False)
    present, seg_starts = np.unique(shingle_doc, return_index=True)
    tmp = np.empty(len(fs), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            np.multiply(fs, a[p], out=tmp)
            np.add(tmp, b[p], out=tmp)
            out[present, p] = np.minimum.reduceat(tmp, seg_starts)
    return out


def simhash64_flat(
    flat_tokens: np.ndarray, starts: np.ndarray
) -> np.ndarray:
    """Batch variant of :func:`simhash64` over one flat token-hash
    array (``starts``: int64[N+1] doc offsets). Empty docs -> 0."""
    n_docs = len(starts) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(flat_tokens) == 0 or n_docs == 0:
        return out
    th = flat_tokens.astype(np.uint64, copy=False)
    lengths = np.diff(starts)
    nonempty = np.flatnonzero(lengths > 0)
    if len(nonempty) == 0:
        return out
    # one bit PLANE at a time through a reused F-sized buffer: the
    # unpackbits route materializes an (F, 64) matrix (+ an 8x-wider
    # int64 copy for the reduceat) fresh per batch — O(64F) peak and
    # first-touch page-fault stalls at real batch sizes. Bit index m of
    # the result equals majority(bit m of tokens) either way
    # (unpack->pack is an identity on bit positions); verified
    # byte-identical to :func:`simhash64` in tests.
    seg = starts[nonempty]
    half = lengths[nonempty].astype(np.uint64)
    acc = np.zeros(len(nonempty), dtype=np.uint64)
    tmp = np.empty(len(th), dtype=np.uint64)
    for m in range(64):
        np.right_shift(th, np.uint64(m), out=tmp)
        np.bitwise_and(tmp, np.uint64(1), out=tmp)
        ones = np.add.reduceat(tmp, seg)
        acc |= (2 * ones > half).astype(np.uint64) << np.uint64(m)
    out[nonempty] = acc
    return out


def band_hashes(
    signatures: np.ndarray, num_bands: int
) -> np.ndarray:
    """LSH band hashes: (N, num_bands) uint64, rows/band = P//num_bands.

    Two rows sharing any ``(band_index, band_hash)`` pair are candidate
    near-duplicates (classic MinHash-LSH banding).
    """
    n, p = signatures.shape
    r = p // num_bands
    assert r * num_bands == p, "num_perm must be divisible by num_bands"
    bands = signatures[:, : r * num_bands].reshape(n, num_bands, r)
    with np.errstate(over="ignore"):
        acc = np.zeros((n, num_bands), dtype=np.uint64)
        for j in range(r):
            acc = (acc * _U64(0x100000001B3) + bands[:, :, j]) & _MASK64
        # salt by band index so identical band contents in different
        # bands never collide into one bucket key
        acc = splitmix64(acc ^ np.arange(num_bands, dtype=np.uint64)[None, :])
    return acc


def simhash64(token_hashes_list: list[np.ndarray]) -> np.ndarray:
    """64-bit SimHash per document from its token-hash array."""
    out = np.empty(len(token_hashes_list), dtype=np.uint64)
    for i, th in enumerate(token_hashes_list):
        if len(th) == 0:
            out[i] = 0
            continue
        bits = np.unpackbits(th.view(np.uint8).reshape(len(th), 8), axis=1)
        # int64: an unsigned accumulator would wrap on negative votes
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(th)
        sim = np.packbits((votes > 0).astype(np.uint8))
        out[i] = sim.view(np.uint64)[0]
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return np.unpackbits(
        x.view(np.uint8).reshape(len(x), 8), axis=1
    ).sum(axis=1)


def rolling_fingerprint(
    token_hashes: np.ndarray, window: int = 8, keep_mod: int = 16
) -> np.ndarray:
    """Winnowing-style document fingerprint: rolling window hashes,
    keep those ≡ 0 (mod keep_mod). Returns a sorted uint64 array."""
    w = shingle_hashes(token_hashes, k=window)
    if len(w) == 0:
        return w
    kept = w[w % _U64(keep_mod) == 0]
    if len(kept) == 0:  # degenerate tiny doc: keep global min
        kept = w.min(keepdims=True)
    return np.unique(kept)
