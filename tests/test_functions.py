"""Unit tests for the vectorized scalar/hash kernels."""

import numpy as np
import pyarrow as pa

from theoremkb_ray.functions.hashing import (
    band_hashes,
    hamming64,
    hash_strings,
    minhash_signature,
    rolling_fingerprint,
    shingle_hashes,
    simhash64,
)
from theoremkb_ray.functions.text import (
    get_pattern,
    get_pattern_array,
    norm_title_array,
    normalize_text,
    sha256_hex,
)


def test_get_pattern_matches_scalar_and_vector():
    texts = ["Theorem", "Lemma3.1", "The-orem 2", "ABC123xyz", ""]
    arr = get_pattern_array(pa.array(texts)).to_pylist()
    assert arr == [get_pattern(t) for t in texts]
    assert get_pattern("Lemma3.1") == "lemma@@"


def test_normalize_dehyphenates():
    assert normalize_text("fi-  nal result") == "final result"


def test_norm_title():
    out = norm_title_array(pa.array(["The  Title: Part 2!"])).to_pylist()
    assert out == ["thetitlepart"]


def test_sha256_matches_hashlib():
    import hashlib

    vals = ["abc", "", "x" * 1000]
    got = sha256_hex(vals)
    for v, g in zip(vals, got):
        assert g == hashlib.sha256(v.encode()).hexdigest()


def test_hash_strings_deterministic_and_seeded():
    a = hash_strings(["foo", "bar"])
    b = hash_strings(["foo", "bar"])
    assert np.array_equal(a, b)
    c = hash_strings(["foo", "bar"], seed=1)
    assert not np.array_equal(a, c)


def test_minhash_jaccard_estimate():
    rng = np.random.RandomState(0)
    base = rng.randint(0, 2**62, 500).astype(np.uint64)
    # 90% overlapping set
    other = np.concatenate(
        [base[:450], rng.randint(0, 2**62, 50).astype(np.uint64)]
    )
    s1 = minhash_signature(base, 128)
    s2 = minhash_signature(other, 128)
    est = (s1 == s2).mean()
    true_j = len(np.intersect1d(base, other)) / len(np.union1d(base, other))
    assert abs(est - true_j) < 0.12


def test_band_hashes_shape_and_collision():
    sigs = np.stack([minhash_signature(np.arange(100, dtype=np.uint64), 64)] * 2)
    b = band_hashes(sigs, 16)
    assert b.shape == (2, 16)
    assert np.array_equal(b[0], b[1])  # identical sigs -> identical bands


def test_simhash_similar_docs_close():
    rng = np.random.RandomState(1)
    doc = rng.randint(0, 2**62, 200).astype(np.uint64)
    doc2 = doc.copy()
    doc2[:6] = rng.randint(0, 2**62, 6).astype(np.uint64)  # 3% change
    rand = rng.randint(0, 2**62, 200).astype(np.uint64)
    s = simhash64([doc, doc2, rand])
    near = hamming64(s[:1], s[1:2])[0]
    far = hamming64(s[:1], s[2:3])[0]
    assert near < 10 < far


def test_shingles_and_fingerprint():
    th = hash_strings(list("abcdefghij"))
    sh = shingle_hashes(th, 3)
    assert len(sh) == 8
    fp = rolling_fingerprint(th, window=4, keep_mod=4)
    assert len(fp) >= 1
    # deterministic
    assert np.array_equal(fp, rolling_fingerprint(th, window=4, keep_mod=4))
