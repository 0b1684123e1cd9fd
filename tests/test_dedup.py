"""Dedup operator tests over a synthetic documents table."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.dedup import (
    dup_assignments,
    embedding_dup_edges,
    exact_dedup,
    minhash_dedup,
    minhash_dup_edges,
    ngram_jaccard_edges,
    simhash_dup_edges,
)

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega".split()
)


def _docs(n=40, n_dup=6, seed=3):
    """n base docs + n_dup near-duplicates (few words changed) +
    2 exact duplicates."""
    rng = np.random.RandomState(seed)
    texts, ids = [], []
    for i in range(n):
        w = [ _WORDS[j] for j in rng.randint(0, len(_WORDS), 60) ]
        texts.append(" ".join(w))
        ids.append(f"d{i:03d}")
    for i in range(n_dup):
        w = texts[i].split()
        for j in rng.randint(0, len(w), 2):
            w[j] = _WORDS[int(rng.randint(0, len(_WORDS)))]
        texts.append(" ".join(w))
        ids.append(f"n{i:03d}")
    texts.append(texts[0])
    ids.append("x000")  # exact dup of d000
    texts.append(texts[1])
    ids.append("x001")
    return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})


def test_exact_dedup_keeps_min_id():
    t = _docs()
    out = exact_dedup(rd.from_arrow(t)).to_pandas()
    assert len(out) == t.num_rows - 2  # two exact dupes removed
    assert "x000" not in set(out["doc_id"])  # d000 < x000 kept
    assert "d000" in set(out["doc_id"])


def test_minhash_finds_near_dups():
    t = _docs()
    edges = minhash_dup_edges(rd.from_arrow(t))
    canon = dup_assignments(edges)
    # each near-dup n00i must map to its base d00i (or share a component)
    for i in range(6):
        a, b = f"d{i:03d}", f"n{i:03d}"
        assert canon.get(b) == a or canon.get(a) == b, (a, b, canon)
    # unrelated docs must NOT be merged
    merged = set(canon) | set(canon.values())
    assert len(merged) <= 2 * (6 + 2) + 2


def test_minhash_dedup_filters_rows():
    t = _docs()
    out = minhash_dedup(rd.from_arrow(t)).to_pandas()
    kept = set(out["doc_id"])
    assert "d000" in kept and "n000" not in kept and "x000" not in kept
    assert len(out) == 40  # 40 unique base docs survive


def test_simhash_finds_near_identical():
    """SimHash dedup (Manku-style, hamming<=3) targets NEAR-IDENTICAL
    docs: 1 word changed out of 200."""
    rng = np.random.RandomState(5)
    texts, ids = [], []
    for i in range(20):
        w = [_WORDS[j] for j in rng.randint(0, len(_WORDS), 200)]
        texts.append(" ".join(w))
        ids.append(f"d{i:03d}")
    for i in range(5):
        w = texts[i].split()
        w[int(rng.randint(0, len(w)))] = _WORDS[int(rng.randint(0, len(_WORDS)))]
        texts.append(" ".join(w))
        ids.append(f"n{i:03d}")
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    canon = dup_assignments(simhash_dup_edges(rd.from_arrow(t)))
    hit = sum(
        1
        for i in range(5)
        if canon.get(f"n{i:03d}") == f"d{i:03d}"
        or canon.get(f"d{i:03d}") == f"n{i:03d}"
    )
    assert hit >= 4


def test_ngram_jaccard_exact_verify():
    t = _docs()
    # ngram_jaccard_edges is distributed end-to-end: returns a Dataset
    edges = pa.Table.from_pandas(
        ngram_jaccard_edges(rd.from_arrow(t), threshold=0.6).to_pandas()
    )
    pairs = set(zip(edges["a"].to_pylist(), edges["b"].to_pylist()))
    assert ("d000", "x000") in pairs or ("x000", "d000") in pairs
    js = edges["jaccard"].to_pylist()
    assert all(j >= 0.6 for j in js)
    exact = [
        j
        for a, b, j in zip(
            edges["a"].to_pylist(), edges["b"].to_pylist(), js
        )
        if (a, b) in {("d000", "x000"), ("d001", "x001")}
    ]
    assert all(j == 1.0 for j in exact)


def test_embedding_dup_edges():
    rng = np.random.RandomState(0)
    base = rng.standard_normal((30, 32)).astype(np.float32)
    near = base[:5] + rng.standard_normal((5, 32)).astype(np.float32) * 0.01
    vecs = np.concatenate([base, near])
    ids = [f"v{i:03d}" for i in range(30)] + [f"w{i:03d}" for i in range(5)]
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    canon = dup_assignments(embedding_dup_edges(rd.from_arrow(t), dim=32))
    hit = sum(
        1
        for i in range(5)
        if canon.get(f"w{i:03d}") == f"v{i:03d}"
        or canon.get(f"v{i:03d}") == f"w{i:03d}"
    )
    assert hit >= 4


def test_dup_assignments_distributed_matches_local():
    """Above-threshold routing (forced with threshold=0) produces the
    exact same assignments as the driver union-find path."""
    t = _docs()
    edges = minhash_dup_edges(rd.from_arrow(t))
    local = dup_assignments(edges, distributed_threshold=10**9)
    dist = dup_assignments(edges, distributed_threshold=0)
    assert dist == local


def test_dedup_by_edges_matches_minhash_dedup():
    from theoremkb_ray.stages.dedup import dedup_by_edges, minhash_dedup

    t = _docs()
    broadcast_ids = sorted(
        minhash_dedup(rd.from_arrow(t)).to_pandas()["doc_id"]
    )
    joined_ids = sorted(
        dedup_by_edges(
            rd.from_arrow(t), minhash_dup_edges(rd.from_arrow(t))
        ).to_pandas()["doc_id"]
    )
    assert joined_ids == broadcast_ids
    assert len(joined_ids) < t.num_rows  # something was actually dropped


def test_exact_ngram_dedup_matches_bruteforce(ray_session):
    """exact_ngram_dup_edges == brute-force df-filtered word-5-gram
    Jaccard on a corpus with planted near-dups."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.stages.dedup import exact_ngram_dup_edges, ngram_dedup

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(60)]
    docs = {}
    for i in range(40):
        docs[f"d{i:03d}"] = " ".join(rng.choice(vocab, 40))
    # planted near-dups: copy with one token swapped
    for i in range(6):
        src = f"d{i:03d}"
        toks = docs[src].split()
        toks[20] = "zzz"
        docs[f"x{i:03d}"] = " ".join(toks)
    tbl = pa.table(
        {"doc_id": list(docs), "text": list(docs.values())}
    )

    got = (
        exact_ngram_dup_edges(rd.from_arrow(tbl), threshold=0.5)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )

    # brute force with identical semantics
    def grams(t):
        tok = t.split()
        return set(" ".join(tok[i : i + 5]) for i in range(len(tok) - 4))

    G = {k: grams(v) for k, v in docs.items()}
    from collections import Counter

    df_counts = Counter(g for s in G.values() for g in s)
    Gf = {k: {g for g in s if df_counts[g] <= 64} for k, s in G.items()}
    want = []
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = len(Gf[a] & Gf[b])
        un = len(Gf[a]) + len(Gf[b]) - inter
        if un and inter / un >= 0.5:
            want.append((a, b, inter / un))
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert len(want) == 6  # every planted dup found, nothing else

    kept = set(
        ngram_dedup(rd.from_arrow(tbl), threshold=0.5)
        .to_pandas()["doc_id"]
    )
    assert kept == {k for k in docs if not k.startswith("x")}


def test_dup_cluster_sizes_planted_groups(tmp_path):
    """Two planted near-dup groups (sizes 3 and 2) among unique docs
    -> histogram {3: 1, 2: 1}; singletons never appear."""
    import pandas as pd

    import __ray_entry__ as entry

    base = (
        "the quick brown fox jumps over the lazy dog near the old "
        "river bank while seven wizards watch quietly from afar"
    )
    docs, did = [], 0

    def add(text):
        nonlocal did
        docs.append({"doc_id": did, "text": text, "lang": "en",
                     "source": "s", "n_chars": len(text)})
        did += 1

    for suffix in ("", " one", " two"):          # group of 3
        add(base + suffix)
    other = (
        "completely separate second passage about ancient mountain "
        "trails where careful travelers gather rare herbs under "
        "bright winter stars every single evening"
    )
    for suffix in (" alpha", " beta"):           # group of 2
        add(other + suffix)
    rng = np.random.RandomState(5)
    vocab = [f"tok{i}" for i in range(500)]
    for _ in range(20):                          # unique background
        add(" ".join(rng.choice(vocab, 40)))
    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame(docs).to_parquet(d / "documents.parquet", index=False)
    got = (
        entry.queries()["dup_cluster_sizes"](str(d))
        .to_pandas()
        .sort_values("cluster_size")
        .reset_index(drop=True)
    )
    assert list(got["cluster_size"]) == [2, 3]
    assert list(got["n_clusters"]) == [1, 1]
