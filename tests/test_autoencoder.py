"""Autoencoder similarity (T7): training converges, latent cosine
separates near-dups from unrelated docs, LSH dedup over the learned
embedding recovers planted duplicates, training is deterministic."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.autoencoder import (
    Autoencoder,
    autoencoder_dup_edges,
    embed_documents,
    fit_autoencoder_distributed,
    hashed_bow,
)
from theoremkb_ray.stages.dedup import dup_assignments

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega".split()
)


def _docs(n=60, n_dup=8, seed=11):
    rng = np.random.RandomState(seed)
    texts, ids = [], []
    for i in range(n):
        w = [_WORDS[j] for j in rng.randint(0, len(_WORDS), 60)]
        texts.append(" ".join(w))
        ids.append(f"d{i:03d}")
    for i in range(n_dup):
        w = texts[i].split()
        for j in rng.randint(0, len(w), 2):
            w[j] = _WORDS[int(rng.randint(0, len(_WORDS)))]
        texts.append(" ".join(w))
        ids.append(f"n{i:03d}")
    return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})


def test_training_reduces_reconstruction_error():
    t = _docs()
    X = hashed_bow(t["text"].combine_chunks())
    m0 = Autoencoder.fit(X, epochs=1)
    m = Autoencoder.fit(X, epochs=30)
    assert m.reconstruction_error(X) < m0.reconstruction_error(X)


def test_latent_cosine_separates_near_dups():
    t = _docs()
    m = fit_autoencoder_distributed(rd.from_arrow(t), epochs=30)
    X = hashed_bow(t["text"].combine_chunks())
    H = m.encode(X)
    ids = t["doc_id"].to_pylist()
    idx = {d: i for i, d in enumerate(ids)}
    dup_cos = [
        float(H[idx[f"d{i:03d}"]] @ H[idx[f"n{i:03d}"]]) for i in range(8)
    ]
    rng = np.random.RandomState(0)
    rand_cos = [
        float(H[idx[f"d{i:03d}"]] @ H[idx[f"d{j:03d}"]])
        for i, j in zip(rng.randint(0, 30, 40), rng.randint(30, 60, 40))
    ]
    assert min(dup_cos) > np.mean(rand_cos)
    assert np.mean(dup_cos) > 0.9


def test_autoencoder_dedup_recovers_planted_dups():
    t = _docs()
    m = fit_autoencoder_distributed(rd.from_arrow(t), epochs=30)
    edges = autoencoder_dup_edges(
        rd.from_arrow(t), m, max_hamming=8
    )
    canon = dup_assignments(edges)
    found = sum(
        1
        for i in range(8)
        if canon.get(f"n{i:03d}") == f"d{i:03d}"
        or canon.get(f"d{i:03d}") == f"n{i:03d}"
    )
    assert found >= 6, (found, canon)


def test_embedder_schema_and_determinism():
    t = _docs(n=20, n_dup=0)
    X = hashed_bow(t["text"].combine_chunks())
    m1 = Autoencoder.fit(X, epochs=3)
    m2 = Autoencoder.fit(X, epochs=3)
    assert np.array_equal(m1.W1, m2.W1)  # seeded -> identical weights
    out = embed_documents(rd.from_arrow(t), m1).take_batch(
        5, batch_format="pyarrow"
    )
    emb = out["embedding"].to_pylist()
    assert len(emb[0]) == m1.W1.shape[1]
    n = np.linalg.norm(np.asarray(emb[0]))
    assert abs(n - 1.0) < 1e-5
