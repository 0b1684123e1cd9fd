"""From-scratch numpy autoencoder for text similarity (T7).

The reference embeds theorem statements with a torch GRU autoencoder
and matches them by cosine top-1 (reference:
Styling/tools/thm_similarity/train_autoencoder.py:36-120,
model_autoencoder.py:22-80). This is the Ray-Data-first numpy
re-expression: hashed bag-of-words features -> centered linear
autoencoder (Adam minibatch SGD, MSE reconstruction) trained on
a DISTRIBUTED featurized sample, then an actor-pool embedder stage
whose latent codes feed the existing cosine machinery (SRP-LSH
near-dup, brute/IVF ANN top-k).

Physical plan at scale:
- featurization fans out in ``map_batches`` (one Arrow split + one
  siphash per batch, same kernels as the LSH sketches);
- only a BOUNDED random sample (rows, not the corpus) is collected to
  fit the model — training data is ``sample_max x dim`` floats;
- inference is a stateful actor pool: weights load once per actor in
  ``__init__``, batches are one matmul each;
- downstream dedup/ANN reuse the scale-shaped LSH/broadcast paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import flat_token_hashes_arrow

HASH_DIM = 512
LATENT_DIM = 32


def hashed_bow(texts, dim: int = HASH_DIM) -> np.ndarray:
    """(n, dim) float32 log-TF hashed bag-of-words, L2-normalized.
    One Arrow whitespace split + one siphash call per batch."""
    flat, starts = flat_token_hashes_arrow(texts)
    n = len(starts) - 1
    buckets = (flat % np.uint64(dim)).astype(np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(starts))
    X = np.zeros((n, dim), dtype=np.float32)
    if len(buckets):
        np.add.at(X, (doc, buckets), 1.0)
    X = np.log1p(X)
    norm = np.linalg.norm(X, axis=1, keepdims=True)
    return X / np.maximum(norm, 1e-8)


class Autoencoder:
    """Centered linear autoencoder: (x - mu) @ W1 + b1 -> latent,
    latent @ W2 + b2 -> reconstruction; MSE loss, Adam minibatch SGD.

    Centering is load-bearing for SIMILARITY: hashed-BoW rows share a
    large common direction (corpus word frequencies), and without
    removing it every pair of documents has cosine ~0.95 — the latent
    space can't separate near-dups from strangers. The linear
    bottleneck (vs relu, which collapses to dead units on these tiny
    per-entry magnitudes) learns the principal subspace; cosine there
    cleanly splits planted near-dups (>=0.95) from random pairs
    (~0.0)."""

    def __init__(self, W1, b1, W2, b2, mu) -> None:
        self.W1, self.b1, self.W2, self.b2 = W1, b1, W2, b2
        self.mu = mu

    # -------------------------------------------------- inference
    def encode(self, X: np.ndarray) -> np.ndarray:
        """Unit-normalized latent codes (cosine-ready)."""
        H = (X - self.mu) @ self.W1 + self.b1
        n = np.linalg.norm(H, axis=1, keepdims=True)
        return H / np.maximum(n, 1e-8)

    def reconstruction_error(self, X: np.ndarray) -> float:
        Xc = X - self.mu
        H = Xc @ self.W1 + self.b1
        R = H @ self.W2 + self.b2
        return float(((R - Xc) ** 2).mean())

    # -------------------------------------------------- training
    @classmethod
    def fit(
        cls,
        X: np.ndarray,
        latent: int = LATENT_DIM,
        epochs: int = 30,
        batch: int = 256,
        lr: float = 0.005,
        seed: int = 0xAE,
    ) -> "Autoencoder":
        rng = np.random.RandomState(seed)
        n, dim = X.shape
        mu = X.mean(axis=0, keepdims=True).astype(np.float32)
        Xc = X - mu
        W1 = rng.standard_normal((dim, latent)).astype(np.float32) / np.sqrt(dim)
        b1 = np.zeros(latent, np.float32)
        W2 = rng.standard_normal((latent, dim)).astype(np.float32) / np.sqrt(latent)
        b2 = np.zeros(dim, np.float32)
        ms = [np.zeros_like(p) for p in (W1, b1, W2, b2)]
        vs = [np.zeros_like(p) for p in (W1, b1, W2, b2)]
        m = cls(W1, b1, W2, b2, mu)
        t = 0
        for _ in range(epochs):
            order = rng.permutation(n)
            for s in range(0, n, batch):
                xb = Xc[order[s : s + batch]]
                H = xb @ m.W1 + m.b1
                R = H @ m.W2 + m.b2
                dR = 2.0 * (R - xb) / len(xb)
                gW2 = H.T @ dR
                gb2 = dR.sum(axis=0)
                dH = dR @ m.W2.T
                gW1 = xb.T @ dH
                gb1 = dH.sum(axis=0)
                t += 1
                for p, g, ma, va in zip(
                    (m.W1, m.b1, m.W2, m.b2), (gW1, gb1, gW2, gb2), ms, vs
                ):
                    ma *= 0.9
                    ma += 0.1 * g
                    va *= 0.999
                    va += 0.001 * g * g
                    p -= lr * (ma / (1 - 0.9**t)) / (
                        np.sqrt(va / (1 - 0.999**t)) + 1e-8
                    )
        return m

    # -------------------------------------------------- persistence
    def save(self, path: str) -> None:
        np.savez(
            path, W1=self.W1, b1=self.b1, W2=self.W2, b2=self.b2, mu=self.mu
        )

    @classmethod
    def load(cls, path: str) -> "Autoencoder":
        z = np.load(path)
        return cls(z["W1"], z["b1"], z["W2"], z["b2"], z["mu"])


def fit_autoencoder_distributed(
    ds,
    col: str = "text",
    dim: int = HASH_DIM,
    latent: int = LATENT_DIM,
    sample_max: int = 20_000,
    epochs: int = 30,
    seed: int = 0xAE,
) -> Autoencoder:
    """Featurize in parallel, fit on a BOUNDED sample on the driver.

    The fan-out computes hashed-BoW rows per batch; only ~``sample_max``
    rows (each ``dim`` float32, packed as one binary blob per batch)
    are collected. Sampling is per-batch deterministic (seeded by a
    batch content hash), so the model does not depend on block layout
    beyond which rows exist."""
    n_rows = ds.count()
    frac = min(1.0, sample_max / max(n_rows, 1))

    def feat(b: pa.Table) -> pa.Table:
        texts = b[col]
        X = hashed_bow(texts, dim)
        if frac < 1.0:
            h = pc.cast(pc.binary_length(texts), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            rng = np.random.RandomState((int(h.sum()) + len(h)) & 0x7FFFFFFF)
            keep = rng.random_sample(len(X)) < frac
            X = X[keep]
        return pa.table({"blob": pa.array([X.tobytes()], pa.binary()),
                         "n": pa.array([len(X)], pa.int64())})

    parts = []
    for b in (
        ds.select_columns([col])
        .map_batches(feat, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for blob, k in zip(b["blob"].to_pylist(), b["n"].to_pylist()):
            if k:
                parts.append(
                    np.frombuffer(blob, dtype=np.float32).reshape(k, dim)
                )
    X = (
        np.concatenate(parts)
        if parts
        else np.zeros((1, dim), dtype=np.float32)
    )
    return Autoencoder.fit(X, latent=latent, epochs=epochs, seed=seed)


class AutoencoderEmbedder:
    """Actor-pool batch fn: append a unit-norm latent ``embedding``
    column. Weights load once per actor (model_path) or ship once via
    an object-store ref."""

    def __init__(
        self,
        model_path: str | None = None,
        model: "Autoencoder | None" = None,
        col: str = "text",
        dim: int = HASH_DIM,
    ) -> None:
        # the weights are ~100s of KB — shipping them in the actor
        # constructor is fine and avoids the object-store-lifetime
        # caveat Ray raises for restartable actors with ref args
        self.model = (
            Autoencoder.load(model_path) if model_path is not None else model
        )
        self.col, self.dim = col, dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = hashed_bow(batch[self.col], self.dim)
        H = self.model.encode(X)
        return batch.append_column(
            "embedding",
            pa.array(list(H), pa.list_(pa.float32(), H.shape[1])),
        )


def embed_documents(
    ds, model: Autoencoder, col: str = "text", dim: int = HASH_DIM,
    concurrency=(1, 8),
):
    return ds.map_batches(
        AutoencoderEmbedder,
        fn_constructor_kwargs={"model": model, "col": col, "dim": dim},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
    )


def autoencoder_dup_edges(
    ds,
    model: Autoencoder,
    col: str = "text",
    id_col: str = "doc_id",
    dim: int = HASH_DIM,
    max_hamming: int = 6,
):
    """Learned-embedding near-dup edges: embed (actor pool) -> SRP-LSH
    banding over the latent space (the same scale-shaped candidate
    machinery as raw-embedding dedup)."""
    from .dedup import embedding_dup_edges

    emb = embed_documents(ds, model, col=col, dim=dim)
    return embedding_dup_edges(
        emb.select_columns([id_col, "embedding"]),
        dim=model.W1.shape[1],
        id_col=id_col,
        col="embedding",
        max_hamming=max_hamming,
    )
