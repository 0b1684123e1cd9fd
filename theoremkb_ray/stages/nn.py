"""Numpy neural models — the T3/T8/T9 analogs.

The reference ships three learned model families beyond the CRF:

- CNN1D: a context-window dense net over per-token features with a
  per-token softmax (reference: Styling/src/lib/models/cnn1d.py:22-54
  ``net_1d`` — BatchNorm+Dense stack over a ``context_size`` window
  built by ``seq2seqofcontexts``, zero-padded at sequence edges;
  extractor wrapper Styling/src/lib/extractors/cnn1d.py).
- LSTM / transformer sentence classifiers: 3-class
  Theorem/Proof/Basic text classification over sentence text
  (reference: Styling/tools/NLP notebooks, label collapse
  ``round_labels`` — see features.collapse_labels).

tensorflow/keras/torch do not exist in this container, so these are
re-expressed as *from-scratch numpy models with the same interface
contract*: context-window feature input -> per-line softmax tags for
the tagger; hashed bag-of-words -> 3-class softmax for the text
classifier. Both follow the repo's standard split: featurization fans
out over the cluster (map_batches), the sequential fit runs on the
driver over compact payloads, and inference is an actor pool that
loads the artifact once per actor (``__init__``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..schema import N_TAGS
from .crf import N_FEATS, feature_matrix, tags_to_spans_flat
from .segment import spans_to_list_column
from .tokenize import explode_lines

_ART_DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts")
CNN1D_MODEL_PATH = os.path.abspath(os.path.join(_ART_DIR, "cnn1d.npz"))
NLP_MODEL_PATH = os.path.abspath(os.path.join(_ART_DIR, "nlp3.npz"))

#: context window half-width: the tagger sees lines [i-2 .. i+2]
#: (the reference trains with context_size ~ 2-3 tokens each side).
WINDOW = 2


def window_features(
    X: np.ndarray, offsets: np.ndarray, window: int = WINDOW
) -> np.ndarray:
    """(n, F) per-line features -> (n, (2w+1)*F) stacked context
    windows; positions outside the owning document are zero — the
    same zero padding ``seq2seqofcontexts`` applies (reference:
    Styling/src/lib/models/cnn1d.py:66-77). Vectorized: one gather +
    mask per window offset, no per-doc loop."""
    n, F = X.shape
    if n == 0:
        return np.zeros((0, (2 * window + 1) * F), dtype=np.float32)
    lengths = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    doc_start = offsets[:-1][doc_idx]
    doc_end = offsets[1:][doc_idx] - 1
    pos = np.arange(n, dtype=np.int64)
    blocks = []
    Xf = X.astype(np.float32)
    for d in range(-window, window + 1):
        src = pos + d
        valid = (src >= doc_start) & (src <= doc_end)
        blk = Xf[np.clip(src, 0, n - 1)]
        blk[~valid] = 0.0
        blocks.append(blk)
    return np.concatenate(blocks, axis=1)


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


class MLPTagger:
    """Two-layer numpy MLP over context-window features, per-line
    softmax over the BIO tag space — the CNN1D architecture family
    (dense stack over a flattened context window) without keras."""

    def __init__(
        self,
        W1: np.ndarray | None = None,
        b1: np.ndarray | None = None,
        W2: np.ndarray | None = None,
        b2: np.ndarray | None = None,
    ) -> None:
        self.W1, self.b1, self.W2, self.b2 = W1, b1, W2, b2

    # ------------------------------------------------------------ decode
    def predict_tags(self, X: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        Xw = window_features(X, offsets)
        h = np.maximum(Xw @ self.W1 + self.b1, 0.0)
        logits = h @ self.W2 + self.b2
        return logits.argmax(axis=1).astype(np.int32)

    # --------------------------------------------------------------- fit
    def fit(
        self,
        X: np.ndarray,
        offsets: np.ndarray,
        y: np.ndarray,
        hidden: int = 64,
        epochs: int = 30,
        lr: float = 0.05,
        batch: int = 512,
        seed: int = 0,
    ) -> "MLPTagger":
        """Minibatch SGD + momentum on class-weighted cross-entropy
        (the reference balances classes via ``balance_classes``,
        models/cnn1d.py train())."""
        rng = np.random.RandomState(seed)
        Xw = window_features(X, offsets)
        n, D = Xw.shape
        K = N_TAGS
        counts = np.bincount(y, minlength=K).astype(np.float64)
        w_class = 1.0 / np.sqrt(np.maximum(counts, 1.0))
        w_class /= w_class.mean()
        self.W1 = (rng.standard_normal((D, hidden)) * np.sqrt(2.0 / D)).astype(
            np.float32
        )
        self.b1 = np.zeros(hidden, dtype=np.float32)
        self.W2 = (
            rng.standard_normal((hidden, K)) * np.sqrt(2.0 / hidden)
        ).astype(np.float32)
        self.b2 = np.zeros(K, dtype=np.float32)
        vW1 = np.zeros_like(self.W1)
        vb1 = np.zeros_like(self.b1)
        vW2 = np.zeros_like(self.W2)
        vb2 = np.zeros_like(self.b2)
        mom = 0.9
        for _ in range(epochs):
            order = rng.permutation(n)
            for lo in range(0, n, batch):
                idx = order[lo : lo + batch]
                xb, yb = Xw[idx], y[idx]
                h_pre = xb @ self.W1 + self.b1
                h = np.maximum(h_pre, 0.0)
                p = _softmax(h @ self.W2 + self.b2)
                g = p.copy()
                g[np.arange(len(yb)), yb] -= 1.0
                g *= w_class[yb][:, None].astype(np.float32)
                g /= len(yb)
                gW2 = h.T @ g
                gb2 = g.sum(axis=0)
                gh = (g @ self.W2.T) * (h_pre > 0)
                gW1 = xb.T @ gh
                gb1 = gh.sum(axis=0)
                for wv, gv, vv in (
                    (self.W1, gW1, vW1),
                    (self.b1, gb1, vb1),
                    (self.W2, gW2, vW2),
                    (self.b2, gb2, vb2),
                ):
                    vv *= mom
                    vv -= lr * gv
                    wv += vv
        return self

    # -------------------------------------------------------------- io
    def save(self, path: str) -> None:
        np.savez_compressed(
            path, W1=self.W1, b1=self.b1, W2=self.W2, b2=self.b2
        )

    @classmethod
    def load(cls, path: str = CNN1D_MODEL_PATH) -> "MLPTagger":
        z = np.load(path)
        return cls(z["W1"], z["b1"], z["W2"], z["b2"])


class CNN1DSegmenter:
    """Actor-pool callable: tokenized batch -> batch + ``spans``
    column, via the MLP tagger (per-line argmax, no transition chain —
    the context window carries the sequence information, exactly the
    CNN1D-vs-CRF design difference in the reference)."""

    def __init__(self, model_path: str = CNN1D_MODEL_PATH) -> None:
        self.model = MLPTagger.load(model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = explode_lines(batch["lines"])
        X = feature_matrix(flat, offsets)
        tag_ids = self.model.predict_tags(X, offsets)
        spans = tags_to_spans_flat(tag_ids, offsets)
        col = spans_to_list_column(spans, batch.num_rows)
        return batch.append_column("spans", col)


def segment_cnn1d(
    ds,
    model_path: str = CNN1D_MODEL_PATH,
    batch_size: int = 256,
    concurrency=None,
):
    if concurrency is None:
        import ray

        ncpu = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        concurrency = (1, max(4, ncpu))
    return ds.map_batches(
        CNN1DSegmenter,
        fn_constructor_args=(model_path,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def train_cnn1d_distributed(
    corpus_ds,
    gold_spans: pa.Table,
    epochs: int = 30,
    out_path: str | None = None,
    seed: int = 0,
) -> MLPTagger:
    """Distributed featurize (shared with the CRF: the bit-packed
    (X, tags) payload from featurize_for_training) -> driver fit."""
    from .crf import featurize_for_training

    train_ds = featurize_for_training(corpus_ds, gold_spans)
    Xs, ys = [], []
    n_bytes = (N_FEATS + 7) // 8
    for b in train_ds.iter_batches(batch_format="pyarrow"):
        for packed, tags in zip(
            b["packed_feats"].to_pylist(), b["tags"].to_pylist()
        ):
            if not tags:
                continue
            arr = np.frombuffer(bytes(packed), dtype=np.uint8).reshape(
                len(tags), n_bytes
            )
            Xs.append(np.unpackbits(arr, axis=1)[:, :N_FEATS].astype(bool))
            ys.append(np.asarray(tags, dtype=np.int32))
    offsets = np.zeros(len(Xs) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in Xs], out=offsets[1:])
    X = (
        np.concatenate(Xs)
        if Xs
        else np.zeros((0, N_FEATS), dtype=bool)
    )
    y = np.concatenate(ys) if ys else np.zeros(0, dtype=np.int32)
    model = MLPTagger().fit(X, offsets, y, epochs=epochs, seed=seed)
    if out_path:
        model.save(out_path)
    return model


# ===================================================== text classifier


#: hashed bag-of-words dimensionality (feature hashing — the vocab-free
#: analog of the reference's MAX_VOCAB=10000 embedding table,
#: extractors/cnn1d.py:19).
HASH_DIM = 4096

CLS3 = ["Basic", "Theorem", "Proof"]
CLS3_TO_ID = {c: i for i, c in enumerate(CLS3)}


def hashed_line_buckets(
    flat_lines: pa.Array,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-line word-hash buckets: (flat bucket ids, line offsets).
    Words are digit-masked patterns (get_pattern analog) so '10.2' and
    '3.4' share a bucket — the same normalization the reference feeds
    its vocabulary (extractors/cnn1d.py:66-71)."""
    import pyarrow.compute as pc

    from ..functions.hashing import hash_strings
    from .features import line_patterns

    words = pc.split_pattern_regex(line_patterns(flat_lines), r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = words.values
    if offsets[0] != 0:
        vals = vals.slice(offsets[0], offsets[-1] - offsets[0])
        offsets = offsets - offsets[0]
    w = vals.to_numpy(zero_copy_only=False)
    if len(w) == 0:
        return np.zeros(0, dtype=np.int64), offsets
    buckets = (hash_strings(w) % np.uint64(HASH_DIM)).astype(np.int64)
    return buckets, offsets


def _line_logits(
    W: np.ndarray, b: np.ndarray, buckets: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """(K, D) weights x hashed buckets -> (n_lines, K) logits via one
    gather + np.add.reduceat — no per-line Python."""
    n = len(offsets) - 1
    out = np.tile(b, (n, 1))
    if len(buckets) == 0 or n == 0:
        return out
    gathered = W[:, buckets]  # (K, total_words)
    # reduceat over NON-EMPTY line starts only: a clipped start for a
    # TRAILING empty line would land inside the last non-empty line
    # and split its reduction (the same hypothesis-found bug as
    # rollup.segment_sums); between non-empty starts there are no
    # values, so each reduction covers exactly one line.
    nz = np.flatnonzero(np.diff(offsets) > 0)
    if len(nz) == 0:
        return out
    out[nz] += np.add.reduceat(gathered, offsets[:-1][nz], axis=1).T
    return out


class HashedTextClassifier:
    """Multinomial logistic regression over hashed bag-of-words —
    the numpy re-expression of the reference's 3-class NLP sentence
    classifiers (LSTM/transformer notebooks; labels Theorem/Proof/
    Basic from ``round_labels``)."""

    def __init__(
        self, W: np.ndarray | None = None, b: np.ndarray | None = None
    ) -> None:
        self.W = W
        self.b = b

    def predict(
        self, buckets: np.ndarray, offsets: np.ndarray
    ) -> np.ndarray:
        return _line_logits(self.W, self.b, buckets, offsets).argmax(
            axis=1
        ).astype(np.int32)

    def fit(
        self,
        buckets: np.ndarray,
        offsets: np.ndarray,
        y: np.ndarray,
        epochs: int = 20,
        lr: float = 0.5,
        batch: int = 1024,
        seed: int = 0,
    ) -> "HashedTextClassifier":
        rng = np.random.RandomState(seed)
        K = len(CLS3)
        self.W = np.zeros((K, HASH_DIM), dtype=np.float32)
        self.b = np.zeros(K, dtype=np.float32)
        n = len(offsets) - 1
        counts = np.bincount(y, minlength=K).astype(np.float64)
        w_class = 1.0 / np.sqrt(np.maximum(counts, 1.0))
        w_class /= w_class.mean()
        starts = offsets[:-1]
        lens = np.diff(offsets)
        for _ in range(epochs):
            order = rng.permutation(n)
            for lo in range(0, n, batch):
                idx = order[lo : lo + batch]
                logits = np.vstack(
                    [
                        _line_logits(
                            self.W,
                            self.b,
                            buckets[starts[i] : starts[i] + lens[i]],
                            np.array([0, lens[i]], dtype=np.int64),
                        )[0]
                        for i in idx
                    ]
                )
                p = _softmax(logits)
                g = p
                g[np.arange(len(idx)), y[idx]] -= 1.0
                g *= w_class[y[idx]][:, None].astype(np.float32)
                g *= lr / len(idx)
                # scatter gradient into the hashed columns
                for row, i in enumerate(idx):
                    cols = buckets[starts[i] : starts[i] + lens[i]]
                    np.subtract.at(self.W.T, cols, g[row])
                self.b -= g.sum(axis=0)
        return self

    def save(self, path: str) -> None:
        np.savez_compressed(path, W=self.W, b=self.b)

    @classmethod
    def load(cls, path: str = NLP_MODEL_PATH) -> "HashedTextClassifier":
        z = np.load(path)
        return cls(z["W"], z["b"])


def _gather_segments(
    values: np.ndarray, seg_starts: np.ndarray, seg_ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gather [start, end) slices of ``values`` into one packed array
    + offsets, fully vectorized (repeat + grouped arange)."""
    lens = (seg_ends - seg_starts).astype(np.int64)
    off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    if off[-1] == 0:
        return np.zeros(0, dtype=values.dtype), off
    idx = np.repeat(seg_starts, lens) + (
        np.arange(off[-1]) - np.repeat(off[:-1], lens)
    )
    return values[idx], off


def paragraphs_from_lines(
    flat_lines: pa.Array, doc_offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Maximal runs of non-blank lines within each document ->
    (start_line_global, end_line_global, doc_idx). Vectorized run
    detection (roll + boundary masks) — the paragraph is the
    classification unit, matching the reference's sentence/paragraph
    NLP datasets (extracted theorem/proof/basic text chunks)."""
    import pyarrow.compute as pc

    n = int(doc_offsets[-1])
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    blank = (
        pc.equal(pc.utf8_trim_whitespace(flat_lines), "")
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    nonblank = ~blank
    doc_first = np.zeros(n, dtype=bool)
    s_idx = doc_offsets[:-1]
    doc_first[s_idx[s_idx < n]] = True
    prev_nonblank = np.roll(nonblank, 1)
    prev_nonblank[doc_first] = False
    starts = np.flatnonzero(nonblank & ~prev_nonblank)
    next_nonblank = np.roll(nonblank, -1)
    doc_last = np.zeros(n, dtype=bool)
    e_idx = doc_offsets[1:] - 1
    doc_last[e_idx[(e_idx >= 0) & (e_idx < n)]] = True
    next_nonblank[doc_last] = False
    ends = np.flatnonzero(nonblank & ~next_nonblank)
    lengths = np.diff(doc_offsets)
    line_doc = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    return starts, ends, line_doc[starts]


class NLPParagraphClassifier:
    """Actor-pool callable: tokenized docs -> per-paragraph 3-class
    rows (doc_id, start_line, end_line, cls3). Artifact loaded once
    per actor. Paragraph word-bags are contiguous slices of the flat
    bucket array, so classification is one gather + reduceat."""

    def __init__(self, model_path: str = NLP_MODEL_PATH) -> None:
        self.model = HashedTextClassifier.load(model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_offsets = explode_lines(batch["lines"])
        buckets, line_word_off = hashed_line_buckets(flat)
        p_start, p_end, p_doc = paragraphs_from_lines(flat, doc_offsets)
        packed, off = _gather_segments(
            buckets, line_word_off[p_start], line_word_off[p_end + 1]
        ) if len(p_start) else (
            np.zeros(0, dtype=np.int64),
            np.zeros(1, dtype=np.int64),
        )
        pred = self.model.predict(packed, off)
        labels = np.asarray(CLS3, dtype=object)[pred]
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[p_doc]
        doc_base = doc_offsets[:-1][p_doc]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "start_line": pa.array(p_start - doc_base, pa.int64()),
                "end_line": pa.array(p_end - doc_base, pa.int64()),
                "cls3": pa.array(labels, pa.string()),
            }
        )


def classify_paragraphs(
    ds,
    model_path: str = NLP_MODEL_PATH,
    batch_size: int = 256,
    concurrency=(1, 8),
):
    return ds.map_batches(
        NLPParagraphClassifier,
        fn_constructor_args=(model_path,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _paragraph_features_and_gold(
    flat: pa.Array,
    doc_offsets: np.ndarray,
    doc_ids,
    gold_by_doc: dict[str, list],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared train-time kernel: paragraphs -> (packed buckets,
    offsets, 3-class gold). A paragraph's gold class is its FIRST
    line's collapsed label (the head line carries the marker — same
    convention as the reference's extracted sentence datasets)."""
    from .features import COLLAPSE_3

    buckets, line_word_off = hashed_line_buckets(flat)
    p_start, p_end, p_doc = paragraphs_from_lines(flat, doc_offsets)
    if len(p_start) == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(1, dtype=np.int64),
            np.zeros(0, dtype=np.int32),
        )
    packed, off = _gather_segments(
        buckets, line_word_off[p_start], line_word_off[p_end + 1]
    )
    lab = np.full(int(doc_offsets[-1]), "O", dtype=object)
    for i, d in enumerate(doc_ids):
        base = doc_offsets[i]
        for label, s0, s1 in gold_by_doc.get(d, []):
            lab[base + s0 : base + s1 + 1] = label
    y = np.asarray(
        [CLS3_TO_ID[COLLAPSE_3.get(l, "Basic")] for l in lab[p_start]],
        dtype=np.int32,
    )
    return packed, off, y


class _NLPFeaturize:
    """Distributed featurize for the text classifier: per-paragraph
    hashed buckets + collapsed 3-class gold label, emitted as compact
    list rows (ints only — the collect is bucket ids, not text)."""

    def __init__(self, gold_ref) -> None:
        import ray as _ray

        self.gold_by_doc: dict[str, list] = _ray.get(gold_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_offsets = explode_lines(batch["lines"])
        docs = batch["doc_id"].to_pylist()
        packed, off, y = _paragraph_features_and_gold(
            flat, doc_offsets, docs, self.gold_by_doc
        )
        starts = off[:-1]
        lens = np.diff(off)
        return pa.table(
            {
                "y": pa.array(y, pa.int32()),
                "buckets": pa.array(
                    [
                        packed[s : s + ln].tolist()
                        for s, ln in zip(starts, lens)
                    ],
                    pa.list_(pa.int64()),
                ),
            }
        )


def train_nlp_distributed(
    corpus_ds,
    gold_spans: pa.Table,
    epochs: int = 20,
    out_path: str | None = None,
    seed: int = 0,
) -> HashedTextClassifier:
    import ray as _ray

    from .ingest import ingest
    from .tokenize import tokenize

    gold_by_doc: dict[str, list] = {}
    for d, l, s0, s1 in zip(
        gold_spans["doc_id"].to_pylist(),
        gold_spans["label"].to_pylist(),
        gold_spans["start_line"].to_pylist(),
        gold_spans["end_line"].to_pylist(),
    ):
        gold_by_doc.setdefault(d, []).append((l, s0, s1))
    ref = _ray.put(gold_by_doc)
    feat = tokenize(ingest(corpus_ds, verify=False)).map_batches(
        _NLPFeaturize,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
    )
    ys, bucket_lists = [], []
    for b in feat.iter_batches(batch_format="pyarrow"):
        ys.append(b["y"].to_numpy(zero_copy_only=False))
        bucket_lists.extend(b["buckets"].to_pylist())
    y = np.concatenate(ys) if ys else np.zeros(0, dtype=np.int32)
    lens = np.asarray([len(x) for x in bucket_lists], dtype=np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    buckets = (
        np.concatenate([np.asarray(x, dtype=np.int64) for x in bucket_lists])
        if bucket_lists
        else np.zeros(0, dtype=np.int64)
    )
    model = HashedTextClassifier().fit(
        buckets, offsets, y, epochs=epochs, seed=seed
    )
    if out_path:
        model.save(out_path)
    return model


# ------------------------------------------- local (artifact) training


def _synth_flat(num_docs: int, seed: int):
    from ..synth import generate_corpus

    tr = generate_corpus(num_docs, seed=seed, dup_fraction=0.0)
    corpus = tr["corpus"].to_pandas()
    lines_list = [c.split("\n") for c in corpus["content"]]
    offsets = np.zeros(len(lines_list) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lines_list], out=offsets[1:])
    flat = pa.array([ln for doc in lines_list for ln in doc], pa.string())
    doc_ids = (
        corpus["repo"] + "/" + corpus["path"] + "@" + corpus["commit"]
    ).to_numpy()
    return flat, offsets, doc_ids, tr["gold_spans"].to_pandas()


def train_cnn1d(
    num_docs: int = 300,
    seed: int = 7,
    epochs: int = 30,
    out_path: str | None = CNN1D_MODEL_PATH,
) -> tuple[MLPTagger, float]:
    """Train the context-window MLP on a synthetic gold corpus
    (driver-local; the distributed path is train_cnn1d_distributed).
    Returns (model, held-out tag accuracy)."""
    from .crf import gold_tags_flat

    flat, offsets, doc_ids, gold = _synth_flat(num_docs, seed)
    X = feature_matrix(flat, offsets)
    y = gold_tags_flat(offsets, doc_ids, gold)
    model = MLPTagger().fit(X, offsets, y, epochs=epochs, seed=seed)

    flat2, off2, d2, gold2 = _synth_flat(80, seed + 1)
    X2 = feature_matrix(flat2, off2)
    y2 = gold_tags_flat(off2, d2, gold2)
    acc = float((model.predict_tags(X2, off2) == y2).mean())
    if out_path:
        model.save(out_path)
    return model, acc


def _gold_by_doc(gold) -> dict[str, list]:
    by_doc: dict[str, list] = {}
    for r in gold.itertuples():
        by_doc.setdefault(r.doc_id, []).append(
            (r.label, r.start_line, r.end_line)
        )
    return by_doc


def train_nlp(
    num_docs: int = 300,
    seed: int = 7,
    epochs: int = 20,
    out_path: str | None = NLP_MODEL_PATH,
) -> tuple[HashedTextClassifier, float]:
    """Train the hashed-BoW 3-class paragraph classifier locally;
    returns (model, held-out paragraph accuracy)."""
    flat, offsets, doc_ids, gold = _synth_flat(num_docs, seed)
    packed, off, y = _paragraph_features_and_gold(
        flat, offsets, doc_ids, _gold_by_doc(gold)
    )
    model = HashedTextClassifier().fit(
        packed, off, y, epochs=epochs, seed=seed
    )

    flat2, off2d, d2, gold2 = _synth_flat(80, seed + 1)
    p2, o2, y2 = _paragraph_features_and_gold(
        flat2, off2d, d2, _gold_by_doc(gold2)
    )
    acc = float((model.predict(p2, o2) == y2).mean())
    if out_path:
        model.save(out_path)
    return model, acc


# ------------------------------------------- noisy-regime evidence


def _flat_from_corpus(corpus_tbl: pa.Table):
    """Corpus table -> (flat line array, per-doc offsets, doc_ids)."""
    corpus = corpus_tbl.to_pandas()
    lines_list = [c.split("\n") for c in corpus["content"]]
    offsets = np.zeros(len(lines_list) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lines_list], out=offsets[1:])
    flat = pa.array(
        [ln for doc in lines_list for ln in doc], pa.string()
    )
    doc_ids = (
        corpus["repo"] + "/" + corpus["path"] + "@" + corpus["commit"]
    ).to_numpy()
    return flat, offsets, doc_ids


def _bio_report(y: np.ndarray, pred: np.ndarray):
    """Line-level P/R/F1 after collapsing tag ids to {O, B, I} — the
    reference's report granularity (Training.ipynb cell 13), shared
    with crf.noise_robust_report."""
    import pandas as pd

    def collapse(t: np.ndarray) -> np.ndarray:
        out = np.zeros(len(t), dtype=np.int8)
        out[(t > 0) & ((t - 1) % 2 == 0)] = 1  # B
        out[(t > 0) & ((t - 1) % 2 == 1)] = 2  # I
        return out

    yc, pc_ = collapse(y), collapse(pred)
    rows = []
    for cid, cname in ((0, "O"), (1, "B"), (2, "I")):
        tp = int(((pc_ == cid) & (yc == cid)).sum())
        fp = int(((pc_ == cid) & (yc != cid)).sum())
        fn = int(((pc_ != cid) & (yc == cid)).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        rows.append(
            {
                "tag_class": cname,
                "precision": round(p, 4),
                "recall": round(r, 4),
                "f1": round(f1, 4),
                "support": tp + fn,
            }
        )
    return pd.DataFrame(rows)


def noise_robust_report_cnn1d(
    num_docs: int = 300,
    seed: int = 7,
    label_noise: float = 0.15,
    distractor_rate: float = 0.25,
    epochs: int = 30,
    eval_docs: int = 100,
):
    """CNN1D-family analog of crf.noise_robust_report: the
    context-window MLP trained on label-noise-corrupted gold over a
    distractor-injected corpus, scored line-level {O,B,I} on a CLEAN
    held-out corpus with the same distractor rate. Reference bars:
    the CNN1D notebook's tag report (NLP/transformers_tkb.ipynb cell
    37 family; B .96/.96, I .83/.73 in Training.ipynb cell 13).
    Featurize fans out over the cluster; only bit-packed payloads
    reach the driver fit."""
    import ray.data as rd

    from ..synth import (
        corrupt_gold_spans,
        generate_corpus,
        inject_distractors,
    )
    from .crf import featurize_for_training

    tr = generate_corpus(num_docs, seed=seed, dup_fraction=0.0)
    tr_corpus = inject_distractors(
        tr["corpus"], tr["gold_spans"], rate=distractor_rate, seed=seed
    )
    noisy_gold = corrupt_gold_spans(
        tr["gold_spans"], rate=label_noise, seed=seed
    )
    model = train_cnn1d_distributed(
        rd.from_arrow(tr_corpus), noisy_gold, epochs=epochs, seed=seed
    )

    te = generate_corpus(eval_docs, seed=seed + 1, dup_fraction=0.0)
    te_corpus = inject_distractors(
        te["corpus"], te["gold_spans"], rate=distractor_rate,
        seed=seed + 1,
    )
    eval_ds = featurize_for_training(
        rd.from_arrow(te_corpus), te["gold_spans"]
    )
    n_bytes = (N_FEATS + 7) // 8
    Xs, ys = [], []
    for b in eval_ds.iter_batches(batch_format="pyarrow"):
        for packed, tags in zip(
            b["packed_feats"].to_pylist(), b["tags"].to_pylist()
        ):
            if not tags:
                continue
            arr = np.frombuffer(bytes(packed), dtype=np.uint8).reshape(
                len(tags), n_bytes
            )
            Xs.append(
                np.unpackbits(arr, axis=1)[:, :N_FEATS].astype(bool)
            )
            ys.append(np.asarray(tags, dtype=np.int32))
    offsets = np.zeros(len(Xs) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in Xs], out=offsets[1:])
    X = np.concatenate(Xs)
    y = np.concatenate(ys)
    pred = model.predict_tags(X, offsets)
    return _bio_report(y, pred)


def noise_robust_report_nlp(
    num_docs: int = 300,
    seed: int = 7,
    label_noise: float = 0.15,
    distractor_rate: float = 0.25,
    epochs: int = 20,
    eval_docs: int = 100,
):
    """NLP-classifier analog (T8/T9): the hashed-BoW 3-class
    paragraph classifier trained on corrupted gold over a
    distractor-injected corpus, per-class paragraph P/R/F1 on a CLEAN
    held-out corpus with the same distractors (reference bars:
    NLP/transformers_tkb.ipynb cell 37's per-class report)."""
    import pandas as pd

    from ..synth import (
        corrupt_gold_spans,
        generate_corpus,
        inject_distractors,
    )

    tr = generate_corpus(num_docs, seed=seed, dup_fraction=0.0)
    tr_corpus = inject_distractors(
        tr["corpus"], tr["gold_spans"], rate=distractor_rate, seed=seed
    )
    noisy_gold = corrupt_gold_spans(
        tr["gold_spans"], rate=label_noise, seed=seed
    ).to_pandas()
    flat, offsets, doc_ids = _flat_from_corpus(tr_corpus)
    packed, off, y = _paragraph_features_and_gold(
        flat, offsets, doc_ids, _gold_by_doc(noisy_gold)
    )
    model = HashedTextClassifier().fit(
        packed, off, y, epochs=epochs, seed=seed
    )

    te = generate_corpus(eval_docs, seed=seed + 1, dup_fraction=0.0)
    te_corpus = inject_distractors(
        te["corpus"], te["gold_spans"], rate=distractor_rate,
        seed=seed + 1,
    )
    flat2, off2, d2 = _flat_from_corpus(te_corpus)
    p2, o2, y2 = _paragraph_features_and_gold(
        flat2, off2, d2, _gold_by_doc(te["gold_spans"].to_pandas())
    )
    pred = model.predict(p2, o2)
    rows = []
    for cid, cname in enumerate(CLS3):
        tp = int(((pred == cid) & (y2 == cid)).sum())
        fp = int(((pred == cid) & (y2 != cid)).sum())
        fn = int(((pred != cid) & (y2 == cid)).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        rows.append(
            {
                "cls": cname,
                "precision": round(p, 4),
                "recall": round(r, 4),
                "f1": round(f1, 4),
                "support": tp + fn,
            }
        )
    return pd.DataFrame(rows)
