"""Linear-chain sequence tagger: the flagship learned segmenter.

Re-expresses the reference's CRF extractor — a per-line
``sklearn_crfsuite.CRF`` loaded lazily once and applied per paper
(reference: Styling/src/lib/extractors/crf.py:43-132,
Styling/src/lib/models/crf.py:20-99) — as a from-scratch numpy
linear-chain model (averaged structured perceptron + Viterbi; no
third-party CRF dependency exists in this environment). Tagging
quality on the synthetic gold corpus is asserted by the pytest suite
(P/R >= 0.95 per BASELINE.json).

Scale design:
- the model artifact (npz of emission + transition weights) is loaded
  ONCE PER ACTOR in :class:`CRFSegmenter.__init__` and applied per
  batch — the ``map_batches(Cls, concurrency=N)`` actor-pool pattern;
- emission features are computed vectorized over the *flattened* line
  array (stages/features.py);
- Viterbi runs BATCHED over all documents of a batch at once
  (padded (docs, time, states) dynamic program — numpy ops per time
  step, no per-document Python loop).

Label space: O + B-/I- per result kind (schema.TAGS), the same B/I/O
codec the reference trains (Styling/src/lib/extractors/crf.py:178-194).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..schema import N_TAGS, RESULT_KINDS, TAG_TO_ID, TAGS
from .features import line_features
from .segment import spans_to_list_column
from .tokenize import explode_lines

N_FEATS = 24
DEFAULT_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "crf_line.npz",
)


def feature_matrix(flat_lines: pa.Array, offsets: np.ndarray) -> np.ndarray:
    """(n_lines, N_FEATS) boolean indicator features, incl. ±1-line
    context (the analog of the reference's prev/next delta features,
    Styling/src/lib/paper/features.py:163-170)."""
    f = line_features(flat_lines)
    n = len(f["bold"])
    X = np.zeros((n, N_FEATS), dtype=bool)
    X[:, 0] = True  # bias
    X[:, 1] = f["bold"]
    X[:, 2] = f["italic"]
    X[:, 3] = f["blank"]
    X[:, 4] = f["qed"]
    kid = f["kind_id"]
    for k in range(len(RESULT_KINDS)):
        X[:, 5 + k] = kid == k
    X[:, 15] = f["has_head_num"]
    styled_kind = (f["bold"] | f["italic"]) & (kid >= 0)
    X[:, 16] = styled_kind
    nw = f["n_words"]
    X[:, 17] = nw <= 1
    X[:, 18] = (nw >= 2) & (nw <= 4)
    X[:, 19] = nw >= 5
    # ±1-line context (shift within document: reset at boundaries)
    prev_blank = np.roll(f["blank"], 1)
    next_blank = np.roll(f["blank"], -1)
    prev_styled = np.roll(styled_kind, 1)
    doc_first = np.zeros(n, dtype=bool)
    doc_last = np.zeros(n, dtype=bool)
    if n:
        starts = offsets[:-1][offsets[:-1] < n]
        doc_first[starts] = True
        ends = offsets[1:] - 1
        doc_last[ends[(ends >= 0) & (ends < n)]] = True
    X[:, 20] = np.where(doc_first, True, prev_blank)  # doc start ~ blank
    X[:, 21] = np.where(doc_last, True, next_blank)
    X[:, 22] = np.where(doc_first, False, prev_styled)
    # repetitive header/footer (A9/M6, reference TextLine.py:86-99)
    from .features import repetitive_flags

    X[:, 23] = repetitive_flags(flat_lines, offsets)
    return X


class LinearChainTagger:
    """Weights + batched Viterbi decode + perceptron training."""

    def __init__(
        self, W: np.ndarray | None = None, T: np.ndarray | None = None
    ) -> None:
        self.W = W if W is not None else np.zeros((N_TAGS, N_FEATS))
        self.T = T if T is not None else np.zeros((N_TAGS, N_TAGS))

    # ------------------------------------------------------------ decode
    def decode_batch(
        self, X: np.ndarray, offsets: np.ndarray
    ) -> np.ndarray:
        """Viterbi over all docs at once. Returns flat tag ids (n_lines,)."""
        n_docs = len(offsets) - 1
        lengths = np.diff(offsets)
        if len(X) == 0 or n_docs == 0:
            return np.zeros(0, dtype=np.int32)
        Tmax = int(lengths.max())
        S = N_TAGS
        emit_flat = X @ self.W.T  # (n_lines, S)
        # padded emissions (docs, Tmax, S); padding gets -inf except O
        emit = np.full((n_docs, Tmax, S), -1e30)
        idx_doc = np.repeat(np.arange(n_docs), lengths)
        idx_t = np.concatenate([np.arange(l) for l in lengths])
        emit[idx_doc, idx_t] = emit_flat
        emit[:, :, 0] = np.where(
            emit[:, :, 0] < -1e29, 0.0, emit[:, :, 0]
        )  # padding emits O at zero cost
        dp = emit[:, 0].copy()  # (docs, S)
        bp = np.zeros((n_docs, Tmax, S), dtype=np.int8)
        Tt = self.T  # (S_prev, S_next)
        # dp at each doc's LAST REAL timestep — backtracking must start
        # from argmax of this, never from the O-padded tail, so that a
        # doc's tags are identical regardless of batch composition
        # (padding would otherwise add T[s, O] into the choice of the
        # final real state for docs shorter than the batch Tmax).
        final_dp = np.empty_like(dp)
        done0 = lengths == 1
        final_dp[done0] = dp[done0]
        for t in range(1, Tmax):
            # scores (docs, S_prev, S_next)
            sc = dp[:, :, None] + Tt[None, :, :]
            best_prev = sc.argmax(axis=1)  # (docs, S_next)
            dp = np.take_along_axis(sc, best_prev[:, None, :], axis=1)[
                :, 0, :
            ] + emit[:, t]
            bp[:, t] = best_prev
            at_end = lengths == t + 1
            if at_end.any():
                final_dp[at_end] = dp[at_end]
        # backtrack, vectorized over docs: each doc enters the trace at
        # its own final real timestep with its own argmax state
        tags = np.zeros((n_docs, Tmax), dtype=np.int32)
        last = final_dp.argmax(axis=1).astype(np.int32)
        cur = np.zeros(n_docs, dtype=np.int32)
        rows = np.arange(n_docs)
        for t in range(Tmax - 1, -1, -1):
            starting = lengths == t + 1
            cur = np.where(starting, last, cur)
            active = lengths > t
            tags[active, t] = cur[active]
            cur = np.where(active, bp[rows, t, cur], cur)
        return tags[idx_doc, idx_t].astype(np.int32)

    # ------------------------------------------------------------- train
    def fit(
        self,
        X: np.ndarray,
        offsets: np.ndarray,
        y: np.ndarray,
        epochs: int = 8,
        seed: int = 0,
        l2: float = 0.0,
    ) -> "LinearChainTagger":
        """Averaged structured perceptron over per-document sequences.

        ``l2`` is a per-step weight-decay factor (the perceptron
        counterpart of the reference's c2 L2 penalty on its lbfgs CRF,
        Styling/src/lib/models/crf.py:20-50): each update step shrinks
        the working weights toward zero, so a single mislabeled
        document can't park a large permanent weight on a noisy
        feature — the averaged output then dominates by the *stable*
        margins. 0.0 (default) is the exact previous behavior."""
        n_docs = len(offsets) - 1
        rng = np.random.RandomState(seed)
        W, T = self.W.copy(), self.T.copy()
        Wsum, Tsum = np.zeros_like(W), np.zeros_like(T)
        decay = 1.0 - l2
        steps = 0
        for _ in range(epochs):
            order = rng.permutation(n_docs)
            for d in order:
                lo, hi = offsets[d], offsets[d + 1]
                Xd, yd = X[lo:hi], y[lo:hi]
                tagger = LinearChainTagger(W, T)
                pred = tagger.decode_batch(
                    Xd, np.array([0, hi - lo], dtype=np.int64)
                )
                if not np.array_equal(pred, yd):
                    if l2:
                        W *= decay
                        T *= decay
                    np.add.at(W, yd, Xd.astype(float))
                    np.subtract.at(W, pred, Xd.astype(float))
                    if hi - lo > 1:
                        np.add.at(T, (yd[:-1], yd[1:]), 1.0)
                        np.subtract.at(T, (pred[:-1], pred[1:]), 1.0)
                Wsum += W
                Tsum += T
                steps += 1
        self.W = Wsum / max(steps, 1)
        self.T = Tsum / max(steps, 1)
        return self

    # -------------------------------------------------------- persistence
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(
            path, W=self.W, T=self.T, tags=np.array(TAGS), version=2
        )

    @classmethod
    def load(cls, path: str = DEFAULT_MODEL_PATH) -> "LinearChainTagger":
        z = np.load(path, allow_pickle=False)
        assert list(z["tags"]) == list(TAGS), "tag-set mismatch vs artifact"
        return cls(z["W"], z["T"])


def tags_to_spans_flat(
    tag_ids: np.ndarray, offsets: np.ndarray
) -> dict[str, np.ndarray]:
    """BIO decode: flat tag ids -> flat span rows (same contract as
    segment.naive_spans_flat). B starts a span; I of the same kind
    continues; anything else ends it. Group numbering restarts per doc
    (the reference's group counter, extractors/crf.py:107-131)."""
    n = len(tag_ids)
    lengths = np.diff(offsets)
    doc_idx_per_line = np.repeat(
        np.arange(len(lengths), dtype=np.int64), lengths
    )
    # tag id -> (is_B, is_I, kind_id); TAGS = O, then B-k0,I-k0,B-k1,...
    is_b = (tag_ids > 0) & ((tag_ids - 1) % 2 == 0)
    is_i = (tag_ids > 0) & ((tag_ids - 1) % 2 == 1)
    kind_of = np.where(tag_ids > 0, (tag_ids - 1) // 2, -1)

    prev_tag = np.roll(tag_ids, 1)
    prev_kind = np.where(prev_tag > 0, (prev_tag - 1) // 2, -1)
    prev_in = prev_tag > 0
    doc_first = np.zeros(n, dtype=bool)
    starts_idx = offsets[:-1]
    doc_first[starts_idx[starts_idx < n]] = True

    # span starts: B anywhere, or I that does not continue a same-kind span
    span_start = is_b | (
        is_i & (doc_first | ~prev_in | (prev_kind != kind_of))
    )
    in_span = tag_ids > 0
    starts = np.flatnonzero(span_start)
    if len(starts) == 0:
        return {
            k: np.empty(0, dtype=np.int64)
            for k in ("doc_idx", "label_id", "group", "start_line", "end_line")
        }
    # span end: last consecutive line with same kind and not a new start
    next_start = np.roll(span_start, -1)
    next_kind = np.roll(kind_of, -1)
    next_in = np.roll(in_span, -1)
    doc_last = np.zeros(n, dtype=bool)
    ends_idx = offsets[1:] - 1
    doc_last[ends_idx[(ends_idx >= 0) & (ends_idx < n)]] = True
    span_end = in_span & (
        doc_last | ~next_in | next_start | (next_kind != kind_of)
    )
    ends = np.flatnonzero(span_end)
    assert len(ends) == len(starts)

    doc_start = offsets[:-1][doc_idx_per_line]
    span_doc = doc_idx_per_line[starts]
    cs = np.cumsum(span_start)
    base = cs[offsets[:-1][span_doc]] - span_start[offsets[:-1][span_doc]]
    group = cs[starts] - base
    return {
        "doc_idx": span_doc,
        "label_id": kind_of[starts].astype(np.int64),
        "group": group.astype(np.int64),
        "start_line": starts - doc_start[starts],
        "end_line": ends - doc_start[starts],
    }


class CRFSegmenter:
    """Actor-pool callable: tokenized batch -> batch + ``spans`` column.

    Model artifact loaded once per actor (__init__), applied per batch.
    """

    def __init__(self, model_path: str = DEFAULT_MODEL_PATH) -> None:
        self.model = LinearChainTagger.load(model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = explode_lines(batch["lines"])
        X = feature_matrix(flat, offsets)
        tag_ids = self.model.decode_batch(X, offsets)
        spans = tags_to_spans_flat(tag_ids, offsets)
        col = spans_to_list_column(spans, batch.num_rows)
        return batch.append_column("spans", col)


def segment_crf(
    ds,
    model_path: str = DEFAULT_MODEL_PATH,
    batch_size: int = 256,
    concurrency=None,
):
    if concurrency is None:
        # autoscale the actor pool up to the cluster CPU count — a
        # fixed small cap would throttle larger clusters. The FLOOR is
        # half the cluster: starting from 1 actor, Ray's ramp-up lag
        # dominated the stage at 32 CPUs (measured: segmentation wall
        # time barely changed between 8 and 32 CPUs)
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (max(1, ncpu // 2), max(4, ncpu))
    return ds.map_batches(
        CRFSegmenter,
        fn_constructor_args=(model_path,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ------------------------------------------------------------------ training


def gold_tags_flat(
    offsets: np.ndarray,
    doc_ids: np.ndarray,
    spans_df,
) -> np.ndarray:
    """Project gold spans (doc_id, label, start_line, end_line) onto the
    flat line array as tag ids (the analog of the reference's
    ground-truth spatial projection, extractors/crf.py:165-176)."""
    n = int(offsets[-1])
    y = np.zeros(n, dtype=np.int32)
    pos = {d: i for i, d in enumerate(doc_ids)}
    for doc_id, label, s, e in zip(
        spans_df["doc_id"], spans_df["label"], spans_df["start_line"],
        spans_df["end_line"],
    ):
        d = pos.get(doc_id)
        if d is None:
            continue
        base = offsets[d]
        y[base + s] = TAG_TO_ID[f"B-{label}"]
        if e > s:
            y[base + s + 1 : base + e + 1] = TAG_TO_ID[f"I-{label}"]
    return y


class FeaturizeForTraining:
    """map_batches callable: tokenized docs + broadcast gold spans ->
    per-document (features, tags) training payloads.

    The distributed half of training (the analog of the reference's
    streaming joblib featurize, Styling/src/lib/extractors/crf.py:19-40,
    228-242): feature extraction + gold projection + optional
    balance-window sampling fan out over the cluster; only the compact
    (X, y) arrays come back to the fitting process (perceptron updates
    are inherently sequential, like the reference's lbfgs fit)."""

    def __init__(self, gold_ref, balance_window: int | None = None) -> None:
        import ray as _ray

        self.gold_by_doc: dict[str, list] = _ray.get(gold_ref)
        self.window = balance_window

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .sampling import balance_context_window
        from .tokenize import explode_lines

        flat, offsets = explode_lines(batch["lines"])
        X = feature_matrix(flat, offsets)
        docs = batch["doc_id"].to_pylist()
        y = np.zeros(int(offsets[-1]), dtype=np.int32)
        for i, d in enumerate(docs):
            base = offsets[i]
            for label, s0, s1 in self.gold_by_doc.get(d, []):
                y[base + s0] = TAG_TO_ID[f"B-{label}"]
                if s1 > s0:
                    y[base + s0 + 1 : base + s1 + 1] = TAG_TO_ID[f"I-{label}"]
        if self.window is not None:
            keep = balance_context_window(y, offsets, window=self.window)
        else:
            keep = np.ones(len(y), dtype=bool)
        # pack per-doc payloads (variable-length) as list columns
        feats, tags, lens = [], [], []
        for i in range(batch.num_rows):
            lo, hi = offsets[i], offsets[i + 1]
            m = keep[lo:hi]
            feats.append(
                np.packbits(X[lo:hi][m], axis=1).reshape(-1).tolist()
            )
            tags.append(y[lo:hi][m].tolist())
            lens.append(int(m.sum()))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lines": pa.array(lens, pa.int64()),
                "packed_feats": pa.array(feats, pa.list_(pa.uint8())),
                "tags": pa.array(tags, pa.list_(pa.int32())),
            }
        )


def featurize_for_training(
    corpus_ds, gold_spans: pa.Table, balance_window: int | None = None,
    concurrency=(1, 8),
):
    """Distributed featurize+label stage; returns the training Dataset."""
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
    ds = tokenize(ingest(corpus_ds, verify=False))
    return ds.map_batches(
        FeaturizeForTraining,
        fn_constructor_args=(ref, balance_window),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )


def fit_from_training_ds(
    train_ds, epochs: int = 8, seed: int = 0, l2: float = 0.0
) -> LinearChainTagger:
    """Collect the compact featurized payloads and fit the perceptron.

    The payload is bit-packed features + int32 tags — ~4 bytes/line,
    orders of magnitude smaller than the corpus; collecting it is the
    deliberate driver-side step (model fitting is sequential)."""
    Xs, ys = [], []
    n_bytes = (N_FEATS + 7) // 8
    for b in train_ds.iter_batches(batch_format="pyarrow"):
        for packed, tags in zip(
            b["packed_feats"].to_pylist(), b["tags"].to_pylist()
        ):
            if not tags:
                continue
            arr = np.frombuffer(
                bytes(packed), dtype=np.uint8
            ).reshape(len(tags), n_bytes)
            Xs.append(
                np.unpackbits(arr, axis=1)[:, :N_FEATS].astype(bool)
            )
            ys.append(np.asarray(tags, dtype=np.int32))
    offsets = np.zeros(len(Xs) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in Xs], out=offsets[1:])
    X = np.concatenate(Xs) if Xs else np.zeros((0, N_FEATS), dtype=bool)
    y = np.concatenate(ys) if ys else np.zeros(0, dtype=np.int32)
    return LinearChainTagger().fit(
        X, offsets, y, epochs=epochs, seed=seed, l2=l2
    )


def train_crf_distributed(
    corpus_ds,
    gold_spans: pa.Table,
    epochs: int = 8,
    balance_window: int | None = None,
    out_path: str | None = None,
    l2: float = 0.0,
) -> LinearChainTagger:
    """cli.py-train analog: distributed featurize -> driver fit."""
    train_ds = featurize_for_training(
        corpus_ds, gold_spans, balance_window=balance_window
    )
    model = fit_from_training_ds(train_ds, epochs=epochs, l2=l2)
    if out_path:
        model.save(out_path)
    return model


def train_crf(
    num_docs: int = 300,
    seed: int = 7,
    epochs: int = 8,
    out_path: str = DEFAULT_MODEL_PATH,
) -> tuple[LinearChainTagger, float]:
    """Train on a synthetic gold corpus (disjoint seed from the test
    fixtures); returns (model, token accuracy on a held-out corpus)."""
    from ..synth import generate_corpus

    tr = generate_corpus(num_docs, seed=seed, dup_fraction=0.0)
    corpus = tr["corpus"].to_pandas()
    lines_list = [c.split("\n") for c in corpus["content"]]
    offsets = np.zeros(len(lines_list) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lines_list], out=offsets[1:])
    flat = pa.array(
        [ln for doc in lines_list for ln in doc], pa.string()
    )
    X = feature_matrix(flat, offsets)
    doc_ids = (
        corpus["repo"] + "/" + corpus["path"] + "@" + corpus["commit"]
    ).to_numpy()
    y = gold_tags_flat(offsets, doc_ids, tr["gold_spans"].to_pandas())

    model = LinearChainTagger().fit(X, offsets, y, epochs=epochs)

    # held-out accuracy
    te = generate_corpus(80, seed=seed + 1, dup_fraction=0.0)
    c2 = te["corpus"].to_pandas()
    ll2 = [c.split("\n") for c in c2["content"]]
    off2 = np.zeros(len(ll2) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in ll2], out=off2[1:])
    flat2 = pa.array([ln for doc in ll2 for ln in doc], pa.string())
    X2 = feature_matrix(flat2, off2)
    d2 = (c2["repo"] + "/" + c2["path"] + "@" + c2["commit"]).to_numpy()
    y2 = gold_tags_flat(off2, d2, te["gold_spans"].to_pandas())
    pred = model.decode_batch(X2, off2)
    acc = float((pred == y2).mean())
    if out_path:
        model.save(out_path)
    return model, acc


def noise_robust_report(
    num_docs: int = 300,
    seed: int = 7,
    label_noise: float = 0.15,
    distractor_rate: float = 0.25,
    l2: float = 1e-4,
    epochs: int = 16,
    eval_docs: int = 100,
):
    """Tagger quality under the reference's REAL operating conditions
    (noisy annotations + ambiguous head styles), not the clean-synth
    P/R-1.0 regime.

    Train: gold spans corrupted at ``label_noise`` (boundary jitter /
    kind relabel / span drop — synth.corrupt_gold_spans) over a corpus
    whose filler contains head LOOK-ALIKE lines
    (synth.inject_distractors). Eval: a held-out corpus with the same
    distractor rate but CLEAN labels, scored line-level after
    collapsing tags to {O, B, I} — the reference's own tag set and
    report granularity (its published bar: B .96/.96, I .83/.73 on
    2,642 noisy arXiv papers, Styling/tools/notebooks/Training.ipynb
    cell 13). Returns a DataFrame (tag_class, precision, recall, f1,
    support).

    Featurize fans out over the cluster (featurize_for_training);
    only the compact bit-packed payloads reach the fitting process."""
    import pandas as pd
    import ray.data as rd

    from ..synth import (
        corrupt_gold_spans,
        generate_corpus,
        inject_distractors,
    )

    # ---- train side
    tr = generate_corpus(num_docs, seed=seed, dup_fraction=0.0)
    tr_corpus = inject_distractors(
        tr["corpus"], tr["gold_spans"], rate=distractor_rate, seed=seed
    )
    noisy_gold = corrupt_gold_spans(
        tr["gold_spans"], rate=label_noise, seed=seed
    )
    model = train_crf_distributed(
        rd.from_arrow(tr_corpus),
        noisy_gold,
        epochs=epochs,
        l2=l2,
    )

    # ---- eval side: same distractor regime, CLEAN labels
    te = generate_corpus(eval_docs, seed=seed + 1, dup_fraction=0.0)
    te_corpus = inject_distractors(
        te["corpus"], te["gold_spans"], rate=distractor_rate, seed=seed + 1
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
            Xs.append(np.unpackbits(arr, axis=1)[:, :N_FEATS].astype(bool))
            ys.append(np.asarray(tags, dtype=np.int32))
    offsets = np.zeros(len(Xs) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in Xs], out=offsets[1:])
    X = np.concatenate(Xs)
    y = np.concatenate(ys)
    pred = model.decode_batch(X, offsets)

    def collapse(t: np.ndarray) -> np.ndarray:
        # 0 stays O; odd ids are B-*, even (>0) are I-*
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
