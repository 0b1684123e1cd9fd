"""K-fold cross-validation for the line tagger.

The reference tunes its CRF with notebook-driven manual splits
(reference: Styling/tools/notebooks/Training.ipynb — one fixed
train/test cut, re-run by hand per hyperparameter). Re-expressed as an
operator: hash-deterministic fold assignment (same contract as
``sampling.train_test_split`` — membership is a pure function of
doc_id, independent of partitioning) and the k fits run as PARALLEL
Ray tasks over one shared featurized payload:

- featurization is the distributed half (``featurize_for_training``,
  one streamed pass over the corpus — the expensive part happens
  once, not k times);
- the compact packed payload (~4 bytes/line) is ``ray.put`` ONCE; the
  k training tasks read it zero-copy from the object store — the
  perceptron fit is inherently sequential per model, but the k models
  are independent, so wall-clock is one fit, not k;
- each task returns a metrics row; nothing model-sized leaves the
  task except the k weight matrices' scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.hashing import hash_strings
from .crf import N_FEATS, LinearChainTagger, featurize_for_training


def collect_payloads(train_ds):
    """Featurized Dataset -> (X bool (L, F), doc offsets, y, doc_ids).

    The payload is the deliberate driver-side collect of the training
    path (see ``fit_from_training_ds``) — bit-packed features + int32
    tags, orders of magnitude smaller than the corpus."""
    n_bytes = (N_FEATS + 7) // 8
    Xs, ys, ids = [], [], []
    for b in train_ds.iter_batches(batch_format="pyarrow"):
        for doc, packed, tags in zip(
            b["doc_id"].to_pylist(),
            b["packed_feats"].to_pylist(),
            b["tags"].to_pylist(),
        ):
            if not tags:
                continue
            arr = np.frombuffer(bytes(packed), dtype=np.uint8).reshape(
                len(tags), n_bytes
            )
            Xs.append(np.unpackbits(arr, axis=1)[:, :N_FEATS].astype(bool))
            ys.append(np.asarray(tags, dtype=np.int32))
            ids.append(doc)
    offsets = np.zeros(len(Xs) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in Xs], out=offsets[1:])
    X = np.concatenate(Xs) if Xs else np.zeros((0, N_FEATS), dtype=bool)
    y = np.concatenate(ys) if ys else np.zeros(0, dtype=np.int32)
    return X, offsets, y, np.asarray(ids, dtype=object)


@ray.remote
def _fold_task(payload, fold: int, k: int, epochs: int, seed: int):
    # the shared payload arrives auto-dereferenced from the object
    # store (ray.put once on the driver, zero-copy reads here)
    X, offsets, y, folds = payload
    test_docs = np.flatnonzero(folds == fold)
    train_docs = np.flatnonzero(folds != fold)

    def subset(docs):
        lens = np.diff(offsets)
        sel_lens = lens[docs]
        sub_off = np.zeros(len(docs) + 1, dtype=np.int64)
        np.cumsum(sel_lens, out=sub_off[1:])
        take = np.concatenate(
            [np.arange(offsets[d], offsets[d + 1]) for d in docs]
        ) if len(docs) else np.zeros(0, np.int64)
        return X[take], sub_off, y[take]

    Xtr, otr, ytr = subset(train_docs)
    Xte, ote, yte = subset(test_docs)
    model = LinearChainTagger().fit(Xtr, otr, ytr, epochs=epochs, seed=seed)
    pred = model.decode_batch(Xte, ote)
    acc = float((pred == yte).mean()) if len(yte) else float("nan")
    # token-level macro F1 over the non-O tags present in gold
    f1s = []
    for t in np.unique(yte[yte != 0]):
        tp = int(((pred == t) & (yte == t)).sum())
        fp = int(((pred == t) & (yte != t)).sum())
        fn = int(((pred != t) & (yte == t)).sum())
        denom = 2 * tp + fp + fn
        f1s.append(2.0 * tp / denom if denom else 0.0)
    return {
        "fold": fold,
        "n_train_docs": int(len(train_docs)),
        "n_test_docs": int(len(test_docs)),
        "token_acc": round(acc, 6),
        "macro_f1": round(float(np.mean(f1s)) if f1s else 0.0, 6),
    }


def crossval_crf(
    corpus_ds,
    gold_spans: pa.Table,
    k: int = 5,
    epochs: int = 6,
    seed: int = 0,
) -> pd.DataFrame:
    """-> DataFrame(fold, n_train_docs, n_test_docs, token_acc,
    macro_f1) + a mean row (fold = -1)."""
    train_ds = featurize_for_training(corpus_ds, gold_spans)
    X, offsets, y, ids = collect_payloads(train_ds)
    folds = (hash_strings(ids) % np.uint64(k)).astype(np.int64)
    payload_ref = ray.put((X, offsets, y, folds))
    rows = ray.get(
        [
            _fold_task.remote(payload_ref, f, k, epochs, seed)
            for f in range(k)
        ]
    )
    df = pd.DataFrame(rows).sort_values("fold").reset_index(drop=True)
    mean_row = {
        "fold": -1,
        "n_train_docs": int(df["n_train_docs"].mean()),
        "n_test_docs": int(df["n_test_docs"].sum()),
        "token_acc": round(float(df["token_acc"].mean()), 6),
        "macro_f1": round(float(df["macro_f1"].mean()), 6),
    }
    return pd.concat(
        [df, pd.DataFrame([mean_row])], ignore_index=True
    )
