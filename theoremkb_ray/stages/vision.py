"""Numpy 2D-conv page segmenter — the T2 (CNN/U-net) analog.

The reference's CV branch renders each PDF page to an image and runs a
keras U-net that predicts a per-pixel class mask, which is then
collapsed into labelled boxes (reference:
Styling/src/lib/extractors/cnn.py:18-164, models/cnn.py U-net).
keras/tensorflow are not in this container, so the family is
re-expressed as a from-scratch numpy convolutional network with the
same contract: page bitmap in -> per-ROW class scores -> contiguous
labelled bands out (the reference's masks are dominated by full-width
horizontal regions, so row granularity is the honest text-free
analog).

Pipeline shape mirrors every other learned stage: deterministic
synthetic gold (planted textured bands), driver fit over a compact
collected payload, actor-pool inference with the artifact loaded once
per actor, binary page payloads flowing through the MEDIA_SCHEMA
plumbing (stages/multimodal.py) with small batch sizes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_ART_DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts")
CNN2D_MODEL_PATH = os.path.abspath(os.path.join(_ART_DIR, "cnn2d.npz"))

PAGE_H, PAGE_W = 64, 48


# ------------------------------------------------------ synthetic pages


def synth_page_table(
    n: int = 64, seed: int = 0
) -> tuple[pa.Table, pa.Table]:
    """Deterministic page bitmaps with planted full-width textured
    bands (the 'result block' analog). Returns (pages, gold_bands):
    pages follow MEDIA_SCHEMA column names with raw float32 payloads;
    gold has one row per planted band (media_id, start_row, end_row)."""
    rng = np.random.RandomState(seed)
    ids, payloads, g_id, g_s, g_e = [], [], [], [], []
    xs = np.arange(PAGE_W)
    for i in range(n):
        img = rng.normal(0.5, 0.03, size=(PAGE_H, PAGE_W)).astype(
            np.float32
        )
        n_bands = rng.randint(1, 4)
        used: list[tuple[int, int]] = []
        mid = f"p{i:05d}"
        for _ in range(n_bands):
            h = rng.randint(4, 10)
            s = rng.randint(0, PAGE_H - h)
            if any(s <= e0 + 1 and s + h >= s0 - 1 for s0, e0 in used):
                continue
            used.append((s, s + h - 1))
            # texture: vertical stripes + higher contrast
            stripe = 0.25 * np.sin(xs * (2.0 + rng.rand())).astype(
                np.float32
            )
            img[s : s + h] += stripe[None, :]
            img[s : s + h] += rng.normal(
                0.0, 0.08, size=(h, PAGE_W)
            ).astype(np.float32)
            g_id.append(mid)
            g_s.append(s)
            g_e.append(s + h - 1)
        ids.append(mid)
        payloads.append(img.tobytes())
    pages = pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "kind": pa.array(["image"] * n, pa.string()),
            "format": pa.array(["raw_f32"] * n, pa.string()),
            "width": pa.array([PAGE_W] * n, pa.int32()),
            "height": pa.array([PAGE_H] * n, pa.int32()),
            "duration_ms": pa.array([-1] * n, pa.int32()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    gold = pa.table(
        {
            "media_id": pa.array(g_id, pa.string()),
            "start_row": pa.array(g_s, pa.int64()),
            "end_row": pa.array(g_e, pa.int64()),
        }
    )
    return pages, gold


def _decode_pages(batch: pa.Table) -> np.ndarray:
    """raw_f32 payloads -> (B, H, W) float32. The real-codec variant
    of this hook is the stubbed MediaDecoder backend."""
    payloads = batch["payload"].to_pylist()
    return np.stack(
        [
            np.frombuffer(p, dtype=np.float32).reshape(PAGE_H, PAGE_W)
            for p in payloads
        ]
    )


# ------------------------------------------------------------- the model


def _conv2d(imgs: np.ndarray, K: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(B,H,W) * (F,3,3) -> (B,H,W,F), zero-padded; one einsum over a
    sliding-window view (im2col without the copy)."""
    from numpy.lib.stride_tricks import sliding_window_view

    p = np.pad(imgs, ((0, 0), (1, 1), (1, 1)))
    win = sliding_window_view(p, (3, 3), axis=(1, 2))  # (B,H,W,3,3)
    return np.einsum("bhwij,fij->bhwf", win, K) + b


class ConvRowSegmenter:
    """conv3x3 -> relu -> conv3x3 -> relu -> width-mean-pool ->
    per-row logistic: per-row P(result band)."""

    def __init__(self, K1=None, b1=None, K2=None, b2=None, w=None, b=None):
        self.K1, self.b1, self.K2, self.b2, self.w, self.b = (
            K1, b1, K2, b2, w, b,
        )

    def row_scores(self, imgs: np.ndarray) -> np.ndarray:
        h1 = np.maximum(_conv2d(imgs, self.K1, self.b1), 0.0)
        # second conv mixes channels with a 1x1 (channel matmul) —
        # cheap and sufficient for texture-vs-flat discrimination
        h2 = np.maximum(h1 @ self.K2 + self.b2, 0.0)  # (B,H,W,F2)
        pooled = h2.mean(axis=2)  # (B,H,F2) width pool
        # row variance of each channel joins the features (texture cue)
        var = h2.var(axis=2)
        feats = np.concatenate([pooled, var], axis=2)
        return feats @ self.w + self.b  # (B,H)

    def predict_rows(self, imgs: np.ndarray) -> np.ndarray:
        return (self.row_scores(imgs) > 0).astype(np.int8)

    def fit(
        self,
        imgs: np.ndarray,
        row_labels: np.ndarray,
        epochs: int = 150,
        lr: float = 0.3,
        n_filters: int = 4,
        n_mix: int = 4,
        seed: int = 0,
    ) -> "ConvRowSegmenter":
        rng = np.random.RandomState(seed)
        self.K1 = (rng.standard_normal((n_filters, 3, 3)) * 0.5).astype(
            np.float64
        )
        self.b1 = np.zeros(n_filters)
        self.K2 = (
            rng.standard_normal((n_filters, n_mix)) * 0.5
        ).astype(np.float64)
        self.b2 = np.zeros(n_mix)
        self.w = rng.standard_normal(2 * n_mix) * 0.1
        self.b = 0.0
        y = row_labels.astype(np.float64)  # (B,H)
        for _ in range(epochs):
            # forward (keep intermediates for backprop)
            from numpy.lib.stride_tricks import sliding_window_view

            p = np.pad(imgs, ((0, 0), (1, 1), (1, 1)))
            win = sliding_window_view(p, (3, 3), axis=(1, 2))
            a1 = np.einsum("bhwij,fij->bhwf", win, self.K1) + self.b1
            h1 = np.maximum(a1, 0.0)
            a2 = h1 @ self.K2 + self.b2
            h2 = np.maximum(a2, 0.0)
            pooled = h2.mean(axis=2)
            var = h2.var(axis=2)
            feats = np.concatenate([pooled, var], axis=2)
            z = feats @ self.w + self.b
            prob = 1.0 / (1.0 + np.exp(-z))
            g = (prob - y) / y.size  # (B,H)
            # head grads
            gw = np.einsum("bh,bhf->f", g, feats)
            gb = g.sum()
            # backprop into h2 through mean-pool and variance
            W_ = imgs.shape[2]
            gfeats = g[:, :, None] * self.w[None, None, :]
            gpooled = gfeats[:, :, : h2.shape[3]]
            gvar = gfeats[:, :, h2.shape[3] :]
            mean_h2 = h2.mean(axis=2, keepdims=True)
            gh2 = gpooled[:, :, None, :] / W_ + gvar[:, :, None, :] * (
                2.0 / W_
            ) * (h2 - mean_h2)
            ga2 = gh2 * (a2 > 0)
            gK2 = np.einsum("bhwf,bhwm->fm", h1, ga2)
            gb2 = ga2.sum(axis=(0, 1, 2))
            gh1 = ga2 @ self.K2.T
            ga1 = gh1 * (a1 > 0)
            gK1 = np.einsum("bhwij,bhwf->fij", win, ga1)
            gb1 = ga1.sum(axis=(0, 1, 2))
            for wv, gv in (
                (self.K1, gK1),
                (self.b1, gb1),
                (self.K2, gK2),
                (self.b2, gb2),
                (self.w, gw),
            ):
                wv -= lr * gv
            self.b -= lr * gb
        return self

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            K1=self.K1, b1=self.b1, K2=self.K2, b2=self.b2,
            w=self.w, b=np.array([self.b]),
        )

    @classmethod
    def load(cls, path: str = CNN2D_MODEL_PATH) -> "ConvRowSegmenter":
        z = np.load(path)
        return cls(
            z["K1"], z["b1"], z["K2"], z["b2"], z["w"], float(z["b"][0])
        )


def rows_to_bands(
    pred: np.ndarray, media_ids, min_rows: int = 2
) -> pa.Table:
    """(B, H) 0/1 row labels -> band rows (media_id, start_row,
    end_row); runs shorter than ``min_rows`` are dropped (the
    reference's mask->box collapse drops sliver detections)."""
    B, H = pred.shape
    flat = pred.reshape(-1).astype(bool)
    # doc boundaries: break runs at page edges
    page_first = np.zeros(B * H, dtype=bool)
    page_first[::H] = True
    prev = np.roll(flat, 1)
    prev[page_first] = False
    starts = np.flatnonzero(flat & ~prev)
    nxt = np.roll(flat, -1)
    page_last = np.zeros(B * H, dtype=bool)
    page_last[H - 1 :: H] = True
    nxt[page_last] = False
    ends = np.flatnonzero(flat & ~nxt)
    lens = ends - starts + 1
    keep = lens >= min_rows
    starts, ends = starts[keep], ends[keep]
    page_of = starts // H
    mid = np.asarray(media_ids, dtype=object)[page_of]
    return pa.table(
        {
            "media_id": pa.array(mid, pa.string()),
            "start_row": pa.array(starts - page_of * H, pa.int64()),
            "end_row": pa.array(ends - page_of * H, pa.int64()),
        }
    )


class PageBandSegmenter:
    """Actor-pool callable: MEDIA_SCHEMA page batch -> band rows.
    Artifact loaded once per actor; payloads decoded per batch."""

    def __init__(self, model_path: str = CNN2D_MODEL_PATH) -> None:
        self.model = ConvRowSegmenter.load(model_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        imgs = _decode_pages(batch)
        pred = self.model.predict_rows(imgs)
        return rows_to_bands(pred, batch["media_id"].to_pylist())


def segment_pages(
    ds,
    model_path: str = CNN2D_MODEL_PATH,
    batch_size: int = 32,
    concurrency=(1, 8),
):
    """NOTE small batch_size: payload-bearing batches (multimodal.py
    design rules)."""
    return ds.map_batches(
        PageBandSegmenter,
        fn_constructor_args=(model_path,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _gold_row_labels(pages: pa.Table, gold: pa.Table) -> np.ndarray:
    ids = pages["media_id"].to_pylist()
    idx = {m: i for i, m in enumerate(ids)}
    y = np.zeros((len(ids), PAGE_H), dtype=np.int8)
    for m, s, e in zip(
        gold["media_id"].to_pylist(),
        gold["start_row"].to_pylist(),
        gold["end_row"].to_pylist(),
    ):
        y[idx[m], s : e + 1] = 1
    return y


def train_page_segmenter(
    num_pages: int = 96,
    seed: int = 7,
    epochs: int = 150,
    out_path: str | None = CNN2D_MODEL_PATH,
) -> tuple[ConvRowSegmenter, float]:
    """Driver-local fit on synthetic pages; returns (model, held-out
    row accuracy). The distributed variant would fan the decode +
    featurize out exactly like train_cnn1d_distributed — at 96 pages
    of 64x48 the collect IS the dataset."""
    pages, gold = synth_page_table(num_pages, seed=seed)
    imgs = _decode_pages(pages)
    y = _gold_row_labels(pages, gold)
    model = ConvRowSegmenter().fit(imgs, y, epochs=epochs, seed=seed)
    p2, g2 = synth_page_table(48, seed=seed + 1)
    acc = float(
        (model.predict_rows(_decode_pages(p2)) == _gold_row_labels(p2, g2))
        .mean()
    )
    if out_path:
        model.save(out_path)
    return model, acc
