"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's CV branch renders PDF pages to ndarrays and feeds a
U-net (reference: Styling/src/lib/paper/__init__.py:360-390,
Styling/src/lib/extractors/cnn.py:18-164). The image/audio decode
libraries are NOT in this container, so the decode kernel itself is
STUBBED (``NotImplementedError`` unless the deterministic fake decoder
is selected) — but everything Ray-side is real and tested: the binary
column schema, actor-pool signature, batch sizing for large payloads,
and the output layout.

Design rules for 100 TB media:
- payload stays an opaque ``binary`` column; never hex/base64 strings;
- small ``batch_size`` (payloads are MBs, not KBs) — callers pass
  ``batch_size=32`` not 4096;
- decode/feature-extract are ACTOR pools (model/codec init once);
- outputs are fixed-width feature columns, never re-emitted pixels,
  unless the stage's contract is an explicit transcode.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("format", pa.string()),  # png | wav | mp4 | ...
        ("width", pa.int32()),  # -1 when unknown / n.a.
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
        ("payload", pa.binary()),
    ]
)


def synth_media_table(n: int = 32, seed: int = 0) -> pa.Table:
    """Deterministic fake media rows (payload = seeded pseudo-bytes)."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.randint(256, 4096))
        payload = rng.bytes(size)
        rows["media_id"].append(f"m{i:05d}")
        rows["kind"].append(kind)
        rows["format"].append({"image": "png", "audio": "wav", "video": "mp4"}[kind])
        rows["width"].append(int(rng.randint(16, 512)) if kind != "audio" else -1)
        rows["height"].append(int(rng.randint(16, 512)) if kind != "audio" else -1)
        rows["duration_ms"].append(
            int(rng.randint(100, 60000)) if kind != "image" else -1
        )
        rows["payload"].append(payload)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool decode stage.

    ``backend="real"`` raises NotImplementedError (no codec libs in
    this container — plug PIL/soundfile/pyav here on a real cluster).
    ``backend="fake"`` derives a deterministic feature tensor from the
    payload bytes so the full pipeline is testable end-to-end.
    """

    def __init__(self, backend: str = "fake", feat_dim: int = 16) -> None:
        if backend not in ("fake", "real"):
            raise ValueError(backend)
        self.backend = backend
        self.feat_dim = feat_dim

    def _decode_real(self, payload: bytes, kind: str) -> np.ndarray:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "container; use backend='fake' or install PIL/soundfile/pyav"
        )

    def _decode_fake(self, payload: bytes, kind: str) -> np.ndarray:
        # deterministic pseudo-features from a sha256 stream of the bytes
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer(
            (h * (self.feat_dim * 4 // len(h) + 1))[: self.feat_dim * 4],
            dtype=np.uint32,
        )
        return (raw % 1000).astype(np.float32) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        dec = self._decode_fake if self.backend == "fake" else self._decode_real
        feats = np.stack([dec(p, k) for p, k in zip(payloads, kinds)])
        sizes = np.array([len(p) for p in payloads], dtype=np.int64)
        out = batch.drop_columns(["payload"])  # features replace pixels
        out = out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.feat_dim
            ),
        )
        return out.append_column("payload_bytes", pa.array(sizes))


def decode_media(
    ds, backend: str = "fake", feat_dim: int = 16, concurrency=(1, 4),
    batch_size: int = 32,
):
    """NOTE the small batch_size — payload-bearing batches must stay
    well under the object-store block target."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_args=(backend, feat_dim),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_plan_batch(batch: pa.Table, every_ms: int = 1000) -> pa.Table:
    """Video rows -> per-frame sampling plan (media_id, frame_ts_ms).

    Pure metadata fan-out (no decode): the downstream decoder receives
    (payload, ts) pairs. Emits nothing for non-video rows."""
    import pyarrow.compute as pc

    vids = batch.filter(pc.equal(batch["kind"], "video"))
    ids, ts = [], []
    for mid, dur in zip(
        vids["media_id"].to_pylist(), vids["duration_ms"].to_pylist()
    ):
        n = max(1, int(dur) // every_ms)
        ids.extend([mid] * n)
        ts.extend(range(0, n * every_ms, every_ms))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "frame_ts_ms": pa.array(ts, pa.int64()),
        }
    )
