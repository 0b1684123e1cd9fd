"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's CV branch renders PDF pages to ndarrays and feeds a
U-net (reference: Styling/src/lib/paper/__init__.py:360-390,
Styling/src/lib/extractors/cnn.py:18-164). ``backend="real"``
genuinely decodes PNG / PPM / PGM images and 16-bit PCM WAV audio via
the pure-stdlib codecs in `functions/codecs.py` (zlib + wave + numpy
— nothing to install) and derives content features (intensity
histograms, spectral energy bands). Only VIDEO decode stays a stub
(a real container format needs pyav); the deterministic fake decoder
remains for CI and for formats outside the stdlib's reach.

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


def synth_real_media_table(n: int = 16, seed: int = 0) -> pa.Table:
    """Media rows whose payloads are VALID bytes: seeded RGB PNGs,
    gray PGMs, 16-bit sine-wave WAVs, and uncompressed RGB24 AVIs —
    everything ``backend="real"`` decodes from pure stdlib. Only
    compressed video codecs (mp4/h264 etc.) still need external
    libraries."""
    from ..functions import codecs

    rng = np.random.RandomState(seed)
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        which = i % 4
        if which == 3:  # uncompressed AVI video
            w, h = int(rng.randint(8, 24)), int(rng.randint(8, 24))
            fps = 10
            nf = int(rng.randint(3, 9))
            frames = rng.randint(0, 256, (nf, h, w, 3), dtype=np.uint8)
            payload = codecs.encode_avi_rgb24(frames, fps=fps)
            fmt, kind, dur = "avi", "video", nf * 1000 // fps
        elif which == 0:  # RGB PNG
            w, h = int(rng.randint(8, 48)), int(rng.randint(8, 48))
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            payload, fmt, kind, dur = codecs.encode_png(img), "png", "image", -1
        elif which == 1:  # gray PGM
            w, h = int(rng.randint(8, 48)), int(rng.randint(8, 48))
            img = rng.randint(0, 256, (h, w), dtype=np.uint8)
            payload, fmt, kind, dur = codecs.encode_ppm(img), "ppm", "image", -1
        else:  # sine WAV
            rate = 8000
            ms = int(rng.randint(50, 400))
            t = np.arange(rate * ms // 1000, dtype=np.float64) / rate
            freq = float(rng.randint(100, 2000))
            s = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
            payload, fmt, kind, dur = codecs.encode_wav(s, rate), "wav", "audio", ms
            w = h = -1
        rows["media_id"].append(f"r{i:05d}")
        rows["kind"].append(kind)
        rows["format"].append(fmt)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
        rows["payload"].append(payload)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool decode stage.

    ``backend="real"`` decodes actual bytes: PNG/PPM/PGM -> a
    ``feat_dim``-bin intensity histogram, WAV -> ``feat_dim`` spectral
    energy bands, uncompressed RGB24 AVI -> temporal-mean intensity
    histogram. Compressed video / other image formats raise
    NotImplementedError — plug pyav/PIL on a cluster that has them.
    ``backend="fake"`` derives a deterministic feature tensor from the
    payload bytes so the full pipeline is testable end-to-end.
    """

    def __init__(self, backend: str = "fake", feat_dim: int = 16) -> None:
        if backend not in ("fake", "real"):
            raise ValueError(backend)
        self.backend = backend
        self.feat_dim = feat_dim

    def _decode_real(self, payload: bytes, kind: str) -> np.ndarray:
        from ..functions import codecs

        fmt = codecs.sniff_format(payload)
        if fmt in ("png", "ppm"):
            img = (
                codecs.decode_png(payload)
                if fmt == "png"
                else codecs.decode_ppm(payload)
            )
            # real content features: normalized intensity histogram
            hist = np.bincount(
                (img.reshape(-1).astype(np.int64) * self.feat_dim) // 256,
                minlength=self.feat_dim,
            ).astype(np.float32)
            return hist / max(1.0, float(img.size))
        if fmt == "wav":
            samples, _rate = codecs.decode_wav(payload)
            mono = samples.mean(axis=1).astype(np.float32)
            spec = np.abs(np.fft.rfft(mono))
            # feat_dim equal-width energy bands, L2-normalized
            bands = np.array(
                [
                    float(chunk.sum())
                    for chunk in np.array_split(spec, self.feat_dim)
                ],
                dtype=np.float32,
            )
            n = float(np.linalg.norm(bands))
            return bands / n if n else bands
        if fmt == "avi":
            frames, _fps = codecs.decode_avi_rgb24(payload)
            # temporal mean of per-frame intensity histograms — same
            # feature family as the still-image branch
            hist = np.bincount(
                (frames.reshape(-1).astype(np.int64) * self.feat_dim)
                // 256,
                minlength=self.feat_dim,
            ).astype(np.float32)
            return hist / max(1.0, float(frames.size))
        probe = codecs.probe_optional_backends()
        if fmt == "jpeg" and probe["pil"]:
            img = codecs.decode_jpeg_pil(payload)
            hist = np.bincount(
                (img.reshape(-1).astype(np.int64) * self.feat_dim) // 256,
                minlength=self.feat_dim,
            ).astype(np.float32)
            return hist / max(1.0, float(img.size))
        if fmt == "mp4" and probe["pyav"]:
            frames, _fps = codecs.decode_video_pyav(payload)
            hist = np.bincount(
                (frames.reshape(-1).astype(np.int64) * self.feat_dim)
                // 256,
                minlength=self.feat_dim,
            ).astype(np.float32)
            return hist / max(1.0, float(frames.size))
        raise NotImplementedError(
            f"real decode of kind={kind!r} payload (sniffed {fmt!r}) "
            "needs codec libraries not in this container — "
            f"codecs.probe_optional_backends() found {probe}; "
            "PNG/PPM/PGM/WAV/uncompressed-AVI decode natively — or use "
            "backend='fake'"
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


class FrameExtractor:
    """Actor-pool video frame sampler — the REAL counterpart of
    :func:`frame_sample_plan_batch`: decode each video payload
    (uncompressed RGB24 AVI via functions/codecs.py), take one frame
    every ``every_ms``, re-encode each as PNG, and emit one IMAGE row
    per sampled frame. Non-video rows pass through unchanged, so the
    stage composes ahead of the image decode/resize/embed stages.

    ``backend="fake"`` emits sha-derived payloads per (media_id, ts)
    without decoding (CI twin, any video format). Payload-bearing
    output: keep batch_size small at call sites (default 32)."""

    def __init__(self, every_ms: int = 1000, backend: str = "real") -> None:
        if backend not in ("fake", "real"):
            raise ValueError(backend)
        self.every_ms = every_ms
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions import codecs

        is_vid = pc.equal(batch["kind"], "video").to_numpy(
            zero_copy_only=False
        )
        passthrough = batch.filter(pa.array(~is_vid))
        vids = batch.filter(pa.array(is_vid))
        rows = {k.name: [] for k in MEDIA_SCHEMA}
        for mid, dur, payload in zip(
            vids["media_id"].to_pylist(),
            vids["duration_ms"].to_pylist(),
            vids["payload"].to_pylist(),
        ):
            if self.backend == "real":
                frames, fps = codecs.decode_avi_rgb24(payload)
                n_f, h, w = frames.shape[:3]
                for ts in range(0, max(1, int(dur)), self.every_ms):
                    idx = min(int(ts * fps / 1000.0), n_f - 1)
                    rows["payload"].append(
                        codecs.encode_png(frames[idx])
                    )
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["media_id"].append(f"{mid}@{ts}")
                    rows["kind"].append("image")
                    rows["format"].append("png")
                    rows["duration_ms"].append(-1)
            else:
                for ts in range(0, max(1, int(dur)), self.every_ms):
                    seed = hashlib.sha256(
                        payload + ts.to_bytes(8, "little")
                    ).digest()
                    rows["payload"].append(seed * 4)
                    rows["width"].append(8)
                    rows["height"].append(8)
                    rows["media_id"].append(f"{mid}@{ts}")
                    rows["kind"].append("image")
                    rows["format"].append("png")
                    rows["duration_ms"].append(-1)
        frames_tbl = pa.table(rows, schema=MEDIA_SCHEMA)
        return pa.concat_tables(
            [passthrough.select(MEDIA_SCHEMA.names), frames_tbl]
        )


def extract_frames(
    ds, every_ms: int = 1000, backend: str = "real",
    concurrency=(1, 4), batch_size: int = 32,
):
    """Video rows -> sampled image-frame rows (non-video passes
    through). Output payload volume is frames-per-video x PNG size —
    bounded by every_ms, independent of source bitrate."""
    return ds.map_batches(
        FrameExtractor,
        fn_constructor_args=(every_ms, backend),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaResizer:
    """Actor-pool RESIZE stage — the one media op whose contract IS an
    explicit transcode (payload in, payload out), so unlike the decode
    stage it re-emits binary. Fake backend: a deterministic
    size-preserving byte transform + updated geometry metadata; real
    backend decodes PNG/PPM/PGM, nearest-neighbor resamples, and
    re-encodes the same format (other image formats raise).

    Scale math carried by the signature: payload-bearing batches stay
    small (batch_size=32 default at call sites) and the output payload
    is the RESIZED size, so downstream blocks shrink with the target
    resolution rather than inheriting source bytes."""

    def __init__(
        self, width: int = 224, height: int = 224, backend: str = "fake"
    ) -> None:
        if backend not in ("fake", "real"):
            raise ValueError(backend)
        self.w, self.h, self.backend = width, height, backend

    def _resize_real(self, payload: bytes) -> bytes:
        from ..functions import codecs

        fmt = codecs.sniff_format(payload)
        if fmt == "png":
            img = codecs.decode_png(payload)
            return codecs.encode_png(
                codecs.resize_nearest(img, self.w, self.h)
            )
        if fmt == "ppm":
            img = codecs.decode_ppm(payload)
            return codecs.encode_ppm(
                codecs.resize_nearest(img, self.w, self.h)
            )
        probe = codecs.probe_optional_backends()
        if fmt == "jpeg" and probe["pil"]:
            img = codecs.decode_jpeg_pil(payload)
            return codecs.encode_png(
                codecs.resize_nearest(img, self.w, self.h)
            )
        raise NotImplementedError(
            f"real resize of sniffed format {fmt!r} needs PIL/pyav — "
            f"codecs.probe_optional_backends() found {probe}; "
            "PNG/PPM/PGM resize natively — or use backend='fake'"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        imgs = pc.equal(batch["kind"], "image").to_numpy(
            zero_copy_only=False
        )
        payloads = batch["payload"].to_pylist()
        out_pay, out_w, out_h = [], [], []
        target = self.w * self.h // 64  # fake: bytes scale with area
        for i, p in enumerate(payloads):
            if not imgs[i]:
                out_pay.append(p)
                out_w.append(batch["width"][i].as_py())
                out_h.append(batch["height"][i].as_py())
                continue
            if self.backend == "real":
                out_pay.append(self._resize_real(p))
                out_w.append(self.w)
                out_h.append(self.h)
                continue
            # deterministic resample: sha-seeded byte stream of the
            # target size, keyed by source payload (stable under
            # retries / partitioning)
            seed = hashlib.sha256(p).digest()
            reps = target // len(seed) + 1
            out_pay.append((seed * reps)[:target])
            out_w.append(self.w)
            out_h.append(self.h)
        out = batch.drop_columns(["payload", "width", "height"])
        out = out.append_column("width", pa.array(out_w, pa.int32()))
        out = out.append_column("height", pa.array(out_h, pa.int32()))
        return out.append_column("payload", pa.array(out_pay, pa.binary()))


def resize_media(
    ds, width: int = 224, height: int = 224, backend: str = "fake",
    concurrency=(1, 4), batch_size: int = 32,
):
    return ds.map_batches(
        MediaResizer,
        fn_constructor_args=(width, height, backend),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaEmbedder:
    """Feature-extract stage: decoded feature tensors -> a shared
    embedding space via a projection 'model' loaded ONCE per actor
    (the model-load-in-__init__ pattern the real CLIP/CLAP replacement
    slots into). Deterministic: the projection is seed-derived."""

    def __init__(self, feat_dim: int = 16, emb_dim: int = 32,
                 seed: int = 7) -> None:
        rng = np.random.RandomState(seed)
        self.W = rng.randn(feat_dim, emb_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = batch["features"]
        arr = (
            feats.combine_chunks()
            if isinstance(feats, pa.ChunkedArray)
            else feats
        )
        X = (
            arr.values.to_numpy(zero_copy_only=False)
            .astype(np.float32)
            .reshape(len(arr), -1)
        )
        E = X @ self.W
        n = np.linalg.norm(E, axis=1, keepdims=True)
        n[n == 0] = 1.0
        E = E / n
        return batch.drop_columns(["features"]).append_column(
            "embedding",
            pa.FixedSizeListArray.from_arrays(
                pa.array(E.reshape(-1), pa.float32()), E.shape[1]
            ),
        )


def embed_media(
    ds, feat_dim: int = 16, emb_dim: int = 32,
    concurrency=(1, 4), batch_size: int = 256,
):
    """Decoded media -> normalized embeddings (batch_size can grow
    again here — the payload column is gone)."""
    return ds.map_batches(
        MediaEmbedder,
        fn_constructor_args=(feat_dim, emb_dim),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ------------------------------------------------------------- pHash
#: pHash DCT input size and low-frequency block
PHASH_SIZE = 32
PHASH_BLOCK = 8


class ImagePHasher:
    """Actor-pool perceptual hash (classic pHash): real-decoded image
    -> 32x32 nearest resize -> grayscale -> orthonormal 2-D DCT-II
    (basis precomputed ONCE per actor) -> 8x8 low-frequency block ->
    64-bit hash (bit j = AC coefficient j > median of the 63 ACs).
    Emits SimHash-shaped band rows (8 x 8-bit bands of the hash), so
    the text near-dup machinery (stages/dedup.py:pairs_from_bands +
    _verify_hamming) runs unchanged over IMAGES: by pigeonhole any
    pair within Hamming 7 shares an exact band. Non-image and
    non-PNG/PPM rows are skipped (plug PIL on a cluster that has it —
    reference analog Styling/src/lib/paper/__init__.py:360-390)."""

    def __init__(self, id_col: str = "media_id") -> None:
        self.id_col = id_col
        N = PHASH_SIZE
        n = np.arange(N, dtype=np.float64)
        C = np.cos(np.pi * (2.0 * n[None, :] + 1.0) * n[:, None] / (2 * N))
        C *= np.sqrt(2.0 / N)
        C[0] *= np.sqrt(0.5)
        self.C = C  # orthonormal DCT-II basis

    def _phash(self, payload: bytes) -> int | None:
        from ..functions import codecs

        fmt = codecs.sniff_format(payload)
        if fmt == "png":
            img = codecs.decode_png(payload)
        elif fmt == "ppm":
            img = codecs.decode_ppm(payload)
        else:
            return None
        img = codecs.resize_nearest(img, PHASH_SIZE, PHASH_SIZE)
        gray = img.mean(axis=2) if img.ndim == 3 else img.astype(
            np.float64
        )
        D = self.C @ gray @ self.C.T
        block = D[:PHASH_BLOCK, :PHASH_BLOCK].ravel()[1:]  # drop DC
        med = np.median(block)
        bits = block > med
        return int(
            np.bitwise_or.reduce(
                bits.astype(np.uint64) << np.arange(63, dtype=np.uint64)
            )
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch["kind"], "image"))
        ids, hashes = [], []
        for mid, payload in zip(
            batch[self.id_col].to_pylist(), batch["payload"].to_pylist()
        ):
            h = self._phash(payload)
            if h is not None:
                ids.append(mid)
                hashes.append(h)
        n = len(ids)
        ph = np.array(hashes, dtype=np.uint64)
        bands = np.stack(
            [(ph >> np.uint64(8 * i)) & np.uint64(0xFF) for i in range(8)],
            axis=1,
        ) if n else np.empty((0, 8), np.uint64)
        return pa.table(
            {
                "id": pa.array(np.repeat(np.array(ids, object), 8)
                               if n else [], pa.string()),
                "band_idx": pa.array(
                    np.tile(np.arange(8, dtype=np.int32), n)
                ),
                "band_hash": pa.array(bands.reshape(-1)),
                "simhash": pa.array(np.repeat(ph, 8)),
                "n_tokens": pa.array(
                    np.zeros(8 * n, np.int32)
                ),
            }
        )


def phash_dup_pairs(media_ds, max_hamming: int = 6, concurrency=2):
    """Near-duplicate IMAGE pairs by perceptual hash: actor-pool
    pHash (DCT basis loaded once per actor) -> the shared banded
    exchange -> exact Hamming verify. Returns (a, b, sim_a, sim_b)
    pair rows; Hamming <= 7 recall is guaranteed by the 8-band
    pigeonhole, matching the text SimHash contract."""
    from .dedup import _verify_hamming, pairs_from_bands

    bands = media_ds.map_batches(
        ImagePHasher(),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )
    pairs = pairs_from_bands(bands)
    return pairs.map_batches(
        lambda b: _verify_hamming(b, max_hamming), batch_format="pyarrow"
    )


#: audio fingerprint grid: 9 time windows x 9 log-spaced FFT bands
AFP_WINDOWS = 9
AFP_BANDS = 9


class AudioFPHasher:
    """Actor-pool audio fingerprint (Haitsma-Kalker shape): WAV
    payload -> 9 equal time windows x 9 log-spaced FFT energy bands
    -> 64-bit hash where bit (n, m) is the SIGN of the band-energy
    double difference (E[n,m]-E[n,m+1]) - (E[n-1,m]-E[n-1,m+1]) —
    robust to small amplitude noise, flips wholesale for different
    audio. Emits the same 8x8-bit band rows as ImagePHasher /
    SimHashEmitter, so pairs_from_bands + Hamming verify run
    unchanged over AUDIO. Non-WAV rows are skipped."""

    def __init__(self, id_col: str = "media_id") -> None:
        self.id_col = id_col

    def _fingerprint(self, payload: bytes) -> int | None:
        from ..functions import codecs

        if codecs.sniff_format(payload) != "wav":
            return None
        samples, rate = codecs.decode_wav(payload)
        s = samples.astype(np.float64)
        if s.ndim == 2:
            s = s.mean(axis=1)
        W, B = AFP_WINDOWS, AFP_BANDS
        n = len(s) // W
        if n < 2 * B:
            return None  # too short for the band grid
        E = np.empty((W, B))
        # log-spaced band edges over the positive spectrum
        for w in range(W):
            seg = s[w * n : (w + 1) * n]
            mag = np.abs(np.fft.rfft(seg)) ** 2
            edges = np.unique(
                np.geomspace(1, len(mag) - 1, B + 1).astype(np.int64)
            )
            while len(edges) < B + 1:  # tiny segments: pad edges
                edges = np.r_[edges, edges[-1] + 1]
            for m in range(B):
                E[w, m] = mag[edges[m]: edges[m + 1]].sum()
        d = E[:, :-1] - E[:, 1:]          # (W, B-1) band diffs
        dd = d[1:, :] - d[:-1, :]         # (W-1, B-1) double diffs
        bits = (dd > 0).ravel()[:64]
        return int(
            np.bitwise_or.reduce(
                bits.astype(np.uint64)
                << np.arange(len(bits), dtype=np.uint64)
            )
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch["kind"], "audio"))
        ids, hashes = [], []
        for mid, payload in zip(
            batch[self.id_col].to_pylist(), batch["payload"].to_pylist()
        ):
            h = self._fingerprint(payload)
            if h is not None:
                ids.append(mid)
                hashes.append(h)
        n = len(ids)
        ph = np.array(hashes, dtype=np.uint64)
        bands = np.stack(
            [(ph >> np.uint64(8 * i)) & np.uint64(0xFF) for i in range(8)],
            axis=1,
        ) if n else np.empty((0, 8), np.uint64)
        return pa.table(
            {
                "id": pa.array(np.repeat(np.array(ids, object), 8)
                               if n else [], pa.string()),
                "band_idx": pa.array(
                    np.tile(np.arange(8, dtype=np.int32), n)
                ),
                "band_hash": pa.array(bands.reshape(-1)),
                "simhash": pa.array(np.repeat(ph, 8)),
                "n_tokens": pa.array(np.zeros(8 * n, np.int32)),
            }
        )


def audio_dup_pairs(media_ds, max_hamming: int = 6, concurrency=2):
    """Near-duplicate AUDIO pairs by spectral fingerprint — the audio
    sibling of phash_dup_pairs over the identical banded exchange and
    Hamming verify."""
    from .dedup import _verify_hamming, pairs_from_bands

    bands = media_ds.map_batches(
        AudioFPHasher(),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )
    pairs = pairs_from_bands(bands)
    return pairs.map_batches(
        lambda b: _verify_hamming(b, max_hamming), batch_format="pyarrow"
    )
