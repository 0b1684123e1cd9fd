"""Pure-stdlib codecs + the real-backend multimodal stages."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.functions import codecs


def _paeth(a, b, c):
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    if pb <= pc_:
        return b
    return c


def _filter_forward(img: np.ndarray, ftype: int) -> bytes:
    """Reference forward scanline filtering per the PNG spec — builds
    test vectors our decoder must invert."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        line = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            left = cur[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(left, up, ul)
            line[x] = (cur[x] - pred) % 256
        out.append(ftype)
        out.extend(line.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def _wrap_png(filtered: bytes, w: int, h: int, color: int) -> bytes:
    import struct
    import zlib

    def chunk(t, b):
        return (
            struct.pack(">I", len(b))
            + t
            + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(filtered))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    rng = np.random.RandomState(channels)
    img = rng.randint(0, 256, (13, 9, channels), dtype=np.uint8)
    out = codecs.decode_png(codecs.encode_png(img))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filters_decode(ftype):
    rng = np.random.RandomState(10 + ftype)
    img = rng.randint(0, 256, (7, 11, 3), dtype=np.uint8)
    data = _wrap_png(_filter_forward(img, ftype), 11, 7, 2)
    np.testing.assert_array_equal(codecs.decode_png(data), img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.decode_png(b"\x00" * 64)


def test_ppm_roundtrip():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (5, 8, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, (6, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        codecs.decode_ppm(codecs.encode_ppm(rgb)), rgb
    )
    np.testing.assert_array_equal(
        codecs.decode_ppm(codecs.encode_ppm(gray)), gray[:, :, None]
    )


def test_ppm_comment_header():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    data = codecs.encode_ppm(rgb).replace(b"\n2 2\n", b"\n# c\n2 2\n", 1)
    np.testing.assert_array_equal(codecs.decode_ppm(data), rgb)


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(ch):
    rng = np.random.RandomState(ch)
    s = rng.randint(-30000, 30000, (500, ch)).astype(np.int16)
    out, rate = codecs.decode_wav(codecs.encode_wav(s, 22050))
    assert rate == 22050
    np.testing.assert_array_equal(out, s)


def test_resize_nearest():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (30, 20, 3), dtype=np.uint8)
    out = codecs.resize_nearest(img, 10, 15)
    assert out.shape == (15, 10, 3)
    np.testing.assert_array_equal(codecs.resize_nearest(img, 20, 30), img)


def test_sniff():
    assert codecs.sniff_format(codecs.encode_png(np.zeros((2, 2), np.uint8))) == "png"
    assert codecs.sniff_format(codecs.encode_ppm(np.zeros((2, 2), np.uint8))) == "ppm"
    assert codecs.sniff_format(codecs.encode_wav(np.zeros(4, np.int16))) == "wav"
    assert codecs.sniff_format(b"garbage!") == "unknown"


# ------------------------------------------------ real-backend stages


def test_decode_media_real(ray_session):
    from theoremkb_ray.stages.multimodal import (
        decode_media,
        synth_real_media_table,
    )

    tbl = synth_real_media_table(n=12, seed=1)
    out = decode_media(
        rd.from_arrow(tbl), backend="real", feat_dim=16
    ).to_pandas()
    assert len(out) == 12 and "features" not in (None,)
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (12, 16) and np.isfinite(feats).all()
    # image/video features are normalized histograms; audio L2-normed
    hist = (out["kind"] != "audio").to_numpy()
    np.testing.assert_allclose(feats[hist].sum(axis=1), 1.0, atol=1e-5)
    aud = feats[~hist]
    np.testing.assert_allclose(np.linalg.norm(aud, axis=1), 1.0, atol=1e-5)
    assert (out["kind"] == "video").any()  # AVI rows decode for real


def test_decode_media_real_rejects_fake_payload(ray_session):
    from theoremkb_ray.stages.multimodal import MediaDecoder, synth_media_table

    dec = MediaDecoder(backend="real")
    with pytest.raises(NotImplementedError, match="pyav|PIL"):
        dec(synth_media_table(n=3, seed=0))


def test_resize_media_real(ray_session):
    from theoremkb_ray.stages.multimodal import (
        resize_media,
        synth_real_media_table,
    )

    tbl = synth_real_media_table(n=9, seed=2)
    out = resize_media(
        rd.from_arrow(tbl), width=16, height=12, backend="real"
    ).to_pandas()
    for _, row in out.iterrows():
        if row["kind"] != "image":
            continue
        assert (row["width"], row["height"]) == (16, 12)
        fmt = codecs.sniff_format(row["payload"])
        img = (
            codecs.decode_png(row["payload"])
            if fmt == "png"
            else codecs.decode_ppm(row["payload"])
        )
        assert img.shape[:2] == (12, 16)


@pytest.mark.parametrize("shape", [(1, 8, 8), (5, 13, 17), (3, 24, 10)])
def test_avi_roundtrip(shape):
    n, h, w = shape
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (n, h, w, 3), np.uint8)
    payload = codecs.encode_avi_rgb24(frames, fps=12)
    assert codecs.sniff_format(payload) == "avi"
    got, fps = codecs.decode_avi_rgb24(payload)
    assert fps == 12.0
    np.testing.assert_array_equal(got, frames)


def test_avi_rejects_compressed():
    rng = np.random.RandomState(0)
    payload = bytearray(
        codecs.encode_avi_rgb24(rng.randint(0, 256, (2, 4, 4, 3), np.uint8))
    )
    # flip biCompression in the strf chunk to a nonzero codec id
    i = bytes(payload).index(b"strf")
    payload[i + 8 + 16 : i + 8 + 20] = b"MJPG"
    with pytest.raises(ValueError, match="compressed"):
        codecs.decode_avi_rgb24(bytes(payload))


def test_extract_frames_real(ray_session):
    """Each sampled frame must equal the source frame at that
    timestamp, byte-for-byte after the PNG re-encode roundtrip."""
    import pyarrow as pa

    from theoremkb_ray.stages.multimodal import MEDIA_SCHEMA, extract_frames

    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, (6, 10, 12, 3), np.uint8)  # 10 fps
    tbl = pa.table(
        {
            "media_id": ["v0"],
            "kind": ["video"],
            "format": ["avi"],
            "width": [12],
            "height": [10],
            "duration_ms": [600],
            "payload": [codecs.encode_avi_rgb24(frames, fps=10)],
        },
        schema=MEDIA_SCHEMA,
    )
    out = (
        extract_frames(rd.from_arrow(tbl), every_ms=200, backend="real")
        .to_pandas()
        .sort_values("media_id")
    )
    assert list(out["media_id"]) == ["v0@0", "v0@200", "v0@400"]
    assert (out["kind"] == "image").all()
    for ts, row in zip((0, 200, 400), out.itertuples()):
        img = codecs.decode_png(row.payload)
        np.testing.assert_array_equal(img, frames[ts // 100])


def test_extract_frames_passthrough_and_fake(ray_session):
    from theoremkb_ray.stages.multimodal import (
        extract_frames,
        synth_media_table,
    )

    tbl = synth_media_table(9, seed=4)
    out = extract_frames(
        rd.from_arrow(tbl), every_ms=1000, backend="fake"
    ).to_pandas()
    # non-video rows pass through untouched; video rows fan out
    src = tbl.to_pandas()
    n_nonvid = (src["kind"] != "video").sum()
    assert (out["kind"] != "video").all()
    assert len(out) >= n_nonvid + (src["kind"] == "video").sum()


def test_probe_optional_backends_shapes_stub_errors():
    """The compressed-codec capability probe: absent libs -> the stub
    error NAMES the probe result; present libs would route JPEG/mp4
    through the same backend='real' path (skipped when absent)."""
    import numpy as np
    import pytest

    from theoremkb_ray.functions import codecs
    from theoremkb_ray.stages.multimodal import MediaDecoder

    probe = codecs.probe_optional_backends(refresh=True)
    assert set(probe) == {"pil", "pyav"}

    jpeg_magic = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    mp4_magic = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 32
    assert codecs.sniff_format(jpeg_magic) == "jpeg"
    assert codecs.sniff_format(mp4_magic) == "mp4"

    dec = MediaDecoder(backend="real", feat_dim=8)
    if not probe["pil"]:
        with pytest.raises(NotImplementedError, match="probe_optional"):
            dec._decode_real(jpeg_magic, "image")
    else:  # pragma: no cover - container has no PIL
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.zeros((4, 4, 3), dtype=np.uint8)
        ).save(buf, format="JPEG")
        feats = dec._decode_real(buf.getvalue(), "image")
        assert feats.shape == (8,)
    if not probe["pyav"]:
        with pytest.raises(NotImplementedError, match="probe_optional"):
            dec._decode_real(mp4_magic, "video")
