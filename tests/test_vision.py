"""T2 analog: numpy conv page-band segmenter."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.vision import (
    ConvRowSegmenter,
    PAGE_H,
    rows_to_bands,
    segment_pages,
    synth_page_table,
    train_page_segmenter,
    _decode_pages,
    _gold_row_labels,
)


def test_rows_to_bands_run_detection():
    pred = np.zeros((2, PAGE_H), dtype=np.int8)
    pred[0, 5:10] = 1
    pred[0, 63] = 1  # single-row sliver -> dropped (min_rows=2)
    pred[1, 0:3] = 1
    t = rows_to_bands(pred, ["a", "b"]).to_pandas()
    assert len(t) == 2
    assert tuple(t.iloc[0][["media_id", "start_row", "end_row"]]) == ("a", 5, 9)
    assert tuple(t.iloc[1][["media_id", "start_row", "end_row"]]) == ("b", 0, 2)


def test_band_runs_do_not_cross_pages():
    pred = np.zeros((2, PAGE_H), dtype=np.int8)
    pred[0, PAGE_H - 3 :] = 1
    pred[1, :3] = 1
    t = rows_to_bands(pred, ["a", "b"]).to_pandas()
    assert len(t) == 2  # NOT one merged run across the page boundary
    assert set(t["media_id"]) == {"a", "b"}


def test_train_and_holdout_accuracy():
    m, acc = train_page_segmenter(num_pages=96, epochs=150, out_path=None)
    assert acc >= 0.97


def test_model_roundtrip(tmp_path):
    m, _ = train_page_segmenter(num_pages=32, epochs=30, out_path=None)
    p = str(tmp_path / "v.npz")
    m.save(p)
    m2 = ConvRowSegmenter.load(p)
    pages, _ = synth_page_table(4, seed=99)
    imgs = _decode_pages(pages)
    assert np.array_equal(m.predict_rows(imgs), m2.predict_rows(imgs))


def test_segment_pages_actor_pool_recovers_planted_bands():
    pages, gold = synth_page_table(48, seed=123)
    out = segment_pages(rd.from_arrow(pages)).to_pandas()
    g = gold.to_pandas()
    # recall: every planted band overlaps a predicted band on its page
    hits = 0
    for r in g.itertuples():
        preds = out[out["media_id"] == r.media_id]
        if (
            (preds["start_row"] <= r.end_row)
            & (preds["end_row"] >= r.start_row)
        ).any():
            hits += 1
    assert hits / len(g) >= 0.95


def test_media_resize_contract():
    import ray.data as rd

    from theoremkb_ray.stages.multimodal import (
        resize_media,
        synth_media_table,
    )

    ds = rd.from_arrow(synth_media_table(24, seed=3)).repartition(3)
    out = resize_media(ds, width=64, height=64).to_pandas()
    assert len(out) == 24
    imgs = out[out["kind"] == "image"]
    others = out[out["kind"] != "image"]
    assert (imgs["width"] == 64).all() and (imgs["height"] == 64).all()
    # fake resample: payload bytes scale with target area
    assert (imgs["payload"].str.len() == 64 * 64 // 64).all()
    # non-images pass through untouched
    src = synth_media_table(24, seed=3).to_pandas().set_index("media_id")
    for _, r in others.iterrows():
        assert r["payload"] == src.loc[r["media_id"], "payload"]
    # deterministic under re-run
    out2 = resize_media(ds, width=64, height=64).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert (a["payload"] == b["payload"]).all()


def test_media_embed_and_search_composition():
    import numpy as np
    import ray.data as rd

    from theoremkb_ray.stages.multimodal import (
        decode_media,
        embed_media,
        synth_media_table,
    )
    from theoremkb_ray.stages.similarity import brute_topk

    ds = rd.from_arrow(synth_media_table(48, seed=5)).repartition(4)
    emb = embed_media(decode_media(ds)).materialize()
    df = emb.to_pandas()
    assert len(df) == 48
    E = np.stack([np.asarray(v, np.float32) for v in df["embedding"]])
    assert np.allclose(np.linalg.norm(E, axis=1), 1.0, atol=1e-5)
    # ANN over media embeddings: each item's own embedding is its top hit
    with_id = emb.map_batches(
        lambda b: b.append_column(
            "vec_id",
            __import__("pyarrow").array(
                [int(m[1:]) for m in b["media_id"].to_pylist()],
                __import__("pyarrow").int64(),
            ),
        ),
        batch_format="pyarrow",
    )
    q = E[:3]
    top = brute_topk(with_id, q, k=1).to_pandas()
    assert sorted(top["vec_id"]) == [0, 1, 2]


def test_phash_finds_planted_near_duplicate_images():
    """pHash near-dup: a 1-pixel-perturbed copy of a real PNG must
    pair with its original (Hamming <= 6 after DCT), unrelated random
    images must not, and the pairs are deterministic."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.functions import codecs
    from theoremkb_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        phash_dup_pairs,
        synth_real_media_table,
    )

    base = synth_real_media_table(24, seed=7)
    # plant: perturb one pixel of the first PNG image by +-1
    rows = base.to_pylist()
    png_row = next(r for r in rows if r["format"] == "png")
    img = codecs.decode_png(png_row["payload"])
    img2 = img.copy()
    img2[0, 0, 0] = np.uint8((int(img2[0, 0, 0]) + 1) % 256)
    dup = dict(png_row)
    dup["media_id"] = "dup00001"
    dup["payload"] = codecs.encode_png(img2)
    tbl = pa.Table.from_pylist(rows + [dup], schema=MEDIA_SCHEMA)

    out = phash_dup_pairs(rd.from_arrow(tbl)).to_pandas()
    pairs = set(map(tuple, out[["a", "b"]].itertuples(False)))
    planted = (
        min(png_row["media_id"], "dup00001"),
        max(png_row["media_id"], "dup00001"),
    )
    assert planted in pairs or tuple(reversed(planted)) in pairs
    # no unrelated random images pair up
    others = {p for p in pairs if "dup00001" not in p
              and png_row["media_id"] not in p}
    assert not others
    # deterministic under re-run
    out2 = phash_dup_pairs(rd.from_arrow(tbl)).to_pandas()
    assert set(map(tuple, out2[["a", "b"]].itertuples(False))) == pairs


def test_audio_fingerprint_finds_planted_near_duplicate():
    """Audio near-dup: amplitude-modulated noise plus tiny (+-2 LSB)
    perturbation must pair with its original; independent noise
    seeds must not pair."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.functions import codecs
    from theoremkb_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        audio_dup_pairs,
    )

    rng = np.random.RandomState(3)
    rate = 8000
    rows = []
    base_samples = None
    for i in range(8):
        n = rate // 2
        env = 1.0 + np.sin(
            np.linspace(0, (i % 4 + 1) * np.pi, n)
        ) ** 2 * 3.0
        s = (rng.randn(n) * env * 2000).astype(np.int16)
        if i == 0:
            base_samples = s
        rows.append(
            {
                "media_id": f"a{i:05d}",
                "kind": "audio",
                "format": "wav",
                "width": -1,
                "height": -1,
                "duration_ms": 500,
                "payload": codecs.encode_wav(s, rate),
            }
        )
    noisy = np.clip(
        base_samples.astype(np.int32)
        + rng.randint(-2, 3, len(base_samples)),
        -32768,
        32767,
    ).astype(np.int16)
    rows.append(
        {
            "media_id": "adup0000",
            "kind": "audio",
            "format": "wav",
            "width": -1,
            "height": -1,
            "duration_ms": 500,
            "payload": codecs.encode_wav(noisy, rate),
        }
    )
    tbl = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
    out = audio_dup_pairs(rd.from_arrow(tbl)).to_pandas()
    pairs = set(map(tuple, out[["a", "b"]].drop_duplicates()
                    .itertuples(False)))
    assert ("a00000", "adup0000") in pairs or (
        "adup0000",
        "a00000",
    ) in pairs
    others = {p for p in pairs
              if "adup0000" not in p and "a00000" not in p}
    assert not others
