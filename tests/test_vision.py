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
