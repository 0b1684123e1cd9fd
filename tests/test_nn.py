"""Numpy neural analogs (T3 CNN1D context tagger, T8/T9 text cls)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.nn import (
    CLS3,
    HashedTextClassifier,
    MLPTagger,
    classify_paragraphs,
    paragraphs_from_lines,
    segment_cnn1d,
    train_cnn1d,
    train_nlp,
    window_features,
)
from theoremkb_ray.stages.tokenize import explode_lines, tokenize


def test_window_features_zero_padding_at_doc_edges():
    X = np.eye(4, dtype=bool)[:, :3]  # 4 lines, 3 feats
    offsets = np.array([0, 2, 4], dtype=np.int64)  # 2 docs of 2 lines
    Xw = window_features(X, offsets, window=1)
    assert Xw.shape == (4, 9)
    # line 0 of doc 0: prev slot zeroed (no line before in this doc)
    assert not Xw[0, :3].any()
    # line 2 (doc 1 first line): prev slot zeroed — NOT line 1 of doc 0
    assert not Xw[2, :3].any()
    # line 1's next slot zeroed (doc 0 ends)
    assert not Xw[1, 6:].any()
    # center slot always the line's own features
    assert (Xw[:, 3:6] == X.astype(np.float32)).all()


def test_paragraphs_from_lines():
    lines = pa.array(
        ["a", "", "b", "c", "", "", "d"], pa.string()
    )
    offsets = np.array([0, 5, 7], dtype=np.int64)  # doc0: 0-4, doc1: 5-6
    s, e, d = paragraphs_from_lines(lines, offsets)
    # doc0 paras: [0,0], [2,3]; doc1: line 5 is blank, para [6,6]
    assert list(s) == [0, 2, 6]
    assert list(e) == [0, 3, 6]
    assert list(d) == [0, 0, 1]


def test_train_cnn1d_accuracy_and_determinism():
    m1, acc1 = train_cnn1d(num_docs=150, epochs=15, out_path=None)
    m2, acc2 = train_cnn1d(num_docs=150, epochs=15, out_path=None)
    assert acc1 >= 0.93
    assert acc1 == acc2
    assert np.array_equal(m1.W1, m2.W1)


def test_cnn1d_segmenter_report(gold100):
    from theoremkb_ray.stages.agreement import classification_report
    from theoremkb_ray.stages.ingest import ingest

    ds = segment_cnn1d(
        tokenize(ingest(rd.from_arrow(gold100["corpus"])))
    )
    rep = classification_report(ds, gold100["gold_spans"])
    by = rep.set_index("label")
    assert by.loc["theorem", "f1"] >= 0.85
    assert by.loc["O", "f1"] >= 0.95


def test_cnn1d_registered_as_segmenter():
    from theoremkb_ray.registry import get_segmenter, list_segmenters

    assert "results.cnn1d" in list_segmenters()
    assert get_segmenter("results.cnn1d") is segment_cnn1d


def test_train_nlp_and_classify(gold100):
    from theoremkb_ray.stages.ingest import ingest

    _, acc = train_nlp(num_docs=150, epochs=10, out_path=None)
    assert acc >= 0.8
    out = classify_paragraphs(
        tokenize(ingest(rd.from_arrow(gold100["corpus"])))
    ).to_pandas()
    assert set(out["cls3"]) <= set(CLS3)
    assert (out["end_line"] >= out["start_line"]).all()
    # theorem head paragraphs should be mostly recovered: join gold
    gold = gold100["gold_spans"].to_pandas()
    th = gold[gold["label"] != "proof"]
    merged = th.merge(
        out,
        left_on=["doc_id", "start_line"],
        right_on=["doc_id", "start_line"],
    )
    assert len(merged) > 0
    assert (merged["cls3"] == "Theorem").mean() >= 0.9


def test_model_roundtrip(tmp_path):
    m, _ = train_cnn1d(num_docs=60, epochs=5, out_path=None)
    p = str(tmp_path / "m.npz")
    m.save(p)
    m2 = MLPTagger.load(p)
    assert np.array_equal(m.W2, m2.W2)
    c, _ = train_nlp(num_docs=60, epochs=5, out_path=None)
    p2 = str(tmp_path / "c.npz")
    c.save(p2)
    c2 = HashedTextClassifier.load(p2)
    assert np.array_equal(c.W, c2.W)


def test_cnn1d_noisy_regime_meets_reference_bar(ray_session):
    """The context-window MLP trained on 15%-corrupted gold over a
    25%-distractor corpus must clear the reference's published
    line-level bars (B .96/.96 within one-doc tolerance on precision,
    I .83/.73 — Training.ipynb cell 13), mirroring the CRF's
    noise-robust gate (tests/test_segment.py)."""
    from theoremkb_ray.stages.nn import noise_robust_report_cnn1d

    rep = noise_robust_report_cnn1d().set_index("tag_class")
    assert rep.loc["B", "precision"] >= 0.95
    assert rep.loc["B", "recall"] >= 0.96
    assert rep.loc["I", "precision"] >= 0.83
    assert rep.loc["I", "recall"] >= 0.73
    assert rep.loc["O", "recall"] >= 0.90


def test_nlp_noisy_regime_recorded_shape(ray_session):
    """The noisy-regime NLP table (BASELINE.md round-4) is pinned in
    shape and on the classes the linear model DOES handle: Proof
    perfect, Theorem recall 1.0; Basic recall is the documented
    representation limit (distractor paragraphs), asserted only as
    a floor so a regression below the recorded .55 still fails."""
    from theoremkb_ray.stages.nn import noise_robust_report_nlp

    rep = noise_robust_report_nlp().set_index("cls")
    assert set(rep.index) == {"Basic", "Theorem", "Proof"}
    assert rep.loc["Proof", "f1"] >= 0.95
    assert rep.loc["Theorem", "recall"] >= 0.95
    assert rep.loc["Basic", "precision"] >= 0.95
    assert rep.loc["Basic", "recall"] >= 0.50
