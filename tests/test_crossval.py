"""K-fold CV for the line tagger (stages/crossval.py)."""

from __future__ import annotations

import numpy as np

from theoremkb_ray.sources.corpus import read_corpus
from theoremkb_ray.stages.crossval import crossval_crf
from theoremkb_ray.synth import materialize_corpus


def _fixture(tmp_path, n=120):
    cdir = materialize_corpus(str(tmp_path / "cv_corpus"), num_docs=n, seed=31)
    import pyarrow.parquet as pq

    return (
        read_corpus(f"{cdir}/corpus.parquet"),
        pq.read_table(f"{cdir}/gold_spans.parquet"),
    )


def test_crossval_folds_and_quality(tmp_path):
    corpus, gold = _fixture(tmp_path)
    df = crossval_crf(corpus, gold, k=4, epochs=6)
    folds = df[df["fold"] >= 0]
    assert list(folds["fold"]) == [0, 1, 2, 3]
    total = folds["n_test_docs"].sum()
    # every doc lands in exactly one test fold
    assert (folds["n_train_docs"] + folds["n_test_docs"] == total).all()
    # the synthetic corpus is learnable: every fold should be strong
    assert (folds["token_acc"] > 0.9).all(), folds
    assert (folds["macro_f1"] > 0.8).all(), folds
    # summary row aggregates
    mean = df[df["fold"] == -1].iloc[0]
    assert mean["n_test_docs"] == total
    assert abs(mean["token_acc"] - folds["token_acc"].mean()) < 5e-7


def test_crossval_deterministic(tmp_path):
    corpus, gold = _fixture(tmp_path, n=60)
    a = crossval_crf(corpus, gold, k=3, epochs=4)
    b = crossval_crf(corpus, gold, k=3, epochs=4)
    assert a.equals(b)
