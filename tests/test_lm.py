"""Unigram-LM perplexity scoring (stages/lm.py)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.lm import perplexity, unigram_lm


def _docs_ds(texts, blocks=4):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    [f"d{i}" for i in range(len(texts))], pa.string()
                ),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)


def test_lm_matches_hand_computation():
    # corpus: 6 tokens total; "a" x3, "b" x2, "c" x1
    ds = _docs_ds(["a b a", "b a c"])
    h, logp, oov, total = unigram_lm(ds)
    assert total == 6.0
    out = (
        perplexity(ds, (h, logp, oov, total))
        .to_pandas()
        .set_index("doc_id")
    )
    la, lb, lc = math.log(3 / 6), math.log(2 / 6), math.log(1 / 6)
    assert out.loc["d0", "n_tokens"] == 3
    assert abs(out.loc["d0", "nll"] - (-(la + lb + la) / 3)) < 1e-12
    assert abs(out.loc["d1", "nll"] - (-(lb + la + lc) / 3)) < 1e-12


def test_lm_scoring_ranks_outliers():
    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(50)]
    normal = [
        " ".join(rng.choice(vocab, size=30)) for _ in range(200)
    ]
    weird = " ".join(f"zz{i}" for i in range(30))  # all singletons
    ds = _docs_ds(normal + [weird], blocks=8)
    lm = unigram_lm(ds)
    out = perplexity(ds, lm).to_pandas()
    worst = out.sort_values("nll").iloc[-1]
    assert worst["doc_id"] == f"d{len(normal)}"


def test_lm_oov_and_empty_docs():
    train = _docs_ds(["x y z x"])
    lm = unigram_lm(train)
    h, logp, oov, total = lm
    # scoring a disjoint corpus: every token is OOV -> nll = -oov
    score = perplexity(_docs_ds(["q r", ""]), lm).to_pandas()
    assert list(score["doc_id"]) == ["d0"]  # empty doc dropped
    assert abs(score["nll"].iloc[0] + oov) < 1e-12
    assert oov == math.log(1 / 4)


def test_lm_vocab_cap_keeps_most_frequent():
    ds = _docs_ds(["a a a a b b c", "a b d"])
    h, logp, oov, total = unigram_lm(ds, vocab_max=2)
    assert len(h) == 2
    # kept tokens: 'a' (5) and 'b' (3); total stays the FULL count
    assert total == 10.0
    np.testing.assert_allclose(
        sorted(np.exp(logp) * total), [3.0, 5.0], rtol=1e-12
    )
