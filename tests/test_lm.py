"""Unigram- and bigram-LM perplexity scoring (stages/lm.py)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.lm import (
    bigram_lm,
    bigram_perplexity,
    perplexity,
    unigram_lm,
)


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


def test_bigram_lm_matches_hand_computation():
    # unigrams: a x3, b x3 (V=2); bigrams: (a,b) x2, (b,a) x1; k=1
    ds = _docs_ds(["a b", "a b", "b a"], blocks=3)
    lm = bigram_lm(ds)
    uni_h, uni_n, bi_h, bi_n, V, k = lm
    assert V == 2.0 and k == 1.0
    assert sorted(uni_n.tolist()) == [3.0, 3.0]
    assert sorted(bi_n.tolist()) == [1.0, 2.0]
    out = bigram_perplexity(ds, lm).to_pandas().set_index("doc_id")
    # p(b|a) = (2+1)/(3+2), p(a|b) = (1+1)/(3+2)
    assert abs(out.loc["d0", "nll"] + math.log(3 / 5)) < 1e-12
    assert abs(out.loc["d2", "nll"] + math.log(2 / 5)) < 1e-12
    assert out["n_bigrams"].tolist() == [1, 1, 1]


def test_bigram_lm_is_context_sensitive():
    # Same token multiset, different order: the unigram score cannot
    # separate them, the bigram score must.
    fluent = " ".join(f"w{i}" for i in range(10))
    shuffled = " ".join(f"w{i}" for i in (3, 8, 1, 9, 0, 6, 2, 7, 5, 4))
    ds = _docs_ds([fluent] * 50 + [shuffled], blocks=6)
    uni = perplexity(ds, unigram_lm(ds)).to_pandas().set_index("doc_id")
    assert abs(uni.loc["d0", "nll"] - uni.loc["d50", "nll"]) < 1e-9
    big = (
        bigram_perplexity(ds, bigram_lm(ds))
        .to_pandas()
        .set_index("doc_id")
    )
    assert big.loc["d50", "nll"] > big.loc["d0", "nll"] + 1.0


def test_bigram_lm_drops_short_docs():
    ds = _docs_ds(["a", "", "a b"], blocks=2)
    out = bigram_perplexity(ds, bigram_lm(ds)).to_pandas()
    assert list(out["doc_id"]) == ["d2"]
    assert out["n_bigrams"].tolist() == [1]


def test_lm_vocab_cap_keeps_most_frequent():
    ds = _docs_ds(["a a a a b b c", "a b d"])
    h, logp, oov, total = unigram_lm(ds, vocab_max=2)
    assert len(h) == 2
    # kept tokens: 'a' (5) and 'b' (3); total stays the FULL count
    assert total == 10.0
    np.testing.assert_allclose(
        sorted(np.exp(logp) * total), [3.0, 5.0], rtol=1e-12
    )


def test_dsir_scores_hand_computed():
    import math

    import pandas as pd
    import ray.data as rd

    # corpus: d0="a a b" (target), d1="b c" — V=3, T_r=5, T_t=3
    tbl = pd.DataFrame(
        {"doc_id": ["d0", "d1"], "text": ["a a b", "b c"]}
    )
    ds = rd.from_pandas(tbl).map_batches(
        lambda b: b, batch_format="pyarrow"
    )
    target = ds.filter(lambda r: r["doc_id"] == "d0")
    from theoremkb_ray.stages.lm import dsir_scores

    out = dsir_scores(ds, target).to_pandas().set_index("doc_id")
    V, Tt, Tr = 3.0, 3.0, 5.0

    def lr(ct, cr):
        return math.log((ct + 1) / (Tt + V)) - math.log(
            (cr + 1) / (Tr + V)
        )

    want_d0 = (2 * lr(2, 2) + lr(1, 2)) / 3
    want_d1 = (lr(1, 2) + lr(0, 1)) / 2
    assert abs(out.loc["d0", "dsir_score"] - want_d0) < 1e-12
    assert abs(out.loc["d1", "dsir_score"] - want_d1) < 1e-12
    assert out["n_tokens"].tolist() == [3, 2]


def test_dsir_select_prefers_target_like_docs():
    import ray.data as rd

    # 20 "sciency" docs, 20 "webby" docs; target = the sciency half.
    sci = ["theorem proof lemma corollary bound"] * 20
    web = ["click buy now free offer"] * 20
    tbl = {
        "doc_id": [f"d{i}" for i in range(40)],
        "text": sci + web,
    }
    ds = rd.from_arrow(pa.table(tbl))
    target = ds.filter(lambda r: int(r["doc_id"][1:]) < 20)
    from theoremkb_ray.stages.lm import dsir_select

    kept = dsir_select(ds, target, frac=0.5).to_pandas()
    assert len(kept) == 20
    assert all(int(d[1:]) < 20 for d in kept["doc_id"])
    assert (kept["dsir_score"] > 0).all()
