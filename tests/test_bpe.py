"""BPE tokenizer training + encoding (stages/bpe.py).

The merge trainer is cross-checked against a literal, slow
re-implementation of Sennrich-style BPE (recount all pairs from
scratch every merge); the distributed histogram and the actor-pool
encode are checked for partitioning invariance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from theoremkb_ray.stages.bpe import (
    EOW,
    BpeEncoder,
    bpe_tokenize,
    encode_word,
    train_bpe,
    word_freqs,
)


def _ref_train(word_freq: pd.DataFrame, num_merges: int):
    """Literal reference: recount every pair from scratch per merge."""
    words = {
        i: list(w) + [EOW] for i, w in enumerate(word_freq["word"])
    }
    freqs = word_freq["freq"].to_numpy(np.int64)
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + int(freqs[i])
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for i, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == a
                    and syms[j + 1] == b
                ):
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


def test_train_matches_literal_reference():
    wf = pd.DataFrame(
        {
            "word": ["low", "lower", "newest", "widest", "lowest"],
            "freq": [5, 2, 6, 3, 4],
        }
    )
    fast = train_bpe(wf, num_merges=12)
    slow = _ref_train(wf, num_merges=12)
    assert fast == slow


def test_train_overlapping_runs():
    # 'aaaa' exercises the self-overlap bookkeeping ((a,a) merges)
    wf = pd.DataFrame({"word": ["aaaa", "aaab"], "freq": [3, 2]})
    assert train_bpe(wf, num_merges=6) == _ref_train(wf, num_merges=6)


def test_encode_word_roundtrip():
    wf = pd.DataFrame(
        {"word": ["low", "lower", "lowest"], "freq": [5, 2, 4]}
    )
    merges = train_bpe(wf, num_merges=8)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for w in ["low", "lower", "lowest", "slow"]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW  # lossless
        assert len(toks) >= 1


def test_word_freqs_partition_invariant(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(40),
            "text": [
                f"alpha beta gamma doc{i % 7} alpha" for i in range(40)
            ],
        }
    )
    a = word_freqs(rd.from_pandas(docs).repartition(1))
    b = word_freqs(rd.from_pandas(docs).repartition(9))
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    assert int(a.loc[a["word"] == "alpha", "freq"].iloc[0]) == 80


def test_bpe_tokenize_end_to_end(ray_session):
    rng = np.random.RandomState(7)
    vocab = ["stream", "shard", "merge", "token", "batch", "actor"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(3, 12)))
        for _ in range(60)
    ]
    docs = pd.DataFrame({"doc_id": np.arange(60), "text": texts})
    out1, merges1 = bpe_tokenize(
        rd.from_pandas(docs).repartition(2), num_merges=30
    )
    out8, merges8 = bpe_tokenize(
        rd.from_pandas(docs).repartition(8), num_merges=30
    )
    assert merges1 == merges8  # training partition-invariant
    df1 = out1.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df8 = out8.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(df1, df8)
    # after enough merges, frequent whole words become single tokens:
    # token count must be <= character count and >= word count
    assert (df1["n_tokens"] >= df1["n_words"]).all()
    joined = docs.set_index("doc_id")
    chars = joined["text"].str.replace(" ", "").str.len()
    assert (
        df1.set_index("doc_id")["n_tokens"]
        <= chars.loc[df1["doc_id"]].to_numpy() + df1.set_index("doc_id")["n_words"]
    ).all()


def test_encoder_cache_consistency(ray_session):
    # the per-actor cache must not change results vs a cold encode
    import ray

    wf = pd.DataFrame(
        {"word": ["cache", "cachet", "cached"], "freq": [4, 2, 3]}
    )
    merges = train_bpe(wf, num_merges=10)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    enc = BpeEncoder.__new__(BpeEncoder)
    enc.ranks, enc.text_col, enc.id_col, enc.cache = (
        ranks,
        "text",
        "doc_id",
        {},
    )
    import pyarrow as pa

    b = pa.table(
        {"doc_id": [0, 1], "text": ["cache cached", "cache cachet"]}
    )
    first = enc(b)["n_tokens"].to_pylist()
    second = enc(b)["n_tokens"].to_pylist()  # warm cache
    assert first == second
    cold = [
        sum(
            len(encode_word(w, ranks))
            for w in t.split()
        )
        for t in ["cache cached", "cache cachet"]
    ]
    assert first == cold
