"""Text analysis + similarity + multimodal stage tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.stages.multimodal import (
    MediaDecoder,
    decode_media,
    frame_sample_plan_batch,
    synth_media_table,
)
from theoremkb_ray.stages.similarity import brute_topk, ivf_topk
from theoremkb_ray.stages.textstats import (
    fingerprints,
    langid,
    quality,
    token_counts,
    vocabulary_topk,
)


def test_langid_heuristic():
    t = pa.table(
        {
            "text": pa.array(
                [
                    "the cat and the dog sat in the house for a while",
                    "le chat et le chien est dans la maison des amis",
                    "el gato y el perro es de la casa en un dia",
                    "der hund und die katze ist ein tier von den leuten",
                    "的了是我不在有人这他的了是我",
                ]
            )
        }
    )
    out = langid(rd.from_arrow(t)).to_pandas()
    assert out["lang_pred"].tolist() == ["en", "fr", "es", "de", "zh"]
    assert (out["lang_conf"] > 0).all()


def test_quality_vectorized():
    t = pa.table(
        {
            "text": pa.array(
                ["good long text " * 20, "123 456 789", "x"]
            )
        }
    )
    out = quality(rd.from_arrow(t)).to_pandas()
    assert out["quality_score"].iloc[0] > out["quality_score"].iloc[1]
    assert out["n_words"].iloc[2] == 1
    assert 0 <= out["alpha_ratio"].min() <= 1


def test_token_counts():
    t = pa.table({"text": pa.array(["hello world, it's 42 tokens!"])})
    out = token_counts(rd.from_arrow(t)).to_pandas()
    assert out["n_ws_tokens"].iloc[0] == 5
    assert out["n_subword_tokens"].iloc[0] >= 6  # punct split separately


def test_fingerprints_deterministic():
    t = pa.table({"text": pa.array(["a b c d e f g h i j k l " * 4] * 2)})
    out = fingerprints(rd.from_arrow(t)).to_pandas()
    assert out["fingerprint64"].iloc[0] == out["fingerprint64"].iloc[1]
    assert len(out["fingerprint"].iloc[0]) >= 1


def test_vocabulary_topk_matches_counter():
    import collections

    texts = ["a b a c", "b a", "c c c a"]
    t = pa.table({"text": pa.array(texts)})
    out = vocabulary_topk(rd.from_arrow(t), k=2).to_pandas()
    true = collections.Counter(" ".join(texts).split())
    assert out.iloc[0]["token"] == "a" and out.iloc[0]["count"] == true["a"]
    assert len(out) == 2


def _emb_table(n=200, d=16, seed=0):
    rng = np.random.RandomState(seed)
    V = rng.standard_normal((n, d)).astype(np.float32)
    return (
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [v.tolist() for v in V], pa.list_(pa.float32())
                ),
            }
        ),
        V,
    )


def test_brute_topk_matches_numpy():
    t, V = _emb_table()
    rng = np.random.RandomState(1)
    Q = rng.standard_normal((3, 16)).astype(np.float32)
    out = brute_topk(rd.from_arrow(t), Q, k=5).to_pandas()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Vn @ Qn.T
    for qi in range(3):
        expect = set(np.argsort(-S[:, qi])[:5].tolist())
        got = set(
            out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        )
        assert got == expect
    assert (out.groupby("query_id").size() == 5).all()


def test_ivf_topk_recall():
    t, V = _emb_table(400)
    rng = np.random.RandomState(2)
    Q = rng.standard_normal((5, 16)).astype(np.float32)
    brute = brute_topk(rd.from_arrow(t), Q, k=10).to_pandas()
    ivf = ivf_topk(
        rd.from_arrow(t), Q, k=10, num_centroids=8, nprobe=4
    ).to_pandas()
    recalls = []
    for qi in range(5):
        b = set(brute[brute["query_id"] == qi]["vec_id"])
        a = set(ivf[ivf["query_id"] == qi]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.6  # approximate by design


def test_media_decode_fake_roundtrip():
    t = synth_media_table(12)
    out = decode_media(rd.from_arrow(t), backend="fake").to_pandas()
    assert len(out) == 12
    assert "payload" not in out.columns  # pixels never re-emitted
    assert len(out["features"].iloc[0]) == 16
    # deterministic: same payload -> same features
    out2 = decode_media(rd.from_arrow(t), backend="fake").to_pandas()
    assert np.allclose(
        np.stack(out["features"]), np.stack(out2["features"])
    )


def test_media_decode_real_is_stubbed():
    dec = MediaDecoder(backend="real")
    with pytest.raises(NotImplementedError):
        dec(synth_media_table(2))


def test_frame_sample_plan():
    t = synth_media_table(9)
    plan = frame_sample_plan_batch(t, every_ms=1000)
    vids = t.filter(pa.compute.equal(t["kind"], "video")).to_pandas()
    expect = sum(max(1, d // 1000) for d in vids["duration_ms"])
    assert plan.num_rows == expect
    assert set(plan["media_id"].to_pylist()) == set(vids["media_id"])


def test_langid_vectorized_matches_row_loop():
    """The Arrow-kernel LangId must agree exactly with the per-row
    CPython reference semantics (lower().split()[:200] + stopword
    hits, first-max-wins in en/fr/es/de order, CJK shortcut over the
    first 400 codepoints)."""
    from theoremkb_ray.stages.textstats import _STOPWORDS, LangId

    def reference(texts):
        profiles = {l: frozenset(w) for l, w in _STOPWORDS.items()}
        out, conf = [], []
        for t in texts:
            cjk = sum("一" <= c <= "鿿" for c in t[:400])
            if cjk > 0.2 * min(len(t), 400):
                out.append("zh")
                conf.append(min(1.0, cjk / 50))
                continue
            words = t.lower().split()[:200]
            if not words:
                out.append("und")
                conf.append(0.0)
                continue
            best, bh = "und", 0
            for lang, prof in profiles.items():
                if lang == "zh":
                    continue
                hits = sum(w in prof for w in words)
                if hits > bh:
                    best, bh = lang, hits
            out.append(best)
            conf.append(bh / len(words))
        return out, conf

    texts = [
        "",
        "   ",
        "\tthe\nand\r\nof\fto\vin",  # \v: not RE2 \s — Unicode split
        "　the　and　",  # ideographic space
        "the " * 500,  # word cap
        "一" * 500,
        "mixed 一二三 the and of text far below the cjk cutoff",
        "de de de et et la",  # fr/es tie material
        "THE AND OF",
    ]
    rng = np.random.default_rng(7)
    vocab = [w for ws in _STOPWORDS.values() for w in ws] + [
        "foo", "bar", "一二", "qux",
    ]
    for _ in range(120):
        k = int(rng.integers(0, 260))
        texts.append(" ".join(rng.choice(vocab, size=k)))

    t = pa.table({"text": pa.array(texts, pa.string())})
    chunked = pa.Table.from_batches(t.to_batches(max_chunksize=7))
    want_lang, want_conf = reference(texts)
    for table in (t, chunked):
        got = LangId()(table)
        assert got["lang_pred"].to_pylist() == want_lang
        np.testing.assert_allclose(
            got["lang_conf"].to_pylist(), want_conf, atol=1e-12
        )
