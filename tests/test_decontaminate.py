"""Decontamination: planted benchmark overlaps are flagged, clean docs
pass, short docs (< k tokens) use their full-text gram, filter drops
exactly the contaminated set."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.decontaminate import (
    benchmark_grams,
    decontaminate,
    flag_contaminated,
)

_WORDS = [f"w{i}" for i in range(300)]


def _text(rng, n=40):
    return " ".join(_WORDS[j] for j in rng.randint(0, len(_WORDS), n))


def test_flagging_and_filter(ray_session):
    rng = np.random.RandomState(5)
    bench = [_text(rng) for _ in range(10)]
    clean = [_text(rng) for _ in range(30)]
    # contaminated: a clean prefix + a verbatim 20-token benchmark span
    leaks = [
        _text(rng, 10) + " " + " ".join(bench[i].split()[5:25])
        for i in range(5)
    ]
    ids = (
        [f"c{i:02d}" for i in range(30)] + [f"x{i:02d}" for i in range(5)]
    )
    t = pa.table(
        {"doc_id": pa.array(ids), "text": pa.array(clean + leaks)}
    )
    flagged = flag_contaminated(rd.from_arrow(t), bench).to_pandas()
    flagged = flagged.set_index("doc_id")
    assert not flagged.loc[[f"c{i:02d}" for i in range(30)]][
        "contaminated"
    ].any()
    assert flagged.loc[[f"x{i:02d}" for i in range(5)]][
        "contaminated"
    ].all()
    # a 20-token verbatim span contains 20-13+1 = 8 contaminated grams
    assert (
        flagged.loc[[f"x{i:02d}" for i in range(5)]]["overlap_grams"] == 8
    ).all()
    out = decontaminate(rd.from_arrow(t), bench).to_pandas()
    assert sorted(out["doc_id"]) == [f"c{i:02d}" for i in range(30)]
    assert set(out.columns) == {"doc_id", "text"}


def test_short_doc_exact_match(ray_session):
    # docs shorter than k tokens are contaminated only on FULL match
    bench = ["alpha beta gamma"]
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "text": pa.array(["alpha beta gamma", "alpha beta delta"]),
        }
    )
    flagged = (
        flag_contaminated(rd.from_arrow(t), bench)
        .to_pandas()
        .set_index("doc_id")
    )
    assert bool(flagged.loc["a", "contaminated"])
    assert not bool(flagged.loc["b", "contaminated"])


def test_benchmark_grams_deterministic():
    g1 = benchmark_grams(["one two three four five six seven"], k=3)
    g2 = benchmark_grams(["one two three four five six seven"], k=3)
    assert np.array_equal(g1, g2) and len(g1) == 5


def test_bloom_path_no_false_negatives():
    """Every doc the exact broadcast path drops is also dropped by the
    Bloom path (one-sided error), and the extra false-positive drops
    are rare."""
    import ray.data as rd

    from theoremkb_ray.stages.decontaminate import (
        decontaminate,
        decontaminate_bloom,
    )

    rng = np.random.RandomState(4)
    vocab = [f"tok{i}" for i in range(300)]
    texts = [
        " ".join(vocab[j] for j in rng.randint(0, 300, size=40))
        for _ in range(400)
    ]
    # benchmark = 10 docs; plant their exact 13-gram spans into 25
    # corpus docs
    bench = [
        " ".join(vocab[j] for j in rng.randint(0, 300, size=30))
        for _ in range(10)
    ]
    for i in range(25):
        src = bench[i % 10].split(" ")
        texts[i] = " ".join(
            texts[i].split(" ")[:5] + src[3:16] + texts[i].split(" ")[-5:]
        )
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(5)
    bench_ds = rd.from_arrow(
        pa.table({"text": pa.array(bench, pa.string())})
    ).repartition(2)

    exact_kept = set(decontaminate(ds, bench).to_pandas()["doc_id"])
    bloom_kept = set(
        decontaminate_bloom(ds, bench_ds).to_pandas()["doc_id"]
    )
    # one-sided: bloom keeps a SUBSET of the exact-kept docs
    assert bloom_kept <= exact_kept
    # all 25 planted docs dropped by both
    assert not (set(range(25)) & bloom_kept)
    # false positives bounded (generous: <5% of clean docs)
    assert len(exact_kept - bloom_kept) <= int(0.05 * len(exact_kept)) + 1
