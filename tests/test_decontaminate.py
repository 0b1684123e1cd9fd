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
