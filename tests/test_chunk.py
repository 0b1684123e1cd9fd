"""Document chunking (stages/chunk.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.chunk import chunk_documents


def _ds(texts, blocks=3):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)


def _reference(texts, w, s):
    out = []
    for did, t in enumerate(texts):
        toks = t.split(" ")
        start = 0
        cid = 0
        while True:
            piece = toks[start : start + w]
            out.append((did, cid, len(piece), " ".join(piece)))
            cid += 1
            start += s
            if start >= len(toks):
                break
    return sorted(out)


def test_matches_reference_various_lengths():
    rng = np.random.RandomState(2)
    texts = [
        " ".join(f"w{rng.randint(100)}" for _ in range(n))
        for n in [1, 3, 7, 8, 9, 25, 100]
    ]
    got = chunk_documents(_ds(texts), window=8, stride=5).to_pandas()
    got_t = sorted(
        map(
            tuple,
            got[["doc_id", "chunk_id", "n_tokens", "chunk"]].itertuples(
                False
            ),
        )
    )
    assert got_t == _reference(texts, 8, 5)


def test_overlap_reconstruction():
    # consecutive chunks overlap by window - stride tokens exactly
    text = " ".join(str(i) for i in range(20))
    got = (
        chunk_documents(_ds([text], blocks=1), window=8, stride=5)
        .to_pandas()
        .sort_values("chunk_id")
    )
    chunks = [c.split(" ") for c in got["chunk"]]
    for a, b in zip(chunks, chunks[1:]):
        assert a[5:] == b[: len(a) - 5]
    # union of strided prefixes reconstructs the doc
    recon = chunks[0] + [t for c in chunks[1:] for t in c[3:]]
    assert recon == text.split(" ")


def test_empty_and_single_token_docs():
    got = chunk_documents(
        _ds(["", "one"], blocks=1), window=4, stride=2
    ).to_pandas()
    # '' splits to [''] — one chunk of one (empty) token
    assert len(got) == 2
    assert (got["chunk_id"] == 0).all()
    assert list(got.sort_values("doc_id")["chunk"]) == ["", "one"]
