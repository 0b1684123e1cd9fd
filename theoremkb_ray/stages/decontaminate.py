"""Benchmark decontamination: drop training documents that overlap an
evaluation set (the GPT-3-appendix-style 13-gram filter).

Not in the reference (its corpus is papers, not training data) — this
is part of the training-data operator family this engine adds by
design (SURVEY.md §2.7 / instructions "beyond the reference").

Physical plan: the BENCHMARK side is small by definition (an eval
set), so its token-k-gram hash set is built once, sorted, and
broadcast (``ray.put``); the corpus side streams through
``map_batches`` doing one flat shingle pass (the same vectorized
kernels as the LSH sketches) + one ``searchsorted`` membership test
per batch. No shuffle, no join — contamination checking is
embarrassingly parallel once the benchmark set is broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    flat_token_hashes_arrow,
    shingle_hashes_flat,
)

NGRAM = 13  # the canonical decontamination n-gram length


def benchmark_grams(texts, k: int = NGRAM) -> np.ndarray:
    """Sorted unique k-gram hashes of the benchmark texts (the
    broadcastable contamination fingerprint)."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), pa.string())
    flat, starts = flat_token_hashes_arrow(texts)
    grams, _ = shingle_hashes_flat(flat, starts, k=k)
    return np.unique(grams)


class ContaminationFlagger:
    """Actor-pool batch fn: appends ``contaminated`` (bool) and
    ``overlap_grams`` (int64) columns. The benchmark gram set is
    fetched once per actor in ``__init__``."""

    def __init__(self, grams_ref, col: str = "text", k: int = NGRAM) -> None:
        import ray

        self.grams = ray.get(grams_ref)  # sorted uint64
        self.col, self.k = col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, starts = flat_token_hashes_arrow(batch[self.col])
        grams, gdoc = shingle_hashes_flat(flat, starts, k=self.k)
        overlap = np.zeros(n, dtype=np.int64)
        if len(grams) and len(self.grams):
            pos = np.searchsorted(self.grams, grams)
            pos[pos >= len(self.grams)] = len(self.grams) - 1
            hit = self.grams[pos] == grams
            np.add.at(overlap, gdoc[hit], 1)
        return batch.append_column(
            "contaminated", pa.array(overlap > 0)
        ).append_column("overlap_grams", pa.array(overlap, pa.int64()))


def flag_contaminated(ds, bench_texts, col: str = "text", k: int = NGRAM):
    """Append contamination columns; benchmark set broadcast once."""
    import ray

    grams = benchmark_grams(bench_texts, k=k)
    ref = ray.put(grams)
    return ds.map_batches(
        ContaminationFlagger,
        fn_constructor_kwargs={"grams_ref": ref, "col": col, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )


def decontaminate(ds, bench_texts, col: str = "text", k: int = NGRAM):
    """Drop contaminated docs; returns the clean Dataset (original
    columns only)."""
    flagged = flag_contaminated(ds, bench_texts, col=col, k=k)
    return flagged.map_batches(
        lambda b: b.filter(pc.invert(b["contaminated"])).drop_columns(
            ["contaminated", "overlap_grams"]
        ),
        batch_format="pyarrow",
    )
