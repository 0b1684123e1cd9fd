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


# ------------------------------------------------- bloom scale path


def benchmark_bloom(
    bench_ds, col: str = "text", k: int = NGRAM,
    bits: int = 1 << 26, hashes: int = 4,
):
    """Bloom bitmap of a benchmark DATASET's k-gram hashes — the scale
    path when the eval side is itself too large for an exact sorted
    gram array (the broadcast fingerprint above is ~8 bytes/gram; the
    bitmap is ``bits/8`` bytes TOTAL — 8 MiB at the 2^26 default —
    regardless of benchmark size). Per-block distinct positions stream
    to a driver OR, same mechanics as `joins.bloom_semi_join`."""
    from .joins import _bloom_positions

    def positions(b: pa.Table) -> pa.Table:
        flat, starts = flat_token_hashes_arrow(b[col])
        grams, _ = shingle_hashes_flat(flat, starts, k=k)
        pos = np.unique(
            _bloom_positions(
                np.unique(grams).astype(np.int64), bits, hashes
            )
        )
        return pa.table({"p": pa.array(pos, pa.int64())})

    words = np.zeros(bits // 64, np.uint64)
    for b in (
        bench_ds.select_columns([col])
        .map_batches(positions, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        p = b["p"].to_numpy(zero_copy_only=False)
        np.bitwise_or.at(
            words, p // 64, np.uint64(1) << (p % 64).astype(np.uint64)
        )
    return words


def decontaminate_bloom(
    ds, bench_ds, col: str = "text", k: int = NGRAM,
    bits: int = 1 << 26, hashes: int = 4,
):
    """Drop corpus docs sharing any k-gram with the benchmark DATASET,
    via the Bloom fingerprint. One-sided error: NO false negatives
    (every truly contaminated doc is dropped — the property that
    matters for decontamination), a small false-positive rate
    (~0.024 at 4 hashes / 8 bits-per-gram) drops a few clean docs —
    the conservative direction. Exactness vs the broadcast path is
    bounded in tests/test_decontaminate.py."""
    import ray

    from .joins import _bloom_positions

    words_ref = ray.put(benchmark_bloom(bench_ds, col, k, bits, hashes))

    class BloomFlagger:
        def __init__(self) -> None:
            from ..state.broadcast import get_broadcast

            self.words = get_broadcast(words_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            flat, starts = flat_token_hashes_arrow(batch[col])
            grams, gdoc = shingle_hashes_flat(flat, starts, k=k)
            clean = np.ones(n, dtype=bool)
            if len(grams):
                pos = _bloom_positions(
                    grams.astype(np.int64), bits, hashes
                )
                hit = (
                    (self.words[pos // 64]
                     >> (pos % 64).astype(np.uint64))
                    & np.uint64(1)
                ).astype(bool).all(axis=1)
                bad = np.unique(gdoc[hit])
                clean[bad] = False
            return batch.filter(pa.array(clean))

    return ds.map_batches(
        BloomFlagger,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
