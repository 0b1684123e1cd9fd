"""The canonical LLM training-corpus build — the curation operators
composed into one pipeline:

    read documents
      -> quality filter        (Arrow-kernel heuristics)      [mb]
      -> language filter       (declared lang or langid)      [mb]
      -> exact dedup           (coarse content-hash exchange)  [shuffle]
      -> near dedup            (MinHash-LSH -> CC -> drop)     [shuffle]
      -> decontaminate         (broadcast benchmark 13-grams)  [mb]
      -> PII redaction         (RE2 scrub, zero shuffle)       [mb]
      -> mixture resample      (per-lang quotas, partial prune)[shuffle]
      -> chunk                 (overlapping token windows)     [mb]
      -> shard + export        (hash shard, rank-ordered)      [write]

Each stage is one of the tested standalone operators (stages/*);
this module only composes them, so correctness is inherited. The
`corpus_build` queries() entry returns the per-stage row report —
the artifact a data-engineering run is judged by.

Scale notes: stage boundaries are materialized ONLY when
``report=True`` (counting requires execution); with ``report=False``
the whole chain streams with exactly the exchanges the individual
operators declare. The export shard is a pure hash function of the
chunk key, so the final write needs no extra shuffle beyond parquet
partitioning; within a shard consumers order by the included ``rank``
column (the same Knuth order `shuffle_shards` proves out with its
SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: deterministic chunk key: doc_id * CHUNK_STRIDE + chunk_id
CHUNK_KEY_STRIDE = 1 << 20


def run_corpus_build(
    docs_path: str,
    out_dir: str | None = None,
    quality_min: float = 0.2,
    langs: list[str] | None = None,
    quotas: dict | None = None,
    bench_texts: list[str] | None = None,
    window: int = 64,
    stride: int = 48,
    num_shards: int = 16,
    report: bool = True,
) -> pd.DataFrame:
    """-> DataFrame(stage, rows) build report (and, if ``out_dir``,
    the exported shard store on disk)."""
    import ray.data as rd

    from ..stages.chunk import chunk_documents
    from ..stages.dedup import exact_dedup, minhash_dedup
    from ..stages.decontaminate import decontaminate
    from ..stages.redact import redact
    from ..stages.sampling import mixture_sample
    from ..stages.textstats import quality_batch

    rows: list[tuple[str, int]] = []

    def checkpoint(name: str, ds):
        if report:
            ds = ds.materialize()
            rows.append((name, ds.count()))
        return ds

    from ..stages.joins import strip_schema_metadata

    # strip pandas parquet metadata up front: a schema WITH metadata is
    # unhashable, knocking every exchange off Ray's schema-dedup fast
    # path (see BASELINE.md scale lessons)
    ds = strip_schema_metadata(
        rd.read_parquet(
            docs_path, columns=["doc_id", "text", "lang", "source"]
        )
    )
    ds = checkpoint("raw", ds)

    # ---- quality filter (keep original columns; score is transient)
    def qfilter(b: pa.Table) -> pa.Table:
        q = quality_batch(b.select(["text"]))["quality_score"]
        return b.filter(pc.greater_equal(q, quality_min))

    ds = checkpoint(
        "quality", ds.map_batches(qfilter, batch_format="pyarrow")
    )

    if langs:
        lang_arr = pa.array(langs, pa.string())
        ds = checkpoint(
            "language",
            ds.map_batches(
                lambda b: b.filter(
                    pc.is_in(b["lang"], value_set=lang_arr)
                ),
                batch_format="pyarrow",
            ),
        )

    ds = checkpoint("exact_dedup", exact_dedup(ds))
    ds = checkpoint("near_dedup", minhash_dedup(ds))

    if bench_texts:
        ds = checkpoint("decontaminate", decontaminate(ds, bench_texts))

    # redact drops the original text column in favor of `redacted` —
    # rename it back so downstream stages stay text-keyed
    ds = checkpoint(
        "redact",
        redact(ds).map_batches(
            lambda b: b.rename_columns(
                [
                    "text" if c == "redacted" else c
                    for c in b.column_names
                ]
            ),
            batch_format="pyarrow",
        ),
    )

    if quotas:
        ds = checkpoint(
            "mixture", mixture_sample(ds, "lang", "doc_id", quotas)
        )

    chunks = chunk_documents(
        ds.select_columns(["doc_id", "text"]), window=window, stride=stride
    )
    chunks = checkpoint("chunk", chunks)

    # ---- shard assignment: pure hash of the chunk key (no exchange).
    # splitmix64, not bare Knuth-mod: a multiplicative hash's low bits
    # are ~the identity, so `% num_shards` on them is not a shuffle.
    def shard(b: pa.Table) -> pa.Table:
        from ..functions.hashing import splitmix64

        key = (
            b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            * CHUNK_KEY_STRIDE
            + b["chunk_id"].to_numpy(zero_copy_only=False)
        )
        rank = splitmix64(key.astype(np.uint64))
        return b.append_column(
            "shard",
            pa.array(
                (rank % np.uint64(num_shards)).astype(np.int64), pa.int64()
            ),
        ).append_column(
            "rank",
            pa.array((rank >> np.uint64(1)).astype(np.int64), pa.int64()),
        )

    sharded = chunks.map_batches(shard, batch_format="pyarrow")
    if out_dir:
        sharded.write_parquet(out_dir, partition_cols=["shard"])
        if report:
            rows.append(("exported", rows[-1][1]))
    elif report:
        rows.append(("exported", sharded.count()))
    return pd.DataFrame(rows, columns=["stage", "rows"])
