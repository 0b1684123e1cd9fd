"""The flagship KG-construction pipeline (SURVEY.md §3.3 restatement).

    read corpus parquet
      -> ingest         (doc_id + content_sha256 invariant)     [mb]
      -> tokenize       (lines list column)                     [mb]
      -> segment        (CRF actor pool | naive vectorized)     [mb / mb-actor]
      -> stitch         (spans -> result rows)                  [mb]
      -> triples        = states/proved_by  ∪  intra-cites  ∪
                          extra-cites (broadcast citation join)
      -> canonicalize   (LSH bands -> groupby buckets -> CC)    [shuffle]
      -> materialize    (sorted repo-hash partitions+manifests) [shuffle]

Only two all-to-all exchanges exist (LSH bucket groupby and the final
partition-sort); segmentation/stitching are shuffle-free because
document == row (SURVEY.md §7.4).
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.corpus import read_corpus
from ..stages.ingest import ingest
from ..stages.link import resolve_citations
from ..stages.mentions import extract_mentions, intra_cites_batch
from ..stages.segment import segment_naive
from ..stages.stitch import stitch, triples_from_results
from ..stages.tokenize import tokenize


def results_dataset(
    corpus_ds,
    segmenter: str = "crf",
    verify_sha: bool = True,
    concurrency=None,
):
    """corpus -> result rows (the KG node candidates)."""
    ds = ingest(corpus_ds, verify=verify_sha)
    ds = tokenize(ds)
    ds = ds.drop_columns(["content"])  # lines column supersedes content
    if segmenter == "naive":
        ds = segment_naive(ds)
    elif segmenter == "crf":
        from ..stages.crf import segment_crf

        ds = segment_crf(ds, concurrency=concurrency)
    else:
        raise ValueError(f"unknown segmenter {segmenter!r}")
    return stitch(ds)


def triples_dataset(
    corpus_ds,
    links_tbl: pa.Table | None = None,
    segmenter: str = "crf",
    verify_sha: bool = True,
    canonicalize: bool = False,
    concurrency=None,
):
    """corpus (+ links side table) -> triple Dataset (pre-materialize)."""
    results = results_dataset(
        corpus_ds,
        segmenter=segmenter,
        verify_sha=verify_sha,
        concurrency=concurrency,
    )
    # results is consumed by 3+ branches (base triples, mentions, LSH
    # bands); without pinning, each branch would RE-RUN the whole
    # corpus->tokenize->segment chain. The results table is ~100x
    # smaller than the corpus (one row per extracted span), so this is
    # the correct small-intermediate materialize, not a full-input one.
    results = results.materialize()
    base = triples_from_results(results)
    mentions = extract_mentions(results).materialize()  # used 2x
    intra = mentions.map_batches(intra_cites_batch, batch_format="pyarrow")
    triples = base.union(intra)
    if links_tbl is not None and links_tbl.num_rows > 0:
        extra = resolve_citations(mentions, links_tbl)
        triples = triples.union(extra)
    if canonicalize:
        from ..stages.canonicalize import (
            BandEmitter,
            candidate_pairs,
            canonical_map,
            rewrite_triples,
        )

        bands = results.map_batches(
            BandEmitter, batch_format="pyarrow", batch_size=1024,
            concurrency=(1, 4),
        )
        edges = candidate_pairs(bands)
        canon = canonical_map(edges)
        triples = rewrite_triples(triples, canon)
    return triples


def run_kg(
    corpus_path: str,
    out_dir: str,
    links_tbl: pa.Table | None = None,
    segmenter: str = "crf",
    canonicalize: bool = True,
    num_partitions: int = 32,
    resume: bool = True,
    auto_salt: bool = True,
):
    """End-to-end: corpus parquet -> materialized triple store.

    Returns the (part, rows) summary Dataset from the sink."""
    from ..sources.sinks import materialize_triples

    corpus = read_corpus(corpus_path)
    triples = triples_dataset(
        corpus, links_tbl=links_tbl, segmenter=segmenter,
        canonicalize=canonicalize,
    )
    return materialize_triples(
        triples,
        out_dir,
        num_partitions=num_partitions,
        resume=resume,
        auto_salt=auto_salt,
    )
