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
from ..stages.segment import segment_naive
from ..stages.stitch import stitch
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
    elif segmenter == "word":
        from ..stages.words import segment_words

        ds = segment_words(ds, concurrency=concurrency)
    else:
        # user-extension surface: registered segmenters (registry.py)
        from ..registry import get_segmenter

        ds = get_segmenter(segmenter)(ds)
    return stitch(ds)


def start_links_builder(links_tbl: pa.Table | None):
    """Kick the driver-side links-broadcast build onto a background
    thread so it overlaps phase 1 (the build needs only the side
    table; ~4s of driver CPU at 4.5M links otherwise lands on the
    serial critical path between stitch and emit). Returns a
    ``join() -> links_ref`` closure that re-raises any build error."""
    import threading

    from ..stages.emit import build_links_ref

    box: dict = {}

    def _build() -> None:
        from ..state.prof import mark

        try:
            mark("links builder: thread started")
            box["ref"] = build_links_ref(links_tbl)
            mark("links builder: broadcast ready")
        except BaseException as e:  # re-raised on join
            box["err"] = e

    t = threading.Thread(target=_build, daemon=True)
    t.start()

    def join():
        t.join()
        if "err" in box:
            raise box["err"]
        return box.get("ref")

    return join


def triples_dataset(
    corpus_ds,
    links_tbl: pa.Table | None = None,
    segmenter: str = "crf",
    verify_sha: bool = True,
    canonicalize: bool = False,
    concurrency=None,
):
    """corpus (+ links side table) -> triple Dataset (pre-materialize).

    Execution shape (latency-aware): ONE execution produces the
    materialized results table (corpus -> ... -> stitch; results are
    ~100x smaller than the corpus, so this is a small-intermediate
    pin, not a full-input materialize). Triple emission is a single
    FUSED stateless pass over results (states + proved_by + intra/extra
    cites with the broadcast links dict) — see stages/emit.py for why.
    Canonicalization adds one more execution over the same results.
    """
    from ..state.prof import mark

    links_join = start_links_builder(links_tbl)
    results = results_dataset(
        corpus_ds,
        segmenter=segmenter,
        verify_sha=verify_sha,
        concurrency=concurrency,
    ).materialize()
    mark("kg: results materialized (read/ingest/tokenize/segment/stitch)")
    return triples_from_materialized_results(
        results, canonicalize=canonicalize, links_ref=links_join()
    )


def triples_from_materialized_results(
    results,
    links_tbl: pa.Table | None = None,
    canonicalize: bool = False,
    links_ref=None,
):
    """Second half of the flagship: (pinned) results -> triples."""
    from ..stages.emit import emit_triples
    from ..state.prof import mark

    triples = emit_triples(results, links_tbl, links_ref=links_ref)
    mark("kg: emit dataset built (links broadcast ready)")
    if canonicalize:
        from ..stages.canonicalize import (
            BandEmitter,
            candidate_pairs,
            canonicalize_triples,
        )

        bands = results.map_batches(
            BandEmitter(), batch_format="pyarrow", batch_size=1024
        )
        # pin_bands=False: bands derive from the PINNED results table —
        # re-running the vectorized emitter per pass costs seconds,
        # materializing ~11 band rows/result cost a 10.7GB plasma pin
        # at the 2.2M-doc stress point. The band-row count is known
        # a priori (NUM_BANDS per result; proofs excluded makes this
        # an overestimate, which only biases the hot-prefilter plan
        # gate toward the spool path), so the prefilter skips its
        # whole count pass — one fewer full emitter execution.
        from ..stages.canonicalize import NUM_BANDS

        edges = candidate_pairs(
            bands,
            pin_bands=False,
            n_rows_hint=results.count() * NUM_BANDS,
        )
        triples = canonicalize_triples(triples, edges)
        mark("kg: canonicalize_triples returned")
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
    results_checkpoint: str | None = None,
    near_dedup: bool = False,
):
    """End-to-end: corpus parquet -> materialized triple store.

    ``results_checkpoint``: directory for the mid-pipeline results
    checkpoint (per-partition manifests + lineage). A restarted run
    whose checkpoint is complete SKIPS ingest/tokenize/segment/stitch
    entirely and resumes at linking/canonicalization — the north-rule
    mid-pipeline resume. A partially complete checkpoint re-runs the
    front half but only writes pending partitions.

    ``near_dedup``: also write the ``_near/`` MinHash-signature
    sidecar for the base corpus, so later
    ``run_kg_delta(..., near_dedup=True)`` runs screen against real
    history instead of silently matching nothing (pipelines/delta.py).

    Returns the (part, rows) summary Dataset from the sink."""
    from ..sources.sinks import (
        detect_skewed_repos_from_results,
        materialize_triples,
    )
    from ..state.checkpoint import (
        checkpoint_complete,
        checkpoint_dataset,
        read_checkpoint,
        validate_checkpoint_lineage,
    )

    ckpt_parts = 32
    # the lineage id covers everything that determines the checkpoint's
    # content: resuming the same dir with a different corpus or
    # segmenter raises instead of silently serving stale results
    lineage_id = f"{corpus_path}|segmenter={segmenter}"
    if results_checkpoint:
        validate_checkpoint_lineage(results_checkpoint, "results", lineage_id)
    from ..state.prof import mark

    links_join = start_links_builder(links_tbl)
    if (
        results_checkpoint
        and resume
        and checkpoint_complete(results_checkpoint, ckpt_parts)
    ):
        results = read_checkpoint(results_checkpoint).materialize()
    else:
        corpus = read_corpus(corpus_path)
        results = results_dataset(corpus, segmenter=segmenter).materialize()
        mark("kg: results materialized")
        if results_checkpoint:
            checkpoint_dataset(
                results,
                results_checkpoint,
                key_col="doc_id",
                num_partitions=ckpt_parts,
                resume=resume,
                stage="results",
                lineage=lineage_id,
            )
    # skew pre-pass on the pinned results (one tiny groupby) — sampling
    # the lazy triples would re-execute emit+rewrite end-to-end. It
    # only reads the pinned results, so it OVERLAPS the serial
    # canonicalization tail (links broadcast build, driver CC) in a
    # thread instead of adding its seconds after it; Ray Data jobs on
    # separate datasets run concurrently from separate driver threads.
    salt_box: dict = {}
    skew_thread = None
    if auto_salt:
        import threading

        def _skew() -> None:
            try:
                salt_box["salt"] = detect_skewed_repos_from_results(
                    results, num_partitions
                )
            except BaseException as e:  # re-raised on join
                salt_box["err"] = e

        skew_thread = threading.Thread(target=_skew, daemon=True)
        skew_thread.start()
    triples = triples_from_materialized_results(
        results, canonicalize=canonicalize, links_ref=links_join()
    )
    if skew_thread is not None:
        skew_thread.join()
        if "err" in salt_box:
            raise salt_box["err"]
    salt = salt_box.get("salt")
    mark("kg: skew pre-pass joined")
    summary = materialize_triples(
        triples,
        out_dir,
        num_partitions=num_partitions,
        resume=resume,
        salt_repos=salt,
        lineage=results_checkpoint or corpus_path,
    )
    if near_dedup:
        from .delta import near_signatures, record_near_signatures

        if near_signatures(out_dir) is None:
            from ..stages.ingest import ingest

            record_near_signatures(
                ingest(read_corpus(corpus_path), verify=False), out_dir
            )
            mark("kg: near-dup signature sidecar written")
    return summary
