"""Incremental (delta) ingest: append NEW documents to an existing
triple store without reprocessing the corpus.

The reference re-registers papers one at a time and its SQLite layer
skips already-extracted ones (reference: Styling/src/cli.py:25-60 +
the get_xml/features caches); at 100 TB "skip what's done" must be a
set operation, not a per-row lookup. LSM-style design:

- the store keeps a ``_processed/`` sidecar — (doc_id, content_sha256)
  parquet appended per ingest run (tiny: two strings per document);
- delta selection is a Bloom-prefiltered ANTI join of the new corpus'
  ID columns against the sidecar (`stages/joins.py:bloom_semi_join` —
  definite non-members stream straight through; only hash-collision
  maybes pay the exact verify shuffle). Only repo/path/commit/sha
  columns are read for selection — content is read ONCE, for the
  selected delta;
- the delta's triples materialize into ``store/delta_NNN/`` as an
  independent segment with the SAME partition function (count + salt
  from ``_store_meta.json``), so point lookups stay O(segments) and
  ``read_triples`` is the union of segments. ``repartition_store``
  (sources/sinks.py) is the compaction that folds segments together;
- documents whose doc_id exists with a DIFFERENT sha are counted and
  reported (``n_changed``) but not reprocessed — the store is
  append-only; recompact after a corpus rewrite.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

PROCESSED_DIR = "_processed"


def _id_batch(b: pa.Table) -> pa.Table:
    """(repo, path, commit[, sha]) -> (doc_id, content_sha256) — the
    exact doc_id construction of stages/ingest.py:22-31."""
    doc_id = pc.binary_join_element_wise(b["repo"], b["path"], "/")
    doc_id = pc.binary_join_element_wise(doc_id, b["commit"], "@")
    cols = {"doc_id": doc_id}
    if "content_sha256" in b.column_names:
        cols["content_sha256"] = b["content_sha256"]
    return pa.table(cols)


def processed_ids(store_dir: str):
    """Dataset(doc_id, content_sha256) of everything already ingested,
    or None when the sidecar is empty/absent."""
    import ray.data as rd

    files = sorted(
        glob.glob(os.path.join(store_dir, PROCESSED_DIR, "*", "*.parquet"))
    )
    if not files:
        return None
    return rd.read_parquet(files)


def record_processed(corpus_ds, store_dir: str) -> str:
    """Append this corpus' (doc_id, sha) rows to the sidecar; returns
    the run subdirectory. Runs are numbered so a crashed run that
    never recorded stays invisible (its docs simply re-select next
    time — ingest is idempotent per segment)."""
    base = os.path.join(store_dir, PROCESSED_DIR)
    os.makedirs(base, exist_ok=True)
    n = len([d for d in os.listdir(base) if d.startswith("run_")])
    run_dir = os.path.join(base, f"run_{n:04d}")
    corpus_ds.map_batches(_id_batch, batch_format="pyarrow").write_parquet(
        run_dir
    )
    return run_dir


def select_delta(corpus_path: str, store_dir: str):
    """-> (delta corpus Dataset (full columns, new doc_ids only),
    stats dict). Selection touches only the ID columns."""
    import ray.data as rd

    from ..sources.corpus import read_corpus
    from ..stages.joins import bloom_semi_join, hash_join

    ids = rd.read_parquet(
        corpus_path, columns=["repo", "path", "commit", "content_sha256"]
    ).map_batches(_id_batch, batch_format="pyarrow")
    seen = processed_ids(store_dir)
    full = read_corpus(corpus_path)
    n_total = ids.count()
    if seen is None:
        return full, {
            "n_total": n_total,
            "n_new": n_total,
            "n_changed": 0,
        }
    new_ids = bloom_semi_join(
        ids.select_columns(["doc_id"]),
        seen.select_columns(["doc_id"]),
        on="doc_id",
        how="anti",
    ).materialize()
    n_new = new_ids.count()
    # changed = same doc_id, different sha (reported, not reprocessed)
    n_changed = (
        hash_join(
            ids,
            seen.map_batches(
                lambda b: b.rename_columns(
                    ["doc_id", "sha_seen"]
                ),
                batch_format="pyarrow",
            ),
            on=["doc_id"],
            how="inner",
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "c": pa.array(
                        [
                            pc.sum(
                                pc.cast(
                                    pc.not_equal(
                                        b["content_sha256"], b["sha_seen"]
                                    ),
                                    pa.int64(),
                                )
                            ).as_py()
                            or 0
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .sum("c")
    )
    # re-derive doc_id on the full corpus and semi-join against the
    # selected new ids (the new-id set IS the delta, small by
    # construction; a full-history backfill would use bloom again)
    from ..stages.ingest import ingest

    if n_new == 0:
        # an empty Dataset confuses the Acero join's schema resolution
        delta = ingest(full, verify=False).limit(0)
    else:
        delta = bloom_semi_join(
            ingest(full, verify=False),
            new_ids,
            on="doc_id",
            how="semi",
        )
    return delta, {
        "n_total": n_total,
        "n_new": n_new,
        "n_changed": int(n_changed or 0),
    }


def run_kg_delta(
    corpus_path: str,
    store_dir: str,
    links_tbl: pa.Table | None = None,
    segmenter: str = "crf",
    canonicalize: bool = True,
) -> dict:
    """Append the corpus' NEW documents to an existing store as a
    ``delta_NNN`` segment; returns the stats dict + segment summary."""
    from ..sources.sinks import materialize_triples
    from ..state.prof import mark
    from .kg import triples_dataset

    meta_path = os.path.join(store_dir, "_store_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)

    delta, stats = select_delta(corpus_path, store_dir)
    if stats["n_new"] == 0:
        return {**stats, "segment": None, "rows": 0}
    mark(f"delta: selected {stats['n_new']} new docs")

    n_seg = len(
        [d for d in os.listdir(store_dir) if d.startswith("delta_")]
    )
    seg_dir = os.path.join(store_dir, f"delta_{n_seg:03d}")
    triples = triples_dataset(
        delta,
        links_tbl=links_tbl,
        segmenter=segmenter,
        verify_sha=False,  # ingest already ran during selection
        canonicalize=canonicalize,
    )
    summary = materialize_triples(
        triples,
        seg_dir,
        num_partitions=int(meta["num_partitions"]),
        salt_repos=meta.get("salt_repos") or {},
        resume=False,
        lineage=f"{corpus_path}|delta of {store_dir}",
    )
    rows = sum(r["rows"] for r in summary.take_all())
    record_processed(delta, store_dir)
    return {**stats, "segment": seg_dir, "rows": int(rows)}
