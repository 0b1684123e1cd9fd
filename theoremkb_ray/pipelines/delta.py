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
    near_dedup: bool = False,
) -> dict:
    """Append the corpus' NEW documents to an existing store as a
    ``delta_NNN`` segment; returns the stats dict + segment summary.
    With ``near_dedup=True`` the delta is additionally screened
    against the store's ``_near/`` signature history (rewrites of old
    documents under new ids are dropped, counted as ``n_near_dup``)
    and the kept docs' signatures are appended to that history."""
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
    kept_sig = None
    delta_all = delta  # full selection — near-dup REJECTS are still
    # recorded as processed (the screen is deterministic; re-screening
    # them every future run would be pure waste)
    if near_dedup:
        delta, nd_stats, kept_sig = near_dup_filter(delta, store_dir)
        stats = {**stats, **nd_stats}
        if stats["n_near_dup"]:
            delta = delta.materialize()
            if delta.count() == 0:
                record_processed(delta_all, store_dir)
                _write_near_run(kept_sig, store_dir)
                return {**stats, "segment": None, "rows": 0}
        mark(f"delta: {stats['n_near_dup']} near-dups screened out")

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
    record_processed(delta_all, store_dir)
    if near_dedup and kept_sig is not None:
        _write_near_run(kept_sig, store_dir)
    return {**stats, "segment": seg_dir, "rows": int(rows)}


# --------------------------------------------------------------------
# Near-duplicate-aware incremental ingest
#
# The exact-ID anti join above only skips documents the store has SEEN;
# a continuously built corpus also receives REWRITES of old documents
# under new ids (mirrors, forks, re-crawls). The store holds triples,
# not raw text, so cross-ingest near-dedup keeps a tiny signature
# sidecar (``_near/``: 64-perm MinHash signature + 16 LSH band keys per
# document, ~0.6 KB/doc) written at ingest time; a delta is then
# screened with one banded semi-join against history plus a
# signature-overlap verify — the standard sketch-only estimate
# (matching-slot fraction ~ Jaccard) since the originals are gone.
# Everything is distributed: band blocking and the two signature
# fetches are hash joins, candidate volume is pair-bounded by LSH.

NEAR_DIR = "_near"
NEAR_PERMS = 64
NEAR_BANDS = 16
NEAR_SHINGLE_K = 3
#: minimum matching signature slots (of NEAR_PERMS) to call a near-dup
#: — 32/64 estimates Jaccard >= 0.5
NEAR_MIN_MATCH = 32
#: band keys seen in more than this many HISTORY docs are boilerplate
#: (degenerate/templated content) and are dropped from the blocking
#: join on both sides — without the cap a hot band makes the semi-join
#: emit |new| x |old| rows per band, the unbounded-fan-out class the
#: in-corpus path already caps (stages/dedup.py _pairs_from_coarse)
NEAR_HOT_BAND_CAP = 256


class NearSigEmitter:
    """doc rows -> one row per doc: (doc_id, sig fixed_list<uint64>[P],
    bands fixed_list<uint64>[B]). Same seeded kernels as the in-corpus
    minhash dedup (stages/dedup.py:MinHashBandEmitter), so signatures
    written by any run compare bit-for-bit with any other."""

    def __init__(self, col: str = "content", id_col: str = "doc_id") -> None:
        self.col, self.id_col = col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.hashing import (
            band_hashes,
            flat_token_hashes_arrow,
            minhash_signatures_flat,
            shingle_hashes_flat,
        )

        n = batch.num_rows
        flat, starts = flat_token_hashes_arrow(batch[self.col])
        fs, fd = shingle_hashes_flat(flat, starts, k=NEAR_SHINGLE_K)
        sigs = minhash_signatures_flat(fs, fd, n, NEAR_PERMS)
        bands = band_hashes(sigs, NEAR_BANDS)
        return pa.table(
            {
                "doc_id": pc.cast(batch[self.id_col], pa.string()),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.uint64()), NEAR_PERMS
                ),
                "bands": pa.FixedSizeListArray.from_arrays(
                    pa.array(bands.reshape(-1), pa.uint64()), NEAR_BANDS
                ),
            }
        )


def near_signatures(store_dir: str):
    """Dataset over the ``_near/`` sidecar, or None when absent."""
    import ray.data as rd

    files = sorted(
        glob.glob(os.path.join(store_dir, NEAR_DIR, "*", "*.parquet"))
    )
    if not files:
        return None
    return rd.read_parquet(files)


def _write_near_run(sig_ds, store_dir: str) -> str:
    base = os.path.join(store_dir, NEAR_DIR)
    os.makedirs(base, exist_ok=True)
    n = len([d for d in os.listdir(base) if d.startswith("run_")])
    run_dir = os.path.join(base, f"run_{n:04d}")
    sig_ds.write_parquet(run_dir)
    return run_dir


def record_near_signatures(corpus_ds, store_dir: str) -> str:
    """Append (doc_id, sig, bands) rows for this corpus to the
    sidecar; same run-numbering contract as :func:`record_processed`."""
    return _write_near_run(
        corpus_ds.map_batches(NearSigEmitter(), batch_format="pyarrow"),
        store_dir,
    )


def _explode_bands(id_col: str):
    def fn(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        bk = pc.list_flatten(b["bands"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, NEAR_BANDS), pa.string()),
                # band_hashes is already salted by band index, so the
                # hash alone is the blocking key
                "bk": pa.array(bk.astype(np.int64), pa.int64()),
            }
        )

    return fn


def _drop_sentinel_sigs(b: pa.Table) -> pa.Table:
    """Exempt zero-shingle docs from the near-dup screen: a doc with
    fewer than NEAR_SHINGLE_K tokens has NO shingles, so
    minhash_signatures_flat fills its signature with the all-ones
    sentinel (functions/hashing.py) — every such doc would band-collide
    with and 64/64-"verify" against every other short doc, permanently
    excluding non-duplicates from the store. A sentinel slot only
    arises when a slot saw no shingle hashes, so slot 0 == 2^64-1
    identifies exactly the no-shingle rows."""
    import numpy as np

    first = pc.list_element(b["sig"], 0).to_numpy(zero_copy_only=False)
    return b.filter(pa.array(first != np.uint64(0xFFFFFFFFFFFFFFFF)))


def near_dup_filter(delta_ds, store_dir: str):
    """Screen a selected delta against the store's signature history.

    -> (kept Dataset, stats dict, new-signature Dataset of the KEPT
    docs — pass it to :func:`record_near_signatures` after a
    successful ingest so history stays consistent with the store).

    Zero-shingle (< NEAR_SHINGLE_K tokens) docs are exempt from the
    screen on BOTH sides (their sentinel signatures would otherwise
    match any short doc); exact rewrites of them are still caught by
    the exact-ID anti join upstream."""
    import logging

    import numpy as np

    from ..stages.joins import hash_join

    seen = near_signatures(store_dir)
    new_sig = delta_ds.map_batches(
        NearSigEmitter(), batch_format="pyarrow"
    ).materialize()
    if seen is None:
        if processed_ids(store_dir) is not None:
            logging.getLogger(__name__).warning(
                "near_dedup=True but store %r has no %s/ signature "
                "history — the screen matches against NOTHING, so "
                "rewrites of base-corpus docs pass unscreened. Build "
                "the sidecar with record_near_signatures() over the "
                "base corpus (run_kg writes it when near_dedup is "
                "enabled).",
                store_dir,
                NEAR_DIR,
            )
        return delta_ds, {"n_near_dup": 0}, new_sig
    if new_sig.count() == 0:
        return delta_ds, {"n_near_dup": 0}, new_sig

    log = logging.getLogger(__name__)
    new_bands = new_sig.map_batches(
        _drop_sentinel_sigs, batch_format="pyarrow"
    ).map_batches(_explode_bands("nid"), batch_format="pyarrow")
    old_bands = seen.map_batches(
        _drop_sentinel_sigs, batch_format="pyarrow"
    ).map_batches(_explode_bands("oid"), batch_format="pyarrow")
    from ray.data.aggregate import Count

    # hot-band cap: drop boilerplate band keys (history frequency >
    # NEAR_HOT_BAND_CAP) from BOTH sides before the join. The hot-key
    # set is tiny by construction (each hot key represents >cap docs),
    # so the broadcast sorted-array filter is bounded. counts is the
    # per-distinct-key aggregate (NOT the band rows) — materializing
    # it also tells us, for free, whether either join side would be
    # EMPTY, which must short-circuit (empty Dataset sides break
    # Acero's schema resolution — the documented raypatch contract).
    counts = (
        old_bands.groupby("bk")
        .aggregate(Count(alias_name="c"))
        .materialize()
    )
    n_keys = counts.count()
    if n_keys == 0:  # history is all zero-shingle docs
        return delta_ds, {"n_near_dup": 0}, new_sig
    hot = counts.map_batches(
        lambda b: b.filter(
            pc.greater(b["c"], NEAR_HOT_BAND_CAP)
        ).select(["bk"]),
        batch_format="pyarrow",
    ).to_pandas()
    if len(hot):
        log.warning(
            "near_dup_filter: dropping %d boilerplate band keys with "
            "history frequency > %d from the blocking join",
            len(hot),
            NEAR_HOT_BAND_CAP,
        )
        if len(hot) == n_keys:  # the whole history is boilerplate
            return delta_ds, {"n_near_dup": 0}, new_sig
        import ray

        hot_ref = ray.put(np.sort(hot["bk"].to_numpy()))

        def drop_hot(b: pa.Table) -> pa.Table:
            hs = ray.get(hot_ref)
            bk = b["bk"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(hs, bk), 0, len(hs) - 1)
            return b.filter(pa.array(hs[pos] != bk))

        new_bands = new_bands.map_batches(drop_hot, batch_format="pyarrow")
        old_bands = old_bands.map_batches(drop_hot, batch_format="pyarrow")

    new_bands = new_bands.materialize()  # delta-bounded: 16 ints/doc
    if new_bands.count() == 0:  # all-new-short (or all-hot) delta
        return delta_ds, {"n_near_dup": 0}, new_sig

    pairs = (
        hash_join(new_bands, old_bands, on=["bk"], how="inner")
        .groupby(["nid", "oid"])
        .aggregate(Count(alias_name="nb"))
        .materialize()
    )
    if pairs.count() == 0:
        return delta_ds, {"n_near_dup": 0}, new_sig

    def rename_sig(col: str):
        # Acero hash joins reject fixed_size_list payload columns —
        # carry the signature as one little-endian binary blob instead
        def fn(b: pa.Table) -> pa.Table:
            import numpy as np

            n = b.num_rows
            arr = (
                pc.list_flatten(b["sig"])
                .to_numpy(zero_copy_only=False)
                .astype("<u8")
            )
            offsets = pa.array(
                (np.arange(n + 1, dtype=np.int32) * (NEAR_PERMS * 8)),
                pa.int32(),
            )
            blob = pa.Array.from_buffers(
                pa.binary(),
                n,
                [None, offsets.buffers()[1], pa.py_buffer(arr.tobytes())],
            )
            return pa.table({col: b["doc_id"], f"sig_{col}": blob})

        return fn

    with_old = hash_join(
        pairs.map_batches(
            lambda b: b.select(["nid", "oid"]), batch_format="pyarrow"
        ),
        seen.map_batches(rename_sig("oid"), batch_format="pyarrow"),
        on=["oid"],
        how="inner",
    )
    with_both = hash_join(
        with_old,
        new_sig.map_batches(rename_sig("nid"), batch_format="pyarrow"),
        on=["nid"],
        how="inner",
    )

    def verify(b: pa.Table) -> pa.Table:
        import numpy as np

        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.string())})
        sa = np.frombuffer(
            b"".join(b["sig_nid"].to_pylist()), dtype="<u8"
        ).reshape(-1, NEAR_PERMS)
        sb = np.frombuffer(
            b"".join(b["sig_oid"].to_pylist()), dtype="<u8"
        ).reshape(-1, NEAR_PERMS)
        m = (sa == sb).sum(axis=1)
        hit = m >= NEAR_MIN_MATCH
        ids = b["nid"].to_numpy(zero_copy_only=False)[hit]
        return pa.table({"doc_id": pa.array(np.unique(ids), pa.string())})

    dup_df = (
        with_both.map_batches(verify, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates("doc_id")
    )
    n_near = len(dup_df)
    if n_near == 0:
        return delta_ds, {"n_near_dup": 0}, new_sig
    # anti-filter by a broadcast SORTED-HASH array (the emit.py links
    # pattern): the dup set is delta-bounded, 8 bytes/doc; a shuffle
    # anti-join would also drag the fixed_size_list signature payload
    # through Acero, which rejects it as a non-key field
    import ray

    from ..functions.hashing import hash_strings

    h = np.sort(
        hash_strings(dup_df["doc_id"].to_numpy().astype("U"))
    )
    ref = ray.put(h)

    def drop_dups(b: pa.Table) -> pa.Table:
        hs = ray.get(ref)
        hh = hash_strings(
            pc.cast(b["doc_id"], pa.string())
            .to_numpy(zero_copy_only=False)
            .astype("U")
        )
        pos = np.clip(np.searchsorted(hs, hh), 0, len(hs) - 1)
        return b.filter(pa.array(hs[pos] != hh))

    kept = delta_ds.map_batches(drop_dups, batch_format="pyarrow")
    kept_sig = new_sig.map_batches(drop_dups, batch_format="pyarrow")
    return kept, {"n_near_dup": int(n_near)}, kept_sig


# -------------------------------------------- auto-compaction (r5)


def delta_pressure(store_dir: str) -> dict:
    """Segment-count and byte-ratio pressure of the LSM store: how
    many ``delta_NNN`` segments exist and how large they are relative
    to the base. Pure filesystem metadata — no data read."""
    segs = sorted(
        d
        for d in glob.glob(os.path.join(store_dir, "delta_*"))
        if os.path.isdir(d)
    )

    def tree_bytes(root: str) -> int:
        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(root, "part=*", "*.parquet"))
        )

    base_bytes = tree_bytes(store_dir)
    delta_bytes = sum(tree_bytes(s) for s in segs)
    return {
        "segments": len(segs),
        "base_bytes": base_bytes,
        "delta_bytes": delta_bytes,
        "ratio": (delta_bytes / base_bytes) if base_bytes else float(
            "inf" if delta_bytes else 0.0
        ),
    }


def maybe_compact(
    store_dir: str,
    max_segments: int = 8,
    max_bytes_ratio: float = 0.5,
    num_partitions: int | None = None,
) -> dict | None:
    """Size-tiered compaction policy: fold the delta segments back
    into the base when EITHER threshold trips — ``max_segments``
    delta directories (every point lookup touches O(segments) files)
    or delta bytes >= ``max_bytes_ratio`` of the base (the classic
    LSM amplification bound). Returns the compaction summary, or
    None when below both thresholds.

    Mechanics: ``repartition_store`` writes a NEW store next to the
    old one (``<store>.compact`` — the old store stays fully
    readable until the new manifests are complete, and the
    ``_processed/`` + ``_near/`` sidecars are carried), then the
    directories swap via two renames. A crash before the first
    rename loses nothing (stray .compact dir is removed on the next
    attempt); between the renames the old store survives as
    ``<store>.pre_compact`` for manual recovery — the documented
    non-atomic window of a filesystem without atomic dir swap."""
    import shutil

    from ..sources.sinks import repartition_store

    p = delta_pressure(store_dir)
    if p["segments"] == 0:
        return None
    if p["segments"] < max_segments and p["ratio"] < max_bytes_ratio:
        return None
    if num_partitions is None:
        with open(os.path.join(store_dir, "_store_meta.json")) as f:
            num_partitions = int(json.load(f)["num_partitions"])
    tmp = store_dir.rstrip("/") + ".compact"
    shutil.rmtree(tmp, ignore_errors=True)
    res = repartition_store(store_dir, tmp, num_partitions)
    old = store_dir.rstrip("/") + ".pre_compact"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(store_dir, old)
    os.rename(tmp, store_dir)
    shutil.rmtree(old, ignore_errors=True)
    res.update(
        {
            "compacted_segments": p["segments"],
            "trigger": (
                "segments" if p["segments"] >= max_segments else "bytes"
            ),
        }
    )
    return res
