"""Triple-store sink: sorted, repo-hash-partitioned parquet with
per-partition manifests and resume.

North-rule materialization (BASELINE.json): partition by
``hash(repo-of-subject) % P`` with explicit salting of skewed
mega-repos, sort each partition by (subject, predicate), write one
directory per partition atomically, and record a manifest per
partition so a restarted job skips finished partitions.

Exact global dedup of triples is FREE here: a triple's partition is a
pure function of its subject, so identical triples always land in the
same partition and per-partition dedup == global dedup (no extra
shuffle; SURVEY.md §7.4).
"""

from __future__ import annotations

import os
import re
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash_strings, splitmix64
from ..state.manifest import (
    completed_partitions,
    rollup_hash,
    write_partition_manifest,
)

_RE_REPO = re.compile(r"^([^/]+/[^/]+)")


def subject_repo(subjects) -> np.ndarray:
    """repo prefix ('org/name') of a subject entity/doc id. One Arrow
    C-regex pass for the whole array (the per-row Python re.match
    version cost ~0.5us/row x 2 columns x every triple — measurable at
    millions of triples); rows without a repo prefix fall back to the
    full subject."""
    import pyarrow.compute as pc

    arr = (
        subjects
        if isinstance(subjects, (pa.Array, pa.ChunkedArray))
        else pa.array(np.asarray(subjects, dtype=object), pa.string())
    )
    m = pc.extract_regex(arr, r"^(?P<repo>[^/]+/[^/]+)")
    repo = pc.coalesce(pc.struct_field(m, "repo"), arr)
    return repo.to_numpy(zero_copy_only=False)


def add_partition_column(
    batch: pa.Table,
    num_partitions: int,
    salt_repos: dict[str, int] | None = None,
) -> pa.Table:
    """part = hash(repo(subject)) % P, with hot repos salted across
    ``salt_repos[repo]`` consecutive sub-partitions (north rule).

    Salting keys on the full subject so a mega-repo's triples spread
    deterministically over its salt range."""
    if "part" in batch.column_names:  # re-materializing a read-back store
        batch = batch.drop_columns(["part"])
    subs = batch["subject"].to_numpy(zero_copy_only=False)
    repos = subject_repo(subs)
    h = hash_strings(repos)
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    if salt_repos:
        sub_h = splitmix64(hash_strings(subs))
        for repo, factor in salt_repos.items():
            mask = repos == repo
            if mask.any():
                base = int(hash_strings([repo])[0] % np.uint64(num_partitions))
                salt = (sub_h[mask] % np.uint64(factor)).astype(np.int64)
                part[mask] = (base + salt) % num_partitions
    return batch.append_column("part", pa.array(part, pa.int64()))


def detect_skewed_repos(
    triples_ds, num_partitions: int, factor_cap: int = 8, sample_frac: float = 0.05
) -> dict[str, int]:
    """Pre-pass: find repos owning >> 1/P of triples (sampled count).

    Returns {repo: salt_factor}. One cheap aggregation over a sample —
    the explicit skew handling the north rule requires."""
    from ray.data.aggregate import Count

    def to_repo(b: pa.Table) -> pa.Table:
        subs = b["subject"].to_numpy(zero_copy_only=False)
        return pa.table({"repo": pa.array(subject_repo(subs), pa.string())})

    sample = triples_ds.random_sample(sample_frac, seed=13)
    counts = (
        sample.map_batches(to_repo, batch_format="pyarrow")
        .groupby("repo")
        .count()
        .to_pandas()
    )
    return _salt_factors(counts, "count()", num_partitions, factor_cap)


def _salt_factors(
    counts: pd.DataFrame, n_col: str, num_partitions: int, factor_cap: int
) -> dict[str, int]:
    if len(counts) == 0:
        return {}
    total = counts[n_col].sum()
    thresh = max(2.0 * total / num_partitions, 10)
    hot = counts[counts[n_col] > thresh]
    out = {}
    for _, row in hot.iterrows():
        factor = int(min(factor_cap, np.ceil(row[n_col] / max(thresh, 1))))
        if factor > 1:
            out[row["repo"]] = factor
    return out


def detect_skewed_repos_from_results(
    results_ds, num_partitions: int, factor_cap: int = 8
) -> dict[str, int]:
    """Skew pre-pass on the (already materialized, ~100x-reduced)
    RESULTS table instead of the lazy triples pipeline — sampling the
    triples re-executes emit+rewrite end-to-end just to count repos
    (measured as a full extra pipeline pass in the flagship). Triples
    per repo are proportional to results per repo (2-3 per result),
    which is all the salt factor estimate needs. Per-batch partial
    counts -> streaming driver fold."""

    def partial(b: pa.Table) -> pa.Table:
        docs = b["doc_id"].to_numpy(zero_copy_only=False)
        repos = subject_repo(docs)
        uniq, cnt = np.unique(repos.astype(str), return_counts=True)
        return pa.table(
            {
                "repo": pa.array(uniq, pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    # combine the per-block partials with a STREAMING driver fold
    # instead of a Ray groupby: the partials are tiny (distinct repos
    # per block), but the materialized results table has thousands of
    # blocks and the sort-groupby's per-block task overhead made this
    # a ~20s scheduler-bound, non-scaling pass at 1.1M docs (profiled
    # 19s @32cpu vs 26.5s @8cpu). iter_batches streams with
    # backpressure; driver memory = total distinct repos.
    parts = results_ds.select_columns(["doc_id"]).map_batches(
        partial, batch_format="pyarrow"
    )
    reps: list[np.ndarray] = []
    ns: list[np.ndarray] = []
    for b in parts.iter_batches(batch_format="pyarrow"):
        reps.append(b["repo"].to_numpy(zero_copy_only=False))
        ns.append(b["n"].to_numpy(zero_copy_only=False))
    if not reps:
        return {}
    counts = (
        pd.DataFrame(
            {"repo": np.concatenate(reps), "n": np.concatenate(ns)}
        )
        .groupby("repo", as_index=False, sort=False)
        .sum()
    )
    return _salt_factors(counts, "n", num_partitions, factor_cap)


def _write_partition(
    tbl: pa.Table, part: int, out_dir: str, stage: str, lineage: str,
    row_group_rows: int | None = None,
) -> pa.Table:
    """Sort + dedup + write + manifest ONE partition, all Arrow.

    (The pandas predecessor — to_pandas / drop_duplicates / mergesort /
    elementwise string concat — roughly doubled finalize wall time at
    7M triples.) Sorting on EVERY column (not just s/p/o) makes the
    surviving row of a duplicate key deterministic under any block
    order; pandas drop_duplicates kept whichever arrived first."""
    import pyarrow.compute as pc

    if "part" in tbl.column_names:
        tbl = tbl.drop_columns(["part"])
    tbl = tbl.combine_chunks()
    order = pc.sort_indices(
        tbl, sort_keys=[(c, "ascending") for c in tbl.column_names]
    )
    tbl = tbl.take(order)
    if tbl.num_rows > 1:
        dup = np.ones(tbl.num_rows, dtype=bool)
        for c in ("subject", "predicate", "object"):
            col = tbl[c].combine_chunks()
            dup[1:] &= pc.equal(col.slice(1), col.slice(0, len(col) - 1))\
                .to_numpy(zero_copy_only=False)
        dup[0] = False
        if dup.any():
            tbl = tbl.filter(pa.array(~dup))
    pdir = os.path.join(out_dir, f"part={part:05d}")
    os.makedirs(pdir, exist_ok=True)
    tmp = os.path.join(pdir, "data.parquet.tmp")
    final = os.path.join(pdir, "data.parquet")
    # zstd over default snappy: the finalize pass is disk-bound at
    # high CPU counts (same measurement as the spool's compression
    # note, state/spool.py) and triple ids are highly compressible
    # row_group_rows tunes predicate/subject row-group statistics
    # granularity (smaller groups -> finer pruning for read_triples /
    # the BGP planner, more metadata); None = pyarrow's default
    pq.write_table(
        tbl, tmp, compression="zstd",
        **({"row_group_size": row_group_rows} if row_group_rows else {}),
    )
    os.replace(tmp, final)
    # manifest hash formula unchanged (sub\tpred\tobj joined by \n);
    # binary_join over one list scalar builds the bytes in Arrow C++
    joined = pc.binary_join_element_wise(
        tbl["subject"], tbl["predicate"], tbl["object"], "\t"
    )
    body = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array([0, len(joined)], pa.int32()), joined.combine_chunks()
        ),
        "\n",
    )[0].as_py()
    roll = rollup_hash(body.encode())
    pc_counts = tbl["predicate"].combine_chunks().value_counts()
    pred_counts = {
        str(v["values"]): int(v["counts"]) for v in pc_counts.to_pylist()
    }
    write_partition_manifest(
        out_dir, part, tbl.num_rows, roll, stage, lineage,
        pred_counts=pred_counts,
    )
    return pa.table(
        {
            "part": pa.array([part], pa.int64()),
            "rows": pa.array([tbl.num_rows], pa.int64()),
        }
    )


def materialize_triples(
    triples_ds,
    out_dir: str,
    num_partitions: int = 32,
    resume: bool = True,
    salt_repos: dict[str, int] | None = None,
    auto_salt: bool = False,
    lineage: str = "kg",
    row_group_rows: int | None = None,
):
    """Write the triple store; returns a small Dataset of (part, rows).

    resume=True skips partitions that already have a manifest (their
    rows are filtered out BEFORE the shuffle, so a resumed run moves
    only pending data).
    """
    os.makedirs(out_dir, exist_ok=True)
    if auto_salt and salt_repos is None:
        salt_repos = detect_skewed_repos(triples_ds, num_partitions)
    # record the partitioning config: point-lookup consumers (serve.py)
    # need it to map subject -> partition, and a resumed run with a
    # DIFFERENT config would silently misplace rows — fail instead
    meta_path = os.path.join(out_dir, "_store_meta.json")
    meta = {
        "num_partitions": num_partitions,
        "salt_repos": salt_repos or {},
        "lineage": lineage,
    }
    if resume and os.path.exists(meta_path):
        import json as _json

        with open(meta_path) as f:
            prev = _json.load(f)
        if (prev.get("num_partitions"), prev.get("salt_repos") or {}) != (
            num_partitions,
            salt_repos or {},
        ):
            raise ValueError(
                f"resume with different partitioning config in {out_dir}: "
                f"recorded {prev}, requested {meta} — rows would land in "
                "the wrong partitions; use resume=False or match the config"
            )
    else:
        import json as _json

        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        os.replace(tmp, meta_path)
    ds = triples_ds.map_batches(
        lambda b: add_partition_column(b, num_partitions, salt_repos),
        batch_format="pyarrow",
    )
    done = completed_partitions(out_dir) if resume else set()
    if done:
        done_arr = pa.array(sorted(done), pa.int64())
        ds = ds.map_batches(
            lambda b: b.filter(
                pa.compute.invert(
                    pa.compute.is_in(b["part"], value_set=done_arr)
                )
            ),
            batch_format="pyarrow",
        )
    # Disk-mediated shuffle instead of Ray's sort-based groupby: the
    # all-to-all sort of every triple row was the single largest wall
    # chunk of the flagship (measured 69s of a 180s run at 7.35M
    # triples / 32 CPUs; the partitioned spool + finalize pass does the
    # same data movement through shared storage in ~1/4 the time). Each
    # map task appends its rows to hive-partitioned spool files (NO
    # exchange), then one task per partition sorts/dedups/writes the
    # final sorted parquet + manifest. On a multi-node cluster the
    # spool lives on the same shared storage as the store itself.
    import shutil

    import ray.data as rd

    import time as _time

    _prof = os.environ.get("TKB_PROF")

    def _mark(msg: str) -> None:
        if _prof:
            import sys as _sys

            print(
                f"[sink +{_time.perf_counter() - _t0:.1f}s] {msg}",
                file=_sys.stderr,
                flush=True,
            )

    from ..state.spool import read_spool_partition, spool_write_partitioned

    _t0 = _time.perf_counter()
    spool = os.path.join(out_dir, "_spool")
    shutil.rmtree(spool, ignore_errors=True)  # stale spool from a crash
    pending, expected_rows = spool_write_partitioned(ds, spool, "part")
    _mark("spool written (upstream emit/rewrite executed)")
    if not pending:
        shutil.rmtree(spool, ignore_errors=True)
        return rd.from_items([]).materialize()

    def finalize(b: pa.Table) -> pa.Table:
        rows_out = []
        for part in b["part"].to_pylist():
            tbl = read_spool_partition(spool, "part", part).drop_columns(
                ["part"]
            )
            want = expected_rows.get(part, -1)
            if len(tbl) != want:
                raise RuntimeError(
                    f"triple-store spool reconciliation failed: partition "
                    f"part={part} has {len(tbl)} rows on disk, map tasks "
                    f"wrote {want} — the store/spool directory is not "
                    f"shared across nodes (it must live on the same "
                    f"shared storage as the triple store itself)."
                )
            rows_out.append(
                _write_partition(
                    tbl, part, out_dir, "materialize", lineage,
                    row_group_rows=row_group_rows,
                )
            )
        return pa.concat_tables(rows_out)

    parts_ds = rd.from_arrow(
        pa.table({"part": pa.array(pending, pa.int64())})
    ).repartition(len(pending))
    # batch_size=1: one task per partition — the default bundles the
    # single-row part blocks into a handful of tasks and serializes
    # the whole finalize pass (measured 28s -> ~5s at 64 parts).
    # num_cpus=2 caps concurrent finalize tasks at ncpu/2: each task
    # sorts + parquet-writes a whole partition (large fresh
    # allocations + disk writes); at 32 fully-concurrent tasks this VM
    # page-fault-stalls and finalize measured SLOWER than at 8 CPUs
    # (24s vs 7.7s) — half-width keeps the disk/allocator happy at
    # high CPU counts without starving low ones
    out = parts_ds.map_batches(
        finalize, batch_format="pyarrow", batch_size=1, num_cpus=2
    ).materialize()
    _mark("finalize done")
    shutil.rmtree(spool, ignore_errors=True)
    return out


_RE_PROV_N = re.compile(r"\|n=(\d+)")
_RE_PROV_TAG = re.compile(r"\|tag=(.*)$")


def export_graph_csv(store_dir: str, out_dir: str) -> dict[str, int]:
    """Export the triple store in the REFERENCE'S output shape
    (reference: Styling/tools/theoremdb/extract_graph.py:274-307
    ``extract_links`` rows + ``save_graph`` headers):

    - ``graph_results.csv``  — node table ``(pdf_from, result)``
      from the ``states`` triples;
    - ``graph_intra_extra.csv`` — edge table ``(pdf_from, nres_in,
      theorem_in, theorem_ref, intra, ref_tag)`` from the ``cites``
      triples: ``nres_in`` = the source result's per-document ordinal
      and ``ref_tag`` = the citation tag (empty for intra rows) — both
      carried in the triples' provenance (``|n=..|tag=..``), matching
      the reference's ``(pdfname, n, n2res[n], thm, intra, ref)`` rows;
    - ``graph_proved_by.csv`` — engine extension ``(pdf_from, theorem,
      proof)`` (the reference folds proofs into their theorem rather
      than emitting them as edges).

    A consumer of the reference's files can read the first two
    unchanged. Each output is a directory of CSV shards
    (``Dataset.write_csv``); returns row counts."""
    import pyarrow.compute as pc2

    ds = read_triples(store_dir)

    def to_nodes(b: pa.Table) -> pa.Table:
        b = b.filter(pc2.equal(b["predicate"], "states"))
        return pa.table(
            {"pdf_from": b["subject"], "result": b["object"]}
        )

    def to_edges(b: pa.Table) -> pa.Table:
        b = b.filter(pc2.equal(b["predicate"], "cites"))
        subs = b["subject"].to_numpy(zero_copy_only=False)
        objs = b["object"].to_numpy(zero_copy_only=False)
        provs = b["provenance"].to_numpy(zero_copy_only=False)
        doc_of = lambda e: e.split("#", 1)[0]  # noqa: E731
        pdf_from = np.array([doc_of(s) for s in subs], dtype=object)
        intra = np.array(
            [doc_of(s) == doc_of(o) for s, o in zip(subs, objs)]
        )
        nres, tags = [], []
        for p in provs:
            mn = _RE_PROV_N.search(p)
            nres.append(int(mn.group(1)) if mn else 0)
            mt = _RE_PROV_TAG.search(p)
            tags.append(mt.group(1) if mt else "")
        return pa.table(
            {
                "pdf_from": pa.array(pdf_from, pa.string()),
                "nres_in": pa.array(nres, pa.int64()),
                "theorem_in": b["subject"],
                "theorem_ref": b["object"],
                "intra": pa.array(intra),
                "ref_tag": pa.array(tags, pa.string()),
            }
        )

    def to_proofs(b: pa.Table) -> pa.Table:
        b = b.filter(pc2.equal(b["predicate"], "proved_by"))
        subs = b["subject"].to_numpy(zero_copy_only=False)
        pdf_from = np.array([s.split("#", 1)[0] for s in subs], dtype=object)
        return pa.table(
            {
                "pdf_from": pa.array(pdf_from, pa.string()),
                "theorem": b["subject"],
                "proof": b["object"],
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    nodes = ds.map_batches(to_nodes, batch_format="pyarrow")
    edges = ds.map_batches(to_edges, batch_format="pyarrow")
    proofs = ds.map_batches(to_proofs, batch_format="pyarrow")
    n_nodes, n_edges, n_proofs = nodes.count(), edges.count(), proofs.count()
    nodes.write_csv(os.path.join(out_dir, "graph_results"))
    edges.write_csv(os.path.join(out_dir, "graph_intra_extra"))
    proofs.write_csv(os.path.join(out_dir, "graph_proved_by"))
    return {"nodes": n_nodes, "edges": n_edges, "proved_by": n_proofs}


def _prefix_upper_bound(prefix: str) -> str | None:
    """Smallest string strictly greater than every string with
    ``prefix``, under UTF-8 binary order (= codepoint order):
    increment the last codepoint with carry, skipping the surrogate
    gap. A ``prefix + '\\uffff'`` bound would wrongly exclude
    subjects whose next char is >= U+FFFF (astral codepoints sort
    ABOVE U+FFFF). Returns None when no finite bound exists (prefix
    is all U+10FFFF) — callers then keep only the lower bound."""
    cps = list(prefix)
    while cps:
        c = ord(cps[-1])
        if c < 0x10FFFF:
            nxt = c + 1
            if 0xD800 <= nxt <= 0xDFFF:  # surrogates: not valid UTF-8
                nxt = 0xE000
            cps[-1] = chr(nxt)
            return "".join(cps)
        cps.pop()  # carry past a maxed-out codepoint
    return None


def read_triples(
    out_dir: str,
    predicate: str | list[str] | None = None,
    subject_prefix: str | None = None,
):
    """Union of the base segment and any ``delta_NNN`` segments
    appended by pipelines/delta.py:run_kg_delta (LSM layout — all
    segments share the store's partition function, so partition N of
    the logical store = the part=N files of every segment).

    ``predicate`` / ``subject_prefix`` push the filter INTO the scan
    (pyarrow dataset expression -> parquet row-group statistics +
    dictionary pruning): a predicate-selective kgquery over a 100 TB
    store then reads only the row groups whose min/max admit the
    predicate instead of every triple. Sorted-partition layout (the
    sink sorts each partition by subject) makes subject_prefix
    row-group pruning effective too."""
    import glob

    import ray.data as rd

    parts = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    parts += sorted(
        glob.glob(os.path.join(out_dir, "delta_*", "part=*", "*.parquet"))
    )
    expr = None
    if predicate is not None:
        import pyarrow.dataset as pds

        expr = (
            pds.field("predicate").isin(list(predicate))
            if isinstance(predicate, (list, tuple, set))
            else pds.field("predicate") == predicate
        )
    if subject_prefix is not None:
        import pyarrow.dataset as pds

        hi = _prefix_upper_bound(subject_prefix)
        pref = pds.field("subject") >= subject_prefix
        if hi is not None:
            pref = pref & (pds.field("subject") < hi)
        expr = pref if expr is None else (expr & pref)
    if expr is not None:
        return rd.read_parquet(parts, filter=expr)
    return rd.read_parquet(parts)


def repartition_store(
    store_dir: str,
    out_dir: str,
    num_partitions: int,
    auto_salt: bool = True,
) -> dict:
    """Rebuild a triple store at a different partition count — the
    compaction/regrow operation a long-lived store needs when the
    corpus outgrows (or shrank far below) its partition sizing.

    A partition's membership is ``hash(repo(subject)) % P``, so
    changing P moves rows between partitions — this is a full
    rewrite, expressed as read -> materialize_triples into a NEW
    directory (never in place: the old store stays valid until the
    new one's manifests are complete, and a crash mid-compaction
    loses nothing). Salting is re-detected against the current data
    rather than copied — skew may have changed since the store was
    written. Returns {"partitions": ..., "rows": ...} of the new
    store."""
    if os.path.abspath(store_dir) == os.path.abspath(out_dir):
        raise ValueError(
            "repartition_store writes a NEW store; out_dir must differ "
            "from store_dir (the old store stays readable during the "
            "rewrite)"
        )
    triples = read_triples(store_dir)
    salt = (
        detect_skewed_repos(triples, num_partitions, sample_frac=0.1)
        if auto_salt
        else None
    )
    summary = materialize_triples(
        triples,
        out_dir,
        num_partitions=num_partitions,
        resume=False,
        salt_repos=salt,
        lineage=f"compact:{store_dir}",
    )
    rows = [r["rows"] for r in summary.take_all()]
    # compaction folds delta_NNN segments into the base partitions
    # (read_triples unions them); carry the _processed/ sidecar over
    # so incremental ingest keeps its dedup memory on the new store
    for name in ("_processed", "_near"):
        src_sidecar = os.path.join(store_dir, name)
        if os.path.isdir(src_sidecar):
            shutil.copytree(
                src_sidecar,
                os.path.join(out_dir, name),
                dirs_exist_ok=True,
            )
    return {"partitions": len(rows), "rows": int(sum(rows))}
