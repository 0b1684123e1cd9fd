"""Micro-batch continuous ingestion (pipelines/stream.py)."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from theoremkb_ray.pipelines.stream import watch_and_ingest
from theoremkb_ray.sources.sinks import read_triples
from theoremkb_ray.synth import materialize_corpus


def _drop_file(src_corpus, watch_dir, name, repo_prefix=None):
    t = pq.read_table(src_corpus)
    if repo_prefix:
        t = t.set_column(
            t.column_names.index("repo"),
            "repo",
            pa.array(
                [f"{repo_prefix}/" + r for r in t["repo"].to_pylist()],
                pa.string(),
            ),
        )
    pq.write_table(t, f"{watch_dir}/{name}")


def test_watch_bootstrap_then_deltas(tmp_path):
    c1 = materialize_corpus(str(tmp_path / "c1"), num_docs=40, seed=1)
    c2 = materialize_corpus(str(tmp_path / "c2"), num_docs=15, seed=2)
    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "store")

    # round 1: bootstrap from the first file
    _drop_file(f"{c1}/corpus.parquet", watch, "batch0.parquet")
    log1 = watch_and_ingest(
        str(watch), store, max_rounds=1, stop_after_idle=99,
        poll_interval=0, segmenter="naive", canonicalize=False,
    )
    assert log1.iloc[0]["n_new"] > 0
    base_count = read_triples(store).count()
    assert base_count > 0

    # round 2: a new file arrives -> exactly its docs appended
    _drop_file(
        f"{c2}/corpus.parquet", watch, "batch1.parquet",
        repo_prefix="stream2",
    )
    log2 = watch_and_ingest(
        str(watch), store, max_rounds=1, stop_after_idle=99,
        poll_interval=0, segmenter="naive", canonicalize=False,
    )
    assert log2.iloc[0]["n_new"] > 0
    assert log2.iloc[0]["segment"].endswith("delta_000")
    assert read_triples(store).count() > base_count

    # rounds 3+: idle -> loop terminates after stop_after_idle rounds
    log3 = watch_and_ingest(
        str(watch), store, stop_after_idle=2,
        poll_interval=0, segmenter="naive", canonicalize=False,
    )
    assert (log3["n_new"] == 0).all()
    assert len(log3) == 2


def test_watch_empty_dir_idles_out(tmp_path):
    watch = tmp_path / "empty"
    watch.mkdir()
    store = str(tmp_path / "store")
    log = watch_and_ingest(
        str(watch), store, stop_after_idle=3, poll_interval=0
    )
    assert len(log) == 3
    assert (log["files"] == 0).all()


def test_auto_compaction_folds_segments_and_preserves_store(tmp_path):
    """Round-5: K small deltas trip the size-tiered policy; one
    compaction folds them into the base, carries the _processed/ +
    _near/ sidecars, and leaves the queryable triples unchanged."""
    import os

    from theoremkb_ray.pipelines.delta import delta_pressure

    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "store")
    c0 = materialize_corpus(str(tmp_path / "c0"), num_docs=30, seed=1)
    _drop_file(f"{c0}/corpus.parquet", watch, "batch0.parquet")
    # bootstrap, compaction disabled so segments accumulate
    watch_and_ingest(
        str(watch), store, max_rounds=1, stop_after_idle=99,
        poll_interval=0, segmenter="naive", canonicalize=False,
        compact_max_segments=0,
    )
    for i in range(3):
        ci = materialize_corpus(
            str(tmp_path / f"c{i+1}"), num_docs=8, seed=10 + i
        )
        _drop_file(
            f"{ci}/corpus.parquet", watch, f"batch{i+1}.parquet",
            repo_prefix=f"s{i}",
        )
        watch_and_ingest(
            str(watch), store, max_rounds=1, stop_after_idle=99,
            poll_interval=0, segmenter="naive", canonicalize=False,
            compact_max_segments=0,
        )
    assert delta_pressure(store)["segments"] == 3
    before = (
        read_triples(store)
        .to_pandas()
        .sort_values(["subject", "predicate", "object"])
        .reset_index(drop=True)[["subject", "predicate", "object"]]
    )

    # one more tiny delta with compaction ON at threshold 3 -> folds
    c4 = materialize_corpus(str(tmp_path / "c4"), num_docs=6, seed=77)
    _drop_file(
        f"{c4}/corpus.parquet", watch, "batch4.parquet",
        repo_prefix="s4",
    )
    log = watch_and_ingest(
        str(watch), store, max_rounds=1, stop_after_idle=99,
        poll_interval=0, segmenter="naive", canonicalize=False,
        compact_max_segments=3,
    )
    assert log.iloc[0]["compacted"] >= 3
    p = delta_pressure(store)
    assert p["segments"] == 0  # folded into the base
    assert os.path.isdir(os.path.join(store, "_processed"))
    after = (
        read_triples(store)
        .to_pandas()
        .sort_values(["subject", "predicate", "object"])
        .reset_index(drop=True)[["subject", "predicate", "object"]]
    )
    new_docs = set(after["subject"]) - set(before["subject"])
    assert len(after) > len(before) and new_docs  # delta landed
    # everything that existed before compaction is still queryable
    import pandas as pd

    merged = before.merge(
        after, on=["subject", "predicate", "object"], how="left",
        indicator=True,
    )
    assert (merged["_merge"] == "both").all()

    # idle round on the compacted store: nothing re-ingests (the
    # _processed sidecar survived the swap)
    log2 = watch_and_ingest(
        str(watch), store, max_rounds=1, stop_after_idle=99,
        poll_interval=0, segmenter="naive", canonicalize=False,
    )
    assert log2.iloc[0]["n_new"] == 0 and log2.iloc[0]["compacted"] == 0
