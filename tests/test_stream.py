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
