"""End-to-end corpus build (pipelines/corpus_build.py)."""

from __future__ import annotations

import glob

import duckdb
import numpy as np

from theoremkb_ray.pipelines.corpus_build import run_corpus_build

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _bench_texts(n=2):
    return (
        duckdb.sql(f"SELECT text FROM '{DOCS}' LIMIT {n}")
        .df()["text"]
        .tolist()
    )


def test_build_report_monotone_and_deterministic(tmp_path):
    kwargs = dict(
        langs=["en", "de", "fr", "es", "zh"],
        quotas={"en": 20, "de": 10, "fr": 10, "es": 10, "zh": 10},
        bench_texts=_bench_texts(),
    )
    rep1 = run_corpus_build(DOCS, out_dir=None, **kwargs)
    rep2 = run_corpus_build(DOCS, out_dir=None, **kwargs)
    assert rep1.equals(rep2)
    stages = dict(zip(rep1["stage"], rep1["rows"]))
    # filters never add rows (chunking can)
    assert stages["quality"] <= stages["raw"]
    assert stages["exact_dedup"] <= stages["language"]
    assert stages["near_dedup"] <= stages["exact_dedup"]
    assert stages["decontaminate"] < stages["near_dedup"]  # planted hits
    assert stages["mixture"] <= stages["redact"]
    assert stages["exported"] == stages["chunk"] > 0


def test_export_layout_and_rank_order(tmp_path):
    out = str(tmp_path / "shards")
    rep = run_corpus_build(
        DOCS, out_dir=out, num_shards=8, report=True
    )
    files = glob.glob(f"{out}/shard=*/*.parquet")
    assert len(glob.glob(f"{out}/shard=*")) >= 6  # hash spread, 8 target
    total = 0
    import pyarrow.parquet as pq

    seen_shards = set()
    for f in files:
        t = pq.read_table(f)
        total += t.num_rows
        sh = int(f.split("shard=")[1].split("/")[0])
        seen_shards.add(sh)
        assert (np.asarray(t["rank"]) >= 0).all()
    assert total == int(rep[rep["stage"] == "exported"]["rows"].iloc[0])


def test_streaming_mode_no_report(tmp_path):
    out = str(tmp_path / "s2")
    rep = run_corpus_build(DOCS, out_dir=out, report=False)
    assert rep.empty
    assert glob.glob(f"{out}/shard=*/*.parquet")
