"""Mid-pipeline kill-and-resume (north rule)."""

import os

import pyarrow.parquet as pq
import pytest

from theoremkb_ray.pipelines.kg import run_kg
from theoremkb_ray.sources.sinks import read_triples
from theoremkb_ray.state.checkpoint import (
    checkpoint_complete,
    read_checkpoint,
)
from theoremkb_ray.state.manifest import completed_partitions
from theoremkb_ray.synth import materialize_corpus


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume_corpus")
    return materialize_corpus(str(d), num_docs=60, seed=5)


def test_full_run_writes_results_checkpoint(corpus_dir, tmp_path):
    out = str(tmp_path / "store")
    ckpt = str(tmp_path / "results_ckpt")
    links = pq.read_table(f"{corpus_dir}/links.parquet")
    run_kg(
        f"{corpus_dir}/corpus.parquet",
        out,
        links_tbl=links,
        segmenter="naive",
        canonicalize=False,
        num_partitions=8,
        results_checkpoint=ckpt,
    )
    assert checkpoint_complete(ckpt, 32)
    n1 = read_triples(out).count()
    assert n1 > 0
    res = read_checkpoint(ckpt)
    assert res.count() > 0
    assert "entity_id" in res.schema().names

    # ---- simulate crash AFTER segmentation: sink lost one partition
    victim = sorted(completed_partitions(out))[0]
    os.remove(os.path.join(out, "_manifests", f"manifest_{victim:05d}.json"))
    os.utime(ckpt)  # no-op; checkpoint intact
    summary = run_kg(
        f"{corpus_dir}/corpus.parquet",
        out,
        links_tbl=links,
        segmenter="naive",
        canonicalize=False,
        num_partitions=8,
        results_checkpoint=ckpt,
    )
    rewritten = {r["part"] for r in summary.take_all()}
    assert rewritten == {victim}
    assert read_triples(out).count() == n1


def test_partial_results_checkpoint_fills_pending(corpus_dir, tmp_path):
    out = str(tmp_path / "store2")
    ckpt = str(tmp_path / "ckpt2")
    links = pq.read_table(f"{corpus_dir}/links.parquet")
    run_kg(
        f"{corpus_dir}/corpus.parquet",
        out,
        links_tbl=links,
        segmenter="naive",
        canonicalize=False,
        num_partitions=8,
        results_checkpoint=ckpt,
    )
    total = read_checkpoint(ckpt).count()
    # simulate a crash mid-checkpoint: drop two partition manifests
    done = sorted(completed_partitions(ckpt))
    for v in done[:2]:
        os.remove(os.path.join(ckpt, "_manifests", f"manifest_{v:05d}.json"))
    assert not checkpoint_complete(ckpt, 32)
    run_kg(
        f"{corpus_dir}/corpus.parquet",
        out,
        links_tbl=links,
        segmenter="naive",
        canonicalize=False,
        num_partitions=8,
        results_checkpoint=ckpt,
    )
    assert checkpoint_complete(ckpt, 32)
    assert read_checkpoint(ckpt).count() == total


def test_resume_rejects_lineage_mismatch(corpus_dir, tmp_path):
    """A checkpoint dir written from one corpus/segmenter must not be
    silently reused by a run with different inputs (ADVICE r1)."""
    out = str(tmp_path / "store")
    ckpt = str(tmp_path / "results_ckpt")
    run_kg(
        f"{corpus_dir}/corpus.parquet",
        out,
        segmenter="naive",
        canonicalize=False,
        num_partitions=4,
        results_checkpoint=ckpt,
    )
    # same checkpoint dir, different segmenter -> refuse
    with pytest.raises(ValueError, match="lineage mismatch"):
        run_kg(
            f"{corpus_dir}/corpus.parquet",
            str(tmp_path / "store2"),
            segmenter="crf",
            canonicalize=False,
            num_partitions=4,
            results_checkpoint=ckpt,
        )
    # same checkpoint dir, different corpus path -> refuse
    with pytest.raises(ValueError, match="lineage mismatch"):
        run_kg(
            f"{corpus_dir}/does_not_exist.parquet",
            str(tmp_path / "store3"),
            segmenter="naive",
            canonicalize=False,
            num_partitions=4,
            results_checkpoint=ckpt,
        )
