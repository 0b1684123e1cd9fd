"""Task-failure resilience: the engine's stages run as Ray tasks,
which retry transparently on WORKER DEATH (application exceptions are
deliberately fatal — they signal bugs, not infrastructure). The
injected failure is a hard os._exit so Ray classifies it as a system
failure and reschedules the task."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def test_transient_task_failure_retries_to_success(tmp_path):
    """A batch fn that dies once (file-flagged so the retry — possibly
    on another worker process — sees the first attempt happened) must
    complete with full, correct output."""
    marker = tmp_path / "failed_once"

    def flaky(b: pa.Table) -> pa.Table:
        if not marker.exists():
            marker.write_text("x")
            import os

            os._exit(1)  # hard worker death, not an application error
        return b

    ds = rd.range(10_000).map_batches(flaky, batch_format="pyarrow")
    assert ds.count() == 10_000
    assert marker.exists()


def test_flagship_survives_transient_segment_failure(tmp_path):
    """Same property at flagship granularity: a one-shot crash inside
    the segmentation stage does not change the triple set."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import run_kg
    from theoremkb_ray.registry import register_segmenter
    from theoremkb_ray.sources.sinks import read_triples
    from theoremkb_ray.stages.segment import segment_naive
    from theoremkb_ray.synth import materialize_corpus

    cdir = materialize_corpus(str(tmp_path / "c"), num_docs=40, seed=13)
    marker = str(tmp_path / "crashed_once")

    def flaky_segmenter(ds):
        import os

        import pyarrow as _pa

        def bomb(b: _pa.Table) -> _pa.Table:
            if not os.path.exists(marker):
                open(marker, "w").write("x")
                os._exit(1)  # worker death mid-stage
            return b

        return segment_naive(ds.map_batches(bomb, batch_format="pyarrow"))

    register_segmenter("flaky_naive", flaky_segmenter)

    def triples(store, seg):
        run_kg(
            f"{cdir}/corpus.parquet", store, segmenter=seg,
            canonicalize=False, num_partitions=3,
        )
        df = read_triples(store).to_pandas()
        return set(
            map(
                tuple,
                df[["subject", "predicate", "object"]].itertuples(False),
            )
        )

    flaky = triples(str(tmp_path / "s1"), "flaky_naive")
    clean = triples(str(tmp_path / "s2"), "naive")
    assert flaky == clean and len(clean) > 0
