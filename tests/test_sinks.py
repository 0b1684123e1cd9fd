"""Materialize sink: partitioning, sorting, dedup, manifests, resume,
salting."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from theoremkb_ray.sources.sinks import (
    add_partition_column,
    materialize_triples,
    read_triples,
    subject_repo,
)
from theoremkb_ray.state.manifest import completed_partitions, read_manifests


def _triples_tbl(n=100):
    rng = np.random.RandomState(0)
    repos = [f"org/r{int(i)}" for i in rng.randint(0, 10, n)]
    subs = [f"{r}/f.tex@abc#theorem {i}.1" for i, r in enumerate(repos)]
    return pa.table(
        {
            "subject": pa.array(subs),
            "predicate": pa.array(["states"] * n),
            "object": pa.array([f"e{i}" for i in range(n)]),
            "confidence": pa.array([1.0] * n),
            "provenance": pa.array(["t"] * n),
        }
    )


def test_subject_repo_extraction():
    out = subject_repo(
        np.array(
            ["org/name/src/a.tex@c#theorem 1.1", "org/name/x@c", "weird"],
            dtype=object,
        )
    )
    assert list(out) == ["org/name", "org/name", "weird"]


def test_partition_deterministic_and_in_range():
    t = _triples_tbl(50)
    a = add_partition_column(t, 8)["part"].to_numpy()
    b = add_partition_column(t, 8)["part"].to_numpy()
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < 8


def test_salting_spreads_hot_repo():
    n = 200
    t = pa.table(
        {
            "subject": pa.array(
                [f"org/mega/f{i}.tex@c#theorem {i}" for i in range(n)]
            ),
            "predicate": pa.array(["states"] * n),
            "object": pa.array([f"e{i}" for i in range(n)]),
            "confidence": pa.array([1.0] * n),
            "provenance": pa.array(["t"] * n),
        }
    )
    plain = add_partition_column(t, 16)["part"].to_numpy()
    assert len(np.unique(plain)) == 1  # one repo -> one partition
    salted = add_partition_column(t, 16, salt_repos={"org/mega": 4})[
        "part"
    ].to_numpy()
    assert len(np.unique(salted)) == 4


def test_materialize_sorted_deduped_with_manifests(tmp_path):
    out = str(tmp_path / "store")
    t = _triples_tbl(100)
    dup = pa.concat_tables([t, t.slice(0, 10)])  # inject exact dupes
    ds = rd.from_arrow(dup)
    summary = materialize_triples(ds, out, num_partitions=4, resume=False)
    total = sum(r["rows"] for r in summary.take_all())
    assert total == 100  # dupes collapsed
    assert completed_partitions(out) != set()
    # sorted within each partition + manifest row counts match
    for m in read_manifests(out):
        pdir = os.path.join(out, f"part={m['part']:05d}", "data.parquet")
        tbl = pq.read_table(pdir)
        assert tbl.num_rows == m["rows"]
        subs = tbl["subject"].to_pylist()
        assert subs == sorted(subs)
        assert set(m) >= {"part", "rows", "content_hash", "stage", "lineage"}
    # read back
    assert read_triples(out).count() == 100


def test_resume_skips_completed_partitions(tmp_path):
    out = str(tmp_path / "store")
    t = _triples_tbl(80)
    ds = rd.from_arrow(t)
    materialize_triples(ds, out, num_partitions=4, resume=False)
    done_before = completed_partitions(out)
    # tamper: remove one manifest -> that partition is pending again
    victim = sorted(done_before)[0]
    os.remove(os.path.join(out, "_manifests", f"manifest_{victim:05d}.json"))
    summary = materialize_triples(
        rd.from_arrow(t), out, num_partitions=4, resume=True
    )
    rewritten = {r["part"] for r in summary.take_all()}
    assert rewritten == {victim}  # ONLY the pending partition was rewritten
    assert completed_partitions(out) == done_before
    assert read_triples(out).count() == 80


def test_export_graph_csv(tmp_path):
    import glob

    from theoremkb_ray.sources.sinks import export_graph_csv

    out = str(tmp_path / "store")
    t = _triples_tbl(60)
    # add a cites edge (cross-doc) and a proved_by (intra)
    extra = pa.table(
        {
            "subject": pa.array(
                [
                    "org/r1/f.tex@abc#theorem 1.1",
                    "org/r3/f.tex@abc#lemma 2.2",
                    "org/r2/f.tex@abc#theorem 2.1",
                ]
            ),
            "predicate": pa.array(["cites", "cites", "proved_by"]),
            "object": pa.array(
                [
                    "org/r9/g.tex@def#lemma 3.1",
                    "org/r3/f.tex@abc#theorem 1.1",
                    "org/r2/f.tex@abc#proof 4",
                ]
            ),
            "confidence": pa.array([1.0, 1.0, 1.0]),
            "provenance": pa.array(
                [
                    "mention.extra|n=2|tag=[12]",
                    "mention.intra|n=5",
                    "stitch",
                ]
            ),
        }
    )
    ds = rd.from_arrow(pa.concat_tables([t, extra]))
    materialize_triples(ds, out, num_partitions=4, resume=False)
    counts = export_graph_csv(out, str(tmp_path / "csv"))
    assert counts["nodes"] == 60 and counts["edges"] == 2
    assert counts["proved_by"] == 1
    import pandas as pd

    edge_files = glob.glob(str(tmp_path / "csv" / "graph_intra_extra" / "*"))
    edges = pd.concat([pd.read_csv(f) for f in edge_files])
    # exact reference header shape (extract_graph.py:305-307)
    assert list(edges.columns) == [
        "pdf_from", "nres_in", "theorem_in", "theorem_ref", "intra", "ref_tag",
    ]
    ex = edges[~edges["intra"]].iloc[0]
    assert ex["nres_in"] == 2 and ex["ref_tag"] == "[12]"
    intra_row = edges[edges["intra"]].iloc[0]
    assert intra_row["nres_in"] == 5 and pd.isna(intra_row["ref_tag"])


def test_detect_skewed_repos():
    from theoremkb_ray.sources.sinks import detect_skewed_repos

    n = 2000
    # one repo owns half the triples
    repos = ["org/mega"] * (n // 2) + [f"org/r{i}" for i in range(n // 2)]
    t = pa.table(
        {
            "subject": pa.array([f"{r}/f.tex@c#theorem {i}" for i, r in enumerate(repos)]),
            "predicate": pa.array(["states"] * n),
            "object": pa.array([f"e{i}" for i in range(n)]),
            "confidence": pa.array([1.0] * n),
            "provenance": pa.array(["t"] * n),
        }
    )
    hot = detect_skewed_repos(rd.from_arrow(t), num_partitions=16,
                              sample_frac=0.5)
    assert "org/mega" in hot and hot["org/mega"] >= 2
    assert all(not r.startswith("org/r") for r in hot)


def test_clamp_content():
    from theoremkb_ray.stages.ingest import clamp_content

    big = "\n".join(["x" * 80] * 100)  # ~8.1 KB
    t = pa.table(
        {
            "repo": pa.array(["a/b", "a/c"]),
            "path": pa.array(["p", "p"]),
            "commit": pa.array(["1", "2"]),
            "lang": pa.array(["tex", "tex"]),
            "content": pa.array(["small doc", big]),
        }
    )
    out = clamp_content(rd.from_arrow(t), max_bytes=1000).to_pandas()
    out = out.sort_values("commit")
    assert not out["clamped"].iloc[0]
    assert out["clamped"].iloc[1]
    clamped = out["content"].iloc[1]
    assert len(clamped) <= 1000
    assert not clamped.endswith("\n")  # cut lands on a line boundary
    assert out["content"].iloc[0] == "small doc"


def test_repartition_store(tmp_path):
    from theoremkb_ray.sources.sinks import repartition_store

    src = str(tmp_path / "store_p4")
    dst = str(tmp_path / "store_p8")
    ds = rd.from_arrow(_triples_tbl(200))
    materialize_triples(ds, src, num_partitions=4, resume=False)

    res = repartition_store(src, dst, num_partitions=8)
    assert res["rows"] == 200
    # new store: valid manifests at the new partition count, same rows
    assert completed_partitions(dst) != set()
    # content identical; `part` differs by design (membership is
    # hash(repo) % P and P changed — that's what a repartition does)
    a = read_triples(src).to_pandas().drop(columns=["part"])
    b = read_triples(dst).to_pandas().drop(columns=["part"])
    a = a.sort_values(["subject", "predicate", "object"]).reset_index(drop=True)
    b = b.sort_values(["subject", "predicate", "object"]).reset_index(drop=True)
    assert a.equals(b)
    # partition meta reflects the new count; old store untouched
    meta = json.load(open(os.path.join(dst, "_store_meta.json")))
    assert meta["num_partitions"] == 8
    assert meta["lineage"].startswith("compact:")
    assert json.load(open(os.path.join(src, "_store_meta.json")))["num_partitions"] == 4
    with pytest.raises(ValueError):
        repartition_store(src, src, num_partitions=8)
