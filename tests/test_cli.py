"""CLI driver smoke (reference cli.py verb surface)."""

import glob
import json
import os

from theoremkb_ray.__main__ import main
from theoremkb_ray.synth import materialize_corpus


def test_cli_apply_and_export(tmp_path, capsys):
    cdir = materialize_corpus(str(tmp_path / "corpus"), num_docs=40, seed=13)
    store = str(tmp_path / "store")
    rc = main(
        [
            "apply",
            "--corpus", f"{cdir}/corpus.parquet",
            "--links", f"{cdir}/links.parquet",
            "--out", store,
            "--segmenter", "naive",
            "--partitions", "4",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_written"] > 0
    assert os.path.isdir(os.path.join(store, "_manifests"))

    rc = main(["export-csv", "--store", store, "--out", str(tmp_path / "csv")])
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts["nodes"] > 0
    assert glob.glob(str(tmp_path / "csv" / "graph_intra_extra" / "*"))


def test_cli_features(tmp_path, capsys):
    cdir = materialize_corpus(str(tmp_path / "corpus"), num_docs=10, seed=14)
    rc = main(
        [
            "features",
            "--corpus", f"{cdir}/corpus.parquet",
            "--out", str(tmp_path / "feats"),
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0
