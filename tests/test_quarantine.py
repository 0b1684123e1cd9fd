"""Poison-row quarantine (stages/ingest.py on_error + dead letters)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.stages.ingest import (
    ShaMismatch,
    ingest,
    quarantined_rows,
)


def _corpus(rows):
    cols = {
        "repo": [], "path": [], "commit": [], "content": [],
        "content_sha256": [],
    }
    for repo, path, commit, content, sha in rows:
        cols["repo"].append(repo)
        cols["path"].append(path)
        cols["commit"].append(commit)
        cols["content"].append(content)
        cols["content_sha256"].append(sha)
    return rd.from_arrow(
        pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})
    ).repartition(2)


def _sha(s):
    return hashlib.sha256(s.encode()).hexdigest()


GOOD = [
    ("o/r", f"f{i}.txt", "c1", f"line {i}", _sha(f"line {i}"))
    for i in range(6)
]
BAD = [
    ("o/r", "null_content.txt", "c1", None, "x"),
    (None, "null_repo.txt", "c1", "text", _sha("text")),
    ("o/r", "bad_sha.txt", "c1", "hello", "deadbeef"),
]


def test_raise_is_default():
    with pytest.raises((ShaMismatch, Exception)):
        ingest(_corpus(GOOD + BAD)).materialize()


def test_quarantine_drops_only_bad_rows():
    out = ingest(
        _corpus(GOOD + BAD), on_error="quarantine"
    ).to_pandas()
    assert len(out) == len(GOOD)
    assert set(out["path"]) == {r[1] for r in GOOD}
    # doc_id + sha derived for the survivors
    assert out["doc_id"].str.contains("@c1").all()


def test_dead_letter_view_reasons():
    q = quarantined_rows(_corpus(GOOD + BAD)).to_pandas()
    reasons = dict(zip(q["path"], q["reason"]))
    assert reasons["null_content.txt"] == "null_field"
    assert reasons["null_repo.txt"] == "null_field"
    assert reasons["bad_sha.txt"] == "sha_mismatch"
    assert len(q) == 3


def test_all_clean_passthrough():
    out = ingest(_corpus(GOOD), on_error="quarantine").to_pandas()
    assert len(out) == len(GOOD)
    assert quarantined_rows(_corpus(GOOD)).count() == 0
