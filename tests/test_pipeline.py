"""End-to-end KG pipeline: triple P/R vs gold (BASELINE.json gate)."""

import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.pipelines.kg import triples_dataset
from theoremkb_ray.stages.canonicalize import connected_components_local
from theoremkb_ray.stages.ingest import ShaMismatch, ingest_batch


def _pr(got: set, gold: set) -> tuple[float, float]:
    tp = len(got & gold)
    return tp / max(len(got), 1), tp / max(len(gold), 1)


def _gold_sets(tables):
    df = tables["gold_triples"].to_pandas()
    gold = set(zip(df["subject"], df["predicate"], df["object"]))
    dp = tables["gold_dup_pairs"]
    canon = connected_components_local(
        pa.table({"a": dp["entity_a"], "b": dp["entity_b"]})
    )
    gold_c = {
        (canon.get(s, s), p, canon.get(o, o)) for s, p, o in gold
    }
    return gold, gold_c


@pytest.mark.parametrize("segmenter", ["naive", "crf"])
def test_e2e_triples_pr(gold100, segmenter):
    corpus = rd.from_arrow(gold100["corpus"])
    out = triples_dataset(
        corpus,
        links_tbl=gold100["links"],
        segmenter=segmenter,
        canonicalize=False,
    ).to_pandas()
    got = set(zip(out["subject"], out["predicate"], out["object"]))
    gold, _ = _gold_sets(gold100)
    p, r = _pr(got, gold)
    assert p >= 0.95 and r >= 0.95, (segmenter, p, r)


def test_e2e_canonicalized_pr(gold100):
    corpus = rd.from_arrow(gold100["corpus"])
    out = triples_dataset(
        corpus,
        links_tbl=gold100["links"],
        segmenter="crf",
        canonicalize=True,
    ).to_pandas()
    got = set(zip(out["subject"], out["predicate"], out["object"]))
    _, gold_c = _gold_sets(gold100)
    p, r = _pr(got, gold_c)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_sha_invariant_detects_corruption(gold100):
    t = gold100["corpus"].slice(0, 4)
    bad_sha = t["content_sha256"].to_pylist()
    bad_sha[2] = "0" * 64
    t = t.set_column(
        t.column_names.index("content_sha256"),
        "content_sha256",
        pa.array(bad_sha, pa.string()),
    )
    with pytest.raises(ShaMismatch):
        ingest_batch(t)


def test_ingest_adds_doc_id_and_sha(gold100):
    t = gold100["corpus"].slice(0, 3).drop_columns(["content_sha256"])
    out = ingest_batch(t)
    assert "doc_id" in out.column_names
    assert out["content_sha256"].to_pylist() == gold100["corpus"].slice(0, 3)[
        "content_sha256"
    ].to_pylist()
    did = out["doc_id"].to_pylist()[0]
    assert "@" in did and did.startswith(out["repo"].to_pylist()[0])
