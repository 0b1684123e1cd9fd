"""Generator determinism + structural asserts (FIXTURES.md F1-F5)."""

import hashlib

import pyarrow as pa

from theoremkb_ray.schema import CORPUS_SCHEMA, NUMBERED_KINDS
from theoremkb_ray.synth import generate_corpus, generate_doc


def test_corpus_schema_matches_input_hint():
    t = generate_corpus(10)["corpus"]
    for f in CORPUS_SCHEMA:
        assert t.schema.field(f.name).type == f.type


def test_deterministic_across_calls():
    a = generate_corpus(20, seed=42)
    b = generate_corpus(20, seed=42)
    assert a["corpus"].equals(b["corpus"])
    assert a["gold_triples"].equals(b["gold_triples"])


def test_sha256_column_correct():
    t = generate_corpus(5)["corpus"].to_pandas()
    for _, row in t.iterrows():
        assert (
            hashlib.sha256(row["content"].encode()).hexdigest()
            == row["content_sha256"]
        )


def test_doc_generation_independent_of_order():
    """Per-doc seeding: doc 0 (which has no cross-citation targets) is
    identical whether generated alone or within a batch — parallel
    generation is safe given the same target slice."""
    alone = generate_doc(0, 20, seed=42)
    batch = generate_corpus(20, seed=42, dup_fraction=0.0)["corpus"].to_pandas()
    row = batch[batch["path"] == "src/section_0.tex"].iloc[0]
    assert row["content"] == alone.content


def test_gold_spans_align_with_content():
    tables = generate_corpus(20, seed=1)
    corpus = tables["corpus"].to_pandas()
    by_doc = {
        f"{r.repo}/{r.path}@{r.commit}": r.content.split("\n")
        for r in corpus.itertuples()
    }
    spans = tables["gold_spans"].to_pandas()
    assert len(spans) > 0
    for r in spans.itertuples():
        lines = by_doc[r.doc_id]
        head = lines[r.start_line]
        assert head.startswith("\\textbf{") or head.startswith("\\textit{")
        if r.label != "proof":
            assert r.label.capitalize() in head


def test_states_triples_cover_numbered_entities():
    tables = generate_corpus(20, seed=1, dup_fraction=0.0)
    spans = tables["gold_spans"].to_pandas()
    triples = tables["gold_triples"].to_pandas()
    n_numbered = (spans["label"] != "proof").sum()
    assert (triples["predicate"] == "states").sum() == n_numbered
    assert set(triples["predicate"]) <= {"states", "proved_by", "cites"}


def test_forks_are_near_duplicates():
    tables = generate_corpus(40, seed=42, dup_fraction=0.5)
    corpus = tables["corpus"].to_pandas()
    forks = corpus[corpus["repo"].str.startswith("fork/")]
    assert len(forks) > 0
    assert tables["gold_dup_pairs"].num_rows > 0
    # forked content differs but shares most lines
    orig = corpus[~corpus["repo"].str.startswith("fork/")]
    f = forks.iloc[0]
    o = orig[orig["path"] == f["path"]].iloc[0]
    a, b = o["content"].split("\n"), f["content"].split("\n")
    assert len(a) == len(b)
    same = sum(x == y for x, y in zip(a, b)) / len(a)
    assert same > 0.5
    assert o["content"] != f["content"]


def test_skew_megarepos_present():
    c = generate_corpus(50, seed=42, skew=True)["corpus"].to_pandas()
    counts = c["repo"].value_counts()
    assert counts.iloc[0] >= 5  # mega repos own ~10% each


def test_jsonl_corpus_roundtrip(tmp_path):
    """JSONL source/sink: write the synthetic corpus as JSONL, read it
    back, run ingest — identical doc_ids and shas as the parquet path."""
    import pyarrow.parquet as pq

    from theoremkb_ray.sources.corpus import (
        read_corpus,
        read_corpus_jsonl,
        write_corpus_jsonl,
    )
    from theoremkb_ray.stages.ingest import ingest
    from theoremkb_ray.synth import materialize_corpus

    cdir = materialize_corpus(str(tmp_path / "c"), num_docs=30, seed=3)
    pq_ds = read_corpus(f"{cdir}/corpus.parquet")
    jdir = str(tmp_path / "jsonl")
    write_corpus_jsonl(pq_ds, jdir)
    j_ds = read_corpus_jsonl(jdir)
    a = (
        ingest(read_corpus(f"{cdir}/corpus.parquet"))
        .to_pandas()[["doc_id", "content_sha256"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        ingest(j_ds)
        .to_pandas()[["doc_id", "content_sha256"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
