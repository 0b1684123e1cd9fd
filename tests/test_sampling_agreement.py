"""Sampling determinism + agreement/evaluation operators."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.agreement import agreement, classification_report
from theoremkb_ray.stages.sampling import (
    balance_context_window,
    stratified_sample,
    train_test_split,
)
from theoremkb_ray.stages.segment import segment_naive
from theoremkb_ray.stages.tokenize import tokenize


def _docs_tbl(n=200):
    return pa.table(
        {
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
            "grp": pa.array([f"g{i % 4}" for i in range(n)]),
            "x": pa.array(np.arange(n, dtype=np.int64)),
        }
    )


def test_train_test_split_deterministic_and_disjoint():
    t = _docs_tbl()
    tr1, te1 = train_test_split(rd.from_arrow(t), "doc_id", 0.25, seed=1)
    tr2, te2 = train_test_split(rd.from_arrow(t), "doc_id", 0.25, seed=1)
    a, b = set(te1.to_pandas()["doc_id"]), set(te2.to_pandas()["doc_id"])
    assert a == b  # deterministic
    tr = set(tr1.to_pandas()["doc_id"])
    assert not (a & tr) and len(a) + len(tr) == 200
    assert 20 <= len(a) <= 80  # ~25%


def test_stratified_sample_deterministic():
    t = _docs_tbl()
    s1 = stratified_sample(
        rd.from_arrow(t), "grp", 5, key_col="doc_id", seed=3
    ).to_pandas()
    s2 = stratified_sample(
        rd.from_arrow(t), "grp", 5, key_col="doc_id", seed=3
    ).to_pandas()
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])
    assert (s1.groupby("grp").size() == 5).all()


def test_balance_context_window():
    tags = np.zeros(100, dtype=np.int32)
    tags[50] = 1  # one labelled line in doc 0 (lines 0..59)
    offsets = np.array([0, 60, 100], dtype=np.int64)  # two docs
    keep = balance_context_window(tags, offsets, window=5)
    assert keep[45:56].all()  # ±5 window kept
    assert not keep[:44].any()
    assert not keep[60:].any()  # other doc: no labels -> all dropped


def test_agreement_naive_vs_crf(gold100):
    ds = rd.from_arrow(gold100["corpus"])
    from theoremkb_ray.stages.ingest import ingest

    out = agreement(tokenize(ingest(ds))).to_pandas()
    assert len(out) == gold100["corpus"].num_rows
    # the two segmenters agree on (nearly) every synthetic doc
    assert out["equal"].mean() >= 0.95
    assert (out["n_common"] <= np.minimum(out["n_naive"], out["n_crf"])).all()


def test_agreement_spans_granularity(gold100):
    """Per-disagreement rows (reference AgreementExtractor granularity):
    one row per line where the segmenters differ, label = 'a - b'."""
    from theoremkb_ray.stages.agreement import agreement_spans
    from theoremkb_ray.stages.ingest import ingest

    tok = tokenize(ingest(rd.from_arrow(gold100["corpus"])))
    summary = agreement(tok).to_pandas()
    rows = agreement_spans(tok).to_pandas()
    # every disagreement row comes from a doc the summary marks unequal
    # ... and docs whose span sets are line-identical emit no rows
    uneq = set(summary[~summary["equal"]]["doc_id"])
    if len(rows):
        assert set(rows["doc_id"]) <= uneq
        assert (rows["label_naive"] != rows["label_crf"]).all()
        assert (
            rows["label"]
            == rows["label_naive"] + " - " + rows["label_crf"]
        ).all()


def test_agreement_spans_planted_disagreement():
    """Synthetic doc where naive finds a theorem head but the line gold
    differs — projectable disagreement rows come out exactly where the
    flat labels differ."""
    from theoremkb_ray.stages.agreement import (
        spans_to_line_labels,
    )
    from theoremkb_ray.stages.tokenize import explode_lines

    lines = pa.array(
        [["a", "b", "c", "d"], ["x", "y"]], pa.list_(pa.string())
    )
    spans = pa.array(
        [
            [
                {"label": "theorem", "group": 1, "start_line": 1, "end_line": 2}
            ],
            [],
        ],
        pa.list_(
            pa.struct(
                [
                    ("label", pa.string()),
                    ("group", pa.int64()),
                    ("start_line", pa.int64()),
                    ("end_line", pa.int64()),
                ]
            )
        ),
    )
    _, offsets = explode_lines(lines)
    lab = spans_to_line_labels(spans, offsets)
    assert list(lab) == ["O", "theorem", "theorem", "O", "O", "O"]


def test_classification_report_perfect_on_naive(gold100):
    from theoremkb_ray.stages.ingest import ingest

    ds = segment_naive(tokenize(ingest(rd.from_arrow(gold100["corpus"]))))
    rep = classification_report(ds, gold100["gold_spans"])
    assert set(rep["label"]) >= {"O", "theorem", "proof"}
    by = rep.set_index("label")
    assert by.loc["theorem", "f1"] == 1.0
    assert by.loc["O", "f1"] == 1.0


def test_key_rank64_matches_duckdb_splitmix_chain():
    """The integer-key sampling rank is the SQL-reproducible contract
    behind the sample_docs / split_stratified oracles: pin the numpy
    chain against DuckDB's UHUGEINT wrap-around reproduction."""
    import duckdb
    import numpy as np

    import __ray_entry__ as entry
    from theoremkb_ray.functions.hashing import key_rank64

    keys = np.array([0, 1, 42, 2**31, 2**63 - 1, 123456789], np.int64)
    for seed in (0, 7, 11):
        expect = key_rank64(keys, seed=seed)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ",".join(f"({int(k)})" for k in keys)
            + ") v(doc_id)"
        )
        sql = (
            "WITH "
            + entry._key_rank_sql("t", "doc_id", "doc_id", seed)
            + " SELECT doc_id, x FROM r ORDER BY doc_id"
        )
        got = dict(con.execute(sql).fetchall())
        for k, e in zip(np.sort(keys), expect[np.argsort(keys)]):
            assert got[int(k)] == int(e), (seed, k)
