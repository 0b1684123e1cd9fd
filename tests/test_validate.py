"""Declarative expectations (stages/validate.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.stages.validate import ValidationError, validate


def _ds(blocks=5):
    n = 500
    ids = np.arange(n, dtype=np.int64)
    ids[7] = 6  # planted duplicate
    vals = np.linspace(0, 100, n)
    vals[3] = -5.0  # planted out-of-range
    langs = ["en"] * n
    langs[10] = "xx"  # planted out-of-set
    shas = ["a" * 64] * n
    shas[20] = "not-a-sha"  # planted regex violation
    texts: list = ["ok"] * n
    texts[30] = None  # planted null
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "score": pa.array(vals, pa.float64()),
                "lang": pa.array(langs, pa.string()),
                "sha": pa.array(shas, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)


RULES = [
    {"column": "text", "check": "not_null"},
    {"column": "doc_id", "check": "unique"},
    {"column": "score", "check": "in_range", "lo": 0, "hi": 100},
    {"column": "lang", "check": "in_set", "values": ["en", "de", "fr"]},
    {"column": "sha", "check": "regex", "pattern": "[a-f0-9]{64}"},
]


def test_report_counts_planted_violations():
    rep = validate(_ds(), RULES).set_index("rule")
    assert (rep["rows"] == 500).all()
    assert rep.loc["text:not_null", "violations"] == 1
    assert rep.loc["doc_id:unique", "violations"] == 1
    assert rep.iloc[2]["violations"] == 1  # in_range
    assert rep.iloc[3]["violations"] == 1  # in_set
    assert rep.iloc[4]["violations"] == 1  # regex


def test_raise_mode_lists_failures():
    with pytest.raises(ValidationError) as e:
        validate(_ds(), RULES, mode="raise")
    for frag in ["text:not_null", "doc_id:unique"]:
        assert frag in str(e.value)


def test_clean_table_passes():
    n = 200
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "lang": pa.array(["en"] * n, pa.string()),
            }
        )
    ).repartition(3)
    rep = validate(
        ds,
        [
            {"column": "doc_id", "check": "unique"},
            {"column": "lang", "check": "in_set", "values": ["en"]},
        ],
        mode="raise",
    )
    assert (rep["violations"] == 0).all()
