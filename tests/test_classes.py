"""Annotation classes, parent gating, font classification, and the
feature-extractor registry (§2.10 + M1)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.classes import (
    RESULTS_CLASS,
    gate_spans_to_parent,
    get_annotation_class,
    list_annotation_classes,
    validate_span_labels,
)
from theoremkb_ray.schema import SPAN_STRUCT


def _spans(per_doc):
    return pa.array(per_doc, pa.list_(SPAN_STRUCT))


def _mk(label, s, e, group=1):
    return {"label": label, "group": group, "start_line": s, "end_line": e}


def test_builtin_classes():
    assert {"segmentation", "header", "results", "misc"} <= set(
        list_annotation_classes()
    )
    assert "theorem" in get_annotation_class("results").labels
    assert get_annotation_class("header").parents[0].name == "segmentation"
    assert RESULTS_CLASS.parents[0].labels == ("body", "annex")


def test_validate_span_labels():
    good = _spans([[_mk("theorem", 0, 2)], []])
    validate_span_labels(good, "results")
    bad = _spans([[_mk("banana", 0, 2)]])
    with pytest.raises(ValueError, match="banana"):
        validate_span_labels(bad, "results")


def test_gate_spans_to_parent():
    children = _spans(
        [
            [_mk("theorem", 2, 3), _mk("proof", 8, 9)],
            [_mk("lemma", 1, 1)],
        ]
    )
    parents = _spans(
        [
            [_mk("front", 0, 1), _mk("body", 2, 5)],
            [_mk("bibliography", 0, 4)],
        ]
    )
    gated = gate_spans_to_parent(children, parents, ("body", "annex"))
    out = gated.to_pylist()
    # doc 0: theorem@2-3 inside body@2-5 kept; proof@8-9 outside -> dropped
    assert [s["label"] for s in out[0]] == ["theorem"]
    # doc 1: lemma inside bibliography (not allowed) -> dropped
    assert out[1] == []


def test_gate_spans_cross_doc_no_leak():
    # parent in doc 0 must not capture a child in doc 1
    children = _spans([[], [_mk("theorem", 2, 3)]])
    parents = _spans([[_mk("body", 0, 10)], []])
    gated = gate_spans_to_parent(children, parents, ("body",))
    assert gated.to_pylist() == [[], []]


def test_classify_font_families():
    from theoremkb_ray.stages.features import classify_font_families

    fams = pa.array(
        [
            "CMTI12",       # italic (TI[0-9]+)
            "CMBX10",       # bold
            "CMSY7",        # math
            "NimbusRomNo9L-Medi",  # bold
            "Times-Italic",  # italic (Ital)
            "CMR10",        # none
            "MSBM5",        # math
        ]
    )
    t = classify_font_families(fams)
    assert t["is_italic"].to_pylist() == [
        True, False, False, False, True, False, False,
    ]
    assert t["is_bold"].to_pylist() == [
        False, True, False, True, False, False, False,
    ]
    assert t["is_math"].to_pylist() == [
        False, False, True, False, False, False, True,
    ]


def test_math_line_flag():
    from theoremkb_ray.stages.features import line_features

    f = line_features(
        pa.array(["let $x = 1$ hold", "no math here", "\\mathbb{R} rules"])
    )
    assert list(f["math"]) == [True, False, True]


def test_feature_extractor_registry_flows_into_rollup(gold100):
    from theoremkb_ray.registry import (
        _FEATURE_EXTRACTORS,
        list_feature_extractors,
        register_feature_extractor,
    )
    from theoremkb_ray.stages.ingest import ingest
    from theoremkb_ray.stages.rollup import hierarchical_features
    from theoremkb_ray.stages.tokenize import tokenize

    def has_qed(flat_lines, doc_offsets):
        import pyarrow.compute as pc

        return {"qedish": pc.equal(flat_lines, "qed")}

    register_feature_extractor("custom", has_qed)
    try:
        assert "custom" in list_feature_extractors()
        ds = hierarchical_features(
            tokenize(ingest(rd.from_arrow(gold100["corpus"]))),
            deltas=False,
        )
        df = ds.to_pandas()
        assert "custom_qedish" in df.columns
        assert df["custom_qedish"].any()
    finally:
        _FEATURE_EXTRACTORS.pop("custom", None)
