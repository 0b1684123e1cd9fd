"""Annotation classes — label taxonomies + parent-gating rules.

Re-expresses the reference's annotation-class system (reference:
Styling/src/lib/classes/__init__.py:20-141): an annotation class is a
named label set, optionally constrained to live inside a parent
class's labels (e.g. ``results`` spans live only in segmentation
``body``/``annex`` regions). Classes are a registry — the second half
of the §2.10 user-extension surface next to segmenter registration
(registry.py).

The parent constraint is enforced by :func:`gate_spans_to_parent`, a
zero-shuffle per-batch kernel (both span layers live on the same
document row), re-expressing the reference's apply-time parent filter
(Styling/src/lib/extractors/__init__.py parent handling + the
``AnnotationClassFilter`` containment semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .schema import RESULT_KINDS


@dataclass(frozen=True)
class AnnotationClassFilter:
    """A subset of labels from a given class (reference
    classes/__init__.py:21-30)."""

    name: str
    labels: tuple[str, ...]


@dataclass(frozen=True)
class AnnotationClass:
    """A named label set + the parent classes it can live in."""

    name: str
    labels: tuple[str, ...]
    parents: tuple[AnnotationClassFilter, ...] = field(default_factory=tuple)


SEGMENTATION_CLASS = AnnotationClass(
    "segmentation",
    (
        "acknowledgement",
        "front",
        "headnote",
        "footnote",
        "body",
        "bibliography",
        "page",
        "annex",
    ),
)

HEADER_CLASS = AnnotationClass(
    "header",
    ("title",),
    (AnnotationClassFilter("segmentation", ("front",)),),
)

RESULTS_CLASS = AnnotationClass(
    "results",
    tuple(RESULT_KINDS),
    (AnnotationClassFilter("segmentation", ("body", "annex")),),
)

MISC_CLASS = AnnotationClass("misc", ())

_CLASSES: dict[str, AnnotationClass] = {}


def register_annotation_class(cls: AnnotationClass) -> None:
    _CLASSES[cls.name] = cls


def get_annotation_class(name: str) -> AnnotationClass:
    if name not in _CLASSES:
        raise KeyError(
            f"unknown annotation class {name!r}; known: {sorted(_CLASSES)}"
        )
    return _CLASSES[name]


def list_annotation_classes() -> list[str]:
    return sorted(_CLASSES)


for _c in (SEGMENTATION_CLASS, HEADER_CLASS, RESULTS_CLASS, MISC_CLASS):
    register_annotation_class(_c)


# ------------------------------------------------------- span validation


def validate_span_labels(
    spans_col: pa.Array | pa.ChunkedArray, class_name: str
) -> None:
    """Raise ValueError if any span label is outside the class's label
    set (the reference's per-class label invariant). Vectorized: one
    index_in over the flattened struct field."""
    import pyarrow.compute as pc

    cls = get_annotation_class(class_name)
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    labels = spans_col.values.field("label")
    if len(labels) == 0:
        return
    ok = pc.is_in(
        labels, value_set=pa.array(list(cls.labels), pa.string())
    )
    bad = pc.filter(labels, pc.invert(ok))
    if len(bad):
        raise ValueError(
            f"labels outside class {class_name!r}: "
            f"{sorted(set(bad.to_pylist()))[:5]}"
        )


def gate_spans_to_parent(
    child_col: pa.Array | pa.ChunkedArray,
    parent_col: pa.Array | pa.ChunkedArray,
    allowed_parent_labels: tuple[str, ...] | list[str],
) -> pa.Array:
    """Keep child spans fully contained in a same-document parent span
    whose label is allowed. Both columns are list<SPAN_STRUCT> aligned
    per document row; returns the filtered child list column.

    Vectorized: parent intervals flatten to sorted (doc, start) keys;
    one searchsorted per child batch finds the candidate parent, one
    comparison validates containment."""
    if isinstance(child_col, pa.ChunkedArray):
        child_col = child_col.combine_chunks()
    if isinstance(parent_col, pa.ChunkedArray):
        parent_col = parent_col.combine_chunks()

    def flat(col):
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = col.values
        if off[0] != 0:
            vals = vals.slice(off[0], off[-1] - off[0])
            off = off - off[0]
        doc = np.repeat(np.arange(len(off) - 1, dtype=np.int64), np.diff(off))
        return vals, off, doc

    c_vals, c_off, c_doc = flat(child_col)
    p_vals, p_off, p_doc = flat(parent_col)
    if len(c_vals) == 0:
        return child_col
    import pyarrow.compute as pc

    p_ok = pc.is_in(
        p_vals.field("label"),
        value_set=pa.array(list(allowed_parent_labels), pa.string()),
    ).to_numpy(zero_copy_only=False).astype(bool)
    p_s = p_vals.field("start_line").to_numpy(zero_copy_only=False)[p_ok]
    p_e = p_vals.field("end_line").to_numpy(zero_copy_only=False)[p_ok]
    p_d = p_doc[p_ok]
    c_s = c_vals.field("start_line").to_numpy(zero_copy_only=False)
    c_e = c_vals.field("end_line").to_numpy(zero_copy_only=False)
    if len(p_s) == 0:
        keep = np.zeros(len(c_s), dtype=bool)
    else:
        # sort allowed parents by (doc, start); assume non-overlapping
        # parents within a doc (segmentation regions are disjoint) —
        # the candidate container is the last parent starting <= child
        order = np.lexsort((p_s, p_d))
        p_d, p_s, p_e = p_d[order], p_s[order], p_e[order]
        # composite sort key (doc << 32 | start); line counts << 2^32
        key_p = (p_d.astype(np.int64) << 32) | p_s.astype(np.int64)
        key_c = (c_doc.astype(np.int64) << 32) | c_s.astype(np.int64)
        pos = np.searchsorted(key_p, key_c, side="right") - 1
        valid = pos >= 0
        pos_c = pos.clip(min=0)
        keep = (
            valid
            & (p_d[pos_c] == c_doc)
            & (p_s[pos_c] <= c_s)
            & (c_e <= p_e[pos_c])
        )
    # rebuild the list column with kept children
    kept_per_doc = np.zeros(len(c_off) - 1, dtype=np.int64)
    np.add.at(kept_per_doc, c_doc[keep], 1)
    new_off = np.zeros(len(c_off), dtype=np.int64)
    np.cumsum(kept_per_doc, out=new_off[1:])
    new_vals = c_vals.filter(pa.array(keep))
    return pa.ListArray.from_arrays(
        pa.array(new_off, pa.int32()), new_vals
    )
