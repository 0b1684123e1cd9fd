"""Extractor/stage registry — the user-extension surface.

Mirrors the reference's plugin mechanism (reference:
Styling/src/lib/tkb.py:62-93 ``TheoremKB.extractors`` keyed
"{class}.{name}" + the documented registration procedure in
Styling/README.md:79-83; abstract interface
Styling/src/lib/extractors/__init__.py:22-110): a segmenter is any
callable ``(tokenized_ds, **kw) -> ds_with_spans``; register one under
a dotted name and every pipeline that takes ``segmenter=`` accepts it.
"""

from __future__ import annotations

from collections.abc import Callable

_SEGMENTERS: dict[str, Callable] = {}


def register_segmenter(name: str, fn: Callable) -> None:
    """Register a segmenter stage (``results.<name>`` style keys)."""
    _SEGMENTERS[name] = fn


def get_segmenter(name: str) -> Callable:
    if name not in _SEGMENTERS:
        raise KeyError(
            f"unknown segmenter {name!r}; known: {sorted(_SEGMENTERS)}"
        )
    return _SEGMENTERS[name]


def list_segmenters() -> list[str]:
    return sorted(_SEGMENTERS)


#: FeatureExtractor registry — the analog of the reference's
#: per-node-kind FeatureExtractor plugins (reference:
#: Styling/src/lib/features/__init__.py:15-39): a feature extractor is
#: any callable ``(flat_lines: pa.Array, doc_offsets: np.ndarray) ->
#: dict[str, np.ndarray | pa.Array]``; registered extractors are
#: picked up by stages.rollup.hierarchical_features as extra columns.
_FEATURE_EXTRACTORS: dict[str, Callable] = {}


def register_feature_extractor(name: str, fn: Callable) -> None:
    _FEATURE_EXTRACTORS[name] = fn


def get_feature_extractor(name: str) -> Callable:
    if name not in _FEATURE_EXTRACTORS:
        raise KeyError(
            f"unknown feature extractor {name!r}; "
            f"known: {sorted(_FEATURE_EXTRACTORS)}"
        )
    return _FEATURE_EXTRACTORS[name]


def list_feature_extractors() -> list[str]:
    return sorted(_FEATURE_EXTRACTORS)


def _register_builtins() -> None:
    from .stages.crf import segment_crf
    from .stages.segment import segment_naive

    from .stages.nn import segment_cnn1d

    register_segmenter("results.naive", segment_naive)
    register_segmenter("results.crf", segment_crf)
    register_segmenter("results.cnn1d", segment_cnn1d)


_register_builtins()
