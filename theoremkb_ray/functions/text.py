"""Vectorized text kernels (SURVEY.md §2.8 scalar functions).

Re-expresses the reference's scalar text helpers as batch-level numpy /
pyarrow.compute kernels; no per-row Python in hot paths beyond what the
regex engine itself requires.

Parity targets:
- ``get_pattern``  -> reference Styling/src/lib/misc/__init__.py:28-43
- ``normalize``    -> reference Styling/tools/theoremdb/extract_graph.py:21-23
- ``clean_thm``    -> reference Styling/tools/thm_similarity/thmtools.py:64-70
- ``norm_title``   -> reference Styling/tools/references/get_links.py:77,126
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_RE_NON_ALNUM = re.compile(r"[^a-zA-Z0-9@]+")
_RE_DIGITS = re.compile(r"[0-9]")
_RE_DEHYPH = re.compile(r"(\w)-\s+(\w)")
_RE_CITE = re.compile(r"\\cite\{[^}]*\}|\\label\{[^}]*\}|\\ref\{[^}]*\}")
_RE_NON_LOWER = re.compile(r"[^a-z]")


def get_pattern_array(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Normalized word pattern: digits -> '@', strip non-alnum, lowercase.

    Semantics of the reference's ``get_pattern`` re-expressed with
    pyarrow.compute kernels (vectorized, no Python loop).
    """
    a = pc.utf8_lower(texts)
    a = pc.replace_substring_regex(a, r"[0-9]", "@")
    a = pc.replace_substring_regex(a, r"[^a-z@]+", "")
    return a


def get_pattern(text: str) -> str:
    """Scalar variant of :func:`get_pattern_array` (tests/fixtures)."""
    t = _RE_DIGITS.sub("@", text.lower())
    return _RE_NON_ALNUM.sub("", t)


def normalize_text_array(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Dehyphenate (``fi-\\n nal`` -> ``final``) + NFKD normalize.

    NFKD has no Arrow kernel; applied via a numpy object pass only when
    non-ASCII rows exist (cheap check via pc kernels first).
    """
    a = pc.replace_substring_regex(texts, r"(\w)-\s+(\w)", r"\1\2")
    # NFKD: only pay the python cost for rows that are not pure ASCII.
    ascii_mask = pc.match_substring_regex(a, r"^[\x00-\x7F]*$")
    if pc.all(ascii_mask).as_py():
        return a if isinstance(a, pa.Array) else a.combine_chunks()
    py = a.to_pylist()
    out = [
        s if s is None else unicodedata.normalize("NFKD", s) for s in py
    ]
    return pa.array(out, type=pa.string())


def normalize_text(text: str) -> str:
    return unicodedata.normalize("NFKD", _RE_DEHYPH.sub(r"\1\2", text))


def clean_thm_array(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Strip LaTeX citation/label/ref macros + collapse whitespace."""
    a = pc.replace_substring_regex(
        texts, r"\\(cite|label|ref)\{[^}]*\}", ""
    )
    a = pc.replace_substring_regex(a, r"\s+", " ")
    return pc.utf8_trim_whitespace(a)


def norm_title_array(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Title normalization for equality joins: lowercase, keep [a-z]."""
    a = pc.utf8_lower(texts)
    return pc.replace_substring_regex(a, r"[^a-z]", "")


def sha256_hex(values: np.ndarray | list[str]) -> np.ndarray:
    """Per-row sha256 hex digest of utf-8 content (the row invariant).

    hashlib releases the GIL per call; the loop is I/O-shaped, not a
    vectorization miss — there is no Arrow sha256 kernel.
    """
    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        out[i] = hashlib.sha256(
            v.encode("utf-8") if isinstance(v, str) else bytes(v)
        ).hexdigest()
    return out
