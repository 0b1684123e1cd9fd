"""Per-line feature kernels (flat, vectorized).

Re-expresses the reference's per-node feature extractors — font/style
flags, word pattern, positional status (reference:
Styling/src/lib/features/String.py:49-93, TextLine.py:14-99,
status.py:8-19, misc/__init__.py:28-43) — as numpy / pyarrow.compute
kernels over the *flattened* line array of a batch of documents. Both
the naive segmenter and the CRF consume these; nothing here loops over
Python rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import RESULT_KINDS

_KIND_ARR = pa.array(RESULT_KINDS, pa.string())

#: M20 label collapse (reference: NLP/2.1 cell 12 ``round_labels``):
#: the 3-class view used by the reference's NLP classifiers.
COLLAPSE_3 = {
    **{k: "Theorem" for k in RESULT_KINDS if k != "proof"},
    "proof": "Proof",
    "O": "Basic",
}


def collapse_labels(labels: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Map fine-grained result labels -> {Theorem, Proof, Basic}."""
    fine = pa.array(list(COLLAPSE_3.keys()), pa.string())
    coarse = pa.array(list(COLLAPSE_3.values()), pa.string())
    idx = pc.index_in(labels, value_set=fine)
    return pc.take(coarse, pc.fill_null(idx, len(COLLAPSE_3) - 1))


def sniff_docclass(contents: pa.Array | pa.ChunkedArray) -> pa.Array:
    """M23 document-class sniff (reference:
    Styling/tools/theoremdb/db.py:38-58): extract the
    ``\\documentclass{...}`` argument, null when absent."""
    m = pc.extract_regex(contents, r"\\documentclass(?:\[[^\]]*\])?\{(?P<c>[^}]*)\}")
    return pc.if_else(pc.is_valid(m), pc.struct_field(m, "c"), None)


#: M1 font-family classification (reference:
#: Styling/src/lib/features/String.py:25-45 ``_extract_fonts``): the
#: same family-name regexes, applied vectorized to a font-family
#: column (e.g. from a PDF TextStyle table or a style sidecar).
_ITALIC_FONT_RE = r"(?i)((TI)[0-9]+|Ital|rsfs|EUSM)"
_BOLD_FONT_RE = r"(?i)(CMBX|Bold|NimbusRomNo9L-Medi)"
_MATH_FONT_RE = r"(?i)((CM)(SY|MI|EX)|math|Math|MSAM|MSBM|LASY|cmex|StandardSymL)"


def classify_font_families(
    families: pa.Array | pa.ChunkedArray,
) -> pa.Table:
    """Font-family strings -> (is_italic, is_math, is_bold) flags.
    One regex kernel per class over the whole column — the reference
    builds the same three flags per TextStyle declaration and joins
    them onto every word; here the flags table joins by font id."""
    return pa.table(
        {
            "is_italic": pc.match_substring_regex(families, _ITALIC_FONT_RE),
            "is_math": pc.match_substring_regex(families, _MATH_FONT_RE),
            "is_bold": pc.match_substring_regex(families, _BOLD_FONT_RE),
        }
    )


def line_patterns(flat_lines: pa.Array) -> pa.Array:
    """``get_pattern`` analog (reference:
    Styling/src/lib/misc/__init__.py:32-43): mask digit runs with '@',
    strip remaining non-letters, lowercase — "Page 10/52" and
    "Page 11/52" collapse to the same pattern."""
    p = pc.replace_substring_regex(flat_lines, r"[0-9]+", "@")
    p = pc.replace_substring_regex(p, r"[^A-Za-z@]", "")
    return pc.utf8_lower(p)


def repetitive_flags(
    flat_lines: pa.Array, offsets: np.ndarray, min_len: int = 8
) -> np.ndarray:
    """A9/M6 repetitive header/footer detection (reference:
    Styling/src/lib/features/TextLine.py:14-34,86-99 ``repetitive`` +
    extract_graph.py pattern counts): a line whose digit-masked PATTERN
    occurs >= 2 times within the SAME document (page headers/footers
    differ only in the page number) and is longer than ``min_len``.

    Vectorized: one regex pass for patterns, one hash, one np.unique
    over (doc, pattern-hash) keys — no per-document Python."""
    from ..functions.hashing import hash_strings, splitmix64

    pats = line_patterns(flat_lines)
    pat_np = pats.to_numpy(zero_copy_only=False)
    plen = pc.utf8_length(pats).to_numpy(zero_copy_only=False)
    n = len(pat_np)
    if n == 0:
        return np.zeros(0, dtype=bool)
    h = hash_strings(pat_np)
    lengths = np.diff(offsets)
    doc_idx = np.repeat(
        np.arange(len(lengths), dtype=np.uint64), lengths
    )
    key = h ^ splitmix64(doc_idx + np.uint64(0x9E3779B9))
    _, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    return (counts[inv] >= 2) & (plen > min_len)


def line_features(flat_lines: pa.Array) -> dict[str, np.ndarray | pa.Array]:
    """Vectorized per-line features over a flat line array.

    Returns numpy arrays (+ two Arrow string arrays used downstream):
      bold, italic, blank, qed, n_words, kind_id (int8, -1 = none),
      has_head_num, head_num (string), first_pattern (string).
    """
    bold = pc.starts_with(flat_lines, "\\textbf{")
    italic = pc.starts_with(flat_lines, "\\textit{")
    blank = pc.equal(flat_lines, "")
    qed = pc.equal(flat_lines, "qed")

    stripped = pc.replace_substring_regex(
        flat_lines, r"^\\text(?:bf|it)\{", ""
    )
    fw = pc.extract_regex(stripped, r"^(?P<w>[A-Za-z]+)")
    first_word = pc.if_else(
        pc.is_valid(fw), pc.struct_field(fw, "w"), pa.scalar("", pa.string())
    )
    first_pattern = pc.utf8_lower(first_word)
    kind_id = pc.index_in(first_pattern, value_set=_KIND_ARR)
    kind_id = pc.fill_null(kind_id, -1)

    hn = pc.extract_regex(
        stripped, r"^[A-Za-z]+(?: of [A-Za-z]+)? (?P<num>\d+(?:\.\d+)*)\."
    )
    has_head_num = pc.is_valid(hn)
    head_num = pc.if_else(
        has_head_num, pc.struct_field(hn, "num"), pa.scalar("", pa.string())
    )
    n_words = pc.count_substring(flat_lines, " ")
    # math marker (M1 is_math analog for the text corpus: inline $..$
    # or a \math* command)
    math = pc.match_substring_regex(flat_lines, r"\$[^$]+\$|\\math")

    def np_(a, dtype):
        return a.to_numpy(zero_copy_only=False).astype(dtype)

    return {
        "bold": np_(bold, bool),
        "italic": np_(italic, bool),
        "math": np_(math, bool),
        "blank": np_(blank, bool),
        "qed": np_(qed, bool),
        "n_words": np_(n_words, np.int32) + 1,
        "kind_id": np_(kind_id, np.int8),
        "has_head_num": np_(has_head_num, bool),
        "head_num": head_num,
        "first_pattern": first_pattern,
    }
