"""Arrow schemas and label/predicate taxonomies.

Taxonomy mirrors the reference's ``ResultsAnnotationClass`` labels
(reference: Styling/src/lib/classes/__init__.py:120-131) plus the
``proof`` kind; predicates mirror the graph CSVs the reference emits
(reference: Styling/tools/theoremdb/extract_graph.py:298-307).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- taxonomy

#: Result kinds = the reference's results-class labels (incl. proof).
RESULT_KINDS: tuple[str, ...] = (
    "lemma",
    "theorem",
    "proposition",
    "definition",
    "remark",
    "corollary",
    "claim",
    "conjecture",
    "assumption",
    "proof",
)

#: Kinds that carry an identity number ("Theorem 3.1") and can be cited.
NUMBERED_KINDS: tuple[str, ...] = tuple(k for k in RESULT_KINDS if k != "proof")

#: Abbreviations recognized in running text
#: (reference: Styling/tools/theoremdb/extract_graph.py:15-18).
ABBREVIATIONS: dict[str, str] = {
    "thm.": "theorem",
    "lem.": "lemma",
    "prop.": "proposition",
}

#: KG predicates (reference graph tables: node table = "states",
#: edge table intra/extra = "cites"; proof attachment = "proved_by").
PRED_STATES = "states"
PRED_PROVED_BY = "proved_by"
PRED_CITES = "cites"
PREDICATES: tuple[str, ...] = (PRED_STATES, PRED_PROVED_BY, PRED_CITES)

# ------------------------------------------------------- sequence labels

#: Linear-chain tagger state space: O + B-/I- per kind (BIO over lines).
TAG_O = "O"
TAGS: tuple[str, ...] = (TAG_O,) + tuple(
    f"{p}-{k}" for k in RESULT_KINDS for p in ("B", "I")
)
TAG_TO_ID: dict[str, int] = {t: i for i, t in enumerate(TAGS)}
N_TAGS = len(TAGS)

# ---------------------------------------------------------------- schemas

#: Input corpus table — exactly BASELINE.json's input_hint shape.
CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

#: Corpus after ingest: derived identity + per-row invariant.
INGESTED_FIELDS = [
    ("doc_id", pa.string()),
    ("content_sha256", pa.string()),
]

#: Per-document token (= line) list column after tokenize.
TOKEN_STRUCT = pa.struct(
    [
        ("line", pa.int32()),
        ("text", pa.string()),
        ("bold", pa.bool_()),
        ("italic", pa.bool_()),
        ("blank", pa.bool_()),
    ]
)

#: Extracted span (offset-interval analog of the reference's LabelledBBX;
#: reference: Styling/src/lib/misc/bounding_box.py:132-189).
SPAN_STRUCT = pa.struct(
    [
        ("label", pa.string()),
        ("group", pa.int64()),
        ("start_line", pa.int64()),
        ("end_line", pa.int64()),
    ]
)

#: Result rows (KG node candidates) after stitching.
RESULT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("repo", pa.string()),
        ("kind", pa.string()),
        ("group", pa.int64()),
        ("name", pa.string()),  # e.g. "theorem 3.1" (lowercase) or "proof 4"
        ("entity_id", pa.string()),  # f"{doc_id}#{name}"
        ("text", pa.string()),  # normalized body text incl. markers
        ("start_line", pa.int64()),
        ("end_line", pa.int64()),
    ]
)

#: The triple store.
TRIPLE_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object", pa.string()),
        ("confidence", pa.float64()),
        ("provenance", pa.string()),  # emitting stage name
    ]
)

#: Citation-link side table (analog of links_%i.csv rows
#: (pdf_from, tag, pdf_to); reference: Styling/tools/theoremdb/db.py:13-26).
LINKS_SCHEMA = pa.schema(
    [
        ("doc_from", pa.string()),
        ("tag", pa.string()),
        ("doc_to", pa.string()),
    ]
)


def entity_id(doc_id: str, name: str) -> str:
    """Canonical raw entity id: ``{doc_id}#{name}`` (FIXTURES.md F3)."""
    return f"{doc_id}#{name}"
