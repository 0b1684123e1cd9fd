"""Mention extraction: regex sweep over result text for references to
other results, intra- and cross-document.

Re-expresses the reference's ``find_ref_results`` /
``find_thm_start`` / ``find_thm_proof`` family (reference:
Styling/tools/theoremdb/extract_graph.py:26-130): a mention is a
result-kind word (full, plural, or abbreviated "Thm./Lem./Prop.")
followed by one or more dotted numbers ("3.1", "3.1 and 3.2"); a
``\\cite{tag}`` marker within ±5 words of the mention makes it a
cross-document reference (the analog of the reference's ``<LINK:...>``
proximity rule), otherwise it is intra-document. The result's own name
and (for proofs) the proof's target are excluded, mirroring the
reference's self-reference skip (extract_graph.py:59).

Stateful stage: the regexes are compiled once per actor
(``__init__``), scanning is per-batch.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..schema import ABBREVIATIONS, NUMBERED_KINDS, PRED_CITES, entity_id

_KIND_ALTS = sorted(
    [k for k in NUMBERED_KINDS] + list(ABBREVIATIONS.keys()),
    key=len,
    reverse=True,
)


def _kind_regex() -> str:
    alts = []
    for k in _KIND_ALTS:
        if k.endswith("."):
            alts.append(re.escape(k[:-1]) + r"\.")
        elif k == "corollary":
            alts.append(r"corollar(?:y|ies)")
        else:
            alts.append(re.escape(k) + r"s?")
    return "|".join(alts)


class MentionExtractor:
    """map_batches callable: result rows -> mention rows.

    Output columns: doc_id, src_entity, src_group, kind, num, cite_tag
    ("" if intra-document). One row per (mention kind, number).
    ``src_group`` is the source result's per-document ordinal — the
    reference's ``nres_in`` edge-table column
    (extract_graph.py:274-307).
    """

    def __init__(self) -> None:
        # [ ]+ not \s+: a mention phrase never spans a line break
        self.re_mention = re.compile(
            r"\b(" + _kind_regex() + r")[ ]+"
            r"(\d+(?:\.\d+)*(?:[ ]?(?:and|,|&)[ ]\d+(?:\.\d+)*)*)",
            re.IGNORECASE,
        )
        self.re_num = re.compile(r"\d+(?:\.\d+)*")
        self.re_cite = re.compile(r"\\cite\{([^}]*)\}")
        # the kind vocabulary is ~dozens of surface forms; memoizing
        # kills the per-mention lower()/endswith chain (measured ~0.5s
        # per 245k mentions)
        self._kind_memo: dict[str, str] = {}

    def _norm_kind(self, word: str) -> str:
        k = self._kind_memo.get(word)
        if k is not None:
            return k
        w = word.lower()
        if w in ABBREVIATIONS:
            k = ABBREVIATIONS[w]
        elif w.endswith("ies"):
            k = "corollary"
        elif w.endswith("s") and w[:-1] in NUMBERED_KINDS:
            k = w[:-1]
        else:
            k = w
        self._kind_memo[word] = k
        return k

    #: word-distance window for associating a \cite with a mention
    #: (the reference's ±5-token <LINK:..> proximity rule,
    #: extract_graph.py:84-93)
    CITE_WINDOW = 5

    def _nearby_cite(self, text: str, start: int, end: int) -> str:
        """Nearest \\cite{tag} within ±CITE_WINDOW words of the mention,
        confined to the SAME LINE (the analog of the reference's ±5-token
        <LINK:..> proximity rule, extract_graph.py:84-93; same-line
        confinement avoids hijacking a mention with the previous
        sentence's citation)."""
        nl = text.rfind("\n", 0, start)
        before = text[nl + 1 : start].split()
        nl2 = text.find("\n", end)
        after = text[end : nl2 if nl2 >= 0 else len(text)].split()
        for dist in range(self.CITE_WINDOW):
            if dist < len(before):
                m = self.re_cite.search(before[-1 - dist])
                if m:
                    return m.group(1)
            if dist < len(after):
                m = self.re_cite.search(after[dist])
                if m:
                    return m.group(1)
        return ""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Arrow C++ prefilters replace two per-row/per-mention Python
        # costs: rows with no possible mention never reach finditer,
        # and rows with no \cite marker skip _nearby_cite entirely
        # (the common case — the window search splits the mention's
        # line into words on every call)
        has_mention = pc.match_substring_regex(
            batch["text"],
            r"(?i)\b(" + _kind_regex() + r")[ ]+\d",
        )
        batch = batch.filter(has_mention)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "src_entity": pa.array([], pa.string()),
                    "src_group": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.string()),
                    "num": pa.array([], pa.string()),
                    "cite_tag": pa.array([], pa.string()),
                }
            )
        has_cite = pc.match_substring(batch["text"], "\\cite{").to_numpy(
            zero_copy_only=False
        )
        texts = batch["text"].to_numpy(zero_copy_only=False)
        docs = batch["doc_id"].to_numpy(zero_copy_only=False)
        eids = batch["entity_id"].to_numpy(zero_copy_only=False)
        names = batch["name"].to_numpy(zero_copy_only=False)
        targets = batch["proof_target_name"].to_numpy(zero_copy_only=False)
        groups = (
            batch["group"].to_numpy(zero_copy_only=False)
            if "group" in batch.column_names
            else np.zeros(batch.num_rows, dtype=np.int64)
        )

        o_doc: list[str] = []
        o_src: list[str] = []
        o_grp: list[int] = []
        o_kind: list[str] = []
        o_num: list[str] = []
        o_tag: list[str] = []
        for i in range(len(texts)):
            text = texts[i]
            own = names[i].lower()
            row_has_cite = has_cite[i]
            # a proof's explicit target is excluded only when mentioned in
            # the HEAD line ("Proof of Theorem 1.3."); body mentions of the
            # same theorem are genuine references
            target = targets[i].lower() if targets[i] else None
            head_end = text.find("\n")
            if head_end < 0:
                head_end = len(text)
            seen: set[tuple[str, str]] = set()
            for m in self.re_mention.finditer(text):
                kind = self._norm_kind(m.group(1))
                tag = (
                    self._nearby_cite(text, m.start(), m.end())
                    if row_has_cite
                    else ""
                )
                in_head = m.start() < head_end
                for num in self.re_num.findall(m.group(2)):
                    name = f"{kind} {num}"
                    if name == own or (name, tag) in seen:
                        continue
                    if in_head and target is not None and name == target:
                        continue
                    seen.add((name, tag))
                    o_doc.append(docs[i])
                    o_src.append(eids[i])
                    o_grp.append(int(groups[i]))
                    o_kind.append(kind)
                    o_num.append(num)
                    o_tag.append(tag)
        return pa.table(
            {
                "doc_id": pa.array(o_doc, pa.string()),
                "src_entity": pa.array(o_src, pa.string()),
                "src_group": pa.array(o_grp, pa.int64()),
                "kind": pa.array(o_kind, pa.string()),
                "num": pa.array(o_num, pa.string()),
                "cite_tag": pa.array(o_tag, pa.string()),
            }
        )


def extract_mentions(results_ds, batch_size: int = 2048, concurrency=(1, 4)):
    """Actor pool so regexes compile once per worker (SURVEY.md T-rule)."""
    return results_ds.map_batches(
        MentionExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def intra_cites_batch(batch: pa.Table) -> pa.Table:
    """Intra-document mentions -> cites triples (no join needed).

    Provenance carries the source result ordinal (``|n=<nres_in>``) so
    the graph-CSV export can reproduce the reference's edge-table shape
    without re-reading the results table."""
    tag = batch["cite_tag"].to_numpy(zero_copy_only=False)
    intra = batch.filter(pa.array(tag == ""))
    doc = intra["doc_id"].to_numpy(zero_copy_only=False)
    kind = intra["kind"].to_numpy(zero_copy_only=False)
    num = intra["num"].to_numpy(zero_copy_only=False)
    src = intra["src_entity"].to_numpy(zero_copy_only=False)
    grp = (
        intra["src_group"].to_numpy(zero_copy_only=False)
        if "src_group" in intra.column_names
        else np.zeros(intra.num_rows, dtype=np.int64)
    )
    objs = [entity_id(d, f"{k} {n}") for d, k, n in zip(doc, kind, num)]
    provs = [f"mention.intra|n={g}" for g in grp]
    n_rows = len(objs)
    return pa.table(
        {
            "subject": pa.array(list(src), pa.string()),
            "predicate": pa.array([PRED_CITES] * n_rows, pa.string()),
            "object": pa.array(objs, pa.string()),
            "confidence": pa.array([1.0] * n_rows, pa.float64()),
            "provenance": pa.array(provs, pa.string()),
        }
    )
