"""Word-granularity sequence tagging — the reference's word-based CRF.

Re-expresses the reference's word-level model (428 papers, 5.6M
labelled words; reference: Styling/tools/notebooks/
Training_word_based.ipynb cells 2-16) and its per-word feature
extractor (reference: Styling/src/lib/features/String.py:49-93 —
word text/pattern, ``has_number``, ``is_special``, case, length,
position-in-line, font flags) as vectorized Arrow/numpy kernels over
the FLATTENED word array of a batch of documents, decoded by the same
:class:`~theoremkb_ray.stages.crf.LinearChainTagger` (batched Viterbi)
at word granularity.

Prefix/suffix features: the reference one-hots raw word strings into
the CRF; at corpus scale that vocabulary explodes, so prefixes and
suffixes (2 chars each) are HASHED into 8 indicator buckets — the
standard feature-hashing re-expression, deterministic and vocabulary-
free.

Shapes: one document = one padded Viterbi row; a word's tags are
independent of batch composition (tests/test_words.py).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings
from ..schema import ABBREVIATIONS, N_TAGS, RESULT_KINDS, TAG_TO_ID, TAGS
from .tokenize import explode_lines

#: 45 word-intrinsic features + 14 enclosing-line context features +
#: 11 block-context features (the reference's hierarchical
#: String ⊂ TextLine ⊂ TextBlock feature join,
#: Styling/src/lib/paper/features.py:43-79: every word row carries its
#: ancestors' features)
N_WORD_FEATS = 70
WORD_MODEL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "crf_word.npz",
)

_KIND_SET = pa.array(RESULT_KINDS, pa.string())
_ABBREV_SET = pa.array(
    [a.rstrip(".") for a in ABBREVIATIONS], pa.string()
)


def explode_words(
    lines_col: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a per-doc ``lines`` list column to the word level.

    Returns ``(flat_words, word_offsets, line_idx, word_in_line)``:
    doc i owns ``flat_words[word_offsets[i]:word_offsets[i+1]]``;
    ``line_idx`` is each word's LOCAL line number within its document
    (the hook for projecting line-level gold spans onto words);
    ``word_in_line`` is the word's index within its line (the
    reference's ``#word_position`` status, String.py:80).
    Blank lines contribute one empty-string word, so line structure is
    preserved (tagged O everywhere)."""
    flat_lines, line_off = explode_lines(lines_col)
    words_nested = pc.utf8_split_whitespace(flat_lines)
    wn = (
        words_nested.combine_chunks()
        if isinstance(words_nested, pa.ChunkedArray)
        else words_nested
    )
    w_off = wn.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_words = wn.values
    if w_off[0] != 0:
        flat_words = flat_words.slice(w_off[0])
        w_off = w_off - w_off[0]
    words_per_line = np.diff(w_off)
    n_words = int(w_off[-1])

    # local line index per word
    n_lines = len(words_per_line)
    line_of_word = np.repeat(np.arange(n_lines, dtype=np.int64), words_per_line)
    lines_per_doc = np.diff(line_off)
    doc_of_line = np.repeat(
        np.arange(len(lines_per_doc), dtype=np.int64), lines_per_doc
    )
    local_line = (
        np.arange(n_lines, dtype=np.int64) - line_off[:-1][doc_of_line]
    )
    line_idx = local_line[line_of_word]

    # word offsets per doc: words of doc i = words of its line range
    word_offsets = w_off[line_off]

    # word index within its line
    starts_per_line = w_off[:-1]
    word_in_line = (
        np.arange(n_words, dtype=np.int64) - starts_per_line[line_of_word]
    )
    return flat_words, word_offsets, line_idx, word_in_line


def word_feature_matrix(
    flat_words: pa.Array,
    word_offsets: np.ndarray,
    line_idx: np.ndarray,
    word_in_line: np.ndarray,
) -> np.ndarray:
    """(n_words, N_WORD_FEATS) boolean indicators (String.py:49-93
    parity: case, has_number, is_special, length, position, kind/abbrev
    lexicon, hashed prefix/suffix, ±1-word context)."""
    n = len(flat_words)
    X = np.zeros((n, N_WORD_FEATS), dtype=bool)
    if n == 0:
        return X
    X[:, 0] = True  # bias

    def np_(a, dtype=bool):
        return a.to_numpy(zero_copy_only=False).astype(dtype)

    length = np_(pc.utf8_length(flat_words), np.int32)
    lower = pc.utf8_lower(flat_words)
    # strip style markers + punctuation for lexicon matching
    core = pc.replace_substring_regex(
        lower, r"^\\text(?:bf|it)\{|[^a-z0-9.]", ""
    )
    core_word = pc.replace_substring_regex(core, r"[.]+$", "")

    X[:, 1] = length == 0  # blank-line placeholder
    X[:, 2] = (length >= 1) & (length <= 2)
    X[:, 3] = (length >= 3) & (length <= 6)
    X[:, 4] = length >= 7
    X[:, 5] = np_(pc.match_substring_regex(flat_words, r"[0-9]"))  # has_number
    X[:, 6] = np_(pc.match_substring_regex(flat_words, r"[^A-Za-z0-9]"))  # is_special
    X[:, 7] = np_(pc.match_substring_regex(flat_words, r"^[A-Z]"))  # capitalized
    X[:, 8] = np_(pc.match_substring_regex(flat_words, r"^[a-z]+$"))  # all lower
    X[:, 9] = np_(pc.match_substring_regex(flat_words, r"^[A-Z]+$"))  # all caps

    kind_id = pc.fill_null(pc.index_in(core_word, value_set=_KIND_SET), -1)
    kid = np_(kind_id, np.int8)
    for k in range(len(RESULT_KINDS)):
        X[:, 10 + k] = kid == k
    X[:, 20] = np_(pc.is_in(core_word, value_set=_ABBREV_SET))  # Thm/Lem/Prop
    X[:, 21] = np_(pc.match_substring_regex(core, r"^\d+(\.\d+)*\.?$"))  # dotted num
    X[:, 22] = np_(pc.starts_with(flat_words, "\\textbf{"))
    X[:, 23] = np_(pc.starts_with(flat_words, "\\textit{"))
    X[:, 24] = np_(pc.ends_with(flat_words, "."))
    X[:, 25] = np_(pc.equal(flat_words, "qed"))

    # hashed 2-char prefix/suffix indicator buckets (cols 26-33, 34-41)
    pre = hash_strings(np_(pc.utf8_slice_codeunits(lower, 0, 2), object)) % 8
    suf = hash_strings(
        np_(pc.utf8_slice_codeunits(pc.utf8_reverse(lower), 0, 2), object)
    ) % 8
    rows = np.arange(n)
    X[rows, 26 + pre.astype(np.int64)] = True
    X[rows, 34 + suf.astype(np.int64)] = True

    # position + ±1-word context (reset at doc boundaries)
    doc_first = np.zeros(n, dtype=bool)
    starts = word_offsets[:-1][word_offsets[:-1] < n]
    doc_first[starts] = True
    X[:, 42] = word_in_line == 0  # first word of its line
    prev_kind = np.roll(kid >= 0, 1)
    prev_kind[doc_first] = False
    X[:, 43] = prev_kind  # previous word is a kind word
    prev_num = np.roll(X[:, 21], 1)
    prev_num[doc_first] = False
    X[:, 44] = prev_num  # previous word is a dotted number
    return X


def featurize_words(lines_col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """lines list column -> (X, word_offsets, line_idx): full word
    feature matrix including the ENCLOSING-LINE context block (cols
    45-58): the word model sees its line's style/kind head/blank/qed
    state — the hierarchical String ⊂ TextLine feature join the
    reference computes by DFS over the ALTO tree
    (Styling/src/lib/paper/features.py:43-79)."""
    from .features import line_features

    flat_lines, line_off = explode_lines(lines_col)
    flat_words, w_off, line_idx, wil = explode_words(lines_col)
    X = word_feature_matrix(flat_words, w_off, line_idx, wil)
    n = len(X)
    if n == 0:
        return X, w_off, line_idx

    lf = line_features(flat_lines)
    # words-per-line mapping: global line index of each word
    lines_per_doc = np.diff(line_off)
    doc_of_line = np.repeat(
        np.arange(len(lines_per_doc), dtype=np.int64), lines_per_doc
    )
    g_line = line_off[:-1][doc_of_line]  # first-line offset per line's doc
    # line_idx is doc-local; global line = doc's first line + local idx
    doc_of_word = np.repeat(
        np.arange(len(w_off) - 1, dtype=np.int64), np.diff(w_off)
    )
    gline_of_word = line_off[:-1][doc_of_word] + line_idx

    styled = lf["bold"] | lf["italic"]
    X[:, 45] = lf["blank"][gline_of_word]
    X[:, 46] = styled[gline_of_word]
    lkid = lf["kind_id"][gline_of_word]
    for k in range(len(RESULT_KINDS)):
        X[:, 47 + k] = lkid == k
    X[:, 57] = lf["has_head_num"][gline_of_word]
    X[:, 58] = lf["qed"][gline_of_word]

    # block context (cols 59-69): which naive styled-head RUN (head
    # line .. next blank/head) the word's line belongs to, per kind —
    # the TextBlock-ancestor features of the reference's hierarchy.
    # Without these, interior span words are emission-identical to O
    # filler and the tagger truncates long spans (measured).
    from .segment import naive_spans_flat

    ns = naive_spans_flat(flat_lines, line_off)
    line_kind = np.full(len(flat_lines), -1, dtype=np.int8)
    g_start = line_off[:-1][ns["doc_idx"]] + ns["start_line"]
    g_end = line_off[:-1][ns["doc_idx"]] + ns["end_line"]
    for s, e, k in zip(g_start, g_end, ns["label_id"]):  # few spans/batch
        line_kind[s : e + 1] = k
    wkid = line_kind[gline_of_word]
    for k in range(len(RESULT_KINDS)):
        X[:, 59 + k] = wkid == k
    X[:, 69] = wkid >= 0  # inside any naive run
    return X, w_off, line_idx


def gold_word_tags(
    word_offsets: np.ndarray,
    line_idx: np.ndarray,
    doc_ids: np.ndarray,
    gold_by_doc: dict[str, list],
) -> np.ndarray:
    """Project LINE-level gold spans onto the flat word array as BIO
    tag ids (first word of a span = B-label, rest I-label) — the
    word-level analog of crf.gold_tags_flat."""
    n = int(word_offsets[-1])
    y = np.zeros(n, dtype=np.int32)
    for i, d in enumerate(doc_ids):
        lo, hi = word_offsets[i], word_offsets[i + 1]
        li = line_idx[lo:hi]
        for label, s0, s1 in gold_by_doc.get(d, []):
            m = (li >= s0) & (li <= s1)
            idx = np.flatnonzero(m)
            if len(idx) == 0:
                continue
            y[lo + idx] = TAG_TO_ID[f"I-{label}"]
            y[lo + idx[0]] = TAG_TO_ID[f"B-{label}"]
    return y


class WordCRFSegmenter:
    """Actor-pool callable: tokenized batch -> batch + word-level
    ``spans`` column (start_line/end_line carry the covered LINE range,
    so downstream stitch/emit consume word-model output unchanged)."""

    def __init__(self, model_path: str = WORD_MODEL_PATH) -> None:
        from .crf import LinearChainTagger

        self.model = LinearChainTagger.load(model_path)

    def decode_words(self, batch: pa.Table) -> tuple[np.ndarray, tuple]:
        X, w_off, line_idx = featurize_words(batch["lines"])
        tags = self.model.decode_batch(X, w_off)
        return tags, (w_off, line_idx)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .crf import tags_to_spans_flat
        from .segment import spans_to_list_column

        tags, (w_off, line_idx) = self.decode_words(batch)
        spans = tags_to_spans_flat(tags, w_off)
        # word positions -> line ranges (start/end word index is local
        # to the doc; line_idx is already doc-local)
        doc_base = w_off[:-1][spans["doc_idx"]]
        spans["start_line"] = line_idx[doc_base + spans["start_line"]]
        spans["end_line"] = line_idx[doc_base + spans["end_line"]]
        col = spans_to_list_column(spans, batch.num_rows)
        return batch.append_column("spans", col)


def segment_words(
    ds, model_path: str = WORD_MODEL_PATH, batch_size: int = 128,
    concurrency=None,
):
    if concurrency is None:
        import ray

        ncpu = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        concurrency = (1, max(4, ncpu))
    return ds.map_batches(
        WordCRFSegmenter,
        fn_constructor_args=(model_path,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ------------------------------------------------------------------ training


def train_word_crf(
    num_docs: int = 200,
    seed: int = 17,
    epochs: int = 6,
    out_path: str | None = WORD_MODEL_PATH,
):
    """Train the word-granularity tagger on a synthetic gold corpus
    (Training_word_based.ipynb analog); returns (model, held-out word
    accuracy)."""
    from ..synth import generate_corpus
    from .crf import LinearChainTagger

    def featurize(tables):
        corpus = tables["corpus"].to_pandas()
        lines_col = pa.array(
            [c.split("\n") for c in corpus["content"]],
            pa.list_(pa.string()),
        )
        X, w_off, line_idx = featurize_words(lines_col)
        doc_ids = (
            corpus["repo"] + "/" + corpus["path"] + "@" + corpus["commit"]
        ).to_numpy()
        g = tables["gold_spans"].to_pandas()
        gold_by_doc: dict[str, list] = {}
        for d, l, s0, s1 in zip(
            g["doc_id"], g["label"], g["start_line"], g["end_line"]
        ):
            gold_by_doc.setdefault(d, []).append((l, s0, s1))
        y = gold_word_tags(w_off, line_idx, doc_ids, gold_by_doc)
        return X, w_off, y

    X, off, y = featurize(generate_corpus(num_docs, seed=seed, dup_fraction=0.0))
    model = LinearChainTagger(
        np.zeros((N_TAGS, N_WORD_FEATS)), np.zeros((N_TAGS, N_TAGS))
    ).fit(X, off, y, epochs=epochs)

    X2, off2, y2 = featurize(
        generate_corpus(60, seed=seed + 1, dup_fraction=0.0)
    )
    acc = float((model.decode_batch(X2, off2) == y2).mean())
    if out_path:
        model.save(out_path)
    return model, acc


# ------------------------------------------------------- word-level report


def word_confusion_batch(batch: pa.Table, gold_ref) -> pa.Table:
    """Partial word-level confusion counts (pred, gold, n); the word
    model decodes inside the batch fn (per-process cached model)."""
    import pandas as pd

    from ..state.broadcast import get_broadcast

    global _WORD_MODEL
    if _WORD_MODEL is None:  # loaded once per worker process
        from .crf import LinearChainTagger

        _WORD_MODEL = LinearChainTagger.load(WORD_MODEL_PATH)
    model = _WORD_MODEL

    gold_by_doc: dict[str, list] = get_broadcast(gold_ref)
    X, w_off, line_idx = featurize_words(batch["lines"])
    pred_ids = model.decode_batch(X, w_off)
    docs = np.asarray(batch["doc_id"].to_pylist(), dtype=object)
    gold_ids = gold_word_tags(w_off, line_idx, docs, gold_by_doc)

    def to_label(ids: np.ndarray) -> np.ndarray:
        # collapse B-x/I-x -> x (span-label report like the line one)
        lab = np.asarray(TAGS, dtype=object)[ids]
        return np.array(
            [l if l == "O" else l[2:] for l in lab], dtype=object
        )

    counts = (
        pd.DataFrame({"pred": to_label(pred_ids), "gold": to_label(gold_ids)})
        .groupby(["pred", "gold"], sort=False)
        .size()
        .reset_index(name="n")
    )
    return pa.table(
        {
            "pred": pa.array(counts["pred"], pa.string()),
            "gold": pa.array(counts["gold"], pa.string()),
            "n": pa.array(counts["n"].to_numpy(), pa.int64()),
        }
    )


_WORD_MODEL = None


def word_classification_report(tokenized_ds, gold_spans: pa.Table):
    """Word-level P/R/F1 per label vs line-gold projected to words
    (the Training_word_based.ipynb cell-10/16 report, distributed)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    gold_by_doc: dict[str, list] = {}
    for d, l, s0, s1 in zip(
        gold_spans["doc_id"].to_pylist(),
        gold_spans["label"].to_pylist(),
        gold_spans["start_line"].to_pylist(),
        gold_spans["end_line"].to_pylist(),
    ):
        gold_by_doc.setdefault(d, []).append((l, s0, s1))
    ref = ray.put(gold_by_doc)
    conf = (
        tokenized_ds.map_batches(
            lambda b: word_confusion_batch(b, ref), batch_format="pyarrow"
        )
        .groupby(["pred", "gold"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    labels = sorted(set(conf["pred"]) | set(conf["gold"]))
    rows = []
    for lab in labels:
        tp = conf[(conf["pred"] == lab) & (conf["gold"] == lab)]["n"].sum()
        fp = conf[(conf["pred"] == lab) & (conf["gold"] != lab)]["n"].sum()
        fn = conf[(conf["pred"] != lab) & (conf["gold"] == lab)]["n"].sum()
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        rows.append(
            {
                "label": lab,
                "precision": round(p, 4),
                "recall": round(r, 4),
                "f1": round(f1, 4),
                "support": int(tp + fn),
            }
        )
    return pd.DataFrame(rows)


def noise_robust_report_words(
    num_docs: int = 300,
    seed: int = 17,
    label_noise: float = 0.15,
    distractor_rate: float = 0.25,
    epochs: int = 10,
    eval_docs: int = 100,
):
    """WORD-level tagger quality under the reference's real operating
    regime (the last model family previously evaluated clean-synth
    only): training gold corrupted at ``label_noise`` (boundary
    jitter / kind relabel / span drop — synth.corrupt_gold_spans)
    over a corpus whose filler contains head LOOK-ALIKE lines
    (synth.inject_distractors); eval on a held-out corpus with the
    same distractor rate but CLEAN labels, scored word-level after
    collapsing tags to {O, B, I} — the reference's word-based tag
    classes and report (its published word-level bar: B .98/.95,
    I .93/.82 on 428 papers / 5.6M words,
    Styling/tools/notebooks/Training_word_based.ipynb cells 10, 16).
    Returns DataFrame(tag_class, precision, recall, f1, support)."""
    import pandas as pd

    from ..synth import (
        corrupt_gold_spans,
        generate_corpus,
        inject_distractors,
    )
    from .crf import LinearChainTagger

    def featurize(corpus_tbl: pa.Table, gold_tbl: pa.Table):
        corpus = corpus_tbl.to_pandas()
        lines_col = pa.array(
            [c.split("\n") for c in corpus["content"]],
            pa.list_(pa.string()),
        )
        X, w_off, line_idx = featurize_words(lines_col)
        doc_ids = (
            corpus["repo"] + "/" + corpus["path"] + "@" + corpus["commit"]
        ).to_numpy()
        g = gold_tbl.to_pandas()
        gold_by_doc: dict[str, list] = {}
        for d, l, s0, s1 in zip(
            g["doc_id"], g["label"], g["start_line"], g["end_line"]
        ):
            gold_by_doc.setdefault(d, []).append((l, s0, s1))
        y = gold_word_tags(w_off, line_idx, doc_ids, gold_by_doc)
        return X, w_off, y

    tr = generate_corpus(num_docs, seed=seed, dup_fraction=0.0)
    tr_corpus = inject_distractors(
        tr["corpus"], tr["gold_spans"], rate=distractor_rate, seed=seed
    )
    noisy_gold = corrupt_gold_spans(
        tr["gold_spans"], rate=label_noise, seed=seed
    )
    X, off, y = featurize(tr_corpus, noisy_gold)
    model = LinearChainTagger(
        np.zeros((N_TAGS, N_WORD_FEATS)), np.zeros((N_TAGS, N_TAGS))
    ).fit(X, off, y, epochs=epochs)

    te = generate_corpus(eval_docs, seed=seed + 1, dup_fraction=0.0)
    te_corpus = inject_distractors(
        te["corpus"], te["gold_spans"], rate=distractor_rate,
        seed=seed + 1,
    )
    X2, off2, y2 = featurize(te_corpus, te["gold_spans"])
    pred = model.decode_batch(X2, off2)

    def collapse(t: np.ndarray) -> np.ndarray:
        out = np.zeros(len(t), dtype=np.int8)
        out[(t > 0) & ((t - 1) % 2 == 0)] = 1  # B-*
        out[(t > 0) & ((t - 1) % 2 == 1)] = 2  # I-*
        return out

    yc, pc_ = collapse(y2), collapse(pred)
    rows = []
    for cid, cname in ((0, "O"), (1, "B"), (2, "I")):
        tp = int(((pc_ == cid) & (yc == cid)).sum())
        fp = int(((pc_ == cid) & (yc != cid)).sum())
        fn = int(((pc_ != cid) & (yc == cid)).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        rows.append(
            {
                "tag_class": cname,
                "precision": round(p, 4),
                "recall": round(r, 4),
                "f1": round(f1, 4),
                "support": tp + fn,
            }
        )
    return pd.DataFrame(rows)
