"""Deterministic synthetic corpus generator (FIXTURES.md F1-F4).

Plays the role of the reference's extthm gold-standard pipeline
(reference: Styling/tools/latex_extract/add_extthm.py +
Styling/src/lib/extractors/results/latex_extract.py:1-5): it plants
labelled theorem/proof/definition environments, intra-document
reference phrases, and cross-document citations into the ``content``
column of a ``(repo, path, commit, lang, content)`` corpus table, and
emits the exact ground truth (spans, triples, citation links, near-dup
pairs) alongside.

Determinism: every document is generated from its own
``RandomState(seed ^ doc_index)`` so generation order / parallelism
never changes output. Mega-repo skew is on by default (a few repos own
~30% of documents) to exercise the salting path (SURVEY.md §4).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import (
    ABBREVIATIONS,
    PRED_CITES,
    PRED_PROVED_BY,
    PRED_STATES,
    entity_id,
)

# Filler vocabulary: code/math-ish words. MUST NOT contain any result
# kind name or abbreviation (would create spurious gold mentions).
_VOCAB = (
    "graph kernel matrix vector bound norm metric space field ring group "
    "module ideal prime integer rational sequence series limit function "
    "operator spectrum measure integral derivative gradient tensor basis "
    "dimension rank trace determinant eigenvalue polynomial root degree "
    "vertex edge path cycle tree forest clique coloring flow cut matching "
    "complexity reduction oracle circuit automaton language grammar parser "
    "compiler runtime memory cache buffer stream batch shard partition "
    "index hash table queue stack heap array list struct schema column "
    "query plan join scan filter project aggregate sort merge shuffle "
    "broadcast replica quorum consensus ledger commit branch revision "
    "convergence stability error residual estimate approximation sampling "
    "distribution variance entropy likelihood posterior prior inference"
).split()

_KIND_WEIGHTS = {
    "theorem": 0.30,
    "lemma": 0.25,
    "proposition": 0.12,
    "definition": 0.12,
    "corollary": 0.08,
    "remark": 0.05,
    "claim": 0.03,
    "conjecture": 0.02,
    "assumption": 0.03,
}
_KINDS = list(_KIND_WEIGHTS)
_KPROBS = np.array([_KIND_WEIGHTS[k] for k in _KINDS])
_KPROBS /= _KPROBS.sum()

_LANGS = ("tex", "md", "rst")


@dataclass
class GoldDoc:
    repo: str
    path: str
    commit: str
    lang: str
    content: str
    doc_id: str
    sha256: str
    spans: list[tuple[str, int, int, int]] = field(default_factory=list)
    # (label, group, start_line, end_line)
    triples: list[tuple[str, str, str]] = field(default_factory=list)
    links: list[tuple[str, str]] = field(default_factory=list)  # (tag, doc_to)


def _commit_hex(key: str) -> str:
    return hashlib.sha1(key.encode()).hexdigest()


def _doc_identity(i: int, num_docs: int, skew: bool) -> tuple[str, str, str]:
    """(repo, path, commit) for doc index i. With skew on, repo 0..2 are
    mega-repos owning ~30% of docs (north-rule salting exercise)."""
    if skew and i % 10 < 3:
        repo = f"org/mega{i % 3}"
    else:
        repo = f"org/repo{i % max(1, num_docs // 8)}"
    path = f"src/section_{i}.tex"
    commit = _commit_hex(f"{repo}/{path}#{i}")
    return repo, path, commit


def _words(rng: np.random.RandomState, lo: int = 5, hi: int = 11) -> list[str]:
    n = int(rng.randint(lo, hi + 1))
    return [_VOCAB[j] for j in rng.randint(0, len(_VOCAB), size=n)]


def _cap(kind: str) -> str:
    return kind[0].upper() + kind[1:]


def _plural(kind: str) -> str:
    if kind.endswith("y"):
        return kind[:-1] + "ies"
    return kind + "s"


def generate_doc(
    i: int,
    num_docs: int,
    seed: int = 42,
    skew: bool = True,
    targets: list[tuple[str, list[tuple[str, str]]]] | None = None,
) -> GoldDoc:
    """Generate one document plus its ground truth.

    ``targets``: optional list of (doc_id, [(kind, num), ...]) of OTHER
    documents available as cross-citation targets.
    """
    rng = np.random.RandomState((seed * 1_000_003 + i) % (2**31 - 1))
    repo, path, commit = _doc_identity(i, num_docs, skew)
    doc_id = f"{repo}/{path}@{commit}"
    lang = _LANGS[int(rng.randint(0, len(_LANGS)))]

    # ---- plan entities: shared per-section counters ("1.1", "1.2", ...)
    n_sec = int(rng.randint(1, 4))
    entities: list[tuple[str, str]] = []  # (kind, num)
    for sec in range(1, n_sec + 1):
        n_res = int(rng.randint(1, 5))
        for j in range(1, n_res + 1):
            kind = _KINDS[int(rng.choice(len(_KINDS), p=_KPROBS))]
            entities.append((kind, f"{sec}.{j}"))

    lines: list[str] = []
    spans: list[tuple[str, int, int, int]] = []
    triples: list[tuple[str, str, str]] = []
    links: list[tuple[str, str]] = []
    cite_seen: set[tuple[str, str]] = set()
    group = 0

    # repetitive page header (the arXiv running-head analog): ~half the
    # docs carry a header line repeated at "page breaks" with only the
    # page number varying — the signal the A9/M6 `repetitive` feature
    # must learn to ignore. NOTE: drawn AFTER the entity plan so
    # _doc_plan's rng-prefix re-derivation stays aligned.
    use_header = rng.rand() < 0.5
    page_counter = [0]

    def filler_para() -> None:
        if use_header:
            page_counter[0] += 1
            lines.append(f"draft {repo} {path} page {page_counter[0]}")
        for _ in range(int(rng.randint(0, 4))):
            lines.append(" ".join(_words(rng)))
        lines.append("")

    def ref_phrase(encl_eid: str) -> str:
        """A reference phrase citing other entities; records gold cites."""
        # choose intra vs extra
        extra_ok = bool(targets) and len(targets) > 0
        is_extra = extra_ok and rng.rand() < 0.35
        if is_extra:
            t_doc, t_ents = targets[int(rng.randint(0, len(targets)))]
            if not t_ents:
                is_extra = False
            else:
                kind, num = t_ents[int(rng.randint(0, len(t_ents)))]
                tag = "c" + hashlib.sha1(
                    f"{doc_id}->{t_doc}".encode()
                ).hexdigest()[:8]
                links.append((tag, t_doc))
                obj = entity_id(t_doc, f"{kind} {num}")
                if (encl_eid, obj) not in cite_seen:
                    cite_seen.add((encl_eid, obj))
                    triples.append((encl_eid, PRED_CITES, obj))
                style = int(rng.randint(0, 2))
                if style == 0:
                    return f"by {_cap(kind)} {num} of \\cite{{{tag}}}"
                return f"see \\cite{{{tag}}} {_cap(kind)} {num}"
        # intra-document
        others = [e for e in entities if entity_id(doc_id, f"{e[0]} {e[1]}") != encl_eid]
        if not others:
            return " ".join(_words(rng, 3, 5))
        kind, num = others[int(rng.randint(0, len(others)))]
        obj = entity_id(doc_id, f"{kind} {num}")
        style = int(rng.randint(0, 3))
        phrase: str
        if style == 0:
            phrase = f"by {_cap(kind)} {num}"
        elif style == 1 and kind in ("theorem", "lemma", "proposition"):
            abbr = {v: k for k, v in ABBREVIATIONS.items()}[kind]
            phrase = f"using {abbr.capitalize()} {num}"
        else:
            # plural multi-ref: pick a second distinct entity of same kind
            same = [e for e in others if e[0] == kind and e[1] != num]
            if same:
                k2, n2 = same[int(rng.randint(0, len(same)))]
                obj2 = entity_id(doc_id, f"{k2} {n2}")
                if (encl_eid, obj2) not in cite_seen:
                    cite_seen.add((encl_eid, obj2))
                    triples.append((encl_eid, PRED_CITES, obj2))
                phrase = f"from {_cap(_plural(kind))} {num} and {n2}"
            else:
                phrase = f"by {_cap(kind)} {num}"
        if (encl_eid, obj) not in cite_seen:
            cite_seen.add((encl_eid, obj))
            triples.append((encl_eid, PRED_CITES, obj))
        return phrase

    # ---- render blocks
    filler_para()
    for kind, num in entities:
        group += 1
        name = f"{kind} {num}"
        eid = entity_id(doc_id, name)
        triples.append((doc_id, PRED_STATES, eid))
        marker = "textbf" if rng.rand() < 0.7 else "textit"
        head_extra = " ".join(_words(rng, 2, 6))
        start = len(lines)
        lines.append(f"\\{marker}{{{_cap(kind)} {num}.}} {head_extra}")
        n_body = int(rng.randint(1, 4))
        for b in range(n_body):
            w = _words(rng)
            if rng.rand() < 0.45:
                pos = int(rng.randint(0, len(w)))
                w.insert(pos, ref_phrase(eid))
            lines.append(" ".join(w))
        end = len(lines) - 1
        spans.append((kind, group, start, end))
        lines.append("")

        # optional proof block
        if kind in ("theorem", "lemma", "proposition") and rng.rand() < 0.6:
            group += 1
            proof_name = f"proof {group}"
            proof_eid = entity_id(doc_id, proof_name)
            explicit = rng.rand() < 0.7
            pstart = len(lines)
            if explicit:
                lines.append(f"\\textbf{{Proof of {_cap(kind)} {num}.}}")
            else:
                lines.append("\\textbf{Proof.}")
            for b in range(int(rng.randint(1, 4))):
                w = _words(rng)
                if rng.rand() < 0.35:
                    pos = int(rng.randint(0, len(w)))
                    w.insert(pos, ref_phrase(proof_eid))
                lines.append(" ".join(w))
            lines.append("qed")
            pend = len(lines) - 1
            spans.append(("proof", group, pstart, pend))
            triples.append((eid, PRED_PROVED_BY, proof_eid))
            lines.append("")
        if rng.rand() < 0.5:
            filler_para()

    content = "\n".join(lines)
    sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
    return GoldDoc(
        repo=repo,
        path=path,
        commit=commit,
        lang=lang,
        content=content,
        doc_id=doc_id,
        sha256=sha,
        spans=spans,
        triples=triples,
        links=links,
    )


def _fork_doc(d: GoldDoc, rng: np.random.RandomState) -> tuple[GoldDoc, list[tuple[str, str]]]:
    """Near-duplicate 'fork' of a document: same structural lines, ~3% of
    filler words perturbed, different repo/commit. Returns the fork and
    the gold duplicate-entity pairs (orig_eid, fork_eid)."""
    repo = "fork/" + d.repo.split("/", 1)[1]
    commit = _commit_hex(d.doc_id + "#fork")
    doc_id = f"{repo}/{d.path}@{commit}"
    out_lines = []
    for ln in d.content.split("\n"):
        if ln.startswith("\\text") or ln == "" or ln == "qed":
            out_lines.append(ln)  # keep structural lines identical
            continue
        ws = ln.split(" ")
        for j in range(len(ws)):
            if ws[j] in _VOCAB and rng.rand() < 0.03:
                ws[j] = _VOCAB[int(rng.randint(0, len(_VOCAB)))]
        out_lines.append(" ".join(ws))
    content = "\n".join(out_lines)
    sha = hashlib.sha256(content.encode("utf-8")).hexdigest()

    def remap(x: str) -> str:
        return x.replace(d.doc_id, doc_id) if x.startswith(d.doc_id) else x

    fork = GoldDoc(
        repo=repo,
        path=d.path,
        commit=commit,
        lang=d.lang,
        content=content,
        doc_id=doc_id,
        sha256=sha,
        spans=list(d.spans),
        triples=[(remap(s), p, remap(o)) for (s, p, o) in d.triples],
        links=[(t, to) for (t, to) in d.links],
    )
    dup_pairs = []
    for s, p, o in d.triples:
        if p == PRED_STATES:
            dup_pairs.append((o, o.replace(d.doc_id, doc_id)))
    return fork, dup_pairs


def _doc_plan(i: int, num_docs: int, seed: int, skew: bool):
    """Entity plan of doc i (re-derives the rng stream prefix)."""
    rng = np.random.RandomState((seed * 1_000_003 + i) % (2**31 - 1))
    repo, path, commit = _doc_identity(i, num_docs, skew)
    doc_id = f"{repo}/{path}@{commit}"
    _ = rng.randint(0, len(_LANGS))  # lang draw (keep stream aligned)
    n_sec = int(rng.randint(1, 4))
    ents = []
    for sec in range(1, n_sec + 1):
        n_res = int(rng.randint(1, 5))
        for j in range(1, n_res + 1):
            kind = _KINDS[int(rng.choice(len(_KINDS), p=_KPROBS))]
            ents.append((kind, f"{sec}.{j}"))
    return (doc_id, ents)


def generate_chunk(
    lo: int,
    hi: int,
    num_docs: int,
    seed: int = 42,
    skew: bool = True,
    dup_fraction: float = 0.1,
) -> dict[str, pa.Table]:
    """Generate docs [lo, hi). Fully per-doc deterministic (fork
    decisions use per-doc seeds), so chunked/parallel generation yields
    byte-identical output to one sequential pass."""
    plan_lo = max(0, lo - 5)
    plans = {
        j: _doc_plan(j, num_docs, seed, skew) for j in range(plan_lo, hi)
    }
    docs: list[GoldDoc] = []
    dup_pairs: list[tuple[str, str]] = []
    for i in range(lo, hi):
        targets = [plans[j] for j in range(max(0, i - 5), i)]
        d = generate_doc(i, num_docs, seed=seed, skew=skew, targets=targets)
        docs.append(d)
        frng = np.random.RandomState(
            (seed * 2_000_003 + 777 + i) % (2**31 - 1)
        )
        if frng.rand() < dup_fraction:
            fork, pairs = _fork_doc(d, frng)
            docs.append(fork)
            dup_pairs.extend(pairs)
    return _tables_from_docs(docs, dup_pairs)


def generate_corpus(
    num_docs: int = 100,
    seed: int = 42,
    skew: bool = True,
    dup_fraction: float = 0.1,
) -> dict[str, pa.Table]:
    """Generate the corpus + ground truth tables.

    Returns dict with keys: ``corpus`` (F1 + sha256), ``gold_spans``
    (F2), ``gold_triples`` (F3), ``links`` (F4), ``gold_dup_pairs``.
    """
    return generate_chunk(0, num_docs, num_docs, seed, skew, dup_fraction)


def _tables_from_docs(
    docs: list[GoldDoc], dup_pairs: list[tuple[str, str]]
) -> dict[str, pa.Table]:

    S = pa.string()
    corpus = pa.table(
        {
            "repo": pa.array([d.repo for d in docs], S),
            "path": pa.array([d.path for d in docs], S),
            "commit": pa.array([d.commit for d in docs], S),
            "lang": pa.array([d.lang for d in docs], S),
            "content": pa.array([d.content for d in docs], S),
            "content_sha256": pa.array([d.sha256 for d in docs], S),
        }
    )
    gold_spans = pa.table(
        {
            "doc_id": pa.array([d.doc_id for d in docs for _ in d.spans], S),
            "label": pa.array([s[0] for d in docs for s in d.spans], S),
            "group": pa.array(
                [s[1] for d in docs for s in d.spans], pa.int64()
            ),
            "start_line": pa.array(
                [s[2] for d in docs for s in d.spans], pa.int64()
            ),
            "end_line": pa.array(
                [s[3] for d in docs for s in d.spans], pa.int64()
            ),
        }
    )
    gold_triples = pa.table(
        {
            "subject": pa.array([t[0] for d in docs for t in d.triples], S),
            "predicate": pa.array([t[1] for d in docs for t in d.triples], S),
            "object": pa.array([t[2] for d in docs for t in d.triples], S),
        }
    )
    links = pa.table(
        {
            "doc_from": pa.array([d.doc_id for d in docs for _ in d.links], S),
            "tag": pa.array([l[0] for d in docs for l in d.links], S),
            "doc_to": pa.array([l[1] for d in docs for l in d.links], S),
        }
    )
    gold_dups = pa.table(
        {
            "entity_a": pa.array([p[0] for p in dup_pairs], S),
            "entity_b": pa.array([p[1] for p in dup_pairs], S),
        }
    )
    return {
        "corpus": corpus,
        "gold_spans": gold_spans,
        "gold_triples": gold_triples,
        "links": links,
        "gold_dup_pairs": gold_dups,
    }


def materialize_corpus(
    out_dir: str,
    num_docs: int = 100,
    seed: int = 42,
    skew: bool = True,
    dup_fraction: float = 0.1,
    overwrite: bool = False,
) -> str:
    """Generate-and-cache the corpus tables as parquet under out_dir.

    Idempotent: if the directory already holds a matching manifest the
    cached copy is reused (generation is the expensive part at bench
    scale)."""
    import json

    manifest = os.path.join(out_dir, "_synth.json")
    spec = {
        "num_docs": num_docs,
        "seed": seed,
        "skew": skew,
        "dup_fraction": dup_fraction,
        "version": 2,
    }
    if not overwrite and os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == spec:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tables = generate_corpus(num_docs, seed, skew, dup_fraction)
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
    with open(manifest, "w") as f:
        json.dump(spec, f)
    return out_dir


def materialize_corpus_parallel(
    out_dir: str,
    num_docs: int,
    seed: int = 42,
    skew: bool = True,
    dup_fraction: float = 0.1,
    chunk: int = 2000,
) -> str:
    """Bench-scale corpus generation: Ray tasks generate chunks in
    parallel, each writing its own parquet shards (byte-identical to a
    sequential pass thanks to per-doc seeding). Cached by spec."""
    import json

    import ray

    manifest = os.path.join(out_dir, "_synth.json")
    spec = {
        "num_docs": num_docs,
        "seed": seed,
        "skew": skew,
        "dup_fraction": dup_fraction,
        "chunk": chunk,
        "version": 3,
        "parallel": True,
    }
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == spec:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for name in ("corpus", "gold_spans", "gold_triples", "links", "gold_dup_pairs"):
        os.makedirs(os.path.join(out_dir, name), exist_ok=True)

    @ray.remote
    def gen(lo: int, hi: int, ci: int) -> int:
        tables = generate_chunk(lo, hi, num_docs, seed, skew, dup_fraction)
        for name, tbl in tables.items():
            pq.write_table(
                tbl, os.path.join(out_dir, name, f"part-{ci:05d}.parquet")
            )
        return tbl.num_rows

    refs = [
        gen.remote(lo, min(lo + chunk, num_docs), ci)
        for ci, lo in enumerate(range(0, num_docs, chunk))
    ]
    ray.get(refs)
    with open(manifest, "w") as f:
        json.dump(spec, f)
    return out_dir


# ------------------------------------------------- noise-regime benchmark
#
# The reference's published tagger quality (line-level B .96/.96,
# I .83/.73 — Styling/tools/notebooks/Training.ipynb cell 13) was
# measured on 2,642 REAL papers: ambiguous head styles and imperfect
# annotations. The clean synthetic corpus above yields P/R 1.0, which
# demonstrates plumbing, not robustness. These helpers re-create the
# noisy regime deterministically: head LOOK-ALIKE lines injected into
# unlabeled filler (feature collisions with true heads), and annotator
# label noise applied to the training gold only.


def _distractor_line(rng: np.random.RandomState) -> str:
    """A line that fires head-ish features (styled kind word / 'Kind
    N.N' pattern) but is genuinely O-labeled running prose."""
    kind = _KINDS[int(rng.randint(0, len(_KINDS)))]
    num = f"{int(rng.randint(1, 4))}.{int(rng.randint(1, 6))}"
    w = " ".join(_words(rng, 3, 6))
    style = int(rng.randint(0, 4))
    if style == 0:  # styled kind word, no head number
        return f"\\textbf{{{_cap(kind)}}} arguments recur {w}"
    if style == 1:  # kind + number in running citation prose
        return f"{_cap(kind)} {num} of \\cite{{c0ffee00}} gives {w}"
    if style == 2:  # lowercase kind + number
        return f"recall {kind} {num} established above {w}"
    return f"\\textit{{as in {_cap(kind)} {num}}} we proceed {w}"


def inject_distractors(
    corpus_tbl: pa.Table,
    gold_spans_tbl: pa.Table,
    rate: float = 0.25,
    seed: int = 0,
) -> pa.Table:
    """Replace ~``rate`` of each document's NON-GOLD lines in place
    with head look-alikes. In-place replacement keeps every gold
    span's line indices valid; content_sha256 is recomputed."""
    rng = np.random.RandomState(seed)
    corpus = corpus_tbl.to_pandas()
    gold = gold_spans_tbl.to_pandas()
    protected: dict[str, set] = {}
    for r in gold.itertuples():
        s = protected.setdefault(r.doc_id, set())
        s.update(range(int(r.start_line), int(r.end_line) + 1))
    doc_ids = (
        corpus["repo"] + "/" + corpus["path"] + "@" + corpus["commit"]
    )
    new_content, new_sha = [], []
    for did, content in zip(doc_ids, corpus["content"]):
        lines = content.split("\n")
        guard = protected.get(did, set())
        cand = [
            i
            for i, ln in enumerate(lines)
            if i not in guard and ln.strip()
        ]
        n_repl = int(len(cand) * rate)
        for i in rng.choice(len(cand), size=n_repl, replace=False):
            lines[cand[i]] = _distractor_line(rng)
        c = "\n".join(lines)
        new_content.append(c)
        new_sha.append(hashlib.sha256(c.encode("utf-8")).hexdigest())
    corpus["content"] = new_content
    corpus["content_sha256"] = new_sha
    return pa.Table.from_pandas(corpus, preserve_index=False)


def corrupt_gold_spans(
    gold_spans_tbl: pa.Table, rate: float = 0.15, seed: int = 0
) -> pa.Table:
    """Simulate annotator noise on the TRAINING gold: with probability
    ``rate`` per span — jitter a boundary by one line (60% of noisy
    spans), relabel the kind (25%), or drop the span entirely (15%).
    Evaluation gold stays clean; robustness = learning through this."""
    rng = np.random.RandomState(seed)
    g = gold_spans_tbl.to_pandas()
    keep = np.ones(len(g), dtype=bool)
    labels = g["label"].to_numpy().copy()
    s0 = g["start_line"].to_numpy().copy()
    s1 = g["end_line"].to_numpy().copy()
    noisy = rng.rand(len(g)) < rate
    mode = rng.rand(len(g))
    for i in np.flatnonzero(noisy):
        if mode[i] < 0.60:  # boundary jitter
            if rng.rand() < 0.5 and s0[i] < s1[i]:
                s0[i] += 1
            else:
                s1[i] += 1
        elif mode[i] < 0.85:  # kind relabel
            others = [k for k in _KINDS if k != labels[i]]
            labels[i] = others[int(rng.randint(0, len(others)))]
        else:  # span dropped by the annotator
            keep[i] = False
    g["label"], g["start_line"], g["end_line"] = labels, s0, s1
    return pa.Table.from_pandas(g[keep], preserve_index=False)
