"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline; ``queries()`` exposes one
callable per implemented operator family (SURVEY.md §2) over the
driver's parquet tables; ``oracle_sql()`` carries the DuckDB oracle
for every SQL-expressible query (column names match exactly).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` happens here or in the library.
"""

from __future__ import annotations

import logging
import os
from collections.abc import Callable
from typing import Any

# Ray's schema-dedup fast path logs a harmless "Failed to hash the
# schemas" warning whenever a mixed pandas/arrow schema set isn't
# hashable; it retries the slow path and succeeds. Pure noise here.
logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).setLevel(logging.ERROR)

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in __import__("sys").path:
    __import__("sys").path.insert(0, _REPO)


def _rp(path: str, columns: list[str] | None = None):
    """read_parquet + schema-metadata strip (fuses with the read).

    pandas-written parquet carries a b'pandas' schema-metadata dict
    that makes pa.Schema unhashable, knocking every downstream
    sort/groupby reduce off Ray's schema-dedup fast path (one
    worker-side warning per block pair)."""
    import ray.data as rd

    return rd.read_parquet(path, columns=columns).map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def _synth_dir(num_docs: int = 200, seed: int = 42) -> str:
    from theoremkb_ray.synth import materialize_corpus

    return materialize_corpus(
        f"/tmp/tkb_synth_{num_docs}_{seed}", num_docs=num_docs, seed=seed
    )


def entry() -> Any:
    """Flagship: KG construction over a corpus in the BASELINE.json
    input_hint shape — the sf0.001 documents table adapted to
    (repo,path,commit,lang,content) UNION a planted synthetic corpus —
    returning the canonicalized triple store Dataset."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import triples_dataset
    from theoremkb_ray.sources.corpus import corpus_from_documents, read_corpus

    sdir = _synth_dir(80)
    links = pq.read_table(f"{sdir}/links.parquet")
    synth_triples = triples_dataset(
        read_corpus(f"{sdir}/corpus.parquet"),
        links_tbl=links,
        segmenter="crf",
        canonicalize=True,
    )
    docs_triples = triples_dataset(
        corpus_from_documents("/root/testdata/sf0.001"),
        segmenter="naive",
        canonicalize=False,
    )
    return synth_triples.union(docs_triples)


# ------------------------------------------------------- queries registry


def _kg_triples(sf_dir: str):
    """Flagship KG triples over the SYNTH corpus (not the sf parquet
    tables, so no DuckDB view exists to twin it): CRF model scoring +
    regex mention extraction — the e2e gold check is triple P/R vs the
    planted ground truth (tests/test_pipeline.py)."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import triples_dataset
    from theoremkb_ray.sources.corpus import read_corpus

    sdir = _synth_dir(200)
    links = pq.read_table(f"{sdir}/links.parquet")
    return triples_dataset(
        read_corpus(f"{sdir}/corpus.parquet"),
        links_tbl=links,
        segmenter="crf",
        canonicalize=False,
    )


def _kg_triples_canonical(sf_dir: str):
    """_kg_triples + LSH/CC canonicalization (model scoring +
    iterative component labeling over the synth corpus — no SQL twin;
    gold-merge exactness asserted in tests/test_canonicalize.py)."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import triples_dataset
    from theoremkb_ray.sources.corpus import read_corpus

    sdir = _synth_dir(200)
    links = pq.read_table(f"{sdir}/links.parquet")
    return triples_dataset(
        read_corpus(f"{sdir}/corpus.parquet"),
        links_tbl=links,
        segmenter="crf",
        canonicalize=True,
    )


def _kg_cocitation(sf_dir: str):
    """Co-citation pairs over the flagship triple store (results that
    cite the same external entity, weighted by shared citations — the
    related-result recommendation network). Runs on the SYNTH corpus
    triples (model scoring upstream, so no SQL twin); exactness vs a
    brute-force reference incl. the hot-object cap is pinned in
    tests/test_kgquery.py."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import triples_dataset
    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.kgquery import cocitation_pairs

    sdir = _synth_dir(200)
    links = pq.read_table(f"{sdir}/links.parquet")
    triples = triples_dataset(
        read_corpus(f"{sdir}/corpus.parquet"),
        links_tbl=links,
        segmenter="crf",
    )
    return cocitation_pairs(triples)


def _kg_doc_citations(sf_dir: str):
    """Two-hop traversal over the flagship store: doc -states->
    theorem -cites-> entity, i.e. the per-document outbound citation
    edges implied by its extracted results. ONE mid-node-bucketed
    exchange (stages/kgquery.py:two_hop — never a full self-join of
    the store); exactness pinned in tests/test_kgquery.py."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import triples_dataset
    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.kgquery import two_hop

    sdir = _synth_dir(200)
    links = pq.read_table(f"{sdir}/links.parquet")
    triples = triples_dataset(
        read_corpus(f"{sdir}/corpus.parquet"),
        links_tbl=links,
        segmenter="crf",
    )
    return two_hop(triples, "states", "cites")


def _kg_proved_citing(sf_dir: str):
    """Star-pattern match over the flagship store: theorems that BOTH
    have a proof (any proved_by edge) AND cite at least one external
    entity — the SPARQL shape ``?t proved_by ?p . ?t cites ?x`` with
    the shared subject resolved in ONE hash(subject)-keyed exchange
    (stages/kgquery.py:star_join; semantics pinned in
    tests/test_kgquery.py)."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import triples_dataset
    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.kgquery import star_join

    sdir = _synth_dir(200)
    links = pq.read_table(f"{sdir}/links.parquet")
    triples = triples_dataset(
        read_corpus(f"{sdir}/corpus.parquet"),
        links_tbl=links,
        segmenter="crf",
    )
    return star_join(triples, {"proved_by": None, "cites": None})


def _kg_results(sf_dir: str):
    """Extracted theorem/proof results table (CRF scoring over the
    synth corpus — model inference has no SQL twin; line-level P/R is
    the seg_report family, triple P/R the e2e gold check)."""
    from theoremkb_ray.pipelines.kg import results_dataset
    from theoremkb_ray.sources.corpus import read_corpus

    sdir = _synth_dir(200)
    return results_dataset(
        read_corpus(f"{sdir}/corpus.parquet"), segmenter="crf"
    ).select_columns(
        ["doc_id", "kind", "group", "name", "entity_id", "start_line", "end_line"]
    )


def _docs_segment(sf_dir: str):
    """Segmentation over the driver documents table (adapter path):
    per-document line/span statistics. The documents text contains no
    theorem markup, so span counts are expected to be 0 — the row-per-
    document output proves the adapter + tokenizer + segmenter ran."""
    import numpy as np
    import pyarrow as pa

    from theoremkb_ray.sources.corpus import corpus_from_documents
    from theoremkb_ray.stages.ingest import ingest
    from theoremkb_ray.stages.segment import segment_naive
    from theoremkb_ray.stages.tokenize import tokenize

    ds = segment_naive(tokenize(ingest(corpus_from_documents(sf_dir), verify=False)))

    def stats(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_lines = pc.list_value_length(b["lines"])
        n_spans = pc.list_value_length(b["spans"])
        # numeric doc_id recovered from the adapter path ("doc_<n>.txt")
        # so the DuckDB oracle can join on the raw documents table
        m = pc.extract_regex(b["path"], r"doc_(?P<n>\d+)\.txt")
        doc_num = pc.cast(pc.struct_field(m, "n"), pa.int64())
        n_words = pc.list_value_length(pc.split_pattern(b["content"], " "))
        return pa.table(
            {
                "doc_id": doc_num,
                "n_lines": pc.cast(n_lines, pa.int64()),
                "n_spans": pc.cast(n_spans, pa.int64()),
                "n_words": pc.cast(n_words, pa.int64()),
                "n_chars": pc.cast(pc.utf8_length(b["content"]), pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def _minhash_dedup_docs(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    from theoremkb_ray.stages.dedup import minhash_dedup

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return minhash_dedup(ds).groupby("lang").aggregate(Count(alias_name="n"))


def _simhash_dedup_docs(sf_dir: str):
    """Approximate BY DESIGN (hamming<=12 on a 64-bit simhash trades
    recall for one 8-byte sketch per doc): at sf0.01 it finds 20 of
    the 24 exact-Jaccard assignments — the 4 borderline pairs are the
    documented trade, so there is no SQL twin (the deterministic
    sibling with one is ngram_dedup_docs)."""
    import ray.data as rd

    from theoremkb_ray.stages.dedup import dup_assignments, simhash_dup_edges

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    canon = dup_assignments(simhash_dup_edges(ds))
    import pandas as pd

    items = sorted(canon.items())
    return pd.DataFrame(
        {
            "doc_id": [k for k, _ in items],
            "canonical": [v for _, v in items],
        }
    )


def _langid_docs(sf_dir: str):
    import ray.data as rd

    from theoremkb_ray.stages.textstats import langid

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return langid(ds).select_columns(["doc_id", "lang_pred"])


def _fingerprint_docs(sf_dir: str):
    """Winnowing document fingerprints (rolling window-8 hashes, keep
    ≡0 mod 16, XOR-fold to one uint64). Token hashes come from the
    C-siphash path (functions/hashing.py:hash_strings), which no ANSI
    SQL engine reproduces — determinism and window semantics are
    pinned in tests/test_textstats.py instead (rows-only check)."""
    import ray.data as rd

    from theoremkb_ray.stages.textstats import fingerprints

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return fingerprints(ds).select_columns(["doc_id", "fingerprint64"])


def _winnow_fingerprint_docs(sf_dir: str):
    """SQL-exact winnowing fingerprints: token IDs are lexicographic
    vocabulary ranks (the tokenizer-ID analog), window hashes are the
    FNV fold + splitmix64 chain DuckDB reproduces bit-for-bit with
    UHUGEINT mod-2^64 arithmetic (``_splitmix_round_ctes``). One
    (doc_id, fp) row per distinct kept window hash — value-hash-oracled
    twin of the siphash-based ``fingerprint_docs``."""
    from theoremkb_ray.stages.textstats import winnow_fingerprints_ranked

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return winnow_fingerprints_ranked(ds)


def _simhash_ranked_docs(sf_dir: str):
    """SQL-exact SimHash sketch per doc: vocabulary-rank token IDs
    hashed with one splitmix64 round, strict-majority bit vote
    (stages/textstats.py:simhash_ranked). The value-hash-oracled twin
    of the production siphash simhash_dedup_docs."""
    from theoremkb_ray.stages.textstats import simhash_ranked

    ds = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_ranked(ds)


def _ivf_topk(sf_dir: str):
    """Approximate BY DESIGN (probed-list subset of centroids); the
    exact contract is oracled twice over: ivf_exact_topk
    (nprobe==num_centroids reduces to brute force) and ann_topk.
    Recall@k vs the brute twin is asserted in tests/test_pipeline."""
    import numpy as np
    import ray.data as rd

    from theoremkb_ray.stages.similarity import ivf_topk

    ds = _rp(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    import pyarrow.parquet as pq

    q = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, 3)
    Q = np.stack([np.asarray(v, np.float64) for v in q["embedding"].to_pylist()])
    out = ivf_topk(ds, Q, k=5, num_centroids=8, nprobe=4).to_pandas()
    return out[["query_id", "vec_id", "rank"]]


def _ivf_exact_topk(sf_dir: str):
    """IVF with nprobe == num_centroids scans every list — exact, so
    the brute-force DuckDB oracle applies; the PRUNED path (`ivf_topk`)
    keeps its recall-vs-brute pytest. Exercises the full IVF machinery
    (k-means train, assignment, probe routing) under an oracle."""
    import numpy as np
    import pyarrow.parquet as pq

    from theoremkb_ray.stages.similarity import ivf_topk

    ds = _rp(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = (
        pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .sort_by("vec_id")
        .slice(0, 3)
    )
    Q = np.stack(
        [np.asarray(v, np.float64) for v in q["embedding"].to_pylist()]
    )
    out = ivf_topk(ds, Q, k=5, num_centroids=8, nprobe=8).to_pandas()
    qids = q["vec_id"].to_numpy()
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out[["query_id", "vec_id", "rank"]].astype(
        {"query_id": "int64", "vec_id": "int64", "rank": "int64"}
    )


def _embedding_dups(sf_dir: str):
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from theoremkb_ray.stages.dedup import dup_assignments, embedding_dup_edges

    dim = len(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .slice(0, 1)["embedding"]
        .to_pylist()[0]
    )
    ds = _rp(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n_vecs = ds.count()
    canon = dup_assignments(
        embedding_dup_edges(
            _rp(
                f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"],
            ),
            dim=dim,
        )
    )
    # summary row first (always non-empty), then one row per dup
    items = sorted(canon.items())
    return pd.DataFrame(
        {
            "vec_id": ["_summary"] + [k for k, _ in items],
            "canonical": [f"n_vectors={n_vecs};n_dups={len(items)}"]
            + [v for _, v in items],
        }
    )


def _autoencoder_dups(sf_dir: str):
    """T7 analog: learned-embedding near-dup detection — train the
    numpy autoencoder on a bounded sample of the documents table,
    embed with the actor pool, SRP-LSH dedup in latent space."""
    import pandas as pd
    import ray.data as rd

    from theoremkb_ray.stages.autoencoder import (
        autoencoder_dup_edges,
        fit_autoencoder_distributed,
    )
    from theoremkb_ray.stages.dedup import dup_assignments

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = ds.count()
    model = fit_autoencoder_distributed(ds, sample_max=10_000, epochs=10)
    canon = dup_assignments(
        autoencoder_dup_edges(ds, model, max_hamming=4)
    )
    items = sorted(canon.items())
    return pd.DataFrame(
        {
            "doc_id": ["_summary"] + [k for k, _ in items],
            "canonical": [f"n_docs={n_docs};n_dups={len(items)}"]
            + [v for _, v in items],
        }
    )


def _substring_dups(sf_dir: str):
    """Corpus-wide exact substring duplication (Lee et al. 2022
    signal): per doc, how many of its distinct 8-token gram windows
    occur in >= 2 documents. Self-join via coarse gram-hash exchange
    (stages/dedup.py:substring_dup_counts)."""
    from theoremkb_ray.stages.dedup import substring_dup_counts

    ds = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return substring_dup_counts(ds, k=8)


def _decontaminate_docs(sf_dir: str):
    """Training-data decontamination: benchmark = the 20 lexicographic-
    min doc texts; flag every doc sharing a 13-token gram with them
    (the benchmark docs themselves + their duplicates)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from theoremkb_ray.stages.decontaminate import flag_contaminated

    bench_tbl = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .sort_by("doc_id")
        .slice(0, 20)
    )
    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    flagged = flag_contaminated(ds, bench_tbl["text"])
    out = (
        flagged.map_batches(
            lambda b: b.select(["doc_id", "contaminated", "overlap_grams"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    n_cont = int(out["contaminated"].sum())
    rows = out[out["contaminated"]]
    return pd.DataFrame(
        {
            "doc_id": ["_summary"] + rows["doc_id"].astype(str).tolist(),
            "overlap_grams": [n_cont] + rows["overlap_grams"].tolist(),
        }
    )


def _media_decode(sf_dir: str):
    """S10 plumbing path: opaque binary payloads through the actor-pool
    decoder with the deterministic fake backend (CI-safe twin of
    media_decode_real). Binary media has no SQL representation — the
    decode contract is pinned in tests/test_vision.py."""
    import ray.data as rd

    from theoremkb_ray.stages.multimodal import decode_media, synth_media_table

    ds = rd.from_arrow(synth_media_table(64, seed=7))
    return decode_media(ds, backend="fake").select_columns(
        ["media_id", "kind", "payload_bytes"]
    )

def _media_decode_real(sf_dir: str):
    """S10 real path: decode VALID PNG/PGM/WAV/uncompressed-AVI
    payloads through the pure-stdlib codecs (functions/codecs.py) —
    content features, not sha-derived fakes. Only compressed video
    codecs (mp4/h264) still need external libraries."""
    import ray.data as rd

    from theoremkb_ray.stages.multimodal import (
        decode_media,
        synth_real_media_table,
    )

    ds = rd.from_arrow(synth_real_media_table(48, seed=7))
    return decode_media(ds, backend="real").select_columns(
        ["media_id", "kind", "payload_bytes"]
    )


def _media_frames(sf_dir: str):
    """Real video frame sampling: uncompressed-AVI payloads decode,
    sample one frame per 200 ms, PNG re-encode
    (stages/multimodal.py:FrameExtractor), then flow through the real
    image decoder — video genuinely joins the image pipeline. Binary
    media has no SQL twin; frame exactness vs the source video is
    pinned in tests/test_codecs.py."""
    import ray.data as rd

    from theoremkb_ray.stages.multimodal import (
        decode_media,
        extract_frames,
        synth_real_media_table,
    )

    ds = rd.from_arrow(synth_real_media_table(32, seed=7))
    frames = extract_frames(ds, every_ms=200, backend="real")
    return decode_media(frames, backend="real").select_columns(
        ["media_id", "kind", "payload_bytes"]
    )


def _seg_report_noisy(sf_dir: str):
    """Tagger quality under the reference's real operating regime:
    15% label noise on the training gold + 25% head look-alike
    distractor lines; line-level B/I/O P/R vs CLEAN held-out gold.
    Reference bar: B .96/.96, I .83/.73 (Training.ipynb cell 13).
    Model scoring — no SQL oracle (rows-only check)."""
    from theoremkb_ray.stages.crf import noise_robust_report

    return noise_robust_report()


def _seg_report_words_noisy(sf_dir: str):
    """Word-granularity CRF under the same noisy regime as
    seg_report_noisy (15% label noise + 25% head look-alike
    distractors, clean held-out eval): WORD-level B/I/O P/R — the
    last model family previously evaluated clean-synth only.
    Reference bar: B .98/.95, I .93/.82 (Training_word_based.ipynb
    cells 10, 16). Recorded evidence (BASELINE.md round-5):
    B .9987/1.000, I .9849/1.000. Model scoring — no SQL oracle
    (rows-only check)."""
    from theoremkb_ray.stages.words import noise_robust_report_words

    return noise_robust_report_words()


def _seg_report_cnn1d_noisy(sf_dir: str):
    """T3 analog under the same noisy regime as seg_report_noisy
    (15% label noise + 25% distractors, clean held-out eval): the
    context-window MLP's line-level B/I/O P/R. Recorded evidence
    (BASELINE.md round-4): B .9569/1.000, I .9454/1.000 — clears the
    reference's published bars (Training.ipynb cell 13). Model
    scoring — no SQL oracle (rows-only check)."""
    from theoremkb_ray.stages.nn import noise_robust_report_cnn1d

    return noise_robust_report_cnn1d()


def _nlp_classify_noisy(sf_dir: str):
    """T8/T9 analog under the noisy regime: hashed-BoW 3-class
    paragraph P/R/F1 with distractor-injected corpora and corrupted
    training gold (reference bars: NLP/transformers_tkb.ipynb cell
    37). Recorded evidence (BASELINE.md round-4): Theorem F1 .868,
    Proof F1 1.0, Basic recall .554 — the unigram-BoW analog is
    honestly WEAKER than the reference's transformer on head
    look-alike distractors embedded in running prose (scope note in
    COVERAGE.md; the container has no torch/keras). Model scoring —
    no SQL oracle (rows-only check)."""
    from theoremkb_ray.stages.nn import noise_robust_report_nlp

    return noise_robust_report_nlp()


def _tfidf_match(sf_dir: str):
    """T6/J9: TF-IDF theorem matching, fork docs vs their originals."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import results_dataset
    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.match import tfidf_match

    sdir = _synth_dir(200)
    corpus = pq.read_table(f"{sdir}/corpus.parquet").to_pandas()
    forks = corpus[corpus["repo"].str.startswith("fork/")]
    pairs = []
    for r in forks.itertuples():
        orig = corpus[
            (corpus["path"] == r.path)
            & (~corpus["repo"].str.startswith("fork/"))
        ].iloc[0]
        pairs.append(
            (
                f"{r.repo}/{r.path}@{r.commit}",
                f"{orig.repo}/{orig.path}@{orig.commit}",
            )
        )
    results = results_dataset(
        read_corpus(f"{sdir}/corpus.parquet"), segmenter="crf"
    ).materialize()
    return tfidf_match(results, pairs)


def _agreement_diff(sf_dir: str):
    """J8 agreement: naive vs CRF segmenter over the synth corpus."""
    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.agreement import agreement
    from theoremkb_ray.stages.ingest import ingest
    from theoremkb_ray.stages.tokenize import tokenize

    sdir = _synth_dir(200)
    return agreement(tokenize(ingest(read_corpus(f"{sdir}/corpus.parquet"))))


def _agreement_spans(sf_dir: str):
    """J8 at the reference's granularity: one row per line where the
    naive and CRF segmenters disagree (label = 'a - b'), plus a
    summary row so the result is non-empty when they fully agree."""
    import pandas as pd

    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.agreement import agreement_spans
    from theoremkb_ray.stages.ingest import ingest
    from theoremkb_ray.stages.tokenize import tokenize

    sdir = _synth_dir(200)
    rows = agreement_spans(
        tokenize(ingest(read_corpus(f"{sdir}/corpus.parquet")))
    ).to_pandas()
    summary = pd.DataFrame(
        {
            "doc_id": ["_summary"],
            "line": [-1],
            "label_naive": [""],
            "label_crf": [""],
            "label": [f"n_disagreements={len(rows)}"],
        }
    )
    return pd.concat([summary, rows], ignore_index=True)


def _seg_report(sf_dir: str):
    """cli.py-test analog: line-level P/R/F1 of the CRF vs gold."""
    import pyarrow.parquet as pq

    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.agreement import classification_report
    from theoremkb_ray.stages.crf import segment_crf
    from theoremkb_ray.stages.ingest import ingest
    from theoremkb_ray.stages.tokenize import tokenize

    sdir = _synth_dir(200)
    ds = segment_crf(tokenize(ingest(read_corpus(f"{sdir}/corpus.parquet"))))
    gold = pq.read_table(f"{sdir}/gold_spans.parquet")
    return classification_report(ds, gold)


def _seg_report_words(sf_dir: str):
    """Training_word_based.ipynb analog: WORD-level P/R/F1 of the
    word-granularity CRF vs line gold projected onto words."""
    import pyarrow.parquet as pq

    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.ingest import ingest
    from theoremkb_ray.stages.tokenize import tokenize
    from theoremkb_ray.stages.words import word_classification_report

    sdir = _synth_dir(200)
    ds = tokenize(ingest(read_corpus(f"{sdir}/corpus.parquet")))
    gold = pq.read_table(f"{sdir}/gold_spans.parquet")
    return word_classification_report(ds, gold)


def _seg_report_cnn1d(sf_dir: str):
    """T3 analog: line-level P/R/F1 of the context-window MLP tagger
    (numpy CNN1D family) vs gold."""
    import pyarrow.parquet as pq

    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.agreement import classification_report
    from theoremkb_ray.stages.ingest import ingest
    from theoremkb_ray.stages.nn import segment_cnn1d
    from theoremkb_ray.stages.tokenize import tokenize

    sdir = _synth_dir(200)
    ds = segment_cnn1d(tokenize(ingest(read_corpus(f"{sdir}/corpus.parquet"))))
    gold = pq.read_table(f"{sdir}/gold_spans.parquet")
    return classification_report(ds, gold)


def _nlp_classify(sf_dir: str):
    """T8/T9 analog: 3-class paragraph classification (hashed-BoW
    logistic) over the synth corpus; per-class paragraph counts."""
    from ray.data.aggregate import Count

    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.ingest import ingest
    from theoremkb_ray.stages.nn import classify_paragraphs
    from theoremkb_ray.stages.tokenize import tokenize

    sdir = _synth_dir(200)
    out = classify_paragraphs(
        tokenize(ingest(read_corpus(f"{sdir}/corpus.parquet")))
    )
    return out.groupby("cls3").aggregate(Count(alias_name="n")).sort("cls3")


def _page_segment(sf_dir: str):
    """T2 analog: numpy conv page-band segmenter over synthetic page
    bitmaps (binary payload plumbing); one row per detected band."""
    import ray.data as rd

    from theoremkb_ray.stages.vision import segment_pages, synth_page_table

    pages, _gold = synth_page_table(128, seed=11)
    return segment_pages(rd.from_arrow(pages)).sort(
        ["media_id", "start_row"]
    )


def _split_stratified(sf_dir: str):
    """O5/O6: deterministic hash split + stratified sample summary.
    Both sides rank doc_id via key_rank64 (splitmix64 chain, seed 11),
    so the DuckDB oracle reproduces the exact counts."""
    import pandas as pd
    import ray.data as rd

    from theoremkb_ray.stages.sampling import stratified_sample, train_test_split

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    train, test = train_test_split(ds, "doc_id", 0.2, seed=11)
    strat = stratified_sample(
        _rp(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
        ),
        "lang",
        10,
        key_col="doc_id",
        seed=11,
    )
    return pd.DataFrame(
        {
            "n_train": [train.count()],
            "n_test": [test.count()],
            "n_strat": [strat.count()],
        }
    )


def _perplexity_docs(sf_dir: str):
    """CCNet-style quality score: train an MLE unigram LM on the
    documents corpus, score each doc's mean negative log-likelihood
    against it. Fully SQL-expressible (counts + ln + avg), so
    value-hash-oracled."""
    import ray.data as rd

    from theoremkb_ray.stages.lm import perplexity, unigram_lm

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    lm = unigram_lm(ds)
    return perplexity(ds, lm)


def _bigram_perplexity_docs(sf_dir: str):
    """KenLM-shaped upgrade of the CCNet filter: add-1 smoothed
    BIGRAM LM trained on the documents corpus in one fused exchange,
    each doc scored by mean -ln p(w_i | w_{i-1}). Context-sensitive
    (shuffled-token junk scores worse than fluent text with the same
    token multiset, which the unigram filter cannot see). Counts are
    exact integers, so the score is value-hash-oracled against a pure
    DuckDB re-derivation."""
    from theoremkb_ray.stages.lm import bigram_lm, bigram_perplexity

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    lm = bigram_lm(ds)
    return bigram_perplexity(ds, lm)


def _dsir_docs(sf_dir: str):
    """DSIR importance scoring (Xie et al., NeurIPS 2023): every doc
    scored by the add-1 unigram log-likelihood ratio of a TARGET LM
    (here the English subset — the domain to upweight) against the
    raw-corpus LM. Exact integer counts -> value-hash-oracled against
    a pure DuckDB re-derivation."""
    import pyarrow.compute as pc

    from theoremkb_ray.stages.lm import dsir_scores

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    target = ds.map_batches(
        lambda b: b.filter(pc.equal(b["lang"], "en")),
        batch_format="pyarrow",
    )
    return dsir_scores(ds, target)


def _collocations_pmi(sf_dir: str):
    """PMI collocation mining (Church & Hanks): every adjacent-token
    pair with corpus count >= 5, scored ln(c2*N/(ca*cb)). Exact
    integer membership predicate -> value-hash-oracled."""
    from theoremkb_ray.stages.collocate import collocations

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return collocations(ds, min_count=5)


def _source_drift(sf_dir: str):
    """Per-source KL divergence of the source's unigram distribution
    vs the whole corpus (mixture/ingest-feed drift diagnostics).
    Exact counts -> value-hash-oracled."""
    from theoremkb_ray.stages.collocate import source_drift

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return source_drift(ds)


def _approx_distinct_users(sf_dir: str):
    """HyperLogLog distinct user_id count over events (p=14, ~0.8%
    relative error). Approximate by design — the accuracy bound is
    asserted against the exact count in tests/test_sketches.py; a
    value-hash oracle is impossible for an estimator."""
    import pandas as pd
    import ray.data as rd

    from theoremkb_ray.stages.sketches import approx_distinct

    ds = _rp(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    return pd.DataFrame({"column": ["user_id"], "approx_distinct": [est]})


def _heavy_hitters_types(sf_dir: str):
    """Count-Min heavy hitters over events.event_type. The type
    vocabulary is tiny relative to the sketch width (collision
    probability ~(n_types/16384)^4), so the CM estimate equals the
    exact count and the query is DuckDB-oracle-checkable — the same
    sketch stays approximate-but-bounded at web-scale cardinality."""
    import ray.data as rd

    from theoremkb_ray.stages.sketches import heavy_hitters

    ds = _rp(f"{sf_dir}/events.parquet", columns=["event_type"])
    return heavy_hitters(ds, "event_type", k=5)


def _sample_docs(sf_dir: str):
    """Deterministic uniform 50-sample of documents without a global
    shuffle: rank = key_rank64(doc_id, seed) — a pure splitmix64 chain
    for integer keys — keep the 50 smallest. Membership is a pure
    function of (doc_id, seed), identical under any partitioning
    (asserted in tests), and the DuckDB oracle recomputes the chain
    exactly via UHUGEINT wrap-around arithmetic."""
    import ray.data as rd

    from theoremkb_ray.stages.sketches import uniform_sample

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return uniform_sample(ds, "doc_id", k=50, seed=7).sort("doc_id")


def _kmeans_docs(sf_dir: str):
    """Full-corpus distributed Lloyd k-means over the embeddings table
    (stages/cluster.py:kmeans_fit — per-iteration partial-sum fold,
    NOT the bounded-sample IVF quantizer). Returns per-cluster sizes +
    mean distance. Iterative model fitting isn't SQL-expressible; the
    distributed fit is asserted to match a single-process numpy Lloyd
    reference exactly in tests/test_cluster.py."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean

    from theoremkb_ray.stages.cluster import kmeans_assign, kmeans_fit

    emb = _rp(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    C, _inertia = kmeans_fit(emb, k=10, iters=5)
    assigned = kmeans_assign(emb, C).drop_columns(["embedding"])
    out = assigned.groupby("cluster").aggregate(
        Count(alias_name="n"), Mean("dist", alias_name="mean_dist")
    )
    return out.map_batches(
        lambda b: b.set_column(
            b.column_names.index("mean_dist"),
            "mean_dist",
            pc.round(b["mean_dist"], ndigits=6),
        ),
        batch_format="pyarrow",
    ).sort("cluster")


def _semdedup_docs(sf_dir: str):
    """SemDedup (cluster-then-prune embedding near-dedup,
    stages/cluster.py:semdedup). Threshold 0.45 yields a non-empty
    drop set on the synthetic Gaussian-cluster embeddings (11 drops at
    sf0.01 — the blobs are well-separated, so intra-cluster cosines
    are moderate); planted-dup recall at a realistic 0.99 threshold is
    asserted in tests/test_cluster.py. Returns a summary row plus one
    row per dropped vector."""
    import pandas as pd

    from theoremkb_ray.stages.cluster import semdedup

    emb = _rp(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    dropped = semdedup(emb, num_clusters=10, threshold=0.45).to_pandas()
    summary = pd.DataFrame(
        {
            "vec_id": [-1],
            "cluster": [-1],
            "kept_id": [-1],
            "cosine": [float(len(dropped))],
        }
    )
    if len(dropped):
        dropped = dropped.sort_values(["vec_id"]).reset_index(drop=True)
        return pd.concat([summary, dropped], ignore_index=True)
    return summary


def _pq_topk_docs(sf_dir: str):
    """Product-quantization ANN (stages/pq.py): encode the embeddings
    into an m=8/ks=16 code table with sample-trained codebooks, then
    answer 3 deterministic queries (embeddings of vec_ids 0..2) via
    ADC top-10. The encode step with deterministic codebooks is the
    oracle-checked `pq_codes` query; ADC distance exactness and
    cluster-level recall are asserted in tests/test_pq.py."""
    import numpy as np

    from theoremkb_ray.stages.pq import pq_encode, pq_topk, pq_train

    emb = _rp(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    books = pq_train(emb, m=8, ks=16)
    codes = pq_encode(emb, books).materialize()
    q_rows = (
        emb.sort("vec_id").limit(3).to_pandas()["embedding"].to_numpy()
    )
    Q = np.stack([np.asarray(v, np.float32) for v in q_rows])
    out = pq_topk(codes, books, Q, k=10).to_pandas()
    out["adist"] = out["adist"].round(6)
    return out.sort_values(["query_id", "adist", "vec_id"]).reset_index(
        drop=True
    )


def _seg_crossval(sf_dir: str):
    """K-fold cross-validation of the CRF tagger
    (stages/crossval.py:crossval_crf): hash-deterministic fold
    assignment, one distributed featurize pass, k parallel Ray
    training tasks over a single shared payload. Model training is
    not SQL-expressible; fold disjointness/determinism and
    metric-quality floors are asserted in tests/test_crossval.py."""
    import pyarrow.parquet as pq

    from theoremkb_ray.sources.corpus import read_corpus
    from theoremkb_ray.stages.crossval import crossval_crf

    sdir = _synth_dir(200)
    gold = pq.read_table(f"{sdir}/gold_spans.parquet")
    return crossval_crf(
        read_corpus(f"{sdir}/corpus.parquet"), gold, k=5, epochs=6
    )


def _ivfpq_topk_docs(sf_dir: str):
    """IVFADC search (stages/pq.py:ivfpq_*): coarse quantizer +
    residual product codebooks, nprobe-pruned code-table scan with
    per-(query, list) residual LUTs. Deterministic queries = the
    embeddings of vec_ids 0..2. ADC exactness vs reconstruction and
    probed-list containment are asserted in tests/test_pq.py."""
    import numpy as np

    from theoremkb_ray.stages.pq import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )

    emb = _rp(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    coarse, books = ivfpq_train(emb, num_centroids=16, m=8, ks=16)
    codes = ivfpq_encode(emb, coarse, books).materialize()
    q_rows = (
        emb.sort("vec_id").limit(3).to_pandas()["embedding"].to_numpy()
    )
    Q = np.stack([np.asarray(v, np.float32) for v in q_rows])
    out = ivfpq_topk(codes, coarse, books, Q, k=10, nprobe=4).to_pandas()
    out["adist"] = out["adist"].round(6)
    return out.sort_values(["query_id", "adist", "vec_id"]).reset_index(
        drop=True
    )


def _tdigest_docs(sf_dir: str):
    """Mergeable t-digest quantiles of document length
    (stages/sketches.py:tdigest_quantiles — one pass, O(delta) driver
    state per block, vs the exact two-pass `global_quantiles`
    operator). Approximate by design, so no SQL oracle; the rank-error
    envelope is asserted in tests/test_sketches.py. Returns (q, est,
    exact_rank_frac) — the last column shows each estimate's realized
    rank against the same data."""
    import numpy as np
    import pandas as pd

    from theoremkb_ray.stages.sketches import tdigest_quantiles

    ds = _rp(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = tdigest_quantiles(ds, "n_chars", qs, delta=200)
    vals = ds.to_pandas()["n_chars"].to_numpy()
    rows = [
        {
            "q": q,
            "est": round(float(est[q]), 6),
            "realized_rank": round(
                float((vals <= est[q]).mean()), 6
            ),
        }
        for q in qs
    ]
    return pd.DataFrame(rows)


def _bpe_tokenize_docs(sf_dir: str):
    """Distributed BPE tokenizer (stages/bpe.py): word-frequency
    histogram as ONE vocabulary-bounded exchange, driver-side merge
    training over the bounded histogram (Sennrich-style, deterministic
    tie-break), actor-pool encode with a persistent per-actor word
    cache. Returns per-doc (doc_id, n_words, n_tokens). Not
    SQL-expressible (iterative merges) — covered by tests/test_bpe.py
    incl. a literal re-implementation cross-check and a
    partitioning-invariance assertion."""
    import ray.data as rd

    from theoremkb_ray.stages.bpe import bpe_tokenize

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out, _merges = bpe_tokenize(ds, num_merges=120)
    return out


def _corpus_build(sf_dir: str):
    """The composed LLM corpus-build pipeline
    (pipelines/corpus_build.py): quality -> language -> exact dedup ->
    MinHash near-dedup -> decontaminate -> redact -> mixture -> chunk
    -> shard. Returns the per-stage row report. Every stage is an
    independently oracle-checked operator; the composition itself is
    deterministic (asserted in tests/test_corpus_build.py)."""
    import duckdb

    from theoremkb_ray.pipelines.corpus_build import run_corpus_build

    bench = (
        duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet' LIMIT 3"
        )
        .df()["text"]
        .tolist()
    )
    return run_corpus_build(
        f"{sf_dir}/documents.parquet",
        out_dir=None,
        langs=["en", "de", "fr", "es", "zh"],
        quotas={"en": 100, "de": 40, "fr": 40, "es": 40, "zh": 40},
        bench_texts=bench,
    )


def _media_search(sf_dir: str):
    """Multimodal composition (stages/multimodal.py): synthetic media
    -> actor-pool fake decode -> resize -> projection embedding ->
    cosine top-3 per query over the media embeddings
    (stages/similarity.py:brute_topk). Deterministic end to end; the
    decode/resize/embed contracts are tested in tests/test_vision.py."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.stages.multimodal import (
        decode_media,
        embed_media,
        resize_media,
        synth_media_table,
    )
    from theoremkb_ray.stages.similarity import brute_topk

    ds = rd.from_arrow(synth_media_table(64, seed=11)).repartition(4)
    emb = embed_media(decode_media(resize_media(ds))).materialize()
    with_id = emb.map_batches(
        lambda b: b.append_column(
            "vec_id",
            pa.array(
                [int(m[1:]) for m in b["media_id"].to_pylist()],
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
    ).materialize()
    df = with_id.to_pandas().sort_values("vec_id")
    Q = np.stack(
        [np.asarray(v, np.float32) for v in df["embedding"].head(3)]
    )
    out = brute_topk(with_id, Q, k=3).to_pandas()
    out["score"] = out["score"].round(6)
    return out.sort_values(["query_id", "score", "vec_id"],
                           ascending=[True, False, True]).reset_index(
        drop=True
    )


def _phash_dups(sf_dir: str):
    """IMAGE near-dedup by perceptual hash
    (stages/multimodal.py:ImagePHasher + the shared banded-pair
    machinery): real-decoded PNGs with planted 1-pixel-perturbed
    copies must pair with their originals, nothing else pairs.
    Binary media has no SQL representation — recall of the planted
    pairs and determinism are pinned in tests/test_vision.py."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.functions import codecs
    from theoremkb_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        phash_dup_pairs,
        synth_real_media_table,
    )

    rows = synth_real_media_table(48, seed=11).to_pylist()
    planted = []
    for r in rows:
        if r["format"] == "png" and len(planted) < 4:
            img = codecs.decode_png(r["payload"]).copy()
            img[0, 0, 0] = np.uint8((int(img[0, 0, 0]) + 1) % 256)
            planted.append(
                {
                    **r,
                    "media_id": "dup" + r["media_id"],
                    "payload": codecs.encode_png(img),
                }
            )
    tbl = pa.Table.from_pylist(rows + planted, schema=MEDIA_SCHEMA)
    out = phash_dup_pairs(rd.from_arrow(tbl).repartition(4)).to_pandas()
    # a pair surfaces once per shared band (all 8 for identical
    # hashes) — multiplicity is harmless for the CC consumers of the
    # text path, but the query reports distinct pairs
    return (
        out[["a", "b"]]
        .drop_duplicates()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def _media_export_wds(sf_dir: str):
    """WebDataset tar-shard export (sources/webdataset.py): real
    media payloads -> hash-sharded, byte-DETERMINISTIC tar shards
    with <key>.payload/<key>.json members + a per-shard manifest;
    returns the (shard, rows, bytes) summary. Binary sink — no SQL
    twin; payload round-trip + shard byte determinism are pinned in
    tests/test_webdataset.py."""
    import shutil

    import ray.data as rd

    from theoremkb_ray.sources.webdataset import write_webdataset
    from theoremkb_ray.stages.multimodal import synth_real_media_table

    out = "/tmp/tkb_wds_export"
    shutil.rmtree(out, ignore_errors=True)
    return write_webdataset(
        rd.from_arrow(synth_real_media_table(48, seed=3)).repartition(4),
        out,
        num_shards=6,
    )


def _audio_dups(sf_dir: str):
    """AUDIO near-dedup by spectral fingerprint
    (stages/multimodal.py:AudioFPHasher — Haitsma-Kalker double-diff
    signs over a 9x9 time/band energy grid): planted tiny-noise
    copies of amplitude-modulated noise clips pair with their
    originals, independent clips do not. Binary media has no SQL
    twin; recall + isolation are pinned in tests/test_vision.py."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.functions import codecs
    from theoremkb_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        audio_dup_pairs,
    )

    rng = np.random.RandomState(13)
    rate = 8000
    rows, dups = [], []
    for i in range(16):
        n = rate // 2
        env = 1.0 + np.sin(
            np.linspace(0, (i % 5 + 1) * np.pi, n)
        ) ** 2 * 3.0
        s = (rng.randn(n) * env * 2000).astype(np.int16)
        rows.append(
            {
                "media_id": f"a{i:05d}",
                "kind": "audio",
                "format": "wav",
                "width": -1,
                "height": -1,
                "duration_ms": 500,
                "payload": codecs.encode_wav(s, rate),
            }
        )
        if i < 3:
            noisy = np.clip(
                s.astype(np.int32) + rng.randint(-2, 3, len(s)),
                -32768,
                32767,
            ).astype(np.int16)
            dups.append(
                {
                    **rows[-1],
                    "media_id": f"adup{i:04d}",
                    "payload": codecs.encode_wav(noisy, rate),
                }
            )
    tbl = pa.Table.from_pylist(rows + dups, schema=MEDIA_SCHEMA)
    out = audio_dup_pairs(rd.from_arrow(tbl).repartition(4)).to_pandas()
    return (
        out[["a", "b"]]
        .drop_duplicates()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


#: quotas for the mixture_sample query — rebalance languages to a
#: target mix (en-heavy corpus downsampled, the rest kept broader)
MIXTURE_QUOTAS = {"en": 40, "de": 20, "fr": 20, "es": 20, "zh": 20}


def _mixture_docs(sf_dir: str):
    """Language-mixture resampling: fixed per-language quotas, ranked
    by a Knuth multiplicative hash of doc_id — deterministic under any
    partitioning and SQL-expressible (row_number over
    (doc_id*2654435761) % 2^32), so value-hash-oracled."""
    import ray.data as rd

    from theoremkb_ray.stages.sampling import mixture_sample

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return mixture_sample(ds, "lang", "doc_id", MIXTURE_QUOTAS)


def _redact_docs(sf_dir: str):
    """PII scrub (emails / IPv4 / phones) with per-class counts. The
    synthetic corpus contains no PII, so counts are 0 and redacted ==
    text — the oracle still verifies the full regex pipeline
    byte-for-byte (both engines are RE2); planted-PII behavior is
    covered in tests/test_redact.py."""
    import ray.data as rd

    from theoremkb_ray.stages.redact import redact

    return redact(
        _rp(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
        )
    )


def _ngram_dedup_docs(sf_dir: str):
    """D6 exact sibling: deterministic word-5-gram-Jaccard dedup
    (discriminative-gram semantics, df_cap=64) -> kept docs per lang.
    Unlike minhash/simhash there is no probabilistic recall term, so
    the SQL twin recomputes the identical answer from first
    principles (grams -> df filter -> Jaccard -> recursive-CTE
    connected components -> lexicographic-min canonicals)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from theoremkb_ray.stages.dedup import ngram_dedup

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ngram_dedup(ds).groupby("lang").aggregate(Count(alias_name="n"))


def _ngram_dup_edges(sf_dir: str):
    """The edge list behind _ngram_dedup_docs: (a, b, jaccard), exact.
    Jaccard stays a raw double — the SQL twin computes the identical
    inter/(na+nb-inter) expression from identical integer counts, so
    the values are bit-equal and the driver's own 6dp rounding agrees
    on both sides."""
    from theoremkb_ray.stages.dedup import exact_ngram_dup_edges

    ds = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_ngram_dup_edges(ds)


def _dedup_norm_docs(sf_dir: str):
    """Normalization-exact dedup: case-fold + collapse whitespace,
    then exact dedup on the normalized key (keep min doc_id). The
    cheap first rung of the dedup ladder — catches
    reformatted-but-identical docs before any sketch runs."""
    import pyarrow.compute as pc

    from theoremkb_ray.stages.dedup import exact_dedup

    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def add_norm(b):
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(b["text"]), r"\s+", " "
            )
        )
        return b.append_column("norm_text", norm)

    return (
        exact_dedup(
            ds.map_batches(add_norm, batch_format="pyarrow"),
            col="norm_text",
        )
        .select_columns(["doc_id", "lang"])
    )



def _dup_cluster_sizes(sf_dir: str):
    """Near-dup CLUSTER topology: size distribution of the connected
    components of the exact word-5-gram Jaccard>=0.5 dup graph —
    (cluster_size, n_clusters). The number dedup capacity planning
    actually needs (a 2-cluster-heavy landscape dedups cheaply; a few
    giant components mean transitive merge storms). Composes two
    oracle-checked distributed operators end to end: the
    discriminative-gram edge generator and min-label-propagation CC;
    the histogram adds two key-bounded groupbys (component ids, then
    the tiny size domain). Oracle = the edge SQL verbatim + a
    recursive-CTE transitive closure + the same double groupby."""
    from ray.data.aggregate import Count

    import pyarrow as pa
    import pyarrow.compute as pc

    from theoremkb_ray.stages.canonicalize import connected_components
    from theoremkb_ray.stages.dedup import exact_ngram_dup_edges

    ds = _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    labs = connected_components(
        exact_ngram_dup_edges(ds).select_columns(["a", "b"])
    )
    sizes = labs.groupby("label").aggregate(
        Count(alias_name="cluster_size")
    )
    out = sizes.groupby("cluster_size").aggregate(
        Count(alias_name="n_clusters")
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cluster_size": pc.cast(b["cluster_size"], pa.int64()),
                "n_clusters": pc.cast(b["n_clusters"], pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _mmr_topk_docs(sf_dir: str):
    """Maximal-marginal-relevance diverse top-10 over the embeddings
    table (stages/similarity.py:mmr_topk) for a deterministic query
    (mean of the 4 smallest vec_ids' embeddings). Greedy selection is
    inherently sequential, so there is no SQL twin — the distributed
    part (exact cosine top-`fetch` prefilter) IS oracle-checked via
    `ann_topk`; pytest cross-checks the greedy step against a literal
    reference loop (tests/test_similarity_mmr.py)."""
    import numpy as np
    import pyarrow.parquet as pq

    from theoremkb_ray.stages.similarity import mmr_topk

    emb = _rp(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    head = (
        pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .to_pandas()
        .sort_values("vec_id")
        .head(4)
    )
    qv = np.stack(head["embedding"].to_numpy()).mean(axis=0)
    return mmr_topk(emb, qv, k=10, fetch=64, lam=0.7)


def queries() -> dict[str, Callable[[str], Any]]:
    from theoremkb_ray.pipelines.relational import REGISTRY

    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in REGISTRY.items()
    }
    out.update(
        {
            "kg_triples": _kg_triples,
            "kg_triples_canonical": _kg_triples_canonical,
            "kg_cocitation": _kg_cocitation,
            "kg_doc_citations": _kg_doc_citations,
            "kg_proved_citing": _kg_proved_citing,
            "kg_results": _kg_results,
            "docs_segment": _docs_segment,
            "minhash_dedup_docs": _minhash_dedup_docs,
            "ngram_dedup_docs": _ngram_dedup_docs,
            "ngram_dup_edges": _ngram_dup_edges,
            "dedup_norm_docs": _dedup_norm_docs,
            "dup_cluster_sizes": _dup_cluster_sizes,
            "simhash_dedup_docs": _simhash_dedup_docs,
            "langid_docs": _langid_docs,
            "fingerprint_docs": _fingerprint_docs,
            "winnow_fingerprint_docs": _winnow_fingerprint_docs,
            "simhash_ranked_docs": _simhash_ranked_docs,
            "ivf_topk": _ivf_topk,
            "mmr_topk_docs": _mmr_topk_docs,
            "ivf_exact_topk": _ivf_exact_topk,
            "embedding_dups": _embedding_dups,
            "autoencoder_dups": _autoencoder_dups,
            "decontaminate_docs": _decontaminate_docs,
            "substring_dups": _substring_dups,
            "media_decode": _media_decode,
            "media_decode_real": _media_decode_real,
            "media_frames": _media_frames,
            "media_search": _media_search,
            "phash_dups": _phash_dups,
            "audio_dups": _audio_dups,
            "media_export_wds": _media_export_wds,
            "page_segment": _page_segment,
            "agreement_diff": _agreement_diff,
            "agreement_spans": _agreement_spans,
            "seg_report": _seg_report,
            "seg_report_words": _seg_report_words,
            "seg_report_cnn1d": _seg_report_cnn1d,
            "seg_report_noisy": _seg_report_noisy,
            "seg_report_words_noisy": _seg_report_words_noisy,
            "seg_report_cnn1d_noisy": _seg_report_cnn1d_noisy,
            "nlp_classify": _nlp_classify,
            "nlp_classify_noisy": _nlp_classify_noisy,
            "split_stratified": _split_stratified,
            "tfidf_match": _tfidf_match,
            "approx_distinct_users": _approx_distinct_users,
            "heavy_hitters_types": _heavy_hitters_types,
            "sample_docs": _sample_docs,
            "perplexity_docs": _perplexity_docs,
            "bigram_perplexity_docs": _bigram_perplexity_docs,
            "dsir_docs": _dsir_docs,
            "collocations_pmi": _collocations_pmi,
            "source_drift": _source_drift,
            "mixture_docs": _mixture_docs,
            "redact_docs": _redact_docs,
            "kmeans_docs": _kmeans_docs,
            "semdedup_docs": _semdedup_docs,
            "pq_topk_docs": _pq_topk_docs,
            "seg_crossval": _seg_crossval,
            "ivfpq_topk_docs": _ivfpq_topk_docs,
            "tdigest_docs": _tdigest_docs,
            "corpus_build": _corpus_build,
            "bpe_tokenize_docs": _bpe_tokenize_docs,
        }
    )
    return out


#: oracle for the adapter-path segmentation stats: line/word/char
#: counts are plain SQL; n_spans = 0 asserts the naive segmenter emits
#: ZERO false-positive spans on markup-free text (the documents table
#: has no styled result heads by construction).
SQL_DOCS_SEGMENT = """
SELECT doc_id,
       CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
       CAST(0 AS BIGINT)                                AS n_spans,
       CAST(len(string_split(text, ' ')) AS BIGINT)     AS n_words,
       CAST(length(text) AS BIGINT)                     AS n_chars
FROM documents
"""


#: oracle for 13-gram decontamination: the engine matches HASHES of
#: whitespace-token 13-grams; the oracle matches the gram STRINGS
#: (tokens re-joined by ' ' — faithful, since tokens cannot contain
#: whitespace and 64-bit hash collisions are negligible). Docs shorter
#: than 13 tokens contribute one gram of all their tokens, matching
#: ``shingle_hashes_flat``'s short-doc rule.
SQL_DECONTAMINATE = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
  FROM documents
),
bench AS (SELECT toks FROM tok ORDER BY doc_id LIMIT 20),
bgrams AS (
  SELECT DISTINCT array_to_string(
      CASE WHEN len(toks) >= 13 THEN toks[i:i+12] ELSE toks END, ' ') AS g
  FROM bench, unnest(generate_series(1, greatest(len(toks) - 12, 1))) AS t(i)
  WHERE len(toks) > 0
),
dgrams AS (
  SELECT doc_id,
         array_to_string(
      CASE WHEN len(toks) >= 13 THEN toks[i:i+12] ELSE toks END, ' ') AS g
  FROM tok, unnest(generate_series(1, greatest(len(toks) - 12, 1))) AS t(i)
  WHERE len(toks) > 0
),
counts AS (
  SELECT doc_id, count(*) AS overlap_grams
  FROM dgrams WHERE g IN (SELECT g FROM bgrams)
  GROUP BY doc_id
)
SELECT '_summary' AS doc_id, (SELECT count(*) FROM counts) AS overlap_grams
UNION ALL
SELECT CAST(doc_id AS VARCHAR) AS doc_id, overlap_grams FROM counts
"""


#: oracle for corpus self-join substring duplication: gram STRINGS in
#: SQL vs 64-bit gram hashes in the engine (equivalent modulo
#: negligible collisions — the decontaminate argument); short-doc /
#: empty-doc rules mirror shingle_hashes_flat.
SQL_SUBSTRING_DUPS = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
  FROM documents
),
dgrams AS (
  SELECT DISTINCT doc_id,
         array_to_string(
           CASE WHEN len(toks) >= 8 THEN toks[i:i+7] ELSE toks END, ' ') AS g
  FROM tok, unnest(generate_series(1, greatest(len(toks) - 7, 1))) AS t(i)
  WHERE len(toks) > 0
),
shared AS (SELECT g FROM dgrams GROUP BY g HAVING count(*) >= 2)
SELECT CAST(doc_id AS VARCHAR) AS doc_id, count(*) AS shared_grams
FROM dgrams WHERE g IN (SELECT g FROM shared)
GROUP BY doc_id
"""


#: oracle for the EXACT word-5-gram dedup: recompute grams, apply the
#: df<=64 discriminative filter to both sizes and intersections,
#: threshold Jaccard at 0.5, take connected components via a
#: recursive CTE (min over VARCHAR = the engine's lexicographic-min
#: canonical), count survivors per lang. Engine works on gram HASHES,
#: oracle on gram STRINGS (equivalent modulo negligible collisions).
SQL_NGRAM_DEDUP = r"""
WITH tok AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+4], ' ')
                        FOR i IN generate_series(1, len(toks) - 4)]) AS grams
  FROM tok WHERE len(toks) >= 5
),
gx0 AS (SELECT CAST(doc_id AS VARCHAR) AS id, unnest(grams) AS gram FROM g),
df AS (SELECT gram, count(*) AS c FROM gx0 GROUP BY gram),
gx AS (SELECT gx0.id, gx0.gram FROM gx0 JOIN df USING (gram) WHERE df.c <= 64),
sizes AS (SELECT id, count(*) AS n FROM gx GROUP BY id),
pair AS (
  SELECT a.id AS pa, b.id AS pb, count(*) AS inter
  FROM gx a JOIN gx b ON a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2
),
edges AS (
  SELECT pa AS a, pb AS b
  FROM pair JOIN sizes sa ON sa.id = pa JOIN sizes sb ON sb.id = pb
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
),
nodes AS (SELECT a AS id FROM edges UNION SELECT b FROM edges),
adj AS (SELECT a AS x, b AS y FROM edges UNION ALL SELECT b AS x, a AS y FROM edges),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT r.src, a.y FROM r JOIN adj a ON a.x = r.dst
  ) SELECT * FROM r
),
labels AS (SELECT src AS id, min(dst) AS label FROM reach GROUP BY src),
dropped AS (SELECT id FROM labels WHERE id <> label)
SELECT d.lang, count(*) AS n
FROM documents d LEFT JOIN dropped dr ON CAST(d.doc_id AS VARCHAR) = dr.id
WHERE dr.id IS NULL
GROUP BY d.lang
"""


#: the raw edge list behind SQL_NGRAM_DEDUP (a < b LEXICOGRAPHICALLY,
#: matching the engine's np.sort over string ids); jaccard is the
#: same double expression over the same integer counts -> bit-equal.
SQL_NGRAM_DUP_EDGES = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+4], ' ')
                        FOR i IN generate_series(1, len(toks) - 4)]) AS grams
  FROM tok WHERE len(toks) >= 5
),
gx0 AS (SELECT CAST(doc_id AS VARCHAR) AS id, unnest(grams) AS gram FROM g),
df AS (SELECT gram, count(*) AS c FROM gx0 GROUP BY gram),
gx AS (SELECT gx0.id, gx0.gram FROM gx0 JOIN df USING (gram) WHERE df.c <= 64),
sizes AS (SELECT id, count(*) AS n FROM gx GROUP BY id),
pair AS (
  SELECT a.id AS pa, b.id AS pb, count(*) AS inter
  FROM gx a JOIN gx b ON a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2
)
SELECT pa AS a, pb AS b,
       CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
FROM pair JOIN sizes sa ON sa.id = pa JOIN sizes sb ON sb.id = pb
WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
"""



#: dup_cluster_sizes oracle: the ngram-dup edge SQL verbatim, then a
#: recursive-CTE transitive closure (min-label per node) and the same
#: component-size -> histogram double groupby as the engine.
SQL_DUP_CLUSTER_SIZES = r"""
WITH RECURSIVE tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+4], ' ')
                        FOR i IN generate_series(1, len(toks) - 4)]) AS grams
  FROM tok WHERE len(toks) >= 5
),
gx0 AS (SELECT CAST(doc_id AS VARCHAR) AS id, unnest(grams) AS gram FROM g),
df AS (SELECT gram, count(*) AS c FROM gx0 GROUP BY gram),
gx AS (SELECT gx0.id, gx0.gram FROM gx0 JOIN df USING (gram) WHERE df.c <= 64),
sizes AS (SELECT id, count(*) AS n FROM gx GROUP BY id),
pair AS (
  SELECT a.id AS pa, b.id AS pb, count(*) AS inter
  FROM gx a JOIN gx b ON a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2
),
e AS (
  SELECT pa AS a, pb AS b
  FROM pair JOIN sizes sa ON sa.id = pa JOIN sizes sb ON sb.id = pb
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
),
und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
reach(node, s) AS (
  SELECT a, a FROM und GROUP BY a
  UNION
  SELECT und.b, reach.s FROM reach JOIN und ON und.a = reach.node
),
comp AS (SELECT node, min(s) AS component FROM reach GROUP BY node),
cs AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM cs GROUP BY 1
"""

#: MinHash-LSH dedup oracle: the planted near-dup landscape is
#: bimodal (J >= 0.87 within groups, <= 0.02 across), so the
#: LSH+hamming-verified result provably equals exact word-5-gram
#: Jaccard >= 0.5 components — which SQL recomputes independently
#: (no df cap here: the engine's minhash path has none).
SQL_MINHASH_DEDUP = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+4], ' ')
                        FOR i IN generate_series(1, len(toks) - 4)]) AS grams
  FROM tok WHERE len(toks) >= 5
),
gx AS (SELECT CAST(doc_id AS VARCHAR) AS id, unnest(grams) AS gram FROM g),
sizes AS (SELECT id, count(*) AS n FROM gx GROUP BY id),
pair AS (
  SELECT a.id AS pa, b.id AS pb, count(*) AS inter
  FROM gx a JOIN gx b ON a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2
),
edges AS (
  SELECT pa AS a, pb AS b
  FROM pair JOIN sizes sa ON sa.id = pa JOIN sizes sb ON sb.id = pb
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
),
nodes AS (SELECT a AS id FROM edges UNION SELECT b FROM edges),
adj AS (SELECT a AS x, b AS y FROM edges UNION ALL SELECT b AS x, a AS y FROM edges),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT r.src, a.y FROM r JOIN adj a ON a.x = r.dst
  ) SELECT * FROM r
),
labels AS (SELECT src AS id, min(dst) AS label FROM reach GROUP BY src),
dropped AS (SELECT id FROM labels WHERE id <> label)
SELECT d.lang, count(*) AS n
FROM documents d LEFT JOIN dropped dr ON CAST(d.doc_id AS VARCHAR) = dr.id
WHERE dr.id IS NULL
GROUP BY d.lang
"""


#: language-ID oracle: replicate stages/textstats.py:LangId exactly —
#: lower + whitespace split + first 200 words, stopword hit counts
#: per profile, priority order en > fr > es > de on ties, 'und' on
#: zero hits, CJK shortcut over the first 400 characters.
SQL_LANGID = r"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     t -> t <> '')[:200] AS ws
  FROM documents
),
h AS (
  SELECT doc_id,
    len(list_filter(ws, t -> t IN ('the','and','of','to','a','in','is','that','for','it'))) AS h_en,
    len(list_filter(ws, t -> t IN ('le','la','les','de','des','et','un','une','est','que'))) AS h_fr,
    len(list_filter(ws, t -> t IN ('el','la','los','de','y','un','una','es','que','en'))) AS h_es,
    len(list_filter(ws, t -> t IN ('der','die','das','und','ein','eine','ist','zu','den','von'))) AS h_de
  FROM w
),
c AS (
  SELECT doc_id,
    length(substring(text, 1, 400))
      - length(regexp_replace(substring(text, 1, 400), '[一-鿿]', '', 'g')) AS nc,
    least(length(text), 400) AS tl
  FROM documents
)
SELECT h.doc_id,
  CASE WHEN c.nc > 0.2 * c.tl THEN 'zh'
       WHEN greatest(h_en, h_fr, h_es, h_de) = 0 THEN 'und'
       WHEN h_en >= h_fr AND h_en >= h_es AND h_en >= h_de THEN 'en'
       WHEN h_fr >= h_es AND h_fr >= h_de THEN 'fr'
       WHEN h_es >= h_de THEN 'es'
       ELSE 'de' END AS lang_pred
FROM h JOIN c ON h.doc_id = c.doc_id
"""


#: embedding near-dup oracle: exact pairwise cosine at the SRP
#: operating point (hamming<=6 of 64 ~ cos>=0.96) + the same
#: recursive-CTE components; verifies the LSH path emits NO false
#: positives and misses nothing above the threshold.
SQL_EMBEDDING_DUPS = r"""
WITH pairs AS (
  SELECT CAST(a.vec_id AS VARCHAR) AS pa, CAST(b.vec_id AS VARCHAR) AS pb
  FROM embeddings a JOIN embeddings b
    ON CAST(a.vec_id AS VARCHAR) < CAST(b.vec_id AS VARCHAR)
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.96
),
nodes AS (SELECT pa AS id FROM pairs UNION SELECT pb FROM pairs),
adj AS (SELECT pa AS x, pb AS y FROM pairs UNION ALL SELECT pb AS x, pa AS y FROM pairs),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT r.src, a.y FROM r JOIN adj a ON a.x = r.dst
  ) SELECT * FROM r
),
labels AS (SELECT src AS id, min(dst) AS label FROM reach GROUP BY src),
dup AS (SELECT id, label FROM labels WHERE id <> label)
SELECT '_summary' AS vec_id,
       'n_vectors=' || CAST((SELECT count(*) FROM embeddings) AS VARCHAR)
         || ';n_dups=' || CAST((SELECT count(*) FROM dup) AS VARCHAR) AS canonical
UNION ALL
SELECT id AS vec_id, label AS canonical FROM dup
"""


#: normalization-exact dedup oracle: identical normalization
#: (casefold + collapse whitespace + trim), keep min doc_id per key.
SQL_DEDUP_NORM = r"""
WITH k AS (
  SELECT doc_id, lang,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS key
  FROM documents
),
keep AS (SELECT min(doc_id) AS doc_id FROM k GROUP BY key)
SELECT k.doc_id, k.lang FROM k JOIN keep USING (doc_id)
"""


def _splitmix_round_ctes(p: str, src: str, carry: str) -> str:
    """One splitmix64 finalizer round as a DuckDB CTE chain.

    Reproduces functions/hashing.py:splitmix64 bit-for-bit: 64-bit
    wrap-around via UHUGEINT arithmetic mod 2**64 (64x64-bit products
    fit uint128 exactly). `src` must expose a UBIGINT column `x` plus
    the carried columns; the chain ends at CTE ``{p}4``."""
    M = 18446744073709551616  # 2**64
    return f"""
{p}1 AS (SELECT {carry}, CAST((CAST(x AS UHUGEINT) + 11400714819323198485) % {M} AS UBIGINT) AS x FROM {src}),
{p}2 AS (SELECT {carry}, CAST((CAST(xor(x, x >> 30) AS UHUGEINT) * 13787848793156543929) % {M} AS UBIGINT) AS x FROM {p}1),
{p}3 AS (SELECT {carry}, CAST((CAST(xor(x, x >> 27) AS UHUGEINT) * 10723151780598845931) % {M} AS UBIGINT) AS x FROM {p}2),
{p}4 AS (SELECT {carry}, xor(x, x >> 31) AS x FROM {p}3),"""


def _key_rank_sql(table: str, key: str, carry: str, seed: int) -> str:
    """WITH-clause body computing ``rank = key_rank64(key, seed)``
    (functions/hashing.py) for non-negative integer keys: two splitmix
    rounds with the seed XORed in between. Final CTE ``r`` exposes the
    carried columns plus UBIGINT ``x`` = the rank. seed=0 matches the
    runtime's single-round shortcut (key_rank64 skips the outer mix)."""
    head = f"""
s0 AS (SELECT {carry}, CAST({key} AS UBIGINT) AS x FROM {table}),
{_splitmix_round_ctes('a', 's0', carry)}"""
    if not seed:
        return head + f"\nr AS (SELECT {carry}, x FROM a4)"
    return (
        head
        + f"""
sx AS (SELECT {carry}, xor(x, CAST({seed} AS UBIGINT)) AS x FROM a4),
{_splitmix_round_ctes('b', 'sx', carry)}
r AS (SELECT {carry}, x FROM b4)"""
    )


def oracle_sql() -> dict[str, str]:
    from theoremkb_ray.pipelines.relational import REGISTRY

    out = {
        name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None
    }
    out["docs_segment"] = SQL_DOCS_SEGMENT
    out["decontaminate_docs"] = SQL_DECONTAMINATE
    out["substring_dups"] = SQL_SUBSTRING_DUPS
    # exact-mode IVF (nprobe == num_centroids) reduces to brute-force
    # cosine top-k — identical ranking contract to ann_topk
    from theoremkb_ray.pipelines.relational import SQL_ANN_TOPK

    out["ivf_exact_topk"] = SQL_ANN_TOPK
    # heavy_hitters_types: exact because the type vocabulary is far
    # below the sketch width (see _heavy_hitters_types docstring)
    out["heavy_hitters_types"] = """
SELECT event_type AS value, count(*) AS est_count
FROM events
GROUP BY event_type
ORDER BY est_count DESC, value ASC
LIMIT 5
"""
    # perplexity_docs: re-derive the MLE unigram LM in SQL — same
    # whitespace tokenization as flat_token_hashes_arrow, logp =
    # ln(count/total), nll = -avg(logp). Docs with zero tokens emit no
    # row on either side.
    out["perplexity_docs"] = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            t -> t <> '')) AS tok
  FROM documents
),
counts AS (SELECT tok, count(*)::DOUBLE AS c FROM tok GROUP BY tok),
tot AS (SELECT sum(c) AS n FROM counts)
SELECT t.doc_id,
       count(*) AS n_tokens,
       -avg(ln(cn.c / tot.n)) AS nll
FROM tok t JOIN counts cn ON t.tok = cn.tok CROSS JOIN tot
GROUP BY t.doc_id
"""
    # bigram_perplexity_docs: re-derive the add-1 bigram LM in SQL —
    # zipped unnest of prefix/suffix list slices yields the in-doc
    # bigrams, p = (c2+1)/(c1+V) with c1 the corpus-wide unigram count
    # of the left token and V the vocabulary size. Docs with < 2
    # tokens emit no row on either side.
    out["bigram_perplexity_docs"] = r"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'),
                     t -> t <> '') AS a
  FROM documents
),
tok AS (SELECT doc_id, unnest(a) AS tok FROM arr),
uni AS (SELECT tok, count(*)::DOUBLE AS c FROM tok GROUP BY tok),
v AS (SELECT count(*)::DOUBLE AS v FROM uni),
big AS (
  SELECT doc_id,
         unnest(a[1:len(a)-1]) AS prev,
         unnest(a[2:len(a)]) AS cur
  FROM arr WHERE len(a) >= 2
),
bcnt AS (
  SELECT prev, cur, count(*)::DOUBLE AS c2 FROM big GROUP BY prev, cur
)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       -avg(ln((bc.c2 + 1.0) / (u.c + v.v))) AS nll
FROM big b
JOIN bcnt bc ON b.prev = bc.prev AND b.cur = bc.cur
JOIN uni u ON b.prev = u.tok
CROSS JOIN v
GROUP BY b.doc_id
"""
    # dsir_docs: add-1 unigram log-likelihood ratio, target = lang='en'
    # subset, smoothing denominator T_* + V with V the RAW-corpus
    # vocabulary (stages/lm.py:DSIRScorer — keep the predicate and the
    # denominators in sync).
    # winnow_fingerprint_docs: token IDs = dense_rank over the sorted
    # distinct vocabulary (0-based, matching pc.index_in against the
    # sorted vocab); window hash = list_reduce FNV fold mod 2^64 then
    # one splitmix64 round chain; winnow keeps x % 16 = 0 per doc, or
    # the doc's min window hash when none qualify (the degenerate rule
    # of functions/hashing.py:rolling_fingerprint). Keep in sync with
    # stages/textstats.py:winnow_fingerprints_ranked.
    out["winnow_fingerprint_docs"] = (
        r"""
WITH arr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                             t -> t <> '') AS a
  FROM documents
),
vocab AS (
  SELECT tok, CAST(dense_rank() OVER (ORDER BY tok) - 1 AS UBIGINT) AS id
  FROM (SELECT DISTINCT unnest(a) AS tok FROM arr)
),
tok AS (
  SELECT doc_id, i AS pos, a[i] AS tokval
  FROM arr, unnest(generate_series(1, len(a))) AS t(i)
),
idarr AS (
  SELECT doc_id, list(v.id ORDER BY pos) AS ids
  FROM tok JOIN vocab v ON tok.tokval = v.tok
  GROUP BY doc_id
),
w AS (
  SELECT doc_id,
         CASE WHEN len(ids) >= 8 THEN ids[i:i+7] ELSE ids END AS win
  FROM idarr,
       unnest(generate_series(1, greatest(len(ids) - 7, 1))) AS t(i)
  WHERE len(ids) > 0
),
acc AS (
  SELECT doc_id,
         list_reduce(win, (a, x) -> CAST(
           (CAST(a AS UHUGEINT) * 1099511628211 + x)
           % 18446744073709551616 AS UBIGINT)) AS x
  FROM w
),
"""
        + _splitmix_round_ctes("s", "acc", "doc_id")
        + r"""
kept AS (SELECT DISTINCT doc_id, x FROM s4 WHERE x % 16 = 0),
mn AS (SELECT doc_id, min(x) AS x FROM s4 GROUP BY doc_id)
SELECT doc_id, x AS fp FROM kept
UNION
SELECT doc_id, x AS fp FROM mn
WHERE doc_id NOT IN (SELECT doc_id FROM kept)
"""
    )
    # simhash_ranked_docs: token IDs = dense_rank - 1 over the sorted
    # vocabulary; per-occurrence hash = ONE splitmix64 round of the ID
    # (functions/hashing.py:splitmix64 == _splitmix_round_ctes); sketch
    # bit m set iff 2 * (count of set bit-m token hashes, weighted by
    # occurrence count) > doc token count — simhash64_flat's strict
    # majority. Keep in sync with stages/textstats.py:simhash_ranked.
    out["simhash_ranked_docs"] = (
        r"""
WITH arr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                             t -> t <> '') AS a
  FROM documents
),
tok AS (SELECT doc_id, unnest(a) AS tokval FROM arr),
tc AS (SELECT doc_id, tokval, count(*) AS cnt FROM tok
       GROUP BY doc_id, tokval),
vocab AS (
  SELECT tok, CAST(dense_rank() OVER (ORDER BY tok) - 1 AS UBIGINT) AS id
  FROM (SELECT DISTINCT tokval AS tok FROM tok)
),
acc AS (
  SELECT tc.doc_id, tc.cnt, v.id AS x
  FROM tc JOIN vocab v ON tc.tokval = v.tok
),
"""
        + _splitmix_round_ctes("s", "acc", "doc_id, cnt")
        + r"""
tl AS (SELECT doc_id, sum(cnt) AS total FROM s4 GROUP BY doc_id),
bits AS (
  SELECT s4.doc_id, b.b,
         CAST(sum(cnt * CAST((x >> b.b) & 1 AS BIGINT)) AS BIGINT) AS ones
  FROM s4, (SELECT unnest(generate_series(0, 63)) AS b) b
  GROUP BY s4.doc_id, b.b
)
SELECT bits.doc_id,
       bit_or(CASE WHEN 2 * ones > tl.total
                   THEN CAST(CAST(1 AS UHUGEINT) << CAST(b AS UHUGEINT)
                             AS UBIGINT)
                   ELSE CAST(0 AS UBIGINT) END) AS simhash
FROM bits JOIN tl USING (doc_id)
GROUP BY bits.doc_id
"""
    )
    out["dsir_docs"] = r"""
WITH arr AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(text, '\s+'),
                     t -> t <> '') AS a
  FROM documents
),
tok AS (SELECT doc_id, lang, unnest(a) AS tok FROM arr),
rcnt AS (SELECT tok, count(*)::DOUBLE AS c FROM tok GROUP BY tok),
vt AS (SELECT count(*)::DOUBLE AS v, sum(c) AS t FROM rcnt),
tcnt AS (
  SELECT tok, count(*)::DOUBLE AS c FROM tok
  WHERE lang = 'en' GROUP BY tok
),
tt AS (SELECT coalesce(sum(c), 0.0) AS t FROM tcnt)
SELECT k.doc_id,
       count(*) AS n_tokens,
       avg(ln((coalesce(g.c, 0.0) + 1.0) / (tt.t + vt.v))
           - ln((r.c + 1.0) / (vt.t + vt.v))) AS dsir_score
FROM tok k
JOIN rcnt r ON k.tok = r.tok
LEFT JOIN tcnt g ON k.tok = g.tok
CROSS JOIN vt CROSS JOIN tt
GROUP BY k.doc_id
"""
    # collocations_pmi: adjacent-pair counts >= 5 with
    # pmi = ln(c2 * N / (ca * cb)) — stages/collocate.py:collocations
    out["collocations_pmi"] = r"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'),
                     t -> t <> '') AS a
  FROM documents
),
tok AS (SELECT doc_id, unnest(a) AS tok FROM arr),
uni AS (SELECT tok, count(*)::DOUBLE AS c FROM tok GROUP BY tok),
tot AS (SELECT sum(c) AS n FROM uni),
big AS (
  SELECT unnest(a[1:len(a)-1]) AS prev,
         unnest(a[2:len(a)]) AS cur
  FROM arr WHERE len(a) >= 2
),
bcnt AS (
  SELECT prev, cur, count(*) AS pair_n FROM big GROUP BY prev, cur
)
SELECT b.prev, b.cur, b.pair_n,
       ln(b.pair_n::DOUBLE * tot.n / (ua.c * ub.c)) AS pmi
FROM bcnt b
JOIN uni ua ON b.prev = ua.tok
JOIN uni ub ON b.cur = ub.tok
CROSS JOIN tot
WHERE b.pair_n >= 5
"""
    # source_drift: per-source KL(source || corpus) over unigram
    # distributions — stages/collocate.py:source_drift
    out["source_drift"] = r"""
WITH arr AS (
  SELECT source,
         list_filter(regexp_split_to_array(text, '\s+'),
                     t -> t <> '') AS a
  FROM documents
),
tok AS (SELECT source, unnest(a) AS tok FROM arr),
scnt AS (
  SELECT source, tok, count(*)::DOUBLE AS c FROM tok
  GROUP BY source, tok
),
stot AS (SELECT source, sum(c) AS ns FROM scnt GROUP BY source),
ccnt AS (SELECT tok, sum(c) AS c FROM scnt GROUP BY tok),
ctot AS (SELECT sum(c) AS n FROM ccnt)
SELECT s.source,
       CAST(st.ns AS BIGINT) AS n_tokens,
       sum((s.c / st.ns) * ln((s.c / st.ns) / (g.c / ctot.n))) AS kl
FROM scnt s
JOIN stot st ON s.source = st.source
JOIN ccnt g ON s.tok = g.tok
CROSS JOIN ctot
GROUP BY s.source, st.ns
"""
    # mixture_docs: same Knuth rank + per-language quota as
    # stages/sampling.py:mixture_sample (keep CASE in sync with
    # MIXTURE_QUOTAS)
    out["mixture_docs"] = """
WITH ranked AS (
  SELECT doc_id, lang,
         (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS rnk
  FROM documents
), numbered AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY rnk, doc_id) AS rn
  FROM ranked
)
SELECT doc_id, lang FROM numbered
WHERE rn <= CASE lang WHEN 'en' THEN 40 ELSE 20 END
"""
    # redact_docs: nested regexp_replace in the SAME order as
    # stages/redact.py:PII_PATTERNS; counts on the original text.
    # Both engines are RE2, so output matches byte-for-byte.
    _email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    _ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    _phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    out["redact_docs"] = f"""
SELECT doc_id, lang,
       len(regexp_extract_all(text, '{_email}')) AS n_email,
       len(regexp_extract_all(text, '{_ipv4}')) AS n_ipv4,
       len(regexp_extract_all(text, '{_phone}')) AS n_phone,
       regexp_replace(regexp_replace(regexp_replace(
           text, '{_email}', '<EMAIL>', 'g'),
           '{_ipv4}', '<IP>', 'g'),
           '{_phone}', '<PHONE>', 'g') AS redacted
FROM documents
"""
    out["ngram_dedup_docs"] = SQL_NGRAM_DEDUP
    out["ngram_dup_edges"] = SQL_NGRAM_DUP_EDGES
    out["dup_cluster_sizes"] = SQL_DUP_CLUSTER_SIZES
    out["minhash_dedup_docs"] = SQL_MINHASH_DEDUP
    out["langid_docs"] = SQL_LANGID
    out["embedding_dups"] = SQL_EMBEDDING_DUPS
    out["dedup_norm_docs"] = SQL_DEDUP_NORM
    # sample_docs: uniform_sample ranks integer keys by the pure
    # splitmix64 chain (key_rank64), reproduced here exactly — the
    # 50 smallest ranks are the sample, order-insensitive.
    out["sample_docs"] = f"""
WITH {_key_rank_sql('documents', 'doc_id', 'doc_id, lang', 7)}
SELECT doc_id, lang FROM r ORDER BY x LIMIT 50
"""
    # split_stratified: ONE rank column serves both the 0.2 hash
    # threshold split and the per-lang 10-smallest stratified sample
    # (both run with seed=11 on doc_id). Threshold mirrors
    # train_test_split's int(f * 2**64) exactly.
    _thresh = int(0.2 * 2**64)
    out["split_stratified"] = f"""
WITH {_key_rank_sql('documents', 'doc_id', 'doc_id, lang', 11)},
nums AS (
  SELECT lang,
         row_number() OVER (PARTITION BY lang ORDER BY x, doc_id) AS rn
  FROM r
)
SELECT
  (SELECT count(*) FROM r WHERE x >= {_thresh}) AS n_train,
  (SELECT count(*) FROM r WHERE x < {_thresh}) AS n_test,
  (SELECT count(*) FROM nums WHERE rn <= 10) AS n_strat
"""
    return out
