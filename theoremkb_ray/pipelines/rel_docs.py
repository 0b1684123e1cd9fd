"""Document-corpus curation and text-analysis queries over the documents table (dedup, quality, chunking, tokens).

Split from pipelines/relational.py (round 5) purely for maintainability;
every query registers into the shared REGISTRY exactly as before and
is re-exported by pipelines/relational.py.
"""


from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from ..stages.joins import broadcast_join, hash_join

from .relcore import (  # noqa: F401
    COARSE_USER_BUCKETS,
    REGISTRY,
)
from . import relcore as _relcore


def _pq(sf_dir, table, columns=None):
    # late-bound so tests can monkeypatch relcore._pq in
    # ONE place and every domain module sees it
    return _relcore._pq(sf_dir, table, columns)


def q_pattern(sf_dir: str):
    """M3 get_pattern scalar kernel parity."""
    from ..functions.text import get_pattern_array

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        head = pc.utf8_slice_codeunits(b["text"], 0, 40)
        return pa.table(
            {"doc_id": b["doc_id"], "pattern": get_pattern_array(head)}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_PATTERN = """
SELECT doc_id,
       regexp_replace(regexp_replace(lower(substr(text, 1, 40)),
                                     '[0-9]', '@', 'g'),
                      '[^a-z@]+', '', 'g') AS pattern
FROM documents
"""


def q_dedup_exact(sf_dir: str):
    """D1: exact text dedup -> survivors per lang."""
    from ..stages.dedup import exact_dedup

    ds = _pq(sf_dir, "documents", ["doc_id", "text", "lang"])
    return exact_dedup(ds).groupby("lang").aggregate(Count(alias_name="n"))


SQL_DEDUP_EXACT = """
SELECT lang, count(*) AS n FROM (
  SELECT lang, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
GROUP BY lang
"""


def q_distinct(sf_dir: str):
    """D3: distinct pairs."""
    ds = _pq(sf_dir, "documents", ["lang", "source"])
    return (
        ds.groupby(["lang", "source"])
        .count()
        .select_columns(["lang", "source"])
    )


SQL_DISTINCT = "SELECT DISTINCT lang, source FROM documents"


def q_union(sf_dir: str):
    """D4: union of two filtered streams + aggregate."""
    def keep(lang):
        return lambda b: b.filter(pc.equal(b["lang"], lang))

    a = _pq(sf_dir, "documents", ["lang", "n_chars"]).map_batches(
        keep("en"), batch_format="pyarrow"
    )
    b = _pq(sf_dir, "documents", ["lang", "n_chars"]).map_batches(
        keep("fr"), batch_format="pyarrow"
    )
    u = a.union(b)
    n = u.count()
    total = u.sum("n_chars")
    return pd.DataFrame({"n": [n], "total_chars": [int(total)]})


SQL_UNION = """
SELECT count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM (
  SELECT * FROM documents WHERE lang = 'en'
  UNION ALL SELECT * FROM documents WHERE lang = 'fr')
"""


def q_vocab_topk(sf_dir: str):
    """A7/T4: global token top-k (partial counts -> tiny groupby)."""
    from ..stages.textstats import vocabulary_topk

    ds = _pq(sf_dir, "documents", ["text"])
    return vocabulary_topk(ds, k=20)


SQL_VOCAB_TOPK = """
SELECT token, count(*) AS count FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token ORDER BY count DESC, token LIMIT 20
"""


def q_token_count(sf_dir: str):
    """Text analysis: whitespace token count per doc."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(b["text"], " "), 1)
        return pa.table(
            {"doc_id": b["doc_id"], "n_ws_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_TOKEN_COUNT = """
SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens FROM documents
"""


def q_quality(sf_dir: str):
    """Text quality heuristics (SQL-expressible subset)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        t = b["text"]
        n_chars = pc.utf8_length(t)
        n_words = pc.add(pc.count_substring(t, " "), 1)
        n_alpha = pc.utf8_length(
            pc.replace_substring_regex(t, r"[^A-Za-z]", "")
        )
        nc = pc.max_element_wise(n_chars, 1)
        # floor-quantize instead of round: round() half-rule differs
        # between Arrow (half-even) and DuckDB (half-away) at exact .5
        ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()), pc.cast(nc, pa.float64())
        )
        ar = pc.divide(pc.floor(pc.multiply(ratio, 1e6)), 1e6)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_words": pc.cast(n_words, pa.int64()),
                "alpha_ratio": ar,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_QUALITY = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       floor(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
             * 1.0 / greatest(length(text), 1) * 1000000) / 1000000
         AS alpha_ratio
FROM documents
"""


def q_rollup_words(sf_dir: str):
    """A1 hierarchical rollup analog: child (word) stats rolled up to
    the parent (document): n/avg-len/max-len per doc — computed
    vectorized per batch (no per-word rows ever leave the task)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = flat.values
        if offs[0] != 0:
            vals = vals.slice(offs[0])
            offs = offs - offs[0]
        lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False).astype(np.float64)
        n_docs = b.num_rows
        counts = np.diff(offs)
        sums = np.add.reduceat(lens, offs[:-1], dtype=np.float64)
        sums[counts == 0] = 0.0
        maxs = np.maximum.reduceat(lens, offs[:-1]) if len(lens) else np.zeros(n_docs)
        maxs = np.where(counts == 0, 0, maxs)
        avg = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
        avg = np.floor(avg * 1e6) / 1e6
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_words": pa.array(counts.astype(np.int64)),
                "avg_word_len": pa.array(avg, pa.float64()),
                "max_word_len": pa.array(maxs.astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_ROLLUP_WORDS = """
SELECT doc_id,
       count(*) AS n_words,
       floor(avg(length(w)) * 1000000) / 1000000 AS avg_word_len,
       max(length(w)) AS max_word_len
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY doc_id
"""


def q_rollup_hier(sf_dir: str):
    """A1 FULL hierarchical rollup (reference get_features,
    paper/features.py:96-180): word-child stats per (doc, line) —
    min/max/avg/std(pop) word length, first/second/last word — the
    min/max/std/mean + groupby.nth(0/1/-1) machinery, vectorized via
    the segment kernels in stages/rollup.py. Zero shuffle: each
    document's lines stay inside its batch task."""
    from ..stages.rollup import (
        segment_mean_std,
        segment_min_max,
        segment_nth,
    )

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        lines = pc.split_pattern(b["text"], "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        doc_off = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lines.values
        if doc_off[0] != 0:
            flat = flat.slice(doc_off[0], doc_off[-1] - doc_off[0])
            doc_off = doc_off - doc_off[0]
        words = pc.split_pattern(flat, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = words.values
        if offs[0] != 0:
            vals = vals.slice(offs[0], offs[-1] - offs[0])
            offs = offs - offs[0]
        lens = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
        mins, maxs = segment_min_max(lens, offs)
        # exact-integer mean/std so the oracle's identical expression
        # produces bit-identical doubles (no float-summation-order
        # divergence): var = (n*s2 - s1^2) / n^2 over int64 sums
        lens_i = lens.astype(np.int64)
        counts_w = np.diff(offs)
        s1 = np.add.reduceat(lens_i, offs[:-1].clip(max=max(len(lens_i) - 1, 0)))
        s2 = np.add.reduceat(lens_i * lens_i, offs[:-1].clip(max=max(len(lens_i) - 1, 0)))
        if len(lens_i) == 0:
            s1 = np.zeros(len(counts_w), dtype=np.int64)
            s2 = np.zeros(len(counts_w), dtype=np.int64)
        s1[counts_w == 0] = 0
        s2[counts_w == 0] = 0
        nn = np.maximum(counts_w, 1).astype(np.float64)
        mean = s1.astype(np.float64) / nn
        std = np.sqrt(
            (nn * s2.astype(np.float64) - s1.astype(np.float64) ** 2)
            / (nn * nn)
        )
        n_lines = np.diff(doc_off)
        doc_ids = np.repeat(
            b["doc_id"].to_numpy(zero_copy_only=False), n_lines
        )
        line_idx = np.arange(int(doc_off[-1])) - np.repeat(
            doc_off[:-1], n_lines
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "line": pa.array(line_idx, pa.int64()),
                "n_words": pa.array(np.diff(offs), pa.int64()),
                "min_word_len": pa.array(mins.astype(np.int64)),
                "max_word_len": pa.array(maxs.astype(np.int64)),
                "avg_word_len": pa.array(np.floor(mean * 1e6) / 1e6),
                "std_word_len": pa.array(np.floor(std * 1e6) / 1e6),
                "first_word": segment_nth(vals, offs, 0),
                "second_word": segment_nth(vals, offs, 1),
                "last_word": segment_nth(vals, offs, -1),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_ROLLUP_HIER = """
WITH lines AS (
  SELECT doc_id, u.l AS line_txt, CAST(u.i - 1 AS BIGINT) AS line
  FROM (
    SELECT doc_id,
           unnest(list_transform(string_split(text, chr(10)),
                                 (x, i) -> {'l': x, 'i': i})) AS u
    FROM documents
  )
),
words AS (
  SELECT doc_id, line, w.w AS word, w.j AS j
  FROM (
    SELECT doc_id, line,
           unnest(list_transform(string_split(line_txt, ' '),
                                 (x, j) -> {'w': x, 'j': j})) AS w
    FROM lines
  )
)
SELECT doc_id, line,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(min(length(word)) AS BIGINT) AS min_word_len,
       CAST(max(length(word)) AS BIGINT) AS max_word_len,
       floor((CAST(sum(length(word)) AS DOUBLE) / count(*)) * 1000000)
         / 1000000 AS avg_word_len,
       floor(sqrt((count(*) * CAST(sum(length(word)*length(word)) AS DOUBLE)
                   - CAST(sum(length(word)) AS DOUBLE) * sum(length(word)))
                  / (CAST(count(*) AS DOUBLE) * count(*))) * 1000000)
         / 1000000 AS std_word_len,
       first(word ORDER BY j) AS first_word,
       CASE WHEN count(*) >= 2 THEN (list(word ORDER BY j))[2]
            ELSE NULL END AS second_word,
       last(word ORDER BY j) AS last_word
FROM words
GROUP BY doc_id, line
"""


#: name -> (ray_fn, sql or None)
def q_bib_resolve(sf_dir: str, shuffle: bool = False):
    """J7 bibliography resolution (reference get_links.py:57-162):
    bib-entry raw titles (surface-cased) resolved to target docs by
    normalized-title equi-join. The bib side is derived
    deterministically from the documents table: even docs' 64-char
    text prefix, UPPERCASED, attributed to the next doc — a different
    surface form that only the normalization can match."""
    from ..stages.bibliography import resolve_bibliography

    def to_bib(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(pc.bit_wise_and(b["doc_id"], 1), 0))
        return pa.table(
            {
                "doc_from": pc.add(b["doc_id"], 1),
                "tag": pc.binary_join_element_wise(
                    "b", pc.cast(b["doc_id"], pa.string()), ""
                ),
                "raw_title": pc.utf8_upper(
                    pc.utf8_slice_codeunits(b["text"], 0, 64)
                ),
            }
        )

    def to_papers(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(pc.bit_wise_and(b["doc_id"], 1), 0))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "title": pc.utf8_slice_codeunits(b["text"], 0, 64),
            }
        )

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    bib = docs.map_batches(to_bib, batch_format="pyarrow")
    papers = docs.map_batches(to_papers, batch_format="pyarrow")
    return resolve_bibliography(
        bib, papers if shuffle else papers.to_pandas(), broadcast=not shuffle
    )


SQL_BIB_RESOLVE = """
WITH papers AS (
  SELECT doc_id, substr(text, 1, 64) AS title
  FROM documents WHERE doc_id % 2 = 0
), bib AS (
  SELECT doc_id + 1 AS doc_from,
         'b' || CAST(doc_id AS VARCHAR) AS tag,
         upper(substr(text, 1, 64)) AS raw_title
  FROM documents WHERE doc_id % 2 = 0
)
SELECT b.doc_from, b.tag, p.doc_id AS doc_to
FROM bib b JOIN papers p
  ON regexp_replace(lower(b.raw_title), '[^a-z]', '', 'g')
   = regexp_replace(lower(p.title), '[^a-z]', '', 'g')
"""


def q_jaccard_pairs(sf_dir: str):
    """Exact char-5-gram Jaccard over a DETERMINISTIC pair set
    (doc d, doc d+1 for d % 50 == 0) — the oracle-checkable form of
    the n-gram-Jaccard verify kernel (stages/dedup.py NgramSetStore /
    JaccardVerifier): same gram construction, same set arithmetic,
    checked value-for-value against DuckDB's string-set version. The
    right side is a bounded 2% projection of documents (broadcast)."""
    import ray

    from ..stages.dedup import NgramSetStore
    from ..state.broadcast import get_broadcast

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    right = docs.map_batches(
        lambda b: b.filter(pc.equal(_mod50(b["doc_id"]), 1)),
        batch_format="pyarrow",
    ).to_pandas()
    rmap = dict(zip(right["doc_id"], right["text"]))
    ref = ray.put(rmap)

    def per_batch(b: pa.Table) -> pa.Table:
        m = get_broadcast(ref)
        b = b.filter(pc.equal(_mod50(b["doc_id"]), 0))
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_numpy(zero_copy_only=False)
        id_a, id_b, jac = [], [], []
        for i, t in zip(ids, texts):
            tb = m.get(i + 1)
            if tb is None:
                continue
            ga = NgramSetStore.ngrams(t, 5)
            gb = NgramSetStore.ngrams(tb, 5)
            inter = len(np.intersect1d(ga, gb, assume_unique=True))
            union = len(ga) + len(gb) - inter
            id_a.append(int(i))
            id_b.append(int(i + 1))
            jac.append(round(inter / union, 6) if union else 0.0)
        return pa.table(
            {
                "id_a": pa.array(id_a, pa.int64()),
                "id_b": pa.array(id_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow")


def _mod50(col):
    return pc.subtract(
        col, pc.multiply(pc.cast(pc.floor(pc.divide(
            pc.cast(col, pa.float64()), 50.0)), pa.int64()), 50)
    )


SQL_JACCARD_PAIRS = """
WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
     b AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 1),
     pairs AS (
       SELECT a.doc_id AS id, a.text AS ta, b.text AS tb
       FROM a JOIN b ON b.doc_id = a.doc_id + 1),
     ga AS (SELECT DISTINCT id, substr(ta, i, 5) AS g FROM (
              SELECT p.id, p.ta,
                     unnest(generate_series(1, greatest(length(p.ta) - 4, 1))) AS i
              FROM pairs p)),
     gb AS (SELECT DISTINCT id, substr(tb, i, 5) AS g FROM (
              SELECT p.id, p.tb,
                     unnest(generate_series(1, greatest(length(p.tb) - 4, 1))) AS i
              FROM pairs p)),
     inter AS (SELECT ga.id, count(*) AS ni
               FROM ga JOIN gb ON ga.id = gb.id AND ga.g = gb.g
               GROUP BY ga.id),
     na AS (SELECT id, count(*) AS n FROM ga GROUP BY id),
     nb AS (SELECT id, count(*) AS n FROM gb GROUP BY id)
SELECT na.id AS id_a, na.id + 1 AS id_b,
       round(CAST(coalesce(i.ni, 0) AS DOUBLE)
             / (na.n + nb.n - coalesce(i.ni, 0)), 6) AS jaccard
FROM na JOIN nb ON na.id = nb.id
LEFT JOIN inter i ON i.id = na.id
"""


def q_pack_sequences(sf_dir: str):
    """LM-training sequence packing: distributed ordered prefix sum
    over whitespace token counts (stages/pack.py two-phase scan) —
    each doc's absolute start offset in the concatenated token
    stream, and the 2048-token training sequence it starts in."""
    from ..stages.pack import pack_token_stream

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return pack_token_stream(docs, budget=2048)


SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT)                                  AS start_offset,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) // 2048 AS BIGINT)                          AS seq_id,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) % 2048 AS BIGINT)                           AS pos_in_seq
FROM t
"""


def q_explode_lines(sf_dir: str):
    """flat_map / UNNEST WITH ORDINALITY: one output row per document
    line with its 1-based ordinal and length — pure offsets arithmetic
    on the Arrow list array (np.repeat / arange), never a row loop."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        lines = pc.split_pattern(b["text"], "\n")
        flat = (
            lines.combine_chunks()
            if isinstance(lines, pa.ChunkedArray)
            else lines
        )
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = flat.values
        if offs[0] != 0:
            vals = vals.slice(offs[0])
            offs = offs - offs[0]
        counts = np.diff(offs)
        doc = np.repeat(b["doc_id"].to_numpy(zero_copy_only=False), counts)
        line_no = (
            np.arange(offs[-1], dtype=np.int64)
            - np.repeat(offs[:-1], counts)
            + 1
        )
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "line_no": pa.array(line_no),
                "line_len": pc.cast(pc.utf8_length(vals), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_EXPLODE_LINES = """
SELECT doc_id, i AS line_no, length(lines[i]) AS line_len
FROM (SELECT doc_id, string_split(text, chr(10)) AS lines,
             unnest(generate_series(1, len(string_split(text, chr(10)))))
               AS i
      FROM documents)
"""


def q_repetition_docs(sf_dir: str):
    """Gopher-style repetition quality filter: per-document
    duplicate-line and duplicate-word fractions (Rae et al. 2021 §A1.1
    repetition rules). Distinct counting is pd.factorize (exact C
    kernel) + np.unique over packed (doc, code) keys — no per-document
    Python loop, no shuffle (document = row)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def frac_dup(b: pa.Table, pat: str, regex: bool = False) -> np.ndarray:
        split = pc.split_pattern_regex if regex else pc.split_pattern
        lst = split(b["text"], pat)
        flat = (
            lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        )
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = flat.values
        if offs[0] != 0:
            vals = vals.slice(offs[0])
            offs = offs - offs[0]
        counts = np.diff(offs)
        codes, uniques = pd.factorize(vals.to_numpy(zero_copy_only=False))
        ncodes = np.int64(max(len(uniques), 1))
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        uniq_pair = np.unique(doc_idx * ncodes + codes)
        n_distinct = np.bincount(
            uniq_pair // ncodes, minlength=len(counts)
        )
        # 1 - d/c in this exact double order (matches the SQL text)
        return np.round(
            np.where(
                counts > 0, 1.0 - n_distinct / np.maximum(counts, 1), 0.0
            ),
            6,
        )

    def fn(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "dup_line_frac": pa.array(frac_dup(b, "\n"), pa.float64()),
                # words split on runs of whitespace (Gopher's word
                # tokenization; both engines are RE2 so \s+ agrees)
                "dup_word_frac": pa.array(
                    frac_dup(b, r"\s+", regex=True), pa.float64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_REPETITION_DOCS = """
SELECT doc_id,
       round(1 - CAST(len(list_distinct(string_split(text, chr(10))))
                      AS DOUBLE)
               / len(string_split(text, chr(10))), 6) AS dup_line_frac,
       round(1 - CAST(len(list_distinct(regexp_split_to_array(text, '\\s+')))
                      AS DOUBLE)
               / len(regexp_split_to_array(text, '\\s+')), 6)
         AS dup_word_frac
FROM documents
"""


def q_shuffle_export(sf_dir: str):
    """Deterministic shuffle-shard assignment for training export
    (stages/sampling.py:shuffle_shards): shard + within-shard position
    under hash order, via the two-phase ordered scan — only
    (key, hash) pairs move, never payloads."""
    from ..stages.sampling import shuffle_shards

    docs = _pq(sf_dir, "documents", ["doc_id"])
    return shuffle_shards(docs, "doc_id", num_shards=16)


SQL_SHUFFLE_EXPORT = """
WITH h AS (
  SELECT doc_id,
         (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 AS rnk
  FROM documents
),
s AS (
  SELECT doc_id, rnk,
         xor(CAST(rnk AS BIGINT) // 65536, CAST(rnk AS BIGINT)) % 16
           AS shard
  FROM h
)
SELECT doc_id,
       CAST(shard AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY rnk, doc_id) - 1 AS BIGINT)
         AS pos
FROM s
"""


#: BM25 query terms for the `bm25_topk` oracle query — all present in
#: the synthetic document vocabulary with distinct selectivities.
BM25_TERMS = ["spark", "window", "hash", "merge"]


def q_bm25_topk(sf_dir: str):
    """Global BM25 top-10 for a fixed keyword query
    (stages/retrieval.py:bm25_topk — one corpus scan, per-batch
    partial df/avgdl stats, zero payload shuffle). Both sides order by
    the 6-dp-ROUNDED score then doc_id, so cutoff ties resolve
    identically."""
    from ..stages.retrieval import bm25_topk

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(docs, BM25_TERMS, k=10)


SQL_BM25_TOPK = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
  WHERE term <> '' GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok
  WHERE term <> '' GROUP BY doc_id
),
q(term) AS (VALUES ('spark'), ('window'), ('hash'), ('merge')),
df AS (
  SELECT tf.term, CAST(count(*) AS DOUBLE) AS df
  FROM tf JOIN q ON q.term = tf.term GROUP BY tf.term
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
),
scores AS (
  SELECT tf.doc_id,
         SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75
                               + 0.75 * dl.dl / stats.avgdl))) AS s
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 6) AS score FROM scores
ORDER BY score DESC, doc_id LIMIT 10
"""


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement
    (stages/sampling.py:weighted_sample — Efraimidis–Spirakis with
    hash-derived uniforms): 25 docs drawn proportional to n_chars.
    Per-batch prune to k, global sort+limit over blocks × k rows."""
    from ..stages.sampling import weighted_sample

    docs = _pq(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_sample(docs, "doc_id", "n_chars", k=25)


SQL_WEIGHTED_SAMPLE = """
WITH h AS (
  SELECT doc_id, n_chars,
         (CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
               AS DOUBLE) + 1.0) / 4294967297.0 AS u
  FROM documents
),
keyed AS (
  SELECT doc_id, n_chars,
         -ln(u) / CAST(n_chars AS DOUBLE) AS e
  FROM h
)
SELECT doc_id, n_chars, round(e, 6) AS es_key
FROM keyed ORDER BY e, doc_id LIMIT 25
"""


def q_chunk_docs(sf_dir: str):
    """LM-training chunking (stages/chunk.py:chunk_documents): 64-token
    windows every 48 tokens, byte-exact chunk text, shuffle-free."""
    from ..stages.chunk import chunk_documents

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(docs, window=64, stride=48)


SQL_CHUNK_DOCS = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
st AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, 48)) AS s
  FROM tok
)
SELECT doc_id,
       CAST(s / 48 AS BIGINT) AS chunk_id,
       CAST(len(toks[s + 1 : s + 64]) AS BIGINT) AS n_tokens,
       array_to_string(toks[s + 1 : s + 64], ' ') AS chunk
FROM st
"""


def q_fuzzy_pairs(sf_dir: str):
    """Deletion-neighborhood fuzzy self-join (stages/fuzzy.py):
    document pairs whose first-12-token prefixes are within one token
    edit (insert/delete/substitute). Oracle re-derives the identical
    variant definition in DuckDB and exact-joins on variant strings —
    the implementation also compares real strings inside its coarse
    groups, so hash collisions cannot create extra pairs."""
    from ..stages.fuzzy import fuzzy_pairs

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return fuzzy_pairs(docs, max_tokens=12)


SQL_FUZZY_PAIRS = """
WITH t AS (
  SELECT doc_id, (string_split(text, ' '))[1:12] AS toks FROM documents
),
v AS (
  SELECT doc_id, array_to_string(toks, ' ') AS variant FROM t
  UNION ALL
  SELECT doc_id,
         array_to_string(
           list_concat(toks[1:i-1], toks[i+1:len(toks)]), ' ')
  FROM t, unnest(generate_series(1, len(toks))) AS s(i)
  WHERE len(toks) > 1
)
SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
                greatest(a.doc_id, b.doc_id) AS id_b
FROM v a JOIN v b ON a.variant = b.variant AND a.doc_id <> b.doc_id
"""


def q_cooccurrence(sf_dir: str):
    """Windowed token co-occurrence counts (the word2vec/PMI
    preprocessing sweep): ordered pairs (w1 before w2, gap <= 3)
    counted per batch with ONE flat np.unique over factorized pair
    codes — the w²-bounded partial table shuffles, never token
    positions."""
    docs = _pq(sf_dir, "documents", ["text"])
    W = 3

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        toks = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        )
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.values.to_numpy(zero_copy_only=False)
        codes, vocab = pd.factorize(flat)
        n = len(flat)
        doc_of = np.repeat(
            np.arange(len(offs) - 1, dtype=np.int64), np.diff(offs)
        )
        pair_codes = []
        for d in range(1, W + 1):
            if n <= d:
                break
            same_doc = doc_of[d:] == doc_of[:-d]
            a = codes[:-d][same_doc]
            c = codes[d:][same_doc]
            pair_codes.append(a.astype(np.int64) * len(vocab) + c)
        if not pair_codes:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        packed = np.concatenate(pair_codes)
        u, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "w1": pa.array(vocab[(u // len(vocab))], pa.string()),
                "w2": pa.array(vocab[(u % len(vocab))], pa.string()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(_Sum("n", alias_name="n"))
    )


SQL_COOCCURRENCE = """
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
pos AS (
  SELECT row_number() OVER () AS doc_id, toks FROM t
),
flat AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS p
  FROM pos
)
SELECT a.w AS w1, b.w AS w2, count(*) AS n
FROM flat a JOIN flat b
  ON a.doc_id = b.doc_id AND b.p > a.p AND b.p <= a.p + 3
GROUP BY 1, 2
"""


REGISTRY.update({'pattern': (q_pattern, SQL_PATTERN)})


REGISTRY.update({'dedup_exact': (q_dedup_exact, SQL_DEDUP_EXACT)})


REGISTRY.update({'distinct': (q_distinct, SQL_DISTINCT)})


REGISTRY.update({'union_agg': (q_union, SQL_UNION)})


REGISTRY.update({'vocab_topk': (q_vocab_topk, SQL_VOCAB_TOPK)})


REGISTRY.update({'token_count': (q_token_count, SQL_TOKEN_COUNT)})


REGISTRY.update({'quality': (q_quality, SQL_QUALITY)})


REGISTRY.update({'rollup_words': (q_rollup_words, SQL_ROLLUP_WORDS)})


REGISTRY.update({'rollup_hier': (q_rollup_hier, SQL_ROLLUP_HIER)})


REGISTRY.update({'bib_resolve': (q_bib_resolve, SQL_BIB_RESOLVE)})


REGISTRY.update({'jaccard_pairs': (q_jaccard_pairs, SQL_JACCARD_PAIRS)})


REGISTRY.update({'pack_sequences': (q_pack_sequences, SQL_PACK_SEQUENCES)})


REGISTRY.update({'explode_lines': (q_explode_lines, SQL_EXPLODE_LINES)})


REGISTRY.update({'repetition_docs': (q_repetition_docs, SQL_REPETITION_DOCS)})


REGISTRY.update({'shuffle_export': (q_shuffle_export, SQL_SHUFFLE_EXPORT)})


REGISTRY.update({'bm25_topk': (q_bm25_topk, SQL_BM25_TOPK)})


REGISTRY.update({'weighted_sample': (q_weighted_sample, SQL_WEIGHTED_SAMPLE)})


REGISTRY.update({'chunk_docs': (q_chunk_docs, SQL_CHUNK_DOCS)})


REGISTRY.update({'fuzzy_pairs': (q_fuzzy_pairs, SQL_FUZZY_PAIRS)})


REGISTRY.update({'cooccurrence': (q_cooccurrence, SQL_COOCCURRENCE)})


def q_entropy_docs(sf_dir: str):
    """Per-doc token Shannon entropy + type counts
    (stages/textstats.py:token_entropy) — shuffle-free quality signal."""
    from ..stages.textstats import token_entropy

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return token_entropy(ds)


SQL_ENTROPY_DOCS = r"""
WITH arr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                             t -> t <> '') AS a
  FROM documents
),
tok AS (SELECT doc_id, unnest(a) AS tok FROM arr),
tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS c FROM tok
       GROUP BY doc_id, tok),
dl AS (SELECT doc_id, sum(c) AS n FROM tf GROUP BY doc_id)
SELECT tf.doc_id, CAST(dl.n AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       -sum((tf.c / dl.n) * ln(tf.c / dl.n)) AS entropy
FROM tf JOIN dl USING (doc_id)
GROUP BY tf.doc_id, dl.n
"""


def q_keywords_tfidf(sf_dir: str):
    """Top-3 tokens per doc by tf-idf, ties by token asc
    (stages/textstats.py:doc_keywords — df table broadcast, per-doc
    ranking shuffle-free)."""
    from ..stages.textstats import doc_keywords

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return doc_keywords(ds, k=3)


SQL_KEYWORDS_TFIDF = r"""
WITH arr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                             t -> t <> '') AS a
  FROM documents
),
tok AS (SELECT doc_id, unnest(a) AS tok FROM arr),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok AS token, tf.tf,
         tf.tf * ln(nn.n / df.df) AS tfidf,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln(nn.n / df.df) DESC, tf.tok
         ) AS rn
  FROM tf JOIN df USING (tok) CROSS JOIN nn
)
SELECT doc_id, token, tf, tfidf FROM scored WHERE rn <= 3
"""


def q_nearest_doc_jaccard(sf_dir: str):
    """Top-1 catalog match by exact token-set Jaccard: every doc with
    doc_id >= 25 matched against the 25-doc candidate catalog
    (doc_id < 25), ties toward the smallest candidate id
    (stages/match.py:jaccard_match — candidates broadcast once; never
    a token-equality join, which explodes as sum_t df_a*df_b)."""
    import pyarrow.parquet as pq_

    from ..stages.match import jaccard_match

    cand = pq_.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    cand = cand.filter(pc.less(cand["doc_id"], 25))
    ds = _pq(sf_dir, "documents", ["doc_id", "text"]).filter(
        expr="doc_id >= 25"
    )
    return jaccard_match(ds, cand)


SQL_NEAREST_DOC_JACCARD = r"""
WITH arr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                             t -> t <> '') AS a
  FROM documents
),
tok AS (SELECT DISTINCT doc_id, unnest(a) AS tok FROM arr),
sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT t.doc_id AS doc_id, c.doc_id AS cand_id, count(*) AS inter_n
  FROM tok t JOIN tok c ON t.tok = c.tok
  WHERE t.doc_id >= 25 AND c.doc_id < 25
  GROUP BY t.doc_id, c.doc_id
),
scored AS (
  SELECT i.doc_id, i.cand_id AS match_id, i.inter_n,
         CAST(i.inter_n AS DOUBLE) / (st.n + sc.n - i.inter_n) AS sim,
         row_number() OVER (
           PARTITION BY i.doc_id
           ORDER BY CAST(i.inter_n AS DOUBLE)
                    / (st.n + sc.n - i.inter_n) DESC, i.cand_id
         ) AS rn
  FROM inter i
  JOIN sizes st ON i.doc_id = st.doc_id
  JOIN sizes sc ON i.cand_id = sc.doc_id
)
SELECT doc_id, match_id, inter_n, sim FROM scored WHERE rn = 1
"""


REGISTRY.update({'entropy_docs': (q_entropy_docs, SQL_ENTROPY_DOCS)})


REGISTRY.update({'keywords_tfidf': (q_keywords_tfidf, SQL_KEYWORDS_TFIDF)})


REGISTRY.update({'nearest_doc_jaccard': (
            q_nearest_doc_jaccard,
            SQL_NEAREST_DOC_JACCARD,
        )})


def q_novelty_docs(sf_dir: str):
    """Per-doc 5-gram novelty score (fraction of distinct grams with
    corpus df == 1; stages/dedup.py:novelty — one coarse gram exchange
    + one doc-keyed fold, no join)."""
    from ..stages.dedup import novelty

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    return novelty(ds, n=5)


SQL_NOVELTY_DOCS = r"""
WITH arr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                             t -> t <> '') AS a
  FROM documents
),
w AS (
  SELECT doc_id,
         CASE WHEN len(a) >= 5 THEN a[i:i+4] ELSE a END AS g
  FROM arr,
       unnest(generate_series(1, greatest(len(a) - 4, 1))) AS t(i)
  WHERE len(a) > 0
),
dg AS (SELECT DISTINCT doc_id, g FROM w),
df AS (SELECT g, count(*) AS df, min(doc_id) AS owner FROM dg GROUP BY g),
ng AS (SELECT doc_id, count(*) AS n_grams FROM dg GROUP BY doc_id),
nu AS (SELECT owner AS doc_id, count(*) AS n_unique FROM df
       WHERE df = 1 GROUP BY owner)
SELECT ng.doc_id, ng.n_grams,
       COALESCE(nu.n_unique, 0) AS n_unique,
       CAST(COALESCE(nu.n_unique, 0) AS DOUBLE) / ng.n_grams AS novelty
FROM ng LEFT JOIN nu USING (doc_id)
"""


def q_prefix_dup_docs(sf_dir: str):
    """Shared-prefix boilerplate detection: docs whose first 8 tokens
    are identical to at least one other doc's, with the group size —
    the cheap screen for template/boilerplate corpora (same-prefix
    crawl pages, licence headers). One coarse hash-bucketed exchange;
    prefix equality via an 8-step FNV fold over per-token siphashes
    (equal prefixes -> equal folds; the SQL twin groups the literal
    prefix string)."""
    from ..functions.hashing import flat_token_hashes_arrow, splitmix64

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    FNV = np.uint64(0x100000001B3)

    def prefix_hash(b: pa.Table) -> pa.Table:
        th, starts = flat_token_hashes_arrow(b["text"])
        lengths = np.diff(starts)
        keep = np.flatnonzero(lengths > 0)
        acc = np.zeros(len(keep), np.uint64)
        with np.errstate(over="ignore"):
            for j in range(8):
                valid = lengths[keep] > j
                idx = starts[keep[valid]] + j
                acc[valid] = acc[valid] * FNV + th[idx]
        bucket = (splitmix64(acc) % np.uint64(COARSE_USER_BUCKETS)).astype(
            np.int64
        )
        return pa.table(
            {
                "h": pa.array(acc),
                "doc_id": b["doc_id"].take(pa.array(keep)),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        d = g["doc_id"].to_numpy()
        order = np.argsort(h, kind="stable")
        h, d = h[order], d[order]
        change = np.ones(len(h), dtype=bool)
        change[1:] = h[1:] != h[:-1]
        sizes = np.diff(np.append(np.flatnonzero(change), len(h)))
        per_row = np.repeat(sizes, sizes)
        keep = per_row > 1
        return pd.DataFrame(
            {
                "doc_id": d[keep],
                "group_n": per_row[keep].astype(np.int64),
            }
        )

    return (
        ds.map_batches(prefix_hash, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


SQL_PREFIX_DUP_DOCS = r"""
WITH arr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                             t -> t <> '') AS a
  FROM documents
),
p AS (
  SELECT doc_id, list_aggregate(a[1:8], 'string_agg', ' ') AS pre
  FROM arr WHERE len(a) > 0
),
c AS (SELECT pre, count(*) AS group_n FROM p GROUP BY pre)
SELECT p.doc_id, c.group_n
FROM p JOIN c USING (pre)
WHERE c.group_n > 1
"""


REGISTRY.update({'novelty_docs': (q_novelty_docs, SQL_NOVELTY_DOCS)})


REGISTRY.update({'prefix_dup_docs': (q_prefix_dup_docs, SQL_PREFIX_DUP_DOCS)})


def q_postings_topk(sf_dir: str):
    """Distributed inverted-index build, pruned to the per-term top-5
    postings by term frequency (the IR index-construction classic):
    ONE Arrow whitespace split per batch, within-batch (term, doc, tf)
    partials via packed-code np.unique (docs are whole within a batch,
    so tf is exact with no cross-batch combine), then a term-keyed
    exchange where each group keeps rank <= 5 by (tf DESC, doc_id
    ASC). Oracle = UNNEST + GROUP BY + row_number window."""
    from ..functions.hashing import flat_tokens_arrow

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def tf_rows(b: pa.Table) -> pa.Table:
        flat, starts = flat_tokens_arrow(b["text"])
        doc = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.repeat(np.arange(len(doc), dtype=np.int64), np.diff(starts))
        if len(flat) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        # C-level term codes (no Python string sort)
        enc = pc.dictionary_encode(flat)
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = code * len(doc) + d
        upk, tf = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "term": enc.dictionary.take(
                    pa.array(upk // len(doc), pa.int64())
                ),
                "doc_id": pa.array(doc[upk % len(doc)], pa.int64()),
                "tf": pa.array(tf.astype(np.int64), pa.int64()),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["tf", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(5)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["term", "doc_id", "tf", "rank"]]

    return (
        ds.map_batches(tf_rows, batch_format="pyarrow")
        .groupby("term")
        .map_groups(topk, batch_format="pandas")
    )


SQL_POSTINGS_TOPK = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
r AS (
  SELECT term, doc_id, tf,
         row_number() OVER (
           PARTITION BY term ORDER BY tf DESC, doc_id) AS rank
  FROM tf
)
SELECT term, doc_id, tf, rank FROM r WHERE rank <= 5
"""


_BLOCK_W = 10  #: tokens per dedup block (the C4 span-dedup analog)


def q_block_dedup_docs(sf_dir: str):
    """Corpus-wide exact dedup of consecutive 10-token blocks with
    keep-FIRST semantics (the span/paragraph-level exact-dedup pass of
    C4-style curation, expressed over the single-line documents
    table): a block instance is a duplicate iff an earlier
    (doc_id, block_no) holds the same block. Engine keys blocks by an
    FNV fold over siphash token hashes (vectorized, no string
    rebuilding); the oracle keys the block STRINGS — equivalent modulo
    negligible 64-bit collisions (the decontaminate argument). One
    block-keyed coarse exchange emits per-doc (count, dup) partials;
    one doc-keyed groupby folds them."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.hashing import flat_token_hashes_arrow

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    W = _BLOCK_W
    FNV = np.uint64(0x100000001B3)
    MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

    def block_rows(b: pa.Table) -> pa.Table:
        th, starts = flat_token_hashes_arrow(b["text"])
        doc = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(starts)
        d = np.repeat(np.arange(len(doc), dtype=np.int64), lengths)
        F = len(th)
        if F == 0:
            return pa.table(
                {
                    "bh": pa.array([], pa.int64()),
                    "packed": pa.array([], pa.int64()),
                    "bk": pa.array([], pa.int64()),
                }
            )
        pos = np.arange(F, dtype=np.int64) - np.repeat(starts[:-1], lengths)
        blk = pos // W
        bid = d * np.int64(1 << 32) + blk  # ascending by construction
        change = np.empty(F, dtype=bool)
        change[0] = True
        np.not_equal(bid[1:], bid[:-1], out=change[1:])
        bstart = np.flatnonzero(change)
        blen = np.diff(np.append(bstart, F))
        acc = np.zeros(len(bstart), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(W):
                sel = blen > j
                acc[sel] = (acc[sel] * FNV + th[bstart[sel] + j]) & MASK
        packed = doc[d[bstart]] * np.int64(1 << 20) + blk[bstart]
        bh = acc.view(np.int64)
        return pa.table(
            {
                "bh": pa.array(bh, pa.int64()),
                "packed": pa.array(packed, pa.int64()),
                "bk": pa.array(bh % 64, pa.int64()),
            }
        )

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        bh = g["bh"].to_numpy()
        packed = g["packed"].to_numpy()
        order = np.lexsort((packed, bh))
        bh, packed = bh[order], packed[order]
        m = len(bh)
        change = np.empty(m, dtype=bool)
        change[0] = True
        np.not_equal(bh[1:], bh[:-1], out=change[1:])
        gmin = packed[change][np.cumsum(change) - 1]
        dup = packed != gmin
        doc = packed >> 20
        u, inv = np.unique(doc, return_inverse=True)
        return pd.DataFrame(
            {
                "doc_id": u,
                "n_blocks": np.bincount(inv),
                "n_dup_blocks": np.bincount(inv, weights=dup).astype(
                    np.int64
                ),
            }
        )

    def ratio(b: pa.Table) -> pa.Table:
        n = b["n_blocks"].to_numpy(zero_copy_only=False).astype(np.int64)
        dup = b["n_dup_blocks"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_blocks": pa.array(n, pa.int64()),
                "n_dup_blocks": pa.array(dup, pa.int64()),
                "dup_ratio": pa.array(
                    np.round(dup / np.maximum(n, 1), 6), pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(block_rows, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(mark_dups, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            _Sum("n_blocks", alias_name="n_blocks"),
            _Sum("n_dup_blocks", alias_name="n_dup_blocks"),
        )
        .map_batches(ratio, batch_format="pyarrow")
    )


SQL_BLOCK_DEDUP_DOCS = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
  FROM documents
),
blocks AS (
  SELECT doc_id, i AS block_no,
         array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS blk
  FROM tok,
       unnest(generate_series(
         0, CAST(ceil(len(toks) / 10.0) AS INT) - 1)) AS t(i)
  WHERE len(toks) > 0
),
m AS (
  SELECT blk, min(doc_id * 1048576 + block_no) AS first_pk
  FROM blocks GROUP BY blk
),
d AS (
  SELECT b.doc_id, count(*) AS n_blocks,
         sum(CASE WHEN b.doc_id * 1048576 + b.block_no <> m.first_pk
                  THEN 1 ELSE 0 END) AS n_dup
  FROM blocks b JOIN m ON b.blk = m.blk
  GROUP BY 1
)
SELECT doc_id, n_blocks, CAST(n_dup AS BIGINT) AS n_dup_blocks,
       round(CAST(n_dup AS DOUBLE) / n_blocks, 6) AS dup_ratio
FROM d
"""


REGISTRY.update({'postings_topk': (q_postings_topk, SQL_POSTINGS_TOPK)})


REGISTRY.update({'block_dedup_docs': (q_block_dedup_docs, SQL_BLOCK_DEDUP_DOCS)})


def q_zipf_slope(sf_dir: str):
    """Per-language Zipf-law fit over the top-500 vocabulary: OLS
    slope of ln(count) on ln(rank) (rank = count DESC, token ASC —
    identical tie-break both sides). A corpus-level curation
    diagnostic: natural text sits near -1; templated/synthetic text
    drifts flat. Scale shape: packed-code (lang, token) partial counts
    inside map_batches (the vocab_topk pattern), one vocab-sized
    groupby-sum, then a per-lang finalizer whose group is one
    language's vocabulary (the same task-size contract as
    vocab_topk's sort)."""

    ds = _pq(sf_dir, "documents", ["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        toks_list = pc.split_pattern(b["text"], " ")
        reps = pc.list_value_length(toks_list).to_numpy(
            zero_copy_only=False
        )
        langs = b["lang"].to_numpy(zero_copy_only=False)
        tok = pc.list_flatten(toks_list).to_numpy(zero_copy_only=False)
        lang_rep = np.repeat(langs, reps)
        mask = tok != ""
        if not mask.any():
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        lc, lu = pd.factorize(lang_rep[mask])
        tc, tu = pd.factorize(tok[mask])
        packed = lc.astype(np.int64) * len(tu) + tc
        upk, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(lu[upk // len(tu)], pa.string()),
                "token": pa.array(tu[upk % len(tu)], pa.string()),
                "cnt": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(500)
        if len(g) < 2:  # regr_slope undefined; SQL twin HAVING >= 2
            return pd.DataFrame(
                {
                    "lang": pd.Series(dtype="object"),
                    "n_types": pd.Series(dtype="int64"),
                    "zipf_slope": pd.Series(dtype="float64"),
                }
            )
        y = np.log(g["cnt"].to_numpy(np.float64))
        x = np.log(np.arange(1, len(g) + 1, dtype=np.float64))
        xc = x - x.mean()
        slope = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_types": np.array([len(g)], np.int64),
                "zipf_slope": [round(slope, 6)],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .groupby(["lang", "token"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("lang")
        .map_groups(per_lang, batch_format="pandas")
    )


SQL_ZIPF_SLOPE = """
WITH c AS (
  SELECT lang, token, count(*) AS cnt FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS token
    FROM documents)
  WHERE token <> '' GROUP BY lang, token),
r AS (
  SELECT lang, cnt,
         row_number() OVER (
           PARTITION BY lang ORDER BY cnt DESC, token) AS rnk
  FROM c)
SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
       round(regr_slope(ln(CAST(cnt AS DOUBLE)),
                        ln(CAST(rnk AS DOUBLE))), 6) AS zipf_slope
FROM r WHERE rnk <= 500 GROUP BY lang HAVING count(*) >= 2
"""


REGISTRY.update({'zipf_slope': (q_zipf_slope, SQL_ZIPF_SLOPE)})


def q_setsim_join(sf_dir: str):
    """Prefix-filtered set-similarity SELF-JOIN (PPJoin): every doc
    pair with token-set Jaccard >= 0.7 over the distinct first-24
    whitespace tokens — the exact near-dup join the minhash/simhash
    families approximate (stages/setsim.py documents the df-order
    broadcast, the prefix-posting theorem, and the pair-bounded
    verify). The DuckDB twin is the brute-force token co-occurrence
    join: identical output, quadratic plan."""
    from ..stages.setsim import setsim_self_join

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return setsim_self_join(
        docs, id_col="doc_id", text_col="text",
        threshold=0.7, max_tokens=24,
    )


SQL_SETSIM_JOIN = r"""
WITH tok AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id,
           unnest(list_slice(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> ''),
             1, 24)) AS tok
    FROM documents
  )
),
sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       ROUND(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6) AS sim
FROM inter i
JOIN sz sa ON sa.doc_id = i.id_a
JOIN sz sb ON sb.doc_id = i.id_b
WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.7
"""


REGISTRY.update({'setsim_join': (q_setsim_join, SQL_SETSIM_JOIN)})


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion (stages/retrieval.py:rrf_fuse) of two
    retrieval systems over the documents table — BM25 top-50 and
    query-term-density top-50 for the same fixed query — fused as
    rrf = 1/(60+rank_bm25) + 1/(60+rank_density), top-10. Both input
    rankings are bounded (50 rows), so only top-K lists reach the
    fuse; the oracle unrolls both rankers and the fusion in SQL."""
    from ..stages.retrieval import bm25_topk, density_topk, rrf_fuse

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    bm = bm25_topk(docs, BM25_TERMS, k=50)
    dn = density_topk(docs, BM25_TERMS, k=50)
    return rrf_fuse([bm, dn], k=10)


SQL_RRF_FUSION = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
  WHERE term <> '' GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok
  WHERE term <> '' GROUP BY doc_id
),
q(term) AS (VALUES ('spark'), ('window'), ('hash'), ('merge')),
df AS (
  SELECT tf.term, CAST(count(*) AS DOUBLE) AS df
  FROM tf JOIN q ON q.term = tf.term GROUP BY tf.term
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
),
bm_scores AS (
  SELECT tf.doc_id,
         round(SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75
                               + 0.75 * dl.dl / stats.avgdl))), 6) AS score
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
bm AS (
  SELECT doc_id, score FROM bm_scores ORDER BY score DESC, doc_id LIMIT 50
),
bmr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM bm
),
dn_scores AS (
  SELECT tf.doc_id, round(SUM(tf.tf) / any_value(dl.dl), 6) AS score
  FROM tf JOIN q ON q.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  GROUP BY tf.doc_id
),
dn AS (
  SELECT doc_id, score FROM dn_scores ORDER BY score DESC, doc_id LIMIT 50
),
dnr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM dn
),
fused AS (
  SELECT COALESCE(bmr.doc_id, dnr.doc_id) AS doc_id,
         round(COALESCE(1.0 / (60 + bmr.r), 0)
               + COALESCE(1.0 / (60 + dnr.r), 0), 6) AS rrf
  FROM bmr FULL OUTER JOIN dnr ON bmr.doc_id = dnr.doc_id
)
SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
"""


REGISTRY.update({'rrf_fusion': (q_rrf_fusion, SQL_RRF_FUSION)})


def q_containment_join(sf_dir: str):
    """Asymmetric subset-duplicate detection
    (stages/setsim.py:containment_join): ordered pairs where >= 80%
    of doc a's distinct first-24-token set appears in doc b — the
    boilerplate/quotation case Jaccard misses. Brute token
    co-occurrence SQL twin."""
    from ..stages.setsim import containment_join

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return containment_join(
        docs, id_col="doc_id", text_col="text",
        threshold=0.8, max_tokens=24,
    )


SQL_CONTAINMENT_JOIN = r"""
WITH tok AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id,
           unnest(list_slice(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> ''),
             1, 24)) AS tok
    FROM documents
  )
),
sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       ROUND(CAST(i.c AS DOUBLE) / sa.n, 6) AS containment
FROM inter i
JOIN sz sa ON sa.doc_id = i.id_a
WHERE CAST(i.c AS DOUBLE) / sa.n >= 0.8
"""


REGISTRY.update({'containment_join': (q_containment_join, SQL_CONTAINMENT_JOIN)})


def q_substr_dedup_docs(sf_dir: str):
    """Character-level exact substring-duplication profile: for every
    document, how many of its 40-char stride-1 windows also occur in
    at least one OTHER document — the character-granularity sibling of
    block_dedup_docs (the "dedup training data at the substring level"
    pass; block boundaries can hide duplicates that a stride-1 window
    cannot). Engine: zero-copy Arrow string buffers -> one flat uint8
    array per batch, windows hashed with a vectorized polynomial dot
    over a sliding view (wraparound uint64; no per-row loop, no string
    rebuilding), per-(window, doc) partials deduped in-batch, ONE
    coarse hash-keyed exchange marks windows whose distinct-doc count
    >= 2, and a doc-keyed groupby folds per-doc totals. The oracle
    keys window STRINGS (the decontaminate / block_dedup hash-vs-
    string equivalence argument). Docs shorter than 40 chars have no
    windows and are absent from BOTH sides."""
    from ray.data.aggregate import Sum as _Sum

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    W = 40
    NB = 64
    P = np.uint64(1099511628211)
    pw = np.ones(W, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(W - 2, -1, -1):
            pw[k] = pw[k + 1] * P

    def window_rows(b: pa.Table) -> pa.Table:
        a = b["text"].combine_chunks()
        odt = np.int64 if pa.types.is_large_string(a.type) else np.int32
        off = np.frombuffer(a.buffers()[1], dtype=odt)[
            a.offset : a.offset + len(a) + 1
        ].astype(np.int64)
        dat = np.frombuffer(a.buffers()[2], dtype=np.uint8)
        flat = dat[off[0] : off[-1]]
        off = off - off[0]
        doc = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(off)
        d = np.repeat(np.arange(len(doc), dtype=np.int64), lengths)
        F = len(flat)
        empty = pa.table(
            {
                "gh": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "bk": pa.array([], pa.int64()),
            }
        )
        if F < W:
            return empty
        sw = np.lib.stride_tricks.sliding_window_view(flat, W)
        with np.errstate(over="ignore"):
            h = (sw.astype(np.uint64) * pw).sum(axis=1)
        valid = d[: F - W + 1] == d[W - 1 :]
        if not valid.any():
            return empty
        gh = h[valid].view(np.int64)
        wdoc = doc[d[: F - W + 1][valid]]
        order = np.lexsort((wdoc, gh))
        gh, wdoc = gh[order], wdoc[order]
        first = np.empty(len(gh), dtype=bool)
        first[0] = True
        np.logical_or(
            gh[1:] != gh[:-1], wdoc[1:] != wdoc[:-1], out=first[1:]
        )
        idx = np.flatnonzero(first)
        cnt = np.diff(np.append(idx, len(gh)))
        gh, wdoc = gh[idx], wdoc[idx]
        return pa.table(
            {
                "gh": pa.array(gh, pa.int64()),
                "doc_id": pa.array(wdoc, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "bk": pa.array(
                    gh.view(np.uint64) % np.uint64(NB), pa.int64()
                ),
            }
        )

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        gh = g["gh"].to_numpy()
        doc = g["doc_id"].to_numpy()
        cnt = g["cnt"].to_numpy()
        order = np.lexsort((doc, gh))
        gh, doc, cnt = gh[order], doc[order], cnt[order]
        m = len(gh)
        newg = np.empty(m, dtype=bool)
        newg[0] = True
        np.not_equal(gh[1:], gh[:-1], out=newg[1:])
        newd = np.empty(m, dtype=bool)  # new (gh, doc) run
        newd[0] = True
        np.logical_or(
            newg[1:], doc[1:] != doc[:-1], out=newd[1:]
        )
        gid = np.cumsum(newg) - 1
        ndocs = np.bincount(gid[newd])  # distinct docs per gram
        dup = ndocs[gid] >= 2
        u, inv = np.unique(doc, return_inverse=True)
        return pd.DataFrame(
            {
                "doc_id": u,
                "n_windows": np.bincount(inv, weights=cnt).astype(
                    np.int64
                ),
                "n_dup_windows": np.bincount(
                    inv, weights=cnt * dup
                ).astype(np.int64),
            }
        )

    def ratio(b: pa.Table) -> pa.Table:
        n = b["n_windows"].to_numpy(zero_copy_only=False).astype(np.int64)
        dup = (
            b["n_dup_windows"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_windows": pa.array(n, pa.int64()),
                "n_dup_windows": pa.array(dup, pa.int64()),
                "dup_ratio": pa.array(
                    np.round(dup / np.maximum(n, 1), 6), pa.float64()
                ),
            }
        )

    from ..state.spool import spooled_group_map

    # disk-spool keyed exchange (the repo's fast path for bucketed
    # group maps; mark_dups relies only on gh co-location, so hot
    # coarse buckets may be re-split on the fine key)
    marked = spooled_group_map(
        ds.map_batches(window_rows, batch_format="pyarrow"),
        "bk",
        mark_dups,
        batch_format="pandas",
        fine_col="gh",
    )
    return (
        marked.groupby("doc_id")
        .aggregate(
            _Sum("n_windows", alias_name="n_windows"),
            _Sum("n_dup_windows", alias_name="n_dup_windows"),
        )
        .map_batches(ratio, batch_format="pyarrow")
    )


SQL_SUBSTR_DEDUP_DOCS = """
WITH g AS (
  SELECT doc_id, substring(text, CAST(i AS INT), 40) AS gram
  FROM documents,
       unnest(generate_series(1, length(text) - 39)) AS t(i)
),
m AS (
  SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram
)
SELECT g.doc_id, count(*) AS n_windows,
       CAST(sum(CASE WHEN m.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_windows,
       round(sum(CASE WHEN m.nd >= 2 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS dup_ratio
FROM g JOIN m ON g.gram = m.gram
GROUP BY g.doc_id
"""


REGISTRY.update({'substr_dedup_docs': (q_substr_dedup_docs, SQL_SUBSTR_DEDUP_DOCS)})


#: data-mixture target weights per language (mixture_sample_docs)
MIXTURE_WEIGHTS = {
    "en": 0.5,
    "de": 0.2,
    "fr": 0.15,
    "es": 0.1,
    "zh": 0.05,
}
MIXTURE_BUDGET = 0.4  # fraction of the corpus the mixture may keep


def q_mixture_sample_docs(sf_dir: str):
    """Training-data mixture construction: deterministic per-language
    quota sampling toward a target mix (50/20/15/10/5 over a budget of
    40% of the corpus), selection = the k smallest key_rank64 hash
    ranks per language — membership is a pure function of
    (doc_id, seed), identical under any partitioning, and the DuckDB
    twin recomputes the splitmix chain bit-for-bit. Quotas come from
    one tiny lang-count groupby (capped at the language's row count);
    per-language selection runs inside lang groups under the
    quantiles_group task-size contract. At an unbounded corpus the
    scale path is the train_test_split hash-THRESHOLD rule (quota as
    a fraction, no per-group sort) — same determinism, approximate
    quota."""
    from ..functions.hashing import key_rank64

    ds = _pq(sf_dir, "documents", ["doc_id", "lang"])
    counts = (
        ds.groupby("lang").aggregate(Count(alias_name="n")).to_pandas()
    )
    total = int(counts["n"].sum())
    budget = int(MIXTURE_BUDGET * total)
    quota = {
        lang: min(
            int(counts.loc[counts["lang"] == lang, "n"].iloc[0]),
            int(budget * w),
        )
        for lang, w in MIXTURE_WEIGHTS.items()
        if (counts["lang"] == lang).any()
    }

    def add_rank(b: pa.Table) -> pa.Table:
        r = key_rank64(
            b["doc_id"].to_numpy(zero_copy_only=False), seed=13
        )
        return b.append_column(
            "x", pa.array(r.astype(np.uint64), pa.uint64())
        )

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        k = quota.get(g["lang"].iloc[0], 0)
        g = g.sort_values(["x", "doc_id"], kind="mergesort").head(k)
        return g[["doc_id", "lang"]]

    return (
        ds.map_batches(add_rank, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(per_lang, batch_format="pandas")
    )


def _mixture_sql() -> str:
    # quotas must be data-dependent (lang counts), expressed in SQL
    from __ray_entry__ import _key_rank_sql  # lazy: avoids cycle at import

    weights = ", ".join(
        f"('{k}', {v})" for k, v in MIXTURE_WEIGHTS.items()
    )
    return f"""
WITH {_key_rank_sql('documents', 'doc_id', 'doc_id, lang', 13)},
w(lang, wt) AS (VALUES {weights}),
q AS (
  SELECT c.lang,
         least(c.n,
               CAST(floor(CAST(floor((SELECT count(*) FROM documents)
                                     * {MIXTURE_BUDGET}) AS BIGINT)
                          * w.wt) AS BIGINT)) AS k
  FROM (SELECT lang, count(*) AS n FROM documents GROUP BY lang) c
  JOIN w ON w.lang = c.lang
),
nums AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY x, doc_id) AS rn
  FROM r
)
SELECT nums.doc_id, nums.lang
FROM nums JOIN q ON q.lang = nums.lang
WHERE nums.rn <= q.k
"""


def q_curation_decision_docs(sf_dir: str):
    """The composed end-to-end curation decision (the SQL-expressible
    core of a C4-style keep/drop pass): per document, three boolean
    flags — prefix_dup (normalized first-100-char prefix shared with
    an earlier doc, keep-first), too_short (< 120 chars), low_alpha
    (alpha ratio < 0.80, floor-quantized like `quality`) — and
    keep = none of them. Per-row flags compute in the SAME pass that
    keys the prefix exchange (one shuffle total); the oracle compares
    prefix STRINGS (hash-vs-string equivalence). The dup rule matches
    prefix_dup_docs' normalization so the two queries compose."""
    from ..functions.hashing import hash_strings

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    NB = 64

    def flags(b: pa.Table) -> pa.Table:
        t = b["text"]
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(t), r"\s+", " "
            )
        )
        prefix = pc.utf8_slice_codeunits(norm, 0, 100)
        ph = hash_strings(prefix.to_numpy(zero_copy_only=False))
        n_chars = pc.utf8_length(t)
        n_alpha = pc.utf8_length(
            pc.replace_substring_regex(t, r"[^A-Za-z]", "")
        )
        nc = pc.max_element_wise(n_chars, 1)
        ratio = pc.divide(
            pc.cast(n_alpha, pa.float64()), pc.cast(nc, pa.float64())
        )
        ar = pc.divide(pc.floor(pc.multiply(ratio, 1e6)), 1e6)
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "ph": pa.array(ph.view(np.int64), pa.int64()),
                "too_short": pc.less(n_chars, 120),
                "low_alpha": pc.less(ar, 0.80),
                "bk": pa.array(
                    (ph % np.uint64(NB)).astype(np.int64), pa.int64()
                ),
            }
        )

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        ph = g["ph"].to_numpy()
        doc = g["doc_id"].to_numpy()
        order = np.lexsort((doc, ph))
        ph, doc = ph[order], doc[order]
        new = np.empty(len(ph), dtype=bool)
        new[0] = True
        np.not_equal(ph[1:], ph[:-1], out=new[1:])
        keep_doc = doc[new][np.cumsum(new) - 1]
        dup = doc != keep_doc
        out = g.iloc[order][["doc_id", "too_short", "low_alpha"]].copy()
        out["prefix_dup"] = dup
        out["keep"] = ~(
            dup
            | out["too_short"].to_numpy()
            | out["low_alpha"].to_numpy()
        )
        return out[
            ["doc_id", "prefix_dup", "too_short", "low_alpha", "keep"]
        ]

    return (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(mark, batch_format="pandas")
    )


SQL_CURATION_DECISION_DOCS = r"""
WITH k AS (
  SELECT doc_id,
         substring(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                   1, 100) AS key,
         length(text) < 120 AS too_short,
         floor(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               * 1.0 / greatest(length(text), 1) * 1000000) / 1000000
           < 0.80 AS low_alpha
  FROM documents
),
m AS (SELECT key, min(doc_id) AS keep_doc FROM k GROUP BY key)
SELECT k.doc_id, k.doc_id <> m.keep_doc AS prefix_dup,
       k.too_short, k.low_alpha,
       NOT (k.doc_id <> m.keep_doc OR k.too_short OR k.low_alpha)
         AS keep
FROM k JOIN m ON k.key = m.key
"""


REGISTRY.update({'mixture_sample_docs': (q_mixture_sample_docs, _mixture_sql())})


REGISTRY.update({'curation_decision_docs': (
            q_curation_decision_docs,
            SQL_CURATION_DECISION_DOCS,
        )})


def q_rep_ngram_docs(sf_dir: str):
    """Intra-document repetition (the Gopher 'rep-3gram' quality
    rule): per document, the fraction of word-3-gram INSTANCES whose
    gram occurs more than once within the SAME document. Pure per-row
    computation — flat siphash token stream, FNV 3-gram fold, one
    in-batch sort per doc segment — no exchange at all. The oracle
    re-derives grams as STRINGS (hash-vs-string equivalence). Docs
    with < 3 tokens have no grams and are absent from both sides.
    Ratio floor-quantized (half-rule divergence guard)."""
    from ..functions.hashing import flat_token_hashes_arrow

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    FNV = np.uint64(0x100000001B3)
    MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

    def fn(b: pa.Table) -> pa.Table:
        th, starts = flat_token_hashes_arrow(b["text"])
        doc = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(starts)
        F = len(th)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
                "rep_ratio": pa.array([], pa.float64()),
            }
        )
        if F < 3:
            return empty
        d = np.repeat(np.arange(len(doc), dtype=np.int64), lengths)
        with np.errstate(over="ignore"):
            g = ((th[:-2] * FNV + th[1:-1]) & MASK) * FNV + th[2:]
            g &= MASK
        valid = d[:-2] == d[2:]
        if not valid.any():
            return empty
        g = g[valid]
        gd = d[:-2][valid]
        order = np.lexsort((g.view(np.int64), gd))
        g, gd = g[order], gd[order]
        m = len(g)
        new = np.empty(m, dtype=bool)
        new[0] = True
        np.logical_or(
            gd[1:] != gd[:-1], g[1:] != g[:-1], out=new[1:]
        )
        gid = np.cumsum(new) - 1
        run = np.bincount(gid)  # instances per (doc, gram)
        dup_inst = run[gid] > 1  # this instance's gram repeats in-doc
        u, inv = np.unique(gd, return_inverse=True)
        total = np.bincount(inv)
        dup = np.bincount(inv, weights=dup_inst).astype(np.int64)
        ratio = np.floor(dup / total * 1e6) / 1e6
        return pa.table(
            {
                "doc_id": pa.array(doc[u], pa.int64()),
                "n_grams": pa.array(total, pa.int64()),
                "rep_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_REP_NGRAM_DOCS = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')
           AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)]
           || ' ' || toks[CAST(i + 2 AS INT)] AS gram
  FROM tok, unnest(generate_series(1, len(toks) - 2)) AS t(i)
  WHERE len(toks) >= 3
),
r AS (
  SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
       floor(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c)
             * 1000000) / 1000000 AS rep_ratio
FROM r GROUP BY doc_id
"""


REGISTRY.update({'rep_ngram_docs': (q_rep_ngram_docs, SQL_REP_NGRAM_DOCS)})


def q_k_anonymity_docs(sf_dir: str):
    """k-anonymity audit (the privacy sibling of PII redaction): every
    (lang, source) quasi-identifier combination whose group is smaller
    than k = 8 — rows a release would have to suppress or generalize.
    Per-batch partial counts fold over ONE tiny exchange (the
    quasi-identifier domain, not the corpus)."""
    ds = _pq(sf_dir, "documents", ["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["lang", "source"]).aggregate([([], "count_all")])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()  # bounded by the QI domain, not the corpus
    )
    # finish driver-side so an all-pass audit still has a stable
    # (lang, source, n) schema — an empty filtered BLOCK loses it
    out = out[out["n"] < 8]
    return pd.DataFrame(
        {
            "lang": out["lang"].astype(str),
            "source": out["source"].astype(str),
            "n": out["n"].astype(np.int64),
        }
    )


SQL_K_ANONYMITY_DOCS = """
SELECT lang, source, count(*) AS n
FROM documents GROUP BY 1, 2 HAVING count(*) < 8
"""


REGISTRY.update({'k_anonymity_docs': (q_k_anonymity_docs, SQL_K_ANONYMITY_DOCS)})


def q_substr_remove_docs(sf_dir: str):
    """Duplicated-substring REMOVAL accounting (the Lee et al.
    dedup-training-data pass, one step past substr_dedup_docs'
    profile): per document, the number of characters covered by at
    least one 40-char window that also occurs in ANOTHER document —
    i.e. how much text a substring-level dedup would cut. Two passes
    over the same zero-copy window-hash kernel: pass A is the
    substr_dedup exchange marking cross-doc-duplicated window hashes
    (distinct-doc count >= 2), whose MARKED SUBSET broadcasts as one
    sorted uint64 array (bounded by actual duplication volume, not the
    corpus; a corpus where most windows are duplicated has bigger
    problems than this broadcast); pass B re-hashes windows per batch,
    flags members by searchsorted, and folds interval coverage with a
    diff-array cumsum — no per-row loop anywhere. Docs shorter than
    the window are absent from both sides."""
    import ray

    from ray.data.aggregate import Sum as _Sum

    from ..state.broadcast import get_broadcast

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    W = 40
    NB = 64
    P = np.uint64(1099511628211)
    pw = np.ones(W, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(W - 2, -1, -1):
            pw[k] = pw[k + 1] * P

    def windows(b: pa.Table):
        """(window hash, owning doc ordinal, start offset in doc,
        per-doc char lengths) — zero-copy over the Arrow buffers."""
        a = b["text"].combine_chunks()
        odt = np.int64 if pa.types.is_large_string(a.type) else np.int32
        off = np.frombuffer(a.buffers()[1], dtype=odt)[
            a.offset : a.offset + len(a) + 1
        ].astype(np.int64)
        dat = np.frombuffer(a.buffers()[2], dtype=np.uint8)
        flat = dat[off[0] : off[-1]]
        off = off - off[0]
        lengths = np.diff(off)
        d = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        F = len(flat)
        if F < W:
            return None
        sw = np.lib.stride_tricks.sliding_window_view(flat, W)
        with np.errstate(over="ignore"):
            h = (sw.astype(np.uint64) * pw).sum(axis=1)
        valid = d[: F - W + 1] == d[W - 1 :]
        if not valid.any():
            return None
        vi = np.flatnonzero(valid)
        return (
            h[valid],
            d[vi],
            vi - off[d[vi]],
            lengths,
        )

    def pass_a(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gh": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "bk": pa.array([], pa.int64()),
            }
        )
        w = windows(b)
        if w is None:
            return empty
        h, wd, _starts, _lens = w
        doc = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gh = h.view(np.int64)
        wdoc = doc[wd]
        order = np.lexsort((wdoc, gh))
        gh, wdoc = gh[order], wdoc[order]
        first = np.r_[True, (gh[1:] != gh[:-1]) | (wdoc[1:] != wdoc[:-1])]
        gh, wdoc = gh[first], wdoc[first]
        return pa.table(
            {
                "gh": pa.array(gh, pa.int64()),
                "doc_id": pa.array(wdoc, pa.int64()),
                "bk": pa.array(
                    gh.view(np.uint64) % np.uint64(NB), pa.int64()
                ),
            }
        )

    def dup_ghs(g: pd.DataFrame) -> pd.DataFrame:
        gh = np.sort(g["gh"].to_numpy(np.int64))
        starts = np.r_[0, np.flatnonzero(gh[1:] != gh[:-1]) + 1]
        n = np.diff(np.append(starts, len(gh)))
        return pd.DataFrame({"gh": gh[starts][n >= 2]})

    marked = (
        ds.map_batches(pass_a, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(dup_ghs, batch_format="pandas")
        .to_pandas()  # bounded by duplicated-window volume
    )
    dup_sorted = np.sort(marked["gh"].to_numpy(np.int64).view(np.uint64))
    ref = ray.put(dup_sorted)

    class Coverage:
        def __init__(self, model_ref) -> None:
            self.dup = get_broadcast(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            doc = b["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            w = windows(b)
            empty = pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "dup_chars": pa.array([], pa.int64()),
                    "kept_chars": pa.array([], pa.int64()),
                }
            )
            if w is None:
                return empty
            h, wd, st, lens = w
            pos = np.searchsorted(self.dup, h)
            pos_c = np.minimum(pos, max(len(self.dup) - 1, 0))
            hit = (
                (len(self.dup) > 0)
                & (pos < len(self.dup))
                & (self.dup[pos_c] == h)
            )
            keep_docs = lens >= W
            if not hit.any():
                return pa.table(
                    {
                        "doc_id": pa.array(doc[keep_docs], pa.int64()),
                        "n_chars": pa.array(lens[keep_docs], pa.int64()),
                        "dup_chars": pa.array(
                            np.zeros(int(keep_docs.sum()), np.int64)
                        ),
                        "kept_chars": pa.array(lens[keep_docs], pa.int64()),
                    }
                )
            # diff-array interval union per doc over a flat axis:
            # doc d owns [base[d], base[d]+len) in the flat space
            base = np.r_[0, np.cumsum(lens)]
            s = base[wd[hit]] + st[hit]
            e = s + W  # cover [s, s+W)
            diff = np.zeros(int(base[-1]) + 1, np.int64)
            np.add.at(diff, s, 1)
            np.add.at(diff, e, -1)
            covered = (np.cumsum(diff[:-1]) > 0).astype(np.int64)
            cum = np.r_[0, np.cumsum(covered)]
            dup_chars = cum[base[1:]] - cum[base[:-1]]
            return pa.table(
                {
                    "doc_id": pa.array(doc[keep_docs], pa.int64()),
                    "n_chars": pa.array(lens[keep_docs], pa.int64()),
                    "dup_chars": pa.array(
                        dup_chars[keep_docs], pa.int64()
                    ),
                    "kept_chars": pa.array(
                        (lens - dup_chars)[keep_docs], pa.int64()
                    ),
                }
            )

    return ds.map_batches(
        Coverage,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=256,
    )


SQL_SUBSTR_REMOVE_DOCS = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE length(text) >= 40),
w AS (
  SELECT doc_id, s, substr(text, s, 40) AS g
  FROM d, LATERAL (
    SELECT unnest(generate_series(1, n - 39)) AS s)),
dupg AS (
  SELECT g FROM w GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT w.doc_id, w.s + k.k AS p
  FROM w JOIN dupg USING (g),
       LATERAL (SELECT unnest(generate_series(0, 39)) AS k) k),
c AS (
  SELECT doc_id, count(*) AS dup_chars FROM cov GROUP BY doc_id)
SELECT d.doc_id, d.n AS n_chars,
       coalesce(c.dup_chars, 0) AS dup_chars,
       d.n - coalesce(c.dup_chars, 0) AS kept_chars
FROM d LEFT JOIN c USING (doc_id)
"""


REGISTRY.update({'substr_remove_docs': (q_substr_remove_docs, SQL_SUBSTR_REMOVE_DOCS)})


# ---------------------------------- CDC chunking / funnel / audits / melt


def q_cdc_chunks_docs(sf_dir: str):
    """Content-defined chunking dedup profile (the storage-dedup /
    training-data chunking shape, Muthitacharoen et al. LBFS): every
    document splits at CONTENT-defined word boundaries — a word ends
    a chunk when ``(31*len(w) + ord(w[0])) % 8 == 0`` — so an
    insertion reshuffles only nearby chunks, never the whole doc.
    Chunk identity is the exact integer signature
    ``(n_words, sum(rank_in_chunk * g2(word)))`` with
    ``g2 = len*1000003 + ord(first)*31 + ord(last)`` (ASCII tokens,
    matching the synthetic corpus and the SQL twin's unicode()).
    Everything is vectorized over the flattened Arrow word buffer —
    no strings ride the exchange: per-batch (doc, nw, sig, cnt)
    partials go through ONE coarse sig-bucket exchange whose fold
    marks cross-doc duplicate chunks, then ONE per-doc sum. Output:
    (doc_id, n_chunks, n_dup_chunks)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    from ..functions.hashing import splitmix64

    def partial(b: pa.Table) -> pa.Table:
        words = b["text"].combine_chunks()
        words = pc.split_pattern(words, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        loff = (
            words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        counts = np.diff(loff)
        va = words.values
        odt = np.int64 if pa.types.is_large_string(va.type) else np.int32
        soff = np.frombuffer(va.buffers()[1], dtype=odt)[
            va.offset : va.offset + len(va) + 1
        ].astype(np.int64)
        data = np.frombuffer(va.buffers()[2], np.uint8)
        so = soff[loff[0] : loff[-1] + 1]
        wlen = np.diff(so)
        first = data[so[:-1]].astype(np.int64)
        last = data[so[1:] - 1].astype(np.int64)
        gw = 31 * wlen + first
        g2 = wlen * np.int64(1000003) + first * 31 + last
        bnd = (gw % 8 == 0).astype(np.int64)
        ndocs = len(counts)
        nw = int(counts.sum())
        starts = np.zeros(ndocs, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        # chunk id = boundaries strictly before the word, per doc
        bshift = np.empty(nw, np.int64)
        bshift[0] = 0
        bshift[1:] = bnd[:-1]
        bshift[starts] = 0
        cs = np.cumsum(bshift)
        cid = cs - np.repeat(cs[starts], counts)
        doc_idx = np.repeat(np.arange(ndocs), counts)
        new_chunk = np.ones(nw, bool)
        new_chunk[1:] = (doc_idx[1:] != doc_idx[:-1]) | (
            cid[1:] != cid[:-1]
        )
        cpos = np.flatnonzero(new_chunk)
        cidx = np.cumsum(new_chunk) - 1
        rn = np.arange(nw, dtype=np.int64) - cpos[cidx] + 1
        sig = np.add.reduceat(rn * g2, cpos)
        cw = np.diff(np.append(cpos, nw)).astype(np.int64)
        cdoc = (
            b["doc_id"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[doc_idx[cpos]]
        )
        # in-batch instance counts per (doc, nw, sig)
        key = np.stack([cdoc, cw, sig], axis=1)
        u, cnt = np.unique(key, axis=0, return_counts=True)
        bk = (
            splitmix64(u[:, 2].astype(np.uint64)) % np.uint64(64)
        ).astype(np.int64)
        return pa.table(
            {
                "bk": pa.array(bk, pa.int64()),
                "doc_id": pa.array(u[:, 0], pa.int64()),
                "nw": pa.array(u[:, 1], pa.int64()),
                "sig": pa.array(u[:, 2], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        nwv = g["nw"].to_numpy(np.int64)
        sg = g["sig"].to_numpy(np.int64)
        dc = g["doc_id"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        key = np.stack([nwv, sg], axis=1)
        u, inv = np.unique(key, axis=0, return_inverse=True)
        ndocs = np.zeros(len(u), np.int64)
        np.add.at(ndocs, inv, 1)  # rows are already (doc,key)-unique
        dup = ndocs[inv] > 1
        du, dinv = np.unique(dc, return_inverse=True)
        return pd.DataFrame(
            {
                "doc_id": du,
                "n_chunks": np.bincount(dinv, weights=cnt).astype(np.int64),
                "n_dup_chunks": np.bincount(
                    dinv, weights=np.where(dup, cnt, 0)
                ).astype(np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(mark_dups, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("n_chunks", alias_name="n_chunks"),
            Sum("n_dup_chunks", alias_name="n_dup_chunks"),
        )
    )


SQL_CDC_CHUNKS_DOCS = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
  FROM documents),
g AS (
  SELECT doc_id, pos,
         CASE WHEN (31 * length(word) + unicode(word)) % 8 = 0
              THEN 1 ELSE 0 END AS bnd,
         length(word) * 1000003 + unicode(word) * 31
           + unicode(right(word, 1)) AS g2
  FROM w),
c AS (
  SELECT doc_id, pos, g2,
         coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cid
  FROM g),
r AS (
  SELECT doc_id, cid, g2,
         row_number() OVER (PARTITION BY doc_id, cid ORDER BY pos) AS rn
  FROM c),
ch AS (
  SELECT doc_id, cid, CAST(count(*) AS BIGINT) AS nw,
         CAST(sum(rn * g2) AS BIGINT) AS sig
  FROM r GROUP BY 1, 2),
dup AS (
  SELECT nw, sig FROM ch GROUP BY nw, sig
  HAVING count(DISTINCT doc_id) > 1)
SELECT ch.doc_id, count(*) AS n_chunks,
       CAST(count(dup.sig) AS BIGINT) AS n_dup_chunks
FROM ch LEFT JOIN dup ON dup.nw = ch.nw AND dup.sig = ch.sig
GROUP BY 1
"""


REGISTRY.update({'cdc_chunks_docs': (q_cdc_chunks_docs, SQL_CDC_CHUNKS_DOCS)})


def q_nb_classify_docs(sf_dir: str):
    """Multinomial naive-Bayes language classifier over the documents
    table (train + resubstitution-classify in one pipeline — the
    distributed analog of the reference's NLP classifiers,
    NLP/transformers_tkb.ipynb). EXACT-parity trick: every log-prob
    is quantized to integer MICROLOG units (round(ln(p)*1e6)) at the
    model level, so per-doc scores are integer sums — bit-identical
    under any partitioning/summation order — and the argmax (ties ->
    lexicographically first language) is deterministic in both
    engines. Model pass: per-batch (token, lang) count partials
    through ONE vocabulary-bounded exchange; the micro matrix (V x L
    int64) broadcasts; scoring is one scan with a searchsorted lookup
    + segment sums. math.log (libm) on the driver matches DuckDB's
    ln ulp-for-ulp; numpy's SIMD log does NOT and is avoided."""
    import math

    from ..functions.hashing import flat_tokens_arrow

    docs = _pq(sf_dir, "documents", ["doc_id", "text", "lang"])

    def count_partial(b: pa.Table) -> pa.Table:
        flat, starts = flat_tokens_arrow(b["text"])
        toks = flat.to_numpy(zero_copy_only=False)
        dl = np.repeat(
            b["lang"].to_numpy(zero_copy_only=False), np.diff(starts)
        )
        g = (
            pd.DataFrame({"t": toks, "lang": dl})
            .groupby(["t", "lang"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    model = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["t", "lang"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    ndl = (
        docs.groupby("lang").aggregate(Count(alias_name="nd")).to_pandas()
    )

    langs_sorted = np.sort(ndl["lang"].to_numpy())
    L = len(langs_sorted)
    vocab = np.sort(model["t"].unique())
    V = len(vocab)
    tot = model.groupby("lang")["c"].sum()
    tot_arr = tot.loc[langs_sorted].to_numpy(np.int64)

    micro = np.empty((V, L), np.int64)
    for j in range(L):
        micro[:, j] = round(math.log(1.0 / (tot_arr[j] + V)) * 1e6)
    li = {l: j for j, l in enumerate(langs_sorted)}
    ti = np.searchsorted(vocab, model["t"].to_numpy())
    for t_idx, lang, c in zip(ti, model["lang"], model["c"].to_numpy(np.int64)):
        micro[t_idx, li[lang]] = round(
            math.log((c + 1.0) / (tot_arr[li[lang]] + V)) * 1e6
        )
    n_docs = int(ndl["nd"].sum())
    prior = np.array(
        [
            round(math.log(int(nd) * 1.0 / n_docs) * 1e6)
            for nd in ndl.set_index("lang")["nd"].loc[langs_sorted]
        ],
        np.int64,
    )
    import ray

    ref = ray.put((vocab, micro, prior, langs_sorted))

    def score(b: pa.Table) -> pa.Table:
        vocab_, micro_, prior_, langs_ = ray.get(ref)
        flat, starts = flat_tokens_arrow(b["text"])
        toks = flat.to_numpy(zero_copy_only=False)
        counts = np.diff(starts)
        nd = len(counts)
        scores = np.tile(prior_, (nd, 1))
        if len(toks):
            idx = np.searchsorted(vocab_, toks)
            d_idx = np.repeat(np.arange(nd, dtype=np.int64), counts)
            np.add.at(scores, d_idx, micro_[idx, :])
        pred = np.argmax(scores, axis=1)  # ties -> first = lang asc
        return pa.table(
            {"doc_id": b["doc_id"], "pred_lang": pa.array(langs_[pred])}
        )

    return docs.map_batches(score, batch_format="pyarrow")


SQL_NB_CLASSIFY_DOCS = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            t -> t <> '')) AS t
  FROM documents
),
langs AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd
          FROM documents GROUP BY 1),
n_tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
model AS (
  SELECT tok.t, d.lang, CAST(count(*) AS BIGINT) AS c
  FROM tok JOIN documents d USING (doc_id)
  GROUP BY tok.t, d.lang
),
tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM model GROUP BY lang),
vocab AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM tok),
tokscore AS (
  SELECT tok.doc_id, lt.lang,
         CAST(sum(COALESCE(
             CAST(round(ln((m.c + 1.0) / (lt.tot + vocab.v)) * 1000000)
                  AS BIGINT),
             CAST(round(ln(1.0 / (lt.tot + vocab.v)) * 1000000) AS BIGINT)
         )) AS BIGINT) AS s
  FROM tok
  CROSS JOIN tot lt
  CROSS JOIN vocab
  LEFT JOIN model m ON m.t = tok.t AND m.lang = lt.lang
  GROUP BY tok.doc_id, lt.lang
),
scored AS (
  SELECT d.doc_id, lg.lang,
         COALESCE(ts.s, 0)
           + CAST(round(ln(lg.nd * 1.0 / (SELECT n FROM n_tot)) * 1000000)
                  AS BIGINT) AS score
  FROM documents d
  CROSS JOIN langs lg
  LEFT JOIN tokscore ts
    ON ts.doc_id = d.doc_id AND ts.lang = lg.lang
)
SELECT doc_id, lang AS pred_lang
FROM (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS rn
      FROM scored)
WHERE rn = 1
"""


REGISTRY.update({'nb_classify_docs': (q_nb_classify_docs, SQL_NB_CLASSIFY_DOCS)})


# ------------------------------------------------ text / concentration


def q_stopwords_corpus(sf_dir: str):
    """Corpus-driven stopword detection — tokens whose DOCUMENT
    frequency is >= half the corpus (the list every retrieval/quality
    stage wants precomputed). Per-batch per-doc DISTINCT tokens fold
    as (token, df) partials through ONE vocabulary-bounded exchange;
    the threshold is the integer comparison 2*df >= N (no division).
    Output ordered by (df DESC, token) — deterministic."""
    from ..functions.hashing import flat_tokens_arrow

    docs = _pq(sf_dir, "documents", ["text"])
    n_docs = docs.count()

    def df_partial(b: pa.Table) -> pa.Table:
        flat, starts = flat_tokens_arrow(b["text"])
        toks = flat.to_numpy(zero_copy_only=False)
        d = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
        df = pd.DataFrame({"t": toks, "d": d}).drop_duplicates()
        g = df.groupby("t", sort=False).size().reset_index(name="df")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("t")
        .aggregate(Sum("df", alias_name="df"))
    )

    def thresh(b: pa.Table) -> pa.Table:
        df = b["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(2 * df >= n_docs)).rename_columns(
            ["token", "df"]
        )

    return (
        counts.map_batches(thresh, batch_format="pyarrow")
        .sort(["df", "token"], descending=[True, False])
    )


SQL_STOPWORDS_CORPUS = r"""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            t -> t <> '')) AS t
  FROM documents
),
dfc AS (SELECT t AS token, CAST(count(*) AS BIGINT) AS df
        FROM tok GROUP BY 1)
SELECT token, df FROM dfc
WHERE 2 * df >= (SELECT count(*) FROM documents)
ORDER BY df DESC, token
"""


def q_lexical_diversity_docs(sf_dir: str):
    """Per-document lexical diversity: type-token ratio and hapax
    ratio (the vocabulary-richness curation features). Pure per-row
    Arrow+numpy — ZERO exchange; counts are exact ints and both
    ratios floor-quantize after a division on identical operands."""
    from ..functions.hashing import flat_tokens_arrow

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        flat, starts = flat_tokens_arrow(b["text"])
        toks = flat.to_numpy(zero_copy_only=False)
        nd = len(starts) - 1
        n_tok = np.diff(starts)
        n_typ = np.zeros(nd, np.int64)
        n_hap = np.zeros(nd, np.int64)
        if len(toks):
            d = np.repeat(np.arange(nd, dtype=np.int64), n_tok)
            tc = (
                pd.DataFrame({"d": d, "t": toks})
                .groupby(["d", "t"], sort=False)
                .size()
                .reset_index(name="c")
            )
            dd = tc["d"].to_numpy(np.int64)
            cc = tc["c"].to_numpy(np.int64)
            np.add.at(n_typ, dd, 1)
            np.add.at(n_hap, dd, (cc == 1).astype(np.int64))
        with np.errstate(divide="ignore", invalid="ignore"):
            ttr = np.floor(np.where(n_tok > 0, n_typ / n_tok, 0.0) * 1e6) / 1e6
            hapax = (
                np.floor(np.where(n_typ > 0, n_hap / n_typ, 0.0) * 1e6) / 1e6
            )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_types": pa.array(n_typ, pa.int64()),
                "ttr": pa.array(ttr),
                "hapax_ratio": pa.array(hapax),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


SQL_LEXICAL_DIVERSITY_DOCS = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            t -> t <> '')) AS t
  FROM documents
),
tc AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
       FROM tok GROUP BY 1, 2),
st AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS n_types,
              CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_hapax
       FROM tc GROUP BY 1)
SELECT doc_id, n_tokens, n_types,
       floor(n_types * 1.0 / n_tokens * 1000000) / 1000000 AS ttr,
       floor(n_hapax * 1.0 / n_types * 1000000) / 1000000 AS hapax_ratio
FROM st
"""


def q_vocab_coverage_docs(sf_dir: str):
    """Tokenizer-vocabulary coverage — what fraction of the corpus'
    token OCCURRENCES the top-1000 tokens capture (the go/no-go
    number before fixing a tokenizer vocab). One vocabulary-bounded
    count exchange; top-k by (count DESC, token) on the bounded
    table; integer sums with one floor-quantized division."""
    from ..functions.hashing import flat_tokens_arrow

    docs = _pq(sf_dir, "documents", ["text"])

    def cnt_partial(b: pa.Table) -> pa.Table:
        flat, _starts = flat_tokens_arrow(b["text"])
        toks = flat.to_numpy(zero_copy_only=False)
        u, c = np.unique(toks, return_counts=True)
        return pa.table(
            {"t": pa.array(u), "c": pa.array(c.astype(np.int64))}
        )

    counts = (
        docs.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("t")
        .aggregate(Sum("c", alias_name="c"))
    )
    top = (
        counts.sort(["c", "t"], descending=[True, False])
        .limit(1000)
        .to_pandas()
    )
    covered = int(top["c"].sum())

    def tot_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": pa.array(
                    [int(b["c"].to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                )
            }
        )

    total = int(
        counts.map_batches(tot_partial, batch_format="pyarrow")
        .to_pandas()["c"]
        .sum()
    )
    cov = np.floor(covered / total * 1e6) / 1e6
    return pd.DataFrame(
        {"covered": [covered], "total": [total], "coverage": [cov]}
    )


SQL_VOCAB_COVERAGE_DOCS = r"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            t -> t <> '')) AS t
  FROM documents
),
c AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
top AS (SELECT c FROM c ORDER BY c DESC, t LIMIT 1000),
s AS (SELECT CAST(sum(c) AS BIGINT) AS covered FROM top),
tt AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c)
SELECT s.covered AS covered, tt.total AS total,
       floor(s.covered * 1.0 / tt.total * 1000000) / 1000000 AS coverage
FROM s, tt
"""


REGISTRY.update({'stopwords_corpus': (q_stopwords_corpus, SQL_STOPWORDS_CORPUS)})


REGISTRY.update({'lexical_diversity_docs': (
            q_lexical_diversity_docs,
            SQL_LEXICAL_DIVERSITY_DOCS,
        )})


REGISTRY.update({'vocab_coverage_docs': (q_vocab_coverage_docs, SQL_VOCAB_COVERAGE_DOCS)})


def q_dedup_best_docs(sf_dir: str):
    """Keep-BEST dedup — normalization-exact duplicate groups keep
    the highest-quality member (longest text, then min doc_id)
    instead of the min id: the canonical-selection policy real
    curation pipelines use (keep the richest copy). Normalized key
    hashes through ONE 64-bucket exchange; within a bucket the
    argmax is a vectorized sort + drop_duplicates on the full key
    (no cross-bucket key can collide — same key always hashes to the
    same bucket)."""
    from ..functions.hashing import hash_strings

    ds = _pq(sf_dir, "documents", ["doc_id", "text", "lang"])
    B = 64

    def pre(b: pa.Table) -> pa.Table:
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(b["text"]), r"\s+", " ")
        )
        h = hash_strings(norm.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(B)).astype(np.int64)),
                "key": norm,
                "n_chars": pc.cast(pc.utf8_length(b["text"]), pa.int64()),
                "doc_id": b["doc_id"],
                "lang": b["lang"],
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["key", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("key", keep="first")
        return g[["doc_id", "lang", "n_chars"]]

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


SQL_DEDUP_BEST_DOCS = r"""
WITH k AS (
  SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS key
  FROM documents
),
r AS (SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY key
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM k)
SELECT doc_id, lang, n_chars FROM r WHERE rn = 1
"""


REGISTRY.update({'dedup_best_docs': (q_dedup_best_docs, SQL_DEDUP_BEST_DOCS)})


def q_readability_docs(sf_dir: str):
    """Flesch reading-ease quality score per document — the classic
    readability gate of a text-curation pipeline (length/punct ratio
    family, SURVEY §2.8 / textstats sibling). Words, sentences and
    syllable groups are all non-overlapping regex match COUNTS
    (pyarrow count_substring_regex == DuckDB len(regexp_extract_all);
    both are RE2), so the three inputs are exact integers; the score
    is one float expression evaluated in the oracle's tree shape and
    floor-quantized. Pure per-row map, zero shuffle."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        w = pc.count_substring_regex(b["text"], "[A-Za-z]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        s = pc.count_substring_regex(b["text"], "[.!?]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        y = pc.count_substring_regex(
            b["text"], "[aeiouyAEIOUY]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = w > 0
        w, y = w[keep], y[keep]
        s = np.maximum(s[keep], 1)  # punctuation-free docs: 1 sentence
        flesch = (
            206.835 - 1.015 * (w * 1.0 / s) - 84.6 * (y * 1.0 / w)
        )
        return pa.table(
            {
                "doc_id": pc.filter(b["doc_id"], pa.array(keep)),
                "words": pa.array(w, pa.int64()),
                "sentences": pa.array(s, pa.int64()),
                "syllables": pa.array(y, pa.int64()),
                "flesch": pa.array(
                    np.floor(flesch * 1e6) / 1e6, pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


SQL_READABILITY_DOCS = """
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS w,
         greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
                  1) AS s,
         CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)
           AS y
  FROM documents
)
SELECT doc_id, w AS words, s AS sentences, y AS syllables,
       floor((206.835 - 1.015 * (w * 1.0 / s)
                      - 84.6 * (y * 1.0 / w)) * 1e6) / 1e6 AS flesch
FROM c WHERE w > 0
"""


REGISTRY.update({'readability_docs': (q_readability_docs, SQL_READABILITY_DOCS)})


def q_jsd_lang_pairs(sf_dir: str):
    """Jensen-Shannon divergence between the unigram token
    distributions of every language pair — the distribution-shift /
    corpus-drift diagnostic of a training-data pipeline (domain mix
    monitoring, dedup-impact checks). One vocabulary-bounded exchange
    of per-batch (lang, token) count partials; the driver finishes
    over the langs x vocab table with math.log (ulp-identical to
    DuckDB ln — the nb_classify_docs precedent) and each JSD term is
    floor-quantized to integer NANOUNITS before the order-independent
    integer sum."""
    import math

    ds = _pq(sf_dir, "documents", ["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words)
        langs = np.repeat(
            b["lang"].to_numpy(zero_copy_only=False).astype("U"), n_per
        )
        toks = flat.to_numpy(zero_copy_only=False).astype("U")
        keep = toks != ""
        df = (
            pd.DataFrame({"lang": langs[keep], "tok": toks[keep]})
            .groupby(["lang", "tok"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "tok"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = counts.pivot_table(
        index="tok", columns="lang", values="n", fill_value=0
    ).astype(np.int64)
    totals = {lang: int(piv[lang].sum()) for lang in piv.columns}
    rows = []
    for la in sorted(piv.columns):
        for lb in sorted(piv.columns):
            if la >= lb:
                continue
            ta, tb = totals[la], totals[lb]
            acc = 0
            for n_a, n_b in zip(piv[la].to_numpy(), piv[lb].to_numpy()):
                pa_ = int(n_a) * 1.0 / ta
                pb_ = int(n_b) * 1.0 / tb
                s = pa_ + pb_
                term = (
                    0.0 if n_a == 0
                    else 0.5 * pa_ * math.log(2.0 * pa_ / s)
                ) + (
                    0.0 if n_b == 0
                    else 0.5 * pb_ * math.log(2.0 * pb_ / s)
                )
                acc += int(np.floor(term * 1e9))
            rows.append((la, lb, acc))
    return pd.DataFrame(
        rows, columns=["lang_a", "lang_b", "jsd_nano"]
    ).astype({"jsd_nano": np.int64})


SQL_JSD_LANG_PAIRS = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
),
c AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS n
      FROM tok WHERE t <> '' GROUP BY 1, 2),
tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tn FROM c GROUP BY 1),
langs AS (SELECT DISTINCT lang FROM c),
grid AS (SELECT l.lang, v.t
         FROM langs l CROSS JOIN (SELECT DISTINCT t FROM c) v),
f AS (SELECT g.lang, g.t, COALESCE(c.n, 0) AS n
      FROM grid g LEFT JOIN c ON c.lang = g.lang AND c.t = g.t),
pr AS (SELECT a.lang AS la, b.lang AS lb
       FROM langs a JOIN langs b ON a.lang < b.lang),
terms AS (
  SELECT pr.la, pr.lb,
         CAST(floor((
           CASE WHEN fa.n = 0 THEN 0.0
                ELSE 0.5 * (fa.n * 1.0 / ta.tn)
                     * ln(2.0 * (fa.n * 1.0 / ta.tn)
                          / ((fa.n * 1.0 / ta.tn)
                             + (fb.n * 1.0 / tb.tn))) END
           + CASE WHEN fb.n = 0 THEN 0.0
                  ELSE 0.5 * (fb.n * 1.0 / tb.tn)
                       * ln(2.0 * (fb.n * 1.0 / tb.tn)
                            / ((fa.n * 1.0 / ta.tn)
                               + (fb.n * 1.0 / tb.tn))) END
         ) * 1e9) AS BIGINT) AS ti
  FROM pr
  JOIN f fa ON fa.lang = pr.la
  JOIN f fb ON fb.lang = pr.lb AND fb.t = fa.t
  JOIN tot ta ON ta.lang = pr.la
  JOIN tot tb ON tb.lang = pr.lb
)
SELECT la AS lang_a, lb AS lang_b,
       CAST(sum(ti) AS BIGINT) AS jsd_nano
FROM terms GROUP BY 1, 2
"""


REGISTRY.update({'jsd_lang_pairs': (q_jsd_lang_pairs, SQL_JSD_LANG_PAIRS)})


#: C4-style term blocklist (stand-in list over the synthetic vocab —
#: the operator shape is what matters, the list is a config knob)
BLOCKLIST_TERMS = ("slow", "big")
BLOCKLIST_MAX_BP = 200  # drop docs where flagged tokens > 2% (bp)


def q_blocklist_docs(sf_dir: str):
    """Blocklist filtering (the C4 'bad words' gate): per doc, count
    tokens in the configured blocklist and flag docs whose flagged
    share exceeds 2% — the drop decision cross-multiplies integers
    (n_flagged * 10000 > bp * n_tokens), so no float ever enters the
    predicate. Pure per-row Arrow kernels, zero shuffle."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    terms = pa.array(list(BLOCKLIST_TERMS))

    def score(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words)
        empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        hit = pc.is_in(flat, value_set=terms).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # per-doc sums over the flattened token array
        offs = np.r_[0, np.cumsum(n_per)]
        csum_hit = np.r_[0, np.cumsum(hit)]
        csum_tok = np.r_[0, np.cumsum((~empty).astype(np.int64))]
        n_flag = csum_hit[offs[1:]] - csum_hit[offs[:-1]]
        n_tok = csum_tok[offs[1:]] - csum_tok[offs[:-1]]
        drop = (
            n_flag * 10000 > np.int64(BLOCKLIST_MAX_BP) * n_tok
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_flagged": pa.array(n_flag, pa.int64()),
                "drop": pa.array(drop, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


SQL_BLOCKLIST_DOCS = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
c AS (
  SELECT doc_id,
         CAST(count(*) FILTER (t <> '') AS BIGINT) AS n_tokens,
         CAST(count(*) FILTER (
           t IN ({', '.join(repr(t) for t in BLOCKLIST_TERMS)})
         ) AS BIGINT) AS n_flagged
  FROM tok GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_flagged,
       CASE WHEN n_flagged * 10000 > {BLOCKLIST_MAX_BP} * n_tokens
            THEN 1 ELSE 0 END AS "drop"
FROM c
"""


def q_compression_ratio_docs(sf_dir: str):
    """Compressibility quality signal (Gopher / CCNet practice):
    zlib-compressed size over raw size per document — near-duplicate
    boilerplate and template junk compress far better than natural
    text. Per-row zlib calls are C-speed and stateless (the same
    per-doc-bounded-work contract as model scoring); zero shuffle.
    NO SQL ORACLE: DuckDB has no DEFLATE primitive — correctness is
    pinned by pytest instead (repetitive text must compress below
    diverse text; byte-deterministic at level 6)."""
    import zlib

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        raw = np.array([len(t.encode()) for t in texts], np.int64)
        comp = np.array(
            [len(zlib.compress(t.encode(), 6)) for t in texts],
            np.int64,
        )
        keep = raw > 0
        ratio = np.floor(
            comp[keep] * 1.0 / raw[keep] * 1e6
        ) / 1e6
        return pa.table(
            {
                "doc_id": pc.filter(b["doc_id"], pa.array(keep)),
                "raw_len": pa.array(raw[keep], pa.int64()),
                "comp_len": pa.array(comp[keep], pa.int64()),
                "ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


REGISTRY.update({'blocklist_docs': (q_blocklist_docs, SQL_BLOCKLIST_DOCS)})


REGISTRY.update({'compression_ratio_docs': (q_compression_ratio_docs, None)})


def q_hist_intersection_sources(sf_dir: str):
    """Histogram-intersection similarity between the token
    distributions of two document sources (src0 vs src1) — the
    min-based drift measure complementing JSD (which is log-based):
    HI = sum_t min(p_t, q_t). Cross-multiplied integer counts make
    the numerator exact (min(na*Nb, nb*Na)); one vocabulary-bounded
    count exchange, one final quantized division."""
    ds = _pq(sf_dir, "documents", ["source", "text"]).map_batches(
        lambda b: b.filter(
            pc.is_in(b["source"], value_set=pa.array(["src0", "src1"]))
        ),
        batch_format="pyarrow",
    )

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words)
        src = np.repeat(
            b["source"].to_numpy(zero_copy_only=False).astype("U"),
            n_per,
        )
        toks = flat.to_numpy(zero_copy_only=False).astype("U")
        keep = toks != ""
        df = (
            pd.DataFrame({"source": src[keep], "tok": toks[keep]})
            .groupby(["source", "tok"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "tok"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = counts.pivot_table(
        index="tok", columns="source", values="n", fill_value=0
    ).astype(np.int64)
    na = piv.get("src0", pd.Series(0, index=piv.index)).to_numpy()
    nb = piv.get("src1", pd.Series(0, index=piv.index)).to_numpy()
    Na, Nb = int(na.sum()), int(nb.sum())
    num = int(
        sum(
            min(int(a) * Nb, int(b_) * Na)
            for a, b_ in zip(na, nb)
        )
    )
    hi = np.floor(num * 1.0 / (Na * Nb) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "src_a": ["src0"],
            "src_b": ["src1"],
            "n_a": [Na],
            "n_b": [Nb],
            "hist_intersection": [float(hi)],
        }
    ).astype({"n_a": np.int64, "n_b": np.int64})


SQL_HIST_INTERSECTION_SOURCES = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS t
  FROM documents WHERE source IN ('src0', 'src1')
),
c AS (SELECT source, t, CAST(count(*) AS BIGINT) AS n
      FROM tok WHERE t <> '' GROUP BY 1, 2),
piv AS (
  SELECT t,
         CAST(COALESCE(sum(n) FILTER (source = 'src0'), 0)
              AS BIGINT) AS na,
         CAST(COALESCE(sum(n) FILTER (source = 'src1'), 0)
              AS BIGINT) AS nb
  FROM c GROUP BY t
),
tot AS (SELECT CAST(sum(na) AS BIGINT) AS Na,
               CAST(sum(nb) AS BIGINT) AS Nb FROM piv)
SELECT 'src0' AS src_a, 'src1' AS src_b,
       (SELECT Na FROM tot) AS n_a,
       (SELECT Nb FROM tot) AS n_b,
       floor(CAST(sum(least(na * (SELECT Nb FROM tot),
                            nb * (SELECT Na FROM tot))) AS BIGINT)
             * 1.0 / ((SELECT Na FROM tot) * (SELECT Nb FROM tot))
             * 1e6) / 1e6 AS hist_intersection
FROM piv
"""


REGISTRY.update({'hist_intersection_sources': (
            q_hist_intersection_sources,
            SQL_HIST_INTERSECTION_SOURCES,
        )})


#: span corruption (T5 denoising) parameters
CORRUPT_SPAN = 3
CORRUPT_SEED = 23
#: start-probability threshold: floor(0.05 * 2^64) — a token position
#: starts a masked span iff its key_rank64 falls below this
CORRUPT_THRESH = 922337203685477580


def q_span_corruption_docs(sf_dir: str):
    """T5-style span-corruption mask accounting: position i starts a
    masked span iff key_rank64((doc_id << 32) | i, seed) < 5% of the
    hash space — a pure function of (doc, position), so masks are
    identical under any partitioning and the SQL twin replays the
    chain bit-for-bit. A span covers [i, i+2]; per-doc masked counts
    come from ONE flat prefix-sum pass (masked(p) iff a start lies in
    [max(doc_start, p-2), p]) — no per-doc loop, zero shuffle."""
    from ..functions.hashing import key_rank64

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        words = pc.split_pattern(b["text"], " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = np.r_[0, np.cumsum(n_per)]
        tot = int(offs[-1])
        doc_of = np.repeat(np.arange(len(did), dtype=np.int64), n_per)
        pos = np.arange(tot, dtype=np.int64) - offs[doc_of]
        key = (did[doc_of].astype(np.uint64) << np.uint64(32)) | pos.astype(
            np.uint64
        )
        rank = key_rank64(key.astype(np.int64), seed=CORRUPT_SEED)
        starts = rank < np.uint64(CORRUPT_THRESH)
        ps = np.r_[0, np.cumsum(starts.astype(np.int64))]
        flat_idx = np.arange(tot, dtype=np.int64)
        lower = np.maximum(offs[doc_of], flat_idx - (CORRUPT_SPAN - 1))
        masked = (ps[flat_idx + 1] - ps[lower]) > 0
        n_starts = np.bincount(
            doc_of, weights=starts, minlength=len(did)
        ).astype(np.int64)
        n_masked = np.bincount(
            doc_of, weights=masked, minlength=len(did)
        ).astype(np.int64)
        keep = n_per > 0
        ratio = np.floor(
            n_masked[keep] * 1.0 / n_per[keep] * 1e6
        ) / 1e6
        return pa.table(
            {
                "doc_id": pa.array(did[keep], pa.int64()),
                "n_tokens": pa.array(n_per[keep], pa.int64()),
                "n_starts": pa.array(n_starts[keep], pa.int64()),
                "n_masked": pa.array(n_masked[keep], pa.int64()),
                "mask_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _span_corruption_sql() -> str:
    from __ray_entry__ import _key_rank_sql  # lazy: avoids cycle

    return f"""
WITH tok2 AS (
  -- positions number the RAW split (empties included), exactly like
  -- the runtime's list offsets
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
{_key_rank_sql('tok2', '(doc_id * 4294967296 + pos)', 'doc_id, pos', CORRUPT_SEED)},
s AS (SELECT doc_id, pos FROM r WHERE x < {CORRUPT_THRESH}),
m AS (
  SELECT DISTINCT t.doc_id, t.pos
  FROM tok2 t JOIN s ON s.doc_id = t.doc_id
               AND t.pos BETWEEN s.pos AND s.pos + {CORRUPT_SPAN - 1}
),
agg AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(COALESCE(max(sc.c), 0) AS BIGINT) AS n_starts,
         CAST(COALESCE(max(mc.c), 0) AS BIGINT) AS n_masked
  FROM tok2 t
  LEFT JOIN (SELECT doc_id, count(*) AS c FROM s GROUP BY 1) sc
    ON sc.doc_id = t.doc_id
  LEFT JOIN (SELECT doc_id, count(*) AS c FROM m GROUP BY 1) mc
    ON mc.doc_id = t.doc_id
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, n_starts, n_masked,
       floor(n_masked * 1.0 / n_tokens * 1e6) / 1e6 AS mask_ratio
FROM agg WHERE n_tokens > 0
"""


REGISTRY.update({'span_corruption_docs': (
            q_span_corruption_docs,
            _span_corruption_sql(),
        )})


#: skip-gram context window (skipgram_pairs)
SKIPGRAM_WINDOW = 2


def q_skipgram_pairs(sf_dir: str):
    """word2vec-style skip-gram pair generation: (center, context)
    counts for every context within +-2 positions inside a document —
    the embedding-training data-prep fan-out, aggregated to the
    vocab^2-bounded pair table before it ever shuffles. Per batch the
    four shifted comparisons run over ONE flat token array with
    doc-boundary masks (no per-doc loop); the exchange carries pair
    counts only."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words).to_numpy(
            zero_copy_only=False
        ).astype("U")
        doc_of = np.repeat(np.arange(len(n_per), dtype=np.int64), n_per)
        keep = flat != ""
        # positions of NON-empty tokens only, but offsets within the
        # raw array — context distance is measured over the raw split
        centers, contexts = [], []
        for d in range(1, SKIPGRAM_WINDOW + 1):
            same = doc_of[d:] == doc_of[:-d]
            ok = same & keep[d:] & keep[:-d]
            a, c = flat[:-d][ok], flat[d:][ok]
            centers.append(np.concatenate([a, c]))
            contexts.append(np.concatenate([c, a]))
        ctr = np.concatenate(centers)
        ctx = np.concatenate(contexts)
        df = (
            pd.DataFrame({"center": ctr, "context": ctx})
            .groupby(["center", "context"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["center", "context"])
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_SKIPGRAM_PAIRS = f"""
WITH tok AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS t
  FROM documents
),
nz AS (SELECT doc_id, pos, t FROM tok WHERE t <> ''),
pairs AS (
  SELECT a.t AS center, b.t AS context
  FROM nz a JOIN nz b
    ON b.doc_id = a.doc_id
   AND b.pos <> a.pos
   AND abs(b.pos - a.pos) <= {SKIPGRAM_WINDOW}
)
SELECT center, context, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY 1, 2
"""


REGISTRY.update({'skipgram_pairs': (q_skipgram_pairs, SQL_SKIPGRAM_PAIRS)})


#: negative-sampling seed (negative_samples_counts)
NEGSAMPLE_SEED = 29


def q_negative_samples_counts(sf_dir: str):
    """word2vec negative sampling, deterministic: every skip-gram
    positive occurrence draws ONE negative from the corpus unigram
    table, where the draw is key_rank64 of the occurrence's packed
    (doc, center_pos, context_pos) identity modulo the total token
    mass, mapped through the lexicographic CDF of token counts — a
    pure function of the data, identical under any partitioning, and
    the SQL twin replays chain + CDF ranges. Pass 1 folds the
    vocabulary-bounded count table (broadcast as a sorted CDF); pass
    2 re-enumerates pair occurrences and bincounts draws per token,
    so the exchange is vocab-sized."""
    from ..functions.hashing import key_rank64

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def vocab_partial(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern(b["text"], " ")
        ).to_numpy(zero_copy_only=False).astype("U")
        flat = flat[flat != ""]
        u, n = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(u, pa.string()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    vocab = (
        ds.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("tok", kind="mergesort")
    )
    toks = vocab["tok"].to_numpy()
    w = vocab["n"].to_numpy(np.int64)
    lo = np.r_[0, np.cumsum(w)[:-1]]
    W = int(w.sum())

    def sample_partial(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        words = pc.split_pattern(b["text"], " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words).to_numpy(
            zero_copy_only=False
        ).astype("U")
        offs = np.r_[0, np.cumsum(n_per)]
        doc_of = np.repeat(np.arange(len(did), dtype=np.int64), n_per)
        pos = np.arange(int(offs[-1]), dtype=np.int64) - offs[doc_of]
        keep = flat != ""
        keys = []
        for d in range(1, SKIPGRAM_WINDOW + 1):
            same = doc_of[d:] == doc_of[:-d]
            ok = same & keep[d:] & keep[:-d]
            dd = did[doc_of[:-d][ok]]
            p_a, p_b = pos[:-d][ok], pos[d:][ok]
            # both orientations, matching the skipgram pair domain
            keys.append(
                dd.astype(np.uint64) * np.uint64(1099511627776)
                + p_a.astype(np.uint64) * np.uint64(1048576)
                + p_b.astype(np.uint64)
            )
            keys.append(
                dd.astype(np.uint64) * np.uint64(1099511627776)
                + p_b.astype(np.uint64) * np.uint64(1048576)
                + p_a.astype(np.uint64)
            )
        if not keys:
            return pa.table(
                {
                    "tok": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        k = np.concatenate(keys)
        r = key_rank64(k.astype(np.int64), seed=NEGSAMPLE_SEED) % np.uint64(W)
        idx = np.searchsorted(lo, r.astype(np.int64), side="right") - 1
        cnt = np.bincount(idx, minlength=len(toks)).astype(np.int64)
        nz = cnt > 0
        return pa.table(
            {
                "tok": pa.array(toks[nz], pa.string()),
                "n": pa.array(cnt[nz], pa.int64()),
            }
        )

    return (
        ds.map_batches(sample_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n_sampled"))
    )


def _negative_samples_sql() -> str:
    from __ray_entry__ import _key_rank_sql  # lazy: avoids cycle

    return f"""
WITH tok AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS t
  FROM documents
),
nz AS (SELECT doc_id, pos, t FROM tok WHERE t <> ''),
vocab AS (SELECT t, CAST(count(*) AS BIGINT) AS n
          FROM nz GROUP BY t),
cdf AS (
  SELECT t, n,
         CAST(COALESCE(sum(n) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS lo
  FROM vocab
),
ww AS (SELECT CAST(sum(n) AS BIGINT) AS w FROM vocab),
occ AS (
  SELECT a.doc_id,
         a.doc_id * 1099511627776 + a.pos * 1048576 + b.pos AS pk
  FROM nz a JOIN nz b
    ON b.doc_id = a.doc_id
   AND b.pos <> a.pos
   AND abs(b.pos - a.pos) <= {SKIPGRAM_WINDOW}
),
{_key_rank_sql('occ', 'pk', 'pk', NEGSAMPLE_SEED)},
draw AS (
  SELECT CAST(x % CAST((SELECT w FROM ww) AS UBIGINT) AS BIGINT) AS rm
  FROM r
),
hit AS (
  SELECT cdf.t
  FROM draw JOIN cdf
    ON draw.rm >= cdf.lo AND draw.rm < cdf.lo + cdf.n
)
SELECT t AS tok, CAST(count(*) AS BIGINT) AS n_sampled
FROM hit GROUP BY t
"""


REGISTRY.update({'negative_samples_counts': (
            q_negative_samples_counts,
            _negative_samples_sql(),
        )})


def q_glove_cooc(sf_dir: str):
    """GloVe-style distance-weighted co-occurrence: each (center,
    context) occurrence at distance d contributes weight 1/d,
    accumulated as EXACT integer micro-units (1000000 // d) so
    partial sums are order-independent — the embedding-prep sibling
    of skipgram_pairs sharing its flat shifted-comparison kernel;
    only the vocab^2-bounded weighted table shuffles."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words).to_numpy(
            zero_copy_only=False
        ).astype("U")
        doc_of = np.repeat(np.arange(len(n_per), dtype=np.int64), n_per)
        keep = flat != ""
        ctr, ctx, wt = [], [], []
        for d in range(1, SKIPGRAM_WINDOW + 1):
            same = doc_of[d:] == doc_of[:-d]
            ok = same & keep[d:] & keep[:-d]
            a, c = flat[:-d][ok], flat[d:][ok]
            ctr.append(np.concatenate([a, c]))
            ctx.append(np.concatenate([c, a]))
            wt.append(
                np.full(2 * int(ok.sum()), 1_000_000 // d, np.int64)
            )
        df = (
            pd.DataFrame(
                {
                    "center": np.concatenate(ctr),
                    "context": np.concatenate(ctx),
                    "w": np.concatenate(wt),
                }
            )
            .groupby(["center", "context"], sort=False)["w"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["center", "context"])
        .aggregate(Sum("w", alias_name="weight_micro"))
    )


SQL_GLOVE_COOC = f"""
WITH tok AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS t
  FROM documents
),
nz AS (SELECT doc_id, pos, t FROM tok WHERE t <> ''),
pairs AS (
  SELECT a.t AS center, b.t AS context,
         1000000 // abs(b.pos - a.pos) AS w
  FROM nz a JOIN nz b
    ON b.doc_id = a.doc_id
   AND b.pos <> a.pos
   AND abs(b.pos - a.pos) <= {SKIPGRAM_WINDOW}
)
SELECT center, context, CAST(sum(w) AS BIGINT) AS weight_micro
FROM pairs GROUP BY 1, 2
"""


#: l-diversity threshold (l_diversity_docs)
L_DIVERSITY = 3


def q_l_diversity_docs(sf_dir: str):
    """l-diversity audit (the companion of the k-anonymity check):
    for each quasi-identifier group (lang, length-decile-bucket), the
    number of DISTINCT sensitive values (source) — groups with fewer
    than l=3 distinct sources leak attribute information even when
    k-anonymous. In-batch (group, source) dedup shrinks the exchange
    to distinct pairs; integer bucket = n_chars // 200."""
    ds = _pq(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        lang = b["lang"].to_numpy(zero_copy_only=False).astype("U")
        src = b["source"].to_numpy(zero_copy_only=False).astype("U")
        bucket = (
            b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
            // 200
        )
        df = pd.DataFrame(
            {"lang": lang, "bucket": bucket, "source": src}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "bucket", "source"])
        .aggregate(Count(alias_name="_c"))
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["lang", "bucket"], sort=False)["source"]
            .nunique()
            .reset_index(name="n_sources")
        )
        out["leaky"] = (out["n_sources"] < L_DIVERSITY).astype(np.int64)
        return out.astype(
            {"bucket": np.int64, "n_sources": np.int64}
        )

    return (
        pairs.groupby(["lang", "bucket"])
        .map_groups(finish, batch_format="pandas")
    )


SQL_L_DIVERSITY_DOCS = f"""
WITH q AS (
  SELECT lang, n_chars // 200 AS bucket, source FROM documents
)
SELECT lang, bucket,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CASE WHEN count(DISTINCT source) < {L_DIVERSITY}
            THEN 1 ELSE 0 END AS leaky
FROM q GROUP BY 1, 2
"""


REGISTRY.update({'glove_cooc': (q_glove_cooc, SQL_GLOVE_COOC)})


REGISTRY.update({'l_diversity_docs': (q_l_diversity_docs, SQL_L_DIVERSITY_DOCS)})


#: split-leakage test fraction threshold: floor(0.2 * 2^64)
LEAK_TEST_THRESH = 3689348814741910323
LEAK_SEED = 31


def q_split_leakage_docs(sf_dir: str):
    """Train/test split-leakage audit — the eval-hygiene check every
    benchmark pipeline needs: after a deterministic 80/20 hash split
    (key_rank64(doc_id) below 20% of the hash space = test), count
    normalized-duplicate pairs that CROSS the split and the distinct
    test docs thereby contaminated. Normalization = the
    dedup_norm_docs rule (casefold + whitespace collapse); per-group
    counts fold through one norm-keyed exchange of (n_train, n_test)
    partials, crossing pairs = sum n_train * n_test."""
    from ..functions.hashing import key_rank64

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        is_test = (
            key_rank64(did, seed=LEAK_SEED)
            < np.uint64(LEAK_TEST_THRESH)
        ).astype(np.int64)
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(b["text"]), r"\s+", " "
            )
        )
        df = pd.DataFrame(
            {
                "norm": norm.to_numpy(zero_copy_only=False),
                "tr": 1 - is_test,
                "te": is_test,
            }
        )
        out = (
            df.groupby("norm", sort=False)[["tr", "te"]]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    groups = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("norm")
        .aggregate(
            Sum("tr", alias_name="tr"), Sum("te", alias_name="te")
        )
        .to_pandas()
    )
    tr = groups["tr"].to_numpy(np.int64)
    te = groups["te"].to_numpy(np.int64)
    crossing = int((tr * te).sum())
    leaked = int(te[(tr > 0) & (te > 0)].sum())
    return pd.DataFrame(
        {
            "n_train": [int(tr.sum())],
            "n_test": [int(te.sum())],
            "crossing_pairs": [crossing],
            "leaked_test_docs": [leaked],
        }
    ).astype(np.int64)


def _split_leakage_sql() -> str:
    from __ray_entry__ import _key_rank_sql  # lazy: avoids cycle

    return rf"""
WITH {_key_rank_sql('documents', 'doc_id', 'doc_id, text', LEAK_SEED)},
k AS (
  SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
         CASE WHEN x < {LEAK_TEST_THRESH} THEN 1 ELSE 0 END AS te
  FROM r
),
g AS (
  SELECT norm,
         CAST(sum(1 - te) AS BIGINT) AS tr,
         CAST(sum(te) AS BIGINT) AS te
  FROM k GROUP BY norm
)
SELECT CAST(sum(tr) AS BIGINT) AS n_train,
       CAST(sum(te) AS BIGINT) AS n_test,
       CAST(sum(tr * te) AS BIGINT) AS crossing_pairs,
       CAST(sum(CASE WHEN tr > 0 AND te > 0 THEN te ELSE 0 END)
            AS BIGINT) AS leaked_test_docs
FROM g
"""


REGISTRY.update({'split_leakage_docs': (
            q_split_leakage_docs,
            _split_leakage_sql(),
        )})


#: frequent-token subsampling (subsample_tokens_docs)
SUBSAMPLE_T = 0.001
SUBSAMPLE_SEED = 37
#: 2^64 // 1e6 — micro-probability -> uint64 threshold multiplier
SUBSAMPLE_SCALE = 18446744073709


def q_subsample_tokens_docs(sf_dir: str):
    """word2vec frequent-token subsampling, deterministic: an
    occurrence of token t survives iff key_rank64((doc << 32) | pos)
    falls below its keep-probability P(t) = sqrt(T / f(t)) — but the
    float P is first quantized to integer MICRO-units and the
    threshold is micro * (2^64 // 1e6), so the comparison is pure
    uint64 on both engines (a raw P * 2^64 double would round
    differently above 2^53). Outputs per-token occurrence/kept
    counts; vocabulary-bounded exchanges only."""
    from ..functions.hashing import key_rank64

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def vocab_partial(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern(b["text"], " ")
        ).to_numpy(zero_copy_only=False).astype("U")
        flat = flat[flat != ""]
        u, n = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(u, pa.string()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    vocab = (
        ds.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("tok", kind="mergesort")
    )
    toks = vocab["tok"].to_numpy()
    n_t = vocab["n"].to_numpy(np.int64)
    W = int(n_t.sum())
    # micro-quantized keep probability, capped at 1
    p_micro = np.minimum(
        np.floor(
            np.sqrt(SUBSAMPLE_T / (n_t * 1.0 / W)) * 1e6
        ).astype(np.int64),
        1_000_000,
    )
    thresh = p_micro.astype(np.uint64) * np.uint64(SUBSAMPLE_SCALE)

    def keep_partial(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        words = pc.split_pattern(b["text"], " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words).to_numpy(
            zero_copy_only=False
        ).astype("U")
        offs = np.r_[0, np.cumsum(n_per)]
        doc_of = np.repeat(np.arange(len(did), dtype=np.int64), n_per)
        pos = np.arange(int(offs[-1]), dtype=np.int64) - offs[doc_of]
        keep = flat != ""
        idx = np.searchsorted(toks, flat[keep])
        key = (
            did[doc_of[keep]].astype(np.uint64) << np.uint64(32)
        ) | pos[keep].astype(np.uint64)
        r = key_rank64(key.astype(np.int64), seed=SUBSAMPLE_SEED)
        kept = r < thresh[idx]
        occ = np.bincount(idx, minlength=len(toks)).astype(np.int64)
        kc = np.bincount(
            idx, weights=kept, minlength=len(toks)
        ).astype(np.int64)
        nz = occ > 0
        return pa.table(
            {
                "tok": pa.array(toks[nz], pa.string()),
                "occ": pa.array(occ[nz], pa.int64()),
                "kept": pa.array(kc[nz], pa.int64()),
            }
        )

    return (
        ds.map_batches(keep_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(
            Sum("occ", alias_name="n_occurrences"),
            Sum("kept", alias_name="n_kept"),
        )
    )


def _subsample_tokens_sql() -> str:
    from __ray_entry__ import _key_rank_sql  # lazy: avoids cycle

    return f"""
WITH tok AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS t
  FROM documents
),
nz AS (SELECT doc_id, pos, t FROM tok WHERE t <> ''),
vocab AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM nz GROUP BY t),
ww AS (SELECT CAST(sum(n) AS BIGINT) AS w FROM vocab),
pm AS (
  SELECT t, n,
         CAST(least(CAST(floor(sqrt({SUBSAMPLE_T}
                                    / (n * 1.0 / (SELECT w FROM ww)))
                               * 1e6) AS BIGINT),
                    1000000) AS UBIGINT)
           * {SUBSAMPLE_SCALE} AS thresh
  FROM vocab
),
{_key_rank_sql('nz', '(doc_id * 4294967296 + pos)', 'doc_id, pos, t', SUBSAMPLE_SEED)},
k AS (
  SELECT r.t,
         CASE WHEN r.x < pm.thresh THEN 1 ELSE 0 END AS kept
  FROM r JOIN pm ON pm.t = r.t
)
SELECT t AS tok,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(sum(kept) AS BIGINT) AS n_kept
FROM k GROUP BY t
"""


REGISTRY.update({'subsample_tokens_docs': (
            q_subsample_tokens_docs,
            _subsample_tokens_sql(),
        )})


#: rare-label collapse threshold (collapse_rare_sources)
RARE_MIN_COUNT = 20


def q_collapse_rare_sources(sf_dir: str):
    """Rare-category collapse (the feature-engineering prelude to
    one-hot/target encoding): sources with fewer than 20 documents
    fold into 'OTHER'. Two tiny category-bounded exchanges — the
    count table broadcasts as a sorted keep-list, the remap is a
    stateless searchsorted per batch."""
    ds = _pq(sf_dir, "documents", ["source"])
    counts = (
        ds.groupby("source")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    keep = np.sort(
        counts.loc[
            counts["n"] >= RARE_MIN_COUNT, "source"
        ].to_numpy().astype("U")
    )

    def remap(b: pa.Table) -> pa.Table:
        src = b["source"].to_numpy(zero_copy_only=False).astype("U")
        pos = np.clip(
            np.searchsorted(keep, src), 0, max(len(keep) - 1, 0)
        )
        hit = (keep[pos] == src) if len(keep) else np.zeros(
            len(src), bool
        )
        out = np.where(hit, src, "OTHER")
        u, n = np.unique(out, return_counts=True)
        return pa.table(
            {
                "label": pa.array(u, pa.string()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(remap, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n", alias_name="n_docs"))
    )


SQL_COLLAPSE_RARE_SOURCES = f"""
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
m AS (
  SELECT d.source,
         CASE WHEN c.n >= {RARE_MIN_COUNT} THEN d.source
              ELSE 'OTHER' END AS label
  FROM documents d JOIN c ON c.source = d.source
)
SELECT label, CAST(count(*) AS BIGINT) AS n_docs
FROM m GROUP BY label
"""


REGISTRY.update({'collapse_rare_sources': (
            q_collapse_rare_sources,
            SQL_COLLAPSE_RARE_SOURCES,
        )})


def q_cohens_kappa_docs(sf_dir: str):
    """Cohen's kappa between two deterministic quality raters (char
    length >= 300 vs token count >= 55) — the inter-annotator
    agreement statistic behind every labeling-QA report (J8's
    agreement family, distilled to its 2x2 contingency). One pass
    folds the four cell counts; kappa = (po - pe) / (1 - pe) is a
    single float expression over exact integers, floor-quantized."""
    ds = _pq(sf_dir, "documents", ["text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        a = (
            b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
            >= 300
        ).astype(np.int64)
        ntok = pc.count_substring_regex(
            b["text"], r"\S+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        b_ = (ntok >= 55).astype(np.int64)
        cell = a * 2 + b_
        cnt = np.bincount(cell, minlength=4).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(np.arange(4, dtype=np.int64)),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("cell")
    )
    full = np.zeros(4, np.int64)
    full[h["cell"].to_numpy()] = h["n"].to_numpy()
    n00, n01, n10, n11 = (int(x) for x in full)
    n = n00 + n01 + n10 + n11
    po = (n00 + n11) * 1.0 / n
    pe = ((n10 + n11) * 1.0 / n) * ((n01 + n11) * 1.0 / n) + (
        (n00 + n01) * 1.0 / n
    ) * ((n00 + n10) * 1.0 / n)
    kappa = np.floor((po - pe) / (1.0 - pe) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n": [n],
            "both_pos": [n11],
            "both_neg": [n00],
            "kappa": [float(kappa)],
        }
    ).astype({"n": np.int64, "both_pos": np.int64, "both_neg": np.int64})


SQL_COHENS_KAPPA_DOCS = r"""
WITH r AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
         CASE WHEN len(regexp_extract_all(text, '\S+')) >= 55
              THEN 1 ELSE 0 END AS b
  FROM documents
),
c AS (
  SELECT CAST(count(*) FILTER (a = 0 AND b = 0) AS BIGINT) AS n00,
         CAST(count(*) FILTER (a = 0 AND b = 1) AS BIGINT) AS n01,
         CAST(count(*) FILTER (a = 1 AND b = 0) AS BIGINT) AS n10,
         CAST(count(*) FILTER (a = 1 AND b = 1) AS BIGINT) AS n11,
         CAST(count(*) AS BIGINT) AS n
  FROM r
)
SELECT n, n11 AS both_pos, n00 AS both_neg,
       floor((((n00 + n11) * 1.0 / n)
              - (((n10 + n11) * 1.0 / n) * ((n01 + n11) * 1.0 / n)
                 + ((n00 + n01) * 1.0 / n) * ((n00 + n10) * 1.0 / n)))
             / (1.0 - (((n10 + n11) * 1.0 / n)
                       * ((n01 + n11) * 1.0 / n)
                       + ((n00 + n01) * 1.0 / n)
                       * ((n00 + n10) * 1.0 / n)))
             * 1e6) / 1e6 AS kappa
FROM c
"""


REGISTRY.update({'cohens_kappa_docs': (q_cohens_kappa_docs, SQL_COHENS_KAPPA_DOCS)})


def q_ndcg_bm25(sf_dir: str):
    """IR-evaluation metrics over the BM25 ranking: NDCG@10 (graded
    gain = total query-term tf), precision@10 and DCG/IDCG — the
    offline search-quality report. Discount terms use ln(2)/ln(i+1)
    (ulp-identical ln on both engines; log2 may be derived
    differently) and both DCG sums fold in EXPLICIT rank order, so no
    float-reduction divergence; the ideal ranking orders the exact
    integer gains. One extra gain scan with per-batch top-k partials
    for the ideal list."""
    import math

    from ..stages.retrieval import bm25_topk

    K = 10
    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    top = bm25_topk(docs, BM25_TERMS, k=K).to_pandas()
    top_ids = top["doc_id"].to_numpy(np.int64)

    terms = pa.array(BM25_TERMS)

    def gain_partial(b: pa.Table) -> pa.Table:
        words = pc.split_pattern(b["text"], " ")
        n_per = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words)
        hit = pc.is_in(flat, value_set=terms).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = np.r_[0, np.cumsum(n_per)]
        cs = np.r_[0, np.cumsum(hit)]
        g = (cs[offs[1:]] - cs[offs[:-1]]).astype(np.int64)
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-batch ideal-candidate prune: keep this batch's top-K
        order = np.lexsort((did, -g))[:K]
        keep = np.zeros(len(did), bool)
        keep[order] = True
        keep |= np.isin(did, top_ids)
        return pa.table(
            {
                "doc_id": pa.array(did[keep], pa.int64()),
                "gain": pa.array(g[keep], pa.int64()),
            }
        )

    gains = (
        docs.map_batches(gain_partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates("doc_id")
    )
    gmap = gains.set_index("doc_id")["gain"]
    ranked_g = gmap.loc[top_ids].to_numpy(np.int64)
    ideal_g = (
        gains.sort_values(
            ["gain", "doc_id"], ascending=[False, True]
        )["gain"].head(K).to_numpy(np.int64)
    )

    def dcg(gs) -> float:
        s = 0.0
        for i, g in enumerate(gs, start=1):
            s = s + int(g) * math.log(2.0) / math.log(i + 1.0)
        return s

    d, ideal = dcg(ranked_g), dcg(ideal_g)
    ndcg = np.floor(d / ideal * 1e6) / 1e6
    prec = np.floor(
        int((ranked_g > 0).sum()) * 1.0 / K * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "dcg": [float(np.floor(d * 1e6) / 1e6)],
            "idcg": [float(np.floor(ideal * 1e6) / 1e6)],
            "ndcg": [float(ndcg)],
            "prec_at_10": [float(prec)],
        }
    )


def _ndcg_sql() -> str:
    # explicit rank-order DCG folds (t1 + t2 + ... + t10)
    fold = " + ".join(
        f"COALESCE(max(CASE WHEN rn = {i} THEN g END), 0)"
        f" * ln(2.0) / ln({i + 1}.0)"
        for i in range(1, 11)
    )
    base = SQL_BM25_TOPK.strip().rstrip()
    # reuse the proven BM25 CTE chain: strip the final SELECT and
    # re-expose the ranked list as a CTE
    core = base[
        : base.rindex("SELECT doc_id, round(s, 6) AS score")
    ].rstrip()
    return f"""{core},
ranked AS (
  SELECT doc_id, round(s, 6) AS score,
         row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rn
  FROM scores
  ORDER BY score DESC, doc_id LIMIT 10
),
gains AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS g
  FROM tok JOIN q ON q.term = tok.term
  GROUP BY doc_id
),
rg AS (
  SELECT r.rn, COALESCE(gains.g, 0) AS g
  FROM ranked r LEFT JOIN gains ON gains.doc_id = r.doc_id
),
ig AS (
  SELECT row_number() OVER (ORDER BY g DESC, doc_id) AS rn, g
  FROM gains ORDER BY g DESC, doc_id LIMIT 10
),
dcg AS (SELECT {fold} AS v FROM rg),
idcg AS (SELECT {fold} AS v FROM ig)
SELECT floor((SELECT v FROM dcg) * 1e6) / 1e6 AS dcg,
       floor((SELECT v FROM idcg) * 1e6) / 1e6 AS idcg,
       floor((SELECT v FROM dcg) / (SELECT v FROM idcg) * 1e6) / 1e6
         AS ndcg,
       floor((SELECT CAST(count(*) AS BIGINT) FROM rg WHERE g > 0)
             * 1.0 / 10 * 1e6) / 1e6 AS prec_at_10
"""


REGISTRY.update({'ndcg_bm25': (q_ndcg_bm25, _ndcg_sql())})


def q_mcnemar_docs(sf_dir: str):
    """McNemar's test over the two quality raters of
    cohens_kappa_docs: do the raters disagree SYMMETRICALLY? The
    statistic (b - c)^2 / (b + c) uses only the two discordant cells
    of the same 2x2 fold — exact integers, one mirrored float
    expression."""
    ds = _pq(sf_dir, "documents", ["text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        a = (
            b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
            >= 300
        ).astype(np.int64)
        ntok = pc.count_substring_regex(
            b["text"], r"\S+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        b_ = (ntok >= 55).astype(np.int64)
        cell = a * 2 + b_
        cnt = np.bincount(cell, minlength=4).astype(np.int64)
        return pa.table(
            {
                "cell": pa.array(np.arange(4, dtype=np.int64)),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("cell")
    )
    full = np.zeros(4, np.int64)
    full[h["cell"].to_numpy()] = h["n"].to_numpy()
    b_ = int(full[1])  # a=0, b=1
    c = int(full[2])  # a=1, b=0
    stat = np.floor(
        (b_ - c) * (b_ - c) * 1.0 / (b_ + c) * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "only_b": [b_],
            "only_a": [c],
            "mcnemar_chi2": [float(stat)],
        }
    ).astype({"only_b": np.int64, "only_a": np.int64})


SQL_MCNEMAR_DOCS = r"""
WITH r AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
         CASE WHEN len(regexp_extract_all(text, '\S+')) >= 55
              THEN 1 ELSE 0 END AS b
  FROM documents
),
c AS (
  SELECT CAST(count(*) FILTER (a = 0 AND b = 1) AS BIGINT) AS nb,
         CAST(count(*) FILTER (a = 1 AND b = 0) AS BIGINT) AS nc
  FROM r
)
SELECT nb AS only_b, nc AS only_a,
       floor((nb - nc) * (nb - nc) * 1.0 / (nb + nc) * 1e6) / 1e6
         AS mcnemar_chi2
FROM c
"""


REGISTRY.update({'mcnemar_docs': (q_mcnemar_docs, SQL_MCNEMAR_DOCS)})


def q_cochran_q_docs(sf_dir: str):
    """Cochran's Q across THREE binary quality raters (char length,
    token count, digit presence) — does any rater systematically
    differ? Q = k(k-1) * sum_j (C_j - T/k)^2 / (k*T - sum_i R_i^2)
    needs only integer column totals, the integer grand total and the
    integer sum of squared row totals — all exact distributed folds
    (row totals fold per batch since a doc's three flags live in one
    row); Q is one mirrored float expression."""
    ds = _pq(sf_dir, "documents", ["text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        a = (
            b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
            >= 300
        ).astype(np.int64)
        ntok = pc.count_substring_regex(
            b["text"], r"\S+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        b_ = (ntok >= 55).astype(np.int64)
        ndig = pc.count_substring_regex(
            b["text"], r"[0-9]"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        c = (ndig >= 1).astype(np.int64)
        r = a + b_ + c
        return pa.table(
            {
                "c1": pa.array([int(a.sum())], pa.int64()),
                "c2": pa.array([int(b_.sum())], pa.int64()),
                "c3": pa.array([int(c.sum())], pa.int64()),
                "t": pa.array([int(r.sum())], pa.int64()),
                "r2": pa.array([int((r * r).sum())], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    c1, c2, c3 = int(agg["c1"]), int(agg["c2"]), int(agg["c3"])
    t, r2 = int(agg["t"]), int(agg["r2"])
    k = 3
    q = np.floor(
        (
            k
            * (k - 1)
            * (
                (c1 - t * 1.0 / k) * (c1 - t * 1.0 / k)
                + (c2 - t * 1.0 / k) * (c2 - t * 1.0 / k)
                + (c3 - t * 1.0 / k) * (c3 - t * 1.0 / k)
            )
            / (k * t - r2)
        )
        * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "c1": [c1],
            "c2": [c2],
            "c3": [c3],
            "cochran_q": [float(q)],
        }
    ).astype({"c1": np.int64, "c2": np.int64, "c3": np.int64})


SQL_COCHRAN_Q_DOCS = r"""
WITH r AS (
  SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
         CASE WHEN len(regexp_extract_all(text, '\S+')) >= 55
              THEN 1 ELSE 0 END AS b,
         CASE WHEN len(regexp_extract_all(text, '[0-9]')) >= 1
              THEN 1 ELSE 0 END AS c
  FROM documents
),
m AS (
  SELECT CAST(sum(a) AS BIGINT) AS c1,
         CAST(sum(b) AS BIGINT) AS c2,
         CAST(sum(c) AS BIGINT) AS c3,
         CAST(sum(a + b + c) AS BIGINT) AS t,
         CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS r2
  FROM r
)
SELECT c1, c2, c3,
       floor((3 * 2 * ((c1 - t * 1.0 / 3) * (c1 - t * 1.0 / 3)
                       + (c2 - t * 1.0 / 3) * (c2 - t * 1.0 / 3)
                       + (c3 - t * 1.0 / 3) * (c3 - t * 1.0 / 3))
              / (3 * t - r2)) * 1e6) / 1e6 AS cochran_q
FROM m
"""


REGISTRY.update({'cochran_q_docs': (q_cochran_q_docs, SQL_COCHRAN_Q_DOCS)})


# ----------------------------------------- FIM transform (code corpora)


FIM_SEED = 23
FIM_MIN_LEN = 9
_FIM_PRE, _FIM_SUF, _FIM_MID = "<PRE>", "<SUF>", "<MID>"


def q_fim_transform_docs(sf_dir: str):
    """Fill-in-the-middle transform — the code-corpus training
    preparation (Bavarian et al. 2022 style): each document is split
    at two DETERMINISTIC cut points (c1 = rank(doc_id) mod (L//3+1),
    middle length L//3) and re-emitted as
    ``<PRE>prefix<SUF>suffix<MID>middle`` so an autoregressive model
    learns infilling. Docs shorter than FIM_MIN_LEN pass through
    unchanged. Zero shuffle; the per-batch rewrite is a pure numpy
    GATHER — output byte positions are mapped to input byte positions
    with cumsum/arange arithmetic (no per-row Python slicing), then
    one Arrow StringArray is built over the gathered buffer. The cut
    rank is the key_rank64 splitmix chain, which the DuckDB oracle
    reproduces bit-for-bit (UHUGEINT mod-2^64 CTEs), making a
    seeded random-looking transform value-hash-checkable."""
    from ..functions.hashing import key_rank64

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    pre_b = _FIM_PRE.encode()
    suf_b = _FIM_SUF.encode()
    mid_b = _FIM_MID.encode()
    sw = len(pre_b)

    def fim(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "fim_text": pa.array([], pa.string()),
                }
            )
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = b["text"].combine_chunks()
        # zero-copy views of the UTF-8 value buffer + offsets
        # (synth docs are ASCII, so byte == character positions; the
        # SQL twin's substr() agrees)
        arr = txt.buffers()
        offs = np.frombuffer(arr[1], dtype=np.int32)[
            txt.offset : txt.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(arr[2], dtype=np.uint8)
        starts = offs[:-1]
        L = np.diff(offs)
        # the gather below cuts at BYTE positions and the SQL twin's
        # substr() cuts at CHARACTER positions — assert they coincide
        # (pure-ASCII batch) so a non-ASCII corpus fails loudly here
        # instead of emitting invalid UTF-8 / silently diverging
        nchars = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        if not np.array_equal(nchars, L):
            bad = int(np.flatnonzero(nchars != L)[0])
            raise ValueError(
                "fim_transform assumes single-byte (ASCII) text; "
                f"doc_id={int(ids[bad])} has {int(L[bad])} bytes but "
                f"{int(nchars[bad])} characters — byte cuts would split "
                "codepoints. Use a character-indexed variant for "
                "non-ASCII corpora."
            )
        x = key_rank64(ids, seed=FIM_SEED)
        third = L // 3
        do = L >= FIM_MIN_LEN
        c1 = np.where(
            do, (x % (third + 1).astype(np.uint64)).astype(np.int64), 0
        )
        c2 = np.where(do, c1 + third, 0)
        # output segment lengths per row: transformed docs carry the
        # three 5-byte sentinels, passthrough docs are verbatim
        a_len = np.where(do, c1, L)  # prefix (or whole doc)
        c_len = np.where(do, L - c2, 0)  # suffix
        b_len = np.where(do, c2 - c1, 0)  # middle
        sent = np.where(do, 3 * sw, 0)
        out_len = a_len + b_len + c_len + sent
        out_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(out_len, out=out_offs[1:])
        total = int(out_offs[-1])
        out = np.empty(total, dtype=np.uint8)

        def fill_segment(dst_start, src_start, seg_len):
            """Vectorized multi-row copy: one gather over the input
            buffer driven by repeat/arange index arithmetic."""
            m = seg_len > 0
            if not m.any():
                return
            d0, s0, ln = dst_start[m], src_start[m], seg_len[m]
            tot = int(ln.sum())
            # position within each segment: arange(tot) - repeat(bases)
            base = np.repeat(np.cumsum(ln) - ln, ln)
            k = np.arange(tot, dtype=np.int64) - base
            out[np.repeat(d0, ln) + k] = data[np.repeat(s0, ln) + k]

        def fill_sentinel(dst_start, token, mask):
            m = mask
            if not m.any():
                return
            d0 = dst_start[m]
            tok = np.frombuffer(token, dtype=np.uint8)
            idx = (d0[:, None] + np.arange(sw)).reshape(-1)
            out[idx] = np.tile(tok, len(d0))

        o = out_offs[:-1]
        fill_sentinel(o, pre_b, do)
        a_dst = o + np.where(do, sw, 0)
        fill_segment(a_dst, starts, a_len)
        fill_sentinel(a_dst + a_len, suf_b, do)
        c_dst = a_dst + a_len + np.where(do, sw, 0)
        fill_segment(c_dst, starts + c2, c_len)
        fill_sentinel(c_dst + c_len, mid_b, do)
        fill_segment(
            c_dst + c_len + np.where(do, sw, 0), starts + c1, b_len
        )
        fim_arr = pa.Array.from_buffers(
            pa.large_string(),
            n,
            [
                None,
                pa.py_buffer(
                    np.concatenate([[0], np.cumsum(out_len)]).astype(
                        "<i8"
                    ).tobytes()
                ),
                pa.py_buffer(out.tobytes()),
            ],
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "fim_text": pc.cast(fim_arr, pa.string()),
            }
        )

    return ds.map_batches(fim, batch_format="pyarrow")


def _fim_sql() -> str:
    from __ray_entry__ import _key_rank_sql  # lazy: avoids cycle

    return f"""
WITH {_key_rank_sql('documents', 'doc_id', 'doc_id, text', FIM_SEED)}
SELECT doc_id,
  CASE WHEN length(text) < {FIM_MIN_LEN} THEN text
  ELSE '{_FIM_PRE}' || substr(text, 1, c1)
    || '{_FIM_SUF}' || substr(text, c2 + 1)
    || '{_FIM_MID}' || substr(text, c1 + 1, c2 - c1)
  END AS fim_text
FROM (
  SELECT doc_id, text,
         CAST(x % CAST(length(text) // 3 + 1 AS UBIGINT) AS BIGINT)
           AS c1,
         CAST(x % CAST(length(text) // 3 + 1 AS UBIGINT) AS BIGINT)
           + length(text) // 3 AS c2
  FROM r)
"""


REGISTRY.update({'fim_transform_docs': (q_fim_transform_docs, _fim_sql())})


# ------------------------------------- token-budget mixture selection


TOKEN_BUDGET_PER_LANG = 1_500
_TB_BUCKET_BITS = 12  # 4096 rank-range buckets


def q_token_budget_docs(sf_dir: str):
    """Token-budget corpus selection: per language, walk documents in
    deterministic key_rank64 order and KEEP each doc whose exclusive
    token prefix-sum is still under the budget — the 'sample a fixed
    token allocation per domain' step of training-data mixture
    recipes. A distributed ORDERED PREFIX SUM (the pack.py scan
    pattern): buckets are the TOP bits of the rank (order-preserving
    ranges), per-(lang, bucket) totals stream to the driver for the
    exclusive scan (<= langs x 4096 tiny rows), bases broadcast back
    as sorted numpy arrays, and one coarse bucket exchange finishes
    the within-bucket cumsum vectorized. Oracle: SQL window SUM over
    the same splitmix rank order."""
    import ray

    from ..functions.hashing import key_rank64

    shift = np.uint64(64 - _TB_BUCKET_BITS)
    ds = _pq(sf_dir, "documents", ["doc_id", "lang", "text"])

    def counts(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rank = key_rank64(ids, seed=0)
        tok = pc.cast(
            pc.add(pc.count_substring(b["text"], " "), 1), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": b["lang"],
                "rank": pa.array(rank),  # uint64, order == SQL UBIGINT
                "n_tokens": pa.array(tok, pa.int64()),
                "bucket": pa.array(
                    (rank >> shift).astype(np.int64)
                ),
            }
        )

    toks = ds.map_batches(counts, batch_format="pyarrow").materialize()

    def partials(b: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame(
                {
                    "lang": b["lang"].to_numpy(zero_copy_only=False),
                    "bucket": b["bucket"].to_numpy(zero_copy_only=False),
                    "n": b["n_tokens"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["lang", "bucket"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    # driver exclusive scan per lang over bucket order (tiny fold)
    agg = (
        pd.concat(
            [
                t.to_pandas()
                for t in toks.map_batches(
                    partials, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow")
            ],
            ignore_index=True,
        )
        .groupby(["lang", "bucket"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    langs = sorted(agg["lang"].unique())
    lang_id = {l: i for i, l in enumerate(langs)}
    agg["key"] = (
        agg["lang"].map(lang_id).to_numpy(np.int64)
        << _TB_BUCKET_BITS
    ) | agg["bucket"].to_numpy(np.int64)
    agg = agg.sort_values("key", kind="mergesort")
    base = agg.groupby(agg["lang"].to_numpy(), sort=True)["n"].cumsum() - agg["n"]
    keys = agg["key"].to_numpy(np.int64)
    bases = base.to_numpy(np.int64)
    ref = ray.put((keys, bases, tuple(langs)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        keys_a, bases_a, langs_t = ray.get(ref)
        lid = {l: i for i, l in enumerate(langs_t)}
        g = g.sort_values(
            ["lang", "rank", "doc_id"], kind="mergesort"
        ).reset_index(drop=True)
        n = g["n_tokens"].to_numpy(np.int64)
        lang_codes = g["lang"].map(lid).to_numpy(np.int64)
        # within-(lang,bucket) exclusive cumsum, segmented on lang
        # (one bucket group holds ONE bucket's rows across langs)
        cs = np.cumsum(n) - n
        seg_start = np.r_[True, lang_codes[1:] != lang_codes[:-1]]
        offsets = np.where(seg_start, cs, 0)
        cs = cs - np.maximum.accumulate(offsets)
        k = (lang_codes << _TB_BUCKET_BITS) | g["bucket"].to_numpy(
            np.int64
        )
        pos = np.searchsorted(keys_a, k)
        pre = bases_a[pos] + cs
        keep = pre < TOKEN_BUDGET_PER_LANG
        return g.loc[keep, ["doc_id", "lang", "n_tokens"]]

    return (
        toks.groupby("bucket")
        .map_groups(finish, batch_format="pandas")
        .sort("doc_id")
    )


def _token_budget_sql() -> str:
    from __ray_entry__ import _key_rank_sql  # lazy: avoids cycle

    return f"""
WITH {_key_rank_sql('documents', 'doc_id', 'doc_id, lang, text', 0)}
SELECT doc_id, lang, n_tokens FROM (
  SELECT doc_id, lang, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY x, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS pre
  FROM (SELECT doc_id, lang, x,
               CAST(len(string_split(text, ' ')) AS BIGINT)
                 AS n_tokens
        FROM r))
WHERE pre < {TOKEN_BUDGET_PER_LANG}
ORDER BY doc_id
"""


REGISTRY.update({'token_budget_docs': (q_token_budget_docs, _token_budget_sql())})
