"""Corpus sources.

``read_corpus`` reads the (repo, path, commit, lang, content[,sha])
parquet table with column pruning; ``corpus_from_documents`` adapts the
driver's ``documents`` oracle table (doc_id, text, lang, source,
n_chars) into the corpus shape so generic pipelines can run over it.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data as rd

from ..schema import CORPUS_SCHEMA

_CORPUS_COLS = [f.name for f in CORPUS_SCHEMA] + ["content_sha256"]


def read_corpus(path: str, with_sha: bool = True):
    """Read a corpus parquet directory/file, pruning to corpus columns."""
    import pyarrow.parquet as pq

    # prune to the columns that actually exist in the file
    first = path if path.endswith(".parquet") else None
    cols = list(_CORPUS_COLS if with_sha else _CORPUS_COLS[:-1])
    if first:
        have = set(pq.read_schema(first).names)
        cols = [c for c in cols if c in have]
    return rd.read_parquet(path, columns=cols)


def corpus_from_documents_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, source, ...) -> corpus shape."""
    import pyarrow.compute as pc

    n = batch.num_rows
    doc_id_str = pc.cast(batch["doc_id"], pa.string())
    repo = pc.binary_join_element_wise(
        pa.array(["docs"] * n, pa.string()), batch["source"], "/"
    )
    path = pc.binary_join_element_wise(
        pa.array(["doc"] * n, pa.string()), doc_id_str, "_"
    )
    path = pc.binary_join_element_wise(
        path, pa.array(["txt"] * n, pa.string()), "."
    )
    commits = pa.array(
        [
            hashlib.sha1(s.encode()).hexdigest()
            for s in doc_id_str.to_pylist()
        ],
        pa.string(),
    )
    return pa.table(
        {
            "repo": repo,
            "path": path,
            "commit": commits,
            "lang": batch["lang"],
            "content": batch["text"],
        }
    )


def corpus_from_documents(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    return ds.map_batches(corpus_from_documents_batch, batch_format="pyarrow")


def read_corpus_jsonl(path: str, with_sha: bool = True):
    """Read a JSONL corpus (one document object per line — the
    interchange format crawled corpora actually arrive in) into the
    corpus shape. Ray's ``read_json`` splits files into parallel read
    tasks, so a directory of .jsonl(.gz) shards streams exactly like
    parquet; columns outside the corpus schema are pruned immediately
    after parse (JSON can't project at the read the way parquet can —
    prefer parquet once the data is under your control)."""
    import ray.data as rd

    cols = list(_CORPUS_COLS if with_sha else _CORPUS_COLS[:-1])

    def prune(b: pa.Table) -> pa.Table:
        have = [c for c in cols if c in b.column_names]
        return b.select(have)

    return rd.read_json(path).map_batches(prune, batch_format="pyarrow")


def write_corpus_jsonl(ds, out_dir: str):
    """Inverse of :func:`read_corpus_jsonl` (Dataset.write_json — one
    shard per block, resumable at the directory level)."""
    ds.write_json(out_dir)
    return out_dir
