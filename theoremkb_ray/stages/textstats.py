"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting (SURVEY.md training-data additions;
the reference's closest analogs are the String-level case/affix
features, Styling/tools/notebooks/Training_word_based.ipynb cells 5-6,
and the pattern vocabulary, Styling/src/lib/misc/embeddings.py:9-20).

All stages are single-pass ``map_batches`` with numpy / pyarrow
kernels; the language profiles and regexes live in actor ``__init__``.
"""

from __future__ import annotations

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings, rolling_fingerprint

# Tiny stopword profiles per language (public-knowledge word lists).
_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "que", "en"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "人", "这", "他"),
}


class LangId:
    """Heuristic language-ID: stopword-hit scoring + CJK codepoint
    ratio. Fully vectorized — CJK counting is one RE2 pass
    (``count_substring_regex``), stopword membership is one Arrow
    ``is_in`` per profile over the flattened word values, and per-doc
    hit totals are ``np.bincount`` over the word→doc index (no
    ``reduceat``: empty docs are naturally zero-filled). Word
    semantics match CPython ``text.lower().split()[:200]``: split on
    runs of whitespace, drop empties, cap at 200 words per doc.
    Profiles built once per actor."""

    _LANGS = ("en", "fr", "es", "de")  # priority order on hit ties
    _CAP = 200

    def __init__(self) -> None:
        self.profiles = [
            pa.array(sorted(_STOPWORDS[lang]), pa.string())
            for lang in self._LANGS
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)

        # --- CJK shortcut: codepoint count in [U+4E00, U+9FFF] over
        # the first 400 codepoints, vs 20% of min(len, 400)
        head = pc.utf8_slice_codeunits(text, 0, 400)
        cjk = pc.count_substring_regex(head, "[一-鿿]").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        tlen = np.minimum(
            pc.utf8_length(text).to_numpy(zero_copy_only=False), 400
        )
        is_zh = cjk > 0.2 * tlen

        # --- stopword scoring over flattened words
        # utf8_split_whitespace = Unicode whitespace, like CPython
        # str.split() (an RE2 \s+ split misses \v and U+00A0 etc.)
        words = pc.utf8_split_whitespace(pc.utf8_lower(text))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]  # slice-offset normalization
        vals = words.values
        nonempty = (
            pc.utf8_length(vals).to_numpy(zero_copy_only=False) > 0
        )
        # Per-doc word cap WITHOUT a word->doc scatter: cm is the
        # running nonempty-word count, so doc d's capped window is
        # [offs[d], cut[d]) where cut is the first index past
        # base[d]+CAP nonempty words (docs are contiguous in the flat
        # layout). Hits then fall out of prefix-sum differences — no
        # np.repeat / bincount over the word axis.
        cm = np.cumsum(nonempty)
        pad = np.r_[0, cm]
        base = pad[offs[:-1]]  # nonempty words before each doc
        cut = np.minimum(
            np.searchsorted(cm, base + self._CAP, side="right"), offs[1:]
        )
        wcount = np.minimum(pad[offs[1:]] - base, self._CAP)

        hits = np.zeros((len(self._LANGS), n), dtype=np.int64)
        for li, prof in enumerate(self.profiles):
            inprof = pc.is_in(vals, value_set=prof).to_numpy(
                zero_copy_only=False
            )
            ps = np.r_[0, np.cumsum(nonempty & inprof)]
            hits[li] = ps[cut] - ps[offs[:-1]]
        best = hits.argmax(axis=0)  # first max wins = priority order
        best_hits = hits[best, np.arange(n)]
        out = np.array(self._LANGS, dtype=object)[best]
        out[best_hits == 0] = "und"
        conf = best_hits / np.maximum(wcount, 1)
        out[is_zh] = "zh"
        conf[is_zh] = np.minimum(1.0, cjk[is_zh] / 50.0)
        return batch.append_column(
            "lang_pred", pa.array(out, pa.string())
        ).append_column("lang_conf", pa.array(conf, pa.float64()))


def langid(ds, concurrency=(1, 4), batch_size: int = 2048):
    return ds.map_batches(
        LangId,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality heuristics, fully vectorized with Arrow kernels:
    n_chars, n_words, mean word length, alpha ratio, digit ratio,
    upper ratio, and a composite [0,1] quality score."""
    t = batch["text"]
    n_chars = pc.utf8_length(t)
    n_words = pc.add(pc.count_substring(t, " "), 1)
    n_alpha = pc.utf8_length(pc.replace_substring_regex(t, r"[^A-Za-z]", ""))
    n_digit = pc.utf8_length(pc.replace_substring_regex(t, r"[^0-9]", ""))
    n_upper = pc.utf8_length(pc.replace_substring_regex(t, r"[^A-Z]", ""))
    nc = pc.max_element_wise(n_chars, 1)
    alpha_ratio = pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(nc, pa.float64()))
    digit_ratio = pc.divide(pc.cast(n_digit, pa.float64()), pc.cast(nc, pa.float64()))
    upper_ratio = pc.divide(pc.cast(n_upper, pa.float64()), pc.cast(nc, pa.float64()))
    mean_wlen = pc.divide(
        pc.cast(n_chars, pa.float64()), pc.cast(n_words, pa.float64())
    )
    # composite score: long-enough, mostly alphabetic, few digits
    nw = n_words.to_numpy(zero_copy_only=False).astype(float)
    ar = alpha_ratio.to_numpy(zero_copy_only=False)
    dr = digit_ratio.to_numpy(zero_copy_only=False)
    score = (
        np.clip(nw / 50.0, 0, 1) * 0.4 + ar * 0.5 + (1.0 - np.minimum(dr * 5, 1)) * 0.1
    )
    return (
        batch.append_column("n_words", pc.cast(n_words, pa.int64()))
        .append_column("mean_word_len", mean_wlen)
        .append_column("alpha_ratio", alpha_ratio)
        .append_column("digit_ratio", digit_ratio)
        .append_column("upper_ratio", upper_ratio)
        .append_column("quality_score", pa.array(score, pa.float64()))
    )


def quality(ds, batch_size: int = 4096):
    return ds.map_batches(
        quality_batch, batch_format="pyarrow", batch_size=batch_size
    )


class TokenCounter:
    """Token counting: whitespace tokens + a BPE-ish subword regex
    count (compiled once per actor). The regex splits words, numbers,
    punctuation runs and contractions — a public GPT-2-style pretoken
    pattern."""

    def __init__(self) -> None:
        import regex

        self.pat = regex.compile(
            r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws = pc.add(pc.count_substring(batch["text"], " "), 1)
        texts = batch["text"].to_numpy(zero_copy_only=False)
        sub = np.fromiter(
            (len(self.pat.findall(t)) for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        return batch.append_column(
            "n_ws_tokens", pc.cast(ws, pa.int64())
        ).append_column("n_subword_tokens", pa.array(sub, pa.int64()))


def token_counts(ds, concurrency=(1, 4), batch_size: int = 2048):
    return ds.map_batches(
        TokenCounter,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def fingerprint_batch(
    batch: pa.Table, window: int = 8, keep_mod: int = 16
) -> pa.Table:
    """Winnowing-style rolling-hash fingerprint per document: a sorted
    uint64 list column + a single combined 64-bit digest."""
    texts = batch["text"].to_numpy(zero_copy_only=False)
    fps, digest = [], np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = t.split()
        th = hash_strings(toks) if toks else np.empty(0, np.uint64)
        fp = rolling_fingerprint(th, window=window, keep_mod=keep_mod)
        fps.append(fp.tolist())
        with np.errstate(over="ignore"):
            digest[i] = (
                np.bitwise_xor.reduce(fp) if len(fp) else np.uint64(0)
            )
    return batch.append_column(
        "fingerprint", pa.array(fps, pa.list_(pa.uint64()))
    ).append_column("fingerprint64", pa.array(digest))


def fingerprints(ds, batch_size: int = 2048):
    return ds.map_batches(
        fingerprint_batch, batch_format="pyarrow", batch_size=batch_size
    )


def vocabulary_topk(ds, col: str = "text", k: int = 100):
    """Corpus-wide token counts -> top-k (the reference's vocabulary
    builder, Styling/src/lib/misc/embeddings.py:9-20), done the
    scale-correct way: PARTIAL counts inside map_batches (one row per
    token per batch), then a small groupby-sum, then sort+limit."""
    from ray.data.aggregate import Sum

    def partial_counts(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(b[col], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        arr = toks.to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(arr, return_counts=True)
        return pa.table(
            {
                "token": pa.array(uniq, pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial_counts, batch_format="pyarrow", batch_size=4096)
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="count"))
        .sort(["count", "token"], descending=[True, False])
        .limit(k)
    )


def token_entropy(ds, text_col: str = "text", batch_size: int = 4096):
    """Per-document Shannon entropy of the token distribution:
    ``H = -sum_t (c_t/n) ln(c_t/n)`` over the doc's token types, plus
    the type count. A quality/diversity signal (low entropy = heavy
    repetition — the Gopher "repetition" family's information-theoretic
    cousin). Zero-token docs emit no row (matches the SQL twin).

    Scale shape: a document is one row, so the whole computation is a
    single shuffle-free ``map_batches`` pass — per-batch token hashing,
    one lexsort for (doc, type) run-lengths, ``np.bincount`` folds.
    """
    from ..functions.hashing import flat_token_hashes_arrow

    def per_batch(b: pa.Table) -> pa.Table:
        flat, starts = flat_token_hashes_arrow(b[text_col])
        n_docs = len(starts) - 1
        lengths = np.diff(starts)
        d = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
        order = np.lexsort((flat, d))
        kd, kh = d[order], flat[order]
        new = np.ones(len(kd), bool)
        new[1:] = (kd[1:] != kd[:-1]) | (kh[1:] != kh[:-1])
        type_starts = np.nonzero(new)[0]
        cnt = np.diff(np.append(type_starts, len(kd))).astype(np.float64)
        tdoc = kd[type_starts]
        p = cnt / lengths[tdoc]
        ent = np.zeros(n_docs, np.float64)
        np.subtract.at(ent, tdoc, p * np.log(p))
        n_types = np.bincount(tdoc, minlength=n_docs)
        keep = lengths > 0
        return pa.table(
            {
                "doc_id": b["doc_id"].filter(pa.array(keep)),
                "n_tokens": pa.array(lengths[keep], pa.int64()),
                "n_types": pa.array(n_types[keep], pa.int64()),
                "entropy": pa.array(ent[keep], pa.float64()),
            }
        )

    return ds.map_batches(
        per_batch, batch_format="pyarrow", batch_size=batch_size
    )


def doc_keywords(ds, text_col: str = "text", k: int = 3):
    """Top-``k`` tokens per document by tf-idf
    (``tf * ln(N / df)``, ties broken by token ascending) — the
    classic per-doc keyword extractor.

    Scale shape: ONE vocabulary-sized exchange builds the df table
    (per-batch distinct-(doc,token) partials; a sentinel ''-token row
    carries the batch's doc count so N needs no second pass), the df
    table broadcasts once as a sorted uint64-hash array, and scoring +
    per-doc top-k are shuffle-free per-batch numpy (a doc is one row,
    so tf is batch-local)."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.hashing import (
        flat_token_hashes_arrow,
        flat_tokens_arrow,
        hash_strings,
    )

    def df_partial(b: pa.Table) -> pa.Table:
        flat, starts = flat_token_hashes_arrow(b[text_col])
        n_docs = len(starts) - 1
        d = np.repeat(
            np.arange(n_docs, dtype=np.int64), np.diff(starts)
        )
        # distinct (doc, token-hash) pairs -> per-token doc counts
        pairs = np.unique(np.stack([d, flat.view(np.int64)], axis=1), axis=0)
        u, c = np.unique(pairs[:, 1], return_counts=True)
        return pa.table(
            {
                "h": pa.array(np.append(u, np.int64(0))),
                "df": pa.array(
                    np.append(c.astype(np.int64), np.int64(n_docs))
                ),
                "is_n": pa.array(
                    np.append(np.zeros(len(u), bool), [True])
                ),
            }
        )

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby(["h", "is_n"])
        .aggregate(Sum("df", alias_name="df"))
    )
    hs, dfs, n_total = [], [], 0
    for b in df_tbl.iter_batches(batch_format="pyarrow"):
        isn = b["is_n"].to_numpy(zero_copy_only=False)
        h = b["h"].to_numpy(zero_copy_only=False)
        df = b["df"].to_numpy(zero_copy_only=False)
        n_total += int(df[isn].sum())
        hs.append(h[~isn])
        dfs.append(df[~isn])
    h = (
        np.concatenate(hs).view(np.uint64)
        if hs
        else np.empty(0, np.uint64)
    )
    df = (
        np.concatenate(dfs).astype(np.float64)
        if dfs
        else np.empty(0, np.float64)
    )
    o = np.argsort(h)
    ref = ray.put((h[o], df[o], float(n_total)))

    class ScoreKeywords:
        def __init__(self, model_ref) -> None:
            from ..state.broadcast import get_broadcast

            self.h, self.df, self.n = get_broadcast(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            flat, starts = flat_tokens_arrow(b[text_col])
            toks = flat.to_numpy(zero_copy_only=False)
            fh = (
                hash_strings(toks)
                if len(toks)
                else np.empty(0, np.uint64)
            )
            n_docs = len(starts) - 1
            d = np.repeat(
                np.arange(n_docs, dtype=np.int64), np.diff(starts)
            )
            # per-(doc, token) tf via lexsort run-lengths on hashes
            order = np.lexsort((fh, d))
            kd, kh, kt = d[order], fh[order], toks[order]
            new = np.ones(len(kd), bool)
            new[1:] = (kd[1:] != kd[:-1]) | (kh[1:] != kh[:-1])
            ts = np.nonzero(new)[0]
            tf = np.diff(np.append(ts, len(kd))).astype(np.float64)
            tdoc, ttok, thash = kd[ts], kt[ts], kh[ts]
            idx = np.searchsorted(self.h, thash)
            if len(self.h):
                idx[idx >= len(self.h)] = len(self.h) - 1
                dfv = self.df[idx]
            else:
                dfv = np.ones(len(thash))
            tfidf = tf * np.log(self.n / dfv)
            # rank within doc: tfidf desc, token asc
            o2 = np.lexsort((ttok, -tfidf, tdoc))
            sd = tdoc[o2]
            first = np.ones(len(sd), bool)
            first[1:] = sd[1:] != sd[:-1]
            pos = np.arange(len(sd)) - np.maximum.accumulate(
                np.where(first, np.arange(len(sd)), -1)
            )
            keep = o2[pos < k]
            keep.sort()
            ids = b["doc_id"].take(pa.array(tdoc[keep], pa.int64()))
            return pa.table(
                {
                    "doc_id": ids,
                    "token": pa.array(ttok[keep], pa.string()),
                    "tf": pa.array(tf[keep].astype(np.int64), pa.int64()),
                    "tfidf": pa.array(tfidf[keep], pa.float64()),
                }
            )

    return ds.map_batches(
        ScoreKeywords,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
    )


def ranked_vocab_ref(ds, text_col: str = "text"):
    """Broadcast handle for the lexicographically-sorted corpus
    vocabulary (one string Array in plasma). A token's 0-based position
    in it is the tokenizer-style integer ID the SQL-exact operators
    (:func:`winnow_fingerprints_ranked`, :func:`simhash_ranked`) hash —
    DuckDB re-derives the same ID with ``dense_rank() - 1``.

    Scale shape: per-batch distinct partials -> ONE vocabulary-sized
    groupby; the collected vocabulary is tokenizer-bounded (BPE-sized),
    so the sorted broadcast is small even on a 100 TB corpus."""
    import ray
    from ray.data.aggregate import Count

    from ..functions.hashing import flat_tokens_arrow

    def vocab_partial(b: pa.Table) -> pa.Table:
        flat, _ = flat_tokens_arrow(b[text_col])
        u = np.unique(flat.to_numpy(zero_copy_only=False))
        return pa.table({"token": pa.array(u, pa.string())})

    vocab_ds = (
        ds.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="n"))
    )
    toks = []
    for b in vocab_ds.iter_batches(batch_format="pyarrow"):
        toks.append(b["token"].to_numpy(zero_copy_only=False))
    vocab = np.sort(np.concatenate(toks)) if toks else np.empty(0, object)
    return ray.put(pa.array(vocab, pa.string()))


def simhash_ranked(ds, text_col: str = "text"):
    """SQL-exact 64-bit SimHash per document: token IDs are corpus
    vocabulary ranks (``ranked_vocab_ref``), each occurrence hashed
    with one splitmix64 round, and bit ``m`` of the sketch is set iff
    a strict majority of the doc's token-hash bits ``m`` are set
    (``simhash64_flat``'s ``2*ones > n`` rule). Every step is
    reproducible in DuckDB (UHUGEINT splitmix chain + per-bit sums),
    so the sketch itself is value-hash-oracle-able — the twin of the
    production siphash :func:`~theoremkb_ray.stages.dedup.simhash_dedup`
    whose numbers a SQL oracle CAN check. Empty docs emit no row.

    Scale shape: one vocabulary exchange + broadcast, then a
    shuffle-free per-batch pass (bit-plane streaming kernel)."""
    from ..functions.hashing import (
        flat_tokens_arrow,
        simhash64_flat,
        splitmix64,
    )

    vocab_ref = ranked_vocab_ref(ds, text_col)

    class Sketch:
        def __init__(self, ref) -> None:
            from ..state.broadcast import get_broadcast

            self.vocab = get_broadcast(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            flat, starts = flat_tokens_arrow(b[text_col])
            ids = (
                pc.index_in(flat, value_set=self.vocab)
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            sh = simhash64_flat(splitmix64(ids), starts)
            keep = np.diff(starts) > 0
            return pa.table(
                {
                    "doc_id": b["doc_id"].filter(pa.array(keep)),
                    "simhash": pa.array(sh[keep], pa.uint64()),
                }
            )

    return ds.map_batches(
        Sketch,
        fn_constructor_args=(vocab_ref,),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
    )


def winnow_fingerprints_ranked(
    ds, text_col: str = "text", window: int = 8, keep_mod: int = 16
):
    """SQL-exact winnowing fingerprint: token IDs are each token's
    rank in the lexicographically-sorted corpus vocabulary (a
    tokenizer-style integer ID a SQL oracle can re-derive with
    ``dense_rank``), window hashes are the FNV-1a-style fold
    ``acc = acc*0x100000001B3 + id (mod 2^64)`` finished with
    splitmix64 (both reproducible in DuckDB via UHUGEINT arithmetic —
    ``_splitmix_round_ctes`` in ``__ray_entry__.py``), and a document
    keeps the windows ``≡ 0 (mod keep_mod)`` (or its minimum window
    hash when none qualify — the degenerate-doc rule of
    :func:`rolling_fingerprint`). Emits one ``(doc_id, fp)`` row per
    distinct kept hash.

    The sibling of :func:`fingerprints` whose digests are
    value-hash-oracle-able; the siphash variant stays the production
    default (no vocabulary pass needed). Scale assumption: the
    vocabulary is tokenizer-bounded (BPE-sized), so the sorted-ID
    broadcast is small; docs are rows, so windowing is shuffle-free.
    """
    from ..functions.hashing import (
        flat_tokens_arrow,
        shingle_hashes_flat,
    )

    vocab_ref = ranked_vocab_ref(ds, text_col)

    class Winnow:
        def __init__(self, ref) -> None:
            from ..state.broadcast import get_broadcast

            self.vocab = get_broadcast(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            flat, starts = flat_tokens_arrow(b[text_col])
            ids = (
                pc.index_in(flat, value_set=self.vocab)
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            wh, wdoc = shingle_hashes_flat(ids, starts, k=window)
            if len(wh) == 0:
                return pa.table(
                    {
                        "doc_id": b["doc_id"].slice(0, 0),
                        "fp": pa.array([], pa.uint64()),
                    }
                )
            keep = wh % np.uint64(keep_mod) == 0
            # degenerate docs (no window ≡ 0): keep the min window hash
            n_docs = len(starts) - 1
            has = np.zeros(n_docs, bool)
            has[wdoc[keep]] = True
            mins = np.full(n_docs, np.iinfo(np.uint64).max, np.uint64)
            np.minimum.at(mins, wdoc, wh)
            fb_docs = np.nonzero(
                ~has & (np.bincount(wdoc, minlength=n_docs) > 0)
            )[0]
            out_d = np.concatenate([wdoc[keep], fb_docs])
            out_h = np.concatenate([wh[keep], mins[fb_docs]])
            # distinct (doc, fp)
            uniq = np.unique(
                np.stack([out_d, out_h.view(np.int64)], axis=1), axis=0
            )
            ids_out = b["doc_id"].take(pa.array(uniq[:, 0], pa.int64()))
            return pa.table(
                {
                    "doc_id": ids_out,
                    "fp": pa.array(
                        uniq[:, 1].view(np.uint64), pa.uint64()
                    ),
                }
            )

    return ds.map_batches(
        Winnow,
        fn_constructor_args=(vocab_ref,),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 8),
    )
