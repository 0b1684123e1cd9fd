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
