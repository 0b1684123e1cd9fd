"""Distributed BPE tokenizer training + encoding.

The missing tokenizer leg of the training-data pipeline (reference
analog: the reference tokenizes pdfalto output into word tokens,
`Styling/src/lib/paper/__init__.py` get_xml/ALTO parsing; this stage
is the LLM-era counterpart — learn a subword vocabulary from the
corpus, then encode it).

Plan shape (the one that holds at 100 TB):
- **Word-frequency histogram is distributed**: per-batch whitespace
  split -> in-batch unique counts -> ONE grouped exchange keyed by
  word. The exchange carries the VOCABULARY (bounded, Zipf-capped),
  never corpus rows.
- **Merge training is driver-side over the bounded histogram** — the
  classic Sennrich et al. 2016 algorithm operates on the word-freq
  dictionary, not the corpus, so after frequency pruning its input is
  O(vocab), independent of corpus size. Ties break (count DESC, pair
  lexicographic ASC) so training is deterministic under any input
  partitioning.
- **Encoding is an actor pool**: merge ranks load once per actor
  (``__init__``), each batch encodes its UNIQUE words once (per-batch
  memo + a persistent per-actor cache — natural text re-uses words,
  so the amortized cost per row is a dict hit, not a merge loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

EOW = ""  # end-of-word sentinel symbol (never appears in text)


def word_freqs(
    ds,
    text_col: str = "text",
    max_words: int = 50_000,
    lowercase: bool = True,
):
    """Distributed word-frequency histogram, capped to the
    ``max_words`` most frequent words (count DESC, word ASC ties).
    Returns a pandas DataFrame (word, freq) — bounded by the cap."""

    def partial(b: pa.Table) -> pa.Table:
        s = b[text_col]
        if lowercase:
            s = pc.utf8_lower(s)
        toks = pc.list_flatten(pc.utf8_split_whitespace(s))
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        keep = np.array([len(w) > 0 for w in u], bool)
        return pa.table(
            {
                "word": pa.array(u[keep], pa.string()),
                "freq": pa.array(c[keep].astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
    )
    # top-max_words: distributed sort + limit keeps the driver pull
    # bounded even when the raw vocabulary is huge
    top = agg.sort(["freq", "word"], descending=[True, False]).limit(
        max_words
    )
    return top.to_pandas()


def train_bpe(
    word_freq: pd.DataFrame, num_merges: int = 200
) -> list[tuple[str, str]]:
    """Classic BPE merge training over a (word, freq) histogram.

    Deterministic: the next merge is the adjacent symbol pair with the
    highest total frequency, ties broken lexicographically. Returns
    the ordered merge list."""
    words: list[list[str]] = [
        list(w) + [EOW] for w in word_freq["word"].tolist()
    ]
    freqs = word_freq["freq"].to_numpy(np.int64)

    # pair -> total count, and pair -> set of word indexes containing it
    from collections import defaultdict

    pair_count: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        f = int(freqs[i])
        for a, b in zip(syms, syms[1:]):
            pair_count[(a, b)] += f
            pair_words[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_count:
            break
        best = min(
            pair_count.items(), key=lambda kv: (-kv[1], kv[0])
        )
        (a, b), cnt = best
        if cnt <= 0:
            break
        merges.append((a, b))
        ab = a + b
        for i in list(pair_words[(a, b)]):
            syms = words[i]
            f = int(freqs[i])
            j = 0
            out: list[str] = []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    # bookkeeping: neighbours change identity
                    if out:
                        pair_count[(out[-1], a)] -= f
                        pair_count[(out[-1], ab)] += f
                        pair_words[(out[-1], ab)].add(i)
                    if j + 2 < len(syms):
                        nxt = syms[j + 2]
                        # the (b, nxt) pair is consumed; its
                        # replacement (ab, nxt) is counted when the
                        # loop emits ab and reaches nxt — unless nxt
                        # is another 'a' starting a merge, handled on
                        # the next iteration
                        pair_count[(b, nxt)] -= f
                        pair_count[(ab, nxt)] += f
                        pair_words[(ab, nxt)].add(i)
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
        del pair_count[(a, b)]
        del pair_words[(a, b)]
        # prune dead entries lazily; negative/zero counts can linger
        # for pairs no longer present — drop them so `best` never
        # selects one
        for k in [k for k, v in pair_count.items() if v <= 0]:
            pair_count.pop(k, None)
            pair_words.pop(k, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word (greedy lowest-rank-first, the
    standard BPE encode)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        pairs = list(zip(syms, syms[1:]))
        ranked = [
            (ranks[p], i) for i, p in enumerate(pairs) if p in ranks
        ]
        if not ranked:
            break
        r, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
    return syms


class BpeEncoder:
    """Actor-pool encode stage: merge ranks load once per actor; each
    batch encodes its UNIQUE words once through a persistent
    word -> n_tokens cache (text re-uses words, so steady-state cost
    is a dict lookup per unique word)."""

    def __init__(
        self, merges_ref, text_col: str = "text", id_col: str = "doc_id"
    ) -> None:
        from ..state.broadcast import get_broadcast

        merges = get_broadcast(merges_ref)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.id_col = id_col
        self.cache: dict[str, int] = {}

    def __call__(self, b: pa.Table) -> pa.Table:
        s = pc.utf8_lower(b[self.text_col])
        lists = pc.utf8_split_whitespace(s)
        flat = np.asarray(pc.list_flatten(lists), dtype=object)
        offsets = np.asarray(
            pc.list_parent_indices(lists), dtype=np.int64
        )
        uniq, inv = np.unique(flat, return_inverse=True)
        ntok_u = np.empty(len(uniq), np.int64)
        for k, w in enumerate(uniq):
            n = self.cache.get(w)
            if n is None:
                n = len(encode_word(w, self.ranks))
                self.cache[w] = n
            ntok_u[k] = n
        per_tok = ntok_u[inv]
        n_docs = len(b)
        n_words = np.bincount(offsets, minlength=n_docs).astype(np.int64)
        n_tokens = np.bincount(
            offsets, weights=per_tok, minlength=n_docs
        ).astype(np.int64)
        return pa.table(
            {
                self.id_col: b[self.id_col],
                "n_words": pa.array(n_words, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
            }
        )


def bpe_tokenize(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 200,
    max_words: int = 50_000,
):
    """End-to-end: distributed word histogram -> driver merge training
    over the bounded histogram -> actor-pool encode. Returns
    (per-doc token-count Dataset, ordered merge list)."""
    import ray

    wf = word_freqs(ds, text_col=text_col, max_words=max_words)
    merges = train_bpe(wf, num_merges=num_merges)
    ref = ray.put(merges)
    out = ds.map_batches(
        BpeEncoder,
        fn_constructor_args=(ref,),
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=256,
    )
    return out, merges
