"""Round-3 analytics operators: funnel, retention, entropy, keywords,
Jaccard catalog match, SQL-exact winnowing fingerprints."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

import theoremkb_ray.pipelines.relcore as relcore  # _pq patch point after the r5 split



def _events(rows):
    tbl = pd.DataFrame(
        rows, columns=["user_id", "ts_s", "event_type"]
    )
    tbl["ts"] = pd.to_datetime(tbl["ts_s"], unit="s")
    return rd.from_arrow(
        pa.Table.from_pandas(
            tbl[["user_id", "ts", "event_type"]], preserve_index=False
        )
    )


def test_funnel_strict_order_and_prefix():
    # u1: full funnel; u2: view BEFORE click (doesn't count) -> 1;
    # u3: view at the SAME second as click (not strictly after) -> 1;
    # u4: no click at all -> 0 even with view+purchase present.
    ds = _events(
        [
            (1, 10, "click"), (1, 20, "view"), (1, 30, "purchase"),
            (2, 10, "view"), (2, 20, "click"),
            (3, 10, "click"), (3, 10, "view"),
            (4, 10, "view"), (4, 20, "purchase"),
        ]
    )
    got = (
        _funnel_from_ds(ds)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["user_id"].tolist() == [1, 2, 3, 4]
    assert got["steps"].tolist() == [3, 1, 1, 0]


def _funnel_from_ds(ds):
    """Run q_funnel_users' pipeline on an in-memory events Dataset."""
    import theoremkb_ray.pipelines.relational as rel

    orig = relcore._pq
    try:
        relcore._pq = lambda sf_dir, table, columns=None: ds
        return rel.q_funnel_users("unused")
    finally:
        relcore._pq = orig


def _retention_from_ds(ds):
    import theoremkb_ray.pipelines.relational as rel

    orig = relcore._pq
    try:
        relcore._pq = lambda sf_dir, table, columns=None: ds
        return rel.q_retention_cohorts("unused")
    finally:
        relcore._pq = orig


def test_retention_cohorts_hand_computed():
    DAY = 86_400
    # u1 first on day0, active day0+day2; u2 first on day0, active day0;
    # u3 first on day2, active day2+day3. Two events same user+day dedup.
    ds = _events(
        [
            (1, 5, "click"), (1, 10, "view"), (1, 2 * DAY + 1, "click"),
            (2, 100, "error"),
            (3, 2 * DAY + 5, "signup"), (3, 3 * DAY + 5, "click"),
        ]
    )
    got = (
        _retention_from_ds(ds)
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "cohort_day": [0, 0, 2, 2],
            "day_offset": [0, 2, 0, 1],
            "n_users": [2, 1, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_token_entropy_hand_computed():
    from theoremkb_ray.stages.textstats import token_entropy

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": ["a a b", "x x x x", "  "],
            }
        )
    )
    out = token_entropy(ds).to_pandas().set_index("doc_id")
    # doc0: p = 2/3, 1/3 -> H = -(2/3 ln 2/3 + 1/3 ln 1/3)
    h0 = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert abs(out.loc[0, "entropy"] - h0) < 1e-12
    assert out.loc[0, "n_types"] == 2 and out.loc[0, "n_tokens"] == 3
    # doc1: single type -> entropy 0
    assert out.loc[1, "entropy"] == 0.0 and out.loc[1, "n_types"] == 1
    # doc2: zero tokens -> no row
    assert 2 not in out.index


def test_doc_keywords_tfidf_and_tiebreak():
    from theoremkb_ray.stages.textstats import doc_keywords

    # 4 docs; "rare" appears in 1 doc, "mid" in 2, "com" in all 4.
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "rare com mid",
                    "com mid com",
                    "com zz yy",
                    "com aa bb",
                ],
            }
        )
    )
    out = doc_keywords(ds, k=2).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("tfidf", ascending=False)
    # doc0: rare tf1*ln(4/1) > mid tf1*ln(4/2) > com tf1*ln(1)=0
    assert d0["token"].tolist() == ["rare", "mid"]
    assert abs(d0["tfidf"].iloc[0] - math.log(4)) < 1e-12
    # doc3: aa and bb tie on tfidf (both df=1? no - df("aa")=df("bb")=1)
    d3 = out[out.doc_id == 3]
    assert sorted(d3["token"]) == ["aa", "bb"]  # tie -> token asc wins


def test_jaccard_match_tie_prefers_smallest_candidate():
    from theoremkb_ray.stages.match import jaccard_match

    cand = pa.table(
        {"doc_id": [0, 1], "text": ["a b c", "a b d"]}
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [10, 11, 12],
                "text": ["a b", "d", "zz"],
            }
        )
    )
    out = (
        jaccard_match(ds, cand)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc10: inter 2 with both, |u|=3 both -> tie -> candidate 0
    assert out.loc[10, "match_id"] == 0
    assert out.loc[10, "inter_n"] == 2
    assert abs(out.loc[10, "sim"] - 2 / 3) < 1e-12
    # doc11: only candidate 1 shares "d"
    assert out.loc[11, "match_id"] == 1
    # doc12: zero intersection -> no row
    assert 12 not in out.index


def test_winnow_ranked_matches_pure_python():
    from theoremkb_ray.stages.textstats import winnow_fingerprints_ranked

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=n))
        for n in [0, 1, 3, 8, 9, 40]
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    got = winnow_fingerprints_ranked(ds).to_pandas()

    # pure-python reference: ranks in sorted corpus vocab, FNV fold,
    # splitmix64, winnow (%16 or min)
    all_toks = sorted({t for s in texts for t in s.split()})
    rank = {t: i for i, t in enumerate(all_toks)}
    M = 1 << 64
    FNV = 0x100000001B3

    def smix(x):
        x = (x + 0x9E3779B97F4A7C15) % M
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) % M
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) % M
        return x ^ (x >> 31)

    want = set()
    for did, s in enumerate(texts):
        ids = [rank[t] for t in s.split()]
        if not ids:
            continue
        k = min(8, len(ids))
        hs = []
        for i in range(len(ids) - k + 1):
            acc = 0
            for x in ids[i : i + k]:
                acc = (acc * FNV + x) % M
            hs.append(smix(acc))
        kept = {h for h in hs if h % 16 == 0} or {min(hs)}
        want |= {(did, h) for h in kept}
    assert set(zip(got["doc_id"], got["fp"])) == want


def test_simhash_ranked_strict_majority_bits():
    from theoremkb_ray.functions.hashing import splitmix64
    from theoremkb_ray.stages.textstats import simhash_ranked

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": ["b a b", "a", ""],
            }
        )
    )
    out = simhash_ranked(ds).to_pandas().set_index("doc_id")
    # vocab sorted: a->0, b->1; h(id) = one splitmix64 round
    ha, hb = splitmix64(np.array([0, 1], dtype=np.uint64))
    # doc0 tokens (b,a,b): bit m set iff 2*(bits of [hb,ha,hb]) > 3
    exp0 = np.uint64(0)
    for m in range(64):
        ones = 2 * ((hb >> np.uint64(m)) & np.uint64(1)) + (
            (ha >> np.uint64(m)) & np.uint64(1)
        )
        if 2 * int(ones) > 3:
            exp0 |= np.uint64(1) << np.uint64(m)
    assert out.loc[0, "simhash"] == exp0
    assert out.loc[1, "simhash"] == ha  # single token -> its hash
    assert 2 not in out.index  # empty doc -> no row


def test_novelty_hand_computed():
    from theoremkb_ray.stages.dedup import novelty

    # doc0 and doc1 share the exact 5-gram "a b c d e"; each also has
    # one private gram. doc2 is short (<5 tokens) -> whole-seq gram.
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "a b c d e f",      # grams: abcde, bcdef
                    "a b c d e",        # gram: abcde (shared w/ doc0)
                    "x y",              # whole-seq gram, unique
                    "",                 # empty -> no row
                ],
            }
        )
    )
    out = novelty(ds).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_grams"] == 2 and out.loc[0, "n_unique"] == 1
    assert out.loc[0, "novelty"] == 0.5
    assert out.loc[1, "n_grams"] == 1 and out.loc[1, "n_unique"] == 0
    assert out.loc[2, "novelty"] == 1.0
    assert 3 not in out.index


def test_prefix_dup_groups():
    import theoremkb_ray.pipelines.relational as rel

    pre = " ".join(f"t{i}" for i in range(8))
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    pre + " alpha",
                    pre + " beta gamma",
                    "other text entirely here now yes ok fine",
                    "short",  # <8 tokens: prefix = all of them
                ],
            }
        )
    )
    orig = relcore._pq
    try:
        relcore._pq = lambda sf_dir, table, columns=None: ds
        out = rel.q_prefix_dup_docs("unused").to_pandas()
    finally:
        relcore._pq = orig
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1]
    assert out["group_n"].tolist() == [2, 2]


def test_cumulative_users_hand_computed():
    import theoremkb_ray.pipelines.relational as rel

    DAY = 86_400
    ds = _events(
        [
            (1, 5, "a"), (1, 10, "b"),          # u1 day0 (two events)
            (2, DAY + 3, "a"),                  # u2 day1
            (1, 2 * DAY + 1, "a"),              # u1 again day2
            (3, 2 * DAY + 2, "a"),              # u3 day2
        ]
    )
    orig = relcore._pq
    try:
        relcore._pq = lambda sf_dir, table, columns=None: ds
        out = rel.q_cumulative_users("unused").to_pandas()
    finally:
        relcore._pq = orig
    out = out.sort_values("day").reset_index(drop=True)
    assert out["day"].tolist() == [0, 1, 2]
    assert out["n_active"].tolist() == [1, 1, 2]
    assert out["n_new"].tolist() == [1, 1, 1]
    assert out["cum_users"].tolist() == [1, 2, 3]
