"""Round-3 additions: global rank/ntile, A/B z-test, Welch t-test,
hourly anomaly z, embedding covariance, char-level substring dedup.
Each test runs the production query body over a small in-memory
Dataset (the _pq monkeypatch pattern) and checks against a literal
driver-side reference computation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

import theoremkb_ray.pipelines.relational as rel
import theoremkb_ray.pipelines.relcore as relcore  # _pq patch point after the r5 split


def _run(qfn, tables: dict, n_blocks: int = 3):
    """Run a REGISTRY query over in-memory tables, split into several
    blocks so partial/exchange paths are actually exercised."""
    dss = {
        name: rd.from_arrow(
            pa.Table.from_pandas(df, preserve_index=False)
        ).repartition(n_blocks)
        for name, df in tables.items()
    }
    orig = relcore._pq

    def fake_pq(sf_dir, table, columns=None):
        ds = dss[table]
        return ds.select_columns(columns) if columns else ds

    try:
        relcore._pq = fake_pq
        out = qfn("unused")
    finally:
        relcore._pq = orig
    if isinstance(out, pd.DataFrame):
        return out
    return out.to_pandas()


def test_rank_global_orders_vs_literal():
    rng = np.random.default_rng(7)
    n = 137
    # deliberate ties: quantized prices
    price = np.round(rng.uniform(100, 5000, n), -1)
    orders = pd.DataFrame(
        {"o_orderkey": np.arange(n, dtype=np.int64), "o_totalprice": price}
    )
    got = (
        _run(rel.q_rank_global_orders, {"orders": orders})
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    # literal reference
    order = np.lexsort((orders["o_orderkey"], price))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    sp = np.sort(price)
    cume = np.searchsorted(sp, price, side="right") / n
    q10, r10 = divmod(n, 10)
    split = (q10 + 1) * r10
    decile = (
        np.where(rank < split, rank // (q10 + 1), r10 + (rank - split) // q10)
        + 1
    )
    assert np.allclose(got["cume"].to_numpy(), np.round(cume, 6))
    assert got["decile"].tolist() == decile.tolist()
    # every decile holds floor/ceil(n/10) rows
    sizes = got["decile"].value_counts()
    assert set(sizes.unique()) <= {q10, q10 + 1}


def test_ab_test_events_vs_literal():
    rng = np.random.default_rng(3)
    rows = []
    for u in range(40):
        # cohort 0 heavier purchasers
        lam = 20 if u % 2 == 0 else 12
        k = rng.poisson(lam)
        rows += [(u, "purchase")] * k + [(u, "click")] * 3
    ev = pd.DataFrame(rows, columns=["user_id", "event_type"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    got = _run(rel.q_ab_test_events, {"events": ev})
    pu = ev[ev.event_type == "purchase"].groupby("user_id").size()
    conv = (pu.reindex(range(40), fill_value=0) >= 15).astype(int)
    grp = np.arange(40) % 2
    n_a, k_a = int((grp == 0).sum()), int(conv[grp == 0].sum())
    n_b, k_b = int((grp == 1).sum()), int(conv[grp == 1].sum())
    p = (k_a + k_b) / (n_a + n_b)
    z = (k_a / n_a - k_b / n_b) / np.sqrt(
        p * (1 - p) * (1 / n_a + 1 / n_b)
    )
    assert got["n_a"].iloc[0] == n_a and got["n_b"].iloc[0] == n_b
    assert got["conv_a"].iloc[0] == k_a and got["conv_b"].iloc[0] == k_b
    assert abs(got["z"].iloc[0] - round(float(z), 6)) < 1e-9


def test_welch_ttest_vs_literal():
    rng = np.random.default_rng(11)
    nc = 30
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(nc, dtype=np.int64),
            "c_mktsegment": np.where(
                np.arange(nc) % 3 == 0, "BUILDING",
                np.where(np.arange(nc) % 3 == 1, "MACHINERY", "OTHER"),
            ),
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": rng.integers(0, nc, 400).astype(np.int64),
            "o_totalprice": rng.normal(1000, 200, 400),
        }
    )
    got = _run(
        rel.q_welch_ttest_segments, {"customer": cust, "orders": orders}
    )
    j = orders.merge(
        cust, left_on="o_custkey", right_on="c_custkey", how="inner"
    )
    a = j.loc[j.c_mktsegment == "BUILDING", "o_totalprice"].to_numpy()
    b = j.loc[j.c_mktsegment == "MACHINERY", "o_totalprice"].to_numpy()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    sea, seb = va / len(a), vb / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (
        sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1)
    )
    assert got["n_a"].iloc[0] == len(a) and got["n_b"].iloc[0] == len(b)
    assert abs(got["t"].iloc[0] - t) < 1e-4
    assert abs(got["df"].iloc[0] - df) < 0.05


def test_anomaly_hours_flags_planted_spike():
    base = pd.Timestamp("2025-01-01")
    rows = []
    for h in range(48):
        n = 100 if h != 20 else 400  # planted spike
        rows += [(base + pd.Timedelta(hours=h, seconds=s % 3600),)
                 for s in range(n)]
    ev = pd.DataFrame(rows, columns=["ts"])
    got = _run(rel.q_anomaly_hours, {"events": ev})
    assert len(got) == 1
    assert got["hb"].iloc[0] == base + pd.Timedelta(hours=20)
    assert got["n"].iloc[0] == 400
    cnts = np.array([100] * 48, dtype=float)
    cnts[20] = 400
    z = (400 - cnts.mean()) / cnts.std(ddof=1)
    assert abs(got["z"].iloc[0] - round(float(z), 6)) < 1e-9


def test_cov_embeddings_vs_numpy():
    rng = np.random.default_rng(5)
    n, dim = 200, 16
    M = rng.normal(size=(n, dim)).astype(np.float32)
    emb = pd.DataFrame({"embedding": [row for row in M]})
    got = _run(rel.q_cov_embeddings, {"embeddings": emb})
    C = np.cov(M[:, :8].astype(np.float64), rowvar=False, ddof=1)
    assert len(got) == 36
    for _, r in got.iterrows():
        assert abs(r["cov"] - C[int(r["i"]), int(r["j"])]) < 1e-5


def test_substr_dedup_vs_brute():
    shared = "x" * 10 + "the quick brown fox jumps over the lazy dog"
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "A unique preamble here. " + shared,
                shared + " And a unique tail follows this text.",
                "completely different content with no overlap at all"
                " and then some more words to pad it out beyond forty",
                "short",  # < 40 chars: no windows, absent from output
            ],
        }
    )
    got = (
        _run(rel.q_substr_dedup_docs, {"documents": docs})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute force
    W = 40
    grams = {}
    for d, t in zip(docs.doc_id, docs.text):
        for i in range(len(t) - W + 1):
            grams.setdefault(t[i : i + W], set()).add(d)
    exp = {}
    for d, t in zip(docs.doc_id, docs.text):
        wins = [t[i : i + W] for i in range(len(t) - W + 1)]
        if not wins:
            continue
        dup = sum(1 for g in wins if len(grams[g]) >= 2)
        exp[d] = (len(wins), dup)
    assert got["doc_id"].tolist() == sorted(exp)
    for _, r in got.iterrows():
        n, dup = exp[r["doc_id"]]
        assert r["n_windows"] == n
        assert r["n_dup_windows"] == dup
        assert abs(r["dup_ratio"] - round(dup / n, 6)) < 1e-9
    # the two docs sharing a 54-char run actually overlap
    assert got.loc[got.doc_id == 0, "n_dup_windows"].iloc[0] > 0


def test_hard_negatives_vs_brute():
    rng = np.random.default_rng(9)
    n, dim = 60, 8
    M = rng.normal(size=(n, dim)).astype(np.float32)
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row for row in M],
            "label": (np.arange(n) % 4).astype(np.int32),
        }
    )
    got = (
        _run(rel.q_hard_negatives, {"embeddings": emb})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = M.astype(np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    S = X @ X.T
    lab = np.arange(n) % 4
    S[lab[:, None] == lab[None, :]] = -np.inf
    exp = S.argmax(axis=1)
    assert got["neg_id"].tolist() == exp.tolist()
    # the mined negative never shares the anchor's label
    assert (lab[got["neg_id"].to_numpy()] != lab).all()


def test_mixture_sample_quotas_and_determinism():
    rng = np.random.default_rng(2)
    langs = np.array(["en"] * 100 + ["de"] * 50 + ["fr"] * 30
                     + ["es"] * 15 + ["zh"] * 5)
    rng.shuffle(langs)
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(langs), dtype=np.int64), "lang": langs}
    )
    got1 = _run(rel.q_mixture_sample_docs, {"documents": docs})
    got2 = _run(rel.q_mixture_sample_docs, {"documents": docs}, n_blocks=7)
    # identical membership under different partitioning
    assert sorted(got1["doc_id"]) == sorted(got2["doc_id"])
    budget = int(rel.MIXTURE_BUDGET * len(langs))
    sizes = got1.groupby("lang").size()
    for lang, w in rel.MIXTURE_WEIGHTS.items():
        n_lang = int((langs == lang).sum())
        assert sizes.get(lang, 0) == min(n_lang, int(budget * w))


def test_burst_users_vs_literal_window():
    base = pd.Timestamp("2025-03-01")
    rows = []
    # u1: 5 events within one 23h window, then a gap
    for h in [0, 1, 2, 3, 22, 50]:
        rows.append((1, base + pd.Timedelta(hours=h)))
    # u2: evenly spread, never more than 1 per window
    for d in range(4):
        rows.append((2, base + pd.Timedelta(days=2 * d)))
    # u3: duplicate timestamps (RANGE peers) — all 3 count together
    for _ in range(3):
        rows.append((3, base))
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    got = (
        _run(rel.q_burst_users, {"events": ev})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["user_id"].tolist() == [1, 2, 3]
    assert got["max_burst"].tolist() == [5, 1, 3]


def test_curation_decision_flags():
    long_keep = (
        "A perfectly reasonable document with plenty of alphabetic "
        "content that easily clears every configured threshold set "
        "because it keeps going well past the minimum length bar."
    )
    dup_prefix = "z" * 100 + " first version tail"
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                long_keep,
                dup_prefix,
                dup_prefix + " but a different continuation here",
                "1234567890 " * 13,  # long enough, but low alpha
            ],
        }
    )
    got = (
        _run(rel.q_curation_decision_docs, {"documents": docs})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["keep"].tolist() == [True, False, False, False]
    assert got["prefix_dup"].tolist() == [False, False, True, False]
    # doc1 fails only because it is short / low alpha, not as the dup
    assert bool(got.loc[1, "too_short"]) or bool(got.loc[1, "low_alpha"])
    assert bool(got.loc[3, "low_alpha"]) and not bool(
        got.loc[3, "too_short"]
    )


def test_pca_projection_vs_numpy_and_partition_invariance():
    rng = np.random.default_rng(21)
    n, dim = 300, 12
    # anisotropic cloud so the top components are well separated
    A = rng.normal(size=(dim, dim))
    M = (rng.normal(size=(n, dim)) @ (A * np.linspace(3, 0.1, dim))).astype(
        np.float32
    )
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row for row in M],
        }
    )
    got = (
        _run(rel.q_pca_project_embeddings, {"embeddings": emb})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    got2 = (
        _run(rel.q_pca_project_embeddings, {"embeddings": emb}, n_blocks=9)
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # numpy reference PCA
    X = M.astype(np.float64)
    Xc = X - X.mean(axis=0)
    C = np.cov(Xc, rowvar=False, ddof=1)
    w, V = np.linalg.eigh(C)
    top = V[:, ::-1][:, :2].copy()
    for c in range(2):
        j = np.argmax(np.abs(top[:, c]))
        if top[j, c] < 0:
            top[:, c] = -top[:, c]
    P = Xc @ top
    assert np.allclose(got["pc1"].to_numpy(), P[:, 0], atol=1e-4)
    assert np.allclose(got["pc2"].to_numpy(), P[:, 1], atol=1e-4)
    # identical output under different partitioning
    assert np.allclose(got["pc1"].to_numpy(), got2["pc1"].to_numpy())
    assert np.allclose(got["pc2"].to_numpy(), got2["pc2"].to_numpy())
    # pc1 captures the most variance
    assert got["pc1"].var() > got["pc2"].var()


def test_shrunk_means_pull_small_groups_to_prior():
    orders = pd.DataFrame(
        {
            "o_custkey": np.int64([1] * 40 + [2] * 2),
            "o_totalprice": [200000.0] * 40 + [200000.0] * 2,
        }
    )
    got = (
        _run(rel.q_shrunk_means_customers, {"orders": orders})
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    # both customers have the same raw mean; the 2-order customer is
    # pulled much closer to the prior 150000
    big = got.loc[0, "shrunk_mean"]
    small = got.loc[1, "shrunk_mean"]
    assert big > small
    assert abs(big - (40 * 200000 + 10 * 150000) / 50) < 1e-4
    assert abs(small - (2 * 200000 + 10 * 150000) / 12) < 1e-4


def test_q5_revenue_vs_pandas():
    rng = np.random.default_rng(31)
    region = pd.DataFrame(
        {"r_regionkey": np.int32([0, 1]), "r_name": ["ASIA", "EUROPE"]}
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": np.int32(range(4)),
            "n_name": ["JAPAN", "CHINA", "FRANCE", "INDIA"],
            "n_regionkey": np.int32([0, 0, 1, 0]),
        }
    )
    nc = 40
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(nc, dtype=np.int64),
            "c_nationkey": np.int32(rng.integers(0, 4, nc)),
        }
    )
    ns = 20
    supp = pd.DataFrame(
        {
            "s_suppkey": np.arange(ns, dtype=np.int64),
            "s_nationkey": np.int32(rng.integers(0, 4, ns)),
        }
    )
    no = 300
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(no, dtype=np.int64),
            "o_custkey": rng.integers(0, nc, no).astype(np.int64),
            "o_orderdate": pd.Timestamp("1994-06-01")
            + pd.to_timedelta(rng.integers(0, 1500, no), unit="D"),
        }
    )
    nl = 900
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, no, nl).astype(np.int64),
            "l_suppkey": rng.integers(0, ns, nl).astype(np.int64),
            "l_extendedprice": np.round(rng.uniform(100, 9000, nl), 2),
            "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        }
    )
    got = (
        _run(
            rel.q_q5_revenue,
            {
                "region": region,
                "nation": nation,
                "customer": cust,
                "supplier": supp,
                "orders": orders,
                "lineitem": li,
            },
        )
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    # literal pandas reference
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )
    j = j[
        (j.r_name == "ASIA")
        & (j.c_nationkey == j.s_nationkey)
        & (j.o_orderdate >= pd.Timestamp("1995-01-01"))
        & (j.o_orderdate < pd.Timestamp("1997-01-01"))
    ]
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    exp = j.groupby("n_name")["rev"].sum()
    assert got["n_name"].tolist() == sorted(exp.index)
    for _, r in got.iterrows():
        assert abs(r["revenue"] - exp[r["n_name"]]) < 0.02


def test_rep_ngram_vs_brute():
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [
                "a b c a b c a b d",  # 'a b c' twice -> repeated grams
                "x y z w v u t s",  # all distinct
                "q q q q q",  # single gram repeated 3x
            ],
        }
    )
    got = (
        _run(rel.q_rep_ngram_docs, {"documents": docs})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = []
    for t in docs.text:
        toks = t.split()
        grams = [tuple(toks[i : i + 3]) for i in range(len(toks) - 2)]
        from collections import Counter

        c = Counter(grams)
        dup = sum(n for n in c.values() if n > 1)
        exp.append((len(grams), dup / len(grams)))
    for i, (n, ratio) in enumerate(exp):
        assert got.loc[i, "n_grams"] == n
        assert abs(got.loc[i, "rep_ratio"] - ratio) < 2e-6


def test_top_paths_strict_adjacency():
    base = pd.Timestamp("2025-02-01")
    rows = []
    # u1 emits a>b>c twice (contiguous), u2 emits a>x>c (breaks a>b>c)
    for rep in range(2):
        for i, e in enumerate(["a", "b", "c"]):
            rows.append((1, base + pd.Timedelta(minutes=rep * 10 + i), e))
    for i, e in enumerate(["a", "x", "c"]):
        rows.append((2, base + pd.Timedelta(minutes=i), e))
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["event_id"] = np.arange(len(ev), dtype=np.int64)
    got = _run(rel.q_top_paths_users, {"events": ev})
    top = got.iloc[0]
    assert top["path"] == "a>b>c"
    assert top["n"] == 2
    # no cross-user trigram leaked
    assert not any(">a>x" in p and p.startswith("c") for p in got["path"])


def test_join_size_estimate_vs_pandas():
    rng = np.random.default_rng(17)
    orders = pd.DataFrame(
        {"o_orderkey": rng.integers(0, 50, 120).astype(np.int64)}
    )
    li = pd.DataFrame(
        {"l_orderkey": rng.integers(20, 80, 300).astype(np.int64)}
    )
    got = _run(
        rel.q_join_size_estimate, {"orders": orders, "lineitem": li}
    )
    merged = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    overlap = len(
        set(orders.o_orderkey.unique()) & set(li.l_orderkey.unique())
    )
    assert got["join_rows"].iloc[0] == len(merged)
    assert got["overlap_keys"].iloc[0] == overlap


def test_tail_latency_p95_vs_numpy():
    rng = np.random.default_rng(23)
    base = pd.Timestamp("2025-04-01")
    rows = []
    for u in range(6):
        n = int(rng.integers(2, 30))
        offs = np.sort(rng.integers(0, 10_000_000, n))
        for o in offs:
            rows.append((u, base + pd.Timedelta(seconds=int(o))))
    rows.append((99, base))  # single event: no gaps, absent
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["event_id"] = np.arange(len(ev), dtype=np.int64)
    got = (
        _run(rel.q_tail_latency_users, {"events": ev})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert 99 not in set(got["user_id"])
    for u in range(6):
        sub = ev[ev.user_id == u].sort_values("ts")
        gaps = np.diff(sub["ts"].to_numpy("datetime64[us]").astype(np.int64)) / 1e6
        exp = np.quantile(gaps, 0.95, method="linear")
        row = got[got.user_id == u].iloc[0]
        assert row["n_gaps"] == len(gaps)
        assert abs(row["p95_gap_s"] - exp) < 1e-3


def test_cusum_vs_literal_recurrence():
    rng = np.random.default_rng(29)
    base = pd.Timestamp("2025-05-01")
    rows = []
    for u in range(5):
        n = int(rng.integers(3, 40))
        for i in range(n):
            rows.append(
                (
                    u,
                    base + pd.Timedelta(minutes=i),
                    float(np.round(rng.uniform(0, 150), 2)),
                )
            )
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["event_id"] = np.arange(len(ev), dtype=np.int64)
    got = (
        _run(rel.q_cusum_users, {"events": ev})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    for u in range(5):
        sub = ev[ev.user_id == u].sort_values(["ts", "event_id"])
        s, mx = 0.0, 0.0
        for v in sub["value"]:
            s = max(0.0, s + v - 60.0)
            mx = max(mx, s)
        row = got[got.user_id == u].iloc[0]
        assert row["n_events"] == len(sub)
        assert abs(row["max_cusum"] - mx) < 1e-6
