"""Unit tests for the round-2 relational additions (window frame,
rank, rollup grouping sets, unnest-ordinality, repetition quality,
grouped quantiles, grouped correlation) on planted edge-case data.
The sf0.01 DuckDB oracle covers the happy path; these cover the edges
the driver tables can't reach (multi-line docs, balance ties, user
boundaries at bucket edges)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _df(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()


def test_moving_avg_matches_pandas_rolling():
    from theoremkb_ray.pipelines.relational import q_window_moving_avg

    got = (
        _df(q_window_moving_avg(SF_DIR))
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    want = (
        ev.assign(
            moving_avg=ev.groupby("user_id", sort=False)["value"]
            .rolling(3, min_periods=1)
            .mean()
            .round(4)
            .reset_index(level=0, drop=True)
        )[["event_id", "user_id", "moving_avg"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["moving_avg"], want["moving_avg"], check_exact=False, atol=1e-9
    )


def test_rank_per_group_tie_semantics():
    """RANK() with gaps: ties share a rank; rank>10 rows are dropped
    even when ties push the row count past 10."""
    from theoremkb_ray.pipelines.relational import q_rank_per_group

    got = _df(q_rank_per_group(SF_DIR))
    cust = pd.read_parquet(
        f"{SF_DIR}/customer.parquet",
        columns=["c_mktsegment", "c_custkey", "c_acctbal"],
    )
    want = cust.assign(
        acct_rank=cust.groupby("c_mktsegment")["c_acctbal"]
        .rank(method="min", ascending=False)
        .astype("int64")
    )
    want = want[want["acct_rank"] <= 10][
        ["c_mktsegment", "c_custkey", "acct_rank"]
    ]
    key = ["c_mktsegment", "c_custkey"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[key + ["acct_rank"]], want[key + ["acct_rank"]]
    )


def test_rollup_grouping_levels():
    from theoremkb_ray.pipelines.relational import q_rollup_grouping

    out = _df(q_rollup_grouping(SF_DIR))
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    # grand total row
    top = out[out["o_orderstatus"].isna()]
    assert len(top) == 1
    assert int(top["n"].iloc[0]) == len(orders)
    assert top["revenue"].iloc[0] == pytest.approx(
        orders["o_totalprice"].sum(), rel=1e-9
    )
    # mid level: one row per status, n sums to total
    mid = out[out["o_orderstatus"].notna() & out["o_orderpriority"].isna()]
    assert set(mid["o_orderstatus"]) == set(orders["o_orderstatus"])
    assert mid["n"].sum() == len(orders)
    # fine level row count = distinct (status, priority) pairs
    fine = out[out["o_orderpriority"].notna()]
    assert len(fine) == len(
        orders[["o_orderstatus", "o_orderpriority"]].drop_duplicates()
    )


def test_explode_and_repetition_on_planted_docs():
    """Multi-line planted docs: exact ordinals, lengths, and Gopher
    duplicate-line/word fractions."""
    import ray.data as rd

    from theoremkb_ray.pipelines.relational import (
        q_explode_lines,
        q_repetition_docs,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "aa bb\naa bb\ncc",  # dup line 1/3; words: aa,bb x2, cc
                    "x y z",  # one line, all distinct
                ]
            ),
        }
    )
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))
        ex = _df(q_explode_lines(d)).sort_values(
            ["doc_id", "line_no"]
        ).reset_index(drop=True)
        assert ex["doc_id"].tolist() == [1, 1, 1, 2]
        assert ex["line_no"].tolist() == [1, 2, 3, 1]
        assert ex["line_len"].tolist() == [5, 5, 2, 5]

        rep = _df(q_repetition_docs(d)).sort_values("doc_id")
        # doc 1: 3 lines, 2 distinct -> 1/3; 5 words (aa bb aa bb cc),
        # 3 distinct -> 2/5
        assert rep["dup_line_frac"].tolist() == pytest.approx(
            [round(1 - 2 / 3, 6), 0.0]
        )
        assert rep["dup_word_frac"].tolist() == pytest.approx(
            [round(1 - 3 / 5, 6), 0.0]
        )


def test_quantiles_group_exact():
    from theoremkb_ray.pipelines.relational import q_quantiles_group

    got = _df(q_quantiles_group(SF_DIR)).set_index("o_orderpriority")
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    for prio, g in orders.groupby("o_orderpriority"):
        v = g["o_totalprice"].to_numpy()
        assert got.loc[prio, "median_price"] == pytest.approx(
            np.quantile(v, 0.5), abs=1e-4
        )
        assert got.loc[prio, "p90_price"] == pytest.approx(
            np.quantile(v, 0.9), abs=1e-4
        )


def test_corr_agg_matches_numpy():
    from theoremkb_ray.pipelines.relational import q_corr_agg

    got = _df(q_corr_agg(SF_DIR)).set_index("l_returnflag")
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    for flag, g in li.groupby("l_returnflag"):
        want = np.corrcoef(g["l_quantity"], g["l_extendedprice"])[0, 1]
        assert got.loc[flag, "corr_qty_price"] == pytest.approx(
            want, abs=1e-6
        )


def test_global_quantiles_exact():
    from theoremkb_ray.pipelines.relational import q_global_quantiles

    got = _df(q_global_quantiles(SF_DIR)).set_index("q")
    v = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_extendedprice"]
    )["l_extendedprice"].to_numpy()
    for q in (0.5, 0.99):
        assert got.loc[q, "price"] == pytest.approx(
            np.quantile(v, q, method="linear"), abs=1e-4
        )


def test_substring_dups_planted():
    """Two docs sharing one 8-token window, one unique doc, one short
    dup pair (< 8 tokens -> whole-doc gram)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from theoremkb_ray.stages.dedup import substring_dup_counts

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    f"alpha beta {shared} gamma",
                    f"delta {shared} epsilon zeta",
                    "nothing in common here at all honestly none",
                    "tiny dup",
                    "tiny dup",
                ]
            ),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "documents.parquet"))
        import ray.data as rd

        ds = rd.read_parquet(os.path.join(d, "documents.parquet"))
        out = (
            substring_dup_counts(ds, k=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    # doc1/doc2: windows sliding over the 11-token texts share the
    # exact [w1..w8] window (1 shared gram each); doc3 absent;
    # docs 4/5: whole-doc gram shared (1 each)
    assert out["doc_id"].tolist() == ["1", "2", "4", "5"]
    assert out["shared_grams"].tolist() == [1, 1, 1, 1]


def test_cosine_pairs_matches_brute_force():
    """cosine_pairs == an exhaustive local float64 cosine self-join
    (same values the DuckDB oracle computes), unordered pairs once."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.relational import q_cosine_pairs

    got = (
        _df(q_cosine_pairs(SF_DIR))
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t["vec_id"].to_numpy().astype(np.int64)
    M = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    n = np.linalg.norm(M, axis=1)
    S = (M @ M.T) / np.outer(n, n)
    ai, bj = np.nonzero((S >= 0.4) & (ids[:, None] < ids[None, :]))
    want = (
        pd.DataFrame(
            {
                "id_a": ids[ai],
                "id_b": ids[bj],
                "cosine": np.round(S[ai, bj], 6),
            }
        )
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pack_token_stream_prefix_sum():
    """Distributed two-phase scan == a local ordered cumsum, under a
    tiny bucket_size (many bucket boundaries) and any partitioning."""
    import ray.data as rd

    from theoremkb_ray.stages.pack import pack_token_stream

    rng = np.random.default_rng(3)
    n = 700
    texts = [
        " ".join(["w"] * int(rng.integers(1, 40))) for _ in range(n)
    ]
    ids = rng.permutation(n).astype(np.int64)  # unsorted input order
    t = pa.table({"doc_id": ids, "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(13)
    got = (
        pack_token_stream(ds, budget=64, bucket_size=37)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tok = np.array([t.count(" ") + 1 for t in texts], np.int64)
    order = np.argsort(ids, kind="stable")
    tok_in_id_order = tok[order]
    start = np.r_[0, np.cumsum(tok_in_id_order)[:-1]]
    assert got["doc_id"].to_numpy().tolist() == np.sort(ids).tolist()
    np.testing.assert_array_equal(got["n_tokens"], tok_in_id_order)
    np.testing.assert_array_equal(got["start_offset"], start)
    np.testing.assert_array_equal(got["seq_id"], start // 64)
    np.testing.assert_array_equal(got["pos_in_seq"], start % 64)


def test_window_hopping_fanout_invariant():
    """Every event lands in exactly two hopping windows: total n over
    all (event_type, window) groups == 2x the event count, and each
    tumbling hour h appears as window_start h and h-1."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.relational import q_window_hopping

    got = _df(q_window_hopping(SF_DIR))
    n_events = pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    assert got["n"].sum() == 2 * n_events
    hours = set(
        pq.read_table(f"{SF_DIR}/events.parquet", columns=["ts"])["ts"]
        .cast(pa.int64())
        .to_numpy()
        // 3_600_000_000
    )
    assert set(got["window_start"]) == hours | {h - 1 for h in hours}


def test_postings_topk_matches_pandas():
    from theoremkb_ray.pipelines.relational import q_postings_topk

    got = (
        _df(q_postings_topk(SF_DIR))
        .sort_values(["term", "rank"])
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = []
    for _, r in docs.iterrows():
        toks = r["text"].split()
        for t in set(toks):
            rows.append((t, r["doc_id"], toks.count(t)))
    tf = pd.DataFrame(rows, columns=["term", "doc_id", "tf"])
    want = []
    for term, g in tf.groupby("term"):
        g = g.sort_values(["tf", "doc_id"], ascending=[False, True]).head(5)
        for rank, (_, r) in enumerate(g.iterrows(), 1):
            want.append((term, r["doc_id"], r["tf"], rank))
    want = (
        pd.DataFrame(want, columns=["term", "doc_id", "tf", "rank"])
        .sort_values(["term", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["term", "doc_id", "tf", "rank"]].astype(
            {"doc_id": "int64", "tf": "int64", "rank": "int64"}
        ),
        want.astype({"doc_id": "int64", "tf": "int64", "rank": "int64"}),
    )


def test_block_dedup_keep_first_on_planted_dups(tmp_path):
    """Two exact-duplicate docs + one partial overlap: the EARLIER
    (doc_id, block_no) instance is canonical, later ones are dups;
    blocks of the partial doc that only it holds are not dups."""
    from theoremkb_ray.pipelines.relational import q_block_dedup_docs

    w = ["w%02d" % i for i in range(30)]
    base = " ".join(w)  # 3 full blocks of 10
    other = " ".join(w[:10] + ["zz%02d" % i for i in range(10)])
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [base, base, other],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(base), len(base), len(other)],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "documents.parquet", index=False)
    got = (
        _df(q_block_dedup_docs(str(d)))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["n_blocks"]) == [3, 3, 2]
    # doc 1 is first everywhere; doc 2 duplicates all 3 blocks; doc 3
    # duplicates only its first block (w00..w09)
    assert list(got["n_dup_blocks"]) == [0, 3, 1]
    assert list(got["dup_ratio"]) == [0.0, 1.0, 0.5]


def test_event_transitions_matches_pandas():
    from theoremkb_ray.pipelines.relational import q_event_transitions

    got = (
        _df(q_event_transitions(SF_DIR))
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    pairs = {}
    for _, g in ev.groupby("user_id", sort=False):
        et = list(g["event_type"])
        for a, b in zip(et, et[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    want = pd.DataFrame(
        [(a, b, n) for (a, b), n in pairs.items()],
        columns=["from_type", "to_type", "n"],
    )
    tot = want.groupby("from_type")["n"].transform("sum")
    want["p"] = (want["n"] / tot).round(6)
    want = want.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["from_type", "to_type", "n", "p"]].astype({"n": "int64"}),
        want.astype({"n": "int64"}),
    )


def test_outliers_mad_matches_pandas():
    from theoremkb_ray.pipelines.relational import q_outliers_mad

    got = (
        _df(q_outliers_mad(SF_DIR))
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    rows = []
    for t, g in ev.groupby("event_type"):
        v = g["value"].to_numpy()
        med = np.quantile(v, 0.5)
        mad = np.quantile(np.abs(v - med), 0.5)
        f = g[np.abs(v - med) > 3 * mad]
        rows.append(f.assign(med=round(med, 4), mad=round(mad, 4)))
    want = (
        pd.concat(rows).sort_values("event_id").reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[["event_id", "event_type", "value", "med", "mad"]],
        want[["event_id", "event_type", "value", "med", "mad"]],
    )


def test_chi_square_matches_scipy_formula():
    from theoremkb_ray.pipelines.relational import q_chi_square_events

    got = _df(q_chi_square_events(SF_DIR))
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"]
    )
    obs = (
        ev.assign(k=ev["user_id"] % 4)
        .pivot_table(
            index="event_type", columns="k", aggfunc="size", fill_value=0
        )
        .to_numpy()
        .astype(float)
    )
    e = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - e) ** 2 / e).sum()
    assert len(got) == 1
    assert abs(got["chi2"].iloc[0] - round(chi2, 6)) <= 1e-6
    assert got["dof"].iloc[0] == (obs.shape[0] - 1) * (obs.shape[1] - 1)


def test_interval_coverage_merges_overlaps():
    """Three planted users: disjoint windows sum fully; overlapping
    windows merge; a chain a<30min apart collapses to ONE interval."""
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.pipelines.relational import (
        q_interval_coverage_users,
    )

    W = 30 * 60 * 1_000_000
    base = np.int64(1_700_000_000_000_000)
    rows = [
        (1, base), (1, base + 2 * W),            # disjoint: 2 x W
        (2, base), (2, base + W // 2),           # overlap: 1.5 x W
        (3, base), (3, base + W - 1), (3, base + 2 * W - 2),  # chain
    ]
    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
            "user_id": [r[0] for r in rows],
            "event_type": "click",
            "value": 1.0,
            "props": "",
        }
    )
    import tempfile, os
    d = tempfile.mkdtemp(prefix="tkb_iv_")
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    got = (
        _df(q_interval_coverage_users(d))
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(got["n_intervals"]) == [2, 1, 1]
    assert list(got["coverage_us"]) == [2 * W, W + W // 2, 3 * W - 2]


def test_regression_group_matches_numpy_lstsq():
    from theoremkb_ray.pipelines.relational import q_regression_group

    got = (
        _df(q_regression_group(SF_DIR))
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    for _, r in got.iterrows():
        g = li[li["l_returnflag"] == r["l_returnflag"]]
        slope, inter = np.polyfit(
            g["l_quantity"].to_numpy(), g["l_extendedprice"].to_numpy(), 1
        )
        assert abs(r["slope"] - slope) <= 1e-4
        assert abs(r["intercept"] - inter) <= 1e-2


def test_hhi_events_bounds_and_reference():
    from theoremkb_ray.pipelines.relational import q_hhi_events

    got = _df(q_hhi_events(SF_DIR)).set_index("event_type")
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"]
    )
    for t, g in ev.groupby("event_type"):
        n = g.groupby("user_id").size().to_numpy().astype(float)
        hhi = float(((n / n.sum()) ** 2).sum())
        assert abs(got.loc[t, "hhi"] - round(hhi, 6)) <= 1e-6
        assert got.loc[t, "n_users"] == len(n)
        # bounds: 1/n_users <= hhi <= 1
        assert 1.0 / len(n) - 1e-9 <= got.loc[t, "hhi"] <= 1.0


def test_sequence_triples_contiguity(tmp_path):
    """click,view,purchase back-to-back counts; an intervening event
    breaks the run; runs crossing user boundaries never count."""
    from theoremkb_ray.pipelines.relational import q_sequence_triples

    seq = [
        (1, "click"), (1, "view"), (1, "purchase"),   # hit
        (1, "click"), (1, "error"), (1, "view"), (1, "purchase"),  # broken
        (2, "click"), (2, "view"),                    # crosses into user 3
        (3, "purchase"),
        (4, "click"), (4, "view"), (4, "purchase"),
        (4, "click"), (4, "view"), (4, "purchase"),   # two hits
    ]
    df = pd.DataFrame(
        {
            "event_id": range(len(seq)),
            "ts": pd.to_datetime(
                np.arange(len(seq)) * 1000, unit="ms"
            ),
            "user_id": [s[0] for s in seq],
            "event_type": [s[1] for s in seq],
            "value": 1.0,
            "props": "",
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet", index=False)
    got = (
        _df(q_sequence_triples(str(d)))
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(got["user_id"]) == [1, 4]
    assert list(got["n_triples"]) == [1, 2]


def test_skyline_parts_matches_quadratic_reference(tmp_path):
    """Distributed skyline (per-block frontier + one merge) equals the
    O(n^2) dominance definition, including duplicate co-optimal
    points; result is block-layout independent."""
    from theoremkb_ray.pipelines.relational import q_skyline_parts

    rng = np.random.RandomState(3)
    n = 400
    price = np.round(rng.uniform(1, 50, n), 2)
    size = rng.randint(1, 40, n)
    # force a duplicate co-optimal pair on the frontier
    price[10] = price[11] = 0.5
    size[10] = size[11] = 39
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(n, dtype=np.int64),
            "p_name": "x",
            "p_brand": "b",
            "p_type": "t",
            "p_size": size.astype(np.int32),
            "p_retailprice": price,
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "part.parquet", index=False)
    got = (
        _df(q_skyline_parts(str(d)))
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    dominated = np.zeros(n, bool)
    for i in range(n):
        dominated[i] = bool(
            np.any(
                (price <= price[i])
                & (size >= size[i])
                & ((price < price[i]) | (size > size[i]))
            )
        )
    want = np.flatnonzero(~dominated)
    assert list(got["p_partkey"]) == list(want)
    assert {10, 11} <= set(got["p_partkey"])


def test_gini_orders_closed_form_vs_sorted_reference():
    from theoremkb_ray.pipelines.relational import q_gini_orders

    got = _df(q_gini_orders(SF_DIR))
    cnt = (
        pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_custkey"])
        .groupby("o_custkey")
        .size()
        .to_numpy(np.float64)
    )
    x = np.sort(cnt)
    n = len(x)
    gini = float(
        ((2 * np.arange(1, n + 1) - n - 1) * x).sum() / (n * x.sum())
    )
    assert got["n_customers"].iloc[0] == n
    assert abs(got["gini"].iloc[0] - round(gini, 6)) <= 1e-6
    assert 0.0 <= got["gini"].iloc[0] < 1.0


def test_decay_score_users_reference():
    from theoremkb_ray.pipelines.relational import q_decay_score_users

    got = _df(q_decay_score_users(SF_DIR)).set_index("user_id")
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"]
    )
    tau = 7.0 * 86400 * 1e6
    t = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    w = ev["value"].to_numpy() * np.exp((t - t.max()) / tau)
    ref = pd.DataFrame({"user_id": ev["user_id"], "w": w}).groupby(
        "user_id"
    )["w"].sum()
    assert len(got) == len(ref)
    for uid, s in ref.items():
        assert abs(got.loc[uid, "decay_score"] - s) <= 1e-4


def test_ewma_matches_sequential_reference():
    """Per-user EWMA: the vectorized weighted-dot closure must equal a
    literal per-row recurrence at 6dp."""
    from theoremkb_ray.pipelines.relational import q_ewma_users

    got = (
        _df(q_ewma_users(SF_DIR))
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    a = 0.25
    rows = []
    for uid, g in ev.groupby("user_id", sort=True):
        e = None
        for v in g["value"]:
            e = v if e is None else a * v + (1 - a) * e
        rows.append((uid, len(g), round(e, 6)))
    want = pd.DataFrame(rows, columns=["user_id", "n_events", "ewma"])
    assert got["n_events"].tolist() == want["n_events"].tolist()
    np.testing.assert_allclose(
        got["ewma"].to_numpy(), want["ewma"].to_numpy(), atol=2e-6
    )


def test_snapshot_diff_statuses():
    """added keys exist only in B (%7==0 dropped from A but %5!=0);
    removed only in A; changed are %3==0 price bumps present in both."""
    from theoremkb_ray.pipelines.relational import q_snapshot_diff

    got = _df(q_snapshot_diff(SF_DIR))
    st = dict(zip(got["o_orderkey"], got["status"]))
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey"]
    )["o_orderkey"].to_numpy()
    for k in orders[:500]:
        in_a = k % 7 != 0
        in_b = k % 5 != 0
        if in_a and in_b:
            want = "changed" if k % 3 == 0 else None
        elif in_b:
            want = "added"
        elif in_a:
            want = "removed"
        else:
            want = None
        assert st.get(int(k)) == want, (k, st.get(int(k)), want)


def test_above_avg_orders_join_fallback_matches_broadcast():
    """budget=0 must route through the distributed hash join and
    produce the identical row set; both plans match an independent
    pandas reference of the integer cross-multiplied predicate."""
    import theoremkb_ray.pipelines.relational as R

    fast = (
        _df(R.q_above_avg_orders(SF_DIR))
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    slow = (
        _df(R.q_above_avg_orders(SF_DIR, broadcast_budget_rows=0))
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    pd.testing.assert_frame_equal(fast[cols], slow[cols])
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=cols)
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    g = orders.assign(c=cents).groupby("o_custkey")["c"]
    n = g.transform("size")
    sc = g.transform("sum")
    want = orders[cents * n > sc].sort_values("o_orderkey").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(fast[cols], want)


def test_compression_ratio_flags_repetitive_text():
    """No-oracle op (DuckDB has no DEFLATE): repetitive boilerplate
    must compress strictly better than token-diverse text, ratios are
    deterministic, and raw/comp lengths match a direct zlib call."""
    import zlib

    import ray.data as rd

    from theoremkb_ray.pipelines.relational import (
        q_compression_ratio_docs,
    )

    got = _df(q_compression_ratio_docs(SF_DIR)).set_index("doc_id")
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).set_index("doc_id")
    assert len(got) == len(docs)
    # spot-exact vs a direct zlib call on 5 docs
    for did in list(docs.index[:5]):
        t = docs.loc[did, "text"].encode()
        assert got.loc[did, "raw_len"] == len(t)
        assert got.loc[did, "comp_len"] == len(zlib.compress(t, 6))
    # planted contrast: boilerplate vs diverse text through the SAME
    # batch kernel (not just zlib directly)
    rep = "spam ham " * 400
    div = " ".join(f"tok{i}x{i * 7 % 97}" for i in range(800))
    tbl = pa.table({"doc_id": [1, 2], "text": [rep, div]})
    import theoremkb_ray.pipelines.relational as R

    out = None
    for b in [tbl]:
        # reuse the inner kernel via a tiny in-memory dataset
        ds = rd.from_arrow(b)
        import tempfile, os
        with tempfile.TemporaryDirectory() as td:
            import pyarrow.parquet as pq
            pq.write_table(
                b.append_column(
                    "lang", pa.array(["en", "en"])
                ).append_column(
                    "source", pa.array(["s", "s"])
                ).append_column(
                    "n_chars", pa.array([len(rep), len(div)], pa.int64())
                ),
                os.path.join(td, "documents.parquet"),
            )
            out = _df(R.q_compression_ratio_docs(td)).set_index("doc_id")
    assert out.loc[1, "ratio"] < out.loc[2, "ratio"] * 0.5


def test_emd_matches_sorted_difference_identity():
    """For equal cohort sizes, 1-D EMD equals mean |sortedA - sortedB|
    (the classic identity) — checked against the cumulative-count
    formula on random integer samples, plus the pipeline's own output
    at sf0.001 vs a literal per-value reference."""
    rng = np.random.RandomState(0)
    for _ in range(20):
        n = int(rng.randint(3, 40))
        a = rng.randint(0, 50, n).astype(np.int64)
        b = rng.randint(0, 50, n).astype(np.int64)
        want = np.abs(np.sort(a) - np.sort(b)).sum() / n
        # cumulative formula over the combined support
        v = np.unique(np.r_[a, b])
        ca = np.searchsorted(np.sort(a), v, side="right")
        cb = np.searchsorted(np.sort(b), v, side="right")
        got = sum(
            abs(int(ca[i]) * n - int(cb[i]) * n) * int(v[i + 1] - v[i])
            for i in range(len(v) - 1)
        ) / (n * n)
        assert abs(got - want) < 1e-9

    from theoremkb_ray.pipelines.relational import q_emd_cohorts_events

    out = _df(q_emd_cohorts_events(SF_DIR))
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "value"]
    )
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    u = ev.groupby("user_id")["c"].sum()
    a = np.sort(u[u.index % 2 == 0].to_numpy())
    b = np.sort(u[u.index % 2 == 1].to_numpy())
    v = np.unique(np.r_[a, b])
    ca = np.searchsorted(a, v, side="right").astype(object)
    cb = np.searchsorted(b, v, side="right").astype(object)
    s = sum(
        abs(ca[i] * len(b) - cb[i] * len(a)) * int(v[i + 1] - v[i])
        for i in range(len(v) - 1)
    )
    want = np.floor(s * 1.0 / (len(a) * len(b)) * 1e6) / 1e6
    assert out["emd_cents"].iloc[0] == want


def test_ks_matches_brute_max_gap():
    from theoremkb_ray.pipelines.relational import q_ks_test_cohorts

    out = _df(q_ks_test_cohorts(SF_DIR))
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "value"]
    )
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    u = ev.groupby("user_id")["c"].sum()
    a = np.sort(u[u.index % 2 == 0].to_numpy())
    b = np.sort(u[u.index % 2 == 1].to_numpy())
    v = np.unique(np.r_[a, b])
    gap = np.abs(
        np.searchsorted(a, v, side="right") * len(b)
        - np.searchsorted(b, v, side="right") * len(a)
    )
    want_d = np.floor(gap.max() * 1.0 / (len(a) * len(b)) * 1e6) / 1e6
    assert out["ks_d"].iloc[0] == want_d
    assert out["d_at_cents"].iloc[0] == int(v[np.argmax(gap)])


def test_attribution_linear_matches_per_purchase_loop():
    """Vectorized window counting vs a literal per-purchase loop."""
    from theoremkb_ray.pipelines.relational import q_attribution_linear

    out = _df(q_attribution_linear(SF_DIR)).set_index("event_type")
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
    W = 24 * 3600 * 1_000_000
    credit = {"click": 0, "view": 0, "unattributed": 0}
    for _, p in ev[ev["event_type"] == "purchase"].iterrows():
        w = ev[
            (ev["user_id"] == p["user_id"])
            & (ev["t"] < p["t"])
            & (ev["t"] >= p["t"] - W)
            & (ev["event_type"].isin(["click", "view"]))
        ]
        k = len(w)
        if k == 0:
            credit["unattributed"] += 1_000_000
        else:
            per = 1_000_000 // k
            credit["click"] += per * (w["event_type"] == "click").sum()
            credit["view"] += per * (w["event_type"] == "view").sum()
    for ty, want in credit.items():
        assert int(out.loc[ty, "credit_micro"]) == int(want), ty


def test_drawdown_matches_pandas_cummax():
    from theoremkb_ray.pipelines.relational import q_drawdown_users

    out = _df(q_drawdown_users(SF_DIR)).set_index("user_id")
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    ).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ev["c"] = (ev["value"] * 100).round().astype("int64")
    dd = ev.groupby("user_id")["c"].cummax() - ev["c"]
    want = dd.groupby(ev["user_id"]).max()
    assert len(out) == len(want)
    for uid, w in want.items():
        assert int(out.loc[uid, "max_drawdown_cents"]) == int(w)


def test_fim_transform_roundtrip(ray_session):
    """FIM rewrite is lossless: re-assembling prefix+middle+suffix
    from the sentinel-delimited output reproduces every original
    document; short docs pass through verbatim."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.relational import (
        FIM_MIN_LEN,
        q_fim_transform_docs,
    )

    sf = "/root/testdata/sf0.001"
    out = q_fim_transform_docs(sf).to_pandas().set_index("doc_id")
    orig = (
        pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(out) == len(orig)
    n_transformed = 0
    for did, row in out.iterrows():
        t = row["fim_text"]
        src = orig.loc[did, "text"]
        if len(src) < FIM_MIN_LEN:
            assert t == src
            continue
        assert t.startswith("<PRE>")
        pre, rest = t[5:].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == src
        assert len(mid) == len(src) // 3
        n_transformed += 1
    assert n_transformed > 0
