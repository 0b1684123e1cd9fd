"""Round-3 continued: TPC-H Q18/Q22/Q16 shapes, grouped mode, SCD2
interval build, seasonal-naive forecast scoring. Each test runs the
production query body over in-memory multi-block Datasets (the _pq
monkeypatch pattern of test_analytics2) against a literal pandas
reference."""

from __future__ import annotations

import numpy as np
import pandas as pd

import theoremkb_ray.pipelines.relational as rel
from test_analytics2 import _run


def _lineitem(rng, n_orders=60, max_lines=5):
    rows = []
    for ok in range(n_orders):
        for ln in range(int(rng.integers(1, max_lines + 1))):
            rows.append((ok, int(rng.integers(1, 30)), int(rng.integers(0, 9)),
                         float(rng.integers(1, 51))))
    return pd.DataFrame(
        rows, columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"]
    )


def test_q18_large_orders_vs_pandas():
    rng = np.random.default_rng(3)
    li = _lineitem(rng, n_orders=80, max_lines=12)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(80, dtype=np.int64),
            "o_custkey": rng.integers(0, 20, 80).astype(np.int64),
            "o_orderdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 300, 80), unit="D"),
            "o_totalprice": np.round(rng.uniform(100, 9000, 80), 2),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(20, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(20)],
        }
    )
    got = _run(
        rel.q_q18_large_orders,
        {"lineitem": li, "orders": orders, "customer": cust},
    ).sort_values("o_orderkey").reset_index(drop=True)

    qty = li.assign(q=li.l_quantity.round().astype(np.int64)).groupby(
        "l_orderkey"
    )["q"].sum()
    big = qty[qty > 300]
    want = (
        orders[orders.o_orderkey.isin(big.index)]
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .assign(total_qty=lambda d: d.o_orderkey.map(big))
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got.o_orderkey.to_numpy() == want.o_orderkey.to_numpy()).all()
    assert (got.total_qty.to_numpy() == want.total_qty.to_numpy()).all()
    assert (got.c_name.to_numpy() == want.c_name.to_numpy()).all()


def test_q22_wealthy_inactive_vs_pandas():
    rng = np.random.default_rng(4)
    n = 60
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(n, dtype=np.int64),
            "c_nationkey": rng.integers(0, 5, n).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-500, 5000, n), 2),
        }
    )
    orders = pd.DataFrame(
        {
            "o_custkey": rng.integers(0, n, 90).astype(np.int64),
            "o_orderpriority": rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM"], 90
            ),
        }
    )
    got = _run(
        rel.q_q22_wealthy_inactive, {"customer": cust, "orders": orders}
    )
    cents = np.rint(cust.c_acctbal * 100).astype(np.int64)
    pos = cents[cents > 0]
    urgent = set(orders[orders.o_orderpriority == "1-URGENT"].o_custkey)
    keep = (cents * len(pos) > pos.sum()) & ~cust.c_custkey.isin(urgent)
    want = (
        cust[keep]
        .assign(cents=cents[keep])
        .groupby("c_nationkey")
        .agg(n_cust=("c_custkey", "size"), sc=("cents", "sum"))
        .reset_index()
    )
    got = got.sort_values("c_nationkey").reset_index(drop=True)
    want = want.sort_values("c_nationkey").reset_index(drop=True)
    assert (got.n_cust.to_numpy() == want.n_cust.to_numpy()).all()
    assert np.allclose(
        got.total_bal.to_numpy(), np.round(want.sc.to_numpy() / 100, 2)
    )


def test_q16_variety_counts_distinct_and_excludes():
    rng = np.random.default_rng(5)
    li = _lineitem(rng, n_orders=50, max_lines=6)
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(30, dtype=np.int64),
            "p_brand": [f"Brand#{i % 4}" for i in range(30)],
            "p_size": (np.arange(30) % 7).astype(np.int32),
        }
    )
    supp = pd.DataFrame(
        {
            "s_suppkey": np.arange(9, dtype=np.int64),
            "s_acctbal": [100.0, -5.0, 30.0, 7.0, -1.0, 9.0, 2.0, 4.0, 8.0],
        }
    )
    got = _run(
        rel.q_q16_part_variety,
        {"lineitem": li, "part": part, "supplier": supp},
    )
    bad = {1, 4}
    pairs = li[~li.l_suppkey.isin(bad)][
        ["l_partkey", "l_suppkey"]
    ].drop_duplicates()
    m = pairs.merge(part, left_on="l_partkey", right_on="p_partkey")
    want = (
        m.groupby(["p_brand", "p_size"])["l_suppkey"]
        .nunique()
        .reset_index(name="supplier_cnt")
    )
    got = got.sort_values(["p_brand", "p_size"]).reset_index(drop=True)
    want = want.sort_values(["p_brand", "p_size"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got.supplier_cnt.to_numpy() == want.supplier_cnt.to_numpy()).all()


def _events(rng, n=400, users=12):
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 3_600_000, n)), unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
        }
    )


def test_mode_event_users_tie_breaks_lexicographic():
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "event_type": ["b", "b", "a", "a", "c", "c"],
        }
    )
    got = _run(rel.q_mode_event_users, {"events": ev}).sort_values(
        "user_id"
    )
    assert got.mode_type.tolist() == ["a", "c"]
    assert got.n.tolist() == [2, 2]


def test_scd2_intervals_vs_literal():
    rng = np.random.default_rng(6)
    ev = _events(rng, n=300, users=8)
    got = _run(rel.q_scd2_users, {"events": ev})
    # literal per-user run-length encoding
    rows = []
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        typ = g.event_type.to_numpy()
        ts = g.ts.dt.strftime("%Y-%m-%d %H:%M:%S.%f").to_numpy()
        start = np.ones(len(typ), bool)
        start[1:] = typ[1:] != typ[:-1]
        s_ts = ts[start]
        for i, (t0, ty) in enumerate(zip(s_ts, typ[start])):
            t1 = s_ts[i + 1] if i + 1 < len(s_ts) else ""
            rows.append((uid, ty, t0, t1))
    want = pd.DataFrame(
        rows, columns=["user_id", "event_type", "valid_from", "valid_to"]
    )
    key = ["user_id", "valid_from"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    for c in want.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # every non-open interval closes exactly at the next one's start
    g1 = got[got.valid_to != ""]
    assert (g1.groupby("user_id").size() + 1).sum() == len(got) + 0


def test_seasonal_mae_vs_literal():
    rng = np.random.default_rng(7)
    n = 2000
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 96 * 3600, n), unit="s"
    )
    ev = pd.DataFrame(
        {"event_type": rng.choice(["x", "y"], n), "ts": ts}
    )
    got = _run(rel.q_seasonal_mae_events, {"events": ev}).set_index(
        "event_type"
    )
    c = (
        ev.assign(h=ev.ts.dt.floor("h"))
        .groupby(["event_type", "h"])
        .size()
        .reset_index(name="n")
    )
    for typ, g in c.groupby("event_type"):
        m = g.merge(
            g.assign(h=g.h + pd.Timedelta(hours=24)), on="h", how="inner"
        )
        assert got.loc[typ, "n_hours"] == len(m)
        assert got.loc[typ, "sum_abs_err"] == int(
            (m.n_x - m.n_y).abs().sum()
        )


def test_cdc_chunks_vs_literal_brute():
    rng = np.random.default_rng(11)
    vocab = ["alpha", "bb", "see", "dd", "echo", "fox", "gg", "hotel"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(5, 40)))
        for _ in range(25)
    ]
    # plant one exact shared run so cross-doc dups exist
    texts[3] = texts[7] = "alpha bb see dd echo fox gg hotel alpha bb"
    docs = pd.DataFrame(
        {"doc_id": np.arange(25, dtype=np.int64), "text": texts}
    )
    got = (
        _run(rel.q_cdc_chunks_docs, {"documents": docs})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def chunks(t):
        out, cur = [], []
        for w in t.split(" "):
            cur.append(w)
            if (31 * len(w) + ord(w[0])) % 8 == 0:
                out.append(tuple(cur))
                cur = []
        if cur:
            out.append(tuple(cur))
        return [
            (
                len(c),
                sum(
                    (i + 1)
                    * (len(w) * 1000003 + ord(w[0]) * 31 + ord(w[-1]))
                    for i, w in enumerate(c)
                ),
            )
            for c in out
        ]

    per_doc = {d: chunks(t) for d, t in zip(docs.doc_id, docs.text)}
    owners: dict = {}
    for d, cs in per_doc.items():
        for key in set(cs):
            owners.setdefault(key, set()).add(d)
    for _, row in got.iterrows():
        cs = per_doc[row.doc_id]
        assert row.n_chunks == len(cs)
        assert row.n_dup_chunks == sum(
            1 for key in cs if len(owners[key]) > 1
        )
    # the planted pair actually produced cross-doc duplicates
    assert got.set_index("doc_id").loc[3, "n_dup_chunks"] > 0


def test_abandoned_clicks_vs_literal():
    ts0 = pd.Timestamp("2024-02-01")
    rows = [
        # user 1: click then purchase 30 min later -> converted
        (1, ts0, "click"),
        (1, ts0 + pd.Timedelta(minutes=30), "purchase"),
        # user 1: click with purchase 2h later -> abandoned
        (1, ts0 + pd.Timedelta(hours=5), "click"),
        (1, ts0 + pd.Timedelta(hours=7), "purchase"),
        # user 2: click, purchase at EXACTLY +1h -> converted (<=)
        (2, ts0, "click"),
        (2, ts0 + pd.Timedelta(hours=1), "purchase"),
        # user 2: click, purchase at same instant -> NOT within (t, t+1h]
        (2, ts0 + pd.Timedelta(days=1), "click"),
        (2, ts0 + pd.Timedelta(days=1), "purchase"),
        # user 3: click, no purchase at all
        (3, ts0 + pd.Timedelta(days=1, hours=2), "click"),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    got = (
        _run(rel.q_abandoned_clicks, {"events": ev})
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert got.day.tolist() == ["2024-02-01", "2024-02-02"]
    assert got.n_clicks.tolist() == [3, 2]
    assert got.n_abandoned.tolist() == [1, 2]


def test_fk_orphans_detects_planted():
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 99, 99, 98],  # 98,99 orphaned
            "l_partkey": [10, 11, 10, 11, 10, 11],
            "l_suppkey": [5, 5, 6, 6, 5, 6],
        }
    )
    orders = pd.DataFrame(
        {"o_orderkey": [1, 2, 3], "o_custkey": [7, 7, 777]}  # 777 orphan
    )
    part = pd.DataFrame({"p_partkey": [10, 11]})
    supp = pd.DataFrame({"s_suppkey": [5, 6]})
    cust = pd.DataFrame({"c_custkey": [7], "c_nationkey": [0]})
    nation = pd.DataFrame({"n_nationkey": [0]})
    got = _run(
        rel.q_fk_orphans,
        {
            "lineitem": li,
            "orders": orders,
            "part": part,
            "supplier": supp,
            "customer": cust,
            "nation": nation,
        },
    ).set_index("relation")
    r = got.loc["lineitem.l_orderkey->orders"]
    assert (r.n_rows, r.n_orphan_rows, r.n_orphan_keys) == (6, 3, 2)
    r = got.loc["orders.o_custkey->customer"]
    assert (r.n_rows, r.n_orphan_rows, r.n_orphan_keys) == (3, 1, 1)
    assert got.loc["lineitem.l_partkey->part"].n_orphan_rows == 0
    assert got.loc["customer.c_nationkey->nation"].n_orphan_rows == 0


def test_unpivot_nation_stats_shape():
    cust = pd.DataFrame(
        {
            "c_nationkey": np.array([0, 0, 1], np.int32),
            "c_acctbal": [10.0, -2.5, 7.25],
        }
    )
    got = _run(rel.q_unpivot_nation_stats, {"customer": cust})
    g = got.set_index(["c_nationkey", "metric"])["value"]
    assert g.loc[(0, "n_cust")] == 2
    assert g.loc[(0, "bal_cents")] == 750
    assert g.loc[(0, "n_neg")] == 1
    assert g.loc[(1, "bal_cents")] == 725
    assert len(got) == 6
