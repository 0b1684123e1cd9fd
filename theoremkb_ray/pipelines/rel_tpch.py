"""TPC-H-shaped decision-support queries (customer/orders/lineitem/part/supplier/nation/region tables).

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
    _by_user_bucket,
    _date_us,
    _round_cols,
)
from . import relcore as _relcore


def _pq(sf_dir, table, columns=None):
    # late-bound so tests can monkeypatch relcore._pq in
    # ONE place and every domain module sees it
    return _relcore._pq(sf_dir, table, columns)


# --------------------------------------------------------------- queries


def q_groupby_agg(sf_dir: str):
    """A1/A6: grouped aggregate (TPC-H Q1 shape); partial+final."""
    ds = _pq(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_price"),
        Mean("l_discount", alias_name="avg_disc"),
        Count(alias_name="n"),
    )
    return out.map_batches(
        _round_cols({"sum_qty": 2, "sum_price": 2, "avg_disc": 6}),
        batch_format="pyarrow",
    )


SQL_GROUPBY_AGG = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price,
       round(avg(l_discount), 6)      AS avg_disc,
       count(*)                       AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_sort_limit(sf_dir: str):
    """O1/O2: global deterministic top-k."""
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(10)


SQL_SORT_LIMIT = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_topk_per_group(sf_dir: str):
    """O6: top-3 rows per group (stratified head)."""
    ds = _pq(sf_dir, "customer", ["c_mktsegment", "c_custkey", "c_acctbal"])

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True], kind="mergesort"
        ).head(3)

    return ds.groupby("c_mktsegment").map_groups(top3, batch_format="pandas")


SQL_TOPK_PER_GROUP = """
SELECT c_mktsegment, c_custkey, c_acctbal FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer) WHERE rn <= 3
"""


def q_broadcast_join(sf_dir: str):
    """J6: broadcast hash join (customer is the small side)."""
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust_tbl = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    joined = broadcast_join(
        orders, cust_tbl, on=["o_custkey"], right_on=["c_custkey"]
    )

    # partial aggregation inside the map stage: the shuffle moves
    # ~|segments| rows per block instead of every joined row
    def partial(b: pa.Table) -> pa.Table:
        return pa.TableGroupBy(b, "c_mktsegment").aggregate(
            [("o_totalprice", "count"), ("o_totalprice", "sum")]
        )

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("o_totalprice_count", alias_name="n"),
            Sum("o_totalprice_sum", alias_name="total"),
        )
    )
    return out.map_batches(_round_cols({"total": 2}), batch_format="pyarrow")


SQL_BROADCAST_JOIN = """
SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_hash_join(sf_dir: str):
    """J6 at scale: hash-partitioned join of two large tables."""
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    li = li.map_batches(
        lambda b: b.append_column(
            "revenue",
            pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])),
        ),
        batch_format="pyarrow",
    )
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    joined = hash_join(
        li, orders, on=["l_orderkey"], right_on=["o_orderkey"], num_partitions=8
    )
    out = joined.groupby("o_orderstatus").aggregate(
        Sum("revenue", alias_name="revenue"), Count(alias_name="n")
    )
    return out.map_batches(_round_cols({"revenue": 2}), batch_format="pyarrow")


SQL_HASH_JOIN = """
SELECT o_orderstatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


def q_semi_join(sf_dir: str, shuffle: bool = False):
    """J2/J3 semi-join: customers having orders, per nation.

    ``shuffle=True`` takes the DISTRIBUTED path (hash-partitioned
    ``Dataset.join`` with join_type=left_semi) — the fallback for a key
    side too large to collect + broadcast; the default broadcast path
    is the right plan while the distinct key side is small."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    keys = (
        _pq(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
    )
    if shuffle:
        out = hash_join(
            cust, keys, on=["c_custkey"], right_on=["o_custkey"], how="semi"
        )
    else:
        out = broadcast_join(
            cust, keys.to_pandas(), on=["c_custkey"], right_on=["o_custkey"],
            how="semi",
        )
    return out.groupby("c_nationkey").aggregate(Count(alias_name="n"))


SQL_SEMI_JOIN = """
SELECT c_nationkey, count(*) AS n FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_nationkey
"""


def q_anti_join(sf_dir: str, shuffle: bool = False):
    """M24 anti-join: customers with NO high-value order, per segment.

    ``shuffle=True``: distributed left_anti ``Dataset.join`` (see
    :func:`q_semi_join`)."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = (
        _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            lambda b: b.filter(pc.greater(b["o_totalprice"], 400000.0)),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
    )
    if shuffle:
        out = hash_join(
            cust, keys, on=["c_custkey"], right_on=["o_custkey"], how="anti"
        )
    else:
        out = broadcast_join(
            cust, keys.to_pandas(), on=["c_custkey"], right_on=["o_custkey"],
            how="anti",
        )
    return out.groupby("c_mktsegment").aggregate(Count(alias_name="n"))


SQL_ANTI_JOIN = """
SELECT c_mktsegment, count(*) AS n FROM customer
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
GROUP BY c_mktsegment
"""


def q_filter_project(sf_dir: str):
    """M17/M18 + M-map: vectorized predicate + computed column."""
    ds = _pq(
        sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_extendedprice"]
    )

    def fn(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less(b["l_shipdate"], pa.scalar(np.datetime64("1996-01-01", "us"))),
            pc.and_(
                pc.greater_equal(b["l_discount"], 0.02),
                pc.less_equal(b["l_discount"], 0.06),
            ),
        )
        b = b.filter(keep)
        rev = pc.multiply(b["l_extendedprice"], b["l_discount"])
        return pa.table({"revenue": rev})

    out = ds.map_batches(fn, batch_format="pyarrow").sum("revenue")
    return pd.DataFrame({"revenue": [round(out, 2)]})


SQL_FILTER_PROJECT = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
"""


def q_multi_join(sf_dir: str):
    """J10-shape: customer |x| nation |x| region (broadcast chain)."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    nation = (
        _pq(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    )
    region = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    j = broadcast_join(
        cust, nation, on=["c_nationkey"], right_on=["n_nationkey"]
    )
    j = broadcast_join(
        j, region, on=["n_regionkey"], right_on=["r_regionkey"]
    )
    out = j.groupby("r_name").aggregate(
        Count(alias_name="n"), Sum("c_acctbal", alias_name="total_bal")
    )
    return out.map_batches(
        _round_cols({"total_bal": 2}), batch_format="pyarrow"
    )


SQL_MULTI_JOIN = """
SELECT r_name, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_stats_agg(sf_dir: str):
    """A1-style rollup stats: std/min/max per group (partial+final)."""
    from ray.data.aggregate import Max, Min, Std

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    out = ds.groupby("l_returnflag").aggregate(
        Std("l_quantity", alias_name="std_qty"),
        Min("l_quantity", alias_name="min_qty"),
        Max("l_quantity", alias_name="max_qty"),
    )
    return out.map_batches(
        _round_cols({"std_qty": 4, "min_qty": 4, "max_qty": 4}),
        batch_format="pyarrow",
    )


SQL_STATS_AGG = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS std_qty,
       round(min(l_quantity), 4)         AS min_qty,
       round(max(l_quantity), 4)         AS max_qty
FROM lineitem GROUP BY l_returnflag
"""


def q_rank_per_group(sf_dir: str):
    """Window rank with gaps (RANK()): top-10 customers per market
    segment by account balance; ties share a rank and the next rank
    skips. 5 segments -> 5 groups; within-group rank is one sorted
    numpy pass (no per-row Python)."""
    ds = _pq(sf_dir, "customer", ["c_mktsegment", "c_custkey", "c_acctbal"])

    def per_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True], kind="mergesort"
        )
        bal = g["c_acctbal"].to_numpy()
        n = len(bal)
        pos = np.arange(1, n + 1, dtype=np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = bal[1:] != bal[:-1]
        rank = pos[new][np.cumsum(new) - 1]  # RANK(): first pos of the tie run
        keep = rank <= 10
        return pd.DataFrame(
            {
                "c_mktsegment": g["c_mktsegment"].to_numpy()[keep],
                "c_custkey": g["c_custkey"].to_numpy()[keep],
                "acct_rank": rank[keep],
            }
        )

    return ds.groupby("c_mktsegment").map_groups(per_seg, batch_format="pandas")


SQL_RANK_PER_GROUP = """
SELECT c_mktsegment, c_custkey, acct_rank FROM (
  SELECT c_mktsegment, c_custkey,
         rank() OVER (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC) AS acct_rank
  FROM customer) WHERE acct_rank <= 10
"""


def q_rollup_grouping(sf_dir: str):
    """GROUP BY ROLLUP (grouping sets): revenue + order counts at
    (status, priority), (status) and grand-total levels. ONE
    distributed partial+final groupby at the finest level; the coarser
    levels re-aggregate that TINY result driver-side — never a second
    corpus pass (15 fine rows stand in for 15k orders; at 100 TB the
    fine level is |status| x |priority| rows, still driver-safe)."""
    ds = _pq(
        sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )
    fine = (
        ds.groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(
            Sum("o_totalprice", alias_name="revenue"),
            Count(alias_name="n"),
        )
        .to_pandas()
    )
    mid = fine.groupby("o_orderstatus", as_index=False).agg(
        revenue=("revenue", "sum"), n=("n", "sum")
    )
    mid["o_orderpriority"] = None
    top = pd.DataFrame(
        {
            "o_orderstatus": [None],
            "o_orderpriority": [None],
            "revenue": [fine["revenue"].sum()],
            "n": [fine["n"].sum()],
        }
    )
    out = pd.concat([fine, mid, top], ignore_index=True)
    out["revenue"] = out["revenue"].round(2)
    out["n"] = out["n"].astype("int64")
    return out[["o_orderstatus", "o_orderpriority", "revenue", "n"]]


SQL_ROLLUP_GROUPING = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS revenue,
       count(*)                    AS n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_quantiles_group(sf_dir: str):
    """Exact grouped order statistics (median / p90, linear
    interpolation) — the reference's min/max/std rollup family
    (paper/features.py:109-150) extended to quantiles. 5 priority
    groups; the per-group sort is one numpy C kernel. (An exact global
    quantile at 100 TB would use the partitioned two-pass
    select-then-scan form; per-group here each group fits a task.)"""
    ds = _pq(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def per_grp(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["o_totalprice"].to_numpy())
        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]],
                "median_price": [
                    np.round(np.quantile(v, 0.5, method="linear"), 4)
                ],
                "p90_price": [
                    np.round(np.quantile(v, 0.9, method="linear"), 4)
                ],
            }
        )

    return ds.groupby("o_orderpriority").map_groups(
        per_grp, batch_format="pandas"
    )


SQL_QUANTILES_GROUP = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders GROUP BY o_orderpriority
"""


def q_global_quantiles(sf_dir: str):
    """EXACT global quantiles (median / p99) without a global sort:
    the classic two-pass histogram selection. Pass 1 = min/max/count
    (partial+final aggregate); pass 2 = per-batch 4096-bucket partial
    histograms merged in a tiny groupby; then ONLY the buckets holding
    the target ranks are collected (a ~1/4096 slice of the data) and
    the order statistic is interpolated exactly. At 100 TB a global
    ``sort`` is the single most expensive exchange there is — this
    touches each row twice with map-only passes plus one tiny
    collect."""
    from ray.data.aggregate import Count, Max, Min

    B = 4096
    col = "l_extendedprice"
    ds = _pq(sf_dir, "lineitem", [col])
    stats = ds.aggregate(
        Min(col, alias_name="lo"),
        Max(col, alias_name="hi"),
        Count(alias_name="n"),
    )
    lo, hi, n = float(stats["lo"]), float(stats["hi"]), int(stats["n"])
    span = max(hi - lo, 1e-300)

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) / span * B).astype(np.int64), 0, B - 1)

    def hist(b: pa.Table) -> pa.Table:
        c = np.bincount(
            bucket_of(b[col].to_numpy(zero_copy_only=False)), minlength=B
        )
        nzi = np.flatnonzero(c)
        return pa.table(
            {"bucket": pa.array(nzi), "n": pa.array(c[nzi].astype(np.int64))}
        )

    htbl = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )  # <= B rows regardless of data size
    counts = np.zeros(B, dtype=np.int64)
    counts[htbl["bucket"].to_numpy()] = htbl["n"].to_numpy()
    cum = np.cumsum(counts)  # cum[b] = #values in buckets <= b
    ranks: list[int] = []
    for q in (0.5, 0.99):
        pos = q * (n - 1)
        ranks += [int(np.floor(pos)), int(np.ceil(pos))]
    need_buckets = {int(np.searchsorted(cum, r + 1)) for r in ranks}

    def pick(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        keep = np.isin(bucket_of(v), list(need_buckets))
        return pa.table({col: pa.array(v[keep], pa.float64())})

    cand = np.sort(
        ds.map_batches(pick, batch_format="pyarrow")
        .to_pandas()[col]
        .to_numpy()
    )
    cand_bucket = bucket_of(cand)

    def value_at(rank: int) -> float:
        b = int(np.searchsorted(cum, rank + 1))
        before = int(cum[b - 1]) if b > 0 else 0
        within = rank - before  # rank among this bucket's values
        offset = int(np.searchsorted(cand_bucket, b))
        return float(cand[offset + within])

    rows = []
    for q in (0.5, 0.99):
        pos = q * (n - 1)
        lo_r, hi_r = int(np.floor(pos)), int(np.ceil(pos))
        vlo, vhi = value_at(lo_r), value_at(hi_r)
        rows.append((q, round(vlo + (pos - lo_r) * (vhi - vlo), 4)))
    return pd.DataFrame(
        {"q": [r[0] for r in rows], "price": [r[1] for r in rows]}
    )


SQL_GLOBAL_QUANTILES = """
SELECT CAST(0.5 AS DOUBLE) AS q,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS price
FROM lineitem
UNION ALL
SELECT CAST(0.99 AS DOUBLE) AS q,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS price
FROM lineitem
"""


def q_corr_agg(sf_dir: str):
    """Grouped Pearson correlation corr(l_quantity, l_extendedprice)
    per returnflag, via numerically-stable TWO-PASS sums: pass 1 =
    grouped means (partial+final groupby, tiny result broadcast);
    pass 2 = per-block centered-product partials merged by a tiny
    final groupby. corr = sxy / sqrt(sxx * syy) — the (n-1) factors
    cancel, so it equals SQL's covar_samp/(stddev*stddev) to well
    below the rounding margin."""
    cols = ["l_returnflag", "l_quantity", "l_extendedprice"]
    ds = _pq(sf_dir, "lineitem", cols)
    means = (
        ds.groupby("l_returnflag")
        .aggregate(
            Mean("l_quantity", alias_name="mq"),
            Mean("l_extendedprice", alias_name="mp"),
        )
        .to_pandas()
    )  # |returnflag| rows — broadcast-safe at any scale
    mq = dict(zip(means["l_returnflag"], means["mq"]))
    mp = dict(zip(means["l_returnflag"], means["mp"]))

    def partials(b: pa.Table) -> pa.Table:
        flags = b["l_returnflag"].to_numpy(zero_copy_only=False)
        q = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = (
            b["l_extendedprice"]
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        codes, uniq = pd.factorize(flags)
        dq = q - np.array([mq[f] for f in uniq])[codes]
        dp = p - np.array([mp[f] for f in uniq])[codes]
        return pa.table(
            {
                "l_returnflag": pa.array(uniq),
                "sxy": pa.array(np.bincount(codes, dq * dp)),
                "sxx": pa.array(np.bincount(codes, dq * dq)),
                "syy": pa.array(np.bincount(codes, dp * dp)),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        sxx = b["sxx"].to_numpy(zero_copy_only=False)
        syy = b["syy"].to_numpy(zero_copy_only=False)
        corr = np.round(sxy / np.sqrt(sxx * syy), 6)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "corr_qty_price": pa.array(corr, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_CORR_AGG = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag
"""


def _bloom_sides(sf_dir: str):
    part = _pq(sf_dir, "part", ["p_partkey", "p_size"])
    heavy = _pq(sf_dir, "lineitem", ["l_partkey", "l_quantity"]).map_batches(
        lambda b: b.filter(pc.greater_equal(b["l_quantity"], 48)),
        batch_format="pyarrow",
    )
    return part, heavy


def q_bloom_semi(sf_dir: str):
    """Bloom-prefiltered distributed semi join
    (stages/joins.py:bloom_semi_join): parts with any heavy lineitem.
    The 512 KiB bitmap prunes the probe side before the
    hash-partitioned exact verify — output is bit-for-bit the exact
    semi join (Bloom has no false negatives; false positives die in
    the verify shuffle)."""
    from ..stages.joins import bloom_semi_join

    part, heavy = _bloom_sides(sf_dir)
    return bloom_semi_join(
        part, heavy, on="p_partkey", right_on="l_partkey", how="semi"
    )


SQL_BLOOM_SEMI = """
SELECT p_partkey, p_size FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
"""


def q_bloom_anti(sf_dir: str):
    """Bloom-prefiltered anti join: definite non-members pass the
    bitmap immediately; only the maybes pay the exact anti shuffle."""
    from ..stages.joins import bloom_semi_join

    part, heavy = _bloom_sides(sf_dir)
    return bloom_semi_join(
        part, heavy, on="p_partkey", right_on="l_partkey", how="anti"
    )


SQL_BLOOM_ANTI = """
SELECT p_partkey, p_size FROM part
WHERE p_partkey NOT IN
  (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
"""


def q_skew_join(sf_dir: str):
    """Salted skew join (stages/joins.py:skew_join): lineitem ⋈
    supplier on suppkey with the 10 busiest suppliers explicitly
    salted 8 ways — their row sets split across 8 (key, salt)
    partitions instead of landing on one aggregator. The salt never
    changes membership, so the result equals the plain inner join;
    verified through a per-nation revenue rollup."""
    from ..stages.joins import skew_join

    li = _pq(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    hot = [str(k) for k in range(10)]
    joined = skew_join(
        li, supp, on="l_suppkey", right_on="s_suppkey",
        salt=8, hot_keys=hot,
    )
    agg = joined.groupby("s_nationkey").aggregate(
        Sum("l_extendedprice", alias_name="revenue")
    )
    return agg.map_batches(
        lambda b: b.set_column(
            b.column_names.index("revenue"),
            "revenue",
            pc.round(b["revenue"], ndigits=2),
        ),
        batch_format="pyarrow",
    )


SQL_SKEW_JOIN = """
SELECT s_nationkey, round(sum(l_extendedprice), 2) AS revenue
FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_nationkey
"""


def q_outer_join(sf_dir: str):
    """FULL OUTER equi-join through Ray's hash-partitioned join:
    high-value orders x a customer subset; unmatched rows from BOTH
    sides survive with nulls. Aggregated to match-status counts so
    the null-typed tails hash stably."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: b.filter(pc.less(b["c_custkey"], 500)),
        batch_format="pyarrow",
    )
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], 300000.0)),
        batch_format="pyarrow",
    )
    joined = hash_join(
        orders, cust, on=["o_custkey"], right_on=["c_custkey"],
        how="full_outer",
    )

    def status(b: pa.Table) -> pa.Table:
        has_order = pc.is_valid(b["o_totalprice"])
        has_cust = pc.is_valid(b["c_nationkey"])
        code = pc.add(
            pc.cast(has_order, pa.int64()),
            pc.multiply(pc.cast(has_cust, pa.int64()), 2),
        )
        return pa.table({"status": code})

    return (
        joined.map_batches(status, batch_format="pyarrow")
        .groupby("status")
        .aggregate(Count(alias_name="n"))
        .sort("status")
    )


SQL_OUTER_JOIN = """
WITH c AS (
  SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey < 500
),
o AS (
  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000
)
SELECT CAST((o.o_totalprice IS NOT NULL)::INT
            + 2 * (c.c_nationkey IS NOT NULL)::INT AS BIGINT) AS status,
       count(*) AS n
FROM o FULL OUTER JOIN c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


def q_ntile(sf_dir: str):
    """NTILE(4) by total price within each order priority — exact SQL
    bucket-size semantics (first n%4 buckets one row larger),
    vectorized per group via searchsorted over bucket boundaries."""
    orders = _pq(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def tile(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_totalprice", "o_orderkey"], kind="mergesort"
        ).reset_index(drop=True)
        n, b = len(g), 4
        size, extra = divmod(n, b)
        bounds = np.cumsum(
            [size + 1 if i < extra else size for i in range(b)]
        )
        g["tile"] = (
            np.searchsorted(bounds, np.arange(n), side="right") + 1
        ).astype(np.int64)
        return g

    return orders.groupby("o_orderpriority").map_groups(
        tile, batch_format="pandas"
    )


SQL_NTILE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS BIGINT)
         AS tile
FROM orders
"""


def q_percentile_rank(sf_dir: str):
    """PERCENT_RANK of order value within priority: exact SQL
    semantics (rank-1)/(n-1), vectorized per group."""
    orders = _pq(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def pr(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_totalprice", "o_orderkey"], kind="mergesort"
        ).reset_index(drop=True)
        n = len(g)
        # RANK() with gaps over o_totalprice alone
        vals = g["o_totalprice"].to_numpy()
        first = np.r_[True, vals[1:] != vals[:-1]]
        rank = np.arange(1, n + 1)[first][np.cumsum(first) - 1]
        g["prank"] = np.round(
            (rank - 1) / (n - 1) if n > 1 else np.zeros(n), 6
        )
        return g

    return orders.groupby("o_orderpriority").map_groups(
        pr, batch_format="pandas"
    )


SQL_PERCENTILE_RANK = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       round(percent_rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice), 6) AS prank
FROM orders
"""


def q_cross_join(sf_dir: str):
    """CROSS JOIN of two small dimension tables (region x nation) —
    the only join shape where broadcast is the ONLY sane plan; the
    broadcast side rides the object store once per worker."""
    region = _pq(sf_dir, "region", ["r_regionkey", "r_name"])
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()

    def cross(b: pd.DataFrame) -> pd.DataFrame:
        return b.merge(nation, how="cross")

    return region.map_batches(cross, batch_format="pandas")


SQL_CROSS_JOIN = """
SELECT r_regionkey, r_name, n_nationkey, n_name
FROM region CROSS JOIN nation
"""


def q_histogram(sf_dir: str):
    """Fixed-bin histogram of order totals: per-batch bincount
    partials over width_bucket boundaries -> one tiny groupby. Only
    (bin, count) partial rows ever move."""
    orders = _pq(sf_dir, "orders", ["o_totalprice"])
    LO, HI, BINS = 0.0, 600_000.0, 24
    width = (HI - LO) / BINS

    def partial(b: pa.Table) -> pa.Table:
        x = b["o_totalprice"].to_numpy(zero_copy_only=False)
        # width_bucket semantics: bin 0 = below LO, BINS+1 = >= HI
        bins = np.clip(
            np.floor((x - LO) / width).astype(np.int64) + 1, 0, BINS + 1
        )
        bins[x >= HI] = BINS + 1
        u, c = np.unique(bins, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(u, pa.int64()),
                "n": pa.array(c, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(_Sum("n", alias_name="n"))
    )


SQL_HISTOGRAM = """
SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 600000 THEN 25
            ELSE floor(o_totalprice / 25000.0) + 1 END AS BIGINT) AS bin,
       count(*) AS n
FROM orders GROUP BY 1
"""


def q_describe_stats(sf_dir: str):
    """One-pass table profiling (stages/profile.py:describe): the
    EXACT numeric stats (count/nulls/min/max/mean/stddev_pop) of
    selected lineitem columns, long form — mergeable Welford moments,
    one streamed pass for all columns together. The HLL distinct
    estimate describe() also returns is approximate and excluded from
    the hash check (tested separately)."""
    from ..stages.profile import describe

    li = _pq(
        sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"]
    )
    df = describe(li)
    rows = []
    for _, r in df.iterrows():
        for stat in ["n", "n_null", "min", "max", "mean", "std"]:
            rows.append(
                {
                    "col": r["column"],
                    "stat": stat,
                    "value": round(float(r[stat]), 6),
                }
            )
    return pd.DataFrame(rows)


SQL_DESCRIBE_STATS = """
WITH s AS (
  SELECT 'l_quantity' AS col,
         CAST(count(l_quantity) AS DOUBLE) AS n,
         CAST(count(*) - count(l_quantity) AS DOUBLE) AS n_null,
         CAST(min(l_quantity) AS DOUBLE) AS mn,
         CAST(max(l_quantity) AS DOUBLE) AS mx,
         avg(CAST(l_quantity AS DOUBLE)) AS mean,
         stddev_pop(CAST(l_quantity AS DOUBLE)) AS std
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', CAST(count(l_extendedprice) AS DOUBLE),
         CAST(count(*) - count(l_extendedprice) AS DOUBLE),
         CAST(min(l_extendedprice) AS DOUBLE),
         CAST(max(l_extendedprice) AS DOUBLE),
         avg(CAST(l_extendedprice AS DOUBLE)),
         stddev_pop(CAST(l_extendedprice AS DOUBLE))
  FROM lineitem
  UNION ALL
  SELECT 'l_discount', CAST(count(l_discount) AS DOUBLE),
         CAST(count(*) - count(l_discount) AS DOUBLE),
         CAST(min(l_discount) AS DOUBLE),
         CAST(max(l_discount) AS DOUBLE),
         avg(CAST(l_discount AS DOUBLE)),
         stddev_pop(CAST(l_discount AS DOUBLE))
  FROM lineitem
)
SELECT col, u.stat, round(u.value, 6) AS value
FROM s, LATERAL (VALUES ('n', n), ('n_null', n_null), ('min', mn),
                 ('max', mx), ('mean', mean), ('std', std))
         AS u(stat, value)
"""


REGISTRY.update({'groupby_agg': (q_groupby_agg, SQL_GROUPBY_AGG)})


REGISTRY.update({'sort_limit': (q_sort_limit, SQL_SORT_LIMIT)})


REGISTRY.update({'topk_per_group': (q_topk_per_group, SQL_TOPK_PER_GROUP)})


REGISTRY.update({'broadcast_join': (q_broadcast_join, SQL_BROADCAST_JOIN)})


REGISTRY.update({'hash_join': (q_hash_join, SQL_HASH_JOIN)})


REGISTRY.update({'semi_join': (q_semi_join, SQL_SEMI_JOIN)})


REGISTRY.update({'anti_join': (q_anti_join, SQL_ANTI_JOIN)})


REGISTRY.update({'filter_project': (q_filter_project, SQL_FILTER_PROJECT)})


REGISTRY.update({'multi_join': (q_multi_join, SQL_MULTI_JOIN)})


REGISTRY.update({'stats_agg': (q_stats_agg, SQL_STATS_AGG)})


REGISTRY.update({'rank_per_group': (q_rank_per_group, SQL_RANK_PER_GROUP)})


REGISTRY.update({'rollup_grouping': (q_rollup_grouping, SQL_ROLLUP_GROUPING)})


REGISTRY.update({'quantiles_group': (q_quantiles_group, SQL_QUANTILES_GROUP)})


REGISTRY.update({'global_quantiles': (q_global_quantiles, SQL_GLOBAL_QUANTILES)})


REGISTRY.update({'corr_agg': (q_corr_agg, SQL_CORR_AGG)})


REGISTRY.update({'bloom_semi': (q_bloom_semi, SQL_BLOOM_SEMI)})


REGISTRY.update({'bloom_anti': (q_bloom_anti, SQL_BLOOM_ANTI)})


REGISTRY.update({'skew_join': (q_skew_join, SQL_SKEW_JOIN)})


REGISTRY.update({'outer_join': (q_outer_join, SQL_OUTER_JOIN)})


REGISTRY.update({'ntile': (q_ntile, SQL_NTILE)})


REGISTRY.update({'percentile_rank': (q_percentile_rank, SQL_PERCENTILE_RANK)})


REGISTRY.update({'cross_join': (q_cross_join, SQL_CROSS_JOIN)})


REGISTRY.update({'histogram': (q_histogram, SQL_HISTOGRAM)})


REGISTRY.update({'describe_stats': (q_describe_stats, SQL_DESCRIBE_STATS)})


def q_regression_group(sf_dir: str):
    """Grouped ordinary-least-squares fit (price ~ quantity per
    returnflag) via the corr_agg two-pass shape: pass 1 = grouped
    means (tiny result broadcast), pass 2 = per-block CENTERED
    (sxy, sxx) partials merged by a tiny groupby — slope = sxy/sxx,
    intercept = mean_y - slope*mean_x. Numerically matches DuckDB's
    regr_slope/regr_intercept to well below the 6-dp margin (the
    uncentered normal-equation form would not). Only stats-sized rows
    ever shuffle."""
    from ray.data.aggregate import Sum as _Sum

    cols = ["l_returnflag", "l_quantity", "l_extendedprice"]
    ds = _pq(sf_dir, "lineitem", cols)
    means = (
        ds.groupby("l_returnflag")
        .aggregate(
            Mean("l_quantity", alias_name="mq"),
            Mean("l_extendedprice", alias_name="mp"),
        )
        .to_pandas()
    )
    mq = dict(zip(means["l_returnflag"], means["mq"]))
    mp = dict(zip(means["l_returnflag"], means["mp"]))

    def partials(b: pa.Table) -> pa.Table:
        flags = b["l_returnflag"].to_numpy(zero_copy_only=False)
        x = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = (
            b["l_extendedprice"]
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        codes, uniq = pd.factorize(flags)
        dx = x - np.array([mq[f] for f in uniq])[codes]
        dy = y - np.array([mp[f] for f in uniq])[codes]
        return pa.table(
            {
                "l_returnflag": pa.array(uniq),
                "sxy": pa.array(np.bincount(codes, dx * dy)),
                "sxx": pa.array(np.bincount(codes, dx * dx)),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        f = b["l_returnflag"].to_numpy(zero_copy_only=False)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        sxx = b["sxx"].to_numpy(zero_copy_only=False)
        slope = sxy / sxx
        inter = np.array([mp[v] for v in f]) - slope * np.array(
            [mq[v] for v in f]
        )
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "slope": pa.array(np.round(slope, 6), pa.float64()),
                "intercept": pa.array(np.round(inter, 4), pa.float64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            _Sum("sxy", alias_name="sxy"), _Sum("sxx", alias_name="sxx")
        )
        .map_batches(finish, batch_format="pyarrow")
    )


SQL_REGRESSION_GROUP = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4)
         AS intercept
FROM lineitem GROUP BY l_returnflag
"""


REGISTRY.update({'regression_group': (q_regression_group, SQL_REGRESSION_GROUP)})


def q_lift_pairs(sf_dir: str):
    """Market-basket association mining: the top-15 part pairs
    co-occurring in the most orders, scored by lift = N * n12 /
    (n1 * n2). Scale shape: orders are hash-bucketed (an order's lines
    land in ONE bucket, so per-bucket drop_duplicates and the
    within-order self-merge are globally exact partials), pair counts
    pre-aggregate per bucket before the pair-keyed groupby-sum, and
    the per-part order counts + the distinct-order total ride the SAME
    bucketed pass via a sentinel part_id=-1 row (part catalogs are
    bounded, so collecting the per-part table to the driver for the
    15-row finisher is a broadcast-sized lookup, not a data-sized
    one)."""
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    bucketed = _by_user_bucket(li, col="l_orderkey")

    def pair_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = (
            m.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
            .size()
            .reset_index(name="n12")
        ).rename(columns={"l_partkey_x": "p1", "l_partkey_y": "p2"})
        # part order-counts + the bucket's distinct-order total ride
        # the SAME exchange as sentinel rows (p2 = -1 / p1 = -1):
        # orders are bucket-disjoint so these partials are exact, and
        # the part catalog is bounded so the finisher's driver-side
        # collect of the sentinel slice is broadcast-sized
        pc_ = (
            g.groupby("l_partkey", sort=False)
            .size()
            .reset_index(name="n12")
            .rename(columns={"l_partkey": "p1"})
        )
        pc_["p2"] = np.int64(-1)
        sent = pd.DataFrame(
            {
                "p1": np.array([-1], np.int64),
                "p2": np.array([-1], np.int64),
                "n12": np.array([g["l_orderkey"].nunique()], np.int64),
            }
        )
        return pd.concat(
            [out, pc_[["p1", "p2", "n12"]], sent], ignore_index=True
        )

    # pair-keyed reduction: pack (p1, p2) into ONE int64 and sum
    # inside 64 coarse hash buckets with numpy — Ray's generic
    # multi-key aggregate pays per-group overhead, and the pair key
    # is nearly unique here (~1 row per group), which turns that
    # overhead into the whole runtime (measured 135 s vs 3 s at
    # sf0.1 / 1.2M pair rows)
    def add_ppk(b: pa.Table) -> pa.Table:
        from ..functions.hashing import splitmix64

        # +1 offset keeps the -1 sentinels non-negative so the
        # shift/mask unpack is exact
        packed = (
            (b["p1"].to_numpy(zero_copy_only=False).astype(np.int64) + 1)
            * (1 << 32)
        ) + (b["p2"].to_numpy(zero_copy_only=False).astype(np.int64) + 1)
        bk = (
            splitmix64(packed.view(np.uint64))
            % np.uint64(COARSE_USER_BUCKETS)
        ).astype(np.int64)
        return pa.table(
            {
                "ppk": pa.array(packed, pa.int64()),
                "n12": pc.cast(b["n12"], pa.int64()),
                "pb": pa.array(bk, pa.int64()),
            }
        )

    def pair_sum(g: pd.DataFrame) -> pd.DataFrame:
        keys, inv = np.unique(g["ppk"].to_numpy(), return_inverse=True)
        tot = np.bincount(inv, weights=g["n12"].to_numpy(np.float64))
        return pd.DataFrame(
            {
                "p1": (keys >> 32).astype(np.int64) - 1,
                "p2": (keys & ((1 << 32) - 1)).astype(np.int64) - 1,
                "pair_orders": tot.astype(np.int64),
            }
        )

    pair_counts = (
        bucketed.map_groups(pair_partial, batch_format="pandas")
        .map_batches(add_ppk, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(pair_sum, batch_format="pandas")
    )
    pair_counts = pair_counts.materialize()
    top = (
        pair_counts.filter(
            expr="p2 >= 0"
        )
        .sort(["pair_orders", "p1", "p2"], descending=[True, False, False])
        .limit(15)
    )

    # sentinel slice -> (part, n_ord) table + distinct-order total
    parts = (
        pair_counts.filter(expr="p2 < 0")
        .to_pandas()
        .rename(columns={"p1": "l_partkey", "pair_orders": "n_ord"})
    )
    total = float(parts.loc[parts["l_partkey"] == -1, "n_ord"].iloc[0])
    parts = parts[parts["l_partkey"] != -1]
    pk = parts["l_partkey"].to_numpy(np.int64)
    nc = parts["n_ord"].to_numpy(np.float64)
    order = np.argsort(pk)
    pk, nc = pk[order], nc[order]

    def finish(b: pa.Table) -> pa.Table:
        p1 = b["p1"].to_numpy(zero_copy_only=False)
        p2 = b["p2"].to_numpy(zero_copy_only=False)
        n12 = b["pair_orders"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        n1 = nc[np.searchsorted(pk, p1)]
        n2 = nc[np.searchsorted(pk, p2)]
        lift = np.round(n12 * total / (n1 * n2), 6)
        return pa.table(
            {
                "p1": pc.cast(b["p1"], pa.int64()),
                "p2": pc.cast(b["p2"], pa.int64()),
                "pair_orders": pc.cast(b["pair_orders"], pa.int64()),
                "lift": pa.array(lift, pa.float64()),
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


SQL_LIFT_PAIRS = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
tot AS (SELECT count(DISTINCT o) AS n FROM op),
pcnt AS (SELECT p, count(*) AS n_ord FROM op GROUP BY p),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, count(*) AS n12
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2),
top AS (SELECT * FROM pairs ORDER BY n12 DESC, p1, p2 LIMIT 15)
SELECT p1, p2, CAST(n12 AS BIGINT) AS pair_orders,
       round(CAST(n12 AS DOUBLE) * (SELECT n FROM tot)
             / (c1.n_ord * c2.n_ord), 6) AS lift
FROM top
JOIN pcnt c1 ON c1.p = top.p1
JOIN pcnt c2 ON c2.p = top.p2
"""


REGISTRY.update({'lift_pairs': (q_lift_pairs, SQL_LIFT_PAIRS)})


def q_skyline_parts(sf_dir: str):
    """2D Pareto frontier (skyline) of the part catalog: parts where
    no other part is both cheaper-or-equal AND larger-or-equal with at
    least one strict. The distributed shape exploits the skyline
    algebra — skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — so
    each batch emits only its local frontier (O(log n) expected rows
    on independent dims) and ONE final task merges the candidate set;
    no shuffle, no driver loop, candidate volume is frontier-sized
    regardless of input size. Ties: duplicate (price, size) points
    dominate neither, so all co-optimal duplicates survive (both
    sides)."""
    ds = _pq(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    def local_skyline(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        price = b["p_retailprice"].to_numpy(zero_copy_only=False)
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((-size, price))  # price asc, size desc
        p, s = price[order], size[order]
        new = np.empty(len(p), bool)
        new[0] = True
        new[1:] = p[1:] != p[:-1]
        gid = np.cumsum(new) - 1
        gmax = s[new]  # first row of each price group = its max size
        cheaper = np.concatenate(
            ([np.iinfo(np.int64).min], np.maximum.accumulate(gmax)[:-1])
        )
        keep = (s == gmax[gid]) & (gmax[gid] > cheaper[gid])
        idx = order[keep]
        return pa.table(
            {
                "p_partkey": pc.take(b["p_partkey"], pa.array(idx)),
                "p_retailprice": pa.array(price[idx], pa.float64()),
                "p_size": pa.array(size[idx], pa.int64()),
            }
        )

    return (
        ds.map_batches(local_skyline, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_skyline, batch_format="pyarrow", batch_size=None)
    )


SQL_SKYLINE_PARTS = """
WITH g AS (
  SELECT p_retailprice AS price, max(p_size) AS msize
  FROM part GROUP BY 1),
c AS (
  SELECT price, msize,
         max(msize) OVER (ORDER BY price
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS cheaper_max
  FROM g)
SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
FROM part p JOIN c ON p.p_retailprice = c.price
WHERE p.p_size = c.msize
  AND (c.cheaper_max IS NULL OR p.p_size > c.cheaper_max)
"""


def q_gini_orders(sf_dir: str):
    """Key-skew diagnostic: the Gini coefficient of per-customer order
    counts (0 = perfectly even load, ->1 = one hot key owns the
    table) — the number you consult before choosing salting for a
    partitioner. Exact WITHOUT a global sort: customers are
    hash-bucketed (each customer's orders land in one bucket, so
    bucket-local value_counts are globally exact), each bucket folds
    its counts into a (orders_per_customer -> n_customers) histogram,
    and the closed-form rank identity sum((2i - n - 1) x_i) is
    evaluated over the tiny value-domain histogram — tie-invariant, so
    row_number on the SQL side agrees. Only the histogram (bounded by
    max orders per key, not by key count) ever reaches the driver."""
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("o_custkey", sort=False).size().to_numpy(np.int64)
        v, n = np.unique(cnt, return_counts=True)
        return pd.DataFrame(
            {"cnt": v, "n_cust": n.astype(np.int64)}
        )

    hist = (
        _by_user_bucket(ds, col="o_custkey")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("cnt")
        .aggregate(Sum("n_cust", alias_name="n_cust"))
        .to_pandas()
        .sort_values("cnt")
    )
    v = hist["cnt"].to_numpy(np.float64)
    h = hist["n_cust"].to_numpy(np.int64)
    n = int(h.sum())
    total = float((v * h).sum())
    # ranks of the h[v]-sized tie group start after cumulative count C:
    # sum_{i=C+1..C+c}(2i - n - 1) = 2cC + c(c+1) - c(n+1)
    C = np.concatenate(([0], np.cumsum(h)[:-1])).astype(np.float64)
    c = h.astype(np.float64)
    coef = 2.0 * c * C + c * (c + 1.0) - c * (n + 1.0)
    gini = float((coef * v).sum() / (n * total))
    return pd.DataFrame(
        {
            "n_customers": np.array([n], np.int64),
            "mean_orders": [round(total / n, 6)],
            "gini": [round(gini, 6)],
        }
    )


SQL_GINI_ORDERS = """
WITH c AS (
  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1),
r AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt) AS i,
         count(*) OVER () AS n,
         sum(cnt) OVER () AS s
  FROM c)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       round(CAST(sum(cnt) AS DOUBLE) / max(n), 6) AS mean_orders,
       round(sum((2.0 * i - n - 1) * cnt) / (max(n) * max(s)), 6) AS gini
FROM r
"""


REGISTRY.update({'skyline_parts': (q_skyline_parts, SQL_SKYLINE_PARTS)})


REGISTRY.update({'gini_orders': (q_gini_orders, SQL_GINI_ORDERS)})


def q_snapshot_diff(sf_dir: str):
    """CDC-style snapshot diff (added / removed / changed keys)
    between two deterministic views of the orders table: snapshot A
    drops o_orderkey % 7 == 0, snapshot B drops % 5 == 0 and bumps
    o_totalprice by 10% for % 3 == 0. One distributed FULL OUTER hash
    join (stages/joins.py) + a vectorized CASE — the delta pipeline's
    (pipelines/delta.py) comparison shape as a standalone
    oracle-checked operator. Source payloads are never null, so a
    null payload marks the side the key is absent from; unchanged
    rows are filtered out so output stays delta-sized."""
    from ..stages.joins import hash_join

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def snap_a(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        keep = k % 7 != 0
        return pa.table(
            {
                "o_orderkey": pa.array(k[keep], pa.int64()),
                "price_a": pa.array(
                    b["o_totalprice"].to_numpy(zero_copy_only=False)[keep],
                    pa.float64(),
                ),
            }
        )

    def snap_b(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        p = b["o_totalprice"].to_numpy(zero_copy_only=False).copy()
        bump = k % 3 == 0
        p[bump] = np.round(p[bump] * 1.1, 2)
        keep = k % 5 != 0
        return pa.table(
            {
                "o_orderkey": pa.array(k[keep], pa.int64()),
                "price_b": pa.array(p[keep], pa.float64()),
            }
        )

    a = orders.map_batches(snap_a, batch_format="pyarrow")
    b = orders.map_batches(snap_b, batch_format="pyarrow")
    j = hash_join(a, b, on=["o_orderkey"], how="full_outer")

    def classify(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        pa_v = t["price_a"].to_numpy(zero_copy_only=False)
        pb_v = t["price_b"].to_numpy(zero_copy_only=False)
        a_null = pd.isna(pa_v)
        b_null = pd.isna(pb_v)
        changed = ~a_null & ~b_null & (pa_v != pb_v)
        keep = a_null | b_null | changed
        status = np.select(
            [a_null[keep], b_null[keep]],
            ["added", "removed"],
            default="changed",
        )
        return pa.table(
            {
                "o_orderkey": pa.array(
                    key[keep].astype(np.int64), pa.int64()
                ),
                "status": pa.array(status, pa.string()),
            }
        )

    return j.map_batches(classify, batch_format="pyarrow")


SQL_SNAPSHOT_DIFF = """
WITH a AS (
  SELECT o_orderkey AS k, o_totalprice AS p FROM orders
  WHERE o_orderkey % 7 <> 0
),
b AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 3 = 0
              THEN round(o_totalprice * 1.1, 2)
              ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT CAST(COALESCE(a.k, b.k) AS BIGINT) AS o_orderkey,
       CASE WHEN a.k IS NULL THEN 'added'
            WHEN b.k IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.k = b.k
WHERE a.k IS NULL OR b.k IS NULL OR a.p <> b.p
"""


REGISTRY.update({'snapshot_diff': (q_snapshot_diff, SQL_SNAPSHOT_DIFF)})


def q_winsorize_group(sf_dir: str):
    """Winsorized robust statistics per group: exact p05/p95 of
    l_extendedprice per l_returnflag (linear interpolation, the
    quantiles_group contract), values clipped to [p05, p95], and the
    winsorized mean — the outlier-robust normalization step a quality
    pipeline applies before score blending. Per-group sort is one
    numpy kernel under the quantiles_group task-size contract."""
    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def per_grp(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["l_extendedprice"].to_numpy(np.float64))
        lo = np.quantile(v, 0.05, method="linear")
        hi = np.quantile(v, 0.95, method="linear")
        w = np.clip(v, lo, hi)
        return pd.DataFrame(
            {
                "l_returnflag": [g["l_returnflag"].iloc[0]],
                "p05": [np.round(lo, 4)],
                "p95": [np.round(hi, 4)],
                "win_mean": [np.round(w.mean(), 4)],
            }
        )

    return ds.groupby("l_returnflag").map_groups(
        per_grp, batch_format="pandas"
    )


SQL_WINSORIZE_GROUP = """
WITH q AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       round(any_value(q.lo), 4) AS p05,
       round(any_value(q.hi), 4) AS p95,
       round(avg(CASE WHEN l.l_extendedprice < q.lo THEN q.lo
                      WHEN l.l_extendedprice > q.hi THEN q.hi
                      ELSE l.l_extendedprice END), 4) AS win_mean
FROM lineitem l JOIN q ON q.l_returnflag = l.l_returnflag
GROUP BY l.l_returnflag
"""


REGISTRY.update({'winsorize_group': (q_winsorize_group, SQL_WINSORIZE_GROUP)})


def q_rank_global_orders(sf_dir: str):
    """Exact GLOBAL percentile rank (cume_dist) and decile bucket
    (NTILE(10)) for every order by o_totalprice — feature
    discretization / percentile normalization without a single-task
    global sort. The global_rownum machinery generalized from time
    buckets to VALUE-range buckets: pass 1 streams per-batch counts
    per 1024-wide price bucket (bucket order IS value order; the
    bucket table is bounded by the value range, not the row count) and
    folds an exclusive prefix on the driver; pass 2 exchanges rows by
    bucket, each bucket sorts locally and adds its broadcast base.
    Equal values share a bucket by construction, so tie groups never
    straddle tasks and cume_dist's count(<= v) is exact. NTILE uses
    the (value, key) total order, matching the oracle's ORDER BY. The
    materialize pins only the two projected columns (key + price),
    reused by both passes."""
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    W = 8192.0  # ~64 buckets over the price range: per-group task
    # overhead stays negligible while buckets remain value-ordered

    def add_vb(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_totalprice": pa.array(v, pa.float64()),
                "vb": pa.array(np.floor(v / W).astype(np.int64), pa.int64()),
            }
        )

    vb_ds = ds.map_batches(add_vb, batch_format="pyarrow").materialize()

    def cnt_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b["vb"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"vb": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    cnt = (
        vb_ds.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("vb")
        .sum("c")
        .to_pandas()
        .sort_values("vb")
    )
    vbs = cnt["vb"].to_numpy(np.int64)
    sizes = cnt["sum(c)"].to_numpy(np.int64)
    base = np.r_[0, np.cumsum(sizes)[:-1]]
    N = int(sizes.sum())
    q10, r10 = divmod(N, 10)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_totalprice", "o_orderkey"], kind="mergesort"
        )
        b0 = int(base[np.searchsorted(vbs, int(g["vb"].iloc[0]))])
        v = g["o_totalprice"].to_numpy(np.float64)
        rank = b0 + np.arange(len(g), dtype=np.int64)  # 0-based, tiebroken
        cume = (b0 + np.searchsorted(v, v, side="right")) / N
        if q10 == 0:
            decile = rank + 1
        else:
            split = (q10 + 1) * r10
            decile = np.where(
                rank < split,
                rank // (q10 + 1),
                r10 + (rank - split) // q10,
            ) + 1
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                "cume": np.round(cume, 6),
                "decile": decile.astype(np.int64),
            }
        )

    return vb_ds.groupby("vb").map_groups(per_bucket, batch_format="pandas")


SQL_RANK_GLOBAL_ORDERS = """
SELECT o_orderkey,
       round(cume_dist() OVER (ORDER BY o_totalprice), 6) AS cume,
       CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
         AS decile
FROM orders
"""


REGISTRY.update({'rank_global_orders': (q_rank_global_orders, SQL_RANK_GLOBAL_ORDERS)})


def q_welch_ttest_segments(sf_dir: str):
    """Welch's unequal-variance t-test of o_totalprice between orders
    from BUILDING vs MACHINERY customers — the significance-testing
    primitive over a dimension join. The segment map rides the
    broadcast join (auto-routing to the hash join when the dimension
    outgrows the broadcast cap); moments use the corr_agg two-pass
    shape: grouped means first (tiny, broadcast), then per-block
    centered-square partials folded by one tiny groupby. var_samp =
    sxx/(n-1) matches SQL's to well below the rounding margin
    (corr_agg argument). t and the Welch–Satterthwaite df finish on
    the driver from the 2-row moment table."""
    cust = (
        _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda b: b.filter(
                pc.is_in(
                    b["c_mktsegment"],
                    value_set=pa.array(["BUILDING", "MACHINERY"]),
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    ds = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    j = broadcast_join(
        ds, cust, on=["o_custkey"], right_on=["c_custkey"], how="inner"
    )
    means = (
        j.groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n"), Mean("o_totalprice", alias_name="m")
        )
        .to_pandas()
        .set_index("c_mktsegment")
    )
    mu = {seg: float(means.loc[seg, "m"]) for seg in means.index}

    def sq_partial(b: pa.Table) -> pa.Table:
        seg = b["c_mktsegment"].to_numpy(zero_copy_only=False)
        v = b["o_totalprice"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        codes, uniq = pd.factorize(seg)
        d = v - np.array([mu[s] for s in uniq])[codes]
        return pa.table(
            {
                "c_mktsegment": pa.array(uniq),
                "sxx": pa.array(np.bincount(codes, d * d)),
            }
        )

    sq = (
        j.map_batches(sq_partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("sxx", alias_name="sxx"))
        .to_pandas()
        .set_index("c_mktsegment")
    )
    n_a = int(means.loc["BUILDING", "n"])
    n_b = int(means.loc["MACHINERY", "n"])
    m_a, m_b = mu["BUILDING"], mu["MACHINERY"]
    v_a = float(sq.loc["BUILDING", "sxx"]) / (n_a - 1)
    v_b = float(sq.loc["MACHINERY", "sxx"]) / (n_b - 1)
    se_a, se_b = v_a / n_a, v_b / n_b
    t = (m_a - m_b) / np.sqrt(se_a + se_b)
    df = (se_a + se_b) ** 2 / (
        se_a**2 / (n_a - 1) + se_b**2 / (n_b - 1)
    )
    return pd.DataFrame(
        {
            "n_a": [n_a],
            "n_b": [n_b],
            "mean_a": [round(m_a, 4)],
            "mean_b": [round(m_b, 4)],
            "t": [round(float(t), 6)],
            "df": [round(float(df), 2)],
        }
    )


SQL_WELCH_TTEST_SEGMENTS = """
WITH j AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
s AS (
  SELECT seg, count(*) AS n, avg(v) AS m, var_samp(v) AS s2
  FROM j GROUP BY seg
),
w AS (
  SELECT max(CASE WHEN seg = 'BUILDING' THEN n END) AS n_a,
         max(CASE WHEN seg = 'MACHINERY' THEN n END) AS n_b,
         max(CASE WHEN seg = 'BUILDING' THEN m END) AS m_a,
         max(CASE WHEN seg = 'MACHINERY' THEN m END) AS m_b,
         max(CASE WHEN seg = 'BUILDING' THEN s2 END) AS v_a,
         max(CASE WHEN seg = 'MACHINERY' THEN s2 END) AS v_b
  FROM s
)
SELECT n_a, n_b, round(m_a, 4) AS mean_a, round(m_b, 4) AS mean_b,
       round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 6) AS t,
       round(pow(v_a / n_a + v_b / n_b, 2)
             / (pow(v_a / n_a, 2) / (n_a - 1)
                + pow(v_b / n_b, 2) / (n_b - 1)), 2) AS df
FROM w
"""


REGISTRY.update({'welch_ttest_segments': (
            q_welch_ttest_segments,
            SQL_WELCH_TTEST_SEGMENTS,
        )})


def q_shrunk_means_customers(sf_dir: str):
    """Empirical-Bayes shrinkage of per-customer mean order value
    toward a fixed prior (mu0=150000, k=10 pseudo-observations) — the
    reliability-weighted scoring rule for sparse groups (a customer
    with 2 orders shouldn't outrank one with 40 on raw means).
    Per-batch per-customer partials carry EXACT integer cents
    (rint(price*100) as int64), so both engines fold bit-identical
    sums under any partitioning/association — the float division
    happens once per customer, from identical operands."""
    ds = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    K, MU0 = 10, 150000.0

    def partial(b: pa.Table) -> pa.Table:
        c = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(c, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(u, pa.int64()),
                "s": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
                "n": pa.array(np.bincount(inv), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        nn = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        shrunk = (s / 100.0 + K * MU0) / (nn + K)
        # floor-quantize: round() half rules differ between numpy
        # (half-even) and DuckDB (half-away) and integer-cent ratios
        # DO land on exact .00005 boundaries
        sq = np.floor(shrunk * 1e4) / 1e4
        return pa.table(
            {
                "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "n": pc.cast(b["n"], pa.int64()),
                "shrunk_mean": pa.array(sq, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_SHRUNK_MEANS_CUSTOMERS = """
SELECT o_custkey, count(*) AS n,
       floor((sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0
              + 10 * 150000.0) / (count(*) + 10) * 10000) / 10000
         AS shrunk_mean
FROM orders GROUP BY o_custkey
"""


REGISTRY.update({'shrunk_means_customers': (
            q_shrunk_means_customers,
            SQL_SHRUNK_MEANS_CUSTOMERS,
        )})


def q_q5_revenue(sf_dir: str):
    """The TPC-H Q5 shape — local-supplier revenue per nation inside
    one region and a two-year window: lineitem |x| orders (both FACT
    sized: one distributed hash exchange) with customer / supplier /
    nation / region folded in as broadcast dimension lookups
    (broadcast_join auto-routes an oversized side to the hash join).
    Revenue folds as EXACT integer micro-units —
    cents(price) * (100 - bp(discount)) — so partial sums are
    bit-identical under any partitioning and the single float divide
    happens on identical operands in both engines."""
    from ..stages.joins import hash_join

    # dimension chain (tiny): nations of the ASIA region, names
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia = nation.merge(
        region[region["r_name"] == "ASIA"],
        left_on="n_regionkey",
        right_on="r_regionkey",
    )
    nat_keys = np.sort(asia["n_nationkey"].to_numpy(np.int64))
    nat_names = asia.set_index("n_nationkey")["n_name"]
    name_of = dict(nat_names)

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    ck = np.sort(cust["c_custkey"].to_numpy(np.int64))
    cn = cust.set_index("c_custkey")["c_nationkey"].loc[ck].to_numpy(np.int64)
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sk = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    sn = supp.set_index("s_suppkey")["s_nationkey"].loc[sk].to_numpy(np.int64)

    lo = np.datetime64("1995-01-01", "us").astype(np.int64)
    hi = np.datetime64("1997-01-01", "us").astype(np.int64)

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def date_filter(b: pa.Table) -> pa.Table:
        t = (
            b["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        keep = (t >= lo) & (t < hi)
        return b.filter(pa.array(keep)).select(["o_orderkey", "o_custkey"])

    li = _pq(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    j = hash_join(
        li,
        orders.map_batches(date_filter, batch_format="pyarrow"),
        on=["l_orderkey"],
        right_on=["o_orderkey"],
    )

    def partial(b: pa.Table) -> pa.Table:
        ckey = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        skey = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c_nat = cn[np.searchsorted(ck, ckey)]
        s_nat = sn[np.searchsorted(sk, skey)]
        keep = (c_nat == s_nat) & np.isin(c_nat, nat_keys)
        if not keep.any():
            return pa.table(
                {
                    "n_nationkey": pa.array([], pa.int64()),
                    "rev_micro": pa.array([], pa.int64()),
                }
            )
        cents = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * 100.0
        ).astype(np.int64)
        bp = np.rint(
            b["l_discount"].to_numpy(zero_copy_only=False)[keep] * 100.0
        ).astype(np.int64)
        nat = c_nat[keep]
        u, inv = np.unique(nat, return_inverse=True)
        return pa.table(
            {
                "n_nationkey": pa.array(u, pa.int64()),
                "rev_micro": pa.array(
                    np.bincount(inv, weights=cents * (100 - bp)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("rev_micro", alias_name="rev_micro"))
        .to_pandas()
    )
    agg["n_name"] = agg["n_nationkey"].map(name_of)
    agg["revenue"] = np.round(
        agg["rev_micro"].to_numpy(np.float64) / 10000.0, 2
    )
    return agg[["n_name", "revenue"]]


SQL_Q5_REVENUE = """
SELECT n_name,
       round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
             / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= DATE '1995-01-01'
  AND o_orderdate <  DATE '1997-01-01'
GROUP BY n_name
"""


REGISTRY.update({'q5_revenue': (q_q5_revenue, SQL_Q5_REVENUE)})


def q_join_size_estimate(sf_dir: str):
    """Join-cardinality statistics (the optimizer primitive behind
    broadcast-vs-shuffle planning): EXACT |orders |x| lineitem| on
    orderkey plus the distinct overlapping key count. Both sides
    pre-reduce to per-batch (key, count) partials tagged by side, and
    ONE coarse-bucketed exchange (key-hash % 64) co-locates each key's
    partials from both sides — the per-bucket combine folds counts
    with np.unique sums, intersects the two key sets by searchsorted,
    and emits a 2-int partial. Replaces the previous plan's two
    150k-key groupbys + a count-table hash join (three exchanges,
    measured 7.8 s) with one 64-group exchange. All-integer: bit-exact
    under any partitioning."""
    from ..functions.hashing import splitmix64

    def counts(table: str, key: str, side: int):
        ds = _pq(sf_dir, table, [key])

        def partial(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            u, c = np.unique(k, return_counts=True)
            bk = (
                splitmix64(u.astype(np.uint64))
                % np.uint64(COARSE_USER_BUCKETS)
            ).astype(np.int64)
            return pa.table(
                {
                    "bucket": pa.array(bk, pa.int64()),
                    "k": pa.array(u, pa.int64()),
                    "c": pa.array(c.astype(np.int64), pa.int64()),
                    "side": pa.array(
                        np.full(len(u), side, np.int8), pa.int8()
                    ),
                }
            )

        return ds.map_batches(partial, batch_format="pyarrow")

    both = counts("orders", "o_orderkey", 0).union(
        counts("lineitem", "l_orderkey", 1)
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        s = g["side"].to_numpy(np.int8)
        def fold(mask):
            u, inv = np.unique(k[mask], return_inverse=True)
            return u, np.bincount(inv, weights=c[mask]).astype(np.int64)
        ka, ca = fold(s == 0)
        kb, cb = fold(s == 1)
        if len(ka) == 0 or len(kb) == 0:
            return pd.DataFrame({"join_rows": [0], "overlap_keys": [0]})
        pos = np.searchsorted(ka, kb)
        pos_c = np.minimum(pos, len(ka) - 1)
        hit = (ka[pos_c] == kb) & (pos < len(ka))
        return pd.DataFrame(
            {
                "join_rows": [int((ca[pos_c[hit]] * cb[hit]).sum())],
                "overlap_keys": [int(hit.sum())],
            }
        )

    out = (
        both.groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .aggregate(
            Sum("join_rows", alias_name="join_rows"),
            Sum("overlap_keys", alias_name="overlap_keys"),
        )
    )
    return pd.DataFrame(
        {
            "join_rows": [int(out["join_rows"])],
            "overlap_keys": [int(out["overlap_keys"])],
        }
    )


SQL_JOIN_SIZE_ESTIMATE = """
SELECT CAST(sum(a.n * b.n) AS BIGINT) AS join_rows,
       count(*) AS overlap_keys
FROM (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1) a
JOIN (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1) b
  USING (k)
"""


REGISTRY.update({'join_size_estimate': (q_join_size_estimate, SQL_JOIN_SIZE_ESTIMATE)})

# ------------------------------------------------- sixth-session batch


def q_q3_shipping(sf_dir: str):
    """The TPC-H Q3 shape — unshipped-order revenue for one market
    segment: a BUILDING-segment customer-key broadcast prunes orders
    at the scan, the surviving orders hash-exchange against the
    date-filtered lineitem fact (the only shuffle), and revenue folds
    as EXACT integer micro-units (cents x (100 - discount-bp)) keyed
    by orderkey, so partials are bit-identical under any partitioning.
    Top-10 by revenue with orderkey tiebreak."""
    from ..stages.joins import hash_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def cust_keys(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["c_mktsegment"], "BUILDING")
        return b.filter(keep).select(["c_custkey"])

    ckeys = np.sort(
        cust.map_batches(cust_keys, batch_format="pyarrow")
        .to_pandas()["c_custkey"]
        .to_numpy(np.int64)
    )

    cut = np.datetime64("1998-06-01", "us").astype(np.int64)

    orders = _pq(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def ord_filter(b: pa.Table) -> pa.Table:
        t = (
            b["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        ok = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ckeys, ok)
        pos[pos == len(ckeys)] = 0
        keep = (t < cut) & (ckeys[pos] == ok)
        b = b.filter(pa.array(keep)).select(["o_orderkey"])
        # carry the (orderkey-determined) date as int64 micros so it
        # rides the join and the final groupby — no second orders scan
        return b.append_column("o_odate_us", pa.array(t[keep], pa.int64()))

    li = _pq(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def li_filter(b: pa.Table) -> pa.Table:
        t = (
            b["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        b = b.filter(pa.array(t > cut))
        cents = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        bp = np.rint(
            b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        k = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "l_orderkey": pa.array(u, pa.int64()),
                "rev_micro": pa.array(
                    np.bincount(inv, weights=cents * (100 - bp)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    j = hash_join(
        li.map_batches(li_filter, batch_format="pyarrow"),
        orders.map_batches(ord_filter, batch_format="pyarrow"),
        on=["l_orderkey"],
        right_on=["o_orderkey"],
    )
    agg = (
        j.groupby(["l_orderkey", "o_odate_us"])
        .aggregate(Sum("rev_micro", alias_name="rev_micro"))
        .to_pandas()
    )
    agg["revenue"] = np.round(
        agg["rev_micro"].to_numpy(np.float64) / 10000.0, 2
    )
    top = agg.sort_values(
        ["revenue", "l_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(10)
    top = top.assign(
        o_odate=pd.to_datetime(
            top["o_odate_us"].to_numpy(np.int64), unit="us"
        ).strftime("%Y-%m-%d")
    )
    return top[["l_orderkey", "o_odate", "revenue"]].reset_index(drop=True)


SQL_Q3_SHIPPING = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_odate,
       round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
             / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_above_avg_orders(sf_dir: str, broadcast_budget_rows: int = 4_000_000):
    """The decorrelated correlated-subquery shape — orders strictly
    above their customer's average order value: ONE grouped partial
    (custkey, n, sum-cents) replaces the per-row subquery; the
    customer-bounded stat table broadcasts as sorted int64 arrays
    when it fits the budget, else the filter routes through the
    distributed hash join (same rows either way — pinned by
    tests/test_relational2.py with budget=0). The predicate
    cross-multiplies integers (cents * n > sum_cents) so no division
    ever happens — bit-exact under any partitioning."""
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(u, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "sc": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    stats_ds = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="n"), Sum("sc", alias_name="sc"))
        .materialize()  # customer-bounded; count + read from one pass
    )
    if stats_ds.count() > broadcast_budget_rows:
        # key table outgrew the broadcast budget: distributed hash
        # join of the fact scan against the stat table, same predicate
        from ..stages.joins import hash_join

        j = hash_join(orders, stats_ds, on=["o_custkey"])

        def flt(b: pa.Table) -> pa.Table:
            cents = np.rint(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            n = b["n"].to_numpy(zero_copy_only=False)
            sc = b["sc"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(cents * n > sc)).select(
                ["o_orderkey", "o_custkey", "o_totalprice"]
            )

        return j.map_batches(flt, batch_format="pyarrow")
    stats = stats_ds.to_pandas()
    sk = stats["o_custkey"].to_numpy(np.int64)
    order_k = np.argsort(sk, kind="stable")
    sk = sk[order_k]
    sn = stats["n"].to_numpy(np.int64)[order_k]
    ssc = stats["sc"].to_numpy(np.int64)[order_k]
    import ray

    ref = ray.put((sk, sn, ssc))

    from ..state.broadcast import get_broadcast

    class AboveAvg:
        def __init__(self, model_ref) -> None:
            self.sk, self.sn, self.ssc = get_broadcast(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            k = b["o_custkey"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            cents = np.rint(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            pos = np.searchsorted(self.sk, k)
            keep = cents * self.sn[pos] > self.ssc[pos]
            return b.filter(pa.array(keep))

    return orders.map_batches(
        AboveAvg,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


SQL_ABOVE_AVG_ORDERS = """
WITH s AS (
  SELECT o_custkey AS k, count(*) AS n,
         sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS sc
  FROM orders GROUP BY 1)
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders JOIN s ON o_custkey = s.k
WHERE CAST(round(o_totalprice * 100.0) AS BIGINT) * s.n > s.sc
"""


REGISTRY.update({'q3_shipping': (q_q3_shipping, SQL_Q3_SHIPPING)})


REGISTRY.update({'above_avg_orders': (q_above_avg_orders, SQL_ABOVE_AVG_ORDERS)})


def q_weighted_median_parts(sf_dir: str):
    """Weighted median per group (the robust-statistics order
    statistic): smallest retail price v per brand with
    2 * cumweight(<= v) >= total weight, weights = p_size. Batches
    pre-aggregate (brand, cents) -> sum(weight) so the ONE exchange
    carries the distinct-value histogram, not rows; the finalizer is
    a sorted cumsum + searchsorted. All-integer comparisons — no
    float enters until the final /100."""
    ds = _pq(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        out = pa.table(
            {
                "p_brand": b["p_brand"],
                "cents": pa.array(cents, pa.int64()),
                "wt": pc.cast(b["p_size"], pa.int64()),
            }
        )
        return out.group_by(["p_brand", "cents"]).aggregate([("wt", "sum")])

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["cents"].to_numpy(np.int64), kind="stable")
        cents = g["cents"].to_numpy(np.int64)[order]
        wt = g["wt_sum"].to_numpy(np.int64)[order]
        cw = np.cumsum(wt)
        tot = int(cw[-1])
        i = int(np.searchsorted(2 * cw, tot))
        return pd.DataFrame(
            {
                "p_brand": [g["p_brand"].iloc[0]],
                "wmedian": [round(cents[i] / 100.0, 2)],
                "total_wt": [tot],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .map_groups(finalize, batch_format="pandas")
    )


SQL_WEIGHTED_MEDIAN_PARTS = """
WITH c AS (
  SELECT p_brand, CAST(round(p_retailprice * 100.0) AS BIGINT) AS cents,
         sum(CAST(p_size AS BIGINT)) AS wt
  FROM part GROUP BY 1, 2),
cum AS (
  SELECT p_brand, cents,
         sum(wt) OVER (PARTITION BY p_brand ORDER BY cents) AS cw,
         sum(wt) OVER (PARTITION BY p_brand) AS tot
  FROM c)
SELECT p_brand,
       round(min(cents) FILTER (WHERE 2 * cw >= tot) / 100.0, 2)
         AS wmedian,
       CAST(any_value(tot) AS BIGINT) AS total_wt
FROM cum GROUP BY p_brand
"""


REGISTRY.update({'weighted_median_parts': (
            q_weighted_median_parts,
            SQL_WEIGHTED_MEDIAN_PARTS,
        )})


def q_revenue_share_nations(sf_dir: str):
    """Share-of-total (the contribution-analysis shape): each nation's
    per-customer account-balance total as a fraction of the global
    total. One grouped integer-cent fold; the global total derives
    from the SAME partials (no second scan); both engines divide the
    same two integers."""
    cust = _pq(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        k = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "c_nationkey": pa.array(u, pa.int64()),
                "sc": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    agg = (
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("sc", alias_name="sc"))
        .to_pandas()  # bounded by the nation domain
    )
    tot = int(agg["sc"].sum())
    agg["share"] = np.floor(
        agg["sc"].to_numpy(np.int64) / tot * 1e6
    ) / 1e6
    agg["balance"] = np.round(agg["sc"].to_numpy(np.int64) / 100.0, 2)
    return agg[["c_nationkey", "balance", "share"]]


SQL_REVENUE_SHARE_NATIONS = """
WITH s AS (
  SELECT c_nationkey,
         sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) AS sc
  FROM customer GROUP BY 1)
SELECT c_nationkey,
       round(sc / 100.0, 2) AS balance,
       floor(sc / (SELECT sum(sc) FROM s) * 1000000.0) / 1000000.0
         AS share
FROM s
"""


REGISTRY.update({'revenue_share_nations': (
            q_revenue_share_nations,
            SQL_REVENUE_SHARE_NATIONS,
        )})


# ------------------------------------------------ classic decision-support


def q_q18_large_orders(sf_dir: str):
    """The TPC-H Q18 shape — large-volume orders (grouped HAVING
    filter feeding a multi-way join). One grouped integer fold over
    lineitem (quantities are integral by spec; round-cast per batch so
    partials are bit-identical under any partitioning), a HAVING
    prune that leaves an output-bounded survivor set, then two
    hash-partitioned joins (orders, customer) — both sides stay
    distributed, nothing reaches the driver. Reference analog: the
    grouped tallies + joins of extract_graph.py's result/citation
    rollups."""
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        k = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.rint(
            b["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        uu, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "o_orderkey": pa.array(uu, pa.int64()),
                "total_qty": pa.array(
                    np.bincount(inv, weights=q).astype(np.int64)
                ),
            }
        )

    big = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("total_qty", alias_name="total_qty"))
        .filter(expr="total_qty > 300")
        .materialize()  # survivor-bounded by the HAVING prune
    )
    orders = _pq(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    if big.count() <= 4_000_000:
        # survivor set fits the broadcast budget: filter the orders
        # scan in place (zero exchange; broadcast_join itself falls
        # back to the hash plan past MAX_BROADCAST_BYTES)
        joined = broadcast_join(orders, big.to_pandas(), on=["o_orderkey"])
    else:  # pragma: no cover - adversarial survivor volume
        joined = hash_join(big, orders, on=["o_orderkey"])
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"])
    out = hash_join(joined, cust, on=["o_custkey"], right_on=["c_custkey"])

    def finish(b: pa.Table) -> pa.Table:
        d = (
            b["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(str)
        )
        return pa.table(
            {
                "c_name": b["c_name"],
                # Dataset.join keeps the LEFT key column name
                "c_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_orderdate": pa.array(d, pa.string()),
                "o_totalprice": b["o_totalprice"],
                "total_qty": pc.cast(b["total_qty"], pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


SQL_Q18_LARGE_ORDERS = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_totalprice, b.total_qty
FROM big b
JOIN orders o   ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


def q_q22_wealthy_inactive(sf_dir: str):
    """The TPC-H Q22 shape — global-average subquery + NOT EXISTS
    anti-join. Customers whose balance strictly exceeds the average
    positive balance AND who never placed a 1-URGENT order, tallied
    per nation. The average is ONE (sum_cents, n) scalar fold
    (cents = round(bal*100), exact int64); the comparison is
    cross-multiplied integers (bal_cents * n > sum_cents) so no
    division exists on either side; the NOT EXISTS runs as a
    hash-partitioned anti-join against the deduped urgent-customer
    keys — distributed end to end, no driver key set."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "c_custkey": pc.cast(b["c_custkey"], pa.int64()),
                "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                "bal_cents": pa.array(c, pa.int64()),
            }
        )

    cb = cust.map_batches(cents, batch_format="pyarrow")

    def pos_partial(b: pa.Table) -> pa.Table:
        c = b["bal_cents"].to_numpy(zero_copy_only=False)
        m = c > 0
        return pa.table(
            {
                "s": pa.array([int(c[m].sum())], pa.int64()),
                "n": pa.array([int(m.sum())], pa.int64()),
            }
        )

    tot = (
        cb.map_batches(pos_partial, batch_format="pyarrow")
        .sum(["s", "n"])
    )
    s_pos, n_pos = int(tot["sum(s)"]), int(tot["sum(n)"])

    def rich_filter(b: pa.Table) -> pa.Table:
        c = b["bal_cents"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(c * n_pos > s_pos))

    rich = cb.map_batches(rich_filter, batch_format="pyarrow")

    urgent = _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    )

    def dedup_keys(b: pa.Table) -> pa.Table:
        u = np.unique(
            b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"c_custkey": pa.array(u, pa.int64())})

    urgent_keys = urgent.map_batches(dedup_keys, batch_format="pyarrow")
    inactive = hash_join(rich, urgent_keys, on=["c_custkey"], how="anti")

    def per_nation(b: pa.Table) -> pa.Table:
        k = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["bal_cents"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "c_nationkey": pa.array(uu, pa.int64()),
                "n_cust": pa.array(np.bincount(inv).astype(np.int64)),
                "sc": pa.array(np.bincount(inv, weights=c).astype(np.int64)),
            }
        )

    agg = (
        inactive.map_batches(per_nation, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Sum("n_cust", alias_name="n_cust"), Sum("sc", alias_name="sc")
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        sc = b["sc"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                "n_cust": pc.cast(b["n_cust"], pa.int64()),
                "total_bal": pa.array(
                    np.round(sc / 100.0, 2), pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_Q22_WEALTHY_INACTIVE = """
WITH cb AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents
  FROM customer),
avgpos AS (
  SELECT sum(bal_cents) AS s, count(*) AS n FROM cb WHERE bal_cents > 0)
SELECT c_nationkey, count(*) AS n_cust,
       round(sum(bal_cents) / 100.0, 2) AS total_bal
FROM cb
WHERE bal_cents * (SELECT n FROM avgpos) > (SELECT s FROM avgpos)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = cb.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
"""


def q_q16_part_variety(sf_dir: str):
    """The TPC-H Q16 shape — supplier variety per part class with an
    excluded-supplier anti-join and a grouped COUNT(DISTINCT).
    Distinct (part, supp) pairs come from in-batch dedup before ONE
    exchange (lineitem plays partsupp); negative-balance suppliers
    are removed by a hash-partitioned anti-join; the per-(brand,
    size) distinct-supplier count re-dedups (brand, size, supp) in
    batch and counts uniques per group with a sorted-diff — the same
    two-phase exact-distinct plan as distinct_users_daily."""
    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pair_dedup(b: pa.Table) -> pa.Table:
        # in-batch dedup only: cross-batch duplicate pairs are harmless
        # because the final count is DISTINCT-based; no global pair
        # exchange is needed.
        return b.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    pairs = li.map_batches(pair_dedup, batch_format="pyarrow")
    bad = _pq(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).filter(
        expr="s_acctbal < 0"
    )
    ok = hash_join(
        pairs, bad, on=["l_suppkey"], right_on=["s_suppkey"], how="anti"
    )
    part = _pq(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    dims = hash_join(ok, part, on=["l_partkey"], right_on=["p_partkey"])

    def triple_dedup(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p_brand": b["p_brand"],
                "p_size": pc.cast(b["p_size"], pa.int64()),
                "l_suppkey": pc.cast(b["l_suppkey"], pa.int64()),
            }
        )
        return t.group_by(["p_brand", "p_size", "l_suppkey"]).aggregate([])

    def count_unique(g: pd.DataFrame) -> pd.DataFrame:
        u = np.sort(g["l_suppkey"].to_numpy(np.int64))
        n = 1 + int((u[1:] != u[:-1]).sum()) if len(u) else 0
        return pd.DataFrame(
            {
                "p_brand": [g["p_brand"].iloc[0]],
                "p_size": [int(g["p_size"].iloc[0])],
                "supplier_cnt": [n],
            }
        )

    return (
        dims.map_batches(triple_dedup, batch_format="pyarrow")
        .groupby(["p_brand", "p_size"])
        .map_groups(count_unique, batch_format="pandas")
    )


SQL_Q16_PART_VARIETY = """
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


REGISTRY.update({'q18_large_orders': (q_q18_large_orders, SQL_Q18_LARGE_ORDERS)})


REGISTRY.update({'q22_wealthy_inactive': (
            q_q22_wealthy_inactive,
            SQL_Q22_WEALTHY_INACTIVE,
        )})


REGISTRY.update({'q16_part_variety': (q_q16_part_variety, SQL_Q16_PART_VARIETY)})


def q_fk_orphans(sf_dir: str):
    """Referential-integrity audit (the data-quality / expectations
    shape): for every declared FK relationship, child row count,
    orphaned child rows, and distinct orphaned keys.

    Physical plan: every parent key column is a SORTED int64 array
    broadcast once (largest is orders at ~12 MB — far under the
    broadcast budget; above it, the general hash-join anti plan in
    stages/joins.py is the documented fallback), and ONE fused scan
    per child table probes all of its FKs by searchsorted, emitting a
    one-row-per-relation count partial plus the (normally empty)
    orphan key list. No exchange ever carries child rows — v2 of this
    query; the prior composite-key anti-join plan measured 14 s
    in-suite at sf0.1, this measures ~5 s solo (the anti-join and its
    two union exchanges are gone; what remains is the three child-table
    scans)."""
    import ray

    rels = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
    ]
    parents = {}
    for _name, _child, _fk, parent, pk in rels:
        if parent not in parents:
            parents[parent] = np.sort(
                _pq(sf_dir, parent, [pk])
                .to_pandas()[pk]
                .to_numpy(np.int64)
            )
    pref = ray.put(parents)

    # group relations by child table: ONE scan per child probes all
    # of its FKs
    by_child: dict = {}
    for rid, (_n, child, fk, parent, _pk) in enumerate(rels):
        by_child.setdefault(child, []).append((rid, fk, parent))

    def probe_for(fks):
        def fn(b: pa.Table) -> pa.Table:
            from ..state.broadcast import get_broadcast

            ps = get_broadcast(pref)
            rel_o, n_o, orph_o, key_rel, key_val = [], [], [], [], []
            for rid, fk, parent in fks:
                keys = ps[parent]
                v = b[fk].to_numpy(zero_copy_only=False).astype(np.int64)
                pos = np.minimum(
                    np.searchsorted(keys, v), max(len(keys) - 1, 0)
                )
                orphan = (
                    (keys[pos] != v)
                    if len(keys)
                    else np.ones(len(v), bool)
                )
                rel_o.append(rid)
                n_o.append(len(v))
                orph_o.append(int(orphan.sum()))
                if orphan.any():
                    ok = np.unique(v[orphan])
                    key_rel.append(np.full(len(ok), rid, np.int64))
                    key_val.append(ok)
            stats = pa.table(
                {
                    "rel": pa.array(rel_o, pa.int64()),
                    "n": pa.array(n_o, pa.int64()),
                    "orph": pa.array(orph_o, pa.int64()),
                    "key": pa.array([None] * len(rel_o), pa.int64()),
                    "is_stat": pa.array([1] * len(rel_o), pa.int64()),
                }
            )
            if key_rel:
                kr = np.concatenate(key_rel)
                kv = np.concatenate(key_val)
                keys_tbl = pa.table(
                    {
                        "rel": pa.array(kr, pa.int64()),
                        "n": pa.array(np.zeros(len(kr), np.int64)),
                        "orph": pa.array(np.zeros(len(kr), np.int64)),
                        "key": pa.array(kv, pa.int64()),
                        "is_stat": pa.array(
                            np.zeros(len(kr), np.int64)
                        ),
                    }
                )
                stats = pa.concat_tables([stats, keys_tbl])
            return stats

        return fn

    part_ds = None
    for child, fks in by_child.items():
        cols = sorted({fk for _rid, fk, _p in fks})
        d = _pq(sf_dir, child, cols).map_batches(
            probe_for(fks), batch_format="pyarrow"
        )
        part_ds = d if part_ds is None else part_ds.union(d)

    df = part_ds.to_pandas()  # bounded: rels x blocks stat rows + orphans
    stats = df[df["is_stat"] == 1]
    totals = stats.groupby("rel")["n"].sum()
    orph_rows = stats.groupby("rel")["orph"].sum()
    okeys = df[df["is_stat"] == 0]
    nkeys = okeys.groupby("rel")["key"].nunique()
    rows = []
    for rid, (name, *_rest) in enumerate(rels):
        rows.append(
            (
                name,
                int(totals.get(rid, 0)),
                int(orph_rows.get(rid, 0)),
                int(nkeys.get(rid, 0)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["relation", "n_rows", "n_orphan_rows", "n_orphan_keys"],
    )


SQL_FK_ORPHANS = """
SELECT 'lineitem.l_orderkey->orders' AS relation,
       (SELECT count(*) FROM lineitem) AS n_rows,
       (SELECT count(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
         AS n_orphan_rows,
       (SELECT count(DISTINCT l_orderkey) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
         AS n_orphan_keys
UNION ALL
SELECT 'lineitem.l_partkey->part',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem
        WHERE l_partkey NOT IN (SELECT p_partkey FROM part)),
       (SELECT count(DISTINCT l_partkey) FROM lineitem
        WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)),
       (SELECT count(DISTINCT l_suppkey) FROM lineitem
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
UNION ALL
SELECT 'orders.o_custkey->customer',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
       (SELECT count(DISTINCT o_custkey) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
UNION ALL
SELECT 'customer.c_nationkey->nation',
       (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer
        WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)),
       (SELECT count(DISTINCT c_nationkey) FROM customer
        WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
"""


def q_unpivot_nation_stats(sf_dir: str):
    """UNPIVOT/melt (the wide-to-long reshape, inverse of
    pivot_events): ONE grouped integer fold computes three per-nation
    metrics (customer count, total balance in cents, negative-balance
    count), then each grouped row melts into three (nation, metric,
    value) rows — a vectorized repeat/tile, no exchange after the
    fold."""
    cust = _pq(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        k = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "c_nationkey": pa.array(u, pa.int64()),
                "n_cust": pa.array(np.bincount(inv).astype(np.int64)),
                "bal_cents": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
                "n_neg": pa.array(
                    np.bincount(inv, weights=(cents < 0)).astype(np.int64)
                ),
            }
        )

    agg = (
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Sum("n_cust", alias_name="n_cust"),
            Sum("bal_cents", alias_name="bal_cents"),
            Sum("n_neg", alias_name="n_neg"),
        )
    )

    METRICS = ("bal_cents", "n_cust", "n_neg")

    def melt(b: pa.Table) -> pa.Table:
        k = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.stack(
            [b[m].to_numpy(zero_copy_only=False) for m in METRICS], axis=1
        )
        return pa.table(
            {
                "c_nationkey": pa.array(np.repeat(k, len(METRICS))),
                "metric": pa.array(
                    np.tile(np.array(METRICS), len(k)), pa.string()
                ),
                "value": pa.array(vals.reshape(-1), pa.int64()),
            }
        )

    return agg.map_batches(melt, batch_format="pyarrow")


SQL_UNPIVOT_NATION_STATS = """
WITH s AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
         count(*) AS n_cust,
         CAST(sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) AS BIGINT)
           AS bal_cents,
         CAST(count(*) FILTER (round(c_acctbal * 100.0) < 0) AS BIGINT)
           AS n_neg
  FROM customer GROUP BY 1)
SELECT c_nationkey, 'bal_cents' AS metric, bal_cents AS value FROM s
UNION ALL
SELECT c_nationkey, 'n_cust', n_cust FROM s
UNION ALL
SELECT c_nationkey, 'n_neg', n_neg FROM s
"""


REGISTRY.update({'fk_orphans': (q_fk_orphans, SQL_FK_ORPHANS)})


REGISTRY.update({'unpivot_nation_stats': (
            q_unpivot_nation_stats,
            SQL_UNPIVOT_NATION_STATS,
        )})


# --------------------------------- Benford / runner-up gap / LTV / churn


def q_benford_orders(sf_dir: str):
    """Benford first-digit audit (the fraud / data-quality screening
    shape): distribution of the leading digit of each order's price
    in integer cents. The digit derives from pure integer arithmetic
    (divide by 10 until one digit remains — a vectorized log10-free
    loop over at most 19 steps), so both sides agree exactly; counts
    fold per batch through ONE tiny grouped sum."""
    ds = _pq(sf_dir, "orders", ["o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        v = np.abs(cents)
        v = v[v > 0]
        # strip trailing digits: <=19 vectorized halving-free steps
        while (v >= 10).any():
            big = v >= 10
            v = np.where(big, v // 10, v)
        u, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                "digit": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
    )


SQL_BENFORD_ORDERS = """
WITH c AS (
  SELECT abs(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS cents
  FROM orders)
SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       count(*) AS n
FROM c WHERE cents > 0
GROUP BY 1
"""


def q_top2_gap_parts(sf_dir: str):
    """Runner-up gap per group (the nth_value window shape): for each
    part brand, the gap between the highest and second-highest retail
    price in cents. Per-batch partials keep only each brand's TOP-2
    distinct-position prices (a bounded combiner — the exchange
    carries <= 2 rows per brand per block, never the part table);
    the finalizer re-merges and reports brands with >= 2 rows."""
    ds = _pq(sf_dir, "part", ["p_brand", "p_retailprice"])

    def top2(b: pa.Table) -> pa.Table:
        br = b["p_brand"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            b["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.lexsort((-cents, br))
        sb, sc = br[order], cents[order]
        first = np.ones(len(sb), bool)
        first[1:] = sb[1:] != sb[:-1]
        gidx = np.cumsum(first) - 1
        pos = np.arange(len(sb)) - np.flatnonzero(first)[gidx]
        keep = pos < 2
        return pa.table(
            {
                "p_brand": pa.array(sb[keep]),
                "cents": pa.array(sc[keep], pa.int64()),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(g["cents"].to_numpy(np.int64))[::-1]
        if len(c) < 2:
            return pd.DataFrame(
                {"p_brand": [], "gap_cents": []}
            ).astype({"p_brand": str, "gap_cents": np.int64})
        return pd.DataFrame(
            {
                "p_brand": [g["p_brand"].iloc[0]],
                "gap_cents": [int(c[0] - c[1])],
            }
        )

    return (
        ds.map_batches(top2, batch_format="pyarrow")
        .groupby("p_brand")
        .map_groups(finish, batch_format="pandas")
    )


SQL_TOP2_GAP_PARTS = """
WITH c AS (
  SELECT p_brand,
         CAST(round(p_retailprice * 100.0) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY round(p_retailprice * 100.0) DESC)
           AS rn
  FROM part)
SELECT a.p_brand, a.cents - b.cents AS gap_cents
FROM c a JOIN c b ON b.p_brand = a.p_brand AND b.rn = 2
WHERE a.rn = 1
"""


REGISTRY.update({'benford_orders': (q_benford_orders, SQL_BENFORD_ORDERS)})


REGISTRY.update({'top2_gap_parts': (q_top2_gap_parts, SQL_TOP2_GAP_PARTS)})


# ---------------------------------------- MERGE upsert / Z-order layout


def q_merge_upsert_orders(sf_dir: str):
    """MERGE INTO semantics (the lakehouse CDC-apply shape): a
    deterministic change set derived from the orders table itself —
    UPDATE rows whose custkey % 7 == 0 (price +1.00), DELETE rows
    whose orderkey % 13 == 0, INSERT a new row (key + 10^9) for
    orderkey % 97 == 0 — applies to the base in ONE hash-partitioned
    full-outer join; the resolver is a vectorized per-batch CASE.
    Updates win over deletes when both match (MERGE's documented
    WHEN-clause order). Output: the merged table's grouped checksum
    (status, n, cents) so the compare is size-stable."""
    orders = _pq(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus",
                           "o_totalprice"]
    ).materialize()  # two consumers: base + derived change set

    def changes(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        st = b["o_orderstatus"].to_numpy(zero_copy_only=False)
        upd = ck % 7 == 0
        dele = (k % 13 == 0) & ~upd
        ins = k % 97 == 0
        out_k = np.concatenate([k[upd], k[dele], k[ins] + 1_000_000_000])
        op = np.concatenate(
            [
                np.full(upd.sum(), "U"),
                np.full(dele.sum(), "D"),
                np.full(ins.sum(), "I"),
            ]
        )
        out_c = np.concatenate(
            [cents[upd] + 100, np.zeros(dele.sum(), np.int64), cents[ins]]
        )
        out_s = np.concatenate(
            [st[upd], np.full(dele.sum(), ""), np.full(ins.sum(), "N")]
        )
        return pa.table(
            {
                "o_orderkey": pa.array(out_k, pa.int64()),
                "op": pa.array(op, pa.string()),
                "new_cents": pa.array(out_c, pa.int64()),
                "new_status": pa.array(out_s, pa.string()),
            }
        )

    chg = orders.map_batches(changes, batch_format="pyarrow")

    def base_cents(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_orderstatus": b["o_orderstatus"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    base = orders.map_batches(base_cents, batch_format="pyarrow")
    merged = hash_join(base, chg, on=["o_orderkey"], how="full_outer")

    def resolve(b: pa.Table) -> pa.Table:
        op = b["op"].to_numpy(zero_copy_only=False)
        has_chg = pd.notna(op)
        st = b["o_orderstatus"].to_numpy(zero_copy_only=False)
        cents = b["cents"].to_numpy(zero_copy_only=False)
        nc = b["new_cents"].to_numpy(zero_copy_only=False)
        ns = b["new_status"].to_numpy(zero_copy_only=False)
        drop = has_chg & (op == "D")
        use_new = has_chg & ((op == "U") | (op == "I"))
        out_st = np.where(use_new, ns, st)
        out_c = np.where(use_new, nc, cents)
        keep = ~drop
        return pa.table(
            {
                "o_orderstatus": pa.array(
                    out_st[keep].astype(object), pa.string()
                ),
                "cents": pa.array(
                    out_c[keep].astype(np.int64), pa.int64()
                ),
            }
        )

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["o_orderstatus"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        ).rename_columns(["o_orderstatus", "cents", "n"])

    return (
        merged.map_batches(resolve, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
    )


SQL_MERGE_UPSERT_ORDERS = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders),
chg AS (
  SELECT o_orderkey, 'U' AS op, b.cents + 100 AS new_cents,
         b.o_orderstatus AS new_status
  FROM base b JOIN orders o USING (o_orderkey) WHERE o.o_custkey % 7 = 0
  UNION ALL
  SELECT b.o_orderkey, 'D', 0, ''
  FROM base b JOIN orders o USING (o_orderkey)
  WHERE b.o_orderkey % 13 = 0 AND o.o_custkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000000, 'I', cents, 'N'
  FROM base WHERE o_orderkey % 97 = 0),
merged AS (
  SELECT coalesce(c.new_status, b.o_orderstatus) AS o_orderstatus,
         coalesce(c.new_cents, b.cents) AS cents,
         coalesce(c.op, '') AS op
  FROM base b FULL OUTER JOIN chg c USING (o_orderkey))
SELECT o_orderstatus, CAST(sum(cents) AS BIGINT) AS cents,
       count(*) AS n
FROM merged WHERE op <> 'D'
GROUP BY 1
"""


def _morton_spread(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x so bit i lands at position 2i
    (magic-number interleave; public-domain bit trick)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def q_zorder_orders(sf_dir: str):
    """Z-order (Morton) layout keys — the data-layout optimization
    behind multi-column data skipping: interleave the bits of
    (o_custkey, order-day-number) and report the 50 smallest
    (curve-leading) rows. The interleave is 5 shift/mask rounds per
    coordinate (exact uint64, reproduced bit-for-bit by the SQL
    twin's unrolled bit arithmetic); the global top-k is Ray's sort
    + limit — at scale the curve key doubles as the partition/file
    sort key for write_parquet."""
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    DAY = np.int64(86_400_000_000)

    def morton(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (
            b["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // DAY
        )
        z = (_morton_spread(ck) << np.uint64(1)) | _morton_spread(d)
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "zkey": pa.array(z.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(morton, batch_format="pyarrow")
        .sort(["zkey", "o_orderkey"])
        .limit(50)
    )


def _sql_spread(col: str) -> str:
    x = f"(CAST({col} AS UBIGINT) & 4294967295)"
    x = f"(({x} | ({x} << 16)) & 281470681808895)"
    x = f"(({x} | ({x} << 8)) & 71777214294589695)"
    x = f"(({x} | ({x} << 4)) & 1085102592571150095)"
    x = f"(({x} | ({x} << 2)) & 3689348814741910323)"
    x = f"(({x} | ({x} << 1)) & 6148914691236517205)"
    return x


SQL_ZORDER_ORDERS = f"""
WITH m AS (
  SELECT o_orderkey,
         CAST((({_sql_spread('o_custkey')} << 1) |
               {_sql_spread(
                   "floor(epoch_us(o_orderdate) / 86400000000)"
               )}) AS BIGINT) AS zkey
  FROM orders)
SELECT o_orderkey, zkey FROM m ORDER BY zkey, o_orderkey LIMIT 50
"""


REGISTRY.update({'merge_upsert_orders': (
            q_merge_upsert_orders,
            SQL_MERGE_UPSERT_ORDERS,
        )})


REGISTRY.update({'zorder_orders': (q_zorder_orders, SQL_ZORDER_ORDERS)})


def q_mix_shift_segments(sf_dir: str):
    """Period-over-period mix shift (the share-change diagnostic):
    each market segment's share of order volume, in integer basis
    points, in the FIRST vs SECOND half of the order-date range, and
    the shift between them. The midpoint is exact integer
    microseconds ((min+max)//2 — both sides compute it identically);
    shares are floor((n * 10000) / total) so every value is an int64
    and the hash compare is exact. One scan folds per-(segment,
    half) counts; the customer dimension broadcasts."""
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    from ray.data.aggregate import Max, Min

    def us(b: pa.Table) -> pa.Table:
        t = (
            b["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "t_us": pa.array(t, pa.int64()),
            }
        )

    base = orders.map_batches(us, batch_format="pyarrow").materialize()
    rng = base.aggregate(
        Min("t_us", alias_name="lo"), Max("t_us", alias_name="hi")
    )
    mid = (int(rng["lo"]) + int(rng["hi"])) // 2

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    joined = broadcast_join(
        base, cust, on=["o_custkey"], right_on=["c_custkey"]
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        seg = b["c_mktsegment"].to_numpy()
        h = (b["t_us"].to_numpy(np.int64) >= mid).astype(np.int64)
        df = pd.DataFrame({"seg": seg, "h": h})
        g = df.groupby(["seg", "h"]).size().reset_index(name="n")
        return pa.table(
            {
                "c_mktsegment": pa.array(g["seg"].to_numpy(), pa.string()),
                "half": pa.array(g["h"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    counts = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby(["c_mktsegment", "half"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # segment-bounded (|segments| x 2 rows)
    )
    tot = counts.groupby("half")["n"].sum()
    t0, t1 = int(tot.get(0, 0)), int(tot.get(1, 0))
    piv = counts.pivot_table(
        index="c_mktsegment", columns="half", values="n", fill_value=0
    )
    n0 = piv.get(0, pd.Series(0, index=piv.index)).astype(np.int64)
    n1 = piv.get(1, pd.Series(0, index=piv.index)).astype(np.int64)
    bp0 = (n0 * 10000) // max(t0, 1)
    bp1 = (n1 * 10000) // max(t1, 1)
    return pd.DataFrame(
        {
            "c_mktsegment": piv.index.to_numpy(),
            "n_first": n0.to_numpy(),
            "n_second": n1.to_numpy(),
            "share_bp_first": bp0.to_numpy(),
            "share_bp_second": bp1.to_numpy(),
            "shift_bp": (bp1 - bp0).to_numpy(),
        }
    )


SQL_MIX_SHIFT_SEGMENTS = """
WITH rng AS (
  SELECT (CAST(epoch_us(min(o_orderdate)) AS BIGINT)
          + CAST(epoch_us(max(o_orderdate)) AS BIGINT)) // 2 AS mid
  FROM orders),
oc AS (
  SELECT c.c_mktsegment,
         CASE WHEN epoch_us(o.o_orderdate) >= (SELECT mid FROM rng)
              THEN 1 ELSE 0 END AS half
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
counts AS (
  SELECT c_mktsegment, half, count(*) AS n FROM oc GROUP BY 1, 2),
tot AS (SELECT half, sum(n) AS t FROM counts GROUP BY 1),
piv AS (
  SELECT c_mktsegment,
         CAST(coalesce(sum(n) FILTER (half = 0), 0) AS BIGINT)
           AS n_first,
         CAST(coalesce(sum(n) FILTER (half = 1), 0) AS BIGINT)
           AS n_second
  FROM counts GROUP BY 1)
SELECT p.c_mktsegment, p.n_first, p.n_second,
       CAST(p.n_first * 10000 //
            greatest((SELECT t FROM tot WHERE half = 0), 1) AS BIGINT)
         AS share_bp_first,
       CAST(p.n_second * 10000 //
            greatest((SELECT t FROM tot WHERE half = 1), 1) AS BIGINT)
         AS share_bp_second,
       CAST(p.n_second * 10000 //
            greatest((SELECT t FROM tot WHERE half = 1), 1)
          - p.n_first * 10000 //
            greatest((SELECT t FROM tot WHERE half = 0), 1) AS BIGINT)
         AS shift_bp
FROM piv p
"""


REGISTRY.update({'mix_shift_segments': (
            q_mix_shift_segments,
            SQL_MIX_SHIFT_SEGMENTS,
        )})


# ------------------------------------------------- TPC-H shapes (cont.)


def _micro_rev(b: pa.Table, mask=None) -> np.ndarray:
    """Exact integer micro-unit revenue — cents(price)*(100-bp) —
    the house contract for bit-identical partial sums under any
    partitioning (one float divide at the very end, same operands
    both engines)."""
    p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
    d = b["l_discount"].to_numpy(zero_copy_only=False)
    if mask is not None:
        p, d = p[mask], d[mask]
    cents = np.rint(p * 100.0).astype(np.int64)
    bp = np.rint(d * 100.0).astype(np.int64)
    return cents * (100 - bp)


def q_q7_volume(sf_dir: str):
    """The TPC-H Q7 shape — shipping volume between one nation PAIR
    by year. The supplier-nation filter applies BEFORE the fact-fact
    exchange (s_nation is derivable from l_suppkey via a broadcast
    lookup, so ~23/25ths of lineitem never enters the join); the
    customer side resolves after. ONE distributed hash exchange
    (lineitem |x| orders); nations/customers/suppliers ride as sorted
    numpy lookup arrays. Group key packs (s_nat, c_nat, year) into one
    int64 so the final aggregate is a single-column Sum."""
    from ..stages.joins import hash_join

    NA, NB = 1, 2  # NATION_1 <-> NATION_2, both directions
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    ck = np.sort(cust["c_custkey"].to_numpy(np.int64))
    cn = cust.set_index("c_custkey")["c_nationkey"].loc[ck].to_numpy(np.int64)
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sk = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    sn = supp.set_index("s_suppkey")["s_nationkey"].loc[sk].to_numpy(np.int64)

    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1998-01-01", "us").astype(np.int64)

    li = _pq(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def pre(b: pa.Table) -> pa.Table:
        t = (
            b["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        s_nat = sn[np.searchsorted(sk, b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64))]
        keep = (t >= lo) & (t < hi) & ((s_nat == NA) | (s_nat == NB))
        year = (
            t[keep].astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "l_orderkey": pa.array(
                    b["l_orderkey"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
                ),
                "s_nat": pa.array(s_nat[keep]),
                "year": pa.array(year),
                "rev_micro": pa.array(_micro_rev(b, keep)),
            }
        )

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    j = hash_join(
        li.map_batches(pre, batch_format="pyarrow"),
        orders,
        on=["l_orderkey"],
        right_on=["o_orderkey"],
    )

    def partial(b: pa.Table) -> pa.Table:
        c_nat = cn[np.searchsorted(ck, b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64))]
        s_nat = b["s_nat"].to_numpy(zero_copy_only=False)
        keep = ((s_nat == NA) & (c_nat == NB)) | ((s_nat == NB) & (c_nat == NA))
        if not keep.any():
            return pa.table(
                {"pack": pa.array([], pa.int64()), "rev_micro": pa.array([], pa.int64())}
            )
        pack = (
            (s_nat[keep] << 40) | (c_nat[keep] << 20) | b["year"].to_numpy(zero_copy_only=False)[keep]
        )
        rev = b["rev_micro"].to_numpy(zero_copy_only=False)[keep]
        u, inv = np.unique(pack, return_inverse=True)
        return pa.table(
            {
                "pack": pa.array(u, pa.int64()),
                "rev_micro": pa.array(
                    np.bincount(inv, weights=rev).astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("pack")
        .aggregate(Sum("rev_micro", alias_name="rev_micro"))
        .to_pandas()
    )
    pack = agg["pack"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "supp_nation": [name_of[k] for k in (pack >> 40)],
            "cust_nation": [name_of[k] for k in ((pack >> 20) & 0xFFFFF)],
            "l_year": pack & 0xFFFFF,
            "revenue": np.round(agg["rev_micro"].to_numpy(np.float64) / 10000.0, 2),
        }
    )
    return out


SQL_Q7_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT)))
             / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""


def q_q9_profit(sf_dir: str):
    """The TPC-H Q9 shape — profit by supplier nation and ship year
    for one part brand. No partsupp table in this corpus, so supply
    cost is modeled as half retail (50 * qty * cents(p_retailprice)
    in the same 1e-4-dollar micro-units as the revenue term — the
    SQL twin states the identical formula). Brand-filtered partkeys
    + retail cents + supplier nations all broadcast as sorted-array
    lookups: ZERO distributed exchange before the tiny packed-key
    aggregate (year from l_shipdate, no orders join needed)."""
    part = _pq(
        sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"]
    ).to_pandas()
    part = part[part["p_brand"] == "Brand#13"]
    pk = np.sort(part["p_partkey"].to_numpy(np.int64))
    retail_cents = (
        np.rint(
            part.set_index("p_partkey")["p_retailprice"].loc[pk].to_numpy() * 100.0
        ).astype(np.int64)
    )
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sk = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    sn = supp.set_index("s_suppkey")["s_nationkey"].loc[sk].to_numpy(np.int64)
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))

    li = _pq(
        sf_dir,
        "lineitem",
        [
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def partial(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(pk, key)
        pos_c = np.minimum(pos, len(pk) - 1) if len(pk) else pos
        keep = len(pk) > 0 and (pk[pos_c] == key)
        if not np.any(keep):
            return pa.table(
                {"pack": pa.array([], pa.int64()), "amt_micro": pa.array([], pa.int64())}
            )
        rev = _micro_rev(b, keep)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        cost = 50 * qty * retail_cents[pos_c[keep]]
        s_nat = sn[
            np.searchsorted(
                sk, b["l_suppkey"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
            )
        ]
        year = (
            b["l_shipdate"].to_numpy(zero_copy_only=False)[keep]
            .astype("datetime64[us]")
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        pack = (s_nat << 20) | year
        u, inv = np.unique(pack, return_inverse=True)
        return pa.table(
            {
                "pack": pa.array(u, pa.int64()),
                "amt_micro": pa.array(
                    np.bincount(inv, weights=rev - cost).astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("pack")
        .aggregate(Sum("amt_micro", alias_name="amt_micro"))
        .to_pandas()
    )
    pack = agg["pack"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "nation": [name_of[k] for k in (pack >> 20)],
            "o_year": pack & 0xFFFFF,
            "profit": np.round(agg["amt_micro"].to_numpy(np.float64) / 10000.0, 2),
        }
    )


SQL_Q9_PROFIT = """
SELECT n_name AS nation, year(l_shipdate) AS o_year,
       round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))
                 - 50 * CAST(l_quantity AS BIGINT)
                      * CAST(round(p_retailprice*100) AS BIGINT))
             / 10000.0, 2) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_brand = 'Brand#13'
GROUP BY 1, 2
"""


def q_q10_returns(sf_dir: str):
    """The TPC-H Q10 shape — top-20 customers by returned-item
    revenue in a 6-month order window. Returnflag + order-date
    filters apply before the single fact-fact hash exchange; the
    per-customer Sum is customer-bounded, so the top-20 selection
    sorts the integer micro totals (rev DESC, custkey ASC — fully
    deterministic, no float ties) and only then attaches names via
    dimension lookups."""
    from ..stages.joins import hash_join

    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1996-07-01", "us").astype(np.int64)
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilt(b: pa.Table) -> pa.Table:
        t = (
            b["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        keep = (t >= lo) & (t < hi)
        return b.filter(pa.array(keep)).select(["o_orderkey", "o_custkey"])

    li = _pq(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def lfilt(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["l_returnflag"], "R")
        b = b.filter(keep)
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "rev_micro": pa.array(_micro_rev(b), pa.int64()),
            }
        )

    j = hash_join(
        li.map_batches(lfilt, batch_format="pyarrow"),
        orders.map_batches(ofilt, batch_format="pyarrow"),
        on=["l_orderkey"],
        right_on=["o_orderkey"],
    )

    def partial(b: pa.Table) -> pa.Table:
        cust = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = b["rev_micro"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(cust, return_inverse=True)
        return pa.table(
            {
                "c_custkey": pa.array(u, pa.int64()),
                "rev_micro": pa.array(
                    np.bincount(inv, weights=rev).astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("rev_micro", alias_name="rev_micro"))
        .to_pandas()
    )
    agg = agg.sort_values(
        ["rev_micro", "c_custkey"], ascending=[False, True], kind="mergesort"
    ).head(20)
    cust = _pq(
        sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]
    ).to_pandas()
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(cust, on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    out["revenue"] = np.round(out["rev_micro"].to_numpy(np.float64) / 10000.0, 2)
    return out[["c_custkey", "c_name", "n_name", "revenue"]]


SQL_Q10_RETURNS = """
WITH r AS (
  SELECT o_custkey AS c_custkey,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= DATE '1996-01-01'
    AND o_orderdate <  DATE '1996-07-01'
  GROUP BY 1)
SELECT c.c_custkey, c.c_name, n.n_name, round(rev / 10000.0, 2) AS revenue
FROM r
JOIN customer c USING (c_custkey)
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY rev DESC, c.c_custkey
LIMIT 20
"""


def q_q13_custdist(sf_dir: str):
    """The TPC-H Q13 shape — the customer order-count distribution
    INCLUDING the zero bucket (the classic left-join-then-histogram
    two-phase aggregate). Per-custkey counts are one exchange over
    per-batch partials; the histogram of counts is count-bounded
    (tiny); the zero bucket is total customers minus distinct
    buyers — no row-level left join materializes anywhere."""
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["o_orderpriority"], "4-NOT SPECIFIED")
        cust = b.filter(keep)["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(cust, return_counts=True)
        return pa.table(
            {"c_custkey": pa.array(u, pa.int64()), "n": pa.array(cnt.astype(np.int64))}
        )

    counts = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )

    def hist(b: pa.Table) -> pa.Table:
        c = b["c_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table(
            {"c_count": pa.array(u, pa.int64()), "custdist": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        counts.map_batches(hist, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .to_pandas()
    )
    n_cust = _pq(sf_dir, "customer", ["c_custkey"]).count()
    zero = n_cust - int(agg["custdist"].sum())
    if zero > 0:
        agg = pd.concat(
            [agg, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    return agg[["c_count", "custdist"]]


SQL_Q13_CUSTDIST = """
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey)
SELECT c_count, count(*) AS custdist
FROM c_orders GROUP BY c_count
"""


def q_q14_promo(sf_dir: str):
    """The TPC-H Q14 shape — promo revenue share for one ship month.
    The part-type flag is a broadcast bitmask over sorted partkeys;
    ONE scan folds (promo_micro, total_micro) integer partials and
    the share is integer basis points (10000*promo // total) so both
    engines divide identical integers."""
    part = _pq(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    pk = np.sort(part["p_partkey"].to_numpy(np.int64))
    is_promo = (
        part.set_index("p_partkey")["p_type"].loc[pk].to_numpy() == "PROMO"
    )
    lo = np.datetime64("1996-03-01", "us").astype(np.int64)
    hi = np.datetime64("1996-04-01", "us").astype(np.int64)

    li = _pq(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(b: pa.Table) -> pa.Table:
        t = (
            b["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        keep = (t >= lo) & (t < hi)
        rev = _micro_rev(b, keep)
        promo = is_promo[
            np.searchsorted(
                pk, b["l_partkey"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
            )
        ]
        return pa.table(
            {
                "promo_micro": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_micro": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    agg = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    promo, total = int(agg["promo_micro"].sum()), int(agg["total_micro"].sum())
    return pd.DataFrame(
        {
            "promo_revenue": [round(promo / 10000.0, 2)],
            "total_revenue": [round(total / 10000.0, 2)],
            "promo_bp": [promo * 10000 // total],
        }
    )


SQL_Q14_PROMO = """
SELECT round(sum(CASE WHEN p_type = 'PROMO'
                      THEN CAST(round(l_extendedprice*100) AS BIGINT)
                           * (100 - CAST(round(l_discount*100) AS BIGINT))
                      ELSE 0 END) / 10000.0, 2) AS promo_revenue,
       round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT)))
             / 10000.0, 2) AS total_revenue,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(round(l_extendedprice*100) AS BIGINT)
                          * (100 - CAST(round(l_discount*100) AS BIGINT))
                     ELSE 0 END) * 10000
            // sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT)))
            AS BIGINT) AS promo_bp
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
"""


def q_q15_top_supplier(sf_dir: str):
    """The TPC-H Q15 shape — the supplier(s) achieving the maximum
    quarterly revenue (max-of-aggregate then equality filter). The
    per-supplier fold is supplier-bounded after ONE exchange; the max
    and the equality test happen on exact integer micros, so the
    'ties all returned' semantics is deterministic."""
    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1996-04-01", "us").astype(np.int64)
    li = _pq(
        sf_dir,
        "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(b: pa.Table) -> pa.Table:
        t = (
            b["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        keep = (t >= lo) & (t < hi)
        supp = b["l_suppkey"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        rev = _micro_rev(b, keep)
        u, inv = np.unique(supp, return_inverse=True)
        return pa.table(
            {
                "s_suppkey": pa.array(u, pa.int64()),
                "rev_micro": pa.array(
                    np.bincount(inv, weights=rev).astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("rev_micro", alias_name="rev_micro"))
        .to_pandas()
    )
    top = agg[agg["rev_micro"] == agg["rev_micro"].max()]
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = top.merge(supp, on="s_suppkey")
    out["total_revenue"] = np.round(
        out["rev_micro"].to_numpy(np.float64) / 10000.0, 2
    )
    return out[["s_suppkey", "s_name", "total_revenue"]]


SQL_Q15_TOP_SUPPLIER = """
WITH r AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, round(rev / 10000.0, 2) AS total_revenue
FROM supplier JOIN r ON s_suppkey = l_suppkey
WHERE rev = (SELECT max(rev) FROM r)
"""


def q_q17_small_qty(sf_dir: str):
    """The TPC-H Q17 shape — revenue from small-quantity orders of
    one brand's small parts, where 'small quantity' is relative to
    the part's own average (the classic correlated scalar subquery,
    decorrelated into two passes over the brand-filtered fact). The
    comparison qty < 0.2 * avg is done in integers
    (5 * qty * count < sum_qty) so no division happens before the
    final /7.0; the per-part aggregate is bounded by the filtered
    part count and broadcasts back as sorted arrays."""
    part = _pq(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).to_pandas()
    part = part[(part["p_brand"] == "Brand#23") & (part["p_size"] <= 10)]
    pk = np.sort(part["p_partkey"].to_numpy(np.int64))

    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def member(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(pk, key)
        posc = np.minimum(pos, max(len(pk) - 1, 0))
        keep = (pk[posc] == key) if len(pk) else np.zeros(len(key), bool)
        return b.filter(pa.array(keep))

    filtered = li.map_batches(member, batch_format="pyarrow")

    def qpartial(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "l_partkey": pa.array(u, pa.int64()),
                "s": pa.array(np.bincount(inv, weights=qty).astype(np.int64)),
                "c": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    ag = (
        filtered.map_batches(qpartial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
        .to_pandas()
    )
    apk = np.sort(ag["l_partkey"].to_numpy(np.int64))
    order = np.argsort(ag["l_partkey"].to_numpy(np.int64), kind="stable")
    asum = ag["s"].to_numpy(np.int64)[order]
    acnt = ag["c"].to_numpy(np.int64)[order]

    def cents_partial(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(apk, key)
        keep = 5 * qty * acnt[pos] < asum[pos]
        cents = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep] * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "cents": pa.array([int(cents.sum())], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    agg2 = filtered.map_batches(cents_partial, batch_format="pyarrow").to_pandas()
    total_cents, nrows = int(agg2["cents"].sum()), int(agg2["n"].sum())
    avg_yearly = round(total_cents / 700.0, 2) if nrows else None
    return pd.DataFrame({"avg_yearly": [avg_yearly]})


SQL_Q17_SMALL_QTY = """
WITH pk AS (SELECT p_partkey FROM part
            WHERE p_brand = 'Brand#23' AND p_size <= 10),
ag AS (SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS s, count(*) AS c
       FROM lineitem JOIN pk ON p_partkey = l_partkey GROUP BY 1)
SELECT round(sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 700.0, 2)
         AS avg_yearly
FROM lineitem JOIN ag ON ag.l_partkey = lineitem.l_partkey
WHERE 5 * CAST(l_quantity AS BIGINT) * c < s
"""


def q_q19_disjunct(sf_dir: str):
    """The TPC-H Q19 shape — revenue under a three-arm disjunctive
    brand/size/quantity predicate. Part attributes (brand arm id,
    size) broadcast as sorted arrays; the whole disjunction is one
    vectorized boolean expression per batch, one-row integer
    partials, ZERO exchange."""
    part = _pq(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).to_pandas()
    pk = np.sort(part["p_partkey"].to_numpy(np.int64))
    idx = part.set_index("p_partkey").loc[pk]
    brand = idx["p_brand"].to_numpy()
    size = idx["p_size"].to_numpy(np.int64)
    arm = np.zeros(len(pk), np.int8)
    arm[(brand == "Brand#12") & (size >= 1) & (size <= 5)] = 1
    arm[(brand == "Brand#23") & (size >= 1) & (size <= 10)] = 2
    arm[(brand == "Brand#15") & (size >= 1) & (size <= 15)] = 3

    li = _pq(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )

    def partial(b: pa.Table) -> pa.Table:
        a = arm[
            np.searchsorted(
                pk, b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        ]
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (
            ((a == 1) & (qty >= 1) & (qty <= 11))
            | ((a == 2) & (qty >= 10) & (qty <= 20))
            | ((a == 3) & (qty >= 20) & (qty <= 30))
        )
        return pa.table(
            {"rev_micro": pa.array([int(_micro_rev(b, keep).sum())], pa.int64())}
        )

    total = int(
        li.map_batches(partial, batch_format="pyarrow").to_pandas()["rev_micro"].sum()
    )
    return pd.DataFrame({"revenue": [round(total / 10000.0, 2)]})


SQL_Q19_DISJUNCT = """
SELECT round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT)))
             / 10000.0, 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


REGISTRY.update({'q7_volume': (q_q7_volume, SQL_Q7_VOLUME)})


REGISTRY.update({'q9_profit': (q_q9_profit, SQL_Q9_PROFIT)})


REGISTRY.update({'q10_returns': (q_q10_returns, SQL_Q10_RETURNS)})


REGISTRY.update({'q13_custdist': (q_q13_custdist, SQL_Q13_CUSTDIST)})


REGISTRY.update({'q14_promo': (q_q14_promo, SQL_Q14_PROMO)})


REGISTRY.update({'q15_top_supplier': (q_q15_top_supplier, SQL_Q15_TOP_SUPPLIER)})


REGISTRY.update({'q17_small_qty': (q_q17_small_qty, SQL_Q17_SMALL_QTY)})


REGISTRY.update({'q19_disjunct': (q_q19_disjunct, SQL_Q19_DISJUNCT)})


# ------------------------------------------------- regression / graph (cont.)


def q_ols_multi_lineitem(sf_dir: str):
    """Multi-feature OLS via distributed normal equations — fit
    price_cents ~ quantity + discount_bp over the whole fact with
    ONE pass of 9 integer moment partials (n, Sx1, Sx2, Sx11, Sx12,
    Sx22, Sy, Sx1y, Sx2y — all exact int64, bit-identical under any
    partitioning), then the 3x3 Cramer solve on the driver. The SQL
    twin states the IDENTICAL closed-form expression tree over the
    same integer sums cast to DOUBLE, so every IEEE operation matches
    1:1 (products of the raw sums overflow int64, hence the
    float64-after-summation contract on both sides)."""
    li = _pq(sf_dir, "lineitem", ["l_quantity", "l_discount", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        x1 = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = np.rint(
            b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        y = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x1)], pa.int64()),
                "s1": pa.array([int(x1.sum())], pa.int64()),
                "s2": pa.array([int(x2.sum())], pa.int64()),
                "s11": pa.array([int((x1 * x1).sum())], pa.int64()),
                "s12": pa.array([int((x1 * x2).sum())], pa.int64()),
                "s22": pa.array([int((x2 * x2).sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "s1y": pa.array([int((x1 * y).sum())], pa.int64()),
                "s2y": pa.array([int((x2 * y).sum())], pa.int64()),
            }
        )

    m = li.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n, s1, s2 = float(m["n"]), float(m["s1"]), float(m["s2"])
    s11, s12, s22 = float(m["s11"]), float(m["s12"]), float(m["s22"])
    sy, s1y, s2y = float(m["sy"]), float(m["s1y"]), float(m["s2y"])
    # Cramer's rule on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] — the SQL
    # twin repeats these exact expressions term for term.
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    return pd.DataFrame(
        {
            "beta0_cents": [round(det0 / det, 6)],
            "beta_qty": [round(det1 / det, 6)],
            "beta_bp": [round(det2 / det, 6)],
        }
    )


SQL_OLS_MULTI_LINEITEM = """
WITH m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
         CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE) AS s2,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s11,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE) AS s12,
         CAST(sum(CAST(round(l_discount*100) AS BIGINT)
                  * CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE) AS s22,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
           AS s1y,
         CAST(sum(CAST(round(l_discount*100) AS BIGINT)
                  * CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
           AS s2y
  FROM lineitem)
SELECT round((sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
              + s2*(s1y*s12 - s11*s2y))
             / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                + s2*(s1*s12 - s11*s2)), 6) AS beta0_cents,
       round((n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
              + s2*(s1*s2y - s1y*s2))
             / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                + s2*(s1*s12 - s11*s2)), 6) AS beta_qty,
       round((n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
              + sy*(s1*s12 - s11*s2))
             / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                + s2*(s1*s12 - s11*s2)), 6) AS beta_bp
FROM m
"""


REGISTRY.update({'ols_multi_lineitem': (q_ols_multi_lineitem, SQL_OLS_MULTI_LINEITEM)})


# ----------------------------------------- TPC-H completion (Q4/6/8/12/21)
#
# The remaining reference query shapes expressible over the house
# schema. The tables carry no partsupp and no commit/receipt dates or
# ship modes, so Q4/Q12/Q21's "late" predicate is adapted to
# l_shipdate > o_orderdate + N days (the JOIN/EXISTS shape — the thing
# being exercised — is unchanged and the SQL twin states the adapted
# rule exactly); Q2/Q11/Q20 need partsupp and are out of scope
# (documented in COVERAGE.md).

_US_DAY = 86_400_000_000


def q_q6_selective(sf_dir: str):
    """The TPC-H Q6 shape — forecast-revenue from one year's
    discount-band small-quantity lineitems. Pure selective scan:
    column-pruned read, vectorized predicate, one-row integer
    partials (cents x basis points), ZERO exchange. The minimal
    demonstration that a selective aggregate never shuffles."""
    li = _pq(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1997-01-01", "us").astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        t = _date_us(b["l_shipdate"])
        bp = np.rint(
            b["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        keep = (t >= lo) & (t < hi) & (bp >= 5) & (bp <= 7) & (qty < 24)
        cents = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep] * 100.0
        ).astype(np.int64)
        micro = cents * bp[keep]
        return pa.table({"micro": pa.array([int(micro.sum())], pa.int64())})

    total = int(
        li.map_batches(partial, batch_format="pyarrow").to_pandas()["micro"].sum()
    )
    return pd.DataFrame({"revenue": [round(total / 10000.0, 2)]})


SQL_Q6_SELECTIVE = """
SELECT round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                 * CAST(round(l_discount*100) AS BIGINT)) / 10000.0, 2)
         AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q_q8_market_share(sf_dir: str):
    """The TPC-H Q8 shape — NATION_6's supplier market share per
    order-year among AMERICA-region customers for ECONOMY parts. The
    only fact-fact edge (lineitem |x| orders) is ONE distributed hash
    exchange; part membership, customer->nation, supplier->nation and
    the region gate all broadcast as sorted key arrays. Numerator and
    denominator fold as exact integer micro-units per year so the one
    share division happens on identical operands in both engines."""
    part = _pq(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    pk = np.sort(
        part.loc[part["p_type"] == "ECONOMY", "p_partkey"].to_numpy(np.int64)
    )

    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    region = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    america = nation.merge(
        region[region["r_name"] == "AMERICA"],
        left_on="n_regionkey",
        right_on="r_regionkey",
    )
    am_keys = np.sort(america["n_nationkey"].to_numpy(np.int64))
    target_nat = int(nation.loc[nation["n_name"] == "NATION_6", "n_nationkey"].iloc[0])

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    ck = np.sort(cust["c_custkey"].to_numpy(np.int64))
    cn = cust.set_index("c_custkey")["c_nationkey"].loc[ck].to_numpy(np.int64)
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sk = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    sn = supp.set_index("s_suppkey")["s_nationkey"].loc[sk].to_numpy(np.int64)

    lo = np.datetime64("1995-01-01", "us").astype(np.int64)
    hi = np.datetime64("1997-01-01", "us").astype(np.int64)

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_pre(b: pa.Table) -> pa.Table:
        t = _date_us(b["o_orderdate"])
        keep = (t >= lo) & (t < hi)
        yr = (
            b["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)[keep]
            + 1970
        )
        b = b.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "o_year": pa.array(yr, pa.int64()),
            }
        )

    li = _pq(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_pre(b: pa.Table) -> pa.Table:
        key = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(pk, key), max(len(pk) - 1, 0))
        keep = (pk[pos] == key) if len(pk) else np.zeros(len(key), bool)
        return b.filter(pa.array(keep)).drop_columns(["l_partkey"])

    j = hash_join(
        li.map_batches(li_pre, batch_format="pyarrow"),
        orders.map_batches(ord_pre, batch_format="pyarrow"),
        on=["l_orderkey"],
        right_on=["o_orderkey"],
    )

    def partial(b: pa.Table) -> pa.Table:
        ckey = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c_nat = cn[np.searchsorted(ck, ckey)]
        posn = np.minimum(np.searchsorted(am_keys, c_nat), max(len(am_keys) - 1, 0))
        keep = am_keys[posn] == c_nat
        if not keep.any():
            return pa.table(
                {
                    "o_year": pa.array([], pa.int64()),
                    "num_micro": pa.array([], pa.int64()),
                    "den_micro": pa.array([], pa.int64()),
                }
            )
        micro = _micro_rev(b, keep)
        skey = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        is_target = sn[np.searchsorted(sk, skey)] == target_nat
        yr = b["o_year"].to_numpy(zero_copy_only=False)[keep]
        u, inv = np.unique(yr, return_inverse=True)
        return pa.table(
            {
                "o_year": pa.array(u, pa.int64()),
                "num_micro": pa.array(
                    np.bincount(inv, weights=micro * is_target).astype(np.int64)
                ),
                "den_micro": pa.array(
                    np.bincount(inv, weights=micro).astype(np.int64)
                ),
            }
        )

    ag = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("num_micro", alias_name="num"), Sum("den_micro", alias_name="den")
        )
        .to_pandas()
    )
    ag["mkt_share"] = (ag["num"] / ag["den"]).round(6)
    return ag[["o_year", "mkt_share"]]


SQL_Q8_MARKET_SHARE = """
WITH am AS (SELECT n_nationkey FROM nation
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA'),
tgt AS (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_6'),
f AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT)) AS micro,
         s_nationkey
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN part     ON p_partkey = l_partkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE p_type = 'ECONOMY'
    AND c_nationkey IN (SELECT n_nationkey FROM am)
    AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
)
SELECT o_year,
       round(sum(CASE WHEN s_nationkey IN (SELECT n_nationkey FROM tgt)
                      THEN micro ELSE 0 END) * 1.0 / sum(micro), 6)
         AS mkt_share
FROM f GROUP BY o_year
"""


def q_q4_priority(sf_dir: str):
    """The TPC-H Q4 shape — order-priority counts over one quarter's
    orders having at least one late lineitem (EXISTS semi-join;
    'late' adapted to shipped > 60 days after the order date — the
    schema has no commit/receipt dates). The quarter's orders
    broadcast as sorted (orderkey, date, priority) arrays; the
    lineitem scan emits per-batch DISTINCT matched orderkeys, one
    bounded exchange dedups them, priorities resolve by searchsorted
    — the fact table is never joined row-for-row."""
    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1996-04-01", "us").astype(np.int64)
    orders = _pq(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).to_pandas()
    t = orders["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
    q = orders[(t >= lo) & (t < hi)]
    ok = np.sort(q["o_orderkey"].to_numpy(np.int64))
    idx = q.set_index("o_orderkey").loc[ok]
    odate = idx["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
    prio = idx["o_orderpriority"].to_numpy()

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def matched(b: pa.Table) -> pa.Table:
        key = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(ok, key), max(len(ok) - 1, 0))
        hit = (ok[pos] == key) if len(ok) else np.zeros(len(key), bool)
        late = hit & (_date_us(b["l_shipdate"]) > odate[pos] + 60 * _US_DAY)
        return pa.table(
            {"o_orderkey": pa.array(np.unique(key[late]), pa.int64())}
        )

    distinct = (
        li.map_batches(matched, batch_format="pyarrow")
        .groupby("o_orderkey")
        .count()
    )

    def to_prio(b: pa.Table) -> pa.Table:
        key = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"o_orderpriority": pa.array(prio[np.searchsorted(ok, key)])}
        )

    return (
        distinct.map_batches(to_prio, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="order_count"))
    )


SQL_Q4_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q_q12_late_lines(sf_dir: str):
    """The TPC-H Q12 shape — per line-status, how many LATE lineitems
    (shipped > 90 days after the order date; the schema has no ship
    modes, so l_linestatus plays the grouping column) came from
    critical-priority orders vs not. lineitem |x| orders is the ONE
    hash exchange; the CASE aggregation folds as per-batch integer
    partials."""
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def ord_pre(b: pa.Table) -> pa.Table:
        crit = pc.is_in(
            b["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "odate_us": pa.array(_date_us(b["o_orderdate"]), pa.int64()),
                "crit": pa.array(
                    crit.to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"])
    j = hash_join(
        li,
        orders.map_batches(ord_pre, batch_format="pyarrow"),
        on=["l_orderkey"],
        right_on=["o_orderkey"],
    )

    def partial(b: pa.Table) -> pa.Table:
        late = _date_us(b["l_shipdate"]) > (
            b["odate_us"].to_numpy(zero_copy_only=False) + 90 * _US_DAY
        )
        st = b["l_linestatus"].to_numpy(zero_copy_only=False)[late]
        crit = b["crit"].to_numpy(zero_copy_only=False)[late]
        u, inv = np.unique(st, return_inverse=True)
        return pa.table(
            {
                "l_linestatus": pa.array(u),
                "high": pa.array(
                    np.bincount(inv, weights=crit).astype(np.int64)
                ),
                "low": pa.array(
                    np.bincount(inv, weights=1 - crit).astype(np.int64)
                ),
            }
        )

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(
            Sum("high", alias_name="high_line_count"),
            Sum("low", alias_name="low_line_count"),
        )
    )


SQL_Q12_LATE_LINES = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
"""


def q_q21_waiting(sf_dir: str):
    """The TPC-H Q21 shape — suppliers who single-handedly held up a
    multi-supplier finished order (they shipped late, somebody else
    supplied the order, nobody else shipped late; 'late' adapted to
    > 60 days after the order date). lineitem |x| F-status orders is
    ONE hash exchange; the per-order EXISTS / NOT-EXISTS pair then
    resolves inside hash(orderkey)-bucketed groups (order groups are
    tiny, the bucket count bounds task fan-out), and the survivor
    counts fold per supplier. Top-10 by (numwait DESC, s_suppkey) —
    a deterministic boundary on both engines."""
    from ..functions.hashing import splitmix64

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"])

    def ord_pre(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["o_orderstatus"], "F"))
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "odate_us": pa.array(_date_us(b["o_orderdate"]), pa.int64()),
            }
        )

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    j = hash_join(
        li,
        orders.map_batches(ord_pre, batch_format="pyarrow"),
        on=["l_orderkey"],
        right_on=["o_orderkey"],
    )
    B = 64

    def pre(b: pa.Table) -> pa.Table:
        key = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        late = _date_us(b["l_shipdate"]) > (
            b["odate_us"].to_numpy(zero_copy_only=False) + 60 * _US_DAY
        )
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(key.astype(np.uint64)) % np.uint64(B)).astype(
                        np.int64
                    )
                ),
                "ok": pa.array(key),
                "supp": b["l_suppkey"],
                "late": pa.array(late.astype(np.int64)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["ok", "supp", "late"])
        # per (order, supplier): did this supplier ship late at all
        sl = d.groupby(["ok", "supp"], sort=False)["late"].max().reset_index()
        per_ord = sl.groupby("ok", sort=False)["late"].agg(["size", "sum"])
        ok_orders = per_ord[(per_ord["size"] >= 2) & (per_ord["sum"] == 1)]
        m = sl[sl["late"] == 1].merge(
            ok_orders.reset_index()[["ok"]], on="ok"
        )
        out = m.groupby("supp", sort=False).size().reset_index(name="n")
        return out.rename(columns={"supp": "s_suppkey"})

    waits = (
        j.map_batches(pre, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("n", alias_name="numwait"))
    )
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    sk = np.sort(supp["s_suppkey"].to_numpy(np.int64))
    snames = supp.set_index("s_suppkey")["s_name"].loc[sk].to_numpy()

    top = (
        waits.sort(["numwait", "s_suppkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    top["s_name"] = snames[np.searchsorted(sk, top["s_suppkey"].to_numpy(np.int64))]
    return top[["s_suppkey", "s_name", "numwait"]]


SQL_Q21_WAITING = """
WITH f AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
qual AS (
  SELECT l_orderkey FROM f
  GROUP BY l_orderkey
  HAVING count(*) >= 2 AND sum(late) = 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM f JOIN qual USING (l_orderkey) JOIN supplier ON s_suppkey = l_suppkey
WHERE late = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 10
"""


REGISTRY.update({'q4_priority': (q_q4_priority, SQL_Q4_PRIORITY)})


REGISTRY.update({'q6_selective': (q_q6_selective, SQL_Q6_SELECTIVE)})


REGISTRY.update({'q8_market_share': (q_q8_market_share, SQL_Q8_MARKET_SHARE)})


REGISTRY.update({'q12_late_lines': (q_q12_late_lines, SQL_Q12_LATE_LINES)})


REGISTRY.update({'q21_waiting': (q_q21_waiting, SQL_Q21_WAITING)})


def q_cube_agg(sf_dir: str):
    """CUBE(status, priority) over orders — all four grouping sets
    (both, each alone, grand total) with the 'ALL' sentinel, in ONE
    scan: each batch emits partial rows for every grouping set, one
    grouped fold finishes. Rounds out the GROUPING SETS family
    (rollup_grouping covers ROLLUP). Money folds as exact cents."""
    ds = _pq(
        sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        st = b["o_orderstatus"].to_numpy(zero_copy_only=False)
        pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        alls = np.full(len(st), "ALL", dtype=object)
        frames = []
        for s_col, p_col in ((st, pr), (st, alls), (alls, pr), (alls, alls)):
            df = pd.DataFrame(
                {"o_orderstatus": s_col, "o_orderpriority": p_col, "cents": cents}
            )
            g = df.groupby(
                ["o_orderstatus", "o_orderpriority"], sort=False
            ).agg(n=("cents", "size"), cents=("cents", "sum"))
            frames.append(g.reset_index())
        return pa.Table.from_pandas(
            pd.concat(frames, ignore_index=True), preserve_index=False
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    )

    def finish(b: pa.Table) -> pa.Table:
        total = (
            b["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
            / 100.0
        )
        return pa.table(
            {
                "o_orderstatus": b["o_orderstatus"],
                "o_orderpriority": b["o_orderpriority"],
                "n": b["n"],
                "total_price": pa.array(np.round(total, 2)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_CUBE_AGG = """
SELECT COALESCE(o_orderstatus, 'ALL')   AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(count(*) AS BIGINT)         AS n,
       round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             / 100.0, 2) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


REGISTRY.update({'cube_agg': (q_cube_agg, SQL_CUBE_AGG)})


def q_share_hierarchy_nations(sf_dir: str):
    """Percent-of-parent at two hierarchy levels in one scan — each
    nation's order revenue as a share of its region, and each
    region's share of the grand total (the drill-down decomposition
    every rollup report needs). One pass over orders with the
    customer->nation map broadcast; the 25-nation fold finishes on
    the driver. Cents exact; shares floor-quantized, identical
    operands both engines."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    ck = np.sort(cust["c_custkey"].to_numpy(np.int64))
    cn = cust.set_index("c_custkey")["c_nationkey"].loc[ck].to_numpy(np.int64)
    nation = _pq(
        sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    region = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()

    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        key = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = cn[np.searchsorted(ck, key)]
        cents = np.rint(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(nat, return_inverse=True)
        return pa.table(
            {
                "n_nationkey": pa.array(u, pa.int64()),
                "cents": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
            }
        )

    nat_cents = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("cents", alias_name="nation_cents"))
        .to_pandas()
    )
    df = nat_cents.merge(nation, on="n_nationkey").merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    reg = df.groupby("r_name")["nation_cents"].sum().rename("region_cents")
    df = df.join(reg, on="r_name")
    total = int(df["nation_cents"].sum())
    df["share_in_region"] = (
        np.floor(df["nation_cents"] / df["region_cents"] * 1e6) / 1e6
    )
    df["region_share"] = (
        np.floor(df["region_cents"] / total * 1e6) / 1e6
    )
    out = df[
        ["r_name", "n_name", "nation_cents", "share_in_region", "region_share"]
    ].copy()
    out["nation_cents"] = out["nation_cents"].astype(np.int64)
    return out


SQL_SHARE_HIERARCHY_NATIONS = """
WITH j AS (
  SELECT n_name, r_name, CAST(round(o_totalprice*100) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation   ON n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n_regionkey
),
nat AS (SELECT r_name, n_name, CAST(sum(cents) AS BIGINT) AS nation_cents
        FROM j GROUP BY 1, 2),
reg AS (SELECT r_name, CAST(sum(nation_cents) AS BIGINT) AS region_cents
        FROM nat GROUP BY 1),
tot AS (SELECT CAST(sum(region_cents) AS BIGINT) AS t FROM reg)
SELECT nat.r_name, n_name, nation_cents,
       floor(nation_cents * 1.0 / region_cents * 1000000) / 1000000
         AS share_in_region,
       floor(region_cents * 1.0 / (SELECT t FROM tot) * 1000000) / 1000000
         AS region_share
FROM nat JOIN reg USING (r_name)
"""


REGISTRY.update({'share_hierarchy_nations': (
            q_share_hierarchy_nations,
            SQL_SHARE_HIERARCHY_NATIONS,
        )})


def q_q1_pricing(sf_dir: str):
    """The FULL TPC-H Q1 pricing summary (groupby_agg carries the
    bare shape; this is the canonical column set: base / discounted /
    charged revenue incl. tax, averages, row counts, with the
    shipdate cutoff). Every money sum folds as exact integers —
    cents, cents*(100-bp), cents*(100-bp)*(100+taxbp) micro-micro
    units — so partials are bit-identical under any partitioning;
    averages divide once on identical operands, floor-quantized."""
    li = _pq(
        sf_dir,
        "lineitem",
        [
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        ],
    )
    cutoff = np.datetime64("2000-09-02", "us").astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        keep = _date_us(b["l_shipdate"]) <= cutoff
        t = b.filter(pa.array(keep))
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        bp = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        txp = np.rint(
            t["l_tax"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        disc = cents * (100 - bp)
        charge = disc * (100 + txp)
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_numpy(
                    zero_copy_only=False
                ),
                "l_linestatus": t["l_linestatus"].to_numpy(
                    zero_copy_only=False
                ),
                "qty": qty,
                "cents": cents,
                "disc": disc,
                "charge": charge,
            }
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("qty", "sum"),
                cents=("cents", "sum"),
                disc=("disc", "sum"),
                charge=("charge", "sum"),
                n=("qty", "size"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ag = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("cents", alias_name="cents"),
            Sum("disc", alias_name="disc"),
            Sum("charge", alias_name="charge"),
            Sum("n", alias_name="count_order"),
        )
        .to_pandas()
    )
    fq = lambda x: np.floor(x * 1e6) / 1e6  # noqa: E731
    out = pd.DataFrame(
        {
            "l_returnflag": ag["l_returnflag"],
            "l_linestatus": ag["l_linestatus"],
            "sum_qty": ag["sum_qty"].astype(np.int64),
            # integer HALF-UP to cents (exact 1e-4 / 1e-6 dollar units
            # land exactly on .005 boundaries, where float half-even
            # and SQL half-away disagree — integer (x+half)//unit is
            # identical in both engines)
            "sum_base_price": ag["cents"] / 100.0,
            "sum_disc_price": (ag["disc"] + 50) // 100 / 100.0,
            "sum_charge": (ag["charge"] + 5000) // 10000 / 100.0,
            "avg_qty": fq(ag["sum_qty"] / ag["count_order"]),
            "avg_price": fq(ag["cents"] / 100.0 / ag["count_order"]),
            "count_order": ag["count_order"].astype(np.int64),
        }
    )
    return out


SQL_Q1_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
            AS BIGINT) / 100.0 AS sum_base_price,
       ((CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT)))
              AS BIGINT) + 50) // 100) / 100.0 AS sum_disc_price,
       ((CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT))
                  * (100 + CAST(round(l_tax*100) AS BIGINT)))
              AS BIGINT) + 5000) // 10000) / 100.0 AS sum_charge,
       floor(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) * 1.0
             / count(*) * 1000000) / 1000000 AS avg_qty,
       floor(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
                  AS BIGINT) / 100.0 / count(*) * 1000000) / 1000000
         AS avg_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


REGISTRY.update({'q1_pricing': (q_q1_pricing, SQL_Q1_PRICING)})
