"""Relational operator suite over the driver's TPC-H-ish tables.

Each entry re-expresses an operator family from SURVEY.md §2 as a Ray
Data pipeline AND carries the equivalent ANSI SQL for the DuckDB
oracle (the ``__ray_entry__.py`` contract). Column names match the SQL
exactly; computed doubles are rounded identically on both sides so the
order-insensitive value-hash comparison is stable.

Scale notes baked in:
- every read prunes columns (``read_parquet(columns=[...])``);
- grouped aggregates use Ray's partial+final AggregateFns (combine per
  block, merge small partials — no raw-row shuffle of values that can
  be pre-reduced);
- small dimension tables broadcast (ray.put) instead of shuffling;
- both-sides-large joins use the hash-partitioned ``Dataset.join``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from ..stages.joins import broadcast_join, hash_join


def _pq(sf_dir: str, table: str, columns: list[str] | None = None):
    # metadata strip fuses with the read task; pandas-written parquet
    # carries a b'pandas' schema-metadata dict that makes pa.Schema
    # UNHASHABLE, knocking every downstream sort/groupby/join reduce
    # off Ray's schema-dedup fast path (one warning per block pair)
    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns
    ).map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def _round_cols(decimals: dict[str, int]):
    def fn(b: pa.Table) -> pa.Table:
        for col, d in decimals.items():
            if col in b.column_names:
                b = b.set_column(
                    b.column_names.index(col),
                    col,
                    pc.round(pc.cast(b[col], pa.float64()), ndigits=d),
                )
        return b

    return fn


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


def q_window_tumbling(sf_dir: str):
    """§2.9 stream-shaped: tumbling 1h window per event_type."""
    ds = _pq(sf_dir, "events", ["ts", "event_type", "value"])

    def add_window(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        hour = pc.divide(us, 3_600_000_000)
        return b.append_column("hour", pc.cast(hour, pa.int64()))

    out = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return out.map_batches(
        _round_cols({"sum_value": 4}), batch_format="pyarrow"
    )


SQL_WINDOW_TUMBLING = """
SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, hour
"""


def q_window_hopping(sf_dir: str):
    """§2.9 stream-shaped: HOPPING window — 2h size, 1h hop, so every
    event belongs to exactly two overlapping windows (window_start is
    the hour index the window opens at). The 2x fan-out never reaches
    the exchange: each batch duplicates rows in numpy, pre-aggregates
    (event_type, window_start) partials with a pandas hash groupby,
    and only the tiny partial table shuffles."""
    ds = _pq(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        h = (
            pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        et = b["event_type"].to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": np.tile(et, 2),
                "window_start": np.concatenate([h, h - 1]),
                "n": 1,
                "sum_value": np.tile(val, 2),
            }
        )
        agg = df.groupby(
            ["event_type", "window_start"], as_index=False, sort=False
        ).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
    )
    return out.map_batches(
        _round_cols({"sum_value": 4}), batch_format="pyarrow"
    )


SQL_WINDOW_HOPPING = """
SELECT event_type, CAST(h - k AS BIGINT) AS window_start,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM (SELECT event_type, value,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h FROM events),
     unnest([0, 1]) AS t(k)
GROUP BY event_type, window_start
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


def q_json_extract(sf_dir: str):
    """§2.8 JSON scalar: extract props.k (vectorized regex, no
    per-row json.loads)."""
    ds = _pq(sf_dir, "events", ["event_id", "props"])

    def fn(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(
            pc.if_else(pc.is_valid(m), pc.struct_field(m, "k"), None),
            pa.int64(),
        )
        return pa.table({"event_id": b["event_id"], "k": k})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_JSON_EXTRACT = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
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


def q_ann_topk(sf_dir: str):
    """Similarity search: exact cosine top-5, queries = vec_id 0..2."""
    from ..stages.similarity import brute_topk

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 3)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    Q = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    out = brute_topk(ds, Q, k=5).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out[["query_id", "vec_id", "rank"]].astype(
        {"query_id": "int64", "vec_id": "int64", "rank": "int64"}
    )


SQL_ANN_TOPK = """
SELECT query_id, vec_id, rank FROM (
  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           v.embedding::DOUBLE[]) DESC,
                    v.vec_id) AS rank
  FROM embeddings q CROSS JOIN embeddings v
  WHERE q.vec_id < 3)
WHERE rank <= 5
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


#: coarse shuffle width for per-user event queries: grouping by the
#: raw user_id would create one Ray group PER USER (~0.5 ms each —
#: millions of groups at high cardinality); instead shuffle on
#: hash(user_id) %% K and do the per-user work vectorized inside the
#: coarse group. Correctness: a user's rows always share a bucket.
COARSE_USER_BUCKETS = 64


def _by_user_bucket(ds, col: str = "user_id"):
    from ..functions.hashing import splitmix64

    def add_bucket(b: pa.Table) -> pa.Table:
        u = b[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (
            splitmix64(u) % np.uint64(COARSE_USER_BUCKETS)
        ).astype(np.int64)
        return b.append_column("bucket", pa.array(bucket))

    return ds.map_batches(add_bucket, batch_format="pyarrow").groupby("bucket")


def q_asof_join(sf_dir: str):
    """As-of join (SURVEY.md custom-operator case): each 'click' event
    matched to the latest prior 'view' event of the same user.
    Partition by user -> per-group pandas merge_asof (sorted within
    group; the documented bucketed as-of pattern)."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        views = g[g["event_type"] == "view"].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        if len(clicks) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "view_event_id": pd.Series(dtype="float64"),
                }
            )
        # ONE vectorized merge_asof for the whole bucket (by=user):
        # no per-user pandas groups
        j = pd.merge_asof(
            clicks,
            views[["user_id", "ts", "event_id"]].rename(
                columns={"event_id": "view_event_id"}
            ),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
        )
        return j[["event_id", "user_id", "view_event_id"]]

    out = _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")

    def fix_types(b: pa.Table) -> pa.Table:
        col = pc.cast(b["view_event_id"], pa.float64())
        return b.set_column(
            b.column_names.index("view_event_id"), "view_event_id", col
        )

    return out.map_batches(fix_types, batch_format="pyarrow")


SQL_ASOF_JOIN = """
SELECT c.event_id AS event_id, c.user_id AS user_id,
       CAST(v.event_id AS DOUBLE) AS view_event_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts > v.ts
"""


def q_session_window(sf_dir: str):
    """Session windows (streaming §2.9): per user, a >30-minute gap
    starts a new session; emit session counts per user."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "n_sessions": pd.Series(dtype="int64")}
            )
        ts = g["ts"].to_numpy()
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        # compare in microseconds — truncating to whole seconds would
        # disagree with SQL epoch() on gaps within 1s of the threshold
        gaps_us = np.zeros(n, dtype=np.int64)
        gaps_us[1:] = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
        new_session = new_user | (gaps_us > 1800 * 1_000_000)
        starts = np.flatnonzero(new_user)
        n_sessions = np.add.reduceat(new_session.astype(np.int64), starts)
        return pd.DataFrame({"user_id": u[starts], "n_sessions": n_sessions})

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_SESSION_WINDOW = """
SELECT user_id, count(*) AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM (SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM events))
WHERE new_session = 1 GROUP BY user_id
"""


def q_running_sum(sf_dir: str):
    """Running aggregate: cumulative value per user ordered by
    (ts, event_id) — ordered-fold semantics inside map_groups."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # pandas groupby-cumsum is a single C kernel over the sorted
        # frame (NOT per-user Python groups), and float addition order
        # per user is identical to the per-user form
        run = g.groupby("user_id", sort=False)["value"].cumsum().round(4)
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "running_value": run,
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_RUNNING_SUM = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 4)
         AS running_value
FROM events
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


def q_cosine_pairs(sf_dir: str):
    """Exhaustive exact cosine self-join over the embeddings table:
    every unordered pair with cosine >= 0.4 (streamed left x broadcast
    right, float64 matmul per batch — stages/similarity.cosine_pairs).
    The oracle-checkable form of the embedding near-dup VERIFY kernel;
    at corpus scale the right side is the bounded SRP-LSH candidate
    set, not the full table."""
    from ..stages.similarity import cosine_pairs

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_pairs(emb, threshold=0.4)


SQL_COSINE_PAIRS = """
SELECT id_a, id_b, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS c
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
WHERE c >= 0.4
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


def q_connected_components(sf_dir: str):
    """Connected components over a deterministic LONG-CHAIN graph:
    edges c_custkey -> c_custkey+1 except where c_custkey % 101 == 0,
    so components are 101-key intervals of diameter 100 — the regime
    that punishes any CC implementation with a fixed low iteration
    cap. Node ids travel as 12-digit zero-padded strings (the CC
    kernel's lexicographic MIN == numeric MIN), cast back to int64 at
    the edge. Oracle = DuckDB recursive-CTE transitive closure."""
    from ..stages.canonicalize import connected_components

    cust = _pq(sf_dir, "customer", ["c_custkey"])

    def edges(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = k[k % 101 != 0]

        def pad(x: np.ndarray):
            return pc.utf8_lpad(
                pc.cast(pa.array(x, pa.int64()), pa.string()), 12, "0"
            )

        return pa.table({"a": pad(a), "b": pad(a + 1)})

    labs = connected_components(
        cust.map_batches(edges, batch_format="pyarrow")
    )

    def unpad(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(b["node"], pa.int64()),
                "component": pc.cast(b["label"], pa.int64()),
            }
        )

    return labs.map_batches(unpad, batch_format="pyarrow")


SQL_CONNECTED_COMPONENTS = """
WITH RECURSIVE e AS (
  SELECT c_custkey AS a, c_custkey + 1 AS b
  FROM customer WHERE c_custkey % 101 <> 0
),
und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
reach(node, s) AS (
  SELECT a, a FROM und GROUP BY a
  UNION
  SELECT und.b, reach.s FROM reach JOIN und ON und.a = reach.node
)
SELECT node, MIN(s) AS component FROM reach GROUP BY node
"""


def q_window_moving_avg(sf_dir: str):
    """Sliding window frame (§2.9): per-user moving average of
    ``value`` over the last 3 events ordered by (ts, event_id).
    Coarse-bucket shuffle + ONE vectorized shifted-add pass per bucket
    — the in-frame summation order (v[i-2] + v[i-1] + v[i]) matches
    SQL's left-to-right frame order, so the rounded doubles hash-match
    the oracle."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        v = g["value"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "moving_avg": pd.Series(dtype="float64"),
                }
            )
        same1 = np.zeros(n, dtype=bool)
        same1[1:] = u[1:] == u[:-1]  # row i-1 belongs to the same user
        same2 = np.zeros(n, dtype=bool)
        same2[2:] = u[2:] == u[:-2]  # row i-2 belongs to the same user
        v1 = np.zeros(n)
        v1[1:] = v[:-1]
        v2 = np.zeros(n)
        v2[2:] = v[:-2]
        s = np.where(same2, v2, 0.0) + np.where(same1, v1, 0.0) + v
        cnt = 1 + same1.astype(np.int64) + same2.astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "moving_avg": np.round(s / cnt, 4),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_WINDOW_MOVING_AVG = """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             4) AS moving_avg
FROM events
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


def q_pagerank(sf_dir: str):
    """Power-iteration PageRank (stages/graph.py) over a deterministic
    ring+chord digraph on the customer keys: every node has the ring
    edge ``c -> (c+1) % N``; every third node adds the chord
    ``c -> (7c+3) % N``. No dangling nodes, in-degree >= 1 everywhere,
    diameter ~N/chords — an honest iterative-convergence workload.
    Edge duplicates (chord == ring target) are masked per ROW, so no
    global dedup exchange is needed. Oracle = DuckDB recursive CTE
    with aggregate recursion (10 exact iterations)."""
    from ..stages.graph import pagerank

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n  # drop chords equal to the ring edge
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    return pagerank(
        cust.map_batches(edges, batch_format="pyarrow"),
        damping=0.85,
        iters=10,
    )


SQL_PAGERANK = """
WITH RECURSIVE
cnt AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src,
         (c_custkey + 1) % (SELECT n FROM cnt) AS dst
  FROM customer
  UNION
  SELECT c_custkey AS src,
         (c_custkey * 7 + 3) % (SELECT n FROM cnt) AS dst
  FROM customer WHERE c_custkey % 3 = 0
),
dg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src),
pr(it, node, r) AS (
  SELECT 0, c_custkey, CAST(1.0 AS DOUBLE) / (SELECT n FROM cnt)
  FROM customer
  UNION ALL
  SELECT p.it + 1, e.dst,
         CAST(0.15 AS DOUBLE) / (SELECT n FROM cnt)
           + CAST(0.85 AS DOUBLE) * SUM(p.r / dg.d)
  FROM pr p JOIN dg ON dg.src = p.node JOIN e ON e.src = p.node
  WHERE p.it < 10
  GROUP BY p.it + 1, e.dst
)
SELECT node, round(r * (SELECT n FROM cnt), 6) AS rank
FROM pr WHERE it = 10
"""


def q_kmeans_assign(sf_dir: str):
    """Nearest-centroid assignment (the per-row step of distributed
    k-means, stages/cluster.py) with DETERMINISTIC centroids — the
    embeddings of the 8 smallest vec_ids — so the whole step is
    SQL-expressible and value-hash-checked (DuckDB list_distance).
    Float64 on exactly-widened float32 input on both sides; ties break
    to the smallest cluster id on both sides."""
    from ..stages.cluster import deterministic_centroids, kmeans_assign

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = deterministic_centroids(emb, 8)
    return kmeans_assign(emb, C).drop_columns(["embedding"])


SQL_KMEANS_ASSIGN = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
d AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
best AS (
  SELECT vec_id, cluster, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster)
           AS rn
  FROM d
)
SELECT vec_id, cluster, round(dist, 6) AS dist FROM best WHERE rn = 1
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


def q_pq_codes(sf_dir: str):
    """Product-quantization encoding (stages/pq.py:pq_encode) with
    DETERMINISTIC codebooks — subvectors of the 16 smallest vec_ids —
    so the whole compressed store is SQL-expressible: for each of the
    8 subspaces DuckDB slices the DOUBLE[] embedding and argmins
    list_distance over the 16 codebook rows (ties to the smallest
    code on both sides). Output long form (vec_id, subspace, code)."""
    from ..stages.pq import deterministic_codebooks, pq_encode

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = deterministic_codebooks(emb, m=8, ks=16)
    codes = pq_encode(emb, books)

    def flatten(b: pa.Table) -> pa.Table:
        arr = b["codes"].combine_chunks()
        m = arr.type.list_size
        n = len(arr)
        return pa.table(
            {
                "vec_id": pa.array(
                    np.repeat(
                        b["vec_id"].to_numpy(zero_copy_only=False), m
                    ),
                    pa.int64(),
                ),
                "subspace": pa.array(
                    np.tile(np.arange(m, dtype=np.int64), n), pa.int64()
                ),
                "code": arr.values,
            }
        )

    return codes.map_batches(flatten, batch_format="pyarrow")


SQL_PQ_CODES = """
WITH base AS (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16),
books AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
         CAST(embedding AS DOUBLE[]) AS v
  FROM base
),
subs AS (SELECT range AS subspace FROM range(8)),
cent AS (
  SELECT subs.subspace, books.code,
         (books.v)[subs.subspace * 8 + 1 : subs.subspace * 8 + 8] AS cvec
  FROM subs CROSS JOIN books
),
d AS (
  SELECT e.vec_id, cent.subspace, cent.code,
         list_distance(
           (CAST(e.embedding AS DOUBLE[]))
             [cent.subspace * 8 + 1 : cent.subspace * 8 + 8],
           cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
best AS (
  SELECT vec_id, subspace, code,
         row_number() OVER (PARTITION BY vec_id, subspace
                            ORDER BY dist, code) AS rn
  FROM d
)
SELECT vec_id, subspace, code FROM best WHERE rn = 1
"""


def q_triangle_count(sf_dir: str):
    """Exact triangle count (stages/graph.py:triangle_count —
    degree-oriented wedge generation + coarse closure exchange) over a
    deterministic undirected graph on the customer keys: ring edges
    (i, i+1) and (i, i+2) — one triangle per node — plus chords
    (i, 5i+1) for every 4th node for irregular degree. Normalization
    (direction/self-loop/multi-edge) is exercised because the
    generator emits raw directed rows and the chord can collide with
    ring edges. Oracle = DuckDB 3-way self-join on the id-ordered
    unique edge set."""
    from ..stages.graph import triangle_count

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = c[c % 4 == 0]
        src = np.concatenate([c, c, ch])
        dst = np.concatenate([(c + 1) % n, (c + 2) % n, (ch * 5 + 1) % n])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return triangle_count(cust.map_batches(edges, batch_format="pyarrow"))


SQL_TRIANGLE_COUNT = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
raw AS (
  SELECT c_custkey AS a, (c_custkey + 1) % (SELECT n FROM cnt) AS b
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey + 2) % (SELECT n FROM cnt) FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 5 + 1) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 4 = 0
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
)
SELECT count(*) AS triangles
FROM e e1
JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
"""


def q_range_join(sf_dir: str):
    """Point-in-interval join (stages/joins.py:interval_join — the
    bucket-replication exchange, NOT a broadcast): events fall into
    deterministic 5-hour maintenance windows anchored every 7 hours
    per supplier key. Each event moves once; each interval replicates
    to the <=2 six-hour buckets it overlaps; pairing is two
    searchsorted calls per interval inside the coarse group."""
    from ..stages.joins import interval_join

    HOUR_US = 3600 * 1_000_000
    base_us = 1_704_067_200_000_000  # epoch us of 2024-01-01 00:00:00

    events = _pq(sf_dir, "events", ["event_id", "ts"])
    supp = _pq(sf_dir, "supplier", ["s_suppkey"])

    def windows(b: pa.Table) -> pa.Table:
        k = b["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = base_us + k * 7 * HOUR_US
        return pa.table(
            {
                "window_id": pa.array(k, pa.int64()),
                "start_us": pa.array(start, pa.int64()),
                "end_us": pa.array(start + 5 * HOUR_US, pa.int64()),
            }
        )

    intervals = supp.map_batches(windows, batch_format="pyarrow")
    return interval_join(
        events,
        intervals,
        ts_col="ts",
        point_cols=["event_id"],
        interval_cols=["window_id"],
    )


SQL_RANGE_JOIN = """
WITH w AS (
  SELECT s_suppkey AS window_id,
         TIMESTAMP '2024-01-01' + s_suppkey * INTERVAL 7 HOUR AS ws,
         TIMESTAMP '2024-01-01' + s_suppkey * INTERVAL 7 HOUR
           + INTERVAL 5 HOUR AS we
  FROM supplier
)
SELECT w.window_id, e.event_id
FROM events e JOIN w ON e.ts >= w.ws AND e.ts < w.we
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


def q_embedding_centroids(sf_dir: str):
    """Per-label mean embedding (stages/cluster.py:grouped_centroids —
    per-block (count, sum-vector) partials folded in a group-bounded
    exchange), flattened to (label, dim, centroid) long form."""
    from ..stages.cluster import grouped_centroids

    emb = _pq(sf_dir, "embeddings", ["label", "embedding"])
    cents = grouped_centroids(emb, "label", "embedding")

    def flatten(b: pa.Table) -> pa.Table:
        arr = b["centroid"].combine_chunks()
        d = (
            arr.type.list_size
            if pa.types.is_fixed_size_list(arr.type)
            else len(arr[0])
        )
        vals = np.concatenate(
            [np.asarray(v.as_py(), np.float64) for v in arr]
        )
        n = len(arr)
        return pa.table(
            {
                "label": pa.array(
                    np.repeat(
                        b["label"].to_numpy(zero_copy_only=False), d
                    ),
                    pa.int64(),
                ),
                "dim": pa.array(
                    np.tile(np.arange(d, dtype=np.int64), n), pa.int64()
                ),
                "centroid": pa.array(np.round(vals, 6), pa.float64()),
            }
        )

    return cents.map_batches(flatten, batch_format="pyarrow")


SQL_EMBEDDING_CENTROIDS = """
WITH x AS (
  SELECT label,
         unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
)
SELECT label, pos - 1 AS dim, round(avg(v), 6) AS centroid
FROM x GROUP BY label, pos
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


def q_node_clustering(sf_dir: str):
    """Per-node triangle counts + local clustering coefficient
    (stages/graph.py:node_clustering) over the same deterministic
    ring+chord graph as `triangle_count`; oracle unpivots the 3-way
    self-join over the triangle corners and derives the coefficient
    from the exact degrees."""
    from ..stages.graph import node_clustering

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = c[c % 4 == 0]
        src = np.concatenate([c, c, ch])
        dst = np.concatenate([(c + 1) % n, (c + 2) % n, (ch * 5 + 1) % n])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return node_clustering(cust.map_batches(edges, batch_format="pyarrow"))


SQL_NODE_CLUSTERING = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
raw AS (
  SELECT c_custkey AS a, (c_custkey + 1) % (SELECT n FROM cnt) AS b
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey + 2) % (SELECT n FROM cnt) FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 5 + 1) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 4 = 0
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
),
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
corners AS (
  SELECT a AS node FROM t
  UNION ALL SELECT b FROM t
  UNION ALL SELECT c FROM t
),
tri AS (SELECT node, count(*) AS triangles FROM corners GROUP BY node),
ends AS (
  SELECT u AS node FROM e UNION ALL SELECT v FROM e
),
deg AS (SELECT node, count(*) AS d FROM ends GROUP BY node)
SELECT deg.node,
       COALESCE(tri.triangles, 0) AS triangles,
       round(
         CASE WHEN deg.d >= 2
              THEN 2.0 * COALESCE(tri.triangles, 0)
                   / (deg.d * (deg.d - 1))
              ELSE 0.0 END, 6) AS coeff
FROM deg LEFT JOIN tri ON tri.node = deg.node
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


#: event types pivoted into columns (fixed, so the schema is static)
PIVOT_TYPES = ["click", "view", "purchase", "error"]


def q_pivot_events(sf_dir: str):
    """PIVOT: per-user event-type counts as COLUMNS. Partial pivot per
    batch (one bincount over user×type), tiny final groupby over the
    partials — the pivot happens before the exchange, so only
    (users × 4) partial rows shuffle, never events."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])
    type_arr = pa.array(PIVOT_TYPES, pa.string())

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pc.index_in(b["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        keep = ~np.isnan(t)
        u, t = u[keep], t[keep].astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        k = len(PIVOT_TYPES)
        counts = np.bincount(inv * k + t, minlength=len(uu) * k).reshape(
            len(uu), k
        )
        cols = {"user_id": pa.array(uu, pa.int64())}
        for j, name in enumerate(PIVOT_TYPES):
            cols[f"n_{name}"] = pa.array(counts[:, j], pa.int64())
        return pa.table(cols)

    from ray.data.aggregate import Sum as _Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            *[
                _Sum(f"n_{name}", alias_name=f"n_{name}")
                for name in PIVOT_TYPES
            ]
        )
    )


SQL_PIVOT_EVENTS = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""


def q_latest_record(sf_dir: str):
    """Latest-record-wins dedup (the SCD/crawl pattern: keep each
    key's newest row): per-batch prune to each user's latest event,
    then one coarse-bucket exchange finishes the argmax — only
    (users × blocks) pruned rows move."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prune(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        ts = b["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(b["ts"], pa.ChunkedArray) else b["ts"].cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        # latest = max (ts, event_id) per user within the batch
        order = np.lexsort((eid, ts, u))
        last = np.flatnonzero(
            np.r_[u[order][1:] != u[order][:-1], True]
        )
        return b.take(pa.array(order[last], pa.int64()))

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        keep = g.groupby("user_id", sort=False).tail(1)
        return keep.drop(columns=["bucket"])

    return _by_user_bucket(pruned).map_groups(
        finish, batch_format="pandas"
    )


SQL_LATEST_RECORD = """
SELECT event_id, user_id, ts, value FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
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


def q_intersect_keys(sf_dir: str):
    """INTERSECT: customer keys that appear in both the orders and
    events key spaces — distinct-intersection via two semi joins over
    pruned key columns."""
    from ..stages.joins import broadcast_join

    ev_users = (
        _pq(sf_dir, "events", ["user_id"])
        .groupby("user_id")
        .count()
        .select_columns(["user_id"])
    )
    o_keys = (
        _pq(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
    )
    return broadcast_join(
        o_keys, ev_users.to_pandas(), on=["o_custkey"],
        right_on=["user_id"], how="semi",
    )


SQL_INTERSECT_KEYS = """
SELECT o_custkey FROM orders
INTERSECT
SELECT user_id FROM events
"""


def q_except_keys(sf_dir: str):
    """EXCEPT: customer keys with orders but no events — distinct keys
    anti-joined against the (small) distinct event-user set."""
    from ..stages.joins import broadcast_join

    ev_users = (
        _pq(sf_dir, "events", ["user_id"])
        .groupby("user_id")
        .count()
        .select_columns(["user_id"])
    )
    o_keys = (
        _pq(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
    )
    return broadcast_join(
        o_keys, ev_users.to_pandas(), on=["o_custkey"],
        right_on=["user_id"], how="anti",
    )


SQL_EXCEPT_KEYS = """
SELECT o_custkey FROM orders
EXCEPT
SELECT user_id FROM events
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


def q_window_range_frame(sf_dir: str):
    """Time-RANGE window frame (vs the ROWS frame of
    `window_moving_avg`): per user, the sum of values in the last hour
    INCLUDING the current event — per-user sorted prefix sums + one
    searchsorted per row inside coarse buckets."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    HOUR_US = 3600 * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].astype("int64").to_numpy()
        val = g["value"].to_numpy(dtype=np.float64)
        uid = g["user_id"].to_numpy()
        csum = np.cumsum(val)
        out = np.empty(len(g))
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(g)]
        for s, e in zip(starts, ends):
            t = ts[s:e]
            lo = np.searchsorted(t, t - HOUR_US, side="left") + s
            # csum is GLOBAL over the sorted bucket, so subtracting
            # csum[lo-1] removes both the out-of-window rows of this
            # user and every earlier user's contribution in one shot
            out[s:e] = csum[s:e] - np.where(lo > 0, csum[lo - 1], 0.0)
        g["hour_sum"] = np.round(out, 6)
        return g.drop(columns=["bucket"])

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_WINDOW_RANGE_FRAME = """
SELECT event_id, user_id, ts, value,
       round(SUM(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ), 6) AS hour_sum
FROM events
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


def q_lag_lead(sf_dir: str):
    """LAG/LEAD window functions: each event with its user's previous
    and next value — one vectorized shift inside the coarse user
    buckets (nulls at partition edges)."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)["value"]
        g["prev_value"] = grp.shift(1)
        g["next_value"] = grp.shift(-1)
        return g.drop(columns=["bucket"])

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_LAG_LEAD = """
SELECT event_id, user_id, ts, value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_date_parts(sf_dir: str):
    """Temporal rollup: per-day event counts + mean value via Arrow
    floor_temporal — the date_trunc kernel exercised end to end
    (timestamps never leave Arrow until the final tiny groupby)."""
    ds = _pq(sf_dir, "events", ["ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b["ts"], unit="day")
        t = pa.table({"day": day, "value": b["value"]})
        g = pa.TableGroupBy(t, "day").aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return g.rename_columns(["day", "n", "vsum"])

    from ray.data.aggregate import Sum as _Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            _Sum("n", alias_name="n"), _Sum("vsum", alias_name="vsum")
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        mean = pc.round(
            pc.divide(
                pc.cast(b["vsum"], pa.float64()),
                pc.cast(b["n"], pa.float64()),
            ),
            ndigits=6,
        )
        return pa.table(
            {
                "day": pc.cast(b["day"], pa.string()),
                "n": b["n"],
                "mean_value": mean,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_DATE_PARTS = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
       count(*) AS n,
       round(sum(value) / count(*), 6) AS mean_value
FROM events GROUP BY 1
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


REGISTRY: dict[str, tuple] = {
    "groupby_agg": (q_groupby_agg, SQL_GROUPBY_AGG),
    "sort_limit": (q_sort_limit, SQL_SORT_LIMIT),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "broadcast_join": (q_broadcast_join, SQL_BROADCAST_JOIN),
    "hash_join": (q_hash_join, SQL_HASH_JOIN),
    "semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "filter_project": (q_filter_project, SQL_FILTER_PROJECT),
    "pattern": (q_pattern, SQL_PATTERN),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "distinct": (q_distinct, SQL_DISTINCT),
    "union_agg": (q_union, SQL_UNION),
    "window_tumbling": (q_window_tumbling, SQL_WINDOW_TUMBLING),
    "vocab_topk": (q_vocab_topk, SQL_VOCAB_TOPK),
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "quality": (q_quality, SQL_QUALITY),
    "json_extract": (q_json_extract, SQL_JSON_EXTRACT),
    "multi_join": (q_multi_join, SQL_MULTI_JOIN),
    "ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    "stats_agg": (q_stats_agg, SQL_STATS_AGG),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "session_window": (q_session_window, SQL_SESSION_WINDOW),
    "running_sum": (q_running_sum, SQL_RUNNING_SUM),
    "rollup_words": (q_rollup_words, SQL_ROLLUP_WORDS),
    "rollup_hier": (q_rollup_hier, SQL_ROLLUP_HIER),
    "bib_resolve": (q_bib_resolve, SQL_BIB_RESOLVE),
    "jaccard_pairs": (q_jaccard_pairs, SQL_JACCARD_PAIRS),
    "cosine_pairs": (q_cosine_pairs, SQL_COSINE_PAIRS),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "window_hopping": (q_window_hopping, SQL_WINDOW_HOPPING),
    "connected_components": (q_connected_components, SQL_CONNECTED_COMPONENTS),
    "window_moving_avg": (q_window_moving_avg, SQL_WINDOW_MOVING_AVG),
    "rank_per_group": (q_rank_per_group, SQL_RANK_PER_GROUP),
    "rollup_grouping": (q_rollup_grouping, SQL_ROLLUP_GROUPING),
    "explode_lines": (q_explode_lines, SQL_EXPLODE_LINES),
    "repetition_docs": (q_repetition_docs, SQL_REPETITION_DOCS),
    "quantiles_group": (q_quantiles_group, SQL_QUANTILES_GROUP),
    "global_quantiles": (q_global_quantiles, SQL_GLOBAL_QUANTILES),
    "corr_agg": (q_corr_agg, SQL_CORR_AGG),
    "pagerank": (q_pagerank, SQL_PAGERANK),
    "kmeans_assign": (q_kmeans_assign, SQL_KMEANS_ASSIGN),
    "shuffle_export": (q_shuffle_export, SQL_SHUFFLE_EXPORT),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "pq_codes": (q_pq_codes, SQL_PQ_CODES),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "range_join": (q_range_join, SQL_RANGE_JOIN),
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "embedding_centroids": (q_embedding_centroids, SQL_EMBEDDING_CENTROIDS),
    "bloom_semi": (q_bloom_semi, SQL_BLOOM_SEMI),
    "bloom_anti": (q_bloom_anti, SQL_BLOOM_ANTI),
    "skew_join": (q_skew_join, SQL_SKEW_JOIN),
    "outer_join": (q_outer_join, SQL_OUTER_JOIN),
    "ntile": (q_ntile, SQL_NTILE),
    "node_clustering": (q_node_clustering, SQL_NODE_CLUSTERING),
    "chunk_docs": (q_chunk_docs, SQL_CHUNK_DOCS),
    "pivot_events": (q_pivot_events, SQL_PIVOT_EVENTS),
    "latest_record": (q_latest_record, SQL_LATEST_RECORD),
    "percentile_rank": (q_percentile_rank, SQL_PERCENTILE_RANK),
    "cross_join": (q_cross_join, SQL_CROSS_JOIN),
    "intersect_keys": (q_intersect_keys, SQL_INTERSECT_KEYS),
    "except_keys": (q_except_keys, SQL_EXCEPT_KEYS),
    "fuzzy_pairs": (q_fuzzy_pairs, SQL_FUZZY_PAIRS),
    "histogram": (q_histogram, SQL_HISTOGRAM),
    "window_range_frame": (q_window_range_frame, SQL_WINDOW_RANGE_FRAME),
    "describe_stats": (q_describe_stats, SQL_DESCRIBE_STATS),
    "lag_lead": (q_lag_lead, SQL_LAG_LEAD),
    "date_parts": (q_date_parts, SQL_DATE_PARTS),
    "cooccurrence": (q_cooccurrence, SQL_COOCCURRENCE),
}


# ------------------------------------------------- round-3 additions


def q_funnel_users(sf_dir: str):
    """Ordered event-sequence funnel: per user, the longest completed
    prefix of click -> view -> purchase with STRICTLY increasing
    timestamps (each step's time = the earliest qualifying event after
    the previous step). The classic product-analytics operator; one
    user-bucketed shuffle, vectorized ``reduceat`` folds per bucket."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])
    INF = np.iinfo(np.int64).max

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "steps": pd.Series(dtype="int64")}
            )
        ts = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        et = g["event_type"].to_numpy()
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_user)
        seg = np.cumsum(new_user) - 1

        def first_after(mask, prev):
            cand = np.where(mask & (ts > prev[seg]), ts, INF)
            return np.minimum.reduceat(cand, starts)

        none = np.full(len(starts), -1, np.int64)  # ts > -1 always
        t1 = first_after(et == "click", none)
        t2 = first_after(et == "view", t1)
        t3 = first_after(et == "purchase", t2)
        steps = (
            (t1 < INF).astype(np.int64)
            + (t2 < INF)
            + (t3 < INF)
        )
        return pd.DataFrame({"user_id": u[starts], "steps": steps})

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_FUNNEL_USERS = """
WITH c AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'click' GROUP BY user_id),
v AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN c USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > c.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN v.user_id IS NOT NULL THEN 2
                 WHEN c.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS steps
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN c USING (user_id)
LEFT JOIN v USING (user_id)
LEFT JOIN p USING (user_id)
"""


def q_retention_cohorts(sf_dir: str):
    """Cohort retention: users grouped by first-active day (epoch
    days), counted on each later active day offset. Day arithmetic is
    integer on both sides. Partial dedup of (user, day) inside
    map_batches, one user-bucketed shuffle, then a tiny
    (cohort, offset) groupby-sum."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86_400_000_000

    def to_days(b: pa.Table) -> pa.Table:
        ts = (
            b["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        day = ts // DAY_US
        pairs = np.unique(
            np.stack(
                [b["user_id"].to_numpy(zero_copy_only=False), day],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "day": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    days = ds.map_batches(to_days, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {"cohort_day": pd.Series(dtype="int64"),
                 "day_offset": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64")}
            )
        dedup = np.ones(n, dtype=bool)
        dedup[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[dedup], d[dedup]
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new_user) - 1
        cohort = d[new_user][seg]
        off = d - cohort
        key = cohort * 100_000 + off  # offsets < 100k days
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame(
            {
                "cohort_day": uk // 100_000,
                "day_offset": uk % 100_000,
                "n": cnt.astype(np.int64),
            }
        )

    partial = _by_user_bucket(days).map_groups(
        per_bucket, batch_format="pandas"
    )
    return partial.groupby(["cohort_day", "day_offset"]).aggregate(
        Sum("n", alias_name="n_users")
    )


SQL_RETENTION_COHORTS = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
           FROM events),
f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
       count(*) AS n_users
FROM d JOIN f USING (user_id)
GROUP BY f.cohort_day, day_offset
"""


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


REGISTRY.update(
    {
        "funnel_users": (q_funnel_users, SQL_FUNNEL_USERS),
        "retention_cohorts": (q_retention_cohorts, SQL_RETENTION_COHORTS),
        "entropy_docs": (q_entropy_docs, SQL_ENTROPY_DOCS),
        "keywords_tfidf": (q_keywords_tfidf, SQL_KEYWORDS_TFIDF),
        "nearest_doc_jaccard": (
            q_nearest_doc_jaccard,
            SQL_NEAREST_DOC_JACCARD,
        ),
    }
)


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


def q_cumulative_users(sf_dir: str):
    """Daily active / new / cumulative distinct users — the growth
    dashboard triple. Per-batch distinct-(user, day) partials, one
    user-bucketed exchange folding active-day and first-day counts,
    a tiny day-keyed sum, then an ordered cumulative fold over the
    day table (calendar-bounded cardinality, so the single-block
    finalize is justified)."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    DAY_US = 86_400_000_000

    def to_days(b: pa.Table) -> pa.Table:
        ts = (
            b["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        pairs = np.unique(
            np.stack(
                [b["user_id"].to_numpy(zero_copy_only=False), ts // DAY_US],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "day": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy()
        d = g["day"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {"day": pd.Series(dtype="int64"),
                 "n_active": pd.Series(dtype="int64"),
                 "n_new": pd.Series(dtype="int64")}
            )
        dedup = np.ones(n, dtype=bool)
        dedup[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[dedup], d[dedup]
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        act_day, act_n = np.unique(d, return_counts=True)
        new_day, new_n = np.unique(d[new_user], return_counts=True)
        days = np.union1d(act_day, new_day)
        out = pd.DataFrame({"day": days})
        out["n_active"] = 0
        out["n_new"] = 0
        out.loc[np.searchsorted(days, act_day), "n_active"] = act_n
        out.loc[np.searchsorted(days, new_day), "n_new"] = new_n
        return out

    per_day = (
        _by_user_bucket(ds.map_batches(to_days, batch_format="pyarrow"))
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("day")
        .aggregate(
            Sum("n_active", alias_name="n_active"),
            Sum("n_new", alias_name="n_new"),
        )
    )

    def cum(b: pa.Table) -> pa.Table:
        new = b["n_new"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "day": pc.cast(b["day"], pa.int64()),
                "n_active": pc.cast(b["n_active"], pa.int64()),
                "n_new": pa.array(new),
                "cum_users": pa.array(np.cumsum(new)),
            }
        )

    return (
        per_day.sort("day").repartition(1)
        .map_batches(cum, batch_format="pyarrow", batch_size=None)
    )


SQL_CUMULATIVE_USERS = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
           FROM events),
f AS (SELECT user_id, min(day) AS fday FROM d GROUP BY user_id),
act AS (SELECT day, count(*) AS n_active FROM d GROUP BY day),
nw AS (SELECT fday AS day, count(*) AS n_new FROM f GROUP BY fday)
SELECT act.day, act.n_active,
       COALESCE(nw.n_new, 0) AS n_new,
       CAST(sum(COALESCE(nw.n_new, 0))
            OVER (ORDER BY act.day) AS BIGINT) AS cum_users
FROM act LEFT JOIN nw USING (day)
"""


REGISTRY.update(
    {
        "novelty_docs": (q_novelty_docs, SQL_NOVELTY_DOCS),
        "prefix_dup_docs": (q_prefix_dup_docs, SQL_PREFIX_DUP_DOCS),
        "cumulative_users": (q_cumulative_users, SQL_CUMULATIVE_USERS),
    }
)


def q_kcore_nodes(sf_dir: str):
    """k-core decomposition (stages/graph.py:kcore — parallel peel,
    one streaming edge pass per round) over a deterministic graph
    built to need MULTIPLE peel rounds: the binary-tree edges
    (i, i//2) cascade-peel from the leaves up (~log2 n rounds) while a
    squared ring over the multiples of 5 (i, i+5), (i, i+10) keeps a
    guaranteed min-degree-4 3-core alive. Oracle replays the peel with
    a DuckDB recursive CTE carrying the surviving edge set per level
    (24 levels >= the peel depth at every tested sf)."""
    from ..stages.graph import kcore

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        tree = c[c >= 1]
        ring = c[c % 5 == 0]
        src = np.concatenate([tree, ring, ring])
        dst = np.concatenate(
            [tree // 2, (ring + 5) % n, (ring + 10) % n]
        )
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return kcore(cust.map_batches(edges, batch_format="pyarrow"), k=3)


SQL_KCORE_NODES = """
WITH RECURSIVE cnt AS (SELECT count(*) AS n FROM customer),
raw AS (
  SELECT c_custkey AS a, c_custkey // 2 AS b
  FROM customer WHERE c_custkey >= 1
  UNION ALL
  SELECT c_custkey, (c_custkey + 5) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey, (c_custkey + 10) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 5 = 0
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
),
peel(iter, u, v) AS (
  SELECT 0, u, v FROM e
  UNION ALL
  SELECT p.iter + 1, p.u, p.v
  FROM peel p
  WHERE p.iter < 24
    AND p.u IN (SELECT x FROM (
          SELECT u AS x, count(*) AS c FROM (
            SELECT u, v FROM peel UNION ALL SELECT v, u FROM peel
          ) GROUP BY 1) WHERE c >= 3)
    AND p.v IN (SELECT x FROM (
          SELECT u AS x, count(*) AS c FROM (
            SELECT u, v FROM peel UNION ALL SELECT v, u FROM peel
          ) GROUP BY 1) WHERE c >= 3)
),
core AS (SELECT u, v FROM peel WHERE iter = 24),
adj AS (SELECT u AS node, v FROM core UNION ALL SELECT v, u FROM core)
SELECT CAST(node AS BIGINT) AS node, count(*) AS core_deg
FROM adj GROUP BY node
"""


def q_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distance (stages/graph.py:bfs_hops —
    level-synchronous frontier, node-sized driver state) from node 0
    over the ring + multiplicative-chord graph (chords (i, 5i+1) every
    4th node make distances logarithmic). Capped at 16 hops on BOTH
    sides; oracle = DuckDB recursive UNION walk with min(d)."""
    from ..stages.graph import bfs_hops

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = c[c % 4 == 0]
        src = np.concatenate([c, ch])
        dst = np.concatenate([(c + 1) % n, (ch * 5 + 1) % n])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return bfs_hops(
        cust.map_batches(edges, batch_format="pyarrow"),
        seeds=[0],
        max_hops=16,
    )


SQL_BFS_HOPS = """
WITH RECURSIVE cnt AS (SELECT count(*) AS n FROM customer),
raw AS (
  SELECT c_custkey AS a, (c_custkey + 1) % (SELECT n FROM cnt) AS b
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 5 + 1) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 4 = 0
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
),
adj AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
walk(node, d) AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS d
  UNION
  SELECT adj.y, walk.d + 1
  FROM walk JOIN adj ON adj.x = walk.node
  WHERE walk.d < 16
)
SELECT node, CAST(min(d) AS BIGINT) AS hops FROM walk GROUP BY node
"""


def q_link_predict(sf_dir: str):
    """Link-prediction scores (stages/graph.py:link_predict — wedge
    generation with per-group pre-aggregated (pair, cn, aa) partials,
    existing edges riding the same exchange as the non-edge filter)
    over the triangle_count ring+chord graph: every non-edge pair with
    >= 2 common neighbors scored by common-neighbor count,
    neighborhood Jaccard, and Adamic-Adar. Oracle = DuckDB wedge
    self-join + ANTI JOIN against the edge set."""
    from ..stages.graph import link_predict

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = c[c % 4 == 0]
        src = np.concatenate([c, c, ch])
        dst = np.concatenate([(c + 1) % n, (c + 2) % n, (ch * 5 + 1) % n])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return link_predict(
        cust.map_batches(edges, batch_format="pyarrow"), min_common=2
    )


SQL_LINK_PREDICT = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
raw AS (
  SELECT c_custkey AS a, (c_custkey + 1) % (SELECT n FROM cnt) AS b
  FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey + 2) % (SELECT n FROM cnt) FROM customer
  UNION ALL
  SELECT c_custkey, (c_custkey * 5 + 1) % (SELECT n FROM cnt)
  FROM customer WHERE c_custkey % 4 = 0
),
e AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
),
adj AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT x, count(*) AS d FROM adj GROUP BY x),
w AS (
  SELECT a.y AS pa, b.y AS pb, count(*) AS cn,
         sum(1.0 / ln(dc.d)) AS aa
  FROM adj a
  JOIN adj b ON a.x = b.x AND a.y < b.y
  JOIN deg dc ON dc.x = a.x
  GROUP BY 1, 2
),
nw AS (SELECT w.* FROM w ANTI JOIN e ON e.u = w.pa AND e.v = w.pb)
SELECT CAST(pa AS BIGINT) AS a, CAST(pb AS BIGINT) AS b, cn,
       round(CAST(cn AS DOUBLE) / (da.d + db.d - cn), 6) AS jaccard,
       round(aa, 6) AS adamic_adar
FROM nw
JOIN deg da ON da.x = pa
JOIN deg db ON db.x = pb
WHERE cn >= 2
"""


REGISTRY.update(
    {
        "kcore_nodes": (q_kcore_nodes, SQL_KCORE_NODES),
        "bfs_hops": (q_bfs_hops, SQL_BFS_HOPS),
        "link_predict": (q_link_predict, SQL_LINK_PREDICT),
    }
)


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


def q_event_transitions(sf_dir: str):
    """First-order Markov transition matrix over per-user event
    streams: consecutive event-type pairs ordered by (ts, event_id)
    within each user, counted globally, with the per-from-type
    transition probability. One user-bucketed exchange with
    vectorized within-bucket pair extraction; the transition matrix is
    type-vocabulary-sized, so the probability normalization runs on a
    single final block. Oracle = lead() window + count + window sum."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        n = len(u)
        if n < 2:
            return pd.DataFrame(
                {
                    "from_type": pd.Series(dtype=object),
                    "to_type": pd.Series(dtype=object),
                    "n": pd.Series(dtype="int64"),
                }
            )
        same = u[1:] == u[:-1]
        ft, tt = et[:-1][same], et[1:][same]
        uniq_f, fc = np.unique(ft, return_inverse=True)
        uniq_t, tc = np.unique(tt, return_inverse=True)
        packed = fc.astype(np.int64) * len(uniq_t) + tc
        upk, cnt = np.unique(packed, return_counts=True)
        return pd.DataFrame(
            {
                "from_type": uniq_f[upk // len(uniq_t)],
                "to_type": uniq_t[upk % len(uniq_t)],
                "n": cnt.astype(np.int64),
            }
        )

    def prob(b: pa.Table) -> pa.Table:
        f = b["from_type"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_f, inv = np.unique(f, return_inverse=True)
        tot = np.bincount(inv, weights=n)
        return pa.table(
            {
                "from_type": b["from_type"],
                "to_type": b["to_type"],
                "n": pa.array(n, pa.int64()),
                "p": pa.array(np.round(n / tot[inv], 6), pa.float64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        _by_user_bucket(ds)
        .map_groups(pairs, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(_Sum("n", alias_name="n"))
        .repartition(1)
        .map_batches(prob, batch_format="pyarrow", batch_size=None)
    )


SQL_EVENT_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_type AS ft,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS tt
  FROM events
),
c AS (
  SELECT ft AS from_type, tt AS to_type, count(*) AS n
  FROM s WHERE tt IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type),
             6) AS p
FROM c
"""


REGISTRY.update(
    {
        "postings_topk": (q_postings_topk, SQL_POSTINGS_TOPK),
        "block_dedup_docs": (q_block_dedup_docs, SQL_BLOCK_DEDUP_DOCS),
        "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    }
)


def q_outliers_mad(sf_dir: str):
    """Robust per-group outlier detection: flag events whose value
    deviates from the group median by more than 3x the median absolute
    deviation (the MAD rule — robust to the heavy upper tail the mean
    +/- k*sigma rule would swallow). Exact per-group medians: groups
    are event-type-sized so each fits one task (the same contract as
    quantiles_group); flagged rows keep their identity columns. Oracle
    = DuckDB median() twice + join."""
    ds = _pq(sf_dir, "events", ["event_id", "event_type", "value"])

    def per_grp(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        med = np.quantile(v, 0.5, method="linear")
        mad = np.quantile(np.abs(v - med), 0.5, method="linear")
        flag = np.abs(v - med) > 3 * mad
        out = g.loc[flag, ["event_id", "event_type", "value"]].copy()
        out["med"] = np.round(med, 4)
        out["mad"] = np.round(mad, 4)
        return out

    return ds.groupby("event_type").map_groups(per_grp, batch_format="pandas")


SQL_OUTLIERS_MAD = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY 1
),
mad AS (
  SELECT e.event_type, median(abs(e.value - m.med)) AS mad,
         min(m.med) AS med
  FROM events e JOIN med m USING (event_type) GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       round(m.med, 4) AS med, round(m.mad, 4) AS mad
FROM events e JOIN mad m USING (event_type)
WHERE abs(e.value - m.med) > 3 * m.mad
"""


def q_chi_square_events(sf_dir: str):
    """Chi-square test of independence between event type and a
    deterministic user cohort (user_id % 4): contingency counts fold
    as (type, cohort, n) partials per batch — the exchange is
    cell-count-sized, never row-sized — and the statistic (including
    the zero-observed cells' expected mass) is computed on the final
    single block. Oracle = CROSS JOIN of the margins LEFT JOIN the
    observed cells."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            b["event_type"].combine_chunks()
            if isinstance(b["event_type"], pa.ChunkedArray)
            else b["event_type"]
        )
        t = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = b["user_id"].to_numpy(zero_copy_only=False) % 4
        packed = t * 4 + k
        upk, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "t": enc.dictionary.take(pa.array(upk // 4, pa.int64())),
                "k": pa.array(upk % 4, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        t = b["t"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ut, ti = np.unique(t, return_inverse=True)
        uk, ki = np.unique(k, return_inverse=True)
        obs = np.zeros((len(ut), len(uk)))
        obs[ti, ki] = n
        rt = obs.sum(axis=1, keepdims=True)
        ct = obs.sum(axis=0, keepdims=True)
        e = rt * ct / obs.sum()
        chi2 = ((obs - e) ** 2 / e).sum()
        dof = (len(ut) - 1) * (len(uk) - 1)
        return pa.table(
            {
                "chi2": pa.array([round(float(chi2), 6)], pa.float64()),
                "dof": pa.array([dof], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["t", "k"])
        .aggregate(_Sum("n", alias_name="n"))
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )


SQL_CHI_SQUARE_EVENTS = """
WITH c AS (
  SELECT event_type AS t, user_id % 4 AS k, count(*) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT t, sum(o) AS r FROM c GROUP BY 1),
ct AS (SELECT k, sum(o) AS cc FROM c GROUP BY 1),
tot AS (SELECT sum(o) AS n FROM c),
grid AS (
  SELECT rt.t, ct.k, COALESCE(c.o, 0) AS o,
         CAST(rt.r AS DOUBLE) * ct.cc / tot.n AS e
  FROM rt CROSS JOIN ct CROSS JOIN tot
  LEFT JOIN c ON c.t = rt.t AND c.k = ct.k
)
SELECT round(sum((o - e) * (o - e) / e), 6) AS chi2,
       CAST((SELECT count(*) - 1 FROM rt)
            * (SELECT count(*) - 1 FROM ct) AS BIGINT) AS dof
FROM grid
"""


def q_interval_coverage_users(sf_dir: str):
    """Per-user union-of-intervals coverage: each event opens a
    30-minute activity window; overlapping windows merge (the classic
    sweep), and the output is each user's merged-interval count and
    total covered MICROSECONDS (exact int64 — no float drift). One
    user-bucketed exchange; the sweep is a segmented cumulative max
    (offset trick keeps it one numpy pass per bucket). Oracle = the
    textbook window-function island detection (max(e) OVER preceding
    rows) + island aggregation."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    WIN_US = 30 * 60 * 1_000_000
    OFF = np.int64(1) << 46  # > any in-bucket time span (rebased)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy()
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_intervals": pd.Series(dtype="int64"),
                    "coverage_us": pd.Series(dtype="int64"),
                }
            )
        s = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = s.min()
        s0 = s - base
        e0 = s0 + WIN_US
        assert int(e0.max()) < int(OFF), "time span exceeds offset trick"
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        uidx = np.cumsum(new_user) - 1
        # segmented cumulative max of e0 within each user run
        m = np.maximum.accumulate(e0 + uidx * OFF) - uidx * OFF
        prev_m = np.empty(n, np.int64)
        prev_m[0] = 0
        prev_m[1:] = m[:-1]
        brk = new_user | (s0 > prev_m)
        grp = np.cumsum(brk) - 1
        gstart = np.flatnonzero(brk)
        gend = np.append(gstart[1:], n) - 1
        length = m[gend] - s0[gstart]
        iv_user = u[gstart]
        uu, inv = np.unique(iv_user, return_inverse=True)
        return pd.DataFrame(
            {
                "user_id": uu,
                "n_intervals": np.bincount(inv).astype(np.int64),
                "coverage_us": np.bincount(inv, weights=length).astype(
                    np.int64
                ),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_INTERVAL_COVERAGE_USERS = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + 1800000000 AS e
  FROM events
),
o AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS prev_max
  FROM iv
),
g AS (
  SELECT user_id, s, e,
         CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END
           AS brk
  FROM o
),
gg AS (
  SELECT user_id, s, e,
         sum(brk) OVER (PARTITION BY user_id ORDER BY s, e) AS grp
  FROM g
),
m AS (
  SELECT user_id, grp, min(s) AS s, max(e) AS e
  FROM gg GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_intervals,
       CAST(sum(e - s) AS BIGINT) AS coverage_us
FROM m GROUP BY user_id
"""


REGISTRY.update(
    {
        "outliers_mad": (q_outliers_mad, SQL_OUTLIERS_MAD),
        "chi_square_events": (q_chi_square_events, SQL_CHI_SQUARE_EVENTS),
        "interval_coverage_users": (
            q_interval_coverage_users,
            SQL_INTERVAL_COVERAGE_USERS,
        ),
    }
)


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


def q_hhi_events(sf_dir: str):
    """Per-event-type Herfindahl-Hirschman concentration index of
    user activity: HHI = sum over users of (share of the type's
    events)^2 — the standard "is this event type driven by a few
    power users?" diagnostic. Two pre-aggregated exchanges, both
    count-sized: (type, user) counts, then per-type sum of squares +
    total. Oracle = nested GROUP BY."""
    from ray.data.aggregate import Sum as _Sum

    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def pair_counts(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            b["event_type"].combine_chunks()
            if isinstance(b["event_type"], pa.ChunkedArray)
            else b["event_type"]
        )
        t = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, ui = np.unique(u, return_inverse=True)
        packed = t * len(uu) + ui
        upk, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "event_type": enc.dictionary.take(
                    pa.array(upk // len(uu), pa.int64())
                ),
                "user_id": pa.array(uu[upk % len(uu)], pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    def squares(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "sq": pa.array(n * n, pa.float64()),
                "tot": pa.array(n, pa.float64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        sq = b["sq"].to_numpy(zero_copy_only=False)
        tot = b["tot"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": b["event_type"],
                "n_users": pc.cast(b["n_users"], pa.int64()),
                "hhi": pa.array(np.round(sq / (tot * tot), 6), pa.float64()),
            }
        )

    return (
        ds.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(_Sum("n", alias_name="n"))
        .map_batches(squares, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            _Sum("sq", alias_name="sq"),
            _Sum("tot", alias_name="tot"),
            Count(alias_name="n_users"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


SQL_HHI_EVENTS = """
WITH c AS (
  SELECT event_type, user_id, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, count(*) AS n_users,
       round(sum(CAST(n AS DOUBLE) * n)
             / (sum(CAST(n AS DOUBLE)) * sum(CAST(n AS DOUBLE))),
             6) AS hhi
FROM c GROUP BY event_type
"""


def q_sequence_triples(sf_dir: str):
    """Strict-adjacency sequence mining: per user, the number of
    click -> view -> purchase runs with NO intervening event (the
    contiguous variant of the funnel; transitions/funnel count
    non-contiguous progressions). Vectorized three-way shift compare
    inside user buckets; users with zero matches are dropped. Oracle
    = two lead() windows + filter."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        n = len(u)
        if n < 3:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_triples": pd.Series(dtype="int64"),
                }
            )
        hit = (
            (et[:-2] == "click")
            & (et[1:-1] == "view")
            & (et[2:] == "purchase")
            & (u[:-2] == u[2:])
        )
        uu, inv = np.unique(u[:-2][hit], return_inverse=True)
        return pd.DataFrame(
            {
                "user_id": uu,
                "n_triples": np.bincount(inv).astype(np.int64),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_SEQUENCE_TRIPLES = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e1,
         lead(event_type, 2) OVER w AS e2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, count(*) AS n_triples
FROM s
WHERE event_type = 'click' AND e1 = 'view' AND e2 = 'purchase'
GROUP BY user_id
"""


REGISTRY.update(
    {
        "regression_group": (q_regression_group, SQL_REGRESSION_GROUP),
        "hhi_events": (q_hhi_events, SQL_HHI_EVENTS),
        "sequence_triples": (q_sequence_triples, SQL_SEQUENCE_TRIPLES),
    }
)


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


def q_burstiness_users(sf_dir: str):
    """Per-user inter-event-gap statistics: gap count, mean/population
    -std of the gap in seconds, and the Goh-Barabasi burstiness
    coefficient B = (sigma - mu) / (sigma + mu) (-1 = periodic, 0 =
    Poisson, ->1 = bursty). One user-bucketed exchange; inside each
    bucket the sweep is one mergesort + vectorized int64-microsecond
    diffs + bincount folds (gaps are diffed in integer microseconds
    FIRST, then divided — the float-second epoch values are too coarse
    at 2^53 to subtract). Users with a single event have no gap and
    emit nothing; all-zero-gap users are filtered on BOTH sides
    (sigma + mu > 0)."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = (
            g["ts"]
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        same = u[1:] == u[:-1]
        gaps = (t[1:] - t[:-1])[same].astype(np.float64) / 1e6
        gu = u[1:][same]
        if len(gu) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_gaps": pd.Series(dtype="int64"),
                    "mean_gap_s": pd.Series(dtype="float64"),
                    "std_gap_s": pd.Series(dtype="float64"),
                    "burstiness": pd.Series(dtype="float64"),
                }
            )
        uu, inv = np.unique(gu, return_inverse=True)
        n = np.bincount(inv)
        mu = np.bincount(inv, gaps) / n
        d = gaps - mu[inv]
        sig = np.sqrt(np.bincount(inv, d * d) / n)
        keep = (sig + mu) > 0
        b = (sig[keep] - mu[keep]) / (sig[keep] + mu[keep])
        return pd.DataFrame(
            {
                "user_id": uu[keep],
                "n_gaps": n[keep].astype(np.int64),
                "mean_gap_s": np.round(mu[keep], 4),
                "std_gap_s": np.round(sig[keep], 4),
                "burstiness": np.round(b, 6),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_BURSTINESS_USERS = """
WITH g AS (
  SELECT user_id,
         CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
           / 1000000.0 AS gap
  FROM events),
s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         avg(gap) AS mu, stddev_pop(gap) AS sigma
  FROM g WHERE gap IS NOT NULL GROUP BY user_id)
SELECT user_id, n_gaps,
       round(mu, 4) AS mean_gap_s,
       round(sigma, 4) AS std_gap_s,
       round((sigma - mu) / (sigma + mu), 6) AS burstiness
FROM s WHERE sigma + mu > 0
"""


def q_harmonic_centrality(sf_dir: str):
    """Bounded-hop harmonic centrality
    (stages/graph.py:harmonic_bounded — all-pairs <=3-hop directed
    distances via iterated distributed frontier-edge hash joins, NO
    per-node driver state) over the pagerank ring+chord digraph.
    Emits per node: reachable-set size, 3-hop eccentricity, and
    sum(1/d). Oracle = DuckDB recursive UNION walk + min(d) with the
    identical hop cap."""
    from ..stages.graph import harmonic_bounded

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    return harmonic_bounded(
        cust.map_batches(edges, batch_format="pyarrow"), max_hops=3
    )


SQL_HARMONIC_CENTRALITY = """
WITH RECURSIVE cnt AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT c_custkey AS src,
           (c_custkey + 1) % (SELECT n FROM cnt) AS dst
    FROM customer
    UNION ALL
    SELECT c_custkey,
           (c_custkey * 7 + 3) % (SELECT n FROM cnt)
    FROM customer WHERE c_custkey % 3 = 0)
  WHERE src <> dst),
walk(src, dst, d) AS (
  SELECT src, dst, 1 FROM e
  UNION
  SELECT w.src, e.dst, w.d + 1
  FROM walk w JOIN e ON e.src = w.dst WHERE w.d < 3
),
md AS (
  SELECT src, dst, min(d) AS d FROM walk
  WHERE src <> dst GROUP BY src, dst)
SELECT src AS node, CAST(count(*) AS BIGINT) AS n_reach,
       CAST(max(d) AS BIGINT) AS ecc,
       round(sum(1.0 / d), 6) AS harmonic
FROM md GROUP BY src
"""


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


REGISTRY.update(
    {
        "zipf_slope": (q_zipf_slope, SQL_ZIPF_SLOPE),
        "burstiness_users": (q_burstiness_users, SQL_BURSTINESS_USERS),
        "harmonic_centrality": (
            q_harmonic_centrality,
            SQL_HARMONIC_CENTRALITY,
        ),
        "lift_pairs": (q_lift_pairs, SQL_LIFT_PAIRS),
    }
)


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


def q_decay_score_users(sf_dir: str):
    """Recency-weighted engagement: per user, sum of value *
    exp(-age / tau) with tau = 7 days, age measured from the corpus'
    global max timestamp — the standard feature-store decay score.
    Two passes: a scalar max-ts aggregate (one number to the driver),
    then user-bucketed partial folds (factorize + bincount inside each
    bucket; a user's rows share a bucket so partials are exact)."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "value"])
    tau_us = 7.0 * 86400.0 * 1e6

    mt = ds.max("ts")
    mt_us = np.datetime64(mt, "us").astype(np.int64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        w = g["value"].to_numpy(np.float64) * np.exp(
            (t - mt_us) / tau_us
        )
        code, users = pd.factorize(g["user_id"].to_numpy())
        score = np.bincount(code, w)
        n = np.bincount(code)
        return pd.DataFrame(
            {
                "user_id": users,
                "n_events": n.astype(np.int64),
                "decay_score": np.round(score, 6),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_DECAY_SCORE_USERS = """
WITH m AS (SELECT max(ts) AS mt FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value * exp(
         (epoch_us(ts) - epoch_us(m.mt)) / (7.0 * 86400 * 1000000))),
         6) AS decay_score
FROM events, m GROUP BY user_id
"""


REGISTRY.update(
    {
        "skyline_parts": (q_skyline_parts, SQL_SKYLINE_PARTS),
        "gini_orders": (q_gini_orders, SQL_GINI_ORDERS),
        "decay_score_users": (q_decay_score_users, SQL_DECAY_SCORE_USERS),
    }
)


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


REGISTRY.update(
    {
        "setsim_join": (q_setsim_join, SQL_SETSIM_JOIN),
    }
)


def q_feature_propagate(sf_dir: str):
    """Two rounds of GNN-style integer message passing
    (stages/graph.py feature_propagate) over the same ring+chord
    digraph as ``pagerank``: h0 = c_custkey % 97 + 1,
    h_{k+1}(v) = h_k(v) + sum of h_k over in-neighbours. Integer
    aggregation makes the result exact under any partitioning; the
    oracle is the unrolled two-round join+group SQL."""
    from ..stages.graph import feature_propagate

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    def feats(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(c, pa.int64()),
                "x": pa.array(c % 97 + 1, pa.int64()),
            }
        )

    # num_partitions sized to the (tiny) node space: the default
    # shuffle width spins up far more join partitions than rows
    # warrant and the 4 joins pay that overhead four times
    out = feature_propagate(
        cust.map_batches(edges, batch_format="pyarrow"),
        cust.map_batches(feats, batch_format="pyarrow"),
        rounds=2,
        num_partitions=8,
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b["node"],
                "h1": b["h1"],
                "h2": b["h2"],
            }
        ),
        batch_format="pyarrow",
    )


SQL_FEATURE_PROPAGATE = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src,
         (c_custkey + 1) % (SELECT n FROM cnt) AS dst
  FROM customer
  UNION
  SELECT c_custkey AS src,
         (c_custkey * 7 + 3) % (SELECT n FROM cnt) AS dst
  FROM customer WHERE c_custkey % 3 = 0
),
f0 AS (SELECT c_custkey AS node, c_custkey % 97 + 1 AS h FROM customer),
s1 AS (SELECT e.dst AS node, sum(f0.h) AS s
       FROM e JOIN f0 ON f0.node = e.src GROUP BY e.dst),
f1 AS (SELECT f0.node, f0.h + COALESCE(s1.s, 0) AS h
       FROM f0 LEFT JOIN s1 USING (node)),
s2 AS (SELECT e.dst AS node, sum(f1.h) AS s
       FROM e JOIN f1 ON f1.node = e.src GROUP BY e.dst),
f2 AS (SELECT f1.node, f1.h + COALESCE(s2.s, 0) AS h
       FROM f1 LEFT JOIN s2 USING (node))
SELECT f1.node AS c_custkey,
       CAST(f1.h AS BIGINT) AS h1,
       CAST(f2.h AS BIGINT) AS h2
FROM f1 JOIN f2 USING (node)
"""


REGISTRY.update(
    {
        "feature_propagate": (q_feature_propagate, SQL_FEATURE_PROPAGATE),
    }
)


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


REGISTRY.update(
    {
        "rrf_fusion": (q_rrf_fusion, SQL_RRF_FUSION),
    }
)


def q_ewma_users(sf_dir: str):
    """Per-user exponentially-weighted moving average of event values
    (alpha = 0.25, events ordered by ts then event_id) — the
    sequential streaming-feature shape (feature-store 'current EWMA'):
    e_1 = v_1, e_i = a*v_i + (1-a)*e_{i-1}; one row per user with the
    FINAL ewma and the event count. Users are bucketed by hash
    (the `_by_user_bucket` exchange), and within a bucket the
    recurrence closes in one vectorized weighted dot per user — the
    weight of v_i in e_n is a*(1-a)^(n-i) (and (1-a)^(n-1) for v_1),
    so old events underflow harmlessly instead of looping per row.
    Oracle = per-user recursive CTE on row_number."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    a = 0.25

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        v = g["value"].to_numpy(np.float64)
        change = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(u)))
        # position from the END of each user's run: n - i
        pos = np.arange(len(u), dtype=np.int64) - np.repeat(starts, lens)
        from_end = np.repeat(lens, lens) - 1 - pos
        w = a * np.power(1.0 - a, from_end.astype(np.float64))
        # v_1's weight is (1-a)^(n-1), not a*(1-a)^(n-1)
        first = np.repeat(starts, lens) == np.arange(len(u))
        w[first] = np.power(
            1.0 - a, (np.repeat(lens, lens) - 1)[first].astype(np.float64)
        )
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        ewma = np.zeros(len(starts), np.float64)
        np.add.at(ewma, seg, w * v)
        return pd.DataFrame(
            {
                "user_id": u[starts],
                "n_events": lens.astype(np.int64),
                "ewma": np.round(ewma, 6),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_EWMA_USERS = """
WITH RECURSIVE ev AS (
  SELECT user_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
n AS (SELECT user_id, max(rn) AS n_events FROM ev GROUP BY user_id),
r AS (
  SELECT user_id, rn, value AS e FROM ev WHERE rn = 1
  UNION ALL
  SELECT ev.user_id, ev.rn, 0.25 * ev.value + 0.75 * r.e
  FROM ev JOIN r ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
)
SELECT r.user_id, CAST(n.n_events AS BIGINT) AS n_events,
       round(r.e, 6) AS ewma
FROM r JOIN n ON n.user_id = r.user_id AND r.rn = n.n_events
"""


REGISTRY.update(
    {
        "ewma_users": (q_ewma_users, SQL_EWMA_USERS),
    }
)


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


REGISTRY.update(
    {
        "snapshot_diff": (q_snapshot_diff, SQL_SNAPSHOT_DIFF),
    }
)


def q_ppr_seeds(sf_dir: str):
    """Personalized PageRank (stages/graph.py:pagerank with seeds):
    teleport uniform over the seed set c_custkey % 100 == 0 instead
    of all nodes — 'importance relative to THESE papers', the KG
    recommendation shape. Same ring+chord digraph, 10 exact
    iterations, recursive-CTE oracle with a CASE seed term."""
    from ..stages.graph import pagerank

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    seeds = np.arange(0, n, 100, dtype=np.int64)
    return pagerank(
        cust.map_batches(edges, batch_format="pyarrow"),
        damping=0.85,
        iters=10,
        seeds=seeds,
    )


SQL_PPR_SEEDS = """
WITH RECURSIVE
cnt AS (SELECT count(*) AS n FROM customer),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM customer
       WHERE c_custkey % 100 = 0),
e AS (
  SELECT c_custkey AS src,
         (c_custkey + 1) % (SELECT n FROM cnt) AS dst
  FROM customer
  UNION
  SELECT c_custkey AS src,
         (c_custkey * 7 + 3) % (SELECT n FROM cnt) AS dst
  FROM customer WHERE c_custkey % 3 = 0
),
dg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src),
pr(it, node, r) AS (
  SELECT 0, c_custkey,
         CASE WHEN c_custkey % 100 = 0
              THEN CAST(1.0 AS DOUBLE) / (SELECT s FROM ns)
              ELSE CAST(0.0 AS DOUBLE) END
  FROM customer
  UNION ALL
  SELECT p.it + 1, e.dst,
         CASE WHEN e.dst % 100 = 0
              THEN CAST(0.15 AS DOUBLE) / (SELECT s FROM ns)
              ELSE CAST(0.0 AS DOUBLE) END
           + CAST(0.85 AS DOUBLE) * SUM(p.r / dg.d)
  FROM pr p JOIN dg ON dg.src = p.node JOIN e ON e.src = p.node
  WHERE p.it < 10
  GROUP BY p.it + 1, e.dst
)
SELECT node, round(r * (SELECT n FROM cnt), 6) AS rank
FROM pr WHERE it = 10
"""


REGISTRY.update(
    {
        "ppr_seeds": (q_ppr_seeds, SQL_PPR_SEEDS),
    }
)


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


REGISTRY.update(
    {
        "winsorize_group": (q_winsorize_group, SQL_WINSORIZE_GROUP),
    }
)


def q_global_rownum(sf_dir: str):
    """Distributed zipWithIndex: a contiguous global row number over
    events in (ts, event_id) order, without a single-task global
    sort. Phase 1: one pass of per-batch counts per ORDERED time
    bucket (6-hour windows — range buckets, so bucket order IS row
    order); the bounded bucket->count table folds to an exclusive
    prefix on the driver. Phase 2: per-bucket groups sort locally and
    add their broadcast base. A corpus with a hot window would split
    that window's bucket by sub-range — the documented partitioning
    assumption of every ordered-scan operator here (see
    stages/pack.py). Oracle = row_number() OVER (ORDER BY ts,
    event_id) - 1."""
    ds = _pq(sf_dir, "events", ["event_id", "ts"])
    W = 6 * 3600 * 1_000_000  # 6h in microseconds

    def add_wb(b: pa.Table) -> pa.Table:
        t = b["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "ts": b["ts"],
                "wb": pa.array(t // W, pa.int64()),
            }
        )

    wb_ds = ds.map_batches(add_wb, batch_format="pyarrow").materialize()

    def cnt_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b["wb"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"wb": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    cnt = (
        wb_ds.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("wb")
        .sum("c")
        .to_pandas()
        .sort_values("wb")
    )
    wbs = cnt["wb"].to_numpy(np.int64)
    base = np.r_[0, np.cumsum(cnt["sum(c)"].to_numpy(np.int64))[:-1]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        b0 = base[np.searchsorted(wbs, g["wb"].iloc[0])]
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "rn": b0 + np.arange(len(g), dtype=np.int64),
            }
        )

    return wb_ds.groupby("wb").map_groups(per_bucket, batch_format="pandas")


SQL_GLOBAL_ROWNUM = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT)
         AS rn
FROM events
"""


REGISTRY.update(
    {
        "global_rownum": (q_global_rownum, SQL_GLOBAL_ROWNUM),
    }
)


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


REGISTRY.update(
    {
        "containment_join": (q_containment_join, SQL_CONTAINMENT_JOIN),
    }
)


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


REGISTRY.update(
    {
        "rank_global_orders": (q_rank_global_orders, SQL_RANK_GLOBAL_ORDERS),
    }
)


def q_ab_test_events(sf_dir: str):
    """Two-proportion z-test between deterministic user cohorts
    (user_id % 2): did cohort A convert (>= 15 'purchase' events — a
    per-user intensity threshold that stays meaningful at every scale
    because per-user event counts are scale-invariant in this corpus)
    at a different rate than cohort B? The experiment-analysis
    primitive of an event pipeline. Per-batch per-user purchase-count
    partials shrink the exchange to one row per (batch, user); a
    user-keyed sum folds them; the 2-row cohort table finishes on the
    driver with the pooled z formula written EXACTLY as the oracle's
    SQL expression tree so the float64 ops match ulp-for-ulp."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])
    THRESH = 15

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        isp = (
            pc.equal(b["event_type"], "purchase")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        us, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "np": pa.array(
                    np.bincount(inv, weights=isp).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("np", alias_name="np"))
    )

    def cohort_partial(b: pa.Table) -> pa.Table:
        grp = (
            b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 2
        )
        conv = (
            b["np"].to_numpy(zero_copy_only=False).astype(np.int64)
            >= THRESH
        ).astype(np.int64)
        return pa.table(
            {
                "grp": pa.array([0, 1], pa.int64()),
                "n": pa.array(
                    [int((grp == 0).sum()), int((grp == 1).sum())],
                    pa.int64(),
                ),
                "k": pa.array(
                    [int(conv[grp == 0].sum()), int(conv[grp == 1].sum())],
                    pa.int64(),
                ),
            }
        )

    c = (
        per_user.map_batches(cohort_partial, batch_format="pyarrow")
        .groupby("grp")
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
        .to_pandas()
        .set_index("grp")
    )
    n_a, k_a = int(c.loc[0, "n"]), int(c.loc[0, "k"])
    n_b, k_b = int(c.loc[1, "n"]), int(c.loc[1, "k"])
    rate_a = k_a / float(n_a)
    rate_b = k_b / float(n_b)
    p = (k_a + k_b) / float(n_a + n_b)
    z = (rate_a - rate_b) / np.sqrt(
        p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b)
    )
    return pd.DataFrame(
        {
            "n_a": [n_a],
            "conv_a": [k_a],
            "rate_a": [round(rate_a, 6)],
            "n_b": [n_b],
            "conv_b": [k_b],
            "rate_b": [round(rate_b, 6)],
            "z": [round(float(z), 6)],
        }
    )


SQL_AB_TEST_EVENTS = """
WITH u AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) >= 15
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
c AS (
  SELECT user_id % 2 AS grp, count(*) AS n,
         CAST(sum(conv) AS BIGINT) AS k
  FROM u GROUP BY 1
),
w AS (
  SELECT max(CASE WHEN grp = 0 THEN n END) AS n_a,
         max(CASE WHEN grp = 0 THEN k END) AS conv_a,
         max(CASE WHEN grp = 1 THEN n END) AS n_b,
         max(CASE WHEN grp = 1 THEN k END) AS conv_b
  FROM c
)
SELECT n_a, conv_a, round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
       n_b, conv_b, round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
       round((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
             / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z
FROM w
"""


REGISTRY.update(
    {
        "ab_test_events": (q_ab_test_events, SQL_AB_TEST_EVENTS),
    }
)


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


REGISTRY.update(
    {
        "welch_ttest_segments": (
            q_welch_ttest_segments,
            SQL_WELCH_TTEST_SEGMENTS,
        ),
    }
)


def q_anomaly_hours(sf_dir: str):
    """Hourly traffic anomaly detection: z-score of each hour's event
    count against the corpus-wide hourly mean/std (sample std), flag
    hours with |z| > 2 — the monitoring primitive of a streaming
    pipeline, run as a batch diagnostic. Per-batch hour-bucket count
    partials shrink the exchange; the hour table is bounded by the
    TIME SPAN, not the row count, so the driver finish is
    scale-safe. Both sides compare the ROUNDED z against the
    threshold, so boundary floats cannot diverge."""
    ds = _pq(sf_dir, "events", ["ts"])
    H = 3600 * 1_000_000

    def hour_partial(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        u, c = np.unique(t // H, return_counts=True)
        return pa.table(
            {"hb": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    h = (
        ds.map_batches(hour_partial, batch_format="pyarrow")
        .groupby("hb")
        .sum("c")
        .to_pandas()
    )
    n = h["sum(c)"].to_numpy(np.float64)
    m = n.mean()
    sd = np.sqrt(((n - m) ** 2).sum() / (len(n) - 1))
    z = np.round((n - m) / sd, 6)
    keep = np.abs(z) > 2
    return pd.DataFrame(
        {
            "hb": (h["hb"].to_numpy(np.int64)[keep] * H).astype(
                "datetime64[us]"
            ),
            "n": n[keep].astype(np.int64),
            "z": z[keep],
        }
    )


SQL_ANOMALY_HOURS = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hb, count(*) AS n
  FROM events GROUP BY 1
),
s AS (SELECT avg(n) AS m, stddev_samp(n) AS sd FROM h)
SELECT h.hb, h.n, round((h.n - s.m) / s.sd, 6) AS z
FROM h, s
WHERE abs(round((h.n - s.m) / s.sd, 6)) > 2
"""


REGISTRY.update(
    {
        "anomaly_hours": (q_anomaly_hours, SQL_ANOMALY_HOURS),
    }
)


def q_cov_embeddings(sf_dir: str):
    """Distributed covariance matrix of the first 8 embedding
    dimensions — the one-pass-shaped statistics kernel behind PCA /
    whitening over an embedding column. Two-pass centered form for
    float stability (the corr_agg shape lifted to a matrix): pass 1
    folds per-batch dimension sums to global means (D-row table,
    broadcast); pass 2 emits the 36 upper-triangle centered-product
    partials per batch and folds them with one tiny groupby.
    cov = sxy/(n-1) = SQL covar_samp to well below the 6 dp margin.
    Output is the (i, j, cov) upper triangle."""
    ds = _pq(sf_dir, "embeddings", ["embedding"])
    D = 8

    def mat(b: pa.Table) -> np.ndarray:
        arr = b["embedding"].combine_chunks()
        # flatten() respects slice offsets, unlike .values
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        dim = len(flat) // len(arr)
        return flat.reshape(len(arr), dim)[:, :D]

    def sum_partial(b: pa.Table) -> pa.Table:
        M = mat(b)
        return pa.table(
            {
                "k": pa.array(np.arange(D, dtype=np.int64), pa.int64()),
                "s": pa.array(M.sum(axis=0), pa.float64()),
                "n": pa.array(
                    np.full(D, M.shape[0], dtype=np.int64), pa.int64()
                ),
            }
        )

    sums = (
        ds.map_batches(sum_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("k")
    )
    n = int(sums["n"].iloc[0])
    mean = (sums["s"].to_numpy(np.float64) / n).copy()

    iu, ju = np.triu_indices(D)
    codes = iu * D + ju

    def prod_partial(b: pa.Table) -> pa.Table:
        Mc = mat(b) - mean
        G = Mc.T @ Mc
        return pa.table(
            {
                "code": pa.array(codes, pa.int64()),
                "sxy": pa.array(G[iu, ju], pa.float64()),
            }
        )

    agg = (
        ds.map_batches(prod_partial, batch_format="pyarrow")
        .groupby("code")
        .aggregate(Sum("sxy", alias_name="sxy"))
    )

    def finish(b: pa.Table) -> pa.Table:
        code = b["code"].to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = b["sxy"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "i": pa.array(code // D, pa.int64()),
                "j": pa.array(code % D, pa.int64()),
                "cov": pa.array(np.round(sxy / (n - 1), 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_COV_EMBEDDINGS = """
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       round(covar_samp(embedding[CAST(i + 1 AS INT)],
                        embedding[CAST(j + 1 AS INT)]), 6) AS cov
FROM embeddings,
     unnest(generate_series(0, 7)) AS t(i),
     unnest(generate_series(0, 7)) AS u(j)
WHERE i <= j
GROUP BY i, j
"""


REGISTRY.update(
    {
        "cov_embeddings": (q_cov_embeddings, SQL_COV_EMBEDDINGS),
    }
)


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


REGISTRY.update(
    {
        "substr_dedup_docs": (q_substr_dedup_docs, SQL_SUBSTR_DEDUP_DOCS),
    }
)


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: for every
    embedding, the most-cosine-similar embedding with a DIFFERENT
    label (rank-1 under the ann_topk ordering contract: float64
    cosine DESC, vec_id ASC — ranks only cross the oracle, never
    floats). Engine: the full (id, label, L2-normalized matrix) side
    is broadcast once via ray.put and read zero-copy per task; each
    batch computes one matmul against it, masks same-label columns,
    and takes a vectorized argmax (matrix sorted by vec_id, so
    argmax's first-hit rule IS the vec_id tie-break). Scale path at
    an unbounded corpus = the IVF-bucketed variant
    (stages/similarity.py), same contract."""
    import ray

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    side = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    ids = side["vec_id"].to_numpy(np.int64)
    labels = side["label"].to_numpy(np.int64)
    M = np.stack(
        [np.asarray(v, np.float64) for v in side["embedding"]]
    )
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, labels, M))

    def fn(b: pa.Table) -> pa.Table:
        rids, rlabels, RM = ray.get(ref)
        arr = b["embedding"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        X = flat.reshape(len(arr), -1)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        S = X @ RM.T
        bl = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        S[bl[:, None] == rlabels[None, :]] = -np.inf
        best = S.argmax(axis=1)
        return pa.table(
            {
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
                "neg_id": pa.array(rids[best], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_HARD_NEGATIVES = """
SELECT vec_id, neg_id FROM (
  SELECT a.vec_id AS vec_id, b.vec_id AS neg_id,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]) DESC,
                    b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.label <> b.label)
WHERE rn = 1
"""


REGISTRY.update(
    {
        "hard_negatives": (q_hard_negatives, SQL_HARD_NEGATIVES),
    }
)


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


def q_burst_users(sf_dir: str):
    """Sliding-window rate detection (bot / abuse screening): each
    user's MAX event count in any 23-hour trailing window, exact
    RANGE-frame semantics (window [t-23h, t], ts peers included).
    Per-user work is fully vectorized inside coarse user-hash groups:
    rows sort by (user, ts), each user's timestamps are shifted into
    DISJOINT ranges separated by > the window span (prefix-sum of
    spans), after which ONE global searchsorted pair answers every
    per-user window query; per-user max via maximum.reduceat. No
    per-user Python loop, one exchange."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    W = 23 * 3600 * 1_000_000  # 23h in us
    GAP = W + 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        order = np.lexsort((t, u))
        u, t = u[order], t[order]
        m = len(u)
        new = np.empty(m, dtype=bool)
        new[0] = True
        np.not_equal(u[1:], u[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        # per-user span -> disjoint offset so windows never cross users
        seg_id = np.cumsum(new) - 1
        seg_min = t[starts]
        rel = t - seg_min[seg_id]  # >= 0, sorted within segment
        spans = np.zeros(len(starts), dtype=np.int64)
        ends = np.r_[starts[1:], m] - 1
        spans = rel[ends]
        offs = np.r_[0, np.cumsum(spans[:-1] + GAP)]
        tt = rel + offs[seg_id]  # globally sorted, segments disjoint
        lo = np.searchsorted(tt, tt - W, side="left")
        hi = np.searchsorted(tt, tt, side="right")
        cnt = hi - lo
        mx = np.maximum.reduceat(cnt, starts)
        return pd.DataFrame(
            {"user_id": u[starts], "max_burst": mx.astype(np.int64)}
        )

    return _by_user_bucket(ds).map_groups(
        per_bucket, batch_format="pandas"
    )


SQL_BURST_USERS = """
WITH w AS (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 23 HOURS PRECEDING
                     AND CURRENT ROW) AS c
  FROM events
)
SELECT user_id, max(c) AS max_burst FROM w GROUP BY user_id
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


REGISTRY.update(
    {
        "mixture_sample_docs": (q_mixture_sample_docs, _mixture_sql()),
        "burst_users": (q_burst_users, SQL_BURST_USERS),
        "curation_decision_docs": (
            q_curation_decision_docs,
            SQL_CURATION_DECISION_DOCS,
        ),
    }
)


def q_pca_project_embeddings(sf_dir: str):
    """Distributed PCA projection (the whitening / dimensionality-
    reduction step in front of clustering and SemDedup): full 64-dim
    covariance via the cov_embeddings two-pass centered machinery
    (upper-triangle partials, ONE tiny groupby), eigendecomposition of
    the 64x64 matrix on the driver (trivially small), then a third
    streaming pass projects every row onto the top-2 components.
    Sign-fixed (largest-|entry| positive) so results are deterministic
    under any partitioning. NO SQL ORACLE: eigendecomposition is not
    SQL-expressible; tests/test_analytics2.py checks the projection
    against numpy PCA directly and asserts partition invariance."""
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])

    def mat(b: pa.Table) -> np.ndarray:
        arr = b["embedding"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return flat.reshape(len(arr), -1)

    def sum_partial(b: pa.Table) -> pa.Table:
        M = mat(b)
        D = M.shape[1]
        return pa.table(
            {
                "k": pa.array(np.arange(D, dtype=np.int64), pa.int64()),
                "s": pa.array(M.sum(axis=0), pa.float64()),
                "n": pa.array(
                    np.full(D, M.shape[0], dtype=np.int64), pa.int64()
                ),
            }
        )

    sums = (
        ds.map_batches(sum_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("k")
    )
    D = len(sums)
    n = int(sums["n"].iloc[0])
    mean = (sums["s"].to_numpy(np.float64) / n).copy()
    iu, ju = np.triu_indices(D)
    codes = iu * D + ju

    def prod_partial(b: pa.Table) -> pa.Table:
        Mc = mat(b) - mean
        G = Mc.T @ Mc
        return pa.table(
            {
                "code": pa.array(codes, pa.int64()),
                "sxy": pa.array(G[iu, ju], pa.float64()),
            }
        )

    tri = (
        ds.map_batches(prod_partial, batch_format="pyarrow")
        .groupby("code")
        .aggregate(Sum("sxy", alias_name="sxy"))
        .to_pandas()
    )
    cov = np.zeros((D, D))
    ci = tri["code"].to_numpy(np.int64)
    cov[ci // D, ci % D] = tri["sxy"].to_numpy(np.float64)
    cov = (cov + cov.T - np.diag(np.diag(cov))) / (n - 1)
    w, V = np.linalg.eigh(cov)
    top = V[:, ::-1][:, :2].copy()  # eigh returns ascending
    for c in range(2):
        j = np.argmax(np.abs(top[:, c]))
        if top[j, c] < 0:
            top[:, c] = -top[:, c]

    def project(b: pa.Table) -> pa.Table:
        P = (mat(b) - mean) @ top
        return pa.table(
            {
                "vec_id": pc.cast(b["vec_id"], pa.int64()),
                "pc1": pa.array(np.round(P[:, 0], 6), pa.float64()),
                "pc2": pa.array(np.round(P[:, 1], 6), pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


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


REGISTRY.update(
    {
        "pca_project_embeddings": (q_pca_project_embeddings, None),
        "shrunk_means_customers": (
            q_shrunk_means_customers,
            SQL_SHRUNK_MEANS_CUSTOMERS,
        ),
    }
)


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


def q_top_paths_users(sf_dir: str):
    """Path mining: the global top-10 strict-adjacency event-type
    trigram paths (the generalization of sequence_triples' fixed
    funnel). Trigrams extract vectorized inside coarse user-hash
    groups; the path vocabulary is bounded (|types|^3), so only a
    tiny (path, count) table shuffles. Tie-break: count DESC, path
    ASC — identical in both engines."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        if len(u) < 3:
            return pd.DataFrame({"path": [], "n": []})
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        if not same.any():
            return pd.DataFrame({"path": [], "n": []})
        codes, uniq = pd.factorize(et)
        k = len(uniq)
        tri = (
            codes[:-2][same] * k * k
            + codes[1:-1][same] * k
            + codes[2:][same]
        )
        cnt = np.bincount(tri)
        nz = np.flatnonzero(cnt)
        path = [
            f"{uniq[c // (k * k)]}>{uniq[(c // k) % k]}>{uniq[c % k]}"
            for c in nz
        ]  # bounded: |types|^3 strings, not per-row work
        return pd.DataFrame({"path": path, "n": cnt[nz].astype(np.int64)})

    agg = (
        _by_user_bucket(ds)
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    agg = agg.sort_values(
        ["n", "path"], ascending=[False, True], kind="mergesort"
    ).head(10)
    return agg.reset_index(drop=True)


SQL_TOP_PATHS_USERS = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3,
         lead(user_id) OVER w AS u2,
         lead(user_id, 2) OVER w AS u3
  FROM events
  WINDOW w AS (ORDER BY user_id, ts, event_id)
)
SELECT event_type || '>' || e2 || '>' || e3 AS path,
       count(*) AS n
FROM s
WHERE user_id = u2 AND user_id = u3
GROUP BY 1
ORDER BY n DESC, path ASC
LIMIT 10
"""


REGISTRY.update(
    {
        "q5_revenue": (q_q5_revenue, SQL_Q5_REVENUE),
        "rep_ngram_docs": (q_rep_ngram_docs, SQL_REP_NGRAM_DOCS),
        "top_paths_users": (q_top_paths_users, SQL_TOP_PATHS_USERS),
    }
)


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


def q_tail_latency_users(sf_dir: str):
    """Per-user p95 inter-event gap in seconds (the streaming-SLA /
    engagement-cadence metric): gaps derive from the ORDERED per-user
    event stream (ts, event_id), then an exact linear-interpolation
    quantile per user — the quantiles_group contract applied to a
    SEQUENTIALLY DERIVED column. Gap seconds are integer-microsecond
    differences divided by 1e6 once, so both engines interpolate
    identical doubles. Users with < 2 events have no gaps and are
    absent from both sides."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame(
                {"user_id": [], "n_gaps": [], "p95_gap_s": []}
            )
        gu = u[1:][same]
        gap = ((t[1:] - t[:-1])[same]) / 1e6
        starts = np.r_[0, np.flatnonzero(gu[1:] != gu[:-1]) + 1]
        lens = np.diff(np.append(starts, len(gu)))
        # vectorized per-user linear-interpolation quantile (numpy's
        # 'linear' formula applied across ALL users at once): gaps are
        # already grouped by user, sort within user, index the 95th
        # rank per segment — no per-user loop
        order = np.lexsort((gap, gu))
        gs = gap[order]
        h = (lens - 1) * 0.95
        f = np.floor(h).astype(np.int64)
        frac = h - f
        lo = gs[starts + f]
        hi = gs[starts + np.minimum(f + 1, lens - 1)]
        p95 = lo + frac * (hi - lo)
        # floor-quantize: microsecond-exact gaps interpolated at
        # frac=.25/.75 DO land on exact .00005 boundaries where the
        # two engines' round() half-rules diverge
        return pd.DataFrame(
            {
                "user_id": gu[starts],
                "n_gaps": lens.astype(np.int64),
                "p95_gap_s": np.floor(p95 * 1e4) / 1e4,
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_TAIL_LATENCY_USERS = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id),
                   ts) / 1000000.0 AS gap_s
  FROM events
)
SELECT user_id, count(gap_s) AS n_gaps,
       floor(quantile_cont(gap_s, 0.95) * 10000) / 10000 AS p95_gap_s
FROM g WHERE gap_s IS NOT NULL
GROUP BY user_id
"""


def q_cusum_users(sf_dir: str):
    """CUSUM drift detection per user (the sequential
    change-point-monitoring primitive): S_i = max(0, S_{i-1} +
    value_i - 60) over the (ts, event_id)-ordered stream; one row per
    user with max(S). The nonlinear recurrence closes WITHOUT a
    per-row loop via the prefix identity S_i = P_i - min(0,
    running_min(P_i)) (P = prefix sums of value - 60); per-user
    segment isolation uses a staircase offset (earlier segments
    shifted far ABOVE later ones so their minima never leak
    forward). Oracle = per-user recursive CTE of the literal
    recurrence — algebraically identical, float-different only at
    ~1e-13 against a 1e-6 rounding grid."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    K = 60.0

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        # EXACT integer cents: value has 2 decimals, so prefix sums,
        # staircase offsets and running minima are all int64 — zero
        # precision loss (a float staircase would erode P's low bits
        # once offsets dwarf the values)
        d = np.rint(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        ) - np.int64(K * 100)
        change = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, len(u)))
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        # per-segment prefix sums: global cumsum minus the cumsum just
        # before each segment start
        cs = np.cumsum(d)
        base = np.r_[np.int64(0), cs[starts[1:] - 1]]
        P = cs - base[seg]
        # staircase: earlier segments pushed far above later ones so a
        # running min never crosses a segment boundary (int64 bound:
        # n_segments * (sum|d| + 1) must fit — ~2^63 headroom)
        BIG = np.int64(np.abs(d).sum() + 1)
        stair = (np.int64(len(starts)) - seg) * BIG
        runmin = np.minimum.accumulate(P + stair) - stair
        S = P - np.minimum(np.int64(0), runmin)
        mx = np.maximum.reduceat(S, starts)
        return pd.DataFrame(
            {
                "user_id": u[starts],
                "n_events": lens.astype(np.int64),
                "max_cusum": np.round(mx / 100.0, 6),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_CUSUM_USERS = """
WITH RECURSIVE ev AS (
  SELECT user_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
n AS (SELECT user_id, max(rn) AS n_events FROM ev GROUP BY user_id),
r AS (
  SELECT user_id, rn, greatest(0, value - 60) AS s FROM ev WHERE rn = 1
  UNION ALL
  SELECT ev.user_id, ev.rn, greatest(0, r.s + ev.value - 60)
  FROM ev JOIN r ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
)
SELECT r.user_id, CAST(any_value(n.n_events) AS BIGINT) AS n_events,
       round(max(r.s), 6) AS max_cusum
FROM r JOIN n ON n.user_id = r.user_id
GROUP BY r.user_id
"""


REGISTRY.update(
    {
        "join_size_estimate": (q_join_size_estimate, SQL_JOIN_SIZE_ESTIMATE),
        "tail_latency_users": (q_tail_latency_users, SQL_TAIL_LATENCY_USERS),
        "cusum_users": (q_cusum_users, SQL_CUSUM_USERS),
    }
)

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


def q_target_encode_events(sf_dir: str):
    """Leave-one-out target encoding (the categorical-feature ML
    primitive): every event's type encoded as the mean event value of
    all OTHER events of the same type — (sum - self)/(n - 1). Group
    partials fold as integer cents (one grouped exchange over ~5
    keys), broadcast back over the scan; both engines divide the same
    two integers so the doubles agree to the last bit."""
    ds = _pq(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        et = b["event_type"]
        u = pc.unique(et)
        idx = pc.index_in(et, u).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": u,
                "n": pa.array(
                    np.bincount(idx, minlength=len(u)).astype(np.int64)
                ),
                "sc": pa.array(
                    np.bincount(idx, weights=cents, minlength=len(u)).astype(
                        np.int64
                    )
                ),
            }
        )

    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sc", alias_name="sc"))
        .to_pandas()
        .sort_values("event_type", kind="mergesort")
    )
    types = stats["event_type"].tolist()
    n_of = dict(zip(types, stats["n"].to_numpy(np.int64)))
    sc_of = dict(zip(types, stats["sc"].to_numpy(np.int64)))
    import ray

    ref = ray.put((n_of, sc_of))

    from ..state.broadcast import get_broadcast

    class Encode:
        def __init__(self, model_ref) -> None:
            self.n_of, self.sc_of = get_broadcast(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            et = b["event_type"]
            u = pc.unique(et)
            idx = pc.index_in(et, u).to_numpy(zero_copy_only=False)
            n = np.array([self.n_of[t.as_py()] for t in u], np.int64)[idx]
            sc = np.array([self.sc_of[t.as_py()] for t in u], np.int64)[idx]
            cents = np.rint(
                b["value"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
            loo = (sc - cents) / (n - 1) / 100.0
            # floor-quantize: LOO means hit exact .0000005 boundaries
            # (denominators like n-1=1600 give terminating binary
            # fractions) where round() half-rules diverge
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "event_type": et,
                    "loo_enc": pa.array(
                        np.floor(loo * 1e6) / 1e6, pa.float64()
                    ),
                }
            )

    return ds.map_batches(
        Encode,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


SQL_TARGET_ENCODE_EVENTS = """
WITH s AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(round(value * 100.0) AS BIGINT)) AS sc
  FROM events GROUP BY 1)
SELECT event_id, e.event_type,
       floor((s.sc - CAST(round(e.value * 100.0) AS BIGINT))
             / (s.n - 1) / 100.0 * 1000000.0) / 1000000.0 AS loo_enc
FROM events e JOIN s ON e.event_type = s.event_type
"""


def q_rolling_median_users(sf_dir: str):
    """Exact rolling median per user (ROWS 4 PRECEDING .. CURRENT over
    the (ts, event_id)-ordered stream): windows materialize as a
    (n, 5) shifted-column matrix with int64-max sentinels past segment
    starts, one vectorized row sort, and the two middle ranks picked
    per actual window width — no per-row loop, no per-user loop.
    Arithmetic stays integer cents until ONE division identical to the
    oracle's, so both engines round the same double."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    W = 5
    SENT = np.int64(2**62)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        )
        n = len(u)
        change = np.r_[True, u[1:] != u[:-1]]
        seg_start = np.maximum.accumulate(
            np.where(change, np.arange(n), -1)
        )
        offset = np.arange(n) - seg_start  # position within user
        win = np.full((n, W), SENT, np.int64)
        for d in range(W):
            valid = offset >= d
            win[valid, d] = cents[np.flatnonzero(valid) - d]
        win.sort(axis=1)
        w = np.minimum(offset + 1, W)
        rows = np.arange(n)
        a = win[rows, (w - 1) // 2]
        b = win[rows, w // 2]
        med = (a + b) / 2.0 / 100.0
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": u,
                "roll_med": np.round(med, 4),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_ROLLING_MEDIAN_USERS = """
SELECT event_id, user_id,
       round(median(CAST(round(value * 100.0) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             / 100.0, 4) AS roll_med
FROM events
"""


def q_knn_vote_embeddings(sf_dir: str):
    """k-NN label vote (the embedding-space classifier / label-noise
    audit): every vector classified by the majority label of its 5
    cosine-nearest OTHER vectors. The whole (id, vec, label) side
    broadcasts once (ray.put); each batch scores with ONE float64
    matmul against the normalized matrix, kills the self column, and
    takes the arg-top-5 under the ann_topk ordering contract
    (similarity DESC, vec_id ASC). Vote ties break toward the
    smallest label — integer logic, hash-stable. Scale note: brute
    kNN is inherently index-broadcast (the query side streams; the
    index is the whole table) — beyond broadcast reach the scale plan
    is the IVF/PQ family (stages/similarity.py, stages/pq.py), same
    ordering contract."""
    import ray

    from ..state.broadcast import get_broadcast

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    allv = ds.to_pandas().sort_values("vec_id")
    ids = allv["vec_id"].to_numpy(np.int64)
    labels = allv["label"].to_numpy(np.int64)
    M = np.stack([np.asarray(v, np.float64) for v in allv["embedding"]])
    Mn = M / np.maximum(
        np.linalg.norm(M, axis=1, keepdims=True), 1e-300
    )
    ref = ray.put((ids, labels, Mn))
    K = 5

    class Vote:
        def __init__(self, model_ref) -> None:
            self.ids, self.labels, self.Mn = get_broadcast(model_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            q = np.stack(
                [
                    np.asarray(v, np.float64)
                    for v in b["embedding"].to_pylist()
                ]
            )
            qn = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-300
            )
            sim = qn @ self.Mn.T  # (nq, N)
            qid = b["vec_id"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            self_col = np.searchsorted(self.ids, qid)
            rows = np.arange(len(qid))
            sim[rows, self_col] = -np.inf
            # top-K under (sim DESC, vec_id ASC): lexsort on the
            # candidate axis; ids are pre-sorted so a stable sort on
            # -sim preserves the id tiebreak
            top = np.argsort(-sim, axis=1, kind="stable")[:, :K]
            votes = self.labels[top]  # (nq, K)
            nl = int(self.labels.max()) + 1
            counts = np.zeros((len(qid), nl), np.int64)
            np.add.at(counts, (rows[:, None], votes), 1)
            # majority, ties -> smallest label (argmax picks first max)
            pred = counts.argmax(axis=1).astype(np.int64)
            true = b["label"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return pa.table(
                {
                    "vec_id": pa.array(qid),
                    "pred_label": pa.array(pred),
                    "label": pa.array(true),
                    "correct": pa.array(pred == true),
                }
            )

    return ds.map_batches(
        Vote,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
        batch_size=512,
    )


SQL_KNN_VOTE_EMBEDDINGS = """
WITH nn AS (
  SELECT q.vec_id AS vec_id, v.label AS vlabel,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           v.embedding::DOUBLE[]) DESC,
                    v.vec_id) AS rank
  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id),
vote AS (
  SELECT vec_id, vlabel, count(*) AS c FROM nn
  WHERE rank <= 5 GROUP BY vec_id, vlabel),
best AS (
  SELECT vec_id, vlabel AS pred_label,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY c DESC, vlabel) AS rn
  FROM vote)
SELECT b.vec_id, CAST(b.pred_label AS BIGINT) AS pred_label,
       CAST(e.label AS BIGINT) AS label,
       b.pred_label = e.label AS correct
FROM best b JOIN embeddings e ON b.vec_id = e.vec_id
WHERE b.rn = 1
"""


REGISTRY.update(
    {
        "q3_shipping": (q_q3_shipping, SQL_Q3_SHIPPING),
        "above_avg_orders": (q_above_avg_orders, SQL_ABOVE_AVG_ORDERS),
        "target_encode_events": (
            q_target_encode_events,
            SQL_TARGET_ENCODE_EVENTS,
        ),
        "rolling_median_users": (
            q_rolling_median_users,
            SQL_ROLLING_MEDIAN_USERS,
        ),
        "knn_vote_embeddings": (
            q_knn_vote_embeddings,
            SQL_KNN_VOTE_EMBEDDINGS,
        ),
    }
)


def q_distinct_users_daily(sf_dir: str):
    """Exact grouped COUNT(DISTINCT) — daily active users per event
    type. The classic two-phase distinct: batches pre-dedup their
    (type, day, user) triples so the ONE exchange carries only unique
    observations per block, then the grouped finalizer counts unique
    users per (type, day) with a vectorized diff over the sorted
    column — the exact-distinct sibling of approx_distinct_users'
    HLL."""
    ds = _pq(sf_dir, "events", ["event_type", "ts", "user_id"])
    DAY = np.int64(86_400_000_000)

    def triple(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        out = pa.table(
            {
                "event_type": b["event_type"],
                "day_us": pa.array((t // DAY) * DAY, pa.int64()),
                "user_id": pc.cast(b["user_id"], pa.int64()),
            }
        )
        # in-batch dedup cuts the exchange to unique triples per block
        return out.group_by(
            ["event_type", "day_us", "user_id"]
        ).aggregate([])

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        u = np.sort(g["user_id"].to_numpy(np.int64))
        n = 1 + int((u[1:] != u[:-1]).sum()) if len(u) else 0
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "day": pd.to_datetime(
                    [g["day_us"].iloc[0]], unit="us"
                ).strftime("%Y-%m-%d"),
                "n_users": [n],
            }
        )

    return (
        ds.map_batches(triple, batch_format="pyarrow")
        .groupby(["event_type", "day_us"])
        .map_groups(finalize, batch_format="pandas")
    )


SQL_DISTINCT_USERS_DAILY = """
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def q_event_concat_users(sf_dir: str):
    """Ordered string aggregation — each user's first-20-event type
    path as ONE comma-joined string (the session-trace export shape).
    Per bucket: one mergesort, per-user offsets clipped to 20, an
    Arrow ListArray built directly on those offsets, and
    pc.binary_join — the string reduction never drops to a Python
    per-user loop."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    CAP = 20

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        lens = np.diff(np.append(starts, len(u)))
        take = np.minimum(lens, CAP)
        # gather the first-CAP row indices per user without a loop
        idx = np.repeat(starts, take) + (
            np.arange(take.sum()) - np.repeat(np.cumsum(take) - take, take)
        )
        vals = pa.array(
            g["event_type"].to_numpy()[idx].astype(object), pa.string()
        )
        offsets = pa.array(
            np.r_[0, np.cumsum(take)].astype(np.int32), pa.int32()
        )
        lists = pa.ListArray.from_arrays(offsets, vals)
        path = pc.binary_join(lists, ",")
        return pd.DataFrame(
            {
                "user_id": u[starts],
                "n_events": lens.astype(np.int64),
                "path": path.to_pandas(),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_EVENT_CONCAT_USERS = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events)
SELECT user_id, any_value(n_events) AS n_events,
       string_agg(event_type, ',' ORDER BY rn) AS path
FROM r WHERE rn <= 20 GROUP BY user_id
"""


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


def q_fill_forward_users(sf_dir: str):
    """Time-series gap fill (the resample / state-at-boundary shape):
    each user's value forward-filled onto an hourly grid from their
    first full hour boundary to their last. Per bucket the grids of
    ALL users flatten into one array (repeat + cumsum, no per-user
    loop) and ONE staircase-offset searchsorted maps every grid point
    to its user's latest event at-or-before it — the distributed
    as-of-join kernel reused for resampling. Carried value stays
    integer cents until the final /100."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    HOUR = np.int64(3_600_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        )
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        ends = np.append(starts[1:], len(u)) - 1
        h0 = (t[starts] // HOUR + 1) * HOUR  # first boundary >= min ts
        h1 = (t[ends] // HOUR) * HOUR  # last boundary <= max ts
        n = np.maximum((h1 - h0) // HOUR + 1, 0).astype(np.int64)
        if int(n.sum()) == 0:
            return pd.DataFrame(
                {"user_id": [], "hour": [], "value": []}
            )
        seg = np.repeat(np.arange(len(starts)), n)
        local = np.arange(int(n.sum())) - np.repeat(
            np.cumsum(n) - n, n
        )
        grid = h0[seg] + local * HOUR
        # staircase offsets isolate users inside ONE searchsorted
        span = np.int64(t.max() - t.min() + 2) + HOUR
        uid_rank = np.cumsum(np.r_[False, u[1:] != u[:-1]])
        key_ev = t - t.min() + uid_rank * span
        key_gr = grid - t.min() + seg * span
        idx = np.searchsorted(key_ev, key_gr, side="right") - 1
        return pd.DataFrame(
            {
                "user_id": u[starts][seg],
                "hour": pd.to_datetime(grid, unit="us").strftime(
                    "%Y-%m-%d %H:00"
                ),
                "value": np.round(cents[idx] / 100.0, 2),
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_FILL_FORWARD_USERS = """
WITH b AS (
  SELECT user_id,
         date_trunc('hour', min(ts)) + INTERVAL 1 HOUR AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM b WHERE h0 <= h1),
r AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT g.user_id, strftime(g.h, '%Y-%m-%d %H:00') AS hour,
       round(max_by(CAST(round(r.value * 100.0) AS BIGINT), r.rn)
             / 100.0, 2) AS value
FROM grid g JOIN r ON r.user_id = g.user_id AND r.ts <= g.h
GROUP BY g.user_id, g.h
"""


REGISTRY.update(
    {
        "distinct_users_daily": (
            q_distinct_users_daily,
            SQL_DISTINCT_USERS_DAILY,
        ),
        "event_concat_users": (q_event_concat_users, SQL_EVENT_CONCAT_USERS),
        "weighted_median_parts": (
            q_weighted_median_parts,
            SQL_WEIGHTED_MEDIAN_PARTS,
        ),
        "fill_forward_users": (q_fill_forward_users, SQL_FILL_FORWARD_USERS),
    }
)


def q_twap_users(sf_dir: str):
    """Time-weighted average value per user (the TWAP / state-integral
    metric): each value weighted by how long it was the user's latest
    observation. Per bucket ONE mergesort gives the ordered stream;
    the integral folds as int64 cents x microsecond products (bounded
    by max-cents x total-span, no overflow), and the single division
    happens on identical integers in both engines. Single-event users
    have no holding period and are absent from both sides."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        cents = np.rint(g["value"].to_numpy(np.float64) * 100.0).astype(
            np.int64
        )
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame({"user_id": [], "twap": []})
        gu = u[:-1][same]
        dt = (t[1:] - t[:-1])[same]
        wv = cents[:-1][same] * dt
        starts = np.r_[0, np.flatnonzero(gu[1:] != gu[:-1]) + 1]
        num = np.add.reduceat(wv, starts)
        den = np.add.reduceat(dt, starts)
        twap = num / den / 100.0
        return pd.DataFrame(
            {
                "user_id": gu[starts],
                "twap": np.floor(twap * 1e6) / 1e6,
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_TWAP_USERS = """
WITH g AS (
  SELECT user_id,
         CAST(round(value * 100.0) AS BIGINT) AS cents,
         date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) AS dt
  FROM events)
SELECT user_id,
       floor(sum(cents * dt) / sum(dt) / 100.0 * 1000000.0)
         / 1000000.0 AS twap
FROM g WHERE dt IS NOT NULL GROUP BY user_id
"""


def q_time_to_convert(sf_dir: str):
    """Conversion latency (the funnel-timing metric): per user, the
    seconds from their FIRST signup to their first purchase at or
    after it. One ordered pass per bucket; both timestamps stay int64
    micros and the /1e6 happens on identical operands. Users without
    a signup, or without a purchase after it, are absent from both
    sides."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        seg = np.cumsum(np.r_[False, u[1:] != u[:-1]])
        BIG = np.int64(2**62)
        # first signup per user: min over masked staircase
        ts_sig = np.where(et == "signup", t, BIG)
        t0 = np.minimum.reduceat(ts_sig, starts)
        # first purchase at/after the signup
        ts_pur = np.where(
            (et == "purchase") & (t >= t0[seg]), t, BIG
        )
        t1 = np.minimum.reduceat(ts_pur, starts)
        ok = (t0 < BIG) & (t1 < BIG)
        return pd.DataFrame(
            {
                "user_id": u[starts][ok],
                "convert_s": (t1[ok] - t0[ok]) / 1e6,
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_TIME_TO_CONVERT = """
WITH s AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY 1),
p AS (
  SELECT e.user_id, min(e.ts) AS t1
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.t0
  GROUP BY 1)
SELECT s.user_id,
       date_diff('microsecond', s.t0, p.t1) / 1000000.0 AS convert_s
FROM s JOIN p ON s.user_id = p.user_id
"""


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


REGISTRY.update(
    {
        "twap_users": (q_twap_users, SQL_TWAP_USERS),
        "time_to_convert": (q_time_to_convert, SQL_TIME_TO_CONVERT),
        "k_anonymity_docs": (q_k_anonymity_docs, SQL_K_ANONYMITY_DOCS),
    }
)


def q_bounce_rate_users(sf_dir: str):
    """Sessionized bounce rate per user (the engagement-quality
    metric): sessions split on > 30 min inactivity gaps, a bounce is
    a single-event session. Session boundaries derive from ONE
    ordered pass per bucket (gap mask + cumsum — the session_window
    kernel re-used for a per-user ratio); bounce_rate divides the two
    integers identically in both engines."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])
    GAP = np.int64(30 * 60 * 1_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        new_sess = np.r_[
            True, (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > GAP)
        ]
        sess = np.cumsum(new_sess) - 1
        sess_len = np.bincount(sess)
        sess_user = u[np.flatnonzero(new_sess)]
        order = np.argsort(sess_user, kind="stable")
        su = sess_user[order]
        sl = sess_len[order]
        starts = np.r_[0, np.flatnonzero(su[1:] != su[:-1]) + 1]
        n_sessions = np.diff(np.append(starts, len(su)))
        bounces = np.add.reduceat((sl == 1).astype(np.int64), starts)
        return pd.DataFrame(
            {
                "user_id": su[starts],
                "n_sessions": n_sessions.astype(np.int64),
                "bounces": bounces,
                # floor-quantize: session ratios like 1/64 terminate
                # with a trailing 5 at the 6th decimal
                "bounce_rate": np.floor(bounces / n_sessions * 1e6)
                / 1e6,
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_BOUNCE_RATE_USERS = """
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN date_diff('microsecond',
                             lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                             ts) > 1800000000
                   OR lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM m),
agg AS (
  SELECT user_id, sess_id, count(*) AS len
  FROM s GROUP BY user_id, sess_id)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS bounces,
       floor(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) * 1000000.0) / 1000000.0
         AS bounce_rate
FROM agg GROUP BY user_id
"""


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


def q_attribution_last_touch(sf_dir: str):
    """Last-touch attribution (the marketing-analytics as-of shape):
    every purchase credited to the user's most recent PRIOR
    click-or-view. Per bucket: one mergesort, then a staircase-offset
    searchsorted maps each purchase to the latest earlier touch — the
    as-of kernel with a side filter, no per-user loop. Ties at equal
    ts resolve to the larger event_id (the sort order's last row),
    matching the oracle's max_by over (ts, rn). Purchases with no
    prior touch are absent from both sides."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        eid = g["event_id"].to_numpy(np.int64)
        uid_rank = np.cumsum(np.r_[False, u[1:] != u[:-1]])
        span = np.int64(t.max() - t.min() + 2)
        key = (t - t.min()) + uid_rank * span
        touch = (et == "click") | (et == "view")
        buy = et == "purchase"
        tk = key[touch]
        # strictly earlier: searchsorted left on (key) of purchases
        pos = np.searchsorted(tk, key[buy], side="left") - 1
        ok = pos >= 0
        # the candidate must belong to the same user segment
        same = np.zeros(ok.sum(), bool)
        cand = pos[ok]
        same = uid_rank[np.flatnonzero(touch)][cand] == uid_rank[buy][ok]
        rows = np.flatnonzero(buy)[ok][same]
        src = np.flatnonzero(touch)[cand[same]]
        return pd.DataFrame(
            {
                "purchase_id": eid[rows],
                "user_id": u[rows],
                "touch_id": eid[src],
                "touch_type": et[src],
            }
        )

    return _by_user_bucket(ds).map_groups(per_bucket, batch_format="pandas")


SQL_ATTRIBUTION_LAST_TOUCH = """
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         row_number() OVER (ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type IN ('click', 'view')),
p AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = 'purchase')
SELECT p.event_id AS purchase_id, p.user_id,
       max_by(t.event_id, t.rn) AS touch_id,
       max_by(t.event_type, t.rn) AS touch_type
FROM p JOIN t ON t.user_id = p.user_id AND t.ts < p.ts
GROUP BY p.event_id, p.user_id
"""


REGISTRY.update(
    {
        "bounce_rate_users": (q_bounce_rate_users, SQL_BOUNCE_RATE_USERS),
        "revenue_share_nations": (
            q_revenue_share_nations,
            SQL_REVENUE_SHARE_NATIONS,
        ),
        "attribution_last_touch": (
            q_attribution_last_touch,
            SQL_ATTRIBUTION_LAST_TOUCH,
        ),
    }
)


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


REGISTRY.update(
    {
        "substr_remove_docs": (q_substr_remove_docs, SQL_SUBSTR_REMOVE_DOCS),
    }
)


def q_rfm_segments(sf_dir: str):
    """RFM segmentation (the classic user-value composite): per user
    Recency (last event), Frequency (event count), Monetary (value
    sum), each scored NTILE(4) under a deterministic
    (metric DESC, user_id) total order, composed as 100r+10f+m.
    The metric table derives from ONE grouped integer fold (per-batch
    partials: last-ts max, count, cent sum); the NTILE step runs on
    that USER-BOUNDED table driver-side — the documented gate; at a
    user population beyond driver reach the rank step is
    rank_global_orders' value-bucket machinery per metric (3 bucketed
    exchanges + joins), which this query deliberately avoids at bench
    scale. Integer metrics end to end: ties and tiles are exact."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "value"])
    from ray.data.aggregate import Max

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        last = np.full(len(uu), np.int64(-(2**62)))
        np.maximum.at(last, inv, t)
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "last_ts": pa.array(last, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "sc": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("last_ts", alias_name="last_ts"),
            Sum("n", alias_name="n"),
            Sum("sc", alias_name="sc"),
        )
        .to_pandas()  # user-bounded (see docstring gate)
    )
    uid = agg["user_id"].to_numpy(np.int64)
    N = len(uid)

    def ntile4(metric: np.ndarray) -> np.ndarray:
        # rank under (metric DESC, user_id ASC), then NTILE(4)
        order = np.lexsort((uid, -metric))
        rank = np.empty(N, np.int64)
        rank[order] = np.arange(N)
        q, r = divmod(N, 4)
        if q == 0:
            return rank + 1
        split = (q + 1) * r
        return (
            np.where(rank < split, rank // (q + 1), r + (rank - split) // q)
            + 1
        )

    r = ntile4(agg["last_ts"].to_numpy(np.int64))
    f = ntile4(agg["n"].to_numpy(np.int64))
    m = ntile4(agg["sc"].to_numpy(np.int64))
    return pd.DataFrame(
        {
            "user_id": uid,
            "r_score": r,
            "f_score": f,
            "m_score": m,
            "rfm": 100 * r + 10 * f + m,
        }
    )


SQL_RFM_SEGMENTS = """
WITH u AS (
  SELECT user_id, max(ts) AS last_ts, count(*) AS n,
         sum(CAST(round(value * 100.0) AS BIGINT)) AS sc
  FROM events GROUP BY 1),
s AS (
  SELECT user_id,
         CAST(ntile(4) OVER (ORDER BY last_ts DESC, user_id) AS BIGINT)
           AS r_score,
         CAST(ntile(4) OVER (ORDER BY n DESC, user_id) AS BIGINT)
           AS f_score,
         CAST(ntile(4) OVER (ORDER BY sc DESC, user_id) AS BIGINT)
           AS m_score
  FROM u)
SELECT user_id, r_score, f_score, m_score,
       100 * r_score + 10 * f_score + m_score AS rfm
FROM s
"""


REGISTRY.update(
    {
        "rfm_segments": (q_rfm_segments, SQL_RFM_SEGMENTS),
    }
)


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


REGISTRY.update(
    {
        "q18_large_orders": (q_q18_large_orders, SQL_Q18_LARGE_ORDERS),
        "q22_wealthy_inactive": (
            q_q22_wealthy_inactive,
            SQL_Q22_WEALTHY_INACTIVE,
        ),
        "q16_part_variety": (q_q16_part_variety, SQL_Q16_PART_VARIETY),
    }
)


# ----------------------------------------- mode / SCD2 / seasonal baseline


def q_mode_event_users(sf_dir: str):
    """Grouped MODE with deterministic tie-break (the categorical
    summary-statistic shape): each user's most frequent event type,
    ties resolved to the lexicographically smallest type. Two-phase
    counts (in-batch (user, type) tallies, ONE grouped sum) so the
    exchange carries count partials, never raw events; the per-user
    argmax runs in a user-bounded map_groups finalizer."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        return b.group_by(["user_id", "event_type"]).aggregate(
            [("user_id", "count")]
        ).rename_columns(["user_id", "event_type", "cnt"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("cnt", alias_name="n"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["n", "event_type"], ascending=[False, True], kind="mergesort"
        )
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "mode_type": [g["event_type"].iloc[0]],
                "n": [int(g["n"].iloc[0])],
            }
        )

    return counts.groupby("user_id").map_groups(pick, batch_format="pandas")


SQL_MODE_EVENT_USERS = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT user_id, event_type AS mode_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c)
SELECT user_id, mode_type, n FROM r WHERE rn = 1
"""


def q_scd2_users(sf_dir: str):
    """Slowly-changing-dimension (type-2) interval build — the
    temporal-table construction shape: each user's event-type stream
    collapses into validity intervals [valid_from, valid_to) at every
    type CHANGE, the open interval marked with an empty valid_to.
    Per-user groups are user-bounded; inside each group the change
    mask, interval starts and leads are pure numpy over the
    (ts, event_id)-ordered stream — the deterministic total order
    both sides share."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (g["event_id"].to_numpy(np.int64), g["ts"].to_numpy().astype("datetime64[us]"))
        )
        ts = g["ts"].to_numpy().astype("datetime64[us]")[order]
        typ = g["event_type"].to_numpy()[order]
        start = np.ones(len(typ), bool)
        start[1:] = typ[1:] != typ[:-1]
        s_ts = ts[start]
        s_typ = typ[start]
        vfrom = pd.Series(s_ts).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        vto = np.roll(vfrom.to_numpy(), -1)
        vto[-1] = ""
        return pd.DataFrame(
            {
                "user_id": np.full(len(s_ts), int(g["user_id"].iloc[0])),
                "event_type": s_typ,
                "valid_from": vfrom.to_numpy(),
                "valid_to": vto,
            }
        )

    return ds.groupby("user_id").map_groups(intervals, batch_format="pandas")


SQL_SCD2_USERS = """
WITH o AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER w AS prev_type
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type, ts
  FROM o WHERE prev_type IS NULL OR event_type <> prev_type),
iv AS (
  SELECT user_id, event_type,
         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
         coalesce(strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts),
                           '%Y-%m-%d %H:%M:%S.%f'), '') AS valid_to
  FROM s)
SELECT * FROM iv
"""


def q_seasonal_mae_events(sf_dir: str):
    """Seasonal-naive forecast evaluation (the time-series baseline
    shape): predict each hour's event count by the count 24 h
    earlier and report, per event type, the number of scoreable hours
    and the integer sum of absolute errors. Hourly counts fold as
    in-batch partials through ONE grouped sum; the lag-24h match is a
    vectorized searchsorted inside a per-type finalizer whose group
    is bounded by the DISTINCT-HOUR count (time-range/3600), not the
    row count — hours stay small even at 100 TB. Output is all-int,
    so the hash compare is exact; MAE = sum_abs_err / n_hours is
    derivable."""
    ds = _pq(sf_dir, "events", ["event_type", "ts"])
    HOUR = np.int64(3_600_000_000)

    def partial(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        hr = (t // HOUR) * HOUR
        tb = pa.table({"event_type": b["event_type"], "hour_us": pa.array(hr)})
        return tb.group_by(["event_type", "hour_us"]).aggregate(
            [("hour_us", "count")]
        ).rename_columns(["event_type", "hour_us", "cnt"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour_us"])
        .aggregate(Sum("cnt", alias_name="n"))
    )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        h = g["hour_us"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        order = np.argsort(h, kind="stable")
        h, n = h[order], n[order]
        base = h - np.int64(24) * HOUR
        pos = np.searchsorted(h, base)
        ok = (pos < len(h)) & (h[np.minimum(pos, len(h) - 1)] == base)
        err = np.abs(n[ok] - n[pos[ok]])
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_hours": [int(ok.sum())],
                "sum_abs_err": [int(err.sum())],
            }
        )

    return counts.groupby("event_type").map_groups(
        score, batch_format="pandas"
    )


SQL_SEASONAL_MAE_EVENTS = """
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT a.event_type, count(*) AS n_hours,
       CAST(sum(abs(a.n - b.n)) AS BIGINT) AS sum_abs_err
FROM c a JOIN c b
  ON b.event_type = a.event_type AND a.h = b.h + INTERVAL 24 HOUR
GROUP BY 1
"""


REGISTRY.update(
    {
        "mode_event_users": (q_mode_event_users, SQL_MODE_EVENT_USERS),
        "scd2_users": (q_scd2_users, SQL_SCD2_USERS),
        "seasonal_mae_events": (
            q_seasonal_mae_events,
            SQL_SEASONAL_MAE_EVENTS,
        ),
    }
)


# ------------------------------------------- HITS / label propagation


def _ring_chord_edges(cust, n: int):
    """The pagerank ring+chord digraph over the customer keys (shared
    by pagerank / feature_propagate / hits so the oracles reuse one
    edge CTE)."""

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    return cust.map_batches(edges, batch_format="pyarrow")


def q_hits_scores(sf_dir: str):
    """HITS hubs/authorities (stages/graph.py:hits) over the pagerank
    ring+chord digraph — exact UNNORMALIZED integer power iteration
    (hub = h1, auth = a2), so the oracle is three unrolled join+group
    CTEs and the value hash is bit-exact."""
    from ..stages.graph import hits

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()
    return hits(_ring_chord_edges(cust, n), rounds=1)


SQL_HITS_SCORES = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src,
         (c_custkey + 1) % (SELECT n FROM cnt) AS dst
  FROM customer
  UNION
  SELECT c_custkey AS src,
         (c_custkey * 7 + 3) % (SELECT n FROM cnt) AS dst
  FROM customer WHERE c_custkey % 3 = 0
),
a1 AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY 1),
h1 AS (SELECT e.src AS node, CAST(sum(a1.a) AS BIGINT) AS h
       FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1),
a2 AS (SELECT e.dst AS node, CAST(sum(h1.h) AS BIGINT) AS a
       FROM e JOIN h1 ON h1.node = e.src GROUP BY 1)
SELECT c.c_custkey AS node,
       coalesce(h1.h, 0) AS hub, coalesce(a2.a, 0) AS auth
FROM customer c
LEFT JOIN h1 ON h1.node = c.c_custkey
LEFT JOIN a2 ON a2.node = c.c_custkey
"""


def q_label_prop_communities(sf_dir: str):
    """Community detection by synchronous label propagation
    (stages/graph.py:label_propagation) over a planted-community
    graph on the customer keys: eight stride-8 residue rings
    (``c -> c+8``, wrapping to the class minimum) plus sparse bridges
    (``c -> c+1`` for ``c % 101 == 0``). Three deterministic rounds
    (neighbour-label mode, ties to the smallest label) — the oracle
    unrolls the rounds as mode-per-node CTEs."""
    from ..stages.graph import label_propagation

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring = np.where(c + 8 < n, c + 8, c % 8)
        br = c[c % 101 == 0]
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, br]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring, (br + 1) % n]), pa.int64()
                ),
            }
        )

    return label_propagation(
        cust.map_batches(edges, batch_format="pyarrow"), rounds=3
    )


SQL_LABEL_PROP_COMMUNITIES = """
WITH cnt AS (SELECT count(*) AS n FROM customer),
ed AS (
  SELECT c_custkey AS src,
         CASE WHEN c_custkey + 8 < (SELECT n FROM cnt)
              THEN c_custkey + 8 ELSE c_custkey % 8 END AS dst
  FROM customer
  UNION
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM cnt) AS dst
  FROM customer WHERE c_custkey % 101 = 0),
eu AS (
  SELECT src, dst FROM ed WHERE src <> dst
  UNION
  SELECT dst, src FROM ed WHERE src <> dst),
l0 AS (SELECT c_custkey AS node, CAST(c_custkey AS BIGINT) AS label
       FROM customer),
c1 AS (SELECT e.src AS node, l.label, count(*) AS cnt
       FROM eu e JOIN l0 l ON l.node = e.dst GROUP BY 1, 2),
l1 AS (SELECT node, label FROM (
         SELECT node, label,
                row_number() OVER (PARTITION BY node
                                   ORDER BY cnt DESC, label) AS rn
         FROM c1) WHERE rn = 1),
c2 AS (SELECT e.src AS node, l.label, count(*) AS cnt
       FROM eu e JOIN l1 l ON l.node = e.dst GROUP BY 1, 2),
l2 AS (SELECT node, label FROM (
         SELECT node, label,
                row_number() OVER (PARTITION BY node
                                   ORDER BY cnt DESC, label) AS rn
         FROM c2) WHERE rn = 1),
c3 AS (SELECT e.src AS node, l.label, count(*) AS cnt
       FROM eu e JOIN l2 l ON l.node = e.dst GROUP BY 1, 2),
l3 AS (SELECT node, label FROM (
         SELECT node, label,
                row_number() OVER (PARTITION BY node
                                   ORDER BY cnt DESC, label) AS rn
         FROM c3) WHERE rn = 1)
SELECT node, label FROM l3
"""


REGISTRY.update(
    {
        "hits_scores": (q_hits_scores, SQL_HITS_SCORES),
        "label_prop_communities": (
            q_label_prop_communities,
            SQL_LABEL_PROP_COMMUNITIES,
        ),
    }
)


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


def q_abandoned_clicks(sf_dir: str):
    """Abandonment funnel (the conversion-window NOT-EXISTS shape):
    per calendar day, how many clicks had NO purchase by the same
    user within the following hour. Per-user groups sort once; the
    window probe is TWO searchsorted calls over the user's purchase
    timestamps (no per-click loop); per-group (day, n, n_abandoned)
    partials fold through ONE grouped sum."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])
    HOUR = np.int64(3_600_000_000)
    DAY = np.int64(86_400_000_000)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        typ = g["event_type"].to_numpy()
        ct = np.sort(t[typ == "click"])
        pt = np.sort(t[typ == "purchase"])
        if len(ct) == 0:
            return pd.DataFrame(
                {"day_us": [], "n": [], "nab": []}
            ).astype(np.int64)
        lo = np.searchsorted(pt, ct, side="right")
        hi = np.searchsorted(pt, ct + HOUR, side="right")
        ab = (hi == lo).astype(np.int64)
        day = (ct // DAY) * DAY
        u, inv = np.unique(day, return_inverse=True)
        return pd.DataFrame(
            {
                "day_us": u,
                "n": np.bincount(inv).astype(np.int64),
                "nab": np.bincount(inv, weights=ab).astype(np.int64),
            }
        )

    agg = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("day_us")
        .aggregate(
            Sum("n", alias_name="n_clicks"),
            Sum("nab", alias_name="n_abandoned"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        d = pd.to_datetime(
            b["day_us"].to_numpy(zero_copy_only=False), unit="us"
        ).strftime("%Y-%m-%d")
        return pa.table(
            {
                "day": pa.array(d, pa.string()),
                "n_clicks": pc.cast(b["n_clicks"], pa.int64()),
                "n_abandoned": pc.cast(b["n_abandoned"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_ABANDONED_CLICKS = """
WITH cl AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
pu AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
SELECT strftime(date_trunc('day', cl.ts), '%Y-%m-%d') AS day,
       count(*) AS n_clicks,
       CAST(count(*) FILTER (NOT EXISTS (
           SELECT 1 FROM pu
           WHERE pu.user_id = cl.user_id
             AND pu.ts > cl.ts
             AND pu.ts <= cl.ts + INTERVAL 1 HOUR)) AS BIGINT)
         AS n_abandoned
FROM cl GROUP BY 1
"""


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


REGISTRY.update(
    {
        "cdc_chunks_docs": (q_cdc_chunks_docs, SQL_CDC_CHUNKS_DOCS),
        "abandoned_clicks": (q_abandoned_clicks, SQL_ABANDONED_CLICKS),
        "fk_orphans": (q_fk_orphans, SQL_FK_ORPHANS),
        "unpivot_nation_stats": (
            q_unpivot_nation_stats,
            SQL_UNPIVOT_NATION_STATS,
        ),
    }
)


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


def q_cohort_ltv_users(sf_dir: str):
    """Cohort lifetime-value rollup (the classic LTV matrix): users
    cohorted by the DAY-BUCKET (10-day bin) of their first event;
    purchase value accumulates per (cohort, age-in-buckets). First-ts
    folds as ONE grouped min of integer microseconds; the cohort
    lookup broadcasts as sorted arrays under a budget with the
    hash-join fallback (user-bounded state); cents sum exactly."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type", "value"])
    BIN = np.int64(10 * 86_400_000_000)
    from ray.data.aggregate import Min

    def us_cols(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t_us": pa.array(t, pa.int64()),
                "event_type": b["event_type"],
                "value": b["value"],
            }
        )

    base = ds.map_batches(us_cols, batch_format="pyarrow").materialize()
    firsts = (
        base.groupby("user_id")
        .aggregate(Min("t_us", alias_name="first_us"))
        .to_pandas()  # user-bounded (documented gate; see rfm_segments)
    )
    uid = firsts["user_id"].to_numpy(np.int64)
    order = np.argsort(uid, kind="stable")
    uid_s = uid[order]
    cohort_s = (firsts["first_us"].to_numpy(np.int64)[order] // BIN)

    import ray

    from ..state.broadcast import get_broadcast

    ref = ray.put((uid_s, cohort_s))

    def per_batch(b: pa.Table, _ref=ref) -> pa.Table:
        uid_, coh_ = get_broadcast(_ref)
        m = pc.equal(b["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        )
        u = b["user_id"].to_numpy(zero_copy_only=False)[m]
        t = b["t_us"].to_numpy(zero_copy_only=False)[m]
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        pos = np.searchsorted(uid_, u)
        coh = coh_[pos]
        age = t // BIN - coh
        key = np.stack([coh, age], axis=1)
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        return pa.table(
            {
                "cohort": pa.array(uk[:, 0], pa.int64()),
                "age": pa.array(uk[:, 1], pa.int64()),
                "cents": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
                "n_purch": pa.array(np.bincount(inv).astype(np.int64)),
            }
        )

    return (
        base.map_batches(per_batch, batch_format="pyarrow")
        .groupby(["cohort", "age"])
        .aggregate(
            Sum("cents", alias_name="cents"),
            Sum("n_purch", alias_name="n_purch"),
        )
    )


SQL_COHORT_LTV_USERS = """
WITH f AS (
  SELECT user_id,
         CAST(floor(epoch_us(min(ts)) / 864000000000) AS BIGINT)
           AS cohort
  FROM events GROUP BY 1),
p AS (
  SELECT e.user_id, f.cohort,
         CAST(floor(epoch_us(e.ts) / 864000000000) AS BIGINT)
           - f.cohort AS age,
         CAST(round(e.value * 100.0) AS BIGINT) AS cents
  FROM events e JOIN f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase')
SELECT cohort, age, CAST(sum(cents) AS BIGINT) AS cents,
       count(*) AS n_purch
FROM p GROUP BY 1, 2
"""


def q_churn_weekly_users(sf_dir: str):
    """Weekly churn / retention transitions: for every week w, how
    many users were active in w, how many of those returned in w+1,
    and how many churned. Distinct (user, week) pairs dedup in batch
    before ONE exchange; the per-user week set is tiny, so the
    retained/churned flags are a vectorized diff over each user's
    sorted weeks inside a user-keyed finalizer, and the final grouped
    sum is week-bounded."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    WEEK = np.int64(7 * 86_400_000_000)

    def pairs(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.stack([u, t // WEEK], axis=1)
        uk = np.unique(key, axis=0)
        return pa.table(
            {
                "user_id": pa.array(uk[:, 0], pa.int64()),
                "week": pa.array(uk[:, 1], pa.int64()),
            }
        )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        w = np.unique(g["week"].to_numpy(np.int64))
        nxt = np.zeros(len(w), np.int64)
        pos = np.searchsorted(w, w + 1)
        ok = (pos < len(w)) & (w[np.minimum(pos, len(w) - 1)] == w + 1)
        nxt[ok] = 1
        return pd.DataFrame(
            {"week": w, "n_active": 1, "n_retained": nxt}
        )

    agg = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("week")
        .aggregate(
            Sum("n_active", alias_name="n_active"),
            Sum("n_retained", alias_name="n_retained"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        a = b["n_active"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = b["n_retained"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "week": pc.cast(b["week"], pa.int64()),
                "n_active": pa.array(a, pa.int64()),
                "n_retained": pa.array(r, pa.int64()),
                "n_churned": pa.array(a - r, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_CHURN_WEEKLY_USERS = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS week
  FROM events)
SELECT a.week, count(*) AS n_active,
       CAST(count(b.user_id) AS BIGINT) AS n_retained,
       CAST(count(*) - count(b.user_id) AS BIGINT) AS n_churned
FROM uw a LEFT JOIN uw b
  ON b.user_id = a.user_id AND b.week = a.week + 1
GROUP BY 1
"""


REGISTRY.update(
    {
        "benford_orders": (q_benford_orders, SQL_BENFORD_ORDERS),
        "top2_gap_parts": (q_top2_gap_parts, SQL_TOP2_GAP_PARTS),
        "cohort_ltv_users": (q_cohort_ltv_users, SQL_COHORT_LTV_USERS),
        "churn_weekly_users": (
            q_churn_weekly_users,
            SQL_CHURN_WEEKLY_USERS,
        ),
    }
)


# ------------------------------------ telemetry dedup / rolling distinct


def q_dedup_events_window(sf_dir: str):
    """Telemetry near-duplicate suppression (the at-least-once
    ingestion cleanup): an event is a duplicate when the PREVIOUS
    event of the same (user, type) lies strictly less than 5 s
    earlier (lag semantics — deterministic, unlike chained
    suppression). Per-user groups lexsort once by (type, ts,
    event_id); the lag test is one vectorized diff. Output: kept-row
    counts per event type (kept = first in its burst under lag
    semantics)."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    FIVE_S = np.int64(5_000_000)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        typ = g["event_type"].to_numpy()
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, t, typ))
        st, styp = t[order], typ[order]
        same = np.zeros(len(st), bool)
        same[1:] = styp[1:] == styp[:-1]
        dup = same & (np.diff(st, prepend=st[:1]) < FIVE_S)
        keep_typ = styp[~dup]
        u, cnt = np.unique(keep_typ, return_counts=True)
        return pd.DataFrame({"event_type": u, "n": cnt.astype(np.int64)})

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_kept"))
    )


SQL_DEDUP_EVENTS_WINDOW = """
WITH l AS (
  SELECT event_type,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts,
         ts
  FROM events)
SELECT event_type, count(*) AS n_kept
FROM l
WHERE prev_ts IS NULL OR ts - prev_ts >= INTERVAL 5 SECOND
GROUP BY 1
"""


def q_wau_users(sf_dir: str):
    """Rolling distinct users (the DAU/WAU engagement shape): for
    every calendar day with events, the count of users active that
    day (DAU) and in the trailing 7 days (WAU). Naive rolling
    COUNT(DISTINCT) re-counts every user x day; instead each user's
    active-day set becomes merged coverage INTERVALS (gap <= 6 days
    fuses), which emit +1/-1 diff rows — the exchange carries
    interval endpoints, not user-day pairs, and the finisher is one
    day-bounded cumulative sum. DAU rides the same exchange as
    per-day distinct partials."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    DAY = np.int64(86_400_000_000)

    def pairs(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.stack([u, t // DAY], axis=1)
        uk = np.unique(key, axis=0)
        return pa.table(
            {
                "user_id": pa.array(uk[:, 0], pa.int64()),
                "day": pa.array(uk[:, 1], pa.int64()),
            }
        )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["day"].to_numpy(np.int64))
        # merge [d, d+6] windows: a gap > 6 starts a new interval
        brk = np.ones(len(d), bool)
        brk[1:] = np.diff(d) > 6
        starts = d[brk]
        ends = np.append(d[np.flatnonzero(brk)[1:] - 1], d[-1]) + 7
        # diff rows: +1 at interval start, -1 at end (exclusive)
        day = np.concatenate([starts, ends])
        delta = np.concatenate(
            [np.ones(len(starts), np.int64), -np.ones(len(ends), np.int64)]
        )
        # DAU partials ride along: +1 on each active day
        day = np.concatenate([day, d])
        kind = np.concatenate(
            [np.zeros(len(delta), np.int64), np.ones(len(d), np.int64)]
        )
        delta = np.concatenate([delta, np.ones(len(d), np.int64)])
        return pd.DataFrame({"day": day, "kind": kind, "delta": delta})

    agg = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["day", "kind"])
        .aggregate(Sum("delta", alias_name="delta"))
        .to_pandas()  # day-bounded: |days| x 2 rows
    )
    # cumulative sum of kind-0 diffs over ALL days; report only days
    # that actually have events (kind-1 rows)
    days = np.unique(agg["day"].to_numpy(np.int64))
    wau = np.zeros(len(days), np.int64)
    k0 = agg[agg["kind"] == 0]
    np.add.at(
        wau,
        np.searchsorted(days, k0["day"].to_numpy(np.int64)),
        k0["delta"].to_numpy(np.int64),
    )
    wau = np.cumsum(wau)
    k1 = agg[agg["kind"] == 1].sort_values("day")
    dau_days = k1["day"].to_numpy(np.int64)
    out_day = pd.to_datetime(dau_days * DAY, unit="us").strftime(
        "%Y-%m-%d"
    )
    return pd.DataFrame(
        {
            "day": out_day,
            "n_dau": k1["delta"].to_numpy(np.int64),
            "n_wau": wau[np.searchsorted(days, dau_days)],
        }
    )


SQL_WAU_USERS = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
  FROM events),
d AS (SELECT DISTINCT day FROM ud)
SELECT strftime(make_timestamp(d.day * 86400000000), '%Y-%m-%d') AS day,
       (SELECT count(DISTINCT u.user_id) FROM ud u
        WHERE u.day = d.day) AS n_dau,
       (SELECT count(DISTINCT u.user_id) FROM ud u
        WHERE u.day BETWEEN d.day - 6 AND d.day) AS n_wau
FROM d
"""


REGISTRY.update(
    {
        "dedup_events_window": (
            q_dedup_events_window,
            SQL_DEDUP_EVENTS_WINDOW,
        ),
        "wau_users": (q_wau_users, SQL_WAU_USERS),
    }
)


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


REGISTRY.update(
    {
        "merge_upsert_orders": (
            q_merge_upsert_orders,
            SQL_MERGE_UPSERT_ORDERS,
        ),
        "zorder_orders": (q_zorder_orders, SQL_ZORDER_ORDERS),
    }
)


# --------------------------------------- streaks / mix shift


def q_streaks_users(sf_dir: str):
    """Gaps-and-islands (the consecutive-activity streak shape): per
    user, the longest run of CONSECUTIVE active days and how many
    distinct runs (islands) the activity splits into. (user, day)
    pairs dedup in batch before ONE exchange; inside the user-bounded
    finalizer the island decomposition is one diff over the sorted
    unique days — the day - row_number() trick without the window
    function."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    DAY = np.int64(86_400_000_000)

    def pairs(b: pa.Table) -> pa.Table:
        t = (
            b["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.stack([u, t // DAY], axis=1)
        uk = np.unique(key, axis=0)
        return pa.table(
            {
                "user_id": pa.array(uk[:, 0], pa.int64()),
                "day": pa.array(uk[:, 1], pa.int64()),
            }
        )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g["day"].to_numpy(np.int64))
        brk = np.ones(len(d), bool)
        brk[1:] = np.diff(d) > 1
        starts = np.flatnonzero(brk)
        lens = np.diff(np.append(starts, len(d)))
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "longest_streak": [int(lens.max())],
                "n_islands": [int(len(starts))],
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


SQL_STREAKS_USERS = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
  FROM events),
isl AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM ud),
runs AS (
  SELECT user_id, grp, count(*) AS len
  FROM isl GROUP BY 1, 2)
SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
       count(*) AS n_islands
FROM runs GROUP BY 1
"""


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


REGISTRY.update(
    {
        "streaks_users": (q_streaks_users, SQL_STREAKS_USERS),
        "mix_shift_segments": (
            q_mix_shift_segments,
            SQL_MIX_SHIFT_SEGMENTS,
        ),
    }
)


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


REGISTRY.update(
    {
        "q7_volume": (q_q7_volume, SQL_Q7_VOLUME),
        "q9_profit": (q_q9_profit, SQL_Q9_PROFIT),
        "q10_returns": (q_q10_returns, SQL_Q10_RETURNS),
        "q13_custdist": (q_q13_custdist, SQL_Q13_CUSTDIST),
        "q14_promo": (q_q14_promo, SQL_Q14_PROMO),
        "q15_top_supplier": (q_q15_top_supplier, SQL_Q15_TOP_SUPPLIER),
        "q17_small_qty": (q_q17_small_qty, SQL_Q17_SMALL_QTY),
        "q19_disjunct": (q_q19_disjunct, SQL_Q19_DISJUNCT),
    }
)


# ------------------------------------------- streaming-state shapes (cont.)


def q_cume_distinct_users(sf_dir: str):
    """Running COUNT(DISTINCT) — for every user's active hour, how
    many distinct event types the user has seen up to and including
    that hour (the classic cumulative-cardinality window, which SQL
    windows cannot express directly; the oracle uses the
    first-occurrence + inequality-join decomposition). Per-batch
    distinct (user, hour, type) triples shrink the exchange to the
    active-cell count; ONE user-bucketed exchange; per bucket the
    count is a packed-key double searchsorted — no per-user loop.
    Hour numbers rebased from epoch stay < 2^21, so (user << 21 | hr)
    packs collision-free for user ids < 2^42."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])
    HOUR_US = 3_600_000_000

    def pre(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hr = (
            b["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        ) // HOUR_US
        t = b["event_type"].to_numpy(zero_copy_only=False)
        tu, tcode = np.unique(t, return_inverse=True)
        df = pd.DataFrame(
            {"user_id": u, "hr": hr, "event_type": tu[tcode]}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "hr", "event_type"])
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "hr": pd.Series(dtype="str"),
                    "n_types": pd.Series(dtype="int64"),
                }
            )
        u = g["user_id"].to_numpy(np.int64)
        hr = g["hr"].to_numpy(np.int64)
        base = hr.min()
        hr0 = hr - base
        assert hr0.max() < (1 << 21), "hour span exceeds pack width"
        # first hour per (user, type)
        ft = g.groupby(["user_id", "event_type"], sort=False)["hr"].min()
        fu = ft.index.get_level_values(0).to_numpy(np.int64)
        fh = ft.to_numpy(np.int64) - base
        fpack = np.sort((fu << 21) | fh)
        # active cells (user, hour)
        cells = pd.DataFrame({"u": u, "h": hr0}).drop_duplicates()
        cu = cells["u"].to_numpy(np.int64)
        chh = cells["h"].to_numpy(np.int64)
        n = np.searchsorted(fpack, (cu << 21) | chh, side="right") - np.searchsorted(
            fpack, cu << 21, side="left"
        )
        hrs = ((chh + base) * HOUR_US).astype("datetime64[us]")
        return pd.DataFrame(
            {
                "user_id": cu,
                "hr": pd.Series(hrs).dt.strftime("%Y-%m-%d %H"),
                "n_types": n.astype(np.int64),
            }
        )

    return _by_user_bucket(
        ds.map_batches(pre, batch_format="pyarrow")
    ).map_groups(per_bucket, batch_format="pandas")


SQL_CUME_DISTINCT_USERS = """
WITH d AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr
           FROM events),
f AS (SELECT user_id, event_type, min(date_trunc('hour', ts)) AS fhr
      FROM events GROUP BY 1, 2)
SELECT d.user_id, strftime(d.hr, '%Y-%m-%d %H') AS hr,
       count(*) AS n_types
FROM d JOIN f ON f.user_id = d.user_id AND f.fhr <= d.hr
GROUP BY 1, 2
"""


def q_interarrival_events(sf_dir: str):
    """Exact inter-arrival-time order statistics per event type: the
    gap from each event to the SAME user's next event (any type),
    attributed to the earlier event's type; per type the exact
    discrete p50/p90 (element at floor(q*(n-1)) of the sorted gaps —
    no interpolation, so int64 microseconds stay exact end to end).
    Exchange 1 buckets by user (gaps need per-user order); exchange 2
    groups the 5 types, each group one numpy sort (the documented
    quantiles_group task-size contract)."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(u) < 2:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="str"),
                    "gap_us": pd.Series(dtype="int64"),
                }
            )
        same = u[1:] == u[:-1]
        gap = (t[1:] - t[:-1])[same]
        et = g["event_type"].to_numpy()[:-1][same]
        return pd.DataFrame({"event_type": et, "gap_us": gap})

    gds = _by_user_bucket(ds).map_groups(gaps, batch_format="pandas")

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["gap_us"].to_numpy(np.int64))
        n = len(v)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [n],
                "p50_us": [int(v[(n - 1) // 2])],
                "p90_us": [int(v[((n - 1) * 9) // 10])],
            }
        )

    return gds.groupby("event_type").map_groups(stats, batch_format="pandas")


SQL_INTERARRIVAL_EVENTS = """
WITH s AS (
  SELECT event_type,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
           - epoch_us(ts) AS gap
  FROM events),
g AS (SELECT event_type, gap FROM s WHERE gap IS NOT NULL),
r AS (SELECT event_type, gap,
             row_number() OVER (PARTITION BY event_type ORDER BY gap) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM g)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       CAST(max(CASE WHEN rn - 1 = (n - 1) // 2 THEN gap END) AS BIGINT)
         AS p50_us,
       CAST(max(CASE WHEN rn - 1 = ((n - 1) * 9) // 10 THEN gap END)
            AS BIGINT) AS p90_us
FROM r GROUP BY 1
"""


REGISTRY.update(
    {
        "cume_distinct_users": (q_cume_distinct_users, SQL_CUME_DISTINCT_USERS),
        "interarrival_events": (q_interarrival_events, SQL_INTERARRIVAL_EVENTS),
    }
)


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


def _ring_chord_edges_ds(sf_dir: str):
    """The deterministic ring+chord digraph on customer keys shared
    by the pagerank/bfs/kcore family (see q_pagerank docstring)."""
    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring_dst = (c + 1) % n
        ch = c[c % 3 == 0]
        ch_dst = (ch * 7 + 3) % n
        keep = ch_dst != (ch + 1) % n
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, ch[keep]]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([ring_dst, ch_dst[keep]]), pa.int64()
                ),
            }
        )

    return cust.map_batches(edges, batch_format="pyarrow"), n


def q_reciprocal_edges(sf_dir: str):
    """Edge reciprocity of the house digraph — the fraction of
    directed edges whose reverse edge also exists (a standard
    social-graph health metric). Each edge lands in the bucket of its
    UNORDERED pair key, so both directions of a pair always meet in
    the same group after ONE coarse exchange; within a bucket a
    packed-uint64 sort + run-length scan marks pairs seen in both
    orientations. Integer basis points — no float anywhere."""
    from ..functions.hashing import splitmix64

    eds, _n = _ring_chord_edges_ds(sf_dir)
    B = 64

    def bucketize(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        pairk = (lo << np.uint64(32)) | hi
        bucket = (splitmix64(pairk) % np.uint64(B)).astype(np.int64)
        fwd = (s <= d).astype(np.uint64)  # orientation bit
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "pairk": pa.array(pairk.astype(np.int64)),
                "fwd": pa.array(fwd.astype(np.int64)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pk = g["pairk"].to_numpy(np.int64)
        fw = g["fwd"].to_numpy(np.int64)
        order = np.argsort(pk, kind="mergesort")
        pk, fw = pk[order], fw[order]
        brk = np.empty(len(pk), dtype=bool)
        if len(pk):
            brk[0] = True
            brk[1:] = pk[1:] != pk[:-1]
        grp = np.cumsum(brk) - 1
        both = np.zeros(grp[-1] + 1 if len(pk) else 0, np.int64)
        has_f = np.zeros_like(both)
        has_b = np.zeros_like(both)
        np.maximum.at(has_f, grp, fw)
        np.maximum.at(has_b, grp, 1 - fw)
        both = has_f & has_b
        n_edges = len(pk)
        n_recip = int(np.bincount(grp)[both.astype(bool)].sum()) if len(pk) else 0
        return pd.DataFrame({"n_edges": [n_edges], "n_recip": [n_recip]})

    parts = (
        eds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    n_edges = int(parts["n_edges"].sum())
    n_recip = int(parts["n_recip"].sum())
    return pd.DataFrame(
        {
            "n_edges": [n_edges],
            "n_reciprocal": [n_recip],
            "recip_bp": [n_recip * 10000 // n_edges],
        }
    )


SQL_RECIPROCAL_EDGES = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM nn) AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey, (7 * c_custkey + 3) % (SELECT n FROM nn)
  FROM customer
  WHERE c_custkey % 3 = 0
    AND (7 * c_custkey + 3) % (SELECT n FROM nn)
        <> (c_custkey + 1) % (SELECT n FROM nn)
),
r AS (
  SELECT count(*) AS n_recip
  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
)
SELECT (SELECT count(*) FROM e) AS n_edges,
       (SELECT n_recip FROM r) AS n_reciprocal,
       CAST((SELECT n_recip FROM r) * 10000
            // (SELECT count(*) FROM e) AS BIGINT) AS recip_bp
"""


def q_indegree_hist(sf_dir: str):
    """In-degree distribution of the house digraph (the two-phase
    count-then-histogram shape over graph edges — q13's pattern on a
    graph): per-dst counts after ONE exchange of per-batch partials,
    then a count-bounded histogram. All nodes have the ring in-edge,
    so the zero bucket is structurally empty and both engines omit
    it."""
    eds, _n = _ring_chord_edges_ds(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"dst": pa.array(u, pa.int64()), "n": pa.array(cnt.astype(np.int64))}
        )

    counts = (
        eds.map_batches(partial, batch_format="pyarrow")
        .groupby("dst")
        .aggregate(Sum("n", alias_name="indeg"))
    )

    def hist(b: pa.Table) -> pa.Table:
        c = b["indeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table(
            {
                "indeg": pa.array(u, pa.int64()),
                "n_nodes": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        counts.map_batches(hist, batch_format="pyarrow")
        .groupby("indeg")
        .aggregate(Sum("n_nodes", alias_name="n_nodes"))
    )


SQL_INDEGREE_HIST = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM nn) AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey, (7 * c_custkey + 3) % (SELECT n FROM nn)
  FROM customer
  WHERE c_custkey % 3 = 0
    AND (7 * c_custkey + 3) % (SELECT n FROM nn)
        <> (c_custkey + 1) % (SELECT n FROM nn)
),
d AS (SELECT dst, count(*) AS indeg FROM e GROUP BY dst)
SELECT indeg, count(*) AS n_nodes FROM d GROUP BY indeg
"""


REGISTRY.update(
    {
        "ols_multi_lineitem": (q_ols_multi_lineitem, SQL_OLS_MULTI_LINEITEM),
        "reciprocal_edges": (q_reciprocal_edges, SQL_RECIPROCAL_EDGES),
        "indegree_hist": (q_indegree_hist, SQL_INDEGREE_HIST),
    }
)


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


def _date_us(col) -> np.ndarray:
    return (
        col.to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )


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


REGISTRY.update(
    {
        "q4_priority": (q_q4_priority, SQL_Q4_PRIORITY),
        "q6_selective": (q_q6_selective, SQL_Q6_SELECTIVE),
        "q8_market_share": (q_q8_market_share, SQL_Q8_MARKET_SHARE),
        "q12_late_lines": (q_q12_late_lines, SQL_Q12_LATE_LINES),
        "q21_waiting": (q_q21_waiting, SQL_Q21_WAITING),
    }
)


# ------------------------------------------------ model-eval / graph stats


def q_auc_events(sf_dir: str):
    """ROC-AUC of `value` as a score for predicting purchase events —
    the Mann-Whitney closed form over the score HISTOGRAM, not the
    row set: scores quantize exactly to cents, per-batch partial
    (cents -> pos/neg counts) fold through ONE bounded exchange
    (vocabulary = distinct prices, not rows), and the tie-aware
    rank-sum
        num = sum_v pos_v * (2 * neg_below_v + neg_v)
    accumulates in exact int64 on the sorted histogram. AUC =
    num / (2*P*N) is the single float division, identical operands in
    both engines (ties count 1/2 via the 2x scaling)."""
    ev = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        is_pos = (
            b["event_type"].to_numpy(zero_copy_only=False) == "purchase"
        ).astype(np.int64)
        u, inv = np.unique(cents, return_inverse=True)
        return pa.table(
            {
                "c": pa.array(u, pa.int64()),
                "pos": pa.array(np.bincount(inv, weights=is_pos).astype(np.int64)),
                "neg": pa.array(
                    np.bincount(inv, weights=1 - is_pos).astype(np.int64)
                ),
            }
        )

    h = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum("pos", alias_name="pos"), Sum("neg", alias_name="neg"))
        .to_pandas()
        .sort_values("c", kind="mergesort")
    )
    pos = h["pos"].to_numpy(np.int64)
    neg = h["neg"].to_numpy(np.int64)
    cumneg = np.concatenate([[0], np.cumsum(neg)[:-1]])
    num = int((pos * (2 * cumneg + neg)).sum())
    P, N = int(pos.sum()), int(neg.sum())
    return pd.DataFrame({"auc": [round(num / (2 * P * N), 6)]})


SQL_AUC_EVENTS = """
WITH h AS (
  SELECT CAST(round(value*100) AS BIGINT) AS c,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos,
         CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS neg
  FROM events GROUP BY 1
),
w AS (
  SELECT pos, neg,
         CAST(COALESCE(sum(neg) OVER
              (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS cumneg
  FROM h
)
SELECT round(CAST(sum(pos * (2*cumneg + neg)) AS BIGINT)
             / (2.0 * (SELECT sum(pos) FROM h) * (SELECT sum(neg) FROM h)),
             6) AS auc
FROM w
"""


def q_assortativity_edges(sf_dir: str):
    """Out-in degree assortativity of the house ring+chord digraph —
    the Pearson correlation, over directed edges, of the source's
    out-degree with the target's in-degree (positive: hubs link to
    hubs). Degrees fold via two grouped counts (node-bounded),
    broadcast as sorted arrays; ONE edge scan then folds the six
    Pearson sums as exact int64 partials, and the only float math is
    the final r on identical operands."""
    eds, _n = _ring_chord_edges_ds(sf_dir)
    eds = eds.materialize()
    od = eds.groupby("src").aggregate(Count(alias_name="d")).to_pandas()
    idg = eds.groupby("dst").aggregate(Count(alias_name="d")).to_pandas()
    ok_ = np.sort(od["src"].to_numpy(np.int64))
    odeg = od.set_index("src")["d"].loc[ok_].to_numpy(np.int64)
    ik = np.sort(idg["dst"].to_numpy(np.int64))
    ideg = idg.set_index("dst")["d"].loc[ik].to_numpy(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        dx = odeg[np.searchsorted(ok_, s)]
        dy = ideg[np.searchsorted(ik, d)]
        return pa.table(
            {
                "m": pa.array([len(s)], pa.int64()),
                "sx": pa.array([int(dx.sum())], pa.int64()),
                "sy": pa.array([int(dy.sum())], pa.int64()),
                "sxx": pa.array([int((dx * dx).sum())], pa.int64()),
                "syy": pa.array([int((dy * dy).sum())], pa.int64()),
                "sxy": pa.array([int((dx * dy).sum())], pa.int64()),
            }
        )

    t = eds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    m, sx, sy = int(t["m"]), int(t["sx"]), int(t["sy"])
    sxx, syy, sxy = int(t["sxx"]), int(t["syy"]), int(t["sxy"])
    import math

    r = (m * sxy - sx * sy) / math.sqrt(
        float(m * sxx - sx * sx) * float(m * syy - sy * sy)
    )
    return pd.DataFrame({"assortativity": [round(r, 6)]})


SQL_ASSORTATIVITY_EDGES = """
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM nn) AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey, (7 * c_custkey + 3) % (SELECT n FROM nn)
  FROM customer
  WHERE c_custkey % 3 = 0
    AND (7 * c_custkey + 3) % (SELECT n FROM nn)
        <> (c_custkey + 1) % (SELECT n FROM nn)
),
od AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
idg AS (SELECT dst, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY dst),
j AS (SELECT od.d AS dx, idg.d AS dy
      FROM e JOIN od ON e.src = od.src JOIN idg ON e.dst = idg.dst),
s AS (SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
             CAST(sum(dx*dx) AS BIGINT) AS sxx,
             CAST(sum(dy*dy) AS BIGINT) AS syy,
             CAST(sum(dx*dy) AS BIGINT) AS sxy
      FROM j)
SELECT round((m*sxy - sx*sy)
             / sqrt((m*sxx - sx*sx) * 1.0 * (m*syy - sy*sy)), 6)
         AS assortativity
FROM s
"""


def q_acf_hours(sf_dir: str):
    """Sample autocorrelation of the hourly event-count series at lags
    1..24 (the seasonality fingerprint behind the anomaly/seasonal
    queries). The DISTRIBUTED part is the count fold: per-batch
    (hour -> n) partials through one hour-bounded exchange; the
    zero-filled grid (calendar hours between min and max — bounded by
    time span, not data volume) then yields, per lag, the six Pearson
    sums in exact int64, floats only in the final r per lag with
    identical operands in both engines."""
    ev = _pq(sf_dir, "events", ["ts"])
    HOUR = 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        h = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64) // HOUR
        u, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {"h": pa.array(u, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    hc = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    h = hc["h"].to_numpy(np.int64)
    lo, hi = int(h.min()), int(h.max())
    c = np.zeros(hi - lo + 1, np.int64)
    c[h - lo] = hc["n"].to_numpy(np.int64)
    import math

    out = []
    for lag in range(1, 25):
        x, y = c[:-lag], c[lag:]
        m = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        sxy = int((x * y).sum())
        r = (m * sxy - sx * sy) / math.sqrt(
            float(m * sxx - sx * sx) * float(m * syy - sy * sy)
        )
        out.append((lag, round(r, 6)))
    return pd.DataFrame(out, columns=["lag", "acf"])


SQL_ACF_HOURS = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
bt AS (
  SELECT CAST(epoch(h - (SELECT min(h) FROM b)) AS BIGINT) // 3600 AS t, c
  FROM b
),
grid AS (
  SELECT COALESCE(bt.c, 0) AS c, gs.t
  FROM (SELECT unnest(generate_series(
          0,
          (SELECT CAST(epoch(max(h) - min(h)) AS BIGINT) // 3600 FROM b)))
          AS t) gs
  LEFT JOIN bt ON bt.t = gs.t
),
l AS (
  SELECT k.lag, a.c AS x, y.c AS y
  FROM grid a
  JOIN (SELECT unnest(generate_series(1, 24)) AS lag) k ON TRUE
  JOIN grid y ON y.t = a.t + k.lag
),
s AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
         CAST(sum(x*y) AS BIGINT) AS sxy
  FROM l GROUP BY lag
)
SELECT lag, round((m*sxy - sx*sy)
                  / sqrt((m*sxx - sx*sx) * 1.0 * (m*syy - sy*sy)), 6) AS acf
FROM s
"""


REGISTRY.update(
    {
        "auc_events": (q_auc_events, SQL_AUC_EVENTS),
        "assortativity_edges": (q_assortativity_edges, SQL_ASSORTATIVITY_EDGES),
        "acf_hours": (q_acf_hours, SQL_ACF_HOURS),
    }
)


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


REGISTRY.update(
    {"nb_classify_docs": (q_nb_classify_docs, SQL_NB_CLASSIFY_DOCS)}
)


# ------------------------------------------- streaming / profiling (cont.)


def q_late_arrivals(sf_dir: str):
    """Watermark late-data accounting — the streaming-ingest health
    metric: processing events in ARRIVAL order (event_id), the
    watermark is the running max event-time seen so far; an event is
    LATE if its own timestamp is more than 10 minutes behind the
    watermark at arrival. Same two-phase ordered-scan plan as
    global_rownum: per-arrival-range partials (max ts per event_id
    range bucket) fold to an exclusive prefix max on the driver
    (bucket-bounded), then per-bucket groups resolve lateness with a
    local shifted cummax against the broadcast incoming watermark —
    the fact stream is never globally sorted in one task."""
    ds = _pq(sf_dir, "events", ["event_id", "ts", "event_type"])
    W = 1000  # arrival-range bucket width (contiguous event_id ranges)
    LATE_US = 10 * 60 * 1_000_000

    def pre(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64)
        return pa.table(
            {
                "wb": pa.array(eid // W, pa.int64()),
                "event_id": pa.array(eid),
                "t": pa.array(t),
                "event_type": b["event_type"],
            }
        )

    pds = ds.map_batches(pre, batch_format="pyarrow").materialize()

    def mx_partial(b: pa.Table) -> pa.Table:
        wb = b["wb"].to_numpy(zero_copy_only=False)
        t = b["t"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(wb, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, t)
        return pa.table(
            {"wb": pa.array(u, pa.int64()), "mx": pa.array(mx, pa.int64())}
        )

    mx = (
        pds.map_batches(mx_partial, batch_format="pyarrow")
        .groupby("wb")
        .max("mx")
        .to_pandas()
        .sort_values("wb")
    )
    wbs = mx["wb"].to_numpy(np.int64)
    # exclusive prefix max: the watermark ENTERING each bucket
    run = np.maximum.accumulate(mx["max(mx)"].to_numpy(np.int64))
    base = np.r_[np.iinfo(np.int64).min, run[:-1]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="mergesort")
        t = g["t"].to_numpy(np.int64)
        b0 = int(base[np.searchsorted(wbs, int(g["wb"].iloc[0]))])
        cm = np.maximum.accumulate(t)
        wm = np.r_[b0, np.maximum(cm[:-1], b0)]
        late = (wm != np.iinfo(np.int64).min) & (t < wm - LATE_US)
        df = pd.DataFrame({"event_type": g["event_type"], "late": late})
        out = (
            df.groupby("event_type", sort=False)
            .agg(n_total=("late", "size"), n_late=("late", "sum"))
            .reset_index()
        )
        out["n_late"] = out["n_late"].astype(np.int64)
        return out

    part = (
        pds.groupby("wb")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_late", alias_name="n_late"),
        )
    )
    return part


SQL_LATE_ARRIVALS = """
WITH w AS (
  SELECT event_type, ts,
         max(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN wm IS NOT NULL
                      AND ts < wm - INTERVAL 10 MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM w GROUP BY event_type
"""


def q_entropy_users(sf_dir: str):
    """Per-user behavioral entropy (Shannon entropy of the user's
    event-type mix — the engagement-diversity curation feature).
    Integer-exact end to end via the microlog contract: per-batch
    (user, type) count partials fold through one exchange; within
    hash(user)-bucketed groups the per-type terms c*round(ln(c/n)*1e6)
    accumulate as int64 (math.log per DISTINCT (user,type) row — libm,
    matching DuckDB's ln ulp-for-ulp, never numpy's SIMD log), and the
    single float division happens on identical operands."""
    import math

    from ..functions.hashing import splitmix64

    ev = _pq(sf_dir, "events", ["user_id", "event_type"])

    def cnt_partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "user_id": b["user_id"].to_numpy(zero_copy_only=False),
                    "event_type": b["event_type"].to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ev.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("c", alias_name="c"))
    )
    B = 64

    def bucketize(b: pa.Table) -> pa.Table:
        from ..functions.hashing import hash_strings

        h = hash_strings(
            b["user_id"].to_numpy(zero_copy_only=False).astype("U")
        )
        return b.append_column(
            "bucket", pa.array((h % np.uint64(B)).astype(np.int64))
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("user_id", kind="mergesort")
        n = g.groupby("user_id", sort=False)["c"].transform("sum").to_numpy(
            np.int64
        )
        c = g["c"].to_numpy(np.int64)
        micro = np.fromiter(
            (round(math.log(ci / ni) * 1e6) for ci, ni in zip(c, n)),
            np.int64,
            len(c),
        )
        term = c * micro
        out = pd.DataFrame(
            {"user_id": g["user_id"], "n": n, "term": term}
        ).groupby(["user_id", "n"], sort=False)["term"].sum().reset_index()
        # floor-quantize: -term/(n*1e6) can land EXACTLY on a
        # .0000005 boundary (term, n are exact ints), where numpy's
        # half-even and DuckDB's half-away disagree
        x = -out["term"] / (out["n"] * 1_000_000.0)
        out["entropy"] = np.floor(x * 1e6) / 1e6
        return out[["user_id", "entropy"]]

    return (
        counts.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


SQL_ENTROPY_USERS = """
WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
n AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1)
SELECT c.user_id,
       floor((-sum(c.c * CAST(round(ln(c.c * 1.0 / n.n) * 1000000)
                              AS BIGINT))
              / (n.n * 1000000.0)) * 1000000) / 1000000 AS entropy
FROM c JOIN n USING (user_id)
GROUP BY c.user_id, n.n
"""


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


REGISTRY.update(
    {
        "late_arrivals": (q_late_arrivals, SQL_LATE_ARRIVALS),
        "entropy_users": (q_entropy_users, SQL_ENTROPY_USERS),
        "cube_agg": (q_cube_agg, SQL_CUBE_AGG),
    }
)


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


def q_pareto_users(sf_dir: str):
    """Revenue concentration — the smallest number of users covering
    >= 80% of purchase revenue (the whale-curve metric). The
    distributed part is the per-user cent fold (ONE exchange,
    user-bounded output); the ordered 80% scan then runs on that
    bounded table with the integer test 5*cum >= 4*total — no float
    anywhere in the decision. Beyond a driver-sized user table the
    scan becomes the value-bucketed ordered-prefix plan
    (rank_global_orders) — documented, not needed at house scale.
    Output: (n_users, covered_cents, total_cents), all exact ints."""
    ev = _pq(sf_dir, "events", ["user_id", "event_type", "value"])

    def cents_partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b["event_type"], "purchase")
        t = b.filter(m)
        cents = np.rint(
            t["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(uu),
                "cents": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
            }
        )

    per_user = (
        ev.map_batches(cents_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values(["cents", "user_id"], ascending=[False, True],
                     kind="mergesort")
    )
    cents = per_user["cents"].to_numpy(np.int64)
    total = int(cents.sum())
    cum = np.cumsum(cents)
    k = int(np.searchsorted(5 * cum, 4 * total, side="left")) + 1
    return pd.DataFrame(
        {
            "n_users": [k],
            "covered_cents": [int(cum[k - 1])],
            "total_cents": [total],
        }
    )


SQL_PARETO_USERS = """
WITH pu AS (
  SELECT user_id,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
o AS (
  SELECT cents,
         CAST(sum(cents) OVER (ORDER BY cents DESC, user_id) AS BIGINT)
           AS cum,
         row_number() OVER (ORDER BY cents DESC, user_id) AS rn
  FROM pu
),
t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM pu)
SELECT CAST(min(rn) AS BIGINT) AS n_users,
       CAST(min_by(cum, rn) AS BIGINT) AS covered_cents,
       (SELECT total FROM t) AS total_cents
FROM o WHERE 5 * cum >= 4 * (SELECT total FROM t)
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


REGISTRY.update(
    {
        "stopwords_corpus": (q_stopwords_corpus, SQL_STOPWORDS_CORPUS),
        "lexical_diversity_docs": (
            q_lexical_diversity_docs,
            SQL_LEXICAL_DIVERSITY_DOCS,
        ),
        "pareto_users": (q_pareto_users, SQL_PARETO_USERS),
        "vocab_coverage_docs": (q_vocab_coverage_docs, SQL_VOCAB_COVERAGE_DOCS),
    }
)


# ------------------------------------------- calibration / shares / dedup


def q_calibration_bins(sf_dir: str):
    """Score-calibration curve — events ranked globally by
    (value, event_id), cut into 10 equal rank bins (bin =
    rank*10 // N, stated identically in the SQL), purchase rate per
    bin. Global ranking uses the range-bucketed ordered-scan plan
    (per-value-range counts fold to an exclusive prefix, local sort
    adds the base) — same contract as global_rownum, keyed on the
    score instead of time. Rates floor-quantize after one division
    on identical integer operands."""
    ev = _pq(sf_dir, "events", ["event_id", "event_type", "value"])
    W = 5000  # cents per range bucket (value domain is bounded)

    def pre(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "wb": pa.array(cents // W, pa.int64()),
                "cents": pa.array(cents),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "is_pos": pa.array(
                    (
                        b["event_type"].to_numpy(zero_copy_only=False)
                        == "purchase"
                    ).astype(np.int64)
                ),
            }
        )

    pds = ev.map_batches(pre, batch_format="pyarrow").materialize()
    n_total = pds.count()

    def cnt_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b["wb"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"wb": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    cnt = (
        pds.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("wb")
        .sum("c")
        .to_pandas()
        .sort_values("wb")
    )
    wbs = cnt["wb"].to_numpy(np.int64)
    base = np.r_[0, np.cumsum(cnt["sum(c)"].to_numpy(np.int64))[:-1]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "event_id"], kind="mergesort")
        b0 = int(base[np.searchsorted(wbs, int(g["wb"].iloc[0]))])
        rank = b0 + np.arange(len(g), dtype=np.int64)
        bin_ = rank * 10 // n_total
        pos = g["is_pos"].to_numpy(np.int64)
        u, inv = np.unique(bin_, return_inverse=True)
        return pd.DataFrame(
            {
                "bin": u,
                "n": np.bincount(inv).astype(np.int64),
                "purchases": np.bincount(inv, weights=pos).astype(np.int64),
            }
        )

    agg = (
        pds.groupby("wb")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("bin")
        .aggregate(
            Sum("n", alias_name="n"), Sum("purchases", alias_name="purchases")
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = b["purchases"].to_numpy(zero_copy_only=False).astype(np.int64)
        rate = np.floor(p / n * 1e6) / 1e6
        return b.append_column("rate", pa.array(rate))

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_CALIBRATION_BINS = """
WITH r AS (
  SELECT event_type,
         row_number() OVER (ORDER BY CAST(round(value*100) AS BIGINT),
                            event_id) - 1 AS rn
  FROM events
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
SELECT CAST(rn * 10 // (SELECT n FROM n) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS purchases,
       floor(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             * 1.0 / count(*) * 1000000) / 1000000 AS rate
FROM r GROUP BY 1
"""


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


REGISTRY.update(
    {
        "calibration_bins": (q_calibration_bins, SQL_CALIBRATION_BINS),
        "share_hierarchy_nations": (
            q_share_hierarchy_nations,
            SQL_SHARE_HIERARCHY_NATIONS,
        ),
        "dedup_best_docs": (q_dedup_best_docs, SQL_DEDUP_BEST_DOCS),
    }
)


def q_embedding_norms(sf_dir: str):
    """Per-vector L2 norms of the embedding table — the sanity audit
    before any cosine stage (un-normalized rows break dot-product
    shortcuts). Components quantize by FLOOR to milli-units so the
    squared sum is an exact int64 (floor of an identical double is
    identical in both engines — no .5-boundary exposure at all);
    sqrt + floor-quantized output on identical operands. Pure
    per-row scan, ZERO exchange."""
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])

    def fn(b: pa.Table) -> pa.Table:
        emb = b["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        offs = emb.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        if offs[0] != 0:
            vals = emb.values.slice(offs[0]).to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            offs = offs - offs[0]
        q = np.floor(vals * 1000.0).astype(np.int64)
        sq = q * q
        n = len(offs) - 1
        d = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        ss = np.bincount(d, weights=sq, minlength=n)  # < 2^53: exact
        norm = np.floor(np.sqrt(ss) / 1000.0 * 1e6) / 1e6
        return pa.table({"vec_id": b["vec_id"], "l2_norm": pa.array(norm)})

    return ds.map_batches(fn, batch_format="pyarrow")


SQL_EMBEDDING_NORMS = """
SELECT vec_id,
       floor(sqrt(CAST(list_sum(list_transform(embedding,
                 x -> CAST(floor(x*1000) AS BIGINT)
                      * CAST(floor(x*1000) AS BIGINT))) AS BIGINT))
             / 1000.0 * 1000000) / 1000000 AS l2_norm
FROM embeddings
"""


REGISTRY.update(
    {"embedding_norms": (q_embedding_norms, SQL_EMBEDDING_NORMS)}
)


def q_mutual_info_events(sf_dir: str):
    """Mutual information between event type and spend decile — the
    feature-relevance score (does WHAT a user does predict HOW MUCH
    they spend?). The contingency table folds as per-batch integer
    partials through one cell-bounded exchange (|types| x 10 cells);
    MI accumulates on the bounded table as
    sum n_ij * round(ln(n_ij*N / (n_i*n_j)) * 1e6) in exact int64
    (microlog contract: math.log per CELL, matching DuckDB's ln), and
    the output divides once on identical operands, floor-quantized.
    Deciles are integer rank bins over (cents, event_id) — the same
    range-bucketed global rank as calibration_bins, restated in SQL."""
    import math

    ev = _pq(sf_dir, "events", ["event_id", "event_type", "value"])
    W = 5000

    def pre(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "wb": pa.array(cents // W, pa.int64()),
                "cents": pa.array(cents),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "event_type": b["event_type"],
            }
        )

    pds = ev.map_batches(pre, batch_format="pyarrow").materialize()
    n_total = pds.count()

    def cnt_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b["wb"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"wb": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    cnt = (
        pds.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("wb")
        .sum("c")
        .to_pandas()
        .sort_values("wb")
    )
    wbs = cnt["wb"].to_numpy(np.int64)
    base = np.r_[0, np.cumsum(cnt["sum(c)"].to_numpy(np.int64))[:-1]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "event_id"], kind="mergesort")
        b0 = int(base[np.searchsorted(wbs, int(g["wb"].iloc[0]))])
        rank = b0 + np.arange(len(g), dtype=np.int64)
        out = pd.DataFrame(
            {"event_type": g["event_type"], "bin": rank * 10 // n_total}
        )
        return (
            out.groupby(["event_type", "bin"], sort=False)
            .size()
            .reset_index(name="n")
        )

    cells = (
        pds.groupby("wb")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["event_type", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n_i = cells.groupby("event_type")["n"].sum()
    n_j = cells.groupby("bin")["n"].sum()
    total = 0
    for t, b_, nij in zip(
        cells["event_type"], cells["bin"], cells["n"].to_numpy(np.int64)
    ):
        ratio = (int(nij) * n_total) / (int(n_i[t]) * int(n_j[b_]))
        total += int(nij) * round(math.log(ratio) * 1e6)
    mi = np.floor(total / (n_total * 1_000_000.0) * 1e6) / 1e6
    return pd.DataFrame({"mi": [mi]})


SQL_MUTUAL_INFO_EVENTS = """
WITH r AS (
  SELECT event_type,
         (row_number() OVER (ORDER BY CAST(round(value*100) AS BIGINT),
                             event_id) - 1) * 10
           // (SELECT count(*) FROM events) AS bin
  FROM events
),
cells AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
          FROM r GROUP BY 1, 2),
ni AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_i
       FROM cells GROUP BY 1),
nj AS (SELECT bin, CAST(sum(n) AS BIGINT) AS n_j FROM cells GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
s AS (
  SELECT CAST(sum(cells.n
               * CAST(round(ln((cells.n * tot.n * 1.0) / (n_i * n_j))
                            * 1000000) AS BIGINT)) AS BIGINT) AS micro
  FROM cells
  JOIN ni USING (event_type) JOIN nj USING (bin) CROSS JOIN tot
)
SELECT floor(micro / ((SELECT n FROM tot) * 1000000.0) * 1000000)
         / 1000000 AS mi
FROM s
"""


REGISTRY.update(
    {"mutual_info_events": (q_mutual_info_events, SQL_MUTUAL_INFO_EVENTS)}
)


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


def q_peak_concurrency_events(sf_dir: str):
    """Sweep-line peak concurrency — treating every event as a
    30-minute activity interval, the maximum number simultaneously
    active and the first instant it happens (capacity planning's
    favorite number). Interval edges (+1 at start, -1 at end; ends
    sort before starts at equal times — half-open intervals) flow
    through the range-bucketed ordered-scan plan: per-time-bucket NET
    sums fold to an exclusive prefix (the carry entering each
    bucket), each bucket resolves its local running max + first time
    hitting it, and the driver combines the bounded per-bucket
    summaries. All integers."""
    ev = _pq(sf_dir, "events", ["ts"])
    DUR = 30 * 60 * 1_000_000
    WB = 6 * 3600 * 1_000_000

    def edges(b: pa.Table) -> pa.Table:
        t = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64)
        tt = np.concatenate([t, t + DUR])
        dd = np.concatenate(
            [np.ones(len(t), np.int64), -np.ones(len(t), np.int64)]
        )
        return pa.table(
            {
                "wb": pa.array(tt // WB, pa.int64()),
                "t": pa.array(tt),
                "d": pa.array(dd),
            }
        )

    eds = ev.map_batches(edges, batch_format="pyarrow").materialize()

    def net_partial(b: pa.Table) -> pa.Table:
        wb = b["wb"].to_numpy(zero_copy_only=False)
        d = b["d"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(wb, return_inverse=True)
        return pa.table(
            {
                "wb": pa.array(u, pa.int64()),
                "net": pa.array(
                    np.bincount(inv, weights=d).astype(np.int64)
                ),
            }
        )

    net = (
        eds.map_batches(net_partial, batch_format="pyarrow")
        .groupby("wb")
        .sum("net")
        .to_pandas()
        .sort_values("wb")
    )
    wbs = net["wb"].to_numpy(np.int64)
    carry = np.r_[0, np.cumsum(net["sum(net)"].to_numpy(np.int64))[:-1]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "d"], kind="mergesort")  # -1 before +1
        c0 = int(carry[np.searchsorted(wbs, int(g["wb"].iloc[0]))])
        run = c0 + np.cumsum(g["d"].to_numpy(np.int64))
        mx = int(run.max())
        at = int(g["t"].to_numpy(np.int64)[int(np.argmax(run))])
        return pd.DataFrame({"peak": [mx], "at_us": [at]})

    parts = (
        eds.groupby("wb")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    peak = int(parts["peak"].max())
    at_us = int(parts.loc[parts["peak"] == peak, "at_us"].min())
    return pd.DataFrame({"peak": [peak], "at_us": [at_us]})


SQL_PEAK_CONCURRENCY_EVENTS = """
WITH e AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS t, 1 AS d FROM events
  UNION ALL
  SELECT CAST(epoch_us(ts + INTERVAL 30 MINUTE) AS BIGINT), -1
  FROM events
),
r AS (
  SELECT t, CAST(sum(d) OVER (ORDER BY t, d
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
  FROM e
),
m AS (SELECT CAST(max(c) AS BIGINT) AS peak FROM r)
SELECT (SELECT peak FROM m) AS peak,
       CAST(min(t) AS BIGINT) AS at_us
FROM r WHERE c = (SELECT peak FROM m)
"""


REGISTRY.update(
    {
        "q1_pricing": (q_q1_pricing, SQL_Q1_PRICING),
        "peak_concurrency_events": (
            q_peak_concurrency_events,
            SQL_PEAK_CONCURRENCY_EVENTS,
        ),
    }
)


def q_scc_nodes(sf_dir: str):
    """Strongly connected components of a planted block digraph over
    the customer keys (stages/graph.py:scc — FW-BW-MIN peeling,
    driver fast path under 5M edges, distributed per-round exchanges
    above). Graph: 12-key blocks, chain c -> c+1 inside the block,
    back edges c -> block-start at offsets 4 and 8 — so each block's
    first (maxb+1) nodes form one SCC (maxb = largest multiple of 4
    present) and the chain tail past the last back edge is singletons.
    The construction has a CLOSED FORM the SQL twin states directly,
    while the engine runs the general algorithm (generic correctness
    pinned vs a transitive-closure brute force in tests/test_scc.py).
    Output (node, scc_id = min member)."""
    from ..stages.graph import scc

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()

    def edges(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = c % 12
        chain = c[(off < 11) & (c + 1 < n)]
        back = c[(off % 4 == 0) & (off > 0)]
        return pa.table(
            {
                "src": pa.array(np.concatenate([chain, back]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([chain + 1, back - (back % 12)]),
                    pa.int64(),
                ),
            }
        )

    return scc(cust.map_batches(edges, batch_format="pyarrow"))


SQL_SCC_NODES = """
WITH k AS (
  SELECT c_custkey AS c, c_custkey // 12 AS b, c_custkey % 12 AS off
  FROM customer
),
bl AS (SELECT b, CAST(max(off) AS BIGINT) AS mx FROM k GROUP BY b)
SELECT c AS node,
       CASE WHEN mx >= 4 AND off <= (mx // 4) * 4
            THEN b * 12 ELSE c END AS scc_id
FROM k JOIN bl USING (b)
"""


REGISTRY.update({"scc_nodes": (q_scc_nodes, SQL_SCC_NODES)})


# ------------------------------------------------ triple-store op oracles


def _cust_triples(sf_dir: str):
    """Customer/nation/region facts as a triple Dataset — the
    relational-table twin of the flagship store, existing so the
    kgquery OPERATORS themselves (two_hop, star_join) get DuckDB
    oracles: the synth-corpus store has model scoring upstream and
    can never be SQL-checked, this one is three joins."""
    nation = _pq(
        sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    region = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nk = np.sort(nation["n_nationkey"].to_numpy(np.int64))
    nname = nation.set_index("n_nationkey")["n_name"].loc[nk].to_numpy()

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"])

    def fn(b: pa.Table) -> pa.Table:
        c = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = nname[
            np.searchsorted(
                nk,
                b["c_nationkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            )
        ]
        seg = b["c_mktsegment"].to_numpy(zero_copy_only=False)
        subj = np.char.add("cust/", c.astype("U"))
        return pa.table(
            {
                "subject": pa.array(
                    np.concatenate([subj, subj]), pa.string()
                ),
                "predicate": pa.array(
                    ["in_nation"] * len(c) + ["in_segment"] * len(c)
                ),
                "object": pa.array(
                    np.concatenate(
                        [np.char.add("nation/", nat.astype("U")), seg]
                    ),
                    pa.string(),
                ),
            }
        )

    nr = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )
    import ray.data as rd

    nation_tbl = pa.table(
        {
            "subject": pa.array(
                ("nation/" + nr["n_name"]).tolist(), pa.string()
            ),
            "predicate": pa.array(["in_region"] * len(nr)),
            "object": pa.array(
                ("region/" + nr["r_name"]).tolist(), pa.string()
            ),
        }
    )
    return cust.map_batches(fn, batch_format="pyarrow").union(
        rd.from_arrow(nation_tbl)
    )


def q_two_hop_customers(sf_dir: str):
    """two_hop over the customer triple store: cust -in_nation-> X
    -in_region-> region (stages/kgquery.py — ONE mid-node-bucketed
    exchange, never a store self-join). The oracle is the plain
    customer |x| nation |x| region join."""
    from ..stages.kgquery import two_hop

    return two_hop(_cust_triples(sf_dir), "in_nation", "in_region")


SQL_TWO_HOP_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS subject,
       'nation/' || n_name AS mid,
       'region/' || r_name AS object
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
"""


def q_star_join_customers(sf_dir: str):
    """star_join over the customer triple store: subjects with BOTH an
    in_segment=BUILDING edge and any in_nation edge — the multi-BGP
    shared-subject SPARQL shape resolved in one subject-keyed
    exchange; the oracle is a WHERE clause."""
    from ..stages.kgquery import star_join

    return star_join(
        _cust_triples(sf_dir),
        {"in_segment": "BUILDING", "in_nation": None},
    )


SQL_STAR_JOIN_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS subject
FROM customer WHERE c_mktsegment = 'BUILDING'
"""


REGISTRY.update(
    {
        "two_hop_customers": (q_two_hop_customers, SQL_TWO_HOP_CUSTOMERS),
        "star_join_customers": (
            q_star_join_customers,
            SQL_STAR_JOIN_CUSTOMERS,
        ),
    }
)


def q_markov_accuracy_events(sf_dir: str):
    """Next-event prediction accuracy of the majority transition
    model — the baseline every sequence model must beat. Per-user
    strictly-adjacent (prev, next) pairs (order = ts, event_id) fold
    through hash(user)-bucketed groups into the |types|^2-bounded
    transition count table; BOTH the model (argmax next per prev,
    ties -> lexicographically first) and its training accuracy read
    off that same table — no second data pass. Integer counts end to
    end, one floor-quantized division."""
    from ..functions.hashing import hash_strings

    ev = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    B = 64

    def pre(b: pa.Table) -> pa.Table:
        h = hash_strings(
            b["user_id"].to_numpy(zero_copy_only=False).astype("U")
        )
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(B)).astype(np.int64)),
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "event_type": b["event_type"],
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        same = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        prev = g["event_type"].to_numpy()[:-1][same]
        nxt = g["event_type"].to_numpy()[1:][same]
        return (
            pd.DataFrame({"prev": prev, "next": nxt})
            .groupby(["prev", "next"], sort=False)
            .size()
            .reset_index(name="n")
        )

    counts = (
        ev.map_batches(pre, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["prev", "next"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    # majority next per prev: max n, ties -> lexicographically first
    counts = counts.sort_values(
        ["prev", "n", "next"], ascending=[True, False, True],
        kind="mergesort",
    )
    maj = counts.drop_duplicates("prev", keep="first")[["prev", "next"]]
    hit = counts.merge(maj, on=["prev", "next"])["n"].sum()
    total = counts["n"].sum()
    acc = np.floor(int(hit) / int(total) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n_pairs": [int(total)],
            "n_correct": [int(hit)],
            "accuracy": [acc],
        }
    )


SQL_MARKOV_ACCURACY_EVENTS = """
WITH p AS (
  SELECT event_type AS prev,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next
  FROM events
),
c AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS n
      FROM p WHERE next IS NOT NULL GROUP BY 1, 2),
m AS (SELECT prev, next FROM
        (SELECT prev, next,
                row_number() OVER (PARTITION BY prev
                                   ORDER BY n DESC, next) AS rn
         FROM c)
      WHERE rn = 1),
s AS (SELECT CAST(sum(c.n) AS BIGINT) AS total,
             CAST(sum(CASE WHEN m.next IS NOT NULL THEN c.n ELSE 0 END)
                  AS BIGINT) AS hit
      FROM c LEFT JOIN m ON c.prev = m.prev AND c.next = m.next)
SELECT total AS n_pairs, hit AS n_correct,
       floor(hit * 1.0 / total * 1000000) / 1000000 AS accuracy
FROM s
"""


REGISTRY.update(
    {
        "markov_accuracy_events": (
            q_markov_accuracy_events,
            SQL_MARKOV_ACCURACY_EVENTS,
        )
    }
)


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


def _stump_user_table(sf_dir: str):
    """Shared feature table for the stump / PR-curve pair: one
    user-keyed exchange of per-batch (spend-cents, purchase-count)
    partials -> (user, x=total cents, y=converted >= 15 purchases)."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        isp = (
            pc.equal(b["event_type"], "purchase")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        us, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "x": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
                "np": pa.array(
                    np.bincount(inv, weights=isp).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("x", alias_name="x"), Sum("np", alias_name="np"))
    )


#: integer-arithmetic threshold grid shared by stump + PR curve
STUMP_BUCKETS = 64
STUMP_THRESH = 15  # conversion rule, matches ab_test_events


def _stump_histogram(sf_dir: str):
    """(thresholds, n_le, pos_le, n_total, pos_total): cumulative
    counts at each of the <= 63 distinct integer value-range
    thresholds t_i = xmin + (i*(xmax-xmin))//B. Two tiny aggregates
    over the user-bounded feature table (global min/max, then
    64-bucket histogram partials) — never a per-user driver collect."""
    from ray.data.aggregate import Max, Min

    # the per-user table is user-bounded (not data-volume-bound), so
    # pinning it is safe at any corpus scale and saves re-running the
    # event fold for the second (histogram) pass
    users = _stump_user_table(sf_dir).materialize()
    mm = users.aggregate(Min("x"), Max("x"))
    xmin, xmax = int(mm["min(x)"]), int(mm["max(x)"])
    i = np.arange(1, STUMP_BUCKETS, dtype=np.int64)
    thr = np.unique(xmin + (i * (xmax - xmin)) // STUMP_BUCKETS)

    def hist_partial(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        y = (
            b["np"].to_numpy(zero_copy_only=False) >= STUMP_THRESH
        ).astype(np.int64)
        bucket = np.searchsorted(thr, x, side="left")
        n = np.bincount(bucket, minlength=len(thr) + 1).astype(np.int64)
        p = np.bincount(
            bucket, weights=y, minlength=len(thr) + 1
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    np.arange(len(thr) + 1, dtype=np.int64)
                ),
                "n": pa.array(n, pa.int64()),
                "p": pa.array(p, pa.int64()),
            }
        )

    h = (
        users.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"), Sum("p", alias_name="p"))
        .to_pandas()
        .sort_values("bucket")
    )
    full_n = np.zeros(len(thr) + 1, np.int64)
    full_p = np.zeros(len(thr) + 1, np.int64)
    full_n[h["bucket"].to_numpy()] = h["n"].to_numpy()
    full_p[h["bucket"].to_numpy()] = h["p"].to_numpy()
    n_le = np.cumsum(full_n)[:-1]  # #{x <= thr[i]}
    pos_le = np.cumsum(full_p)[:-1]
    return thr, n_le, pos_le, int(full_n.sum()), int(full_p.sum())


def q_decision_stump_events(sf_dir: str):
    """Best single-threshold decision stump (the CART/GBDT split
    primitive): does total spend predict conversion (>= 15
    purchases)? Candidate thresholds are the integer value-range grid
    (never data-volume-bound); split quality = summed per-side
    (pos^2 + neg^2)/n — maximizing it minimizes weighted Gini — as
    one float expression mirroring the oracle's tree, ties -> lowest
    threshold. All counts reach the driver as a <= 64-row histogram;
    the per-user fold is the only data-sized exchange."""
    thr, n_le, pos_le, n_tot, pos_tot = _stump_histogram(sf_dir)
    n_l, p_l = n_le, pos_le
    n_r, p_r = n_tot - n_le, pos_tot - pos_le
    keep = (n_l > 0) & (n_r > 0)
    thr, n_l, p_l, n_r, p_r = (
        a[keep] for a in (thr, n_l, p_l, n_r, p_r)
    )
    score = ((p_l * p_l + (n_l - p_l) * (n_l - p_l)) * 1.0) / n_l + (
        (p_r * p_r + (n_r - p_r) * (n_r - p_r)) * 1.0
    ) / n_r
    best = np.lexsort((thr, -score))[0]
    return pd.DataFrame(
        {
            "t_cents": [int(thr[best])],
            "n_left": [int(n_l[best])],
            "pos_left": [int(p_l[best])],
            "n_right": [int(n_r[best])],
            "pos_right": [int(p_r[best])],
            "score": [float(np.floor(score[best] * 1e6) / 1e6)],
        }
    )


_SQL_STUMP_BASE = f"""
u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         CASE WHEN sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) >= {STUMP_THRESH}
              THEN 1 ELSE 0 END AS y
  FROM events GROUP BY user_id
),
mm AS (SELECT min(x) AS lo, max(x) AS hi FROM u),
thr AS (
  SELECT DISTINCT CAST((SELECT lo FROM mm)
         + (i * ((SELECT hi FROM mm) - (SELECT lo FROM mm)))
           // {STUMP_BUCKETS} AS BIGINT) AS t
  FROM generate_series(1, {STUMP_BUCKETS - 1}) g(i)
),
cnt AS (
  SELECT thr.t,
         CAST(count(*) FILTER (u.x <= thr.t) AS BIGINT) AS n_l,
         CAST(sum(u.y) FILTER (u.x <= thr.t) AS BIGINT) AS p_l,
         CAST(count(*) FILTER (u.x > thr.t) AS BIGINT) AS n_r,
         CAST(sum(u.y) FILTER (u.x > thr.t) AS BIGINT) AS p_r
  FROM thr CROSS JOIN u GROUP BY thr.t
)"""


SQL_DECISION_STUMP_EVENTS = (
    "WITH "
    + _SQL_STUMP_BASE
    + """
SELECT t AS t_cents, n_l AS n_left, p_l AS pos_left,
       n_r AS n_right, p_r AS pos_right,
       floor(((p_l * p_l + (n_l - p_l) * (n_l - p_l)) * 1.0 / n_l
              + (p_r * p_r + (n_r - p_r) * (n_r - p_r)) * 1.0 / n_r)
             * 1e6) / 1e6 AS score
FROM cnt WHERE n_l > 0 AND n_r > 0
ORDER BY (p_l * p_l + (n_l - p_l) * (n_l - p_l)) * 1.0 / n_l
         + (p_r * p_r + (n_r - p_r) * (n_r - p_r)) * 1.0 / n_r DESC,
         t ASC
LIMIT 1
"""
)


def q_pr_curve_events(sf_dir: str):
    """Precision/recall/F1 curve of the 'total spend >= t' conversion
    classifier over the same integer threshold grid as the stump —
    the model-eval sibling of auc_events (which integrates this
    curve's ranking). Predicted positive at t = x > t, so TP/PP read
    straight off the cumulative histogram; precision, recall and F1
    (= 2TP/(PP+P), one division) are single float expressions over
    exact integers, floor-quantized."""
    thr, n_le, pos_le, n_tot, pos_tot = _stump_histogram(sf_dir)
    pp = n_tot - n_le
    tp = pos_tot - pos_le
    keep = pp > 0
    thr, pp, tp = thr[keep], pp[keep], tp[keep]
    prec = np.floor((tp * 1.0) / pp * 1e6) / 1e6
    rec = np.floor((tp * 1.0) / pos_tot * 1e6) / 1e6
    f1 = np.floor((2 * tp * 1.0) / (pp + pos_tot) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "t_cents": thr.astype(np.int64),
            "pred_pos": pp.astype(np.int64),
            "tp": tp.astype(np.int64),
            "prec": prec,
            "rec": rec,
            "f1": f1,
        }
    )


SQL_PR_CURVE_EVENTS = (
    "WITH "
    + _SQL_STUMP_BASE
    + """,
tot AS (SELECT CAST(sum(y) AS BIGINT) AS p FROM u)
SELECT t AS t_cents, n_r AS pred_pos, p_r AS tp,
       floor(p_r * 1.0 / n_r * 1e6) / 1e6 AS prec,
       floor(p_r * 1.0 / (SELECT p FROM tot) * 1e6) / 1e6 AS rec,
       floor(2 * p_r * 1.0 / (n_r + (SELECT p FROM tot)) * 1e6) / 1e6
         AS f1
FROM cnt WHERE n_r > 0
"""
)


REGISTRY.update(
    {
        "readability_docs": (q_readability_docs, SQL_READABILITY_DOCS),
        "decision_stump_events": (
            q_decision_stump_events,
            SQL_DECISION_STUMP_EVENTS,
        ),
        "pr_curve_events": (q_pr_curve_events, SQL_PR_CURVE_EVENTS),
    }
)


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


#: deterministic-walk parameters (random_walks)
WALK_SEED_MOD = 50  # walkers start from custkey % 50 == 0
WALK_STEPS = 3


def q_random_walks(sf_dir: str):
    """DeepWalk/node2vec-style corpus generation: deterministic
    3-step walks over the house digraph, one walk per seed node
    (custkey % 50 == 0). The 'random' next hop is the out-neighbour
    minimizing key_rank64((cur << 32) | dst, seed=step) — a pure
    function of (cur, step, dst), so walks are identical under any
    partitioning and the SQL twin replays the splitmix chain
    bit-for-bit. Per step: ONE streamed edge scan against the
    broadcast frontier (walker count is corpus/50-bounded; the
    beyond-driver plan is the pagerank_distributed hash-join shape),
    per-batch best-per-walker partials, tiny driver fold."""
    import ray

    from ..functions.hashing import key_rank64

    eds, _n = _ring_chord_edges_ds(sf_dir)
    cust = _pq(sf_dir, "customer", ["c_custkey"])
    seeds = (
        cust.filter(
            lambda r: r["c_custkey"] % WALK_SEED_MOD == 0
        ).to_pandas()["c_custkey"].to_numpy(np.int64)
    )
    walkers = np.sort(seeds)
    cur = walkers.copy()
    path = [walkers]
    for step in range(1, WALK_STEPS + 1):
        order = np.argsort(cur, kind="mergesort")
        cur_sorted = cur[order]  # walker ids carried via order
        uniq, starts = np.unique(cur_sorted, return_index=True)
        ref = ray.put((uniq, starts, order, cur_sorted, step))

        def best_partial(b: pa.Table, _ref=ref) -> pa.Table:
            u, st, ord_, curs, s = ray.get(_ref)
            src = b["src"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            dst = b["dst"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            pos = np.searchsorted(u, src)
            pos = np.clip(pos, 0, len(u) - 1)
            hit = u[pos] == src
            src, dst, pos = src[hit], dst[hit], pos[hit]
            # fan out one row per walker currently AT this src node
            ends = np.r_[st[1:], len(curs)]
            reps = (ends - st)[pos]
            w_idx = np.concatenate(
                [ord_[st[p]: ends[p]] for p in pos]
            ) if len(pos) else np.empty(0, np.int64)
            dsts = np.repeat(dst, reps)
            srcs = np.repeat(src, reps)
            key = (srcs.astype(np.uint64) << np.uint64(32)) | dsts.astype(
                np.uint64
            )
            rank = key_rank64(key.astype(np.int64), seed=s)
            o = np.lexsort((dsts, rank, w_idx))
            w_s, d_s, r_s = w_idx[o], dsts[o], rank[o]
            first = np.r_[True, w_s[1:] != w_s[:-1]]
            return pa.table(
                {
                    "w": pa.array(w_s[first], pa.int64()),
                    "dst": pa.array(d_s[first], pa.int64()),
                    "rank": pa.array(
                        r_s[first].astype(np.int64), pa.int64()
                    ),
                }
            )

        parts = eds.map_batches(
            best_partial, batch_format="pyarrow"
        ).to_pandas()
        parts["rank"] = parts["rank"].astype(np.uint64)
        parts = parts.sort_values(
            ["w", "rank", "dst"], kind="mergesort"
        ).drop_duplicates("w", keep="first")
        nxt = np.empty(len(walkers), np.int64)
        nxt[parts["w"].to_numpy(np.int64)] = parts["dst"].to_numpy(
            np.int64
        )
        cur = nxt
        path.append(cur.copy())
    return pd.DataFrame(
        {
            "walker": path[0],
            "n1": path[1],
            "n2": path[2],
            "n3": path[3],
        }
    )


def _walk_rank_ctes(prefix: str, src_cte: str, carry: str, seed: int) -> str:
    from __ray_entry__ import _splitmix_round_ctes  # lazy: avoids cycle

    return f"""{_splitmix_round_ctes(prefix + 'a', src_cte, carry)}
{prefix}x AS (SELECT {carry}, xor(x, CAST({seed} AS UBIGINT)) AS x
              FROM {prefix}a4),
{_splitmix_round_ctes(prefix + 'b', prefix + 'x', carry)}
{prefix}r AS (SELECT {carry}, x FROM {prefix}b4)"""


def _random_walks_sql() -> str:
    steps = []
    prev = "seeds"
    prev_col = "node"
    carry_cols = ["walker"]
    for s in range(1, WALK_STEPS + 1):
        carry = ", ".join(carry_cols + ["dst"])
        steps.append(f"""
c{s} AS (SELECT {', '.join(carry_cols)}, e.dst AS dst,
         CAST({prev}.{prev_col} AS UBIGINT) * 4294967296
           + CAST(e.dst AS UBIGINT) AS x
         FROM {prev} JOIN e ON e.src = {prev}.{prev_col}),
{_walk_rank_ctes(f'w{s}', f'c{s}', carry, s)},
p{s} AS (SELECT {', '.join(carry_cols)}, dst AS n{s} FROM (
  SELECT {carry},
         row_number() OVER (PARTITION BY walker ORDER BY x, dst) AS rn
  FROM w{s}r) WHERE rn = 1)""")
        prev = f"p{s}"
        prev_col = f"n{s}"
        carry_cols.append(f"n{s}")
    body = ",".join(steps)
    return f"""
WITH nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT c_custkey AS src, (c_custkey + 1) % (SELECT n FROM nn) AS dst
  FROM customer
  UNION ALL
  SELECT c_custkey, (7 * c_custkey + 3) % (SELECT n FROM nn)
  FROM customer
  WHERE c_custkey % 3 = 0
    AND (7 * c_custkey + 3) % (SELECT n FROM nn)
        <> (c_custkey + 1) % (SELECT n FROM nn)
),
seeds AS (SELECT c_custkey AS walker, c_custkey AS node
          FROM customer WHERE c_custkey % {WALK_SEED_MOD} = 0),
{body}
SELECT walker, n1, n2, n3 FROM p{WALK_STEPS}
"""


REGISTRY.update(
    {
        "jsd_lang_pairs": (q_jsd_lang_pairs, SQL_JSD_LANG_PAIRS),
        "random_walks": (q_random_walks, _random_walks_sql()),
    }
)


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


#: bootstrap parameters (bootstrap_ci_events)
BOOT_B = 200
BOOT_SEED = 17


def q_bootstrap_ci_events(sf_dir: str):
    """Deterministic bootstrap 95% CI for mean per-user spend: 200
    resamples whose member indices are a pure splitmix64 function of
    (resample, position) — reproducible under any partitioning, and
    the SQL twin replays the chain bit-for-bit. The per-user cents
    fold is the only data-sized exchange; resampling happens over the
    user-BOUNDED table (driver-side here; at an unbounded user count
    the same membership function drives B broadcast-scored scans).
    Resample sums are exact int64; each mean is one floor-quantized
    division; the CI reads ranks 6 and 195 of the 200 ordered means."""
    from ..functions.hashing import key_rank64

    users = (
        _stump_user_table(sf_dir)
        .to_pandas()
        .sort_values("user_id", kind="mergesort")
    )
    x = users["x"].to_numpy(np.int64)
    n = len(x)
    means = np.empty(BOOT_B, np.float64)
    i = np.arange(n, dtype=np.uint64)
    for b in range(1, BOOT_B + 1):
        key = (np.uint64(b) << np.uint64(32)) | i
        idx = key_rank64(key.astype(np.int64), seed=BOOT_SEED) % np.uint64(n)
        s = int(x[idx.astype(np.int64)].sum())
        means[b - 1] = np.floor(s * 1.0 / n * 1e6) / 1e6
    means.sort(kind="stable")
    point = np.floor(int(x.sum()) * 1.0 / n * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n_users": [n],
            "point_mean": [point],
            "ci_lo": [means[5]],
            "ci_hi": [means[BOOT_B - 6]],
        }
    )


def _bootstrap_ci_sql() -> str:
    from __ray_entry__ import _key_rank_sql  # lazy: avoids cycle

    return f"""
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
ru AS (SELECT x AS cents,
              row_number() OVER (ORDER BY user_id) - 1 AS pos
       FROM u),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
g AS (SELECT gb.b, gi.i
      FROM generate_series(1, {BOOT_B}) gb(b)
      CROSS JOIN (SELECT pos AS i FROM ru) gi),
{_key_rank_sql('g', '(b * 4294967296 + i)', 'b, i', BOOT_SEED)},
sel AS (
  SELECT r.b, ru.cents
  FROM r JOIN ru
    ON ru.pos = CAST(r.x % CAST((SELECT n FROM nn) AS UBIGINT)
                     AS BIGINT)
),
m AS (
  SELECT b,
         floor(CAST(sum(cents) AS BIGINT) * 1.0
               / (SELECT n FROM nn) * 1e6) / 1e6 AS mean
  FROM sel GROUP BY b
),
o AS (SELECT mean, row_number() OVER (ORDER BY mean) AS rn FROM m)
SELECT (SELECT n FROM nn) AS n_users,
       floor((SELECT CAST(sum(x) AS BIGINT) FROM u) * 1.0
             / (SELECT n FROM nn) * 1e6) / 1e6 AS point_mean,
       (SELECT mean FROM o WHERE rn = 6) AS ci_lo,
       (SELECT mean FROM o WHERE rn = {BOOT_B - 5}) AS ci_hi
"""


REGISTRY.update(
    {
        "blocklist_docs": (q_blocklist_docs, SQL_BLOCKLIST_DOCS),
        "compression_ratio_docs": (q_compression_ratio_docs, None),
        "bootstrap_ci_events": (
            q_bootstrap_ci_events,
            _bootstrap_ci_sql(),
        ),
    }
)


def q_emd_cohorts_events(sf_dir: str):
    """1-D earth-mover (Wasserstein-1) distance between the per-user
    spend distributions of the two experiment cohorts (user_id % 2) —
    the drift metric that, unlike KS or JSD, weighs HOW FAR mass
    moved. Over the ordered distinct-cents support, EMD = sum over
    gaps of |F_A - F_B| * gap; the integrand cross-multiplies integer
    cumulative counts (|cumA*nB - cumB*nA| * gap), so the whole sum
    is exact integer arithmetic with ONE final floor-quantized
    division. Per-user cents fold is the only data-sized exchange;
    the support table is user-bounded."""
    ds = _pq(sf_dir, "events", ["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        us, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "x": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    users = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("x", alias_name="x"))
        .to_pandas()
    )
    cohort = users["user_id"].to_numpy(np.int64) % 2
    x = users["x"].to_numpy(np.int64)
    order = np.argsort(x, kind="mergesort")
    x, cohort = x[order], cohort[order]
    v, start = np.unique(x, return_index=True)
    ca_per = np.bincount(
        np.searchsorted(v, x), weights=(cohort == 0), minlength=len(v)
    ).astype(np.int64)
    cb_per = np.bincount(
        np.searchsorted(v, x), weights=(cohort == 1), minlength=len(v)
    ).astype(np.int64)
    cuma = np.cumsum(ca_per)
    cumb = np.cumsum(cb_per)
    na, nb = int(cuma[-1]), int(cumb[-1])
    gaps = (v[1:] - v[:-1]).astype(object)
    s = int(
        sum(
            abs(int(cuma[i]) * nb - int(cumb[i]) * na) * int(gaps[i])
            for i in range(len(v) - 1)
        )
    )
    emd = np.floor(s * 1.0 / (na * nb) * 1e6) / 1e6
    return pd.DataFrame(
        {"n_a": [na], "n_b": [nb], "emd_cents": [float(emd)]}
    )


SQL_EMD_COHORTS_EVENTS = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         user_id % 2 AS cohort
  FROM events GROUP BY user_id
),
v AS (
  SELECT x,
         CAST(count(*) FILTER (cohort = 0) AS BIGINT) AS ca,
         CAST(count(*) FILTER (cohort = 1) AS BIGINT) AS cb
  FROM u GROUP BY x
),
nn AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
              CAST(sum(cb) AS BIGINT) AS nb FROM v),
w AS (
  SELECT x,
         CAST(sum(ca) OVER (ORDER BY x) AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY x) AS BIGINT) AS cumb,
         lead(x) OVER (ORDER BY x) AS nx
  FROM v
),
t AS (
  SELECT CAST(sum(abs(cuma * (SELECT nb FROM nn)
                      - cumb * (SELECT na FROM nn))
                  * (nx - x)) AS BIGINT) AS s
  FROM w WHERE nx IS NOT NULL
)
SELECT (SELECT na FROM nn) AS n_a,
       (SELECT nb FROM nn) AS n_b,
       floor((SELECT s FROM t) * 1.0
             / ((SELECT na FROM nn) * (SELECT nb FROM nn))
             * 1e6) / 1e6 AS emd_cents
"""


def q_ann_filtered_topk(sf_dir: str):
    """Metadata-FILTERED vector search (the vector-DB staple): exact
    cosine top-5 among vectors whose label = 1 only, queries =
    vec_id 0..2. Pre-filtering the candidate stream keeps the scan
    one pass and the ranking contract identical to ann_topk
    (cosine DESC, vec_id tiebreak)."""
    from ..stages.similarity import brute_topk

    ds = _pq(
        sf_dir, "embeddings", ["vec_id", "embedding", "label"]
    ).map_batches(
        lambda b: b.filter(
            pc.equal(b["label"], pa.scalar(1, pa.int32()))
        ).select(["vec_id", "embedding"]),
        batch_format="pyarrow",
    )
    qdf = (
        _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 3)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    Q = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    out = brute_topk(ds, Q, k=5).to_pandas()
    qids = qdf["vec_id"].to_numpy()
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out[["query_id", "vec_id", "rank"]].astype(
        {"query_id": "int64", "vec_id": "int64", "rank": "int64"}
    )


SQL_ANN_FILTERED_TOPK = """
SELECT query_id, vec_id, rank FROM (
  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                           v.embedding::DOUBLE[]) DESC,
                    v.vec_id) AS rank
  FROM embeddings q CROSS JOIN embeddings v
  WHERE q.vec_id < 3 AND v.label = 1)
WHERE rank <= 5
"""


#: matryoshka truncation width (dim_truncation_overlap)
TRUNC_DIMS = 8


def q_dim_truncation_overlap(sf_dir: str):
    """Matryoshka-style embedding-truncation eval: how much of the
    exact cosine top-10 survives when vectors are truncated to their
    first 8 dimensions? Two one-pass brute rankings (full + sliced
    list column) and a 3x10-row driver intersection; the per-query
    overlap count quantifies the recall cost of the cheaper index."""
    from ..stages.similarity import brute_topk

    full = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    trunc = full.map_batches(
        lambda b: pa.table(
            {
                "vec_id": b["vec_id"],
                "embedding": pc.list_slice(b["embedding"], 0, TRUNC_DIMS),
            }
        ),
        batch_format="pyarrow",
    )
    qdf = (
        full.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 3)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    Q = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    qids = qdf["vec_id"].to_numpy()
    tf = brute_topk(full, Q, k=10).to_pandas()
    tt = brute_topk(trunc, Q[:, :TRUNC_DIMS], k=10).to_pandas()
    rows = []
    for qi, qid in enumerate(qids):
        a = set(tf.loc[tf["query_id"] == qi, "vec_id"])
        b_ = set(tt.loc[tt["query_id"] == qi, "vec_id"])
        rows.append((int(qid), len(a & b_)))
    return pd.DataFrame(rows, columns=["query_id", "overlap"]).astype(
        {"query_id": "int64", "overlap": "int64"}
    )


SQL_DIM_TRUNCATION_OVERLAP = f"""
WITH fullk AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, v.vec_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                             v.embedding::DOUBLE[]) DESC,
                      v.vec_id) AS rank
    FROM embeddings q CROSS JOIN embeddings v WHERE q.vec_id < 3)
  WHERE rank <= 10
),
trunck AS (
  SELECT query_id, vec_id FROM (
    SELECT q.vec_id AS query_id, v.vec_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
                        (q.embedding::DOUBLE[])[1:{TRUNC_DIMS}],
                        (v.embedding::DOUBLE[])[1:{TRUNC_DIMS}]) DESC,
                      v.vec_id) AS rank
    FROM embeddings q CROSS JOIN embeddings v WHERE q.vec_id < 3)
  WHERE rank <= 10
)
SELECT f.query_id, CAST(count(*) AS BIGINT) AS overlap
FROM fullk f JOIN trunck t
  ON t.query_id = f.query_id AND t.vec_id = f.vec_id
GROUP BY f.query_id
"""


REGISTRY.update(
    {
        "emd_cohorts_events": (
            q_emd_cohorts_events,
            SQL_EMD_COHORTS_EVENTS,
        ),
        "ann_filtered_topk": (q_ann_filtered_topk, SQL_ANN_FILTERED_TOPK),
        "dim_truncation_overlap": (
            q_dim_truncation_overlap,
            SQL_DIM_TRUNCATION_OVERLAP,
        ),
    }
)


def q_attribution_linear(sf_dir: str):
    """LINEAR multi-touch attribution (the equal-credit sibling of
    attribution_last_touch): every click/view in the 24 h before a
    purchase shares that purchase's credit equally. Credit is the
    integer micro-unit floor(1e6 // k) per touch — integer DIVISION
    on both engines, so per-type credit sums are exact BIGINTs under
    any partitioning; purchases with no prior touch land in an
    'unattributed' bucket at full credit. One user-bucketed exchange;
    per-user window counts are two searchsorteds over the
    disjoint-offset touch timeline (the burst_users trick), no
    per-user loop."""
    ds = _pq(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]
    )
    W = 24 * 3600 * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        ty = g["event_type"].to_numpy()
        new = np.r_[True, u[1:] != u[:-1]]
        seg_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(u)] - 1
        rel = t - t[starts][seg_id]
        spans = rel[ends]
        offs = np.r_[0, np.cumsum(spans[:-1] + W + 1_000_000)]
        tt = rel + offs[seg_id]  # per-user-disjoint timeline
        is_p = ty == "purchase"
        res = {"click": 0, "view": 0}
        kc = np.zeros(int(is_p.sum()), np.int64)
        kv = np.zeros_like(kc)
        for name, arr in (("click", kc), ("view", kv)):
            tm = tt[ty == name]
            lo = np.searchsorted(tm, tt[is_p] - W, side="left")
            hi = np.searchsorted(tm, tt[is_p], side="left")
            arr[:] = hi - lo
        k = kc + kv
        has = k > 0
        per = np.zeros_like(k)
        per[has] = 1_000_000 // k[has]
        return pd.DataFrame(
            {
                "event_type": ["click", "view", "unattributed"],
                "credit_micro": [
                    int((kc[has] * per[has]).sum()),
                    int((kv[has] * per[has]).sum()),
                    int((~has).sum()) * 1_000_000,
                ],
            }
        )

    def pre(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b["event_type"],
            value_set=pa.array(["click", "view", "purchase"]),
        )
        b = b.filter(keep)
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
            }
        )

    parts = (
        _by_user_bucket(ds.map_batches(pre, batch_format="pyarrow"))
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby("event_type", sort=True)["credit_micro"]
        .sum()
        .reset_index()
    )
    out["credit_micro"] = out["credit_micro"].astype(np.int64)
    out["credit"] = out["credit_micro"] / 1e6
    return out


SQL_ATTRIBUTION_LINEAR = """
WITH p AS (SELECT event_id AS pid, user_id, ts FROM events
           WHERE event_type = 'purchase'),
t AS (SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'view')),
tc AS (
  SELECT p.pid, t.event_type AS ty, CAST(count(*) AS BIGINT) AS c
  FROM p JOIN t ON t.user_id = p.user_id
               AND t.ts < p.ts
               AND t.ts >= p.ts - INTERVAL 24 HOUR
  GROUP BY 1, 2
),
k AS (SELECT pid, CAST(sum(c) AS BIGINT) AS k FROM tc GROUP BY pid),
cr AS (
  SELECT tc.ty AS event_type,
         CAST(sum(tc.c * (1000000 // k.k)) AS BIGINT) AS credit_micro
  FROM tc JOIN k ON k.pid = tc.pid GROUP BY 1
),
un AS (
  SELECT 'unattributed' AS event_type,
         CAST(count(*) AS BIGINT) * 1000000 AS credit_micro
  FROM p LEFT JOIN k ON k.pid = p.pid WHERE k.pid IS NULL
),
allc AS (SELECT * FROM cr UNION ALL SELECT * FROM un)
SELECT event_type, credit_micro, credit_micro / 1e6 AS credit
FROM allc ORDER BY event_type
"""


def q_drawdown_users(sf_dir: str):
    """Maximum drawdown per user over the (ts, event_id)-ordered
    value series — the running-peak-minus-current metric every
    monitoring/finance pipeline computes. Exact integer cents: one
    user-bucketed exchange, per-user cummax inside the coarse group
    (pandas groupby.cummax — C-speed, no Python loop), max of the
    gap."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
                "event_id": b["event_id"],
                "v": pa.array(
                    np.rint(
                        b["value"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
                ),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        peak = g.groupby("user_id", sort=False)["v"].cummax()
        dd = peak - g["v"]
        out = (
            dd.groupby(g["user_id"], sort=False)
            .max()
            .reset_index()
        )
        out.columns = ["user_id", "max_drawdown_cents"]
        return out.astype(
            {"user_id": np.int64, "max_drawdown_cents": np.int64}
        )

    return _by_user_bucket(
        ds.map_batches(pre, batch_format="pyarrow")
    ).map_groups(per_bucket, batch_format="pandas")


SQL_DRAWDOWN_USERS = """
WITH v AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100.0) AS BIGINT) AS v
  FROM events
),
w AS (
  SELECT user_id,
         max(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) - v AS dd
  FROM v
)
SELECT user_id, CAST(max(dd) AS BIGINT) AS max_drawdown_cents
FROM w GROUP BY user_id
"""


REGISTRY.update(
    {
        "attribution_linear": (
            q_attribution_linear,
            SQL_ATTRIBUTION_LINEAR,
        ),
        "drawdown_users": (q_drawdown_users, SQL_DRAWDOWN_USERS),
    }
)


def q_wilson_ci_cohorts(sf_dir: str):
    """Wilson score 95% interval for each cohort's conversion rate —
    the small-sample-safe CI the two-proportion z-test (ab_test)
    should be read with. Inputs are the exact integer (converted,
    total) pairs from one user fold; the interval is a single float
    expression evaluated in the oracle's exact tree shape (math.sqrt
    == DuckDB sqrt, both correctly rounded), floor-quantized."""
    import math

    users = _stump_user_table(sf_dir).to_pandas()
    conv = (users["np"].to_numpy(np.int64) >= STUMP_THRESH).astype(
        np.int64
    )
    grp = users["user_id"].to_numpy(np.int64) % 2
    Z = 1.96
    rows = []
    for c in (0, 1):
        n = int((grp == c).sum())
        x = int(conv[grp == c].sum())
        p = x * 1.0 / n
        ctr = p + (Z * Z) / (2.0 * n)
        half = Z * math.sqrt(
            (p * (1.0 - p)) / n + (Z * Z) / (4.0 * n * n)
        )
        den = 1.0 + (Z * Z) / n
        rows.append(
            (
                c,
                n,
                x,
                np.floor((ctr - half) / den * 1e6) / 1e6,
                np.floor((ctr + half) / den * 1e6) / 1e6,
            )
        )
    return pd.DataFrame(
        rows, columns=["cohort", "n", "converted", "ci_lo", "ci_hi"]
    ).astype({"cohort": np.int64, "n": np.int64, "converted": np.int64})


SQL_WILSON_CI_COHORTS = f"""
WITH u AS (
  SELECT user_id % 2 AS cohort,
         CASE WHEN sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) >= {STUMP_THRESH}
              THEN 1 ELSE 0 END AS y
  FROM events GROUP BY user_id
),
c AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS x
      FROM u GROUP BY cohort)
SELECT cohort, n, x AS converted,
       floor(((x * 1.0 / n + (1.96 * 1.96) / (2.0 * n))
              - 1.96 * sqrt(((x * 1.0 / n) * (1.0 - x * 1.0 / n)) / n
                            + (1.96 * 1.96) / (4.0 * n * n)))
             / (1.0 + (1.96 * 1.96) / n) * 1e6) / 1e6 AS ci_lo,
       floor(((x * 1.0 / n + (1.96 * 1.96) / (2.0 * n))
              + 1.96 * sqrt(((x * 1.0 / n) * (1.0 - x * 1.0 / n)) / n
                            + (1.96 * 1.96) / (4.0 * n * n)))
             / (1.0 + (1.96 * 1.96) / n) * 1e6) / 1e6 AS ci_hi
FROM c
"""


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


REGISTRY.update(
    {
        "wilson_ci_cohorts": (
            q_wilson_ci_cohorts,
            SQL_WILSON_CI_COHORTS,
        ),
        "hist_intersection_sources": (
            q_hist_intersection_sources,
            SQL_HIST_INTERSECTION_SOURCES,
        ),
    }
)


def q_ks_test_cohorts(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov D between the cohort spend
    distributions — the max-gap companion of emd_cohorts_events,
    derived from the same integer cumulative machinery: D =
    max_v |cumA(v)*nB - cumB(v)*nA| / (nA*nB), with the numerator an
    exact integer max and a single quantized division. Reports the
    smallest support value attaining the max (deterministic tie
    rule). One per-user fold is the only data-sized exchange."""
    ds = _pq(sf_dir, "events", ["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        us, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "x": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    users = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("x", alias_name="x"))
        .to_pandas()
    )
    cohort = users["user_id"].to_numpy(np.int64) % 2
    x = users["x"].to_numpy(np.int64)
    order = np.argsort(x, kind="mergesort")
    x, cohort = x[order], cohort[order]
    v, start = np.unique(x, return_index=True)
    pos = np.searchsorted(v, x)
    ca = np.bincount(pos, weights=(cohort == 0), minlength=len(v))
    cb = np.bincount(pos, weights=(cohort == 1), minlength=len(v))
    cuma = np.cumsum(ca).astype(np.int64)
    cumb = np.cumsum(cb).astype(np.int64)
    na, nb = int(cuma[-1]), int(cumb[-1])
    gap = np.abs(cuma * nb - cumb * na)
    best = int(gap.max())
    at = int(v[np.flatnonzero(gap == best)[0]])
    d = np.floor(best * 1.0 / (na * nb) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n_a": [na],
            "n_b": [nb],
            "ks_d": [float(d)],
            "d_at_cents": [at],
        }
    ).astype({"n_a": np.int64, "n_b": np.int64, "d_at_cents": np.int64})


SQL_KS_TEST_COHORTS = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         user_id % 2 AS cohort
  FROM events GROUP BY user_id
),
v AS (
  SELECT x,
         CAST(count(*) FILTER (cohort = 0) AS BIGINT) AS ca,
         CAST(count(*) FILTER (cohort = 1) AS BIGINT) AS cb
  FROM u GROUP BY x
),
nn AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
              CAST(sum(cb) AS BIGINT) AS nb FROM v),
w AS (
  SELECT x,
         abs(CAST(sum(ca) OVER (ORDER BY x) AS BIGINT)
               * (SELECT nb FROM nn)
             - CAST(sum(cb) OVER (ORDER BY x) AS BIGINT)
               * (SELECT na FROM nn)) AS gap
  FROM v
),
m AS (SELECT CAST(max(gap) AS BIGINT) AS best FROM w)
SELECT (SELECT na FROM nn) AS n_a,
       (SELECT nb FROM nn) AS n_b,
       floor((SELECT best FROM m) * 1.0
             / ((SELECT na FROM nn) * (SELECT nb FROM nn))
             * 1e6) / 1e6 AS ks_d,
       (SELECT min(x) FROM w WHERE gap = (SELECT best FROM m))
         AS d_at_cents
"""


def q_cramers_v_events(sf_dir: str):
    """Cramer's V effect size over the event_type x cohort
    contingency — the interpretable companion of chi_square_events
    (same cell-count-sized exchange): V = sqrt(chi2 / (N *
    min(r-1, c-1))), rounded like the chi-square precedent."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            b["event_type"].combine_chunks()
            if isinstance(b["event_type"], pa.ChunkedArray)
            else b["event_type"]
        )
        t = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = b["user_id"].to_numpy(zero_copy_only=False) % 4
        packed = t * 4 + k
        upk, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "t": enc.dictionary.take(pa.array(upk // 4, pa.int64())),
                "k": pa.array(upk % 4, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    def finish(b: pa.Table) -> pa.Table:
        import math

        t = b["t"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ut, ti = np.unique(t, return_inverse=True)
        uk, ki = np.unique(k, return_inverse=True)
        obs = np.zeros((len(ut), len(uk)))
        obs[ti, ki] = n
        rt = obs.sum(axis=1, keepdims=True)
        ct = obs.sum(axis=0, keepdims=True)
        tot = obs.sum()
        e = rt * ct / tot
        chi2 = ((obs - e) ** 2 / e).sum()
        denom = tot * min(len(ut) - 1, len(uk) - 1)
        v = math.sqrt(chi2 / denom)
        return pa.table(
            {
                "cramers_v": pa.array([round(v, 6)], pa.float64()),
                "n": pa.array([int(tot)], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["t", "k"])
        .aggregate(Sum("n", alias_name="n"))
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )


SQL_CRAMERS_V_EVENTS = """
WITH c AS (
  SELECT event_type AS t, user_id % 4 AS k, count(*) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT t, sum(o) AS r FROM c GROUP BY 1),
ct AS (SELECT k, sum(o) AS cc FROM c GROUP BY 1),
tot AS (SELECT sum(o) AS n FROM c),
grid AS (
  SELECT rt.t, ct.k, COALESCE(c.o, 0) AS o,
         CAST(rt.r AS DOUBLE) * ct.cc / tot.n AS e
  FROM rt CROSS JOIN ct CROSS JOIN tot
  LEFT JOIN c ON c.t = rt.t AND c.k = ct.k
)
SELECT round(sqrt(sum((o - e) * (o - e) / e)
                  / (CAST((SELECT n FROM tot) AS DOUBLE)
                     * least((SELECT count(*) - 1 FROM rt),
                             (SELECT count(*) - 1 FROM ct)))), 6)
         AS cramers_v,
       CAST((SELECT n FROM tot) AS BIGINT) AS n
FROM grid
"""


REGISTRY.update(
    {
        "ks_test_cohorts": (q_ks_test_cohorts, SQL_KS_TEST_COHORTS),
        "cramers_v_events": (q_cramers_v_events, SQL_CRAMERS_V_EVENTS),
    }
)


def q_kg_negation_customers(sf_dir: str):
    """neg_pattern (SPARQL FILTER NOT EXISTS) over the customer
    triple store: subjects with an in_nation edge but NO
    in_segment=MACHINERY edge — the anti-join query shape a
    triple-store consumer uses for 'entities lacking X'. One
    subject-keyed exchange (stages/kgquery.py:neg_pattern); the
    oracle is a plain inequality."""
    from ..stages.kgquery import neg_pattern

    return neg_pattern(
        _cust_triples(sf_dir),
        have=("in_nation", None),
        lack=("in_segment", "MACHINERY"),
    )


SQL_KG_NEGATION_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS subject
FROM customer WHERE c_mktsegment <> 'MACHINERY'
"""


#: PSI bucket count (psi_cohorts_events)
PSI_BUCKETS = 10


def q_psi_cohorts_events(sf_dir: str):
    """Population Stability Index between the cohort spend
    distributions — the model-monitoring drift gate (PSI > 0.2 =>
    investigate): sum over value-range buckets of
    (pa - pb) * ln(pa / pb). Buckets come from the integer global
    min/max grid (never data-volume-bound); zero-count buckets are
    excluded on BOTH sides (the standard convention); each term is
    nanounit-floor-quantized so the integer sum is
    order-independent, with math.log == DuckDB ln ulp-for-ulp."""
    import math

    from ray.data.aggregate import Max, Min

    users = _stump_user_table(sf_dir).materialize()
    mm = users.aggregate(Min("x"), Max("x"))
    xmin, xmax = int(mm["min(x)"]), int(mm["max(x)"])
    i = np.arange(1, PSI_BUCKETS, dtype=np.int64)
    thr = np.unique(xmin + (i * (xmax - xmin)) // PSI_BUCKETS)

    def hist_partial(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        coh = b["user_id"].to_numpy(zero_copy_only=False) % 2
        bucket = np.searchsorted(thr, x, side="left")
        nb_ = len(thr) + 1
        a = np.bincount(
            bucket[coh == 0], minlength=nb_
        ).astype(np.int64)
        c = np.bincount(
            bucket[coh == 1], minlength=nb_
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(np.arange(nb_, dtype=np.int64)),
                "na": pa.array(a, pa.int64()),
                "nb": pa.array(c, pa.int64()),
            }
        )

    h = (
        users.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("na", alias_name="na"), Sum("nb", alias_name="nb")
        )
        .to_pandas()
    )
    na = h["na"].to_numpy(np.int64)
    nb_ = h["nb"].to_numpy(np.int64)
    Na, Nb = int(na.sum()), int(nb_.sum())
    acc = 0
    used = 0
    for a, c in zip(na, nb_):
        if a == 0 or c == 0:
            continue
        used += 1
        pa_ = int(a) * 1.0 / Na
        pb_ = int(c) * 1.0 / Nb
        term = (pa_ - pb_) * math.log(pa_ / pb_)
        acc += int(np.floor(term * 1e9))
    return pd.DataFrame(
        {
            "n_a": [Na],
            "n_b": [Nb],
            "n_buckets_used": [used],
            "psi_nano": [acc],
        }
    ).astype(
        {
            "n_a": np.int64,
            "n_b": np.int64,
            "n_buckets_used": np.int64,
            "psi_nano": np.int64,
        }
    )


SQL_PSI_COHORTS_EVENTS = f"""
WITH u AS (
  SELECT user_id % 2 AS cohort,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
mm AS (SELECT min(x) AS lo, max(x) AS hi FROM u),
thr AS (
  SELECT DISTINCT CAST((SELECT lo FROM mm)
         + (i * ((SELECT hi FROM mm) - (SELECT lo FROM mm)))
           // {PSI_BUCKETS} AS BIGINT) AS t
  FROM generate_series(1, {PSI_BUCKETS - 1}) g(i)
),
bkt AS (
  SELECT u.cohort,
         (SELECT count(*) FROM thr WHERE thr.t < u.x) AS bucket
  FROM u
),
h AS (
  SELECT bucket,
         CAST(count(*) FILTER (cohort = 0) AS BIGINT) AS na,
         CAST(count(*) FILTER (cohort = 1) AS BIGINT) AS nb
  FROM bkt GROUP BY bucket
),
nn AS (SELECT CAST(sum(na) AS BIGINT) AS Na,
              CAST(sum(nb) AS BIGINT) AS Nb FROM h),
terms AS (
  SELECT CAST(floor((na * 1.0 / (SELECT Na FROM nn)
                     - nb * 1.0 / (SELECT Nb FROM nn))
                    * ln((na * 1.0 / (SELECT Na FROM nn))
                         / (nb * 1.0 / (SELECT Nb FROM nn)))
                    * 1e9) AS BIGINT) AS ti
  FROM h WHERE na > 0 AND nb > 0
)
SELECT (SELECT Na FROM nn) AS n_a,
       (SELECT Nb FROM nn) AS n_b,
       (SELECT CAST(count(*) AS BIGINT) FROM terms)
         AS n_buckets_used,
       CAST(COALESCE((SELECT sum(ti) FROM terms), 0) AS BIGINT)
         AS psi_nano
"""


REGISTRY.update(
    {
        "kg_negation_customers": (
            q_kg_negation_customers,
            SQL_KG_NEGATION_CUSTOMERS,
        ),
        "psi_cohorts_events": (
            q_psi_cohorts_events,
            SQL_PSI_COHORTS_EVENTS,
        ),
    }
)


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


REGISTRY.update(
    {
        "span_corruption_docs": (
            q_span_corruption_docs,
            _span_corruption_sql(),
        )
    }
)


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


def q_transition_entropy_events(sf_dir: str):
    """Conditional entropy H(next | prev) of the user event streams —
    how predictable the next event type is given the current one (the
    information-theoretic companion of markov_accuracy_events, read
    off the SAME types^2-bounded transition table): H = -sum_{p,n}
    P(p,n) * ln(n_pn / n_p), each cell's term microlog-quantized to
    an exact integer so the sum is order-independent."""
    import math

    from ..functions.hashing import hash_strings

    ev = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    B = 64

    def pre(b: pa.Table) -> pa.Table:
        h = hash_strings(
            b["user_id"].to_numpy(zero_copy_only=False).astype("U")
        )
        return pa.table(
            {
                "bucket": pa.array(
                    (h % np.uint64(B)).astype(np.int64)
                ),
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "event_type": b["event_type"],
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        same = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        prev = g["event_type"].to_numpy()[:-1][same]
        nxt = g["event_type"].to_numpy()[1:][same]
        return (
            pd.DataFrame({"prev": prev, "next": nxt})
            .groupby(["prev", "next"], sort=False)
            .size()
            .reset_index(name="n")
        )

    counts = (
        ev.map_batches(pre, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["prev", "next"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = int(counts["n"].sum())
    row_tot = counts.groupby("prev")["n"].transform("sum")
    acc = 0
    for n_pn, n_p in zip(
        counts["n"].to_numpy(np.int64), row_tot.to_numpy(np.int64)
    ):
        term = -(int(n_pn) * 1.0 / total) * math.log(
            int(n_pn) * 1.0 / int(n_p)
        )
        acc += int(np.floor(term * 1e9))
    return pd.DataFrame(
        {"n_pairs": [total], "cond_entropy_nano": [acc]}
    ).astype({"n_pairs": np.int64, "cond_entropy_nano": np.int64})


SQL_TRANSITION_ENTROPY_EVENTS = """
WITH p AS (
  SELECT event_type AS prev,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next
  FROM events
),
c AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS n
      FROM p WHERE next IS NOT NULL GROUP BY 1, 2),
rt AS (SELECT prev, CAST(sum(n) AS BIGINT) AS np FROM c GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
terms AS (
  SELECT CAST(floor(-(c.n * 1.0 / (SELECT total FROM tot))
                    * ln(c.n * 1.0 / rt.np) * 1e9) AS BIGINT) AS ti
  FROM c JOIN rt ON rt.prev = c.prev
)
SELECT (SELECT total FROM tot) AS n_pairs,
       CAST(sum(ti) AS BIGINT) AS cond_entropy_nano
FROM terms
"""


REGISTRY.update(
    {
        "skipgram_pairs": (q_skipgram_pairs, SQL_SKIPGRAM_PAIRS),
        "transition_entropy_events": (
            q_transition_entropy_events,
            SQL_TRANSITION_ENTROPY_EVENTS,
        ),
    }
)


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


REGISTRY.update(
    {
        "negative_samples_counts": (
            q_negative_samples_counts,
            _negative_samples_sql(),
        )
    }
)


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


REGISTRY.update(
    {
        "glove_cooc": (q_glove_cooc, SQL_GLOVE_COOC),
        "l_diversity_docs": (q_l_diversity_docs, SQL_L_DIVERSITY_DOCS),
    }
)


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


REGISTRY.update(
    {
        "split_leakage_docs": (
            q_split_leakage_docs,
            _split_leakage_sql(),
        )
    }
)


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


REGISTRY.update(
    {
        "subsample_tokens_docs": (
            q_subsample_tokens_docs,
            _subsample_tokens_sql(),
        )
    }
)


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


REGISTRY.update(
    {
        "collapse_rare_sources": (
            q_collapse_rare_sources,
            SQL_COLLAPSE_RARE_SOURCES,
        )
    }
)


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


REGISTRY.update(
    {
        "cohens_kappa_docs": (q_cohens_kappa_docs, SQL_COHENS_KAPPA_DOCS)
    }
)


def q_theilsen_hours(sf_dir: str):
    """Theil-Sen robust trend of the hourly event-count series — the
    outlier-immune slope estimator (median of all pairwise slopes)
    monitoring pipelines prefer over OLS. The hourly count table is
    time-bounded (one exchange of per-batch partials); the pairwise
    slope enumeration is bounded-squared and fully vectorized on the
    driver, with the median picked by the same float ordering the
    oracle uses (identical per-pair expression), floor-quantized."""
    ds = _pq(sf_dir, "events", ["ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = _date_us(b["ts"]) // (3600 * 1_000_000)
        u, n = np.unique(t, return_counts=True)
        return pa.table(
            {
                "hour": pa.array(u, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("hour")
    )
    t = h["hour"].to_numpy(np.int64)
    c = h["n"].to_numpy(np.int64)
    i, j = np.triu_indices(len(t), k=1)
    slopes = (c[j] - c[i]) * 1.0 / (t[j] - t[i])
    slopes.sort(kind="stable")
    m = len(slopes)
    if m % 2:
        med = slopes[m // 2]
    else:
        med = (slopes[m // 2 - 1] + slopes[m // 2]) / 2.0
    return pd.DataFrame(
        {
            "n_hours": [len(t)],
            "n_pairs": [m],
            "slope_per_hour": [float(np.floor(med * 1e6) / 1e6)],
        }
    ).astype({"n_hours": np.int64, "n_pairs": np.int64})


SQL_THEILSEN_HOURS = """
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
p AS (
  SELECT (b.n - a.n) * 1.0 / (b.hour - a.hour) AS slope
  FROM h a JOIN h b ON b.hour > a.hour
),
o AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
             count(*) OVER () AS m
      FROM p)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM h) AS n_hours,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_pairs,
       floor(CASE WHEN (SELECT max(m) FROM o) % 2 = 1
                  THEN (SELECT slope FROM o
                        WHERE rn = (m + 1) // 2)
                  ELSE ((SELECT slope FROM o WHERE rn = m // 2)
                        + (SELECT slope FROM o WHERE rn = m // 2 + 1))
                       / 2.0 END * 1e6) / 1e6 AS slope_per_hour
"""


REGISTRY.update(
    {"theilsen_hours": (q_theilsen_hours, SQL_THEILSEN_HOURS)}
)


#: kNN outlier parameters (knn_outliers_embeddings)
KNN_OUT_K = 5
KNN_OUT_TOP = 20


def q_knn_outliers_embeddings(sf_dir: str):
    """kNN-distance outlier detection: the 20 most isolated vectors
    by distance to their 5th nearest neighbour (the classic
    density-free anomaly score for embedding spaces). Candidates
    stream against the broadcast vector matrix one batch at a time
    (the ann_topk scan shape); per row the 5th-smallest L2 distance
    falls out of one argpartition. Ranking follows the ann ordering
    contract (score, then vec_id), which the synthetic embedding
    geometry keeps ulp-stable across both engines."""
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    all_df = ds.to_pandas().sort_values("vec_id")
    M = np.stack(
        [np.asarray(v, np.float64) for v in all_df["embedding"]]
    )
    ids = all_df["vec_id"].to_numpy(np.int64)

    def score(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [
                np.asarray(v, np.float64)
                for v in b["embedding"].to_pylist()
            ]
        )
        # exact squared distances, then per-row 5th-smallest excluding
        # self (distance 0 at the self column)
        d2 = (
            (Q * Q).sum(1)[:, None]
            - 2.0 * (Q @ M.T)
            + (M * M).sum(1)[None, :]
        )
        np.maximum(d2, 0.0, out=d2)
        # mask self by vec_id (duplicates of the same id keep one)
        self_col = np.searchsorted(ids, vid)
        d2[np.arange(len(vid)), self_col] = np.inf
        kth = np.partition(d2, KNN_OUT_K - 1, axis=1)[:, KNN_OUT_K - 1]
        return pa.table(
            {
                "vec_id": pa.array(vid, pa.int64()),
                "d2": pa.array(kth, pa.float64()),
            }
        )

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["d2", "vec_id"], ascending=[False, True])
        .head(KNN_OUT_TOP)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "vec_id"]].astype(np.int64)


SQL_KNN_OUTLIERS_EMBEDDINGS = f"""
WITH d AS (
  SELECT a.vec_id,
         list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           AS dist
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
),
kth AS (
  SELECT vec_id, dist FROM (
    SELECT vec_id, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist) AS rn
    FROM d) WHERE rn = {KNN_OUT_K}
)
SELECT CAST(row_number() OVER (ORDER BY dist DESC, vec_id)
            AS BIGINT) AS rank,
       vec_id
FROM kth
ORDER BY rank LIMIT {KNN_OUT_TOP}
"""


REGISTRY.update(
    {
        "knn_outliers_embeddings": (
            q_knn_outliers_embeddings,
            SQL_KNN_OUTLIERS_EMBEDDINGS,
        )
    }
)


#: LOF parameters (lof_embeddings)
LOF_K = 5
LOF_TOP = 10


def q_lof_embeddings(sf_dir: str):
    """Local Outlier Factor over the embedding space — the
    density-RATIO anomaly score (a point is outlying relative to its
    neighbourhood's density, not the global scale). k=5 neighbours
    under the ann ordering contract; reachability sums fold in FIXED
    neighbour-rank order (r1+r2+r3+r4+r5 written explicitly on both
    engines, so no float-reduction-order divergence), and the top-10
    LOF scores are floor-quantized at 1e-4. One batched scan against
    the broadcast matrix; everything after the per-node 5-row
    neighbour table is vector-count-bounded."""
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    all_df = ds.to_pandas().sort_values("vec_id")
    M = np.stack(
        [np.asarray(v, np.float64) for v in all_df["embedding"]]
    )
    ids = all_df["vec_id"].to_numpy(np.int64)

    def knn_partial(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [np.asarray(v, np.float64) for v in b["embedding"].to_pylist()]
        )
        # distance expression mirrors DuckDB list_distance:
        # sqrt(sum (a_i - b_i)^2)
        d2 = (
            (Q * Q).sum(1)[:, None]
            - 2.0 * (Q @ M.T)
            + (M * M).sum(1)[None, :]
        )
        np.maximum(d2, 0.0, out=d2)
        self_col = np.searchsorted(ids, vid)
        d2[np.arange(len(vid)), self_col] = np.inf
        d = np.sqrt(d2)
        # k nearest by (dist, vec_id)
        order = np.lexsort(
            (np.broadcast_to(ids, d.shape), d), axis=1
        )[:, :LOF_K]
        rows = np.repeat(vid, LOF_K)
        cols = order.ravel()
        return pa.table(
            {
                "ai": pa.array(rows, pa.int64()),
                "bi": pa.array(ids[cols], pa.int64()),
                "rn": pa.array(
                    np.tile(
                        np.arange(1, LOF_K + 1, dtype=np.int64),
                        len(vid),
                    )
                ),
                "dist": pa.array(
                    d[np.repeat(np.arange(len(vid)), LOF_K), cols],
                    pa.float64(),
                ),
            }
        )

    nbr = (
        ds.map_batches(knn_partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["ai", "rn"])
    )
    kdist = nbr.loc[nbr["rn"] == LOF_K].set_index("ai")["dist"]
    # reach_j(a) = max(kdist(b_j), d(a, b_j)), folded in rank order
    reach = np.maximum(
        kdist.loc[nbr["bi"]].to_numpy(), nbr["dist"].to_numpy()
    )
    re_cols = reach.reshape(-1, LOF_K)
    a_ids = nbr["ai"].to_numpy(np.int64).reshape(-1, LOF_K)[:, 0]
    s = re_cols[:, 0]
    for j in range(1, LOF_K):
        s = s + re_cols[:, j]
    lrd = pd.Series(LOF_K * 1.0 / s, index=a_ids)
    nb_lrd = lrd.loc[nbr["bi"]].to_numpy().reshape(-1, LOF_K)
    t = nb_lrd[:, 0]
    for j in range(1, LOF_K):
        t = t + nb_lrd[:, j]
    lof = t / (LOF_K * 1.0 * lrd.loc[a_ids].to_numpy())
    out = (
        pd.DataFrame({"vec_id": a_ids, "lof": np.floor(lof * 1e4) / 1e4})
        .sort_values(["lof", "vec_id"], ascending=[False, True])
        .head(LOF_TOP)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "vec_id", "lof"]].astype(
        {"rank": np.int64, "vec_id": np.int64}
    )


def _lof_sql() -> str:
    k = LOF_K
    re_sum = " + ".join(
        f"max(CASE WHEN rn = {j} THEN re END)" for j in range(1, k + 1)
    )
    lrd_sum = " + ".join(
        f"max(CASE WHEN rn = {j} THEN nl END)" for j in range(1, k + 1)
    )
    return f"""
WITH d AS (
  SELECT a.vec_id AS ai, b.vec_id AS bi,
         list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           AS dist
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
),
nn AS (
  SELECT ai, bi, dist,
         row_number() OVER (PARTITION BY ai
                            ORDER BY dist, bi) AS rn
  FROM d
),
kd AS (SELECT ai, dist AS kdist FROM nn WHERE rn = {k}),
nbr AS (SELECT * FROM nn WHERE rn <= {k}),
reach AS (
  SELECT n.ai, n.rn, greatest(kk.kdist, n.dist) AS re
  FROM nbr n JOIN kd kk ON kk.ai = n.bi
),
lrd AS (
  SELECT ai, {k}.0 / ({re_sum}) AS lrd
  FROM reach GROUP BY ai
),
nl AS (
  SELECT n.ai, n.rn, l.lrd AS nl
  FROM nbr n JOIN lrd l ON l.ai = n.bi
),
lof AS (
  SELECT nl.ai,
         ({lrd_sum}) / ({k}.0 * max(la.lrd)) AS lof
  FROM nl JOIN lrd la ON la.ai = nl.ai
  GROUP BY nl.ai
)
SELECT CAST(row_number() OVER (ORDER BY floor(lof * 1e4) / 1e4 DESC,
                               ai) AS BIGINT) AS rank,
       ai AS vec_id,
       floor(lof * 1e4) / 1e4 AS lof
FROM lof
ORDER BY rank LIMIT {LOF_TOP}
"""


REGISTRY.update(
    {"lof_embeddings": (q_lof_embeddings, _lof_sql())}
)


#: DBSCAN parameters (dbscan_embeddings)
DBSCAN_EPS = 1.2
DBSCAN_MINPTS = 5


def q_dbscan_embeddings(sf_dir: str):
    """DBSCAN over the embedding space: core points have >= 5
    neighbours within eps=1.2 (self excluded), clusters are connected
    components of the core-core eps-graph labelled by their min core
    id, border points take the min cluster among their core
    neighbours, everything else is noise (-1) — the classic
    density-based clustering, made deterministic by min-label rules.
    The eps-neighbour scan streams batches against the broadcast
    matrix; the core-core edge set is density-bounded and feeds the
    house union-find (the distributed CC path is the documented
    beyond-driver plan)."""
    from ..stages.canonicalize import connected_components_local

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    all_df = ds.to_pandas().sort_values("vec_id")
    M = np.stack(
        [np.asarray(v, np.float64) for v in all_df["embedding"]]
    )
    ids = all_df["vec_id"].to_numpy(np.int64)

    def nb_partial(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [np.asarray(v, np.float64) for v in b["embedding"].to_pylist()]
        )
        d2 = (
            (Q * Q).sum(1)[:, None]
            - 2.0 * (Q @ M.T)
            + (M * M).sum(1)[None, :]
        )
        np.maximum(d2, 0.0, out=d2)
        self_col = np.searchsorted(ids, vid)
        d2[np.arange(len(vid)), self_col] = np.inf
        d = np.sqrt(d2)
        rows, cols = np.where(d <= DBSCAN_EPS)
        return pa.table(
            {
                "ai": pa.array(vid[rows], pa.int64()),
                "bi": pa.array(ids[cols], pa.int64()),
            }
        )

    nb = (
        ds.map_batches(nb_partial, batch_format="pyarrow")
        .to_pandas()
    )
    deg = nb.groupby("ai").size()
    core = set(deg[deg >= DBSCAN_MINPTS].index)
    cc_edges = nb[
        nb["ai"].isin(core) & nb["bi"].isin(core)
        & (nb["ai"] < nb["bi"])
    ]
    tbl = pa.table(
        {
            "a": pa.array(
                cc_edges["ai"].astype(str).to_numpy(), pa.string()
            ),
            "b": pa.array(
                cc_edges["bi"].astype(str).to_numpy(), pa.string()
            ),
        }
    )
    comp = connected_components_local(tbl)
    label = {int(k): int(v) for k, v in comp.items()}
    for c in core:
        label.setdefault(c, c)  # isolated cores are their own cluster
    out_rows = []
    nb_core = nb[nb["bi"].isin(core)]
    border_lbl = (
        nb_core.assign(
            lbl=nb_core["bi"].map(lambda x: label[int(x)])
        )
        .groupby("ai")["lbl"]
        .min()
    )
    for vid in ids:
        v = int(vid)
        if v in core:
            out_rows.append((v, label[v]))
        elif v in border_lbl.index:
            out_rows.append((v, int(border_lbl.loc[v])))
        else:
            out_rows.append((v, -1))
    return pd.DataFrame(
        out_rows, columns=["vec_id", "cluster"]
    ).astype(np.int64)


SQL_DBSCAN_EMBEDDINGS = f"""
WITH RECURSIVE d AS (
  SELECT a.vec_id AS ai, b.vec_id AS bi,
         list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           AS dist
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
),
nb AS (SELECT ai, bi FROM d WHERE dist <= {DBSCAN_EPS}),
deg AS (SELECT ai, count(*) AS k FROM nb GROUP BY ai),
core AS (SELECT ai AS id FROM deg WHERE k >= {DBSCAN_MINPTS}),
e AS (
  SELECT n.ai AS a, n.bi AS b FROM nb n
  JOIN core ca ON ca.id = n.ai JOIN core cb ON cb.id = n.bi
  WHERE n.ai < n.bi
),
und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
reach(node, s) AS (
  SELECT id, id FROM core
  UNION
  SELECT und.b, reach.s FROM reach JOIN und ON und.a = reach.node
),
labels AS (SELECT node, MIN(s) AS component FROM reach GROUP BY node),
border AS (
  SELECT n.ai, MIN(l.component) AS cluster
  FROM nb n
  JOIN core c ON c.id = n.bi
  JOIN labels l ON l.node = n.bi
  LEFT JOIN core cc ON cc.id = n.ai
  WHERE cc.id IS NULL
  GROUP BY n.ai
)
SELECT em.vec_id,
       CAST(COALESCE(l.component, br.cluster, -1) AS BIGINT)
         AS cluster
FROM embeddings em
LEFT JOIN labels l ON l.node = em.vec_id
LEFT JOIN border br ON br.ai = em.vec_id
"""


REGISTRY.update(
    {"dbscan_embeddings": (q_dbscan_embeddings, SQL_DBSCAN_EMBEDDINGS)}
)


def q_silhouette_kmeans(sf_dir: str):
    """Mean silhouette per k-means cluster — the standard clustering
    quality report over the deterministic-centroid assignment
    (kmeans_assign's contract). Every pairwise distance is
    MICRO-QUANTIZED to an integer before any aggregation, so a(i) and
    b(i) folds are exact integer sums under any order; the final
    s = (b - a) / max(a, b) means are single float expressions
    mirroring the oracle. The pairwise scan streams batches against
    the broadcast matrix; per-batch (i, cluster_j) partial sums keep
    the exchange at rows x k."""
    from ..stages.cluster import deterministic_centroids, kmeans_assign

    K = 8
    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = deterministic_centroids(emb, K)
    assign = (
        kmeans_assign(emb, C)
        .drop_columns(["embedding"])
        .to_pandas()
        .sort_values("vec_id")
    )
    all_df = emb.to_pandas().sort_values("vec_id")
    M = np.stack(
        [np.asarray(v, np.float64) for v in all_df["embedding"]]
    )
    ids = all_df["vec_id"].to_numpy(np.int64)
    cl = assign.set_index("vec_id")["cluster"].loc[ids].to_numpy(
        np.int64
    )
    csizes = np.bincount(cl, minlength=K).astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [np.asarray(v, np.float64) for v in b["embedding"].to_pylist()]
        )
        d2 = (
            (Q * Q).sum(1)[:, None]
            - 2.0 * (Q @ M.T)
            + (M * M).sum(1)[None, :]
        )
        np.maximum(d2, 0.0, out=d2)
        self_col = np.searchsorted(ids, vid)
        d2[np.arange(len(vid)), self_col] = 0.0
        dq = np.floor(np.sqrt(d2) * 1e6).astype(np.int64)
        dq[np.arange(len(vid)), self_col] = 0
        # per (row, cluster) integer distance sums
        sums = np.zeros((len(vid), K), np.int64)
        for c in range(K):
            sums[:, c] = dq[:, cl == c].sum(axis=1)
        out = {
            "vec_id": pa.array(vid, pa.int64()),
            "cluster": pa.array(
                cl[np.searchsorted(ids, vid)], pa.int64()
            ),
        }
        for c in range(K):
            out[f"s{c}"] = pa.array(sums[:, c], pa.int64())
        return pa.table(out)

    per_row = (
        emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    )
    own = per_row["cluster"].to_numpy(np.int64)
    S = per_row[[f"s{c}" for c in range(K)]].to_numpy(np.int64)
    n_own = csizes[own]
    a = np.where(
        n_own > 1,
        S[np.arange(len(own)), own] * 1.0 / (n_own - 1),
        0.0,
    )
    b_ = np.full(len(own), np.inf)
    for c in range(K):
        mean_c = np.where(csizes[c] > 0, S[:, c] * 1.0 / max(csizes[c], 1), np.inf)
        cand = np.where((own != c) & (csizes[c] > 0), mean_c, np.inf)
        b_ = np.minimum(b_, cand)
    s = np.where(
        n_own > 1, (b_ - a) / np.maximum(a, b_), 0.0
    )
    df = pd.DataFrame({"cluster": own, "s": s})
    out = (
        df.groupby("cluster")["s"]
        .apply(lambda g: np.floor(g.mean() * 1e6) / 1e6)
        .reset_index(name="mean_silhouette")
    )
    out["n"] = csizes[out["cluster"].to_numpy(np.int64)]
    return out.astype({"cluster": np.int64, "n": np.int64})


SQL_SILHOUETTE_KMEANS = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
dc AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM dc) WHERE rn = 1
),
cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n
       FROM assign GROUP BY cluster),
pd_ AS (
  SELECT a.vec_id AS i, ab.cluster AS cj,
         CAST(sum(CAST(floor(list_distance(
                 CAST(a.embedding AS DOUBLE[]),
                 CAST(b.embedding AS DOUBLE[])) * 1e6) AS BIGINT))
              AS BIGINT) AS s
  FROM embeddings a
  JOIN embeddings b ON b.vec_id <> a.vec_id
  JOIN assign ab ON ab.vec_id = b.vec_id
  GROUP BY 1, 2
),
rowstats AS (
  SELECT ai.vec_id, ai.cluster,
         (SELECT cs.n FROM cs WHERE cs.cluster = ai.cluster) AS n_own,
         COALESCE((SELECT p.s FROM pd_ p
                   WHERE p.i = ai.vec_id
                     AND p.cj = ai.cluster), 0) AS s_own,
         (SELECT min(p.s * 1.0 / cs.n)
          FROM pd_ p JOIN cs ON cs.cluster = p.cj
          WHERE p.i = ai.vec_id AND p.cj <> ai.cluster
            AND cs.n > 0) AS b
  FROM assign ai
),
sil AS (
  SELECT cluster,
         CASE WHEN n_own > 1
              THEN (b - s_own * 1.0 / (n_own - 1))
                   / greatest(s_own * 1.0 / (n_own - 1), b)
              ELSE 0.0 END AS s
  FROM rowstats
)
SELECT s.cluster,
       floor(avg(s.s) * 1e6) / 1e6 AS mean_silhouette,
       (SELECT n FROM cs WHERE cs.cluster = s.cluster) AS n
FROM sil s GROUP BY s.cluster
"""


REGISTRY.update(
    {"silhouette_kmeans": (q_silhouette_kmeans, SQL_SILHOUETTE_KMEANS)}
)


def q_ari_kmeans_labels(sf_dir: str):
    """Adjusted Rand Index between the deterministic k-means
    assignment and the embeddings' ground-truth label column — the
    external clustering-validation metric. The k x labels contingency
    folds through one cell-count-sized exchange; every pair count is
    an exact integer binomial, so only the final ARI expression is
    float (mirrored, floor-quantized)."""
    from ..stages.cluster import deterministic_centroids, kmeans_assign

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    C = deterministic_centroids(
        emb.drop_columns(["label"]), 8
    )
    assign = kmeans_assign(
        emb.drop_columns(["label"]), C
    ).drop_columns(["embedding"])

    labels = emb.drop_columns(["embedding"])
    from ..stages.joins import hash_join

    both = hash_join(
        assign,
        labels.map_batches(
            lambda b: pa.table(
                {
                    "vec_id": b["vec_id"],
                    "label": pc.cast(b["label"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        on=["vec_id"],
        how="inner",
    )

    def cell_partial(b: pa.Table) -> pa.Table:
        c = b["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        l_ = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        packed = c * 1024 + l_
        u, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "cluster": pa.array(u // 1024, pa.int64()),
                "label": pa.array(u % 1024, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    cells = (
        both.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    nij = cells["n"].to_numpy(np.int64)
    a = cells.groupby("cluster")["n"].sum().to_numpy(np.int64)
    b_ = cells.groupby("label")["n"].sum().to_numpy(np.int64)
    n = int(nij.sum())
    sum_ij = int((nij * (nij - 1) // 2).sum())
    sum_a = int((a * (a - 1) // 2).sum())
    sum_b = int((b_ * (b_ - 1) // 2).sum())
    t = n * (n - 1) // 2
    exp = sum_a * 1.0 * sum_b / t
    ari = np.floor(
        (sum_ij - exp) / ((sum_a + sum_b) / 2.0 - exp) * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "n": [n],
            "pairs_together_both": [sum_ij],
            "ari": [float(ari)],
        }
    ).astype({"n": np.int64, "pairs_together_both": np.int64})


SQL_ARI_KMEANS_LABELS = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
dc AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM dc) WHERE rn = 1
),
cells AS (
  SELECT a.cluster, CAST(e.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS n
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY 1, 2
),
stats AS (
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(n * (n - 1) // 2) AS BIGINT) AS sum_ij
  FROM cells
),
ra AS (SELECT CAST(sum(s * (s - 1) // 2) AS BIGINT) AS sum_a
       FROM (SELECT CAST(sum(n) AS BIGINT) AS s
             FROM cells GROUP BY cluster)),
rb AS (SELECT CAST(sum(s * (s - 1) // 2) AS BIGINT) AS sum_b
       FROM (SELECT CAST(sum(n) AS BIGINT) AS s
             FROM cells GROUP BY label))
SELECT (SELECT n FROM stats) AS n,
       (SELECT sum_ij FROM stats) AS pairs_together_both,
       floor(((SELECT sum_ij FROM stats)
              - (SELECT sum_a FROM ra) * 1.0 * (SELECT sum_b FROM rb)
                / ((SELECT n FROM stats)
                   * ((SELECT n FROM stats) - 1) // 2))
             / (((SELECT sum_a FROM ra) + (SELECT sum_b FROM rb)) / 2.0
                - (SELECT sum_a FROM ra) * 1.0 * (SELECT sum_b FROM rb)
                  / ((SELECT n FROM stats)
                     * ((SELECT n FROM stats) - 1) // 2))
             * 1e6) / 1e6 AS ari
"""


REGISTRY.update(
    {"ari_kmeans_labels": (q_ari_kmeans_labels, SQL_ARI_KMEANS_LABELS)}
)


def q_nmi_kmeans_labels(sf_dir: str):
    """Normalized Mutual Information between the k-means assignment
    and the true labels — the information-theoretic companion of ARI
    over the SAME cell-count contingency. Each MI/entropy term is
    nanounit-floor-quantized (math.log == DuckDB ln) so the integer
    sums are order-independent; NMI = I / ((H_C + H_L)/2) is one
    mirrored float expression over the three quantized sums."""
    import math

    from ..stages.cluster import deterministic_centroids, kmeans_assign
    from ..stages.joins import hash_join

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    C = deterministic_centroids(emb.drop_columns(["label"]), 8)
    assign = kmeans_assign(
        emb.drop_columns(["label"]), C
    ).drop_columns(["embedding"])
    both = hash_join(
        assign,
        emb.drop_columns(["embedding"]).map_batches(
            lambda b: pa.table(
                {
                    "vec_id": b["vec_id"],
                    "label": pc.cast(b["label"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        on=["vec_id"],
        how="inner",
    )

    def cell_partial(b: pa.Table) -> pa.Table:
        c = b["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        l_ = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        packed = c * 1024 + l_
        u, n = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "cluster": pa.array(u // 1024, pa.int64()),
                "label": pa.array(u % 1024, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    cells = (
        both.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["cluster", "label"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = int(cells["n"].sum())
    a = cells.groupby("cluster")["n"].sum()
    b_ = cells.groupby("label")["n"].sum()
    mi = 0
    for _, r in cells.iterrows():
        nij, ai, bj = int(r["n"]), int(a[r["cluster"]]), int(b_[r["label"]])
        term = (nij * 1.0 / n) * math.log(
            (nij * 1.0 / n) / ((ai * 1.0 / n) * (bj * 1.0 / n))
        )
        mi += int(np.floor(term * 1e9))
    hc = sum(
        int(np.floor(-(int(x) * 1.0 / n)
                     * math.log(int(x) * 1.0 / n) * 1e9))
        for x in a
    )
    hl = sum(
        int(np.floor(-(int(x) * 1.0 / n)
                     * math.log(int(x) * 1.0 / n) * 1e9))
        for x in b_
    )
    nmi = np.floor(mi * 1.0 / ((hc + hl) / 2.0) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n": [n],
            "mi_nano": [mi],
            "nmi": [float(nmi)],
        }
    ).astype({"n": np.int64, "mi_nano": np.int64})


SQL_NMI_KMEANS_LABELS = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
dc AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM dc) WHERE rn = 1
),
cells AS (
  SELECT a.cluster, CAST(e.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS n
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY 1, 2
),
nn AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM cells),
ra AS (SELECT cluster, CAST(sum(n) AS BIGINT) AS s
       FROM cells GROUP BY cluster),
rb AS (SELECT label, CAST(sum(n) AS BIGINT) AS s
       FROM cells GROUP BY label),
mi AS (
  SELECT CAST(sum(CAST(floor(
           (c.n * 1.0 / (SELECT n FROM nn))
           * ln((c.n * 1.0 / (SELECT n FROM nn))
                / ((ra.s * 1.0 / (SELECT n FROM nn))
                   * (rb.s * 1.0 / (SELECT n FROM nn))))
           * 1e9) AS BIGINT)) AS BIGINT) AS v
  FROM cells c JOIN ra ON ra.cluster = c.cluster
               JOIN rb ON rb.label = c.label
),
hc AS (SELECT CAST(sum(CAST(floor(
         -(s * 1.0 / (SELECT n FROM nn))
         * ln(s * 1.0 / (SELECT n FROM nn)) * 1e9) AS BIGINT))
       AS BIGINT) AS v FROM ra),
hl AS (SELECT CAST(sum(CAST(floor(
         -(s * 1.0 / (SELECT n FROM nn))
         * ln(s * 1.0 / (SELECT n FROM nn)) * 1e9) AS BIGINT))
       AS BIGINT) AS v FROM rb)
SELECT (SELECT n FROM nn) AS n,
       (SELECT v FROM mi) AS mi_nano,
       floor((SELECT v FROM mi) * 1.0
             / (((SELECT v FROM hc) + (SELECT v FROM hl)) / 2.0)
             * 1e6) / 1e6 AS nmi
"""


REGISTRY.update(
    {"nmi_kmeans_labels": (q_nmi_kmeans_labels, SQL_NMI_KMEANS_LABELS)}
)


def q_davies_bouldin_kmeans(sf_dir: str):
    """Davies-Bouldin index of the k-means assignment (lower =
    tighter clusters): per-cluster scatter is an exact integer fold
    of micro-quantized member-to-centroid distances finished with
    integer division, pairwise centroid separations quantize the same
    way, and each cluster's worst ratio nano-quantizes before the
    order-independent integer mean. One rows x k scan; everything
    after is k-bounded."""
    from ..stages.cluster import deterministic_centroids, kmeans_assign

    K = 8
    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = deterministic_centroids(emb, K)
    Cm = np.stack([np.asarray(v, np.float64) for v in C])
    assign = kmeans_assign(emb, C)

    def scatter_partial(b: pa.Table) -> pa.Table:
        cl = b["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [np.asarray(v, np.float64) for v in b["embedding"].to_pylist()]
        )
        d = np.sqrt(
            np.maximum(
                (Q * Q).sum(1)[:, None]
                - 2.0 * (Q @ Cm.T)
                + (Cm * Cm).sum(1)[None, :],
                0.0,
            )
        )
        dq = np.floor(
            d[np.arange(len(cl)), cl] * 1e6
        ).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(
                    np.arange(K, dtype=np.int64)
                ),
                "s": pa.array(
                    np.bincount(cl, weights=dq, minlength=K).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "n": pa.array(
                    np.bincount(cl, minlength=K).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    agg = (
        assign.map_batches(scatter_partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("cluster")
    )
    s = agg["s"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    sigma = np.where(n > 0, s // np.maximum(n, 1), 0)  # micro ints
    cd = np.sqrt(
        np.maximum(
            (Cm * Cm).sum(1)[:, None]
            - 2.0 * (Cm @ Cm.T)
            + (Cm * Cm).sum(1)[None, :],
            0.0,
        )
    )
    cdq = np.floor(cd * 1e6).astype(np.int64)
    acc = 0
    for i in range(K):
        best = 0
        for j in range(K):
            if j == i or cdq[i, j] == 0:
                continue
            r = int(
                np.floor(
                    (int(sigma[i]) + int(sigma[j]))
                    * 1.0
                    / int(cdq[i, j])
                    * 1e9
                )
            )
            best = max(best, r)
        acc += best
    db = np.floor(acc * 1.0 / K / 1e9 * 1e6) / 1e6
    return pd.DataFrame(
        {"k": [K], "db_index": [float(db)]}
    ).astype({"k": np.int64})


SQL_DAVIES_BOULDIN_KMEANS = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
dc AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT vec_id, cluster, dist,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM dc) WHERE rn = 1
),
sig AS (
  SELECT cluster,
         CAST(sum(CAST(floor(dist * 1e6) AS BIGINT)) AS BIGINT)
           // CAST(count(*) AS BIGINT) AS sigma
  FROM assign GROUP BY cluster
),
cd AS (
  SELECT a.cluster AS i, b.cluster AS j,
         CAST(floor(list_distance(a.cvec, b.cvec) * 1e6) AS BIGINT)
           AS d
  FROM cent a JOIN cent b ON b.cluster <> a.cluster
),
ratios AS (
  SELECT cd.i,
         CAST(max(CAST(floor((si.sigma + sj.sigma) * 1.0 / cd.d * 1e9)
                       AS BIGINT)) AS BIGINT) AS best
  FROM cd JOIN sig si ON si.cluster = cd.i
          JOIN sig sj ON sj.cluster = cd.j
  WHERE cd.d > 0
  GROUP BY cd.i
)
SELECT CAST(8 AS BIGINT) AS k,
       floor(CAST(sum(best) AS BIGINT) * 1.0 / 8 / 1e9 * 1e6) / 1e6
         AS db_index
FROM ratios
"""


def q_dunn_kmeans(sf_dir: str):
    """Dunn index (higher = better separated): min inter-cluster
    pairwise distance over max intra-cluster diameter. Both extrema
    fold over MICRO-QUANTIZED integer distances (min/max are
    order-free, so no float-reduction hazard anywhere); per-batch
    partial min/max rows keep the exchange at 2 x batches."""
    from ..stages.cluster import deterministic_centroids, kmeans_assign

    K = 8
    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = deterministic_centroids(emb, K)
    assign = (
        kmeans_assign(emb, C)
        .drop_columns([])
        .to_pandas()
        .sort_values("vec_id")
    )
    ids = assign["vec_id"].to_numpy(np.int64)
    cl = assign["cluster"].to_numpy(np.int64)
    M = np.stack(
        [np.asarray(v, np.float64) for v in assign["embedding"]]
    )

    emb2 = kmeans_assign(emb, C)

    def extrema_partial(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bc = b["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(
            [np.asarray(v, np.float64) for v in b["embedding"].to_pylist()]
        )
        d = np.sqrt(
            np.maximum(
                (Q * Q).sum(1)[:, None]
                - 2.0 * (Q @ M.T)
                + (M * M).sum(1)[None, :],
                0.0,
            )
        )
        dq = np.floor(d * 1e6).astype(np.int64)
        self_col = np.searchsorted(ids, vid)
        same = bc[:, None] == cl[None, :]
        dq_self = dq.copy()
        dq_self[np.arange(len(vid)), self_col] = -1
        intra = dq_self[same]
        intra_max = int(intra.max()) if intra.size else -1
        inter = dq[~same]
        inter_min = int(inter.min()) if inter.size else 2**62
        return pa.table(
            {
                "intra_max": pa.array([intra_max], pa.int64()),
                "inter_min": pa.array([inter_min], pa.int64()),
            }
        )

    parts = emb2.map_batches(
        extrema_partial, batch_format="pyarrow"
    ).to_pandas()
    intra = int(parts["intra_max"].max())
    inter = int(parts["inter_min"].min())
    dunn = np.floor(inter * 1.0 / intra * 1e6) / 1e6
    return pd.DataFrame(
        {
            "intra_max_micro": [intra],
            "inter_min_micro": [inter],
            "dunn": [float(dunn)],
        }
    ).astype(
        {"intra_max_micro": np.int64, "inter_min_micro": np.int64}
    )


SQL_DUNN_KMEANS = """
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
),
dc AS (
  SELECT e.vec_id, cent.cluster,
         list_distance(CAST(e.embedding AS DOUBLE[]), cent.cvec) AS dist
  FROM embeddings e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cluster) AS rn
    FROM dc) WHERE rn = 1
),
pd_ AS (
  SELECT aa.cluster AS ca, ab.cluster AS cb,
         CAST(floor(list_distance(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))
                    * 1e6) AS BIGINT) AS d
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  JOIN assign aa ON aa.vec_id = a.vec_id
  JOIN assign ab ON ab.vec_id = b.vec_id
)
SELECT (SELECT CAST(max(d) AS BIGINT) FROM pd_ WHERE ca = cb)
         AS intra_max_micro,
       (SELECT CAST(min(d) AS BIGINT) FROM pd_ WHERE ca <> cb)
         AS inter_min_micro,
       floor((SELECT min(d) FROM pd_ WHERE ca <> cb) * 1.0
             / (SELECT max(d) FROM pd_ WHERE ca = cb) * 1e6) / 1e6
         AS dunn
"""


REGISTRY.update(
    {
        "davies_bouldin_kmeans": (
            q_davies_bouldin_kmeans,
            SQL_DAVIES_BOULDIN_KMEANS,
        ),
        "dunn_kmeans": (q_dunn_kmeans, SQL_DUNN_KMEANS),
    }
)


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


REGISTRY.update({"ndcg_bm25": (q_ndcg_bm25, _ndcg_sql())})


def q_spearman_users(sf_dir: str):
    """Spearman rank correlation between per-user total spend and
    purchase count — the monotone-association metric that ignores the
    spend distribution's heavy tail. Ranks are row_numbers under a
    DETERMINISTIC (value, user_id) order, so both rank vectors are
    exact integers and every Pearson-on-ranks moment (sum r, sum r^2,
    sum r1*r2) folds as integers; the final correlation is one
    mirrored float expression. The per-user fold is the only
    data-sized exchange (the rank assignment itself is user-bounded,
    with the rank_global_orders value-bucket machinery as the
    beyond-driver plan)."""
    users = _stump_user_table(sf_dir).to_pandas()
    uid = users["user_id"].to_numpy(np.int64)
    x = users["x"].to_numpy(np.int64)
    p = users["np"].to_numpy(np.int64)
    rx = np.empty(len(uid), np.int64)
    rx[np.lexsort((uid, x))] = np.arange(1, len(uid) + 1)
    rp = np.empty(len(uid), np.int64)
    rp[np.lexsort((uid, p))] = np.arange(1, len(uid) + 1)
    n = len(uid)
    s1 = int(rx.sum())
    s2 = int(rp.sum())
    s11 = int((rx * rx).sum())
    s22 = int((rp * rp).sum())
    s12 = int((rx * rp).sum())
    import math

    num = n * s12 - s1 * s2
    den = math.sqrt((n * s11 - s1 * s1) * 1.0) * math.sqrt(
        (n * s22 - s2 * s2) * 1.0
    )
    rho = np.floor(num * 1.0 / den * 1e6) / 1e6
    return pd.DataFrame(
        {"n": [n], "spearman": [float(rho)]}
    ).astype({"n": np.int64})


SQL_SPEARMAN_USERS = f"""
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np
  FROM events GROUP BY user_id
),
r AS (
  SELECT user_id,
         CAST(row_number() OVER (ORDER BY x, user_id) AS BIGINT) AS rx,
         CAST(row_number() OVER (ORDER BY np, user_id) AS BIGINT) AS rp
  FROM u
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rx) AS BIGINT) AS s1,
         CAST(sum(rp) AS BIGINT) AS s2,
         CAST(sum(rx * rx) AS BIGINT) AS s11,
         CAST(sum(rp * rp) AS BIGINT) AS s22,
         CAST(sum(rx * rp) AS BIGINT) AS s12
  FROM r
)
SELECT n,
       floor((n * s12 - s1 * s2) * 1.0
             / (sqrt((n * s11 - s1 * s1) * 1.0)
                * sqrt((n * s22 - s2 * s2) * 1.0)) * 1e6) / 1e6
         AS spearman
FROM m
"""


def q_durbin_watson_hours(sf_dir: str):
    """Durbin-Watson autocorrelation statistic of the hourly
    event-count residuals (e_t = n*c_t - S, the cross-multiplied
    integer residual, so BOTH sums are exact integers and only the
    final ratio is float). The hourly table is time-bounded; counts
    fold through one exchange. DW ~ 2 means no lag-1 correlation."""
    ds = _pq(sf_dir, "events", ["ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = _date_us(b["ts"]) // (3600 * 1_000_000)
        u, n = np.unique(t, return_counts=True)
        return pa.table(
            {
                "hour": pa.array(u, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("hour")
    )
    c = h["n"].to_numpy(np.int64).astype(object)
    n = len(c)
    S = int(sum(c))
    e = [n * int(v) - S for v in c]
    num = sum(
        (e[t] - e[t - 1]) * (e[t] - e[t - 1]) for t in range(1, n)
    )
    den = sum(v * v for v in e)
    dw = np.floor(num * 1.0 / den * 1e6) / 1e6
    return pd.DataFrame(
        {"n_hours": [n], "dw": [float(dw)]}
    ).astype({"n_hours": np.int64})


SQL_DURBIN_WATSON_HOURS = """
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
st AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(c) AS BIGINT) AS s FROM h),
e AS (
  SELECT hour,
         (SELECT n FROM st) * c - (SELECT s FROM st) AS e,
         lag((SELECT n FROM st) * c - (SELECT s FROM st))
           OVER (ORDER BY hour) AS ep
  FROM h
)
SELECT (SELECT n FROM st) AS n_hours,
       floor(CAST(sum((e - ep) * (e - ep))
                  FILTER (ep IS NOT NULL) AS HUGEINT) * 1.0
             / CAST(sum(e * e) AS HUGEINT) * 1e6) / 1e6 AS dw
FROM e
"""


REGISTRY.update(
    {
        "spearman_users": (q_spearman_users, SQL_SPEARMAN_USERS),
        "durbin_watson_hours": (
            q_durbin_watson_hours,
            SQL_DURBIN_WATSON_HOURS,
        ),
    }
)


def q_kendall_users(sf_dir: str):
    """Kendall's tau-b between per-user spend and purchase count —
    the concordance-based companion of Spearman, tie-corrected.
    Concordant/discordant/tie counts are exact integers from the
    pairwise comparison over the user-BOUNDED feature table
    (vectorized O(n^2) here; the beyond-driver plan is merge-sort
    inversion counting inside value buckets); tau-b is one mirrored
    float expression."""
    import math

    users = _stump_user_table(sf_dir).to_pandas()
    x = users["x"].to_numpy(np.int64)
    p = users["np"].to_numpy(np.int64)
    n = len(x)
    dx = np.sign(x[:, None] - x[None, :])
    dp = np.sign(p[:, None] - p[None, :])
    iu = np.triu_indices(n, k=1)
    sx, sp = dx[iu], dp[iu]
    C = int(((sx * sp) > 0).sum())
    D = int(((sx * sp) < 0).sum())
    tx = int((sx == 0).sum())  # ties in x (incl. double ties)
    tp = int((sp == 0).sum())
    both = int(((sx == 0) & (sp == 0)).sum())
    n0 = n * (n - 1) // 2
    # tau-b: ties counted per variable (double ties excluded from
    # each variable's correction is the textbook n1/n2 convention:
    # n1 = sum over x-tie groups, n2 = sum over p-tie groups — these
    # are tx and tp as counted above)
    tau = np.floor(
        (C - D)
        * 1.0
        / (
            math.sqrt((n0 - tx) * 1.0)
            * math.sqrt((n0 - tp) * 1.0)
        )
        * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "n": [n],
            "concordant": [C],
            "discordant": [D],
            "tau_b": [float(tau)],
        }
    ).astype({"n": np.int64, "concordant": np.int64, "discordant": np.int64})


SQL_KENDALL_USERS = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np
  FROM events GROUP BY user_id
),
pr AS (
  SELECT sign(b.x - a.x) AS sx, sign(b.np - a.np) AS sp
  FROM u a JOIN u b ON b.user_id > a.user_id
),
m AS (
  SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n,
         CAST(count(*) FILTER (sx * sp > 0) AS BIGINT) AS c,
         CAST(count(*) FILTER (sx * sp < 0) AS BIGINT) AS d,
         CAST(count(*) FILTER (sx = 0) AS BIGINT) AS tx,
         CAST(count(*) FILTER (sp = 0) AS BIGINT) AS tp
  FROM pr
)
SELECT n, c AS concordant, d AS discordant,
       floor((c - d) * 1.0
             / (sqrt((n * (n - 1) // 2 - tx) * 1.0)
                * sqrt((n * (n - 1) // 2 - tp) * 1.0)) * 1e6) / 1e6
         AS tau_b
FROM m
"""


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


REGISTRY.update(
    {
        "kendall_users": (q_kendall_users, SQL_KENDALL_USERS),
        "mcnemar_docs": (q_mcnemar_docs, SQL_MCNEMAR_DOCS),
    }
)


def _anova_f(parts: list[tuple[int, int, int]]):
    """(n_g, S_g, Q_g) integer group moments -> (ssb, ssw, F) floats
    via the computational formula with EXPLICIT per-group fold order
    (mirrored in SQL)."""
    n = sum(p[0] for p in parts)
    S = sum(p[1] for p in parts)
    Q = sum(p[2] for p in parts)
    k = len(parts)
    ssb = 0.0
    for ng, sg, _ in parts:
        ssb = ssb + sg * 1.0 * sg / ng
    ssb = ssb - S * 1.0 * S / n
    sst = Q - S * 1.0 * S / n
    ssw = sst - ssb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return ssb, ssw, f, n, k


def q_anova_cohorts(sf_dir: str):
    """One-way ANOVA of per-user spend across the four deterministic
    cohorts (user_id % 4): group moments (n, sum, sum-of-squares) are
    exact integer cents folds, the F statistic is a single float
    expression with explicit per-group fold order mirrored by the
    oracle. One user fold + one 4-row group fold."""
    users = _stump_user_table(sf_dir).to_pandas()
    x = users["x"].to_numpy(np.int64)
    g = users["user_id"].to_numpy(np.int64) % 4
    parts = []
    for c in range(4):
        xs = x[g == c]
        parts.append(
            (len(xs), int(xs.sum()), int((xs.astype(object) ** 2).sum()))
        )
    ssb, ssw, f, n, k = _anova_f(parts)
    return pd.DataFrame(
        {
            "n": [n],
            "f_stat": [float(np.floor(f * 1e6) / 1e6)],
            "ssb": [float(np.floor(ssb * 1e2) / 1e2)],
            "ssw": [float(np.floor(ssw * 1e2) / 1e2)],
        }
    ).astype({"n": np.int64})


SQL_ANOVA_COHORTS = """
WITH u AS (
  SELECT user_id % 4 AS g,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
m AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS q
  FROM u GROUP BY g
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n,
               CAST(sum(s) AS BIGINT) AS s,
               CAST(sum(q) AS BIGINT) AS q FROM m),
piv AS (
  SELECT max(CASE WHEN g = 0 THEN s END) AS s0,
         max(CASE WHEN g = 0 THEN n END) AS n0,
         max(CASE WHEN g = 1 THEN s END) AS s1,
         max(CASE WHEN g = 1 THEN n END) AS n1,
         max(CASE WHEN g = 2 THEN s END) AS s2,
         max(CASE WHEN g = 2 THEN n END) AS n2,
         max(CASE WHEN g = 3 THEN s END) AS s3,
         max(CASE WHEN g = 3 THEN n END) AS n3
  FROM m
),
f AS (
  SELECT (SELECT n FROM tot) AS n,
         ((((0.0 + s0 * 1.0 * s0 / n0) + s1 * 1.0 * s1 / n1)
           + s2 * 1.0 * s2 / n2) + s3 * 1.0 * s3 / n3)
           - (SELECT s FROM tot) * 1.0 * (SELECT s FROM tot)
             / (SELECT n FROM tot) AS ssb,
         (SELECT q FROM tot)
           - (SELECT s FROM tot) * 1.0 * (SELECT s FROM tot)
             / (SELECT n FROM tot) AS sst
  FROM piv
)
SELECT n,
       floor((ssb / 3) / ((sst - ssb) / (n - 4)) * 1e6) / 1e6
         AS f_stat,
       floor(ssb * 1e2) / 1e2 AS ssb,
       floor((sst - ssb) * 1e2) / 1e2 AS ssw
FROM f
"""


REGISTRY.update(
    {"anova_cohorts": (q_anova_cohorts, SQL_ANOVA_COHORTS)}
)


#: churn rule for the survival curve: inactive for the final day of
#: the log (the synthetic users ping near-daily; max silence ~2.4 d)
KM_CHURN_DAYS = 1


def q_kaplan_meier_churn(sf_dir: str):
    """Kaplan-Meier survival curve of user lifetime (first to last
    activity, churn observed when the user has been silent for the
    final 30 days of the log, censored otherwise) — survival analysis
    in LOG space so nothing needs a float product: each factor
    ln(1 - d/n) nanounit-quantizes (math.log == DuckDB ln) and the
    curve is the exact integer running sum over ordered event times.
    One per-user (first, last) fold; the KM sweep runs over the
    user-bounded duration table."""
    import math

    from ray.data.aggregate import Max, Min

    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
            }
        )

    spans = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("t", alias_name="t0"), Max("t", alias_name="t1"))
        .to_pandas()
    )
    day = 24 * 3600 * 1_000_000
    tmax = int(spans["t1"].max())
    dur = (
        (spans["t1"].to_numpy(np.int64) - spans["t0"].to_numpy(np.int64))
        // day
    ).astype(np.int64)
    churned = (
        spans["t1"].to_numpy(np.int64) <= tmax - KM_CHURN_DAYS * day
    ).astype(np.int64)
    order = np.argsort(dur, kind="mergesort")
    dur, churned = dur[order], churned[order]
    times = np.unique(dur[churned == 1])
    n_total = len(dur)
    rows = []
    logs = 0
    for t in times:
        n_risk = int((dur >= t).sum())
        d = int(((dur == t) & (churned == 1)).sum())
        logs += int(np.floor(math.log(1.0 - d * 1.0 / n_risk) * 1e9))
        rows.append((int(t), n_risk, d, logs))
    return pd.DataFrame(
        rows, columns=["t_days", "n_risk", "d", "log_surv_nano"]
    ).astype(np.int64)


SQL_KAPLAN_MEIER_CHURN = f"""
WITH u AS (
  SELECT user_id,
         CAST(epoch_us(min(ts)) AS BIGINT) AS t0,
         CAST(epoch_us(max(ts)) AS BIGINT) AS t1
  FROM events GROUP BY user_id
),
mx AS (SELECT CAST(max(t1) AS BIGINT) AS tmax FROM u),
d AS (
  SELECT (t1 - t0) // 86400000000 AS dur,
         CASE WHEN t1 <= (SELECT tmax FROM mx)
                         - {KM_CHURN_DAYS} * 86400000000
              THEN 1 ELSE 0 END AS churned
  FROM u
),
ev AS (
  SELECT dur AS t,
         CAST(sum(churned) AS BIGINT) AS dd
  FROM d GROUP BY dur HAVING sum(churned) > 0
),
km AS (
  SELECT ev.t, ev.dd,
         (SELECT CAST(count(*) AS BIGINT) FROM d
          WHERE d.dur >= ev.t) AS n_risk
  FROM ev
)
SELECT t AS t_days, n_risk, dd AS d,
       CAST(sum(CAST(floor(ln(1.0 - dd * 1.0 / n_risk) * 1e9)
                     AS BIGINT)) OVER (ORDER BY t) AS BIGINT)
         AS log_surv_nano
FROM km ORDER BY t
"""


REGISTRY.update(
    {
        "kaplan_meier_churn": (
            q_kaplan_meier_churn,
            SQL_KAPLAN_MEIER_CHURN,
        )
    }
)


def q_logrank_cohorts(sf_dir: str):
    """Log-rank test between the two cohorts' churn survival curves
    (the Kaplan-Meier companion): at each churn time, cohort-0's
    expected events E = d * n0/n and the hypergeometric variance fold
    as NANOUNIT-quantized terms over exact integer risk counts, so
    both running sums are order-independent integers; the final
    chi-square is one mirrored float expression. Same per-user span
    fold as kaplan_meier_churn."""
    from ray.data.aggregate import Max, Min

    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(_date_us(b["ts"])),
            }
        )

    spans = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("t", alias_name="t0"), Max("t", alias_name="t1"))
        .to_pandas()
    )
    day = 24 * 3600 * 1_000_000
    tmax = int(spans["t1"].max())
    dur = (
        (spans["t1"].to_numpy(np.int64) - spans["t0"].to_numpy(np.int64))
        // day
    ).astype(np.int64)
    churned = (
        spans["t1"].to_numpy(np.int64)
        <= tmax - KM_CHURN_DAYS * day
    ).astype(np.int64)
    grp = spans["user_id"].to_numpy(np.int64) % 2
    times = np.unique(dur[churned == 1])
    o0 = 0
    e_nano = 0
    v_nano = 0
    for t in times:
        at = dur >= t
        n = int(at.sum())
        n0 = int((at & (grp == 0)).sum())
        ev = (dur == t) & (churned == 1)
        d = int(ev.sum())
        d0 = int((ev & (grp == 0)).sum())
        o0 += d0
        e = d * 1.0 * n0 / n
        e_nano += int(np.floor(e * 1e9))
        if n > 1:
            v = (
                d * 1.0 * n0 / n
                * (1.0 - n0 * 1.0 / n)
                * (n - d)
                / (n - 1)
            )
            v_nano += int(np.floor(v * 1e9))
    chi2 = np.floor(
        (o0 - e_nano / 1e9)
        * (o0 - e_nano / 1e9)
        / (v_nano / 1e9)
        * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "observed_0": [o0],
            "expected_0_nano": [e_nano],
            "var_nano": [v_nano],
            "logrank_chi2": [float(chi2)],
        }
    ).astype(
        {
            "observed_0": np.int64,
            "expected_0_nano": np.int64,
            "var_nano": np.int64,
        }
    )


SQL_LOGRANK_COHORTS = f"""
WITH u AS (
  SELECT user_id,
         CAST(epoch_us(min(ts)) AS BIGINT) AS t0,
         CAST(epoch_us(max(ts)) AS BIGINT) AS t1
  FROM events GROUP BY user_id
),
mx AS (SELECT CAST(max(t1) AS BIGINT) AS tmax FROM u),
d AS (
  SELECT user_id % 2 AS g,
         (t1 - t0) // 86400000000 AS dur,
         CASE WHEN t1 <= (SELECT tmax FROM mx)
                         - {KM_CHURN_DAYS} * 86400000000
              THEN 1 ELSE 0 END AS churned
  FROM u
),
ev AS (
  SELECT dur AS t,
         CAST(sum(churned) AS BIGINT) AS dd,
         CAST(sum(CASE WHEN g = 0 THEN churned ELSE 0 END)
              AS BIGINT) AS d0
  FROM d GROUP BY dur HAVING sum(churned) > 0
),
terms AS (
  SELECT ev.t, ev.dd, ev.d0,
         (SELECT CAST(count(*) AS BIGINT) FROM d
          WHERE d.dur >= ev.t) AS n,
         (SELECT CAST(count(*) AS BIGINT) FROM d
          WHERE d.dur >= ev.t AND d.g = 0) AS n0
  FROM ev
),
agg AS (
  SELECT CAST(sum(d0) AS BIGINT) AS o0,
         CAST(sum(CAST(floor(dd * 1.0 * n0 / n * 1e9) AS BIGINT))
              AS BIGINT) AS e_nano,
         CAST(sum(CASE WHEN n > 1 THEN
                CAST(floor(dd * 1.0 * n0 / n * (1.0 - n0 * 1.0 / n)
                           * (n - dd) / (n - 1) * 1e9) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS v_nano
  FROM terms
)
SELECT o0 AS observed_0, e_nano AS expected_0_nano,
       v_nano AS var_nano,
       floor((o0 - e_nano / 1e9) * (o0 - e_nano / 1e9)
             / (v_nano / 1e9) * 1e6) / 1e6 AS logrank_chi2
FROM agg
"""


REGISTRY.update(
    {"logrank_cohorts": (q_logrank_cohorts, SQL_LOGRANK_COHORTS)}
)


def q_uniformity_hours(sf_dir: str):
    """Chi-square uniformity test of event arrival over hour-of-day —
    the load-skew detector: chi2 = sum (24*n_h - N)^2 / (24*N) keeps
    the numerator an exact integer sum (cross-multiplied against the
    uniform expectation), with a single quantized division. One
    24-row exchange."""
    ds = _pq(sf_dir, "events", ["ts"])

    def partial(b: pa.Table) -> pa.Table:
        hod = (
            _date_us(b["ts"]) // (3600 * 1_000_000)
        ) % 24
        cnt = np.bincount(hod, minlength=24).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(np.arange(24, dtype=np.int64)),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("h")
    )
    n_h = np.zeros(24, np.int64)
    n_h[h["h"].to_numpy()] = h["n"].to_numpy()
    N = int(n_h.sum())
    num = int(sum((24 * int(x) - N) ** 2 for x in n_h))
    chi2 = np.floor(num * 1.0 / (24 * N) * 1e6) / 1e6
    return pd.DataFrame(
        {"n": [N], "chi2_uniform": [float(chi2)], "dof": [23]}
    ).astype({"n": np.int64, "dof": np.int64})


SQL_UNIFORMITY_HOURS = """
WITH h AS (
  SELECT (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
SELECT (SELECT total FROM t) AS n,
       floor(CAST(sum((24 * n - (SELECT total FROM t))
                      * (24 * n - (SELECT total FROM t))) AS BIGINT)
             * 1.0 / (24 * (SELECT total FROM t)) * 1e6) / 1e6
         AS chi2_uniform,
       CAST(23 AS BIGINT) AS dof
FROM h
"""


REGISTRY.update(
    {"uniformity_hours": (q_uniformity_hours, SQL_UNIFORMITY_HOURS)}
)


def q_kruskal_hours(sf_dir: str):
    """Kruskal-Wallis H across hour-of-day groups — the
    nonparametric ANOVA (does spend RANK differ by hour?). Ranks are
    globally unique under (cents, event_id), assigned WITHOUT a
    global sort: a distinct-cents-bounded count table broadcasts as
    a sorted CDF (rank base = #values strictly smaller), and
    within-value tie positions resolve inside coarse value-hash
    buckets — so per-group rank sums fold as exact integers through
    one exchange. Each R_g^2/n_g term milli-quantizes to an integer
    (Python int / HUGEINT) before the order-independent sum; H is
    one mirrored float expression."""
    from ..functions.hashing import splitmix64

    ds = _pq(sf_dir, "events", ["event_id", "ts", "value"])

    def val_partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, n = np.unique(cents, return_counts=True)
        return pa.table(
            {
                "v": pa.array(u, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    vals = (
        ds.map_batches(val_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("v")
    )
    v_sorted = vals["v"].to_numpy(np.int64)
    cum_less = np.r_[0, np.cumsum(vals["n"].to_numpy(np.int64))[:-1]]
    B = 64

    def pre(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        g = (
            (_date_us(b["ts"]) // (3600 * 1_000_000)) % 24
        ).astype(np.int64)
        bucket = (
            splitmix64(cents.astype(np.uint64)) % np.uint64(B)
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "v": pa.array(cents, pa.int64()),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "g": pa.array(g, pa.int64()),
            }
        )

    def per_bucket(gd: pd.DataFrame) -> pd.DataFrame:
        gd = gd.sort_values(["v", "event_id"], kind="mergesort")
        v = gd["v"].to_numpy(np.int64)
        gg = gd["g"].to_numpy(np.int64)
        new = np.r_[True, v[1:] != v[:-1]]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        tie = np.arange(len(v), dtype=np.int64) - starts[seg] + 1
        base = cum_less[np.searchsorted(v_sorted, v)]
        rnk = base + tie
        out = (
            pd.DataFrame({"g": gg, "r": rnk})
            .groupby("g", sort=False)
            .agg(r=("r", "sum"), n=("r", "size"))
            .reset_index()
        )
        return out.astype(np.int64)

    rg = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
        .groupby("g")
        .sum()
        .reset_index()
    )
    N = int(rg["n"].sum())
    s_q = 0
    for _, row in rg.iterrows():
        r = int(row["r"]) * 1.0
        t = r * r / int(row["n"])
        s_q += int(np.floor(t * 1e3))
    h = np.floor(
        (
            12.0 / (N * (N + 1.0)) * (float(s_q) / 1e3)
            - 3.0 * (N + 1.0)
        )
        * 1e6
    ) / 1e6
    return pd.DataFrame(
        {"n": [N], "groups": [len(rg)], "h_stat": [float(h)]}
    ).astype({"n": np.int64, "groups": np.int64})


SQL_KRUSKAL_HOURS = """
WITH r AS (
  SELECT (CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24 AS g,
         CAST(row_number() OVER (
           ORDER BY CAST(round(value * 100.0) AS BIGINT), event_id)
         AS BIGINT) AS rnk
  FROM events
),
rg AS (
  SELECT g, CAST(sum(rnk) AS HUGEINT) AS r,
         CAST(count(*) AS BIGINT) AS n
  FROM r GROUP BY g
),
st AS (SELECT CAST(sum(n) AS BIGINT) AS n,
              CAST(count(*) AS BIGINT) AS k FROM rg),
terms AS (
  SELECT CAST(floor((r * 1.0) * (r * 1.0) / n * 1e3) AS HUGEINT) AS t
  FROM rg
)
SELECT (SELECT n FROM st) AS n,
       (SELECT k FROM st) AS groups,
       floor((12.0 / ((SELECT n FROM st)
                      * ((SELECT n FROM st) + 1.0))
              * (CAST((SELECT sum(t) FROM terms) AS DOUBLE) / 1e3)
              - 3.0 * ((SELECT n FROM st) + 1.0)) * 1e6) / 1e6
         AS h_stat
"""


REGISTRY.update(
    {"kruskal_hours": (q_kruskal_hours, SQL_KRUSKAL_HOURS)}
)


def q_partial_corr_users(sf_dir: str):
    """Partial correlation between per-user spend and purchase count
    CONTROLLING for total activity — the confounder-adjusted
    association (busy users buy more of everything). All three
    pairwise Pearson correlations come from one user fold's exact
    integer moments; the partial r is one mirrored float expression
    r_xy.z = (rxy - rxz*ryz) / (sqrt(1-rxz^2) * sqrt(1-ryz^2))."""
    import math

    ds = _pq(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        isp = (
            pc.equal(b["event_type"], "purchase")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        us, inv = np.unique(u, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "x": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64),
                    pa.int64(),
                ),
                "y": pa.array(
                    np.bincount(inv, weights=isp).astype(np.int64),
                    pa.int64(),
                ),
                "z": pa.array(
                    np.bincount(inv).astype(np.int64), pa.int64()
                ),
            }
        )

    users = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("x", alias_name="x"),
            Sum("y", alias_name="y"),
            Sum("z", alias_name="z"),
        )
        .to_pandas()
    )
    x = users["x"].to_numpy(np.int64).astype(object)
    y = users["y"].to_numpy(np.int64).astype(object)
    z = users["z"].to_numpy(np.int64).astype(object)
    n = len(x)

    def corr(a, b_):
        sa, sb = int(sum(a)), int(sum(b_))
        sab = int(sum(p * q for p, q in zip(a, b_)))
        saa = int(sum(p * p for p in a))
        sbb = int(sum(q * q for q in b_))
        return (n * sab - sa * sb) * 1.0 / (
            math.sqrt((n * saa - sa * sa) * 1.0)
            * math.sqrt((n * sbb - sb * sb) * 1.0)
        )

    rxy, rxz, ryz = corr(x, y), corr(x, z), corr(y, z)
    pr = np.floor(
        (rxy - rxz * ryz)
        / (math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz))
        * 1e6
    ) / 1e6
    return pd.DataFrame(
        {
            "n": [n],
            "r_xy": [float(np.floor(rxy * 1e6) / 1e6)],
            "partial_r": [float(pr)],
        }
    ).astype({"n": np.int64})


SQL_PARTIAL_CORR_USERS = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS z
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(z) AS HUGEINT) AS sz,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(x * z) AS HUGEINT) AS sxz,
         CAST(sum(y * z) AS HUGEINT) AS syz,
         CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(y * y) AS HUGEINT) AS syy,
         CAST(sum(z * z) AS HUGEINT) AS szz
  FROM u
),
r AS (
  SELECT n,
         (n * sxy - sx * sy) * 1.0
           / (sqrt((n * sxx - sx * sx) * 1.0)
              * sqrt((n * syy - sy * sy) * 1.0)) AS rxy,
         (n * sxz - sx * sz) * 1.0
           / (sqrt((n * sxx - sx * sx) * 1.0)
              * sqrt((n * szz - sz * sz) * 1.0)) AS rxz,
         (n * syz - sy * sz) * 1.0
           / (sqrt((n * syy - sy * sy) * 1.0)
              * sqrt((n * szz - sz * sz) * 1.0)) AS ryz
  FROM m
)
SELECT n, floor(rxy * 1e6) / 1e6 AS r_xy,
       floor((rxy - rxz * ryz)
             / (sqrt(1.0 - rxz * rxz) * sqrt(1.0 - ryz * ryz))
             * 1e6) / 1e6 AS partial_r
FROM r
"""


REGISTRY.update(
    {"partial_corr_users": (q_partial_corr_users, SQL_PARTIAL_CORR_USERS)}
)


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


def q_runs_test_hours(sf_dir: str):
    """Wald-Wolfowitz runs test on the hourly count series vs its
    median: too FEW runs of above/below-median hours means clustered
    load, too many means oscillation. Runs, n_above and n_below are
    exact integers over the time-bounded hourly table (median = the
    lower middle order statistic, an explicit integer convention);
    the z-score against the expected run count is one mirrored float
    expression."""
    import math

    ds = _pq(sf_dir, "events", ["ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = _date_us(b["ts"]) // (3600 * 1_000_000)
        u, n = np.unique(t, return_counts=True)
        return pa.table(
            {
                "hour": pa.array(u, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("hour")
    )
    c = h["n"].to_numpy(np.int64)
    m = len(c)
    med = int(np.sort(c)[(m - 1) // 2])  # lower median
    sign = c > med  # strictly-above vs at-or-below
    n1 = int(sign.sum())
    n2 = m - n1
    runs = 1 + int((sign[1:] != sign[:-1]).sum())
    exp_r = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var_r = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    z = np.floor((runs - exp_r) / math.sqrt(var_r) * 1e6) / 1e6
    return pd.DataFrame(
        {
            "n_hours": [m],
            "runs": [runs],
            "n_above": [n1],
            "z": [float(z)],
        }
    ).astype({"n_hours": np.int64, "runs": np.int64, "n_above": np.int64})


SQL_RUNS_TEST_HOURS = """
WITH h AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hour,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
med AS (
  SELECT c AS m FROM (
    SELECT c, row_number() OVER (ORDER BY c) AS rn,
           count(*) OVER () AS cnt
    FROM h) WHERE rn = (cnt + 1) // 2
),
s AS (
  SELECT hour, CASE WHEN c > (SELECT m FROM med)
                    THEN 1 ELSE 0 END AS sgn
  FROM h
),
w AS (
  SELECT sgn, lag(sgn) OVER (ORDER BY hour) AS prev FROM s
),
m AS (
  SELECT CAST((SELECT count(*) FROM h) AS BIGINT) AS mh,
         CAST((SELECT sum(sgn) FROM s) AS BIGINT) AS n1,
         CAST(1 + (SELECT count(*) FROM w
                   WHERE prev IS NOT NULL AND sgn <> prev)
              AS BIGINT) AS runs
)
SELECT mh AS n_hours, runs, n1 AS n_above,
       floor((runs - (1.0 + 2.0 * n1 * (mh - n1) / (n1 + (mh - n1))))
             / sqrt(2.0 * n1 * (mh - n1)
                    * (2.0 * n1 * (mh - n1) - n1 - (mh - n1))
                    / ((n1 + (mh - n1)) * (n1 + (mh - n1))
                       * (n1 + (mh - n1) - 1.0)))
             * 1e6) / 1e6 AS z
FROM m
"""


REGISTRY.update(
    {
        "cochran_q_docs": (q_cochran_q_docs, SQL_COCHRAN_Q_DOCS),
        "runs_test_hours": (q_runs_test_hours, SQL_RUNS_TEST_HOURS),
    }
)


def q_mst_star_ring(sf_dir: str):
    """Distributed Boruvka minimum spanning tree
    (stages/graph.py:boruvka_mst — per-round per-component min
    outgoing edge under a total (w, key) order, O(log n) rounds, one
    edge scan per round) running the GENERAL algorithm on a planted
    star+ring graph whose unique MST the oracle states in closed
    form: star edges 0->i weigh i, ring edges weigh 10n + node, so
    the MST is exactly the star — n-1 edges totalling n(n-1)/2.
    Union-find is not SQL-expressible; the closed-form instance puts
    the machinery under the value-hash gate (generic correctness vs
    brute Kruskal in tests/test_graph.py)."""
    from ..stages.graph import boruvka_mst

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    n = cust.count()
    # key-base independence: the closed-form oracle (n-1 edges,
    # n(n-1)/2 weight) assumes 0-BASED contiguous node ids — normalize
    # by the min key so the planted instance holds on 1-based TPC-H
    # keys as well as the repo's 0-based synth keys
    base = int(cust.min("c_custkey"))

    def edges(b: pa.Table) -> pa.Table:
        c = (
            b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            - base
        )
        ring_dst = (c + 1) % n
        ring_w = 10 * n + c
        star = c[c > 0]
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([c, np.zeros(len(star), np.int64)]),
                    pa.int64(),
                ),
                "dst": pa.array(
                    np.concatenate([ring_dst, star]), pa.int64()
                ),
                "w": pa.array(
                    np.concatenate([ring_w, star]), pa.int64()
                ),
            }
        )

    mst, n_comp = boruvka_mst(cust.map_batches(edges, batch_format="pyarrow"))
    return pd.DataFrame(
        {
            "n_edges": [mst.num_rows],
            "total_weight": [int(sum(mst["w"].to_pylist()))],
            "n_components": [n_comp],
        }
    ).astype(np.int64)


SQL_MST_STAR_RING = """
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer)
SELECT (SELECT n FROM nn) - 1 AS n_edges,
       (SELECT n FROM nn) * ((SELECT n FROM nn) - 1) // 2
         AS total_weight,
       CAST(1 AS BIGINT) AS n_components
"""


REGISTRY.update(
    {"mst_star_ring": (q_mst_star_ring, SQL_MST_STAR_RING)}
)


#: bounded-hop cheapest-path parameters (cheapest_path_hops)
SSSP_HOPS = 8
SSSP_SOURCE = 0


def q_cheapest_path_hops(sf_dir: str):
    """Weighted single-source cheapest paths within <= 8 hops —
    distributed Bellman-Ford: one edge scan per relaxation round
    against the broadcast distance array (node-bounded, the bfs_hops
    contract; beyond-driver = distances as a keyed Dataset with a
    hash join + groupby-min per round), per-batch per-node minima
    shrink each round's fold. Integer weights make every round exact;
    the identical hop cap on both sides makes the bounded metric
    well-defined. Oracle = the recursive bounded walk with min(cost).
    Returns reachable nodes with their cheapest bounded cost."""
    eds, _n = _ring_chord_edges_ds(sf_dir)

    def with_w(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (s * 7 + d * 3) % 97 + 1
        return pa.table(
            {
                "src": pa.array(s, pa.int64()),
                "dst": pa.array(d, pa.int64()),
                "w": pa.array(w.astype(np.int64), pa.int64()),
            }
        )

    edges = eds.map_batches(with_w, batch_format="pyarrow").materialize()
    INF = np.int64(2**62)
    n = int(_n)
    dist = np.full(n, INF, np.int64)
    dist[SSSP_SOURCE] = 0
    import ray

    for _ in range(SSSP_HOPS):
        ref = ray.put(dist)

        def relax(b: pa.Table, _ref=ref) -> pa.Table:
            dd = ray.get(_ref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            ok = dd[s] < np.int64(2**62)
            if not ok.any():
                return pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            d, cand = d[ok], dd[s[ok]] + w[ok]
            order = np.lexsort((cand, d))
            d, cand = d[order], cand[order]
            first = np.r_[True, d[1:] != d[:-1]]
            return pa.table(
                {
                    "node": pa.array(d[first], pa.int64()),
                    "c": pa.array(cand[first], pa.int64()),
                }
            )

        parts = edges.map_batches(
            relax, batch_format="pyarrow"
        ).to_pandas()
        if len(parts) == 0:
            break
        best = parts.groupby("node")["c"].min()
        nxt = dist.copy()
        idx = best.index.to_numpy(np.int64)
        np.minimum.at(nxt, idx, best.to_numpy(np.int64))
        if np.array_equal(nxt, dist):
            break
        dist = nxt
    reach = np.flatnonzero(dist < INF)
    return pd.DataFrame(
        {"node": reach.astype(np.int64), "cost": dist[reach]}
    ).astype(np.int64)


SQL_CHEAPEST_PATH_HOPS = f"""
WITH RECURSIVE nn AS (SELECT count(*) AS n FROM customer),
e AS (
  SELECT src, dst, (src * 7 + dst * 3) % 97 + 1 AS w FROM (
    SELECT c_custkey AS src,
           (c_custkey + 1) % (SELECT n FROM nn) AS dst
    FROM customer
    UNION ALL
    SELECT c_custkey, (7 * c_custkey + 3) % (SELECT n FROM nn)
    FROM customer
    WHERE c_custkey % 3 = 0
      AND (7 * c_custkey + 3) % (SELECT n FROM nn)
          <> (c_custkey + 1) % (SELECT n FROM nn)
  )
),
walk(node, cost, hops) AS (
  SELECT {SSSP_SOURCE}, CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, walk.cost + e.w, walk.hops + 1
  FROM walk JOIN e ON e.src = walk.node
  WHERE walk.hops < {SSSP_HOPS}
)
SELECT node, CAST(min(cost) AS BIGINT) AS cost
FROM walk GROUP BY node
"""


REGISTRY.update(
    {
        "cheapest_path_hops": (
            q_cheapest_path_hops,
            SQL_CHEAPEST_PATH_HOPS,
        )
    }
)


def q_bartlett_cohorts(sf_dir: str):
    """Bartlett's test of equal variances across the four spend
    cohorts — the assumption check behind anova_cohorts, computed
    from the same exact integer group moments: each sample variance
    is (n*q - s^2) / (n*(n-1)) mirrored, the pooled variance and
    both correction sums fold in explicit group order, and ln is
    ulp-identical on both engines."""
    import math

    users = _stump_user_table(sf_dir).to_pandas()
    x = users["x"].to_numpy(np.int64)
    g = users["user_id"].to_numpy(np.int64) % 4
    moments = []
    for c in range(4):
        xs = x[g == c].astype(object)
        moments.append(
            (len(xs), int(sum(xs)), int(sum(v * v for v in xs)))
        )
    k = 4
    N = sum(m[0] for m in moments)
    var = [
        (n * q - s * s) * 1.0 / (n * (n - 1)) for n, s, q in moments
    ]
    sp = 0.0
    for (n, _s, _q), v in zip(moments, var):
        sp = sp + (n - 1) * v
    sp = sp / (N - k)
    lnsum = 0.0
    inv = 0.0
    for (n, _s, _q), v in zip(moments, var):
        lnsum = lnsum + (n - 1) * math.log(v)
        inv = inv + 1.0 / (n - 1)
    stat = ((N - k) * math.log(sp) - lnsum) / (
        1.0 + (inv - 1.0 / (N - k)) / (3.0 * (k - 1))
    )
    return pd.DataFrame(
        {
            "n": [N],
            "k": [k],
            "bartlett_chi2": [float(np.floor(stat * 1e6) / 1e6)],
        }
    ).astype({"n": np.int64, "k": np.int64})


SQL_BARTLETT_COHORTS = """
WITH u AS (
  SELECT user_id % 4 AS g,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY user_id
),
m AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS HUGEINT) AS s,
         CAST(sum(x * x) AS HUGEINT) AS q
  FROM u GROUP BY g
),
v AS (
  SELECT g, n, (n * q - s * s) * 1.0 / (n * (n - 1)) AS var
  FROM m
),
piv AS (
  SELECT max(CASE WHEN g = 0 THEN n END) AS n0,
         max(CASE WHEN g = 0 THEN var END) AS v0,
         max(CASE WHEN g = 1 THEN n END) AS n1,
         max(CASE WHEN g = 1 THEN var END) AS v1,
         max(CASE WHEN g = 2 THEN n END) AS n2,
         max(CASE WHEN g = 2 THEN var END) AS v2,
         max(CASE WHEN g = 3 THEN n END) AS n3,
         max(CASE WHEN g = 3 THEN var END) AS v3,
         CAST(sum(n) AS BIGINT) AS nn
  FROM v
)
SELECT nn AS n, CAST(4 AS BIGINT) AS k,
       floor(((nn - 4) * ln(((((0.0 + (n0 - 1) * v0)
                                + (n1 - 1) * v1)
                               + (n2 - 1) * v2)
                              + (n3 - 1) * v3) / (nn - 4))
              - ((((0.0 + (n0 - 1) * ln(v0)) + (n1 - 1) * ln(v1))
                  + (n2 - 1) * ln(v2)) + (n3 - 1) * ln(v3)))
             / (1.0 + (((((0.0 + 1.0 / (n0 - 1)) + 1.0 / (n1 - 1))
                         + 1.0 / (n2 - 1)) + 1.0 / (n3 - 1))
                       - 1.0 / (nn - 4)) / (3.0 * 3))
             * 1e6) / 1e6 AS bartlett_chi2
FROM piv
"""


REGISTRY.update(
    {"bartlett_cohorts": (q_bartlett_cohorts, SQL_BARTLETT_COHORTS)}
)


# ================================================= round-4 additions
# Scale-pattern queries: incremental-view partial-state merge,
# windowed streaming dedup, and an aggregate composed over the
# adaptive kgquery exchange.


def q_incremental_agg_events(sf_dir: str):
    """Incremental view maintenance (IVM) — the continuously-ingested
    aggregate pattern at 100 TB: the events table is split at a fixed
    event-time cutoff into BASE and DELTA; each side folds to
    MERGEABLE per-type partial states (count, integer micro-unit sum,
    min/max value) with per-batch pre-aggregation so only
    |types|-bounded partials reach either exchange; the two state
    tables then merge driver-side (types-bounded) and finalize.
    Oracle: the plain full-table GROUP BY — proving merged
    incremental state == full recompute, the IVM invariant the
    reference's per-paper re-extraction loop never needed but a
    streaming store does. Micro-units (value x 1e6, rounded) keep the
    fold exact under any partitioning."""
    from ray.data.aggregate import Count, Max, Min, Sum

    # fixed event-time split point: 2024-01-15T00:00Z — mid-range of
    # the synth events table, so BOTH sides carry real rows and the
    # merge step is exercised (an empty side is still correct)
    cutoff_us = 1_705_276_800_000_000

    def states(ds):
        def partial(b: pa.Table) -> pa.Table:
            et = b["event_type"].to_numpy(zero_copy_only=False)
            v = b["value"].to_numpy(zero_copy_only=False)
            micro = np.rint(v * 1e6).astype(np.int64)
            df = (
                pd.DataFrame({"event_type": et, "micro": micro})
                .groupby("event_type", sort=False)
                .agg(
                    n=("micro", "size"),
                    s=("micro", "sum"),
                    mn=("micro", "min"),
                    mx=("micro", "max"),
                )
                .reset_index()
            )
            return pa.Table.from_pandas(df, preserve_index=False)

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(
                Sum("n", alias_name="n"),
                Sum("s", alias_name="s"),
                Min("mn", alias_name="mn"),
                Max("mx", alias_name="mx"),
            )
            .to_pandas()  # |event types| rows — driver-bounded
        )

    ds = _pq(sf_dir, "events", ["ts", "event_type", "value"])

    def side(keep_base: bool):
        def fn(b: pa.Table) -> pa.Table:
            us = pc.cast(b["ts"], pa.int64())
            m = (
                pc.less(us, cutoff_us)
                if keep_base
                else pc.greater_equal(us, cutoff_us)
            )
            return b.filter(m)

        return fn

    base = states(ds.map_batches(side(True), batch_format="pyarrow"))
    delta = states(ds.map_batches(side(False), batch_format="pyarrow"))
    # merge the two state tables — the IVM step (associative folds)
    merged = (
        pd.concat([base, delta], ignore_index=True)
        .groupby("event_type", sort=True)
        .agg(n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"),
             mx=("mx", "max"))
        .reset_index()
    )
    merged["sum_value"] = (merged.pop("s") / 1e6).round(4)
    merged["min_value"] = (merged.pop("mn") / 1e6).round(6)
    merged["max_value"] = (merged.pop("mx") / 1e6).round(6)
    return merged[
        ["event_type", "n", "sum_value", "min_value", "max_value"]
    ]


SQL_INCREMENTAL_AGG_EVENTS = """
SELECT event_type,
       count(*) AS n,
       round(sum(round(value * 1e6) / 1e6), 4) AS sum_value,
       round(min(round(value * 1e6) / 1e6), 6) AS min_value,
       round(max(round(value * 1e6) / 1e6), 6) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_window_dedup_events(sf_dir: str):
    """Streaming windowed dedup: an event is a duplicate when the
    same (user_id, event_type) already fired inside the same 1h
    tumbling event-time window; output = kept events per type. The
    exchange ships only per-batch-DEDUPED (user, type, window) keys
    (the partial-distinct shrink — duplicates die in the map side),
    then a coarse hash(user)-bucketed group finishes the distinct;
    per-type counts fold from |buckets| x |types| partials. The
    streaming analog: a keyed TTL cache, expressed as its batch
    equivalent."""
    from ray.data.aggregate import Sum

    from ..functions.hashing import splitmix64

    ds = _pq(sf_dir, "events", ["ts", "user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        win = us // 3_600_000_000
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"user_id": u, "event_type": et, "win": win}
        ).drop_duplicates()
        bucket = (
            splitmix64(df["user_id"].to_numpy().astype(np.uint64))
            % np.uint64(COARSE_USER_BUCKETS)
        ).astype(np.int64)
        df["bucket"] = bucket
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        kept = g.drop_duplicates(["user_id", "event_type", "win"])
        out = (
            kept.groupby("event_type", sort=False)
            .size()
            .reset_index(name="kept")
        )
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finish, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("kept", alias_name="kept"))
        .sort("event_type")
    )


SQL_WINDOW_DEDUP_EVENTS = """
SELECT event_type, count(*) AS kept FROM (
  SELECT DISTINCT user_id, event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win
  FROM events)
GROUP BY event_type ORDER BY event_type
"""


def q_kg_twohop_agg_customers(sf_dir: str):
    """Aggregate composed over the adaptive kgquery exchange: count
    of customers per region reachable via the two-hop path
    cust -in_nation-> nation -in_region-> region (stages/kgquery.py
    two_hop, now spool-re-split on hash(mid)); the oracle is the
    three-way join + GROUP BY. Proves the kgquery output composes
    into downstream Dataset aggregates without materializing the
    path set driver-side."""
    from ray.data.aggregate import Count

    from ..stages.kgquery import two_hop

    paths = two_hop(_cust_triples(sf_dir), "in_nation", "in_region")
    return (
        paths.groupby("object")
        .aggregate(Count(alias_name="n_customers"))
        .sort("object")
    )


SQL_KG_TWOHOP_AGG_CUSTOMERS = """
SELECT 'region/' || r_name AS object,
       count(*) AS n_customers
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name ORDER BY object
"""


REGISTRY.update(
    {
        "incremental_agg_events": (
            q_incremental_agg_events,
            SQL_INCREMENTAL_AGG_EVENTS,
        ),
        "window_dedup_events": (
            q_window_dedup_events,
            SQL_WINDOW_DEDUP_EVENTS,
        ),
        "kg_twohop_agg_customers": (
            q_kg_twohop_agg_customers,
            SQL_KG_TWOHOP_AGG_CUSTOMERS,
        ),
    }
)


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


REGISTRY.update(
    {"fim_transform_docs": (q_fim_transform_docs, _fim_sql())}
)


# --------------------------------------------------- TTL dedup (events)


TTL_DEDUP_US = 1_800_000_000  # 30 min of event time


def q_ttl_dedup_events(sf_dir: str):
    """Streaming TTL dedup with KEPT-ANCHOR semantics over the events
    table: an event survives iff no event with the same
    (user_id, event_type) was KEPT in the preceding 30 min — chains
    re-anchor on kept events, which no single SQL window function
    expresses (LAG compares to the previous ROW). Engine:
    stages/ttl_dedup.py — one coarse hash(key) exchange, per-group
    segmented sweep iterating once per KEPT event. Oracle: recursive
    CTE carrying the anchor down each key's rn-chain (kept iff
    ts == anchor). Output: kept events per type."""
    from ray.data.aggregate import Count

    from ..stages.ttl_dedup import ttl_dedup

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def to_us(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.column_names.index("ts"),
            "ts",
            pc.cast(b["ts"], pa.int64()),
        )

    kept = ttl_dedup(
        ds.map_batches(to_us, batch_format="pyarrow"),
        key_cols=["user_id", "event_type"],
        ts_col="ts",
        ttl_us=TTL_DEDUP_US,
        id_col="event_id",
    )
    return (
        kept.groupby("event_type")
        .aggregate(Count(alias_name="kept"))
        .sort("event_type")
    )


SQL_TTL_DEDUP_EVENTS = f"""
WITH RECURSIVE ordered AS (
  SELECT user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS ts,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
chain AS (
  SELECT user_id, event_type, rn, ts, ts AS anchor
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_type, o.rn, o.ts,
         CASE WHEN o.ts - c.anchor > {TTL_DEDUP_US}
              THEN o.ts ELSE c.anchor END
  FROM ordered o
  JOIN chain c ON o.user_id = c.user_id
              AND o.event_type = c.event_type
              AND o.rn = c.rn + 1
)
SELECT event_type, count(*) AS kept
FROM chain WHERE ts = anchor
GROUP BY event_type ORDER BY event_type
"""


REGISTRY.update(
    {"ttl_dedup_events": (q_ttl_dedup_events, SQL_TTL_DEDUP_EVENTS)}
)


# --------------------------------------- time-decayed aggregates


DECAY_HALF_LIFE_US = 86_400_000_000  # 1 day of event time


def q_decayed_counts_events(sf_dir: str):
    """Exponentially time-decayed count + value sum per event type —
    the streaming freshness-weighted aggregate (each event contributes
    2^(-(t_ref - ts)/half_life), so yesterday's event counts half of
    today's). t_ref = the table's max ts, computed in the same scan's
    partial fold (no second pass): each batch emits per-type partials
    of (sum 2^(ts/h), sum v*2^(ts/h), max ts) — the decay factors out
    as 2^(-t_ref/h) AFTER the fold, which is what makes this partial-
    aggregable at all. Scale: |types|-bounded exchange; floats enter
    only in the final scaling step, rounded for the value-hash."""
    from ray.data.aggregate import Max, Sum

    h = float(DECAY_HALF_LIFE_US)

    # exponent-range discipline: exp2 of an absolute us/h overflows
    # double (ts ~1.7e15 / 8.6e10 ~ 2e4 -> 2^2e4). Every exponent
    # below is kept RELATIVE: per-batch to the batch min (span
    # asserted < MAX_BATCH_HL half-lives — a batch spanning more
    # fails LOUDLY instead of returning inf), per-partial to its
    # 512-half-life ERA floor (factor < 2^512), and the final
    # era -> t_ref scaling is always <= 0 (underflow to 0.0 is the
    # CORRECT contribution of data thousands of half-lives stale).
    # No fixed calendar epoch anywhere, so arbitrarily-late event
    # times can't push the rebase factor to inf (round-4 advisory).
    MAX_BATCH_HL = 256.0
    ERA_US = int(512 * h)

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False)
        base = int(us.min()) if len(us) else 0
        if len(us) and (int(us.max()) - base) / h >= MAX_BATCH_HL:
            raise ValueError(
                "decayed_counts: one batch spans "
                f"{(int(us.max()) - base) / h:.0f} half-lives "
                f"(>= {MAX_BATCH_HL:.0f}); the per-batch partial would "
                "overflow float64. Shrink the block/batch size or "
                "raise the half-life."
            )
        w = np.exp2((us - base) / h)
        df = pd.DataFrame(
            {"event_type": et, "w": w, "wv": w * v, "mx": us, "base": base}
        )
        g = (
            df.groupby("event_type", sort=False)
            .agg(w=("w", "sum"), wv=("wv", "sum"), mx=("mx", "max"))
            .reset_index()
        )
        g["base"] = base
        return pa.Table.from_pandas(g, preserve_index=False)

    # rebase each partial to its ERA floor (era = base // ERA_US, a
    # DATA-DERIVED grid, not a calendar epoch): factor = 2^((base -
    # era_floor)/h) in [1, 2^512) — always representable. Partials
    # then fold per (event_type, era); cross-era combination happens
    # driver-side over a |types| x |eras| table with non-positive
    # exponents only.
    def rebase(b: pa.Table) -> pa.Table:
        base = b["base"].to_numpy(zero_copy_only=False).astype(np.int64)
        era = base // ERA_US
        f = np.exp2((base - era * ERA_US) / h)
        return pa.table(
            {
                "event_type": b["event_type"],
                "era": pa.array(era, pa.int64()),
                "w": pa.array(
                    b["w"].to_numpy(zero_copy_only=False) * f
                ),
                "wv": pa.array(
                    b["wv"].to_numpy(zero_copy_only=False) * f
                ),
                "mx": b["mx"],
            }
        )

    folded = (
        _pq(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(rebase, batch_format="pyarrow")
        .groupby(["event_type", "era"])
        .aggregate(
            Sum("w", alias_name="w"),
            Sum("wv", alias_name="wv"),
            Max("mx", alias_name="mx"),
        )
        .to_pandas()  # |types| x |eras| rows (eras = span/512 HL)
    )
    t_ref = int(folded["mx"].max())
    # era_floor <= base <= ts <= t_ref, so these exponents are <= 0:
    # no overflow possible; stale eras underflow to their true ~0.
    scale = np.exp2(
        (folded["era"].to_numpy(np.int64) * ERA_US - t_ref) / h
    )
    folded = folded.assign(
        w=folded["w"] * scale, wv=folded["wv"] * scale
    )
    g = (
        folded.groupby("event_type", sort=False)[["w", "wv"]]
        .sum()
        .reset_index()
    )
    out = pd.DataFrame(
        {
            "event_type": g["event_type"],
            "decayed_count": g["w"].round(6),
            "decayed_value": g["wv"].round(6),
        }
    ).sort_values("event_type", kind="mergesort").reset_index(drop=True)
    return out


SQL_DECAYED_COUNTS_EVENTS = f"""
WITH t AS (SELECT max(epoch_us(ts)) AS t_ref FROM events)
SELECT event_type,
       round(sum(pow(2.0, (epoch_us(ts) - (SELECT t_ref FROM t))
                          / {float(DECAY_HALF_LIFE_US)})), 6)
         AS decayed_count,
       round(sum(value * pow(2.0, (epoch_us(ts) - (SELECT t_ref FROM t))
                                  / {float(DECAY_HALF_LIFE_US)})), 6)
         AS decayed_value
FROM events GROUP BY event_type ORDER BY event_type
"""


REGISTRY.update(
    {
        "decayed_counts_events": (
            q_decayed_counts_events,
            SQL_DECAYED_COUNTS_EVENTS,
        )
    }
)


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


REGISTRY.update(
    {"token_budget_docs": (q_token_budget_docs, _token_budget_sql())}
)


# ----------------------------------- planned multi-pattern BGP (r5)


def q_bgp_customers(sf_dir: str):
    """3-pattern BGP through the planner (stages/kgquery.py:bgp_query)
    over a MATERIALIZED customer triple store:

        (?c in_segment BUILDING) (?c in_nation ?n) (?n in_region ?r)

    — the SPARQL shape the reference's graph notebooks compose with
    hand-written pandas joins (extract_graph.py:298-307). The store
    is materialized to scratch, legs are ordered by row-group-
    statistics selectivity and read through pruned scans, and the two
    joins run the same adaptive spool exchange as every kgquery
    operator. The oracle is the plain 3-way SQL join."""
    import os
    import shutil
    import tempfile

    from ..sources.sinks import materialize_triples
    from ..stages.kgquery import bgp_query
    from ..state.spool import scratch_dir

    os.makedirs(scratch_dir(), exist_ok=True)
    store = tempfile.mkdtemp(prefix="bgp_cust_", dir=scratch_dir())
    try:
        materialize_triples(
            _cust_triples(sf_dir), store, num_partitions=4, resume=False
        )
        out = bgp_query(
            store,
            [
                ("?c", "in_nation", "?n"),
                ("?n", "in_region", "?r"),
                ("?c", "in_segment", "BUILDING"),
            ],
        )
        # every exchange output is spool-materialized; one defensive
        # materialize so the result outlives the scratch store
        return out.materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_BGP_CUSTOMERS = """
SELECT 'cust/' || CAST(c_custkey AS VARCHAR) AS c,
       'nation/' || n_name AS n,
       'region/' || r_name AS r
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE c_mktsegment = 'BUILDING'
"""


REGISTRY.update({"bgp_customers": (q_bgp_customers, SQL_BGP_CUSTOMERS)})
