"""Round-4 scale-design guards: the three formerly fixed-64-bucket
payload exchanges (exact dedup, kgquery, citation shuffle-join) now
route through the spool's adaptive ``fine_col`` re-split. These tests
assert BOTH correctness under forced re-splitting (tiny partition-byte
caps) AND that per-reduce-task partition bytes stay bounded while the
fan-out grows with injected volume — the 100x-scale contract
(mirrors tests/test_spool.py's adaptive-fanout test)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
import pytest

import theoremkb_ray.state.spool as spool


@pytest.fixture()
def split_spy(monkeypatch):
    """Wrap spool._split_oversized to record fan-out growth and
    post-split partition sizes without changing behavior."""
    calls: list[dict] = []
    orig = spool._split_oversized

    def spy(base, key_col, fine_col, keys, expected, max_bytes):
        keys2, exp2 = orig(base, key_col, fine_col, keys, expected, max_bytes)
        calls.append(
            {
                "before": len(keys),
                "after": len(keys2),
                "max_after": max(
                    spool._partition_bytes(base, key_col, k) for k in keys2
                ),
                "cap": max_bytes,
            }
        )
        return keys2, exp2

    monkeypatch.setattr(spool, "_split_oversized", spy)
    return calls


# --------------------------------------------------------- exact dedup


def _doc_table(n=3000, dup_every=10, payload=512):
    ids = [f"d{i:06d}" for i in range(n)]
    texts = [
        ("dup-family-%d " % (i % 7)) * (payload // 14)
        if i % dup_every == 0
        else f"unique text {i} " * (payload // 15)
        for i in range(n)
    ]
    langs = [("en", "fr", "de")[i % 3] for i in range(n)]
    return pa.table({"doc_id": ids, "text": texts, "lang": langs})


def _expected_survivors(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas().sort_values(["text", "doc_id"], kind="mergesort")
    return (
        df.drop_duplicates("text", keep="first")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_exact_dedup_resplit_correct_and_bounded(ray_session, split_spy):
    from theoremkb_ray.stages.dedup import exact_dedup

    tbl = _doc_table()
    cap = 32 << 10  # 32 KiB — force re-splitting at test scale
    got = (
        exact_dedup(
            rd.from_arrow(tbl).repartition(8),
            coarse=4,
            max_partition_bytes=cap,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "text", "lang"]]
    )
    pd.testing.assert_frame_equal(got, _expected_survivors(tbl))
    assert split_spy, "re-split path was not exercised"
    rec = split_spy[-1]
    # fan-out grew beyond the 4 coarse buckets AND no reduce task ever
    # reads much more than the cap (one spool file of slack)
    assert rec["after"] > rec["before"]
    assert rec["max_after"] <= 2 * cap


def test_exact_dedup_fanout_grows_with_volume(ray_session, monkeypatch):
    """Inject 4x the rows: bucket count grows, max partition stays
    flat — per-task memory does NOT scale with corpus size."""
    from theoremkb_ray.stages.dedup import exact_dedup

    cap = 32 << 10
    stats = {}
    orig = spool._split_oversized

    def spy(base, key_col, fine_col, keys, expected, max_bytes):
        keys2, exp2 = orig(base, key_col, fine_col, keys, expected, max_bytes)
        stats[stats.pop("_tag")] = (
            len(keys2),
            max(
                spool._partition_bytes(base, key_col, k) for k in keys2
            ),
        )
        return keys2, exp2

    monkeypatch.setattr(spool, "_split_oversized", spy)
    for tag, n in (("small", 1500), ("big", 6000)):
        tbl = _doc_table(n=n)
        stats["_tag"] = tag
        out = exact_dedup(
            rd.from_arrow(tbl).repartition(8),
            coarse=4,
            max_partition_bytes=cap,
        )
        assert out.count() == len(_expected_survivors(tbl))
    nb_small, max_small = stats["small"]
    nb_big, max_big = stats["big"]
    assert nb_big > nb_small  # fan-out scales with volume...
    assert max_big <= 2 * cap and max_small <= 2 * cap  # ...memory doesn't


# ------------------------------------------------------------- kgquery


def _hot_store(n_subj=400, n_mid=3):
    """cites edges funneled through very few mid nodes — the shape
    that lands (almost) everything in one coarse bucket."""
    rows = []
    for i in range(n_subj):
        mid = f"hub{i % n_mid}"
        rows.append((f"s{i:04d}", "cites", mid))
        rows.append((mid, "cites", f"o{i % 11}"))
    tbl = pa.table(
        {
            "subject": pa.array([r[0] for r in rows]),
            "predicate": pa.array([r[1] for r in rows]),
            "object": pa.array([r[2] for r in rows]),
        }
    )
    return rows, rd.from_arrow(tbl).repartition(4)


def _brute_two_hop(rows):
    by_mid_l: dict[str, list] = {}
    by_mid_r: dict[str, list] = {}
    for s, p, o in rows:
        by_mid_l.setdefault(o, []).append(s)
        by_mid_r.setdefault(s, []).append(o)
    out = []
    for mid in set(by_mid_l) & set(by_mid_r):
        for s in by_mid_l[mid]:
            for o in by_mid_r[mid]:
                out.append((s, mid, o))
    return sorted(out)


def test_two_hop_resplit_matches_bruteforce(
    ray_session, split_spy, monkeypatch
):
    from theoremkb_ray.stages.kgquery import two_hop

    monkeypatch.setattr(spool, "MAX_PARTITION_BYTES", 4 << 10)
    rows, ds = _hot_store()
    got = two_hop(ds, "cites", "cites").to_pandas()
    got_t = sorted(zip(got["subject"], got["mid"], got["object"]))
    assert got_t == _brute_two_hop(rows)
    assert split_spy and split_spy[-1]["after"] > split_spy[-1]["before"]
    # flat-memory bound: no reduce task reads much more than the cap
    assert split_spy[-1]["max_after"] <= 2 * split_spy[-1]["cap"]


def test_star_and_negation_resplit_match(ray_session, monkeypatch):
    from theoremkb_ray.stages.kgquery import neg_pattern, star_join

    monkeypatch.setattr(spool, "MAX_PARTITION_BYTES", 4 << 10)
    rows, ds = _hot_store()
    star = star_join(ds, {"cites": None})
    assert set(star.to_pandas()["subject"]) == {
        s for s, p, o in rows if p == "cites"
    }
    neg = neg_pattern(ds, have=("cites", None), lack=("cites", "o0"))
    have = {s for s, p, o in rows if p == "cites"}
    lack = {s for s, p, o in rows if p == "cites" and o == "o0"}
    assert set(neg.to_pandas()["subject"]) == have - lack


# ------------------------------------------- citation shuffle fallback


def test_citation_shuffle_matches_broadcast(ray_session, monkeypatch):
    """The at-scale hash-join fallback must stay bit-equal to the
    broadcast plan even while its exchange is being re-split."""
    from theoremkb_ray.stages.link import (
        resolve_citations,
        resolve_citations_shuffle,
    )

    monkeypatch.setattr(spool, "MAX_PARTITION_BYTES", 4 << 10)
    rng = np.random.RandomState(7)
    n_docs, n_m = 40, 4000
    links = pa.table(
        {
            "doc_from": pa.array([f"p{i % n_docs}" for i in range(200)]),
            "tag": pa.array([f"[{i % 9}]" for i in range(200)]),
            "doc_to": pa.array([f"t{i % 17}" for i in range(200)]),
        }
    )
    mentions = pa.table(
        {
            "doc_id": pa.array(
                [f"p{rng.randint(n_docs + 5)}" for _ in range(n_m)]
            ),
            "src_entity": pa.array([f"e{i}" for i in range(n_m)]),
            "src_group": pa.array(
                rng.randint(0, 5, n_m).astype(np.int64)
            ),
            "kind": pa.array(
                [("theorem", "lemma")[i % 2] for i in range(n_m)]
            ),
            "num": pa.array([f"{i % 30}" for i in range(n_m)]),
            "cite_tag": pa.array(
                [f"[{rng.randint(12)}]" if i % 5 else "" for i in range(n_m)]
            ),
        }
    )

    def norm(df):
        return (
            df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True)
        )

    # broadcast path needs last-row-wins dict semantics on dup keys;
    # make links keys unique so both plans are comparable
    ldf = links.to_pandas().drop_duplicates(
        ["doc_from", "tag"], keep="last"
    )
    links_u = pa.Table.from_pandas(ldf, preserve_index=False)
    b = norm(
        resolve_citations(rd.from_arrow(mentions), links_u).to_pandas()
    )
    s = norm(
        resolve_citations_shuffle(
            rd.from_arrow(mentions).repartition(6),
            rd.from_arrow(links_u).repartition(3),
            num_buckets=4,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(b, s)


# ----------------------------------------------------- ttl_dedup (r5)


def _ttl_events(n=20_000, n_keys=None, payload=256, seed=5):
    # keys scale with volume (~5 rows/key): the spool re-splits at
    # per-KEY granularity, so fine keys must be plentiful per bucket
    n_keys = n_keys or n // 5
    rng = np.random.RandomState(seed)
    # incompressible payloads — the spool's re-split cap is on
    # COMPRESSED (zstd) bytes, so constant strings would never trip it
    alph = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))
    pay = [
        "".join(alph[rng.randint(0, len(alph), payload)])
        for _ in range(n)
    ]
    return pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": [f"key{rng.randint(n_keys)}" for _ in range(n)],
            "ts": rng.randint(0, 500, n).astype(np.int64),
            "payload": pay,
        }
    )


def _brute_ttl(df, ttl):
    kept, last = set(), {}
    for r in df.sort_values(["k", "ts", "rid"]).itertuples():
        if r.k not in last or r.ts - last[r.k] > ttl:
            last[r.k] = r.ts
            kept.add(r.rid)
    return kept


def test_ttl_dedup_resplit_correct_and_bounded(ray_session, split_spy):
    """Round-5 guard: the ttl_dedup batch exchange (formerly a fixed
    64-bucket NATIVE groupby moving full event payloads) now routes
    through the spool's fine_col re-split — correctness under forced
    re-splitting AND flat per-reduce-task bytes."""
    from theoremkb_ray.stages.ttl_dedup import ttl_dedup

    df = _ttl_events()
    cap = 16 << 10
    ttl = 7
    out = ttl_dedup(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(8),
        ["k"],
        ts_col="ts",
        ttl_us=ttl,
        id_col="rid",
        max_partition_bytes=cap,
    ).to_pandas()
    assert set(out["rid"]) == _brute_ttl(df, ttl)
    assert list(out.columns) == ["rid", "k", "ts", "payload"]
    assert split_spy, "re-split path was not exercised"
    rec = split_spy[-1]
    assert rec["after"] > rec["before"]
    # 3x slack (vs exact_dedup's 2x): ttl's fine key is per-EVENT-KEY
    # (~5 rows of payload each), so a sub-bucket's size quantum is
    # chunky, and at a 16 KiB test cap the per-file feather framing
    # is a visible fraction — same slack test_spool's own volume
    # test allows. The structural claim (volume-independent bound)
    # is the fanout-grows test below.
    assert rec["max_after"] <= 3 * cap


def test_ttl_dedup_fanout_grows_with_volume(ray_session, monkeypatch):
    """4x the events: bucket count grows, max partition bytes stay
    flat — per-reduce-task memory does NOT scale with event volume."""
    from theoremkb_ray.stages.ttl_dedup import ttl_dedup

    cap = 16 << 10
    ttl = 7
    stats = {}
    orig = spool._split_oversized

    def spy(base, key_col, fine_col, keys, expected, max_bytes):
        keys2, exp2 = orig(base, key_col, fine_col, keys, expected, max_bytes)
        stats[stats.pop("_tag")] = (
            len(keys2),
            max(spool._partition_bytes(base, key_col, k) for k in keys2),
        )
        return keys2, exp2

    monkeypatch.setattr(spool, "_split_oversized", spy)
    for tag, n in (("small", 10_000), ("big", 40_000)):
        df = _ttl_events(n=n)
        stats["_tag"] = tag
        out = ttl_dedup(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(8),
            ["k"],
            ts_col="ts",
            ttl_us=ttl,
            id_col="rid",
            max_partition_bytes=cap,
        )
        assert set(out.to_pandas()["rid"]) == _brute_ttl(df, ttl)
    nb_small, max_small = stats["small"]
    nb_big, max_big = stats["big"]
    assert nb_big > nb_small
    assert max_big <= 3 * cap and max_small <= 3 * cap


def test_ttl_dedup_empty_input_keeps_schema(ray_session):
    from theoremkb_ray.stages.ttl_dedup import ttl_dedup

    empty = pa.table(
        {
            "rid": pa.array([], pa.int64()),
            "k": pa.array([], pa.string()),
            "ts": pa.array([], pa.int64()),
        }
    )
    out = ttl_dedup(rd.from_arrow(empty), ["k"], ts_col="ts", id_col="rid")
    assert out.count() == 0
    assert set(out.schema().names) == {"rid", "k", "ts"}


# ----------------------------------------- stratified_sample (r5)


def test_stratified_sample_prune_bounds_exchange(ray_session):
    """Round-5 guard: one low-cardinality class can never land whole
    on one reduce task — the per-batch partial prunes every group to
    n_per_group rows BEFORE the exchange, so exchange rows are
    <= blocks x groups x n per group."""
    from theoremkb_ray.stages.sampling import (
        _stratified_prune_batch,
        stratified_sample,
    )
    from theoremkb_ray.functions.hashing import key_rank64

    n, n_per = 30_000, 5
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(["en"] * (n // 2) + ["fr"] * (n // 2)),
        }
    )
    # the per-batch bound, asserted directly on the partial
    pruned = _stratified_prune_batch(tbl, "lang", "doc_id", n_per, 0)
    assert pruned.num_rows == 2 * n_per  # 2 groups x n, from 30k rows
    # end-to-end: equals the brute-force global n smallest ranks
    out = (
        stratified_sample(
            rd.from_arrow(tbl).repartition(8), "lang", n_per, "doc_id"
        )
        .to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    df["rnk"] = key_rank64(df["doc_id"].to_numpy(), seed=0)
    want = (
        df.sort_values(["lang", "rnk"], kind="mergesort")
        .groupby("lang")
        .head(n_per)
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)[["doc_id", "lang"]]
    )
    pd.testing.assert_frame_equal(out[["doc_id", "lang"]], want)
