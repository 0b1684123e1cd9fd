"""Multi-pattern BGP planner over the pushed-down triple store
(stages/kgquery.py:bgp_plan/bgp_query, round-5): leg ordering by
row-group-statistics selectivity, pruned scans (scanned bytes <
full store, from parquet metrics), join correctness vs brute force,
disconnected-pattern refusal."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _theorem_store(tmp_path, n_docs=300):
    """cites / proved_by / states store with very different predicate
    cardinalities (states >> cites >> proved_by) so selectivity
    ordering is observable."""
    rows = []
    for i in range(n_docs):
        d = f"doc/{i:04d}"
        for t in range(3):
            rows.append((d, "states", f"thm/{i:04d}.{t}"))
        if i % 3 == 0:
            rows.append((f"thm/{i:04d}.0", "proved_by", f"proof/{i:04d}"))
        if i % 2 == 0:
            rows.append((d, "cites", f"doc/{(i * 7) % n_docs:04d}"))
    tbl = pa.table(
        {
            "subject": pa.array([r[0] for r in rows]),
            "predicate": pa.array([r[1] for r in rows]),
            "object": pa.array([r[2] for r in rows]),
            "confidence": pa.array([1.0] * len(rows)),
            "provenance": pa.array(["synth"] * len(rows)),
        }
    )
    from theoremkb_ray.sources.sinks import materialize_triples

    store = os.path.join(str(tmp_path), "store")
    # small row groups so predicate/subject statistics discriminate
    # at test scale (the store sorts subject-first; doc/ vs thm/
    # subjects cluster the predicates)
    materialize_triples(
        rd.from_arrow(tbl), store, num_partitions=3, resume=False,
        row_group_rows=64,
    )
    return rows, store


def _brute_bgp(rows):
    """?a cites ?b . ?b states ?t . ?t proved_by ?p"""
    states = {}
    proved = {}
    for s, p, o in rows:
        if p == "states":
            states.setdefault(s, []).append(o)
        elif p == "proved_by":
            proved.setdefault(s, []).append(o)
    out = []
    for s, p, o in rows:
        if p != "cites":
            continue
        for t in states.get(o, []):
            for pr in proved.get(t, []):
                out.append((s, o, t, pr))
    return sorted(out)


def test_bgp_three_pattern_chain_matches_bruteforce(
    ray_session, tmp_path
):
    from theoremkb_ray.stages.kgquery import bgp_query

    rows, store = _theorem_store(tmp_path)
    got = bgp_query(
        store,
        [
            ("?a", "cites", "?b"),
            ("?b", "states", "?t"),
            ("?t", "proved_by", "?p"),
        ],
    ).to_pandas()
    got_t = sorted(zip(got["a"], got["b"], got["t"], got["p"]))
    want = _brute_bgp(rows)
    assert got_t == want and len(want) > 0


def test_bgp_plan_orders_by_selectivity_and_prunes(
    ray_session, tmp_path
):
    from theoremkb_ray.stages.kgquery import (
        bgp_plan,
        pattern_scan_stats,
    )

    rows, store = _theorem_store(tmp_path)
    plan = bgp_plan(
        store,
        [
            ("?a", "cites", "?b"),
            ("?b", "states", "?t"),
            ("?t", "proved_by", "?p"),
        ],
    )
    # first leg = globally most selective; every later leg joins on a
    # shared variable
    assert plan[0]["pattern"][1] == "proved_by"
    assert all(p["join_vars"] for p in plan[1:])
    est = [p["est_rows"] for p in plan]
    # estimates are upper bounds on true matches and below the store
    true_counts = {
        "cites": sum(1 for r in rows if r[1] == "cites"),
        "states": sum(1 for r in rows if r[1] == "states"),
        "proved_by": sum(1 for r in rows if r[1] == "proved_by"),
    }
    for p in plan:
        assert p["est_rows"] == true_counts[p["pattern"][1]]
    # est_rows comes from the sink's exact per-partition predicate
    # histograms: strictly ordered proved_by < cites < states
    assert (
        plan[0]["est_rows"]
        == true_counts["proved_by"]
    )
    # PRUNING: a leg whose rows cluster away from other subjects reads
    # strictly less than the store (parquet row-group metrics) — the
    # subject-first sort clusters doc/* row groups away from thm/*
    st = pattern_scan_stats(store, "cites")
    assert 0 < st["est_bytes"] < st["total_bytes"]
    assert st["est_rows"] < st["total_rows"]
    # planner exposes its last plan for observability
    from theoremkb_ray.stages.kgquery import bgp_query

    bgp_query(
        store,
        [("?t", "proved_by", "?p"), ("?b", "states", "?t")],
    ).to_pandas()
    assert len(bgp_query.last_plan) == 2


def test_bgp_disconnected_raises(ray_session, tmp_path):
    from theoremkb_ray.stages.kgquery import bgp_query

    rows, store = _theorem_store(tmp_path, n_docs=30)
    with pytest.raises(ValueError, match="disconnected"):
        bgp_query(
            store,
            [("?a", "cites", "?b"), ("?x", "proved_by", "?y")],
        )


def test_bgp_literal_and_empty_results(ray_session, tmp_path):
    from theoremkb_ray.stages.kgquery import bgp_query

    rows, store = _theorem_store(tmp_path, n_docs=30)
    # literal subject narrows to one chain; legs connect via ?t
    got = bgp_query(
        store,
        [
            ("doc/0000", "states", "?t"),
            ("?t", "proved_by", "?p"),
        ],
    ).to_pandas()
    assert sorted(zip(got["t"], got["p"])) == [
        ("thm/0000.0", "proof/0000")
    ]
    # no-match literal -> typed empty with the right columns
    empty = bgp_query(
        store,
        [
            ("doc/none", "states", "?t"),
            ("?t", "proved_by", "?p"),
        ],
    ).to_pandas()
    assert len(empty) == 0
    assert set(empty.columns) == {"t", "p"}


def test_bgp_optional_left_join_semantics(ray_session, tmp_path):
    """OPTIONAL leg: required rows survive with nulls when the
    optional pattern has no match; matched rows carry the binding."""
    from theoremkb_ray.stages.kgquery import bgp_query

    rows, store = _theorem_store(tmp_path, n_docs=30)
    got = bgp_query(
        store,
        [("?d", "states", "?t")],
        optional=[("?t", "proved_by", "?p")],
    ).to_pandas()
    stated = [(s, o) for s, p, o in rows if p == "states"]
    proved = {s: o for s, p, o in rows if p == "proved_by"}
    assert len(got) == len(stated)  # every required row survives
    by_t = dict(zip(got["t"], got["p"]))
    for d, t in stated:
        want = proved.get(t)
        assert by_t[t] == want or (want is None and pd.isna(by_t[t]))
    # both populated and null cases actually occurred
    assert got["p"].notna().any() and got["p"].isna().any()


def test_bgp_optional_rejects_rebinding_and_disconnected(
    ray_session, tmp_path
):
    from theoremkb_ray.stages.kgquery import bgp_query

    rows, store = _theorem_store(tmp_path, n_docs=12)
    with pytest.raises(ValueError, match="disconnected OPTIONAL"):
        bgp_query(
            store,
            [("?d", "states", "?t")],
            optional=[("?x", "proved_by", "?y")],
        )
    with pytest.raises(ValueError, match="no new variable"):
        bgp_query(
            store,
            [("?d", "states", "?t")],
            optional=[("?d", "cites", "?t")],
        )


def test_reachable_store_bfs_levels(ray_session, tmp_path):
    """Per-hop pruned scans + broadcast frontier must reproduce exact
    BFS levels over the cites edges."""
    from theoremkb_ray.stages.kgquery import reachable_store

    rows, store = _theorem_store(tmp_path, n_docs=60)
    edges = [(s, o) for s, p, o in rows if p == "cites"]
    seeds = ["doc/0000", "doc/0006"]
    # brute BFS
    want = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in (1, 2, 3):
        nxt = {o for s, o in edges if s in frontier} - want.keys()
        for n in nxt:
            want[n] = hop
        frontier = nxt
    got = reachable_store(store, "cites", seeds, max_hops=3)
    assert dict(zip(got["node"], got["hop"])) == want


def test_bgp_minus_drops_matched_bindings(ray_session, tmp_path):
    """MINUS: bindings whose shared vars match the pattern are
    dropped; the pattern's existential vars never join the output."""
    from theoremkb_ray.stages.kgquery import bgp_query

    rows, store = _theorem_store(tmp_path, n_docs=30)
    got = bgp_query(
        store,
        [("?d", "states", "?t")],
        minus=[("?t", "proved_by", "?p")],
    ).to_pandas()
    proved = {s for s, p, o in rows if p == "proved_by"}
    want = sorted(
        (s, o) for s, p, o in rows if p == "states" and o not in proved
    )
    assert sorted(zip(got["d"], got["t"])) == want
    assert set(got.columns) == {"d", "t"}  # no existential ?p
    with pytest.raises(ValueError, match="disconnected MINUS"):
        bgp_query(
            store,
            [("?d", "states", "?t")],
            minus=[("?x", "cites", "?y")],
        )


def test_predicate_stats_manifest_only_and_deltas(
    ray_session, tmp_path
):
    """predicate_stats answers from manifests alone and folds delta
    segments; the planner's est_rows uses the same histograms across
    base + delta."""
    import os

    import ray.data as rd

    from theoremkb_ray.sources.sinks import materialize_triples
    from theoremkb_ray.stages.kgquery import (
        _manifest_pred_rows,
        predicate_stats,
    )

    rows, store = _theorem_store(tmp_path, n_docs=40)
    base = predicate_stats(store)
    want = {}
    for s, p, o in rows:
        want[p] = want.get(p, 0) + 1
    assert dict(zip(base["predicate"], base["n"])) == want
    # append a delta segment with extra cites edges
    extra = pa.table(
        {
            "subject": pa.array([f"doc/n{i}" for i in range(7)]),
            "predicate": pa.array(["cites"] * 7),
            "object": pa.array(["doc/0000"] * 7),
            "confidence": pa.array([1.0] * 7),
            "provenance": pa.array(["delta"] * 7),
        }
    )
    materialize_triples(
        rd.from_arrow(extra),
        os.path.join(store, "delta_000"),
        num_partitions=2,
        resume=False,
    )
    after = predicate_stats(store)
    got = dict(zip(after["predicate"], after["n"]))
    assert got["cites"] == want["cites"] + 7
    assert got["states"] == want["states"]
    assert _manifest_pred_rows(store, "cites") == want["cites"] + 7


def test_reachable_store_alternation_and_inverse(ray_session, tmp_path):
    from theoremkb_ray.stages.kgquery import reachable_store

    rows, store = _theorem_store(tmp_path, n_docs=40)
    # alternation: cites|states from one doc — hop 1 = its citation
    # target AND its stated theorems
    got = reachable_store(
        store, ["cites", "states"], ["doc/0000"], max_hops=1
    )
    hop1 = {
        o for s, p, o in rows
        if s == "doc/0000" and p in ("cites", "states")
    } - {"doc/0000"}  # self-loop stays at hop 0 (min-hop semantics)
    assert {n for n, h in zip(got["node"], got["hop"]) if h == 1} == hop1
    # inverse: ^cites from a cited doc = its citers at hop 1
    target = next(o for s, p, o in rows if p == "cites" and s != o)
    goti = reachable_store(
        store, "cites", [target], max_hops=1, inverse=True
    )
    citers = {
        s for s, p, o in rows if p == "cites" and o == target
    } - {target}
    assert {
        n for n, h in zip(goti["node"], goti["hop"]) if h == 1
    } == citers


def test_bgp_query_sees_delta_segments(ray_session, tmp_path):
    """The planner's scans union delta_NNN segments (read_triples
    layout): a binding introduced only by a delta appears."""
    import os

    from theoremkb_ray.sources.sinks import materialize_triples
    from theoremkb_ray.stages.kgquery import bgp_query

    rows, store = _theorem_store(tmp_path, n_docs=12)
    extra = pa.table(
        {
            "subject": pa.array(["doc/new1"]),
            "predicate": pa.array(["states"]),
            "object": pa.array(["thm/new1.0"]),
            "confidence": pa.array([1.0]),
            "provenance": pa.array(["delta"]),
        }
    )
    materialize_triples(
        rd.from_arrow(extra),
        os.path.join(store, "delta_000"),
        num_partitions=2,
        resume=False,
    )
    got = bgp_query(store, [("?d", "states", "?t")]).to_pandas()
    assert ("doc/new1", "thm/new1.0") in set(zip(got["d"], got["t"]))
    assert len(got) == 1 + sum(1 for r in rows if r[1] == "states")


def test_construct_materializes_and_enables_downstream_queries(
    ray_session, tmp_path
):
    """CONSTRUCT round-trip: derive (?d has_proved_thm ?t) from
    states+proved_by, append as a delta segment, and verify (a) the
    derived predicate appears in manifest-only stats, (b) a follow-up
    BGP uses it, (c) auto-compaction folds it with results
    unchanged."""
    import os

    from theoremkb_ray.pipelines.delta import maybe_compact
    from theoremkb_ray.stages.kgquery import (
        bgp_query,
        materialize_construct,
        predicate_stats,
    )

    rows, store = _theorem_store(tmp_path, n_docs=30)
    res = materialize_construct(
        store,
        [("?d", "states", "?t"), ("?t", "proved_by", "?p")],
        [("?d", "has_proved_thm", "?t")],
    )
    proved = {s for s, p, o in rows if p == "proved_by"}
    want = sorted(
        set(
            (s, o)
            for s, p, o in rows
            if p == "states" and o in proved
        )
    )
    assert res["rows"] == len(want) and res["segment"].endswith(
        "delta_000"
    )
    stats = predicate_stats(store)
    assert (
        dict(zip(stats["predicate"], stats["n"]))["has_proved_thm"]
        == len(want)
    )
    got = bgp_query(store, [("?d", "has_proved_thm", "?t")]).to_pandas()
    assert sorted(zip(got["d"], got["t"])) == want
    # compaction folds the derived segment; query results unchanged
    c = maybe_compact(store, max_segments=1)
    assert c is not None and c["compacted_segments"] == 1
    got2 = bgp_query(store, [("?d", "has_proved_thm", "?t")]).to_pandas()
    assert sorted(zip(got2["d"], got2["t"])) == want


def test_construct_optional_null_suppression_and_unbound_raise(
    ray_session, tmp_path
):
    from theoremkb_ray.stages.kgquery import bgp_construct

    rows, store = _theorem_store(tmp_path, n_docs=30)
    # template var from an OPTIONAL leg: null bindings emit nothing
    got = bgp_construct(
        store,
        [("?d", "states", "?t")],
        [("?t", "proof_of_record", "?p")],
        optional=[("?t", "proved_by", "?p")],
    ).to_pandas()
    want = sorted(
        (s, o) for s, p, o in rows if p == "proved_by"
    )
    assert sorted(zip(got["subject"], got["object"])) == want
    assert set(got["predicate"]) == {"proof_of_record"}
    with pytest.raises(ValueError, match="unbound"):
        bgp_construct(
            store, [("?d", "states", "?t")], [("?d", "x", "?zzz")]
        )


def test_fixpoint_transitivity_closes_chain(ray_session, tmp_path):
    """Forward chaining: (?a succ ?b)(?b succ ?c) -> (?a succ ?c)
    over an 8-node chain reaches the full transitive closure
    (n*(n-1)/2 edges) in O(log n) iterations and then STOPS (an
    iteration deriving nothing new)."""
    import ray.data as rd

    from theoremkb_ray.sources.sinks import materialize_triples, read_triples
    from theoremkb_ray.stages.kgquery import apply_rules_to_fixpoint

    n = 8
    tbl = pa.table(
        {
            "subject": pa.array([f"n/{i}" for i in range(n - 1)]),
            "predicate": pa.array(["succ"] * (n - 1)),
            "object": pa.array([f"n/{i+1}" for i in range(n - 1)]),
        }
    )
    store = os.path.join(str(tmp_path), "chain")
    materialize_triples(
        rd.from_arrow(tbl), store, num_partitions=2, resume=False
    )
    log = apply_rules_to_fixpoint(
        store,
        [
            {
                "patterns": [
                    ("?a", "succ", "?b"),
                    ("?b", "succ", "?c"),
                ],
                "template": [("?a", "succ", "?c")],
            }
        ],
        max_iters=10,
    )
    # converged: last row derived nothing
    assert log.iloc[-1]["derived_new"] == 0
    # chain of 8: closure has 28 edges; doubling => 3 productive iters
    assert len(log) == 4
    trip = read_triples(store).to_pandas()
    edges = set(zip(trip["subject"], trip["object"]))
    want = {
        (f"n/{i}", f"n/{j}")
        for i in range(n)
        for j in range(i + 1, n)
    }
    assert edges == want and len(trip) == n * (n - 1) // 2
