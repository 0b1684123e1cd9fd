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
