"""Triple-store query operators: pattern filter, two-hop, co-citation."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.kgquery import (
    cocitation_pairs,
    triple_pattern,
    two_hop,
)


def _store(rows, parallelism=1):
    tbl = pa.table(
        {
            "subject": pa.array([r[0] for r in rows], pa.string()),
            "predicate": pa.array([r[1] for r in rows], pa.string()),
            "object": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ds = rd.from_arrow(tbl)
    if parallelism > 1:
        ds = ds.repartition(parallelism)
    return ds


TRIPLES = [
    ("org/a/thm1", "cites", "org/x"),
    ("org/a/thm1", "cites", "org/y"),
    ("org/a/thm2", "cites", "org/x"),
    ("org/b/thm1", "cites", "org/x"),
    ("org/b/thm1", "cites", "org/y"),
    ("org/b/thm2", "cites", "org/z"),
    ("org/a/thm1", "proved_by", "org/a/prf1"),
    ("org/a/prf1", "states", "org/a"),
    ("org/b/thm2", "proved_by", "org/b/prf2"),
]


def _brute_cocite(rows, predicate="cites"):
    by_obj: dict[str, set] = {}
    for s, p, o in rows:
        if p == predicate:
            by_obj.setdefault(o, set()).add(s)
    out: dict[tuple, int] = {}
    for subs in by_obj.values():
        for a, b in itertools.combinations(sorted(subs), 2):
            out[(a, b)] = out.get((a, b), 0) + 1
    return out


def test_triple_pattern_filters():
    ds = _store(TRIPLES)
    assert triple_pattern(ds, predicate="cites").count() == 6
    assert triple_pattern(ds, subject="org/a/thm1").count() == 3
    assert (
        triple_pattern(ds, subject_prefix="org/b/", predicate="cites").count()
        == 3
    )
    got = triple_pattern(ds, predicate="cites", obj="org/y").to_pandas()
    assert sorted(got["subject"]) == ["org/a/thm1", "org/b/thm1"]


def test_two_hop_paths():
    # S -proved_by-> X -states-> O
    got = two_hop(_store(TRIPLES, parallelism=3), "proved_by", "states")
    df = got.to_pandas().sort_values(["subject"]).reset_index(drop=True)
    assert df["subject"].tolist() == ["org/a/thm1"]
    assert df["mid"].tolist() == ["org/a/prf1"]
    assert df["object"].tolist() == ["org/a"]


def test_cocitation_matches_bruteforce_any_partitioning():
    want = _brute_cocite(TRIPLES)
    for par in (1, 2, 5):
        got = cocitation_pairs(_store(TRIPLES, parallelism=par)).to_pandas()
        got_map = {
            (a, b): int(n)
            for a, b, n in zip(got["subj_a"], got["subj_b"], got["n_shared"])
        }
        assert got_map == want


def test_cocitation_randomized_vs_bruteforce():
    rng = np.random.default_rng(7)
    subs = [f"org/r{i}/thm{j}" for i in range(6) for j in range(4)]
    objs = [f"ext/e{i}" for i in range(10)]
    rows = []
    for s in subs:
        for o in rng.choice(objs, size=rng.integers(0, 5), replace=False):
            rows.append((s, "cites", str(o)))
    rows = sorted(set(rows))
    want = _brute_cocite(rows)
    got = cocitation_pairs(_store(rows, parallelism=4)).to_pandas()
    got_map = {
        (a, b): int(n)
        for a, b, n in zip(got["subj_a"], got["subj_b"], got["n_shared"])
    }
    assert got_map == want


def test_cocitation_hot_object_cap_truncates_deterministically():
    # one hub object cited by 10 subjects, cap at 4 -> C(4,2)=6 pairs
    rows = [(f"org/s{i:02d}/t", "cites", "ext/hub") for i in range(10)]
    got = cocitation_pairs(_store(rows, parallelism=3), max_fanout=4)
    df = got.to_pandas()
    assert len(df) == 6
    kept = sorted(set(df["subj_a"]) | set(df["subj_b"]))
    # lexicographically first 4 subjects survive the cap
    assert kept == [f"org/s{i:02d}/t" for i in range(4)]


def test_star_join_all_patterns_required():
    from theoremkb_ray.stages.kgquery import star_join

    ds = _store(TRIPLES, parallelism=3)
    # subjects with BOTH a cites->org/x edge and any proved_by edge
    got = star_join(ds, {"cites": "org/x", "proved_by": None}).to_pandas()
    assert sorted(got["subject"]) == ["org/a/thm1"]
    # wildcard-only single pattern == distinct subjects of that predicate
    got2 = star_join(ds, {"cites": None}).to_pandas()
    assert sorted(got2["subject"]) == sorted(
        {s for s, p, _o in TRIPLES if p == "cites"}
    )
    # unsatisfiable object constraint -> empty
    got3 = star_join(ds, {"cites": "nope"}).to_pandas()
    assert len(got3) == 0


def test_neg_pattern_generic():
    """NOT-EXISTS pattern on a hand-built triple set, any partition
    count: subjects with a knows edge but no lives_in=Paris edge."""
    import pyarrow as pa
    import ray.data as rd

    from theoremkb_ray.stages.kgquery import neg_pattern

    triples = pa.table(
        {
            "subject": ["s1", "s1", "s2", "s3", "s3", "s4"],
            "predicate": [
                "knows", "lives_in", "knows", "knows", "lives_in",
                "lives_in",
            ],
            "object": ["s2", "Paris", "s3", "s1", "Lyon", "Paris"],
        }
    )
    for parts in (1, 3, 5):
        out = neg_pattern(
            rd.from_arrow(triples).repartition(parts),
            have=("knows", None),
            lack=("lives_in", "Paris"),
        ).to_pandas()
        assert sorted(out["subject"]) == ["s2", "s3"], parts


def test_kgquery_over_materialized_store(ray_session, tmp_path):
    """End-to-end composition: flagship store on disk -> pushdown
    read -> kgquery operators. Pins (a) read_triples' predicate /
    subject-prefix scan pushdown returns exactly the filtered rows,
    (b) two_hop over the real store's (proved_by, states) path agrees
    with a driver-side pandas join of the same store."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import run_kg
    from theoremkb_ray.sources.sinks import read_triples
    from theoremkb_ray.synth import materialize_corpus

    cdir = materialize_corpus(str(tmp_path / "c"), num_docs=60, seed=5)
    links = pq.read_table(f"{cdir}/links.parquet")
    store = str(tmp_path / "store")
    run_kg(
        f"{cdir}/corpus.parquet",
        store,
        links_tbl=links,
        segmenter="naive",
        canonicalize=False,
        num_partitions=4,
    )
    full = read_triples(store).to_pandas()

    # (a) pushdown == post-filter
    for pred in ("states", "proved_by"):
        got = read_triples(store, predicate=pred).to_pandas()
        want = full[full["predicate"] == pred]
        assert len(got) == len(want) > 0
    some_subject = full["subject"].iloc[0]
    prefix = some_subject[: some_subject.index("/") + 1]
    got = read_triples(store, subject_prefix=prefix).to_pandas()
    want = full[full["subject"].str.startswith(prefix)]
    assert len(got) == len(want) > 0

    # (b) two_hop doc -states-> theorem -proved_by-> proof
    paths = two_hop(
        read_triples(store), "states", "proved_by"
    ).to_pandas()
    st = full[full["predicate"] == "states"]
    pb = full[full["predicate"] == "proved_by"]
    want_pairs = st.merge(
        pb, left_on="object", right_on="subject", suffixes=("_l", "_r")
    )
    assert len(paths) == len(want_pairs) > 0
    assert set(zip(paths["subject"], paths["mid"], paths["object"])) == set(
        zip(
            want_pairs["subject_l"],
            want_pairs["object_l"],
            want_pairs["object_r"],
        )
    )


def test_two_hop_store_pushdown_matches_full_scan(ray_session, tmp_path):
    """two_hop_store (two predicate-pruned scans) == two_hop over the
    full store read."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import run_kg
    from theoremkb_ray.sources.sinks import read_triples
    from theoremkb_ray.stages.kgquery import two_hop_store
    from theoremkb_ray.synth import materialize_corpus

    cdir = materialize_corpus(str(tmp_path / "c"), num_docs=40, seed=9)
    store = str(tmp_path / "store")
    run_kg(
        f"{cdir}/corpus.parquet",
        store,
        segmenter="naive",
        canonicalize=False,
        num_partitions=3,
    )
    a = two_hop_store(store, "states", "proved_by").to_pandas()
    b = two_hop(read_triples(store), "states", "proved_by").to_pandas()
    key = lambda df: sorted(zip(df["subject"], df["mid"], df["object"]))
    assert key(a) == key(b) and len(a) > 0


def test_star_and_neg_store_pushdown_match(ray_session, tmp_path):
    """Store-level star/negation (predicate-list pruned scans) ==
    the full-scan operators."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import run_kg
    from theoremkb_ray.sources.sinks import read_triples
    from theoremkb_ray.stages.kgquery import (
        neg_pattern,
        neg_pattern_store,
        star_join,
        star_join_store,
    )
    from theoremkb_ray.synth import materialize_corpus

    cdir = materialize_corpus(str(tmp_path / "c"), num_docs=40, seed=13)
    store = str(tmp_path / "store")
    links = pq.read_table(f"{cdir}/links.parquet")
    run_kg(
        f"{cdir}/corpus.parquet",
        store,
        links_tbl=links,
        segmenter="naive",
        canonicalize=False,
        num_partitions=3,
    )
    # theorems with BOTH a proof and an outgoing citation (shared
    # subject = the theorem entity); disjoint-subject patterns (e.g.
    # states+proved_by) legitimately return a TYPED empty — also pinned
    req = {"proved_by": None, "cites": None}
    a = set(star_join_store(store, req).to_pandas()["subject"])
    b = set(star_join(read_triples(store), req).to_pandas()["subject"])
    assert a == b and len(a) > 0
    disjoint = star_join_store(store, {"states": None, "proved_by": None})
    # typed empty: schema survives at the Dataset level (Ray's
    # to_pandas() drops columns on 0-row datasets — upstream quirk)
    assert disjoint.count() == 0
    assert disjoint.schema().names == ["subject"]
    have, lack = ("states", None), ("proved_by", None)
    c = set(neg_pattern_store(store, have, lack).to_pandas()["subject"])
    d = set(
        neg_pattern(read_triples(store), have, lack).to_pandas()["subject"]
    )
    assert c == d and len(c) > 0
