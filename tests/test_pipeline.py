"""End-to-end KG pipeline: triple P/R vs gold (BASELINE.json gate)."""

import pyarrow as pa
import pytest
import ray.data as rd

from theoremkb_ray.pipelines.kg import triples_dataset
from theoremkb_ray.stages.canonicalize import connected_components_local
from theoremkb_ray.stages.ingest import ShaMismatch, ingest_batch


def _pr(got: set, gold: set) -> tuple[float, float]:
    tp = len(got & gold)
    return tp / max(len(got), 1), tp / max(len(gold), 1)


def _gold_sets(tables):
    df = tables["gold_triples"].to_pandas()
    gold = set(zip(df["subject"], df["predicate"], df["object"]))
    dp = tables["gold_dup_pairs"]
    canon = connected_components_local(
        pa.table({"a": dp["entity_a"], "b": dp["entity_b"]})
    )
    gold_c = {
        (canon.get(s, s), p, canon.get(o, o)) for s, p, o in gold
    }
    return gold, gold_c


@pytest.mark.parametrize("segmenter", ["naive", "crf"])
def test_e2e_triples_pr(gold100, segmenter):
    corpus = rd.from_arrow(gold100["corpus"])
    out = triples_dataset(
        corpus,
        links_tbl=gold100["links"],
        segmenter=segmenter,
        canonicalize=False,
    ).to_pandas()
    got = set(zip(out["subject"], out["predicate"], out["object"]))
    gold, _ = _gold_sets(gold100)
    p, r = _pr(got, gold)
    assert p >= 0.95 and r >= 0.95, (segmenter, p, r)


def test_e2e_canonicalized_pr(gold100):
    corpus = rd.from_arrow(gold100["corpus"])
    out = triples_dataset(
        corpus,
        links_tbl=gold100["links"],
        segmenter="crf",
        canonicalize=True,
    ).to_pandas()
    got = set(zip(out["subject"], out["predicate"], out["object"]))
    _, gold_c = _gold_sets(gold100)
    p, r = _pr(got, gold_c)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_sha_invariant_detects_corruption(gold100):
    t = gold100["corpus"].slice(0, 4)
    bad_sha = t["content_sha256"].to_pylist()
    bad_sha[2] = "0" * 64
    t = t.set_column(
        t.column_names.index("content_sha256"),
        "content_sha256",
        pa.array(bad_sha, pa.string()),
    )
    with pytest.raises(ShaMismatch):
        ingest_batch(t)


def test_ingest_adds_doc_id_and_sha(gold100):
    t = gold100["corpus"].slice(0, 3).drop_columns(["content_sha256"])
    out = ingest_batch(t)
    assert "doc_id" in out.column_names
    assert out["content_sha256"].to_pylist() == gold100["corpus"].slice(0, 3)[
        "content_sha256"
    ].to_pylist()
    did = out["doc_id"].to_pylist()[0]
    assert "@" in did and did.startswith(out["repo"].to_pylist()[0])


def test_flagship_invariant_under_partitioning(tmp_path):
    """The same corpus through run_kg at different partition counts
    and input block layouts yields the identical triple SET — the
    repo's determinism-under-any-parallelism contract at flagship
    granularity (CRF decode, canonical ids, sink partitioning are all
    partition-independent by construction)."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import run_kg
    from theoremkb_ray.sources.sinks import read_triples
    from theoremkb_ray.synth import materialize_corpus

    cdir = materialize_corpus(str(tmp_path / "c"), num_docs=60, seed=21)
    links = pq.read_table(f"{cdir}/links.parquet")

    def triples(store, parts):
        run_kg(
            f"{cdir}/corpus.parquet", store, links_tbl=links,
            segmenter="crf", canonicalize=True, num_partitions=parts,
        )
        df = read_triples(store).to_pandas()
        return set(
            map(
                tuple,
                df[["subject", "predicate", "object"]].itertuples(False),
            )
        )

    a = triples(str(tmp_path / "s3"), 3)
    b = triples(str(tmp_path / "s8"), 8)
    assert a == b and len(a) > 0


def test_flagship_store_serves_planner_family(tmp_path):
    """Round-5 integration: the REAL flagship store (run_kg output)
    serves the whole planner family — BGP chain, OPTIONAL, MINUS,
    manifest-only predicate stats, and bounded reachability — with
    answers consistent with the store's own triples."""
    import pyarrow.parquet as pq

    from theoremkb_ray.pipelines.kg import run_kg
    from theoremkb_ray.sources.sinks import read_triples
    from theoremkb_ray.stages.kgquery import (
        bgp_query,
        predicate_stats,
        reachable_store,
    )
    from theoremkb_ray.synth import materialize_corpus

    cdir = materialize_corpus(str(tmp_path / "c"), num_docs=60, seed=9)
    links = pq.read_table(f"{cdir}/links.parquet")
    store = str(tmp_path / "store")
    run_kg(
        f"{cdir}/corpus.parquet", store, links_tbl=links,
        segmenter="naive", canonicalize=False, num_partitions=4,
    )
    trip = read_triples(store).to_pandas()
    triples = set(zip(trip["subject"], trip["predicate"], trip["object"]))

    # manifest-only stats == actual predicate counts
    stats = predicate_stats(store)
    want_counts = trip["predicate"].value_counts().to_dict()
    assert dict(zip(stats["predicate"], stats["n"])) == want_counts

    # BGP chain over the store's own predicates:
    # ?d states ?t . ?t proved_by ?p
    got = bgp_query(
        store, [("?d", "states", "?t"), ("?t", "proved_by", "?p")]
    ).to_pandas()
    states = {(s, o) for s, p, o in triples if p == "states"}
    proved = {}
    for s, p, o in triples:
        if p == "proved_by":
            proved.setdefault(s, set()).add(o)
    want = sorted(
        (d, t, pr)
        for d, t in states
        for pr in proved.get(t, set())
    )
    assert sorted(zip(got["d"], got["t"], got["p"])) == want
    assert len(want) > 0

    # OPTIONAL keeps unproved theorems with null p; MINUS drops the
    # proved ones — together they partition the required rows
    opt = bgp_query(
        store, [("?d", "states", "?t")],
        optional=[("?t", "proved_by", "?p")],
    ).to_pandas()
    mns = bgp_query(
        store, [("?d", "states", "?t")],
        minus=[("?t", "proved_by", "?p")],
    ).to_pandas()
    assert len(mns) == int(opt["p"].isna().sum())

    # reachability over cites from the most-citing doc
    cites = [(s, o) for s, p, o in triples if p == "cites"]
    if cites:
        seed = cites[0][0]
        r = reachable_store(store, "cites", [seed], max_hops=2)
        direct = {o for s, o in cites if s == seed} - {seed}
        got1 = {
            n for n, h in zip(r["node"], r["hop"]) if h == 1
        }
        assert got1 == direct
